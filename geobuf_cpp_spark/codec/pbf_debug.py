"""Schema-less protobuf debug printer.

Parity with the reference's ``pbf_decode`` tool
(reference src/geobuf/pbf_decoder.cpp:41-205): walk a PBF byte string
without a schema, print ``tag: value`` lines, guessing at wire type 2
payloads — valid UTF-8 becomes a quoted string, parseable sub-structure is
recursed into, anything else is hex. Diagnostic only, never in a hot path.
"""

from __future__ import annotations

from .pbf import PbfReader


def to_printable(data: bytes, indent: str = "  ", _depth: int = 0) -> str:
    lines: list[str] = []
    pad = indent * _depth
    pbf = PbfReader(data)
    try:
        while pbf.next():
            tag, wire = pbf.tag, pbf.wire
            if wire == 0:
                lines.append(f"{pad}{tag}: {pbf.get_uint64()}")
            elif wire == 1:
                lines.append(f"{pad}{tag}: double({pbf.get_double()!r})")
            elif wire == 2:
                payload = bytes(pbf.get_bytes())
                rendered = _guess(payload, indent, _depth)
                lines.append(f"{pad}{tag}: {rendered}")
            else:
                pbf.skip()
                lines.append(f"{pad}{tag}: <wire {wire}>")
    except (IndexError, ValueError):
        lines.append(f"{pad}<malformed>")
    return "\n".join(lines)


def _guess(payload: bytes, indent: str, depth: int) -> str:
    if not payload:
        return '""'
    try:
        text = payload.decode("utf-8")
        if all(ch.isprintable() or ch.isspace() for ch in text):
            return f'"{text}"'
    except UnicodeDecodeError:
        pass
    nested = _try_nested(payload, indent, depth)
    if nested is not None:
        return "{\n" + nested + "\n" + indent * depth + "}"
    return "0x" + payload.hex()


def _try_nested(payload: bytes, indent: str, depth: int) -> str | None:
    pbf = PbfReader(payload)
    n_fields = 0
    try:
        while pbf.next():
            if pbf.tag == 0 or pbf.tag > 536870911 or pbf.wire in (3, 4, 6, 7):
                return None
            pbf.skip()
            n_fields += 1
    except (IndexError, ValueError):
        return None
    if n_fields == 0 or pbf._pos != pbf._end:
        return None
    return to_printable(payload, indent, depth + 1)
