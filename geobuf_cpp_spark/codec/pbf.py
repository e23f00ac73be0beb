"""Minimal protobuf wire-format kernels (writer + reader), numpy-vectorized.

Implements exactly the subset of the protobuf wire format the Geobuf codec
needs: varint (wire type 0), 64-bit fixed (wire type 1, for doubles), and
length-delimited (wire type 2, for strings / sub-messages / packed arrays).
Wire semantics follow the protozero usage in the reference encoder
(/root/reference/src/geobuf/geobuf.cpp:210-552): ``add_packed_sint64`` is
zigzag+varint, ``add_int64`` is plain two's-complement varint,
``add_uint32``/``add_uint64`` are plain varints.

The coordinate hot path (`pack_sint64_array`) is vectorized with numpy so the
Arrow-batched pandas UDFs that wrap this codec never loop per-coordinate in
Python.
"""

from __future__ import annotations

import struct

import numpy as np

_U64 = np.uint64
_MASK7 = _U64(0x7F)
_CONT = _U64(0x80)


# ---------------------------------------------------------------------------
# zigzag
# ---------------------------------------------------------------------------

def zigzag_encode(vals: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag: (n << 1) ^ (n >> 63)."""
    v = vals.astype(np.int64, copy=False)
    return ((v.astype(np.uint64) << _U64(1)) ^ (v >> np.int64(63)).astype(np.uint64))


def zigzag_decode(vals: np.ndarray) -> np.ndarray:
    """uint64 zigzag -> int64."""
    v = vals.astype(np.uint64, copy=False)
    return ((v >> _U64(1)) ^ (~(v & _U64(1)) + _U64(1))).astype(np.int64)


# ---------------------------------------------------------------------------
# vectorized varint encode (the coords hot path)
# ---------------------------------------------------------------------------

def encode_varints(vals: np.ndarray) -> bytes:
    """Encode a uint64 array as concatenated varints (numpy, no Python loop).

    Builds an (n, 10) byte matrix of 7-bit groups, masks out groups past each
    value's length, sets continuation bits, and compresses to a flat buffer.
    """
    v = vals.astype(np.uint64, copy=False)
    n = v.shape[0]
    if n == 0:
        return b""
    # groups needed per value: searchsorted against 2^(7k) thresholds
    thresholds = (_U64(1) << (_U64(7) * np.arange(1, 10, dtype=np.uint64)))
    ngroups = np.searchsorted(thresholds, v, side="right") + 1
    ncols = int(ngroups.max())
    ends = np.cumsum(ngroups)
    starts = ends - ngroups
    flat = np.empty(int(ends[-1]), dtype=np.uint8)
    for k in range(ncols):
        mask = ngroups > k
        byte_k = ((v[mask] >> _U64(7 * k)) & _MASK7).astype(np.uint8)
        cont = ngroups[mask] - 1 > k
        flat[starts[mask] + k] = byte_k | (cont.astype(np.uint8) << 7)
    return flat.tobytes()


def decode_varints(buf: bytes | memoryview) -> np.ndarray:
    """Decode a packed-varint payload into a uint64 array (vectorized).

    Small payloads (single Points dominate web corpora — a coords field
    is 2 varints) take a scalar path: the numpy kernel's masked-gather
    setup costs ~35us per call regardless of n, while the scalar loop
    is well under 1us per byte — the same size cutover
    ``pack_sint64_array`` applies on the encode side.
    """
    if len(buf) <= 32:
        out = []
        v = 0
        shift = 0
        for byte in bytes(buf):
            v |= (byte & 0x7F) << shift
            if byte & 0x80:
                shift += 7
            else:
                out.append(v & 0xFFFFFFFFFFFFFFFF)
                v = 0
                shift = 0
        return np.array(out, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    # position of each byte within its varint
    pos = np.arange(b.size, dtype=np.int64)
    group_idx = pos - np.repeat(starts, ends - starts + 1)
    payload = (b & 0x7F).astype(np.uint64) << (_U64(7) * group_idx.astype(np.uint64))
    out = np.zeros(ends.size, dtype=np.uint64)
    val_id = np.repeat(np.arange(ends.size, dtype=np.int64), ends - starts + 1)
    np.bitwise_or.at(out, val_id, payload)
    return out


def pack_sint64_array(vals: np.ndarray) -> bytes:
    """zigzag + varint a signed int64 array (packed field payload).

    Small arrays (single Points and short rings dominate web corpora) take
    a scalar path: the numpy kernel's setup costs ~70us regardless of n,
    while the scalar loop is ~1us per value.
    """
    if vals.size <= 16:
        out = bytearray()
        for n in vals.tolist():
            z = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
            while True:
                b = z & 0x7F
                z >>= 7
                if z:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)
    return encode_varints(zigzag_encode(vals))


def unpack_sint64_array(buf: bytes | memoryview) -> np.ndarray:
    if len(buf) <= 32:
        out = []
        v = 0
        shift = 0
        for byte in bytes(buf):
            v |= (byte & 0x7F) << shift
            if byte & 0x80:
                shift += 7
            else:
                z = v & 0xFFFFFFFFFFFFFFFF
                s = (z >> 1) ^ -(z & 1)  # zigzag -> signed, exact
                out.append(s)
                v = 0
                shift = 0
        return np.array(out, dtype=np.int64)
    return zigzag_decode(decode_varints(buf))


# ---------------------------------------------------------------------------
# scalar varint (message scaffolding path)
# ---------------------------------------------------------------------------

def varint(value: int) -> bytes:
    """Scalar unsigned varint (value must be >= 0, < 2**64)."""
    out = bytearray()
    v = value & 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class PbfWriter:
    """Append-only protobuf message builder (mirrors protozero pbf_writer use)."""

    __slots__ = ("_parts",)

    def __init__(self) -> None:
        self._parts: list[bytes] = []

    def _key(self, tag: int, wire: int) -> None:
        self._parts.append(varint((tag << 3) | wire))

    def add_varint(self, tag: int, value: int) -> None:
        self._key(tag, 0)
        self._parts.append(varint(value))

    # reference: pbf.add_uint32 / add_uint64 / add_enum are all plain varints
    add_uint32 = add_varint
    add_uint64 = add_varint
    add_enum = add_varint

    def add_int64(self, tag: int, value: int) -> None:
        """Two's-complement varint (negative -> 10 bytes), protozero add_int64."""
        self._key(tag, 0)
        self._parts.append(varint(value & 0xFFFFFFFFFFFFFFFF))

    def add_bool(self, tag: int, value: bool) -> None:
        self.add_varint(tag, 1 if value else 0)

    def add_double(self, tag: int, value: float) -> None:
        self._key(tag, 1)
        self._parts.append(struct.pack("<d", value))

    def add_string(self, tag: int, value: str) -> None:
        self.add_bytes(tag, value.encode("utf-8"))

    def add_bytes(self, tag: int, value: bytes) -> None:
        self._key(tag, 2)
        self._parts.append(varint(len(value)))
        self._parts.append(value)

    def add_message(self, tag: int, sub: "PbfWriter") -> None:
        self.add_bytes(tag, sub.tobytes())

    def add_packed_uint32(self, tag: int, values) -> None:
        payload = b"".join(varint(int(v)) for v in values)
        self.add_bytes(tag, payload)

    def add_packed_sint64(self, tag: int, values: np.ndarray) -> None:
        self.add_bytes(tag, pack_sint64_array(np.asarray(values, dtype=np.int64)))

    def tobytes(self) -> bytes:
        return b"".join(self._parts)


class PbfReader:
    """Sequential protobuf field reader over a bytes/memoryview slice."""

    __slots__ = ("_buf", "_pos", "_end", "tag", "wire")

    def __init__(self, buf) -> None:
        self._buf = memoryview(buf)
        self._pos = 0
        self._end = len(self._buf)
        self.tag = 0
        self.wire = 0

    def next(self) -> bool:
        if self._pos >= self._end:
            return False
        key = self._read_varint()
        self.tag = key >> 3
        self.wire = key & 7
        return True

    def _read_varint(self) -> int:
        result = 0
        shift = 0
        buf = self._buf
        pos = self._pos
        while True:
            b = buf[pos]
            pos += 1
            result |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        self._pos = pos
        return result & 0xFFFFFFFFFFFFFFFF

    def get_uint64(self) -> int:
        return self._read_varint()

    get_uint32 = get_uint64
    get_enum = get_uint64

    def get_int64(self) -> int:
        v = self._read_varint()
        return v - (1 << 64) if v >= (1 << 63) else v

    def get_bool(self) -> bool:
        return self._read_varint() != 0

    def get_double(self) -> float:
        v = struct.unpack_from("<d", self._buf, self._pos)[0]
        self._pos += 8
        return v

    def get_bytes(self) -> memoryview:
        n = self._read_varint()
        if self._pos + n > self._end:  # slicing would silently clamp
            raise ValueError(
                f"truncated length-delimited field: need {n} bytes, "
                f"{self._end - self._pos} remain"
            )
        out = self._buf[self._pos : self._pos + n]
        self._pos += n
        return out

    def get_string(self) -> str:
        return bytes(self.get_bytes()).decode("utf-8")

    def get_packed_uint32(self) -> np.ndarray:
        return decode_varints(self.get_bytes())

    def get_packed_sint64(self) -> np.ndarray:
        return unpack_sint64_array(self.get_bytes())

    def skip(self) -> None:
        if self.wire == 0:
            self._read_varint()
        elif self.wire == 1:
            self._pos += 8
        elif self.wire == 2:
            n = self._read_varint()
            self._pos += n
        elif self.wire == 5:
            self._pos += 4
        else:  # pragma: no cover - malformed input
            raise ValueError(f"unsupported wire type {self.wire}")
