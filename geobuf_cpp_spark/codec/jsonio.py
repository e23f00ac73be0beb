"""Relaxed JSON parsing, mirroring the reference's RapidJSON parse flags.

The reference parses every input with ``kParseCommentsFlag |
kParseFullPrecisionFlag | kParseTrailingCommasFlag``
(src/geobuf/rapidjson_helpers.hpp:16-19, src/geobuf/geobuf.cpp load_json) —
so documents carrying ``//`` / ``/* */`` comments and trailing commas are
accepted everywhere. Python's ``json`` already gives full-precision doubles
and accepts ``NaN``/``Infinity``; comments and trailing commas need the
string-aware pre-scan below (regexes can't be used: a comma or ``//``
inside a string literal must survive untouched).
"""

from __future__ import annotations

import json
from typing import Any


def strip_relaxed(text: str) -> str:
    """Remove // and /* */ comments and trailing commas, string-aware."""
    out: list[str] = []
    i, n = 0, len(text)
    in_str = False
    while i < n:
        c = text[i]
        if in_str:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(text[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
            i += 1
        elif c == '"':
            in_str = True
            out.append(c)
            i += 1
        elif c == "/" and i + 1 < n and text[i + 1] == "/":
            while i < n and text[i] != "\n":
                i += 1
        elif c == "/" and i + 1 < n and text[i + 1] == "*":
            i += 2
            while i + 1 < n and not (text[i] == "*" and text[i + 1] == "/"):
                i += 1
            i += 2
        else:
            out.append(c)
            i += 1
    # second pass: drop a comma whose next significant char closes a scope
    cleaned = "".join(out)
    out2: list[str] = []
    i, n = 0, len(cleaned)
    in_str = False
    while i < n:
        c = cleaned[i]
        if in_str:
            out2.append(c)
            if c == "\\" and i + 1 < n:
                out2.append(cleaned[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
            i += 1
        elif c == '"':
            in_str = True
            out2.append(c)
            i += 1
        elif c == ",":
            j = i + 1
            while j < n and cleaned[j] in " \t\r\n":
                j += 1
            if j < n and cleaned[j] in "}]":
                i += 1  # trailing comma: skip it
            else:
                out2.append(c)
                i += 1
        else:
            out2.append(c)
            i += 1
    return "".join(out2)


def loads_relaxed(text: str) -> Any:
    """json.loads with the reference's relaxed flags honored."""
    try:
        return json.loads(text)  # fast path: strict documents
    except json.JSONDecodeError:
        return json.loads(strip_relaxed(text))


def load_json(path: str) -> Any:
    """Relaxed file load (reference load_json, src/geobuf/geobuf.cpp:42-51)."""
    with open(path, encoding="utf-8") as f:
        return loads_relaxed(f.read())
