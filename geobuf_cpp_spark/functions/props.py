"""Typed property accessors over the canonical-JSON property map.

Feature properties ride Spark as ``MAP<STRING, STRING>`` whose values are
canonical JSON fragments (functions/udfs.py:_props_to_json_map) — lossless
for all six wire value kinds. These column builders give users typed access
without hand-writing ``get_json_object`` against fragments, mirroring the
typed value access the reference exposes through its rapidjson binding
(src/pybind11_rapidjson.cpp:30-299, src/geobuf/pybind11_helpers.hpp:344-384).

Semantics: a missing key or a fragment of the wrong kind yields NULL (the
relational analogue of the reference's checked ``GetInt64/GetDouble/
GetString`` accessors). Everything is built from JVM-side expressions —
``get_json_object`` / ``try_cast`` — so accessor-heavy scans stay inside
whole-stage codegen, no Python round trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fragment(props, key: str) -> Column:
    col = F.col(props) if isinstance(props, str) else props
    return F.element_at(col, F.lit(key))


def prop_json(props, key: str) -> Column:
    """The raw canonical-JSON fragment (any kind), NULL when absent."""
    return _fragment(props, key)


def prop_str(props, key: str) -> Column:
    """String value (unquoted); NULL for absent keys or non-string kinds."""
    frag = _fragment(props, key)
    return F.when(
        frag.startswith('"'), F.get_json_object(frag, "$")
    ).otherwise(F.lit(None).cast("string"))


def prop_int(props, key: str) -> Column:
    """Integer value as BIGINT; NULL for non-integer fragments.

    Covers the uint64(tag 3)/int64(tag 4) wire kinds; values beyond the
    int64 range come back NULL (try_cast), never silently wrapped.
    """
    frag = _fragment(props, key)
    # reject doubles ('1.5', '1e3') — integer fragments are digits only
    return F.when(
        frag.rlike(r"^-?[0-9]+$"), frag.try_cast("long")
    ).otherwise(F.lit(None).cast("long"))


def prop_double(props, key: str) -> Column:
    """Double value; accepts any JSON number fragment, NULL otherwise."""
    frag = _fragment(props, key)
    return F.when(
        frag.rlike(r"^-?[0-9]"), frag.try_cast("double")
    ).otherwise(F.lit(None).cast("double"))


def prop_bool(props, key: str) -> Column:
    """Boolean value; NULL unless the fragment is exactly true/false."""
    frag = _fragment(props, key)
    return F.when(frag == "true", F.lit(True)).when(
        frag == "false", F.lit(False)
    ).otherwise(F.lit(None).cast("boolean"))


def prop_is_null(props, key: str) -> Column:
    """True iff the property exists and is JSON null (tag-6 'null')."""
    return _fragment(props, key) == "null"
