"""SQL-text mirror of the codec's quantization semantics.

Generates engine-portable SQL reproducing exactly what a geobuf
encode -> decode round trip does to a coordinate:

1. auto-precision: e grows x10 while round_half_away(x*e)/e != x, capped
   (reference geobuf.cpp:346-358), per-document max over coordinates;
2. quantize with half-away-from-zero rounding (std::round, geobuf.cpp:479);
3. decode divides by e (geobuf.cpp:681-700).

Monotonicity note: in IEEE double, if x survives round(x*e)/e == x at some
power of ten e, it also survives at 10e (the products stay within 1/2 ulp
of the scaled integer), so "first fitting e in the ascending CASE cascade"
equals the reference's growth loop and the per-document max of per-
coordinate minima equals its sequential shared-e walk.

Used by the DuckDB oracle of the ``geobuf_roundtrip`` query — the Spark
side runs the real codec in a pandas UDF; this SQL predicts its output.
"""

from __future__ import annotations


def sql_quantize(x: str, e: str) -> str:
    """round_half_away(x*e) / e as portable SQL."""
    return (
        f"((CASE WHEN {x} >= 0 THEN FLOOR({x} * {e} + 0.5) "
        f"ELSE -FLOOR(-({x}) * {e} + 0.5) END) / {e})"
    )


def sql_fits(x: str, e: int) -> str:
    return f"{sql_quantize(x, str(e))} = {x}"


def sql_min_e(x: str, max_precision: int) -> str:
    """Smallest power of ten 1..max_precision at which x survives."""
    cases = []
    e = 1
    while e < max_precision:
        cases.append(f"WHEN {sql_fits(x, e)} THEN {e}")
        e *= 10
    return "(CASE " + " ".join(cases) + f" ELSE {max_precision} END)"


def sql_roundtrip(coord_exprs: list[str], max_precision: int) -> dict[str, str]:
    """{coord_expr: roundtripped SQL} with the shared per-row e."""
    e_feat = "GREATEST(" + ", ".join(
        sql_min_e(x, max_precision) for x in coord_exprs
    ) + ")"
    return {x: sql_quantize(x, e_feat) for x in coord_exprs}


# ---------------------------------------------------------------------------
# wire-size model: predicts the encoder's exact output byte count in SQL
# ---------------------------------------------------------------------------


def sql_quantize_int(x: str, e: str) -> str:
    """The quantized integer itself (round_half_away(x*e)) as BIGINT."""
    return (
        f"CAST((CASE WHEN {x} >= 0 THEN FLOOR({x} * {e} + 0.5) "
        f"ELSE -FLOOR(-({x}) * {e} + 0.5) END) AS BIGINT)"
    )


def sql_zigzag(v: str) -> str:
    """Protobuf sint zigzag: 2v if v >= 0 else -2v-1 (codec/pbf.py)."""
    return f"(CASE WHEN {v} >= 0 THEN 2 * {v} ELSE -2 * {v} - 1 END)"


def sql_varint_len(u: str) -> str:
    """Byte length of an unsigned varint (7 bits per byte), u < 2^35."""
    return (
        f"(CASE WHEN {u} < 128 THEN 1 WHEN {u} < 16384 THEN 2 "
        f"WHEN {u} < 2097152 THEN 3 WHEN {u} < 268435456 THEN 4 ELSE 5 END)"
    )


# Fixed scaffolding bytes of a Point Feature with properties
# {"src": "orders"}: keys table + feature/geometry/properties framing +
# value entry, everything except the two coordinate varints. When the
# auto-detected precision == 6 (the default) the header's precision field
# (tag + varint = 2 bytes) is omitted (reference geobuf.cpp:235-239), hence
# the two constants. Calibrated against the real encoder and locked by
# tests/test_codec.py::test_point_feature_size_formula.
POINT_FEATURE_CONST = 29
POINT_FEATURE_CONST_DEFAULT_PRECISION = 27


def sql_point_feature_size(lon: str, lat: str, max_precision: int) -> dict[str, str]:
    """SQL for (precision, nbytes) of the encoded Point feature.

    Mirrors exactly what ``Encoder.encode`` produces for
    ``{"type": "Feature", "geometry": Point(lon, lat),
    "properties": {"src": "orders"}}`` — the arithmetic model the DuckDB
    oracle of ``geobuf_size_stats`` runs against the real codec's output.
    """
    e = "GREATEST(" + ", ".join(
        sql_min_e(x, max_precision) for x in (lon, lat)
    ) + ")"
    digits = len(str(max_precision)) - 1
    prec_cases = " ".join(
        f"WHEN {10 ** d} THEN {d}" for d in range(digits + 1)
    )
    precision = f"(CASE {e} {prec_cases} END)"
    vlens = " + ".join(
        sql_varint_len(sql_zigzag(sql_quantize_int(x, e))) for x in (lon, lat)
    )
    nbytes = (
        f"((CASE WHEN {e} = {10 ** 6} THEN "
        f"{POINT_FEATURE_CONST_DEFAULT_PRECISION} "
        f"ELSE {POINT_FEATURE_CONST} END) + {vlens})"
    )
    return {"precision": precision, "nbytes": nbytes}
