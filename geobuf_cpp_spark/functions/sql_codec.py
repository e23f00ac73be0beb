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
