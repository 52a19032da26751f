"""Cross-engine-stable numeric helpers.

The driver compares Spark results against DuckDB oracles value-by-value,
so any presentation rounding must be computed IDENTICALLY in both
engines. Spark's ``round`` is half-up while DuckDB's is half-to-even,
and quotient-shaped results (percent_rank, shares, ratios) are
small-denominator rationals that genuinely land on exact halves at the
rounded digit (q56 hit 333/640 = 0.5203125 at sf0.1). ``floor(x*10^d +
0.5)/10^d`` is the same double arithmetic in either engine, making the
compare independent of round-half conventions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up_expr(col: Column, digits: int = 6) -> Column:
    """Tie-proof presentation rounding (see module docstring)."""
    scale = float(10**digits)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def round_half_up_sql(expr: str, digits: int = 6) -> str:
    """DuckDB rendering of ``round_half_up_expr`` (identical arithmetic).

    ``expr`` must be DOUBLE-typed (quotients are; a bare decimal
    literal is NOT — DuckDB parses those as DECIMAL, where the scale
    multiply can overflow. CAST literals explicitly)."""
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
