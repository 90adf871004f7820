"""Cross-engine helpers.

stable_round6: 6-dp rounding computed as floor(x*1e6 + 0.5)/1e6 in
IEEE doubles. Spark's round() rounds the shortest-decimal rendering
of the double (HALF_UP on BigDecimal) while DuckDB rounds the binary
value — they disagree whenever the true quotient lands on a
representable half (e.g. 7.6753125). Doing the same float ops on both
engines is bit-stable by construction, which is what the driver's
value-hash comparison needs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def stable_round6(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)).cast(
        "double"
    )


def sql_round6(expr: str) -> str:
    """DuckDB twin of stable_round6."""
    return f"(floor(({expr}) * 1000000.0 + 0.5) / 1000000.0)"
