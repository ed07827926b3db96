"""Cross-engine-stable numeric aggregates.

Floating-point SUM/AVG results depend on summation order, which
differs between Spark's partial-aggregate tree and DuckDB's scan
order; a mean that lands within one ULP of a 6th-decimal rounding
boundary then hashes differently across engines. The fix (shared by
every oracle-checked float mean in the repo): round each VALUE to
integer micro-units first, sum the identical int64s (exact,
order-free), and divide once at the end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Mean over pre-scaled integers, rounded to 1/{s} units; `{v}` is the
# value expr, `{s}` the 10^k scale.
MEANK_DUCK = (
    "floor(sum(CAST(round({v} * {s}, 0) AS BIGINT)) * 1.0 / count(*) + 0.5)"
    " / {s}.0"
)

# 6-decimal mean over pre-scaled integers; `{v}` is the value expr.
MEAN6_DUCK = MEANK_DUCK.replace("{s}", "1000000")

# Order-free 6-decimal ratio sum(num)/sum(den): numerator rounded to
# int64 whole units per row (exact summation), denominator must
# already be integral.
RATIO6_DUCK = (
    "round(sum(CAST(round({num}, 0) AS BIGINT)) * 1.0 / sum({den}), 6)"
)


# Order-free k-decimal sum: each value rounded to integer 10^k-units,
# summed exactly as int64. `{v}` value expr, `{s}` = 10^k scale.
SUMK_DUCK = "sum(CAST(round({v} * {s}, 0) AS BIGINT)) / {s}.0"


def sumk_spark(v, scale: int) -> F.Column:
    """Spark twin of SUMK_DUCK."""
    return F.sum(F.round(v * F.lit(float(scale)), 0).cast("long")) / F.lit(
        float(scale)
    )


def meank_spark(v, scale: int) -> F.Column:
    """Spark twin of MEANK_DUCK (identical int64 partial sums)."""
    return (
        F.floor(
            F.sum(F.round(v * F.lit(float(scale)), 0).cast("long"))
            * F.lit(1.0)
            / F.count(F.lit(1))
            + F.lit(0.5)
        )
        / F.lit(float(scale))
    )


def mean6_spark(v) -> F.Column:
    """Spark twin of MEAN6_DUCK (identical int64 partial sums)."""
    return meank_spark(v, 1000000)


def ratio6_spark(num, den) -> F.Column:
    """Spark twin of RATIO6_DUCK."""
    return F.round(
        F.sum(F.round(num, 0).cast("long")) * F.lit(1.0) / F.sum(den), 6
    )
