"""Null-safe casting + canonical output formatting.

``safe_double`` reproduces the reference's ``InternalParse``
(reference DispatcherFunction.cs:164-170, O13 in SURVEY.md §2):
``decimal.TryParse`` with non-numeric → 0 — *zero*, not NULL, which
changes AVG semantics vs SQL's null-skipping average. The reference
uses C# decimal; we standardize on DOUBLE to match the testdata.

``fmt_ts`` / ``round6`` exist for deterministic cross-engine output:
every query result that leaves the engine formats timestamps as
``yyyy-MM-dd HH:mm:ss.SSSSSS`` strings and rounds doubles, so a DuckDB
oracle computing the same expression hashes identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def safe_double(col: Column | str) -> Column:
    """String → DOUBLE with 0.0 (not NULL) on parse failure (O13).

    The reference's ``decimal.TryParse`` rejects "NaN"/"Infinity"
    (C# decimal has no such values) — Spark's try_cast ACCEPTS them,
    so non-finite results are mapped to the 0 default too. Remaining
    documented delta: decimal.TryParse also rejects exponent notation
    ("1e5" → 0) which try_cast accepts; kept Spark-native since no
    wire producer emits exponent-form measurements.
    """
    c = F.col(col) if isinstance(col, str) else col
    v = c.try_cast("double")
    finite = v.isNotNull() & ~F.isnan(v) & (F.abs(v) != float("inf"))
    return F.when(finite, v).otherwise(F.lit(0.0))


def fmt_ts(col: Column | str) -> Column:
    """Canonical microsecond-precision timestamp → string formatting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, TS_FMT)


def round6(col: Column | str) -> Column:
    """Round a double to 6 decimals for cross-engine hash stability."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 6)
