"""Reusable column expression library (JVM-side, codegen-friendly)."""

from eventstreamer_spark.functions.casting import safe_double, fmt_ts, round6

__all__ = ["safe_double", "fmt_ts", "round6"]
