"""User-defined function surface: the engine's extension points.

The reference has no user extension point (SURVEY.md §2.1); this
module pins the three UDF tiers a Spark-native engine exposes, in
preference order:

1. built-in expressions (everything else in this repo) — JVM codegen;
2. ``@pandas_udf`` scalar / grouped-agg — Arrow-vectorized Python,
   ~10-100× faster than row-at-a-time UDFs;
3. ``applyInPandas`` / ``mapInPandas`` (see dedup/multimodal/stateful)
   for whole-group / whole-batch custom logic.

Row-at-a-time ``F.udf`` is deliberately absent from the hot-path
surface — it exists in Spark but is the documented anti-pattern.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from eventstreamer_spark.registry import query
from eventstreamer_spark.sources.tables import load_events


@F.pandas_udf(DoubleType())
def _sigmoid(v: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: numpy runs on the whole Arrow batch."""
    return 1.0 / (1.0 + np.exp(-v / 100.0))


_SIGMOID_ORACLE = """
SELECT event_id,
       round(1.0 / (1.0 + exp(-value / 100.0)), 6) AS sigmoid_value
FROM events
WHERE event_id % 19 = 0
"""


@query("pandas_udf_scalar", oracle=_SIGMOID_ORACLE)
def q_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF (Arrow batch in, batch out). The oracle
    recomputes the same math in SQL — numpy's and DuckDB's exp agree
    well below the 1e-6 rounding floor for these magnitudes."""
    ev = load_events(spark, sf_dir)
    return ev.filter(F.col("event_id") % 19 == 0).select(
        "event_id", F.round(_sigmoid(F.col("value")), 6).alias("sigmoid_value")
    )


@F.pandas_udf(DoubleType())
def _weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """Grouped-aggregate Pandas UDF: whole group's columns in, one
    scalar out. ``value`` is a 2-decimal quantity, so it is scaled to
    an exact int64 before the dot product — the sum is then identical
    to the oracle's in any accumulation order, and the floor(x+0.5)
    half-up keeps rounding tie-free cross-engine (see
    functions/hashing.py for the pattern's rationale)."""
    vi = np.round(v.to_numpy() * 100).astype("int64")
    wi = w.to_numpy().astype("int64")
    x = vi @ wi * 10000.0 / wi.sum()
    return float(np.floor(x + 0.5) / 1e6)


_WMEAN_ORACLE = """
SELECT event_type,
       floor(sum(CAST(round(value * 100, 0) AS BIGINT) * (1 + user_id % 5)) * 10000.0
             / sum(1 + user_id % 5) + 0.5) / 1000000.0 AS wmean
FROM events
GROUP BY event_type
"""


@query("pandas_udf_grouped_agg", oracle=_WMEAN_ORACLE)
def q_pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg Pandas UDF used directly inside ``agg`` — the
    custom-UDAF story. Plans as a full-group aggregate (no partial
    path for Python aggregates — the documented cost vs built-ins)."""
    ev = load_events(spark, sf_dir).select(
        "event_type", "value", (1 + F.col("user_id") % 5).cast("double").alias("w")
    )
    return ev.groupBy("event_type").agg(_weighted_mean("value", "w").alias("wmean"))
