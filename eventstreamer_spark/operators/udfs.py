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
from eventstreamer_spark.sources.tables import load_events, load_table


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


# ---------------------------------------------------------------------------
# Python UDTF — the table-function extension tier
# ---------------------------------------------------------------------------

_UDTF_CHUNK = 25

_UDTF_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS toks
  FROM documents WHERE doc_id % 5 = 0
), x AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, CAST(ceil(len(toks) / {_UDTF_CHUNK}.0) AS INT) - 1)) AS k
  FROM tk WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(k AS INT) AS chunk_idx,
       CAST(len(list_slice(toks, k * {_UDTF_CHUNK} + 1, k * {_UDTF_CHUNK} + {_UDTF_CHUNK})) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(list_slice(toks, k * {_UDTF_CHUNK} + 1, k * {_UDTF_CHUNK} + {_UDTF_CHUNK}))) AS BIGINT) AS n_unique,
       md5(array_to_string(list_slice(toks, k * {_UDTF_CHUNK} + 1, k * {_UDTF_CHUNK} + {_UDTF_CHUNK}), ' ')) AS chunk_md5
FROM x
"""


@query("udtf_chunk_stats", oracle=_UDTF_ORACLE)
def q_udtf_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) — one input row → N output rows,
    the LATERAL-join extension tier that completes the user-extension
    surface (scalar pandas_udf, grouped-agg pandas_udf,
    applyInPandas/mapInPandas, and now udtf; SURVEY.md §2.1
    "UDF/UDAF/UDTF").

    Splits each document into fixed 25-token chunks and emits (chunk
    index, token count, distinct-token count, chunk md5) per chunk —
    the context-window segmentation step, here expressed as a user
    table function. Arrow-optimized (``useArrow=True``): rows cross
    the Python boundary in Arrow batches, not pickled one-by-one —
    still the slow tier vs built-in list_slice/explode (the repo's own
    ``document_chunking`` does the same job in pure expressions for
    exactly that reason; this query exists to pin the extension
    point's semantics and plan shape). Applied via LATERAL join so
    each executor task streams its partition through the UDTF — no
    collect, scales with partition parallelism. The DuckDB twin
    replays the chunking with generate_series + list_slice and hashes
    the same chunk text, so the UDTF output is value-checked, not just
    row-counted."""
    import hashlib

    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "doc_id bigint, chunk_idx int, n_tokens bigint, "
            "n_unique bigint, chunk_md5 string"
        ),
        useArrow=True,
    )
    class ChunkStats:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF protocol
            if text is None:
                return
            toks = [t for t in text.split(" ") if t]
            for k in range(0, len(toks), _UDTF_CHUNK):
                chunk = toks[k : k + _UDTF_CHUNK]
                yield (
                    doc_id,
                    k // _UDTF_CHUNK,
                    len(chunk),
                    len(set(chunk)),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    spark.udtf.register("chunk_stats", ChunkStats)
    d = load_table(spark, sf_dir, "documents")
    d.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql("SELECT s.* FROM _udtf_docs, LATERAL chunk_stats(doc_id, text) s")
