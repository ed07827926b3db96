"""Embedding-column preparation ops beyond search: quantization,
centroid pooling, and metadata-filtered ANN.

A training-data pipeline doesn't just SEARCH embeddings — it ships
them: int8 quantization (with a measured reconstruction-error audit),
per-class mean-pooling (classifier prototypes / IVF seeding), and
filtered similarity search (the "nearest neighbors WHERE metadata
matches" query every dedup-with-constraints pass runs).

All array math is codegen'd Spark SQL expressions over the
``embeddings`` table (no Python in the row path); error statistics
are integer-scaled (functions.numeric) so the DuckDB oracles compare
bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstreamer_spark.functions import hashing as H
from eventstreamer_spark.functions import numeric as N
from eventstreamer_spark.operators.similarity import QUERY_FILTER, brute_topk
from eventstreamer_spark.registry import query
from eventstreamer_spark.sources.tables import load_table_parallel

# ---------------------------------------------------------------------------
# Int8 quantization + reconstruction-error audit
# ---------------------------------------------------------------------------

# per-row int8 symmetric quantization: scale = 127/max|x|,
# q_i = round(x_i * scale) ∈ [-127, 127], recon = q/scale. The mse is
# summed as round(err² · 1e12) int64s — sequential in both engines'
# list folds and exact, so per-vector mse is the identical double.
_MSE_SPARK = """
aggregate(
  transform({v}, x ->
    CAST(round(
      pow(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) * (127.0 / {m}), 0) / (127.0 / {m}), 2)
      * 1000000000000.0, 0) AS BIGINT)),
  0L, (acc, e) -> acc + e)
"""

_MSE_DUCK = """
list_sum(
  list_transform({v}, x ->
    CAST(round(
      pow(CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) * (127.0 / {m}), 0) / (127.0 / {m}), 2)
      * 1000000000000.0, 0) AS BIGINT)))
"""

_QERR_ORACLE = f"""
WITH prep AS (
  SELECT label,
         len(embedding) AS dim,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
  , embedding FROM embeddings
), per_vec AS (
  SELECT label,
         ({_MSE_DUCK.format(v="embedding", m="m")}) / 1000000000000.0 / dim AS mse
  FROM prep WHERE m > 0
)
SELECT CAST(label AS INTEGER) AS label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       {N.MEANK_DUCK.format(v="mse", s=1000000000)} AS avg_mse,
       round(max(mse), 9) AS max_mse
FROM per_vec
GROUP BY label
"""


@query("embedding_quantization_error", oracle=_QERR_ORACLE)
def q_embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization audit: quantize every vector symmetrically to
    8 bits, reconstruct, and report per-label mean/max MSE — the
    check a pipeline runs before committing to shipping embeddings at
    1/4 the bytes. Row-local array expressions (one scan, no shuffle
    until the tiny per-label rollup); at 100 TB the scan is the whole
    cost and the output is |labels| rows."""
    e = load_table_parallel(spark, sf_dir, "embeddings")
    m = "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
    prep = e.select(
        "label",
        F.expr(m).alias("m"),
        F.size("embedding").alias("dim"),
        "embedding",
    ).filter(F.col("m") > 0)
    mse = (
        F.expr(_MSE_SPARK.format(v="embedding", m="m")) / 1000000000000.0 / F.col("dim")
    )
    return (
        prep.select(F.col("label").cast("int").alias("label"), mse.alias("mse"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            N.meank_spark(F.col("mse"), 1000000000).alias("avg_mse"),
            F.round(F.max("mse"), 9).alias("max_mse"),
        )
    )


# ---------------------------------------------------------------------------
# Per-label centroids (mean pooling)
# ---------------------------------------------------------------------------

_CENTROID_ORACLE = f"""
SELECT CAST(e.label AS INTEGER) AS label,
       CAST(d.i AS INTEGER) AS dim,
       CAST(count(*) AS BIGINT) AS n_vectors,
       {N.MEAN6_DUCK.format(v="CAST(e.embedding[d.i] AS DOUBLE)")} AS centroid
FROM embeddings e,
     LATERAL (SELECT unnest(generate_series(1, len(e.embedding))) AS i) d
GROUP BY e.label, d.i
"""


@query("label_centroids", oracle=_CENTROID_ORACLE)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled per-label centroid table (label × dimension): the
    classifier-prototype / IVF-seed build. posexplode fans each vector
    into (dim, value) rows and ONE hash aggregate on (label, dim)
    reduces them — map-side partials make the shuffle |labels|×|dims|
    regardless of corpus size. Dimension means are integer-scaled so
    the 640-row centroid table is bit-identical across engines."""
    e = load_table_parallel(spark, sf_dir, "embeddings")
    exploded = e.select(
        F.col("label").cast("int").alias("label"),
        F.posexplode("embedding").alias("pos", "x"),
    ).select("label", (F.col("pos") + 1).cast("int").alias("dim"), F.col("x").cast("double").alias("x"))
    return exploded.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        N.mean6_spark(F.col("x")).alias("centroid"),
    )


# ---------------------------------------------------------------------------
# Metadata-filtered ANN
# ---------------------------------------------------------------------------

_FILTERED_ORACLE = f"""
WITH u AS (SELECT * FROM (
  SELECT vec_id, label, {H.quantized_unit_duck("embedding")} AS uq FROM embeddings
) WHERE uq[1] IS NOT NULL),
q AS (SELECT vec_id, uq FROM u WHERE {QUERY_FILTER}),
corpus AS (SELECT vec_id, uq FROM u WHERE label % 2 = 0),
pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         round({H.qcosine_duck("q.uq", "e.uq")}, 5) AS cosine
  FROM q JOIN corpus e ON q.vec_id != e.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10
"""


@query("ann_filtered_topk", oracle=_FILTERED_ORACLE)
def q_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered similarity search: top-k neighbors restricted to a
    metadata predicate (label % 2 = 0) — the "find near-dups WITHIN
    the allowed subset" query. Pre-filtering beats post-filtering
    (post-filter can return < k survivors); the filter lands on the
    corpus scan BEFORE quantization, so the excluded half is never
    normalized, scored, or shuffled. Same broadcast-query plan as
    ann_bruteforce_topk; with an IVF/LSH index the filter simply
    composes with the bucket probe."""
    e = load_table_parallel(spark, sf_dir, "embeddings")
    # queries come from the FULL corpus, matching the oracle's q CTE
    qs = H.with_quantized_unit(
        e.filter(F.expr(QUERY_FILTER)), "embedding", "uq", drop_zero_norm=True
    ).select(F.col("vec_id").alias("query_id"), F.col("uq").alias("q_uq"))
    corpus = H.with_quantized_unit(
        e.filter(F.col("label") % 2 == 0), "embedding", "uq", drop_zero_norm=True
    ).select("vec_id", "uq")
    pairs = (
        F.broadcast(qs)
        .join(corpus, F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(H.qcosine_expr("q_uq", "uq"), 5).alias("cosine"),
        )
    )
    from eventstreamer_spark.operators.similarity import _ranked_topk

    return _ranked_topk(pairs)


# ---------------------------------------------------------------------------
# Label-centroid distance matrix (cluster-separation diagnostics)
# ---------------------------------------------------------------------------

# The centroid build reuses the label_centroids formula verbatim (the
# 6-dec-rounded means are integral in 1e-6 units, so every downstream
# moment is an exact int64).
_CENT_CTE = f"""
  SELECT CAST(e.label AS INTEGER) AS label,
         CAST(d.i AS INTEGER) AS dim,
         {N.MEAN6_DUCK.format(v="CAST(e.embedding[d.i] AS DOUBLE)")} AS centroid
  FROM embeddings e,
       LATERAL (SELECT unnest(generate_series(1, len(e.embedding))) AS i) d
  GROUP BY e.label, d.i
"""

_CENT_DIST_ORACLE = f"""
WITH cent AS ({_CENT_CTE}
), units AS (
  SELECT label, dim, CAST(round(centroid * 1000000, 0) AS BIGINT) AS cu
  FROM cent
), pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(sum((a.cu - b.cu) * (a.cu - b.cu)) AS BIGINT) AS d2,
         CAST(sum(a.cu * b.cu) AS BIGINT) AS dot,
         CAST(sum(a.cu * a.cu) AS BIGINT) AS na,
         CAST(sum(b.cu * b.cu) AS BIGINT) AS nb
  FROM units a JOIN units b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT label_a, label_b,
       round(sqrt(CAST(d2 AS DOUBLE)) / 1000000.0, 6) AS euclidean,
       round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) AS cosine
FROM pairs
"""


@query("centroid_distance_matrix", oracle=_CENT_DIST_ORACLE)
def q_centroid_distance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise euclidean/cosine between per-label centroids — the
    cluster-separation report that tells you whether labels are
    embedding-distinguishable before training on them.

    Two-stage shape: the corpus reduces to the k×dim centroid table
    (one aggregate, label_centroids), and only that tiny table
    self-joins per dimension — a broadcast hash join however large
    the corpus was. Centroid values are 6-dec means, so their 1e-6
    units are exact int64s and both engines accumulate identical
    squared/dot moments; the two sqrt/divide ops are written in the
    same order on both sides."""
    cent = q_label_centroids(spark, sf_dir).select(
        "label", "dim", F.round(F.col("centroid") * 1000000, 0).cast("long").alias("cu")
    )
    a = cent.select(
        F.col("label").alias("label_a"), F.col("dim").alias("dim_a"), F.col("cu").alias("cu_a")
    )
    b = cent.select(
        F.col("label").alias("label_b"), F.col("dim").alias("dim_b"), F.col("cu").alias("cu_b")
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("dim_a") == F.col("dim_b")) & (F.col("label_a") < F.col("label_b")),
    ).groupBy("label_a", "label_b").agg(
        F.sum((F.col("cu_a") - F.col("cu_b")) * (F.col("cu_a") - F.col("cu_b"))).alias("d2"),
        F.sum(F.col("cu_a") * F.col("cu_b")).alias("dot"),
        F.sum(F.col("cu_a") * F.col("cu_a")).alias("na"),
        F.sum(F.col("cu_b") * F.col("cu_b")).alias("nb"),
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(F.sqrt(F.col("d2").cast("double")) / 1000000.0, 6).alias("euclidean"),
        F.round(
            F.col("dot").cast("double")
            / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))),
            6,
        ).alias("cosine"),
    )
