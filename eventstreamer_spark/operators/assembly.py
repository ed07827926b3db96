"""Dataset assembly, composed end to end: the second flagship
pipeline (the first, ``curation_pipeline``, curates; this one turns a
curated pool into training input).

quality filter → benchmark decontamination → mixture rebalance →
deterministic split → packing report, as ONE declarative plan that
hash-matches an independent SQL oracle. Every stage is an
already-verified piece (text.py quality features, hygiene.py
contamination collision, sampling.py integer accept test and md5
split); the point of this query is that the governance and assembly
operators COMPOSE without glue code or intermediate materialization.

Scale posture: the benchmark shingle index broadcasts (tiny by
nature), the per-lang counts and global min broadcast (one row per
lang), the accept/split decisions are row-local integer/md5
arithmetic, and the only corpus-sized shuffles are the contamination
group-by and the final report aggregate — the same two exchanges the
standalone operators pay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eventstreamer_spark.functions import hashing as H
from eventstreamer_spark.operators.hygiene import BENCH_FILTER, CONTAM_MIN_SHARED
from eventstreamer_spark.operators.sampling import _SPLIT_CASE_DUCK, _SPLIT_CASE_SPARK, HEX_DEN
from eventstreamer_spark.operators.text import q_text_stats_quality
from eventstreamer_spark.registry import query
from eventstreamer_spark.sources.tables import load_table_parallel

ASSEMBLY_MIN_QUALITY = 0.5
BIN_TOKENS = 2048

_TOKS_D = H.TOKENS_DUCK.format(col="text")

_ASSEMBLY_ORACLE = f"""
WITH feats AS (
  SELECT doc_id, lang,
         len({_TOKS_D}) AS n_tokens,
         CASE WHEN len({_TOKS_D}) BETWEEN 20 AND 90 THEN 0.5 ELSE 0.0 END
         + CASE WHEN len(list_distinct({_TOKS_D})) * 1.0 / len({_TOKS_D}) > 0.5
                THEN 0.3 ELSE 0.0 END
         + CASE WHEN len(list_filter({_TOKS_D},
                         t -> t IN ('the','a','of','and','in','to','is','for','on','with'))) * 1.0
                     / len({_TOKS_D}) BETWEEN 0.01 AND 0.5
                THEN 0.2 ELSE 0.0 END AS quality_score
  FROM documents
), kept AS (
  SELECT * FROM feats
  WHERE quality_score >= {ASSEMBLY_MIN_QUALITY} AND NOT ({BENCH_FILTER})
), sh AS (
  SELECT doc_id, {H.shingles_duck("text")} AS sh FROM documents
), inv AS (
  SELECT doc_id, unnest(sh) AS shingle FROM sh
), bench AS (
  SELECT doc_id AS bench_id, shingle FROM inv WHERE {BENCH_FILTER}
), contam AS (
  SELECT t.doc_id
  FROM inv t JOIN bench b ON t.shingle = b.shingle
  WHERE NOT ({BENCH_FILTER.replace("doc_id", "t.doc_id")})
  GROUP BY t.doc_id, b.bench_id
  HAVING count(*) >= {CONTAM_MIN_SHARED}
), clean AS (
  SELECT k.* FROM kept k WHERE k.doc_id NOT IN (SELECT doc_id FROM contam)
), counts AS (
  SELECT lang, count(*) AS n FROM clean GROUP BY lang
), mn AS (
  SELECT min(n) AS min_n FROM counts
), balanced AS (
  SELECT c.*
  FROM clean c JOIN counts ct USING (lang) CROSS JOIN mn m
  WHERE CAST('0x' || substring(md5(CAST(c.doc_id AS VARCHAR)), 1, 6) AS BIGINT)
        * ct.n < m.min_n * {HEX_DEN}
)
SELECT {_SPLIT_CASE_DUCK} AS split,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST((sum(n_tokens) + {BIN_TOKENS - 1}) // {BIN_TOKENS} AS BIGINT) AS n_bins
FROM balanced
GROUP BY 1, 2
"""


@query("assembly_pipeline", oracle=_ASSEMBLY_ORACLE)
def q_assembly_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality → decontaminate → rebalance → split → packing report,
    as one composed plan (see module docstring for the plan shape)."""
    feats = q_text_stats_quality(spark, sf_dir).select(
        "doc_id", "lang", "n_tokens", "quality_score"
    )
    kept = feats.filter(
        (F.col("quality_score") >= ASSEMBLY_MIN_QUALITY) & ~F.expr(BENCH_FILTER)
    )
    docs = (
        load_table_parallel(spark, sf_dir, "documents")
        .select("doc_id", H.tokens_expr("text").alias("toks"))
        .select("doc_id", H.shingles_from_tokens_expr("toks").alias("sh"))
    )
    inv = docs.select("doc_id", F.explode_outer("sh").alias("shingle")).filter(
        F.col("shingle").isNotNull()
    )
    bench = inv.filter(F.expr(BENCH_FILTER)).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    contam = (
        inv.filter(~F.expr(BENCH_FILTER))
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= CONTAM_MIN_SHARED)
        .select("doc_id")
        .distinct()
    )
    # explicit hint: the contaminated-id set is provably small (bounded
    # by benchmark collisions) but sits behind two aggregates, so
    # Catalyst's static size estimate would sort-merge the anti join
    clean = kept.join(F.broadcast(contam), "doc_id", "left_anti")
    counts = clean.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    mn = counts.agg(F.min("n").alias("min_n"))
    hash24 = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT)"
    )
    balanced = (
        clean.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(mn))
        .filter(hash24 * F.col("n") < F.col("min_n") * F.lit(HEX_DEN))
    )
    return (
        balanced.withColumn("split", F.expr(_SPLIT_CASE_SPARK))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.expr(f"CAST((sum(n_tokens) + {BIN_TOKENS - 1}) DIV {BIN_TOKENS} AS BIGINT)").alias(
                "n_bins"
            ),
        )
    )
