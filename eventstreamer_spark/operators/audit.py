"""Corpus / pipeline audit reports: the measured-quality layer.

Where text.py and dedup.py implement the curation operators, this
module implements the REPORTS a data team runs to judge them:
vocabulary coverage (OOV rates against a frozen top-k vocab),
near-duplication broken down by source pair, MinHash estimator
calibration against exact jaccard, embedding norm profiles, per-source
quality rollups, changelog compaction, and priority share drift.

Every query keeps the established determinism contract (integer-scaled
means, rounded floats, explicit tie-breaks) so all of them hash-check
against DuckDB oracles, and the small sides (vocab, cutoffs, pair
tables) always broadcast — shapes pinned in tests/test_plans.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eventstreamer_spark.functions import hashing as H
from eventstreamer_spark.memo import BoundedMemo, free_local_checkpoint, live_hit
from eventstreamer_spark.operators.ranks import finalize_report, parallel_rank
from eventstreamer_spark.registry import query
from eventstreamer_spark.session import shuffle_partitions
from eventstreamer_spark.sources.tables import load_table, load_table_parallel

_TOKS_S = H.TOKENS_SPARK.format(col="text")
_TOKS_D = H.TOKENS_DUCK.format(col="text")

# Integer-scaled 6-decimal mean: both engines sum identical integers,
# so the average cannot drift across summation orders. Shared with the
# other float-mean oracles via functions.numeric.
from eventstreamer_spark.functions.numeric import MEAN6_DUCK as _MEAN6_DUCK
from eventstreamer_spark.functions.numeric import mean6_spark as _mean6_spark
from eventstreamer_spark.functions.numeric import sumk_spark as _sumk_spark


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV rate (tokenizer-freeze audit)
# ---------------------------------------------------------------------------

VOCAB_SIZE = 20

_OOV_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS_D}) AS token FROM documents
), vocab AS (
  SELECT token FROM (
    SELECT token, count(*) AS tf FROM tok GROUP BY token
    ORDER BY tf DESC, token LIMIT {VOCAB_SIZE}
  )
), per_doc AS (
  SELECT t.doc_id,
         round(count(*) FILTER (WHERE v.token IS NULL) * 1.0 / count(*), 6) AS oov_rate
  FROM tok t LEFT JOIN vocab v ON t.token = v.token
  GROUP BY t.doc_id
)
SELECT CASE WHEN oov_rate < 0.25 THEN 'lt25' WHEN oov_rate < 0.35 THEN 'lt35'
            WHEN oov_rate < 0.45 THEN 'lt45' ELSE 'ge45' END AS oov_band,
       CAST(count(*) AS BIGINT) AS n_docs,
       {_MEAN6_DUCK.format(v="oov_rate")} AS avg_oov_rate
FROM per_doc GROUP BY 1
"""


@query("vocab_oov_coverage", oracle=_OOV_ORACLE)
def q_vocab_oov_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary audit: freeze the top-``VOCAB_SIZE`` corpus
    tokens as the vocabulary, measure each document's OOV token rate,
    report the banded histogram — the coverage check run before
    freezing a tokenizer. The synthetic corpus has only 31 distinct
    tokens, so the frozen vocab is deliberately sub-corpus-sized (20)
    to keep the measured distribution non-degenerate; at real scale
    the same plan runs with the actual vocab budget.

    The vocab is a TakeOrdered top-k over the token counts (tiny) that
    rejoins the exploded corpus as a broadcast left join; per-doc
    rates aggregate on doc_id and the band histogram is a fixed-size
    rollup. Two corpus-scale shuffles (token tf, per-doc rate) — both
    unavoidable, neither carries more than (key, count)."""
    d = load_table_parallel(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.expr(_TOKS_S)).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), "token")
        .limit(VOCAB_SIZE)
        .select(F.col("token").alias("v_token"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), tok.token == F.col("v_token"), "left")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("v_token").isNull().cast("long")) * F.lit(1.0)
                / F.count(F.lit(1)),
                6,
            ).alias("oov_rate")
        )
    )
    band = (
        F.when(F.col("oov_rate") < 0.25, "lt25")
        .when(F.col("oov_rate") < 0.35, "lt35")
        .when(F.col("oov_rate") < 0.45, "lt45")
        .otherwise("ge45")
    )
    return per_doc.groupBy(band.alias("oov_band")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        _mean6_spark(F.col("oov_rate")).alias("avg_oov_rate"),
    )


# ---------------------------------------------------------------------------
# Near-duplication by source pair (where is the duplication coming from?)
# ---------------------------------------------------------------------------

from eventstreamer_spark.operators.dedup import _MINHASH_ORACLE, minhash_pairs_for

_SOURCE_MATRIX_ORACLE = f"""
WITH pairs AS ({_MINHASH_ORACLE}),
lab AS (
  SELECT p.est_jaccard,
         least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b
  FROM pairs p
  JOIN documents da ON p.doc_a = da.doc_id
  JOIN documents db ON p.doc_b = db.doc_id
)
SELECT source_a, source_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       {_MEAN6_DUCK.format(v="est_jaccard")} AS avg_est_jaccard
FROM lab GROUP BY 1, 2
"""


@query("neardup_source_matrix", oracle=_SOURCE_MATRIX_ORACLE)
def q_neardup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs attributed to (source, source) cells — the
    "which feeds overlap" audit that decides what to drop or
    re-crawl. Reuses the MinHash+LSH pair table (session-memoized,
    dedup.minhash_pairs_for), then joins it against the doc→source
    dimension twice; the pair side broadcasts, sources normalize to
    an unordered cell via least/greatest."""
    pairs = minhash_pairs_for(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        F.broadcast(pairs)
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            _mean6_spark(F.col("est_jaccard")).alias("avg_est_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash calibration (estimated vs exact jaccard on LSH candidates)
# ---------------------------------------------------------------------------

_CALIBRATION_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, {_TOKS_D} AS toks FROM documents
), sh AS (
  SELECT doc_id, {H.shingles_from_tokens_duck("toks")} AS sh FROM tk
), pairs AS ({_MINHASH_ORACLE}),
scored AS (
  SELECT p.est_jaccard,
         round(len(list_intersect(a.sh, b.sh)) * 1.0 /
               (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
           AS exact_jaccard
  FROM pairs p JOIN sh a ON p.doc_a = a.doc_id JOIN sh b ON p.doc_b = b.doc_id
)
SELECT CASE WHEN est_jaccard < 0.7 THEN 'est_050_070'
            WHEN est_jaccard < 0.9 THEN 'est_070_090'
            ELSE 'est_090_100' END AS est_band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       {_MEAN6_DUCK.format(v="est_jaccard")} AS avg_est,
       {_MEAN6_DUCK.format(v="exact_jaccard")} AS avg_exact,
       {_MEAN6_DUCK.format(v="abs(est_jaccard - exact_jaccard)")} AS mean_abs_err
FROM scored GROUP BY 1
"""


@query("minhash_jaccard_calibration", oracle=_CALIBRATION_ORACLE)
def q_minhash_jaccard_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator calibration: on every LSH candidate pair, the 12-hash
    MinHash estimate vs the exact 3-gram jaccard, banded by estimate —
    the measured-quality report (ann_recall_at_k's pattern applied to
    the dedup path). A drifting hash family or banding bug shows up as
    mean_abs_err inflation and breaks the hash gate.

    The candidate pair table is LSH-bounded (tiny vs the corpus), so
    it broadcasts into the shingle-array dimension; exact jaccard is
    array_intersect arithmetic JVM-side. The pair table comes from the
    session memo (dedup.minhash_pairs_for) shared with the source
    matrix and the dedup query itself."""
    pairs = minhash_pairs_for(spark, sf_dir)
    sh = (
        load_table_parallel(spark, sf_dir, "documents")
        .select("doc_id", H.tokens_expr("text").alias("toks"))
        .select("doc_id", H.shingles_from_tokens_expr("toks").alias("sh"))
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    exact = F.round(
        inter * F.lit(1.0) / (F.size("sh_a") + F.size("sh_b") - inter), 6
    )
    band = (
        F.when(F.col("est_jaccard") < 0.7, "est_050_070")
        .when(F.col("est_jaccard") < 0.9, "est_070_090")
        .otherwise("est_090_100")
    )
    return (
        F.broadcast(pairs)
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("est_jaccard", exact.alias("exact_jaccard"))
        .groupBy(band.alias("est_band"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            _mean6_spark(F.col("est_jaccard")).alias("avg_est"),
            _mean6_spark(F.col("exact_jaccard")).alias("avg_exact"),
            _mean6_spark(F.abs(F.col("est_jaccard") - F.col("exact_jaccard"))).alias(
                "mean_abs_err"
            ),
        )
    )


# ---------------------------------------------------------------------------
# MinHash band tuning: the (bands × rows) Pareto table from ONE build
# ---------------------------------------------------------------------------

# The dedup-side twin of ivf_nprobe_sweep: before a 100 TB dedup run
# pins its LSH banding, it reads how candidate volume and detection
# trade as the 12-hash signature splits into (6×2, 4×3, 3×4, 2×6)
# bands — steeper S-curves (more rows per band) cut candidates but
# miss borderline pairs. All four configs band the SAME signature
# table in one tagged explode + one (cfg, key) self-join; truth =
# exact 3-gram jaccard ≥ 0.5 over the DISTINCT union of candidate
# pairs (recall is relative to pairs ANY config surfaces — the
# standard tuning-table scope; an all-pairs truth is the O(n²) the
# banding exists to avoid, and the 6×2 config's ~0.82 capture at
# j=0.5 makes the union a tight proxy).

_TUNING_CONFIGS = ((6, 2), (4, 3), (3, 4), (2, 6))
_TUNING_JTHR = "0.5"


def _tuning_keys(engine: str) -> str:
    """Array-of-(cfg, key) literal over a `sig` column: every config's
    band keys, salted with the config tag so keys never collide across
    configs. Identical construction in both engines."""
    entries = []
    for b, r in _TUNING_CONFIGS:
        for i in range(b):
            if engine == "spark":
                elems = ", ".join(
                    f"element_at(sig, {i * r + j + 1})" for j in range(r)
                )
                key = f"md5(concat_ws('|', {elems}, 'b{b}r{r}band{i}'))"
                entries.append(f"named_struct('cfg', 'b{b}r{r}', 'key', {key})")
            else:
                elems = ", ".join(f"sig[{i * r + j + 1}]" for j in range(r))
                key = f"md5(concat_ws('|', {elems}, 'b{b}r{r}band{i}'))"
                entries.append(f"struct_pack(cfg := 'b{b}r{r}', key := {key})")
    body = ", ".join(entries)
    return f"array({body})" if engine == "spark" else f"[{body}]"


_TUNING_CFG_VALUES = ", ".join(
    f"('b{b}r{r}', CAST({b} AS BIGINT), CAST({r} AS BIGINT))"
    for b, r in _TUNING_CONFIGS
)

_BAND_TUNING_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, {H.TOKENS_DUCK.format(col="text")} AS toks FROM documents
), sh AS (
  SELECT doc_id, {H.shingles_from_tokens_duck("toks")} AS sh FROM tk
), sig AS (
  SELECT doc_id, {H.minhash_sig_duck("sh")} AS sig FROM sh
), k2 AS (
  SELECT doc_id, e.cfg AS cfg, e.key AS key
  FROM (SELECT doc_id, unnest({_tuning_keys("duck")}) AS e FROM sig)
), cand AS (
  SELECT DISTINCT a.cfg, b.doc_id AS doc_a, a.doc_id AS doc_b
  FROM k2 a JOIN k2 b ON a.cfg = b.cfg AND a.key = b.key
   AND b.doc_id < a.doc_id
), pu AS (SELECT DISTINCT doc_a, doc_b FROM cand),
ex AS (
  SELECT p.doc_a, p.doc_b,
         round(len(list_intersect(x.sh, y.sh)) * 1.0 /
               (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6)
           AS ej
  FROM pu p JOIN sh x ON x.doc_id = p.doc_a JOIN sh y ON y.doc_id = p.doc_b
),
tr AS (SELECT doc_a, doc_b FROM ex WHERE ej >= {_TUNING_JTHR}),
tt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM tr),
percfg AS (
  SELECT c.cfg,
         CAST(count(*) AS BIGINT) AS n_cands,
         CAST(count(*) FILTER (WHERE t.doc_a IS NOT NULL) AS BIGINT) AS n_true
  FROM cand c LEFT JOIN tr t
    ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
  GROUP BY c.cfg
)
SELECT s.cfg, s.bands, s.rows_per_band,
       COALESCE(p.n_cands, 0) AS n_candidate_pairs,
       COALESCE(p.n_true, 0) AS n_true_pairs,
       CASE WHEN COALESCE(p.n_cands, 0) = 0 THEN 0.0
            ELSE floor(p.n_true * 1000000.0 / p.n_cands + 0.5) / 1000000.0
       END AS precision,
       CASE WHEN n_truth = 0 THEN 0.0
            ELSE floor(COALESCE(p.n_true, 0) * 1000000.0 / n_truth + 0.5)
                 / 1000000.0
       END AS recall
FROM (VALUES {_TUNING_CFG_VALUES}) AS s(cfg, bands, rows_per_band)
LEFT JOIN percfg p ON p.cfg = s.cfg
CROSS JOIN tt
"""


@query("minhash_band_tuning", oracle=_BAND_TUNING_ORACLE)
def q_minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH banding Pareto table (the dedup twin of
    ivf_nprobe_sweep): candidate volume, exact-jaccard-verified true
    pairs, precision and recall for every (bands × rows) split of the
    12-hash MinHash signature — read before pinning the banding of a
    100 TB dedup run.

    Plan shape: ONE signature build (the shared minhash chain), ONE
    tagged explode emitting every config's salted band keys, ONE
    (cfg, key) self-equi-join — never an all-pairs pass; exact
    jaccard computes once per DISTINCT candidate pair (the bounded
    union across configs) and joins back per config. The 4-row config
    spine keeps empty configs visible at 0. Recall is relative to the
    union-of-configs truth (the O(n²) ground truth is what banding
    exists to avoid — scope documented in the section comment)."""
    from eventstreamer_spark.operators.dedup import _minhash_docs

    sig = _minhash_docs(spark, sf_dir)
    k2 = sig.select(
        "doc_id", F.explode(F.expr(_tuning_keys("spark"))).alias("e")
    ).select("doc_id", F.col("e.cfg").alias("cfg"), F.col("e.key").alias("key"))
    cand = (
        k2.alias("a")
        .join(
            k2.alias("b"),
            (F.col("a.cfg") == F.col("b.cfg"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("b.doc_id") < F.col("a.doc_id")),
        )
        .select(
            F.col("a.cfg").alias("cfg"),
            F.col("b.doc_id").alias("doc_a"),
            F.col("a.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # feeds pair union + per-config counts
    )
    sh = (
        load_table_parallel(spark, sf_dir, "documents")
        .select("doc_id", H.tokens_expr("text").alias("toks"))
        .select("doc_id", H.shingles_from_tokens_expr("toks").alias("sh"))
    )
    pu = cand.select("doc_a", "doc_b").distinct()
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    # No broadcast hint on pu: unlike the bounded query-side broadcasts
    # elsewhere, the candidate-pair union is DATA-DEPENDENT (grows with
    # corpus size x duplicate density), so forcing it driver-side is a
    # memory hazard at scale — let AQE broadcast it only while it is
    # actually small (ADVICE r10 item 3).
    ex = (
        pu
        .join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                inter * F.lit(1.0) / (F.size("sh_a") + F.size("sh_b") - inter), 6
            ).alias("ej"),
        )
    )
    tr = ex.filter(F.col("ej") >= float(_TUNING_JTHR)).select("doc_a", "doc_b")
    tt = tr.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    percfg = (
        cand.join(tr.withColumn("_t", F.lit(1)), ["doc_a", "doc_b"], "left")
        .groupBy("cfg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cands"),
            F.sum(F.coalesce(F.col("_t"), F.lit(0))).cast("long").alias("n_true"),
        )
    )
    spine = spark.createDataFrame(
        [(f"b{b}r{r}", b, r) for b, r in _TUNING_CONFIGS],
        "cfg string, bands long, rows_per_band long",
    )
    return (
        spine.join(percfg, "cfg", "left")
        .crossJoin(F.broadcast(tt))
        .select(
            "cfg",
            "bands",
            "rows_per_band",
            F.coalesce("n_cands", F.lit(0)).cast("long").alias("n_candidate_pairs"),
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true_pairs"),
            F.when(F.coalesce("n_cands", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.floor(
                    F.col("n_true") * F.lit(1000000.0) / F.col("n_cands") + F.lit(0.5)
                )
                / 1000000.0
            )
            .alias("precision"),
            F.when(F.col("n_truth") == 0, F.lit(0.0))
            .otherwise(
                F.floor(
                    F.coalesce("n_true", F.lit(0)) * F.lit(1000000.0)
                    / F.col("n_truth")
                    + F.lit(0.5)
                )
                / 1000000.0
            )
            .alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# SRP angle calibration: is the sign-bit Hamming distance an angle?
# ---------------------------------------------------------------------------

# The estimator audit for the SRP-LSH family (the exact analog of
# minhash_jaccard_calibration for the embedding side): Goemans &
# Williamson / Charikar give P(sign bit differs) = θ/π, so a pair's
# 8-bit Hamming distance h implies cos(π·h/8). Per Hamming bucket the
# report compares that implied cosine against the measured mean exact
# cosine — the drift check that validates every SRP probe/band route
# before it prunes a 100 TB corpus.

# round(cos(π·h/8)·1e6) for h = 0..N_PLANES — identical literals in
# both engines; no trig enters the cross-engine contract.
_SRP_IMPLIED_COS_E6 = (
    1000000, 923880, 707107, 382683, 0, -382683, -707107, -923880, -1000000,
)

_SRP_CAL_QFILTER = "vec_id % 100 = 0"

_SRP_HAM_D = (
    "CAST(list_sum(list_transform(generate_series(1, 8), "
    "i -> CASE WHEN substring(q.bucket, i, 1) != substring(e.bucket, i, 1) "
    "THEN 1 ELSE 0 END)) AS BIGINT)"
)

_SRP_CAL_ORACLE = f"""
WITH b AS (
  SELECT * FROM (
    SELECT vec_id, {H.quantized_unit_duck("embedding")} AS uq,
           {H.srp_bucket_duck("embedding")} AS bucket FROM embeddings
  ) WHERE uq[1] IS NOT NULL
),
q AS (SELECT * FROM b WHERE {_SRP_CAL_QFILTER}),
pairs AS (
  SELECT {_SRP_HAM_D} AS hamming,
         CAST(round(round({H.qcosine_duck("q.uq", "e.uq")}, 5) * 100000, 0)
              AS BIGINT) * 10 AS cos_e6
  FROM q JOIN b e ON q.vec_id != e.vec_id
),
sc AS (
  SELECT hamming, cos_e6,
         ([{", ".join(str(c) for c in _SRP_IMPLIED_COS_E6)}])[hamming + 1]
           AS implied_e6
  FROM pairs
)
SELECT hamming,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(implied_e6 AS DOUBLE) / 1000000.0 AS implied_cos,
       floor(sum(cos_e6) * 1.0 / count(*) + 0.5) / 1000000.0 AS avg_exact_cos,
       floor(sum(abs(implied_e6 - cos_e6)) * 1.0 / count(*) + 0.5) / 1000000.0
         AS mean_abs_err
FROM sc GROUP BY hamming, implied_e6
"""


@query("srp_angle_calibration", oracle=_SRP_CAL_ORACLE)
def q_srp_angle_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-Hamming-bucket SRP estimator calibration: the implied
    cosine cos(π·h/planes) vs the measured mean exact cosine and the
    mean absolute error — the angle-estimator twin of the MinHash
    jaccard calibration, validating the sign-bit geometry every SRP
    probe/band prefilter leans on (the ann_recall_at_k docstring's
    binomial-envelope argument, now as a per-bucket measured table).

    Plan shape: the query subset broadcasts against the corpus (the
    exact-cosine pass is O(q·n) BY CONTRACT — audit tier like every
    calibration, x10-capped in the harness); Hamming distance is a
    row-local 8-char compare; the report is one ≤9-key aggregation.
    Exactness: implied cosines are inlined integer literals (no trig
    cross-engine), exact cosines are the rounded-to-5 integer kernel,
    and both means divide exact integer sums once."""
    e = load_table_parallel(spark, sf_dir, "embeddings")
    b = (
        H.with_quantized_unit(e, "embedding", "uq", drop_zero_norm=True)
        .select("vec_id", "uq", H.srp_bucket_expr("embedding").alias("bucket"))
        .localCheckpoint(eager=False)
    )
    q = b.filter(F.expr(_SRP_CAL_QFILTER)).select(
        F.col("vec_id").alias("query_id"),
        F.col("uq").alias("q_uq"),
        F.col("bucket").alias("q_bucket"),
    )
    ham = F.expr(
        "CAST(aggregate(sequence(1, 8), 0, (acc, i) -> acc + "
        "IF(substring(q_bucket, i, 1) != substring(bucket, i, 1), 1, 0)) AS BIGINT)"
    )
    implied = "array({})".format(", ".join(f"{c}L" for c in _SRP_IMPLIED_COS_E6))
    pairs = (
        F.broadcast(q)
        .join(b, F.col("query_id") != F.col("vec_id"))
        .select(
            ham.alias("hamming"),
            # round AGAIN at 0 decimals before the cast: Spark's cast
            # truncates while DuckDB's rounds (the binning trap), and
            # round5*1e5 can sit an ulp under its integer
            (
                F.round(F.round(H.qcosine_expr("q_uq", "uq"), 5) * 100000, 0).cast(
                    "long"
                )
                * 10
            ).alias("cos_e6"),
        )
        .withColumn(
            "implied_e6",
            F.expr(f"element_at({implied}, CAST(hamming + 1 AS INT))"),
        )
    )
    return (
        pairs.groupBy("hamming", "implied_e6")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("cos_e6").alias("_sc"),
            F.sum(F.abs(F.col("implied_e6") - F.col("cos_e6"))).alias("_se"),
        )
        .select(
            "hamming",
            "n_pairs",
            (F.col("implied_e6").cast("double") / F.lit(1000000.0)).alias(
                "implied_cos"
            ),
            (
                F.floor(F.col("_sc") * F.lit(1.0) / F.col("n_pairs") + F.lit(0.5))
                / 1000000.0
            ).alias("avg_exact_cos"),
            (
                F.floor(F.col("_se") * F.lit(1.0) / F.col("n_pairs") + F.lit(0.5))
                / 1000000.0
            ).alias("mean_abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding norm profile (per generating label)
# ---------------------------------------------------------------------------

_NORM_ORACLE = f"""
WITH n AS (
  SELECT CAST(label AS INTEGER) AS label,
         round(sqrt(list_sum(list_transform(embedding, v -> v * v))), 6) AS norm
  FROM embeddings
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       {_MEAN6_DUCK.format(v="norm")} AS avg_norm,
       round(min(norm), 6) AS min_norm,
       round(max(norm), 6) AS max_norm
FROM n GROUP BY label
"""


@query("embedding_norm_stats", oracle=_NORM_ORACLE)
def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2 norm profile — the sanity report run before any
    cosine pipeline (catches unnormalized feeds, dead/zero vectors,
    scale drift between shards). Row-local aggregate arithmetic, one
    shuffle of (label, rounded norm); min/max are exact, the mean is
    integer-scaled."""
    e = load_table_parallel(spark, sf_dir, "embeddings")
    norm = F.round(
        F.sqrt(F.expr("aggregate(embedding, 0D, (a, v) -> a + CAST(v AS DOUBLE) * v)")),
        6,
    )
    return (
        e.select(F.col("label").cast("int").alias("label"), norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            _mean6_spark(F.col("norm")).alias("avg_norm"),
            F.round(F.min("norm"), 6).alias("min_norm"),
            F.round(F.max("norm"), 6).alias("max_norm"),
        )
    )


# ---------------------------------------------------------------------------
# Quality rollup by (source, lang)
# ---------------------------------------------------------------------------

from eventstreamer_spark.operators.text import _SW_D, _SW_S  # same marker sets

_QUALITY_S = (
    f"CASE WHEN size({_TOKS_S}) BETWEEN 20 AND 90 THEN 0.5D ELSE 0.0D END"
    f" + CASE WHEN size(array_distinct({_TOKS_S})) * CAST(1 AS DOUBLE) / size({_TOKS_S}) > 0.5"
    f" THEN 0.3D ELSE 0.0D END"
    f" + CASE WHEN {_SW_S} * CAST(1 AS DOUBLE) / size({_TOKS_S}) BETWEEN 0.01 AND 0.5"
    f" THEN 0.2D ELSE 0.0D END"
)
_QUALITY_D = (
    f"CASE WHEN len({_TOKS_D}) BETWEEN 20 AND 90 THEN 0.5 ELSE 0.0 END"
    f" + CASE WHEN len(list_distinct({_TOKS_D})) * 1.0 / len({_TOKS_D}) > 0.5 THEN 0.3 ELSE 0.0 END"
    f" + CASE WHEN {_SW_D} * 1.0 / len({_TOKS_D}) BETWEEN 0.01 AND 0.5 THEN 0.2 ELSE 0.0 END"
)

_QUALITY_ROLLUP_ORACLE = f"""
WITH q AS (
  SELECT source, lang, round({_QUALITY_D}, 6) AS quality FROM documents
)
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       {_MEAN6_DUCK.format(v="quality")} AS avg_quality,
       CAST(count(*) FILTER (WHERE quality >= 0.8) AS BIGINT) AS n_high_quality
FROM q GROUP BY source, lang
"""


@query("quality_by_source_report", oracle=_QUALITY_ROLLUP_ORACLE)
def q_quality_by_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation dashboard rollup: composite quality score (same
    formula as text_stats_quality) aggregated per (source, lang) with
    a high-quality share — what a team reads to decide per-source
    sampling weights. Single hash-aggregate shuffle."""
    d = load_table(spark, sf_dir, "documents")
    q = d.select(
        "source", "lang", F.round(F.expr(_QUALITY_S), 6).alias("quality")
    )
    return q.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        _mean6_spark(F.col("quality")).alias("avg_quality"),
        F.sum((F.col("quality") >= 0.8).cast("long")).alias("n_high_quality"),
    )


# ---------------------------------------------------------------------------
# Changelog compaction (events as an upsert stream)
# ---------------------------------------------------------------------------

_COMPACTION_ORACLE = """
WITH latest AS (
  SELECT user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_keys,
       sum(CAST(round(value * 10000, 0) AS BIGINT)) / 10000.0 AS total_latest_value,
       round(min(value), 6) AS min_latest_value,
       round(max(value), 6) AS max_latest_value
FROM latest WHERE rn = 1
GROUP BY event_type
"""


@query("cdc_changelog_compaction", oracle=_COMPACTION_ORACLE)
def q_cdc_changelog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert-stream compaction: events replayed as a changelog keyed
    by (user, type), latest-wins by (ts, event_id), then the compacted
    state summarized per type — the batch twin of a CDC materialized
    view refresh. One shuffle on the compaction key (window argmax),
    one bounded rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return latest.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        _sumk_spark(F.col("value"), 10000).alias("total_latest_value"),
        F.round(F.min("value"), 6).alias("min_latest_value"),
        F.round(F.max("value"), 6).alias("max_latest_value"),
    )


# ---------------------------------------------------------------------------
# Order-priority share drift by year
# ---------------------------------------------------------------------------

_PRIORITY_SHARE_ORACLE = """
WITH agg AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_orders,
         sum(CAST(round(o_totalprice * 10000, 0) AS BIGINT)) / 10000.0 AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT order_year, o_orderpriority, n_orders, revenue,
       round(n_orders * 1.0 / sum(n_orders) OVER (PARTITION BY order_year), 6)
         AS share_in_year
FROM agg
"""


@query("priority_share_by_year", oracle=_PRIORITY_SHARE_ORACLE)
def q_priority_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix drift: per-year priority counts/revenue with
    within-year share — the aggregate-then-window shape (the window
    normalizes a #years × #priorities table, never raw orders)."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year"), "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _sumk_spark(F.col("o_totalprice"), 10000).alias("revenue"),
    )
    w = Window.partitionBy("order_year")
    return agg.select(
        "order_year",
        "o_orderpriority",
        "n_orders",
        "revenue",
        F.round(F.col("n_orders") * F.lit(1.0) / F.sum("n_orders").over(w), 6).alias(
            "share_in_year"
        ),
    )


# ---------------------------------------------------------------------------
# Dedup method agreement (textual vs semantic duplicate confusion)
# ---------------------------------------------------------------------------


def _method_agreement_oracle() -> str:
    from eventstreamer_spark.operators.dedup import (
        _MINHASH_ORACLE,
        _SIMHASH_ORACLE,
        _emb_pref_oracle,
    )

    return f"""
WITH mh AS MATERIALIZED ({_MINHASH_ORACLE}),
sh AS MATERIALIZED ({_SIMHASH_ORACLE}),
em AS MATERIALIZED ({_emb_pref_oracle(0.45)}),
all_pairs AS (
  SELECT doc_a, doc_b, 'minhash' AS method FROM mh
  UNION ALL SELECT doc_a, doc_b, 'simhash' FROM sh
  UNION ALL SELECT vec_a AS doc_a, vec_b AS doc_b, 'embedding' FROM em
)
SELECT doc_a, doc_b,
       CAST(max(CASE WHEN method = 'minhash' THEN 1 ELSE 0 END) AS INTEGER)
         AS by_minhash,
       CAST(max(CASE WHEN method = 'simhash' THEN 1 ELSE 0 END) AS INTEGER)
         AS by_simhash,
       CAST(max(CASE WHEN method = 'embedding' THEN 1 ELSE 0 END) AS INTEGER)
         AS by_embedding,
       CAST(count(DISTINCT method) AS BIGINT) AS n_methods
FROM all_pairs
GROUP BY doc_a, doc_b
"""


@query("dedup_method_agreement", oracle=_method_agreement_oracle())
def q_dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-method duplicate-detection confusion: every candidate
    pair found by ANY of MinHash-LSH (est_jaccard ≥ 0.5), SimHash
    (hamming ≤ 3), or SRP-prefiltered embedding cosine (≥ 0.45), with
    per-method hit flags — the audit a data team reads to decide
    whether textual and semantic dedup are finding the SAME
    duplicates (n_methods ≥ 2) or complementary ones (n_methods = 1),
    i.e. whether running both stages pays for itself.

    The fixtures give documents and embeddings one shared id space
    (FIXTURES.md: 500 rows each, ids 0-499; embeddings[i] embeds
    documents[i]), which is what lets the embedding pairs union with
    the text pairs. Pure composition: all THREE pair
    tables come from session memos (minhash/simhash/embedding
    *_pairs_for — consumers of the verified operators, which
    themselves always re-run their own pipelines); the union is
    pair-table-sized (LSH/blocking-bounded), so the final groupBy
    shuffles only candidate ids + method tags."""
    from eventstreamer_spark.operators.dedup import (
        embedding_prefiltered_pairs_for,
        minhash_pairs_for,
        simhash_pairs_for,
    )

    mh = minhash_pairs_for(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit("minhash").alias("method")
    )
    sh = simhash_pairs_for(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit("simhash").alias("method")
    )
    em = embedding_prefiltered_pairs_for(spark, sf_dir, threshold=0.45).select(
        F.col("vec_a").alias("doc_a"),
        F.col("vec_b").alias("doc_b"),
        F.lit("embedding").alias("method"),
    )
    return (
        mh.unionByName(sh)
        .unionByName(em)
        .groupBy("doc_a", "doc_b")
        .agg(
            F.max((F.col("method") == "minhash").cast("int")).alias("by_minhash"),
            F.max((F.col("method") == "simhash").cast("int")).alias("by_simhash"),
            F.max((F.col("method") == "embedding").cast("int")).alias(
                "by_embedding"
            ),
            F.countDistinct("method").alias("n_methods"),
        )
    )


# ---------------------------------------------------------------------------
# Selection-method agreement (DSIR vs trained classifier vs heuristic)
# ---------------------------------------------------------------------------

# The dedup surface has dedup_method_agreement; this is its twin for
# the SELECTION surface: do the three scoring families — DSIR
# importance weights, the trained ridge classifier, and the heuristic
# quality score — rank the corpus the same way? Reported as exact
# Spearman rank correlation plus top-quarter selection overlap for
# each method pair. Audit-grade: ranks are GLOBAL row_numbers (one
# single-partition window per method), fine for a report, documented
# never-in-pipeline — the selection queries themselves rank per
# source/shard.

SELECTION_TOPQ_FRAC = 0.25


def _sel_agreement_oracle() -> str:
    """Assembled from the shared generators (_qc_parts prefix 'c',
    _dsir_parts prefix 'd') — no re-derived SQL. Spearman's rho =
    1 - 6Σd²/(n(n²-1)) with the numerator/denominator kept integer
    until one identical-operand double division, then floor6."""
    from eventstreamer_spark.operators.curation import _dsir_parts
    from eventstreamer_spark.operators.quality import _qc_parts
    from eventstreamer_spark.operators.text import QUALITY_DUCK

    parts = _qc_parts(p="c") + _dsir_parts(p="d")
    parts.append(
        f"""hq AS (
  SELECT doc_id, CAST(round({QUALITY_DUCK} * 10, 0) AS BIGINT) AS q10
  FROM documents)"""
    )
    parts.append(
        """j AS MATERIALIZED (
  SELECT s.doc_id, s.score_e6 AS s_clf, dd.s_e6 AS s_dsir, h.q10
  FROM cscores s JOIN dscored dd ON s.doc_id = dd.doc_id
  JOIN hq h ON s.doc_id = h.doc_id)"""
    )
    parts.append(
        """rk AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (ORDER BY s_dsir DESC, doc_id) AS r_d,
         row_number() OVER (ORDER BY s_clf DESC, doc_id) AS r_c,
         row_number() OVER (ORDER BY q10 DESC, doc_id) AS r_q
  FROM j)"""
    )
    parts.append(
        f"""nrow AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS n,
         GREATEST(1, CAST(floor(count(*) * {SELECTION_TOPQ_FRAC}) AS BIGINT)) AS k
  FROM j)"""
    )
    parts.append(
        """ag AS MATERIALIZED (
  SELECT CAST(any_value(nrow.n) AS BIGINT) AS n,
         CAST(any_value(nrow.k) AS BIGINT) AS k,
         CAST(sum((r_d - r_c) * (r_d - r_c)) AS BIGINT) AS sd2_dc,
         CAST(sum((r_d - r_q) * (r_d - r_q)) AS BIGINT) AS sd2_dq,
         CAST(sum((r_c - r_q) * (r_c - r_q)) AS BIGINT) AS sd2_cq,
         CAST(sum(CASE WHEN r_d <= nrow.k AND r_c <= nrow.k THEN 1 ELSE 0 END) AS BIGINT) AS ov_dc,
         CAST(sum(CASE WHEN r_d <= nrow.k AND r_q <= nrow.k THEN 1 ELSE 0 END) AS BIGINT) AS ov_dq,
         CAST(sum(CASE WHEN r_c <= nrow.k AND r_q <= nrow.k THEN 1 ELSE 0 END) AS BIGINT) AS ov_cq
  FROM rk CROSS JOIN nrow)"""
    )
    rho = (
        "floor((n * (n * n - 1) - 6 * {sd2}) * 1000000.0"
        " / nullif(n * (n * n - 1), 0) + 0.5) / 1000000.0"
    )
    ovf = "floor({ov} * 1000000.0 / k + 0.5) / 1000000.0"
    rows = "\nUNION ALL\n".join(
        f"SELECT '{a}' AS method_a, '{b}' AS method_b, n, {sd2} AS sum_d2, "
        f"{rho.format(sd2=sd2)} AS spearman_rho, "
        f"{ovf.format(ov=ov)} AS topq_overlap FROM ag"
        for a, b, sd2, ov in (
            ("dsir", "classifier", "sd2_dc", "ov_dc"),
            ("dsir", "quality", "sd2_dq", "ov_dq"),
            ("classifier", "quality", "sd2_cq", "ov_cq"),
        )
    )
    return "WITH RECURSIVE " + ",\n".join(parts) + "\n" + rows


@query("selection_method_agreement", oracle=_sel_agreement_oracle())
def q_selection_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the three data-SELECTION families agree? Spearman-style rank
    correlation and top-quarter overlap between every pair of:
    DSIR per-gram log-ratio (curation.dsir_doc_scores), the trained
    ridge classifier score (quality.ridge_scores, weights retrained
    here via the shared exact-integer path), and the heuristic
    quality score (text.QUALITY_SPARK, ranked on its exact 10×
    integer class). Output: one row per method pair with n, Σd²,
    rho = 1 - 6Σd²/(n(n²-1)) (floor6 of an identical-integer-operand
    division — exact cross-engine), and |topA ∩ topB| / k for
    k = max(1, floor(0.25·n)).

    TIE SEMANTICS (deliberate, tiebreak-dependent): all three rankings
    are row_number with the SAME doc_id ASC tiebreak, not midranks —
    so the statistic is exact and reproducible cross-engine, but NOT
    classical (midrank) Spearman: the heuristic q10 score has large
    tie classes, and doc_id-resolved segments correlate across methods
    by construction, so the reported rho reads HIGHER than midrank
    Spearman would. Read it as "agreement under a shared deterministic
    tiebreak"; comparisons between pairs remain apples-to-apples
    because every ranking uses the identical rule (ADVICE r7).

    Scale shape (migrated r14, VERDICT r13 item 1): ONE parallel_rank
    pass ranks all three methods — the scored join stacks to
    (doc_id, method, score) long form and range-exchanges on
    (method, score DESC, doc_id); methods partition the composite
    order cleanly and every doc carries all three scores, so the
    per-method rank is EXACTLY global_rank − method_offset·n (offsets
    0/n/2n in the methods' lexicographic order) — three distributed
    sorts' worth of ranks for one exchange, one checkpoint, one
    bounded offset collect, no single-task window anywhere. The
    rank unstack is one (doc_id)-keyed aggregate; n and k land as
    driver literals (k = max(1, floor(0.25·n)), the same IEEE double
    floor the oracle computes); the 3-row report is eagerly
    checkpointed and the corpus-sized rank checkpoint frees
    immediately. Everything upstream of the rank is the shared
    linear-scaling scoring chains."""
    from eventstreamer_spark.operators.curation import dsir_doc_scores
    from eventstreamer_spark.operators.quality import (
        classifier_artifacts_memo,
        ridge_scores,
    )
    from eventstreamer_spark.operators.text import QUALITY_SPARK

    feats, _lab, w = classifier_artifacts_memo(spark, sf_dir)
    clf = ridge_scores(spark, sf_dir, w, feats=feats).select(
        "doc_id", F.col("score_e6").alias("s_clf")
    )
    dsir = dsir_doc_scores(spark, sf_dir).select(
        "doc_id", F.col("s_e6").alias("s_dsir")
    )
    hq = load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id",
        F.round(F.expr(QUALITY_SPARK) * 10, 0).cast("long").alias("q10"),
    )
    j = clf.join(dsir, "doc_id").join(hq, "doc_id")
    stacked = j.selectExpr(
        "doc_id",
        "stack(3, 'c', s_clf, 'd', s_dsir, 'q', q10) AS (m, s)",
    )
    ranked, n3, ck = parallel_rank(
        spark,
        stacked,
        [F.col("m"), F.col("s").desc(), F.col("doc_id")],
        rank_col="gr",
    )
    n = n3 // 3
    k = max(1, math.floor(n * SELECTION_TOPQ_FRAC))
    # methods sort 'c' < 'd' < 'q' in the composite order; each has
    # exactly n rows (inner joins), so per-method rank = gr − offset
    r = ranked.withColumn(
        "r",
        F.col("gr")
        - F.when(F.col("m") == "c", F.lit(0))
        .when(F.col("m") == "d", F.lit(n))
        .otherwise(F.lit(2 * n))
        .cast("long"),
    )
    rk = r.groupBy("doc_id").agg(
        F.max(F.when(F.col("m") == "d", F.col("r"))).alias("r_d"),
        F.max(F.when(F.col("m") == "c", F.col("r"))).alias("r_c"),
        F.max(F.when(F.col("m") == "q", F.col("r"))).alias("r_q"),
    )

    def d2(a, b):
        return F.sum((F.col(a) - F.col(b)) * (F.col(a) - F.col(b))).cast("long")

    def ov(a, b):
        return F.sum(
            ((F.col(a) <= F.lit(k)) & (F.col(b) <= F.lit(k))).cast("long")
        ).cast("long")

    ag = (
        rk.agg(
            d2("r_d", "r_c").alias("sd2_dc"),
            d2("r_d", "r_q").alias("sd2_dq"),
            d2("r_c", "r_q").alias("sd2_cq"),
            ov("r_d", "r_c").alias("ov_dc"),
            ov("r_d", "r_q").alias("ov_dq"),
            ov("r_c", "r_q").alias("ov_cq"),
        )
        .withColumn("n", F.lit(n).cast("long"))
        .withColumn("k", F.lit(k).cast("long"))
    )
    pairs = ag.selectExpr(
        "n",
        "k",
        "stack(3, "
        "'dsir', 'classifier', sd2_dc, ov_dc, "
        "'dsir', 'quality', sd2_dq, ov_dq, "
        "'classifier', 'quality', sd2_cq, ov_cq"
        ") AS (method_a, method_b, sum_d2, ovl)",
    )
    nn = F.nullif(
        F.col("n") * (F.col("n") * F.col("n") - F.lit(1).cast("long")),
        F.lit(0).cast("long"),
    )
    report = pairs.select(
        "method_a",
        "method_b",
        "n",
        "sum_d2",
        (
            F.floor(
                (
                    F.col("n") * (F.col("n") * F.col("n") - F.lit(1).cast("long"))
                    - F.lit(6).cast("long") * F.col("sum_d2")
                )
                * F.lit(1000000.0)
                / nn
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("spearman_rho"),
        (
            F.floor(F.col("ovl") * F.lit(1000000.0) / F.col("k") + F.lit(0.5))
            / F.lit(1000000.0)
        ).alias("topq_overlap"),
    )
    return finalize_report(report, ck)


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters, audited against exact counts
# ---------------------------------------------------------------------------

# The mergeable-sketch counting structure for token frequencies at
# stream/100 TB scale: CMS_D independent md5 hash rows of CMS_W
# counters; every (row, bucket) cell is a partial SUM, so the whole
# sketch builds in ONE aggregation with map-side combine and merges
# associatively across partitions/batches. Deterministic hashes mean
# the sketch itself — not just the exact counts — is replayed
# bit-identically by the oracle, and the top-k report audits the
# estimator the way minhash_jaccard_calibration audits MinHash:
# est >= exact always (one-sided error), overestimate quantified.

CMS_W = 64  # counters per hash row
CMS_D = 4  # independent hash rows
CMS_TOP_K = 20


def _cms_bucket(i: int, engine: str, col: str = "tok") -> str:
    """Row-i bucket for the token column expression ``col`` (md5-seeded
    like the minhash permutations). Parameterized on the column — the
    probe side passes a qualified name — rather than post-hoc string
    replace, which silently corrupts the oracle the moment another
    'tok' substring appears in the rendered SQL (ADVICE r7)."""
    if engine == "spark":
        return (
            f"CAST(conv(substring(md5(concat('{i}:', {col})), 1, 6), 16, 10) "
            f"AS BIGINT) % {CMS_W}"
        )
    return f"CAST('0x' || substring(md5('{i}:' || {col}), 1, 6) AS BIGINT) % {CMS_W}"


_CMS_ORACLE = f"""
WITH tokcnt AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest({_TOKS_D}) AS tok FROM documents)
  GROUP BY tok
),
cells AS MATERIALIZED (
  {" UNION ALL ".join(
      f"SELECT {i} AS i, {_cms_bucket(i, 'duck')} AS b, CAST(sum(cnt) AS BIGINT) AS c FROM tokcnt GROUP BY 2"
      for i in range(CMS_D)
  )}
),
top AS (
  SELECT tok, cnt FROM tokcnt
  ORDER BY cnt DESC, tok
  LIMIT {CMS_TOP_K}
),
est AS (
  SELECT t.tok, t.cnt,
         min(c.c) AS cms_est
  FROM top t
  JOIN cells c ON (
    {" OR ".join(f"(c.i = {i} AND c.b = {_cms_bucket(i, 'duck', col='t.tok')})" for i in range(CMS_D))}
  )
  GROUP BY t.tok, t.cnt
)
SELECT tok AS token, cnt AS exact_cnt, cms_est,
       cms_est - cnt AS overestimate,
       floor((cms_est - cnt) * 1000000.0 / cnt + 0.5) / 1000000.0 AS rel_err
FROM est
"""


def _cms_bucket_structs():
    """Explodable array of the CMS_D (row, bucket) positions for the
    current row's ``tok`` — the one definition both the cell builder
    and the probe side use, so they cannot hash differently."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.expr(_cms_bucket(i, "spark")).alias("b"),
                )
                for i in range(CMS_D)
            ]
        )
    ).alias("p")


def _cms_tokcnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (tok, cnt) aggregate over the document corpus."""
    return (
        load_table_parallel(spark, sf_dir, "documents")
        .select(F.explode(F.expr(_TOKS_S)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _cms_cells(weighted_toks: DataFrame) -> DataFrame:
    """(tok, cnt) -> the CMS_D x CMS_W cell table. Works on the exact
    per-type aggregate (batch) or raw cnt=1 occurrences (stream) —
    int64 SUM is associative, so both produce the identical sketch."""
    return (
        weighted_toks.select(_cms_bucket_structs(), "cnt")
        .groupBy(F.col("p.i").alias("i"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").cast("long").alias("c"))
    )


def _cms_report(tokcnt: DataFrame, cells: DataFrame) -> DataFrame:
    """Top-K exact heavy hitters probed against a cell table: the
    shared audit tail of the batch and streaming sketches."""
    top = tokcnt.orderBy(F.col("cnt").desc(), "tok").limit(CMS_TOP_K)
    probes = top.select("tok", "cnt", _cms_bucket_structs()).select(
        "tok", "cnt", F.col("p.i").alias("i"), F.col("p.b").alias("b")
    )
    est = (
        probes.join(F.broadcast(cells), ["i", "b"])
        .groupBy("tok", "cnt")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        F.col("tok").alias("token"),
        F.col("cnt").alias("exact_cnt"),
        "cms_est",
        (F.col("cms_est") - F.col("cnt")).alias("overestimate"),
        (
            F.floor(
                (F.col("cms_est") - F.col("cnt")) * F.lit(1000000.0) / F.col("cnt")
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("rel_err"),
    )


@query("countmin_heavy_hitters", oracle=_CMS_ORACLE)
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode–Muthukrishnan) over corpus token
    frequencies, audited against exact counts for the top-20 heavy
    hitters: est(tok) = min over CMS_D=4 md5 hash rows of the
    64-counter row cell, so est >= exact always (the CMS one-sided
    guarantee, which the hash check pins through the ``overestimate``
    column), and collisions show up as quantified relative error.

    Plan: ONE exact token aggregate feeds both sides; the sketch is a
    4x64-cell aggregation (row-local explode of 4 bucket structs,
    map-side combine — the sketch merges associatively, which is what
    makes it a streaming/100 TB structure; `stream_countmin_topk`
    proves that merge LIVE) and is BROADCAST back onto the top-k
    probe set; the top-k itself plans as TakeOrderedAndProject, never
    a global sort."""
    # checkpoint: the exact aggregate feeds BOTH the sketch build and
    # the top-k probe side — one corpus tokenize, not two.
    tokcnt = _cms_tokcnt(spark, sf_dir).localCheckpoint(eager=False)
    return _cms_report(tokcnt, _cms_cells(tokcnt))


@query("stream_countmin_topk", oracle=_CMS_ORACLE)
def q_stream_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch maintained by a LIVE STREAM: documents
    arrive in three micro-batches and a streaming aggregation keeps
    the 4x64 cell table as its ONLY state — 256 bounded rows no
    matter the corpus size, which is the entire point of a sketch as
    a streaming structure (per-token exact counts would be unbounded
    state). Because int64 SUM is associative-commutative, the cells
    after the last micro-batch are BIT-IDENTICAL to the batch twin's
    (`countmin_heavy_hitters`) — proven by the shared `_cms_cells`
    builder on both paths, a test pinning stream == batch cell tables
    row-for-row, and the batch oracle VERBATIM.

    The audit tail (exact top-20 probe) runs offline against the
    stream-built sketch — the production shape: the stream maintains
    the cheap mergeable summary at ingest; exact audits are periodic
    batch jobs."""
    import glob
    import os
    import shutil
    import tempfile

    from eventstreamer_spark.sources.tables import load_table
    from eventstreamer_spark.streaming.pipeline import run_to_memory

    chunk_dir = tempfile.mkdtemp(prefix="es_cmsstream_")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        staging = f"{chunk_dir}/_stage"
        docs.withColumn(
            "bb", (F.col("doc_id") % 3).cast("int")
        ).repartition("bb").write.mode("overwrite").partitionBy("bb").parquet(
            staging
        )
        base = 1_600_000_000
        for i in range(3):
            parts = glob.glob(f"{staging}/bb={i}/part-*.parquet")
            assert len(parts) == 1, parts
            dest = f"{chunk_dir}/chunk-{i:03d}.parquet"
            shutil.move(parts[0], dest)
            os.utime(dest, (base + i * 60, base + i * 60))
        shutil.rmtree(staging, ignore_errors=True)

        schema = spark.read.parquet(f"{chunk_dir}/chunk-000.parquet").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        occurrences = stream.select(
            F.explode(F.expr(_TOKS_S)).alias("tok")
        ).withColumn("cnt", F.lit(1).cast("long"))
        cells_stream = _cms_cells(occurrences)
        run_to_memory(cells_stream, "cms_stream_sink", mode="complete")
        cells = spark.table("cms_stream_sink")
        return _cms_report(_cms_tokcnt(spark, sf_dir), cells)
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# Int8 scalar-quantization fidelity audit over the embedding corpus
# ---------------------------------------------------------------------------

# The memory-bound half of ANN at 100 TB: 64 float32 components -> 64
# uint8 codes is a 4x index shrink (plus the 4x from the funnel's
# prefix scan), but only if the quantized index still ranks like the
# full-precision one. This audit measures exactly that: per-dimension
# global [min, max] grid, 256-level codes, reconstruct, and report the
# cosine(original, reconstruction) fidelity distribution per label.
# All arithmetic is the repo's cross-engine discipline: the grid
# bounds are exact input values (min/max, no arithmetic), code/recon
# are fixed-order IEEE double expressions identical in both engines,
# and the fidelity cosine is the integer-quantized dot (1e-12 grid)
# rounded to 5 decimals.

SQ8_LEVELS = 255  # codes 0..255 -> 256 levels


def _fidelity_tail_duck(recon_cte: str) -> str:
    """The shared DuckDB fidelity tail: a CTE with (label, embedding,
    rec) -> per-label cosine(original, reconstruction) report. Twin
    of ``_fidelity_report``; used by the SQ8 and PQ audits."""
    return f"""u AS MATERIALIZED (
  SELECT label,
         {H.quantized_unit_duck("embedding")} AS uq_o,
         {H.quantized_unit_duck("rec")} AS uq_r
  FROM {recon_cte}
),
f AS (
  SELECT label, round({H.qcosine_duck("uq_o", "uq_r")}, 5) AS fid
  FROM u WHERE uq_o[1] IS NOT NULL
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       {_MEAN6_DUCK.format(v="fid")} AS mean_fidelity,
       min(fid) AS min_fidelity
FROM f GROUP BY label"""


def _fidelity_report(r: DataFrame) -> DataFrame:
    """(label, embedding, rec) -> per-label cosine fidelity report:
    quantized-unit both vectors, integer dot rounded to 5 decimals,
    mean6/min rollup. The Spark twin of ``_fidelity_tail_duck``."""
    r = H.with_quantized_unit(r, "embedding", "uq_o", drop_zero_norm=True)
    r = H.with_quantized_unit(r, "rec", "uq_r")
    fid = r.select(
        "label", F.round(H.qcosine_expr("uq_o", "uq_r"), 5).alias("fid")
    )
    return fid.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        _mean6_spark(F.col("fid")).alias("mean_fidelity"),
        F.min("fid").alias("min_fidelity"),
    )


def _sq8_recon_duck() -> str:
    return (
        f"list_transform(generate_series(1, {H.EMB_DIM}), i -> "
        "mn_l[i] + coalesce(floor((CAST(embedding[i] AS DOUBLE) - mn_l[i]) "
        f"* {SQ8_LEVELS}.0 / nullif(mx_l[i] - mn_l[i], 0) + 0.5), 0) "
        f"* (mx_l[i] - mn_l[i]) / {SQ8_LEVELS}.0)"
    )


_SQ8_ORACLE = f"""
WITH dims AS MATERIALIZED (
  SELECT i, min(x) AS mn, max(x) AS mx
  FROM (
    SELECT unnest(embedding) AS x,
           unnest(generate_series(1, len(embedding))) AS i
    FROM embeddings
  )
  GROUP BY i
),
lists AS MATERIALIZED (
  SELECT list(CAST(mn AS DOUBLE) ORDER BY i) AS mn_l,
         list(CAST(mx AS DOUBLE) ORDER BY i) AS mx_l
  FROM dims
),
recon AS MATERIALIZED (
  SELECT vec_id, label, embedding, {_sq8_recon_duck()} AS rec
  FROM embeddings, lists
),
{_fidelity_tail_duck("recon")}
"""


@query("sq8_quantization_audit", oracle=_SQ8_ORACLE)
def q_sq8_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization fidelity (the memory-bound half of
    100 TB ANN — a 4x index shrink is only usable if ranking
    survives): per-dimension global [min, max] from ONE 64-key
    aggregation, 256-level codes + reconstruction as a row-local
    lambda against the broadcast 1-row grid table, and per-label
    cosine(original, reconstruction) stats via the integer-quantized
    dot. No driver materialization — the grid flows as a broadcast
    1-row cross join (the classifier-literal pattern, in-plan).

    Cross-engine exactness: grid bounds are exact input floats;
    code = floor((x-mn)*255/(mx-mn) + 0.5) and the reconstruction are
    fixed-order IEEE double chains (identical bit patterns in both
    engines); fidelity is the 1e-12-grid integer dot rounded to 5
    decimals; the mean is the int64-partial-sum mean6. Constant
    dimensions (mx == mn) code to 0 and reconstruct to mn exactly in
    both engines via the nullif/coalesce pair.

    Complements ``embedding_quantization_error`` (embeddings.py),
    which audits PER-ROW symmetric scaling with an MSE metric: this
    is the index-grade variant — a corpus-GLOBAL per-dimension grid
    (the codebook an SQ8 ANN index actually stores, shared by every
    vector so codes are comparable) judged by cosine fidelity, the
    ranking-relevant metric."""
    e = load_table_parallel(spark, sf_dir, "embeddings")
    dims = (
        e.select(F.posexplode("embedding").alias("p", "x"))
        .select((F.col("p") + F.lit(1)).alias("i"), "x")
        .groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    lists = dims.agg(
        F.expr("array_sort(collect_list(struct(i, mn, mx)))").alias("s")
    ).select(
        F.expr("transform(s, e -> CAST(e.mn AS DOUBLE))").alias("mn_l"),
        F.expr("transform(s, e -> CAST(e.mx AS DOUBLE))").alias("mx_l"),
    )
    recon_expr = (
        f"transform(sequence(1, {H.EMB_DIM}), i -> "
        "element_at(mn_l, i) + coalesce(floor("
        "(CAST(element_at(embedding, i) AS DOUBLE) - element_at(mn_l, i)) "
        f"* {SQ8_LEVELS}.0D / nullif(element_at(mx_l, i) - element_at(mn_l, i), 0.0D) "
        "+ 0.5D), 0) "
        f"* (element_at(mx_l, i) - element_at(mn_l, i)) / {SQ8_LEVELS}.0D)"
    )
    r = e.crossJoin(F.broadcast(lists)).withColumn("rec", F.expr(recon_expr))
    return _fidelity_report(r)


# ---------------------------------------------------------------------------
# Product-quantization (PQ) fidelity audit: learned sub-codebooks
# ---------------------------------------------------------------------------

# The other half of the ANN compression ladder (Jégou et al. 2011):
# where SQ8 keeps one byte PER DIMENSION (64 B/vector), PQ splits the
# vector into PQ_SUBS subspaces and keeps one LEARNED centroid id per
# subspace — 8 codes of 4 bits here, i.e. 4 B/vector, a 64x shrink vs
# float32. Codebooks are k-means per subspace; everything runs in the
# integer domain (v6 = round(x*1e6) int64) so distances, means, and
# assignments are bit-identical across engines, and the final
# cosine-fidelity report reuses the SQ8 audit's shared tail.

PQ_SUBS = 8  # subspaces
PQ_SUBDIM = H.EMB_DIM // PQ_SUBS
PQ_K = 16  # centroids per subspace -> 4-bit codes

_PQ_MEAN6 = "CAST(floor(sum(v6) * 1.0 / count(*) + 0.5) AS BIGINT)"

# Row-local argmin against the per-subspace candidate list: distances
# are exact int64 L2 folds; list_position/array_position return the
# FIRST index of the min, and candidates are sorted by c, so ties
# break to the smallest centroid id in both engines.
_PQ_DISTS_D = (
    f"list_transform(cands, cand -> list_sum(list_transform("
    f"generate_series(1, {PQ_SUBDIM}), "
    "i -> (v_arr[i] - cand.vals[i]) * (v_arr[i] - cand.vals[i]))))"
)
_PQ_DISTS_S = (
    "transform(cands, cand -> aggregate(zip_with(v_arr, cand.vals, "
    "(a, b) -> (a - b) * (a - b)), 0L, (acc, z) -> acc + z))"
)


def _pq_codebook_duck(name: str, means_cte: str) -> str:
    """means (s, c, p, m6) -> (s, cands sorted by c) with vals sorted
    by p — the broadcastable per-subspace candidate list."""
    return f"""{name} AS MATERIALIZED (
  SELECT s, list(struct_pack(c := c, vals := vals) ORDER BY c) AS cands
  FROM (
    SELECT s, c, list(m6 ORDER BY p) AS vals FROM {means_cte} GROUP BY 1, 2
  ) GROUP BY s
)"""


def _pq_assign_duck(name: str, cb_cte: str, src: str = "pqv") -> str:
    return f"""{name} AS MATERIALIZED (
  SELECT vec_id, s, cands[list_position(dists, list_min(dists))].c AS c
  FROM (
    SELECT vec_id, s, cands, {_PQ_DISTS_D} AS dists
    FROM {src} JOIN {cb_cte} USING (s)
  )
)"""


def _pq_train_duck(pref: str, pqs: str, pqv: str) -> list[str]:
    """The two-pass PQ training sub-chain (seed means -> codebook ->
    assign -> refit means -> codebook -> final codes), parameterized
    on the component/array source CTEs and a name prefix so the SAME
    trainer runs on raw components ('' / pqs / pqv) and on
    cell-residual components ('r' / rpqs / rpqv — IVFADC)."""
    return [
        f"""{pref}m0 AS MATERIALIZED (
  SELECT s, CAST(vec_id % {PQ_K} AS INTEGER) AS c, p, {_PQ_MEAN6} AS m6
  FROM {pqs} GROUP BY 1, 2, 3
)""",
        _pq_codebook_duck(f"{pref}cb0", f"{pref}m0"),
        _pq_assign_duck(f"{pref}a1", f"{pref}cb0", src=pqv),
        f"""{pref}m1 AS MATERIALIZED (
  SELECT r.s, a.c, r.p, {_PQ_MEAN6} AS m6
  FROM {pqs} r JOIN {pref}a1 a ON a.vec_id = r.vec_id AND a.s = r.s
  GROUP BY 1, 2, 3
)""",
        _pq_codebook_duck(f"{pref}cb1", f"{pref}m1"),
        _pq_assign_duck(f"{pref}a2", f"{pref}cb1", src=pqv),
    ]


# Raw embedding components + gathered per-subspace arrays — the source
# half of the PQ chain, shared by the raw trainer and (via a residual
# join) the IVFADC trainer.
_PQS_PART = f"""pqs AS MATERIALIZED (
  SELECT vec_id, label,
         CAST((i - 1) // {PQ_SUBDIM} AS INTEGER) AS s,
         CAST((i - 1) % {PQ_SUBDIM} AS INTEGER) AS p,
         CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT) AS v6
  FROM (
    SELECT vec_id, label, unnest(embedding) AS x,
           unnest(generate_series(1, len(embedding))) AS i
    FROM embeddings
  )
)"""


def _pq_parts() -> list[str]:
    """The PQ training chain as WITH-parts (the _dsir_parts pattern):
    pqs (exploded integer components) -> pqv (gathered per-subspace
    arrays) -> m0/cb0 (seed codebook) -> a1 -> m1/cb1 (refit
    codebook) -> a2 (final codes). Shared by the fidelity audit and
    the ADC search oracle so index build and search cannot drift."""
    return [
        _PQS_PART,
        """pqv AS MATERIALIZED (
  SELECT vec_id, label, s, list(v6 ORDER BY p) AS v_arr
  FROM pqs GROUP BY 1, 2, 3
)""",
    ] + _pq_train_duck("", "pqs", "pqv")


_PQ_CHAIN_SQL = ",\n".join(_pq_parts())

_PQ_ORACLE = f"""
WITH {_PQ_CHAIN_SQL},
reconp AS MATERIALIZED (
  SELECT a.vec_id,
         list(CAST(m.m6 AS DOUBLE) / 1000000.0 ORDER BY m.s, m.p) AS rec
  FROM a2 a JOIN m1 m ON m.s = a.s AND m.c = a.c
  GROUP BY a.vec_id
),
pqrecon AS MATERIALIZED (
  SELECT e.vec_id, e.label, e.embedding, r.rec
  FROM embeddings e JOIN reconp r ON r.vec_id = e.vec_id
),
{_fidelity_tail_duck("pqrecon")}
"""


def pq_codebook(means: DataFrame) -> DataFrame:
    """(s, c, p, m6) -> (s, cands) candidate lists sorted by c with
    vals sorted by p — the 8-row broadcastable codebook (Spark twin
    of ``_pq_codebook_duck``)."""
    return (
        means.groupBy("s", "c")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(p, m6))), e -> e.m6)"
            ).alias("vals")
        )
        .groupBy("s")
        .agg(F.expr("array_sort(collect_list(struct(c, vals)))").alias("cands"))
    )


def pq_build(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The PQ training chain (Spark twin of ``_pq_parts``): returns
    (embeddings, pqv gathered subspace arrays, m1 refit codebook
    means, a2 final codes). Shared by the fidelity audit and the ADC
    search so index build and search cannot drift."""
    e = load_table_parallel(spark, sf_dir, "embeddings")
    # pqv is checkpointed (two assignment passes + every search-side
    # consumer read it); sub is NOT — its two consumers are cheap
    # re-derived posexplodes, and materializing the n×64 component
    # rows cost more than it saved (measured at sf0.1).
    sub = (
        e.select("vec_id", "label", F.posexplode("embedding").alias("i0", "x"))
        .select(
            "vec_id",
            "label",
            F.expr(f"CAST(i0 DIV {PQ_SUBDIM} AS INT)").alias("s"),
            F.expr(f"CAST(i0 % {PQ_SUBDIM} AS INT)").alias("p"),
            F.expr("CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)").alias(
                "v6"
            ),
        )
    )
    # repartition BEFORE the checkpoint: AQE coalesces the aggregate
    # output to 1 partition, which would serialize the downstream
    # interpreted per-candidate distance transforms onto one core.
    pqv = (
        sub.groupBy("vec_id", "s")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(p, v6))), e -> e.v6)"
            ).alias("v_arr")
        )
        .repartition(shuffle_partitions(spark), "vec_id")
        .localCheckpoint(eager=False)
    )
    m1, a2 = _pq_train(sub, pqv)
    return e, pqv, m1, a2


def _pq_train(sub: DataFrame, pqv: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Two-pass PQ trainer (Spark twin of ``_pq_train_duck``): seed
    means (vec_id % PQ_K) -> codebook -> assign -> refit means ->
    final codes, over ANY (vec_id, s, p, v6) component table and its
    gathered (vec_id, s, v_arr) twin — raw embedding components for
    pq_build, cell residuals for the IVFADC build. Returns (m1 refit
    means, a2 final codes)."""
    mean6 = F.expr("CAST(floor(sum(v6) * 1.0 / count(*) + 0.5) AS BIGINT)")

    # The refit after an assignment used to JOIN the n×64 component
    # table back to the n×8 assignment on (vec_id, s) — a full shuffle
    # of the components per refit. The assignment is a row-local
    # projection of pqv, so the gathered v_arr now RIDES THROUGH the
    # argmin and re-explodes in place: v_arr is collect_list(struct(p,
    # v6)) sorted by p with p dense in 0..PQ_SUBDIM-1, so posexplode's
    # ordinal IS p and the (s, c, p) means aggregate identical integer
    # sets with zero joins (optimization guide §2.4 "remove shuffles
    # outright"; the only remaining exchange is the ≤1024-key map-side
    # combined refit aggregate).
    def refit(assign: DataFrame | None) -> DataFrame:
        if assign is None:
            members = sub.withColumn("c", (F.col("vec_id") % PQ_K).cast("int"))
            return members.groupBy("s", "c", "p").agg(mean6.alias("m6"))
        return (
            assign.select(
                "s", "c", F.posexplode("v_arr").alias("p", "v6")
            )
            .groupBy("s", "c", "p")
            .agg(mean6.alias("m6"))
        )

    def assign_to(cb: DataFrame) -> DataFrame:
        return (
            pqv.join(F.broadcast(cb), "s")
            .withColumn("dists", F.expr(_PQ_DISTS_S))
            .select(
                "vec_id",
                "s",
                "v_arr",
                F.expr(
                    "element_at(cands, CAST(array_position(dists, array_min(dists)) AS INT)).c"
                ).alias("c"),
            )
        )

    a1 = assign_to(pq_codebook(refit(None)))
    m1 = refit(a1)
    a2 = assign_to(pq_codebook(m1))
    return m1, a2.select("vec_id", "s", "c")


@query("pq_quantization_audit", oracle=_PQ_ORACLE)
def q_pq_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization fidelity (Jégou et al. 2011) — the far
    end of the ANN compression ladder: 8 subspaces x 16 LEARNED
    centroids = 4-bit codes, 4 B/vector (vs SQ8's 64 B), with the
    same per-label cosine(original, reconstruction) report as
    `sq8_quantization_audit` so the two compression points are
    directly comparable. Codebooks are per-subspace k-means:
    vec_id%16-seeded means, one full Lloyd refinement, final
    assignment — unrolled so the plan is static and the oracle
    replays it as a MATERIALIZED CTE chain.

    100 TB shape: each (vector, subspace) is gathered ONCE into an
    8-component integer array; the codebook (8 rows — one candidate
    list per subspace) BROADCASTS and assignment is a row-local
    argmin fold — no n x k row expansion, no per-vector window, no
    giant aggregation state (an earlier draft materialized the
    (vec, s, c) distance table: n x 128 rows + a 16-way expansion,
    which OOMed a default-memory session at x100; the gathered form
    is both the faster and the smaller plan). Refits aggregate to
    the 1024 (s, c, p) keys with map-side combine.

    Cross-engine exactness: everything lives in the v6 =
    round(x*1e6) integer domain — exact int64 L2 folds, floor+0.5
    integer means, first-index-of-min ties to the smallest centroid
    id — and the fidelity tail is the shared integer-dot report."""
    e, pqv, m1, a2 = pq_build(spark, sf_dir)
    recon = (
        a2.join(F.broadcast(m1), ["s", "c"])
        .groupBy("vec_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(s, p, m6))), "
                "e -> CAST(e.m6 AS DOUBLE) / 1000000.0)"
            ).alias("rec")
        )
    )
    r = e.join(recon, "vec_id").select("label", "embedding", "rec")
    return _fidelity_report(r)


# ---------------------------------------------------------------------------
# PQ asymmetric-distance (ADC) top-k search over the learned codes
# ---------------------------------------------------------------------------

# The search half of the PQ index: the QUERY stays full-precision, the
# corpus is only its 8 codes — per (query, subspace) a 16-entry
# distance lookup table is precomputed against the codebook, and each
# corpus vector's distance is 8 table lookups + adds (Jégou et al.'s
# ADC). Scanning codes instead of vectors reads 16x less data than
# the exact scan; like the funnel and brute force, the scan itself is
# O(q·n) by contract — IVF is the orthogonal WHO-prune that would cut
# n at 100 TB (IVF-PQ = compose the two).

PQ_TOP_K = 10
ADC_QUERY_FILTER = "vec_id % 100 = 0"  # same query subset as the ANN family

# Search-side CTEs shared by the full-scan ADC, the IVF-PQ composition
# and the PQ recall audit: per-query LUT rows against the refit
# codebook, and the gathered per-vector code arrays.
_ADC_PARTS = [
    f"""qsel AS (
  SELECT vec_id AS query_id, s, v_arr FROM pqv WHERE {ADC_QUERY_FILTER}
)""",
    f"""luts AS MATERIALIZED (
  SELECT query_id, s,
         {_PQ_DISTS_D} AS lut,
         list_transform(cands, cand -> cand.c) AS cs
  FROM qsel JOIN cb1 USING (s)
)""",
    """qlut AS MATERIALIZED (
  SELECT query_id,
         list(struct_pack(cs := cs, lut := lut) ORDER BY s) AS sl
  FROM luts GROUP BY query_id
)""",
    """codes AS MATERIALIZED (
  SELECT vec_id, list(c ORDER BY s) AS cvec FROM a2 GROUP BY vec_id
)""",
]
_ADC_PARTS_SQL = ",\n".join(_ADC_PARTS)

# ADC distance: 8 table lookups + adds, identical lambda in both
# engines (sl from the query's LUT row, cvec from the neighbor codes).
_ADC_DIST_D = (
    f"CAST(list_sum(list_transform(generate_series(1, {PQ_SUBS}), "
    "si -> sl[si].lut[list_position(sl[si].cs, cvec[si])])) AS BIGINT)"
)
_ADC_DIST_S = (
    f"CAST(aggregate(sequence(1, {PQ_SUBS}), 0L, (acc, si) -> acc + "
    "element_at(element_at(sl, si).lut, CAST("
    "array_position(element_at(sl, si).cs, element_at(cvec, si)) AS INT))) AS BIGINT)"
)

_ADC_ORACLE = f"""
WITH {_PQ_CHAIN_SQL},
{_ADC_PARTS_SQL},
dists AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         {_ADC_DIST_D} AS adc_dist
  FROM qlut q JOIN codes v ON q.query_id != v.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY adc_dist, neighbor_id
         ) AS BIGINT) AS rank
  FROM dists
)
SELECT query_id, neighbor_id, adc_dist, rank
FROM ranked WHERE rank <= {PQ_TOP_K}
"""


@query("pq_adc_topk", oracle=_ADC_ORACLE)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-k over the PQ index (Jégou et al.
    2011): queries stay full-precision; per (query, subspace) a
    16-entry L2 lookup table is precomputed against the refit
    codebook, and every corpus vector is scored from its 4-bit codes
    alone — 8 table lookups + adds per vector, scanning 16x less
    data than the exact scan. Completes the PQ story the audit
    starts: `pq_quantization_audit` measures what the codes LOSE,
    this is how they're USED.

    Plan: the per-query LUT table (q x 8 x 16 int64s) BROADCASTS;
    corpus codes are gathered once into an 8-int array per vector;
    the scan is a row-local fold, the top-k a per-query window. The
    code scan is O(q·n) by contract (capped x10 in scale_bench, like
    brute force and the funnel) — IVF is the orthogonal WHO-prune
    that cuts n; `ivf_pq_topk` is that composition, the standard
    100 TB layout. Exactness: LUT entries and distances are the
    build's own exact int64 L2 sums; ranking ties break on
    neighbor_id; the oracle replays the shared _pq_parts chain
    verbatim."""
    _, qlut, codes = pq_search_parts(spark, sf_dir, checkpoint=False)
    return _adc_rank_topk(
        F.broadcast(qlut)
        .join(codes, F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "sl", "cvec")
    )


def pq_search_parts(
    spark: SparkSession, sf_dir: str, checkpoint: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(embeddings, qlut, codes): the ADC search-side artifacts from
    the shared PQ build — per-query LUT rows (query_id, sl) for the
    ADC_QUERY_FILTER subset and gathered per-vector code arrays
    (vec_id, cvec). ``checkpoint=True`` for multi-consumer callers
    (the recall audit reads both twice); single-scan callers pass
    False — materializing a once-read table is pure overhead."""
    e, pqv, m1, a2 = pq_build(spark, sf_dir)
    cb1 = pq_codebook(m1)
    qsel = pqv.filter(F.expr(ADC_QUERY_FILTER)).select(
        F.col("vec_id").alias("query_id"), "s", "v_arr"
    )
    luts = (
        qsel.join(F.broadcast(cb1), "s")
        .withColumn("lut", F.expr(_PQ_DISTS_S))
        .select(
            "query_id",
            "s",
            "lut",
            F.expr("transform(cands, cand -> cand.c)").alias("cs"),
        )
    )
    qlut = luts.groupBy("query_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(s, cs, lut))), "
            "e -> struct(e.cs AS cs, e.lut AS lut))"
        ).alias("sl")
    )
    codes = a2.groupBy("vec_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(s, c))), e -> e.c)"
        ).alias("cvec")
    )
    if checkpoint:
        qlut = qlut.localCheckpoint(eager=False)
        codes = codes.localCheckpoint(eager=False)
    return e, qlut, codes


def _free_pq_parts(
    _key: object, val: tuple[DataFrame, DataFrame, DataFrame]
) -> None:
    _e, qlut, codes = val
    free_local_checkpoint(qlut)
    free_local_checkpoint(codes)


_PQ_PARTS_MEMO: dict[tuple[str, str], tuple[DataFrame, DataFrame, DataFrame]] = (
    BoundedMemo(maxsize=4, on_evict=_free_pq_parts)
)


def pq_parts_memo(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Consumer-facing (e, qlut, codes) ADC search artifacts behind a
    per-(applicationId, sf_dir) memo (r14 optimization): the recall
    GRID re-trained the full PQ chain per invocation while the
    retrieval owner queries (pq_adc_topk, ivf_pq_topk,
    pq_quantization_audit) each already pay their own builds every
    invocation — the brute_truth_memo pattern exactly (the grid is a
    consumer of the artifact; owners never read the memo). Same
    post-eviction invalidation contract as residual_artifacts_memo."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = live_hit(_PQ_PARTS_MEMO, key)
    if hit is None:
        hit = pq_search_parts(spark, sf_dir, checkpoint=True)
        _PQ_PARTS_MEMO[key] = hit
    return hit


def _adc_rank_topk(pairs: DataFrame, k: int = PQ_TOP_K) -> DataFrame:
    """(query_id, neighbor_id, sl, cvec) candidate pairs -> ADC-scored
    per-query top-k (the shared tail of the full scan and IVF-PQ).
    ``k`` widens the cut for shortlist consumers (the exact re-rank
    keeps the coarse top-RERANK_M)."""
    dists = pairs.select(
        "query_id", "neighbor_id", F.expr(_ADC_DIST_S).alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        dists.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the composed index — IVF prunes WHO, PQ compresses WHAT
# ---------------------------------------------------------------------------

# The standard billion/100 TB-scale ANN layout (Jégou et al. 2011,
# IVFADC): corpus vectors live in IVF cells keyed by their nearest
# Lloyd centroid, and inside a cell only the 4-bit PQ codes are
# stored. A query (a) picks its NPROBE nearest centroids — the
# WHO-prune, so the scan touches ~nprobe/k of the corpus — and
# (b) scores each resident from its codes alone via the ADC lookup
# table — the WHAT-compression, reading 16x less per candidate. Both
# halves already exist verified (ivf_topk_search; pq_adc_topk); this
# query is their composition, which neither could claim alone: the
# ONLY uncapped-scale top-k over compressed codes in the repo.

from eventstreamer_spark.operators.similarity import (  # noqa: E402
    NPROBE as _IVF_NPROBE,
)
from eventstreamer_spark.operators.similarity import (  # noqa: E402
    _ADAPTIVE_SEED_DUCK as _SQRT_SEED_DUCK,
)
from eventstreamer_spark.operators.similarity import (  # noqa: E402
    _BRUTE_ORACLE as _ANN_BRUTE_ORACLE,
)
from eventstreamer_spark.operators.similarity import (  # noqa: E402
    _ivf_centroids_duck as _ivf_cent_duck,
)

# Adaptive ⌈√n⌉ cells, NOT the fixed label-seeded k: with k fixed the
# probed candidate count grows as n²·nprobe/k across a scale-up (the
# ivf_topk_search cliff SCALING.md documents); with k = ⌈√n⌉ a query
# scans ~nprobe·√n codes and the composed index keeps a sub-linear
# exponent — the sizing rule a real IVF-PQ deployment uses.
_IVFPQ_ORACLE = f"""
WITH {_PQ_CHAIN_SQL},
{_ADC_PARTS_SQL},
{_ivf_cent_duck(seed=_SQRT_SEED_DUCK)},
centqf AS (
  SELECT c_label, {H.quantized_unit_duck("centroid")} AS cq FROM cent
),
fscored AS (
  SELECT e.vec_id, c.c_label,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({H.qcosine_duck("e.uq", "c.cq")}, 5) DESC,
                                     c.c_label) AS rn
  FROM embq e CROSS JOIN centqf c
),
iassigned AS (SELECT vec_id, c_label FROM fscored WHERE rn = 1),
iprobes AS (
  SELECT vec_id AS query_id, c_label FROM fscored
  WHERE {ADC_QUERY_FILTER} AND rn <= {_IVF_NPROBE}
),
icand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM iprobes p JOIN iassigned a
    ON p.c_label = a.c_label AND a.vec_id != p.query_id
),
idists AS (
  SELECT c.query_id, c.neighbor_id, {_ADC_DIST_D} AS adc_dist
  FROM icand c
  JOIN qlut q ON q.query_id = c.query_id
  JOIN codes v ON v.vec_id = c.neighbor_id
),
iranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY adc_dist, neighbor_id
         ) AS BIGINT) AS rank
  FROM idists
)
SELECT query_id, neighbor_id, adc_dist, rank
FROM iranked WHERE rank <= {PQ_TOP_K}
"""


def ivf_pq_topk(
    spark: SparkSession, sf_dir: str, parts: tuple[DataFrame, DataFrame, DataFrame] | None = None
) -> DataFrame:
    """The IVF-PQ probe search over prepared (or freshly built) PQ
    search parts; see q_ivf_pq_topk for the plan rationale. Pass
    ``parts`` (from pq_search_parts) to share one PQ build across
    consumers (the recall audit scores this and the full scan from
    the same artifacts)."""
    import math

    from eventstreamer_spark.operators.similarity import (
        _score_centroids,
        ivf_centroids_for,
    )

    e, qlut, codes = (
        parts
        if parts is not None
        # standalone: each artifact is read exactly once — no checkpoint
        else pq_search_parts(spark, sf_dir, checkpoint=False)
    )
    embq = (
        H.with_quantized_unit(e, "embedding", "uq", drop_zero_norm=True)
        .select("vec_id", "uq")
        .localCheckpoint(eager=False)
    )
    # adaptive ⌈√n⌉ cells (memoized, shared with ivf_adaptive_topk and
    # SemDeDup) — see the seed-choice note above _IVFPQ_ORACLE
    k = int(math.ceil(math.sqrt(e.count())))
    seeded = e.withColumn("label", F.col("vec_id") % F.lit(k))
    cent = ivf_centroids_for(spark, sf_dir, e=seeded, embq=embq, variant=f"sqrt-k{k}")
    scored = _score_centroids(embq, cent, max_rank=_IVF_NPROBE).localCheckpoint(
        eager=False
    )
    assigned = scored.filter(F.col("rn") == 1).select("vec_id", "c_label")
    probes = scored.filter(
        F.expr(ADC_QUERY_FILTER) & (F.col("rn") <= _IVF_NPROBE)
    ).select(F.col("vec_id").alias("query_id"), "c_label")
    # the stored index: cell label + codes, co-keyed on vec_id — at
    # 100 TB this join IS the one-time index build, written bucketed
    # by cell so the probe join below never moves it
    cell_codes = assigned.join(codes, "vec_id")
    cand = (
        F.broadcast(probes)
        .join(
            cell_codes,
            (probes["c_label"] == cell_codes["c_label"])
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cvec")
    )
    return _adc_rank_topk(cand.join(F.broadcast(qlut), "query_id"))


@query("ivf_pq_topk", oracle=_IVFPQ_ORACLE)
def q_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (IVFADC, Jégou et al. 2011): top-k where IVF prunes WHO
    gets scored (each query probes its NPROBE nearest of the adaptive
    ⌈√n⌉ Lloyd centroids — the memoized sqrt-k build shared with
    ivf_adaptive_topk and SemDeDup) and PQ compresses WHAT is read
    (residents are scored from their 4-bit codes via the shared ADC
    lookup fold, the pq_adc_topk kernel). The composition the ADC
    docstring names as the standard 100 TB layout — and the repo's
    only compressed-code top-k whose scan cost is NOT O(q·n) by
    contract: a query reads ~nprobe·√n codes at 16x fewer bytes per
    candidate.

    Plan: centroid table and per-query LUTs broadcast; the corpus
    never moves except the one cell+codes co-keyed join (the stored
    index — bucketed by cell at scale); candidate scoring is a
    row-local integer fold; the top-k a per-query window. Exactness:
    centroid ranks, code assignments and ADC sums are the existing
    verified integer kernels; ties break (adc_dist, neighbor_id);
    the oracle composes the same _pq_parts + IVF CTE chains."""
    return ivf_pq_topk(spark, sf_dir)


# ---------------------------------------------------------------------------
# Residual-encoded IVFADC: PQ on x − centroid(cell), the canonical form
# ---------------------------------------------------------------------------

# ivf_pq_topk scores corpus-GLOBAL PQ codes inside probed cells; the
# actual IVFADC of Jégou et al. 2011 §III quantizes the RESIDUAL
# r = x − q1(x) (q1 = the coarse cell centroid): once the coarse
# quantizer has absorbed the vector's cell-scale position, the product
# codebooks only have to cover the residual's much smaller dynamic
# range — the standard fidelity lever for compressed-code recall
# (VERDICT r8 item 2). One residual product quantizer is trained
# corpus-wide (the paper's layout); search LUTs become per
# (query, probed cell): the query's residual against THAT cell's
# centroid, scored against the shared residual codebook.

# The full residual chain through `riranked` (every candidate ranked
# by residual-ADC distance) — shared by the standalone top-k oracle,
# the re-rank oracles (top-M shortlist at nprobe 2 and 4) and the
# recall grid, so the coarse stage cannot drift between them.
# ``nprobe`` parameterizes the WHO-prune depth (VERDICT r10 item 1 —
# the nprobe lever); ``tag_probe_rn`` carries each candidate's probe
# rank through ricand/ridists so ONE deepest-level chain evaluation
# can be cut per level (a vector lives in exactly one cell, so
# (query, neighbor) pairs are unique and the tag is well-defined).
def _ivfadc_res_chain(nprobe: int = _IVF_NPROBE, tag_probe_rn: bool = False) -> str:
    probe_col = ", rn AS probe_rn" if tag_probe_rn else ""
    cand_col = ", p.probe_rn" if tag_probe_rn else ""
    dist_col = ", c.probe_rn" if tag_probe_rn else ""
    return f"""{_PQS_PART},
{_ivf_cent_duck(seed=_SQRT_SEED_DUCK)},
centqf AS (
  SELECT c_label, {H.quantized_unit_duck("centroid")} AS cq FROM cent
),
fscored AS (
  SELECT e.vec_id, c.c_label,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({H.qcosine_duck("e.uq", "c.cq")}, 5) DESC,
                                     c.c_label) AS rn
  FROM embq e CROSS JOIN centqf c
),
iassigned AS (SELECT vec_id, c_label FROM fscored WHERE rn = 1),
iprobes AS (
  SELECT vec_id AS query_id, c_label{probe_col} FROM fscored
  WHERE {ADC_QUERY_FILTER} AND rn <= {nprobe}
),
cent6 AS MATERIALIZED (
  SELECT c_label,
         CAST((i - 1) // {PQ_SUBDIM} AS INTEGER) AS s,
         CAST((i - 1) % {PQ_SUBDIM} AS INTEGER) AS p,
         CAST(round(cv * 1000000, 0) AS BIGINT) AS c6
  FROM (
    SELECT c_label, unnest(centroid) AS cv,
           unnest(generate_series(1, len(centroid))) AS i
    FROM cent
  )
),
rpqs AS MATERIALIZED (
  SELECT q.vec_id, q.s, q.p, q.v6 - c.c6 AS v6
  FROM pqs q JOIN iassigned a ON a.vec_id = q.vec_id
  JOIN cent6 c ON c.c_label = a.c_label AND c.s = q.s AND c.p = q.p
),
rpqv AS MATERIALIZED (
  SELECT vec_id, s, list(v6 ORDER BY p) AS v_arr FROM rpqs GROUP BY 1, 2
),
{",".join(_pq_train_duck("r", "rpqs", "rpqv"))},
rqsel AS MATERIALIZED (
  SELECT q.vec_id AS query_id, pr.c_label, q.s,
         list(q.v6 - c.c6 ORDER BY q.p) AS v_arr
  FROM pqs q
  JOIN iprobes pr ON pr.query_id = q.vec_id
  JOIN cent6 c ON c.c_label = pr.c_label AND c.s = q.s AND c.p = q.p
  GROUP BY 1, 2, 3
),
rluts AS MATERIALIZED (
  SELECT query_id, c_label, s, {_PQ_DISTS_D} AS lut,
         list_transform(cands, cand -> cand.c) AS cs
  FROM rqsel JOIN rcb1 USING (s)
),
rqclut AS MATERIALIZED (
  SELECT query_id, c_label,
         list(struct_pack(cs := cs, lut := lut) ORDER BY s) AS sl
  FROM rluts GROUP BY 1, 2
),
rcodes AS MATERIALIZED (
  SELECT vec_id, list(c ORDER BY s) AS cvec FROM ra2 GROUP BY vec_id
),
ricand AS (
  SELECT p.query_id, p.c_label, a.vec_id AS neighbor_id{cand_col}
  FROM iprobes p JOIN iassigned a
    ON p.c_label = a.c_label AND a.vec_id != p.query_id
),
ridists AS (
  SELECT c.query_id, c.neighbor_id{dist_col}, {_ADC_DIST_D} AS adc_dist
  FROM ricand c
  JOIN rqclut q ON q.query_id = c.query_id AND q.c_label = c.c_label
  JOIN rcodes v ON v.vec_id = c.neighbor_id
),
riranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY adc_dist, neighbor_id
         ) AS BIGINT) AS rank
  FROM ridists
)"""


_IVFADC_RES_CHAIN = _ivfadc_res_chain()

_IVFADC_RES_ORACLE = f"""
WITH {_IVFADC_RES_CHAIN}
SELECT query_id, neighbor_id, adc_dist, rank
FROM riranked WHERE rank <= {PQ_TOP_K}
"""


def ivfadc_residual_topk(
    spark: SparkSession,
    sf_dir: str,
    checkpoint: bool = False,
    k: int = PQ_TOP_K,
    with_fullv: bool = False,
    nprobe: int = _IVF_NPROBE,
    scored_pairs: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Residual-encoded IVFADC search; see q_ivfadc_residual_topk for
    semantics. ``checkpoint=True`` hides the build behind lazy
    localCheckpoints so a composing consumer's plan (the recall audit)
    stays Generate-free and never replays the build. ``k`` widens the
    per-query cut for shortlist consumers; ``with_fullv=True`` also
    returns the (vec_id, v64) exact integer component arrays the
    re-rank stage scores against — gathered from the SAME ``sub``
    component pass as the residual build, so coarse and refine stages
    read one corpus decomposition. ``nprobe`` is the WHO-prune depth
    (VERDICT r10 item 1 — residual training is probe-independent, so
    only the probe list, per-(query,cell) LUTs and candidate join
    widen). ``scored_pairs=True`` returns EVERY scored candidate
    tagged with its probe rank instead of the ranked cut — the recall
    grid gathers once at the deepest level and cuts per level (a
    vector lives in exactly one cell, so the tag is well-defined per
    (query, neighbor) pair)."""
    import math

    from eventstreamer_spark.operators.similarity import (
        _score_centroids,
        ivf_centroids_for,
    )

    e = load_table_parallel(spark, sf_dir, "embeddings")
    embq = (
        H.with_quantized_unit(e, "embedding", "uq", drop_zero_norm=True)
        .select("vec_id", "uq")
        .localCheckpoint(eager=False)
    )
    kcells = int(math.ceil(math.sqrt(e.count())))
    seeded = e.withColumn("label", F.col("vec_id") % F.lit(kcells))
    cent = ivf_centroids_for(
        spark, sf_dir, e=seeded, embq=embq, variant=f"sqrt-k{kcells}"
    )
    scored = _score_centroids(embq, cent, max_rank=nprobe).localCheckpoint(
        eager=False
    )
    assigned = scored.filter(F.col("rn") == 1).select("vec_id", "c_label")
    probes = scored.filter(
        F.expr(ADC_QUERY_FILTER) & (F.col("rn") <= nprobe)
    ).select(
        F.col("vec_id").alias("query_id"), "c_label", F.col("rn").alias("probe_rn")
    )

    # integer centroid components, subspace-split like pqs: centroid
    # components are exact multiples of 1e-6 in BOTH engines (the
    # integer-scaled Lloyd means), so round(cv*1e6) is the exact int
    splitcols = [
        F.expr(f"CAST(i0 DIV {PQ_SUBDIM} AS INT)").alias("s"),
        F.expr(f"CAST(i0 % {PQ_SUBDIM} AS INT)").alias("p"),
    ]
    cent6 = cent.select("c_label", F.posexplode("centroid").alias("i0", "cv")).select(
        "c_label", *splitcols, F.expr("CAST(round(cv * 1000000, 0) AS BIGINT)").alias("c6")
    )
    sub = e.select("vec_id", F.posexplode("embedding").alias("i0", "x")).select(
        "vec_id",
        *splitcols,
        F.expr("CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)").alias("v6"),
    )
    # residual components: v6 − c6 of the vector's OWN cell. cent6 is
    # k×dim rows (√n cells) — broadcast; the corpus never moves here.
    rsub = (
        sub.join(assigned, "vec_id")
        .join(F.broadcast(cent6), ["c_label", "s", "p"])
        .select("vec_id", "s", "p", (F.col("v6") - F.col("c6")).alias("v6"))
        # feeds the seed means, the refit means and the rqv gather
        .localCheckpoint(eager=False)
    )
    # repartition before the checkpoint: AQE would coalesce the
    # aggregate to ~1 partition and serialize the interpreted
    # per-candidate distance folds (the pq_build note)
    rqv = (
        rsub.groupBy("vec_id", "s")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(p, v6))), e -> e.v6)"
            ).alias("v_arr")
        )
        .repartition(shuffle_partitions(spark), "vec_id")
        .localCheckpoint(eager=False)
    )
    m1r, a2r = _pq_train(rsub, rqv)
    rcb1 = pq_codebook(m1r)

    # per-(query, probed cell) residual LUTs: the query's residual
    # against THAT cell's centroid, scored on the shared codebook
    rq = (
        sub.filter(F.expr(ADC_QUERY_FILTER))
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(probes), "query_id")
        .join(F.broadcast(cent6), ["c_label", "s", "p"])
        .select(
            "query_id", "c_label", "s", "p", (F.col("v6") - F.col("c6")).alias("v6")
        )
    )
    rqsel = rq.groupBy("query_id", "c_label", "s").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(p, v6))), e -> e.v6)"
        ).alias("v_arr")
    )
    luts = (
        rqsel.join(F.broadcast(rcb1), "s")
        .withColumn("lut", F.expr(_PQ_DISTS_S))
        .select(
            "query_id",
            "c_label",
            "s",
            "lut",
            F.expr("transform(cands, cand -> cand.c)").alias("cs"),
        )
    )
    qclut = luts.groupBy("query_id", "c_label").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(s, cs, lut))), "
            "e -> struct(e.cs AS cs, e.lut AS lut))"
        ).alias("sl")
    )
    rcodes = a2r.groupBy("vec_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(s, c))), e -> e.c)"
        ).alias("cvec")
    )
    if checkpoint:
        qclut = qclut.localCheckpoint(eager=False)
        rcodes = rcodes.localCheckpoint(eager=False)
    cell_codes = assigned.join(rcodes, "vec_id")
    cand = (
        F.broadcast(probes)
        .join(
            cell_codes,
            (probes["c_label"] == cell_codes["c_label"])
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            probes["c_label"].alias("c_label"),
            probes["probe_rn"].alias("probe_rn"),
            F.col("vec_id").alias("neighbor_id"),
            "cvec",
        )
    )
    pairs = cand.join(F.broadcast(qclut), ["query_id", "c_label"]).select(
        "query_id", "neighbor_id", "probe_rn", "sl", "cvec"
    )
    if scored_pairs:
        top = pairs.select(
            "query_id",
            "neighbor_id",
            "probe_rn",
            F.expr(_ADC_DIST_S).alias("adc_dist"),
        )
    else:
        top = _adc_rank_topk(pairs.drop("probe_rn"), k=k)
    if not with_fullv:
        return top
    fullv = sub.groupBy("vec_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(s, p, v6))), e -> e.v6)"
        ).alias("v64")
    )
    if checkpoint:
        fullv = fullv.localCheckpoint(eager=False)
    return top, fullv


@query("ivfadc_residual_topk", oracle=_IVFADC_RES_ORACLE)
def q_ivfadc_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC with RESIDUAL encoding (Jégou et al. 2011 §III, the
    paper's actual layout): each vector's PQ code is trained and
    assigned on r = x − centroid(cell) rather than on x itself —
    the coarse quantizer absorbs cell-scale position, so the 4-bit
    codebooks spend their 16 levels on the residual's concentrated
    dynamic range. This is the standard fidelity lever over
    ivf_pq_topk's corpus-global codes; pq_recall_at_k measures both
    points on the same grid (the 'ivfadc_res' row).

    Plan shape (same scale contract as ivf_pq_topk — the ONLY two
    compressed-code top-k paths without a q·n term): centroids,
    integer centroid components, probes, per-(query,cell) LUTs and
    the codebook all BROADCAST; the corpus moves once into the
    residual join (at 100 TB: the one-time index build, stored
    bucketed by cell) and once through the cell-key candidate join
    (~nprobe·√n codes per query). Scoring is the shared row-local ADC
    integer fold; ranking ties break (adc_dist, neighbor_id); all
    arithmetic stays in the exact v6 integer domain (residuals are
    differences of exact integers), so the oracle replays the
    identical chain: shared _PQS_PART + IVF CTEs + the parameterized
    _pq_train_duck trainer on (rpqs, rpqv).

    r13 consolidation (VERDICT r12 item 5): this query is now a
    CONSUMER of residual_artifacts_memo — its ranked top-k is the
    probe_rn<=2 level cut of the deepest chain at rank<=k (the
    recall grid's 'ivfadc_res' derivation since r11), identical
    values by construction. q_pq_rerank_np4 is the one OWNER that
    pays the deepest build every invocation."""
    sp, _fullv = residual_artifacts_memo(spark, sf_dir)
    wl = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        sp.filter(F.col("probe_rn") <= _IVF_NPROBE)
        .withColumn("rank", F.row_number().over(wl).cast("long"))
        .filter(F.col("rank") <= PQ_TOP_K)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


# ---------------------------------------------------------------------------
# PQ shortlist -> exact re-rank: the refinement stage (Jégou §V)
# ---------------------------------------------------------------------------

# The one standard retrieval stage the ladder was missing (VERDICT r9
# item 2): the compressed index answers cheaply but coarsely, so a
# production search takes the IVFADC coarse top-m (m = RERANK_M ≈ 4×k)
# and re-ranks those m survivors with FULL-precision distances — the
# refinement step of Jégou, Douze & Schmid 2011 (§V / the "re-rank
# with source coding" follow-up). Recall@1 recovers most of what the
# 4-bit codes lost while the exact math touches only q·m vectors,
# never the corpus.

RERANK_M = 4 * PQ_TOP_K  # coarse survivors per query

# Exact integer L2 between two gathered v6 component arrays —
# identical fold in both engines (exact int64: |v6| <= ~1e6 so the
# 64-dim sum of squared diffs stays far below 2^63).
_RERANK_L2_S = (
    "CAST(aggregate(zip_with(qv, nv, (a, b) -> (a - b) * (a - b)), "
    "0L, (acc, z) -> acc + z) AS BIGINT)"
)
_RERANK_L2_D = (
    f"CAST(list_sum(list_transform(generate_series(1, {H.EMB_DIM}), "
    "i -> (q.v64[i] - n.v64[i]) * (q.v64[i] - n.v64[i]))) AS BIGINT)"
)

# Shared rerank WITH-parts over a residual-chain ranking CTE and the
# component table `pqs` (both in scope wherever the chain is).
# ``ranked``/``pfx`` let the recall grid rerank TWO probe depths from
# one chain evaluation; ``emit_fullv=False`` skips the shared fullv
# CTE when an earlier block in the same WITH already emitted it.
def _rerank_parts(ranked: str = "riranked", pfx: str = "r", emit_fullv: bool = True) -> str:
    fullv_cte = (
        """fullv AS MATERIALIZED (
  SELECT vec_id, list(v6 ORDER BY s, p) AS v64 FROM pqs GROUP BY vec_id
),
"""
        if emit_fullv
        else ""
    )
    return f"""{pfx}short AS (
  SELECT query_id, neighbor_id FROM {ranked} WHERE rank <= {RERANK_M}
),
{fullv_cte}{pfx}rd AS (
  SELECT s.query_id, s.neighbor_id, {_RERANK_L2_D} AS exact_l2
  FROM {pfx}short s
  JOIN fullv q ON q.vec_id = s.query_id
  JOIN fullv n ON n.vec_id = s.neighbor_id
),
{pfx}rk AS (
  SELECT query_id, neighbor_id, exact_l2,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY exact_l2, neighbor_id
         ) AS BIGINT) AS rank
  FROM {pfx}rd
)"""


_RERANK_PARTS = _rerank_parts(pfx="r")

_PQ_RERANK_ORACLE = f"""
WITH {_IVFADC_RES_CHAIN},
{_RERANK_PARTS}
SELECT query_id, neighbor_id, exact_l2, rank
FROM rrk WHERE rank <= {PQ_TOP_K}
"""

# The nprobe=4 operating point of the same refined search — the chain
# at WHO-prune depth 4, rerank parts verbatim (VERDICT r10 item 1).
_PQ_RERANK_NP4_ORACLE = f"""
WITH {_ivfadc_res_chain(nprobe=4)},
{_RERANK_PARTS}
SELECT query_id, neighbor_id, exact_l2, rank
FROM rrk WHERE rank <= {PQ_TOP_K}
"""


def _pq_exact_rerank(short: DataFrame, fullv: DataFrame) -> DataFrame:
    """Coarse shortlist (query_id, neighbor_id) + exact component
    arrays (vec_id, v64) -> full-precision integer-L2 top-k. The
    bounded q×m shortlist BROADCASTS into both fullv equi-joins, so
    the corpus vectors never shuffle for the refine stage."""
    qv = fullv.alias("qf").select(
        F.col("vec_id").alias("query_id"), F.col("v64").alias("qv")
    )
    nv = fullv.alias("nf").select(
        F.col("vec_id").alias("neighbor_id"), F.col("v64").alias("nv")
    )
    exact = (
        F.broadcast(short.select("query_id", "neighbor_id"))
        .join(nv, "neighbor_id")
        .join(qv, "query_id")
        .select("query_id", "neighbor_id", F.expr(_RERANK_L2_S).alias("exact_l2"))
    )
    w = Window.partitionBy("query_id").orderBy("exact_l2", "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= PQ_TOP_K)
        .select("query_id", "neighbor_id", "exact_l2", "rank")
    )


@query("pq_rerank_topk", oracle=_PQ_RERANK_ORACLE)
def q_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC coarse top-40 -> full-precision exact re-rank top-k:
    the refinement stage of Jégou et al. 2011 §V that completes the
    compression ladder (build -> compress -> serve -> tune -> REFINE).
    The residual-ADC search keeps its 40-deep (RERANK_M = 4×k)
    shortlist instead of cutting at k, then the survivors re-score
    with the exact int64
    L2 between full-precision v6 component arrays and the final top-k
    ranks on the exact distance — compressed codes decide WHO to look
    at, full precision decides the ORDER.

    Scale shape: the coarse stage is ivfadc_residual_topk's plan
    unchanged (broadcast LUTs/codebooks, cell-key candidate join, no
    q·n term); the refine stage broadcasts the bounded q×m shortlist
    into two fullv equi-joins (at 100 TB: the full-precision vector
    store keyed by id — the paper keeps it on disk beside the codes),
    so exact math touches q·m rows and the corpus never shuffles.
    Exactness: v6 arrays are gathered from the SAME component pass as
    the residual build; L2 is an exact int64 fold; ranking ties break
    (exact_l2, neighbor_id); the oracle replays the shared
    _IVFADC_RES_CHAIN plus the rerank parts verbatim. pq_recall_at_k
    measures the lift on the 'pq_rerank' grid row.

    r13 consolidation (VERDICT r12 item 5): this query is now a
    CONSUMER of residual_artifacts_memo — the nprobe=2 shortlist is
    the probe_rn<=2 level cut of the deepest chain (the identical
    derivation the recall grid has used since r11), so rebuilding the
    whole chain here bought nothing. q_pq_rerank_np4 is the one OWNER
    that pays the deepest build every invocation."""
    sp, fullv = residual_artifacts_memo(spark, sf_dir)
    wl = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    short = (
        sp.filter(F.col("probe_rn") <= _IVF_NPROBE)
        .withColumn("rank", F.row_number().over(wl).cast("long"))
        .filter(F.col("rank") <= RERANK_M)
    )
    return _pq_exact_rerank(short, fullv)


@query("pq_rerank_np4", oracle=_PQ_RERANK_NP4_ORACLE)
def q_pq_rerank_np4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The refined IVFADC search at nprobe=4 — the WHO-prune lever
    pulled (VERDICT r10 item 1): pq_rerank_topk proved recall@k is
    bounded by the probed-cell ceiling at nprobe=2 (0.26 = the
    nprobe=2 point of ivf_nprobe_sweep, with 0.46/0.74 available at
    4/8), so the production operating point doubles the probe depth
    and keeps the exact re-rank. Residual training is probe-
    independent — the same codebooks, codes and centroids as the
    nprobe=2 path; only the probe list, the per-(query, probed-cell)
    LUT build and the cell-key candidate join widen (scan cost
    ~2× codes per query, still ~nprobe·√n, never O(q·n)).

    Plan shape is q_pq_rerank_topk verbatim at nprobe=4: broadcast
    LUTs/codebooks/probes, one cell-key candidate join, bounded q×m
    shortlist broadcast into the fullv equi-joins — corpus never
    shuffles in refine. Oracle replays the shared parameterized chain
    at nprobe=4 plus the rerank parts. pq_recall_at_k measures the
    recall lift on the 'pq_rerank_np4' grid row."""
    short, fullv = ivfadc_residual_topk(
        spark, sf_dir, k=RERANK_M, with_fullv=True, nprobe=4
    )
    return _pq_exact_rerank(short, fullv)


# Session-scoped memo of the CHECKPOINTED residual-chain artifacts for
# CONSUMER queries (VERDICT r11 item 1, the brute_truth_memo pattern):
# the deepest-level (nprobe=4, probe-rank-tagged) scored pair set plus
# the exact fullv component arrays are fixed artifacts of (corpus,
# ADC_QUERY_FILTER, PQ grid constants) — identical for every eval grid
# that reads them, and each grid derives its shallower operating
# points by level cuts (probe_rn <= 2 / rank <= RERANK_M), never by
# retraining.
#
# OWNERSHIP DECISION (r13, VERDICT r12 item 5): through round 12 all
# three residual *_topk queries rebuilt the identical chain at ~6 s
# each (~18 s/round) under the owners-pay contract. That bought no
# extra evidence — the nprobe=2 queries are EXACT level cuts of the
# deepest chain, the same derivation the recall grid has trusted since
# r11 — so the surface is consolidated to ONE owner:
# q_pq_rerank_np4 (the deepest configuration, the production
# operating point) calls ivfadc_residual_topk() directly and pays the
# full build every invocation; q_ivfadc_residual_topk and
# q_pq_rerank_topk consume the memo and level-cut (the
# ann_bruteforce_topk/brute_truth_memo precedent: one honest owner of
# the artifact cost, every derived read memo-warm and declared in
# bench.py's memo_warm). Values are eagerly localCheckpointed
# DataFrames — rows live executor-side, only the handles on the
# driver; eviction unpersists them (ADVICE r12).
def _unpersist_residual(_key: object, dfs: tuple[DataFrame, ...]) -> None:
    """Eviction hook (ADVICE r12): the memo values are EAGER
    localCheckpoints — executor-resident storage blocks, not
    driver rows like the centroid/LSH memos — so dropping the
    handles on eviction would strand the blocks until JVM GC.
    free_local_checkpoint does the real free (guarded; see
    memo.py for the Dataset.unpersist() gotcha)."""
    for df in dfs:
        free_local_checkpoint(df)


_RESIDUAL_MEMO: dict[tuple[str, str, int, bool], tuple[DataFrame, DataFrame]] = (
    BoundedMemo(maxsize=4, on_evict=_unpersist_residual)
)


def residual_artifacts_memo(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Consumer-facing residual-chain artifacts: (scored_pairs, fullv)
    where scored_pairs is EVERY candidate of the nprobe=4 chain tagged
    with its probe rank (query_id, neighbor_id, probe_rn, adc_dist)
    and fullv is the exact (vec_id, v64) integer component arrays.
    First call per (app, sf_dir) materializes ivfadc_residual_topk's
    build behind eager localCheckpoints; later calls reuse the
    handles. nprobe/scored_pairs sit in the key for self-description —
    the memo only ever stores the deepest (4, True) configuration,
    from which every shallower operating point is a row filter.

    POST-EVICTION INVALIDATION (ADVICE r13): eviction FREES the
    checkpoint blocks, and localCheckpoint lineage is truncated — an
    outstanding DataFrame built from an evicted entry throws
    "checkpoint block not found" at evaluation instead of recomputing.
    Consumers must therefore call THIS function at build time and
    evaluate promptly (the registered queries do: each collects its
    level cut within its own invocation), never hold derived handles
    across later calls with new (app, sf_dir) keys (needs ≥ 4 other
    sf_dirs in one session to bite, but the failure is silent until
    hit)."""
    key = (spark.sparkContext.applicationId, sf_dir, 4, True)
    hit = live_hit(_RESIDUAL_MEMO, key)
    if hit is None:
        sp, fullv = ivfadc_residual_topk(
            spark,
            sf_dir,
            checkpoint=True,
            with_fullv=True,
            nprobe=4,
            scored_pairs=True,
        )
        hit = (
            sp.localCheckpoint(eager=True),
            fullv.localCheckpoint(eager=True),
        )
        _RESIDUAL_MEMO[key] = hit
    return hit


# ---------------------------------------------------------------------------
# PQ recall audit: what the compressed scans actually retrieve
# ---------------------------------------------------------------------------

# The house measure-the-estimator discipline (ann_recall_at_k,
# minhash_jaccard_calibration) applied to the compression ladder: the
# ADC full scan and the IVF-PQ probe are ranked against the EXACT
# cosine top-k ground truth on the same query subset. Two operating
# points on the PQ grid — full-scan codes (compression loss only) and
# nprobe-pruned codes (compression + WHO-prune loss) — so the recall
# cost of each design decision is a separate measured number.

_PQ_RECALL_TAIL = """
SELECT method,
       CAST(hits AS BIGINT) AS hits,
       CAST(total AS BIGINT) AS brute_total,
       floor(hits * 1000000.0 / total + 0.5) / 1000000.0 AS recall_at_k,
       CAST(hits_at_1 AS BIGINT) AS hits_at_1,
       CAST(total_at_1 AS BIGINT) AS total_at_1,
       floor(hits_at_1 * 1000000.0 / total_at_1 + 0.5) / 1000000.0 AS recall_at_1
FROM (
  SELECT 'pq_adc' AS method,
         (SELECT count(*) FROM adc l JOIN brute b
            ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id) AS hits,
         (SELECT count(*) FROM adc l JOIN brute b
            ON l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id
            AND b.rank = 1) AS hits_at_1,
         (SELECT count(*) FROM brute) AS total,
         (SELECT count(*) FROM brute WHERE rank = 1) AS total_at_1
  UNION ALL
  SELECT 'ivf_pq' AS method,
         (SELECT count(*) FROM ivfpq i JOIN brute b
            ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id) AS hits,
         (SELECT count(*) FROM ivfpq i JOIN brute b
            ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
            AND b.rank = 1) AS hits_at_1,
         (SELECT count(*) FROM brute) AS total,
         (SELECT count(*) FROM brute WHERE rank = 1) AS total_at_1
  UNION ALL
  SELECT 'ivfadc_res' AS method,
         (SELECT count(*) FROM ivfadc i JOIN brute b
            ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id) AS hits,
         (SELECT count(*) FROM ivfadc i JOIN brute b
            ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
            AND b.rank = 1) AS hits_at_1,
         (SELECT count(*) FROM brute) AS total,
         (SELECT count(*) FROM brute WHERE rank = 1) AS total_at_1
  UNION ALL
  SELECT 'pq_rerank' AS method,
         (SELECT count(*) FROM rerank i JOIN brute b
            ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id) AS hits,
         (SELECT count(*) FROM rerank i JOIN brute b
            ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
            AND b.rank = 1) AS hits_at_1,
         (SELECT count(*) FROM brute) AS total,
         (SELECT count(*) FROM brute WHERE rank = 1) AS total_at_1
  UNION ALL
  SELECT 'pq_rerank_np4' AS method,
         (SELECT count(*) FROM rerank4 i JOIN brute b
            ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id) AS hits,
         (SELECT count(*) FROM rerank4 i JOIN brute b
            ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
            AND b.rank = 1) AS hits_at_1,
         (SELECT count(*) FROM brute) AS total,
         (SELECT count(*) FROM brute WHERE rank = 1) AS total_at_1
)
"""

# ONE nested evaluation of the residual chain serves ALL THREE
# residual rows (DuckDB forbids an inner WITH alias shadowing an outer
# CTE, so the chain cannot sit at the top level beside the other
# nested chains): the chain evaluates ONCE at the deepest probe level
# (nprobe=4) with candidates tagged by probe rank; the nprobe=2 rows
# re-rank the probe_rn<=2 subset and `riranked` IS the nprobe=4
# ranking — the same one-build level-cut sharing the Spark side does,
# so neither engine pays the residual build (or the candidate scan)
# twice.
_RES_BOTH_SQL = f"""WITH {_ivfadc_res_chain(nprobe=4, tag_probe_rn=True)},
rir2 AS (
  SELECT query_id, neighbor_id, adc_dist,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY adc_dist, neighbor_id
         ) AS BIGINT) AS rank
  FROM ridists WHERE probe_rn <= {_IVF_NPROBE}
),
{_rerank_parts(ranked="rir2", pfx="r2")},
{_rerank_parts(ranked="riranked", pfx="r4", emit_fullv=False)}
SELECT 'coarse' AS stage, query_id, neighbor_id, rank FROM rir2
UNION ALL
SELECT 'rerank' AS stage, query_id, neighbor_id, rank FROM r2rk
UNION ALL
SELECT 'rerank4' AS stage, query_id, neighbor_id, rank FROM r4rk"""

_PQ_RECALL_ORACLE = f"""
WITH brute AS ({_ANN_BRUTE_ORACLE}),
adc AS ({_ADC_ORACLE}),
ivfpq AS ({_IVFPQ_ORACLE}),
resboth AS MATERIALIZED ({_RES_BOTH_SQL}),
ivfadc AS (
  SELECT query_id, neighbor_id FROM resboth
  WHERE stage = 'coarse' AND rank <= {PQ_TOP_K}
),
rerank AS (
  SELECT query_id, neighbor_id FROM resboth
  WHERE stage = 'rerank' AND rank <= {PQ_TOP_K}
),
rerank4 AS (
  SELECT query_id, neighbor_id FROM resboth
  WHERE stage = 'rerank4' AND rank <= {PQ_TOP_K}
)
{_PQ_RECALL_TAIL}
"""


@query("pq_recall_at_k", oracle=_PQ_RECALL_ORACLE)
def q_pq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k (and @1) of the two PQ retrieval paths against the
    exact cosine top-k — the measured answer to "what do 4-bit codes
    cost": 'pq_adc' isolates pure compression loss (full code scan,
    every vector scored), 'ivf_pq' adds the WHO-prune loss on top
    (nprobe cells only), so the gap between the two rows IS the
    price of pruning and the gap between pq_adc and 1.0 IS the price
    of quantization. Same query subset, ground truth and report shape
    as ann_recall_at_k, so all five retrievers (brute/SRP/IVF/ADC/
    IVF-PQ) sit on one comparable recall grid.

    One PQ build feeds both raw-code paths (pq_search_parts,
    checkpointed); the exact ground truth comes from the consumer-side
    session memo (brute_truth_memo — the grid is a CONSUMER of the
    truth artifact; the owner, ann_bruteforce_topk, still pays its own
    O(q·n) build every invocation — VERDICT r10 item 4, the
    semdedup_assign_memo pattern; first grid invocation per session
    still pays the full truth build). The three residual grid rows
    likewise consume residual_artifacts_memo — the deepest-level
    chain build shared with graded_retrieval_eval, level-cut per row
    (VERDICT r11 item 1). Audit-tier by contract: production
    health-checks sample fixed probes (ann_recall_fixed_probes)."""
    from eventstreamer_spark.operators.similarity import brute_truth_memo

    parts = pq_parts_memo(spark, sf_dir)
    e, qlut, codes = parts
    brute = brute_truth_memo(spark, sf_dir)
    total = brute.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((F.col("rank") == 1).cast("long")).alias("total_at_1"),
    )
    adc = _adc_rank_topk(
        F.broadcast(qlut)
        .join(codes, F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "sl", "cvec")
    )
    ivfpq = ivf_pq_topk(spark, sf_dir, parts=parts)
    # the residual points on the same grid come from the consumer-side
    # session memo (residual_artifacts_memo — VERDICT r11 item 1; the
    # owners, the three *_topk residual queries, still pay their own
    # builds every invocation): ONE build at the DEEPEST probe level
    # (nprobe=4) serves all THREE residual rows — residual training is
    # probe-independent, so the grid gathers every scored candidate
    # tagged with its probe rank, the nprobe=2 rows cut the
    # probe_rn<=2 subset ('ivfadc_res' at k, 'pq_rerank' via the exact
    # re-rank of its top-M) and 'pq_rerank_np4' re-ranks the full
    # depth — the oracle's resboth block makes the identical cuts.
    # First grid invocation per session still pays the full build.
    sp, fullv = residual_artifacts_memo(spark, sf_dir)
    wl = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")

    def level_cut(df: DataFrame, kk: int) -> DataFrame:
        return (
            df.withColumn("rank", F.row_number().over(wl).cast("long"))
            .filter(F.col("rank") <= kk)
        )

    short2 = level_cut(
        sp.filter(F.col("probe_rn") <= _IVF_NPROBE), RERANK_M
    ).localCheckpoint(eager=False)  # coarse row + np2 rerank
    ivfadc = short2.filter(F.col("rank") <= PQ_TOP_K)
    rerank = _pq_exact_rerank(short2, fullv)
    rerank4 = _pq_exact_rerank(level_cut(sp, RERANK_M), fullv)

    def method_hits(name: str, df: DataFrame) -> DataFrame:
        return (
            df.select("query_id", "neighbor_id")
            .join(brute, ["query_id", "neighbor_id"])
            .agg(
                F.count(F.lit(1)).alias("hits"),
                F.coalesce(
                    F.sum((F.col("rank") == 1).cast("long")), F.lit(0)
                ).alias("hits_at_1"),
            )
            .select(F.lit(name).alias("method"), "hits", "hits_at_1")
        )

    rows = (
        method_hits("pq_adc", adc)
        .unionByName(method_hits("ivf_pq", ivfpq))
        .unionByName(method_hits("ivfadc_res", ivfadc))
        .unionByName(method_hits("pq_rerank", rerank))
        .unionByName(method_hits("pq_rerank_np4", rerank4))
    )

    def ratio6(num: str, den: str):
        return F.floor(
            F.col(num) * F.lit(1000000.0) / F.col(den) + F.lit(0.5)
        ) / F.lit(1000000.0)

    return rows.crossJoin(total).select(
        "method",
        "hits",
        F.col("total").alias("brute_total"),
        ratio6("hits", "total").alias("recall_at_k"),
        "hits_at_1",
        "total_at_1",
        ratio6("hits_at_1", "total_at_1").alias("recall_at_1"),
    )


# ---------------------------------------------------------------------------
# OPQ-lite: variance-balanced dimension allocation for PQ subspaces
# ---------------------------------------------------------------------------

# Optimized Product Quantization (Ge, He, Ke & Sun, CVPR 2013) learns
# an orthogonal rotation R before PQ so quantization error spreads
# evenly across subspaces. The FULL non-parametric OPQ alternates SVD
# solves with codebook refits — float eigendecompositions that cannot
# live in this repo's exact integer cross-engine contract (the
# twice-deferred VERDICT item, formally resolved here): the only
# orthogonal transforms that keep v6 components exactly representable
# are SIGNED PERMUTATIONS. So we implement the permutation member of
# the OPQ family — the paper's balanced dimension-allocation
# initialization (its Fig. "OPQ_NP init" / Faiss's pre-permutation):
# rank dimensions by a dispersion key and deal them into subspaces in
# snake order, so each subspace receives one dim per dispersion band
# and the per-subspace total dispersion is near-equal. The dispersion
# key is the integer mean-absolute-deviation sum Σ|v6 − mean6(dim)| —
# exact int64 at any realistic scale (≤ n·1e6: 1e12 vectors still fit
# int64), where a sum-of-squares key would overflow the exact domain
# at x100. The audit trains the SAME two-pass PQ on both layouts and
# reports per-subspace dispersion spread plus corpus-wide
# reconstruction fidelity — the measure-the-estimator discipline: on
# a near-isotropic space (embedding_anisotropy_audit measured 0.0024)
# the balanced layout should ≈match identity fidelity while provably
# flattening the spread; on skewed real spaces the same permutation
# is the cheap first OPQ step.

_OPQ_SNAKE_S = (
    f"CAST(CASE WHEN (rn DIV {PQ_SUBS}) % 2 = 0 THEN rn % {PQ_SUBS} "
    f"ELSE {PQ_SUBS - 1} - rn % {PQ_SUBS} END AS INT)"
)
_OPQ_SNAKE_D = (
    f"CAST(CASE WHEN (rn // {PQ_SUBS}) % 2 = 0 THEN rn % {PQ_SUBS} "
    f"ELSE {PQ_SUBS - 1} - rn % {PQ_SUBS} END AS INTEGER)"
)


def _opq_layout_duck(pref: str, alloc_cte: str) -> str:
    """Per-layout oracle block: permuted components -> gathered arrays
    -> the shared two-pass PQ trainer -> reconstruction beside the
    same-order original -> corpus-wide quantized-cosine fidelity +
    the per-subspace dispersion spread, as one summary row."""
    train = ",\n".join(_pq_train_duck(pref, f"{pref}pqs", f"{pref}pqv"))
    return f"""{pref}pqs AS MATERIALIZED (
  SELECT s0.vec_id, a.s, a.p, s0.v6 FROM osub s0 JOIN {alloc_cte} a USING (i0)
),
{pref}pqv AS MATERIALIZED (
  SELECT vec_id, s, list(v6 ORDER BY p) AS v_arr FROM {pref}pqs GROUP BY 1, 2
),
{train},
{pref}rec AS MATERIALIZED (
  SELECT a.vec_id, list(CAST(m.m6 AS DOUBLE) / 1000000.0 ORDER BY m.s, m.p) AS rec
  FROM {pref}a2 a JOIN {pref}m1 m ON m.s = a.s AND m.c = a.c
  GROUP BY 1
),
{pref}ov AS (
  SELECT vec_id, list(CAST(v6 AS DOUBLE) / 1000000.0 ORDER BY s, p) AS ov
  FROM {pref}pqs GROUP BY 1
),
{pref}u AS (
  SELECT {H.quantized_unit_duck("o.ov")} AS uq_o,
         {H.quantized_unit_duck("r.rec")} AS uq_r
  FROM {pref}ov o JOIN {pref}rec r USING (vec_id)
),
{pref}f AS (
  SELECT round({H.qcosine_duck("uq_o", "uq_r")}, 5) AS fid
  FROM {pref}u WHERE uq_o[1] IS NOT NULL
),
{pref}sp AS (
  SELECT CAST(max(ssum) - min(ssum) AS BIGINT) AS mad_spread
  FROM (SELECT s, sum(mad_sum) AS ssum FROM {alloc_cte} GROUP BY 1)
),
{pref}row AS (
  SELECT sp.mad_spread,
         CAST(count(*) AS BIGINT) AS n_vecs,
         {_MEAN6_DUCK.format(v="fid")} AS mean_fidelity,
         min(fid) AS min_fidelity
  FROM {pref}f, {pref}sp sp
  GROUP BY sp.mad_spread
)"""


_OPQ_ORACLE = f"""
WITH osub AS MATERIALIZED (
  SELECT vec_id, CAST(i - 1 AS INTEGER) AS i0,
         CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT) AS v6
  FROM (
    SELECT vec_id, unnest(embedding) AS x,
           unnest(generate_series(1, len(embedding))) AS i
    FROM embeddings
  )
),
dmean AS (
  SELECT i0, CAST(floor(sum(v6) * 1.0 / count(*) + 0.5) AS BIGINT) AS m6
  FROM osub GROUP BY 1
),
dkey AS (
  SELECT s.i0, CAST(sum(abs(s.v6 - d.m6)) AS BIGINT) AS mad_sum
  FROM osub s JOIN dmean d USING (i0) GROUP BY 1
),
balloc AS (
  SELECT i0, mad_sum, {_OPQ_SNAKE_D} AS s,
         CAST(rn // {PQ_SUBS} AS INTEGER) AS p
  FROM (
    SELECT i0, mad_sum,
           row_number() OVER (ORDER BY mad_sum DESC, i0) - 1 AS rn
    FROM dkey
  )
),
ialloc AS (
  SELECT i0, mad_sum, CAST(i0 // {PQ_SUBDIM} AS INTEGER) AS s,
         CAST(i0 % {PQ_SUBDIM} AS INTEGER) AS p
  FROM dkey
),
{_opq_layout_duck("oi", "ialloc")},
{_opq_layout_duck("ob", "balloc")}
SELECT 'identity' AS layout, mad_spread, n_vecs, mean_fidelity, min_fidelity
FROM oirow
UNION ALL
SELECT 'variance_balanced' AS layout, mad_spread, n_vecs, mean_fidelity,
       min_fidelity
FROM obrow
"""


@query("opq_permute_audit", oracle=_OPQ_ORACLE)
def q_opq_permute_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ-lite (see section comment): the variance-balancing
    dimension PERMUTATION — the only orthogonal transform that stays
    in the exact integer contract — applied before PQ, audited
    against the identity layout. Per layout: per-subspace
    mean-absolute-deviation spread (max − min of subspace dispersion
    totals — what the allocation exists to flatten) and corpus-wide
    cosine(original, reconstruction) fidelity from the SAME two-pass
    trainer.

    Scale shape: the corpus explodes ONCE into integer components
    (lazy checkpoint; three consumers — the dispersion keys and both
    layout trains); the 64-row allocation tables broadcast; each
    layout's train is pq_build's shape (gathered subspace arrays,
    broadcast codebooks, row-local argmin folds, map-side-combined
    1024-key refits). Ranking 64 dims is a 64-row single-partition
    window — bounded by EMB_DIM, not data. Exactness: dispersion keys
    are exact int64 MAD sums (a sum-of-squares key would leave the
    exact domain at x100), the snake allocation is integer arithmetic
    over a deterministic (key DESC, dim) rank, training/recon are the
    existing verified integer kernels, fidelity is the quantized
    integer-dot report."""
    e = load_table_parallel(spark, sf_dir, "embeddings")
    sub0 = (
        e.select("vec_id", F.posexplode("embedding").alias("i0", "x"))
        .select(
            "vec_id",
            F.col("i0").cast("int").alias("i0"),
            F.expr("CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)").alias(
                "v6"
            ),
        )
        .localCheckpoint(eager=False)  # keys + both layout trains
    )
    dmean = sub0.groupBy("i0").agg(
        F.expr("CAST(floor(sum(v6) * 1.0 / count(*) + 0.5) AS BIGINT)").alias("m6")
    )
    dkey = (
        sub0.join(F.broadcast(dmean), "i0")
        .groupBy("i0")
        .agg(F.sum(F.abs(F.col("v6") - F.col("m6"))).cast("long").alias("mad_sum"))
        .localCheckpoint(eager=False)  # both allocation tables
    )
    wk = Window.orderBy(F.col("mad_sum").desc(), F.col("i0"))
    balloc = dkey.withColumn("rn", F.row_number().over(wk) - F.lit(1)).select(
        "i0",
        "mad_sum",
        F.expr(_OPQ_SNAKE_S).alias("s"),
        F.expr(f"CAST(rn DIV {PQ_SUBS} AS INT)").alias("p"),
    )
    ialloc = dkey.select(
        "i0",
        "mad_sum",
        F.expr(f"CAST(i0 DIV {PQ_SUBDIM} AS INT)").alias("s"),
        F.expr(f"CAST(i0 % {PQ_SUBDIM} AS INT)").alias("p"),
    )

    def layout_row(name: str, alloc: DataFrame) -> DataFrame:
        alloc = alloc.localCheckpoint(eager=False)  # train join + spread
        sub = sub0.join(F.broadcast(alloc), "i0").select("vec_id", "s", "p", "v6")
        pqv = (
            sub.groupBy("vec_id", "s")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(p, v6))), e -> e.v6)"
                ).alias("v_arr")
            )
            .repartition(shuffle_partitions(spark), "vec_id")
            .localCheckpoint(eager=False)
        )
        m1, a2 = _pq_train(sub, pqv)
        rec = (
            a2.join(F.broadcast(m1), ["s", "c"])
            .groupBy("vec_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(s, p, m6))), "
                    "e -> CAST(e.m6 AS DOUBLE) / 1000000.0)"
                ).alias("rec")
            )
        )
        ov = sub.groupBy("vec_id").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(s, p, v6))), "
                "e -> CAST(e.v6 AS DOUBLE) / 1000000.0)"
            ).alias("ov")
        )
        r = ov.join(rec, "vec_id")
        r = H.with_quantized_unit(r, "ov", "uq_o", drop_zero_norm=True)
        r = H.with_quantized_unit(r, "rec", "uq_r")
        fid = r.select(F.round(H.qcosine_expr("uq_o", "uq_r"), 5).alias("fid"))
        spread = alloc.groupBy("s").agg(
            F.sum("mad_sum").cast("long").alias("ssum")
        ).agg((F.max("ssum") - F.min("ssum")).cast("long").alias("mad_spread"))
        return (
            fid.agg(
                F.count(F.lit(1)).cast("long").alias("n_vecs"),
                _mean6_spark(F.col("fid")).alias("mean_fidelity"),
                F.min("fid").alias("min_fidelity"),
            )
            .crossJoin(F.broadcast(spread))
            .select(
                F.lit(name).alias("layout"),
                "mad_spread",
                "n_vecs",
                "mean_fidelity",
                "min_fidelity",
            )
        )

    return layout_row("identity", ialloc).unionByName(
        layout_row("variance_balanced", balloc)
    )


# ---------------------------------------------------------------------------
# KMV distinct-count sketch, audited against the exact count
# ---------------------------------------------------------------------------

# K-minimum-values (Bar-Yossef et al. 2002): keep the k smallest
# normalized hashes of the distinct values; estimate the cardinality
# as (k-1)/u_k. The mergeable alternative to exact countDistinct at
# 100 TB — union of sketches = min-k of the unions, k·8 bytes of state
# per group — and unlike HLL's harmonic mean the estimate derives from
# ONE order statistic, so there is no float-summation order to drift
# between engines: the k-th smallest 48-bit md5 prefix is an integer
# both engines agree on bit-for-bit. Audited the CMS way: exact twin
# alongside, relative error quantified.

KMV_K = 256
_KMV_DENOM = 281474976710656.0  # 2^48, the hash-prefix domain


def _kmv_hash(engine: str, col: str = "tok") -> str:
    if engine == "spark":
        return f"CAST(conv(substring(md5({col}), 1, 12), 16, 10) AS BIGINT)"
    return f"CAST('0x' || substring(md5({col}), 1, 12) AS BIGINT)"


# The sketch domain is the 3-token SHINGLE universe, not the unigram
# vocabulary: the synthetic corpus has only ~31 distinct tokens, which
# would land every run in the n < k exact path and audit nothing. The
# shingle universe is tens of thousands strong at every sf — and it is
# the domain dedup actually cares about (minhash operates on the same
# shingles; this sketch prices its universe).
_KMV_ORACLE = f"""
WITH tk AS (SELECT {_TOKS_D} AS toksarr FROM documents),
toks AS (
  SELECT DISTINCT unnest({H.shingles_from_tokens_duck("toksarr")}) AS tok FROM tk
),
h AS (SELECT DISTINCT {_kmv_hash("duck")} AS hv FROM toks),
mins AS (SELECT hv FROM h ORDER BY hv LIMIT {KMV_K}),
kth AS (
  SELECT CAST(max(hv) AS BIGINT) AS hk, CAST(count(*) AS BIGINT) AS n_kept
  FROM mins
),
ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM toks)
SELECT CAST({KMV_K} AS BIGINT) AS k_minvals,
       ex.exact_distinct,
       CASE WHEN kth.n_kept < {KMV_K}
            THEN CAST(kth.n_kept AS DOUBLE)
            ELSE floor(CAST({KMV_K} - 1 AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / kth.hk * 100 + 0.5) / 100.0
       END AS kmv_estimate,
       floor(abs(CASE WHEN kth.n_kept < {KMV_K}
                      THEN CAST(kth.n_kept AS DOUBLE)
                      ELSE floor(CAST({KMV_K} - 1 AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / kth.hk * 100 + 0.5) / 100.0
                 END - ex.exact_distinct)
             * 1000000 / ex.exact_distinct + 0.5) / 1000000.0 AS rel_err
FROM kth, ex
"""


@query("kmv_distinct_audit", oracle=_KMV_ORACLE)
def q_kmv_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV cardinality sketch over the corpus 3-shingle universe
    (the minhash feature domain), audited:
    the k = 256 smallest 48-bit md5 prefixes of the DISTINCT
    tokens give estimate (k-1)/u_k, reported beside the exact distinct
    count with the measured relative error (theory: ~1/sqrt(k-2) ≈ 6%
    at one sigma).

    Scale shape: the distinct pass is one hash aggregation with
    map-side combine (same shape as token counting); the k smallest
    then come from a sort-LIMIT, which Spark executes as
    TakeOrderedAndProject — per-partition partial top-k merged on the
    driver, k rows moving, never a global sort. The exact twin costs a
    second aggregate because this is the audit tier; a production
    deployment ships the sketch alone (and merges sketches across
    shards instead of re-scanning)."""
    d = load_table_parallel(spark, sf_dir, "documents")
    toks = (
        d.select(F.expr(_TOKS_S).alias("toksarr"))
        .select(
            F.explode(H.shingles_from_tokens_expr("toksarr")).alias("tok")
        )
        .distinct()
    )
    h = toks.select(F.expr(_kmv_hash("spark")).alias("hv")).distinct()
    mins = h.orderBy("hv").limit(KMV_K)
    kth = mins.agg(
        F.max("hv").cast("long").alias("hk"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    ex = toks.agg(F.count(F.lit(1)).cast("long").alias("exact_distinct"))
    est = F.when(
        F.col("n_kept") < KMV_K, F.col("n_kept").cast("double")
    ).otherwise(
        F.floor(
            F.lit(KMV_K - 1.0) * F.lit(_KMV_DENOM) / F.col("hk") * 100 + F.lit(0.5)
        )
        / 100.0
    )
    return kth.crossJoin(F.broadcast(ex)).select(
        F.lit(KMV_K).cast("long").alias("k_minvals"),
        "exact_distinct",
        est.alias("kmv_estimate"),
        (
            F.floor(
                F.abs(est - F.col("exact_distinct"))
                * 1000000
                / F.col("exact_distinct")
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# Population stability (PSI) drift audit between corpus halves
# ---------------------------------------------------------------------------

# The drift monitor every production ingest runs between yesterday's
# corpus and today's: bin a per-doc signal, compare the two
# populations' bin shares, report the population stability index
# PSI = Σ_b (p_cur − p_ref)·ln(p_cur/p_ref). Here the split is the
# deterministic doc_id parity (standing in for the time axis the
# fixture lacks), the signal is token count in fixed 60-token bands,
# and shares are Laplace-smoothed ((n_b+1)/(n+B)) so an empty bin
# contributes a finite term instead of ±inf. Each bin's term rounds to
# integer nano-units BEFORE the final sum, so the PSI total is an
# exact integer sum in both engines — no float-summation order to
# drift (the same discipline as every e6-domain aggregate here).

_PSI_BINS = 10


def _psi_bin(engine: str, ntoks: str) -> str:
    # fixed 60-token bands, clamped. INTEGER division spelled per
    # engine (duck // vs spark DIV) — a float divide + CAST would bin
    # differently, because DuckDB's double->BIGINT cast rounds while
    # Spark's truncates.
    op = "//" if engine == "duck" else "DIV"
    return f"LEAST(({ntoks}) {op} 60, {_PSI_BINS - 1})"


_PSI_ORACLE = f"""
WITH nt AS (
  SELECT doc_id, CAST(len({_TOKS_D}) AS BIGINT) AS n_toks FROM documents
),
halves AS (
  SELECT doc_id % 2 AS half,
         CAST({_psi_bin("duck", "n_toks")} AS BIGINT) AS bin
  FROM nt
),
cnt0 AS (
  SELECT bin,
         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM halves GROUP BY bin
),
cnt AS (
  SELECT s.bin, COALESCE(c.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur
  FROM (SELECT CAST(unnest(generate_series(0, {_PSI_BINS - 1})) AS BIGINT) AS bin) s
  LEFT JOIN cnt0 c ON s.bin = c.bin
),
tot AS (
  SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
         CAST(sum(n_cur) AS BIGINT) AS t_cur FROM cnt
),
terms AS (
  SELECT c.bin, c.n_ref, c.n_cur,
         (c.n_ref + 1.0) / (t.t_ref + {_PSI_BINS}.0) AS p_ref,
         (c.n_cur + 1.0) / (t.t_cur + {_PSI_BINS}.0) AS p_cur
  FROM cnt c, tot t
)
SELECT bin, n_ref, n_cur,
       floor(p_ref * 1000000 + 0.5) / 1000000.0 AS share_ref,
       floor(p_cur * 1000000 + 0.5) / 1000000.0 AS share_cur,
       CAST(round((p_cur - p_ref) * ln(p_cur / p_ref) * 1000000000, 0) AS BIGINT)
         / 1000000000.0 AS psi_term
FROM terms
"""


@query("population_drift_audit", oracle=_PSI_ORACLE)
def q_population_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift audit between the two doc_id-parity halves of the
    corpus: per fixed 60-token length band, both halves' counts,
    Laplace-smoothed shares, and the PSI term whose column sum IS the
    population stability index (rule of thumb: < 0.1 stable, > 0.25
    investigate — the parity split should sit near 0, making this the
    null-calibration row a real deployment compares drift against).

    Scale shape: one tokenize-count scan, one {_PSI_BINS}-key
    conditional-count aggregation (both halves in a single pass — no
    self-join of the corpus), a broadcast 1-row total. Terms round to
    integer nano-units per bin before any total, so cross-engine
    equality is exact."""
    d = load_table_parallel(spark, sf_dir, "documents").select("doc_id", "text")
    halves = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.expr(
            f"CAST({_psi_bin('spark', f'size({_TOKS_S})')} AS BIGINT)"
        ).alias("bin"),
    )
    cnt0 = halves.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("n_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("n_cur"),
    )
    # full bin spine: empty bins still carry their Laplace mass, so
    # the share columns each sum to exactly 1 and no term is dropped
    spine = spark.range(_PSI_BINS).select(F.col("id").cast("long").alias("bin"))
    cnt = spine.join(cnt0, "bin", "left").select(
        "bin",
        F.coalesce("n_ref", F.lit(0).cast("long")).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0).cast("long")).alias("n_cur"),
    )
    tot = cnt.agg(
        F.sum("n_ref").cast("long").alias("t_ref"),
        F.sum("n_cur").cast("long").alias("t_cur"),
    )
    terms = cnt.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        ((F.col("n_ref") + F.lit(1.0)) / (F.col("t_ref") + F.lit(float(_PSI_BINS)))).alias("p_ref"),
        ((F.col("n_cur") + F.lit(1.0)) / (F.col("t_cur") + F.lit(float(_PSI_BINS)))).alias("p_cur"),
    )
    return terms.select(
        "bin",
        "n_ref",
        "n_cur",
        (F.floor(F.col("p_ref") * 1000000 + F.lit(0.5)) / 1000000.0).alias("share_ref"),
        (F.floor(F.col("p_cur") * 1000000 + F.lit(0.5)) / 1000000.0).alias("share_cur"),
        (
            F.round(
                (F.col("p_cur") - F.col("p_ref"))
                * F.log(F.col("p_cur") / F.col("p_ref"))
                * 1000000000,
                0,
            ).cast("long")
            / 1000000000.0
        ).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# Embedding anisotropy audit: is the space collapsing toward a cone?
# ---------------------------------------------------------------------------

# The embedding-QC check run before any similarity machinery is
# trusted (Ethayarajh 2019's anisotropy observation): if vectors
# collapse toward a shared direction, the mean vector's energy
# approaches the mean per-vector energy and every cosine inflates.
# Reported: anisotropy = ||mean v||² / mean ||v||² (0 = isotropic,
# 1 = fully collapsed) and the top single dimension's share of total
# per-dimension variance (the axis-aligned poor-man's PCA read — a
# dominant axis means one feature eats the geometry). All in the v6
# integer domain: per-dim Σv and Σv² are exact int64; positive means
# use integer half-up ((q + n DIV 2) DIV n — `//`/`DIV` agree for
# positives); signed means stay exact in double below 2^53 (|Σv| ≤
# 1e6·n, fine to ~9e9 vectors — past that the audit pre-aggregates).

_ANISO_ORACLE = f"""
WITH comp AS (
  SELECT CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT) AS v6,
         CAST(i AS INTEGER) AS dim
  FROM (
    SELECT unnest(embedding) AS x,
           unnest(generate_series(1, len(embedding))) AS i
    FROM embeddings
  )
),
per AS (
  SELECT dim,
         CAST(sum(v6) AS BIGINT) AS s,
         CAST(sum(v6 * v6) AS BIGINT) AS q,
         CAST(count(*) AS BIGINT) AS n
  FROM comp GROUP BY dim
),
m AS (
  SELECT dim, n,
         CAST(floor(s * 1.0 / n + 0.5) AS BIGINT) AS mean6,
         (q + n // 2) // n AS msq12
  FROM per
),
agg AS (
  SELECT max(n) AS n_vectors,
         CAST(sum(msq12) AS BIGINT) AS mean_sq_norm12,
         CAST(sum(mean6 * mean6) AS BIGINT) AS mean_vec_sq12,
         CAST(sum(msq12 - mean6 * mean6) AS BIGINT) AS var_tot12,
         CAST(max(msq12 - mean6 * mean6) AS BIGINT) AS var_top12
  FROM m
)
SELECT CAST(n_vectors AS BIGINT) AS n_vectors,
       mean_sq_norm12 / 1000000000000.0 AS mean_sq_norm,
       mean_vec_sq12 / 1000000000000.0 AS mean_vec_sq_norm,
       floor(mean_vec_sq12 * 1000000.0 / mean_sq_norm12 + 0.5) / 1000000.0
         AS anisotropy,
       floor(var_top12 * 1000000.0 / var_tot12 + 0.5) / 1000000.0
         AS top_dim_var_share
FROM agg
"""


@query("embedding_anisotropy_audit", oracle=_ANISO_ORACLE)
def q_embedding_anisotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row embedding-space health report: anisotropy (mean-vector
    energy over mean vector energy — the collapse metric) and the top
    dimension's variance share (axis dominance). Near-zero anisotropy
    and ~1/dim variance share = healthy isotropic space; drift upward
    across snapshots is the degradation signal similarity serving
    monitors for.

    Plan shape: ONE posexplode pass into a 64-key (dim) aggregation
    with map-side combine, then a 1-row assemble — the cheapest audit
    in the embedding family, safe to run per snapshot at any scale.
    Exactness: per-dim Σv/Σv² exact int64; positive means via integer
    half-up division; only the final two shares divide."""
    e = load_table_parallel(spark, sf_dir, "embeddings")
    comp = e.select(F.posexplode("embedding").alias("i0", "x")).select(
        F.col("i0").alias("dim"),
        F.expr("CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)").alias("v6"),
    )
    per = comp.groupBy("dim").agg(
        F.sum("v6").cast("long").alias("s"),
        F.sum(F.col("v6") * F.col("v6")).cast("long").alias("q"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    m = per.select(
        "n",
        F.floor(F.col("s") * F.lit(1.0) / F.col("n") + F.lit(0.5))
        .cast("long")
        .alias("mean6"),
        F.expr("(q + n DIV 2) DIV n").alias("msq12"),
    )
    agg = m.agg(
        F.max("n").cast("long").alias("n_vectors"),
        F.sum("msq12").cast("long").alias("mean_sq_norm12"),
        F.sum(F.col("mean6") * F.col("mean6")).cast("long").alias("mean_vec_sq12"),
        F.sum(F.col("msq12") - F.col("mean6") * F.col("mean6"))
        .cast("long")
        .alias("var_tot12"),
        F.max(F.col("msq12") - F.col("mean6") * F.col("mean6"))
        .cast("long")
        .alias("var_top12"),
    )
    return agg.select(
        "n_vectors",
        (F.col("mean_sq_norm12") / F.lit(1000000000000.0)).alias("mean_sq_norm"),
        (F.col("mean_vec_sq12") / F.lit(1000000000000.0)).alias("mean_vec_sq_norm"),
        (
            F.floor(
                F.col("mean_vec_sq12") * F.lit(1000000.0) / F.col("mean_sq_norm12")
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("anisotropy"),
        (
            F.floor(
                F.col("var_top12") * F.lit(1000000.0) / F.col("var_tot12")
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("top_dim_var_share"),
    )
