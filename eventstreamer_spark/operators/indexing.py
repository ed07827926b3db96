"""Corpus indexing / language-model statistics over ``documents``.

The training-data counterparts of the text.py feature extractors:
posting lists (the retrieval index build), bigram conditionals (the
n-gram LM estimation step), cross-document duplicate-span profiling
(the "how much verbatim overlap is left after dedup" audit), and the
length histogram every corpus report starts with.

All four are explode → hash-aggregate pipelines on built-in
expressions — no Python in the row path — and every small side
(totals, cutoffs) rejoins as a broadcast; shapes pinned in
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eventstreamer_spark.functions import hashing as H
from eventstreamer_spark.functions import numeric as N
from eventstreamer_spark.memo import BoundedMemo, free_local_checkpoint, live_hit
from eventstreamer_spark.registry import query
from eventstreamer_spark.sources.tables import load_table, load_table_parallel

_TOKS_S = H.TOKENS_SPARK.format(col="text")
_TOKS_D = H.TOKENS_DUCK.format(col="text")

# ---------------------------------------------------------------------------
# Inverted index (token → df + leading posting list)
# ---------------------------------------------------------------------------

INDEX_TOP = 20
POSTINGS_PER_TOKEN = 10

_INVERTED_ORACLE = f"""
WITH td AS (
  SELECT DISTINCT doc_id, unnest({_TOKS_D}) AS token FROM documents
), agg AS (
  SELECT token,
         CAST(count(*) AS BIGINT) AS df,
         array_to_string((list(doc_id ORDER BY doc_id))[1:{POSTINGS_PER_TOKEN}], ',')
           AS postings
  FROM td GROUP BY token
)
SELECT token, df, postings FROM agg
ORDER BY df DESC, token LIMIT {INDEX_TOP}
"""


@query("inverted_index_topk", oracle=_INVERTED_ORACLE)
def q_inverted_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list build for the highest-df terms: explode to
    distinct (token, doc) pairs, aggregate df + the first
    ``POSTINGS_PER_TOKEN`` doc ids per token, top-k by df.

    One shuffle keyed by token does both the df count and the posting
    assembly (collect_list of already-distinct pairs, sorted and
    sliced — bounded output per token), and the top-k is a
    TakeOrderedAndProject. This is exactly the map-reduce index build,
    Catalyst-planned; at 100 TB the same plan emits the full postings
    instead of the head slice."""
    d = load_table_parallel(spark, sf_dir, "documents")
    td = d.select("doc_id", F.explode(F.expr(_TOKS_S)).alias("token")).distinct()
    agg = td.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.transform(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, POSTINGS_PER_TOKEN),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )
    return agg.orderBy(F.col("df").desc(), "token").limit(INDEX_TOP)


# ---------------------------------------------------------------------------
# Bigram conditional probabilities (n-gram LM estimation)
# ---------------------------------------------------------------------------

MIN_PREFIX_COUNT = 50

_BIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_D} AS t FROM documents
), bg AS (
  SELECT t[i] AS prefix, t[i + 1] AS next_token
  FROM toks, unnest(CASE WHEN len(t) >= 2 THEN range(1, len(t)) ELSE [] END) AS u(i)
), counts AS (
  SELECT prefix, next_token, CAST(count(*) AS BIGINT) AS c_ab FROM bg GROUP BY 1, 2
), ranked AS (
  SELECT prefix, next_token, c_ab,
         CAST(sum(c_ab) OVER (PARTITION BY prefix) AS BIGINT) AS c_prefix,
         row_number() OVER (PARTITION BY prefix ORDER BY c_ab DESC, next_token) AS rn
  FROM counts
)
SELECT prefix, next_token, c_ab, c_prefix,
       round(c_ab * 1.0 / c_prefix, 6) AS cond_prob
FROM ranked WHERE rn = 1 AND c_prefix >= {MIN_PREFIX_COUNT}
"""


@query("bigram_conditional_probs", oracle=_BIGRAM_ORACLE)
def q_bigram_conditional_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM estimation: for every prefix token seen ≥
    ``MIN_PREFIX_COUNT`` times, its most likely successor with the
    conditional probability — the count/normalize/argmax core of
    n-gram language modeling.

    Positional pairs come from one sequence-transform explode (no
    self-join on position); the (prefix, next) counts are the only
    corpus-scale shuffle, and the per-prefix total + argmax ride a
    window over the already-aggregated count table keyed by prefix —
    aggregate-then-window, never window-over-raw-tokens."""
    d = load_table_parallel(spark, sf_dir, "documents")
    bg = d.select(
        F.explode(
            F.expr(
                f"CASE WHEN size({_TOKS_S}) >= 2 THEN "
                f"transform(sequence(0, size({_TOKS_S}) - 2), "
                f"i -> struct(element_at({_TOKS_S}, i + 1) AS prefix, "
                f"element_at({_TOKS_S}, i + 2) AS next_token)) "
                f"ELSE array() END"
            )
        ).alias("p")
    ).select("p.prefix", "p.next_token")
    counts = bg.groupBy("prefix", "next_token").agg(
        F.count(F.lit(1)).alias("c_ab")
    )
    w = Window.partitionBy("prefix")
    wr = Window.partitionBy("prefix").orderBy(
        F.col("c_ab").desc(), F.col("next_token")
    )
    return (
        counts.withColumn("c_prefix", F.sum("c_ab").over(w))
        .withColumn("rn", F.row_number().over(wr))
        .filter((F.col("rn") == 1) & (F.col("c_prefix") >= MIN_PREFIX_COUNT))
        .select(
            "prefix",
            "next_token",
            "c_ab",
            "c_prefix",
            F.round(F.col("c_ab") * F.lit(1.0) / F.col("c_prefix"), 6).alias(
                "cond_prob"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Duplicate-span profile (verbatim 8-gram overlap audit)
# ---------------------------------------------------------------------------

SPAN_N = 8

# Spark Column built lazily inside the query (F.expr needs a live
# session); the DuckDB twin is a plain string and can bake now.
_SPAN_SH_D = H.shingles_from_tokens_duck(_TOKS_D, SPAN_N)

_SPAN_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, substr(md5(unnest({_SPAN_SH_D})), 1, 16) AS span
  FROM documents
), per_span AS (
  SELECT span, CAST(count(*) AS BIGINT) AS n_docs FROM sh GROUP BY span
)
SELECT n_docs, CAST(count(*) AS BIGINT) AS n_spans
FROM per_span WHERE n_docs >= 2 GROUP BY n_docs
"""


@query("duplicate_span_histogram", oracle=_SPAN_ORACLE)
def q_duplicate_span_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document verbatim overlap profile: how many distinct
    {SPAN_N}-token spans appear in exactly k documents, for k ≥ 2 —
    the residual-duplication audit run after dedup, and the
    memorization-risk estimate before training.

    Spans hash to a 64-bit md5 prefix before the shuffle so only
    16-byte keys move (never span text — and a collision can only
    merge two spans' doc sets, vanishingly unlikely below 2^32
    distinct spans); two hash aggregates, histogram output of bounded
    size. The same plan at 100 TB is the standard
    suffix-overlap audit with n tuned upward."""
    d = load_table_parallel(spark, sf_dir, "documents")
    sh = (
        d.select(
            "doc_id",
            F.explode(H.shingles_from_tokens_expr(_TOKS_S, SPAN_N)).alias("span_text"),
        )
        .select("doc_id", F.substring(F.md5("span_text"), 1, 16).alias("span"))
        .distinct()
    )
    per_span = sh.groupBy("span").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        per_span.filter(F.col("n_docs") >= 2)
        .groupBy("n_docs")
        .agg(F.count(F.lit(1)).alias("n_spans"))
    )


# ---------------------------------------------------------------------------
# Document length histogram (fixed char-count bands)
# ---------------------------------------------------------------------------

_BANDS = [(0, 100), (100, 300), (300, 1000), (1000, 3000), (3000, 10000)]


def _band_case_spark() -> str:
    whens = " ".join(
        f"WHEN length(text) < {hi} THEN '{lo:05d}-{hi:05d}'" for lo, hi in _BANDS
    )
    return f"CASE {whens} ELSE '10000+' END"


def _band_case_duck() -> str:
    whens = " ".join(
        f"WHEN length(text) < {hi} THEN '{lo:05d}-{hi:05d}'" for lo, hi in _BANDS
    )
    return f"CASE {whens} ELSE '10000+' END"


_MEAN6_DUCK = N.MEAN6_DUCK

_LENGTH_ORACLE = f"""
WITH banded AS (
  SELECT {_band_case_duck()} AS band, length(text) AS n FROM documents
), tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM banded)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_docs,
       {_MEAN6_DUCK.format(v="n")} AS avg_chars,
       round(count(*) * 1.0 / any_value(tot.total), 6) AS share
FROM banded CROSS JOIN tot
GROUP BY band
"""


@query("doc_length_histogram", oracle=_LENGTH_ORACLE)
def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile in fixed char bands with corpus share —
    integer band edges (no float log bucketing) so the banding is
    bit-identical across engines. One aggregation shuffle; the grand
    total joins back as a broadcast one-row aggregate."""
    d = load_table(spark, sf_dir, "documents")
    banded = d.select(
        F.expr(_band_case_spark()).alias("band"), F.length("text").alias("n")
    )
    tot = banded.agg(F.count(F.lit(1)).alias("total"))
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # n is an integer char count (exact sums either way), but the
            # mean6 integer-scaled convention is used for uniformity with
            # every other float-mean oracle in the repo (VERDICT r4).
            N.mean6_spark(F.col("n")).alias("avg_chars"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "band",
            "n_docs",
            "avg_chars",
            F.round(F.col("n_docs") * F.lit(1.0) / F.col("total"), 6).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit over the token vocabulary
# ---------------------------------------------------------------------------

ZIPF_TOP = 100

# lx/ly are ln(rank)/ln(freq) quantized to micro-units as int64, so
# the closed-form least-squares slope is computed from EXACT integer
# sums on both engines (n·Σxy − ΣxΣy ~ 1e17 < int64 max). The only
# cross-engine float op left is ln() itself on identical integer
# inputs — a 1-ulp libm difference would have to land within 1e-9 of
# a rounding boundary to flip a quantized value.
_ZIPF_ORACLE = f"""
WITH tf AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({{toks}}) AS token FROM documents)
  GROUP BY token
), ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, token) AS rank
  FROM tf
  ORDER BY freq DESC, token LIMIT {ZIPF_TOP}
), pts AS (
  SELECT CAST(round(ln(rank) * 1000000, 0) AS BIGINT) AS lx,
         CAST(round(ln(freq) * 1000000, 0) AS BIGINT) AS ly
  FROM ranked
)
SELECT CAST(count(*) AS BIGINT) AS n_points,
       round((count(*) * sum(lx * ly) - sum(lx) * sum(ly)) * 1.0
             / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)), 6) AS zipf_slope
FROM pts
""".format(toks=_TOKS_D)


@query("zipf_slope", oracle=_ZIPF_ORACLE)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: least-squares slope of log-frequency vs
    log-rank over the top tokens — the one-number corpus-health check
    (natural text ≈ −1; template/boilerplate corpora flatten). Token
    counting is the usual explode + hash aggregate; the top-100 rank
    assignment is BOUNDED BY CONSTRUCTION (migrated r14, VERDICT r13
    item 1): the TakeOrdered limit caps the set at ZIPF_TOP rows, then
    rank = array position of a sort_array(collect_list(...)) over
    those ≤ ZIPF_TOP rows — one 100-element array in one aggregate
    row, NO window node anywhere (the struct sorts (−freq, token) ==
    (freq DESC, token ASC), the oracle's order, unchanged); the
    regression is a single tiny aggregate over exact integer
    points."""
    d = load_table_parallel(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.expr(_TOKS_S)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(ZIPF_TOP)
    )
    arr = tf.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("freq")).alias("nf"), F.col("token").alias("t")
                )
            )
        ).alias("a")
    )
    pts = arr.select(F.posexplode("a").alias("p", "s")).select(
        F.round(F.log((F.col("p") + F.lit(1)).cast("double")) * 1000000, 0)
        .cast("long")
        .alias("lx"),
        F.round(F.log((-F.col("s.nf")).cast("double")) * 1000000, 0)
        .cast("long")
        .alias("ly"),
    )
    n = F.count(F.lit(1))
    sxy, sx, sy, sxx = (
        F.sum(F.col("lx") * F.col("ly")),
        F.sum("lx"),
        F.sum("ly"),
        F.sum(F.col("lx") * F.col("lx")),
    )
    return pts.agg(
        n.alias("n_points"),
        F.round(
            (n * sxy - sx * sy) * F.lit(1.0) / (n * sxx - sx * sx), 6
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# Exact substring-span remediation (the removal half of the span audit)
# ---------------------------------------------------------------------------

# A span is cut when it occurs in >= CUT_MIN_DOCS distinct documents
# (the Lee et al. exact-substring dedup rule, at this corpus's token
# granularity); the lowest-doc_id occurrence is the canonical copy and
# keeps its text.
CUT_MIN_DOCS = 2


def _span_hash_duck(toks: str, i: str) -> str:
    parts = " || ' ' || ".join(f"({toks})[{i} + {j}]" for j in range(SPAN_N))
    return f"substr(md5({parts}), 1, 16)"


def _cut_chain_parts(src: str = "documents") -> list[str]:
    """The cut-cover CTE chain (tk → occ → freq → cut → cover) as
    WITH-parts, parameterized on the doc table — the one definition
    shared by _CUT_ORACLE and the composed corpus_build_pipeline
    oracle (curation.py)."""
    return [
        f"tk AS (SELECT doc_id, {_TOKS_D} AS toks FROM {src})",
        f"""occ AS (
  SELECT doc_id, i AS pos, {_span_hash_duck("toks", "i")} AS span
  FROM tk, unnest(CASE WHEN len(toks) >= {SPAN_N}
                       THEN range(1, len(toks) - {SPAN_N - 2})
                       ELSE [] END) AS u(i))""",
        f"""freq AS (
  SELECT span, min(doc_id) AS keeper
  FROM (SELECT DISTINCT doc_id, span FROM occ)
  GROUP BY span HAVING count(*) >= {CUT_MIN_DOCS})""",
        """cut AS (
  SELECT o.doc_id, o.pos, o.span
  FROM occ o JOIN freq f ON o.span = f.span AND o.doc_id <> f.keeper)""",
        f"""cover AS (
  SELECT doc_id,
         list_sort(list_distinct(flatten(list(
           list_transform(generate_series(0, {SPAN_N - 1}), j -> pos + j)
         )))) AS covered,
         count(DISTINCT span) AS n_spans_cut
  FROM cut GROUP BY doc_id)""",
    ]


# DuckDB expression rebuilding a doc's text from its token array minus
# the covered positions (NULL-safe empty join) — shared with the
# pipeline oracle.
_CLEANED_DUCK = """coalesce(array_to_string(
         list_transform(
           list_filter(generate_series(1, len(t.toks)),
                       i -> NOT list_contains(c.covered, i)),
           i -> t.toks[i]),
         ' '), '')"""

_CUT_CHAIN_SQL = ",\n".join(_cut_chain_parts())

_CUT_ORACLE = f"""
WITH {_CUT_CHAIN_SQL}
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(c.covered) AS BIGINT) AS n_removed,
       CAST(c.n_spans_cut AS BIGINT) AS n_spans_cut,
       {_CLEANED_DUCK} AS cleaned_text
FROM tk t JOIN cover c ON t.doc_id = c.doc_id
"""


def substring_cover(tk: DataFrame) -> DataFrame:
    """(doc_id, covered, n_spans_cut) for every AFFECTED doc — the
    cut-cover chain over a (doc_id, toks) table, shared by
    substring_dedup_rewrite and corpus_build_pipeline (curation.py):
    positional span hashes → frequent-span keeper table → non-keeper
    occurrences → per-doc covered-position union."""
    # explode POSITIONS, hash in the projection: building (pos, span)
    # structs inside a transform lambda evaluates the md5 INTERPRETED
    # per element (higher-order-function lambdas are not codegen'd);
    # exploding the position sequence and hashing in a plain projection
    # keeps the md5 in whole-stage codegen. explode_outer + isNotNull
    # per the InferFiltersFromGenerate note in dedup.py.
    span_hash = "substring(md5(concat_ws(' ', " + ", ".join(
        f"element_at(toks, pos + {j})" for j in range(SPAN_N)
    ) + ")), 1, 16)"
    occ = (
        tk.select(
            "doc_id",
            "toks",
            F.explode_outer(
                F.expr(
                    f"CASE WHEN size(toks) >= {SPAN_N} THEN "
                    f"sequence(1, size(toks) - {SPAN_N - 1}) "
                    f"ELSE array() END"
                )
            ).alias("pos"),
        )
        .filter(F.col("pos").isNotNull())
        .select("doc_id", "pos", F.expr(span_hash).alias("span"))
        # occ feeds BOTH freq and cut, and Catalyst does not dedupe
        # common subtrees — without a boundary the tokenize + explode +
        # md5 pass runs twice (measured 2.75 s → 1.7 s warm at sf0.1
        # for the corpus_build rew+cap stage). The checkpoint is
        # O(corpus token positions): shuffle-sized, the same order as
        # the distinct/join shuffles it feeds.
        .localCheckpoint(eager=True)
    )
    freq = (
        occ.select("doc_id", "span")
        .distinct()
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") >= CUT_MIN_DOCS)
        .select("span", "keeper")
    )
    cut = occ.join(freq, "span").filter(F.col("doc_id") != F.col("keeper"))
    return cut.groupBy("doc_id").agg(
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.collect_list(
                        F.expr(f"sequence(pos, pos + {SPAN_N - 1})")
                    )
                )
            )
        ).alias("covered"),
        F.countDistinct("span").alias("n_spans_cut"),
    )


# Spark twin of _CLEANED_DUCK: rebuild text from toks minus covered.
_CLEANED_SPARK = (
    "concat_ws(' ', transform("
    "filter(sequence(1, size(toks)), i -> NOT array_contains(covered, i)), "
    "i -> element_at(toks, i)))"
)


@query("substring_dedup_rewrite", oracle=_CUT_ORACLE)
def q_substring_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span REMEDIATION — the removal half of
    ``duplicate_span_histogram``: every verbatim {SPAN_N}-token span
    that occurs in ≥ {CUT_MIN_DOCS} distinct documents is cut from all
    but its lowest-doc_id (canonical) occurrence, and each affected
    document is emitted with its cleaned text plus an audit count —
    the Lee-et-al-style exact-substring dedup step a production corpus
    pipeline runs after profiling shows residual verbatim overlap.

    Scale shape — shingle-chain grouping, never all-pairs:
    1. positional span occurrences (one explode; spans travel as
       16-hex md5 prefixes, never text);
    2. span → (distinct-doc count, keeper=min doc_id) — one hash
       aggregate on the span key;
    3. occurrences ⋈ frequent spans — a plain equi-join on the span
       hash (both sides shuffle on a 16-byte key; no broadcast needed
       because the frequent-span table can be corpus-scale);
    4. per-doc position cover union + one join back to the token
       arrays for the rewrite (row-local array surgery).
    No cartesian anywhere; per-doc work is O(len·cover) array ops.
    The output contains ONLY rewritten docs, so the result (and the
    hash gate) is exactly the set of documents the cut changed."""
    d = load_table_parallel(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.expr(_TOKS_S).alias("toks"))
    cover = substring_cover(tk)
    return (
        tk.join(cover, "doc_id")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.size("covered").cast("long").alias("n_removed"),
            "n_spans_cut",
            F.expr(_CLEANED_SPARK).alias("cleaned_text"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram-LM perplexity scoring (the CCNet quality dimension)
# ---------------------------------------------------------------------------

# Add-1-smoothed bigram LM trained on the corpus itself:
# P(b|a) = (c(ab)+1) / (c(a·)+V). Per-token negative log-likelihoods
# are ln() of INTEGER arguments quantized to micro-nats BEFORE any
# sum (the zipf_slope determinism pattern: a libm 1-ulp difference on
# identical integer inputs would have to land within 1e-9 of a
# rounding boundary to flip a quantized value), so document totals are
# exact int64 sums in both engines.

# Band cut points in exact integer micro-nats (avg_nll_e6 is an int64
# in both engines, so banding can never sit on a float boundary);
# calibrated to the corpus's observed 3.31-3.52 nat range so the bands
# actually partition it (~30/45/25).
PPL_BANDS = (("low", 0), ("mid", 3_370_000), ("high", 3_410_000))


def _ppl_band_sql(avg_col: str) -> str:
    # identical CASE text for both engines (integer thresholds)
    return (
        f"CASE WHEN {avg_col} < {PPL_BANDS[1][1]} THEN 'low'"
        f" WHEN {avg_col} < {PPL_BANDS[2][1]} THEN 'mid'"
        f" ELSE 'high' END"
    )


def _ppl_parts(src: str = "documents", p: str = "") -> list[str]:
    """The bigram-LM scoring chain as WITH-parts, parameterized on the
    doc table and a CTE-name prefix (so the composed pipeline oracle
    can train the SAME model shape on its survivor set without name
    collisions). Final CTE ``{p}pplagg`` = (doc_id, n_bigrams,
    avg_nll_e6)."""
    return [
        f"{p}ptoks AS (SELECT doc_id, {_TOKS_D} AS t FROM {src})",
        f"""{p}pbg AS (
  SELECT doc_id, t[i] AS prefix, t[i + 1] AS next_token
  FROM {p}ptoks, unnest(CASE WHEN len(t) >= 2 THEN range(1, len(t)) ELSE [] END) AS u(i))""",
        f"""{p}pdoc_bg AS (
  SELECT doc_id, prefix, next_token, CAST(count(*) AS BIGINT) AS n_occ
  FROM {p}pbg GROUP BY 1, 2, 3)""",
        f"""{p}pc_ab AS (
  SELECT prefix, next_token, CAST(count(*) AS BIGINT) AS cab FROM {p}pbg GROUP BY 1, 2)""",
        f"""{p}pc_a AS (
  SELECT prefix, CAST(count(*) AS BIGINT) AS ca FROM {p}pbg GROUP BY 1)""",
        f"""{p}pv AS (
  SELECT CAST(count(DISTINCT word) AS BIGINT) AS vsz
  FROM (SELECT unnest({_TOKS_D}) AS word FROM {src}))""",
        f"""{p}pscored AS (
  SELECT d.doc_id, d.n_occ,
         CAST(round(ln(c.ca + v.vsz) * 1000000, 0) AS BIGINT)
         - CAST(round(ln(a.cab + 1) * 1000000, 0) AS BIGINT) AS nll_e6
  FROM {p}pdoc_bg d
  JOIN {p}pc_ab a ON d.prefix = a.prefix AND d.next_token = a.next_token
  JOIN {p}pc_a c ON d.prefix = c.prefix
  CROSS JOIN {p}pv v)""",
        f"""{p}pplagg AS (
  SELECT doc_id,
         CAST(sum(n_occ) AS BIGINT) AS n_bigrams,
         CAST(floor(sum(n_occ * nll_e6) * 1.0 / sum(n_occ) + 0.5) AS BIGINT)
           AS avg_nll_e6
  FROM {p}pscored GROUP BY doc_id)""",
    ]


_PPL_CHAIN_SQL = ",\n".join(_ppl_parts())

_PPL_ORACLE = f"""
WITH {_PPL_CHAIN_SQL},
agg AS (SELECT * FROM pplagg)
SELECT doc_id, n_bigrams,
       avg_nll_e6 / 1000000.0 AS avg_neg_log_likelihood,
       {_ppl_band_sql("avg_nll_e6")} AS ppl_band
FROM agg WHERE doc_id % 5 = 0
"""


@query("bigram_perplexity", oracle=_PPL_ORACLE)
def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document LM quality scoring — the CCNet recipe's perplexity
    dimension: train an add-1-smoothed bigram LM on the corpus (the
    ``bigram_conditional_probs`` estimation step), then score every
    document's average per-token negative log-likelihood under it and
    band the result (low = fluent/templated, high = atypical) —
    exactly the signal used to partition a crawl into quality tiers.

    Plan: bigram counts aggregate per (doc, pair) FIRST so the model
    join touches one row per distinct pair per doc, not per
    occurrence; the model tables join back on the pair/prefix keys
    (corpus-scale equi-joins); the vocab size is a broadcast one-row
    aggregate. Per-doc totals are one aggregate keyed by doc_id.
    Output sampled to doc_id % 5 = 0 to keep the gate row count
    bounded; the plan is identical unsampled."""
    d = load_table_parallel(spark, sf_dir, "documents")
    agg = bigram_avg_nll(d)
    return agg.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        "n_bigrams",
        (F.col("avg_nll_e6") / F.lit(1000000.0)).alias("avg_neg_log_likelihood"),
        F.expr(_ppl_band_sql("avg_nll_e6")).alias("ppl_band"),
    )


def bigram_avg_nll(d: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll_e6) under an add-1-smoothed bigram
    LM trained on the SAME (doc_id, text) table — the scoring core of
    bigram_perplexity, parameterized on its input so the composed
    pipeline can retrain the model on its survivor set. Docs with < 2
    tokens have no bigrams and drop out (unscorable)."""
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size({_TOKS_S}) >= 2 THEN "
                f"transform(sequence(0, size({_TOKS_S}) - 2), "
                f"i -> struct(element_at({_TOKS_S}, i + 1) AS prefix, "
                f"element_at({_TOKS_S}, i + 2) AS next_token)) "
                f"ELSE array() END"
            )
        ).alias("p"),
    ).select("doc_id", "p.prefix", "p.next_token")
    # one explode, one aggregate — then the model counts as WINDOW
    # aggregates over the per-doc table: every (prefix, next_token) in
    # doc_bg matches itself, so cab = Σ n_occ OVER (prefix, next) and
    # ca = Σ n_occ OVER (prefix) are exactly the values the former
    # c_ab/c_a join-back produced, with a LINEAR lineage (no repeated
    # subtree, no checkpoint) and 4 shuffles end-to-end instead of 6
    # (doc_bg agg → two window sorts → per-doc agg; the join version
    # re-shuffled doc_bg into each model join).
    from pyspark.sql import Window as _W

    doc_bg = bg.groupBy("doc_id", "prefix", "next_token").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    v = d.select(F.explode(F.expr(_TOKS_S)).alias("word")).agg(
        F.countDistinct("word").alias("vsz")
    )
    nll = (
        F.round(F.log(F.col("ca") + F.col("vsz")) * 1000000, 0).cast("long")
        - F.round(F.log(F.col("cab") + 1) * 1000000, 0).cast("long")
    )
    scored = (
        doc_bg.withColumn(
            "cab",
            F.sum("n_occ").over(_W.partitionBy("prefix", "next_token")).cast("long"),
        )
        .withColumn("ca", F.sum("n_occ").over(_W.partitionBy("prefix")).cast("long"))
        .crossJoin(F.broadcast(v))
        .select("doc_id", "n_occ", nll.alias("nll_e6"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("n_occ").alias("n_bigrams"),
        F.floor(
            F.sum(F.col("n_occ") * F.col("nll_e6")) * F.lit(1.0) / F.sum("n_occ")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("avg_nll_e6"),
    )


# ---------------------------------------------------------------------------
# Winnowing (minimizer) fingerprints — robust span selection
# ---------------------------------------------------------------------------

# substring_dedup_rewrite matches spans only when full SPAN_N-token
# chains collide; winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03)
# selects the window-MINIMUM span hash from every WINNOW_W consecutive
# positions, guaranteeing any shared run of WINNOW_W + SPAN_N - 1
# tokens yields a shared fingerprint while storing only ~2/(W+1) of
# the span hashes — robust to edits/offsets that break fixed chains.
WINNOW_W = 4

# Positional span-hash chain shared with _CUT_ORACLE (same SPAN_N, same
# 16-hex md5 prefix), so winnowing fingerprints feed the same span-join
# machinery.
_WINNOW_OCC_D = f"""occ AS MATERIALIZED (
  SELECT doc_id, i AS pos, {_span_hash_duck("toks", "i")} AS span
  FROM tk, unnest(CASE WHEN len(toks) >= {SPAN_N}
                       THEN range(1, len(toks) - {SPAN_N - 2})
                       ELSE [] END) AS u(i)
)"""

# Selection is a WINDOW-MIN (ROWS BETWEEN CURRENT ROW AND W-1
# FOLLOWING) over unnested positions in BOTH engines. A row-local
# array formulation (array_min over slices of a per-doc span array)
# was tried first and produced the right rows 70× slower: Catalyst's
# project-collapse re-inlines the md5 span-array expression into every
# window slice lambda, turning O(m·W) into O(m²·SPAN_N) md5 calls per
# doc — the same trap hashing.py documents for token hashes. Docs with
# fewer than W spans keep one fingerprint (the global min): the
# pos <= greatest(1, m - W + 1) filter with a truncating frame.
_WINNOW_SEL_D = f"""wm AS (
  SELECT doc_id, pos,
         min(span) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
           AS fp,
         count(*) OVER (PARTITION BY doc_id) AS m
  FROM occ
), sel AS MATERIALIZED (
  SELECT DISTINCT doc_id, fp FROM wm
  WHERE pos <= greatest(1, m - {WINNOW_W} + 1)
)"""

_WINNOW_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, {_TOKS_D} AS toks FROM documents
), {_WINNOW_OCC_D},
{_WINNOW_SEL_D},
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_selected,
         min(fp) AS min_fp, max(fp) AS max_fp
  FROM sel GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(max(o.pos) AS BIGINT) AS n_spans,
       p.n_selected, p.min_fp, p.max_fp
FROM per p JOIN occ o ON p.doc_id = o.doc_id
GROUP BY p.doc_id, p.n_selected, p.min_fp, p.max_fp
"""

_WINNOW_PAIRS_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, {_TOKS_D} AS toks FROM documents
), {_WINNOW_OCC_D},
{_WINNOW_SEL_D}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared_fps
FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


def _winnow_sel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_spans, fp) — distinct winnowed fingerprints per doc:
    explode positional {SPAN_N}-gram md5-prefix span hashes (the
    substring_dedup_rewrite occ shape), take the {WINNOW_W}-wide
    window-min per position, keep positions 1..max(1, m-W+1),
    distinct. One hash shuffle on doc_id for the window; the md5 span
    hashes are computed exactly once per position (see the module
    comment for why the row-local array variant is a Catalyst trap).
    Docs with no spans (< {SPAN_N} tokens) drop out, exactly like the
    oracle's empty unnest."""
    from pyspark.sql import Window

    d = load_table_parallel(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.expr(_TOKS_S).alias("toks"))
    # explode POSITIONS, hash in the projection: building (pos, span)
    # structs inside a transform lambda evaluates the md5 INTERPRETED
    # per element (higher-order-function lambdas are not codegen'd);
    # exploding the position sequence and hashing in a plain projection
    # keeps the md5 in whole-stage codegen. explode_outer + isNotNull
    # per the InferFiltersFromGenerate note in dedup.py.
    span_hash = "substring(md5(concat_ws(' ', " + ", ".join(
        f"element_at(toks, pos + {j})" for j in range(SPAN_N)
    ) + ")), 1, 16)"
    occ = (
        tk.select(
            "doc_id",
            "toks",
            F.explode_outer(
                F.expr(
                    f"CASE WHEN size(toks) >= {SPAN_N} THEN "
                    f"sequence(1, size(toks) - {SPAN_N - 1}) "
                    f"ELSE array() END"
                )
            ).alias("pos"),
        )
        .filter(F.col("pos").isNotNull())
        .select("doc_id", "pos", F.expr(span_hash).alias("span"))
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    per = Window.partitionBy("doc_id")
    wm = occ.select(
        "doc_id",
        "pos",
        F.min("span").over(win).alias("fp"),
        F.count(F.lit(1)).over(per).alias("m"),
    )
    return (
        wm.filter(F.col("pos") <= F.greatest(F.lit(1), F.col("m") - F.lit(WINNOW_W - 1)))
        .select("doc_id", F.col("m").cast("long").alias("n_spans"), "fp")
        .distinct()
    )


@query("winnowing_fingerprints", oracle=_WINNOW_ORACLE)
def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint SELECTION, per doc: from m positional
    {SPAN_N}-token span hashes keep the window-min of every
    {WINNOW_W}-wide window (~2/(W+1) kept), the robust-fingerprinting
    upgrade over substring_dedup_rewrite's fixed chains. One shuffle
    on doc_id (the window partition) plus the tiny per-doc aggregate;
    span hashes computed once per position, never re-derived."""
    sel = _winnow_sel(spark, sf_dir)
    return sel.groupBy("doc_id", "n_spans").agg(
        F.count(F.lit(1)).cast("long").alias("n_selected"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    ).select("doc_id", "n_spans", "n_selected", "min_fp", "max_fp")


@query("winnowing_candidates", oracle=_WINNOW_PAIRS_ORACLE)
def q_winnowing_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate generation over winnowed fingerprints: explode each
    doc's selected minimizers and equi-join on the fingerprint — the
    same inverted-index shape as the span machinery, but over the
    ~2/(W+1)-compressed fingerprint set, with winnowing's guarantee
    that any {WINNOW_W + SPAN_N - 1}-token verbatim overlap still
    collides. At 100 TB this is the storage/robustness trade
    production fingerprint indexes make (MOSS, dataset contamination
    scanners); the join stays an equi-join on a 16-hex key."""
    sel = _winnow_sel(spark, sf_dir)
    fp = sel.select("doc_id", "fp")
    return (
        fp.alias("a")
        .join(
            fp.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_fps"))
    )


# ---------------------------------------------------------------------------
# Cross-domain LM shift matrix (per-source bigram models, all-pairs eval)
# ---------------------------------------------------------------------------

# The data-cartography diagnostic behind domain-weighting methods
# (DSIR's target/raw LM ratio generalized to every source pair): train
# one add-1 bigram LM PER SOURCE, score every source's bigram stream
# under every model, and report the k x k mean-NLL matrix. The
# diagonal is each domain's self-fit; an off-diagonal close to its
# column's diagonal means the train source transfers to the eval
# source (near-duplicate domains), a large gap means domain shift the
# mixture weights must respect. Unseen-pair smoothing differs from the
# corpus LM: eval bigrams absent from the train model score
# ln(ca + V) - ln(1) via LEFT joins with 0-coalesce.

_DSHIFT_ORACLE = f"""
WITH tk AS (SELECT source, {_TOKS_D} AS t FROM documents),
bg AS (
  SELECT source, t[i] AS prefix, t[i + 1] AS next_token
  FROM tk, unnest(CASE WHEN len(t) >= 2 THEN range(1, len(t)) ELSE [] END) AS u(i)
),
ebg AS (
  SELECT source, prefix, next_token, CAST(count(*) AS BIGINT) AS n_occ
  FROM bg GROUP BY 1, 2, 3
),
cab AS (
  SELECT source AS ts, prefix, next_token, CAST(sum(n_occ) AS BIGINT) AS cab
  FROM ebg GROUP BY 1, 2, 3
),
ca AS (
  SELECT source AS ts, prefix, CAST(sum(n_occ) AS BIGINT) AS ca
  FROM ebg GROUP BY 1, 2
),
vs AS (
  SELECT source AS ts, CAST(count(DISTINCT word) AS BIGINT) AS vsz
  FROM (SELECT source, unnest({_TOKS_D}) AS word FROM documents) GROUP BY 1
),
srcs AS (SELECT DISTINCT source AS ts FROM documents),
scored AS (
  SELECT e.source AS eval_source, s.ts AS train_source, e.n_occ,
         CAST(round(ln(COALESCE(c.ca, 0) + v.vsz) * 1000000, 0) AS BIGINT)
         - CAST(round(ln(COALESCE(a.cab, 0) + 1) * 1000000, 0) AS BIGINT) AS nll_e6
  FROM ebg e
  CROSS JOIN srcs s
  LEFT JOIN cab a ON a.ts = s.ts AND a.prefix = e.prefix
                 AND a.next_token = e.next_token
  LEFT JOIN ca c ON c.ts = s.ts AND c.prefix = e.prefix
  JOIN vs v ON v.ts = s.ts
)
SELECT train_source, eval_source,
       CAST(sum(n_occ) AS BIGINT) AS n_bigrams,
       floor(sum(CAST(n_occ AS DOUBLE) * CAST(nll_e6 AS DOUBLE))
             / sum(n_occ) + 0.5) / 1000000.0
         AS mean_nll
FROM scored GROUP BY 1, 2
"""


@query("domain_shift_matrix", oracle=_DSHIFT_ORACLE)
def q_domain_shift_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k x k cross-domain perplexity matrix: per-source add-1 bigram
    LMs, every source's bigram stream scored under every model (mean
    NLL in micro-nats, occurrence-weighted). See the module comment
    for why the diagonal/off-diagonal structure is the domain-mixing
    signal. The occurrence-weighted NLL sum accumulates in the DOUBLE
    domain in BOTH engines (int64 n_occ*nll_e6 would wrap silently in
    Spark past ~4.6e11 bigrams per source pair while DuckDB widens;
    below 2^53 the double terms and sums are still exact).

    Scale shape: bigram counts aggregate per (source, pair) FIRST
    (map-side combine; one row per distinct pair per source), the
    model tables derive from that same aggregate (no second corpus
    scan except the per-source vocab pass), and the all-models scoring
    is the distinct-pair table crossed with the k-row broadcast source
    list joined back on (source, pair) equi-keys — fanout k, never
    n x n. The k x k result is one final aggregation."""
    d = load_table_parallel(spark, sf_dir, "documents").select("source", "text")
    tk = d.select("source", F.expr(_TOKS_S).alias("t"))
    bg = tk.select(
        "source",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN transform(sequence(0, size(t) - 2), "
                "i -> struct(element_at(t, i + 1) AS prefix, "
                "element_at(t, i + 2) AS next_token)) ELSE array() END"
            )
        ).alias("p"),
    ).select("source", "p.prefix", "p.next_token")
    ebg = (
        bg.groupBy("source", "prefix", "next_token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .localCheckpoint(eager=False)  # model AND eval sides read it
    )
    cab = ebg.select(
        F.col("source").alias("ts"), "prefix", "next_token",
        F.col("n_occ").alias("cab"),
    )
    ca = (
        ebg.groupBy(F.col("source").alias("ts"), "prefix")
        .agg(F.sum("n_occ").cast("long").alias("ca"))
    )
    vs = (
        tk.select("source", F.explode("t").alias("word"))
        .groupBy(F.col("source").alias("ts"))
        .agg(F.countDistinct("word").cast("long").alias("vsz"))
    )
    srcs = d.select("source").distinct().select(F.col("source").alias("ts"))
    scored = (
        ebg.crossJoin(F.broadcast(srcs))
        .join(
            cab,
            ["ts", "prefix", "next_token"],
            "left",
        )
        .join(ca, ["ts", "prefix"], "left")
        .join(F.broadcast(vs), "ts")
        .select(
            F.col("source").alias("eval_source"),
            F.col("ts").alias("train_source"),
            "n_occ",
            (
                F.round(
                    F.log(F.coalesce("ca", F.lit(0)) + F.col("vsz")) * 1000000, 0
                ).cast("long")
                - F.round(F.log(F.coalesce("cab", F.lit(0)) + 1) * 1000000, 0).cast(
                    "long"
                )
            ).alias("nll_e6"),
        )
    )
    return scored.groupBy("train_source", "eval_source").agg(
        F.sum("n_occ").cast("long").alias("n_bigrams"),
        (
            F.floor(
                F.sum(F.col("n_occ").cast("double") * F.col("nll_e6").cast("double"))
                / F.sum("n_occ")
                + F.lit(0.5)
            )
            / 1000000.0
        ).alias("mean_nll"),
    )


# ---------------------------------------------------------------------------
# BM25 lexical retrieval (Robertson–Spärck Jones / Okapi)
# ---------------------------------------------------------------------------

# The lexical complement to the ANN family: more-like-this retrieval
# where each query doc's 4 RAREST tokens (min df, the discriminative
# ones) probe the inverted postings and candidates score under
# Okapi BM25 (k1 = 1.2, b = 0.75). Per-(term, doc) contributions are
# integer-rounded to 1e-6 BEFORE the per-doc sum — the house rule
# that removes float-summation order from the cross-engine contract —
# and only docs sharing a query term are ever touched (the lexical
# WHO-prune; the corpus never scans per query).

BM25_K1 = "1.2"
BM25_B = "0.75"
BM25_QTERMS = 4
BM25_TOP = 10
_BM25_QPRED = "doc_id % 100 = 0"


def _bm25_term_e6(engine: str) -> str:
    """Integer-rounded BM25 contribution of one (term, doc) row.
    Columns: tf, dlen (doc tokens), df, with scalars n_docs & avglen.
    Identical text in both engines (ln/round exist in both)."""
    idf = "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)"
    tfn = (
        f"(tf * ({BM25_K1} + 1.0)) / "
        f"(tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dlen / avglen))"
    )
    expr = f"round(({idf}) * ({tfn}) * 1000000, 0)"
    return f"CAST({expr} AS BIGINT)"


_BM25_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, {_TOKS_D} AS t FROM documents
),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM tk) GROUP BY doc_id, tok
),
dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dlen FROM tk),
df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dlen) AS DOUBLE) / count(*) AS avglen
  FROM dl
),
qt AS (
  SELECT doc_id AS query_id, tok FROM (
    SELECT f.doc_id, f.tok,
           row_number() OVER (PARTITION BY f.doc_id ORDER BY d.df, f.tok) AS rn
    FROM tf f JOIN df d ON f.tok = d.tok
    WHERE f.doc_id % 100 = 0
  ) WHERE rn <= {BM25_QTERMS}
),
contrib AS (
  SELECT q.query_id, f.doc_id,
         {_bm25_term_e6("duck")} AS term_e6
  FROM qt q
  JOIN tf f ON q.tok = f.tok AND f.doc_id != q.query_id
  JOIN dl l ON f.doc_id = l.doc_id
  JOIN df d ON q.tok = d.tok
  CROSS JOIN stats s
  -- the shared term generator references tf/dlen/df/n_docs/avglen as
  -- bare names; each resolves uniquely from f/l/d/s here
),
scored AS (
  SELECT query_id, doc_id, CAST(sum(term_e6) AS BIGINT) AS score_e6
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score_e6,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, doc_id, score_e6 / 1000000.0 AS bm25, rank
FROM ranked WHERE rank <= {BM25_TOP}
"""


def bm25_parts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(tf postings, dl doc lengths, qt query-term table): the shared
    BM25 index build — eager-checkpointed postings feed doc lengths,
    document frequencies and the query-term selection; qt carries df
    and the 1-row (n_docs, avglen) stats so consumers never join the
    corpus-wide df table on the postings side. Shared by the batch
    retrieval and the streaming serving twin so index and serving
    cannot drift."""
    d = load_table_parallel(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.expr(_TOKS_S).alias("t"))
    tf = (
        tk.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        # EAGER: feeds df, query terms, AND the postings join — the lazy
        # variant re-entered the tokenize+explode+agg chain per consumer
        # (the same lazy-ckpt pattern measured losing in corpus_build)
        .localCheckpoint(eager=True)
    )
    # dlen == sum of term frequencies, so doc lengths come from the
    # checkpointed postings — the corpus never tokenizes a second time.
    # A zero-token doc has no postings rows and therefore no dl row,
    # which is harmless per-doc (it can never score), but n_docs and
    # avglen must still count it like the oracle's full-table CTEs do:
    # N comes from a doc_id-only count of the documents table (column-
    # pruned scan, no tokenize) and avglen divides the postings-side
    # length sum — to which empty docs contribute exactly 0 — by that N
    # (ADVICE r10 item 1).
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dlen"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = (
        dl.agg(F.sum("dlen").cast("long").alias("sum_dlen"))
        .crossJoin(d.agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
        .select(
            "n_docs",
            (F.col("sum_dlen").cast("double") / F.col("n_docs")).alias("avglen"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    qt = (
        tf.filter(F.expr(_BM25_QPRED))
        .join(df, "tok")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BM25_QTERMS)
        # distinct key name: qt shares tf's lineage, and a qt.tok ==
        # tf.tok predicate would resolve to the same attribute (Spark
        # logs 'trivially true equals predicate' and rewrites it).
        # df rides along: it is a function of the token alone, so the
        # postings side never needs its own df join.
        .select(
            F.col("doc_id").alias("query_id"), F.col("tok").alias("qtok"), "df"
        )
        # the 1-row (n_docs, avglen) stats ride the same broadcast: one
        # blocking build-side job instead of two
        .crossJoin(stats)
    )
    return tf, dl, qt


@query("bm25_topk", oracle=_BM25_ORACLE)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 more-like-this top-{BM25_TOP} (see section comment).

    Scale shape: tf/df/doc-length tables are the standard index-build
    aggregations (one shuffle each, map-side combined); the query side
    is a bounded (queries x {BM25_QTERMS}) term table that BROADCASTS
    into the postings equi-join on token, so scoring touches only the
    postings of query terms — never a corpus scan per query. The
    1-row (N, avglen) stats ride the query-term broadcast; per-doc
    scores aggregate integer contributions."""
    tf, dl, qt = bm25_parts(spark, sf_dir)
    contrib = (
        F.broadcast(qt)
        .join(tf, (F.col("qtok") == tf["tok"]) & (F.col("doc_id") != F.col("query_id")))
        .drop("qtok")
        .join(dl, "doc_id")
        .select("query_id", "doc_id", F.expr(_bm25_term_e6("spark")).alias("term_e6"))
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("term_e6").cast("long").alias("score_e6")
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("score_e6").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= BM25_TOP)
        .select(
            "query_id",
            "doc_id",
            (F.col("score_e6") / F.lit(1000000.0)).alias("bm25"),
            "rank",
        )
    )


_STREAM_BM25_CHUNKS = 3


def _stage_residue_chunks(spark: SparkSession, df: DataFrame, n_chunks: int, prefix: str):
    """Stage a request table (int column ``bb`` in [0, n_chunks)) as
    ONE parquet chunk file per non-empty residue class, mtimes spaced
    so ``maxFilesPerTrigger=1`` replays residues in order — the shared
    request-stream scaffolding of the foreachBatch serving gates.

    EXACTLY one chunk file per non-empty residue (ADVICE r11/r12):
    per-batch emission requires every request's rows in ONE
    micro-batch. repartition('bb') makes one part per residue today,
    but a config-sensitive writer (spark.sql.files.maxRecordsPerFile,
    a future AQE rebalance) can split a residue across parts — in that
    case the residue is MERGED back to one file via a coalesce(1)
    rewrite instead of hard-failing (the old AssertionError), keeping
    the one-batch-per-request invariant under any writer config.
    Empty residues skip.

    Returns (chunk_dir, stream); the caller owns chunk_dir cleanup.
    """
    import glob
    import os
    import shutil
    import tempfile

    chunk_dir = tempfile.mkdtemp(prefix=prefix)
    try:
        staging = f"{chunk_dir}/_stage"
        df.repartition("bb").write.mode("overwrite").partitionBy("bb").parquet(
            staging
        )
        base = 1_600_000_000
        chunk_files: list[str] = []
        for i in range(n_chunks):
            parts = sorted(glob.glob(f"{staging}/bb={i}/part-*.parquet"))
            if len(parts) > 1:
                # a split residue would serve requests from partial row
                # sets — rewrite it to one file (rare: only under
                # maxRecordsPerFile-style writer configs)
                merged = f"{staging}/_merge_{i}"
                # per-write option overrides the session conf that
                # caused the split in the first place (0 = unlimited)
                spark.read.parquet(f"{staging}/bb={i}").coalesce(1).write.mode(
                    "overwrite"
                ).option("maxRecordsPerFile", 0).parquet(merged)
                parts = sorted(glob.glob(f"{merged}/part-*.parquet"))
                if len(parts) != 1:
                    raise AssertionError(
                        f"{prefix}: residue bb={i} still {len(parts)} parts "
                        "after coalesce(1) rewrite"
                    )
            for part in parts:
                dest = f"{chunk_dir}/chunk-{i:03d}.parquet"
                shutil.move(part, dest)
                chunk_files.append(dest)
        shutil.rmtree(staging, ignore_errors=True)
        if not chunk_files:
            raise ValueError(f"{prefix}: no request rows at this scale factor")
        for k, dest in enumerate(chunk_files):
            os.utime(dest, (base + k * 60, base + k * 60))
        schema = spark.read.parquet(chunk_files[0]).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
    except BaseException:
        # ownership transfers to the caller only on success — a failure
        # here (the one-file assertion, a write error) must not leak a
        # staged copy of the request table under /tmp
        shutil.rmtree(chunk_dir, ignore_errors=True)
        raise
    return chunk_dir, stream


def _free_bm25_idx(_key: object, val: tuple[DataFrame, DataFrame]) -> None:
    post, qt = val
    free_local_checkpoint(post)
    free_local_checkpoint(qt)


_BM25_IDX_MEMO: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = BoundedMemo(
    maxsize=4, on_evict=_free_bm25_idx
)


def bm25_serving_index_memo(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(post, qt): the BM25 serving-side index — postings with doc
    length attached — and the query-term table, checkpointed once per
    (applicationId, sf_dir) for the STREAMING serving twin (r14
    optimization): the served index is the offline artifact of the
    deploy shape, so the serving gate consuming a session build is the
    classifier-weights precedent; the batch retrieval owner
    (bm25_topk) never reads this memo and pays its own build every
    invocation. Same post-eviction invalidation contract as
    residual_artifacts_memo."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = live_hit(_BM25_IDX_MEMO, key)
    if hit is None:
        tf, dl, qt = bm25_parts(spark, sf_dir)
        hit = (
            tf.join(dl, "doc_id").localCheckpoint(eager=True),
            qt.localCheckpoint(eager=False),
        )
        _BM25_IDX_MEMO[key] = hit
    return hit


@query("stream_bm25_topk", oracle=_BM25_ORACLE)
def q_stream_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 SERVING: the query-term table arrives as a LIVE STREAM
    (three micro-batches) answered against the static postings index —
    the deploy shape of bm25_topk, extending the serving family
    (classifier, CMS, ANN, Bloom, drift) with lexical retrieval.

    Plan: the static side is the eager-checkpointed postings table
    with doc lengths attached ONCE (tf ⋈ dl, materialized before the
    stream starts — the index build); each micro-batch's query terms
    (carrying df and the corpus stats, exactly bm25_topk's broadcast
    payload) join the postings on the token key, term contributions
    compute row-locally, and each batch scores, ranks and EMITS its
    own requests' top-k via foreachBatch (VERDICT r10 item 5): the
    chunking is BY query (query_id % 3), so a request's terms
    arrive in exactly one micro-batch and the serving tier holds NO
    aggregation state between triggers — per-batch emission is the
    production contract, and it is also what the scale harness now
    measures (the old complete-mode gate accumulated every query's
    gathered scores in global state, exp 0.585 in SCALING_r10 — an
    artifact of the gate, not the serving design). At 100 TB the
    static side is the token-bucketed postings table and the stream
    side stays per-request-sized.

    Oracle: the batch BM25 oracle VERBATIM — the union of the three
    micro-batches covers the whole query subset and the index is
    static, so serving and batch can never drift (the same
    stream==batch discipline as stream_ann_topk)."""
    import shutil

    from eventstreamer_spark.streaming.pipeline import run_foreach_batch

    # the served index: postings with doc length attached, built once
    # per session (r14 optimization — the serving twin consumes the
    # offline index artifact like stream_classifier_scores consumes
    # the trained weights; the batch retrieval owner, bm25_topk, still
    # pays its own bm25_parts build every invocation)
    post, qt = bm25_serving_index_memo(spark, sf_dir)

    chunk_dir, stream = _stage_residue_chunks(
        spark,
        qt.withColumn("bb", (F.col("query_id") % _STREAM_BM25_CHUNKS).cast("int")),
        _STREAM_BM25_CHUNKS,
        "es_bm25stream_",
    )
    try:
        served: list = []
        wr = Window.partitionBy("query_id").orderBy(
            F.col("score_e6").desc(), F.col("doc_id")
        )

        def serve(bdf: DataFrame, _batch_id: int) -> None:
            # one request batch: gather query-term postings, score,
            # rank, emit — the per-request work a serving tier does;
            # the collect is the EMISSION (bounded: <= queries x top-k
            # rows per batch), not a driver-side compute loop
            contrib = bdf.join(
                post,
                (bdf["qtok"] == post["tok"]) & (post["doc_id"] != bdf["query_id"]),
            ).select(
                "query_id",
                "doc_id",
                F.expr(_bm25_term_e6("spark")).alias("term_e6"),
            )
            scored = contrib.groupBy("query_id", "doc_id").agg(
                F.sum("term_e6").cast("long").alias("score_e6")
            )
            topk = scored.withColumn(
                "rank", F.row_number().over(wr).cast("long")
            ).filter(F.col("rank") <= BM25_TOP)
            served.extend(topk.collect())

        run_foreach_batch(stream, serve)
        out = spark.createDataFrame(
            served, "query_id long, doc_id long, score_e6 long, rank long"
        )
        return out.select(
            "query_id",
            "doc_id",
            (F.col("score_e6") / F.lit(1000000.0)).alias("bm25"),
            "rank",
        )
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# Domain excess-loss reweighting (DoReMi-style mixture weights)
# ---------------------------------------------------------------------------

# Xie et al. 2023 (DoReMi) upweights the domains a domain-AGNOSTIC
# model underfits: per source, score its bigram stream under the
# GLOBAL corpus LM and under its OWN LM; the positive excess
# nll_global − nll_self is the domain's "hard for the generic model"
# signal, and the mixture weight is each source's share of total
# excess. The relational specialization of domain_shift_matrix's
# diagonal: only 2 scores per source instead of k — the global model
# derives from the SAME (source, pair) aggregate by summing out the
# source key.

_EXCESS_ORACLE = f"""
WITH tk AS (SELECT source, {_TOKS_D} AS t FROM documents),
bg AS (
  SELECT source, t[i] AS prefix, t[i + 1] AS next_token
  FROM tk, unnest(CASE WHEN len(t) >= 2 THEN range(1, len(t)) ELSE [] END) AS u(i)
),
ebg AS (
  SELECT source, prefix, next_token, CAST(count(*) AS BIGINT) AS n_occ
  FROM bg GROUP BY 1, 2, 3
),
gab AS (
  SELECT prefix, next_token, CAST(sum(n_occ) AS BIGINT) AS cab
  FROM ebg GROUP BY 1, 2
),
ga AS (
  SELECT prefix, CAST(sum(n_occ) AS BIGINT) AS ca FROM ebg GROUP BY 1
),
gv AS (
  SELECT CAST(count(DISTINCT word) AS BIGINT) AS vsz
  FROM (SELECT unnest({_TOKS_D}) AS word FROM documents)
),
sa AS (
  SELECT source, prefix, CAST(sum(n_occ) AS BIGINT) AS ca
  FROM ebg GROUP BY 1, 2
),
sv AS (
  SELECT source, CAST(count(DISTINCT word) AS BIGINT) AS vsz
  FROM (SELECT source, unnest({_TOKS_D}) AS word FROM documents) GROUP BY 1
),
scored AS (
  SELECT e.source, e.n_occ,
         CAST(round(ln(g.ca + gvv.vsz) * 1000000, 0) AS BIGINT)
         - CAST(round(ln(gb.cab + 1) * 1000000, 0) AS BIGINT) AS nll_g_e6,
         CAST(round(ln(s.ca + sv.vsz) * 1000000, 0) AS BIGINT)
         - CAST(round(ln(e.n_occ + 1) * 1000000, 0) AS BIGINT) AS nll_s_e6
  FROM ebg e
  JOIN gab gb ON gb.prefix = e.prefix AND gb.next_token = e.next_token
  JOIN ga g ON g.prefix = e.prefix
  JOIN sa s ON s.source = e.source AND s.prefix = e.prefix
  JOIN sv ON sv.source = e.source
  CROSS JOIN gv gvv
),
per AS (
  SELECT source,
         CAST(sum(n_occ) AS BIGINT) AS n_bigrams,
         CAST(floor(sum(CAST(n_occ AS DOUBLE) * CAST(nll_g_e6 AS DOUBLE))
                    / sum(n_occ) + 0.5) AS BIGINT) AS mg_e6,
         CAST(floor(sum(CAST(n_occ AS DOUBLE) * CAST(nll_s_e6 AS DOUBLE))
                    / sum(n_occ) + 0.5) AS BIGINT) AS ms_e6
  FROM scored GROUP BY source
),
exc AS (
  SELECT source, n_bigrams, mg_e6, ms_e6,
         GREATEST(mg_e6 - ms_e6, 0) AS ex_e6
  FROM per
),
tot AS (SELECT CAST(sum(ex_e6) AS BIGINT) AS tex, CAST(count(*) AS BIGINT) AS k
        FROM exc)
SELECT source, n_bigrams,
       mg_e6 / 1000000.0 AS nll_global,
       ms_e6 / 1000000.0 AS nll_self,
       ex_e6 / 1000000.0 AS excess_nll,
       CASE WHEN tex = 0
            THEN floor(1000000.0 / k + 0.5) / 1000000.0
            ELSE floor(ex_e6 * 1000000.0 / tex + 0.5) / 1000000.0
       END AS mixture_weight
FROM exc, tot
"""


@query("domain_excess_reweight", oracle=_EXCESS_ORACLE)
def q_domain_excess_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain mixture weights from bigram excess loss:
    per source, mean NLL under the GLOBAL corpus LM vs its OWN LM
    (both add-1-smoothed in the shared integer micro-nat domain),
    the positive excess, and each source's share of total excess as
    the mixture weight (uniform fallback when no source shows excess).

    Scale shape: the corpus tokenizes ONCE (VERDICT r10 item 2 — the
    old plan re-ran tokenize+explode for the bigram, global-vocab and
    per-source-vocab branches): a single posexplode-shaped projection
    emits every token exactly once as `prefix` with a NULLABLE
    next_token (null on each doc's last token), lazily checkpointed at
    the exploded grain. The bigram aggregate is the not-null subset;
    BOTH vocab tables derive from the same rows — `sv` = per-source
    distinct prefix count, `gv` = global distinct over the same
    distinct (source, word) side table — so the three corpus passes
    collapse into one lineage. The ONE (source, prefix, next)
    aggregate still feeds everything downstream — the global model
    sums out the source key, the self model reuses the per-source
    rows, scoring is two equi-joins back onto the distinct-pair table
    (never a corpus rescan; the domain_shift_matrix plan with fanout 2
    instead of k). NLL terms are integer micro-nats; the
    occurrence-weighted means accumulate in the DOUBLE domain
    identically in both engines (the ADVICE-r9 overflow rule)."""
    d = load_table_parallel(spark, sf_dir, "documents").select("source", "text")
    tk = d.select("source", F.expr(_TOKS_S).alias("t"))
    ev = (
        tk.select(
            "source",
            F.explode(
                F.expr(
                    "CASE WHEN size(t) >= 1 THEN transform(sequence(0, size(t) - 1), "
                    "i -> struct(element_at(t, i + 1) AS prefix, "
                    "CASE WHEN i < size(t) - 1 THEN element_at(t, i + 2) END "
                    "AS next_token)) ELSE array() END"
                )
            ).alias("p"),
        )
        .select("source", "p.prefix", "p.next_token")
        .localCheckpoint(eager=False)  # bigram + vocab branches
    )
    ebg = (
        ev.filter(F.col("next_token").isNotNull())
        .groupBy("source", "prefix", "next_token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .localCheckpoint(eager=False)  # global + self + scoring sides
    )
    sw = (
        ev.select("source", F.col("prefix").alias("word"))
        .distinct()
        .localCheckpoint(eager=False)  # per-source + global vocab
    )
    gab = ebg.groupBy("prefix", "next_token").agg(
        F.sum("n_occ").cast("long").alias("cab")
    )
    ga = ebg.groupBy("prefix").agg(F.sum("n_occ").cast("long").alias("ca_g"))
    gv = sw.agg(F.countDistinct("word").cast("long").alias("vsz_g"))
    sa = ebg.groupBy("source", "prefix").agg(
        F.sum("n_occ").cast("long").alias("ca_s")
    )
    sv = sw.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("vsz_s"))
    nll = lambda ca, v, cab: (
        F.round(F.log(F.col(ca) + F.col(v)) * 1000000, 0).cast("long")
        - F.round(F.log(F.col(cab) + 1) * 1000000, 0).cast("long")
    )
    scored = (
        ebg.join(gab.withColumnRenamed("cab", "cab_g"), ["prefix", "next_token"])
        .join(ga, "prefix")
        .join(sa, ["source", "prefix"])
        .join(F.broadcast(sv), "source")
        .crossJoin(F.broadcast(gv))
        .select(
            "source",
            "n_occ",
            nll("ca_g", "vsz_g", "cab_g").alias("nll_g_e6"),
            nll("ca_s", "vsz_s", "n_occ").alias("nll_s_e6"),
        )
    )
    wm = lambda c: (
        F.floor(
            F.sum(F.col("n_occ").cast("double") * F.col(c).cast("double"))
            / F.sum("n_occ")
            + F.lit(0.5)
        ).cast("long")
    )
    per = scored.groupBy("source").agg(
        F.sum("n_occ").cast("long").alias("n_bigrams"),
        wm("nll_g_e6").alias("mg_e6"),
        wm("nll_s_e6").alias("ms_e6"),
    )
    exc = per.withColumn(
        "ex_e6", F.greatest(F.col("mg_e6") - F.col("ms_e6"), F.lit(0).cast("long"))
    )
    # totals as a whole-frame window over the k-source table (20 rows,
    # bounded by the source count at any sf) instead of a separate
    # agg + broadcast-build job: one driver-synchronized job fewer —
    # A/B'd min-of-6 in one process 2.61 -> 2.24 s at sf0.1
    wall = Window.partitionBy(F.lit(1))
    exc = exc.withColumn("tex", F.sum("ex_e6").over(wall).cast("long")).withColumn(
        "k", F.count(F.lit(1)).over(wall).cast("long")
    )
    return exc.select(
        "source",
        "n_bigrams",
        (F.col("mg_e6") / F.lit(1000000.0)).alias("nll_global"),
        (F.col("ms_e6") / F.lit(1000000.0)).alias("nll_self"),
        (F.col("ex_e6") / F.lit(1000000.0)).alias("excess_nll"),
        F.when(
            F.col("tex") == 0,
            F.floor(F.lit(1000000.0) / F.col("k") + F.lit(0.5)) / 1000000.0,
        )
        .otherwise(
            F.floor(F.col("ex_e6") * F.lit(1000000.0) / F.col("tex") + F.lit(0.5))
            / 1000000.0
        )
        .alias("mixture_weight"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the lexical + ANN lists
# ---------------------------------------------------------------------------

# Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
# the standard way a serving tier merges BM25's lexical list with a
# vector index's semantic list without score calibration — each
# retriever contributes 1/(K + rank) per document, K = 60 per the
# paper. The two retrievers here share the repo's deterministic query
# subset (doc/vec % 100 = 0, and vec_id == doc_id in the synthetic
# corpus) and the same top-10 cut, so fusion is a pure rank-domain
# composition: no scores cross retriever boundaries. Integer-exact by
# the graded-eval discount trick — the ten 1/(K+rank) values are
# inlined as the SAME round(1e6/(60+r)) integer literals in both
# engines, so fused scores are int64 sums.

RRF_K = 60


def _rrf_disc(k: int) -> tuple[int, ...]:
    """round(1e6/(k+r)) discount table for ranks 1..BM25_TOP — the ONE
    definition both the shipped fusion (_RRF_E6 = _rrf_disc(RRF_K)) and
    the K sweep derive from, so the sweep's K=60 row structurally IS
    the production operating point."""
    return tuple(int(1000000.0 / (k + r) + 0.5) for r in range(1, BM25_TOP + 1))


_RRF_E6 = _rrf_disc(RRF_K)


def _rrf_oracle() -> str:
    """Lazy oracle (registry callable form): composes similarity's
    SRP-LSH oracle, which lives in a module that does not import this
    one — resolved at oracle_sql() time for symmetry with the Spark
    side's function-level import."""
    from eventstreamer_spark.operators.similarity import _LSH_ORACLE

    lits = ", ".join(str(v) for v in _RRF_E6)
    return f"""
WITH bm AS ({_BM25_ORACLE}),
ann AS ({_LSH_ORACLE}),
u AS (
  SELECT query_id, doc_id, rank FROM bm
  UNION ALL
  SELECT query_id, neighbor_id AS doc_id, rank FROM ann
),
fused AS (
  SELECT query_id, doc_id,
         CAST(sum(([{lits}])[rank]) AS BIGINT) AS rrf_e6,
         CAST(count(*) AS BIGINT) AS n_lists
  FROM u GROUP BY 1, 2
),
rr AS (
  SELECT query_id, doc_id, rrf_e6, n_lists,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rrf_e6 DESC, doc_id
         ) AS BIGINT) AS rank
  FROM fused
)
SELECT query_id, doc_id, rrf_e6 / 1000000.0 AS rrf_score, n_lists, rank
FROM rr WHERE rank <= {BM25_TOP}
"""


def _retriever_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fusion family's shared input: the UNION of both retrievers'
    verified top-10 rank lists as (query_id, doc_id, rank) — bm25_topk's
    lexical list (broadcast query-term join) and lsh_topk's ANN list
    (probe explode + one bucket equi-join); the corpus never shuffles
    in either. ≤ 2·k rows per query."""
    from eventstreamer_spark.operators.similarity import lsh_topk

    bm = q_bm25_topk(spark, sf_dir).select("query_id", "doc_id", "rank")
    prepared = H.with_quantized_unit(
        load_table_parallel(spark, sf_dir, "embeddings"),
        "embedding",
        "uq",
        drop_zero_norm=True,
    ).select("vec_id", "uq", H.srp_bucket_expr("embedding").alias("bucket"))
    ann = lsh_topk(prepared).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return bm.unionByName(ann)


def _free_rlists(_key: object, df: DataFrame) -> None:
    free_local_checkpoint(df)


_RLISTS_MEMO: dict[tuple[str, str], DataFrame] = BoundedMemo(
    maxsize=4, on_evict=_free_rlists
)


def retriever_lists_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_retriever_lists`` behind a per-(applicationId, sf_dir)
    localCheckpoint (r14 optimization): the THREE fusion queries —
    hybrid_rrf_fusion, stream_rrf_fusion, rrf_k_sweep — each re-built
    both retrievers' top-10 lists per invocation (bm25_topk's term
    join + lsh_topk's probe chain) for the identical bounded
    ≤ 2·q·k-row table. One build per session now (the retrievers'
    OWNER queries, bm25_topk and lsh_topk, still pay their own builds
    every invocation — eval-tier contract); consumers fuse over the
    checkpointed rows and are declared in bench.py's memo_warm. Same
    post-eviction invalidation contract as residual_artifacts_memo:
    consume at build time, evaluate within the invocation."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = live_hit(_RLISTS_MEMO, key)
    if hit is None:
        hit = _retriever_lists(spark, sf_dir).localCheckpoint(eager=False)
        _RLISTS_MEMO[key] = hit
    return hit


@query("hybrid_rrf_fusion", oracle=_rrf_oracle)
def q_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+semantic serving via Reciprocal Rank Fusion (see
    section comment): BM25's top-10 and the multi-probe SRP-LSH ANN
    top-10 merge per query as Σ 1/(60 + rank) — the calibration-free
    fusion every hybrid search deployment runs — with n_lists
    reporting whether a hit came from one list or both. Completes the
    serving family's missing stage: build → compress → serve → tune →
    refine → FUSE.

    Scale shape: both input lists are the retrievers' own verified
    plans unchanged (bm25_topk's broadcast query-term join; lsh_topk's
    query-side probe explode + one bucket equi-join — the corpus never
    shuffles in either); fusion itself touches ≤ 2·q·k rows — a
    groupBy at (query, doc) grain on bounded lists, then a per-query
    window. Exactness: rank lists are the verified integer-domain
    retrievers; the 1/(K+rank) discounts are shared integer literals;
    fused scores are int64 sums; ties break (rrf_e6 DESC, doc_id)."""
    lits = "array({})".format(", ".join(f"{v}L" for v in _RRF_E6))
    fused = (
        retriever_lists_memo(spark, sf_dir)
        .select(
            "query_id",
            "doc_id",
            F.expr(f"element_at({lits}, CAST(rank AS INT))").alias("rrf_g"),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("rrf_g").cast("long").alias("rrf_e6"),
            F.count(F.lit(1)).cast("long").alias("n_lists"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("rrf_e6").desc(), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= BM25_TOP)
        .select(
            "query_id",
            "doc_id",
            (F.col("rrf_e6") / F.lit(1000000.0)).alias("rrf_score"),
            "n_lists",
            "rank",
        )
    )


_STREAM_RRF_CHUNKS = 3


@query("stream_rrf_fusion", oracle=_rrf_oracle)
def q_stream_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF FUSION SERVING: the fusion stage of the hybrid ladder over
    a live request stream (VERDICT r11 item 4) — BM25, ANN and the
    classifier already serve streaming; this closes the one ladder
    stage that was batch-only. Fusion requests (query ids, chunked
    query_id % 3) arrive as three micro-batches; each batch joins its
    requests to the two retrievers' materialized rank lists, fuses
    with the shared integer 1/(K+rank) discounts, ranks and EMITS its
    own requests' top-k via foreachBatch — per-batch emission, NO
    aggregation state between triggers (stream_bm25_topk's serving
    gate verbatim).

    Plan: the static side is the UNION of both retrievers' verified
    top-10 lists, built once before the stream starts (bm25_topk's
    broadcast query-term join; lsh_topk's probe explode + bucket
    equi-join) and eager-checkpointed — at 100 TB this is the serving
    tier's candidate cache, ≤ 2·k rows per query. Each micro-batch
    broadcasts its bounded request ids into one equi-join against the
    lists, so per-trigger work is ≤ 2·q_batch·k rows; the collect is
    the EMISSION (≤ q_batch × k rows), not a driver compute loop.

    Oracle: the batch RRF oracle VERBATIM — the union of the three
    micro-batches covers the whole query subset and both lists are
    static, so serving and batch can never drift (the stream==batch
    discipline; pinned row-for-row in test_stream_rrf_matches_batch)."""
    import shutil

    from eventstreamer_spark.streaming.pipeline import run_foreach_batch

    # static retriever outputs: both verified lists materialize once,
    # discount applied at build time so batches only sum and rank
    lits = "array({})".format(", ".join(f"{v}L" for v in _RRF_E6))
    lists = (
        retriever_lists_memo(spark, sf_dir)
        .select(
            "query_id",
            "doc_id",
            F.expr(f"element_at({lits}, CAST(rank AS INT))").alias("rrf_g"),
        )
        .localCheckpoint(eager=True)
    )

    chunk_dir, stream = _stage_residue_chunks(
        spark,
        lists.select("query_id")
        .distinct()
        .withColumn("bb", (F.col("query_id") % _STREAM_RRF_CHUNKS).cast("int")),
        _STREAM_RRF_CHUNKS,
        "es_rrfstream_",
    )
    try:
        served: list = []
        wr = Window.partitionBy("query_id").orderBy(
            F.col("rrf_e6").desc(), F.col("doc_id")
        )

        def serve(bdf: DataFrame, _batch_id: int) -> None:
            fused = (
                F.broadcast(bdf.select("query_id"))
                .join(lists, "query_id")
                .groupBy("query_id", "doc_id")
                .agg(
                    F.sum("rrf_g").cast("long").alias("rrf_e6"),
                    F.count(F.lit(1)).cast("long").alias("n_lists"),
                )
            )
            topk = fused.withColumn(
                "rank", F.row_number().over(wr).cast("long")
            ).filter(F.col("rank") <= BM25_TOP)
            served.extend(topk.collect())

        run_foreach_batch(stream, serve)
        out = spark.createDataFrame(
            served,
            "query_id long, doc_id long, rrf_e6 long, n_lists long, rank long",
        )
        return out.select(
            "query_id",
            "doc_id",
            (F.col("rrf_e6") / F.lit(1000000.0)).alias("rrf_score"),
            "n_lists",
            "rank",
        )
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# RRF K sweep: the fusion stage's one tuning knob, measured
# ---------------------------------------------------------------------------

# The house sweep discipline (ivf_nprobe_sweep, minhash_band_tuning)
# applied to fusion: RRF's single parameter K controls how top-heavy
# the merge is — small K lets a #1 rank dominate (1/(K+1) ≫ 1/(K+10)),
# large K flattens toward a Borda count. Cormack et al. fixed K = 60
# "without tuning"; this table measures what the choice costs on THIS
# corpus over the full THREE-list ensemble — BM25 lexical + SRP-LSH +
# IVF (the two vector index families overlap heavily where they find
# true neighbors; the lexical list contributes disjoint heads, the
# measured hybrid_rrf_fusion regime) — because K only bites where
# lists overlap: with two near-disjoint lists fusion degenerates to
# interleaving and every K ties (measured: bm25+lsh alone shares 1 of
# 500 fused slots at sf0.1). Per K ∈ {10, 60, 200}: recall@k of the
# fused top-10 against the exact cosine truth and the CONSENSUS share
# (survivors on ≥ 2 lists — high-K fusion favors consensus docs,
# low-K favors single-list heads). One build of the three rank lists
# serves every level; per-K discounts are the same round(1e6/(K+r))
# integer literals in both engines.

RRF_K_LEVELS = (10, 60, 200)


def _rrf_k_case(arr_of) -> str:
    whens = " ".join(
        f"WHEN {k} THEN {arr_of(_rrf_disc(k))}" for k in RRF_K_LEVELS
    )
    return f"CASE rrf_k {whens} END"


def _rrf_k_sweep_oracle() -> str:
    """Lazy oracle (registry callable form): composes similarity's
    SRP-LSH and brute-truth oracles, which live in a module that does
    not import this one."""
    from eventstreamer_spark.operators.similarity import (
        _BRUTE_ORACLE,
        _IVF_SEARCH_ORACLE,
        _LSH_ORACLE,
    )

    case = _rrf_k_case(lambda d: "[{}]".format(", ".join(str(v) for v in d)))
    levels = ", ".join(str(k) for k in RRF_K_LEVELS)
    return f"""
WITH bm AS ({_BM25_ORACLE}),
ann AS ({_LSH_ORACLE}),
ivf AS ({_IVF_SEARCH_ORACLE}),
u AS (
  SELECT query_id, doc_id, rank FROM bm
  UNION ALL
  SELECT query_id, neighbor_id AS doc_id, rank FROM ann
  UNION ALL
  SELECT query_id, neighbor_id AS doc_id, rank FROM ivf
),
fanned AS (
  SELECT lv.rrf_k, u.query_id, u.doc_id, ({case})[u.rank] AS g
  FROM u CROSS JOIN (SELECT unnest([{levels}]) AS rrf_k) lv
),
fused AS (
  SELECT rrf_k, query_id, doc_id,
         CAST(sum(g) AS BIGINT) AS rrf_e6,
         CAST(count(*) AS BIGINT) AS n_lists
  FROM fanned GROUP BY 1, 2, 3
),
top AS (
  SELECT rrf_k, query_id, doc_id, n_lists FROM (
    SELECT rrf_k, query_id, doc_id, n_lists,
           row_number() OVER (
             PARTITION BY rrf_k, query_id ORDER BY rrf_e6 DESC, doc_id
           ) AS rnk
    FROM fused
  ) WHERE rnk <= {BM25_TOP}
),
base AS (SELECT query_id, doc_id FROM top WHERE rrf_k = 60),
brute AS ({_BRUTE_ORACLE}),
tot AS (SELECT CAST(count(*) AS BIGINT) AS brute_total FROM brute)
SELECT CAST(t.rrf_k AS BIGINT) AS rrf_k,
       CAST(count(*) AS BIGINT) AS n_fused,
       CAST(count(*) FILTER (WHERE t.n_lists >= 2) AS BIGINT) AS n_consensus,
       floor(count(*) FILTER (WHERE t.n_lists >= 2) * 1000000.0 / count(*)
             + 0.5) / 1000000.0 AS consensus_share,
       CAST(count(*) FILTER (WHERE bs.doc_id IS NULL) AS BIGINT)
         AS n_moved_vs_k60,
       CAST(count(b.neighbor_id) AS BIGINT) AS hits,
       tot.brute_total,
       floor(count(b.neighbor_id) * 1000000.0 / tot.brute_total + 0.5)
         / 1000000.0 AS recall_at_k
FROM top t
LEFT JOIN base bs ON bs.query_id = t.query_id AND bs.doc_id = t.doc_id
LEFT JOIN brute b ON b.query_id = t.query_id AND b.neighbor_id = t.doc_id,
tot
GROUP BY t.rrf_k, tot.brute_total
"""


@query("rrf_k_sweep", oracle=_rrf_k_sweep_oracle)
def q_rrf_k_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RRF K tuning table (see section comment): per K, the fused
    top-10's recall@k against the exact cosine truth, the consensus
    share (survivors on ≥ 2 of the three retrievers' lists), and the
    SET DELTA vs the K=60 paper default (fused slots K=60 does not
    hold) — the self-certifying column: zero means the top-k set is
    K-invariant on this corpus and the untuned default is safe; a
    future corpus where K bites shows exactly how many slots move.

    Scale shape: ONE build of the three verified rank lists (the
    fusion family's shared bm25+lsh input plus graded_retrieval_eval's
    IVF list — ≤ 3·q·k rows total, checkpointed); the level fanout is
    a broadcast 3-row cross join over those bounded lists — rows
    ≤ 3·q·k·|K|, never a corpus term; the exact truth comes from the
    consumer-side brute_truth_memo and the centroids from the shared
    ivf_centroids_for memo (the owners, ann_bruteforce_topk and
    ivf_topk_search, still pay their own builds — eval audit tier by
    contract). Exactness: per-K discounts are shared integer
    literals, fused scores int64 sums, ties (rrf_e6 DESC, doc_id),
    shares via the floor-1e6 form."""
    from eventstreamer_spark.operators.similarity import (
        brute_truth_memo,
        ivf_centroids_for,
        ivf_topk,
    )

    raw = load_table_parallel(spark, sf_dir, "embeddings")
    prepared = (
        H.with_quantized_unit(raw, "embedding", "uq", drop_zero_norm=True)
        .select("vec_id", "uq")
        # feeds every Lloyd scoring pass AND the probe/assign pass —
        # without the checkpoint a centroid-memo miss re-quantizes the
        # corpus once per iteration (the q_ivf_topk_search contract)
        .localCheckpoint(eager=False)
    )
    ivf = ivf_topk(
        raw,
        prepared,
        cent=ivf_centroids_for(spark, sf_dir, e=raw, embq=prepared),
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    lists = (
        retriever_lists_memo(spark, sf_dir)
        .unionByName(ivf)
        .localCheckpoint(eager=False)
    )
    lev = spark.createDataFrame([(k,) for k in RRF_K_LEVELS], "rrf_k int")
    case = _rrf_k_case(
        lambda d: "array({})".format(", ".join(f"{v}L" for v in d))
    )
    fanned = lists.crossJoin(F.broadcast(lev)).select(
        "rrf_k",
        "query_id",
        "doc_id",
        F.expr(f"element_at({case}, CAST(rank AS INT))").alias("g"),
    )
    fused = fanned.groupBy("rrf_k", "query_id", "doc_id").agg(
        F.sum("g").cast("long").alias("rrf_e6"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    wr = Window.partitionBy("rrf_k", "query_id").orderBy(
        F.col("rrf_e6").desc(), "doc_id"
    )
    top = (
        fused.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= BM25_TOP)
        .select("rrf_k", "query_id", "doc_id", "n_lists")
        # bounded (|K|·q·k rows); read twice — per-K report + the
        # K=60 baseline for the set-delta column
        .localCheckpoint(eager=False)
    )
    base = top.filter(F.col("rrf_k") == 60).select(
        "query_id", "doc_id", F.lit(1).cast("long").alias("in_base")
    )
    brute = brute_truth_memo(spark, sf_dir)
    bt = brute.select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.lit(1).cast("long").alias("is_true"),
    )
    total = brute.agg(F.count(F.lit(1)).cast("long").alias("brute_total"))

    def ratio6(num: str, den: str):
        return F.floor(
            F.col(num) * F.lit(1000000.0) / F.col(den) + F.lit(0.5)
        ) / F.lit(1000000.0)

    per = (
        # both the truth list (q×k) and the K=60 baseline (q×k) are
        # bounded eval-grain tables — broadcast; the checkpointed RDD
        # carries no stats so AQE would otherwise sort-merge them
        top.join(F.broadcast(bt), ["query_id", "doc_id"], "left")
        .join(F.broadcast(base), ["query_id", "doc_id"], "left")
        .groupBy("rrf_k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fused"),
            F.sum((F.col("n_lists") >= 2).cast("long"))
            .cast("long")
            .alias("n_consensus"),
            F.sum(F.col("in_base").isNull().cast("long"))
            .cast("long")
            .alias("n_moved_vs_k60"),
            F.coalesce(F.sum("is_true"), F.lit(0)).cast("long").alias("hits"),
        )
    )
    return per.crossJoin(F.broadcast(total)).select(
        F.col("rrf_k").cast("long").alias("rrf_k"),
        "n_fused",
        "n_consensus",
        ratio6("n_consensus", "n_fused").alias("consensus_share"),
        "n_moved_vs_k60",
        "hits",
        "brute_total",
        ratio6("hits", "brute_total").alias("recall_at_k"),
    )
