"""A/B (r14, recorded): selection_method_agreement's rank stage —
three separate parallel_rank passes (the round-14 first draft: one
checkpoint + offset collect + window EACH, plus a 3-way doc_id join)
vs ONE stacked parallel_rank over (doc_id, method, score) long form
(per-method rank = global_rank − method_offset·n, unstacked by one
doc_id-keyed aggregate). Same session, alternating order, min-of-3,
values asserted identical. Measured on the round-14 host at sf0.1:
old 9.41 s vs new 7.86 s min-of-3 (chain rebuild ~7.5 s dominates
both; the rank machinery itself shrank from ~8 jobs to ~4). The
stacked form ships."""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import math
from pyspark.sql import functions as F
from eventstreamer_spark.session import get_spark
from eventstreamer_spark.memo import free_local_checkpoint
from eventstreamer_spark.operators.ranks import finalize_report, parallel_rank
from eventstreamer_spark.operators.audit import SELECTION_TOPQ_FRAC

spark = get_spark("ab-sel2")
sf = "/root/testdata/sf0.1"

from eventstreamer_spark.operators.curation import dsir_doc_scores
from eventstreamer_spark.operators.quality import _doc_features, ridge_scores, train_ridge_weights
from eventstreamer_spark.operators.text import QUALITY_SPARK
from eventstreamer_spark.sources.tables import load_table_parallel

def build_j():
    feats, lab = _doc_features(spark, sf)
    w = train_ridge_weights(spark, sf, feats=feats, lab=lab)
    clf = ridge_scores(spark, sf, w, feats=feats).select("doc_id", F.col("score_e6").alias("s_clf"))
    dsir = dsir_doc_scores(spark, sf).select("doc_id", F.col("s_e6").alias("s_dsir"))
    hq = load_table_parallel(spark, sf, "documents").select(
        "doc_id", F.round(F.expr(QUALITY_SPARK) * 10, 0).cast("long").alias("q10"))
    return clf.join(dsir, "doc_id").join(hq, "doc_id")

# warm chains once (cold build not under test)
jw = build_j().localCheckpoint(eager=True)
n_docs = jw.count()
print("docs:", n_docs)

def agg_from(rk, n, k):
    def d2(a,b): return F.sum((F.col(a)-F.col(b))*(F.col(a)-F.col(b))).cast("long")
    return rk.agg(d2("r_d","r_c").alias("x"), d2("r_d","r_q").alias("y"), d2("r_c","r_q").alias("z")).localCheckpoint(eager=True)

def old_variant():
    j = build_j().localCheckpoint(eager=True)
    rd, n, ck_d = parallel_rank(spark, j.select("doc_id","s_dsir"), [F.col("s_dsir").desc(),"doc_id"], "r_d")
    rc, _, ck_c = parallel_rank(spark, j.select("doc_id","s_clf"), [F.col("s_clf").desc(),"doc_id"], "r_c")
    rq, _, ck_q = parallel_rank(spark, j.select("doc_id","q10"), [F.col("q10").desc(),"doc_id"], "r_q")
    rk = rd.select("doc_id","r_d").join(rc.select("doc_id","r_c"),"doc_id").join(rq.select("doc_id","r_q"),"doc_id")
    out = agg_from(rk, n, 1).collect()
    for d in (j, ck_d, ck_c, ck_q): free_local_checkpoint(d)
    return out

def new_variant():
    j = build_j()
    stacked = j.selectExpr("doc_id", "stack(3, 'c', s_clf, 'd', s_dsir, 'q', q10) AS (m, s)")
    ranked, n3, ck = parallel_rank(spark, stacked, [F.col("m"), F.col("s").desc(), F.col("doc_id")], "gr")
    n = n3 // 3
    r = ranked.withColumn("r", F.col("gr") - F.when(F.col("m")=="c", F.lit(0)).when(F.col("m")=="d", F.lit(n)).otherwise(F.lit(2*n)).cast("long"))
    rk = r.groupBy("doc_id").agg(
        F.max(F.when(F.col("m")=="d", F.col("r"))).alias("r_d"),
        F.max(F.when(F.col("m")=="c", F.col("r"))).alias("r_c"),
        F.max(F.when(F.col("m")=="q", F.col("r"))).alias("r_q"))
    out = agg_from(rk, n, 1).collect()
    free_local_checkpoint(ck)
    return out

res = {}
for name, fn in [("old", old_variant), ("new", new_variant), ("old", old_variant), ("new", new_variant), ("old", old_variant), ("new", new_variant)]:
    t0 = time.perf_counter(); out = fn(); dt = time.perf_counter() - t0
    res.setdefault(name, []).append(dt)
    print(f"{name}: {dt:.2f}s  {out}")
for k, v in res.items():
    print(k, "min", round(min(v),2), "all", [round(x,2) for x in v])
