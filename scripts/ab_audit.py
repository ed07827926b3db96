"""In-process A/B for the round-10 IVF-audit-family re-plans (VERDICT r9
item 1): ivf_staleness_audit, sampled_centroid_training, ivf_nprobe_sweep.

OLD plans: the round-9 shapes, verbatim — separate e.count() parquet-scan
job to size k, a separately-quantized sampled slice, per-variant hit/tot/
cells aggregation + broadcast jobs.
NEW plans: the registered queries (k sized by the count() that materializes
the quantization checkpoint; sampled slice filters the same checkpoint;
single-assembly result job).

Both run min-of-N in ONE process, alternating, per the measurement protocol.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from eventstreamer_spark.functions import hashing as H
from eventstreamer_spark.operators.similarity import (
    _SAMPLED_TRAIN_PRED,
    _STALE_BASE_PRED,
    _SWEEP_LEVELS,
    QUERY_FILTER,
    TOP_K,
    brute_topk,
    ivf_centroids_for,
    ivf_centroids_iterated,
    ivf_topk,
    q_ivf_nprobe_sweep,
    q_ivf_staleness_audit,
    q_sampled_centroid_training,
    _score_centroids,
)
from eventstreamer_spark.session import configure
from eventstreamer_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_PASSES", "3"))


def old_staleness(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    base = e.filter(F.expr(_STALE_BASE_PRED))
    kf = int(math.ceil(math.sqrt(e.count())))
    kb = kf
    embq_full = (
        H.with_quantized_unit(e, "embedding", "uq", drop_zero_norm=True)
        .select("vec_id", "uq")
        .localCheckpoint(eager=False)
    )
    embq_base = embq_full.filter(F.expr(_STALE_BASE_PRED))
    cent_stale = ivf_centroids_iterated(
        base.withColumn("label", F.col("vec_id") % F.lit(kb)), embq=embq_base
    )
    cent_fresh = ivf_centroids_iterated(
        e.withColumn("label", F.col("vec_id") % F.lit(kf)), embq=embq_full
    )
    truth = brute_topk(embq_full).select("query_id", "neighbor_id").localCheckpoint(
        eager=False
    )

    def variant(cent, name):
        found = ivf_topk(e, embq_full, cent=cent).select("query_id", "neighbor_id")
        hit = truth.join(found, ["query_id", "neighbor_id"], "left_semi").agg(
            F.count(F.lit(1)).cast("long").alias("n_hit")
        )
        tot = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
        cells = cent.agg(F.count(F.lit(1)).cast("long").alias("n_cells"))
        return (
            hit.crossJoin(F.broadcast(tot))
            .crossJoin(F.broadcast(cells))
            .select(
                F.lit(name).alias("variant"),
                "n_cells",
                "n_hit",
                "n_truth",
                (
                    F.floor(
                        F.col("n_hit") * F.lit(1000000.0) / F.col("n_truth")
                        + F.lit(0.5)
                    )
                    / 1000000.0
                ).alias("recall_at_k"),
            )
        )

    return variant(cent_stale, "stale").unionByName(variant(cent_fresh, "retrained"))


def old_sampled(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    k = int(math.ceil(math.sqrt(e.count())))
    embq = (
        H.with_quantized_unit(e, "embedding", "uq", drop_zero_norm=True)
        .select("vec_id", "uq")
        .localCheckpoint(eager=False)
    )
    seeded = e.withColumn("label", F.col("vec_id") % F.lit(k))
    cent_f = ivf_centroids_for(spark, sf_dir, e=seeded, embq=embq, variant=f"sqrt-k{k}")
    train = e.filter(F.expr(_SAMPLED_TRAIN_PRED))
    embq_s = (
        H.with_quantized_unit(train, "embedding", "uq", drop_zero_norm=True)
        .select("vec_id", "uq")
        .localCheckpoint(eager=False)
    )
    seeded_s = train.withColumn("label", F.col("vec_id") % F.lit(k))
    cent_s = ivf_centroids_iterated(seeded_s, embq=embq_s)
    cos5 = F.expr("CAST(round(cosine * 100000, 0) AS BIGINT)")
    bf = _score_centroids(embq, cent_f).select(
        "vec_id", F.col("c_label").alias("cf"), cos5.alias("c5f")
    )
    bs = _score_centroids(embq, cent_s).select(
        "vec_id", F.col("c_label").alias("cs"), cos5.alias("c5s")
    )
    tr = train.agg(F.count(F.lit(1)).cast("long").alias("n_train"))

    def f6(col):
        return F.floor(col + F.lit(0.5)) / F.lit(1000000.0)

    return (
        bf.join(bs, "vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.countDistinct("cf").cast("long").alias("cells_full"),
            F.countDistinct("cs").cast("long").alias("cells_sampled"),
            F.sum((F.col("cf") == F.col("cs")).cast("long"))
            .cast("long")
            .alias("n_agree"),
            F.sum("c5f").alias("_sf"),
            F.sum("c5s").alias("_ss"),
        )
        .crossJoin(F.broadcast(tr))
        .select(
            "n_vectors",
            "n_train",
            "cells_full",
            "cells_sampled",
            "n_agree",
            f6(F.col("n_agree") * F.lit(1000000.0) / F.col("n_vectors")).alias(
                "agree_share"
            ),
            f6(F.col("_sf") * F.lit(10.0) / F.col("n_vectors")).alias("mean_cos_full"),
            f6(F.col("_ss") * F.lit(10.0) / F.col("n_vectors")).alias(
                "mean_cos_sampled"
            ),
        )
    )


def old_sweep(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    kf = int(math.ceil(math.sqrt(e.count())))
    embq = (
        H.with_quantized_unit(e, "embedding", "uq", drop_zero_norm=True)
        .select("vec_id", "uq")
        .localCheckpoint(eager=False)
    )
    cent = ivf_centroids_iterated(
        e.withColumn("label", F.col("vec_id") % F.lit(kf)), embq=embq
    )
    scored = _score_centroids(embq, cent, max_rank=max(_SWEEP_LEVELS)).localCheckpoint(
        eager=False
    )
    asg = scored.filter(F.col("rn") == 1).select("vec_id", "uq", "c_label")
    prb = scored.filter(
        F.expr(QUERY_FILTER) & (F.col("rn") <= max(_SWEEP_LEVELS))
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("uq").alias("q_uq"),
        "c_label",
        F.col("rn").alias("probe_rn"),
    )
    cand = (
        F.broadcast(prb)
        .join(
            asg,
            (prb["c_label"] == asg["c_label"]) & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            "probe_rn",
            F.col("vec_id").alias("neighbor_id"),
            F.round(H.qcosine_expr("q_uq", "uq"), 5).alias("cosine"),
        )
        .localCheckpoint(eager=False)
    )
    lv = spark.createDataFrame([(p,) for p in _SWEEP_LEVELS], "nprobe long")
    leveled = cand.join(F.broadcast(lv), F.col("probe_rn") <= F.col("nprobe"))
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    topk = (
        leveled.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("nprobe", "query_id", "neighbor_id")
    )
    truth = brute_topk(embq).select("query_id", "neighbor_id").localCheckpoint(
        eager=False
    )
    scans = leveled.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    hits = (
        topk.join(truth, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    tot = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    return (
        scans.join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "nprobe",
            "n_candidates",
            F.coalesce("n_hit", F.lit(0).cast("long")).alias("n_hit"),
            "n_truth",
            (
                F.floor(
                    F.coalesce("n_hit", F.lit(0).cast("long"))
                    * F.lit(1000000.0)
                    / F.col("n_truth")
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("recall_at_k"),
        )
    )


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    configure(spark)
    spark.sparkContext.setLogLevel("ERROR")

    pairs = {
        "staleness": (old_staleness, q_ivf_staleness_audit),
        "sampled": (old_sampled, q_sampled_centroid_training),
        "sweep": (old_sweep, q_ivf_nprobe_sweep),
    }
    for qname, (old, new) in pairs.items():
        # values must agree between plans
        ro = sorted(map(str, old(spark, SF_DIR).collect()))
        rn = sorted(map(str, new(spark, SF_DIR).collect()))
        tag = "VALUES EQUAL" if ro == rn else "VALUES DIFFER!"
        to, tn = [], []
        for _ in range(N):
            t0 = time.monotonic()
            old(spark, SF_DIR).count()
            to.append(time.monotonic() - t0)
            t0 = time.monotonic()
            new(spark, SF_DIR).count()
            tn.append(time.monotonic() - t0)
        print(
            f"{qname}: old min {min(to):.2f}s new min {min(tn):.2f}s  {tag}  "
            f"old=[{', '.join(f'{t:.2f}' for t in to)}] "
            f"new=[{', '.join(f'{t:.2f}' for t in tn)}]"
        )


if __name__ == "__main__":
    main()
