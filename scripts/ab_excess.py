"""In-process A/B for the round-11 domain_excess_reweight re-plan
(VERDICT r10 item 2).

OLD plan: the round-10 shape — the corpus tokenizes THREE times (the
bigram explode, the global-vocab explode and the per-source-vocab
explode each re-run _TOKS_S from the parquet scan).
NEW plan: the registered query — ONE tokenize+explode emitting every
token once as `prefix` with a nullable next_token, lazily checkpointed;
bigrams = the not-null subset, both vocab tables derive from the same
distinct (source, word) side table; totals via a whole-frame window
over the 20-row exc table instead of a separate agg+broadcast job.
Both run min-of-N in ONE process, alternating, per the measurement
protocol (cross-process totals drift with host noise).

Round-11 measured record (sf0.1, min-of-4/6, one process each window):
  single-tokenize: 2.40 -> 2.15 s; window-total: 2.61 -> 2.24 s.
A/B'd and LOST (do-not-retry): eager ev checkpoint (noise-level,
2.04 vs 2.12 — consumers pipeline fine from the lazy ckpt); no ev
checkpoint (2.10, two tokenize passes); rollup-combined vocab via an
eager 21-row svg checkpoint (3.03 — the blocking build job costs more
than the gv job it saves); vsz_g riding the sv broadcast via crossJoin
(2.14 vs 2.03 — the two vocab builds already pipeline from the sw
checkpoint). Remaining floor: three driver-synchronized jobs (sv
broadcast build materializing ev+sw, gv broadcast build, main DAG)
at Spark's fixed per-job cost over a ~250 k-token corpus — amortizes
at scale (exponent 0.266, SCALING_r10).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from eventstreamer_spark.operators.indexing import (
    _TOKS_S,
    q_domain_excess_reweight,
)
from eventstreamer_spark.session import configure
from eventstreamer_spark.sources.tables import load_table_parallel

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_PASSES", "4"))


def old_excess(spark: SparkSession, sf_dir: str):
    """The round-10 plan, verbatim shape: three tokenize passes."""
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
        .localCheckpoint(eager=False)
    )
    gab = ebg.groupBy("prefix", "next_token").agg(
        F.sum("n_occ").cast("long").alias("cab")
    )
    ga = ebg.groupBy("prefix").agg(F.sum("n_occ").cast("long").alias("ca_g"))
    gv = tk.select(F.explode("t").alias("word")).agg(
        F.countDistinct("word").cast("long").alias("vsz_g")
    )
    sa = ebg.groupBy("source", "prefix").agg(F.sum("n_occ").cast("long").alias("ca_s"))
    sv = (
        tk.select("source", F.explode("t").alias("word"))
        .groupBy("source")
        .agg(F.countDistinct("word").cast("long").alias("vsz_s"))
    )
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
    tot = exc.agg(
        F.sum("ex_e6").cast("long").alias("tex"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return exc.crossJoin(F.broadcast(tot)).select(
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

    variants = {"old": old_excess, "new": q_domain_excess_reweight}
    times: dict[str, list[float]] = {k: [] for k in variants}
    vals: dict[str, list] = {}
    for name, fn in variants.items():
        vals[name] = sorted(map(str, fn(spark, SF_DIR).collect()))
    assert vals["old"] == vals["new"], "A/B variants disagree on values"
    for _ in range(N):
        for name, fn in variants.items():
            t0 = time.monotonic()
            fn(spark, SF_DIR).collect()
            times[name].append(time.monotonic() - t0)
    for name in variants:
        ts = ", ".join(f"{t:.2f}" for t in times[name])
        print(f"{name}: min {min(times[name]):.2f}s  [{ts}]")


if __name__ == "__main__":
    main()
