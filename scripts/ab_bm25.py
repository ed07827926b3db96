"""In-process A/B for the round-10 bm25_topk re-plan (VERDICT r9 item 1).

OLD plan: lazy tf localCheckpoint + a second df join on the postings side.
NEW plan: the registered query (eager tf checkpoint; df carried through qt).
Both run min-of-N in ONE process, alternating, per the measurement protocol
(cross-process totals drift with host noise; see memory notes).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from eventstreamer_spark.operators.indexing import (
    _TOKS_S,
    _BM25_QPRED,
    BM25_QTERMS,
    BM25_TOP,
    _bm25_term_e6,
    q_bm25_topk,
)
from eventstreamer_spark.session import configure
from eventstreamer_spark.sources.tables import load_table_parallel

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_PASSES", "3"))


def old_bm25(spark: SparkSession, sf_dir: str):
    """The round-9 plan, verbatim shape: lazy ckpt + second df join."""
    d = load_table_parallel(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.expr(_TOKS_S).alias("t"))
    tf = (
        tk.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dl = tk.select("doc_id", F.size("t").cast("long").alias("dlen"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dlen").cast("double") / F.count(F.lit(1))).alias("avglen"),
    )
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    qt = (
        tf.filter(F.expr(_BM25_QPRED))
        .join(df, "tok")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BM25_QTERMS)
        .select(F.col("doc_id").alias("query_id"), F.col("tok").alias("qtok"))
    )
    contrib = (
        F.broadcast(qt)
        .join(tf, (F.col("qtok") == tf["tok"]) & (F.col("doc_id") != F.col("query_id")))
        .drop("qtok")
        .join(dl, "doc_id")
        .join(df, "tok")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", F.expr(_bm25_term_e6("spark")).alias("term_e6"))
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("term_e6").cast("long").alias("score_e6")
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("score_e6").desc(), F.col("doc_id")
    )
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

    variants = {"old": old_bm25, "new": q_bm25_topk}
    times: dict[str, list[float]] = {k: [] for k in variants}
    rows: dict[str, int] = {}
    # warm both once (parquet footer cache, codegen), then alternate
    for name, fn in variants.items():
        rows[name] = fn(spark, SF_DIR).count()
    for _ in range(N):
        for name, fn in variants.items():
            t0 = time.monotonic()
            n = fn(spark, SF_DIR).count()
            times[name].append(time.monotonic() - t0)
            assert n == rows[name], (name, n, rows[name])
    for name in variants:
        ts = ", ".join(f"{t:.2f}" for t in times[name])
        print(f"{name}: min {min(times[name]):.2f}s  rows={rows[name]}  [{ts}]")


if __name__ == "__main__":
    main()
