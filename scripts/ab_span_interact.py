"""Reproduce duplicate_span_histogram's in-window slowdown.

Two full bench windows read its min-of-3 at 5.8-6.5 s while every
isolated min-of-3 reads ~1.8 s — deterministic session-state
interaction, not host noise. Phases:
  A: fresh session, min-of-3 (expected ~1.8 s)
  B: run the dedup-family queries once (the alphabetical predecessors
     that build the shingled-corpus + pairs memos), re-time min-of-3
  C: run EVERY query alphabetically before it once, re-time min-of-3
Prints storage-block totals between phases.

    python scripts/ab_span_interact.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from eventstreamer_spark.session import get_spark  # noqa: E402

TARGET = "duplicate_span_histogram"


def storage_mb(spark) -> float:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(i.memSize() for i in infos) / 1e6


def time_target(spark, qs, sf_dir, passes=3) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        qs[TARGET](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-span-interact")
    qs = contract.queries()
    contract.entry(spark).limit(1).collect()

    spark.sparkContext.setJobDescription("phase A: isolated")
    a = time_target(spark, qs, sf_dir)
    print(f"A isolated min-of-3: {a:.2f}s storage={storage_mb(spark):.1f}MB", flush=True)

    dedup_like = [n for n in sorted(qs) if n.startswith("dedup") or "neardup" in n or "minhash" in n or "simhash" in n]
    spark.sparkContext.setJobDescription("phase B: warm dedup family")
    for n in dedup_like:
        try:
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"warm {n} FAILED: {e}", file=sys.stderr)
    b = time_target(spark, qs, sf_dir)
    print(f"B after dedup family ({len(dedup_like)} queries) min-of-3: {b:.2f}s "
          f"storage={storage_mb(spark):.1f}MB", flush=True)

    before = [n for n in sorted(qs) if n < TARGET]
    spark.sparkContext.setJobDescription("phase C: warm all predecessors")
    for n in before:
        try:
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"warm {n} FAILED: {e}", file=sys.stderr)
    c = time_target(spark, qs, sf_dir)
    print(f"C after all {len(before)} predecessors min-of-3: {c:.2f}s "
          f"storage={storage_mb(spark):.1f}MB", flush=True)


if __name__ == "__main__":
    main()
