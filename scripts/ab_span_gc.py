"""Attribute duplicate_span_histogram's intermittent 8-13 s in-window
passes: sample JVM GC collector counts/times (driver == executor in
local mode) around each timed pass after a full surface warm.

    python scripts/ab_span_gc.py [n_timed_passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from eventstreamer_spark.session import get_spark  # noqa: E402

TARGET = "duplicate_span_histogram"


def gc_totals(spark) -> tuple[int, int]:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    n = t = 0
    for i in range(beans.size()):
        b = beans.get(i)
        n += b.getCollectionCount()
        t += b.getCollectionTime()
    return n, t


def heap_used_mb(spark) -> float:
    mem = spark._jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
    return mem.getHeapMemoryUsage().getUsed() / 1e6


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-span-gc")
    qs = contract.queries()
    contract.entry(spark).limit(1).collect()

    t0 = time.perf_counter()
    for n in sorted(qs):
        try:
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"warm {n} FAILED: {e}", file=sys.stderr)
    print(f"full warm pass: {time.perf_counter()-t0:.0f}s heap={heap_used_mb(spark):.0f}MB", flush=True)

    for i in range(passes):
        gn0, gt0 = gc_totals(spark)
        t1 = time.perf_counter()
        qs[TARGET](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t1
        gn1, gt1 = gc_totals(spark)
        print(
            f"pass {i}: {dt:5.2f}s  gc_events={gn1-gn0:3d} gc_ms={gt1-gt0:6d} "
            f"heap={heap_used_mb(spark):.0f}MB",
            flush=True,
        )


if __name__ == "__main__":
    main()
