"""Phase 2 of the duplicate_span_histogram interaction hunt: warm the
ENTIRE 247-query surface once (bench pass 1 equivalent), then re-time
the target min-of-3. If this reproduces the 5.8 s in-window reading,
bisect by family next.

    python scripts/ab_span_interact2.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from eventstreamer_spark.session import get_spark  # noqa: E402

TARGET = "duplicate_span_histogram"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-span-interact2")
    qs = contract.queries()
    contract.entry(spark).limit(1).collect()

    t0 = time.perf_counter()
    for n in sorted(qs):
        try:
            spark.sparkContext.setJobDescription(f"warm:{n}")
            qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"warm {n} FAILED: {e}", file=sys.stderr)
        if n == TARGET:
            print(f"target during pass1 at +{time.perf_counter()-t0:.0f}s", flush=True)
    print(f"full warm pass: {time.perf_counter()-t0:.0f}s", flush=True)

    best = float("inf")
    for i in range(3):
        spark.sparkContext.setJobDescription(f"timed:{TARGET}:{i}")
        t1 = time.perf_counter()
        qs[TARGET](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t1
        best = min(best, dt)
        print(f"pass {i}: {dt:.2f}s", flush=True)
    print(f"after full warm min-of-3: {best:.2f}s", flush=True)


if __name__ == "__main__":
    main()
