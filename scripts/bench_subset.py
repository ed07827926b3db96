"""Targeted bench: time a comma-separated subset of queries with the
exact bench.py methodology (same session, noop sink, min-of-N).

    python scripts/bench_subset.py name1,name2 [passes]

Prints one JSON line {name: min_sec}. Iteration tool only — the
protocol artifact stays bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from eventstreamer_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("eventstreamer-bench-subset")
    qs = contract.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    contract.entry(spark).limit(1).collect()
    timings: dict[str, float] = {}
    for _ in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_subset:{name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
