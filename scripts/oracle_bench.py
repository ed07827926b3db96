"""Time the DuckDB oracle suite — the baseline bench.py is compared
against. Prints one JSON line {"total_sec": ..., "queries": {...}},
mirroring bench.py's protocol (min of 3 passes per query) so
per-query Spark/DuckDB ratios are an apples-to-apples read:

    python scripts/oracle_bench.py [sf_dir]

Rows-only queries (no oracle) are skipped — compare those against
BENCH history instead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from eventstreamer_spark import registry
from eventstreamer_spark.session import TABLES

PASSES = 3


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import __spark_entry__  # noqa: F401  (populates the registry)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    timings: dict[str, float] = {}
    for name, sql in sorted(registry.oracle_sql().items()):
        best = float("inf")
        for _ in range(PASSES):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(
        json.dumps(
            {
                "metric": "oracle_total_sec",
                "value": round(sum(timings.values()), 2),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
