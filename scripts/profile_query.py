"""Split a query's time into CONSTRUCTION (eager driver-side jobs:
collects, eager checkpoints, gate counts run while building the
DataFrame) vs EXECUTION (the final noop write), min-of-N each.

    python scripts/profile_query.py name1,name2 [passes]

Construction-heavy queries serialize their eager jobs on the driver —
the thread-overlap lever (guide §2.6) applies there; execution-heavy
queries need plan work instead.
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
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("eventstreamer-profile")
    qs = contract.queries()
    contract.entry(spark).limit(1).collect()
    out: dict[str, dict[str, float]] = {}
    for _ in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            rec = out.setdefault(name, {"construct": 1e9, "execute": 1e9, "total": 1e9})
            rec["construct"] = round(min(rec["construct"], t1 - t0), 3)
            rec["execute"] = round(min(rec["execute"], t2 - t1), 3)
            rec["total"] = round(min(rec["total"], t2 - t0), 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
