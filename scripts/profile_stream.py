"""Profile a streaming gate query's trigger timeline (VERDICT r14
item 3): capture every micro-batch's ``durationMs`` breakdown
(addBatch / getBatch / latestOffset / queryPlanning / walCommit /
commitOffsets / triggerExecution) and state-store commit metrics from
the StreamingQueryProgress objects the gate runner already collects,
plus the wall-clock split construct-vs-stream-vs-readback.

    python scripts/profile_stream.py stream_tumbling_stats [passes]

The goal is attribution: is the ~1-3 s/gate floor state-store commit,
planning, source listing, or sink write?
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
import eventstreamer_spark.streaming.pipeline as P  # noqa: E402
from eventstreamer_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("eventstreamer-stream-profile")
    qs = contract.queries()
    contract.entry(spark).limit(1).collect()

    captured: list[list[dict]] = []
    orig = P._run_gate_stream

    def wrap(df, start, nodata_batches=False):
        t0 = time.perf_counter()
        pr = orig(df, start, nodata_batches)
        captured.append(
            [{"_gate_wall_s": round(time.perf_counter() - t0, 3)}] + list(pr)
        )
        return pr

    P._run_gate_stream = wrap
    try:
        for name in names:
            for p in range(passes):
                captured.clear()
                spark.sparkContext.setJobDescription(f"stream-profile:{name}")
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                print(
                    f"\n=== {name} pass {p}: construct={t1 - t0:.3f}s "
                    f"(incl. stream run) readback+noop={t2 - t1:.3f}s "
                    f"total={t2 - t0:.3f}s"
                )
                for runs in captured:
                    print(f"  gate run wall: {runs[0]['_gate_wall_s']}s")
                    for prog in runs[1:]:
                        dm = prog.get("durationMs", {})
                        so = prog.get("stateOperators", [])
                        state = [
                            {
                                k: op.get(k)
                                for k in (
                                    "operatorName",
                                    "commitTimeMs",
                                    "stateMemory",
                                    "numRowsTotal",
                                )
                                if k in op
                            }
                            for op in so
                        ]
                        print(
                            f"    batch {prog.get('batchId')}: "
                            f"rows={prog.get('numInputRows')} "
                            f"durationMs={json.dumps(dm, sort_keys=True)}"
                        )
                        if state:
                            print(f"      state={json.dumps(state)}")
    finally:
        P._run_gate_stream = orig


if __name__ == "__main__":
    main()
