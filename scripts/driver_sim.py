"""Simulate the verification driver: plain SparkSession (non-UTC tz),
entry() smoke, then every queries() entry vs its oracle_sql() in
DuckDB at sf0.01. Exact-match compare (floats must be identical after
in-query rounding). Usage:
    python scripts/driver_sim.py [sf_dir] [--only name1,name2]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from eventstreamer_spark.session import TABLES


def main() -> int:
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    # DRIVER_SIM_CORES sizes threads to the heap: a 1 GiB JVM running 8
    # concurrent tasks gives each ~50 MB of execution memory — a
    # misconfiguration at x100 working sets, exactly like an 8-core
    # 1 GiB executor on a real cluster. Cores-per-memory is the FIRST
    # sizing knob a deployment turns; DRIVER_SIM_MEM is the second.
    cores = os.environ.get("DRIVER_SIM_CORES", "8")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
    )
    # The gate runs a PLAIN session (default 1g heap) at sf0.01 —
    # keep that fidelity by default. For correctness runs against the
    # x10/x100 scale replicas (SCALING.md), the heap must scale with
    # the data like any real deployment: opt in via DRIVER_SIM_MEM=8g.
    mem = os.environ.get("DRIVER_SIM_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as c

    if only is None:
        rows = c.entry(spark).collect()
        assert len(rows) > 0, "entry() returned no rows"
        print(f"entry: {len(rows)} rows OK")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs, osql = c.queries(), c.oracle_sql()
    if only is not None:
        unknown = only - set(qs)
        assert not unknown, f"unknown queries: {unknown}"
        qs = {n: f for n, f in qs.items() if n in only}
    failed = []
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            sp = qs[name](spark, sf).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {e}")
            failed.append(name)
            continue
        if name not in osql:
            print(f"ok   {name}: rows-only, {len(sp)} rows ({time.perf_counter()-t0:.1f}s)")
            continue
        du = con.execute(osql[name]).fetchdf()
        cols = sorted(sp.columns)
        if cols != sorted(du.columns):
            print(f"FAIL {name}: schema spark={cols} oracle={sorted(du.columns)}")
            failed.append(name)
            continue
        if len(sp) != len(du):
            print(f"FAIL {name}: rows spark={len(sp)} oracle={len(du)}")
            failed.append(name)
            continue
        sp = sp[cols].sort_values(cols, ignore_index=True)
        du = du[cols].sort_values(cols, ignore_index=True)
        mism = 0
        for cn in cols:
            for a, b in zip(sp[cn].tolist(), du[cn].tolist()):
                if isinstance(a, float) and isinstance(b, float):
                    if not (
                        a == b
                        or (math.isnan(a) and math.isnan(b))
                        or math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)
                    ):
                        mism += 1
                elif str(a) != str(b):
                    mism += 1
        status = "ok  " if mism == 0 else "FAIL"
        if mism:
            failed.append(name)
        print(f"{status} {name}: rows={len(sp)} mismatches={mism} ({time.perf_counter()-t0:.1f}s)")

    print(f"\n{len(qs) - len(failed)}/{len(qs)} queries pass")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
