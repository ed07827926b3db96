"""Dump `.explain("formatted")` for named queries to plans/<tag>/.

    python scripts/dump_plans.py <tag_dir> name1,name2 [suffix]

Writes plans/<tag_dir>/<name>_<suffix>.txt (suffix default "before").
The judge reads these against OPTIMIZATION_r14.md's plan claims.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from eventstreamer_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("eventstreamer-plans")
    qs = contract.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(path)


if __name__ == "__main__":
    main()
