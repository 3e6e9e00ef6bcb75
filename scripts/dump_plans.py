#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for declared queries to files.

Usage: python scripts/dump_plans.py --out plans/r13 --suffix _before <name> [...]

Writes ``<out>/<name><suffix>.txt`` for each query (the optimization-round
evidence contract: the judge checks plan claims against these files).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_hits_spark import queries as q
from bigdata_hits_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]
    out_dir = "plans/r13"
    suffix = ""
    if "--out" in argv:
        i = argv.index("--out")
        out_dir = argv[i + 1]
        del argv[i : i + 2]
    if "--suffix" in argv:
        i = argv.index("--suffix")
        suffix = argv[i + 1]
        del argv[i : i + 2]
    names = argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
