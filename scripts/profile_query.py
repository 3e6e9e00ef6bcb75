#!/usr/bin/env python
"""Per-query profiling probe (optimization round): run one or more
declared queries through the noop sink with warm memos and report
wall-clock plus the Spark job list (count, per-job duration) so the
fixed-cost structure (job launches, broadcast builds, barriers) is a
number instead of a guess.

Usage: python scripts/profile_query.py <name> [<name> ...] [--passes N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_hits_spark import queries as q
from bigdata_hits_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 3
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    if not args:
        print("usage: profile_query.py <name> [...]", file=sys.stderr)
        sys.exit(2)
    tracker = spark.sparkContext.statusTracker()
    for name in args:
        fn = registry[name]
        for p in range(passes):
            jobs_before = set(tracker.getJobIdsForGroup(None) or [])
            spark.sparkContext.setJobDescription(f"{name} pass {p}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            jobs_after = set(tracker.getJobIdsForGroup(None) or [])
            new_jobs = sorted(jobs_after - jobs_before)
            print(f"== {name} pass {p}: {wall:.3f}s, {len(new_jobs)} jobs")
            if p == passes - 1:
                for j in new_jobs:
                    info = tracker.getJobInfo(j)
                    if info is None:
                        continue
                    stages = []
                    for sid in info.stageIds:
                        si = tracker.getStageInfo(sid)
                        if si:
                            stages.append(f"s{sid}:{si.numTasks}t")
                    print(f"   job {j} [{info.status}] stages={' '.join(stages)}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
