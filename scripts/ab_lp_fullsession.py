#!/usr/bin/env python
"""Full-session A/B for the label-propagation round body (VERDICT r6 #1).

The round-6 quiet interleaved A/B (scripts/ab_lp_mode.py) had the fused
``F.mode(community, deterministic=True)`` body winning by ~28%, yet BOTH
full-run records regressed 2.2-2.8x — the fused ObjectHashAggregate's
per-group map buffers degrade under a warm ~157-query session's memory
pressure (sort-based fallback past
spark.sql.objectHashAggregate.sortBased.fallbackThreshold=128 groups,
plus old-gen churn) in a way quiet passes never exercise.

This script reproduces the FULL-BENCH regime before timing: it runs one
complete pass over every declared query (the same session pressure the
driver bench applies), then interleaves the two round bodies for
``--passes`` timed passes at k=3 (string) and k=6 (rank-encoded), with a
scan_project micro-canary per pass so host speed is measurable.  Bodies
are selected through the production switch (SPARK_GRAFT_LP_BODY), so
what is timed is exactly what ships.

Usage: python scripts/ab_lp_fullsession.py [--sf DIR] [--passes N]
       [--fallback N]   (also A/B the ObjectHashAggregate fallback
                         threshold for the fused body)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_hits_spark import queries as q
from bigdata_hits_spark.operators import graphalgs
from bigdata_hits_spark.operators.graphalgs import label_propagation, symmetric_edges
from bigdata_hits_spark.plans.iterate import materialize
from bigdata_hits_spark.session import get_spark
from bigdata_hits_spark.sources import derived


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    passes = 3
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    fallback = None
    if "--fallback" in sys.argv:
        fallback = int(sys.argv[sys.argv.index("--fallback") + 1])
    spark = get_spark("ab-lp-fullsession")
    spark.sparkContext.setLogLevel("ERROR")

    registry = q.queries()

    def canary() -> float:
        ts = []
        for _ in range(3):
            t0 = time.time()
            registry["scan_project"](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.time() - t0)
        return round(sorted(ts)[1], 3)

    # --- pressure pass: the whole declared surface, once -----------------
    t0 = time.time()
    for name, fn in registry.items():
        gc.collect()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"pressure pass error in {name}: {e}", file=sys.stderr)
    print(
        f"pressure pass: {len(registry)} queries in {time.time() - t0:.0f}s, "
        f"canary {canary()}",
        file=sys.stderr,
    )

    g = derived.g_pp(spark, sf_dir)
    sym = materialize(symmetric_edges(g.edges).repartition("b"))

    def run(body: str, k: int) -> float:
        os.environ["SPARK_GRAFT_LP_BODY"] = body
        if fallback is not None and body == "fused":
            spark.conf.set(
                "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                str(fallback),
            )
        try:
            t0 = time.time()
            label_propagation(g.edges, k=k, sym=sym).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.time() - t0, 3)
        finally:
            os.environ.pop("SPARK_GRAFT_LP_BODY", None)
            if fallback is not None:
                spark.conf.unset(
                    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
                )

    assert graphalgs._lp_round_body() == "two_stage"
    times: dict[str, list[float]] = {}
    canaries = []
    for p in range(passes):
        canaries.append(canary())
        for body in ("two_stage", "fused"):
            for k in (3, 6):
                dt = run(body, k)
                times.setdefault(f"{body}_k{k}", []).append(dt)
                print(f"pass {p} {body}_k{k}: {dt} (canary {canaries[-1]})",
                      file=sys.stderr)
    summary = {
        name: {"min": min(ts), "all": ts} for name, ts in times.items()
    }
    summary["canary_sec"] = canaries
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
