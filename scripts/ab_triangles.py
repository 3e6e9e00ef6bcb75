#!/usr/bin/env python
"""Interleaved A/B: wedge-join triangle counting (current) vs grouped
adjacency arrays + array_intersect (VERDICT r3 item 4).

Measured at sf0.1 (min of 3 interleaved passes, identical results on all
20,000 nodes): wedge 6.48s vs adj 4.45s (-31%) — the adj plan was
promoted into graphalgs.triangle_counts; the wedge form lives on here as
the counterfactual.

Method mirrors the ranking.py:227-238 A/B discipline: same session, same
pinned symmetric edge set, alternating passes, min-of-3 per variant,
plus a one-shot result-equality check first.

Usage: python scripts/ab_triangles.py [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_hits_spark.operators.graphalgs import (
    symmetric_edges,
    triangle_counts,
)
from bigdata_hits_spark.plans.iterate import materialize
from bigdata_hits_spark.session import get_spark
from bigdata_hits_spark.sources import derived


def triangle_counts_wedge(sym):
    """The PREVIOUS production plan, kept here as the A/B counterfactual:
    wedge enumeration by self-join on the pivot + semi-join close against
    the oriented set (replaced in graphalgs.py by array_intersect after
    this script measured -31%)."""
    deg = sym.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    oriented = (
        sym.join(da, "a")
        .join(db, "b")
        .filter(
            (F.col("deg_a") < F.col("deg_b"))
            | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b")))
        )
        .select(F.col("a").alias("lo"), F.col("b").alias("hi"), F.col("deg_b").alias("deg_hi"))
    )
    e1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"), F.col("deg_hi").alias("dv"))
    e2 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w"), F.col("deg_hi").alias("dw"))
    wedges = (
        e1.join(e2, "u")
        .filter(
            (F.col("dv") < F.col("dw"))
            | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
        )
        .select("u", "v", "w")
    )
    closing = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    triangles = wedges.join(closing, ["v", "w"], "left_semi").select("u", "v", "w")
    per_node = (
        triangles.select(F.col("u").alias("id"))
        .unionByName(triangles.select(F.col("v").alias("id")))
        .unionByName(triangles.select(F.col("w").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    nodes = sym.select(F.col("a").alias("id")).distinct()
    return nodes.join(per_node, "id", "left").select(
        "id", F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles")
    )


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark("ab-triangles")
    spark.sparkContext.setLogLevel("ERROR")
    g = derived.g_pp(spark, sf_dir)
    sym = materialize(symmetric_edges(g.edges).repartition("b"))

    # equality check first (full collect-and-compare at this SF)
    a = triangle_counts_wedge(sym).toPandas().sort_values("id").reset_index(drop=True)
    b = triangle_counts(g.edges, sym=sym).toPandas().sort_values("id").reset_index(drop=True)
    same = a.equals(b.astype(a.dtypes.to_dict()))
    print(f"results equal: {same} ({len(a)} rows)", file=sys.stderr)
    if not same:
        merged = a.merge(b, on="id", suffixes=("_wedge", "_adj"))
        diff = merged[merged.triangles_wedge != merged.triangles_adj]
        print(diff.head(20), file=sys.stderr)
        sys.exit(1)

    variants = {
        "wedge": lambda: triangle_counts_wedge(sym),
        "adj": lambda: triangle_counts(g.edges, sym=sym),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _pass in range(3):
        for name, fn in variants.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            times[name].append(dt)
            print(f"pass {_pass} {name}: {dt}", file=sys.stderr)
    for name, ts in times.items():
        print(f"{name}: min={min(ts)} all={ts}")
    spark.stop()


if __name__ == "__main__":
    main()
