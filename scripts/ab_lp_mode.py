#!/usr/bin/env python
"""Interleaved A/B: the label-propagation ROUND BODY's two-stage mode
(groupBy(id, community) count -> per-id min(-freq, community) struct —
the production body, operators/graphalgs.py) vs a FUSED single
aggregate ``F.mode(community, deterministic=True)`` (VERDICT r5 item 5).

Spark's deterministic mode returns the LOWEST value among the
most-frequent — exactly the loop's min-of-mode tiebreak — as one
TypedImperativeAggregate (ObjectHashAggregate, per-id open-hash-map
buffer, partial-merge capable).  Fusing replaces two hash-agg exchanges
per round ((id, community)-keyed then id-keyed) with ONE id-keyed
exchange whose buffers carry the per-community counts.

Equality is asserted before any timing (both tiebreaks are min-of-mode
by construction).  Timed on the two production arms: k=3 string-keyed
and k=6 rank-encoded (the bench's two most expensive entries).

Usage: python scripts/ab_lp_mode.py [--sf DIR] [--k K] [--passes N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_hits_spark.operators.graphalgs import (
    _LP_CHECKPOINT_EVERY,
    label_propagation,
    symmetric_edges,
)
from bigdata_hits_spark.plans.iterate import materialize
from bigdata_hits_spark.session import get_spark
from bigdata_hits_spark.sources import derived


def lp_fused_mode(sym, k, encode):
    """label_propagation with the round body's two hash-aggs fused into
    one deterministic-mode aggregate; encode arm copies the production
    rank-encoding wrapper."""
    if encode:
        from bigdata_hits_spark.operators.ranks import global_rank

        nodes = sym.select(F.col("a").alias("id")).distinct()
        nmap = materialize(global_rank(nodes, [F.asc("id")], rank_col="nid"))
        work = materialize(
            sym.join(nmap.select(F.col("id").alias("a"), F.col("nid").alias("na")), "a")
            .join(nmap.select(F.col("id").alias("b"), F.col("nid").alias("nb")), "b")
            .select(F.col("na").alias("a"), F.col("nb").alias("b"))
            .repartition("b")
        )
    else:
        work = sym
    labels = work.select(F.col("a").alias("id")).distinct().withColumn(
        "community", F.col("id")
    )
    for i in range(k):
        labels = (
            work.join(labels, work["b"] == labels["id"])
            .select(F.col("a").alias("id"), "community")
            .groupBy("id")
            .agg(F.mode("community", True).alias("community"))
        )
        if (i + 1) % _LP_CHECKPOINT_EVERY == 0 and (i + 1) < k:
            labels = labels.localCheckpoint(eager=False)
    if encode:
        dec_id = nmap.select(F.col("nid").alias("id"), F.col("id").alias("__sid"))
        dec_comm = nmap.select(
            F.col("nid").alias("community"), F.col("id").alias("__scomm")
        )
        labels = (
            labels.join(dec_id, "id")
            .join(dec_comm, "community")
            .select(F.col("__sid").alias("id"), F.col("__scomm").alias("community"))
        )
    return labels


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    ks = [3, 6]
    if "--k" in sys.argv:
        ks = [int(sys.argv[sys.argv.index("--k") + 1])]
    passes = 3
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    spark = get_spark("ab-lp-mode")
    spark.sparkContext.setLogLevel("ERROR")
    g = derived.g_pp(spark, sf_dir)
    sym = materialize(symmetric_edges(g.edges).repartition("b"))

    for k in ks:
        encode = k >= 4
        a = (
            label_propagation(g.edges, k=k, sym=sym)
            .toPandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        b = (
            lp_fused_mode(sym, k, encode)
            .toPandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        same = a.equals(b)
        print(f"k={k} results equal (two-stage vs fused mode): {same} ({len(a)} rows)",
              file=sys.stderr)
        if not same:
            merged = a.merge(b, on="id", suffixes=("_2s", "_fused"))
            print(merged[merged.community_2s != merged.community_fused].head(20),
                  file=sys.stderr)
            sys.exit(1)

    variants = {}
    for k in ks:
        encode = k >= 4
        variants[f"two_stage_k{k}"] = (
            lambda k=k: label_propagation(g.edges, k=k, sym=sym)
        )
        variants[f"fused_mode_k{k}"] = (
            lambda k=k, encode=encode: lp_fused_mode(sym, k, encode)
        )
    times: dict[str, list[float]] = {v: [] for v in variants}
    for _pass in range(passes):
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
