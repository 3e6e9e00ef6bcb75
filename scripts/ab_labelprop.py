#!/usr/bin/env python
"""Interleaved A/B: label propagation on string node ids (production,
operators/graphalgs.py label_propagation) vs an ORDER-PRESERVING long
encoding (VERDICT r4 item 4 — the treatment that took triangles
10.9s -> 3.6s, adapted for LP's semantics).

xxhash64 encoding — the triangles treatment — is NOT semantics-safe
here: LP's deterministic tiebreak picks the MINIMUM label among
equally-frequent neighbors, and hashing permutes the label order, so
frequency ties resolve differently.  The order-preserving alternative
ranks node ids once (global_rank over the node dim — node-sized) and
encodes (a, b) through that bijection: min-of-mode over ranks selects
exactly the rank of the string-min label, so decoded results are
IDENTICAL — asserted below before any timing.

A reference "xxh" variant is timed as the encode-cost-free long-key
ceiling (its results are NOT compared: different tie resolution).

Usage: python scripts/ab_labelprop.py [--sf DIR] [--pressure] [--k K]
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
from bigdata_hits_spark.operators.ranks import global_rank
from bigdata_hits_spark.plans.iterate import materialize
from bigdata_hits_spark.session import get_spark
from bigdata_hits_spark.sources import derived


def _lp_loop(sym, labels, k):
    """The production round body, verbatim (long or string ids)."""
    for i in range(k):
        nbr = (
            sym.join(labels, sym["b"] == labels["id"])
            .select(F.col("a").alias("id"), "community")
            .groupBy("id", "community")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
        labels = (
            nbr.groupBy("id")
            .agg(
                F.min(
                    F.struct(
                        (F.lit(0) - F.col("freq")).alias("neg_freq"),
                        F.col("community").alias("community"),
                    )
                ).alias("best")
            )
            .select("id", F.col("best.community").alias("community"))
        )
        if (i + 1) % _LP_CHECKPOINT_EVERY == 0 and (i + 1) < k:
            labels = labels.localCheckpoint(eager=False)
    return labels


def lp_rank_encoded(sym, k, num_buckets=32):
    """Order-preserving long encoding: rank node ids once (node-sized),
    encode the pinned edge relation through the bijection, run the loop
    on longs, decode id AND community at the end (two node-sized joins)."""
    nodes = sym.select(F.col("a").alias("id")).distinct()
    nmap = materialize(
        global_rank(nodes, [F.asc("id")], rank_col="nid", num_buckets=num_buckets)
    )
    enc = materialize(
        sym.join(nmap.select(F.col("id").alias("a"), F.col("nid").alias("na")), "a")
        .join(nmap.select(F.col("id").alias("b"), F.col("nid").alias("nb")), "b")
        .select(F.col("na").alias("a"), F.col("nb").alias("b"))
        .repartition("b")
    )
    labels = enc.select(F.col("a").alias("id")).distinct().withColumn(
        "community", F.col("id")
    )
    out = _lp_loop(enc, labels, k)
    dec_id = nmap.select(F.col("nid").alias("id"), F.col("id").alias("__sid"))
    dec_comm = nmap.select(
        F.col("nid").alias("community"), F.col("id").alias("__scomm")
    )
    return (
        out.join(dec_id, "id")
        .join(dec_comm, "community")
        .select(F.col("__sid").alias("id"), F.col("__scomm").alias("community"))
    )


def lp_xxh(sym, k):
    """xxhash64 encoding — long-key ceiling, NOT semantics-equivalent."""
    enc = materialize(
        sym.select(F.xxhash64("a").alias("a"), F.xxhash64("b").alias("b")).repartition(
            "b"
        )
    )
    labels = enc.select(F.col("a").alias("id")).distinct().withColumn(
        "community", F.col("id")
    )
    return _lp_loop(enc, labels, k)


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    k = 3
    if "--k" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k") + 1])
    spark = get_spark("ab-labelprop")
    spark.sparkContext.setLogLevel("ERROR")
    if "--pressure" in sys.argv:
        junk = []
        for i in range(40):
            df = (
                spark.read.parquet(f"{sf_dir}/lineitem.parquet")
                .select("l_orderkey", "l_partkey", "l_quantity")
                .withColumn("j", F.lit(i))
                .persist()
            )
            df.count()
            junk.append(df)
    g = derived.g_pp(spark, sf_dir)
    sym = materialize(symmetric_edges(g.edges).repartition("b"))

    a = (
        label_propagation(g.edges, k=k, sym=sym)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    b = lp_rank_encoded(sym, k).toPandas().sort_values("id").reset_index(drop=True)
    same = a.equals(b)
    print(f"results equal (string vs rank-encoded): {same} ({len(a)} rows)", file=sys.stderr)
    if not same:
        merged = a.merge(b, on="id", suffixes=("_str", "_rank"))
        print(
            merged[merged.community_str != merged.community_rank].head(20),
            file=sys.stderr,
        )
        sys.exit(1)

    variants = {
        "string": lambda: label_propagation(g.edges, k=k, sym=sym),
        "rank": lambda: lp_rank_encoded(sym, k),
        "xxh": lambda: lp_xxh(sym, k),
    }
    times: dict[str, list[float]] = {v: [] for v in variants}
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
