#!/usr/bin/env python
"""Derive a larger scale factor from the driver-generated sf0.1 parquet
(VERDICT r6 #6: one recorded run above sf0.1).

The driver ships sf{0.001,0.01,0.1} only; this replicates sf0.1
``--factor`` times (default 10 -> "sf1") with KEY OFFSETS that preserve
referential integrity — copy ``i`` shifts every entity key by
``i * (max_key + 1)`` consistently across fact and entity tables, so
orders still join customers, lineitem still joins part/supplier/orders,
and embeddings still align with documents.  Dimension tables (region,
nation) keep their real-world cardinality, exactly as TPC-H scaling
does.  Document text gets a per-copy suffix token so the corpus scales
as NEAR-duplicates (realistic dedup pressure) instead of 10 exact
copies of every doc; n_chars is recomputed.

Output is for SCALE SMOKES only (plans, skew, memory) — correctness
oracles stay on the driver's own parquet.

Usage: python scripts/make_scale_data.py [--factor N] [--out DIR]
       (default out: /root/repo/.scale/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_hits_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


def main() -> None:
    factor = 10
    if "--factor" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--factor") + 1])
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scale", "sf1")
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    os.makedirs(out, exist_ok=True)
    spark = get_spark("make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")

    def rd(t):
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    def copies(df):
        return df.withColumn(
            "__i", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
        )

    def span(df, col):
        return df.agg(F.max(col)).first()[0] + 1

    cust, supp, part, orders, li = (
        rd("customer"), rd("supplier"), rd("part"), rd("orders"), rd("lineitem")
    )
    ev, docs, emb = rd("events"), rd("documents"), rd("embeddings")
    C, S, P, O = span(cust, "c_custkey"), span(supp, "s_suppkey"), \
        span(part, "p_partkey"), span(orders, "o_orderkey")
    E, U, D = span(ev, "event_id"), span(ev, "user_id"), span(docs, "doc_id")

    def wr(df, t, parts=8):
        df.repartition(parts).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"wrote {t}", file=sys.stderr)

    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)
    wr(copies(cust).withColumn(
        "c_custkey", F.col("c_custkey") + F.col("__i") * C).drop("__i"), "customer")
    wr(copies(supp).withColumn(
        "s_suppkey", F.col("s_suppkey") + F.col("__i") * S).drop("__i"), "supplier")
    wr(copies(part).withColumn(
        "p_partkey", F.col("p_partkey") + F.col("__i") * P).drop("__i"), "part")
    wr(
        copies(orders)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__i") * O)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("__i") * C)
        .drop("__i"),
        "orders",
    )
    wr(
        copies(li)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__i") * O)
        .withColumn("l_partkey", F.col("l_partkey") + F.col("__i") * P)
        .withColumn("l_suppkey", F.col("l_suppkey") + F.col("__i") * S)
        .drop("__i"),
        "lineitem",
        16,
    )
    wr(
        copies(ev)
        .withColumn("event_id", F.col("event_id") + F.col("__i") * E)
        .withColumn("user_id", F.col("user_id") + F.col("__i") * U)
        .drop("__i"),
        "events",
        16,
    )
    scaled_docs = (
        copies(docs)
        .withColumn(
            "text",
            F.when(F.col("__i") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" v"), F.col("__i").cast("string"))
            ),
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("__i") * D)
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("__i")
    )
    wr(scaled_docs, "documents")
    wr(copies(emb).withColumn(
        "vec_id", F.col("vec_id") + F.col("__i") * D).drop("__i"), "embeddings")
    spark.stop()


if __name__ == "__main__":
    main()
