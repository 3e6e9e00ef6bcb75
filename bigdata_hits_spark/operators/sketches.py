"""Bounded-memory sketch operators beyond Spark's built-ins.

Spark ships HLL++ (approx_count_distinct) and KLL-ish quantiles
(approx_percentile) — both declared rows-only in queries.py with their
accuracy floors pytest-enforced (tests/test_sketches.py).  This module
adds the third classic: MISRA-GRIES heavy hitters, for the regime where
even the DISTINCT vocabulary is too large to hash-aggregate (open-web
token/URL/user-agent streams at 100 TB) — exact top-k via groupBy is
the right plan until the distinct key set itself stops fitting the
aggregation; past that point memory must be bounded BY CONSTRUCTION.

Mergeability: Misra-Gries summaries merge by counter addition followed
by subtracting the (capacity+1)-th largest counter from all and keeping
the positive ones (Agarwal et al., "Mergeable Summaries", PODS'12 —
public literature).  Each subtraction step charges >= capacity+1 source
rows, so the TOTAL undercount after any merge tree is <= n/(capacity+1)
— the summaries are safe to build per Arrow batch, per partition, and
merge with a plain hash agg, which is exactly the shape below.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _mg_add(counters: dict, vc: "pd.Series", capacity: int) -> dict:
    """Merge a value->count batch into an MG summary of size <= capacity."""
    for v, n in vc.items():
        counters[v] = counters.get(v, 0) + int(n)
    if len(counters) > capacity:
        # subtract the (capacity+1)-th largest from everyone; keep > 0
        cut = sorted(counters.values(), reverse=True)[capacity]
        counters = {v: c - cut for v, c in counters.items() if c > cut}
    return counters


def freq_items_sketch(
    df: DataFrame, col: str, k: int = 20, capacity: int | None = None
) -> DataFrame:
    """Top-``k`` heavy-hitter candidates of ``col`` with deterministic
    count BOUNDS: ``(value, min_count, max_count)`` where ``min_count <=
    true frequency <= max_count`` always, and every value with true
    frequency > n/(capacity+1) is GUARANTEED to be a candidate (the
    Misra-Gries invariant) — the bounded-memory answer to "what are the
    hottest values" when the distinct vocabulary itself cannot be
    aggregated.

    Plan: one ``mapInPandas`` pass keeps an MG summary of at most
    ``capacity`` counters per task (Arrow-batched ``value_counts``
    feeding the mergeable-summaries add/subtract step — never a per-row
    Python loop), emitting <= capacity candidate rows per partition;
    one vocabulary-INDEPENDENT hash agg merges them (counter addition
    is the proven merge); ``max_count`` adds the total undercount bound
    n/(capacity+1) from a one-row count attach.  Memory is O(capacity)
    per task and the shuffle carries O(partitions x capacity) rows, no
    matter how many distinct values exist.

    Candidate WEIGHTS (and which near-threshold values surface) depend
    on row-to-partition placement, so the operator is declared
    rows-only; the invariants above are what tests enforce.  NULLs
    carry no identity and are dropped.  ``capacity`` defaults to 8k —
    at most a 12.5%-of-n undercount; raise it for tighter bounds."""
    cap = capacity or 8 * k
    if cap < k:
        raise ValueError(f"capacity {cap} < k {k}")

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            s = pdf["__v"].dropna()
            if len(s):
                counters = _mg_add(counters, s.value_counts(), cap)
        yield pd.DataFrame(
            {"value": list(counters.keys()), "weight": list(counters.values())}
        )

    cand = df.select(F.col(col).cast("string").alias("__v")).mapInPandas(
        mg, "value string, weight long"
    )
    merged = cand.groupBy("value").agg(F.sum("weight").alias("min_count"))
    n = df.filter(F.col(col).isNotNull()).agg(F.count(F.lit(1)).alias("__n"))
    return (
        merged.crossJoin(F.broadcast(n))
        .select(
            "value",
            "min_count",
            (F.col("min_count") + F.floor(F.col("__n") / (cap + 1))).alias(
                "max_count"
            ),
        )
        .orderBy(F.desc("min_count"), F.asc("value"))
        .limit(k)
    )
