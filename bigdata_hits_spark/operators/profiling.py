"""Table profiling: the one-pass "ANALYZE" a pipeline runs before and
after every curation stage (did dedup drop the nulls? did the join
explode a column's cardinality?).

Beyond-reference breadth (the reference has no profiling surface); the
operator is a single wide aggregation whose output is COLUMN-count-sized
— the only driver-facing data is one row per column, at any input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def profile_table(df: DataFrame, exact_distinct: bool = False) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value): one
    row per input column, values rendered as strings so heterogeneous
    column types share one schema.

    ``exact_distinct=False`` (default, the 100 TB mode) uses
    ``approx_count_distinct`` (HLL++, one pass, no expand).  ``True``
    computes exact distincts — Spark plans multiple COUNT(DISTINCT) via
    an Expand (rows × columns before the partial agg), which is the
    honest cost of exactness; use it on samples or when the gate needs
    bit-reproducible numbers (the declared oracle query does).

    Min/max order strings lexicographically on both engines for string
    columns and numerically otherwise; the rendered value is the
    engine-portable ``CAST(x AS STRING)`` of the typed extremum.
    """
    distinct = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = []
    for c in df.columns:
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            distinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__rows_{c}").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in df.columns
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def histogram(df: DataFrame, col: str, bins: int = 20, digits: int = 6) -> DataFrame:
    """(bucket, lo, hi, cnt): equi-width histogram of a numeric column —
    the distribution-shape profile behind skew triage, outlier gates,
    and range-join bin sizing.  Every bucket appears, empty ones with
    cnt 0; NULLs are excluded (they are `profile_table`'s n_nulls, not a
    distribution point); values at the maximum clamp into the top bucket
    (standard closed-top-bucket convention).

    Fully in-plan: one (min, max) aggregate row broadcast-attached (the
    engine's one-row scalar pattern, no driver round-trip), one hash-agg
    on the bucket id, and a bounded ``sequence`` explode of the bucket
    ids off the bounds row so empty buckets materialize without a
    data-sized join.  A constant column (max <= min) degenerates to one
    bucket of width 1."""
    if bins <= 0:
        raise ValueError(f"histogram needs bins >= 1, got {bins}")
    x = F.col(col).cast("double")
    bounds = df.agg(
        F.min(x).alias("__mn"), F.max(x).alias("__mx")
    ).select(
        "__mn",
        F.when(F.col("__mx") > F.col("__mn"), (F.col("__mx") - F.col("__mn")) / bins)
        .otherwise(F.lit(1.0))
        .alias("__w"),
    )
    counts = (
        df.filter(x.isNotNull())
        .crossJoin(F.broadcast(bounds))
        .groupBy(
            F.least(
                F.floor((x - F.col("__mn")) / F.col("__w")).cast("long"),
                F.lit(bins - 1),
            ).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grid = bounds.select(
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(bins - 1).cast("long"))).alias(
            "bucket"
        ),
        "__mn",
        "__w",
    )
    return (
        grid.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.round(F.col("__mn") + F.col("bucket") * F.col("__w"), digits).alias("lo"),
            F.round(F.col("__mn") + (F.col("bucket") + 1) * F.col("__w"), digits).alias(
                "hi"
            ),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )


def skew_report(df: DataFrame, cols: list[str], k: int = 20) -> DataFrame:
    """(column, key, cnt, share, rank): the ``k`` heaviest values of each
    candidate join/group key with their row shares — the diagnosis you
    run BEFORE choosing a shuffle strategy.  A top key holding >1% of a
    100 TB table is the hot partition that stalls a plain hash shuffle;
    this report is what says "salt this key" (cap_per_group's two-phase
    pattern), "broadcast that side", or "let AQE's skew split handle
    it".

    One hash-agg per column (map-side combined) + a
    TakeOrderedAndProject top-k on the aggregate (per-partition heaps,
    driver merges k rows — NO global sort even when the key is
    near-unique and the aggregate row-sized); the total-row scalar
    attaches in-plan via the engine's one-row broadcast, and the rank
    window runs over the k already-taken rows only.  Keys are
    stringified so one report frame covers heterogeneous column types;
    NULL keys report as the literal 'NULL' bucket (a null-heavy join
    key is the classic skew culprit and must not vanish from the
    report).
    """
    if not cols:
        raise ValueError("skew_report needs at least one column")
    total = df.agg(F.count(F.lit(1)).alias("__N"))
    parts = []
    for c in cols:
        counts = (
            df.groupBy(F.coalesce(F.col(c).cast("string"), F.lit("NULL")).alias("key"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        topk = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(k)
        w = Window.orderBy(F.desc("cnt"), F.asc("key"))  # over <= k rows
        topk = topk.withColumn("rank", F.row_number().over(w)).withColumn(
            "column", F.lit(c)
        )
        parts.append(topk)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("cnt") / F.col("__N"))
        .select("column", "key", "cnt", F.round("share", 6).alias("share"), "rank")
    )
