"""Bin-bucketed range join: non-equi interval containment as an equi-join.

``probe.value BETWEEN interval.lo AND interval.hi`` with NO shared equi
key is a join shape open-source Spark has no good physical plan for —
Catalyst's only options are CartesianProduct or BroadcastNestedLoopJoin,
both O(|probe| x |intervals|) compares and the second also capped by the
broadcast size.  The standard scale technique (bin bucketing, as in
Databricks' range-join optimization and the interval-join literature) is
implemented here as plain DataFrame code:

1. pick a bin width ``w`` and overlay a uniform grid over the value
   domain;
2. each interval replicates to every grid bin it overlaps
   (``explode(sequence(floor(lo/w), floor(hi/w)))`` — replication factor
   = interval span / w, bounded by ``max_bins_per_interval``);
3. each probe row maps to exactly ONE bin (``floor(value/w)``);
4. equi-join on the bin id, then the exact BETWEEN predicate filters the
   false candidates within the bin.

Because a probe value lands in exactly one bin and an interval appears
at most once per bin, every true (probe, interval) pair is produced
EXACTLY once — no dedup pass.  Cost is O(candidates) where candidates
are pairs sharing a bin: a shuffle-balanced equi-join Catalyst/AQE plan
like any other, instead of an n^2 compare loop.  Choosing ``w`` near the
typical interval span keeps replication ~O(1) per interval while keeping
bins selective.

No reference counterpart (the reference joins only on node-id equality);
this generalizes the engine's join surface the same way the as-of join
(operators/asof.py) does for time alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Default ceiling on grid bins per interval: past this, the chosen bin
#: width is so far below the interval span that the explode itself
#: becomes the blow-up.  The guard is enforced lazily INSIDE the plan
#: (raise_error), so no extra driver action is spent validating.
MAX_BINS_PER_INTERVAL = 10_000


def range_join_bins(
    probe: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    max_bins_per_interval: int = MAX_BINS_PER_INTERVAL,
) -> DataFrame:
    """Inner-join ``probe`` rows to every ``intervals`` row whose
    ``[lo_col, hi_col]`` (both ends inclusive) contains ``value_col``.

    ``probe`` and ``intervals`` must have disjoint column names apart
    from the three named ones (rename upstream otherwise); the output
    carries all columns of both sides.  Intervals with ``lo > hi`` and
    rows with NULL bounds/values are rejected in-plan (``raise_error``)
    rather than silently dropped — an inverted interval under
    ``sequence`` would otherwise explode a DESCENDING bin range and
    produce garbage candidates.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    w = F.lit(float(bin_width))
    lo, hi, val = F.col(lo_col), F.col(hi_col), F.col(value_col)

    lo_bin = F.floor(lo / w).cast("long")
    hi_bin = F.floor(hi / w).cast("long")
    n_bins = hi_bin - lo_bin + F.lit(1)
    checked_hi_bin = (
        F.when(lo.isNull() | hi.isNull(), F.raise_error(F.lit("range_join_bins: NULL interval bound")))
        .when(lo > hi, F.raise_error(F.lit("range_join_bins: interval with lo > hi")))
        .when(
            n_bins > max_bins_per_interval,
            F.raise_error(
                F.lit(
                    "range_join_bins: interval spans more than "
                    f"{max_bins_per_interval} bins — raise bin_width"
                )
            ),
        )
        .otherwise(hi_bin)
    )
    binned_intervals = intervals.withColumn(
        "__bin", F.explode(F.sequence(lo_bin, checked_hi_bin))
    )
    binned_probe = probe.withColumn(
        "__bin",
        F.when(val.isNull(), F.raise_error(F.lit("range_join_bins: NULL probe value")))
        .otherwise(F.floor(val / w).cast("long")),
    )
    return (
        binned_probe.join(binned_intervals, "__bin")
        .filter(val.between(lo, hi))
        .drop("__bin")
    )


def interval_count_sweep(
    probe: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    count_col: str = "n_intervals",
    num_buckets: int | None = None,
) -> DataFrame:
    """For each ``probe`` row, the NUMBER of ``intervals`` rows whose
    ``[lo, hi]`` (inclusive) contains ``value_col`` — without
    materializing a single (probe, interval) pair.

    :func:`range_join_bins` is the right tool when the pairs themselves
    are needed; when only the count is (density/typicality/coverage
    scoring), pair output is pure waste — candidate volume grows with
    interval width times probe density, O(n^2)-ish for wide intervals.
    The classic sweep-line turns counting into order statistics:

        contains(p) = #{lo <= p} - #{hi < p}

    so one sorted pass over the union of (lo, probe, hi) events with two
    running counters answers every probe at once, O(n log n) total and
    ZERO dependence on interval width.  Distributed exactly like the
    rank operators (operators/ranks.py): range-partition the event
    stream on (value, event-type), per-bucket event counts roll into
    prefix offsets, bucket-local window sums finish the counters.  Ties
    resolve by the event-type sort key — lo events sort BEFORE probes at
    an equal value (<= is inclusive), hi events AFTER (< is strict) —
    and running SUMS are additive, so unlike rank peer groups nothing
    breaks when equal values straddle a bucket boundary.  The
    event-stream evaluation is pinned (same reason as
    ``ranks._ranged_pinned``).

    Probe rows contained by nothing return 0 (an inner pair join drops
    them — filter ``count > 0`` for that semantics).  NULL values/bounds
    and inverted intervals are rejected in-plan like range_join_bins.
    """
    from pyspark.sql import Window

    reserved = {"__v", "__t", "__pid", count_col}
    clash = reserved & set(probe.columns)
    if clash:
        raise ValueError(f"probe columns collide with sweep internals: {sorted(clash)}")
    spark = probe.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    lo, hi, val = F.col(lo_col), F.col(hi_col), F.col(value_col)
    checked_lo = (
        F.when(lo.isNull() | hi.isNull(), F.raise_error(F.lit("interval_count_sweep: NULL interval bound")))
        .when(lo > hi, F.raise_error(F.lit("interval_count_sweep: interval with lo > hi")))
        .otherwise(lo)
    )
    checked_val = F.when(
        val.isNull(), F.raise_error(F.lit("interval_count_sweep: NULL probe value"))
    ).otherwise(val)
    probe_cols = probe.columns
    null_probe = [F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols]
    starts = intervals.select(
        checked_lo.cast("double").alias("__v"), F.lit(0).alias("__t"), *null_probe
    )
    probes = probe.select(
        checked_val.cast("double").alias("__v"), F.lit(1).alias("__t"), *probe_cols
    )
    ends = intervals.select(
        hi.cast("double").alias("__v"), F.lit(2).alias("__t"), *null_probe
    )
    events = (
        starts.unionByName(probes)
        .unionByName(ends)
        .repartitionByRange(num_buckets, F.asc("__v"), F.asc("__t"))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = events.groupBy("__pid").agg(
        F.sum((F.col("__t") == 0).cast("long")).alias("__a"),
        F.sum((F.col("__t") == 2).cast("long")).alias("__b"),
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__a").over(w_off), F.lit(0)).alias("__a_off"),
        F.coalesce(F.sum("__b").over(w_off), F.lit(0)).alias("__b_off"),
    )
    w_run = (
        Window.partitionBy("__pid")
        .orderBy(F.asc("__v"), F.asc("__t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        events.join(F.broadcast(offsets), "__pid")
        .withColumn(
            count_col,
            (F.col("__a_off") + F.sum((F.col("__t") == 0).cast("long")).over(w_run))
            - (F.col("__b_off") + F.sum((F.col("__t") == 2).cast("long")).over(w_run)),
        )
        .filter(F.col("__t") == 1)
        .select(*probe_cols, count_col)
    )
    return out
