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
