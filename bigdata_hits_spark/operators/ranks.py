"""Distributed exact global ranking and NTILE without a single-task window.

``ROW_NUMBER() OVER (ORDER BY ...)`` — the primitive behind exact
percentile gates, NTILE bucketing, and "keep the top X% by score"
curation cuts — funnels the ENTIRE dataset through one task when written
as a plain unpartitioned window.  This module computes the identical
numbers distributively, with the same two-phase shape the engine already
uses for the global token budget (operators/sampling.py
sample_to_token_budget):

1. range-partition the rows on the requested sort order (balanced,
   sampled boundaries — Spark's own RangePartitioning, the same exchange
   a global ``orderBy`` would plan);
2. per-partition counts roll into exclusive prefix offsets — a
   bucket-count-sized frame (one row per partition) that a single tiny
   window pass handles trivially;
3. each row's global rank = its partition's offset + its local
   ``row_number`` within the partition.

Every data-sized structure moves at most twice (the range exchange and
the pid-clustered window exchange); nothing data-sized ever lands on one
task, so the plan survives a 1000-executor 100 TB sort the way the naive
window cannot.

Determinism: ranks are well-defined only when ``order_by`` is a TOTAL
order — callers must include a tiebreak column (the declared query uses
``(quality DESC, doc_id ASC)``).  Given a total order, the output is
independent of partition-boundary placement, so the sampled range
boundaries cannot leak into results.

No reference counterpart (the reference's only ordering is the global
score sort, ``base_hits.py:66-67``); this is part of the
beyond-reference curation surface (driver brief: training-data
pipelines need exact quantile gates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _ceil_div(a: Column, b: Column) -> Column:
    """ceil(a / b) for positive integer columns.  Spark's `/` on longs is
    double division, so this is exact only while a + b - 1 <= 2^53 —
    far beyond any realistic row count here, but not unconditional."""
    return F.floor((a + b - F.lit(1)) / b).cast("long")


def _ranged_pinned(df: DataFrame, order_by: list[Column], num_buckets: int) -> DataFrame:
    """Range-partition on the sort order, stamp the partition id, and PIN
    the result (lazy localCheckpoint) so every downstream branch sees ONE
    evaluation.  Load-bearing for correctness, not just cost: Spark
    samples range boundaries with a seed derived from the evaluation, so
    the offsets branch and the window branch re-planning the exchange
    independently can land on DIFFERENT boundaries — offsets computed
    under one partitioning would then join against window pids of
    another (observed: ~9k wrong ranks at sf0.01 before pinning).  The
    checkpoint materializes on the offsets broadcast's build job and is
    reused by the main stage."""
    return df.repartitionByRange(num_buckets, *order_by).withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint(eager=False)


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rank",
    num_buckets: int | None = None,
    method: str = "row_number",
    key_cols: list[Column] | None = None,
) -> DataFrame:
    """Attach the exact 1-based global ``ROW_NUMBER`` / ``RANK`` /
    ``DENSE_RANK`` over ``order_by``.

    For ``row_number``, ``order_by`` must define a total order (include
    a unique tiebreak); with ties the assignment among tied rows is
    partition-dependent, exactly as an unpartitioned window's would be.
    ``rank``/``dense_rank`` are well-defined under ties — and ties are
    safe across buckets because Spark's RangePartitioning assigns equal
    sort keys to the same partition, so a tie group never straddles a
    bucket boundary and local-rank + bucket-offset stays exact.
    ``dense_rank`` additionally needs ``key_cols`` — the plain (no
    asc/desc) expressions of the sort key — because its offsets count
    DISTINCT keys per bucket, and sort-ordered Columns cannot be fed to
    countDistinct.

    Plan shape: one range exchange + one hash exchange on the partition
    id, a broadcast of the bucket-count offsets (one row per bucket),
    and per-bucket local windows.  The range-partitioned input is pinned
    to a single evaluation (see ``_ranged_pinned``) so the offsets
    branch and the window branch cannot diverge on sampled boundaries.
    """
    if method not in ("row_number", "rank", "dense_rank"):
        raise ValueError(f"unknown rank method {method!r}")
    if method == "dense_rank" and not key_cols:
        raise ValueError("dense_rank needs key_cols (plain sort-key expressions)")
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = _ranged_pinned(df, order_by, num_buckets)
    offsets = _bucket_offsets(ranged, key_cols if method == "dense_rank" else None)
    w_local = Window.partitionBy("__pid").orderBy(*order_by)
    local = {
        "row_number": F.row_number(),
        "rank": F.rank(),
        "dense_rank": F.dense_rank(),
    }[method]
    return (
        ranged.join(F.broadcast(offsets.drop("__n")), "__pid")
        .withColumn(rank_col, F.col("__off") + local.over(w_local))
        .drop("__pid", "__off")
    )


def _bucket_offsets(ranged: DataFrame, key_cols: list[Column] | None = None) -> DataFrame:
    """(__pid, __n, __off): per-range-bucket counts and exclusive prefix
    offsets — row counts by default, DISTINCT-sort-key counts when
    ``key_cols`` is given (the dense_rank offset unit).  Bucket-count-
    sized (= num_buckets rows), so the single-task window over it is
    free."""
    # struct-wrap the keys: count_distinct drops NULL arguments, but a
    # struct of NULLs is itself non-null, so null sort keys still count
    # as one distinct value (matching DENSE_RANK, where NULL is a peer
    # group like any other).
    measure = (
        F.count_distinct(F.struct(*key_cols)) if key_cols else F.count(F.lit(1))
    ).alias("__n")
    counts = ranged.groupBy("__pid").agg(measure)
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    return counts.select(
        "__pid", "__n", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )


def ntile_exact(
    df: DataFrame,
    n: int,
    order_by: list[Column],
    tile_col: str = "tile",
    num_buckets: int | None = None,
) -> DataFrame:
    """Attach the exact SQL ``NTILE(n) OVER (ORDER BY ...)`` tile,
    computed distributively from the global rank.

    SQL NTILE semantics reproduced in closed form: with N rows,
    q = N div n and r = N mod n, the first r tiles hold q+1 rows and the
    rest hold q, so

        tile(rank) = ceil(rank / (q+1))                 if rank <= r*(q+1)
                     r + ceil((rank - r*(q+1)) / q)      otherwise

    The total N is derived from the bucket counts already computed for
    the rank offsets (a num_buckets-row aggregate — no extra pass over
    the data) and attached via ``crossJoin(broadcast(...))``, the
    engine's standard one-row scalar attach.
    """
    if n <= 0:
        raise ValueError(f"ntile requires n >= 1, got {n}")
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = _ranged_pinned(df, order_by, num_buckets)
    offsets = _bucket_offsets(ranged)
    total = offsets.agg(F.sum("__n").alias("__N"))
    w_local = Window.partitionBy("__pid").orderBy(*order_by)
    ranked = (
        ranged.join(F.broadcast(offsets.drop("__n")), "__pid")
        .withColumn("__rank", F.col("__off") + F.row_number().over(w_local))
        .crossJoin(F.broadcast(total))
    )
    q = F.floor(F.col("__N") / n).cast("long")
    r = (F.col("__N") % n).cast("long")
    rank = F.col("__rank")
    first_block = r * (q + F.lit(1))
    tile = (
        F.when(rank <= first_block, _ceil_div(rank, q + F.lit(1)))
        .otherwise(r + _ceil_div(rank - first_block, F.greatest(q, F.lit(1))))
        .cast("int")
    )
    return ranked.withColumn(tile_col, tile).drop("__pid", "__off", "__rank", "__N")


def top_fraction(
    df: DataFrame,
    frac: float,
    order_by: list[Column],
    num_buckets: int | None = None,
) -> DataFrame:
    """Keep the exact top ``frac`` of rows under ``order_by`` (ceil(N*frac)
    rows) — the "keep the best X% by quality" curation gate, exact and
    distributed.  Equivalent to ``global_rank <= ceil(N*frac)`` without
    materializing N on the driver."""
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = _ranged_pinned(df, order_by, num_buckets)
    offsets = _bucket_offsets(ranged)
    total = offsets.agg(F.sum("__n").alias("__N"))
    w_local = Window.partitionBy("__pid").orderBy(*order_by)
    keep = F.ceil(F.col("__N") * F.lit(float(frac))).cast("long")
    return (
        ranged.join(F.broadcast(offsets.drop("__n")), "__pid")
        .withColumn("__rank", F.col("__off") + F.row_number().over(w_local))
        .crossJoin(F.broadcast(total))
        .filter(F.col("__rank") <= keep)
        .drop("__pid", "__off", "__rank", "__N")
    )


def top_fraction_approx(
    df: DataFrame,
    frac: float,
    score_col: str,
    accuracy: int = 10_000,
) -> DataFrame:
    """Keep approximately the top ``frac`` of rows by ``score_col`` —
    the one-pass scale path next to :func:`top_fraction`'s exact cut.

    The cutoff is the (1-frac) approx percentile (t-digest-style sketch:
    mergeable map-side state, one aggregation, no sort, no shuffle of
    the data beyond the one-row sketch merge), attached in-plan via the
    engine's standard ``crossJoin(broadcast(one-row))`` scalar attach —
    no driver round-trip.  Rows with scores exactly at the cutoff are
    kept (>=), so the kept fraction can exceed ``frac`` by the tied mass
    plus the sketch error (1/accuracy relative rank error); use
    :func:`top_fraction` when the boundary must be exact.
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    cutoff = df.agg(
        F.percentile_approx(score_col, F.lit(1.0 - frac), F.lit(accuracy)).alias("__cut")
    )
    return (
        df.crossJoin(F.broadcast(cutoff))
        .filter(F.col(score_col) >= F.col("__cut"))
        .drop("__cut")
    )


def rank_stats(
    df: DataFrame,
    order_by: list[Column],
    key_cols: list[Column],
    tiebreak: list[Column] | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """Attach the full SQL global-window rank family in one distributed
    pass: ``row_number``, ``rank``, ``dense_rank``, ``percent_rank``
    (= (rank-1)/(N-1), 0.0 when N=1) and ``cume_dist``
    (= rows-at-or-before-the-peer-group / N).

    ``order_by`` is the PEER-level ordering (the SQL window's ORDER BY)
    and ``key_cols`` its plain (no asc/desc) expressions — together they
    define the peer groups for rank/dense_rank/cume_dist.  ``tiebreak``
    extends the ordering for ``row_number`` only (its assignment among
    peers is partition-dependent otherwise, exactly like a single
    window's).

    The buckets partition on the PEER-level order alone — load-bearing:
    partitioning on the tiebroken total order would let a peer group
    straddle a bucket boundary (peers split by the tiebreak), and the
    straddling rows' bucket offset would overcount the peers left
    behind.  Tiebreaks only ever order WITHIN the local windows.
    Otherwise the :func:`global_rank` machinery: pinned buckets,
    row-count and distinct-key offsets, one total-N scalar attach; the
    per-peer-group size for cume_dist is a count over the (bucket, key)
    window — bucket-local, never global.
    """
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = _ranged_pinned(df, order_by, num_buckets)
    off_rows = _bucket_offsets(ranged)
    off_keys = _bucket_offsets(ranged, key_cols).withColumnsRenamed(
        {"__off": "__offk", "__n": "__nk"}
    )
    total = off_rows.agg(F.sum("__n").alias("__N"))
    w_keys = Window.partitionBy("__pid").orderBy(*order_by)
    w_total = Window.partitionBy("__pid").orderBy(*order_by, *(tiebreak or []))
    w_peers = Window.partitionBy("__pid", *key_cols)
    n = F.col("__N")
    rank_g = F.col("__off") + F.rank().over(w_keys)
    out = (
        ranged.join(F.broadcast(off_rows.drop("__n")), "__pid")
        .join(F.broadcast(off_keys.drop("__nk")), "__pid")
        .crossJoin(F.broadcast(total))
        .withColumn("row_number", F.col("__off") + F.row_number().over(w_total))
        .withColumn("rank", rank_g)
        .withColumn("dense_rank", F.col("__offk") + F.dense_rank().over(w_keys))
        .withColumn(
            "percent_rank",
            F.when(n > 1, (rank_g - F.lit(1)) / (n - F.lit(1)).cast("double")).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "cume_dist",
            (rank_g + F.count(F.lit(1)).over(w_peers) - F.lit(1)) / n.cast("double"),
        )
    )
    return out.drop("__pid", "__off", "__offk", "__N")


#: Ceiling on the skew-safe offsets broadcast, in rows.  The relation is
#: ~(n_groups + num_buckets) rows of (group, pid, off, ng); 10M rows is
#: a few hundred MB broadcast — past that the caller is in the
#: many-small-groups regime where the DEFAULT window plan is already
#: skew-free and skew_safe is the wrong tool.
TOP_FRACTION_MAX_OFFSET_ROWS = 10_000_000


def top_fraction_by(
    df: DataFrame,
    frac: float,
    group_col: str,
    order_by: list[Column],
    skew_safe: bool = False,
    num_buckets: int | None = None,
    max_offset_rows: int | None = TOP_FRACTION_MAX_OFFSET_ROWS,
) -> DataFrame:
    """Keep the top ``frac`` of rows WITHIN each ``group_col`` value
    (ceil(n_group * frac) rows per group) — the per-domain quality gate:
    a global cut (:func:`top_fraction`) lets a high-quality domain crowd
    out every document of a noisier one, while the per-group cut
    preserves source diversity by construction.

    Default plan: a group-partitioned window (hash exchange on the group
    key, per-group local sort) — the right shape when groups are balanced
    or numerous.  When ONE group dominates (a 90%-one-source corpus),
    that window funnels 90% of the rows through a single task; pass
    ``skew_safe=True`` for the bucketed variant, which range-partitions
    on (group, *order_by) so a dominant group SPANS buckets, computes
    per-(group, bucket) prefix offsets (same machinery as
    :func:`global_rank`, applied per group), and ranks inside
    (group, bucket) windows whose size is bounded by the bucket — no
    task ever holds more than ~rows/num_buckets.  The offsets relation
    broadcast is (n_groups + num_buckets)-row-sized, so the skew-safe
    path targets the few-but-huge-groups regime; with millions of tiny
    groups the default window is already skew-free.  That regime bound
    is ENFORCED: the offsets row count is checked (one cheap aggregate
    over the already-pinned ranged relation) against
    ``max_offset_rows`` before the broadcast, failing fast with a
    pointer back to the default plan instead of silently building a
    multi-GB broadcast (pass ``max_offset_rows=None`` to skip the
    check).  ``order_by`` should include a tiebreak for a deterministic
    boundary, as everywhere else.
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    if not skew_safe:
        w = Window.partitionBy(group_col).orderBy(*order_by)
        w_all = Window.partitionBy(group_col)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .withColumn("__ng", F.count(F.lit(1)).over(w_all))
            .filter(F.col("__rn") <= F.ceil(F.col("__ng") * F.lit(float(frac))))
            .drop("__rn", "__ng")
        )
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # Range-partition on (group, sort key): each group occupies a
    # CONTIGUOUS pid span and is ordered across it, so local rank +
    # per-(group, pid) exclusive prefix offset = exact in-group rank.
    # Pinned for the same reason as global_rank: the offsets branch and
    # the window branch must see one set of sampled range boundaries.
    ranged = _ranged_pinned(df, [F.col(group_col).asc(), *order_by], num_buckets)
    counts = ranged.groupBy(F.col(group_col).alias("__g"), "__pid").agg(
        F.count(F.lit(1)).alias("__n")
    )
    if max_offset_rows is not None:
        # One aggregate job over the pinned ranged relation (no source
        # rescan); `counts` has the same row count as the offsets
        # broadcast built below.
        n_offsets = counts.count()
        if n_offsets > max_offset_rows:
            raise ValueError(
                f"top_fraction_by(skew_safe=True): offsets relation has "
                f"{n_offsets} rows (> max_offset_rows={max_offset_rows}); "
                "this is the many-small-groups regime — use the default "
                "window plan (skew_safe=False), or raise max_offset_rows "
                "if the broadcast is genuinely intended"
            )
    w_off = Window.partitionBy("__g").orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_grp = Window.partitionBy("__g")
    offsets = counts.select(
        "__g",
        F.col("__pid").alias("__opid"),
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__n").over(w_grp).alias("__ng"),
    )
    # eqNullSafe: a NULL group is a group like any other (the default
    # window path keeps it; a plain equi-join would drop it here).
    joined = ranged.join(
        F.broadcast(offsets),
        F.col(group_col).eqNullSafe(F.col("__g")) & (F.col("__pid") == F.col("__opid")),
    )
    w_local = Window.partitionBy("__g", "__opid").orderBy(*order_by)
    return (
        joined.withColumn("__rn", F.col("__off") + F.row_number().over(w_local))
        .filter(F.col("__rn") <= F.ceil(F.col("__ng") * F.lit(float(frac))))
        .drop("__pid", "__g", "__opid", "__off", "__ng", "__rn")
    )


def winsorize(
    df: DataFrame,
    col: str,
    group_col: str | None = None,
    lo: float = 0.01,
    hi: float = 0.99,
    digits: int = 6,
) -> DataFrame:
    """All input columns + ``<col>_w``: the metric clamped into its
    [lo, hi] EXACT percentile band, optionally per group — the standard
    heavy-tail treatment before averaging/regressing over web-scale
    metrics (a handful of crawl outliers otherwise own the mean).

    Plan: one percentile aggregate (group-count-sized, or one row
    global), joined/attached back, then a pure clamp projection.  The
    exact percentile buffers each group's values in the aggregate state
    (the median_price_per_brand trade-off); swap percentile_approx in
    for unbounded groups at corpus scale.

    Bounds and output are rounded to ``digits`` so the clamp is
    engine-portable (interpolated percentiles match only to the rounded
    digit)."""
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got ({lo}, {hi})")
    bounds_aggs = [
        F.round(F.percentile(col, F.lit(float(lo))), digits).alias("__lo"),
        F.round(F.percentile(col, F.lit(float(hi))), digits).alias("__hi"),
    ]
    clamped = F.round(
        F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi")), digits
    ).alias(f"{col}_w")
    if group_col is None:
        bounds = df.agg(*bounds_aggs)
        out = df.crossJoin(F.broadcast(bounds))  # one-row scalar attach
    else:
        bounds = df.groupBy(group_col).agg(*bounds_aggs)
        out = df.join(bounds, group_col)
    return out.select(*df.columns, clamped)


#: Iglewicz–Hoaglin consistency constant: 0.6745 * (x - median) / MAD
#: estimates the z-score a NORMAL sample would have (MAD of a normal is
#: 0.6745 sigma), so the conventional |z| >= 3.5 cut applies.
MAD_CONSISTENCY = 0.6745


def mad_outliers(
    df: DataFrame,
    col: str,
    group_col: str,
    threshold: float = 3.5,
    digits: int = 6,
) -> DataFrame:
    """(group_col, *key cols..., col, z): rows whose MODIFIED z-score
    |0.6745 * (x - median) / MAD| exceeds ``threshold`` within their
    group — the robust outlier cut (median/MAD have a 50% breakdown
    point, so unlike the mean/stddev z-score the outliers themselves
    cannot mask the estimate; compare hourly_anomalies, the moments
    version for counts).

    Two group-sized aggregates by construction (the median, then the
    median absolute deviation around it) + two group-keyed joins; rows
    with MAD = 0 groups are excluded (a majority-constant group has no
    robust scale).  z is rounded before the threshold compare — the
    engine-portable cut."""
    med = df.groupBy(group_col).agg(
        F.round(F.percentile(col, F.lit(0.5)), digits).alias("__med")
    )
    with_med = df.join(med, group_col)
    mad = (
        with_med.select(group_col, F.abs(F.col(col) - F.col("__med")).alias("__dev"))
        .groupBy(group_col)
        .agg(F.round(F.percentile("__dev", F.lit(0.5)), digits).alias("__mad"))
    )
    z = F.round(
        F.lit(MAD_CONSISTENCY) * (F.col(col) - F.col("__med")) / F.col("__mad"), digits
    )
    return (
        with_med.join(mad, group_col)
        .filter(F.col("__mad") > 0)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= F.lit(float(threshold)))
        .drop("__med", "__mad")
    )


def quantile_normalize(
    df: DataFrame,
    order_col: str,
    out_col: str = "q",
    digits: int = 9,
    num_buckets: int | None = None,
) -> DataFrame:
    """All input columns + ``out_col``: the column's PERCENT_RANK
    ``(rank - 1) / (n - 1)`` in [0, 1] — rank-based quantile
    normalization, the standard monotone feature-scaling step that is
    immune to outliers and arbitrary units (a model-feature cousin of
    :func:`ntile_exact`).  Ties share a value (RANK semantics), so the
    mapping is a pure function of the data, not of row order.

    Distributed exactly like :func:`global_rank` (range-bucket prefix
    offsets, no single-task window); n attaches as a one-row broadcast.
    A single-row input normalizes to 0.0 (both engines' PERCENT_RANK
    convention).  Rows with NULL in ``order_col`` sort per the engine's
    default (Spark: NULLS FIRST) — filter or impute them first if the
    feature pipeline treats NULL as missing rather than smallest.
    """
    ranked = global_rank(
        df, [F.asc(order_col)], rank_col="__rnk", method="rank",
        num_buckets=num_buckets,
    )
    total = df.agg(F.count(F.lit(1)).alias("__qn_n"))
    q = F.when(
        F.col("__qn_n") > 1,
        F.round((F.col("__rnk") - 1).cast("double") / (F.col("__qn_n") - 1), digits),
    ).otherwise(F.lit(0.0))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out_col, q)
        .drop("__rnk", "__qn_n")
    )


def impute_missing(
    df: DataFrame,
    col: str,
    group_col: str | None = None,
    strategy: str = "median",
    digits: int = 6,
) -> DataFrame:
    """All input columns + ``<col>_filled``: NULLs replaced by the
    group's (or table's) median or mean — the standard missing-value
    treatment before modeling over heterogeneous sources, grouped so a
    sparse source is filled from ITS distribution, not the corpus's.

    The statistic is computed over the non-NULL values (both engines'
    aggregate convention), rounded to ``digits`` so the fill is
    engine-portable; non-NULL values pass through UNTOUCHED.  A group
    that is entirely NULL has no statistic and stays NULL — imputing it
    from elsewhere is a modeling decision, not a default.  NULL group
    keys are a group like any other (NULL-safe join back).

    Plan: one group-count-sized aggregate joined back (broadcast-sized
    until group cardinality is extreme; the join is key-equi either
    way), then a pure coalesce projection.  Median buffers each group's
    values in the aggregate state (the ``winsorize`` trade-off); use
    ``strategy="mean"`` or pre-aggregate at corpus scale when groups
    are unbounded."""
    if strategy not in ("median", "mean"):
        raise ValueError(f"unknown impute strategy {strategy!r}")
    stat = (
        F.percentile(col, F.lit(0.5)) if strategy == "median" else F.avg(col)
    )
    stat = F.round(stat, digits).alias("__fill")
    filled = F.coalesce(F.col(col), F.col("__fill")).alias(f"{col}_filled")
    if group_col is None:
        out = df.crossJoin(F.broadcast(df.agg(stat)))  # one-row attach
    else:
        stats = df.groupBy(F.col(group_col).alias("__g")).agg(stat)
        out = df.join(
            stats, F.col(group_col).eqNullSafe(F.col("__g")), "left"
        )
    return out.select(*df.columns, filled)


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Per-group weighted (lower) median: one row per group with the
    smallest value v such that the summed weight of rows with value <= v
    reaches half the group's total weight — the quantity-weighted price
    midpoint, the token-weighted quality midpoint, and every other
    "median of the MASS, not the rows" statistic a mixture report needs.

    Plan: one per-group window pass (running weight sum ordered by
    value + tiebreak, ROWS frame) against the group's total from the
    same window unbounded — then a groupBy(min) over only the threshold
    rows.  Windows are PARTITIONED by the group, so no single task ever
    sees more than the largest group (the skew ceiling every per-group
    window shares); group cardinality is unbounded.  The selected value
    is order-invariant under ties: the running sum over all rows with
    value <= v does not depend on intra-tie order, so the first row to
    cross half-total always carries the same value, whatever the
    tiebreak does.  Weights must be non-negative; rows with NULL value
    or NULL/zero weight are dropped (they carry no mass).  The output
    value is a DATA value (never an accumulated float), so it compares
    exactly cross-engine."""
    order = [F.col(value_col).asc()] + [
        F.col(c).asc() for c in (tiebreak or [])
    ]
    w_run = (
        Window.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    rows = (
        df.filter(
            F.col(value_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
        )
        .withColumn("__cum", F.sum(weight_col).over(w_run))
        .withColumn("__tot", F.sum(weight_col).over(w_all))
    )
    return (
        rows.filter(F.col("__cum") * 2 >= F.col("__tot"))
        .groupBy(group_col)
        .agg(F.min(value_col).alias(f"wmedian_{value_col}"))
    )


def assign_stable_ids(
    df: DataFrame,
    key_col: str,
    id_col: str = "new_id",
    seed: int = 0,
    num_buckets: int | None = None,
) -> DataFrame:
    """All input columns + ``id_col``: contiguous 1-based global ids in
    a deterministic hash-shuffled order — the stable integer handle a
    training pipeline mints for every document before sharding,
    example-level bookkeeping, and embedding-table addressing.  Ordering
    by the md5 of ``(seed, key)`` rather than the key itself decorrelates
    id order from ingest order, so any contiguous id slice is an
    unbiased corpus sample (the same property the portable splits rely
    on); re-running on the same data reproduces the same ids exactly.

    Plan: the module's two-phase global_rank (range exchange on the md5
    key + bucket-offset broadcast + per-bucket local windows) — nothing
    data-sized on one task, same-engine reproducible, and the md5 order
    is re-derivable by ANY engine with md5 (the portable-hash
    discipline of operators/sampling.py).  ``key_col`` must be unique
    (the md5 + key compound is then a total order; duplicate keys would
    make id assignment among duplicates partition-dependent)."""
    md5_key = F.md5(
        F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string"))
    )
    return global_rank(
        df.withColumn("__mk", md5_key),
        [F.col("__mk").asc(), F.col(key_col).asc()],
        rank_col=id_col,
        num_buckets=num_buckets,
    ).drop("__mk")
