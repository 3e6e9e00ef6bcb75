"""Event-time batch operators over the ``events`` table.

These are the batch twins of the Structured Streaming jobs in
``streaming/jobs.py`` — same grouping logic, so stream-vs-batch
equivalence is testable and the DuckDB oracles apply to both.

Timestamps: the driver writes nanosecond parquet timestamps; the engine
reads them as raw int64 nanos (``ts_ns``, see sources/readers.py), and all
bucket arithmetic is integer division on nanos — no float time math, no
timezone surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HOUR_NS = 3_600_000_000_000
SESSION_GAP_NS = 1_800_000_000_000  # 30 min


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """(bucket_hour, event_type, n, total_value): tumbling 1h windows keyed
    by epoch-hour index."""
    return (
        events.groupBy(
            F.expr(f"ts_ns div {HOUR_NS}").alias("bucket_hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def hourly_counts_gapfilled(events: DataFrame) -> DataFrame:
    """(bucket_hour, event_type, n, total_value): the tumbling hourly
    rollup with MISSING HOURS MATERIALIZED as zero rows — per event
    type, every hour between that type's first and last event appears.
    Downstream time-series consumers (moving averages, anomaly deltas,
    chart axes) need the dense grid; a groupBy alone silently skips
    quiet hours and a window over it computes averages over the wrong
    denominator.

    Plan: the hourly hash-agg, a per-type (min, max) bucket aggregate
    (type-count-sized), a bounded ``sequence`` explode of each type's
    hour span, and one (type, hour) equi-join of grid against counts —
    fan-out is the time span in hours per type, never event-sized, and
    event rows shuffle exactly once (the rollup's own agg exchange)."""
    # Pin: the rollup feeds both the span aggregate and the grid join —
    # unpinned, the event-sized hash-agg would plan and run twice.
    counts = hourly_event_counts(events).localCheckpoint(eager=False)
    spans = counts.groupBy("event_type").agg(
        F.min("bucket_hour").alias("__lo"), F.max("bucket_hour").alias("__hi")
    )
    grid = spans.select(
        "event_type", F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("bucket_hour")
    )
    return grid.join(counts, ["event_type", "bucket_hour"], "left").select(
        "bucket_hour",
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("total_value"), F.lit(0.0)).alias("total_value"),
    )


DAY_NS = 86_400_000_000_000


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ns",
    extra_key_cols: list[str] | None = None,
) -> DataFrame:
    """(user_id, t_1..t_k, n_steps): ordered funnel completion — ``t_i``
    is the EARLIEST timestamp of step ``i`` occurring strictly after
    ``t_{i-1}`` (the classic product-analytics conversion question:
    of the users who viewed, who then clicked, who then purchased — in
    that order).  One row per user who performed step 1; ``n_steps`` is
    the furthest step reached.  No session/window bound by default —
    :func:`funnel_steps_sessioned` is the within-session variant
    (``extra_key_cols`` widens the funnel key, e.g. to
    (user, session_idx), and rides the same plan).

    Plan: k key-grouped aggregates chained by k-1 equi-joins on the
    funnel key.  Each step's events are filtered BEFORE joining (the
    step predicate prunes the fact scan), the running ``reached``
    relation is key-sized, and nothing event-sized ever joins against
    anything event-sized — work is one filtered pass over the facts per
    step.
    """
    if not steps:
        raise ValueError("funnel_steps needs at least one step")
    keys = ["user_id", *(extra_key_cols or [])]
    e = events.select(
        F.col(user_col).alias("user_id"),
        *(extra_key_cols or []),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    )
    reached = (
        e.filter(F.col("__t") == steps[0])
        .groupBy(*keys)
        .agg(F.min("__ts").alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t_{i - 1}"
        nxt = (
            e.filter(F.col("__t") == step)
            .join(reached.select(*keys, prev), keys)
            .filter(F.col("__ts") > F.col(prev))
            .groupBy(*keys)
            .agg(F.min("__ts").alias(f"t_{i}"))
        )
        reached = reached.join(nxt, keys, "left")
    n_steps = F.lit(1)
    for i in range(2, len(steps) + 1):
        n_steps = n_steps + F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
    return reached.withColumn("n_steps", n_steps)


def assign_sessions(events: DataFrame, gap_ns: int = SESSION_GAP_NS) -> DataFrame:
    """Every event row with its gap-based ``session_idx`` appended — the
    per-EVENT assignment underlying :func:`sessionize` (which returns
    per-session aggregates instead).  Same window chain (lag -> new-
    session flag -> running sum), so the two agree by construction; one
    shuffle on user_id, both window specs share it."""
    order = [F.asc("ts_ns"), F.asc("event_id")]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_s = (
        F.when(
            F.lag("ts_ns").over(w_lag).isNull()
            | ((F.col("ts_ns") - F.lag("ts_ns").over(w_lag)) > gap_ns),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    return events.withColumn("session_idx", F.sum(new_s).over(w_run))


def funnel_steps_sessioned(
    events: DataFrame,
    steps: list[str],
    gap_ns: int = SESSION_GAP_NS,
) -> DataFrame:
    """(user_id, session_idx, t_1..t_k, n_steps): the funnel required to
    complete WITHIN one gap-based session — the within-session
    conversion variant :func:`funnel_steps` points at.  One row per
    (user, session) whose session contains step 1.  Plan: the
    sessionize window pass assigns ``session_idx`` per event, then the
    funnel runs keyed on (user_id, session_idx) — still k key-grouped
    aggregates chained by key joins, nothing event-sized joining
    event-sized."""
    assigned = assign_sessions(
        events.select("user_id", "event_id", "ts_ns", "event_type"), gap_ns
    )
    return funnel_steps(assigned, steps, extra_key_cols=["session_idx"])


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ns",
    grain_ns: int = DAY_NS,
) -> DataFrame:
    """(cohort_day, day_offset, n_users): the classic retention triangle —
    users bucketed by their FIRST active day (epoch-day index), counted
    on each later active day as an offset from it.  ``n_users`` at
    offset 0 is the cohort size; dividing later offsets by it yields
    the retention curve.

    Plan: one distinct over (user, day) — the only event-sized shuffle,
    keyed and map-side combined — then user-sized aggregates and a
    user-keyed join; the output is (cohorts x offsets)-sized."""
    # Pin: the (user, day) distinct feeds both the first-day aggregate
    # and the retention join — unpinned it would shuffle events twice.
    days = events.select(
        F.col(user_col).alias("user_id"),
        F.expr(f"{ts_col} div {grain_ns}").alias("day"),
    ).distinct().localCheckpoint(eager=False)
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


#: Default slide for sliding windows: 15 min (4 overlapping windows/hour).
SLIDE_NS = HOUR_NS // 4


def sliding_event_counts(
    events: DataFrame, window_ns: int = HOUR_NS, slide_ns: int = SLIDE_NS
) -> DataFrame:
    """(window_start_s, event_type, n, total_value): OVERLAPPING windows
    of ``window_ns`` sliding by ``slide_ns`` (must divide it) — the
    moving-average shape tumbling buckets can't express.

    Each event belongs to exactly ``window_ns / slide_ns`` consecutive
    windows; membership is generated by a bounded sequence explode (one
    narrow map, fan-out = overlap factor) followed by one hash-agg — no
    self-join, no range join.  Window starts are emitted in epoch
    SECONDS (slide-aligned, may be negative for events within the first
    window of the epoch... which real data doesn't have).
    """
    if window_ns % slide_ns != 0:
        raise ValueError("slide_ns must divide window_ns")
    if slide_ns % 1_000_000_000 != 0:
        raise ValueError("slide_ns must be a whole number of seconds")
    k = window_ns // slide_ns
    slide_s = slide_ns // 1_000_000_000
    exploded = events.select(
        "event_type",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
        F.expr(f"ts_ns div {slide_ns}").alias("slot"),
    ).select(
        "event_type",
        "value",
        ((F.col("slot") - F.col("i")) * F.lit(slide_s)).alias("window_start_s"),
    )
    return exploded.groupBy("window_start_s", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def sessionize(events: DataFrame, gap_ns: int = SESSION_GAP_NS) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    inter-event gap exceeds ``gap_ns``.  (user_id, session_idx, n_events,
    start_s, end_s) with second-resolution bounds.

    Window-function formulation (lag -> flag -> running sum) — one shuffle
    on user_id; the running sum stays within each user partition.
    """
    order = [F.asc("ts_ns"), F.asc("event_id")]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = events.select(
        "user_id",
        "event_id",
        "ts_ns",
        F.when(
            F.lag("ts_ns").over(w_lag).isNull()
            | ((F.col("ts_ns") - F.lag("ts_ns").over(w_lag)) > gap_ns),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_s"),
    )
    sessions = flagged.select(
        "user_id", "ts_ns", F.sum("new_s").over(w_run).alias("session_idx")
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("min(ts_ns) div 1000000000").alias("start_s"),
        F.expr("max(ts_ns) div 1000000000").alias("end_s"),
    )


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_ns",
    id_col: str = "event_id",
    digits: int = 6,
) -> DataFrame:
    """(prev_type, next_type, n, p): first-order Markov transition
    matrix of per-user event sequences — the behavior-modeling /
    next-event-prediction primitive ("after a view, 31% of next actions
    are clicks").  ``p`` is the row-normalized probability
    n / sum(n over prev_type), rounded.

    Each user's first event has no predecessor and contributes no pair.
    Ordering is (ts, event_id) — the deterministic event-stream
    tiebreak used by sessionize and the funnels.

    Plan: one user-keyed window (the same single shuffle shape as
    sessionize — skew bounded by the busiest user), a hash-agg down to
    |types|^2 rows, and a tiny window over that result for the row
    normalization — nothing event-sized ever joins anything."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    pairs = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_row = Window.partitionBy("prev_type")
    return counts.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(w_row), digits)
    )


def hourly_anomalies(
    events: DataFrame, z_threshold: float = 2.0, digits: int = 6
) -> DataFrame:
    """(event_type, bucket_hour, n, z): hours whose event count is a
    z-score outlier for that type — |z| >= ``z_threshold`` against the
    type's mean/stddev over its GAP-FILLED hourly grid (quiet hours
    count as zero; computing moments over only the busy hours would
    understate variance and miss every dropout-style anomaly).  The
    monitoring primitive behind "did ingestion stall / spike this
    hour".

    z is rounded before the threshold compare, so the cut is
    engine-portable; a constant series (stddev 0) has no outliers by
    definition and is excluded by an explicit ``sigma > 0`` filter
    (ANSI mode would otherwise throw on the division).

    Plan: the gap-filled rollup (events shuffle once, grid fan-out is
    span-bounded) pinned so its moment aggregate and the final join
    share one evaluation; the per-type moments relation is
    type-count-sized and joins broadcast-small against the grid."""
    grid = hourly_counts_gapfilled(events).localCheckpoint(eager=False)
    stats = grid.groupBy("event_type").agg(
        F.avg("n").alias("__mu"), F.stddev("n").alias("__sigma")
    )
    return (
        grid.join(stats, "event_type")
        .filter(F.col("__sigma") > 0)
        .withColumn(
            "z", F.round((F.col("n") - F.col("__mu")) / F.col("__sigma"), digits)
        )
        .filter(F.abs(F.col("z")) >= F.lit(float(z_threshold)))
        .select("event_type", "bucket_hour", "n", "z")
    )


def decayed_agg(
    events: DataFrame,
    half_life_ns: int,
    group_cols: list[str] | None = None,
    ts_col: str = "ts_ns",
    value_col: str = "value",
    as_of_ns: int | None = None,
    digits: int = 6,
) -> DataFrame:
    """(group..., decayed_n, decayed_value): exponentially time-decayed
    count and value sum per group — the freshness-weighted engagement
    feature (an event ``half_life_ns`` old counts half; one two
    half-lives old counts a quarter).  The feature-store staple for
    "recent activity" signals that a plain windowed count cliff-edges.

    ``as_of_ns`` defaults to the table's own MAX timestamp (attached as
    a one-row broadcast, deterministic on both engines); pass a fixed
    epoch for serving-time alignment.  One map-side-combined hash
    aggregate over the events — weights are a pure projection, nothing
    event-sized shuffles beyond the group keys.

    Engine portability: the age is an exact long difference, its double
    cast and the division are IEEE-identical on both engines, and the
    2^(-age/half_life) weight is rounded to 9 decimals BEFORE summing
    (pow may differ in the last ulp across engines); the grouped sums
    round to ``digits``, the repo's standard absorb-the-sum-order step.
    """
    if half_life_ns <= 0:
        raise ValueError(f"half_life_ns must be positive, got {half_life_ns}")
    group_cols = list(group_cols) if group_cols else ["event_type"]
    ts = F.col(ts_col).cast("long")
    if as_of_ns is None:
        as_of = events.agg(F.max(ts).alias("__as_of"))
        base = events.crossJoin(F.broadcast(as_of))
    else:
        base = events.withColumn("__as_of", F.lit(int(as_of_ns)))
    w = F.round(
        F.pow(
            F.lit(2.0),
            -((F.col("__as_of") - ts).cast("double") / F.lit(float(half_life_ns))),
        ),
        9,
    )
    return (
        base.select(*group_cols, w.alias("__w"), F.col(value_col).alias("__v"))
        .groupBy(*group_cols)
        .agg(
            F.round(F.sum("__w"), digits).alias("decayed_n"),
            F.round(F.sum(F.col("__w") * F.col("__v")), digits).alias("decayed_value"),
        )
    )


def cooccurrence_pairs(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
    max_items_per_basket: int | None = 64,
    min_count: int = 1,
) -> DataFrame:
    """(item_a, item_b, n_baskets): unordered co-occurrence counts of
    distinct items sharing a basket — the market-basket / co-click /
    co-citation graph constructor (baskets = sessions, carts, hourly
    user activity, documents; items = types, products, terms).  The
    output is an edge list ready for the ranking/graph operators.

    Scale discipline: the self-join is quadratic PER BASKET, so a hot
    basket (one bot session touching everything) is capped FIRST to its
    ``max_items_per_basket`` greatest items via the skew-safe salted
    two-phase cap (``operators/sampling.py cap_per_group``) — per-basket
    work is then at most cap*(cap-1)/2 pairs, and the join stays a
    basket-keyed equi-join (AQE/skew eligible) with nothing quadratic in
    the corpus.  ``min_count`` prunes the long tail of incidental pairs
    before the result leaves the final aggregate.

    Items are de-duplicated within a basket first, so a basket
    contributes each pair at most once (set semantics, the standard
    co-occurrence convention)."""
    if not basket_cols:
        raise ValueError("cooccurrence_pairs needs at least one basket column")
    from bigdata_hits_spark.operators.sampling import cap_per_group

    basket = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in basket_cols]
    ).alias("__basket")
    items = df.select(basket, F.col(item_col).alias("__item")).distinct()
    if max_items_per_basket is not None:
        items = cap_per_group(
            items, "__basket", max_items_per_basket, order_col="__item"
        )
    a = items.select("__basket", F.col("__item").alias("item_a"))
    b = items.select("__basket", F.col("__item").alias("item_b"))
    return (
        a.join(b, "__basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_count)
    )

def interarrival_stats(
    events: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts_ns",
    id_col: str = "event_id",
    group_col: str = "event_type",
    digits: int = 6,
) -> DataFrame:
    """(group, n_gaps, min_gap_ns, max_gap_ns, avg_gap_s): distribution
    of the time since the user's PREVIOUS event (any type), grouped by
    the current event's type — the cadence profile behind session-gap
    tuning ("how long before an error follows a click") and bot
    detection (inhumanly small gaps).  Each user's first event has no
    predecessor and contributes no gap, mirroring ``transition_counts``.

    Gap arithmetic stays in exact int64 nanos through the aggregate
    (min/max/sum are exact longs); only the final mean converts to
    seconds, associated ``(sum/n)/1e9`` so cross-engine doubles match at
    the rounding.

    Plan: the standard single user-keyed window shuffle (skew bounded by
    the busiest user), then a hash-agg down to |types| rows — nothing
    event-sized joins anything."""
    w = Window.partitionBy(by).orderBy(F.asc(ts_col), F.asc(id_col))
    gaps = events.select(
        F.col(group_col),
        (F.col(ts_col) - F.lag(ts_col).over(w)).alias("__gap_ns"),
    ).filter(F.col("__gap_ns").isNotNull())
    return gaps.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("__gap_ns").alias("min_gap_ns"),
        F.max("__gap_ns").alias("max_gap_ns"),
        F.round(
            F.sum("__gap_ns").cast("double") / F.count(F.lit(1)) / F.lit(1e9),
            digits,
        ).alias("avg_gap_s"),
    )

def experiment_conversion(
    events: DataFrame,
    convert_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    n_variants: int = 2,
    digits: int = 6,
) -> DataFrame:
    """(variant, n_users, n_conversions, conv_rate): deterministic
    hash-split A/B readout — every user observed in the stream is
    assigned a stable variant by the portable md5-hex8 hash of their id
    mod ``n_variants`` (the same engine-wide coin as the train/val/test
    splits, so assignment survives reruns, engines, and repartitioning),
    and converts if they have at least one ``convert_type`` event.

    Analysis-side assignment (hash of the id) rather than a stored
    assignment table keeps the readout joinless; a real experiment
    framework would pass its own exposure table through ``events``.

    Scale: one user-keyed hash agg (event-sized input collapses
    map-side to one row per user) then one variants-sized agg — the
    same two-level shape as the funnels; nothing event-sized joins
    anything."""
    converted = F.max(
        F.when(F.col(type_col) == convert_type, F.lit(1)).otherwise(F.lit(0))
    )
    per_user = events.groupBy(user_col).agg(converted.alias("converted"))
    variant = (
        F.conv(F.substring(F.md5(F.col(user_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_variants
    ).alias("variant")
    return per_user.groupBy(variant).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_conversions"),
        F.round(
            F.sum("converted").cast("double") / F.count(F.lit(1)), digits
        ).alias("conv_rate"),
    )


def experiment_welch(
    events: DataFrame,
    metric: Column | None = None,
    user_col: str = "user_id",
    digits: int = 6,
) -> DataFrame:
    """One-row Welch's t readout for a two-variant experiment over a
    continuous per-user metric (default: the user's total event value,
    i.e. revenue per user): ``(n_a, n_b, mean_a, mean_b, t_stat, df)``
    — the unequal-variance t statistic and Welch-Satterthwaite degrees
    of freedom that the conversion-rate readout
    (:func:`experiment_conversion`) cannot provide for non-binary
    metrics.  Variants come from the same portable md5-hex8 user hash,
    so the two readouts describe the SAME experiment split.

    t = (mean_a - mean_b) / sqrt(va/na + vb/nb); df per
    Welch-Satterthwaite.  The p-value needs a t CDF (no closed form in
    either engine) and is deliberately left to the caller's stats
    library — the heavy lift at scale is the sufficient statistics, and
    those are exact here: one user-keyed hash agg (event-sized input
    collapses map-side), one 2-row variant agg of merged moments
    (avg/var_samp), one scalar projection.  Nothing event-sized joins
    anything; cross-engine moment drift is ~1e-12 relative so the
    roundings hold with wide margin.  Requires n >= 2 per variant and
    nonzero pooled variance, else t/df are NULL (guarded divisions)."""
    metric = F.sum("value").alias("__m") if metric is None else metric.alias("__m")
    per_user = events.groupBy(user_col).agg(metric)
    variant = (
        F.conv(F.substring(F.md5(F.col(user_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
    ).alias("__v")
    stats = per_user.groupBy(variant).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__m").alias("mean"),
        F.var_samp("__m").alias("var"),
    )
    side = lambda c, v: F.max(F.when(F.col("__v") == v, F.col(c)))  # noqa: E731
    wide = stats.agg(
        side("n", 0).alias("n_a"),
        side("n", 1).alias("n_b"),
        side("mean", 0).alias("__ma"),
        side("mean", 1).alias("__mb"),
        side("var", 0).alias("__va"),
        side("var", 1).alias("__vb"),
    )
    sa = F.col("__va") / F.col("n_a")
    sb = F.col("__vb") / F.col("n_b")
    se2 = sa + sb
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    return wide.select(
        "n_a",
        "n_b",
        F.round("__ma", digits).alias("mean_a"),
        F.round("__mb", digits).alias("mean_b"),
        F.round(
            F.when(ok, (F.col("__ma") - F.col("__mb")) / F.sqrt(se2)), digits
        ).alias("t_stat"),
        F.round(
            F.when(
                ok,
                (se2 * se2)
                / (sa * sa / (F.col("n_a") - 1) + sb * sb / (F.col("n_b") - 1)),
            ),
            digits,
        ).alias("df"),
    )


def hourly_autocorr(
    events: DataFrame, lags: tuple[int, ...] = (1, 24), digits: int = 6
) -> DataFrame:
    """Lag-k autocorrelation of each event type's hourly count series:
    ``(event_type, lag, n_pairs, autocorr)`` for each requested lag —
    lag 1 reads short-term burstiness, lag 24 the daily cycle; the two
    numbers behind seasonality-aware anomaly thresholds and cadence
    modeling.  Computed over the GAP-FILLED grid
    (:func:`hourly_counts_gapfilled`), so lag k means exactly k hours
    even across quiet gaps (a sparse rollup would silently correlate
    "k observed rows apart" instead).

    Pearson r is built from the pair moments (covar_pop /
    sqrt(var_pop_x * var_pop_y)) with an explicit zero-variance guard
    (NULL for a constant series) rather than F.corr, whose internal
    division runs inside the aggregate under ANSI mode
    (the grouped_linreg discipline, operators/profiling.py).

    Plan: events shuffle ONCE (the rollup's own agg); the dense grid is
    pinned (lazy localCheckpoint) and each lag is one (type, hour)
    equi-join of the grid against its shifted self plus a type-sized
    hash agg — per-lag work is grid-sized (span-hours x types, never
    event-sized), no global-order window, no single-task stage."""
    grid = (
        hourly_counts_gapfilled(events)
        .select("event_type", "bucket_hour", F.col("n").cast("double").alias("__x"))
        .localCheckpoint(eager=False)
    )
    outs = []
    for k in lags:
        b = grid.select(
            "event_type",
            (F.col("bucket_hour") + k).alias("bucket_hour"),
            F.col("__x").alias("__y"),
        )
        vx, vy, cov = F.var_pop("__x"), F.var_pop("__y"), F.covar_pop("__x", "__y")
        outs.append(
            grid.join(b, ["event_type", "bucket_hour"])
            .groupBy("event_type")
            .agg(
                F.lit(k).alias("lag"),
                F.count(F.lit(1)).alias("n_pairs"),
                F.round(
                    F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)), digits
                ).alias("autocorr"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def session_path_ngrams(
    events: DataFrame,
    n: int = 3,
    gap_ns: int = SESSION_GAP_NS,
    digits: int = 6,
) -> DataFrame:
    """Within-session event-type n-grams: ``(t1..tn, count, p)`` where p
    is normalized over the (t1..t(n-1)) prefix — the order-n Markov
    upgrade of :func:`transition_counts`, restricted to paths that do
    not span a session boundary (a purchase 3 days after a click is not
    a "path").  The behavioral-clickstream feature a ranking or
    next-action model trains on.

    Plan: ONE user-keyed window shuffle serves both the session
    assignment and the n-gram lags — the lag window stays partitioned
    by user (ordered ts, id) and lags the (type, session) pair, keeping
    only rows whose n-1 predecessors share the current session; no
    second exchange, no joins.  Then a hash agg to |types|^n rows and a
    prefix-partitioned window over that tiny relation for p.  Skew
    ceiling is the busiest user, same as every per-user window here."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_ns"), F.asc("event_id"))
    sess = assign_sessions(events, gap_ns=gap_ns)
    cols = []
    same_session = F.lit(True)
    for i in range(n - 1, 0, -1):
        cols.append(F.lag("event_type", i).over(w).alias(f"t{n - i}"))
        same_session = same_session & (
            F.lag("session_idx", i).over(w) == F.col("session_idx")
        )
    cols.append(F.col("event_type").alias(f"t{n}"))
    names = [f"t{i + 1}" for i in range(n)]
    grams = (
        sess.select(*cols, same_session.alias("__ok"))
        .filter(F.col("__ok") & F.col("t1").isNotNull())
        .groupBy(*names)
        .agg(F.count(F.lit(1)).alias("count"))
    )
    w_prefix = Window.partitionBy(*names[:-1])
    return grams.withColumn(
        "p",
        F.round(F.col("count") / F.sum("count").over(w_prefix), digits),
    )


def rolling_distinct_users(
    events: DataFrame, window_days: int = 7
) -> DataFrame:
    """Exact rolling ``window_days``-day distinct users per day:
    ``(day, n_users)`` for every day in the observed span — the DAU/WAU
    family's hard member: COUNT(DISTINCT) does not decompose over a
    sliding frame, so a window function cannot produce it and an
    approximate sketch is the usual surrender.

    Exact AND distributed: events collapse to the distinct (user, day)
    relation FIRST (one event-sized hash agg — the only time event rows
    move), then each (user, day) replicates to the <= ``window_days``
    day-buckets whose trailing window contains it (bounded sequence
    explode, fan-out = window size) and a (day, user)-keyed distinct +
    day-keyed count finish the job.  Work after the first agg is
    O(active-users-per-day x window) — never a function of event
    volume; no day ever funnels through one task.  Days with no active
    users inside the span appear with 0 (the gap-filled grid
    discipline)."""
    day = (F.col("ts_ns") / F.lit(DAY_NS)).cast("long")
    user_days = events.select(
        F.col("user_id"), day.alias("__d")
    ).distinct().localCheckpoint(eager=False)
    span = user_days.agg(
        F.min("__d").alias("__lo"), F.max("__d").alias("__hi")
    )
    contributions = user_days.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("__d"), F.col("__d") + F.lit(int(window_days) - 1)
            )
        ).alias("day"),
    ).distinct()
    counts = contributions.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    grid = span.select(
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("day")
    )
    return grid.join(counts, "day", "left").select(
        "day", F.coalesce(F.col("n_users"), F.lit(0)).alias("n_users")
    )


def period_over_period(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: str = "month",
    digits: int = 6,
) -> DataFrame:
    """Period rollup with growth: ``(period_start, total, pct_change)``
    — the month-over-month / week-over-week report every revenue or
    volume dashboard opens with.  ``pct_change`` is vs the previous
    PRESENT period (a NULL for the first row); periods with no rows are
    absent, as in the SQL idiom.

    One event-sized hash agg to period grain, then a lag window over
    the period-count-sized rollup — the documented free single-partition
    case (a century of months is 1200 rows).  The total is rounded
    before the ratio on BOTH sides so the division consumes identical
    doubles cross-engine."""
    rolled = (
        df.groupBy(F.date_trunc(period, F.col(ts_col)).alias("period_start"))
        .agg(F.round(F.sum(value_col), digits).alias("total"))
    )
    w = Window.orderBy("period_start")
    prev = F.lag("total").over(w)
    return rolled.select(
        "period_start",
        "total",
        F.round((F.col("total") - prev) / prev, digits).alias("pct_change"),
    )


def time_weighted_avg(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    digits: int = 6,
) -> DataFrame:
    """Time-weighted average of ``value_col`` per group: ``(group,
    n_intervals, twa)`` where each reading is weighted by HOW LONG it
    held (last-observation-carried-forward until the user's next event)
    — the irregular-sampling average a sensor/price/engagement series
    needs: the arithmetic mean over-counts bursts of rapid updates, TWA
    does not (the classic hypertable/finance ``time_weight``
    aggregate).

    Each user's stream is ordered by (ts, id); a reading's weight is
    the exact int64-nanosecond gap to the user's next event, and the
    final reading of each user holds no interval (dropped — the LOCF
    convention over the half-open observation span).  twa =
    sum(value * dt) / sum(dt), associated identically on both engines.

    Plan: ONE user-keyed window shuffle (the engine's standard
    event-time shape, skew-bounded by the busiest user) then a hash agg
    to group-count rows.  dt stays an exact long; value * dt is the
    only float product."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_ns"), F.asc("event_id"))
    dt = (F.lead("ts_ns").over(w) - F.col("ts_ns")).alias("__dt")
    rows = events.select(F.col(group_col), F.col(value_col).alias("__v"), dt).filter(
        F.col("__dt").isNotNull()
    )
    return rows.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(
            F.sum(F.col("__v") * F.col("__dt"))
            / F.sum(F.col("__dt").cast("double")),
            digits,
        ).alias("twa"),
    )


def multi_touch_attribution(
    events: DataFrame,
    window_ns: int = 2 * HOUR_NS,
    touch_types: tuple = ("view", "click"),
    conversion_type: str = "purchase",
    digits: int = 6,
) -> DataFrame:
    """(user_id, touch_type, n_touches, credit): LINEAR multi-touch
    attribution — every conversion's value splits equally across the
    user's touch events in the ``window_ns`` lookback (touch at or
    before the conversion) — the fairness-over-recency counterpart of
    the as-of LAST-touch row (events_asof_attribution), and the number
    marketing actually reports per channel.

    Plan: the touch-in-window pair generation follows the bin-bucketed
    range-join pattern (operators/rangejoin.py) but keys the equi-join
    on (user, bin) — binning on time ALONE would cross-join every user
    sharing a time bucket, the classic attribution scale-killer.  With
    ``bin_width = window_ns`` each conversion interval replicates to at
    most TWO (user, bin) keys; the exact window filter runs on the
    candidates.  Per-conversion touch counts are one conversion-keyed
    hash agg joined back; credit is SUM(value / n) rounded at
    ``digits`` (quotients of a double by an exact count — generic, so
    the round absorbs float-sum order).  Conversions with no in-window
    touch simply earn no credit row (they are the as-of row's
    business)."""
    w = int(window_ns)
    if w <= 0:
        raise ValueError(f"window_ns must be positive, got {window_ns}")
    e = events.select(
        "user_id",
        F.col("event_id"),
        F.col("ts_ns"),
        F.col("event_type"),
        F.col("value").cast("double").alias("value"),
    )
    conv = (
        e.filter(F.col("event_type") == conversion_type)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("conv_id"),
            (F.col("ts_ns") - F.lit(w)).alias("__lo"),
            F.col("ts_ns").alias("__hi"),
            F.col("value").alias("__v"),
        )
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("__lo") / F.lit(w)).cast("long"),
                    F.floor(F.col("__hi") / F.lit(w)).cast("long"),
                )
            ),
        )
    )
    touch = e.filter(F.col("event_type").isin(*touch_types)).select(
        F.col("user_id"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.col("ts_ns").alias("__t"),
        F.floor(F.col("ts_ns") / F.lit(w)).cast("long").alias("__bin"),
    )
    pairs = touch.join(conv, ["user_id", "__bin"]).filter(
        F.col("__t").between(F.col("__lo"), F.col("__hi"))
    )
    n_per_conv = pairs.groupBy("conv_id").agg(F.count(F.lit(1)).alias("__n"))
    return (
        pairs.join(n_per_conv, "conv_id")
        .groupBy("user_id", "touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum(F.col("__v") / F.col("__n")), digits).alias("credit"),
        )
    )


DEDUP_WINDOW_NS = 5_000_000_000  # 5 s


def dedup_consecutive(
    events: DataFrame, window_ns: int = DEDUP_WINDOW_NS
) -> DataFrame:
    """Ingestion-time telemetry dedup: drop an event when the SAME user
    emitted the SAME event_type within ``window_ns`` immediately before
    it (double-clicks, retry storms, at-least-once delivery replays).
    Keeps (event_id, user_id, ts_ns, event_type, value) of survivors.

    "Immediately before" is the previous RAW event in (ts_ns, event_id)
    order — a pure ``lag`` formulation, one shuffle on user_id, no
    running state.  (Chained bursts A@0s A@3s A@6s keep A@0s and drop
    the rest pairwise: each non-first element sits within the window of
    its raw predecessor.)  The batch twin of
    streaming/jobs.py dedup_events_stream's watermarked drop.
    """
    order = [F.asc("ts_ns"), F.asc("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    flagged = events.select(
        "event_id",
        "user_id",
        "ts_ns",
        "event_type",
        "value",
        (
            (F.lag("event_type").over(w) == F.col("event_type"))
            & ((F.col("ts_ns") - F.lag("ts_ns").over(w)) <= window_ns)
        ).alias("dup"),
    )
    return flagged.filter(~F.coalesce(F.col("dup"), F.lit(False))).drop("dup")
