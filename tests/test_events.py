"""Unit tests for the round-6 event-sequence operators: Markov
transition counts and z-score hourly anomalies (operators/events.py)."""

import statistics

from pyspark.sql import functions as F

from bigdata_hits_spark.operators.events import (
    HOUR_NS,
    hourly_anomalies,
    transition_counts,
)


def _ev(spark, rows):
    """rows: (event_id, ts_ns, user_id, event_type, value)"""
    return spark.createDataFrame(
        rows, "event_id long, ts_ns long, user_id long, event_type string, value double"
    )


def test_transition_counts_pairs_and_row_normalization(spark):
    rows = [
        # user 1: A -> B -> A
        (1, 100, 1, "A", 0.0),
        (2, 200, 1, "B", 0.0),
        (3, 300, 1, "A", 0.0),
        # user 2: A -> B  (first events never contribute a pair)
        (4, 100, 2, "A", 0.0),
        (5, 200, 2, "B", 0.0),
        # user 3: same-ts tie broken by event_id => C -> D
        (6, 500, 3, "C", 0.0),
        (7, 500, 3, "D", 0.0),
    ]
    got = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p"])
        for r in transition_counts(_ev(spark, rows)).collect()
    }
    assert got == {
        ("A", "B"): (2, 1.0),
        ("B", "A"): (1, 1.0),
        ("C", "D"): (1, 1.0),
    }


def test_transition_counts_p_splits_rows(spark):
    rows = [
        (1, 100, 1, "A", 0.0),
        (2, 200, 1, "B", 0.0),
        (3, 100, 2, "A", 0.0),
        (4, 200, 2, "C", 0.0),
        (5, 100, 3, "A", 0.0),
        (6, 200, 3, "C", 0.0),
    ]
    got = {
        (r["prev_type"], r["next_type"]): r["p"]
        for r in transition_counts(_ev(spark, rows)).collect()
    }
    assert got == {("A", "B"): round(1 / 3, 6), ("A", "C"): round(2 / 3, 6)}


def test_hourly_anomalies_flags_spike_against_gapfilled_moments(spark):
    """One event in hours 0..9 of type x, except: hour 3 is EMPTY (the
    gap-filled grid must supply its zero) and hour 5 has a 12-event
    spike.  Only the spike clears |z| >= 2, and its z matches the
    sample-stddev moments over the dense grid."""
    rows = []
    eid = 0
    for h in range(10):
        if h == 3:
            continue
        burst = 12 if h == 5 else 1
        for _ in range(burst):
            rows.append((eid, h * HOUR_NS + eid, 1, "x", 0.0))
            eid += 1
    counts = [1, 1, 1, 0, 1, 12, 1, 1, 1, 1]
    mu = statistics.mean(counts)
    sigma = statistics.stdev(counts)
    expect_z = round((12 - mu) / sigma, 6)
    assert abs((0 - mu) / sigma) < 2  # the gap itself is not an outlier here
    out = hourly_anomalies(_ev(spark, rows), z_threshold=2.0).collect()
    assert [(r["event_type"], r["bucket_hour"], r["n"], r["z"]) for r in out] == [
        ("x", 5, 12, expect_z)
    ]


def test_hourly_anomalies_constant_series_yields_nothing(spark):
    """stddev 0 => NULL z => excluded by the threshold compare, not a
    divide-by-zero."""
    rows = [(h, h * HOUR_NS, 1, "x", 0.0) for h in range(6)]
    assert hourly_anomalies(_ev(spark, rows), z_threshold=0.0).count() == 0


def test_decayed_agg_halves_per_half_life(spark):
    from bigdata_hits_spark.operators.events import decayed_agg

    hl = 1_000
    rows = [
        (0, "a", 10.0),      # 2 half-lives old -> weight 0.25
        (1_000, "a", 10.0),  # 1 half-life old  -> weight 0.5
        (2_000, "a", 10.0),  # as-of            -> weight 1.0
        (2_000, "b", 4.0),
    ]
    ev = spark.createDataFrame(rows, "ts_ns long, event_type string, value double")
    got = {
        r["event_type"]: (r["decayed_n"], r["decayed_value"])
        for r in decayed_agg(ev, hl).collect()
    }
    assert got["a"] == (1.75, 17.5)
    assert got["b"] == (1.0, 4.0)
    # fixed as_of shifts every weight identically
    got2 = {
        r["event_type"]: r["decayed_n"]
        for r in decayed_agg(ev, hl, as_of_ns=3_000).collect()
    }
    assert got2["a"] == 0.875 and got2["b"] == 0.5

    import pytest as _pytest

    with _pytest.raises(ValueError, match="half_life"):
        decayed_agg(ev, 0)


def test_cooccurrence_pairs_counts_and_caps(spark):
    from bigdata_hits_spark.operators.events import cooccurrence_pairs

    rows = [
        # basket 1: a, b, c (b repeated -> set semantics)
        (1, "a"), (1, "b"), (1, "b"), (1, "c"),
        # basket 2: a, b
        (2, "a"), (2, "b"),
        # basket 3: only one item -> no pairs
        (3, "z"),
    ]
    df = spark.createDataFrame(rows, "bid long, item string")
    got = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in cooccurrence_pairs(df, ["bid"], "item").collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    # cap=2 keeps the 2 GREATEST items per basket: {b,c} and {a,b}
    capped = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in cooccurrence_pairs(df, ["bid"], "item", max_items_per_basket=2).collect()
    }
    assert capped == {("b", "c"): 1, ("a", "b"): 1}
    # min_count prunes singleton pairs
    frequent = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in cooccurrence_pairs(df, ["bid"], "item", min_count=2).collect()
    }
    assert frequent == {("a", "b"): 2}


def test_interarrival_stats_gaps_grouped_by_current_type(spark):
    from bigdata_hits_spark.operators.events import interarrival_stats

    rows = [
        # user 1: A @0 -> B @3e9 (gap 3s) -> B @4e9 (gap 1s)
        (1, 0, 1, "A", 0.0),
        (2, 3_000_000_000, 1, "B", 0.0),
        (3, 4_000_000_000, 1, "B", 0.0),
        # user 2: lone event, no gap
        (4, 50, 2, "A", 0.0),
    ]
    out = {
        r["event_type"]: r
        for r in interarrival_stats(_ev(spark, rows)).collect()
    }
    # first events contribute no gap; user 2 contributes nothing
    assert "A" not in out
    b = out["B"]
    assert b["n_gaps"] == 2
    assert b["min_gap_ns"] == 1_000_000_000
    assert b["max_gap_ns"] == 3_000_000_000
    assert b["avg_gap_s"] == 2.0


def test_scd2_history_bounds_chain_and_current_flag(spark):
    from bigdata_hits_spark.operators.relops import scd2_history

    rows = [
        (1, 100, 1, "v1", 0.0),
        (2, 200, 1, "v2", 0.0),
        (3, 300, 1, "v3", 0.0),
        (4, 999, 2, "w1", 0.0),
    ]
    hist = scd2_history(
        _ev(spark, rows), ["user_id"], ["ts_ns", "event_id"]
    ).collect()
    by_id = {r["event_id"]: r for r in hist}
    # chain: each version's valid_to is the next version's valid_from
    assert by_id[1]["valid_from"] == 100 and by_id[1]["valid_to"] == 200
    assert by_id[2]["valid_from"] == 200 and by_id[2]["valid_to"] == 300
    assert by_id[3]["valid_to"] is None and by_id[3]["is_current"] == 1
    assert sum(r["is_current"] for r in hist) == 2  # one open row per key
    assert by_id[4]["valid_to"] is None and by_id[4]["is_current"] == 1


def test_experiment_conversion_stable_assignment_and_rates(spark):
    from bigdata_hits_spark.operators.events import experiment_conversion

    rows = [
        (1, 100, 1, "view", 0.0),
        (2, 200, 1, "purchase", 9.0),
        (3, 300, 2, "view", 0.0),
        (4, 400, 3, "purchase", 5.0),
    ]
    out = {r["variant"]: r for r in experiment_conversion(_ev(spark, rows)).collect()}
    assert sum(r["n_users"] for r in out.values()) == 3
    assert sum(r["n_conversions"] for r in out.values()) == 2
    for r in out.values():
        assert r["conv_rate"] == round(r["n_conversions"] / r["n_users"], 6)
    # assignment is a pure function of user_id: rerun agrees
    again = {r["variant"]: r for r in experiment_conversion(_ev(spark, rows)).collect()}
    assert {v: r["n_users"] for v, r in out.items()} == {
        v: r["n_users"] for v, r in again.items()
    }


def test_experiment_welch_matches_scipy_free_formula(spark):
    import math

    from bigdata_hits_spark.operators.events import experiment_welch

    # users 1..8, per-user revenue = sum of their event values
    rows = [
        (i, i * 100, u, "view", float(v))
        for i, (u, v) in enumerate(
            [(1, 3), (1, 4), (2, 10), (3, 6), (4, 2), (5, 9), (6, 1), (7, 7), (8, 5)]
        )
    ]
    df = _ev(spark, rows)
    out = experiment_welch(df).collect()[0]
    # recompute expected with the same hash assignment pulled from Spark
    assign = {
        r["user_id"]: r["v"]
        for r in df.select(
            "user_id",
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
                .cast("long")
                % 2
            ).alias("v"),
        )
        .distinct()
        .collect()
    }
    per_user = {}
    for _, _, u, _, v in rows:
        per_user[u] = per_user.get(u, 0.0) + v
    a = [m for u, m in per_user.items() if assign[u] == 0]
    b = [m for u, m in per_user.items() if assign[u] == 1]
    ma, mb = statistics.mean(a), statistics.mean(b)
    va, vb = statistics.variance(a), statistics.variance(b)
    se2 = va / len(a) + vb / len(b)
    t = (ma - mb) / math.sqrt(se2)
    dof = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert (out["n_a"], out["n_b"]) == (len(a), len(b))
    assert out["mean_a"] == round(ma, 6) and out["mean_b"] == round(mb, 6)
    assert abs(out["t_stat"] - t) < 1e-6 and abs(out["df"] - dof) < 1e-6


def test_experiment_welch_degenerate_variant_yields_null_t(spark):
    from bigdata_hits_spark.operators.events import experiment_welch

    # exactly one user lands in each variant -> n < 2 -> guarded NULLs
    rows = [(1, 100, 1, "view", 3.0), (2, 200, 2, "view", 5.0)]
    out = experiment_welch(_ev(spark, rows)).collect()[0]
    assert out["t_stat"] is None and out["df"] is None


def test_hourly_autocorr_perfect_daily_cycle(spark):
    from bigdata_hits_spark.operators.events import HOUR_NS, hourly_autocorr

    # type A: strict 24h period (counts 2,1,1,... repeating); 4 days
    rows = []
    eid = 0
    for day in range(4):
        for hour in range(24):
            n = 2 if hour == 0 else 1
            for _ in range(n):
                rows.append((eid, (day * 24 + hour) * HOUR_NS + 5, 1, "A", 0.0))
                eid += 1
    out = {
        r["lag"]: r
        for r in hourly_autocorr(_ev(spark, rows), lags=(1, 24)).collect()
    }
    assert out[24]["autocorr"] == 1.0  # exact periodicity
    assert out[24]["n_pairs"] == 3 * 24
    assert out[1]["autocorr"] < 0.1  # spike decorrelates at lag 1


def test_hourly_autocorr_counts_gaps_as_zero(spark):
    from bigdata_hits_spark.operators.events import HOUR_NS, hourly_autocorr

    # events only at hours 0 and 2; the gap hour must enter as 0, making
    # lag-2 pairs (h2,h0) correlate the two spikes
    rows = [(0, 1, 1, "A", 0.0), (1, 2 * HOUR_NS + 1, 1, "A", 0.0)]
    out = {r["lag"]: r for r in hourly_autocorr(_ev(spark, rows), lags=(2,)).collect()}
    assert out[2]["n_pairs"] == 1
    # single pair -> zero variance -> guarded NULL, not an ANSI error
    assert out[2]["autocorr"] is None


def test_session_path_ngrams_respects_session_boundaries(spark):
    from bigdata_hits_spark.operators.events import SESSION_GAP_NS, session_path_ngrams

    g = SESSION_GAP_NS
    rows = [
        # user 1, session 1: A B C ; session 2 (after gap): B C D
        (1, 10, 1, "A", 0.0),
        (2, 20, 1, "B", 0.0),
        (3, 30, 1, "C", 0.0),
        (4, 30 + 2 * g, 1, "B", 0.0),
        (5, 40 + 2 * g, 1, "C", 0.0),
        (6, 50 + 2 * g, 1, "D", 0.0),
    ]
    out = {(r.t1, r.t2, r.t3): (r["count"], r.p) for r in
           session_path_ngrams(_ev(spark, rows), n=3).collect()}
    # exactly one trigram per session; none spanning the gap (B C B etc.)
    assert out == {("A", "B", "C"): (1, 1.0), ("B", "C", "D"): (1, 1.0)}


def test_session_path_ngrams_prefix_normalization(spark):
    from bigdata_hits_spark.operators.events import session_path_ngrams

    rows = [
        (1, 10, 1, "A", 0.0), (2, 20, 1, "B", 0.0), (3, 30, 1, "C", 0.0),
        (4, 40, 1, "A", 0.0), (5, 50, 1, "B", 0.0), (6, 60, 1, "D", 0.0),
        (7, 70, 1, "A", 0.0), (8, 80, 1, "B", 0.0), (9, 90, 1, "D", 0.0),
    ]
    # trigrams: ABC, BCA, CAB, ABD, BDA, DAB, ABD... compute p over (t1,t2)
    out = {(r.t1, r.t2, r.t3): r.p for r in
           session_path_ngrams(_ev(spark, rows), n=3).collect()}
    assert out[("A", "B", "D")] == round(2 / 3, 6)
    assert out[("A", "B", "C")] == round(1 / 3, 6)


def test_rolling_distinct_users_bruteforce(spark):
    from bigdata_hits_spark.operators.events import DAY_NS, rolling_distinct_users

    # user 1 active days 0,2; user 2 day 2; user 3 day 9
    rows = [
        (1, 5, 1, "A", 0.0),
        (2, 2 * DAY_NS + 5, 1, "A", 0.0),
        (3, 2 * DAY_NS + 9, 1, "B", 0.0),  # same user+day twice
        (4, 2 * DAY_NS + 7, 2, "A", 0.0),
        (5, 9 * DAY_NS + 1, 3, "A", 0.0),
    ]
    out = {r["day"]: r["n_users"] for r in
           rolling_distinct_users(_ev(spark, rows), 3).collect()}
    # brute force over days 0..9 with 3-day trailing windows
    active = {0: {1}, 2: {1, 2}, 9: {3}}
    expect = {}
    for d in range(0, 10):
        users = set()
        for k in range(d - 2, d + 1):
            users |= active.get(k, set())
        expect[d] = len(users)
    assert out == expect
    assert out[5] == 0  # quiet day materialized as zero


def test_period_over_period_monthly(spark):
    import datetime

    from bigdata_hits_spark.operators.events import period_over_period

    rows = [
        (datetime.datetime(2024, 1, 5), 10.0),
        (datetime.datetime(2024, 1, 20), 10.0),
        (datetime.datetime(2024, 2, 3), 30.0),
        (datetime.datetime(2024, 4, 1), 15.0),  # March absent
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = {r["period_start"].month: r for r in
           period_over_period(df, "ts", "v").collect()}
    assert out[1]["total"] == 20.0 and out[1]["pct_change"] is None
    assert out[2]["pct_change"] == 0.5
    # April compares to the previous PRESENT period (Feb)
    assert out[4]["pct_change"] == round((15.0 - 30.0) / 30.0, 6)


def test_time_weighted_avg_weights_by_holding_time(spark):
    from bigdata_hits_spark.operators.events import time_weighted_avg

    # user 1: A=10.0 held 3 units, A=2.0 held 1 unit, final B dropped
    rows = [
        (1, 0, 1, "A", 10.0),
        (2, 3, 1, "A", 2.0),
        (3, 4, 1, "B", 99.0),
        # user 2: single event -> no interval at all
        (4, 0, 2, "A", 1000.0),
    ]
    out = {r["event_type"]: r for r in time_weighted_avg(_ev(spark, rows)).collect()}
    assert out["A"]["n_intervals"] == 2
    assert out["A"]["twa"] == round((10.0 * 3 + 2.0 * 1) / 4, 6)
    assert "B" not in out  # terminal reading holds no interval


def test_multi_touch_attribution_splits_evenly(spark):
    """Two touches inside the window split the purchase value 50/50;
    out-of-window and post-conversion touches earn nothing; the pair
    join is (user, bin)-keyed so same-time OTHER users never match."""
    import pytest

    from bigdata_hits_spark.operators.events import multi_touch_attribution

    H = 3_600_000_000_000
    rows = [
        # user A: view + click inside 2h window, purchase value 10
        (1, "u1", "view", 0 * H, 0.0),
        (2, "u1", "click", 1 * H, 0.0),
        (3, "u1", "purchase", 2 * H, 10.0),
        # u1 stale view far before the window, and a view AFTER purchase
        (4, "u1", "view", -10 * H, 0.0),
        (5, "u1", "view", 3 * H, 0.0),
        # user B: concurrent with A's window but must not cross-match
        (6, "u2", "view", 1 * H, 0.0),
        (7, "u2", "purchase", 100 * H, 4.0),  # no touch in window
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts_ns long, value double"
    )
    got = {(r["user_id"], r["touch_type"]): r for r in
           multi_touch_attribution(ev, window_ns=2 * H).collect()}
    assert set(got) == {("u1", "view"), ("u1", "click")}
    assert got[("u1", "view")]["credit"] == 5.0
    assert got[("u1", "click")]["credit"] == 5.0
    assert got[("u1", "view")]["n_touches"] == 1
    again = {(r["user_id"], r["touch_type"]): tuple(r) for r in
             multi_touch_attribution(ev.repartition(4), window_ns=2 * H).collect()}
    assert again == {k: tuple(v) for k, v in got.items()}
    with pytest.raises(ValueError, match="window_ns"):
        multi_touch_attribution(ev, window_ns=0)


def test_dedup_consecutive_raw_predecessor_semantics(spark):
    """Burst A@0 A@3 A@6 with a 5s window keeps only A@0: each later
    element sits within the window of its RAW predecessor (documented
    lag semantics), and a different type or a wide gap resets."""
    from bigdata_hits_spark.operators.events import dedup_consecutive

    s = 1_000_000_000
    rows = [
        (0, 1, 0 * s, "click", 1.0),
        (1, 1, 3 * s, "click", 1.0),   # 3s after raw prev -> drop
        (2, 1, 6 * s, "click", 1.0),   # 3s after raw prev (dropped) -> drop
        (3, 1, 20 * s, "click", 1.0),  # 14s gap -> keep
        (4, 1, 21 * s, "view", 1.0),   # type change -> keep
        (5, 2, 22 * s, "view", 1.0),   # other user -> keep
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_ns long, event_type string, value double"
    )
    kept = {r["event_id"] for r in dedup_consecutive(df, window_ns=5 * s).collect()}
    assert kept == {0, 3, 4, 5}
