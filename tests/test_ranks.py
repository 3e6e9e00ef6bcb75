"""Distributed exact global rank / NTILE (operators/ranks.py): the
two-phase range-bucket form must reproduce the single-window numbers
exactly, on data engineered to spread across many range buckets."""

import pytest
from pyspark.sql import Row, Window, functions as F

from bigdata_hits_spark.operators.ranks import global_rank, ntile_exact, top_fraction


@pytest.fixture(scope="module")
def scored(spark):
    # 997 rows, scores with heavy ties (mod 13) so tiebreak discipline is
    # exercised; num_buckets in the operator defaults to the session's 8
    # shuffle partitions -> multiple non-empty range buckets.
    rows = [Row(id=i, score=float((i * 7) % 13)) for i in range(997)]
    return spark.createDataFrame(rows)


def _order():
    return [F.desc("score"), F.asc("id")]


def test_global_rank_matches_single_window(spark, scored):
    got = {r["id"]: r["rank"] for r in global_rank(scored, _order()).collect()}
    w = Window.orderBy(*_order())
    want = {
        r["id"]: r["rank"]
        for r in scored.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


def test_ntile_matches_single_window(spark, scored):
    # 997 = 3*332 + 1: SQL NTILE(3) gives tiles of 333/332/332 — the
    # remainder handling is exactly what the closed form must reproduce.
    got = {r["id"]: r["tile"] for r in ntile_exact(scored, 3, _order()).collect()}
    w = Window.orderBy(*_order())
    want = {
        r["id"]: r["tile"]
        for r in scored.withColumn("tile", F.ntile(3).over(w)).collect()
    }
    assert got == want
    sizes = sorted(
        ntile_exact(scored, 3, _order()).groupBy("tile").count().rdd.map(tuple).collect()
    )
    assert sizes == [(1, 333), (2, 332), (3, 332)]


def test_ntile_more_tiles_than_rows(spark):
    # N < n: every row its own tile (tile == rank), no division by zero.
    df = spark.createDataFrame([Row(id=i, score=float(i)) for i in range(3)])
    got = sorted(
        (r["id"], r["tile"])
        for r in ntile_exact(df, 10, [F.asc("score"), F.asc("id")]).collect()
    )
    assert got == [(0, 1), (1, 2), (2, 3)]


def test_top_fraction_exact_cut(spark, scored):
    kept = top_fraction(scored, 0.25, _order())
    assert kept.count() == 250  # ceil(997 * 0.25)
    w = Window.orderBy(*_order())
    want = {
        r["id"]
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 250)
        .collect()
    }
    assert {r["id"] for r in kept.collect()} == want


def test_rank_plan_is_range_partitioned_not_single_task(spark, scored):
    plan = global_rank(scored, _order())._jdf.queryExecution().executedPlan().toString()
    # the data-sized window runs partitioned by the range-bucket id —
    # no single-partition exchange anywhere in the data path (the only
    # single-task window is over the bucket-count offsets, whose input
    # is the num_buckets-row aggregate, visible as the HashAggregate
    # feeding the SinglePartition exchange)
    row_number_windows = [seg for seg in plan.split("Window ")[1:] if "row_number" in seg]
    assert row_number_windows, plan
    assert all("__pid" in seg.splitlines()[0] for seg in row_number_windows), plan


def test_top_fraction_approx_close_to_exact(spark, scored):
    from bigdata_hits_spark.operators.ranks import top_fraction_approx

    kept = top_fraction_approx(scored, 0.25, "score").count()
    # scores are (i*7)%13 — only 13 distinct values, so the >= cutoff
    # keeps whole tied bands; the kept count must cover at least the
    # requested quarter and stay within one value-band of it
    assert kept >= 0.25 * 997
    band = 997 / 13 + 1
    assert kept <= 0.25 * 997 + band + 997 / 100  # tied band + sketch error


def test_top_fraction_approx_no_driver_action(spark, scored):
    from bigdata_hits_spark.operators.ranks import top_fraction_approx

    df = top_fraction_approx(scored, 0.5, "score")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # scalar attached in-plan: exactly one one-row broadcast join, and no
    # range exchange (the whole point vs the exact cut)
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "rangepartitioning" not in plan.lower()


def test_rank_and_dense_rank_with_ties(spark, scored):
    # order by score alone -> heavy ties (13 distinct values across 997
    # rows), tie groups co-located by range partitioning
    order = [F.desc("score")]
    w = Window.orderBy(F.desc("score"))
    want_rank = {
        (r["id"], r["rank"])
        for r in scored.withColumn("rank", F.rank().over(w)).collect()
    }
    got_rank = {
        (r["id"], r["rank"])
        for r in global_rank(scored, order, method="rank").collect()
    }
    assert got_rank == want_rank
    want_dense = {
        (r["id"], r["rank"])
        for r in scored.withColumn("rank", F.dense_rank().over(w)).collect()
    }
    got_dense = {
        (r["id"], r["rank"])
        for r in global_rank(
            scored, order, method="dense_rank", key_cols=[F.col("score")]
        ).collect()
    }
    assert got_dense == want_dense


def test_dense_rank_counts_null_keys(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, 5.0), (4, 1.0), (5, 1.0)],
        "id long, score double",
    )
    order = [F.asc_nulls_first("score"), ]
    got = {
        (r["id"], r["rank"])
        for r in global_rank(
            df, order, method="dense_rank", key_cols=[F.col("score")]
        ).collect()
    }
    w = Window.orderBy(F.asc_nulls_first("score"))
    want = {
        (r["id"], r["rank"])
        for r in df.withColumn("rank", F.dense_rank().over(w)).collect()
    }
    assert got == want


def test_dense_rank_requires_key_cols(spark, scored):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="key_cols"):
        global_rank(scored, [F.desc("score")], method="dense_rank")


def test_rank_stats_matches_single_window(spark, scored):
    from bigdata_hits_spark.operators.ranks import rank_stats

    order = [F.desc("score")]
    keys = [F.col("score")]
    got = {
        r["id"]: (r["row_number"], r["rank"], r["dense_rank"],
                  round(r["percent_rank"], 12), round(r["cume_dist"], 12))
        for r in rank_stats(scored, order, keys, tiebreak=[F.asc("id")]).collect()
    }
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    wk = Window.orderBy(F.desc("score"))
    want = {
        r["id"]: (r["rn"], r["rk"], r["dr"], round(r["pr"], 12), round(r["cd"], 12))
        for r in scored.select(
            "id",
            F.row_number().over(w).alias("rn"),
            F.rank().over(wk).alias("rk"),
            F.dense_rank().over(wk).alias("dr"),
            F.percent_rank().over(wk).alias("pr"),
            F.cume_dist().over(wk).alias("cd"),
        ).collect()
    }
    assert got == want


def test_rank_stats_single_row(spark):
    from bigdata_hits_spark.operators.ranks import rank_stats

    df = spark.createDataFrame([(1, 5.0)], "id long, score double")
    r = rank_stats(df, [F.asc("score")], [F.col("score")]).collect()[0]
    assert (r["row_number"], r["rank"], r["dense_rank"]) == (1, 1, 1)
    assert r["percent_rank"] == 0.0 and r["cume_dist"] == 1.0


def test_top_fraction_by_group(spark):
    from bigdata_hits_spark.operators.ranks import top_fraction_by

    rows = [(f"g{i % 3}", i, float(i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, id long, score double")
    kept = top_fraction_by(df, 0.3, "g", [F.desc("score"), F.asc("id")])
    got = {}
    for r in kept.collect():
        got.setdefault(r["g"], set()).add(r["id"])
    # per-group expected: ceil(n_g * 0.3) best rows under the same order
    by_g = {}
    for g, i, s in rows:
        by_g.setdefault(g, []).append((s, i))
    import math

    for g, vals in by_g.items():
        take = math.ceil(len(vals) * 0.3)
        want = {i for _, i in sorted(vals, key=lambda t: (-t[0], t[1]))[:take]}
        assert got[g] == want, g


def test_top_fraction_by_skew_safe_matches_window_path(spark):
    """90%-one-group fixture: the skew-safe bucketed variant must return
    EXACTLY the default window path's rows (incl. a NULL group), while
    its plan range-partitions on (group, order) so the dominant group
    spans buckets instead of funneling through one window task."""
    from bigdata_hits_spark.operators.ranks import top_fraction_by

    n = 20_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("big"))
        .when(F.col("id") % 100 == 99, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 7).cast("string")))
        .alias("src"),
        (F.xxhash64("id") % 1_000_000).cast("double").alias("score"),
        F.col("id"),
    )
    order = [F.desc("score"), F.asc("id")]
    base = top_fraction_by(df, 0.3, "src", order)
    safe = top_fraction_by(df, 0.3, "src", order, skew_safe=True, num_buckets=16)
    key = lambda r: (r["src"] or "", r["id"])
    assert sorted(safe.collect(), key=key) == sorted(base.collect(), key=key)

    # plan shape on a FRESH instance (before the checkpoint pin has
    # materialized): every data-path row_number window partitions on
    # (group, bucket id) — never on the group alone, which is the
    # single-task funnel this variant exists to avoid
    fresh = top_fraction_by(df, 0.3, "src", order, skew_safe=True, num_buckets=16)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    rn_windows = [seg for seg in plan.split("Window ")[1:] if "row_number" in seg]
    assert rn_windows, plan[:2000]
    assert all("__opid" in seg.splitlines()[0] for seg in rn_windows), plan[:2000]


def test_winsorize_clamps_to_group_band(spark):
    from bigdata_hits_spark.operators.ranks import winsorize

    # group a: 1..10 (p10=1.9, p90=9.1 under linear interpolation);
    # group b untouched (all values inside its band)
    rows = [("a", float(i)) for i in range(1, 11)] + [("b", 5.0), ("b", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = {
        (r["g"], r["x"]): r["x_w"]
        for r in winsorize(df, "x", "g", 0.10, 0.90).collect()
    }
    assert out[("a", 1.0)] == 1.9
    assert out[("a", 10.0)] == 9.1
    assert out[("a", 5.0)] == 5.0
    assert out[("b", 5.0)] == 5.0


def test_winsorize_global_is_one_row_attach(spark):
    from bigdata_hits_spark.operators.ranks import winsorize

    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "x double")
    out = winsorize(df, "x", None, 0.10, 0.90)
    got = sorted(r["x_w"] for r in out.collect())
    assert got[0] == 1.9 and got[-1] == 9.1
    with pytest.raises(ValueError, match="lo < hi"):
        winsorize(df, "x", None, 0.9, 0.1)


def test_mad_outliers_flags_planted_spike_and_skips_constant(spark):
    from bigdata_hits_spark.operators.ranks import mad_outliers

    # group a: tight cluster around 10 (med 10, MAD 1) + one 100 spike:
    # z(100) = 0.6745*90 = 60.7; group c constant -> MAD 0 -> excluded
    rows = (
        [("a", i, 10.0 + (i % 3) - 1) for i in range(9)]
        + [("a", 99, 100.0)]
        + [("c", 1, 5.0), ("c", 2, 5.0), ("c", 3, 5.0)]
    )
    df = spark.createDataFrame(rows, "g string, k long, x double")
    out = mad_outliers(df, "x", "g", threshold=3.5).collect()
    assert [(r["g"], r["k"], r["z"]) for r in out] == [("a", 99, round(0.6745 * 90, 6))]


def test_quantile_normalize_maps_to_unit_interval(spark):
    from bigdata_hits_spark.operators.ranks import quantile_normalize

    df = spark.createDataFrame(
        [(1, 50.0), (2, 10.0), (3, 30.0), (4, 30.0), (5, 999.0)], "id long, x double"
    )
    got = {r["id"]: r["q"] for r in quantile_normalize(df, "x").collect()}
    # ranks over (10, 30, 30, 50, 999): 1, 2, 2, 4, 5 -> (r-1)/4
    assert got == {2: 0.0, 3: 0.25, 4: 0.25, 1: 0.75, 5: 1.0}
    # outlier magnitude is irrelevant: only order matters
    df2 = df.replace(999.0, 51.0, subset="x")
    assert {r["id"]: r["q"] for r in quantile_normalize(df2, "x").collect()} == got
    # single row -> 0.0 by convention
    one = spark.createDataFrame([(1, 5.0)], "id long, x double")
    assert quantile_normalize(one, "x").first()["q"] == 0.0


def test_impute_missing_fills_from_group_distribution(spark):
    from bigdata_hits_spark.operators.ranks import impute_missing

    df = spark.createDataFrame(
        [
            ("a", 1.0), ("a", 3.0), ("a", None),      # a-median 2.0
            ("b", 10.0), ("b", None),                  # b-median 10.0
            ("c", None),                               # all-NULL group stays NULL
            (None, 7.0), (None, None),                 # NULL group key works
        ],
        "g string, x double",
    )
    rows = impute_missing(df, "x", group_col="g").collect()
    by = {}
    for r in rows:
        by.setdefault(r["g"], []).append((r["x"], r["x_filled"]))
    assert (None, 2.0) in by["a"] and (1.0, 1.0) in by["a"]  # fill + passthrough
    assert (None, 10.0) in by["b"]
    assert by["c"] == [(None, None)]                          # no stat to fill from
    assert (None, 7.0) in by[None]                            # NULL-keyed group filled
    # global mean strategy
    one = impute_missing(df, "x", strategy="mean")
    filled = {r["x_filled"] for r in one.collect() if r["x"] is None}
    assert filled == {5.25}  # mean of (1, 3, 10, 7)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="strategy"):
        impute_missing(df, "x", strategy="mode")


def test_weighted_median_mass_not_rows(spark):
    from bigdata_hits_spark.operators.ranks import weighted_median

    df = spark.createDataFrame(
        [
            # group A: one heavy row outweighs two light ones
            ("A", 1.0, 1.0), ("A", 2.0, 1.0), ("A", 3.0, 10.0),
            # group B: lower weighted median on an exact half split
            ("B", 1.0, 2.0), ("B", 2.0, 2.0),
            # zero/NULL weights carry no mass
            ("A", 0.5, 0.0), ("B", 0.25, None),
        ],
        "g string, v double, w double",
    )
    out = {
        r["g"]: r["wmedian_v"]
        for r in weighted_median(df, "v", "w", "g").collect()
    }
    assert out == {"A": 3.0, "B": 1.0}


def test_assign_stable_ids_deterministic_permutation(spark):
    import hashlib

    from bigdata_hits_spark.operators.ranks import assign_stable_ids

    df = spark.createDataFrame([(i,) for i in range(37)], "k long")
    got = {
        r["k"]: r["new_id"]
        for r in assign_stable_ids(df, "k", num_buckets=4).collect()
    }
    # contiguous 1..N, and exactly the md5('0|k') order
    assert sorted(got.values()) == list(range(1, 38))
    expect_order = sorted(range(37), key=lambda k: (hashlib.md5(f"0|{k}".encode()).hexdigest(), k))
    assert got == {k: i + 1 for i, k in enumerate(expect_order)}
    # and NOT ingest order (the shuffle is the point)
    assert [k for k, _ in sorted(got.items(), key=lambda kv: kv[1])] != list(range(37))
