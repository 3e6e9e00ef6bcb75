"""Bin-bucketed range join (operators/rangejoin.py): equi-join-on-grid
must reproduce the naive theta-join exactly — each containing pair once,
boundaries inclusive — while planning no cartesian/BNLJ."""

import pytest
from pyspark.sql import Row, functions as F

from bigdata_hits_spark.operators.rangejoin import range_join_bins


@pytest.fixture(scope="module")
def sides(spark):
    probe = spark.createDataFrame(
        [Row(pid=i, value=float(v)) for i, v in enumerate(range(-50, 151, 3))]
    )
    intervals = spark.createDataFrame(
        [
            Row(iid=0, lo=-10.0, hi=10.0),
            Row(iid=1, lo=0.0, hi=0.0),      # degenerate point interval
            Row(iid=2, lo=7.0, hi=64.0),     # spans several bins
            Row(iid=3, lo=63.0, hi=63.0),    # exact boundary probe value
            Row(iid=4, lo=200.0, hi=300.0),  # matches nothing
            Row(iid=5, lo=-100.0, hi=149.0),
        ]
    )
    return probe, intervals


def _brute(probe, intervals):
    return (
        probe.crossJoin(intervals)
        .filter(F.col("value").between(F.col("lo"), F.col("hi")))
        .select("pid", "iid")
    )


@pytest.mark.parametrize("width", [1.0, 7.0, 64.0, 1000.0])
def test_matches_brute_force_at_any_bin_width(spark, sides, width):
    probe, intervals = sides
    got = sorted(
        map(tuple, range_join_bins(probe, intervals, "value", "lo", "hi", width)
            .select("pid", "iid").collect())
    )
    want = sorted(map(tuple, _brute(probe, intervals).collect()))
    assert got == want
    # exactly-once: no pair may be produced twice (a probe value lands in
    # one bin, an interval appears at most once per bin)
    assert len(got) == len(set(got))


def test_boundaries_inclusive(spark, sides):
    probe, intervals = sides
    got = {
        (r["value"], r["iid"])
        for r in range_join_bins(probe, intervals, "value", "lo", "hi", 10.0).collect()
    }
    # probe values are -50, -47, ... (step 3): 10.0 == hi of interval 0
    # and 7.0 == lo of interval 2 must both match (inclusive ends);
    # the point intervals 1 (0,0) and 3 (63,63) cover no probe value,
    # and interval 4 lies beyond the probe range entirely.
    assert (10.0, 0) in got
    assert (7.0, 2) in got
    assert not any(i in (1, 3, 4) for _, i in got)


def test_inverted_interval_raises(spark):
    probe = spark.createDataFrame([Row(pid=0, value=1.0)])
    bad = spark.createDataFrame([Row(iid=0, lo=5.0, hi=1.0)])
    with pytest.raises(Exception, match="lo > hi"):
        range_join_bins(probe, bad, "value", "lo", "hi", 1.0).collect()


def test_span_guard_raises(spark):
    probe = spark.createDataFrame([Row(pid=0, value=1.0)])
    wide = spark.createDataFrame([Row(iid=0, lo=0.0, hi=1e9)])
    with pytest.raises(Exception, match="raise bin_width"):
        range_join_bins(
            probe, wide, "value", "lo", "hi", 1.0, max_bins_per_interval=100
        ).collect()


def test_nonpositive_width_rejected(spark, sides):
    probe, intervals = sides
    with pytest.raises(ValueError):
        range_join_bins(probe, intervals, "value", "lo", "hi", 0.0)


def test_plan_is_equi_join_not_bnlj(spark, sides):
    probe, intervals = sides
    df = range_join_bins(probe, intervals, "value", "lo", "hi", 10.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


class TestIntervalCountSweep:
    def test_matches_brute_force(self, spark, sides):
        from bigdata_hits_spark.operators.rangejoin import interval_count_sweep

        probe, intervals = sides
        got = {
            r["pid"]: r["n_intervals"]
            for r in interval_count_sweep(probe, intervals, "value", "lo", "hi").collect()
        }
        vals = {r["pid"]: r["value"] for r in probe.collect()}
        ivs = [(r["lo"], r["hi"]) for r in intervals.collect()]
        want = {
            p: sum(1 for lo, hi in ivs if lo <= v <= hi) for p, v in vals.items()
        }
        assert got == want
        # a probe outside every interval is kept at 0, not dropped
        lone = spark.createDataFrame([(99, 1e6)], "pid long, value double")
        (zero,) = interval_count_sweep(lone, intervals, "value", "lo", "hi").collect()
        assert (zero["pid"], zero["n_intervals"]) == (99, 0)

    def test_boundary_ties_inclusive(self, spark):
        from bigdata_hits_spark.operators.rangejoin import interval_count_sweep

        # probes exactly at lo, at hi, and between duplicated bounds
        probe = spark.createDataFrame(
            [(0, 5.0), (1, 10.0), (2, 7.5)], "pid long, value double"
        )
        intervals = spark.createDataFrame(
            [(5.0, 10.0), (5.0, 10.0), (10.0, 10.0), (0.0, 5.0)], "lo double, hi double"
        )
        got = {
            r["pid"]: r["n_intervals"]
            for r in interval_count_sweep(probe, intervals, "value", "lo", "hi").collect()
        }
        assert got == {0: 3, 1: 3, 2: 2}

    def test_agrees_with_pair_join_counts(self, spark, sides):
        from bigdata_hits_spark.operators.rangejoin import (
            interval_count_sweep,
            range_join_bins,
        )
        from pyspark.sql import functions as F

        probe, intervals = sides
        sweep = {
            r["pid"]: r["n_intervals"]
            for r in interval_count_sweep(probe, intervals, "value", "lo", "hi").collect()
            if r["n_intervals"] > 0
        }
        pairs = {
            r["pid"]: r["n"]
            for r in range_join_bins(probe, intervals, "value", "lo", "hi", 10.0)
            .groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert sweep == pairs
