"""Accuracy floors for the sketch-based approximate operators (their
queries are declared rows-only; the guarantees live here)."""

from pyspark.sql import functions as F

from bigdata_hits_spark.queries import queries
from bigdata_hits_spark.sources.readers import load_table


def test_approx_distinct_within_rsd(spark, sf_dir_oracle):
    approx = {
        r["o_orderstatus"]: r["approx_parts"]
        for r in queries()["sketch_distinct_parts"](spark, sf_dir_oracle).collect()
    }
    li = load_table(spark, sf_dir_oracle, "lineitem")
    orders = load_table(spark, sf_dir_oracle, "orders")
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.05, (k, approx[k], n)


def test_approx_quantiles_ordered_and_bounded(spark, sf_dir_oracle):
    (row,) = queries()["sketch_price_quantiles"](spark, sf_dir_oracle).collect()
    q50, q90, q99 = row["quantiles"]
    assert q50 <= q90 <= q99
    li = load_table(spark, sf_dir_oracle, "lineitem")
    lo, hi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    assert lo <= q50 and q99 <= hi
    # median must sit near the true middle: exact rank check within 2%
    n = li.count()
    rank = li.filter(F.col("l_extendedprice") <= q50).count()
    assert abs(rank / n - 0.5) < 0.02


def test_freq_items_sketch_invariants(spark):
    import random

    from bigdata_hits_spark.operators.sketches import freq_items_sketch

    rng = random.Random(7)
    # zipf-ish: value i appears ~3000/i times, plus uniform noise tail
    vals = []
    for i in range(1, 30):
        vals += [f"v{i:02d}"] * (3000 // i)
    vals += [f"noise{rng.randrange(5000)}" for _ in range(4000)]
    rng.shuffle(vals)
    truth = {}
    for v in vals:
        truth[v] = truth.get(v, 0) + 1
    n = len(vals)
    df = spark.createDataFrame([(v,) for v in vals], "x string").repartition(16)
    cap = 160
    out = freq_items_sketch(df, "x", k=10, capacity=cap).collect()
    assert len(out) == 10
    thresh = n / (cap + 1)
    got = {r["value"]: (r["min_count"], r["max_count"]) for r in out}
    for v, (lo, hi) in got.items():
        assert lo <= truth[v] <= hi, (v, lo, truth[v], hi)
    # every value with freq > n/(cap+1) must be a candidate; the heavy
    # head here clears the threshold by a wide margin and must surface
    for i in range(1, 6):
        v = f"v{i:02d}"
        assert truth[v] > thresh and v in got


def test_freq_items_sketch_exact_when_capacity_covers_vocab(spark):
    from bigdata_hits_spark.operators.sketches import freq_items_sketch

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2 + [(None,)] * 4
    df = spark.createDataFrame(rows, "x string")
    out = {r["value"]: r for r in freq_items_sketch(df, "x", k=3, capacity=10).collect()}
    # vocab fits every per-partition summary: min_count is exact
    assert out["a"]["min_count"] == 5 and out["b"]["min_count"] == 3
    assert out["c"]["min_count"] == 2
    assert None not in out  # NULLs dropped
