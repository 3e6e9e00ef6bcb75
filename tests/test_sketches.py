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
