"""asof_join unit semantics on a hand-computed micrograph of ticks."""

from bigdata_hits_spark.operators.asof import asof_join


def _result(spark, tolerance=None):
    left = spark.createDataFrame(
        [(1, 100, "l1"), (1, 205, "l2"), (1, 300, "l3"), (2, 50, "l4")],
        "k long, t long, lname string",
    )
    right = spark.createDataFrame(
        [(1, 100, 10, 1.0), (1, 200, 11, 2.0), (1, 200, 12, 3.0), (3, 1, 13, 4.0)],
        "k long, t long, rid long, rv double",
    )
    rows = asof_join(
        left, right, on="t", by="k", value_cols=["rid", "rv"], tiebreak="rid",
        tolerance=tolerance,
    ).collect()
    return {r["lname"]: (r["rid_r"], r["rv_r"]) for r in rows}


def test_asof_backward_inclusive_with_tiebreak(spark):
    got = _result(spark)
    assert got["l1"] == (10, 1.0)  # equal timestamp matches (inclusive)
    assert got["l2"] == (12, 3.0)  # duplicate right ts -> highest tiebreak
    assert got["l3"] == (12, 3.0)  # carried forward
    assert got["l4"] == (None, None)  # key with no right rows -> nulls


def test_asof_tolerance_nulls_stale_matches(spark):
    got = _result(spark, tolerance=10)
    assert got["l1"] == (10, 1.0)  # age 0 <= 10
    assert got["l2"] == (12, 3.0)  # age 205-200=5 <= 10
    assert _result(spark, tolerance=4)["l2"] == (None, None)  # age 5 > 4
    assert _result(spark, tolerance=50)["l3"] == (None, None)  # age 100 > 50
