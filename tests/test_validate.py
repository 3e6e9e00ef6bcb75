"""Data-quality validation (operators/validate.py): every rule kind
against a frame with planted violations, NULL conventions, and the
one-pass plan shape."""

import pytest
from pyspark.sql import functions as F

from bigdata_hits_spark.operators import validate as V


@pytest.fixture()
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, "O", 10.0, "1-URGENT"),
            (1, "F", 250.0, "5-LOW"),  # duplicate key, price over range
            (None, "X", -5.0, "bad"),  # null key, bad status/range/format
            (3, "P", 100.0, "3-MEDIUM"),
        ],
        "k long, status string, price double, prio string",
    )


def _res(df):
    return {(r["rule"], r["column"]): (r["violations"], r["total"], r["passed"]) for r in df.collect()}


def test_row_rules_count_planted_violations(spark, dirty):
    got = _res(
        V.check_table(
            dirty,
            [
                V.not_null("k"),
                V.unique("k"),
                V.accepted_values("status", ["O", "F", "P"]),
                V.in_range("price", 0.0, 200.0),
                V.matches("prio", "^[1-5]-"),
            ],
        )
    )
    assert got[("not_null", "k")] == (1, 4, False)
    # 4 rows, distinct non-null keys {1, 3} -> 2 "duplicate" rows (the
    # NULL-keyed row counts as a row but never as a key)
    assert got[("unique", "k")] == (2, 4, False)
    assert got[("accepted_values", "status")] == (1, 4, False)
    assert got[("in_range", "price")] == (2, 4, False)
    assert got[("matches", "prio")] == (1, 4, False)


def test_nulls_pass_non_notnull_rules(spark):
    df = spark.createDataFrame(
        [(None, None, None)], "s string, x double, r string"
    )
    got = _res(
        V.check_table(
            df,
            [
                V.accepted_values("s", ["A"]),
                V.in_range("x", 0.0, 1.0),
                V.matches("r", "^z"),
            ],
        )
    )
    assert all(v == (0, 1, True) for v in got.values())


def test_foreign_key_counts_orphans_and_passes_nulls(spark, dirty):
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    got = _res(V.check_table(dirty, [V.foreign_key("k", parent, "pk")]))
    # k=3 is an orphan (1 row); the NULL key passes per SQL convention
    assert got[("foreign_key", "k")] == (1, 4, False)


def test_all_green_suite(spark):
    df = spark.createDataFrame([(1, "O"), (2, "F")], "k long, status string")
    out = V.check_table(
        df, [V.not_null("k"), V.unique("k"), V.accepted_values("status", ["O", "F"])]
    )
    assert [r["passed"] for r in out.collect()] == [True, True, True]


def test_row_rules_are_one_pass(spark, dirty):
    """All row-level rules compile into a single aggregate over a single
    scan: exactly one HashAggregate pair / no join in the plan."""
    out = V.check_table(
        dirty, [V.not_null("k"), V.in_range("price", 0.0, 1.0), V.matches("prio", "x")]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan") <= 2  # the source scan (plus AQE re-print)


def test_empty_rules_raise(spark, dirty):
    with pytest.raises(ValueError, match="at least one rule"):
        V.check_table(dirty, [])
