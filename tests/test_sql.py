"""SQL entry surface: temp views over testdata + reference graph CSVs.

Parity claims tested here:
- spark.sql over registered views returns the same rows as the DataFrame
  query it mirrors (one relational, one graph-shaped).
- Views are logical, not materialized: filters/projections written in SQL
  still reach the parquet scan (PushedFilters / ReadSchema in the plan).
"""

import os

import pytest
from pyspark.sql import functions as F

from bigdata_hits_spark import sql as sqlmod
from bigdata_hits_spark.sources.readers import load_table

REF_NODES = "/root/reference/data/nodes_elab.csv"


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    return sqlmod.register_testdata_views(spark, sf_dir)


def test_views_cover_all_tables(views):
    assert set(views) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }


def test_sql_matches_dataframe_join_agg(spark, sf_dir, views):
    got = sqlmod.sql(
        spark,
        "SELECT n_name, COUNT(*) AS n_cust FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name",
    )
    want = (
        load_table(spark, sf_dir, "customer")
        .join(load_table(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sql_events_view_exposes_normalized_schema(spark, views):
    row = sqlmod.sql(
        spark, "SELECT ts_ns, ts FROM events ORDER BY ts_ns LIMIT 1"
    ).first()
    # ts is the microsecond truncation of ts_ns (readers.py contract).
    assert row.ts_ns // 1000 == int(row.ts.timestamp() * 1_000_000)


def test_sql_pushdown_survives_view(spark, views):
    plan = sqlmod.sql(
        spark,
        "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'",
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)" in plan
    # Column pruning: the scan reads only the two referenced columns.
    assert "o_totalprice" not in plan


@pytest.mark.skipif(not os.path.exists(REF_NODES), reason="reference checkout absent")
def test_sql_over_reference_graph_csv(spark):
    assert sqlmod.register_graph_views(spark, REF_NODES) == ("nodes",)
    got = sqlmod.sql(
        spark, "SELECT COUNT(DISTINCT labels) AS n_labels FROM nodes"
    ).first()
    # 20 distinct labels per the committed golden output
    # (/root/reference/outputs/node_topics.txt/part-00000).
    assert got.n_labels == 20


def test_hourly_gapfill_dense_grid(spark):
    from bigdata_hits_spark.operators.events import HOUR_NS, hourly_counts_gapfilled

    rows = [
        # type 'a': events in hours 10 and 13 -> 11 and 12 must appear as 0
        (1, "a", 10 * HOUR_NS + 5, 1.0),
        (2, "a", 13 * HOUR_NS + 5, 2.0),
        # type 'b': single hour -> exactly one row
        (3, "b", 11 * HOUR_NS, 4.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts_ns long, value double")
    got = {(r["event_type"], r["bucket_hour"]): (r["n"], r["total_value"])
           for r in hourly_counts_gapfilled(df).collect()}
    assert got[("a", 10)] == (1, 1.0) and got[("a", 13)] == (1, 2.0)
    assert got[("a", 11)] == (0, 0.0) and got[("a", 12)] == (0, 0.0)
    assert got[("b", 11)] == (1, 4.0)
    assert len(got) == 5


def test_funnel_steps_ordering_is_strict(spark):
    from bigdata_hits_spark.operators.events import funnel_steps

    rows = [
        # u1 completes all three in order
        (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
        # u2 clicked BEFORE viewing: click must not count; re-click later does
        (2, "click", 50), (2, "view", 100),
        # u3 only views
        (3, "view", 10),
        # u4 never views: excluded entirely despite a purchase
        (4, "purchase", 999),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts_ns long")
    got = {r["user_id"]: r for r in
           funnel_steps(df, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1]["t_1"], got[1]["t_2"], got[1]["t_3"], got[1]["n_steps"]) == (100, 200, 300, 3)
    assert got[2]["n_steps"] == 1 and got[2]["t_2"] is None
    assert got[3]["n_steps"] == 1


def test_cohort_retention_triangle(spark):
    from bigdata_hits_spark.operators.events import cohort_retention

    D = 10  # tiny grain for readability
    rows = [
        # u1 first on day 0, returns day 2 (twice -> still one user-day)
        (1, 0 * D), (1, 2 * D), (1, 2 * D + 1),
        # u2 first on day 0 only
        (2, 0 * D + 3),
        # u3 first on day 1, returns day 2
        (3, 1 * D), (3, 2 * D),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_ns long")
    got = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in cohort_retention(df, grain_ns=D).collect()}
    assert got == {(0, 0): 2, (0, 2): 1, (1, 0): 1, (1, 1): 1}


def test_funnel_steps_sessioned_requires_same_session(spark):
    """Within-session funnel: a conversion straddling a session gap does
    NOT count; each (user, session) with a step-1 event gets its own
    row; ordering inside the session stays strict."""
    from bigdata_hits_spark.operators.events import funnel_steps_sessioned

    gap = 1_000
    rows = [
        # u1 session 1: full in-session conversion
        (1, 1, "view", 100), (1, 2, "click", 200), (1, 3, "purchase", 300),
        # u1 session 2 (after the gap): view only
        (1, 4, "view", 10_000),
        # u2: views, then clicks in a LATER session — no conversion
        (2, 5, "view", 100), (2, 6, "click", 50_000),
        # u3: click before view inside one session — strict order holds
        (3, 7, "click", 100), (3, 8, "view", 200), (3, 9, "click", 300),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_ns long"
    )
    got = {
        (r["user_id"], r["session_idx"]): r
        for r in funnel_steps_sessioned(df, ["view", "click", "purchase"], gap_ns=gap).collect()
    }
    assert set(got) == {(1, 1), (1, 2), (2, 1), (3, 1)}
    assert got[(1, 1)]["n_steps"] == 3
    assert got[(1, 2)]["n_steps"] == 1
    assert got[(2, 1)]["n_steps"] == 1 and got[(2, 1)]["t_2"] is None
    assert got[(3, 1)]["n_steps"] == 2 and got[(3, 1)]["t_2"] == 300
