"""Primitive operator tests, including the OR-semi-join rewrite equivalence
(the one subtle scale rewrite — SURVEY §2.1 O9)."""

import pytest
from pyspark.sql import functions as F

from bigdata_hits_spark.operators import relops


@pytest.fixture(scope="module")
def edges(spark):
    rows = [("a", "c", 1.0), ("b", "c", 2.0), ("c", "d", 1.0), ("a", "d", 3.0), ("a", "c", 1.0)]
    return spark.createDataFrame(rows, ["src", "dst", "w"])


@pytest.fixture(scope="module")
def topic(spark):
    return spark.createDataFrame([("a",), ("d",)], ["id"])


def test_semi_join_or_equals_or_predicate_semi_join(spark, edges, topic):
    """The marker rewrite must match Spark's own OR-predicate leftsemi
    (which plans as BroadcastNestedLoopJoin) row-for-row, duplicates
    included."""
    rewritten = relops.semi_join_or(edges, [(topic, "src", "id"), (topic, "dst", "id")])
    reference = edges.join(
        topic, on=(edges["src"] == topic["id"]) | (edges["dst"] == topic["id"]), how="leftsemi"
    )
    got = sorted((r["src"], r["dst"], r["w"]) for r in rewritten.collect())
    want = sorted((r["src"], r["dst"], r["w"]) for r in reference.collect())
    assert got == want
    assert len(got) == 4  # (a,c)x2, (c,d), (a,d)


def test_semi_join_or_no_bnlj_in_plan(spark, edges, topic):
    plan = relops.semi_join_or(
        edges, [(topic, "src", "id"), (topic, "dst", "id")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_top_k_deterministic_with_ties(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 1.0), ("c", 1.0)], ["id", "v"])
    rows = [r["id"] for r in relops.top_k(df, "v", 2, "id").collect()]
    assert rows == ["a", "b"]


def test_degrees_weighted(spark, edges):
    deg = {r["id"]: r["wd"] for r in relops.degrees(edges, "src", weight="w", out_col="wd").collect()}
    assert deg == {"a": 5.0, "b": 2.0, "c": 1.0}


def test_bernoulli_sample_seeded_deterministic(spark):
    """O19 — seeded sampling: same seed reproduces the identical row set
    (rows-only in the driver gate since seeds aren't portable across
    engines — this pins the within-engine contract), and the fraction is
    approximately honored."""
    df = spark.range(10_000)
    a = {r["id"] for r in relops.bernoulli_sample(df, 0.1, seed=81).collect()}
    b = {r["id"] for r in relops.bernoulli_sample(df, 0.1, seed=81).collect()}
    c = {r["id"] for r in relops.bernoulli_sample(df, 0.1, seed=82).collect()}
    assert a == b
    assert a != c  # different seed, different draw
    assert 700 <= len(a) <= 1300  # Bernoulli(0.1) over 10k rows


def test_grand_norm_l2(spark):
    df = spark.createDataFrame([(3.0,), (4.0,)], ["x"])
    assert relops.grand_norm(df, "x", "l2").first()["norm"] == pytest.approx(5.0)


def test_snapshot_diff_classifies_all_three(spark):
    from bigdata_hits_spark.operators.relops import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0)],
        "k long, v string, x double",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 changed (v), 3 deleted, 4 changed TO NULL x, 5 inserted
        [(1, "a", 1.0), (2, "B", 2.0), (4, None, None), (5, "e", 5.0)],
        "k long, v string, x double",
    )
    got = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(got) == {2, 3, 4, 5}
    assert got[2]["status"] == "changed" and got[2]["v"] == "B"
    assert got[3]["status"] == "deleted" and got[3]["v"] == "c"
    # a change TO NULL reports NULL, not the old value
    assert got[4]["status"] == "changed" and got[4]["x"] is None
    assert got[5]["status"] == "inserted" and got[5]["v"] == "e"
    # identical snapshots diff to nothing
    assert snapshot_diff(old, old, ["k"]).count() == 0


def test_snapshot_diff_reconstructs_new_snapshot(spark):
    """Apply-the-diff invariant on a randomized pair of snapshots:
    (old minus deleted/changed keys) + changed + inserted == new,
    exactly — so the diff is a complete, minimal change set."""
    import random

    rng = random.Random(42)
    old_rows = [
        (k, rng.choice(["a", "b", None]), rng.choice([1.0, 2.0, None]))
        for k in range(200)
    ]
    new_rows = []
    for k, v, x in old_rows:
        r = rng.random()
        if r < 0.2:
            continue  # deleted
        if r < 0.5:
            new_rows.append((k, rng.choice(["a", "b", "z", None]), x))  # maybe changed
        else:
            new_rows.append((k, v, x))  # unchanged
    new_rows += [(k, "ins", 9.0) for k in range(300, 320)]
    from bigdata_hits_spark.operators.relops import snapshot_diff

    schema = "k long, v string, x double"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    diff = snapshot_diff(old, new, ["k"]).collect()

    old_map = {k: (v, x) for k, v, x in old_rows}
    rebuilt = dict(old_map)
    for r in diff:
        if r["status"] == "deleted":
            assert old_map[r["k"]] == (r["v"], r["x"])  # reports old values
            del rebuilt[r["k"]]
        else:
            rebuilt[r["k"]] = (r["v"], r["x"])
    assert rebuilt == {k: (v, x) for k, v, x in new_rows}
    # minimality: no diff row for a key whose values are identical
    new_map = {k: (v, x) for k, v, x in new_rows}
    for r in diff:
        if r["status"] == "changed":
            assert old_map[r["k"]] != new_map[r["k"]], r


def test_snapshot_diff_null_key_rows_classify(spark):
    """A legitimately-NULL key is a key value like any other: presence is
    tracked by literal marker columns, so a NULL-keyed row present in
    both sides with a changed value classifies `changed` (not a phantom
    insert/delete), and NULL-keyed one-sided rows classify
    inserted/deleted correctly."""
    from bigdata_hits_spark.operators.relops import snapshot_diff

    old = spark.createDataFrame(
        [(None, "a"), (1, "x"), (2, "gone")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(None, "b"), (1, "x"), (3, "fresh")], "k int, v string"
    )
    got = {r["k"]: (r["status"], r["v"]) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got[None] == ("changed", "b")
    assert got[2] == ("deleted", "gone")
    assert got[3] == ("inserted", "fresh")
    assert 1 not in got
    # NULL-keyed unchanged rows are omitted like any other unchanged row
    same = spark.createDataFrame([(None, "a")], "k int, v string")
    assert snapshot_diff(same, same, ["k"]).count() == 0


def test_snapshot_delta_retraction_stream(spark):
    from bigdata_hits_spark.operators.relops import snapshot_delta

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "k long, g string, x double",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 changed (x), 3 deleted, 5 inserted
        [(1, "a", 1.0), (2, "b", 9.0), (5, "e", 5.0)],
        "k long, g string, x double",
    )
    rows = sorted(
        snapshot_delta(old, new, ["k"]).collect(), key=lambda r: (r["k"], r["sign"])
    )
    got = [(r["k"], r["sign"], r["g"], r["x"]) for r in rows]
    assert got == [
        (2, -1, "b", 2.0),  # retraction carries OLD values
        (2, 1, "b", 9.0),  # insertion carries NEW values
        (3, -1, "c", 3.0),
        (5, 1, "e", 5.0),
    ]
    # identical snapshots produce an empty stream
    assert snapshot_delta(old, old, ["k"]).count() == 0


def test_snapshot_delta_ignores_out_of_scope_changes(spark):
    from bigdata_hits_spark.operators.relops import snapshot_delta

    old = spark.createDataFrame([(1, "a", 1.0)], "k long, g string, x double")
    new = spark.createDataFrame([(1, "Z", 1.0)], "k long, g string, x double")
    # g changed but only x is in scope: a rollup over x cannot depend on g
    assert snapshot_delta(old, new, ["k"], cols=["x"]).count() == 0


def test_apply_delta_rollup_matches_direct_recompute(spark):
    from pyspark.sql import functions as F

    from bigdata_hits_spark.operators.relops import (
        apply_delta_rollup,
        snapshot_delta,
    )

    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "a", 20.0),
            (3, "b", 30.0),
            (4, "b", None),  # NULL measure: counted, not summed
            (5, None, 50.0),  # NULL group key is a group like any other
            (6, "c", 60.0),
        ],
        "k long, g string, x double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),  # unchanged
            (2, "a", 25.0),  # changed measure
            (3, "a", 30.0),  # changed GROUP: moves b -> a
            (4, "b", 40.0),  # NULL measure filled in
            (5, None, 55.0),  # NULL-group change
            (7, "d", 70.0),  # inserted into a brand-new group
            # 6 deleted: group c must vanish (count reaches zero)
        ],
        "k long, g string, x double",
    )
    old_agg = old.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("x")
    )
    delta = snapshot_delta(old, new, ["k"])
    maintained = apply_delta_rollup(old_agg, delta, ["g"], ["x"])
    direct = new.groupBy("g").agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("x"))
    as_map = lambda df: {
        r["g"]: (r["n"], r["x"]) for r in df.collect()
    }
    assert as_map(maintained) == as_map(direct)
    assert "c" not in as_map(maintained)  # emptied group dropped
    assert "d" in as_map(maintained)  # brand-new group appeared


def test_apply_delta_rollup_rejects_empty_groups(spark):
    from bigdata_hits_spark.operators.relops import apply_delta_rollup

    df = spark.createDataFrame([(1, 1, 1.0)], "sign int, n long, x double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="group column"):
        apply_delta_rollup(df, df, [], ["x"])


def test_latest_by_key_compacts_changelog(spark):
    from bigdata_hits_spark.operators.relops import latest_by_key

    log = spark.createDataFrame(
        [
            ("u1", 1, 10, "a"),
            ("u1", 3, 11, "c"),  # winner: latest ts
            ("u1", 2, 12, "b"),
            ("u2", 5, 20, "x"),
            ("u2", 5, 21, "y"),  # ts tie -> higher seq wins
            ("u3", 9, 30, "only"),
        ],
        "k string, ts long, seq long, v string",
    )
    got = {
        r["k"]: (r["ts"], r["seq"], r["v"])
        for r in latest_by_key(log, ["k"], ["ts", "seq"]).collect()
    }
    assert got == {
        "u1": (3, 11, "c"),
        "u2": (5, 21, "y"),
        "u3": (9, 30, "only"),
    }
    # explicit payload selection drops the rest
    slim = latest_by_key(log, ["k"], ["ts", "seq"], payload_cols=["v"])
    assert set(slim.columns) == {"k", "v"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="order_cols"):
        latest_by_key(log, ["k"], [])


def test_table_checksum_detects_single_row_change(spark):
    from bigdata_hits_spark.operators.relops import table_checksum

    rows = [(i, f"s{i % 3}") for i in range(50)]
    a = spark.createDataFrame(rows, "k long, v string")
    changed = [(i, "MUTATED" if i == 17 else f"s{i % 3}") for i in range(50)]
    b = spark.createDataFrame(changed, "k long, v string")
    ca = {r["bucket"]: r for r in table_checksum(a, ["k"], buckets=8).collect()}
    cb = {r["bucket"]: r for r in table_checksum(b, ["k"], buckets=8).collect()}
    diff = [
        bkt
        for bkt in ca
        if (ca[bkt]["n_rows"], ca[bkt]["xor_hash"], ca[bkt]["sum_hash"])
        != (cb[bkt]["n_rows"], cb[bkt]["xor_hash"], cb[bkt]["sum_hash"])
    ]
    # key bucketing: the one modified row perturbs exactly one bucket,
    # and counts there still match (no add/drop)
    assert len(diff) == 1
    assert ca[diff[0]]["n_rows"] == cb[diff[0]]["n_rows"]


def test_table_checksum_order_and_partition_invariant(spark):
    from bigdata_hits_spark.operators.relops import table_checksum

    rows = [(i, i * 2.0) for i in range(40)]
    a = spark.createDataFrame(rows, "k long, v double")
    b = spark.createDataFrame(list(reversed(rows)), "k long, v double").repartition(7)
    key = lambda r: (r["bucket"],)  # noqa: E731
    assert sorted(map(tuple, table_checksum(a, ["k"], ["k"]).collect()), key=lambda t: t[0]) == \
        sorted(map(tuple, table_checksum(b, ["k"], ["k"]).collect()), key=lambda t: t[0])


def test_table_checksum_null_vs_empty_string_differ(spark):
    from bigdata_hits_spark.operators.relops import table_checksum

    a = spark.createDataFrame([(1, None)], "k long, v string")
    b = spark.createDataFrame([(1, "")], "k long, v string")
    ra = table_checksum(a, ["k"]).collect()[0]
    rb = table_checksum(b, ["k"]).collect()[0]
    assert ra["xor_hash"] != rb["xor_hash"]
