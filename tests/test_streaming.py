"""Stream-batch equivalence for the event-time operators."""

import os
import shutil

import pandas as pd
import pytest

from bigdata_hits_spark.operators.events import hourly_event_counts, sessionize
from bigdata_hits_spark.sources.readers import load_table
from bigdata_hits_spark.streaming.jobs import (
    hourly_event_counts_stream,
    read_events_stream,
    run_to_memory,
    sessionize_stream,
    transition_pairs_stream,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def events_dir(sf_dir):
    """The file stream source needs a *directory*; stage the single-file
    events parquet into a repo-local temp dir."""
    d = os.path.join(REPO_ROOT, ".tmp_stream_events")
    os.makedirs(d, exist_ok=True)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(d, "part-0.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_hourly_equals_batch(spark, sf_dir, events_dir):
    batch = hourly_event_counts(load_table(spark, sf_dir, "events")).toPandas()
    stream_df = hourly_event_counts_stream(read_events_stream(spark, events_dir))
    run_to_memory(stream_df, "t_hourly")
    streamed = spark.sql("SELECT * FROM t_hourly").toPandas()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df[sorted(df.columns)]
            .sort_values(by=sorted(df.columns))
            .reset_index(drop=True)
        )

    a, b = canon(batch), canon(streamed)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_watermark_present_in_plan(spark, sf_dir, events_dir):
    stream_df = hourly_event_counts_stream(read_events_stream(spark, events_dir))
    assert "EventTimeWatermark" in stream_df._jdf.queryExecution().analyzed().toString()


def test_stream_dedup_drops_redelivered_events(spark, sf_dir, events_dir):
    """A doubled source (same file staged twice) must dedup back to the
    original event count, with bounded (watermarked) state."""
    import shutil as sh
    from bigdata_hits_spark.streaming.jobs import dedup_events_stream

    d2 = os.path.join(REPO_ROOT, ".tmp_stream_events_dup")
    os.makedirs(d2, exist_ok=True)
    sh.copy(f"{sf_dir}/events.parquet", os.path.join(d2, "part-0.parquet"))
    sh.copy(f"{sf_dir}/events.parquet", os.path.join(d2, "part-1.parquet"))
    try:
        deduped = dedup_events_stream(read_events_stream(spark, d2))
        run_to_memory(deduped.select("event_id"), "t_dedup", output_mode="append")
        n = spark.sql("SELECT COUNT(DISTINCT event_id) AS n FROM t_dedup").first()["n"]
        total = spark.sql("SELECT COUNT(*) AS n FROM t_dedup").first()["n"]
        expected = load_table(spark, sf_dir, "events").count()
        assert n == expected
        assert total == expected  # re-deliveries dropped, not just distinct-counted
    finally:
        sh.rmtree(d2, ignore_errors=True)


def test_stream_static_enrichment_equals_batch(spark, sf_dir, events_dir):
    """Stream-static left join (per-user purchase totals attached to the
    event stream) matches the same join done in batch."""
    from pyspark.sql import functions as F

    from bigdata_hits_spark.streaming.jobs import enrich_events_stream

    ev_batch = load_table(spark, sf_dir, "events")
    dim = (
        ev_batch.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 6).alias("lifetime_value"))
    )
    batch = (
        ev_batch.join(F.broadcast(dim), "user_id", "left")
        .select("event_id", "lifetime_value")
        .toPandas()
    )
    enriched = enrich_events_stream(read_events_stream(spark, events_dir), dim)
    run_to_memory(enriched.select("event_id", "lifetime_value"), "t_enriched", "append")
    streamed = spark.sql("SELECT * FROM t_enriched").toPandas()
    a = batch.sort_values("event_id").reset_index(drop=True)
    b = streamed.sort_values("event_id").reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, events_dir):
    """Watermarked stream-stream join (purchases x prior clicks within 1h)
    emits exactly the pairs the equivalent batch interval join produces."""
    from pyspark.sql import functions as F

    from bigdata_hits_spark.streaming.jobs import attribute_purchases_stream

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("purchase_ts")
    )
    batch = (
        purchases.join(
            clicks,
            (F.col("click_user") == F.col("user_id"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 hour")),
        )
        .select("purchase_id", "click_id")
        .toPandas()
    )
    joined = attribute_purchases_stream(read_events_stream(spark, events_dir))
    run_to_memory(joined.select("purchase_id", "click_id"), "t_attrib", "append")
    streamed = spark.sql("SELECT * FROM t_attrib").toPandas()
    key = ["purchase_id", "click_id"]
    a = batch.sort_values(key).reset_index(drop=True)
    b = streamed.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stateful_sessionize_stream_equals_batch(spark, sf_dir, events_dir):
    """applyInPandasWithState sessionizer over a finite stream reproduces
    the batch window-function sessionization exactly (update-mode sink:
    latest row per (user_id, session_idx) is the session's final shape)."""
    batch = sessionize(load_table(spark, sf_dir, "events")).toPandas()
    stream_df = sessionize_stream(read_events_stream(spark, events_dir))
    run_to_memory(stream_df, "t_sessions", output_mode="update")
    streamed = (
        spark.sql("SELECT * FROM t_sessions").toPandas()
        .drop_duplicates(subset=["user_id", "session_idx"], keep="last")
    )
    key = ["user_id", "session_idx"]
    a = batch.sort_values(key).reset_index(drop=True)[sorted(batch.columns)]
    b = streamed.sort_values(key).reset_index(drop=True)[sorted(streamed.columns)]
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_sessionize_stream_event_time_ttl_backfill_equals_batch(spark, tmp_path):
    """Event-time state TTL: a multi-batch backfill with beyond-gap late
    events must still match batch sessionization exactly — users who
    reactivate within gap+ttl (event time) keep their session numbering,
    and users idle past the TTL have their state dropped by watermark
    progress (the fired-timeout path) without affecting the output."""
    import glob
    import os
    import shutil

    from bigdata_hits_spark.operators.events import sessionize
    from bigdata_hits_spark.streaming.jobs import run_to_memory  # noqa: F401  (already imported at module scope in some layouts)

    S = 1_000_000_000  # 1 second in ns
    B = 1_000_000  # base offset (s): epoch-0 event times sit exactly on the
    # initial watermark and are discarded by the late-row filter
    files = [
        # (event_id, ts_ns, user_id)
        [(1, (B + 0) * S, 1), (2, (B + 50) * S, 1), (3, (B + 60) * S, 2)],
        # user1: 120s extends session 0 (gap 70 <= 100); 300s is beyond
        # the gap -> session 1 (the late beyond-gap arrival)
        [(4, (B + 120) * S, 1), (5, (B + 300) * S, 1), (6, (B + 310) * S, 2)],
        # watermark pushers: fire users 1/2 timeouts (last+gap+ttl ~ B+600s)
        [(7, (B + 2000) * S, 3)],
        [(8, (B + 2100) * S, 3)],
    ]
    stream_dir = str(tmp_path / "events_stream")
    os.makedirs(stream_dir)
    for i, rows in enumerate(files):
        staging = str(tmp_path / f"stage_{i}")
        spark.createDataFrame(rows, "event_id long, ts long, user_id long") \
            .coalesce(1).write.parquet(staging)
        (part,) = glob.glob(f"{staging}/part-*.parquet")
        dst = os.path.join(stream_dir, f"f{i}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))

    from bigdata_hits_spark.streaming.jobs import read_events_stream, sessionize_stream

    gap_ns = 100 * S
    stream_df = sessionize_stream(
        read_events_stream(spark, stream_dir, max_files_per_trigger=1),
        gap_ns=gap_ns,
        event_time_ttl_ns=200 * S,
        watermark="10 seconds",
    )
    run_to_memory(stream_df, "t_sessions_ttl", output_mode="update")
    # The memory sink does not guarantee cross-batch row order, so "last
    # row wins" is not reconstructible from scan order; session updates
    # are monotone (n_events/end_s only grow, start_s is fixed), so the
    # latest state per (user, session) is the per-key max/min.
    streamed = (
        spark.sql("SELECT * FROM t_sessions_ttl").toPandas()
        .groupby(["user_id", "session_idx"], as_index=False)
        .agg(n_events=("n_events", "max"), start_s=("start_s", "min"), end_s=("end_s", "max"))
    )

    all_rows = [r for f in files for r in f]
    batch_events = spark.createDataFrame(all_rows, "event_id long, ts_ns long, user_id long")
    batch = sessionize(batch_events, gap_ns=gap_ns).toPandas()

    key = ["user_id", "session_idx"]
    a = batch.sort_values(key).reset_index(drop=True)[sorted(batch.columns)]
    b = streamed.sort_values(key).reset_index(drop=True)[sorted(streamed.columns)]
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # the beyond-gap late arrival really opened a numbered second session
    # (the batch operator's running-sum numbering starts at 1)
    assert set(map(tuple, b[["user_id", "session_idx"]].values)) >= {(1, 1), (1, 2)}


def test_stream_definable_before_data_arrives(spark, tmp_path):
    """An events stream must be definable over an empty (not yet
    populated) directory: schema sniffing has nothing to read, so the
    declared fallback schema kicks in and the normalized columns exist."""
    empty = str(tmp_path / "empty_events")
    os.makedirs(empty, exist_ok=True)
    df = read_events_stream(spark, empty)
    assert df.isStreaming
    assert "ts_ns" in df.columns and "ts" in df.columns


def test_incremental_dedup_stream_builds_corpus(spark, tmp_path):
    """foreachBatch incremental MinHash dedup over a two-micro-batch doc
    stream: intra-batch near-dups collapse, cross-batch near-dups are
    dropped by the signature store, and the store ends with exactly the
    survivors' signatures."""
    from pyspark.sql import types as T

    from bigdata_hits_spark.streaming.jobs import incremental_dedup_stream

    # Non-repeating tokens: ~200 distinct shingles, so a one-word edit
    # keeps Jaccard ~0.97 and banded candidate generation is
    # deterministic-safe (P(no band match) ~ 1e-4 would show as a stable
    # failure here, not flakiness — hashes are fixed).
    words = [f"w{i}" for i in range(200)]
    base = " ".join(words)
    edited = " ".join(w if i != 100 else "CHANGED" for i, w in enumerate(words))
    other = "one two three four five six seven eight nine ten " * 10
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = str(tmp_path / "docs_src")
    # batch 1 (file 0): A and its near-dup A' (one word edited), B
    spark.createDataFrame(
        [(1, base), (2, edited), (3, other)], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # batch 2 (file 1): C = another near-dup of A (must be dropped via
    # the signature store), D = genuinely new
    edited2 = " ".join(w if i != 150 else "ALSOCHANGED" for i, w in enumerate(words))
    spark.createDataFrame(
        [(10, edited2), (11, "completely different words " * 20)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store = str(tmp_path / "sig_store")
    out = str(tmp_path / "survivors")
    q = incremental_dedup_stream(
        stream, store, out, checkpoint=str(tmp_path / "ckpt"), threshold=0.5
    )
    q.awaitTermination()

    surv_ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # Whichever file order maxFilesPerTrigger picks, exactly ONE of the
    # {1, 2, 10} near-dup family survives (intra-batch dedup collapses
    # same-batch members, the signature store kills cross-batch ones),
    # and both distinct docs {3, 11} survive.
    assert len(surv_ids & {1, 2, 10}) == 1, surv_ids
    assert {3, 11} <= surv_ids and len(surv_ids) == 3, surv_ids
    store_rows = spark.read.parquet(store)
    assert {r["id"] for r in store_rows.collect()} == surv_ids
    assert len(store_rows.columns) == 17  # id + h0..h15


def test_stream_sliding_equals_batch(spark, sf_dir, events_dir):
    """Overlapping sliding windows: the F.window(slide) streaming twin
    must emit the same (window_start_s, event_type) aggregate rows as the
    batch sequence-explode formulation."""
    from bigdata_hits_spark.operators.events import sliding_event_counts
    from bigdata_hits_spark.streaming.jobs import sliding_event_counts_stream

    batch = sliding_event_counts(load_table(spark, sf_dir, "events")).toPandas()
    stream_df = sliding_event_counts_stream(read_events_stream(spark, events_dir))
    run_to_memory(stream_df, "t_sliding")
    streamed = spark.sql("SELECT * FROM t_sliding").toPandas()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df[sorted(df.columns)]
            .sort_values(by=sorted(df.columns))
            .reset_index(drop=True)
        )

    a, b = canon(batch), canon(streamed)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_transition_pairs_stream_equals_batch(spark, sf_dir, events_dir):
    """The stateful pair emitter over a finite stream reproduces the
    batch Markov matrix: counting the appended pairs gives exactly
    transition_counts' n per (prev_type, next_type)."""
    from bigdata_hits_spark.operators.events import transition_counts

    batch = (
        transition_counts(load_table(spark, sf_dir, "events"))
        .select("prev_type", "next_type", "n")
        .toPandas()
    )
    stream_df = transition_pairs_stream(read_events_stream(spark, events_dir))
    run_to_memory(stream_df, "t_transitions", output_mode="append")
    streamed = (
        spark.sql(
            "SELECT prev_type, next_type, COUNT(*) AS n FROM t_transitions "
            "GROUP BY 1, 2"
        ).toPandas()
    )
    key = ["prev_type", "next_type"]
    a = batch.sort_values(key).reset_index(drop=True)
    b = streamed.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_rollup_maintenance_stream_equals_direct_agg(spark, tmp_path):
    """Three micro-batches of a retraction stream (inserts, then a mix
    of retractions + inserts) maintain the stored rollup to exactly the
    direct aggregate of the surviving rows; intermediate versions exist
    and pruning keeps the window bounded."""
    from pyspark.sql import functions as F, types as T

    from bigdata_hits_spark.streaming.jobs import rollup_maintenance_stream

    schema = T.StructType(
        [
            T.StructField("sign", T.IntegerType()),
            T.StructField("g", T.StringType()),
            T.StructField("x", T.DoubleType()),
        ]
    )
    src = str(tmp_path / "delta_src")
    # batch A: initial inserts
    spark.createDataFrame(
        [(1, "a", 10.0), (1, "a", 20.0), (1, "b", 5.0), (1, "c", 7.0)], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # batch B: retract one 'a' row, insert into 'b', empty out 'c'
    spark.createDataFrame(
        [(-1, "a", 10.0), (1, "b", 6.0), (-1, "c", 7.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    # batch C: a changed row arrives as retract+insert (d is new)
    spark.createDataFrame(
        [(-1, "a", 20.0), (1, "a", 25.0), (1, "d", 1.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    store = str(tmp_path / "rollup")
    q = rollup_maintenance_stream(
        stream,
        store,
        checkpoint=str(tmp_path / "ckpt"),
        group_cols=["g"],
        sum_cols=["x"],
        keep_versions=2,
    )
    q.awaitTermination()

    import os

    versions = sorted(
        int(d[2:]) for d in os.listdir(store) if d.startswith("v=")
    )
    assert len(versions) == 2, versions  # pruned to keep_versions
    final = {
        r["g"]: (r["n"], r["x"])
        for r in spark.read.parquet(f"{store}/v={versions[-1]}").collect()
    }
    # surviving multiset: a:25, b:(5,6), d:1 — c emptied out and dropped
    assert final == {"a": (1, 25.0), "b": (2, 11.0), "d": (1, 1.0)}


def test_checksum_maintenance_stream_equals_direct_digest(spark, tmp_path):
    """Two micro-batches of a retraction stream maintain the stored
    bucket digest to bit-exactly the direct table_checksum of the
    surviving rows — XOR un-applies retractions, counts add signs."""
    from pyspark.sql import types as T

    from bigdata_hits_spark.operators.relops import table_checksum
    from bigdata_hits_spark.streaming.jobs import checksum_maintenance_stream

    schema = T.StructType(
        [
            T.StructField("sign", T.IntegerType()),
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    src = str(tmp_path / "delta_src")
    spark.createDataFrame(
        [(1, i, f"s{i % 3}") for i in range(30)], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    # retract 5 rows, mutate one (retract+insert), add two new
    batch2 = (
        [(-1, i, f"s{i % 3}") for i in range(5)]
        + [(-1, 17, "s2"), (1, 17, "MUT"), (1, 100, "x"), (1, 101, "y")]
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    store = str(tmp_path / "digest")
    q = checksum_maintenance_stream(
        stream,
        store,
        checkpoint=str(tmp_path / "ckpt"),
        key_cols=["k"],
        cols=["k", "v"],
        buckets=8,
    )
    q.awaitTermination()

    import os

    versions = sorted(int(d[2:]) for d in os.listdir(store) if d.startswith("v="))
    maintained = {
        r["bucket"]: (r["n_rows"], r["xor_hash"], r["sum_hash"])
        for r in spark.read.parquet(f"{store}/v={versions[-1]}").collect()
    }
    survivors = [(i, f"s{i % 3}") for i in range(5, 30) if i != 17] + [
        (17, "MUT"),
        (100, "x"),
        (101, "y"),
    ]
    direct = {
        r["bucket"]: (r["n_rows"], r["xor_hash"], r["sum_hash"])
        for r in table_checksum(
            spark.createDataFrame(survivors, "k long, v string"),
            ["k"],
            ["k", "v"],
            buckets=8,
        ).collect()
    }
    assert maintained == direct


def test_sessionize_stream_group_straddles_arrow_chunks(spark, tmp_path):
    """A group whose micro-batch rows straddle an Arrow
    maxRecordsPerBatch boundary arrives in pdf_iter as MULTIPLE chunks
    in shuffle order; the fold must globally sort the union, because
    sorted(chunk1) + sorted(chunk2) is not sorted(all).  Caught at the
    sf1 smoke (26 of ~950k sessions mis-split, time running backward
    across the chunk seam).  Repro at unit scale: one user, 40 events
    in two-event sessions, rows staged in DECREASING ts order so any
    multi-chunk split feeds the fold out of order; Arrow batches capped
    at 7 rows to force several chunks."""
    import pandas as pd

    from bigdata_hits_spark.operators.events import sessionize
    from bigdata_hits_spark.sources.readers import normalize_events_ts

    gap = 60 * 1_000_000_000  # 60 s sessionizer gap
    base = 1_700_000_000_000_000_000
    rows = []
    for s in range(20):  # session s = events (2s, 2s+1), 10 s apart
        t0 = base + s * 10 * gap
        rows.append((7, 2 * s, t0))
        rows.append((7, 2 * s + 1, t0 + 10_000_000_000))
    rows.sort(key=lambda r: -r[2])  # stage in reverse time order
    stage = str(tmp_path / "events")
    os.makedirs(stage)
    pd.DataFrame(rows, columns=["user_id", "event_id", "ts"]).to_parquet(
        os.path.join(stage, "0.parquet"), index=False
    )

    batch = sessionize(
        normalize_events_ts(spark.read.parquet(stage)), gap_ns=gap
    ).toPandas()
    assert len(batch) == 20  # the construction really is 20 sessions

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        run_to_memory(
            sessionize_stream(read_events_stream(spark, stage), gap_ns=gap),
            "t_seam",
            output_mode="update",
        )
        streamed = (
            spark.sql("SELECT * FROM t_seam").toPandas()
            .drop_duplicates(subset=["user_id", "session_idx"], keep="last")
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
        spark.catalog.dropTempView("t_seam")
    key = ["user_id", "session_idx"]
    a = batch.sort_values(key).reset_index(drop=True)[sorted(batch.columns)]
    b = streamed.sort_values(key).reset_index(drop=True)[sorted(streamed.columns)]
    assert len(b) == 20
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
