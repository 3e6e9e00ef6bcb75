"""Structured Streaming twins of the event-time batch operators.

The reference has no streaming surface (SURVEY §2.3); these are part of
the engine's beyond-reference pipeline story: the same event-time logic as
``operators/events.py`` expressed as incremental queries with watermarks,
so a 100 TB/day event feed computes the identical aggregates a backfill
batch job would.

Local testing drives them with ``trigger(availableNow=True)`` over a
parquet directory and a memory sink (tests/test_streaming.py), asserting
stream-batch equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from bigdata_hits_spark.operators.events import HOUR_NS
from bigdata_hits_spark.sources.readers import normalize_events_ts, set_events_compat_conf


#: Declared fallback schema for an events stream whose directory is still
#: empty at stream-definition time (no parquet footer to sniff): the
#: engine's canonical int64-epoch-nanos encoding, which
#: ``normalize_events_ts`` dispatches on like any sniffed schema.
DEFAULT_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # epoch nanoseconds
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """File-source stream over an events parquet directory, normalized to
    the engine's (ts_ns, ts) convention via the SAME helper the batch
    reader uses (sources/readers.py normalize_events_ts), so stream and
    batch twins agree and cannot drift on an encoding change.

    A file-source stream requires a declared schema; rather than
    hardcoding one encoding of ``ts`` (the driver has already flipped
    encodings between rounds — int64 nanos, then microsecond
    TIMESTAMP_NTZ), the directory's ACTUAL schema is sniffed with a
    one-off batch metadata read (parquet footers only, no data scan) and
    the matching normalization is selected by ``normalize_events_ts``'s
    dtype dispatch.  A stream may legitimately be defined BEFORE any data
    arrives (an empty or not-yet-created directory has nothing to sniff);
    then the caller-supplied ``schema`` — or, failing that,
    :data:`DEFAULT_EVENTS_SCHEMA` — keeps the definition working, and the
    dtype dispatch normalizes whichever encoding was declared."""
    set_events_compat_conf(spark)
    raw_schema = schema
    if raw_schema is None:
        try:
            raw_schema = spark.read.parquet(path).schema
        except Exception:
            raw_schema = DEFAULT_EVENTS_SCHEMA
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_events_ts(reader.parquet(path))


def hourly_event_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming tumbling-window counts.  Watermark bounds state for late
    data; the window start is re-expressed as the same epoch-hour bucket
    the batch operator emits, so outputs are directly comparable."""
    windowed = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
    )
    return windowed.select(
        # Integer div on epoch seconds (== ts_ns div HOUR_NS for whole-hour
        # window starts) — Column `/` is double division, which silently
        # loses integer precision past 2^53.
        F.expr("unix_timestamp(window.start) div 3600").alias("bucket_hour"),
        "event_type",
        "n",
        "total_value",
    )


def sliding_event_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sliding-window counts — the overlapping-window twin of
    ``operators/events.py sliding_event_counts``.  ``F.window`` with a
    slide assigns each event to window/slide overlapping windows in
    state; the watermark expires them.  Window starts re-expressed as
    slide-aligned epoch seconds, directly comparable to the batch op."""
    windowed = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
    )
    return windowed.select(
        F.expr("unix_timestamp(window.start)").alias("window_start_s"),
        "event_type",
        "n",
        "total_value",
    )


#: Output schema of the stateful sessionizer — matches the batch operator
#: (operators/events.py sessionize) so stream-vs-batch equivalence is a
#: straight row comparison.
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_idx", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_s", T.LongType()),
        T.StructField("end_s", T.LongType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_idx", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_ns", T.LongType()),
        T.StructField("last_ns", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_ns: int = 1_800_000_000_000,
    state_timeout_ms: int | None = None,
    event_time_ttl_ns: int | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator
    (``applyInPandasWithState`` — the reference has nothing stateful; this
    is the engine's scale path for continuous session rollups).

    State per user: (current session index, event count, start, last ts).
    Each micro-batch folds its arrivals in ts order: a gap > ``gap_ns``
    closes the current session and opens the next.  Every session touched
    in the batch is (re-)emitted, so the sink's LATEST row per
    (user_id, session_idx) is the session's current shape — update-sink
    semantics.

    Two opt-in state bounds (mutually exclusive; default NoTimeout):

    - ``state_timeout_ms`` — processing-time: idle users' state drops
      after that much WALL-CLOCK time.  Unsuitable for ``availableNow``
      finite backfills (keeps the run spinning state-cleanup triggers)
      and for backfills generally (wall-clock has no relation to the
      backfill's event-time progress).
    - ``event_time_ttl_ns`` — event-time (the watermark analogue): a
      ``watermark`` is declared on ``ts`` and each user's state expires
      once the watermark passes ``last event + gap_ns + ttl``, so state
      is bounded by EVENT-time progress — exactly what a skewed backfill
      needs (a fast partition racing ahead in wall-clock cannot evict
      users the slow partition will still extend).  Sessions stay
      batch-equivalent for any user whose next event arrives within
      gap + ttl of event time; a user silent longer than that restarts
      session numbering at 0 (the documented trade for dropping state —
      session CONTENTS are always final by then, only the index
      continuity is lost).

    In-order delivery per user is assumed within and across batches
    (events later than an already-closed session extend the CURRENT
    session, they do not reopen history) — the standard trade of
    single-pass sessionization.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if state_timeout_ms is not None and event_time_ttl_ns is not None:
        raise ValueError("state_timeout_ms and event_time_ttl_ns are mutually exclusive")

    def fold(key, pdf_iter, state: GroupState):
        import numpy as np

        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            session_idx, n_events, start_ns, last_ns = state.get
        else:
            session_idx, n_events, start_ns, last_ns = 0, 0, None, None
        touched: dict[int, tuple[int, int, int]] = {}
        # Concatenate ALL Arrow chunks BEFORE sorting: a group whose
        # rows straddle a maxRecordsPerBatch boundary arrives as
        # multiple pdfs in shuffle order, and sorted(chunk1) +
        # sorted(chunk2) is not sorted(all) — per-chunk sorting
        # mis-sessionized 26 of ~950k sessions at the sf1 smoke (time
        # running backward across the chunk seam), invisible at small
        # scale where every group fits one chunk.  The concat's bound is
        # PER-KEY ROWS PER MICRO-BATCH (not state size): a hot key in an
        # availableNow backfill holds all its batch rows in the worker at
        # once, so callers size maxFilesPerTrigger / trigger interval to
        # keep per-key batch volume sane; if that assumption ever breaks,
        # swap for heapq.merge over per-chunk sorts.
        pdfs = [p for p in pdf_iter if len(p)]
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
            pdf = pdf.sort_values(["ts_ns", "event_id"])
            ts = pdf["ts_ns"].to_numpy()
            # Vectorized gap detection: flag rows whose distance to the
            # previous event (carried state for row 0) exceeds the gap,
            # then a cumulative sum numbers the sessions.
            prev = np.empty_like(ts)
            prev[1:] = ts[:-1]
            prev[0] = last_ns if last_ns is not None else ts[0] - gap_ns - 1
            idx = session_idx + np.cumsum((ts - prev) > gap_ns)
            agg = pd.DataFrame({"idx": idx, "ts": ts}).groupby("idx")["ts"].agg(
                ["count", "min", "max"]
            )
            for sid, row in agg.iterrows():
                cnt, mn, mx = int(row["count"]), int(row["min"]), int(row["max"])
                if sid == session_idx and start_ns is not None:
                    cnt += n_events  # continues the carried session
                    mn = start_ns
                touched[sid] = (cnt, mn, mx)
            session_idx = int(idx[-1])
            n_events, start_ns, last_ns = touched[session_idx]
        state.update((session_idx, n_events, start_ns, last_ns))
        if state_timeout_ms is not None:
            state.setTimeoutDuration(state_timeout_ms)
        elif event_time_ttl_ns is not None and last_ns is not None:
            # Expire once the watermark passes last + gap + ttl; a
            # timestamp at or below the current watermark is rejected by
            # the state store, so clamp just above it (fires next round).
            candidate_ms = (last_ns + gap_ns + event_time_ttl_ns) // 1_000_000
            state.setTimeoutTimestamp(max(candidate_ms, state.getCurrentWatermarkMs() + 1))
        if touched:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(touched),
                    "session_idx": list(touched.keys()),
                    "n_events": [v[0] for v in touched.values()],
                    "start_s": [v[1] // 1_000_000_000 for v in touched.values()],
                    "end_s": [v[2] // 1_000_000_000 for v in touched.values()],
                }
            )

    if event_time_ttl_ns is not None:
        # EventTimeTimeout requires a declared watermark; the event-time
        # column rides along so the operator can track it (the fold keys
        # off ts_ns as before).
        src = events.withWatermark("ts", watermark).select(
            "user_id", "event_id", "ts_ns", "ts"
        )
        timeout_conf = GroupStateTimeout.EventTimeTimeout
    elif state_timeout_ms is not None:
        src = events.select("user_id", "event_id", "ts_ns")
        timeout_conf = GroupStateTimeout.ProcessingTimeTimeout
    else:
        src = events.select("user_id", "event_id", "ts_ns")
        timeout_conf = GroupStateTimeout.NoTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )


_TRANSITION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_type", T.StringType()),
        T.StructField("last_ts", T.LongType()),
    ]
)

_TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("prev_type", T.StringType()),
        T.StructField("next_type", T.StringType()),
    ]
)


def transition_pairs_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch Markov matrix (operators/events.py
    transition_counts), split at its natural streaming seam: this
    operator emits the per-user (prev_type, next_type) PAIRS
    incrementally (append mode — a pair, once its successor event
    arrives, is final), and the |types|^2-sized counting/normalization
    is the consumer's trivial rollup over the sink.

    State per user is (last event type, last ts) — two fields, the
    minimum for sequence continuation across micro-batches.  In-order
    delivery per user is assumed within and across batches, the same
    single-pass trade sessionize_stream documents.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdf_iter, state: GroupState):
        last_type, last_ts = state.get if state.exists else (None, None)
        prevs, nexts = [], []
        # Concat before sorting (same Arrow-chunk-seam hazard as
        # sessionize_stream: per-chunk sorting is not a global sort
        # when a group straddles a maxRecordsPerBatch boundary).
        pdfs = [p for p in pdf_iter if len(p)]
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
            pdf = pdf.sort_values(["ts_ns", "event_id"])
            for t in pdf["event_type"]:
                if last_type is not None:
                    prevs.append(last_type)
                    nexts.append(t)
                last_type = t
            last_ts = int(pdf["ts_ns"].iloc[-1])
        state.update((last_type, last_ts))
        if prevs:
            yield pd.DataFrame({"prev_type": prevs, "next_type": nexts})

    src = events.select("user_id", "event_id", "ts_ns", "event_type")
    return src.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=_TRANSITION_SCHEMA,
        stateStructType=_TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event ids: at-least-once sources re-deliver,
    ``dropDuplicatesWithinWatermark`` makes the pipe effectively-once with
    BOUNDED state — dedup state for an id is dropped once the watermark
    passes it, unlike plain dropDuplicates whose state grows forever."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def enrich_events_stream(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: attach a (small, slowly-changing)
    dimension to a live event stream — the standard feature-attach shape
    in a training-data pipeline (e.g. per-user aggregates, account tier,
    embedding cluster id).

    Stateless: a stream-static join keeps NO streaming state; the static
    side is re-planned per micro-batch (so an updated dim parquet is
    picked up on the next trigger) and broadcast explicitly — at 100 TB
    of stream the dim is the small side by construction, and without the
    hint a stats-less static frame can fall back to a per-batch shuffle.
    Left join so dimension gaps don't drop events."""
    return events.join(F.broadcast(dim), on, "left")


def attribute_purchases_stream(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding ``horizon`` — the streaming twin of the
    batch as-of/attribution shape (operators/asof.py), expressed as
    Spark's watermarked stream-stream join.

    Both sides carry watermarks and the join condition bounds event-time
    distance (``click_ts in [purchase_ts - horizon, purchase_ts]``), so
    join state is BOUNDED: a buffered click is dropped once the purchase
    watermark passes ``click_ts + horizon``.  Without the time bound (or
    the watermarks) state grows without limit — the documented
    requirement for production stream-stream joins.

    Inner join: late clicks past the watermark simply miss attribution.
    Output one row per (click, purchase) pair inside the horizon;
    downstream consumers pick last-touch by max(click_ts) per purchase.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("click_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ts", "purchase_value", "click_id", "click_ts")


def run_to_memory(stream_df: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drain a finite stream into an in-memory table (availableNow) and
    block until done.  Returns the StreamingQuery (already terminated)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def incremental_dedup_stream(
    docs_stream: DataFrame,
    signature_store: str,
    survivors_out: str,
    checkpoint: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Continuous corpus construction: dedup a document STREAM against a
    persistent signature-only store via ``foreachBatch`` +
    ``operators/dedup.py minhash_dedup_incremental``.

    Per micro-batch: (1) exact MinHash+LSH dedup within the batch, (2)
    estimated dedup against the signature store (historical bodies are
    NEVER re-read — the store is 16 longs per historical doc), (3)
    survivors appended to ``survivors_out``, their signatures appended to
    the store, preserving the state invariant for the next batch.  The
    sequential micro-batch discipline of foreachBatch is exactly the
    consistency the incremental operator needs: batch N+1 sees batch N's
    signatures.  Restart-safety comes from the checkpoint: a replayed
    batch re-appends, which LSH-dedup itself then suppresses downstream
    (signatures are deterministic, so replayed rows are exact duplicates
    of stored ones — idempotence-by-dedup rather than transactional
    sinks, the standard file-sink compromise).

    Returns the started StreamingQuery (caller awaits/stops).
    """
    from pyspark.sql.utils import AnalysisException

    from bigdata_hits_spark.operators.dedup import NUM_HASHES, minhash_dedup_incremental

    sig_schema = T.StructType(
        [T.StructField("id", T.StringType())]
        + [T.StructField(f"h{j}", T.LongType()) for j in range(NUM_HASHES)]
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            corpus_sigs = spark.read.parquet(signature_store)
        except AnalysisException:
            # First batch: no store yet.  An empty frame with the right
            # shape makes stage 2 a no-op.
            corpus_sigs = spark.createDataFrame([], sig_schema)
        # The id column type follows the batch's id column; align the
        # empty frame lazily via the operator's own joins (ids only meet
        # ids from the same side of the store).
        survivors, survivor_sigs = minhash_dedup_incremental(
            batch_df, corpus_sigs, threshold, id_col, text_col
        )
        survivors.write.mode("append").parquet(survivors_out)
        survivor_sigs.write.mode("append").parquet(signature_store)

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def rollup_maintenance_stream(
    delta_stream: DataFrame,
    rollup_store: str,
    checkpoint: str,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n",
    sign_col: str = "sign",
    keep_versions: int = 3,
):
    """Continuously maintain a stored COUNT+SUM rollup from a retraction
    stream (``sign`` = +1 insert / -1 retract, the shape
    ``operators/relops.py snapshot_delta`` emits and any CDC feed can be
    projected into) via ``foreachBatch`` +
    ``operators/relops.py apply_delta_rollup`` — the streaming twin of
    the ``orders_rollup_incremental`` batch query.  Per micro-batch the
    work is O(|batch delta| + |groups|): the fact history is never
    re-read, which is the whole point of maintaining a 100 TB table's
    rollup incrementally.

    **State versioning makes replay exact, not just harmless.**  Unlike
    the dedup stream (where replays are suppressed by dedup itself),
    retraction arithmetic is NOT idempotent — applying a delta twice
    double-counts.  So the store is versioned by batch id
    (``<rollup_store>/v=<batch_id>``): each batch reads the newest
    version STRICTLY BELOW its own id and overwrites its own version
    directory.  A replayed batch re-reads the same predecessor state
    and deterministically rewrites the same output — exactly-once
    semantics from pure directory arithmetic, no transactional sink
    needed.  Old versions beyond ``keep_versions`` are pruned once a
    newer version lands (crash mid-prune leaves extra versions, never
    missing ones).

    Ordering invariant: a retraction must not arrive in an EARLIER
    batch than the insert it cancels (true of any genuine CDC feed —
    you cannot delete a row before it exists).  A violating feed would
    make a group's maintained count transiently negative, and the
    rollup's groups-with-count>0 contract would drop its partial sums.

    Readers consume the highest ``v=`` directory; the returned query
    should be awaited/stopped by the caller.
    """
    from pyspark.sql import functions as F

    from bigdata_hits_spark.operators.relops import apply_delta_rollup

    def _versions(spark, path: str) -> list[int]:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return []
        out = []
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if name.startswith("v="):
                try:
                    out.append(int(name[2:]))
                except ValueError:
                    pass
        return sorted(out)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = [v for v in _versions(spark, rollup_store) if v < batch_id]
        if prev:
            old = spark.read.parquet(f"{rollup_store}/v={max(prev)}")
        else:
            # First batch: an empty rollup with the right schema, derived
            # from the batch itself (filter-false keeps types aligned).
            old = (
                batch_df.filter(F.lit(False))
                .groupBy(*group_cols)
                .agg(
                    F.count(F.lit(1)).alias(count_col),
                    *[F.sum(c).alias(c) for c in sum_cols],
                )
            )
        new = apply_delta_rollup(
            old, batch_df, group_cols, sum_cols, count_col, sign_col
        )
        new.write.mode("overwrite").parquet(f"{rollup_store}/v={batch_id}")
        # prune: only versions OLDER than the keep window, never the one
        # just written or its predecessors inside it
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(rollup_store)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        done = [v for v in _versions(spark, rollup_store) if v <= batch_id]
        for v in done[:-keep_versions] if keep_versions > 0 else []:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{rollup_store}/v={v}"), True)

    return (
        delta_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def checksum_maintenance_stream(
    delta_stream: DataFrame,
    digest_store: str,
    checkpoint: str,
    key_cols: list[str],
    cols: list[str] | None = None,
    buckets: int = 64,
    sign_col: str = "sign",
    keep_versions: int = 3,
):
    """Continuously maintain a stored :func:`~bigdata_hits_spark.
    operators.relops.table_checksum` digest from a retraction stream —
    the anti-entropy twin of :func:`rollup_maintenance_stream`: two
    replicas each maintain their digest incrementally from their own
    CDC feed and exchange only the bucket rows to detect divergence;
    neither ever re-scans its table.

    Same exactly-once discipline as the rollup maintainer (digest
    arithmetic is NOT idempotent — a replayed XOR un-applies itself):
    the store is versioned by batch id, each batch reads the newest
    version strictly below its own id and overwrites its own directory,
    so replays deterministically rewrite identical output.  Per batch
    the work is O(|batch| + buckets)."""
    from bigdata_hits_spark.operators.relops import (
        apply_delta_checksum,
        checksum_delta,
    )

    def _versions(spark, path: str) -> list[int]:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return []
        out = []
        for st in fs.listStatus(jpath):
            name = st.getPath().getName()
            if name.startswith("v="):
                try:
                    out.append(int(name[2:]))
                except ValueError:
                    pass
        return sorted(out)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        dd = checksum_delta(batch_df, key_cols, cols, buckets, sign_col)
        prev = [v for v in _versions(spark, digest_store) if v < batch_id]
        if prev:
            old = spark.read.parquet(f"{digest_store}/v={max(prev)}")
        else:
            old = dd.filter(F.lit(False)).select(
                "bucket",
                F.col("d_n").alias("n_rows"),
                F.col("d_xor").alias("xor_hash"),
                F.col("d_sum").alias("sum_hash"),
            )
        new = apply_delta_checksum(old, dd)
        new.write.mode("overwrite").parquet(f"{digest_store}/v={batch_id}")
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(digest_store)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        done = [v for v in _versions(spark, digest_store) if v <= batch_id]
        for v in done[:-keep_versions] if keep_versions > 0 else []:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{digest_store}/v={v}"), True)

    return (
        delta_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
