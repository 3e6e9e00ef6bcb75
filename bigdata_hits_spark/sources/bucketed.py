"""Bucketed-table helpers: shuffle-free co-located joins.

At 100 TB the dominant cost of a repeated fact-fact equi-join (e.g.
lineitem x orders on orderkey, or edge tables joined on node id every
pipeline run) is re-shuffling both sides on every query.  Hive-style
bucketing pays that shuffle ONCE at write time: both tables are written
pre-hash-partitioned on the join key, so Catalyst plans subsequent joins
with zero Exchange on either side (asserted in
tests/test_plans.py::test_bucketed_join_has_no_exchange).

The reference has no persistent-layout story at all (every job re-reads
raw CSV — ``/root/reference/src/base_hits.py:36-37``); this module is the
engine's answer for workloads that join the same big tables repeatedly.

Bucket-count guidance: pick ``buckets`` so one bucket of the LARGER table
is a few hundred MB (task-sized).  Both sides must use the same count for
co-located planning; a mismatched pair degrades to a normal shuffle join
rather than failing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) managed table.

    Sorting within buckets improves parquet encoding and min-max row-group
    pruning on the key.  (Spark 3+ no longer propagates bucket-file sort
    order into plans by default, so the merge join still sorts task-locally
    — the shuffle elimination, not sort elision, is the scale win.)
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    clear_orphaned_location(df.sparkSession, table)
    # Align write tasks to buckets: one file per bucket instead of one per
    # (input partition x bucket) — avoids the small-files explosion at
    # high write parallelism.
    df = df.repartition(buckets, *cols)
    writer = df.write.format("parquet").mode(mode).bucketBy(buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def clear_orphaned_location(spark: SparkSession, table: str) -> None:
    """Remove a managed table's leftover warehouse DIRECTORY when the
    catalog has no entry for it — the fresh-session footgun: a local
    in-memory metastore forgets tables between sessions while their
    files persist, and ``saveAsTable`` then refuses with
    LOCATION_ALREADY_EXISTS even in overwrite mode (the table is "new"
    to the catalog).  Only fires for ORPHANED locations; a table the
    catalog knows is left for the writer's own mode semantics.  On a
    real cluster with a durable metastore this is a no-op.

    Deletion guardrails (a function that rmtrees must be paranoid): the
    table name is validated against a strict identifier pattern — no
    path separators, no dots (a qualified ``db.tbl`` name resolves to a
    DIFFERENT warehouse path than this helper would derive, so it is
    rejected rather than guessed) — and the resolved target is
    realpath-checked to sit DIRECTLY inside the warehouse directory
    before anything is removed."""
    import re
    import shutil

    if not re.fullmatch(r"[A-Za-z0-9_]+", table):
        raise ValueError(
            f"clear_orphaned_location: table name {table!r} must be a bare "
            "unqualified identifier ([A-Za-z0-9_]+) — path separators and "
            "db.tbl qualification are rejected because the warehouse path "
            "is derived from the name"
        )
    if spark.catalog.tableExists(table):
        return
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:"):]
    wreal = os.path.realpath(warehouse)
    path = os.path.realpath(os.path.join(wreal, table.lower()))
    if os.path.dirname(path) != wreal:
        raise ValueError(
            f"clear_orphaned_location: resolved path {path!r} escapes the "
            f"warehouse dir {wreal!r} — refusing to delete"
        )
    if os.path.isdir(path):
        shutil.rmtree(path)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    ``spark.read.parquet`` on the files would LOSE the bucketing metadata
    and reintroduce the shuffle)."""
    return spark.table(table)


def write_time_partitioned(
    events: DataFrame,
    path: str,
    ts_ns_col: str = "ts_ns",
    mode: str = "overwrite",
) -> None:
    """Persist an event table partitioned by event DATE — the canonical
    time-series layout: a query over a day/week range prunes to exactly
    those directories at PLANNING time, so a 3-day scan over a 3-year
    corpus reads ~0.3% of the files (asserted in
    tests/test_plans.py::test_time_partitioned_scan_prunes).

    The partition column is derived from the engine's int64-nano
    convention (``event_date = date(ts_ns div 1e9 epoch seconds)``,
    UTC).  Within each date the events are repartitioned to one file per
    date at this scale; a production writer would also bucket or sort by
    user within the date for join/session locality.
    """
    dated = events.withColumn(
        "event_date",
        F.to_date(F.timestamp_seconds(F.expr(f"{ts_ns_col} div 1000000000"))),
    )
    # One file per date (repartition on the partition key) — avoids the
    # (tasks x dates) small-file explosion.
    dated.repartition("event_date").write.mode(mode).partitionBy("event_date").parquet(path)


def read_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned layout back; filters on ``event_date`` prune
    directories at planning time (PartitionFilters in the scan node)."""
    return spark.read.parquet(path)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int = 32,
) -> None:
    """Write ``df`` as parquet clustered on a Z-order (Morton) curve over
    ``cols`` — the multi-dimensional data-skipping layout (the technique
    behind Delta Lake's OPTIMIZE ZORDER BY, here as plain DataFrame
    code).

    Sorting by ``(a, b)`` clusters files tightly on ``a`` but leaves
    each file spanning the FULL range of ``b`` — a filter on ``b`` alone
    skips nothing.  Z-ordering interleaves the bits of the columns'
    bucket ids, so curve-adjacent rows are close in EVERY dimension:
    each file covers a narrow min/max band of all ``cols`` at once, and
    parquet footer stats let a scan on any single column (or any
    conjunction) skip most files and row groups.

    Mechanics — one extra pass over the data, Column expressions only:

    1. one small aggregate fetches each column's (min, max);
    2. ``width_bucket`` maps each value to a ``2^bits``-cell grid
       (NULLs to cell 0, sorting first — a filterable band like any
       other);
    3. the Morton value interleaves the grid cells' bits JVM-side
       (``shiftleft``/``bitwiseAND`` chain, ~``bits * len(cols)`` cheap
       integer ops inside codegen);
    4. ``repartitionByRange`` on the Morton value splits the curve into
       ``num_files`` contiguous segments (balanced by sampling), each
       sorted within so row groups inside a file are skippable too.

    Equi-width cells (not equi-depth) keep the assignment a pure
    expression; heavily skewed columns cluster less tightly — pre-scale
    (log, rank) upstream if a dimension is pathological.
    """
    if not cols or len(cols) < 2:
        raise ValueError("z-ordering needs at least two columns")
    if bits * len(cols) > 62:
        raise ValueError(f"bits * len(cols) must fit a long, got {bits}x{len(cols)}")
    bounds = df.agg(
        *[f(c).alias(f"__{n}_{c}") for c in cols for n, f in (("mn", F.min), ("mx", F.max))]
    ).first()
    cells = 1 << bits
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        raw_mn, raw_mx = bounds[f"__mn_{c}"], bounds[f"__mx_{c}"]
        if raw_mn is None or raw_mx is None:
            raise ValueError(
                f"z-order column {c!r} has no non-NULL values (empty input or "
                "all-NULL column) — drop it from cols or filter the input"
            )
        mn, mx = float(raw_mn), float(raw_mx)
        if mx <= mn:
            mx = mn + 1.0  # constant column: every row in cell 1
        # width_bucket's overflow bucket for v == max is cells (one past the
        # top); clamp it into the top cell so maxima do not wrap to share
        # z-bits with NULLs/minima (bit-interleave reads bits 0..bits-1 only).
        cell = F.least(
            F.coalesce(
                F.width_bucket(
                    F.col(c).cast("double"), F.lit(mn), F.lit(mx), F.lit(cells - 1)
                ),
                F.lit(0),
            ),
            F.lit(cells - 1),
        ).cast("long")
        for bit in range(bits):
            z = z + F.shiftleft(
                F.shiftright(cell, bit).bitwiseAND(F.lit(1)),
                bit * len(cols) + i,
            )
    zdf = df.withColumn("__z", z)
    (
        zdf.repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 256,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_mb`` files — the
    small-files compaction pass every streaming/incremental ingest
    needs: micro-batches and per-task writers leave thousands of tiny
    files whose open/footer overhead dominates scan time and whose
    row-group stats are too fragmented to skip anything.

    The output file count is sized from the directory's COMPRESSED
    on-disk bytes (one Hadoop FileSystem metadata call — no data read),
    so output files land near ``target_mb`` regardless of row width.
    With ``sort_by``, rows are range-partitioned and sorted on those
    columns instead of round-robin packed, so the compaction doubles as
    a clustering pass (footer min/max become selective — the
    single-column cousin of :func:`write_zordered`).

    Reads once, writes once; returns the number of files planned.
    ``dst`` must differ from ``src`` (overwriting the directory being
    scanned is undefined) — swap directories atomically afterwards with
    a rename, the standard compaction dance.
    """
    import math
    import os

    if os.path.abspath(src) == os.path.abspath(dst):
        raise ValueError("compact_parquet: dst must differ from src")
    if target_mb < 1:
        raise ValueError(f"target_mb must be >= 1, got {target_mb}")
    jpath = spark._jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(jpath).getLength()
    n = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    if sort_by:
        out = df.repartitionByRange(n, *[F.col(c) for c in sort_by]).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n
