"""Iteration harness helpers: in-plan normalization + lineage truncation.

The reference's power loops collect the norm scalar to the driver twice per
iteration and never cache, so every action recomputes a lineage that grows
with the iteration count and re-reads the input CSVs
(``/root/reference/src/base_hits.py:16-19,53-64``; SURVEY §3.1, §4.2).

Here the norm stays *in the plan* — a one-row aggregate cross-joined back
with an explicit broadcast hint, so no driver round-trip — and lineage is
truncated with ``localCheckpoint`` on a fixed cadence, which also bounds
the logical-plan blowup across iterations (SURVEY §4.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def normalized(scores: DataFrame, how: str = "l2", score_col: str = "score") -> DataFrame:
    """Divide ``score_col`` by the vector's L2 or L1 norm, distributedly.

    L2 mirrors HITS (``base_hits.py:16-19``), L1 mirrors SALSA
    (``base_salsa.py:13-15``).  Implemented as a broadcast cross join of a
    one-row aggregate: no ``collect`` on the driver, works at any vector
    size.
    """
    s = F.col(score_col)
    if how == "l2":
        norm: Column = F.sqrt(F.sum(s * s))
    elif how == "l1":
        norm = F.sum(s)
    else:
        raise ValueError(f"unknown norm {how!r} (expected 'l1' or 'l2')")
    norm_df = scores.agg(norm.alias("__norm"))
    out_cols = [c for c in scores.columns if c != score_col]
    return (
        scores.crossJoin(F.broadcast(norm_df))
        .select(*out_cols, (s / F.col("__norm")).alias(score_col))
    )


#: Size-estimate bit-length above which :func:`materialize` resets the
#: estimate to the real materialized size.  Real data never gets here
#: (2^256 bytes); only estimate COMPOUNDING does, and one loop round
#: multiplies at most a handful of sub-cap estimates, so the check
#: itself always reads a small number.
_STATS_BITS_CAP = 256


def _stats_reset(df: DataFrame) -> DataFrame:
    """Re-checkpoint through a persisted frame: the eager checkpoint's
    own job populates the cache, so the resulting LogicalRDD's origin
    stats are the InMemoryRelation's ACTUAL materialized byte size
    instead of the compounded estimate.  The scratch cache is dropped
    immediately (the checkpoint has its own storage)."""
    cached = df.persist()
    out = cached.localCheckpoint(eager=True)
    cached.unpersist()
    return out


def materialize(df: DataFrame) -> DataFrame:
    """Truncate lineage + force evaluation (eager localCheckpoint), and
    keep Catalyst's size estimate SANE across iterative loops.

    ``localCheckpoint`` copies the ORIGIN plan's ESTIMATED statistics
    into the resulting LogicalRDD, and size-only estimation MULTIPLIES
    sizeInBytes through inner/outer joins (left-semi/anti keep the left
    size, so degree-peel loops are immune) — a loop whose round output
    joins against an aggregate of the SAME frame therefore multiplies
    the estimate's BIT-LENGTH every round.  The estimate is a
    BigInteger: in the k-truss peel (x3 bit-growth per round) it
    reached millions of digits by round ~17 and the driver stalled
    20-130 s per round inside ``BigInteger.multiplyToomCook3`` during
    stats propagation — with plan size, RDD lineage, GC, JIT, and AQE
    all measured innocent on a 300-edge graph.

    The guard is ADAPTIVE because the reset is not free (an extra
    columnar cache build per call — measured +40-70% on the sf0.1
    graph-family rows when applied unconditionally): the cheap bare
    checkpoint runs first, and only when its copied estimate has
    compounded past ``_STATS_BITS_CAP`` bits does the persist-backed
    reset kick in.  One-shot and linear-growth sites (HITS, label
    propagation) never pay; a multiplicative loop pays one cache build
    every few rounds and its estimate never exceeds a few hundred
    bits, keeping every planning pass O(1) (flat ~0.5 s k-truss rounds
    at any peel depth; pinned by tests/test_plans.py).

    Equivalent role to the reference's per-iteration collects, but the
    data stays distributed on the executors instead of landing on the
    driver.  On a real cluster with lost-executor concerns, swap for
    reliable ``checkpoint()`` against a checkpoint dir; local mode
    doesn't need it.
    """
    out = df.localCheckpoint(eager=True)
    try:
        size = int(_estimated_size_bytes(out))
    except Exception:
        # The probe reads private JVM internals; if a PySpark upgrade
        # moves them, degrade to the unconditional reset (correct, just
        # pays the cache build every call) instead of raising at every
        # materialize site at once.
        return _stats_reset(out)
    if size.bit_length() <= _STATS_BITS_CAP:
        return out
    return _stats_reset(out)


def _estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for ``df``'s optimized plan.

    Reads private JVM internals (``_jdf.queryExecution()...``) — callers
    must treat any exception as "estimate unavailable" and fall back.
    """
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def materialize_lazy(df: DataFrame) -> DataFrame:
    """Lineage cut WITHOUT the eager job: a lazy ``localCheckpoint``
    that the caller's next action materializes in-job, with the same
    estimate-compounding guard as :func:`materialize` (probed on the
    optimized plan, which needs no materialization).

    r13 optimization: loop bodies that interleave many eager
    ``materialize`` calls with batched convergence counts pay one job
    launch + driver gap PER call while the counted action would have
    materialized the same chain anyway — graph_scc ran ~120 jobs of
    which ~115 were under 0.25 s, with more wall in inter-job driver
    latency than in compute.  Use this where the frame's first consumer
    is (or leads into) an action that runs anyway; keep eager
    :func:`materialize` where a job NOW is the point (pinning a memo,
    isolating a phase for measurement)."""
    try:
        size = int(_estimated_size_bytes(df))
    except Exception:
        return _stats_reset(df)
    if size.bit_length() <= _STATS_BITS_CAP:
        return df.localCheckpoint(eager=False)
    return _stats_reset(df)


def materialize_counted(df: DataFrame) -> tuple[DataFrame, int]:
    """:func:`materialize` plus the row count every peel/fixpoint loop
    needs for its convergence test — counted through a persisted frame
    so the checkpoint captures real stats AND the count is a cache
    read, not a recompute.  Always persist-backed: loop callers are
    exactly the compounding sites, and they need the count anyway."""
    cached = df.persist()
    out = cached.localCheckpoint(eager=True)
    n = cached.count()
    cached.unpersist()
    return out, n
