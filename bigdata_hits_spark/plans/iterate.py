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


def materialize(df: DataFrame) -> DataFrame:
    """Truncate lineage + force evaluation + RESET the size estimate to
    the real materialized size (persist -> eager ``localCheckpoint``,
    whose job also populates the cache -> unpersist the scratch cache).

    The stats reset is load-bearing for iterative loops.  A bare
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
    all measured innocent on a 300-edge graph.  Checkpointing THROUGH a
    persisted frame instead captures the InMemoryRelation's actual
    materialized byte size, so every materialize restarts the
    compounding from a small true number (flat ~0.5 s rounds at any
    peel depth; pinned by tests/test_plans.py).

    Equivalent role to the reference's per-iteration collects, but the
    data stays distributed on the executors instead of landing on the
    driver.  On a real cluster with lost-executor concerns, swap for
    reliable ``checkpoint()`` against a checkpoint dir; local mode
    doesn't need it.  Trade: one columnar cache build per call, freed
    immediately; a caller that persisted the IDENTICAL plan for itself
    would lose that cache entry to the unpersist — no engine call site
    does.
    """
    cached = df.persist()
    out = cached.localCheckpoint(eager=True)
    cached.unpersist()
    return out


def materialize_counted(df: DataFrame) -> tuple[DataFrame, int]:
    """:func:`materialize` plus the row count every peel/fixpoint loop
    needs for its convergence test, taken from the already-populated
    scratch cache (a cache-read job, not a recompute)."""
    cached = df.persist()
    out = cached.localCheckpoint(eager=True)
    n = cached.count()
    cached.unpersist()
    return out, n
