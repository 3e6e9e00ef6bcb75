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
    """Truncate lineage + force evaluation (eager localCheckpoint).

    Equivalent role to the reference's per-iteration collects, but the data
    stays distributed on the executors instead of landing on the driver.
    On a real cluster with lost-executor concerns, swap for reliable
    ``checkpoint()`` against a checkpoint dir; local mode doesn't need it.
    """
    return df.localCheckpoint(eager=True)
