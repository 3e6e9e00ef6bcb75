"""Distributed classifier training: batch-gradient logistic regression.

The quality/language *filter-model training* step of an LLM data
pipeline (fastText-style: cheap surface features -> linear model ->
corpus-wide screening).  The reference engine has no model training
(`/root/reference/src` stops at ranking fixpoints); this is
beyond-reference breadth mandated by the training-data-pipeline brief,
but it reuses the reference's iterative-refinement shape (HITS's
score-update loop, `/root/reference/src/hits.py`-family scripts) with a
gradient step instead of a rank update.

Scale shape: one full scan per training round; the gradient is ``dim``
parallel ``avg()`` columns of ONE map-side-combined hash-agg (the
kmeans centroid-update shape, operators/clustering.py:254) collecting
``dim`` scalars to the driver — O(1) driver state, no shuffle wider
than the scalar aggregate, every expression (sigmoid included) inside
whole-stage codegen.  At 100 TB the cost is exactly ``iters`` scans of
the pinned feature projection; nothing grows with data size except the
scan.

Cross-engine determinism (the DuckDB-oracle discipline): per-round
gradients pass through an in-engine ``ROUND(digits)``; the weight
update ``w - lr * g`` then happens in EXACT driver arithmetic with
``lr`` a power of two (2^-k scaling and subtraction of IEEE doubles are
exact, so the whole weight trajectory is bit-stable across engines and
the oracle can unroll the identical rounds as CTEs).  The only
cross-engine float risk is last-ulp ``exp()`` disagreement inside the
averaged sigmoid, ~1e-16 relative — absorbed by the 1e-8 gradient
rounding; tests/test_classify.py pins the boundary margins.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

#: In-engine rounding applied to each averaged gradient component —
#: coarse enough to absorb last-ulp exp()/sum-order drift, fine enough
#: that four rounds of lr=0.5 steps stay meaningfully distinct.
GRAD_DIGITS = 8

#: Power of two: lr * g and w - lr * g are then EXACT IEEE operations,
#: keeping the weight trajectory bit-identical across engines.
DEFAULT_LR = 0.5


@dataclass
class LogRegRound:
    round: int
    weights: list  # post-update weights, one per feature column
    grad: list  # the (rounded) gradient that produced them
    grad_norm: float  # L2 norm of that gradient (unrounded; exact IEEE)


@dataclass
class LogRegResult:
    feature_cols: list
    history: list  # list[LogRegRound], rounds 1..iters

    @property
    def weights(self) -> list:
        return self.history[-1].weights


def _dot(weights: list, cols: list) -> Column:
    """w . x as a LEFT-TO-RIGHT chain of literal multiply-adds — the
    association order the oracle SQL writes out verbatim, so both
    engines produce the same IEEE double."""
    z = F.lit(float(weights[0])) * F.col(cols[0])
    for w, c in zip(weights[1:], cols[1:]):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def logistic_regression(
    df: DataFrame,
    feature_cols: list,
    label_col: str,
    iters: int = 4,
    lr: float = DEFAULT_LR,
    digits: int = GRAD_DIGITS,
) -> LogRegResult:
    """Full-batch gradient descent for logistic regression from w = 0.

    Per round: p = sigmoid(w . x) per row, gradient component j =
    ``ROUND(avg((p - y) * x_j), digits)``, update ``w_j -= lr * g_j``.
    ``iters`` scans of the pinned feature projection; see module
    docstring for the scale and determinism contract.

    The caller provides ready numeric ``feature_cols`` (include an
    explicit all-ones bias column — the trainer does not fabricate one,
    so the oracle sees every feature as a real column).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    feats = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    )
    # Pin once, scan ``iters`` times.  Spread a narrow source first
    # (single-file parquet arrives 1-partition; the sigmoid fold would
    # run single-threaded) — a no-op at cluster scale where the input
    # is already wider than defaultParallelism.
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        feats = feats.repartition(par)
    feats = feats.localCheckpoint(eager=False)

    d = len(feature_cols)
    w = [0.0] * d
    history: list[LogRegRound] = []
    for t in range(1, iters + 1):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot(w, feature_cols)))
        scored = feats.select(
            "__y", *feature_cols, p.alias("__p")
        )
        row = scored.agg(
            *[
                F.round(
                    F.avg((F.col("__p") - F.col("__y")) * F.col(c)), digits
                ).alias(f"g{j}")
                for j, c in enumerate(feature_cols)
            ]
        ).collect()[0]
        g = [float(row[f"g{j}"]) for j in range(d)]
        # Exact driver arithmetic (lr is a power of two): the oracle's
        # CTE performs the literally identical doubles operations.
        w = [w[j] - lr * g[j] for j in range(d)]
        # Plain left-to-right accumulation (not fsum): the SQL twin
        # writes g0*g0 + g1*g1 + ... verbatim, and matching its
        # association keeps the norm IEEE-identical without rounding.
        gn = 0.0
        for gj in g:
            gn += gj * gj
        gn = math.sqrt(gn)
        history.append(LogRegRound(t, list(w), g, gn))
    return LogRegResult(list(feature_cols), history)


def predict_proba(df: DataFrame, result: LogRegResult, out_col: str = "p") -> DataFrame:
    """Score rows under the trained weights: one literal-weight
    projection, shuffle-free, whole-stage-codegen — the corpus-wide
    screening pass the filter model exists for."""
    return df.withColumn(
        out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot(result.weights, result.feature_cols)))
    )
