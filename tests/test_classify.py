"""Distributed logistic regression (operators/classify.py): trajectory
math vs a numpy float64 replication, the rounding-boundary margin guard
that keeps the logreg oracles engine-portable, and the scoring path."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_hits_spark.operators.classify import (
    GRAD_DIGITS,
    logistic_regression,
    predict_proba,
)
from bigdata_hits_spark.queries_postgate import (
    LOGREG_ITERS,
    LOGREG_LR,
    _LOGREG_FEATS,
    _logreg_features,
)
from bigdata_hits_spark.sources.readers import load_table

from conftest import SF_DIR_ORACLE

# Tiny separable fixture: y = 1 iff x1 > 0 (x0 is the bias column).
ROWS = [
    (1.0, 2.0, 1.0),
    (1.0, 1.5, 1.0),
    (1.0, 0.5, 1.0),
    (1.0, -0.5, 0.0),
    (1.0, -1.5, 0.0),
    (1.0, -2.0, 0.0),
]


def _tiny(spark):
    return spark.createDataFrame(ROWS, "x0 double, x1 double, y double")


def _np_trajectory(X, y, iters, lr, digits):
    """The identical trajectory in numpy float64: per-round gradient
    avg((sigmoid(Xw) - y) * x_j) rounded half-away at ``digits``, then
    the exact ``w - lr * g`` update (lr a power of two)."""
    w = np.zeros(X.shape[1])
    hist = []
    for t in range(1, iters + 1):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        raw = ((p - y)[:, None] * X).mean(axis=0)
        scale = 10.0**digits
        g = np.floor(np.abs(raw) * scale + 0.5) / scale * np.sign(raw)
        w = w - lr * g
        hist.append((t, w.copy(), g.copy(), raw.copy()))
    return hist


def test_trajectory_matches_numpy_replication(spark):
    res = logistic_regression(_tiny(spark), ["x0", "x1"], "y", iters=3, lr=0.5)
    X = np.array([[r[0], r[1]] for r in ROWS])
    y = np.array([r[2] for r in ROWS])
    hist = _np_trajectory(X, y, 3, 0.5, GRAD_DIGITS)
    assert len(res.history) == 3
    for got, (t, w, g, _raw) in zip(res.history, hist):
        assert got.round == t
        assert got.weights == pytest.approx(list(w), abs=0, rel=0)
        assert got.grad == pytest.approx(list(g), abs=0, rel=0)
        gn = 0.0
        for gj in g:
            gn += gj * gj
        assert got.grad_norm == math.sqrt(gn)


def test_training_separates_the_separable(spark):
    res = logistic_regression(_tiny(spark), ["x0", "x1"], "y", iters=8, lr=0.5)
    scored = predict_proba(_tiny(spark), res).collect()
    for r in scored:
        assert (r["p"] >= 0.5) == (r["y"] == 1.0)
    # slope weight grows positive (x1 drives the label)
    assert res.weights[1] > 0.2


def test_guards(spark):
    with pytest.raises(ValueError, match="iters"):
        logistic_regression(_tiny(spark), ["x0"], "y", iters=0)
    with pytest.raises(ValueError, match="feature_cols"):
        logistic_regression(_tiny(spark), [], "y")


def test_langid_gradient_boundary_margins(spark):
    """Oracle portability fixture guard (the kmeans-margin discipline,
    tests/test_clustering.py): every UNROUNDED gradient component in
    the declared langid trajectory must clear the GRAD_DIGITS rounding
    boundary by >= 1e-12 — ~1e4x the worst measured cross-engine
    sigmoid/sum drift, so a testdata refresh landing near a boundary
    fails HERE, loudly, not in the driver gate."""
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    pdf = _logreg_features(docs).toPandas()
    X = pdf[_LOGREG_FEATS].to_numpy()
    y = pdf["__y"].to_numpy()
    hist = _np_trajectory(X, y, LOGREG_ITERS, LOGREG_LR, GRAD_DIGITS)
    step = 10.0**-GRAD_DIGITS
    for _t, _w, _g, raw in hist:
        for v in raw:
            frac = abs(v) / step % 1.0
            # distance (in rounding steps) from the x.5 TIE boundary —
            # the only place a sub-ulp cross-engine drift can flip the
            # rounded value; sitting exactly ON a grid point is safe.
            margin = abs(frac - 0.5)
            assert margin * step > 1e-12, f"gradient {v} too close to boundary"


def test_langid_trajectory_matches_engine(spark):
    """The numpy replication and the Spark trainer agree bit-for-bit on
    the declared corpus — the same invariant the DuckDB oracle checks,
    pinned here so it also holds at the pytest sf."""
    res_hist = _np_trajectory_for_docs(spark, SF_DIR_ORACLE)
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    res = logistic_regression(
        _logreg_features(docs), _LOGREG_FEATS, "__y",
        iters=LOGREG_ITERS, lr=LOGREG_LR,
    )
    for got, (t, w, g, _raw) in zip(res.history, res_hist):
        assert got.round == t
        assert got.weights == list(w)


def _np_trajectory_for_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pdf = _logreg_features(docs).toPandas()
    X = pdf[_LOGREG_FEATS].to_numpy()
    y = pdf["__y"].to_numpy()
    return _np_trajectory(X, y, LOGREG_ITERS, LOGREG_LR, GRAD_DIGITS)
