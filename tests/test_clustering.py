"""Distributed k-means (operators/clustering.py): Lloyd math on a tiny
blob corpus, shuffle-free assignment plan, guards, and the fixture
margin check that keeps the kmeans_embeddings oracle engine-portable."""

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bigdata_hits_spark.operators.clustering import (
    KMEANS_MAX_EXPR_TERMS,
    assign_clusters,
    kmeans,
)

BLOBS = [
    (0, [0.0, 0.1]),
    (1, [10.0, 10.0]),
    (2, [0.1, 0.0]),
    (3, [9.9, 10.1]),
    (4, [0.05, 0.05]),
    (5, [10.1, 9.9]),
]


def _blobs(spark):
    return spark.createDataFrame(BLOBS, "vec_id long, embedding array<double>")


def test_kmeans_separates_blobs(spark):
    res = kmeans(_blobs(spark), k=2, iters=3)
    got = {r["vec_id"]: r["cluster"] for r in res.assignments.collect()}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}
    # converged centroids are the blob means (exact: rounding is a no-op
    # on these decimals)
    assert res.centroids[0] == [0.05, 0.05]
    assert res.centroids[1] == [10.0, 10.0]


def test_kmeans_iters1_is_nearest_seed_assignment(spark):
    """iters=1 does no update: every point goes to its nearest SEED
    (seeds = vectors of the 2 smallest ids: blob-A point 0, blob-B
    point 1)."""
    res = kmeans(_blobs(spark), k=2, iters=1)
    got = {r["vec_id"]: r["cluster"] for r in res.assignments.collect()}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}
    assert res.centroids[0] == [0.0, 0.1]  # still the raw seed


def test_assignment_is_shuffle_free(spark):
    """The scale claim: assignment is a pure projection — literal
    centroids, no Exchange anywhere in the executed plan."""
    a = assign_clusters(_blobs(spark), {0: [0.0, 0.0], 1: [10.0, 10.0]})
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_empty_cluster_keeps_ids_stable(spark):
    """Identical seeds: ties break to cluster 0, cluster 1 loses every
    point after the first update and drops from the map — remaining ids
    never renumber."""
    df = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.2, 1.0])],
        "vec_id long, embedding array<double>",
    )
    res = kmeans(df, k=2, iters=2)
    assert set(res.centroids) == {0}
    clusters = {r["cluster"] for r in res.assignments.collect()}
    assert clusters == {0}


def test_guards(spark):
    df = _blobs(spark)
    with pytest.raises(ValueError, match="KMEANS_MAX_EXPR_TERMS"):
        assign_clusters(
            df, {j: [0.0] * (KMEANS_MAX_EXPR_TERMS // 10) for j in range(11)}
        )
    with pytest.raises(ValueError, match="dimensions disagree"):
        assign_clusters(df, {0: [0.0], 1: [0.0, 1.0]})
    with pytest.raises(ValueError, match="only"):
        kmeans(df, k=10, iters=1)
    with pytest.raises(ValueError, match="not found"):
        kmeans(df, k=2, iters=1, seed_ids=[0, 99])


def test_seed_ids_order_defines_cluster_ids(spark):
    res = kmeans(_blobs(spark), k=2, iters=1, seed_ids=[1, 0])
    got = {r["vec_id"]: r["cluster"] for r in res.assignments.collect()}
    # seed order reversed -> blob-B is cluster 0 now
    assert got[1] == 0 and got[0] == 1


def _round6(x):
    # decimal half-up at 6 digits, the shared Spark/DuckDB round
    return np.floor(np.abs(x) * 1e6 + 0.5) / 1e6 * np.sign(x)


def test_kmeans_oracle_fixture_margins(sf_dir_oracle):
    """Engine-portability guard for the kmeans_embeddings oracle
    (queries_postgate.py): replay the exact trajectory in numpy and
    assert, at every iteration, (a) each point's best-vs-second-best
    squared distance gap clears 1e-4 — four orders above cross-engine
    float-sum-order noise — and (b) no distance or centroid mean sits
    within 1e-12 of a 6-decimal rounding boundary (noise is ~1e-13; the
    observed minimum over ~6k uniform values is expected ~1e-10, so the
    threshold sits between the two).  A testdata refresh
    that lands near either margin fails HERE with a named cause, not as
    a mystery hash mismatch in the driver gate."""
    from bigdata_hits_spark.queries_postgate import KMEANS_Q_ITERS, KMEANS_Q_K

    tbl = pq.read_table(f"{sf_dir_oracle}/embeddings.parquet")
    ids = np.asarray(tbl["vec_id"])
    X = np.array([np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()])
    order = np.argsort(ids)
    X = X[order]
    C = X[: KMEANS_Q_K].copy()  # seeds: k smallest vec_ids
    min_gap, min_boundary = np.inf, np.inf

    def boundary_dist(vals):
        frac = np.abs(vals) * 1e6
        return np.min(np.abs(frac - np.floor(frac) - 0.5)) / 1e6

    for t in range(KMEANS_Q_ITERS):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        min_boundary = min(min_boundary, boundary_dist(d))
        dr = _round6(d)
        srt = np.sort(dr, axis=1)
        min_gap = min(min_gap, float(np.min(srt[:, 1] - srt[:, 0])))
        assign = np.argmin(dr, axis=1)  # ties -> smallest cluster, like argmin
        if t < KMEANS_Q_ITERS - 1:
            means = np.stack(
                [X[assign == j].mean(axis=0) for j in range(len(C)) if (assign == j).any()]
            )
            min_boundary = min(min_boundary, boundary_dist(means))
            C = _round6(means)
    assert min_gap > 1e-4, f"best-vs-second distance gap {min_gap} too small"
    assert min_boundary > 1e-12, f"value within {min_boundary} of a round-6 boundary"


def test_kmeans_parallel_seeds_deterministic_and_composable(spark, sf_dir_oracle):
    """The md5-coin candidate draw is a pure function of the data: the
    seed ids are identical under a different partitioning, there are
    exactly k of them, and they feed kmeans(seed_ids=...) directly."""
    from bigdata_hits_spark.operators.clustering import kmeans_parallel_seeds
    from bigdata_hits_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir_oracle, "embeddings")
    ids = kmeans_parallel_seeds(emb, k=10)
    assert len(ids) == len(set(ids)) == 10
    assert ids == kmeans_parallel_seeds(emb.repartition(7), k=10)
    res = kmeans(emb, k=10, iters=2, seed_ids=ids)
    assert res.assignments.count() == emb.count()


def test_kmeans_parallel_seeds_beat_first_k_inertia(spark, sf_dir_oracle):
    """The point of || seeding: on the 10-blob embeddings corpus,
    first-10-id seeds land wherever the ids happen to sit while ||
    seeds spread over the blobs — strictly lower final inertia."""
    from bigdata_hits_spark.operators.clustering import kmeans_parallel_seeds
    from bigdata_hits_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir_oracle, "embeddings")

    def inertia(seed_ids):
        res = kmeans(emb, k=10, iters=3, seed_ids=seed_ids)
        return res.assignments.agg(F.sum("dist")).first()[0]

    first_k = [r["vec_id"] for r in emb.orderBy("vec_id").limit(10).collect()]
    assert inertia(kmeans_parallel_seeds(emb, k=10)) < inertia(first_k)


def test_kmeans_parallel_query_params_beat_first_k(spark, sf_dir_oracle):
    """Quality pin for the DECLARED kmeans_parallel_embeddings fixture
    params (rounds=1, oversample=4k, two Lloyd steps): the single
    oversampled draw still beats first-k seeding, and the seed-vector
    passthrough is exactly the id-lookup path."""
    from bigdata_hits_spark.operators.clustering import kmeans_parallel_seeds
    from bigdata_hits_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir_oracle, "embeddings")
    k = 4
    seeds, vecs = kmeans_parallel_seeds(
        emb, k=k, rounds=1, oversample=4 * k, return_vectors=True
    )
    assert sorted(vecs) == seeds and len(seeds) == k

    def inertia(seed_ids, **kw):
        res = kmeans(emb, k=k, iters=2, seed_ids=seed_ids, **kw)
        return res.assignments.agg(F.sum("dist")).first()[0]

    first_k = [r["vec_id"] for r in emb.orderBy("vec_id").limit(k).collect()]
    assert inertia(seeds, seed_vectors=vecs) < inertia(first_k)
    # passthrough vectors change nothing but the lookup job
    assert inertia(seeds, seed_vectors=vecs) == inertia(seeds)


def test_kmeans_parallel_seeds_small_corpus_raises(spark):
    from bigdata_hits_spark.operators.clustering import kmeans_parallel_seeds

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="fewer than k rows"):
        kmeans_parallel_seeds(df, k=5)
