import pytest
from pyspark.sql import functions as F

from bigdata_hits_spark.operators import similarity as SIM
from bigdata_hits_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_cosine_topk_excludes_self_and_respects_k(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3)
    res = SIM.cosine_topk(emb, queries, k=5).collect()
    assert len(res) == 15
    for r in res:
        assert r["qid"] != r["cid"]
        assert -1.0001 <= r["cosine"] <= 1.0001


def test_cosine_identical_vector_scores_one(spark):
    rows = [(1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0, 3.0]), (3, [-3.0, 1.0, 0.5])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    res = {(r["qid"], r["cid"]): r["cosine"] for r in
           SIM.cosine_topk(df, df.filter(F.col("vec_id") == 1), k=2).collect()}
    assert res[(1, 2)] == 1.0


def test_lsh_recall_floor(spark, emb):
    """The banded sign-LSH path must recover a reasonable share of the true
    top-10 on the (adversarially random) test embeddings."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries, k=10).collect()
    approx = SIM.lsh_bucket_topk(emb, queries, k=10).collect()
    truth = {(r["qid"], r["cid"]) for r in exact}
    got = {(r["qid"], r["cid"]) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.3, f"LSH recall too low: {recall}"


def test_ivf_recall_floor(spark, emb):
    """IVF with 4-of-16 probes must recover most of the true top-10 (it
    exact-scores everything in the probed buckets)."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries, k=10).collect()
    approx = SIM.ivf_topk(emb, queries, k=10).collect()
    truth = {(r["qid"], r["cid"]) for r in exact}
    got = {(r["qid"], r["cid"]) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.3, f"IVF recall too low: {recall}"


def test_ivf_centroids_cached_per_corpus(spark, emb):
    """Repeated ANN calls on the same corpus must reuse the built index
    (the Lloyd rounds + driver collects are paid once per session)."""
    a = SIM.ivf_centroids_cached(emb)
    b = SIM.ivf_centroids_cached(emb)
    assert a is b
    # a different quantizer size is a different index
    c = SIM.ivf_centroids_cached(emb, n_centroids=8)
    assert c is not a and c.shape[0] == 8


def test_ivfq_index_cached_and_persisted(spark, emb):
    """The int8 inverted file is built once per (session, corpus, params)
    and persisted — repeated quantized-ANN calls must reuse the SAME
    DataFrame object, and the serving plan must read it from the cache
    (InMemoryTableScan), not re-run quantize + assign."""
    cent = SIM.ivf_centroids_cached(emb)
    a = SIM.ivfq_index_cached(emb, cent, SIM.IVF_CENTROIDS, "vec_id", "embedding")
    b = SIM.ivfq_index_cached(emb, cent, SIM.IVF_CENTROIDS, "vec_id", "embedding")
    assert a is b
    assert a.storageLevel.useMemory or a.storageLevel.useDisk
    queries = emb.filter(F.col("vec_id") < 3)
    topk = SIM.ivf_quantized_topk(emb, queries, k=5)
    topk.count()  # materialize the persisted index
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_cosine_pairs_threshold(spark):
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r["id1"], r["id2"]) for r in SIM.cosine_pairs(df, 0.9).collect()}
    assert pairs == {(1, 2)}


def test_group_centroids_exact_means(spark):
    rows = [
        ("a", [1.0, 2.0]), ("a", [3.0, 4.0]),
        ("b", [10.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["label", "embedding"])
    got = {r["label"]: (r["centroid"], r["n"]) for r in
           SIM.group_centroids(df, "label").collect()}
    assert got["a"] == ([2.0, 3.0], 2)
    assert got["b"] == ([10.0, 0.0], 1)


def test_group_centroids_no_python_udf(spark, emb):
    plan = SIM.group_centroids(emb.withColumn("g", F.col("vec_id") % 4), "g") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_semantic_dedup_drops_paraphrase_clusters(spark):
    docs = spark.createDataFrame(
        [(1, "t1"), (2, "t2"), (3, "t3")], ["doc_id", "text"]
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    kept = {r["doc_id"] for r in SIM.semantic_dedup(docs, vecs, 0.9).collect()}
    assert kept == {1, 3}  # 2 is near-identical to 1; min id survives


@pytest.fixture(scope="module")
def clustered_corpus(spark):
    """Docs + embeddings with genuine >=0.95-cosine clusters: three tight
    clusters (base vector + tiny per-member jitter on one coordinate) and
    a handful of isolated vectors."""
    import math

    rows = []
    bases = {
        0: [1.0, 0.2, 0.1, 0.0],
        10: [0.0, 1.0, -0.5, 0.3],
        20: [-1.0, 0.4, 0.0, 2.0],
    }
    for start, base in bases.items():
        for j in range(4):
            v = list(base)
            v[j % len(v)] += 0.002 * j
            rows.append((start + j, v))
    for i, k in enumerate(range(100, 105)):
        v = [0.0, 0.0, 0.0, 0.0]
        v[i % 4] = 1.0
        v[(i + 1) % 4] = -1.0 if i % 2 else 0.5
        rows.append((k, v))
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    docs = vecs.select(F.col("vec_id").alias("doc_id"), F.lit("t").alias("text"))
    return docs, vecs


def test_semantic_dedup_lsh_matches_exact_on_clusters(spark, clustered_corpus):
    """The production LSH-candidate path must keep exactly the same
    survivors as the all-pairs baseline at the dedup threshold."""
    docs, vecs = clustered_corpus
    exact = {r["doc_id"] for r in
             SIM.semantic_dedup(docs, vecs, 0.95, candidates="exact").collect()}
    lsh = {r["doc_id"] for r in
           SIM.semantic_dedup(docs, vecs, 0.95, candidates="lsh").collect()}
    assert lsh == exact
    # sanity: the clusters actually collapsed to their min-id member
    assert {0, 10, 20}.issubset(exact) and not {1, 2, 3, 11, 21} & exact


def test_semantic_dedup_lsh_matches_exact_on_testdata(spark, emb, sf_dir):
    from bigdata_hits_spark.sources.readers import load_table as _lt

    docs = _lt(spark, sf_dir, "documents")
    exact = {r["doc_id"] for r in
             SIM.semantic_dedup(docs, emb, 0.95, candidates="exact").collect()}
    lsh = {r["doc_id"] for r in
           SIM.semantic_dedup(docs, emb, 0.95, candidates="lsh").collect()}
    assert lsh == exact


def test_lsh_verified_pairs_plan_has_no_cross_join(spark, emb):
    """The scale path must be equi-joins end to end — no nested-loop /
    cartesian block-pair join anywhere in the physical plan."""
    cand = SIM.lsh_candidate_pairs(emb)
    pairs = SIM.verify_cosine_pairs(emb, cand, 0.95)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_verify_cosine_pairs_matches_cosine_pairs_values(spark):
    """On a corpus where candidates cover all true pairs, the verified
    output must equal cosine_pairs row-for-row (same rounding, same
    threshold semantics)."""
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0]), (4, [0.001, 1.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {(r["id1"], r["id2"], r["cosine"]) for r in SIM.cosine_pairs(df, 0.9).collect()}
    cand = SIM.lsh_candidate_pairs(df)
    got = {(r["id1"], r["id2"], r["cosine"])
           for r in SIM.verify_cosine_pairs(df, cand, 0.9).collect()}
    assert got == exact


def test_quantize_embeddings_roundtrip_and_cosine_error(spark, emb):
    """int8 round trip: per-coordinate error bounded by scale/2, and
    cosine over dequantized vectors within ~1% of exact."""
    from bigdata_hits_spark.operators.similarity import (
        dequantize_embedding,
        quantize_embeddings,
    )

    q = quantize_embeddings(emb)
    row = q.select(
        "embedding",
        "q_scale",
        dequantize_embedding(F.col("q_embedding"), F.col("q_scale")).alias("deq"),
    ).first()
    for orig, back in zip(row["embedding"], row["deq"]):
        assert abs(float(orig) - back) <= row["q_scale"] / 2 + 1e-12

    deq = q.select(
        F.col("vec_id"), dequantize_embedding(F.col("q_embedding"), F.col("q_scale")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {(r["qid"], r["cid"]): r["cosine"] for r in SIM.cosine_topk(emb, queries, k=5).collect()}
    approx = {(r["qid"], r["cid"]): r["cosine"]
              for r in SIM.cosine_topk(deq, queries.join(deq.select(F.col("vec_id")), "vec_id", "left_semi"), k=5).collect()}
    shared = set(exact) & set(approx)
    assert len(shared) >= 10  # top lists mostly agree
    for key in shared:
        assert abs(exact[key] - approx[key]) < 0.02


def test_quantize_embeddings_no_python_udf(spark, emb):
    from bigdata_hits_spark.operators.similarity import quantize_embeddings

    plan = quantize_embeddings(emb)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_quantize_zero_vector(spark):
    from bigdata_hits_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame([(1, [0.0, 0.0])], ["vec_id", "embedding"])
    row = quantize_embeddings(df).first()
    assert row["q_scale"] == 0.0 and list(row["q_embedding"]) == [0, 0]


def test_all_pairs_plan_unreachable_without_exact_opt_in(spark):
    """Regime enforcement: below LSH_SAFE_THRESHOLD every entry point
    refuses the O(n²) all-pairs plan unless exact=True is passed."""
    import pytest

    df = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in range(6)], "vec_id long, embedding array<float>"
    )
    docs = spark.createDataFrame([(i, "t") for i in range(6)], "doc_id long, text string")
    with pytest.raises(ValueError, match="exact=True"):
        SIM.cosine_pairs(df, 0.4)
    with pytest.raises(ValueError, match="exact=True"):
        SIM.near_duplicate_pairs(df, 0.4)
    with pytest.raises(ValueError, match="exact=True"):
        SIM.semantic_dedup(docs, df, 0.4)  # default candidates='auto'
    # the deliberate opt-ins still work
    assert SIM.near_duplicate_pairs(df, 0.4, exact=True).count() >= 0
    assert SIM.semantic_dedup(docs, df, 0.4, candidates="exact").count() > 0


def test_near_duplicate_pairs_dedup_regime_routes_to_lsh(spark, clustered_corpus):
    """At dedup-regime τ the router must produce the candidate-bounded
    LSH+verify plan (equi-joins only, no nested-loop/cartesian block
    pairing) and match the exact baseline on a clustered corpus."""
    docs, vecs = clustered_corpus
    routed = SIM.near_duplicate_pairs(vecs, 0.95)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = {(r["id1"], r["id2"]) for r in routed.collect()}
    exact = {(r["id1"], r["id2"])
             for r in SIM.cosine_pairs(vecs, 0.95, exact=True).collect()}
    assert got == exact and len(got) > 0


def test_ivf_seeding_has_no_global_sort(spark, emb):
    """IVF centroid seeding must be a sample+limit plan — no Sort /
    TakeOrderedAndProject over the corpus (the old orderBy(id).limit(n)
    ranked every row to pick 16)."""
    cand = SIM.ivf_seed_candidates(emb)
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan and "TakeOrdered" not in plan
    assert "Sample" in plan
    assert len(cand.collect()) >= SIM.IVF_CENTROIDS  # sf sample fills the seed set


def test_lsh_multiprobe_improves_recall(spark, emb):
    """Flip-1-bit query-side multiprobe must dominate the plain bucket
    probe: candidate superset => recall can only rise, and on these
    random embeddings it should clear a higher floor."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries, k=10).collect()
    truth = {(r["qid"], r["cid"]) for r in exact}
    plain = {(r["qid"], r["cid"]) for r in SIM.lsh_bucket_topk(emb, queries, k=10).collect()}
    probed = {
        (r["qid"], r["cid"])
        for r in SIM.lsh_bucket_topk(emb, queries, k=10, multiprobe=True).collect()
    }
    r_plain = len(truth & plain) / len(truth)
    r_probed = len(truth & probed) / len(truth)
    assert r_probed >= r_plain, (r_plain, r_probed)
    # the test embeddings are adversarially random (near-uniform cosine
    # mass, no cluster structure), so the absolute floor is modest; the
    # superset-dominance assertion above is the semantic content.
    assert r_probed >= 0.35, f"multiprobe recall too low: {r_probed}"


def test_sparse_cosine_topk_matches_bruteforce(spark):
    """Posting-join sparse cosine vs a driver-side brute force on a tiny
    corpus: exact equality of the (qid, cid) ranking and rounded scores
    for pairs sharing at least one term."""
    import math

    docs = {
        1: {"a": 2.0, "b": 1.0},
        2: {"a": 2.0, "b": 1.0},          # identical profile -> cosine 1
        3: {"b": 3.0, "c": 4.0},
        4: {"c": 1.0},
        5: {"d": 9.0},                     # shares nothing -> never paired
    }
    rows = [(i, t, w) for i, tw in docs.items() for t, w in tw.items()]
    postings = spark.createDataFrame(rows, "doc_id long, term string, w double")
    got = {
        (r["qid"], r["cid"]): r["cosine"]
        for r in SIM.sparse_cosine_topk(postings, k=3, w_col="w").collect()
    }

    def cos(x, y):
        shared = set(x) & set(y)
        if not shared:
            return None
        dot = sum(x[t] * y[t] for t in shared)
        nx = math.sqrt(sum(v * v for v in x.values()))
        ny = math.sqrt(sum(v * v for v in y.values()))
        return round(dot / (nx * ny), 9)

    want = {}
    for q, qa in docs.items():
        cands = []
        for c, ca in docs.items():
            if c == q:
                continue
            s = cos(qa, ca)
            if s is not None:
                cands.append((-s, c))
        for rank, (negs, c) in enumerate(sorted(cands)[:3]):
            want[(q, c)] = -negs
    assert got == want
    assert got[(1, 2)] == 1.0
    assert not any(q == 5 or c == 5 for q, c in got)


def test_sparse_cosine_topk_df_cap_and_zero_weights(spark):
    """max_df prunes hot terms BEFORE pairing (cosine over the pruned
    vocabulary); zero weights are dropped and never create candidates."""
    rows = (
        # 'stop' appears in 4 docs; 'rare' links only 1 and 2
        [(i, "stop", 1.0) for i in (1, 2, 3, 4)]
        + [(1, "rare", 2.0), (2, "rare", 2.0)]
        + [(3, "zero", 0.0), (4, "zero", 0.0)]
    )
    postings = spark.createDataFrame(rows, "doc_id long, term string, w double")
    capped = SIM.sparse_cosine_topk(postings, k=5, w_col="w", max_df=3).collect()
    pairs = {(r["qid"], r["cid"]) for r in capped}
    # with 'stop' capped away and 'zero' weightless, only 1<->2 remain
    assert pairs == {(1, 2), (2, 1)}
    assert all(r["cosine"] == 1.0 for r in capped)


def test_sparse_cosine_topk_queries_filter(spark):
    rows = [(i, "t", float(i)) for i in (1, 2, 3)]
    postings = spark.createDataFrame(rows, "doc_id long, term string, w double")
    qs = spark.createDataFrame([(1,)], "doc_id long")
    got = SIM.sparse_cosine_topk(postings, qs, k=5, w_col="w").collect()
    assert {r["qid"] for r in got} == {1} and len(got) == 2


def test_lsh_oracle_fixture_dot_margin(sf_dir_oracle):
    """Fixture guard for the embedding_neardup_lsh oracle: its DuckDB
    twin recomputes the sign bits via float sums whose accumulation
    order differs from the Spark side's numpy matmul, so a hyperplane
    dot product near 0 could flip a sign bit between engines.  Assert
    the augmented corpus (base + perturbed twins, exactly as the
    declared query builds it) keeps every |dot| above an epsilon, so a
    testdata refresh that lands near a hyperplane fails HERE with a
    clear message instead of as a driver-gate hash mismatch."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from bigdata_hits_spark.queries_postgate import (
        LSH_ORACLE_PLANES,
        LSH_PERT_IDS,
    )

    tbl = pq.read_table(os.path.join(sf_dir_oracle, "embeddings.parquet"))
    ids = tbl.column("vec_id").to_numpy()
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    pert_mask = ids < LSH_PERT_IDS
    dim = vecs.shape[1]
    scale = np.where(np.arange(dim) % 2 == 0, 1.05, 0.95)
    aug = np.vstack([vecs, vecs[pert_mask] * scale])

    i = np.arange(dim)[:, None]
    j = np.arange(LSH_ORACLE_PLANES)[None, :]
    planes = np.where((i * (2654435761 + j) + j * 40503) % 2 == 0, 1.0, -1.0)
    dots = aug @ planes
    margin = np.abs(dots).min()
    assert margin > 1e-6, (
        f"min |hyperplane dot| = {margin:.3e}: a vector in the refreshed "
        "testdata lies within float-accumulation distance of a sign-LSH "
        "hyperplane; the embedding_neardup_lsh oracle would be "
        "engine-order fragile — regenerate or re-seed the fixture"
    )


def test_rrf_fuse_math_and_topk(spark):
    """RRF = sum of 1/(k0+rank) across lists; candidates absent from a
    list contribute nothing there; per-query top-k keeps the best fused
    scores with the cid tiebreak."""
    r1 = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7)], "qid long, cid long, score double"
    )
    r2 = spark.createDataFrame(
        [(1, 11, 5.0), (1, 13, 4.0)], "qid long, cid long, score double"
    )
    got = {r["cid"]: r["rrf"] for r in SIM.rrf_fuse([r1, r2], k0=60).collect()}
    assert got[11] == round(1 / 62 + 1 / 61, 7)  # rank 2 in r1, rank 1 in r2
    assert got[10] == round(1 / 61, 7)
    assert got[12] == round(1 / 63, 7)
    assert got[13] == round(1 / 62, 7)
    top2 = {r["cid"] for r in SIM.rrf_fuse([r1, r2], k=2, k0=60).collect()}
    assert top2 == {11, 10}  # 11 fused highest, then 10 (1/61 > 1/62 ties none)


def test_rrf_fuse_rank_ties_break_on_cid(spark):
    """Equal scores rank by cid asc — the deterministic retrieval-wide
    tiebreak — so fusion is reproducible across partitionings."""
    r1 = spark.createDataFrame(
        [(1, 20, 1.0), (1, 10, 1.0)], "qid long, cid long, score double"
    )
    got = {r["cid"]: r["rrf"] for r in SIM.rrf_fuse([r1], k0=60).collect()}
    assert got[10] == round(1 / 61, 7) and got[20] == round(1 / 62, 7)


def test_centroid_outliers_flags_planted_outlier(spark):
    from bigdata_hits_spark.operators.similarity import centroid_outliers

    docs = spark.createDataFrame(
        [(i, "A") for i in range(5)] + [(10 + i, "B") for i in range(4)],
        "doc_id long, source string",
    )
    emb_rows = [(i, [0.0, float(i % 2)]) for i in range(4)] + [(4, [50.0, 0.0])]
    emb_rows += [(10 + i, [1.0, 1.0]) for i in range(4)]
    emb = spark.createDataFrame(emb_rows, "vec_id long, embedding array<float>")
    out = centroid_outliers(docs, emb, k=1).collect()
    got = {r["source"]: (r["doc_id"], r["dist"]) for r in out}
    assert got["A"][0] == 4  # the planted far point
    # group B is 4 identical vectors: dist 0, tiebreak lowest doc_id
    assert got["B"] == (10, 0.0)
    # non-broadcast arm agrees
    out2 = centroid_outliers(docs, emb, k=1, broadcast_centroids=False).collect()
    assert {r["source"]: (r["doc_id"], r["dist"]) for r in out2} == got


def test_group_centroid_similarity_known_vectors(spark):
    from bigdata_hits_spark.operators.similarity import group_centroid_similarity

    docs = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "C")], "doc_id long, source string"
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),  # centroid A = (1, 0)
            (3, [0.0, 2.0]),  # centroid B = (0, 2)
            (4, [1.0, 1.0]),  # centroid C = (1, 1)
        ],
        "vec_id long, embedding array<float>",
    )
    out = {(r["g1"], r["g2"]): r["cosine"]
           for r in group_centroid_similarity(docs, emb).collect()}
    assert out[("A", "B")] == 0.0
    assert out[("A", "C")] == round(1 / 2 ** 0.5, 6)
    assert out[("B", "C")] == round(1 / 2 ** 0.5, 6)


def test_standardize_embeddings_moments_and_dead_dim(spark):
    from pyspark.sql import functions as F

    from bigdata_hits_spark.operators.similarity import standardize_embeddings

    rows = [(i, [float(i), 5.0, float(i % 3)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = standardize_embeddings(df)
    el = out.select("id", F.posexplode("zvec").alias("dim", "z"))
    stats = {
        r["dim"]: (r["mu"], r["sd"])
        for r in el.groupBy("dim")
        .agg(F.avg("z").alias("mu"), F.stddev_samp("z").alias("sd"))
        .collect()
    }
    for d in (0, 2):  # real dims: mean ~0, sd ~1 (rounding noise only)
        assert abs(stats[d][0]) < 1e-4
        assert abs(stats[d][1] - 1.0) < 1e-4
    # constant dim standardizes to exactly 0.0, not a division error
    assert stats[1] == (0.0, 0.0)


def test_mmr_topk_lam1_is_plain_topk_and_deterministic(spark):
    from bigdata_hits_spark.operators.similarity import cosine_topk, mmr_topk

    rows = [
        (i, [float((i * 3 + d * 5) % 11) + 0.5 for d in range(4)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id < 2")
    # lam = 1: redundancy term vanishes -> same set and order as top-k
    mmr = mmr_topk(df, queries, k=5, pool=10, lam=1.0).collect()
    plain = cosine_topk(df, queries, k=5).collect()
    got = {(r["qid"], r["rank"]): r["cid"] for r in mmr}
    want = {}
    for r in plain:
        want.setdefault(r["qid"], []).append((r["cosine"], r["cid"]))
    for qid, lst in want.items():
        for rank, (_, cid) in enumerate(
            sorted(lst, key=lambda t: (-t[0], t[1])), start=1
        ):
            assert got[(qid, rank)] == cid
    # deterministic across partitionings
    again = mmr_topk(df.repartition(7), queries, k=5, pool=10, lam=1.0).collect()
    assert sorted(map(tuple, mmr)) == sorted(map(tuple, again))


def test_mmr_topk_diversifies(spark):
    from bigdata_hits_spark.operators.similarity import mmr_topk

    # two tight clusters: near-dups of the query direction, and an
    # orthogonal-ish cluster.  Plain top-2 stays in cluster A; MMR with
    # a low lam must pull its second pick from cluster B.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.02, 0.0]),
        (2, [0.98, 0.03, 0.0]),
        (3, [0.5, 0.86, 0.0]),
        (4, [0.49, 0.87, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id = 0")
    low = mmr_topk(df, queries, k=2, pool=4, lam=0.2).collect()
    picks = [r["cid"] for r in sorted(low, key=lambda r: r["rank"])]
    assert picks[0] in (1, 2)  # best relevance first, always
    assert picks[1] in (3, 4)  # diversity forces the second cluster
    assert mmr_topk(df, queries, k=2, pool=4, lam=1.0).collect()[1]["cid"] in (1, 2)


def test_mmr_topk_distributed_equals_driver(spark, sf_dir_oracle):
    """The applyInPandas arm runs the IDENTICAL greedy kernel per query
    (same rounding, same tiebreaks) — every (qid, cid, rank, mmr) row
    must match the driver path exactly, on both a synthetic pool with
    deliberate near-ties and the real embeddings fixture."""
    from bigdata_hits_spark.operators.similarity import mmr_topk
    from bigdata_hits_spark.sources.readers import load_table

    rows = [
        (i, [float((i * 3 + d * 5) % 11) + 0.5 for d in range(4)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter("vec_id < 3")
    for lam in (0.2, 0.7, 1.0):
        drv = mmr_topk(df, queries, k=5, pool=10, lam=lam, distributed=False).collect()
        dist = mmr_topk(df, queries, k=5, pool=10, lam=lam, distributed=True).collect()
        assert sorted(map(tuple, drv)) == sorted(map(tuple, dist)), f"lam={lam}"

    emb = load_table(spark, sf_dir_oracle, "embeddings")
    q = emb.filter("vec_id % 100 = 0")
    drv = mmr_topk(emb, q, k=5, pool=20, lam=0.7, distributed=False).collect()
    dist = mmr_topk(emb, q, k=5, pool=20, lam=0.7, distributed=True).collect()
    assert sorted(map(tuple, drv)) == sorted(map(tuple, dist))


def test_mmr_topk_default_plan_has_no_driver_collect(spark):
    """The DEFAULT arm must be the distributed one: its plan is a lazy
    DataFrame ending in FlatMapGroupsInPandas — no createDataFrame of
    collected rows (a driver-built result has a LocalTableScan /
    LogicalRDD leaf and no pandas-group node)."""
    from bigdata_hits_spark.operators.similarity import mmr_topk

    rows = [(i, [float((i * 7 + d) % 13) + 1.0 for d in range(4)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_topk(df, df.filter("vec_id < 2"), k=3, pool=8, lam=0.5)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandas" in plan


def test_mmr_topk_rejects_bad_lam(spark):
    import pytest

    from bigdata_hits_spark.operators.similarity import mmr_topk

    df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        mmr_topk(df, df, lam=1.5)


def test_truncate_renormalize_matches_numpy(spark):
    import numpy as np

    from bigdata_hits_spark.operators.similarity import truncate_renormalize

    rng = np.random.RandomState(11)
    base = rng.normal(size=(40, 8))
    base[0] = 0.0  # all-zero row -> zero output, not NaN
    df = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(base)],
        "vec_id long, embedding array<double>",
    )
    got = {r["id"]: list(r["tvec"]) for r in truncate_renormalize(df, 4).collect()}
    for i, row in enumerate(base):
        t = row[:4]
        n = float(np.linalg.norm(t))
        want = [round(float(x) / n, 6) if n > 0 else 0.0 for x in t]
        assert got[i] == want, i
    import pytest

    with pytest.raises(ValueError, match="dims"):
        truncate_renormalize(df, 0)


def test_ann_recall_report_exact_on_fixture(spark):
    """Recall is computable and correct: when the approximate path IS
    the exact one (IVF probing every centroid), recall must be 1.0 for
    every query; and the LSH report's recall matches the set-intersection
    computed by hand."""
    from bigdata_hits_spark.operators import similarity as S

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    full = S.ann_recall_report(
        emb, queries, k=5, method="ivf", n_centroids=4, n_probe=4
    ).collect()
    assert len(full) == 3 and all(r["recall"] == 1.0 for r in full)

    rep = {r["qid"]: r for r in S.ann_recall_report(emb, queries, k=5, method="lsh").collect()}
    exact = S.cosine_topk(emb, queries, k=5).collect()
    approx = S.lsh_bucket_topk(emb, queries, k=5).collect()
    truth, got = {}, {}
    for r in exact:
        truth.setdefault(r["qid"], set()).add(r["cid"])
    for r in approx:
        got.setdefault(r["qid"], set()).add(r["cid"])
    for qid, t in truth.items():
        want = round(len(t & got.get(qid, set())) / len(t), 6)
        assert rep[qid]["recall"] == want and rep[qid]["n_true"] == len(t)

    import pytest

    with pytest.raises(ValueError, match="method"):
        S.ann_recall_report(emb, queries, method="nope")


def test_ivf_quantized_recall_and_error_floor(spark, emb):
    """The quantized IVF path recovers most of the exact top-10 (same
    floor as the float IVF path) and its scores sit within the int8
    error envelope of the exact cosines on shared pairs."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries, k=10).collect()
    approx = SIM.ivf_quantized_topk(emb, queries, k=10).collect()
    truth = {(r["qid"], r["cid"]): r["cosine"] for r in exact}
    got = {(r["qid"], r["cid"]): r["cosine"] for r in approx}
    recall = len(set(truth) & set(got)) / len(truth)
    assert recall >= 0.3, f"quantized IVF recall too low: {recall}"
    for pair in set(truth) & set(got):
        assert abs(truth[pair] - got[pair]) < 0.03, pair


def test_ivfq_rerank_equals_ivf_topk_when_probing_all(spark, emb):
    """With every centroid probed, the quantized path sees the same
    candidate set as the float IVF path; the rerank arm re-scores its
    survivor pool full-precision, so with a pool comfortably above k the
    output (ids AND cosines) must equal ivf_topk's exactly — the
    two-stage shape loses nothing when the coarse stage over-fetches."""
    queries = emb.filter(F.col("vec_id") < 5)
    kw = dict(k=10, n_centroids=4, n_probe=4)
    exact = SIM.ivf_topk(emb, queries, **kw).collect()
    reranked = SIM.ivf_quantized_topk(
        emb, queries, rerank=True, rerank_pool=100, **kw
    ).collect()
    want = {(r["qid"], r["cid"], r["cosine"]) for r in exact}
    got = {(r["qid"], r["cid"], r["cosine"]) for r in reranked}
    assert got == want


def test_ann_recall_report_ivfq(spark, emb):
    """The recall report runs over the quantized path; with probe-all +
    rerank it must read 1.0 per query (it IS the exact top-k then), and
    the default quantized path clears the same conservative floor as the
    float IVF path."""
    queries = emb.filter(F.col("vec_id") < 5)
    full = SIM.ann_recall_report(
        emb, queries, k=10, method="ivfq",
        n_centroids=4, n_probe=4, rerank=True, rerank_pool=100,
    ).collect()
    assert len(full) == 5 and all(r["recall"] == 1.0 for r in full)
    rep = SIM.ann_recall_report(emb, queries, k=10, method="ivfq").collect()
    mean_recall = sum(r["recall"] for r in rep) / len(rep)
    assert mean_recall >= 0.3, f"quantized IVF mean recall too low: {mean_recall}"


def test_ivfpq_recall_floor_and_rerank_exactness(spark, emb):
    """IVF-PQ with the full-precision rerank must clear the family's
    recall floor on the adversarially random fixture, and every score
    it returns must EQUAL the exact cosine for that (qid, cid) pair —
    the rerank arm scores on the true vectors, PQ only prunes."""
    queries = emb.filter(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(emb, queries, k=10).collect()
    approx = SIM.ivfpq_topk(emb, queries, k=10, rerank=True).collect()
    truth = {(r["qid"], r["cid"]) for r in exact}
    got = {(r["qid"], r["cid"]) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.3, f"IVF-PQ recall too low: {recall}"
    exact_scores = {(r["qid"], r["cid"]): r["cosine"] for r in exact}
    for r in approx:
        key = (r["qid"], r["cid"])
        if key in exact_scores:
            assert r["cosine"] == exact_scores[key], key


def test_pq_codebooks_deterministic_and_reconstruction_bounded(spark, emb):
    """Codebook training is seeded + deterministic; the 8-byte
    reconstruction must stay meaningfully correlated with the original
    vector (cosine(orig, reconstruction) well above random)."""
    import numpy as np

    b1 = SIM.pq_codebooks(emb)
    b2 = SIM.pq_codebooks(emb)
    assert np.array_equal(b1, b2)
    assert b1.shape == (SIM.PQ_SUBSPACES, SIM.PQ_CODES, 64 // SIM.PQ_SUBSPACES)
    rec = emb.select(
        SIM.dot(
            F.col("embedding"),
            SIM.pq_reconstruct(SIM._pq_encode_udf(b1)(F.col("embedding")), b1),
        ).alias("d"),
        SIM.l2_norm(F.col("embedding")).alias("n1"),
        SIM.l2_norm(
            SIM.pq_reconstruct(SIM._pq_encode_udf(b1)(F.col("embedding")), b1)
        ).alias("n2"),
    ).selectExpr("avg(d / (n1 * n2)) AS mc").first()["mc"]
    assert rec > 0.5, f"PQ reconstruction barely correlates: {rec}"


def test_ivf_from_persisted_index_equals_in_session(spark, emb):
    """The persisted-index serve path must return the IDENTICAL result
    set (ids AND cosines) as the in-session ivf_topk for the same
    quantizer — the build/serve equality contract of the layout family
    (persist_triangle_layout precedent)."""
    queries = emb.filter(F.col("vec_id") < 5)
    pt, ct = SIM.persist_ivf_index(emb, "t_ivf_layout", buckets=4)
    assert pt == "t_ivf_layout_postings" and ct == "t_ivf_layout_centroids"
    served = SIM.ivf_topk_from_index(spark, "t_ivf_layout", queries, k=10)
    insess = SIM.ivf_topk(emb, queries, k=10)
    key = lambda r: (r["qid"], r["cid"], r["cosine"])
    assert sorted(map(key, served.collect())) == sorted(map(key, insess.collect()))
    # serving must not retrain: the plan reads the bucketed postings
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "t_ivf_layout_postings" in plan
