"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — exact brute-force top-k neighbors for a query
  set: O(|Q|·|C|·d) but fully JVM-side (zip_with/aggregate column
  expressions, no UDFs).  The baseline every ANN variant is measured
  against.
- :func:`lsh_bucket_topk` — the scale path: random-hyperplane (sign-LSH)
  signatures bucket the corpus; each query only scores candidates sharing
  its bucket (or a banded sub-signature).  Hyperplanes are deterministic
  ±1 patterns derived from (plane, dim) index parity so results are
  reproducible across engines and runs.

Ranking determinism: neighbors are ordered by cosine ROUNDED to 9 digits
with vec_id tiebreak, so cross-engine float drift (~1e-15) cannot flip
ranks (see oracles.py parity notes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F

LSH_PLANES = 16
LSH_BANDS = 4  # 4-bit sub-signatures for candidate banding

#: Cosine threshold above which sign-LSH banded candidates recall ~all
#: true pairs (near-identical vectors agree on nearly every sign bit).
#: Below it the LSH generator under-recalls and the exact all-pairs plan
#: is the only correct one — but that plan is O(n²/B) compute with
#: ~num_blocks× replication, so it is gated behind an explicit opt-in.
LSH_SAFE_THRESHOLD = 0.9


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product with double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(qid, cid, cosine): exact top-k by cosine for each query vector,
    excluding self-matches."""
    norms_c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"), l2_norm(F.col(vec_col)).alias("cnrm")
    )
    norms_q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"), l2_norm(F.col(vec_col)).alias("qnrm")
    )
    pairs = norms_q.crossJoin(norms_c).filter(F.col("qid") != F.col("cid"))
    scored = pairs.select(
        "qid",
        "cid",
        F.round(dot(F.col("qvec"), F.col("cvec")) / (F.col("qnrm") * F.col("cnrm")), 9).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
    )


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    num_blocks: int = 8,
    exact: bool = False,
) -> DataFrame:
    """(id1, id2, cosine): all pairs id1 < id2 with rounded cosine >=
    threshold — embedding-based near-duplicate detection.

    THIS IS THE ALL-PAIRS PLAN — the exact baseline, not the production
    path.  Below :data:`LSH_SAFE_THRESHOLD` (where LSH under-recalls and
    exact is the only correct answer) it refuses to run without
    ``exact=True``, so a low-τ request cannot silently launch an O(n²)
    job; at dedup-regime thresholds use :func:`near_duplicate_pairs`,
    which routes to LSH candidates + exact verify automatically.

    Blocked matrix-product plan: vectors hash into ``num_blocks`` blocks,
    blocks pair up (upper triangle incl. diagonal), and each block pair is
    scored as ONE numpy float64 gram matrix inside ``mapInPandas`` — BLAS
    does the n1·n2·d work instead of a per-element expression fold over n²
    join rows.  Communication is the standard all-pairs lower bound (each
    block replicated ~num_blocks times); thresholding happens inside the
    worker so only qualifying pairs ever leave it.  At cluster scale,
    raise ``num_blocks`` so a block pair (~2·(n/B)·d doubles) fits in one
    task's memory.
    """
    if threshold < LSH_SAFE_THRESHOLD and not exact:
        raise ValueError(
            f"cosine_pairs at threshold={threshold} (< LSH_SAFE_THRESHOLD="
            f"{LSH_SAFE_THRESHOLD}) is an all-pairs O(n²) plan; pass "
            "exact=True to opt in, or raise the threshold into the dedup "
            "regime and use near_duplicate_pairs (LSH candidates + verify)"
        )
    blocks = (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .groupBy(F.pmod(F.hash(F.col("id")), F.lit(num_blocks)).alias("blk"))
        .agg(F.collect_list(F.col("id")).alias("ids"), F.collect_list(F.col("vec")).alias("vecs"))
    )
    a = blocks.select(
        F.col("blk").alias("blk1"), F.col("ids").alias("ids1"), F.col("vecs").alias("vecs1")
    )
    b = blocks.select(
        F.col("blk").alias("blk2"), F.col("ids").alias("ids2"), F.col("vecs").alias("vecs2")
    )
    block_pairs = a.join(b, F.col("blk1") <= F.col("blk2")).repartition(
        num_blocks * (num_blocks + 1) // 2
    )
    # Raw cosines cross the Arrow boundary with a tolerance margin; the
    # final round/threshold happens JVM-side so rounding semantics are
    # exactly F.round (HALF_UP), identical to the SQL oracle.
    margin = 10.0 ** (-round_digits) / 2.0

    def score(batches):
        for pdf in batches:
            out_id1, out_id2, out_cos = [], [], []
            for row in pdf.itertuples(index=False):
                same = row.blk1 == row.blk2
                ids1 = np.asarray(row.ids1)
                ids2 = ids1 if same else np.asarray(row.ids2)
                v1 = np.array([np.asarray(v, dtype=np.float64) for v in row.vecs1])
                v2 = v1 if same else np.array(
                    [np.asarray(v, dtype=np.float64) for v in row.vecs2]
                )
                n1 = np.linalg.norm(v1, axis=1)
                n2 = n1 if same else np.linalg.norm(v2, axis=1)
                cos = (v1 @ v2.T) / np.outer(n1, n2)
                keep = cos >= threshold - margin
                if same:
                    keep &= ids1[:, None] < ids2[None, :]
                i, j = np.nonzero(keep)
                # Each unordered cross-block pair appears in exactly one
                # (blk1 <= blk2) row — canonicalize to (min, max) here.
                out_id1.append(np.minimum(ids1[i], ids2[j]))
                out_id2.append(np.maximum(ids1[i], ids2[j]))
                out_cos.append(cos[i, j])
            yield pd.DataFrame(
                {
                    "id1": np.concatenate(out_id1) if out_id1 else np.array([], dtype=np.int64),
                    "id2": np.concatenate(out_id2) if out_id2 else np.array([], dtype=np.int64),
                    "cosine": np.concatenate(out_cos) if out_cos else np.array([], dtype=np.float64),
                }
            )

    id_type = vectors.schema[id_col].dataType.simpleString()
    scored = block_pairs.mapInPandas(
        score, schema=f"id1 {id_type}, id2 {id_type}, cosine double"
    )
    return scored.select(
        "id1", "id2", F.round(F.col("cosine"), round_digits).alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def group_centroids(
    vectors: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """(group, centroid, n): per-group mean vector — cluster/topic
    summarization, IVF seeding, per-source drift monitoring.

    posexplode -> per-(group, dimension) avg -> re-assemble via
    sort_array(collect_list(struct)): two key-only shuffles, no UDFs, and
    the group count rides the same aggregates.  Dimension count is
    per-row data, so no fixed-width schema is assumed."""
    dims = (
        vectors.select(F.col(group_col).alias("grp"), F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("grp", "pos")
        .agg(F.avg("x").alias("m"), F.count(F.lit(1)).alias("n_pos"))
    )
    return (
        dims.groupBy("grp")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid"),
            F.max("n_pos").alias("n"),
        )
        .withColumnsRenamed({"grp": group_col})
    )


def lsh_candidate_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """(id1, id2) with id1 < id2: pairs sharing at least one sign-LSH
    band — the candidate stage of scale-safe near-dup detection.

    One signature pass, one explode to ``bands`` rows/vector, one
    self-equi-join on (band_id, band_sig): work is bounded by bucket
    sizes (sum of squares per bucket), never |V|², and the join is a
    plain shuffle equi-join — AQE/skew-split eligible, no cross join.
    At high cosine thresholds (the dedup regime, >= ~0.9) near-identical
    vectors agree on nearly every sign bit, so band recall is ~1; at low
    thresholds this candidate generator under-recalls by design — use
    :func:`cosine_pairs` there (exact baseline)."""
    band_bits = planes // bands
    sig_udf = lsh_signature_udf(planes)
    sigs = vectors.select(F.col(id_col).alias("id"), sig_udf(F.col(vec_col)).alias("sig"))
    bandarr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftright(F.col("sig"), b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("band_sig"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("id", F.explode(bandarr).alias("bb")).select(
        "id", F.col("bb.band_id").alias("band_id"), F.col("bb.band_sig").alias("band_sig")
    )
    a = banded.select(F.col("id").alias("id1"), "band_id", "band_sig")
    b = banded.select(F.col("id").alias("id2"), "band_id", "band_sig")
    return (
        a.join(b, ["band_id", "band_sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates()
    )


def verify_cosine_pairs(
    vectors: DataFrame,
    candidates: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact-verify candidate (id1, id2) pairs: attach both vectors by
    equi-join, compute the rounded cosine with the same round/threshold
    discipline as :func:`cosine_pairs`, keep qualifying pairs.  Output
    schema matches cosine_pairs: (id1, id2, cosine).

    Work is O(|candidates|·d) — candidate-bounded, not all-pairs — and
    both attach joins are id equi-joins (vectors shuffle at most twice,
    never replicate num_blocks×)."""
    v1 = vectors.select(
        F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"), l2_norm(F.col(vec_col)).alias("n1")
    )
    v2 = vectors.select(
        F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"), l2_norm(F.col(vec_col)).alias("n2")
    )
    scored = (
        candidates.join(v1, "id1")
        .join(v2, "id2")
        .select(
            "id1",
            "id2",
            F.round(dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")), round_digits).alias(
                "cosine"
            ),
        )
    )
    return scored.filter(F.col("cosine") >= threshold)


def near_duplicate_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    planes: int = LSH_PLANES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """(id1, id2, cosine): embedding near-dup pairs with the threshold-
    regime split ENFORCED — the front door for pair detection.

    - ``threshold >= LSH_SAFE_THRESHOLD`` (the dedup regime): sign-LSH
      banded candidates + exact cosine verify.  Candidate-bounded work,
      equi-joins only — the plan that survives 100 TB.
    - below it: LSH under-recalls, so the only correct plan is all-pairs
      — which requires the explicit ``exact=True`` opt-in (refused
      otherwise, so a similarity-regime τ cannot accidentally launch an
      O(n²) job).
    - ``exact=True`` at any τ: the blocked-BLAS all-pairs baseline.
    """
    if exact:
        return cosine_pairs(vectors, threshold, id_col=id_col, vec_col=vec_col, exact=True)
    if threshold >= LSH_SAFE_THRESHOLD:
        cand = lsh_candidate_pairs(
            vectors, id_col=id_col, vec_col=vec_col, planes=planes, bands=bands
        )
        return verify_cosine_pairs(vectors, cand, threshold, id_col=id_col, vec_col=vec_col)
    raise ValueError(
        f"near_duplicate_pairs at threshold={threshold} is below the LSH-safe "
        f"regime ({LSH_SAFE_THRESHOLD}): banded candidates under-recall, and "
        "the exact plan is O(n²) — pass exact=True to opt in deliberately"
    )


def semantic_dedup(
    docs: DataFrame,
    vectors: DataFrame,
    threshold: float = 0.95,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: str = "auto",
    planes: int = LSH_PLANES,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Embedding-based near-dup removal: near-duplicate pairs over
    ``vectors``, clustered transitively, one minimum-id survivor per
    cluster kept in ``docs``.  The embedding-space twin of
    ``pipeline.clean_corpus``'s lexical MinHash stage — catches
    paraphrases MinHash misses.

    ``candidates`` picks the pair generator:

    - ``'auto'`` (default): the enforced regime split of
      :func:`near_duplicate_pairs` — LSH + verify in the dedup regime
      (threshold >= :data:`LSH_SAFE_THRESHOLD`), and a ValueError below
      it unless the caller explicitly chooses ``'exact'`` (so a low-τ
      request can never silently run the O(n²) plan).
    - ``'lsh'``: sign-LSH banded candidates (:func:`lsh_candidate_pairs`)
      exact-verified with the cosine_pairs round/threshold discipline
      (:func:`verify_cosine_pairs`).  Candidate-bounded work, equi-joins
      only — survives 100 TB.  Below the safe threshold this explicit
      choice is honored but under-recalls by design.
    - ``'exact'``: blocked-BLAS all-pairs (:func:`cosine_pairs`) — the
      exact baseline; O(n²/B) compute and ~num_blocks× replication, for
      modest corpora or ground-truth runs only."""
    from bigdata_hits_spark.operators.components import dedup_survivors

    if candidates == "auto":
        pairs = near_duplicate_pairs(
            vectors, threshold, id_col=vec_id_col, vec_col=vec_col, planes=planes, bands=bands
        )
    elif candidates == "exact":
        pairs = cosine_pairs(vectors, threshold, id_col=vec_id_col, vec_col=vec_col, exact=True)
    elif candidates == "lsh":
        cand = lsh_candidate_pairs(
            vectors, id_col=vec_id_col, vec_col=vec_col, planes=planes, bands=bands
        )
        pairs = verify_cosine_pairs(vectors, cand, threshold, id_col=vec_id_col, vec_col=vec_col)
    else:
        raise ValueError(
            f"unknown candidates mode: {candidates!r} (use 'auto', 'lsh' or 'exact')"
        )
    return dedup_survivors(docs, pairs, id_col=doc_id_col)


def _hyperplane_matrix(planes: int, dim: int):
    """Deterministic ±1 hyperplane matrix (planes × dim): entry (j, i) is
    +1 when ``(i·(2654435761+j) + j·40503) mod 2 == 0``.  A fixed
    odd-multiplier parity keeps it portable, seedless, and rebuildable on
    any worker without shipping state."""
    i = np.arange(dim, dtype=np.int64)
    rows = [
        np.where((i * (2654435761 + j) + j * 40503) % 2 == 0, 1.0, -1.0)
        for j in range(planes)
    ]
    return np.stack(rows)  # (planes, dim)


def lsh_signature_udf(planes: int = LSH_PLANES):
    """Vectorized sign-LSH signature: bit j set when dot(vec,
    hyperplane_j) > 0.  One numpy matmul per Arrow batch scores every
    (vector, plane) pair — the per-plane expression-fold alternative
    re-walks each array ``planes`` times in the interpreter."""
    from pyspark.sql.functions import pandas_udf

    weights = (np.int64(1) << np.arange(planes, dtype=np.int64))  # (planes,)

    @pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int64")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])  # (n, d)
        h = _hyperplane_matrix(planes, mat.shape[1])  # (planes, d)
        bits = (mat @ h.T) > 0  # (n, planes)
        return pd.Series(bits @ weights)

    return sig


IVF_CENTROIDS = 16
IVF_PROBE = 4
IVF_LLOYD_ITERS = 2


def _assign_udf(centroids):
    """Vectorized nearest-centroid assignment (cosine): argmax over the
    unit-centroid matrix, one matmul per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(mat @ c.T, axis=1).astype("int32"))

    return assign


IVF_SEED_FRACTION = 0.1
IVF_SEED = 17


def ivf_seed_candidates(
    corpus: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fraction: float = IVF_SEED_FRACTION,
    seed: int = IVF_SEED,
) -> DataFrame:
    """Lazy seed-candidate plan: a seeded Bernoulli sample limited to
    ``n_centroids`` rows — NO global sort.  The previous
    ``orderBy(id).limit(n)`` seeding ranked the ENTIRE corpus
    (per-partition top-n heaps + driver merge) to pick 16 rows; a sample
    is a narrow scan that the limit short-circuits after the first few
    partitions.  Deterministic for a fixed corpus layout and seed (the
    sampler is seeded per partition), which is the reproducibility that
    matters for a stored corpus."""
    return (
        corpus.select(id_col, vec_col)
        .sample(fraction=fraction, seed=seed)
        .limit(n_centroids)
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    iters: int = IVF_LLOYD_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic coarse quantizer: seed from a seeded sample
    (:func:`ivf_seed_candidates` — no global sort), then ``iters``
    distributed Lloyd rounds (assign via a broadcast numpy matmul;
    re-center via posexplode + per-dimension mean — the centroid matrix
    itself is tiny and lives on the driver).

    Returns the (n_centroids, d) numpy array.  A corpus too small for the
    sample to fill ``n_centroids`` rows falls back to ``limit(n)`` (still
    sort-free)."""
    seed_rows = ivf_seed_candidates(corpus, n_centroids, id_col, vec_col).collect()
    if len(seed_rows) < n_centroids:
        seed_rows = corpus.select(id_col, vec_col).limit(n_centroids).collect()
    centroids = np.array([np.asarray(r[vec_col], dtype=np.float64) for r in seed_rows])
    for _ in range(iters):
        assigned = corpus.select(
            _assign_udf(centroids)(F.col(vec_col)).alias("cluster"), F.col(vec_col).alias("vec")
        )
        means = (
            assigned.select("cluster", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        for row in means:
            centroids[row["cluster"], row["pos"]] = row["m"]
    return centroids


#: Session-lifetime cache of IVF centroid matrices, keyed on
#: (applicationId, corpus plan semantic hash, quantizer params).  Building
#: the index costs IVF_LLOYD_ITERS distributed rounds with driver
#: collects; a production 100 TB corpus would build it ONCE and persist it
#: alongside the data, so repeated ``ivf_topk`` calls in a session paying
#: that cost every time was a bench artifact, not a design intent.
_IVF_CACHE: dict[tuple, "np.ndarray"] = {}


def ivf_centroids_cached(
    corpus: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    iters: int = IVF_LLOYD_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Memoized :func:`ivf_centroids` — same (session, corpus plan,
    params) returns the cached matrix.  ``semanticHash`` identifies the
    corpus by its optimized logical plan, so two DataFrames reading the
    same table hit the same entry."""
    spark = corpus.sparkSession
    key = (
        spark.sparkContext.applicationId,
        corpus.semanticHash(),
        n_centroids,
        iters,
        id_col,
        vec_col,
    )
    if key not in _IVF_CACHE:
        live = spark.sparkContext.applicationId
        for stale in [k for k in _IVF_CACHE if k[0] != live]:
            _IVF_CACHE.pop(stale)
        _IVF_CACHE[key] = ivf_centroids(corpus, n_centroids, iters, id_col, vec_col)
    return _IVF_CACHE[key]


def _ivf_probe_score(
    indexed: DataFrame,
    queries: DataFrame,
    centroids,
    k: int,
    n_probe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared IVF query side: each query explodes to its ``n_probe``
    nearest coarse buckets, candidates arrive via a plain equi-join on
    the cluster id against ``indexed`` (cid, cvec, cnrm, cluster), and
    the rounded-cosine window takes the top k.  ``indexed`` is either
    the in-session assignment (:func:`ivf_topk`) or the persisted
    postings table (:func:`ivf_topk_from_index`) — results are
    identical by construction for the same centroid matrix."""
    from pyspark.sql.functions import pandas_udf

    c_unit = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(mat @ c_unit.T), axis=1)[:, :n_probe].astype("int32")
        return pd.Series(list(order))

    probed = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qnrm"),
        F.explode(probes(F.col(vec_col))).alias("cluster"),
    )
    scored = (
        probed.join(indexed, "cluster")
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.round(dot(F.col("qvec"), F.col("cvec")) / (F.col("qnrm") * F.col("cnrm")), 9).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are inverted-file-bucketed by
    nearest centroid; each query exact-scores only the vectors in its
    ``n_probe`` nearest buckets.  Work drops from |Q|·|C| to roughly
    |Q|·|C|·n_probe/n_centroids, and the candidate join is a plain
    equi-join on the cluster id — shuffle-partitioned, AQE/skew eligible,
    no index structure to ship."""
    centroids = ivf_centroids_cached(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    assign = _assign_udf(centroids)
    indexed = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        l2_norm(F.col(vec_col)).alias("cnrm"),
        assign(F.col(vec_col)).alias("cluster"),
    )
    return _ivf_probe_score(indexed, queries, centroids, k, n_probe, id_col, vec_col)


def persist_ivf_index(
    corpus: DataFrame,
    table_prefix: str,
    n_centroids: int = IVF_CENTROIDS,
    iters: int = IVF_LLOYD_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    buckets: int = 16,
) -> tuple:
    """Persist the IVF index as TWO tables — the build half of the ANN
    build/serve split, following the persist_triangle_layout /
    persist_scc_labels precedent (operators/graphalgs.py:183,
    operators/components.py:459): pay the quantizer training
    (IVF_LLOYD_ITERS distributed Lloyd rounds) and the corpus
    assignment pass ONCE at ingestion time, so serving sessions skip
    both.

    ``{prefix}_postings`` — (cluster, cid, cvec, cnrm): the inverted
    file, hash-BUCKETED on ``cluster`` so the serve-time candidate join
    reads the corpus already distributed on the join key (zero
    corpus-sized exchange at query time — at 100 TB the postings scan
    is the only big input left in the serve plan, and it arrives
    pre-partitioned).  ``{prefix}_centroids`` — (cluster, centroid):
    n_centroids x d rows, the driver-side probe matrix.  Returns the
    two table names."""
    from bigdata_hits_spark.sources.bucketed import (
        clear_orphaned_location,
        write_bucketed,
    )

    centroids = ivf_centroids(corpus, n_centroids, iters, id_col, vec_col)
    assign = _assign_udf(centroids)
    postings = corpus.select(
        assign(F.col(vec_col)).alias("cluster"),
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        l2_norm(F.col(vec_col)).alias("cnrm"),
    )
    pt, ct = f"{table_prefix}_postings", f"{table_prefix}_centroids"
    write_bucketed(postings, pt, "cluster", buckets)
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(centroids)],
        "cluster int, centroid array<double>",
    )
    clear_orphaned_location(spark, ct)
    cent_df.write.format("parquet").mode("overwrite").saveAsTable(ct)
    return pt, ct


def ivf_topk_from_index(
    spark,
    table_prefix: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = IVF_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve IVF top-k from an index written by :func:`persist_ivf_index`
    — identical results to :func:`ivf_topk` with the same quantizer
    (equality-tested in tests/test_similarity.py).  The cold path loads
    n_centroids x d doubles to the driver (bounded, independent of
    corpus size) and starts directly at the probe join against the
    bucketed postings scan: no Lloyd rounds, no assignment pass, no
    corpus-sized shuffle."""
    from bigdata_hits_spark.sources.bucketed import read_bucketed

    rows = spark.table(f"{table_prefix}_centroids").orderBy("cluster").collect()
    centroids = np.array([np.asarray(r["centroid"], dtype=np.float64) for r in rows])
    indexed = read_bucketed(spark, f"{table_prefix}_postings")
    return _ivf_probe_score(indexed, queries, centroids, k, n_probe, id_col, vec_col)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = LSH_PLANES,
    bands: int = LSH_BANDS,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing at least one
    banded sub-signature with the query.  At corpus scale this replaces
    the |Q|×|C| cross join with a bucket equi-join — the standard
    recall/throughput trade.

    ``multiprobe=True`` additionally probes, per query band, every
    bucket at Hamming distance 1 (each single sign-bit flipped) — the
    classic multiprobe-LSH recall boost.  Only the QUERY side fans out
    (bands × (1 + band_bits) probe rows per query); the corpus keeps one
    row per band, so corpus storage and shuffle volume are unchanged —
    which is the whole point: queries are the small side.
    """
    band_bits = planes // bands
    sig_udf = lsh_signature_udf(planes)

    def with_bands(df: DataFrame, role: str, probe: bool = False) -> DataFrame:
        sig = sig_udf(F.col(vec_col))
        rows = df.select(
            F.col(id_col).alias(f"{role}id"),
            F.col(vec_col).alias(f"{role}vec"),
            l2_norm(F.col(vec_col)).alias(f"{role}nrm"),
            sig.alias("sig"),
        )
        entries = []
        for b in range(bands):
            band_sig = (
                F.shiftright(F.col("sig"), b * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
            )
            entries.append(
                F.struct(F.lit(b).alias("band_id"), band_sig.alias("band_sig"))
            )
            if probe:
                entries += [
                    F.struct(
                        F.lit(b).alias("band_id"),
                        band_sig.bitwiseXOR(F.lit(1 << bit)).alias("band_sig"),
                    )
                    for bit in range(band_bits)
                ]
        return rows.select(
            f"{role}id", f"{role}vec", f"{role}nrm", F.explode(F.array(*entries)).alias("bb")
        ).select(
            f"{role}id",
            f"{role}vec",
            f"{role}nrm",
            F.col("bb.band_id").alias("band_id"),
            F.col("bb.band_sig").alias("band_sig"),
        )

    qb = with_bands(queries, "q", probe=multiprobe)
    cb = with_bands(corpus, "c")
    candidates = (
        qb.join(cb, ["band_id", "band_sig"])
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "qvec", "qnrm", "cid", "cvec", "cnrm")
        .dropDuplicates(["qid", "cid"])
    )
    scored = candidates.select(
        "qid",
        "cid",
        F.round(dot(F.col("qvec"), F.col("cvec")) / (F.col("qnrm") * F.col("cnrm")), 9).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def quantize_embeddings(
    vectors: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q_embedding",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q_i = round(x_i / s)``
    with ``s = max|x| / 127`` — an ``array<tinyint>`` plus one double
    scale per row, 4-8x smaller than float32/64 arrays at rest AND in
    every shuffle/broadcast that moves vectors.

    Pure Column expressions (transform/array_max), no UDF.  Zero vectors
    get scale 0 and quantize to zeros.  The quantization error per
    coordinate is <= s/2, so dequantized cosine deviates by O(1/127) —
    fine for ANN candidate generation; re-rank survivors against the
    full-precision column when exactness matters."""
    x = F.col(vec_col)
    mx = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    s = F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(0.0))
    q = F.when(
        mx > 0,
        F.transform(x, lambda v: F.round(v.cast("double") / (mx / F.lit(127.0))).cast("tinyint")),
    ).otherwise(F.transform(x, lambda v: F.lit(0).cast("tinyint")))
    return vectors.withColumn(scale_col, s).withColumn(q_col, q)


def dequantize_embedding(q: Column, scale: Column) -> Column:
    """array<double> back from an int8-quantized vector."""
    return F.transform(q, lambda v: v.cast("double") * scale)


def sparse_cosine_topk(
    postings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    id_col: str = "doc_id",
    term_col: str = "term",
    w_col: str = "tfidf",
    max_df: int | None = None,
    round_digits: int = 9,
) -> DataFrame:
    """(qid, cid, cosine): top-k cosine neighbors over SPARSE vectors
    given as (id, term, weight) postings (e.g. ``textstats.tfidf``
    output) — the inverted-index twin of :func:`cosine_topk` and the
    lexical complement of the dense-embedding ANN family (BM25/tf-idf
    retrieval, near-dup triage on keyword profiles).

    Dot products accumulate ONLY over shared terms via a term-keyed
    equi-join of the query postings against the corpus postings, so the
    work is sum_t df_q(t)·df_c(t) — never |Q|·|C|·d, and documents with
    no term in common are never paired (a cosine-0 candidate is never a
    top-k answer unless fewer than k docs share any term, in which case
    emitting it would be retrieval noise anyway).

    ``queries`` optionally restricts the query side to an id set (one
    ``id_col`` column); default ranks every document against the corpus.
    ``max_df`` drops terms with document frequency above the cap FIRST —
    stop-term pruning, the standard sparse-retrieval move: a term in
    half the corpus contributes ~nothing to ranking but df² join rows
    (the same df-cap discipline as ``dedup.ngram_jaccard_pairs``).  The
    cap is part of the operator's semantics (cosine over the pruned
    vocabulary), deterministic, and reproduced by the declared oracle.

    Zero weights are dropped up front (no effect on dot or norm — but
    tf-idf assigns exactly 0.0 to corpus-universal terms, and carrying
    them would re-create the hot-term fan-out the cap exists to kill).
    All joins are term/id equi-joins; the per-query top-k window
    partitions on qid with candidate counts bounded by the capped
    posting overlap.
    """
    p = postings.select(
        F.col(id_col).alias("cid"),
        F.col(term_col).alias("term"),
        F.col(w_col).cast("double").alias("w"),
    ).filter(F.col("w") != 0)
    if max_df is not None:
        dfc = p.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
        p = p.join(
            dfc.filter(F.col("__df") <= max_df).select("term"), "term", "left_semi"
        )
    # Pin the (filtered, capped) postings to ONE evaluation: norms, the
    # query side, and the dot join all branch from it, and an upstream
    # weighting pipeline (tfidf/bm25 — explode + two aggs) would
    # otherwise be re-planned and re-executed once per branch.
    p = p.localCheckpoint(eager=False)
    norms = p.groupBy("cid").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    q = p.select(F.col("cid").alias("qid"), "term", F.col("w").alias("qw"))
    if queries is not None:
        q = q.join(
            queries.select(F.col(id_col).alias("qid")).distinct(), "qid", "left_semi"
        )
    dots = (
        q.join(p, "term")
        .filter(F.col("qid") != F.col("cid"))
        .groupBy("qid", "cid")
        .agg(F.sum(F.col("qw") * F.col("w")).alias("dot"))
    )
    qn = norms.select(F.col("cid").alias("qid"), F.col("nrm").alias("qnrm"))
    scored = (
        dots.join(qn, "qid")
        .join(norms, "cid")
        .select(
            "qid",
            "cid",
            F.round(F.col("dot") / (F.col("qnrm") * F.col("nrm")), round_digits).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


RRF_K0 = 60


def rrf_fuse(
    rankings: list[DataFrame],
    qid_col: str = "qid",
    cid_col: str = "cid",
    score_col: str = "score",
    k: int | None = None,
    k0: int = RRF_K0,
    digits: int = 7,
) -> DataFrame:
    """(qid, cid, rrf): reciprocal-rank fusion of N per-query rankings —
    the standard way to combine heterogeneous retrievers (sparse BM25 +
    dense ANN, multiple embedding spaces) without score calibration
    (Cormack/Clarke/Buettcher, SIGIR'09): each list contributes
    ``1/(k0 + rank)`` for a candidate, summed across lists, so a
    candidate ranked well ANYWHERE surfaces while absent lists simply
    contribute nothing.

    Ranks are per-(list, qid) ``row_number`` over (score desc, cid asc)
    — the deterministic tiebreak used retrieval-wide here — so fusion is
    reproducible across engines/partitionings.  ``k`` optionally keeps
    the top-k fused candidates per query (same window discipline as
    :func:`sparse_cosine_topk`).

    Scale: per-list windows partition on qid (per-query candidate lists
    are k-bounded by construction upstream), the union is
    candidates-sized, and the fusion is one (qid, cid) hash-agg — no
    joins between rankings, no all-pairs anything.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = []
    for df in rankings:
        w = Window.partitionBy(qid_col).orderBy(
            F.desc(score_col), F.asc(cid_col)
        )
        parts.append(
            df.select(
                F.col(qid_col).alias("qid"),
                F.col(cid_col).alias("cid"),
                (F.lit(1.0) / (F.lit(k0) + F.row_number().over(w))).alias("__c"),
            )
        )
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    fused = allc.groupBy("qid", "cid").agg(
        F.round(F.sum("__c"), digits).alias("rrf")
    )
    if k is not None:
        w_out = Window.partitionBy("qid").orderBy(F.desc("rrf"), F.asc("cid"))
        fused = (
            fused.withColumn("__rn", F.row_number().over(w_out))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    return fused


def centroid_outliers(
    docs: DataFrame,
    emb: DataFrame,
    group_col: str = "source",
    k: int = 5,
    digits: int = 6,
    broadcast_centroids: bool = True,
) -> DataFrame:
    """Per-group embedding outliers: the ``k`` documents FARTHEST
    (euclidean) from their group's centroid, as ``(group, doc_id,
    dist)`` — the embedding-space screen for mislabeled sources,
    injected spam, and off-topic contamination that the text-side
    quality gates cannot see.

    Plan: docs join embeddings once on the id (pinned so both the
    centroid branch and the distance branch read ONE evaluation of the
    join, not two parquet re-scans), a posexplode to (row, dim) feeding
    a (group, dim)-keyed hash agg for centroids — the explode is
    pipelined CPU, never materialized — then a (group, dim) equi-join
    back and a doc-keyed agg down to one distance per doc.  With
    ``broadcast_centroids`` (default) the n_groups x dims centroid
    relation is broadcast — right when groups are sources/domains-sized;
    set it False in the millions-of-groups regime and let AQE pick (the
    tfidf df-side discipline, operators/textstats.py).  Top-k per group
    orders on the ROUNDED distance with a doc_id tiebreak, so the
    selected set is deterministic under float-sum drift; the window's
    skew ceiling is the largest group (sources here — for a dominant-
    group corpus compose with the salted cap machinery instead,
    operators/sampling.py cap_per_group)."""
    j = (
        docs.select("doc_id", group_col)
        .join(emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id")
        .localCheckpoint(eager=False)
    )
    el = j.select(
        "doc_id", group_col, F.posexplode("embedding").alias("i", "__xf")
    ).select("doc_id", group_col, "i", F.col("__xf").cast("double").alias("__x"))
    cent = el.groupBy(group_col, "i").agg(F.avg("__x").alias("__c"))
    if broadcast_centroids:
        cent = F.broadcast(cent)
    dist = (
        el.join(cent, [group_col, "i"])
        .groupBy("doc_id", group_col)
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("__x") - F.col("__c")) ** 2)), digits
            ).alias("dist")
        )
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("dist"), F.asc("doc_id"))
    return (
        dist.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(F.col(group_col), "doc_id", "dist")
    )


def group_centroid_similarity(
    docs: DataFrame,
    emb: DataFrame,
    group_col: str = "source",
    digits: int = 6,
) -> DataFrame:
    """Pairwise cosine similarity between GROUP centroids: ``(g1, g2,
    cosine)`` for g1 < g2 — the source-affinity matrix a mixture
    designer reads to spot redundant corpora (two crawls of the same
    site) and to pick complementary slices; the k x k summary of an
    any-size corpus.

    Plan: the same pinned doc-embedding join and (group, dim) centroid
    hash agg as :func:`centroid_outliers`; the pairwise step then works
    ONLY on the n_groups x dims centroid relation — a self equi-join on
    the dimension index and a (g1, g2)-keyed agg, so the cross-group
    comparison costs groups^2 x dims regardless of corpus size.
    Cosines round at ``digits``; a zero-norm centroid (all-zero
    vectors) yields NULL, guarded."""
    j = (
        docs.select("doc_id", group_col)
        .join(emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id")
    )
    el = j.select(
        F.col(group_col).alias("g"), F.posexplode("embedding").alias("i", "__xf")
    ).select("g", "i", F.col("__xf").cast("double").alias("__x"))
    cent = (
        el.groupBy("g", "i")
        .agg(F.avg("__x").alias("c"))
        .localCheckpoint(eager=False)
    )
    a = cent.select(F.col("g").alias("g1"), "i", F.col("c").alias("c1"))
    b = cent.select(F.col("g").alias("g2"), "i", F.col("c").alias("c2"))
    pairs = a.join(b, "i").filter(F.col("g1") < F.col("g2"))
    dots = pairs.groupBy("g1", "g2").agg(
        F.sum(F.col("c1") * F.col("c2")).alias("__dot")
    )
    norms = cent.groupBy("g").agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("__n"))
    n1 = norms.select(F.col("g").alias("g1"), F.col("__n").alias("__n1"))
    n2 = norms.select(F.col("g").alias("g2"), F.col("__n").alias("__n2"))
    return (
        dots.join(n1, "g1")
        .join(n2, "g2")
        .select(
            "g1",
            "g2",
            F.round(
                F.when(
                    (F.col("__n1") > 0) & (F.col("__n2") > 0),
                    F.col("__dot") / (F.col("__n1") * F.col("__n2")),
                ),
                digits,
            ).alias("cosine"),
        )
    )


def standardize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """(id, zvec): per-dimension z-score standardization (whitening
    without rotation) of an ``array<float>`` column — the normalization
    step run before distance-based dedup/clustering when dimensions
    carry wildly different scales, and the canonical "fix the encoder's
    variance collapse" transform flagged by the dim-stats profile.

    Plan: ONE dims-keyed hash aggregate computes per-dimension
    (mean, stddev) — partial aggregation collapses the posexplode
    fan-out to dims-sized partials per task, the same shape as
    profiling.array_dim_stats — and the dims-sized result (bounded by
    the embedding width, never the corpus) is collected and inlined as
    LITERAL arrays into a single ``transform`` projection: the
    standardization itself is shuffle-free whole-stage codegen over the
    scan, exactly like the k-means literal-centroid assignment.
    Zero-variance dimensions standardize to 0.0 (the drop-a-dead-dim
    convention) instead of dividing by zero; values round to ``digits``
    so the output is engine-portable.

    The collected mu/sd are rounded to 12 digits BEFORE inlining (and
    the oracle mirrors ROUND(mu, 12)/ROUND(sd, 12)): Spark's
    partition-order-dependent AVG/STDDEV sums differ from an oracle's
    independently computed stats by ~1e-15, and standardizing with
    unrounded scalars would let that drift reach every z cell — the
    round-every-cross-boundary-scalar discipline (kmeans phi, PCA
    per-step pins).  mu/sd are sums/sqrts of float data, never exact
    decimals, so the half-boundary landmine doesn't apply."""
    stats = (
        emb.select(F.posexplode(vec_col).alias("dim", "__v"))
        .select("dim", F.col("__v").cast("double").alias("__v"))
        .groupBy("dim")
        .agg(F.avg("__v").alias("mu"), F.stddev_samp("__v").alias("sd"))
        .collect()
    )
    by_dim = {r["dim"]: (r["mu"], r["sd"]) for r in stats}
    dims = sorted(by_dim)
    mu_lit = F.array(*[F.lit(round(float(by_dim[d][0]), 12)) for d in dims])
    sd_lit = F.array(*[F.lit(round(float(by_dim[d][1] or 0.0), 12)) for d in dims])

    def z(x, i):
        sd = F.element_at(sd_lit, i + 1)
        mu = F.element_at(mu_lit, i + 1)
        return F.round(
            F.when(sd > 0, (x.cast("double") - mu) / sd).otherwise(F.lit(0.0)),
            digits,
        )

    return emb.select(
        F.col(id_col).alias("id"), F.transform(F.col(vec_col), z).alias("zvec")
    )


def _mmr_greedy(pool_rows: list, k: int, lam: float, digits: int) -> list:
    """The greedy MMR pick sequence for ONE query — shared verbatim by
    the driver and the distributed arms of ``mmr_topk`` so "same
    rounding, same tiebreaks, identical picks" is true by construction
    (equality-tested in tests/test_similarity.py).  ``pool_rows`` is a
    list of (cid, cosine, cvec, cnrm) tuples of plain Python floats;
    returns (cid, rank, mmr) picks in selection order."""

    def cos(a, b):
        num = sum(x * y for x, y in zip(a[2], b[2]))
        den = a[3] * b[3]
        return num / den if den else 0.0

    pool_rows = sorted(pool_rows, key=lambda r: (-r[1], r[0]))
    chosen: list = []
    out = []
    while pool_rows and len(chosen) < k:
        best = None
        for r in pool_rows:
            red = max((cos(r, c) for c in chosen), default=0.0)
            score = round(lam * r[1] - (1.0 - lam) * red, digits)
            # ties toward the smaller cid: compare (-score, cid)
            if best is None or (-score, r[0]) < best[0]:
                best = ((-score, r[0]), r, score)
        chosen.append(best[1])
        out.append((best[1][0], len(chosen), best[2]))
        pool_rows = [r for r in pool_rows if r[0] != best[1][0]]
    return out


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
    distributed: bool = True,
) -> DataFrame:
    """(qid, cid, rank, mmr): Maximal Marginal Relevance diversified
    top-k — the retrieval reranker that trades raw cosine relevance
    against redundancy (``lam`` = 1 is plain top-k; lower ``lam``
    spreads the picks across the embedding space).  The standard
    "don't return ten near-duplicates" step between ANN candidate
    generation and whatever consumes the hits.

    Scale shape: the CLUSTER does the heavy part — an exact (or, at
    real scale, LSH/IVF) top-``pool`` candidate pass per query.  The
    greedy selection is sequential PER QUERY (each pick changes the
    next margin) but queries are independent, so the DEFAULT
    (``distributed=True``) runs the identical greedy per query via
    ``groupBy(qid).applyInPandas`` — zero driver state, safe for a
    real query load.  ``distributed=False`` is the opt-in driver path
    (collects the pool x n_queries candidate rows and loops — only for
    reranker-sized fixtures/debugging); both arms call the same
    ``_mmr_greedy`` kernel so the pick sequences are identical by
    construction.
    Deterministic: scores round to ``digits`` before comparison and
    ties break toward the smaller candidate id, making the pick
    sequence a pure function of the data; declared rows-only (the
    sequential argmax chain has no tractable SQL twin — the kmeans||
    precedent)."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    cand = cosine_topk(corpus, queries, k=pool, id_col=id_col, vec_col=vec_col)
    # cnrm from the SAME array<double> cast the dot products consume, so
    # numerator and denominator share precision end to end (the cast is
    # value-preserving float32->float64, so this is a consistency pin,
    # not a value change).
    cvec = F.col(vec_col).cast("array<double>")
    vecs = corpus.select(
        F.col(id_col).alias("cid"),
        cvec.alias("cvec"),
        l2_norm(cvec).alias("cnrm"),
    )
    joined = cand.join(vecs, "cid").select("qid", "cid", "cosine", "cvec", "cnrm")
    qt = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"qid {qt}, cid {qt}, rank int, mmr double"

    if distributed:
        import pandas as pd

        def _per_query(pdf: "pd.DataFrame") -> "pd.DataFrame":
            qid = pdf["qid"].iloc[0]
            pool_rows = [
                (cid, float(cosv), [float(x) for x in vec], float(nrm))
                for cid, cosv, vec, nrm in zip(
                    pdf["cid"], pdf["cosine"], pdf["cvec"], pdf["cnrm"]
                )
            ]
            picks = _mmr_greedy(pool_rows, k, lam, digits)
            return pd.DataFrame(
                [(qid, cid, rank, score) for cid, rank, score in picks],
                columns=["qid", "cid", "rank", "mmr"],
            )

        return joined.groupBy("qid").applyInPandas(_per_query, out_schema)

    rows = joined.collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(
            (r["cid"], r["cosine"], list(r["cvec"]), r["cnrm"])
        )
    out = []
    for qid in sorted(by_q):
        for cid, rank, score in _mmr_greedy(by_q[qid], k, lam, digits):
            out.append((qid, cid, rank, score))
    return corpus.sparkSession.createDataFrame(out, out_schema)


def truncate_renormalize(
    emb: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """(id, tvec): Matryoshka-style dimensionality reduction — keep the
    FIRST ``dims`` coordinates and L2-renormalize, the cheap-serving
    transform for embeddings trained with matryoshka representation
    learning (and the honest baseline for any "can we store fewer
    dims" question: compare its retrieval quality against PCA's).

    Pure shuffle-free projection over the scan: one slice, one
    sequential-fold norm, one transform — whole row-local, survives any
    scale by construction.  All-zero truncations renormalize to zeros
    (the standardize convention); values round to ``digits`` after the
    divide-by-irrational-norm, so cells are engine-generic."""
    if dims < 1:
        raise ValueError(f"dims must be >= 1, got {dims}")
    t = F.slice(F.col(vec_col).cast("array<double>"), 1, dims)
    nrm = F.sqrt(
        F.aggregate(
            F.transform(t, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return emb.select(
        F.col(id_col).alias("id"),
        F.transform(
            t,
            lambda x: F.round(
                F.when(nrm > 0, x / nrm).otherwise(F.lit(0.0)), digits
            ),
        ).alias("tvec"),
    )


def ann_recall_report(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    method: str = "lsh",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
    **method_kwargs,
) -> DataFrame:
    """(qid, n_true, n_hit, recall): per-query recall@k of an
    approximate ANN path against the exact cosine top-k — the
    measure-don't-guess readout run before trusting an index
    configuration at scale (recall floors belong in CI; THIS is the
    dial you turn bands/probes against).

    ``method``: "lsh" (:func:`lsh_bucket_topk`, kwargs like
    ``multiprobe=True`` pass through), "ivf" (:func:`ivf_topk`,
    kwargs like ``n_probe=``), or "ivfq" (:func:`ivf_quantized_topk`,
    kwargs like ``rerank=True`` — the int8 serving path's measured
    recall, so "how much does quantization cost at this probe/rerank
    setting" is a number, not a floor).  Both the truth and the
    candidate sets are k-bounded per query, so the compare is a
    (qid, cid)-keyed semi-join over k x |Q| rows — nothing corpus-sized
    moves beyond what the two top-k passes already move."""
    if method == "lsh":
        approx = lsh_bucket_topk(
            corpus, queries, k=k, id_col=id_col, vec_col=vec_col, **method_kwargs
        )
    elif method == "ivf":
        approx = ivf_topk(
            corpus, queries, k=k, id_col=id_col, vec_col=vec_col, **method_kwargs
        )
    elif method == "ivfq":
        approx = ivf_quantized_topk(
            corpus, queries, k=k, id_col=id_col, vec_col=vec_col, **method_kwargs
        )
    else:
        raise ValueError(f"method must be 'lsh', 'ivf', or 'ivfq', got {method!r}")
    exact = cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    hits = exact.join(approx.select("qid", "cid"), ["qid", "cid"], "left_semi")
    truth_counts = exact.groupBy("qid").agg(F.count(F.lit(1)).alias("n_true"))
    hit_counts = hits.groupBy("qid").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        truth_counts.join(hit_counts, "qid", "left")
        .select(
            "qid",
            "n_true",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_true"), digits
            ).alias("recall"),
        )
    )


#: Session-lifetime cache of PERSISTED int8 IVF indexes, keyed like
#: `_IVF_CACHE` on (applicationId, corpus plan semantic hash, quantizer
#: params).  The index build (quantize + centroid-assign UDF + norms) is
#: the dominant per-call cost of the quantized serving path; a production
#: corpus builds the index ONCE and serves many query batches from it, so
#: every `ivf_quantized_topk` / recall-report call re-deriving it was a
#: bench artifact.  The persisted state is the int8 arrays + one scale per
#: row — the 4-8x-smaller representation is exactly what you'd pin in
#: memory/disk at 100 TB.
_IVFQ_INDEX_CACHE: dict[tuple, DataFrame] = {}


def ivfq_index_cached(
    corpus: DataFrame,
    centroids,
    n_centroids: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Memoized, PERSISTED quantized inverted file: (cid, __cq int8
    vector, __cs scale, cnrm, cluster) for ``corpus``, built once per
    (session, corpus plan, params) and `persist`-ed MEMORY_AND_DISK so
    repeated top-k / recall calls against the same corpus serve from the
    cached int8 index instead of re-running quantize + assign."""
    from pyspark.storagelevel import StorageLevel

    spark = corpus.sparkSession
    key = (
        spark.sparkContext.applicationId,
        corpus.semanticHash(),
        n_centroids,
        id_col,
        vec_col,
    )
    if key not in _IVFQ_INDEX_CACHE:
        live = spark.sparkContext.applicationId
        for stale in [k for k in _IVFQ_INDEX_CACHE if k[0] != live]:
            dropped = _IVFQ_INDEX_CACHE.pop(stale)
            try:  # release cached storage, not just the Python handle
                dropped.unpersist()
            except Exception:
                pass  # owning session already gone
        assign = _assign_udf(centroids)
        quant = quantize_embeddings(corpus, vec_col=vec_col)
        indexed = (
            quant.select(
                F.col(id_col).alias("cid"),
                F.col("q_embedding").alias("__cq"),
                F.col("q_scale").alias("__cs"),
                l2_norm(
                    dequantize_embedding(F.col("q_embedding"), F.col("q_scale"))
                ).alias("cnrm"),
                assign(F.col(vec_col)).alias("cluster"),
            )
            .filter(F.col("cnrm") > 0)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        _IVFQ_INDEX_CACHE[key] = indexed
    return _IVFQ_INDEX_CACHE[key]


def ivf_quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: bool = False,
    rerank_pool: int | None = None,
) -> DataFrame:
    """IVF top-k over an int8-QUANTIZED corpus — the memory-efficient
    serving shape: the inverted file prunes candidates exactly like
    :func:`ivf_topk`, but the corpus side of the candidate join carries
    ``array<tinyint>`` + one scale instead of float vectors, 4-8x less
    index state at rest and 4-8x less data through the probe shuffle
    (at 100 TB the vector bytes ARE the join cost).  Queries stay
    full-precision (standard asymmetric quantized search); scores are
    cosines against the dequantized corpus vector, within O(1/127) of
    exact.

    ``rerank=True`` adds the exactness arm: the top ``rerank_pool``
    (default 4k) QUANTIZED survivors per query are re-scored against
    the full-precision vectors and the final top-k is taken from the
    exact scores — the standard two-stage quantized-retrieval shape
    (coarse int8 scan, fine float re-rank).  The re-rank joins are
    k-bounded on the survivor side (|Q| x pool rows against the corpus
    by id — broadcastable survivors at any corpus scale), so the float
    vectors are touched only for pool candidates per query, never for
    the probe shuffle.

    Same plan as ivf_topk: bucket equi-join, no index structure to
    ship; the dequantize is a per-candidate transform inside the
    scoring projection."""
    from pyspark.sql.functions import pandas_udf

    centroids = ivf_centroids_cached(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    c_unit = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(mat @ c_unit.T), axis=1)[:, :n_probe].astype("int32")
        return pd.Series(list(order))

    indexed = ivfq_index_cached(corpus, centroids, n_centroids, id_col, vec_col)
    probed = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qnrm"),
        F.explode(probes(F.col(vec_col))).alias("cluster"),
    )
    cvec = dequantize_embedding(F.col("__cq"), F.col("__cs"))
    scored = (
        probed.join(indexed, "cluster")
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.round(
                dot(F.col("qvec"), cvec) / (F.col("qnrm") * F.col("cnrm")), 9
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    if not rerank:
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )
    pool = rerank_pool if rerank_pool is not None else 4 * k
    survivors = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= pool)
        .select("qid", "cid")
    )
    fullc = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("__fcvec"),
        l2_norm(F.col(vec_col)).alias("__fcnrm"),
    )
    fullq = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("__fqvec"),
        l2_norm(F.col(vec_col)).alias("__fqnrm"),
    )
    rescored = (
        survivors.join(fullc, "cid")
        .join(fullq, "qid")
        .select(
            "qid",
            "cid",
            F.round(
                dot(F.col("__fqvec"), F.col("__fcvec"))
                / (F.col("__fqnrm") * F.col("__fcnrm")),
                9,
            ).alias("cosine"),
        )
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


PQ_SUBSPACES = 8
PQ_CODES = 16
PQ_TRAIN_FRACTION = 0.2
PQ_TRAIN_SAMPLE = 2048
PQ_LLOYD_ITERS = 4

#: Session cache of trained PQ codebooks, (appId, corpus hash, params).
_PQ_BOOKS_CACHE: dict[tuple, "np.ndarray"] = {}
#: Session cache of the persisted PQ-coded inverted file.
_PQ_INDEX_CACHE: dict[tuple, DataFrame] = {}


def pq_codebooks(
    corpus: DataFrame,
    m: int = PQ_SUBSPACES,
    ksub: int = PQ_CODES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = PQ_TRAIN_SAMPLE,
    fraction: float = PQ_TRAIN_FRACTION,
    seed: int = IVF_SEED,
    iters: int = PQ_LLOYD_ITERS,
):
    """Train product-quantization codebooks: split the d-dim space into
    ``m`` subspaces and k-means each to ``ksub`` centroids (Jégou et
    al. 2011).  Returns a (m, ksub, d/m) numpy array.

    Training runs DRIVER-SIDE on a seeded bounded sample — the codebook
    is m*ksub*(d/m) = d*ksub floats (KBs) and PQ training is famously
    sample-efficient, so shipping a few thousand vectors to the driver
    is the right scale trade (the ivf_centroids seeding precedent);
    the CORPUS-sized work (encoding, scoring) stays distributed.
    Deterministic: seeded sample, first-ksub init, fixed Lloyd rounds;
    empty clusters keep their previous centroid."""
    rows = (
        corpus.select(vec_col).sample(fraction=fraction, seed=seed).limit(sample_n).collect()
    )
    if len(rows) < ksub:
        rows = corpus.select(vec_col).limit(max(sample_n, ksub)).collect()
    x = np.array([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    d = x.shape[1]
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by {m} subspaces")
    dsub = d // m
    books = np.zeros((m, ksub, dsub))
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        c = xs[: min(ksub, len(xs))].copy()
        if len(c) < ksub:  # degenerate tiny corpus: pad by repetition
            c = np.vstack([c] * (ksub // len(c) + 1))[:ksub]
        for _ in range(iters):
            d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            for j in range(ksub):
                if (a == j).any():
                    c[j] = xs[a == j].mean(0)
        books[s] = c
    return books


def pq_codebooks_cached(corpus: DataFrame, **kw):
    """Memoized :func:`pq_codebooks` (the ivf_centroids_cached pattern).
    The key covers EVERY kwarg that affects training — including
    sample_n/fraction/seed/iters — so two calls with different training
    params never silently share a codebook."""
    spark = corpus.sparkSession
    key = (
        spark.sparkContext.applicationId,
        corpus.semanticHash(),
        kw.get("m", PQ_SUBSPACES),
        kw.get("ksub", PQ_CODES),
        kw.get("id_col", "vec_id"),
        kw.get("vec_col", "embedding"),
        kw.get("sample_n", PQ_TRAIN_SAMPLE),
        kw.get("fraction", PQ_TRAIN_FRACTION),
        kw.get("seed", IVF_SEED),
        kw.get("iters", PQ_LLOYD_ITERS),
    )
    if key not in _PQ_BOOKS_CACHE:
        live = spark.sparkContext.applicationId
        for stale in [k for k in _PQ_BOOKS_CACHE if k[0] != live]:
            _PQ_BOOKS_CACHE.pop(stale)
        _PQ_BOOKS_CACHE[key] = pq_codebooks(corpus, **kw)
    return _PQ_BOOKS_CACHE[key]


def _pq_encode_udf(books):
    """Arrow-batched encoder: per subspace, the argmin-distance codebook
    entry.  Python touches each corpus vector ONCE, at index build —
    the serving path stays JVM-side."""
    from pyspark.sql.functions import pandas_udf

    m, ksub, dsub = books.shape

    @pandas_udf("array<tinyint>")
    def enc(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.empty((len(mat), m), dtype=np.int8)
        for s in range(m):
            xs = mat[:, s * dsub : (s + 1) * dsub]
            d2 = ((xs[:, None, :] - books[s][None, :, :]) ** 2).sum(-1)
            codes[:, s] = d2.argmin(1).astype(np.int8)
        return pd.Series(list(codes))

    return enc


def _books_literal(books) -> Column:
    """The codebook tensor as a nested array literal — d*ksub doubles
    embedded in the plan so ADC reconstruction runs in whole-stage
    codegen, no Python in the scoring path."""
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(float(v)) for v in cent]) for cent in book])
            for book in books
        ]
    )


def pq_reconstruct(code: Column, books) -> Column:
    """array<double> reconstruction of a PQ code: concat of the coded
    centroid per subspace (the ADC scoring proxy)."""
    lit = _books_literal(books)
    return F.flatten(
        F.zip_with(
            code,
            F.sequence(F.lit(1), F.lit(int(books.shape[0]))),
            lambda c, s: F.element_at(F.element_at(lit, s), c.cast("int") + F.lit(1)),
        )
    )


def pq_index_cached(
    corpus: DataFrame,
    books,
    centroids,
    n_centroids: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Memoized, persisted IVF-PQ inverted file: (cluster, cid, code
    array<tinyint> of m bytes, rnrm) — the FAISS-IVFPQ shape.  At rest
    and through the probe shuffle each corpus vector is m CODE BYTES
    (8 here) instead of d floats (256 bytes) or d int8s (64): the index
    state that has to move at 100 TB shrinks ~32x vs float.  The
    reconstruction norm is precomputed once so serving never rebuilds
    it."""
    from pyspark.storagelevel import StorageLevel

    spark = corpus.sparkSession
    key = (
        spark.sparkContext.applicationId,
        corpus.semanticHash(),
        n_centroids,
        int(books.shape[0]),
        int(books.shape[1]),
        id_col,
        vec_col,
    )
    if key not in _PQ_INDEX_CACHE:
        live = spark.sparkContext.applicationId
        for stale in [k for k in _PQ_INDEX_CACHE if k[0] != live]:
            dropped = _PQ_INDEX_CACHE.pop(stale)
            try:  # release cached storage, not just the Python handle
                dropped.unpersist()
            except Exception:
                pass  # owning session already gone
        enc = _pq_encode_udf(books)
        assign = _assign_udf(centroids)
        coded = corpus.select(
            F.col(id_col).alias("cid"),
            enc(F.col(vec_col)).alias("__code"),
            assign(F.col(vec_col)).alias("cluster"),
        )
        # Zero-reconstruction-norm rows are KEPT (the ADC score guards
        # the division and gives them cosine 0) — filtering them would
        # make those ids unretrievable even through the full-precision
        # rerank arm, silently.
        indexed = coded.withColumn(
            "rnrm", l2_norm(pq_reconstruct(F.col("__code"), books))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _PQ_INDEX_CACHE[key] = indexed
    return _PQ_INDEX_CACHE[key]


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = IVF_CENTROIDS,
    n_probe: int = IVF_PROBE,
    m: int = PQ_SUBSPACES,
    ksub: int = PQ_CODES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: bool = False,
    rerank_pool: int | None = None,
) -> DataFrame:
    """IVF-PQ top-k (Jégou et al. 2011; the FAISS IVFPQ serving shape):
    coarse IVF probe prunes to n_probe clusters, then candidates score
    by asymmetric distance — full-precision query against the PQ
    reconstruction — entirely in JVM array expressions.  Approximate by
    construction (rows-only contract; recall floors pinned in pytest,
    the ann_lsh/ivf discipline).

    ``rerank=True`` re-scores the top pool of PQ survivors against the
    full-precision vectors (two-stage retrieval: 8-byte coarse scan,
    float fine rank) — survivors are k-bounded per query, so the float
    vectors never ride the probe shuffle."""
    centroids = ivf_centroids_cached(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    books = pq_codebooks_cached(corpus, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col)
    c_unit = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(mat @ c_unit.T), axis=1)[:, :n_probe].astype("int32")
        return pd.Series(list(order))

    indexed = pq_index_cached(corpus, books, centroids, n_centroids, id_col, vec_col)
    probed = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qnrm"),
        F.explode(probes(F.col(vec_col))).alias("cluster"),
    )
    rec = pq_reconstruct(F.col("__code"), books)
    scored = (
        probed.join(indexed, "cluster")
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.when(
                F.col("qnrm") * F.col("rnrm") > 0,
                F.round(dot(F.col("qvec"), rec) / (F.col("qnrm") * F.col("rnrm")), 9),
            )
            .otherwise(F.lit(0.0))
            .alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    if not rerank:
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )
    pool = rerank_pool if rerank_pool is not None else 4 * k
    survivors = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= pool)
        .select("qid", "cid")
    )
    fullc = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("__fcvec"),
        l2_norm(F.col(vec_col)).alias("__fcnrm"),
    )
    fullq = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("__fqvec"),
        l2_norm(F.col(vec_col)).alias("__fqnrm"),
    )
    rescored = (
        survivors.join(fullc, "cid")
        .join(fullq, "qid")
        .select(
            "qid",
            "cid",
            F.round(
                dot(F.col("__fqvec"), F.col("__fcvec"))
                / (F.col("__fqnrm") * F.col("__fcnrm")),
                9,
            ).alias("cosine"),
        )
    )
    return (
        rescored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
