"""Declared queries + oracles for similarity search on ``embeddings``.

The brute-force paths carry full DuckDB oracles (dot products unrolled via
unnest+range, same double casts).  The LSH path is the approximate scale
variant: registered rows-only, with a recall-vs-brute-force floor asserted
in tests/test_similarity.py instead of an equality oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_hits_spark.operators import similarity as SIM
from bigdata_hits_spark.queries import register
from bigdata_hits_spark.sources.readers import load_table

N_QUERIES = 5
TOP_K = 10
NEARDUP_T = 0.4

_NORMS_CTE = (
    "norms AS (SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm "
    "FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) GROUP BY vec_id)"
)


def _topk_sql() -> str:
    return (
        f"WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}), "
        "pairs AS (SELECT q.vec_id AS qid, e.vec_id AS cid, q.embedding AS qe, e.embedding AS ce "
        "FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.vec_id), "
        "el AS (SELECT qid, cid, qe, ce, unnest(range(len(qe))) AS i FROM pairs), "
        "dots AS (SELECT qid, cid, SUM(CAST(qe[i + 1] AS DOUBLE) * CAST(ce[i + 1] AS DOUBLE)) AS dot "
        "FROM el GROUP BY qid, cid), "
        f"{_NORMS_CTE}, "
        "cos AS (SELECT qid, cid, ROUND(dot / (nq.nrm * nc.nrm), 9) AS cosine FROM dots "
        "JOIN norms nq ON nq.vec_id = qid JOIN norms nc ON nc.vec_id = cid), "
        "ranked AS (SELECT qid, cid, cosine, "
        "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rn FROM cos) "
        f"SELECT qid, cid, CAST(cosine AS DOUBLE) AS cosine FROM ranked WHERE rn <= {TOP_K}"
    )


@register("ann_cosine_topk", _topk_sql())
def q_ann_cosine_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return SIM.cosine_topk(emb, queries, k=TOP_K)


def _neardup_sql() -> str:
    return (
        "WITH pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2, "
        "a.embedding AS v1, b.embedding AS v2 "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id), "
        "el AS (SELECT id1, id2, v1, v2, unnest(range(len(v1))) AS i FROM pairs), "
        "dots AS (SELECT id1, id2, SUM(CAST(v1[i + 1] AS DOUBLE) * CAST(v2[i + 1] AS DOUBLE)) AS dot "
        "FROM el GROUP BY id1, id2), "
        f"{_NORMS_CTE}, "
        "cos AS (SELECT id1, id2, ROUND(dot / (n1.nrm * n2.nrm), 6) AS cosine FROM dots "
        "JOIN norms n1 ON n1.vec_id = id1 JOIN norms n2 ON n2.vec_id = id2) "
        f"SELECT id1, id2, CAST(cosine AS DOUBLE) AS cosine FROM cos WHERE cosine >= {NEARDUP_T}"
    )


@register("embedding_neardup_pairs", _neardup_sql())
def q_embedding_neardup(spark, sf_dir):
    """Similarity-regime pairs (τ=0.4, below LSH_SAFE_THRESHOLD): the
    exact all-pairs baseline is the only correct plan there, so this
    declared query makes the DELIBERATE ``exact=True`` opt-in that
    operators/similarity.py enforces."""
    emb = load_table(spark, sf_dir, "embeddings")
    return SIM.near_duplicate_pairs(emb, NEARDUP_T, exact=True)


@register("ann_lsh_topk", None)  # approximate: recall floor asserted in tests, rows-only here
def q_ann_lsh_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return SIM.lsh_bucket_topk(emb, queries, k=TOP_K)


@register("ann_ivf_topk", None)  # approximate: recall floor asserted in tests, rows-only here
def q_ann_ivf_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return SIM.ivf_topk(emb, queries, k=TOP_K)
