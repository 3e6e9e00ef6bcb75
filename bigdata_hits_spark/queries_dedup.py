"""Declared queries + DuckDB oracles for the dedup operators.

The SQL mirrors operators/dedup.py structurally: identical shingling,
identical md5-derived hashes, identical integer arithmetic.  Jaccard /
counts are exact integers, so the only float op (the final division) is
bit-identical across engines.
"""

from __future__ import annotations

from bigdata_hits_spark.operators import dedup as DD
from bigdata_hits_spark.oracles import duck_hex_to_long
from bigdata_hits_spark.queries import register
from bigdata_hits_spark.sources.readers import load_table

MINHASH_THRESHOLD = 0.2
NGRAM_THRESHOLD = 0.2
#: Declared-query band-bucket cap, deliberately BELOW the sf0.01 max
#: bucket size (3) so the hot-bucket exclusion is exercised — BINDING —
#: under the oracle comparison, not dead code (the
#: events_cooccurrence_hourly cap precedent).  The operator default
#: (dedup.MINHASH_MAX_BUCKET) is the production value.
MINHASH_MAX_BUCKET_DECLARED = 2

_SHINGLE_CTES = (
    "t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
    "shl AS (SELECT doc_id, list_distinct(list_transform("
    "range(CASE WHEN len(w) >= 3 THEN len(w) - 2 ELSE 0 END), "
    "i -> w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3])) AS shs FROM t), "
    "sh AS (SELECT doc_id AS id, unnest(shs) AS shingle FROM shl)"
)

_VERIFY_CTES = (
    "inter AS (SELECT c.id1, c.id2, COUNT(*) AS n_inter FROM cand c "
    "JOIN sh s1 ON s1.id = c.id1 "
    "JOIN sh s2 ON s2.id = c.id2 AND s2.shingle = s1.shingle "
    "GROUP BY c.id1, c.id2), "
    "sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id), "
    "jac AS (SELECT i.id1, i.id2, "
    "ROUND(CAST(i.n_inter / (z1.n + z2.n - i.n_inter) AS DOUBLE), 7) AS jaccard "
    "FROM inter i JOIN sizes z1 ON z1.id = i.id1 JOIN sizes z2 ON z2.id = i.id2)"
)


@register(
    "dedup_exact",
    "SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups "
    "FROM documents GROUP BY md5(text)",
)
def q_dedup_exact(spark, sf_dir):
    return DD.exact_duplicates(load_table(spark, sf_dir, "documents"))


def _minhash_sql() -> str:
    values = ", ".join(f"({j}, {a}, {b})" for j, a, b in DD.MINHASH_PARAMS)
    x = duck_hex_to_long("md5(shingle)", 8)
    return (
        f"WITH {_SHINGLE_CTES}, "
        f"tok AS (SELECT id, {x} % {DD.MINHASH_P} AS x FROM sh), "
        f"params(j, a, b) AS (VALUES {values}), "
        f"mh AS (SELECT id, j, MIN((a * x + b) % {DD.MINHASH_P}) AS v "
        "FROM tok CROSS JOIN params GROUP BY id, j), "
        f"bands AS MATERIALIZED (SELECT id, j // {DD.ROWS_PER_BAND} AS band_id, "
        "string_agg(CAST(v AS VARCHAR), ',' ORDER BY j) AS sig "
        f"FROM mh GROUP BY id, j // {DD.ROWS_PER_BAND}), "
        "bsz AS (SELECT band_id, sig FROM bands GROUP BY band_id, sig "
        f"HAVING COUNT(*) <= {MINHASH_MAX_BUCKET_DECLARED}), "
        "bk AS (SELECT b.id, b.band_id, b.sig FROM bands b "
        "JOIN bsz ON b.band_id = bsz.band_id AND b.sig = bsz.sig), "
        "cand AS (SELECT DISTINCT b1.id AS id1, b2.id AS id2 FROM bk b1 "
        "JOIN bk b2 ON b1.band_id = b2.band_id AND b1.sig = b2.sig AND b1.id < b2.id), "
        f"{_VERIFY_CTES} "
        f"SELECT id1, id2, jaccard FROM jac WHERE jaccard >= {MINHASH_THRESHOLD}"
    )


@register("dedup_minhash_lsh", _minhash_sql())
def q_dedup_minhash(spark, sf_dir):
    """MinHash-LSH near-dup pairs with the hot-bucket cap BINDING: at
    sf0.01 three band buckets have 3 members (> cap 2) and are excluded
    from candidate generation in BOTH engines (25 -> 23 pairs), proving
    the quadratic-bucket guard is live, not dead code."""
    return DD.minhash_near_duplicates(
        load_table(spark, sf_dir, "documents"),
        threshold=MINHASH_THRESHOLD,
        max_bucket=MINHASH_MAX_BUCKET_DECLARED,
    )


def _simhash_sql() -> str:
    h = duck_hex_to_long("md5(word)", 15)
    cb = DD.SIMHASH_BITS // DD.SIMHASH_CHUNKS
    mask = (1 << cb) - 1
    return (
        "WITH words AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS word FROM documents), "
        "wc AS (SELECT id, word, COUNT(*) AS w FROM words GROUP BY id, word), "
        f"wh AS (SELECT id, w, {h} AS h FROM wc), "
        f"bits AS (SELECT id, w, h, unnest(range({DD.SIMHASH_BITS})) AS bit FROM wh), "
        "contribs AS (SELECT id, bit, "
        "SUM(CASE WHEN (h >> CAST(bit AS INTEGER)) & 1 = 1 THEN w ELSE -w END) AS s "
        "FROM bits GROUP BY id, bit), "
        "sig AS (SELECT id, CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(bit AS INTEGER)) "
        "ELSE 0 END) AS BIGINT) AS simhash FROM contribs GROUP BY id), "
        f"chunks AS (SELECT id, simhash, unnest(range({DD.SIMHASH_CHUNKS})) AS chunk_id FROM sig), "
        f"chunk2 AS (SELECT id, simhash, chunk_id, "
        f"(simhash >> CAST(chunk_id * {cb} AS INTEGER)) & {mask} AS chunk FROM chunks), "
        "pairs AS (SELECT DISTINCT c1.id AS id1, c2.id AS id2, "
        "CAST(bit_count(xor(c1.simhash, c2.simhash)) AS INTEGER) AS hamming "
        "FROM chunk2 c1 JOIN chunk2 c2 "
        "ON c1.chunk_id = c2.chunk_id AND c1.chunk = c2.chunk AND c1.id < c2.id) "
        f"SELECT id1, id2, hamming FROM pairs WHERE hamming <= {DD.SIMHASH_HAMMING_T}"
    )


@register("dedup_simhash", _simhash_sql())
def q_dedup_simhash(spark, sf_dir):
    from pyspark.sql import functions as F

    pairs = DD.simhash_near_duplicates(load_table(spark, sf_dir, "documents"))
    return pairs.select("id1", "id2", F.col("hamming").cast("int").alias("hamming"))


def _ngram_sql() -> str:
    return (
        f"WITH {_SHINGLE_CTES}, "
        "dfc AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle), "
        f"rare AS (SELECT s.id, s.shingle FROM sh s JOIN dfc "
        f"ON dfc.shingle = s.shingle AND dfc.df <= {DD.NGRAM_MAX_DF}), "
        "cand AS (SELECT r1.id AS id1, r2.id AS id2 FROM rare r1 "
        "JOIN rare r2 ON r1.shingle = r2.shingle AND r1.id < r2.id "
        f"GROUP BY r1.id, r2.id HAVING COUNT(*) >= {DD.NGRAM_MIN_SHARED}), "
        f"{_VERIFY_CTES} "
        f"SELECT id1, id2, jaccard FROM jac WHERE jaccard >= {NGRAM_THRESHOLD}"
    )


@register("dedup_ngram_jaccard", _ngram_sql())
def q_dedup_ngram(spark, sf_dir):
    return DD.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=NGRAM_THRESHOLD
    )


def _components_sql() -> str:
    """Connected components of the MinHash near-dup pairs as a recursive
    CTE: symmetrize the pairs, then every node's component is the minimum
    id among all nodes that can reach it (reachability == connectivity on
    the symmetric graph).  UNION dedups, so the recursion reaches the
    fixpoint and terminates."""
    pair_sql = _minhash_sql()
    # Splice the SELECT tail off the pair query; keep its WITH-chain.
    ctes, tail = pair_sql.split(" SELECT id1, id2, jaccard FROM jac WHERE", 1)
    threshold = tail.strip().split(">=")[1].strip()
    return (
        ctes.replace("WITH ", "WITH RECURSIVE ", 1)
        + f", dup AS (SELECT id1, id2 FROM jac WHERE jaccard >= {threshold}), "
        "e AS (SELECT id1 AS src, id2 AS dst FROM dup "
        "UNION SELECT id2, id1 FROM dup), "
        "reach AS (SELECT src AS id, src AS comp FROM e "
        "UNION SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id) "
        "SELECT id, MIN(comp) AS component FROM reach GROUP BY id"
    )


@register("dedup_components", _components_sql())
def q_dedup_components(spark, sf_dir):
    """Near-dup clusters: MinHash pairs grouped transitively by
    connected components (operators/components.py) — the step that turns
    pair detection into removal.  The oracle computes the same clustering
    in DuckDB via a recursive CTE over the identical pair query."""
    from bigdata_hits_spark.operators.components import connected_components

    pairs = DD.minhash_near_duplicates(
        load_table(spark, sf_dir, "documents"),
        threshold=MINHASH_THRESHOLD,
        max_bucket=MINHASH_MAX_BUCKET_DECLARED,
    )
    return connected_components(pairs)
