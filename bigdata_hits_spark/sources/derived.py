"""Derived graphs over the driver testdata (FIXTURES.md §B).

The driver's correctness gate runs each Spark query and a DuckDB oracle on
the same parquet tables, so graph-shaped queries need nodes/edges tables
that BOTH engines derive identically.  Each builder here has a Spark form
and a SQL form kept adjacent; tests assert they agree row-for-row.

Two shapes:

- ``g_ps`` — bipartite part->supplier graph straight from lineitem
  (natural key skew, weights = quantities).  Node ids are prefixed
  ('P...', 'S...') because part and supplier keys share the same integer
  range and would otherwise collide.
- ``g_pp`` — part->part graph with a deterministic pseudo-random dst
  (hash-ish affine map of the lineitem row onto the 0-based, contiguous
  partkey range), labels = p_brand.  Non-bipartite, 20+ labels, so the
  topic variants (specific/exclusive/dependent) are meaningful.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from bigdata_hits_spark.operators.graph import Graph
from bigdata_hits_spark.sources.readers import load_table

G_PS_EDGES_SQL = (
    "SELECT 'P' || l_partkey AS src, 'S' || l_suppkey AS dst, "
    "l_quantity AS weight FROM lineitem"
)
G_PS_NODES_SQL = (
    "SELECT 'P' || p_partkey AS id, 'part' AS labels FROM part "
    "UNION ALL SELECT 'S' || s_suppkey AS id, 'supp' AS labels FROM supplier"
)

G_PP_EDGES_SQL = (
    "SELECT 'P' || l_partkey AS src, "
    "'P' || ((l_partkey * 31 + l_linenumber * 7 + l_suppkey) % (SELECT COUNT(*) FROM part)) AS dst, "
    "l_quantity AS weight FROM lineitem"
)
G_PP_NODES_SQL = "SELECT 'P' || p_partkey AS id, p_brand AS labels FROM part"

#: Topic label used by the topic-parameterized declared queries on g_pp.
G_PP_TOPIC = "Brand#4"
#: Topic label for g_ps (bipartite: 'part' side).
G_PS_TOPIC = "part"


#: Session-lifetime cache of derived graphs.  The workload pattern (like
#: the reference's: many ranking jobs over one graph) re-derives the same
#: graph per query; memoizing here lets Graph-level prepared state
#: (partitioned edge relations, counts — graph.py) amortize across the
#: whole session.  Keyed on the SparkContext applicationId — a stable,
#: never-reused identifier (unlike ``id(spark)``, which CPython can reuse
#: after GC and which would pin dead sessions' persisted frames forever).
_GRAPH_CACHE: dict[tuple[str, str, str], Graph] = {}


def _cached(spark: SparkSession, sf_dir: str, shape: str, build) -> Graph:
    key = (spark.sparkContext.applicationId, sf_dir, shape)
    if key not in _GRAPH_CACHE:
        # Entries from stopped applications can never be reused (appIds are
        # unique per context); drop them so their Graph memos are released.
        live = spark.sparkContext.applicationId
        for stale in [k for k in _GRAPH_CACHE if k[0] != live]:
            _GRAPH_CACHE.pop(stale)
        _GRAPH_CACHE[key] = build()
    return _GRAPH_CACHE[key]


def clear_graph_cache() -> None:
    """Release every cached graph's persisted state and empty the cache."""
    for g in _GRAPH_CACHE.values():
        try:
            g.release()
        except Exception:
            pass
    _GRAPH_CACHE.clear()


def g_ps(spark: SparkSession, sf_dir: str) -> Graph:
    """Bipartite part->supplier graph from lineitem (memoized per
    session)."""
    return _cached(spark, sf_dir, "ps", lambda: _g_ps(spark, sf_dir))


def _g_ps(spark: SparkSession, sf_dir: str) -> Graph:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    edges = li.select(
        F.concat(F.lit("P"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
        F.col("l_quantity").alias("weight"),
    )
    nodes = part.select(
        F.concat(F.lit("P"), F.col("p_partkey")).alias("id"), F.lit("part").alias("labels")
    ).unionByName(
        supp.select(
            F.concat(F.lit("S"), F.col("s_suppkey")).alias("id"), F.lit("supp").alias("labels")
        )
    )
    return Graph(nodes=nodes, edges=edges)


def g_pp(spark: SparkSession, sf_dir: str) -> Graph:
    """Part->part graph with deterministic synthetic dst and brand labels
    (memoized per session).

    partkeys are 0..N-1 contiguous in the driver testdata, so the modulo
    always lands on a real part (asserted in tests).
    """
    return _cached(spark, sf_dir, "pp", lambda: _g_pp(spark, sf_dir))


def _g_pp(spark: SparkSession, sf_dir: str) -> Graph:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    n_parts = part.count()
    edges = li.select(
        F.concat(F.lit("P"), F.col("l_partkey")).alias("src"),
        F.concat(
            F.lit("P"),
            (F.col("l_partkey") * 31 + F.col("l_linenumber") * 7 + F.col("l_suppkey"))
            % F.lit(n_parts),
        ).alias("dst"),
        F.col("l_quantity").alias("weight"),
    )
    nodes = part.select(
        F.concat(F.lit("P"), F.col("p_partkey")).alias("id"), F.col("p_brand").alias("labels")
    )
    return Graph(nodes=nodes, edges=edges)
