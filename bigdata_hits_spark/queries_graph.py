"""Declared queries + oracles for the graph-analytics operators
(triangle counting, label propagation) on the derived part->part graph.

These register AFTER the 50 gate-prefix entries (module loads last in
queries._load_extensions), so they do not displace any gate slot; the
local harness (scripts/check_oracle.py) still verifies them against
DuckDB with the same row/schema/value discipline, and bench times them.

Oracle formulations are brute-force (three-way join triangles; k-unrolled
mode-with-tiebreak rounds) — the Spark side's degree-ordered orientation
and iterative loop must produce IDENTICAL results, which is exactly the
point of the check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_hits_spark.operators.graphalgs import (
    label_propagation,
    symmetric_edges,
    triangle_counts,
)
from bigdata_hits_spark.oracles import pagerank_oracle
from bigdata_hits_spark.plans.iterate import materialize
from bigdata_hits_spark.queries import register
from bigdata_hits_spark.sources import derived


def _sym(g):
    """Session-memoized, pinned symmetric edge set shared by both graph
    analytics (and across bench passes) — built and shuffled once."""
    return g.memo(
        ("sym_edges",), lambda: materialize(symmetric_edges(g.edges).repartition("b"))
    )


def _tri(g):
    """Session-memoized (id, triangles) relation — the wedge machinery
    is by far the costliest graph dataflow (98.6 s warm at sf1 when the
    coefficient row recomputed it, VERDICT r12 #1), and the triangle
    and clustering-coefficient rows consume the IDENTICAL relation, so
    one session pays for it once.  Nightly-serving sessions skip even
    this via clustering_coefficient_from_layout."""
    return g.memo(
        ("triangle_counts",),
        lambda: materialize(triangle_counts(g.edges, sym=_sym(g))),
    )

LP_ROUNDS = 3

_SYM_CTE = (
    "sym AS (SELECT DISTINCT a, b FROM ("
    "SELECT src AS a, dst AS b FROM e0 UNION ALL SELECT dst AS a, src AS b FROM e0"
    ") WHERE a <> b)"
)


def _triangles_sql() -> str:
    return (
        f"WITH e0 AS ({derived.G_PP_EDGES_SQL}), "
        f"{_SYM_CTE}, "
        "tri AS (SELECT s1.a AS x, s1.b AS y, s2.b AS z "
        "FROM sym s1 JOIN sym s2 ON s1.b = s2.a "
        "JOIN sym s3 ON s3.a = s1.a AND s3.b = s2.b "
        "WHERE s1.a < s1.b AND s2.a < s2.b), "
        "members AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri "
        "UNION ALL SELECT z FROM tri), "
        "counts AS (SELECT id, COUNT(*) AS triangles FROM members GROUP BY id), "
        "nodes AS (SELECT DISTINCT a AS id FROM sym) "
        "SELECT n.id, COALESCE(c.triangles, 0) AS triangles "
        "FROM nodes n LEFT JOIN counts c ON n.id = c.id"
    )


@register("graph_triangles", _triangles_sql())
def q_graph_triangles(spark, sf_dir):
    """Per-node undirected triangle counts on the part->part graph —
    operators/graphalgs.py triangle_counts (degree-ordered orientation);
    the oracle is the brute-force three-way join."""
    g = derived.g_pp(spark, sf_dir)
    return _tri(g).select(
        "id", F.col("triangles").cast("long").alias("triangles")
    )


def _lp_ctes(k: int) -> list[str]:
    """The unrolled label-propagation CTE chain (e0, sym, l0..lk) —
    shared by the standalone LP oracle and the modularity-after-LP
    composite, so both pin the identical round semantics."""
    ctes = [f"e0 AS ({derived.G_PP_EDGES_SQL})", _SYM_CTE]
    ctes.append("l0 AS (SELECT DISTINCT a AS id, a AS community FROM sym)")
    for i in range(1, k + 1):
        ctes.append(
            f"l{i} AS (SELECT id, community FROM ("
            f"SELECT s.a AS id, l.community, "
            "ROW_NUMBER() OVER (PARTITION BY s.a "
            "ORDER BY COUNT(*) DESC, l.community ASC) AS rn "
            f"FROM sym s JOIN l{i - 1} l ON s.b = l.id "
            "GROUP BY s.a, l.community) WHERE rn = 1)"
        )
    return ctes


def _label_propagation_sql(k: int = LP_ROUNDS) -> str:
    return "WITH " + ", ".join(_lp_ctes(k)) + f" SELECT id, community FROM l{k}"


@register("graph_label_propagation", _label_propagation_sql())
def q_graph_label_propagation(spark, sf_dir):
    """Deterministic (min-of-mode) label propagation, k=3 synchronous
    rounds — operators/graphalgs.py label_propagation; the oracle unrolls
    the same rounds as window-ranked mode CTEs."""
    g = derived.g_pp(spark, sf_dir)
    return label_propagation(g.edges, k=LP_ROUNDS, sym=_sym(g))


# ---------------------------------------------------------------------------
# Additional post-gate declared queries (this module loads last, so these
# append after the 50-slot gate prefix regardless of theme).
# ---------------------------------------------------------------------------


@register(
    "pagerank_weighted_k3",
    pagerank_oracle(derived.G_PS_EDGES_SQL, derived.G_PS_NODES_SQL, k=3, weighted=True),
)
def q_pagerank_weighted(spark, sf_dir):
    """Weighted PageRank (edge weight = lineitem quantity): out-weights
    are weighted sums, contributions scale by w/out_w — the weighted twin
    of the gate's pagerank_k3."""
    from bigdata_hits_spark.operators.ranking import pagerank

    scores = pagerank(derived.g_ps(spark, sf_dir), k=3, weight="weight")
    return scores.select("id", F.round(F.col("score"), 7).alias("score"))


SEMANTIC_T = 0.5

_EMB_NORMS_CTE = (
    "norms AS (SELECT vec_id, SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm "
    "FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings) GROUP BY vec_id)"
)


def _dedup_semantic_sql() -> str:
    """Survivors of exact embedding dedup: cosine pairs at SEMANTIC_T,
    clustered by a recursive reachability CTE, minimum-id survivor kept,
    untouched docs passed through."""
    return (
        "WITH RECURSIVE pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2, "
        "a.embedding AS v1, b.embedding AS v2 "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id), "
        "el AS (SELECT id1, id2, v1, v2, unnest(range(len(v1))) AS i FROM pairs), "
        "dots AS (SELECT id1, id2, SUM(CAST(v1[i + 1] AS DOUBLE) * CAST(v2[i + 1] AS DOUBLE)) AS dot "
        "FROM el GROUP BY id1, id2), "
        f"{_EMB_NORMS_CTE}, "
        "cos AS (SELECT id1, id2, ROUND(dot / (n1.nrm * n2.nrm), 6) AS cosine FROM dots "
        "JOIN norms n1 ON n1.vec_id = id1 JOIN norms n2 ON n2.vec_id = id2), "
        f"dup AS (SELECT id1, id2 FROM cos WHERE cosine >= {SEMANTIC_T}), "
        "e AS (SELECT id1 AS src, id2 AS dst FROM dup UNION SELECT id2, id1 FROM dup), "
        "reach AS (SELECT src AS id, src AS comp FROM e "
        "UNION SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id), "
        "drops AS (SELECT id FROM (SELECT id, MIN(comp) AS component FROM reach GROUP BY id) "
        "WHERE id <> component) "
        "SELECT d.doc_id, d.source FROM documents d "
        "WHERE NOT EXISTS (SELECT 1 FROM drops WHERE drops.id = d.doc_id)"
    )


@register("dedup_semantic", _dedup_semantic_sql())
def q_dedup_semantic(spark, sf_dir):
    """Embedding-space dedup survivors via the EXACT pair path (the
    oracle-checkable baseline of operators/similarity.py semantic_dedup;
    the production default is the LSH candidate path, equivalence-tested
    in tests/test_similarity.py)."""
    from bigdata_hits_spark.operators.similarity import semantic_dedup
    from bigdata_hits_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    survivors = semantic_dedup(docs, emb, SEMANTIC_T, candidates="exact")
    return survivors.select("doc_id", "source")


LP_CAP = 40
LP_MIN_COMMON = 2


def _link_prediction_sql() -> str:
    return (
        f"WITH e0 AS ({derived.G_PP_EDGES_SQL}), "
        f"{_SYM_CTE}, "
        "deg AS (SELECT a AS z, COUNT(*) AS dz FROM sym GROUP BY a), "
        "nb AS (SELECT s.a AS z, s.b AS n, d.dz FROM sym s "
        f"JOIN deg d ON d.z = s.a WHERE d.dz <= {LP_CAP}), "
        "pairs AS (SELECT p1.n AS a, p2.n AS b, p1.dz FROM nb p1 "
        "JOIN nb p2 ON p1.z = p2.z AND p1.n < p2.n), "
        "scores AS (SELECT a, b, COUNT(*) AS common_neighbors, "
        "ROUND(SUM(1.0 / LN(dz)), 6) AS adamic_adar FROM pairs GROUP BY a, b) "
        f"SELECT * FROM scores s WHERE common_neighbors >= {LP_MIN_COMMON} "
        "AND NOT EXISTS (SELECT 1 FROM sym WHERE sym.a = s.a AND sym.b = s.b)"
    )


@register("graph_link_prediction", _link_prediction_sql())
def q_graph_link_prediction(spark, sf_dir):
    """Common-neighbor / Adamic-Adar link prediction on the part->part
    graph (operators/graphalgs.py link_prediction): candidate non-edges
    scored over pivots with degree <= LP_CAP — the pivot-degree cap IS
    the declared semantics (hub pairs carry ~zero AA signal and
    quadratic cost), reproduced by the oracle.  AA sums <= cap terms of
    1/ln(int); cross-engine accumulation drift is ~1e-15 relative, so
    the 6-digit rounding holds with huge margin."""
    from bigdata_hits_spark.operators.graphalgs import link_prediction

    g = derived.g_pp(spark, sf_dir)
    return link_prediction(
        g.edges, max_pivot_degree=LP_CAP, min_common=LP_MIN_COMMON, sym=_sym(g)
    )


#: Weight ceiling that sparsifies g_pp for the components row: low-
#: quantity edges only (~4% of lineitem), so the subgraph actually has
#: a nontrivial component structure instead of one giant blob.
CC_MAX_WEIGHT = 2


def _components_sql() -> str:
    return (
        f"WITH RECURSIVE e0 AS ({derived.G_PP_EDGES_SQL}), "
        f"sp AS (SELECT src, dst FROM e0 WHERE weight <= {CC_MAX_WEIGHT}), "
        "e AS (SELECT src, dst FROM sp UNION SELECT dst, src FROM sp), "
        "reach AS (SELECT src AS id, src AS comp FROM e "
        "UNION SELECT e.dst, r.comp FROM reach r JOIN e ON e.src = r.id) "
        "SELECT id, MIN(comp) AS component FROM reach GROUP BY id"
    )


@register("graph_connected_components", _components_sql())
def q_graph_connected_components(spark, sf_dir):
    """Connected components of the low-weight subgraph of g_pp
    (operators/components.py) — the dedup survivor election's machinery
    declared directly on a graph with real component structure.  Runs
    the O(log n)-round STAR CONTRACTION, not the min-label loop: this
    sparse subgraph sits near the percolation threshold, so its giant
    component's diameter far exceeds any sane min-label round budget —
    measured at sf0.1, the auto path burns all 20 min-label rounds and
    escalates anyway (auto 10.0-15.0 s vs star-direct 7.1-9.6 s,
    identical 18194 rows / 264 components).  Long-diameter graphs are
    exactly the regime the star variant exists for; the auto-escalating
    wrapper remains the right call when the shape is unknown.  The
    oracle is the recursive-CTE reachability fixpoint (the
    dedup_semantic pattern); component ids are minimum node ids, a DATA
    value, so the compare is exact."""
    from bigdata_hits_spark.operators.components import connected_components_star

    g = derived.g_pp(spark, sf_dir)
    pairs = g.edges.filter(F.col("weight") <= CC_MAX_WEIGHT).select(
        F.col("src").alias("id1"), F.col("dst").alias("id2")
    )
    return connected_components_star(pairs)


def _clustering_sql() -> str:
    return (
        f"WITH e0 AS ({derived.G_PP_EDGES_SQL}), "
        f"{_SYM_CTE}, "
        "deg AS (SELECT a AS id, COUNT(*) AS degree FROM sym GROUP BY a), "
        "tri AS (SELECT s1.a AS x, s1.b AS y, s2.b AS z "
        "FROM sym s1 JOIN sym s2 ON s1.b = s2.a "
        "JOIN sym s3 ON s3.a = s1.a AND s3.b = s2.b "
        "WHERE s1.a < s1.b AND s2.a < s2.b), "
        "members AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri "
        "UNION ALL SELECT z FROM tri), "
        "counts AS (SELECT id, COUNT(*) AS triangles FROM members GROUP BY id) "
        "SELECT d.id, d.degree, COALESCE(c.triangles, 0) AS triangles, "
        "ROUND(CASE WHEN d.degree >= 2 THEN 2.0 * COALESCE(c.triangles, 0) / "
        "(d.degree * (d.degree - 1)) END, 6) AS coeff "
        "FROM deg d LEFT JOIN counts c ON c.id = d.id"
    )


@register("graph_clustering_coefficient", _clustering_sql())
def q_graph_clustering_coefficient(spark, sf_dir):
    """Local clustering coefficient on the part->part graph
    (operators/graphalgs.py clustering_coefficient): degrees joined to
    the degree-ordered triangle counts; coeff = 2T/(d(d-1)) with the
    0/0 NULL pinned.  The ratio divides exact integers, so 6 digits is
    drift-free."""
    from bigdata_hits_spark.operators.graphalgs import clustering_coefficient

    g = derived.g_pp(spark, sf_dir)
    return clustering_coefficient(g.edges, sym=_sym(g), tri=_tri(g))


#: Weight ceiling for the SCC row: one notch above the components
#: row's.  At <= 3 the directed subgraph is web-bow-tie-shaped (Broder
#: et al. 2000) — a giant SCC holding ~54% of nodes plus IN/OUT tendril
#: DAGs — the structure SCC analysis exists for, and its trim depth and
#: SCC diameter stay O(log n).  At <= 2 the graph sits at the directed
#: percolation threshold: 18 peel layers and ~50-round label diameters,
#: an adversarial long-chain shape that no web corpus exhibits and that
#: would dominate the bench for no extra semantic coverage.
SCC_MAX_WEIGHT = 3


def _scc_sql() -> str:
    # Exact SCC by recursive-CTE reachability: scc(v) = min id among
    # vertices mutually reachable with v (including v itself) —
    # algorithm-independent ground truth for the FW-BW-coloring engine
    # path.
    return (
        f"WITH RECURSIVE e0 AS ({derived.G_PP_EDGES_SQL}), "
        f"sp AS (SELECT DISTINCT src, dst FROM e0 WHERE weight <= {SCC_MAX_WEIGHT}), "
        "n AS (SELECT src AS id FROM sp UNION SELECT dst FROM sp), "
        "reach(a, b) AS (SELECT src, dst FROM sp "
        "UNION SELECT r.a, s.dst FROM reach r JOIN sp s ON s.src = r.b), "
        "mutual AS (SELECT r1.a AS id, r1.b AS m FROM reach r1 "
        "JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a) "
        "SELECT n.id, LEAST(n.id, COALESCE(MIN(mu.m), n.id)) AS scc "
        "FROM n LEFT JOIN mutual mu ON mu.id = n.id GROUP BY n.id"
    )


#: Session memo for the SCC label frame (applicationId, sf_dir) — the
#: condensation row and repeated bench passes reuse one labeling instead
#: of re-running the iterative FW-BW loops (the derived._GRAPH_CACHE
#: pattern; appIds are never reused, so dead sessions can't pin state).
_SCC_CACHE: dict[tuple[str, str], object] = {}


def _scc_labels(spark, sf_dir):
    from bigdata_hits_spark.operators.components import strongly_connected_components

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SCC_CACHE:
        live = spark.sparkContext.applicationId
        for stale in [k for k in _SCC_CACHE if k[0] != live]:
            _SCC_CACHE.pop(stale)
        g = derived.g_pp(spark, sf_dir)
        e = g.edges.filter(F.col("weight") <= SCC_MAX_WEIGHT).select("src", "dst")
        _SCC_CACHE[key] = materialize(strongly_connected_components(e))
    return _SCC_CACHE[key]


@register("graph_scc", _scc_sql())
def q_graph_scc(spark, sf_dir):
    """Strongly connected components of the DIRECTED low-weight subgraph
    of g_pp (operators/components.py strongly_connected_components:
    trim + FW-BW coloring) — the directed complement of the
    graph_connected_components row.  The reference's graph surface is
    undirected-only; SCC is what a link-graph pipeline needs before
    ranking (dangling/sink analysis, condensation).  SCC ids are
    minimum member ids — DATA values — so the compare is exact; the
    oracle is the mutual-reachability closure, which is
    algorithm-independent ground truth."""
    return _scc_labels(spark, sf_dir)


def _condensation_sql() -> str:
    # Same mutual-reachability scc(v) as _scc_sql, wrapped as a CTE and
    # projected to the DISTINCT inter-component edge set.
    ctes, final = _scc_sql().rsplit(" SELECT n.id,", 1)
    return (
        ctes
        + ", scc AS (SELECT n.id,"
        + final
        + ") SELECT DISTINCT s1.scc AS src_scc, s2.scc AS dst_scc "
        "FROM sp JOIN scc s1 ON s1.id = sp.src JOIN scc s2 ON s2.id = sp.dst "
        "WHERE s1.scc <> s2.scc"
    )


@register("graph_condensation", _condensation_sql())
def q_graph_condensation(spark, sf_dir):
    """Condensation DAG of the SCC row's subgraph: distinct
    (src_scc, dst_scc) edges between DIFFERENT components — the acyclic
    quotient graph every link-analysis pipeline ranks/schedules over
    once SCCs are known.  Reuses the session-memoized SCC labeling
    (one iterative run serves both rows); the projection itself is two
    id-keyed joins + distinct, shuffling only scalar ids."""
    labels = _scc_labels(spark, sf_dir)
    g = derived.g_pp(spark, sf_dir)
    e = g.edges.filter(F.col("weight") <= SCC_MAX_WEIGHT).select("src", "dst")
    lsrc = labels.select(F.col("id").alias("src"), F.col("scc").alias("src_scc"))
    ldst = labels.select(F.col("id").alias("dst"), F.col("scc").alias("dst_scc"))
    return (
        e.join(lsrc, "src")
        .join(ldst, "dst")
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .select("src_scc", "dst_scc")
        .distinct()
    )
