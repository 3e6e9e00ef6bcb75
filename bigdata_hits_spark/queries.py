"""Declared query registry — the driver contract's backing store.

Every implemented operator from SURVEY §2 gets a named entry: a Spark
callable ``(spark, sf_dir) -> DataFrame`` and (where SQL-expressible) a
DuckDB oracle string over the same parquet tables.  Column names/aliases
match pairwise so the driver's order-insensitive value-hash compares equal.

Floating-point outputs are rounded identically on both sides (see
oracles.py for the parity discipline).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from bigdata_hits_spark.operators import relops
from bigdata_hits_spark.operators.graph import neighborhood, topic_induced
from bigdata_hits_spark.operators.ranking import (
    RankResult,
    hits,
    list_topics,
    pagerank,
    salsa,
    salsa_query_dependent,
    salsa_simplified,
)
from bigdata_hits_spark.oracles import pagerank_oracle, ranking_oracle, salsa_simplified_oracle
from bigdata_hits_spark.sources import derived
from bigdata_hits_spark.sources.readers import load_table

ROUND = 7
K_ITER = 3
BETA = 0.8

#: name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}

#: Canonical declaration order of the query modules — the driver's gate
#: prefix depends on it, so it must NOT depend on which module happens
#: to be imported first (a test importing queries_postgate for one of
#: its constants would otherwise register postgate's entries ahead of
#: the theme modules and silently reshuffle the gate prefix).  Must
#: match the import order in ``_load_extensions``.
_MODULE_RANK = {
    f"{__package__}.{m}" if m else __name__: r
    for r, m in enumerate(
        [
            "",  # this module
            "queries_text",
            "queries_dedup",
            "queries_similarity",
            "queries_events",
            "queries_multimodal",
            "queries_graph",
            "queries_postgate",
        ]
    )
}


def register(name: str, oracle: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def rank_union(res: RankResult, digits: int = ROUND) -> DataFrame:
    """(kind, id, score) union of hub+auth vectors, scores rounded for
    cross-engine comparison."""
    hub = res.hubs.select(
        F.lit("hub").alias("kind"), "id", F.round(F.col("score"), digits).alias("score")
    )
    auth = res.auths.select(
        F.lit("auth").alias("kind"), "id", F.round(F.col("score"), digits).alias("score")
    )
    return hub.unionByName(auth)


# ---------------------------------------------------------------------------
# Primitive operators (SURVEY §2.1 / §2.5)
# ---------------------------------------------------------------------------


@register("scan_project", "SELECT l_orderkey, l_partkey, l_extendedprice FROM lineitem")
def q_scan_project(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return relops.project(li, "l_orderkey", "l_partkey", "l_extendedprice")


@register(
    "filter_conditional_flag",
    "SELECT p_partkey, p_size, CASE WHEN p_size > 25 THEN 1 ELSE 0 END AS big_flag "
    "FROM part WHERE p_brand = 'Brand#11'",
)
def q_filter_conditional_flag(spark, sf_dir):
    """O4 equality filter (``base_hits.py:33`` label filter shape) AND
    O5 conditional 0/1 projection (``topic_specific_hits.py:41``
    indicator column) in one declared entry — the filter feeds the
    conditional projection, so one slot in the driver's bounded
    (first-50) correctness gate exercises both primitives
    (relops.filter_eq / relops.conditional_flag individually)."""
    part = load_table(spark, sf_dir, "part")
    filtered = relops.filter_eq(part, "p_brand", "Brand#11")
    flagged = relops.conditional_flag(filtered, F.col("p_size") > 25, "big_flag")
    return flagged.select("p_partkey", "p_size", "big_flag")


@register(
    "join_inner",
    "SELECT c_custkey, c_name, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey",
)
def q_join_inner(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return customer.join(
        nation, customer["c_nationkey"] == nation["n_nationkey"], "inner"
    ).select("c_custkey", "c_name", "n_name")


@register(
    "join_leftsemi_and",
    "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem l "
    "WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey AND p.p_size > 25) "
    "AND EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal > 5000)",
)
def q_join_leftsemi_and(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 25)
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
    kept = relops.semi_join_and(
        li,
        part,
        li["l_partkey"] == part["p_partkey"],
        supp,
        li["l_suppkey"] == supp["s_suppkey"],
    )
    return kept.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")


@register(
    "join_leftsemi_or",
    "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem l "
    "WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey AND p.p_size > 45) "
    "OR EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal > 9000)",
)
def q_join_leftsemi_or(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 45)
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    kept = relops.semi_join_or(
        li, [(part, "l_partkey", "p_partkey"), (supp, "l_suppkey", "s_suppkey")]
    )
    return kept.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")


@register(
    "groupby_degrees",
    f"SELECT src AS id, COUNT(*) AS out_degree, "
    f"ROUND(CAST(SUM(weight) AS DOUBLE), {ROUND}) AS wdegree "
    f"FROM ({derived.G_PS_EDGES_SQL}) GROUP BY src",
)
def q_groupby_degrees(spark, sf_dir):
    """O10 groupBy-count (degree) AND O11 groupBy-sum (weighted degree)
    in one hash aggregation — the two primitives (``base_hits.py:38``
    count, ``weighted_hits.py:40`` sum) share the grouping key, so a
    single agg demonstrates both with one shuffle and one declared slot
    in the driver's bounded (first-50) correctness gate.  The merged
    form is also the plan a real engine should produce when both stats
    are requested (relops.degrees covers each individually)."""
    g = derived.g_ps(spark, sf_dir)
    return g.edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.round(F.sum("weight"), ROUND).alias("wdegree"),
    )


@register(
    "grand_agg_l2",
    "SELECT ROUND(CAST(SQRT(SUM(c_acctbal * c_acctbal)) AS DOUBLE), 4) AS norm, "
    "COUNT(*) AS n FROM customer",
)
def q_grand_agg_l2(spark, sf_dir):
    """O12 grand aggregate (L2 norm — ``base_hits.py:57`` reduce) AND
    O20 count (``base_hits.py:44`` count) in one declared entry — both
    are grand aggregates over the same table, so one slot in the
    driver's bounded first-50 gate exercises both primitives
    (relops.grand_norm / relops.count_rows individually)."""
    customer = load_table(spark, sf_dir, "customer")
    norm = relops.grand_norm(customer, "c_acctbal", "l2")
    n = relops.count_rows(customer)
    return norm.crossJoin(n).select(F.round(F.col("norm"), 4).alias("norm"), "n")


@register(
    "scalar_normalize",
    "SELECT c_custkey, ROUND(CAST(c_acctbal / (SELECT SUM(c_acctbal) FROM customer) AS DOUBLE), 9) "
    "AS share FROM customer",
)
def q_scalar_normalize(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    total = customer.agg(F.sum("c_acctbal").alias("__norm"))
    return customer.crossJoin(F.broadcast(total)).select(
        "c_custkey", F.round(F.col("c_acctbal") / F.col("__norm"), 9).alias("share")
    )


@register(
    "sort_and_topk",
    "SELECT 'all' AS which, o_orderkey, o_totalprice FROM orders "
    "UNION ALL SELECT 'top50' AS which, o_orderkey, o_totalprice FROM "
    "(SELECT o_orderkey, o_totalprice FROM orders "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 50)",
)
def q_sort_and_topk(spark, sf_dir):
    """O16 global sort AND O17 top-K in one declared entry (one slot in
    the driver's bounded first-50 gate): the ``top50``-labeled branch is
    relops.top_k (TakeOrderedAndProject — ``base_hits.py:49`` take after
    sort), and the union output carries a *global* ``orderBy`` so the
    full-sort operator (``base_hits.py:47`` sortBy) stays in the
    physical plan.  The driver's value-hash is order-insensitive, so a
    standalone full-sort entry could never verify ordering anyway — the
    top-50 row *membership* is what proves the sort semantics."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    allrows = orders.select(
        F.lit("all").alias("which"), "o_orderkey", "o_totalprice"
    )
    top = relops.top_k(orders, "o_totalprice", 50, "o_orderkey").select(
        F.lit("top50").alias("which"), "o_orderkey", "o_totalprice"
    )
    return allrows.unionByName(top).orderBy(
        "which", F.desc("o_totalprice"), F.asc("o_orderkey")
    )


@register(
    "rename_chain",
    "SELECT s_suppkey AS supp_id, s_name AS supp_name FROM supplier "
    "ORDER BY supp_id LIMIT 10",
)
def q_rename_chain(spark, sf_dir):
    """O3 + O18 in one declared entry: rename chains
    (``base_salsa.py:32`` renames src/dst columns) feeding a take(10)
    diagnostics peek (``base_hits.py:49-51``), ordered for cross-engine
    determinism.  Merged so both primitives cost one slot in the
    driver's bounded (first-50) correctness gate."""
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.withColumnsRenamed({"s_suppkey": "supp_id", "s_name": "supp_name"})
        .select("supp_id", "supp_name")
        .orderBy("supp_id")
        .limit(10)
    )


@register("sample_bernoulli", None)  # seeded sampling isn't bitwise-portable: rows-only check
def q_sample_bernoulli(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return relops.bernoulli_sample(li.select("l_orderkey", "l_linenumber"), 0.1, seed=81)


# --- beyond-reference relational completeness (the reference never uses
# window functions, anti joins, or rollups — SURVEY §2.3 — but an engine
# replacing it should) -------------------------------------------------


@register(
    "window_topn_per_group",
    "SELECT l_suppkey, l_partkey, revenue, rn FROM ("
    "SELECT l_suppkey, l_partkey, revenue, ROW_NUMBER() OVER ("
    "PARTITION BY l_suppkey ORDER BY revenue DESC, l_partkey) AS rn FROM ("
    "SELECT l_suppkey, l_partkey, "
    "ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 4) AS revenue "
    "FROM lineitem GROUP BY l_suppkey, l_partkey)) WHERE rn <= 3",
)
def q_window_topn(spark, sf_dir):
    """Top-3 parts per supplier by revenue: grouped agg + ranked window —
    the partition-local top-N shape that avoids any global sort."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey", "l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.desc("revenue"), F.asc("l_partkey"))
    return rev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


@register(
    "anti_join_idle_customers",
    "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')",
)
def q_anti_join(spark, sf_dir):
    """Customers with no completed ('F'-status) order: left-anti join (no
    outer-join + null filter detour).  The anti-join runs against a
    *filtered* orders side so the result is non-empty on the synthetic
    data, where every customer has at least one order of some status —
    an unfiltered anti-join would pass vacuously with 0 rows."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "rollup_revenue",
    "SELECT l_returnflag, l_linestatus, "
    "ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 4) AS revenue, "
    "COUNT(*) AS n FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)",
)
def q_rollup_revenue(spark, sf_dir):
    """Hierarchical subtotals via ROLLUP — one pass computes (flag,
    status), (flag), and grand-total grains."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "composite_order_revenue_topk",
    "SELECT o.o_orderkey, c.c_name, "
    "ROUND(CAST(SUM(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE), 4) AS revenue "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "WHERE o.o_orderstatus = 'O' "
    "GROUP BY o.o_orderkey, c.c_name "
    "ORDER BY revenue DESC, o.o_orderkey LIMIT 20",
)
def q_composite_order_revenue(spark, sf_dir):
    """TPC-H Q3-shaped composite: 3-way join, filtered fact scan, grouped
    revenue, global top-k.  Catalyst broadcast-joins the dimension sides
    and pushes the status filter to the orders scan (asserted patterns in
    tests/test_plans.py)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "c_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "composite_nation_volume",
    "SELECT n.n_name, ROUND(CAST(SUM(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE), 4) "
    "AS volume, COUNT(*) AS n_items "
    "FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey "
    "JOIN supplier s ON s.s_nationkey = n.n_nationkey "
    "JOIN lineitem l ON l.l_suppkey = s.s_suppkey "
    "WHERE r.r_name = 'ASIA' GROUP BY n.n_name",
)
def q_composite_nation_volume(spark, sf_dir):
    """TPC-H Q5-shaped composite: snowflake join chain region -> nation ->
    supplier -> lineitem with a region filter that prunes before the fact
    join."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        r.join(n, n["n_regionkey"] == r["r_regionkey"])
        .join(s, s["s_nationkey"] == n["n_nationkey"])
        .join(li, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "volume"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "setop_union_intersect_except",
    "SELECT 'union' AS which, k FROM "
    "(SELECT n_nationkey AS k FROM nation UNION SELECT r_regionkey AS k FROM region) "
    "UNION ALL SELECT 'both', k FROM "
    "(SELECT l_suppkey AS k FROM lineitem INTERSECT SELECT s_suppkey AS k FROM supplier) "
    "UNION ALL SELECT 'only_supplier', k FROM "
    "(SELECT s_suppkey AS k FROM supplier EXCEPT SELECT l_suppkey AS k FROM lineitem)",
)
def q_setop_union_intersect_except(spark, sf_dir):
    """All four set operations in one labeled result: UNION-distinct of
    the nation/region key sets, INTERSECT (suppliers appearing in
    lineitem), EXCEPT (suppliers with no lineitems), stitched with
    UNION ALL.  One declared entry so the set-op family costs a single
    slot in the driver's bounded correctness gate."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    union_keys = (
        nation.select(F.col("n_nationkey").alias("k"))
        .union(region.select(F.col("r_regionkey").alias("k")))
        .distinct()
        .select(F.lit("union").alias("which"), "k")
    )
    li_keys = load_table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("k"))
    s_keys = load_table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    both = li_keys.intersect(s_keys).select(F.lit("both").alias("which"), "k")
    only_s = s_keys.exceptAll(li_keys).distinct().select(
        F.lit("only_supplier").alias("which"), "k"
    )
    return union_keys.unionByName(both).unionByName(only_s)


@register("sketch_distinct_parts", None)  # HLL sketches differ per engine: rows-only
def q_sketch_distinct_parts(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) per order-status — the
    sketch path for cardinalities too large to exact-count; accuracy
    floor asserted against the exact count in tests/test_sketches.py."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"))
    )


@register("sketch_price_quantiles", None)  # approximate: rows-only, tolerance in tests
def q_sketch_price_quantiles(spark, sf_dir):
    """percentile_approx (Greenwald-Khanna) of extended price — the
    mergeable-quantile-sketch path for distribution stats over data too
    big to sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10_000).alias("quantiles")
    )


# ---------------------------------------------------------------------------
# Ranking algorithms (SURVEY §2.2) on the derived graphs
# ---------------------------------------------------------------------------

_PS = dict(edges_sql=derived.G_PS_EDGES_SQL, nodes_sql=derived.G_PS_NODES_SQL)
_PP = dict(edges_sql=derived.G_PP_EDGES_SQL, nodes_sql=derived.G_PP_NODES_SQL)


@register("list_topics", "SELECT DISTINCT p_brand AS label FROM part")
def q_list_topics(spark, sf_dir):
    """A13 list_topics — which IS the O15 distinct primitive
    (``list_topics.py:17`` is ``select(labels).distinct()``), so one
    declared entry covers both inventory rows."""
    return list_topics(derived.g_pp(spark, sf_dir))


@register("base_salsa", salsa_simplified_oracle(derived.G_PS_EDGES_SQL))
def q_base_salsa(spark, sf_dir):
    return rank_union(salsa_simplified(derived.g_ps(spark, sf_dir)))


@register("weighted_salsa", salsa_simplified_oracle(derived.G_PS_EDGES_SQL, weighted=True))
def q_weighted_salsa(spark, sf_dir):
    return rank_union(salsa_simplified(derived.g_ps(spark, sf_dir), weight="weight"))


@register(
    "query_dependent_salsa",
    salsa_simplified_oracle(
        derived.G_PP_EDGES_SQL,
        derived.G_PP_NODES_SQL,
        subgraph="neighborhood",
        topic=derived.G_PP_TOPIC,
    ),
)
def q_query_dependent_salsa(spark, sf_dir):
    return rank_union(
        salsa_simplified(_sub_neighborhood(derived.g_pp(spark, sf_dir), derived.G_PP_TOPIC))
    )


@register("base_hits_k3", ranking_oracle(**_PS, family="hits", k=K_ITER))
def q_base_hits(spark, sf_dir):
    return rank_union(hits(derived.g_ps(spark, sf_dir), k=K_ITER))


@register("weighted_hits_k3", ranking_oracle(**_PS, family="hits", k=K_ITER, weighted=True))
def q_weighted_hits(spark, sf_dir):
    return rank_union(hits(derived.g_ps(spark, sf_dir), k=K_ITER, weight="weight"))


@register(
    "teleport_hits_k3",
    ranking_oracle(**_PS, family="hits", k=K_ITER, teleport="uniform", beta=BETA),
)
def q_teleport_hits(spark, sf_dir):
    return rank_union(hits(derived.g_ps(spark, sf_dir), k=K_ITER, teleport="uniform", beta=BETA))


@register(
    "topic_specific_hits_k3",
    ranking_oracle(
        **_PP, family="hits", k=K_ITER, teleport="topic", beta=BETA, topic=derived.G_PP_TOPIC
    ),
)
def q_topic_specific_hits(spark, sf_dir):
    return rank_union(
        hits(
            derived.g_pp(spark, sf_dir),
            k=K_ITER,
            teleport="topic",
            beta=BETA,
            topic=derived.G_PP_TOPIC,
        )
    )


def _sub_exclusive(g, topic):
    """Topic-induced subgraph, memoized on the parent graph so repeated
    queries share one prepared subgraph instead of pinning a new one."""
    return g.memo(("subgraph_exclusive", topic), lambda: topic_induced(g, topic))


def _sub_neighborhood(g, topic):
    return g.memo(("subgraph_neighborhood", topic), lambda: neighborhood(g, topic))


@register(
    "topic_exclusive_hits_k3",
    ranking_oracle(**_PP, family="hits", k=K_ITER, subgraph="exclusive", topic=derived.G_PP_TOPIC),
)
def q_topic_exclusive_hits(spark, sf_dir):
    return rank_union(hits(_sub_exclusive(derived.g_pp(spark, sf_dir), derived.G_PP_TOPIC), k=K_ITER))


@register(
    "query_dependent_hits_k3",
    ranking_oracle(
        **_PP, family="hits", k=K_ITER, subgraph="neighborhood", topic=derived.G_PP_TOPIC
    ),
)
def q_query_dependent_hits(spark, sf_dir):
    return rank_union(hits(_sub_neighborhood(derived.g_pp(spark, sf_dir), derived.G_PP_TOPIC), k=K_ITER))


@register("salsa_mutual_k3", ranking_oracle(**_PS, family="salsa", k=K_ITER))
def q_salsa_mutual(spark, sf_dir):
    return rank_union(salsa(derived.g_ps(spark, sf_dir), k=K_ITER))


@register(
    "teleport_salsa_k3",
    ranking_oracle(**_PS, family="salsa", k=K_ITER, teleport="uniform", beta=BETA),
)
def q_teleport_salsa(spark, sf_dir):
    return rank_union(salsa(derived.g_ps(spark, sf_dir), k=K_ITER, teleport="uniform", beta=BETA))


@register(
    "topic_specific_salsa_k3",
    ranking_oracle(
        **_PP, family="salsa", k=K_ITER, teleport="topic", beta=BETA, topic=derived.G_PP_TOPIC
    ),
)
def q_topic_specific_salsa(spark, sf_dir):
    return rank_union(
        salsa(
            derived.g_pp(spark, sf_dir),
            k=K_ITER,
            teleport="topic",
            beta=BETA,
            topic=derived.G_PP_TOPIC,
        )
    )


@register("pagerank_k3", pagerank_oracle(derived.G_PS_EDGES_SQL, derived.G_PS_NODES_SQL, k=K_ITER))
def q_pagerank_k3(spark, sf_dir):
    """Textbook PageRank on the part->supplier graph (beyond-reference;
    semantics documented at operators/ranking.py pagerank): every node
    — including edge-less ones — receives the teleport mass, scores L1-
    renormalized per iteration."""
    scores = pagerank(derived.g_ps(spark, sf_dir), k=K_ITER)
    return scores.select("id", F.round(F.col("score"), ROUND).alias("score"))


# ---------------------------------------------------------------------------
# Driver contract accessors
# ---------------------------------------------------------------------------


def _ordered_registry() -> list[tuple[str, tuple[Callable, str | None]]]:
    """Registry entries with every oracle-backed query ahead of every
    rows-only one (stable within each class).

    The driver's correctness gate consumes a bounded prefix of the
    declared queries (the first 50 in round 1), so approximate/rows-only
    entries (seeded sampling, sketches, ANN recall paths) must not occupy
    gate slots ahead of oracle-checkable queries.

    Order is (oracle-backed first, CANONICAL module rank, in-module
    declaration order) — explicitly independent of import order, so a
    stray early ``import queries_postgate`` (tests pull constants from
    it) cannot reshuffle the gate prefix.  In-module order is the
    registry's insertion order restricted to that module (dicts
    preserve insertion; a module's own entries always register in
    source order regardless of when the module loads).
    """
    _load_extensions()
    items = list(_REGISTRY.items())
    items.sort(
        key=lambda kv: (
            kv[1][1] is None,
            _MODULE_RANK.get(getattr(kv[1][0], "__module__", ""), len(_MODULE_RANK)),
        )
    )
    return items


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _ordered_registry()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _ordered_registry() if sql is not None}


def _load_extensions() -> None:
    """Import extension query modules (they self-register).  Deferred to
    avoid import cycles: extensions import ``register`` from this module."""
    import bigdata_hits_spark.queries_text  # noqa: F401
    import bigdata_hits_spark.queries_dedup  # noqa: F401
    import bigdata_hits_spark.queries_similarity  # noqa: F401
    import bigdata_hits_spark.queries_events  # noqa: F401
    import bigdata_hits_spark.queries_multimodal  # noqa: F401
    # These load LAST on purpose: their oracle-backed entries land AFTER
    # the 50 gate-prefix slots (stable sort preserves registration
    # order), so they add local-harness + bench coverage without
    # displacing any driver gate slot.
    import bigdata_hits_spark.queries_graph  # noqa: F401
    import bigdata_hits_spark.queries_postgate  # noqa: F401
