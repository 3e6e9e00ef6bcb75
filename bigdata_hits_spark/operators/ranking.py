"""HITS and SALSA families as parameterized DataFrame power iterations.

One harness replaces the reference's 12 copy-pasted scripts
(``/root/reference/src/*_hits.py``, ``*_salsa.py``; SURVEY §2.2).  Every
update is a join + grouped sum declared via the DataFrame API, so Catalyst
plans it (hash aggregate with map-side partials, AQE-picked join strategy,
skew splitting) instead of the reference's fixed RDD shuffle joins.

Parity semantics faithfully reproduced (SURVEY §2.4):

- *Dropped nodes*: score updates inner-join edges with scores, so nodes
  with no in-edges (authorities) / out-edges (hubs) vanish after iteration
  one (``base_hits.py:57,60``).  Teleport mass is added only to surviving
  keys (``random_teleport_hits.py:67-75``) — NOT the textbook
  dangling-node revival.
- *Update order*: hubs update reads the previous auths; the auths update
  reads the just-computed (damped, un-normalized) hubs; both are then
  normalized (``base_hits.py:53-64``).
- *Norms*: HITS normalizes L2, SALSA L1; teleport denominators are N for
  HITS, 2N for SALSA, N_topic / 2·N_topic for the topic variants
  (SURVEY §2.4(c)).
- *SALSA mutual update* divides each contribution by the endpoint degree:
  hub(a) = sum auth(b)/in_deg(b), auth(b) = sum hub(a)/out_deg(a)
  (``base_salsa_2.py:75-80``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F

from bigdata_hits_spark.operators.graph import Graph, neighborhood, topic_induced
from bigdata_hits_spark.plans.iterate import materialize, normalized


@dataclass(frozen=True)
class RankResult:
    """Hub and authority score vectors, each ``(id string, score double)``
    sorted score-descending (id-ascending tiebreak for determinism; the
    reference leaves ties unordered)."""

    hubs: DataFrame
    auths: DataFrame


def _sorted(scores: DataFrame) -> DataFrame:
    return scores.orderBy(F.desc("score"), F.asc("id"))


def _step(edges_prepared: DataFrame, scores: DataFrame) -> DataFrame:
    """One propagation: for each out-node, sum mult * score of the joined
    endpoint.  ``edges_prepared`` has columns (key, out, mult); the join on
    ``key`` hash-partitions, the groupBy on ``out`` aggregates with
    map-side partials (HashAggregate) — 2 shuffles, same asymptotics as
    the reference's join+reduceByKey but JVM-side and AQE-managed."""
    return (
        edges_prepared.join(scores, edges_prepared["key"] == scores["id"], "inner")
        .select(F.col("out").alias("id"), (F.col("mult") * F.col("score")).alias("contrib"))
        .groupBy("id")
        .agg(F.sum("contrib").alias("score"))
    )


def _uniform_init(nodes: DataFrame, n: int) -> DataFrame:
    """h = a = 1/sqrt(N) for every node (``base_hits.py:10-14``)."""
    return nodes.select("id", (F.lit(1.0) / F.sqrt(F.lit(float(n)))).alias("score"))


def _make_damp(
    mode: str | None,
    beta: float,
    uniform_denom: float | None,
    indicator: DataFrame | None,
    topic_denom: float | None,
) -> Callable[[DataFrame], DataFrame]:
    """Build the post-update damping transform.

    - ``None``: identity (base/weighted variants).
    - ``'uniform'``: s -> beta*s + (1-beta)/denom
      (``random_teleport_hits.py:67-75``).
    - ``'topic'``: join the 0/1 indicator; beta*s for non-topic nodes,
      beta*s + (1-beta)/denom for topic nodes
      (``topic_specific_hits.py:75-83``).
    """
    if mode is None:
        return lambda df: df
    if mode == "uniform":
        add = F.lit((1.0 - beta) / uniform_denom)
        return lambda df: df.select("id", (F.lit(beta) * F.col("score") + add).alias("score"))
    if mode == "topic":
        add = F.lit((1.0 - beta) / topic_denom)

        def damp(df: DataFrame) -> DataFrame:
            joined = df.join(indicator, "id", "inner")
            damped = F.when(
                F.col("topic_specific") == 0, F.lit(beta) * F.col("score")
            ).otherwise(F.lit(beta) * F.col("score") + add)
            return joined.select("id", damped.alias("score"))

        return damp
    raise ValueError(f"unknown teleport mode {mode!r}")


def _power_iterate(
    edges_hub: DataFrame,
    edges_auth: DataFrame,
    init: DataFrame,
    k: int,
    damp: Callable[[DataFrame], DataFrame],
    norm: str,
    checkpoint_interval: int,
) -> RankResult:
    """Shared loop: k iterations of (hub step, auth step, damp, normalize)
    with lineage truncation every ``checkpoint_interval`` iterations."""
    edges_hub = edges_hub.persist()
    edges_auth = edges_auth.persist()
    hubs = init
    auths = init
    for i in range(k):
        hubs = damp(_step(edges_hub, auths))
        auths = damp(_step(edges_auth, hubs))
        hubs = normalized(hubs, norm)
        auths = normalized(auths, norm)
        if (i + 1) % checkpoint_interval == 0 or i == k - 1:
            hubs = materialize(hubs)
            auths = materialize(auths)
    edges_hub.unpersist()
    edges_auth.unpersist()
    return RankResult(hubs=_sorted(hubs), auths=_sorted(auths))


def _hits_edges(edges: DataFrame, weight: str | None) -> tuple[DataFrame, DataFrame]:
    """(hub-step, auth-step) edge relations for the HITS family.

    Hub step joins on dst and emits src; auth step joins on src and emits
    dst; mult is the edge weight (1.0 for unweighted —
    ``weighted_hits.py:53,56``)."""
    mult: Column = F.col(weight).cast("double") if weight else F.lit(1.0)
    eh = edges.select(F.col("dst").alias("key"), F.col("src").alias("out"), mult.alias("mult"))
    ea = edges.select(F.col("src").alias("key"), F.col("dst").alias("out"), mult.alias("mult"))
    return eh, ea


def _salsa_edges(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(hub-step, auth-step) edge relations for mutual-update SALSA:
    contributions are divided by the joined endpoint's degree
    (``base_salsa_2.py:14-23,75-80``), i.e. mult = 1/in_deg(dst) on the hub
    step and 1/out_deg(src) on the auth step."""
    in_deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("in_degree"))
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    eh = (
        edges.alias("e")
        .join(in_deg.alias("d"), F.col("e.dst") == F.col("d.dst"), "inner")
        .select(
            F.col("e.dst").alias("key"),
            F.col("e.src").alias("out"),
            (F.lit(1.0) / F.col("d.in_degree")).alias("mult"),
        )
    )
    ea = (
        edges.alias("e")
        .join(out_deg.alias("d"), F.col("e.src") == F.col("d.src"), "inner")
        .select(
            F.col("e.src").alias("key"),
            F.col("e.dst").alias("out"),
            (F.lit(1.0) / F.col("d.out_degree")).alias("mult"),
        )
    )
    return eh, ea


def hits(
    graph: Graph,
    k: int = 8,
    *,
    weight: str | None = None,
    teleport: str | None = None,
    beta: float = 0.8,
    topic: str | None = None,
    checkpoint_interval: int = 1,
) -> RankResult:
    """HITS power iteration (Kleinberg), L2-normalized per iteration.

    Covers the reference's base (``base_hits.py``), weighted
    (``weighted_hits.py``), random-teleport (``random_teleport_hits.py``)
    and topic-specific (``topic_specific_hits.py``) variants:

    - ``weight``: edge-weight column name -> weighted HITS.
    - ``teleport='uniform'``: s -> beta*s + (1-beta)/N after each sum.
    - ``teleport='topic'`` + ``topic=...``: teleport mass only into
      topic-labeled nodes, denominator N_topic.

    Topic-exclusive / query-dependent variants compose via
    :func:`hits_topic_exclusive` / :func:`hits_query_dependent`.
    """
    n = graph.nodes.count()
    indicator = None
    topic_denom = None
    if teleport == "topic":
        if topic is None:
            raise ValueError("teleport='topic' requires topic=")
        indicator = graph.topic_indicator(topic).persist()
        topic_denom = float(indicator.agg(F.sum("topic_specific")).first()[0] or 0)
    damp = _make_damp(teleport, beta, float(n), indicator, topic_denom)
    eh, ea = _hits_edges(graph.edges, weight)
    result = _power_iterate(eh, ea, _uniform_init(graph.nodes, n), k, damp, "l2", checkpoint_interval)
    if indicator is not None:
        indicator.unpersist()
    return result


def hits_topic_exclusive(graph: Graph, topic: str, k: int = 8, **kwargs) -> RankResult:
    """Base HITS on the topic-induced subgraph
    (``topic_exclusive_hits.py:43-71``; intended both-endpoint semantics,
    SURVEY §2.4(b))."""
    return hits(topic_induced(graph, topic), k, **kwargs)


def hits_query_dependent(graph: Graph, topic: str, k: int = 8, **kwargs) -> RankResult:
    """Base HITS on the topic neighborhood graph
    (``query_dependent_hits.py:43-77``)."""
    return hits(neighborhood(graph, topic), k, **kwargs)


def salsa(
    graph: Graph,
    k: int = 8,
    *,
    teleport: str | None = None,
    beta: float = 0.8,
    topic: str | None = None,
    checkpoint_interval: int = 1,
) -> RankResult:
    """Mutual-update SALSA, L1-normalized per iteration
    (``base_salsa_2.py``, ``random_teleport_salsa.py``,
    ``topic_specific_salsa.py``).

    Init is uniform 1/sqrt(N) (sic — mirrors ``base_salsa_2.py:25``) or,
    for the topic variant, 1/(2*N_topic) on topic nodes and 0 elsewhere
    (``topic_specific_salsa.py:23``).  Teleport denominators are 2N
    (uniform) / 2*N_topic (topic) per SURVEY §2.4(c).
    """
    n = graph.nodes.count()
    indicator = None
    topic_denom = None
    if teleport == "topic":
        if topic is None:
            raise ValueError("teleport='topic' requires topic=")
        indicator = graph.topic_indicator(topic).persist()
        n_topic = float(indicator.agg(F.sum("topic_specific")).first()[0] or 0)
        topic_denom = 2.0 * n_topic
        init = indicator.select(
            "id",
            F.when(F.col("topic_specific") == 0, F.lit(0.0))
            .otherwise(F.lit(1.0 / (2.0 * n_topic)))
            .alias("score"),
        )
    else:
        init = _uniform_init(graph.nodes, n)
    damp = _make_damp(teleport, beta, 2.0 * n, indicator, topic_denom)
    eh, ea = _salsa_edges(graph.edges)
    result = _power_iterate(eh, ea, init, k, damp, "l1", checkpoint_interval)
    if indicator is not None:
        indicator.unpersist()
    return result


def salsa_simplified(graph: Graph, *, weight: str | None = None) -> RankResult:
    """Simplified (non-iterative) SALSA: hub score proportional to
    out-degree, authority to in-degree, L1-normalized
    (``base_salsa.py:38-42``); with ``weight``, degrees are weighted sums
    (``weighted_salsa.py:41-45``).  Single groupBy-agg per side — one
    shuffle each, map-side combined."""
    if weight:
        w = F.col(weight).cast("double")
        hub_score, auth_score = F.sum(w), F.sum(w)
    else:
        hub_score, auth_score = F.count(F.lit(1)).cast("double"), F.count(F.lit(1)).cast("double")
    hubs = graph.edges.groupBy(F.col("src").alias("id")).agg(hub_score.alias("score"))
    auths = graph.edges.groupBy(F.col("dst").alias("id")).agg(auth_score.alias("score"))
    return RankResult(
        hubs=_sorted(normalized(hubs, "l1")),
        auths=_sorted(normalized(auths, "l1")),
    )


def salsa_query_dependent(graph: Graph, topic: str, **kwargs) -> RankResult:
    """Simplified SALSA on the topic neighborhood graph
    (``query_dependent_salsa.py:39-62``)."""
    return salsa_simplified(neighborhood(graph, topic), **kwargs)


def list_topics(graph: Graph) -> DataFrame:
    """Distinct node labels (``list_topics.py:17-19``)."""
    return graph.nodes.select(F.col(graph.label_col).alias("label")).distinct()
