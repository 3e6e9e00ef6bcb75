"""Directed property graph as two DataFrames, plus subgraph builders.

The reference encodes its graph relationally (nodes CSV + edges CSV,
SURVEY §1.1) and derives two subgraph shapes:

- topic-induced subgraph (both endpoints carry the topic label) —
  ``/root/reference/src/topic_exclusive_hits.py:48-50`` (intended
  semantics per SURVEY §2.4(b); the literal single-join line only keeps
  self-loops and contradicts the committed outputs).
- query/neighborhood subgraph (edges touching >=1 topic node, then nodes
  incident to a kept edge) — ``/root/reference/src/query_dependent_hits.py:50-55``.

The reference expresses the neighborhood filter as one OR-predicate
left-semi join, which Spark can only execute as a BroadcastNestedLoopJoin
— quadratic work and a broadcast of a potentially huge node set.  At 100 TB
that plan is not viable, so :func:`neighborhood` rewrites it as two
equi-joins with existence markers (hash-partitioned, AQE-eligible,
multiplicity-preserving).  Equivalence is asserted in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class Graph:
    """A directed property graph.

    nodes: DataFrame with at least ``id`` (string); label/weight attribute
        columns ride along (default label column: ``labels``).
    edges: DataFrame with at least ``src``, ``dst`` (string FKs into
        ``nodes.id``); numeric weight columns ride along.

    The reference's real workload runs MANY ranking jobs over one graph
    (13 scripts, same two CSVs — SURVEY §2.2), so per-graph preparation
    (partitioned/persisted edge relations, node counts) is memoized in
    ``_memo`` and amortized across queries.  Call :meth:`release` to drop
    the persisted state when done with the graph.
    """

    nodes: DataFrame
    edges: DataFrame
    label_col: str = "labels"
    _memo: dict[Any, Any] = field(default_factory=dict, init=False, repr=False, compare=False)

    def __post_init__(self):
        # Validate the column contract up front: a misnamed column should
        # fail here with a clear message, not as an AnalysisException deep
        # inside some operator's join.  ``edges=None`` is permitted for
        # node-only jobs (list_topics).
        if self.nodes is not None and "id" not in self.nodes.columns:
            raise ValueError(
                f"Graph.nodes needs an 'id' column, got {self.nodes.columns}"
            )
        if self.edges is not None:
            missing = [c for c in ("src", "dst") if c not in self.edges.columns]
            if missing:
                raise ValueError(
                    f"Graph.edges needs 'src' and 'dst' columns, missing {missing} "
                    f"(got {self.edges.columns})"
                )

    def memo(self, key: Any, build) -> Any:
        """Per-graph memoization of derived state (prepared edge
        relations, counts).  ``build`` runs at most once per key."""
        if key not in self._memo:
            self._memo[key] = build()
        return self._memo[key]

    def release(self) -> None:
        """Unpersist any cached DataFrames this graph memoized, including
        those held by memoized subgraphs."""
        for value in self._memo.values():
            for item in value if isinstance(value, tuple) else (value,):
                if isinstance(item, DataFrame):
                    item.unpersist()
                elif isinstance(item, Graph):
                    item.release()
        self._memo.clear()

    def topic_nodes(self, topic: str) -> DataFrame:
        """Nodes whose label equals ``topic`` (strict string equality, like
        the reference — ``gene:protein`` != ``gene``, SURVEY §2.4(d))."""
        return self.nodes.filter(F.col(self.label_col) == F.lit(topic))

    def topic_indicator(self, topic: str) -> DataFrame:
        """(id, topic_specific 0/1) — mirrors the reference's label vector
        (``/root/reference/src/topic_specific_hits.py:54``)."""
        return self.nodes.select(
            "id",
            F.when(F.col(self.label_col) == F.lit(topic), F.lit(1))
            .otherwise(F.lit(0))
            .alias("topic_specific"),
        )


def topic_induced(graph: Graph, topic: str, *, strict: bool = False) -> Graph:
    """Subgraph induced by topic-labeled nodes: keep edges whose *both*
    endpoints are topic nodes (intended semantics of
    ``topic_exclusive_hits.py`` per SURVEY §2.4(b)).

    Two equi-left-semi joins; the topic node set is usually far smaller
    than the edge set, so AQE will typically broadcast it.

    ``strict=True`` reproduces the reference's *literal* single-join line
    (``topic_exclusive_hits.py:49``: one semi-join on
    ``(src == id) & (dst == id)``), which matches one node row against
    BOTH endpoints and therefore keeps only self-loops on topic nodes.
    The committed outputs show that is not what the job actually computed
    (hub and auth key sets would coincide — SURVEY §2.4(b)), so strict
    mode exists to make the documented divergence switchable, not as a
    recommended path.
    """
    topic_ids = graph.topic_nodes(topic).select("id")
    if strict:
        edges = graph.edges.alias("e").join(
            topic_ids.alias("t"),
            (F.col("e.src") == F.col("t.id")) & (F.col("e.dst") == F.col("t.id")),
            "leftsemi",
        )
    else:
        edges = (
            graph.edges.alias("e")
            .join(topic_ids.alias("ts"), F.col("e.src") == F.col("ts.id"), "leftsemi")
            .join(topic_ids.alias("td"), F.col("e.dst") == F.col("td.id"), "leftsemi")
        )
    return replace(graph, nodes=graph.topic_nodes(topic), edges=edges)


def neighborhood(graph: Graph, topic: str) -> Graph:
    """Kleinberg-style neighborhood graph: edges touching >=1 topic node,
    then nodes incident to >=1 kept edge
    (``/root/reference/src/query_dependent_hits.py:50-55``).

    Scale rewrite of the reference's OR-predicate semi join (which plans as
    BroadcastNestedLoopJoin): mark src/dst membership with two equi
    left-joins against the (distinct, typically small) topic-id set and
    filter on either marker.  Preserves edge multiplicity exactly like a
    left-semi join would.
    """
    topic_ids = graph.topic_nodes(topic).select("id").distinct()
    e = graph.edges
    src_hit = topic_ids.select(F.col("id").alias("__src_id"), F.lit(True).alias("__src_hit"))
    dst_hit = topic_ids.select(F.col("id").alias("__dst_id"), F.lit(True).alias("__dst_hit"))
    edges = (
        e.join(src_hit, e["src"] == src_hit["__src_id"], "left")
        .join(dst_hit, e["dst"] == dst_hit["__dst_id"], "left")
        .filter(F.col("__src_hit").isNotNull() | F.col("__dst_hit").isNotNull())
        .drop("__src_id", "__src_hit", "__dst_id", "__dst_hit")
    )
    # Nodes incident to a kept edge: semi-join against the distinct
    # endpoint set (equi), instead of the reference's OR-theta semi join.
    endpoints = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    nodes = graph.nodes.alias("n").join(
        endpoints.alias("ep"), F.col("n.id") == F.col("ep.id"), "leftsemi"
    )
    return replace(graph, nodes=nodes, edges=edges)
