"""Optional driver-side graph rendering — parity shim for the reference's
``draw_graphs.py`` (A14, ``/root/reference/src/draw_graphs.py:77-89``).

The reference renders three PNGs per run: the sampled graph, and the
top-50 hubs/authorities colored and sized by score
(``draw_graphs.py:23,45,73``).  Rendering is inherently driver-side and
needs networkx + matplotlib, which are not in this container — so the
DISTRIBUTED part (sampling the graph, extracting top-K scores, joining
display attributes) is real Spark code, and :func:`draw` gates the
matplotlib step behind an import-try, mirroring SURVEY §7.3's "optional
notebook util" stance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_hits_spark.operators.graph import Graph
from bigdata_hits_spark.operators.ranking import RankResult


def prepare_render_data(
    graph: Graph,
    result: RankResult,
    node_fraction: float = 0.01,
    edge_fraction: float = 0.01,
    seed: int = 81,
    top: int = 50,
) -> dict:
    """Distributed prep for the three reference renderings: seeded samples
    of nodes/edges (``base_hits.py:78-79`` uses fraction 0.01, seed 81)
    plus the top-``top`` hub/authority rows.  Everything returned is
    driver-sized (samples + two top-K lists) as pandas DataFrames."""
    return {
        "nodes_sample": graph.nodes.sample(False, node_fraction, seed).toPandas(),
        "edges_sample": graph.edges.sample(False, edge_fraction, seed).toPandas(),
        "top_hubs": result.hubs.limit(top).toPandas(),
        "top_auths": result.auths.limit(top).toPandas(),
    }


def draw(render_data: dict, name: str, out_dir: str = "./outputs") -> list[str]:
    """Render the reference's three PNGs from :func:`prepare_render_data`:
    the sampled graph (``draw_graphs.py:23``), the top-50 hubs
    (``draw_graphs.py:45``) and the top-50 authorities
    (``draw_graphs.py:73``).

    Needs networkx + matplotlib; raises NotImplementedError with a clear
    message when they are absent (as in this container)."""
    try:
        import matplotlib  # noqa: F401
        import networkx as nx  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "draw() needs networkx + matplotlib, which are not installed; "
            "prepare_render_data() output is plain pandas and can be "
            "rendered anywhere"
        ) from e
    import os

    import matplotlib.pyplot as plt

    paths = []
    g = nx.DiGraph()
    for row in render_data["edges_sample"].itertuples(index=False):
        g.add_edge(row.src, row.dst)
    # Rendering 1/3: the sampled graph itself, uniform node size.
    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(12, 12))
    nx.draw_networkx(g, ax=ax, node_size=50, with_labels=False)
    path = os.path.join(out_dir, f"{name}_sampled_graph.png")
    fig.savefig(path)
    plt.close(fig)
    paths.append(path)
    # Renderings 2-3/3: top-50 hubs / authorities sized by score.
    for kind in ("top_hubs", "top_auths"):
        scores = dict(zip(render_data[kind]["id"], render_data[kind]["score"]))
        sub = g.subgraph([n for n in g if n in scores] or list(g.nodes)[:1])
        fig, ax = plt.subplots(figsize=(12, 12))
        nx.draw_networkx(
            sub,
            ax=ax,
            node_size=[300 + 5000 * scores.get(n, 0.0) for n in sub],
            with_labels=True,
        )
        path = os.path.join(out_dir, f"{name}_{kind}.png")
        os.makedirs(out_dir, exist_ok=True)
        fig.savefig(path)
        plt.close(fig)
        paths.append(path)
    return paths
