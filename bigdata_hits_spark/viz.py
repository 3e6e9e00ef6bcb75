"""Optional driver-side graph rendering — parity shim for the reference's
``draw_graphs.py`` (A14, ``/root/reference/src/draw_graphs.py:77-89``).

The reference renders three PNGs per run: the sampled graph, and the
top-50 hubs/authorities colored and sized by score
(``draw_graphs.py:23,45,73``).  Rendering is inherently driver-side and
needs networkx + matplotlib for PNG — so the DISTRIBUTED part (sampling
the graph, extracting top-K scores, joining display attributes) is real
Spark code, :func:`draw` gates the matplotlib/PNG step behind an
import-try, and :func:`draw_svg` renders the SAME three figures as SVG
with a deterministic pure-Python force layout — zero dependencies, so
the render step is no longer environment-limited.
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


def _fr_layout(
    node_ids: list[str], edge_list: list[tuple[str, str]], iterations: int = 60
) -> dict[str, tuple[float, float]]:
    """Deterministic Fruchterman–Reingold force layout in pure Python over
    the driver-sized render sample (a few hundred nodes — O(n²·iters) is
    milliseconds here).  Initial positions derive from md5(id), so the
    same sample always lays out identically with no RNG state."""
    import hashlib
    import math

    n = len(node_ids)
    if n == 0:
        return {}
    pos: dict[str, list[float]] = {}
    for nid in node_ids:
        h = hashlib.md5(nid.encode()).hexdigest()
        pos[nid] = [int(h[:8], 16) / 0xFFFFFFFF, int(h[8:16], 16) / 0xFFFFFFFF]
    k = math.sqrt(1.0 / n)  # ideal spring length in unit square
    t = 0.1  # temperature, linearly cooled
    for it in range(iterations):
        disp = {nid: [0.0, 0.0] for nid in node_ids}
        for i, u in enumerate(node_ids):  # repulsion: all pairs
            for v in node_ids[i + 1 :]:
                dx = pos[u][0] - pos[v][0]
                dy = pos[u][1] - pos[v][1]
                d2 = dx * dx + dy * dy or 1e-9
                f = k * k / d2
                disp[u][0] += dx * f
                disp[u][1] += dy * f
                disp[v][0] -= dx * f
                disp[v][1] -= dy * f
        for u, v in edge_list:  # attraction along edges: |F| = d²/k
            dx = pos[u][0] - pos[v][0]
            dy = pos[u][1] - pos[v][1]
            d = math.sqrt(dx * dx + dy * dy) or 1e-9
            f = d / k  # (d²/k) scaled by the 1/d of the unit vector
            disp[u][0] -= dx * f
            disp[u][1] -= dy * f
            disp[v][0] += dx * f
            disp[v][1] += dy * f
        cool = t * (1.0 - it / iterations)
        for nid in node_ids:
            dx, dy = disp[nid]
            d = math.sqrt(dx * dx + dy * dy) or 1e-9
            step = min(d, cool)
            pos[nid][0] = min(1.0, max(0.0, pos[nid][0] + dx / d * step))
            pos[nid][1] = min(1.0, max(0.0, pos[nid][1] + dy / d * step))
    return {nid: (p[0], p[1]) for nid, p in pos.items()}


def _svg_graph(
    node_ids: list[str],
    edge_list: list[tuple[str, str]],
    sizes: dict[str, float] | None = None,
    labels: bool = False,
    width: int = 900,
    fill: str = "grey",
) -> str:
    """Serialize one laid-out graph as an SVG document string."""
    from xml.sax.saxutils import escape

    pos = _fr_layout(node_ids, edge_list)
    pad, span = 40, width - 80
    xy = {n: (pad + p[0] * span, pad + p[1] * span) for n, p in pos.items()}
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{width}" '
        f'viewBox="0 0 {width} {width}">',
        f'<rect width="{width}" height="{width}" fill="white"/>',
    ]
    for u, v in edge_list:
        (x1, y1), (x2, y2) = xy[u], xy[v]
        parts.append(
            f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" y2="{y2:.1f}" '
            'stroke="#999" stroke-width="1"/>'
        )
    for nid in node_ids:
        x, y = xy[nid]
        r = 4.0 + (sizes or {}).get(nid, 0.0)
        parts.append(f'<circle cx="{x:.1f}" cy="{y:.1f}" r="{r:.1f}" fill="{fill}"/>')
        if labels:
            parts.append(
                f'<text x="{x + r + 2:.1f}" y="{y:.1f}" font-size="10">{escape(str(nid))}</text>'
            )
    parts.append("</svg>")
    return "\n".join(parts)


def draw_svg(render_data: dict, name: str, out_dir: str = "./outputs") -> list[str]:
    """Dependency-free twin of :func:`draw`: renders the same three
    figures (sampled graph, top-50 hubs, top-50 authorities — sized by
    score, labeled) as SVG documents using a deterministic pure-Python
    force layout.  Always available — this is the production render path
    in codec-less environments; :func:`draw` remains the matplotlib/PNG
    form for environments that have it."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    edges = [
        (str(r.src), str(r.dst))
        for r in render_data["edges_sample"].itertuples(index=False)
    ]
    node_ids = sorted({n for e in edges for n in e})
    paths = []
    path = os.path.join(out_dir, f"{name}_sampled_graph.svg")
    with open(path, "w") as f:
        f.write(_svg_graph(node_ids, edges))
    paths.append(path)
    # Reference color convention (draw_graphs.py:13,35): hubs red,
    # authorities blue.
    for kind, fill in (("top_hubs", "red"), ("top_auths", "blue")):
        pdf = render_data[kind]
        scores = dict(zip(pdf["id"].astype(str), pdf["score"]))
        sub_nodes = [n for n in node_ids if n in scores] or node_ids[:1]
        in_sub = set(sub_nodes)
        sub_edges = [(u, v) for u, v in edges if u in in_sub and v in in_sub]
        sizes = {n: 40.0 * float(scores.get(n, 0.0)) for n in sub_nodes}
        path = os.path.join(out_dir, f"{name}_{kind}.svg")
        with open(path, "w") as f:
            f.write(_svg_graph(sub_nodes, sub_edges, sizes=sizes, labels=True, fill=fill))
        paths.append(path)
    return paths


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
            "use draw_svg() (dependency-free, same three figures) or "
            "render prepare_render_data()'s plain pandas anywhere"
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
