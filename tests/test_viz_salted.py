"""salted_join equivalence + viz prep/gating."""

import pytest

from bigdata_hits_spark.operators.relops import salted_join
from bigdata_hits_spark.operators.ranking import hits
from bigdata_hits_spark.operators.graph import Graph
from bigdata_hits_spark import viz


def test_salted_join_equals_plain_join(spark):
    # one hot key (k=1 appears 200x on the left) + cold keys
    left = spark.createDataFrame(
        [(1, i) for i in range(200)] + [(2, 900), (3, 901)], "k long, lv long"
    )
    right = spark.createDataFrame([(1, "a"), (1, "b"), (3, "c")], "k long, rv string")
    plain = {
        (r["lv"], r["rv"])
        for r in left.join(right, left["k"] == right["k"]).select("lv", "rv").collect()
    }
    salted = {
        (r["lv"], r["rv"])
        for r in salted_join(left, right, "k", "k", salts=8).select("lv", "rv").collect()
    }
    assert salted == plain and len(plain) == 401


def test_viz_prepare_and_gated_draw(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)], "src string, dst string, weight double"
    )
    nodes = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y")], "id string, labels string"
    )
    g = Graph(nodes=nodes, edges=edges)
    data = viz.prepare_render_data(g, hits(g, k=2), node_fraction=1.0, edge_fraction=1.0)
    assert len(data["top_hubs"]) == 3 and "score" in data["top_hubs"].columns
    assert len(data["edges_sample"]) == 3
    try:
        import networkx  # noqa: F401
        import matplotlib  # noqa: F401
        has_libs = True
    except ImportError:
        has_libs = False
    if not has_libs:
        with pytest.raises(NotImplementedError):
            viz.draw(data, "test")
    else:
        paths = viz.draw(data, "test", out_dir="outputs_test_viz")
        # Full A14 parity: sampled graph + top hubs + top auths.
        assert len(paths) == 3


def test_draw_svg_renders_three_valid_files(spark, tmp_path):
    """draw_svg is the always-available render path: three well-formed
    SVG documents, deterministic across calls, nodes present as circles
    and top-k labels as text."""
    import xml.etree.ElementTree as ET

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0), ("c", "d", 1.0)],
        "src string, dst string, weight double",
    )
    nodes = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y")], "id string, labels string"
    )
    g = Graph(nodes=nodes, edges=edges)
    data = viz.prepare_render_data(g, hits(g, k=2), node_fraction=1.0, edge_fraction=1.0)
    paths = viz.draw_svg(data, "t", out_dir=str(tmp_path))
    assert len(paths) == 3 and all(p.endswith(".svg") for p in paths)
    ns = "{http://www.w3.org/2000/svg}"
    root = ET.parse(paths[0]).getroot()  # raises on malformed XML
    assert len(root.findall(f"{ns}circle")) == 4  # one per sampled node
    assert len(root.findall(f"{ns}line")) == 4  # one per sampled edge
    hubs_root = ET.parse(paths[1]).getroot()
    assert len(hubs_root.findall(f"{ns}text")) > 0  # top-k labeled
    # determinism: same sample renders byte-identically
    again = viz.draw_svg(data, "t2", out_dir=str(tmp_path))
    assert open(paths[0]).read() == open(again[0]).read()


def test_salted_join_rejects_right_outer(spark):
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(df, df, "k", "k", how="right")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(df, df, "k", "k", how="full_outer")
