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


def test_salted_join_rejects_right_outer(spark):
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(df, df, "k", "k", how="right")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(df, df, "k", "k", how="full_outer")
