"""Golden-parity checks against the reference's own committed data/outputs.

The reference's de-facto correctness record is its committed outputs
(SURVEY §5).  The edges CSV is absent from the checkout
(``/root/reference/.MISSING_LARGE_BLOBS``), so the iterative goldens are
not re-derivable — but everything derivable from the nodes table alone is
checked here end-to-end:

- ``read_nodes_csv`` parses the real ``data/nodes_elab.csv`` (Neo4j
  ``name:TYPE`` header convention) into the documented schema and row
  count.
- ``list_topics`` over that table reproduces the committed
  ``outputs/node_topics.txt/part-00000`` (20 labels) exactly.
- Attribute spot checks match the survey's recorded facts (first row,
  label histogram, rho range — SURVEY §1.1).
"""

from __future__ import annotations

import os

import pytest

from bigdata_hits_spark.operators.graph import Graph
from bigdata_hits_spark.operators.ranking import list_topics
from bigdata_hits_spark.sources.readers import read_nodes_csv

REF_NODES = "/root/reference/data/nodes_elab.csv"
REF_TOPICS_GOLDEN = "/root/reference/outputs/node_topics.txt/part-00000"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_NODES) and os.path.exists(REF_TOPICS_GOLDEN)),
    reason="reference checkout not present",
)


@pytest.fixture(scope="module")
def ref_nodes(spark):
    return read_nodes_csv(spark, REF_NODES).cache()


def test_read_nodes_csv_schema_and_count(ref_nodes):
    # Header `id:ID,names,size:int,labels:LABEL,rho:double` -> clean names
    # and declared types (no inferSchema pass).
    assert [(f.name, f.dataType.simpleString()) for f in ref_nodes.schema.fields] == [
        ("id", "string"),
        ("names", "string"),
        ("size", "int"),
        ("labels", "string"),
        ("rho", "double"),
    ]
    # 23,264 lines including header (SURVEY §1.1).
    assert ref_nodes.count() == 23_263


def test_list_topics_matches_committed_golden(ref_nodes):
    """list_topics on the real nodes table == the committed golden output
    (the reference's ``outputs/node_topics.txt`` — one label per line,
    RDD order arbitrary, so compared as sets)."""
    with open(REF_TOPICS_GOLDEN) as f:
        golden = {line.rstrip("\n") for line in f if line.strip()}
    assert len(golden) == 20
    g = Graph(nodes=ref_nodes, edges=ref_nodes.limit(0).selectExpr("id as src", "id as dst"))
    ours = {r["label"] for r in list_topics(g).collect()}
    assert ours == golden


def test_cli_list_topics_reproduces_golden_file(spark, tmp_path, ref_nodes):
    """End-to-end drop-in check: the CLI job the reference user would run
    (``list_topics nodes_elab.csv``) writes a single text file whose label
    set equals the committed ``outputs/node_topics.txt`` golden."""
    import glob

    from bigdata_hits_spark import cli

    out = str(tmp_path / "out")
    cli.main(["list_topics", REF_NODES, "--out", out])
    parts = glob.glob(os.path.join(out, "node_topics.txt", "part-*"))
    assert len(parts) == 1  # coalesce(1), like the reference's saveAsTextFile
    with open(parts[0]) as f:
        ours = {line.rstrip("\n") for line in f if line.strip()}
    with open(REF_TOPICS_GOLDEN) as f:
        golden = {line.rstrip("\n") for line in f if line.strip()}
    assert ours == golden


def test_node_attribute_spot_checks(ref_nodes):
    """Recorded facts from SURVEY §1.1 hold on the parsed table."""
    first = ref_nodes.limit(1).collect()[0]
    assert first["id"] == "ATF6"
    assert first["size"] == 1636
    assert first["labels"] == "gene:protein"

    from pyspark.sql import functions as F

    hist = {
        r["labels"]: r["n"]
        for r in ref_nodes.groupBy("labels").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert hist["gene:protein"] == 10_379
    assert hist["drug"] == 2_491
    assert hist["disease"] == 2_392

    lo, hi = ref_nodes.agg(F.min("rho"), F.max("rho")).collect()[0]
    assert 0.09 <= lo <= 0.11 and 0.94 <= hi <= 0.96


REF_HUB_GOLDEN = "/root/reference/outputs/base_HITS/base_hub_scores.txt/part-00000"
REF_AUTH_GOLDEN = (
    "/root/reference/outputs/base_HITS/base_authority_scores.txt/part-00000"
)


@pytest.mark.skipif(
    not (os.path.exists(REF_HUB_GOLDEN) and os.path.exists(REF_AUTH_GOLDEN)),
    reason="reference HITS goldens not present",
)
def test_committed_golden_row_counts_and_top_rows():
    """The committed base-HITS goldens record the §2.4(a) drop semantics
    as numbers: 19,456 hub rows and 20,829 auth rows out of 23,263 nodes
    (nodes with no out-edges vanish from hubs, no in-edges from auths —
    inner-join score updates).  Pin the golden files' line counts and
    SURVEY §5's recorded top row so the invariant the synthetic test
    below asserts is anchored to the reference's own record."""
    with open(REF_HUB_GOLDEN) as f:
        hub_lines = [line for line in f if line.strip()]
    with open(REF_AUTH_GOLDEN) as f:
        auth_lines = [line for line in f if line.strip()]
    assert len(hub_lines) == 19_456
    assert len(auth_lines) == 20_829
    assert hub_lines[0].startswith("('execution_phase_of_apoptosis', 0.1514249007")
    # sorted descending by score (the reference sinks sortBy(-score))
    import ast

    hub_scores = [ast.literal_eval(line)[1] for line in hub_lines[:50]]
    assert hub_scores == sorted(hub_scores, reverse=True)


def test_hits_drop_semantics_row_counts_on_synthetic_graph(spark):
    """§2.4(a) as a property: after the first iteration's inner joins,
    hubs == nodes WITH out-edges and auths == nodes WITH in-edges — the
    exact shape invariant behind the 19,456/20,829 golden counts.  The
    synthetic graph has all four node classes (both-degree, out-only,
    in-only, isolated); teleport must NOT revive dropped keys (the
    reference adds (1-beta)/N only to surviving keys), and weight==1
    weighted HITS must match base exactly."""
    from pyspark.sql import functions as F

    from bigdata_hits_spark.operators.ranking import hits

    #          both  out-only  in-only  isolated
    # a -> b, a -> c, b -> c, d -> a   (e isolated)
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")], "src string, dst string"
    )
    nodes = spark.createDataFrame(
        [(x,) for x in "abcde"], "id string"
    ).withColumn("labels", F.lit("t"))
    g = Graph(nodes=nodes, edges=edges)

    res = hits(g, k=3)
    hub_ids = {r["id"] for r in res.hubs.collect()}
    auth_ids = {r["id"] for r in res.auths.collect()}
    assert hub_ids == {"a", "b", "d"}  # distinct src set: out-edge holders
    assert auth_ids == {"a", "b", "c"}  # distinct dst set: in-edge holders

    tele = hits(g, k=3, teleport="uniform")
    assert {r["id"] for r in tele.hubs.collect()} == hub_ids  # no revival
    assert {r["id"] for r in tele.auths.collect()} == auth_ids

    weighted = hits(Graph(nodes=nodes, edges=edges.withColumn("w", F.lit(1.0))), k=3, weight="w")
    base = {(r["id"], round(r["score"], 12)) for r in res.hubs.collect()}
    wgt = {(r["id"], round(r["score"], 12)) for r in weighted.hubs.collect()}
    assert base == wgt
