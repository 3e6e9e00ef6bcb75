"""CLI shims + reference-parity sinks: end-to-end on a tiny name:TYPE CSV
graph (the reference's on-disk convention, SURVEY §1.1)."""

import ast
import glob
import math
import os

import pytest
from pyspark.sql import functions as F

from bigdata_hits_spark import cli
from bigdata_hits_spark.sinks import write_scores_text

NODES_CSV = """id:ID,names,size:int,labels:LABEL,rho:double
a,node a,3,drug,0.5
b,node b,1,drug,0.4
c,node c,2,gene:protein,0.9
"""

EDGES_CSV = """src:START_ID,dst:END_ID,mrho:double,tfidf:double
a,b,0.5,1.0
a,c,0.25,2.0
b,c,1.0,3.0
c,a,0.75,4.0
"""


@pytest.fixture(scope="module")
def csv_graph(tmp_path_factory):
    d = tmp_path_factory.mktemp("refcsv")
    nodes = d / "nodes.csv"
    edges = d / "edges.csv"
    nodes.write_text(NODES_CSV)
    edges.write_text(EDGES_CSV)
    return str(nodes), str(edges), str(d)


def _read_scores(path: str) -> list[tuple[str, float]]:
    """Parse the reference tuple-text shape back into (id, score) pairs."""
    (part,) = glob.glob(os.path.join(path, "part-*"))
    with open(part) as fh:
        return [ast.literal_eval(line) for line in fh if line.strip()]


def test_cli_base_hits_writes_reference_layout(spark, csv_graph):
    nodes, edges, d = csv_graph
    out = os.path.join(d, "out_hits")
    cli.main(["base_hits", "2", nodes, edges, "--out", out])
    hubs = _read_scores(os.path.join(out, "base_hub_scores.txt"))
    auths = _read_scores(os.path.join(out, "base_authority_scores.txt"))
    # inner-join drop semantics: only nodes with out-edges appear as hubs
    assert {h[0] for h in hubs} == {"a", "b", "c"}
    assert {a[0] for a in auths} == {"a", "b", "c"}
    # sorted descending, L2-normalized
    scores = [s for _, s in hubs]
    assert scores == sorted(scores, reverse=True)
    assert math.isclose(sum(s * s for s in scores), 1.0, rel_tol=1e-9)


def test_cli_weighted_salsa_uses_clean_weight_name(spark, csv_graph):
    nodes, edges, d = csv_graph
    out = os.path.join(d, "out_wsalsa")
    cli.main(["weighted_salsa", "mrho", nodes, edges, "--out", out])
    hubs = _read_scores(os.path.join(out, "weightedSALSA_hub_scores.txt"))
    # weighted out-degrees L1-normalized: a: 0.75, b: 1.0, c: 0.75 -> /2.5
    got = dict(hubs)
    assert math.isclose(got["b"], 1.0 / 2.5, rel_tol=1e-9)
    assert math.isclose(got["a"], 0.75 / 2.5, rel_tol=1e-9)


def test_cli_list_topics(spark, csv_graph):
    nodes, _, d = csv_graph
    out = os.path.join(d, "out_topics")
    cli.main(["list_topics", nodes, "--out", out])
    (part,) = glob.glob(os.path.join(out, "node_topics.txt", "part-*"))
    labels = {line.strip() for line in open(part) if line.strip()}
    assert labels == {"drug", "gene:protein"}  # strict labels, not split


def test_cli_clean_corpus_and_split(spark, tmp_path):
    """Pipeline subcommands: clean a corpus to parquet, split it by key."""
    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "out_pipeline")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)

    cli.main(["clean_corpus", src, "--out", out])
    cleaned = spark.read.parquet(os.path.join(out, "clean_corpus"))
    assert 0 < cleaned.count() <= 500
    assert "quality" in cleaned.columns and "n_tokens" in cleaned.columns

    cli.main(["split_corpus", src, "doc_id", "train=0.8,test=0.2", "--out", out])
    split = spark.read.parquet(os.path.join(out, "split_corpus"))
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "test"} and sum(counts.values()) == 500


def test_cli_tfidf_and_decontaminate(spark, tmp_path):
    """Curation subcommands: tf-idf weights to parquet; benchmark
    decontamination split."""
    src = str(tmp_path / "docs_src2")
    bench = str(tmp_path / "bench_src")
    out = str(tmp_path / "out_curation")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(src)
    docs.filter(F.col("doc_id") % 20 == 0).write.parquet(bench)

    cli.main(["tfidf", src, "--out", out])
    w = spark.read.parquet(os.path.join(out, "tfidf"))
    assert w.columns == ["doc_id", "term", "tfidf"]
    assert w.count() > 0

    cli.main(["decontaminate", src, bench, "3", "0.5", "--out", out])
    clean = spark.read.parquet(os.path.join(out, "decontaminated"))
    flagged = spark.read.parquet(os.path.join(out, "contaminated"))
    # benchmark docs overlap themselves 100%, so at least those are flagged
    assert flagged.count() > 0
    assert clean.count() + flagged.count() == 500
    assert flagged.agg(F.min("contaminated_frac")).first()[0] > 0.5


def test_write_scores_text_single_file_order(spark, tmp_path):
    df = spark.createDataFrame(
        [("x", 0.5), ("y", 0.3), ("z", 0.2)], "id string, score double"
    ).orderBy("score", ascending=False)
    path = str(tmp_path / "scores.txt")
    write_scores_text(df, path)
    rows = _read_scores(path)
    assert rows == [("x", 0.5), ("y", 0.3), ("z", 0.2)]


def test_cli_semantic_dedup(spark, tmp_path):
    """semantic_dedup subcommand: survivors written as parquet, count
    bounded by the input."""
    src = str(tmp_path / "docs_sd")
    emb = str(tmp_path / "emb_sd")
    out = str(tmp_path / "out_sd")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").write.parquet(emb)

    cli.main(["semantic_dedup", src, emb, "0.95", "--out", out])
    survivors = spark.read.parquet(os.path.join(out, "semantic_dedup"))
    assert 0 < survivors.count() <= 500
    assert "doc_id" in survivors.columns and "text" in survivors.columns


def test_cli_pagerank_and_graph_analytics(spark, csv_graph, tmp_path):
    """pagerank/triangles/label_propagation subcommands run end to end on
    the CSV graph and write their outputs."""
    nodes, edges, _ = csv_graph
    out = str(tmp_path / "out_graphalgs")

    cli.main(["pagerank", "3", "0.85", nodes, edges, "--out", out])
    scores = _read_scores(os.path.join(out, "pagerank_scores.txt"))
    assert len(scores) > 0
    assert abs(sum(s for _, s in scores) - 1.0) < 1e-6  # L1-normalized

    cli.main(["triangles", nodes, edges, "--out", out])
    tri = spark.read.parquet(os.path.join(out, "triangles"))
    assert tri.count() > 0 and set(tri.columns) == {"id", "triangles"}

    cli.main(["label_propagation", "3", nodes, edges, "--out", out])
    lp = spark.read.parquet(os.path.join(out, "label_propagation"))
    assert lp.count() > 0 and set(lp.columns) == {"id", "community"}


def test_cli_draw_graphs_renders_figures(spark, csv_graph, tmp_path):
    nodes, edges, _ = csv_graph
    out = str(tmp_path / "figs")
    cli.main(["draw_graphs", "2", nodes, edges, "--out", out])
    files = sorted(os.listdir(out))
    # three figures; SVG here (no matplotlib), PNG where it exists
    assert len(files) == 3
    assert {f.split(".")[-1] for f in files} <= {"svg", "png"}
    assert any("sampled_graph" in f for f in files)
    assert any("top_hubs" in f or "hub" in f for f in files)


def test_cli_pack_corpus(spark, tmp_path):
    src = str(tmp_path / "docs_pack")
    out = str(tmp_path / "out_pack")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    cli.main(["pack_corpus", src, "500", "--out", out])
    packs = spark.read.parquet(os.path.join(out, "pack_corpus"))
    assert packs.count() > 0
    assert packs.filter((F.col("total_tokens") > 500) & (F.col("n_docs") > 1)).count() == 0


def test_cli_kcore(spark, csv_graph, tmp_path):
    nodes, edges, _ = csv_graph
    out = str(tmp_path / "out_kcore")
    cli.main(["kcore", "2", nodes, edges, "--out", out])
    core = spark.read.parquet(os.path.join(out, "kcore"))
    assert set(core.columns) == {"id"}
    # every surviving node keeps degree >= 2 inside the core (definition)
    from bigdata_hits_spark.operators.graphalgs import symmetric_edges

    g = cli.read_edges_csv(spark, edges)
    sym = symmetric_edges(g)
    ids = {r["id"] for r in core.collect()}
    kept = sym.filter(F.col("a").isin(ids) & F.col("b").isin(ids))
    degs = {r["a"]: r["n"] for r in
            kept.groupBy("a").agg(F.count("*").alias("n")).collect()}
    assert all(n >= 2 for n in degs.values())
    assert set(degs) == ids or not ids


def test_cli_chunk_corpus(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(50))), (2, "tiny doc")],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "out")
    cli.main(["chunk_corpus", src, "16", "4", "--out", out])
    rows = spark.read.parquet(os.path.join(out, "chunk_corpus")).collect()
    # doc 1: ceil((50-4)/12) = 4 chunks; doc 2: 1 chunk
    assert len(rows) == 5
    assert all(r["n_tokens"] <= 16 for r in rows)


def test_cli_profile_and_mixture(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(src)
    out = str(tmp_path / "out")

    cli.main(["profile", src, "exact", "--out", out])
    prof = spark.read.parquet(os.path.join(out, "profile"))
    assert prof.count() == 5  # one row per documents column
    assert set(prof.columns) == {
        "column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    }

    cli.main(["mixture", src, "source", "doc_id", "src0=2.0,src1=0.5", "--out", out])
    mix = spark.read.parquet(os.path.join(out, "mixture"))
    srcs = {r["source"] for r in mix.select("source").distinct().collect()}
    assert srcs <= {"src0", "src1"} and "epoch" in mix.columns
    n_in = spark.read.parquet(src).filter("source = 'src0'").count()
    assert mix.filter("source = 'src0'").count() == 2 * n_in  # rate=2.0 exact


def test_cli_bfs(spark, csv_graph, tmp_path):
    nodes, edges, _ = csv_graph
    out = str(tmp_path / "out_bfs")
    cli.main(["bfs", "a", "2", nodes, edges, "--out", out])
    dist = {
        (r["id"], r["dist"])
        for r in spark.read.parquet(os.path.join(out, "bfs")).collect()
    }
    # a-b, a-c, b-c, c-a undirected: everything is within 1 hop of a
    assert dist == {("a", 0), ("b", 1), ("c", 1)}


def test_cli_resolve_and_zorder(spark, tmp_path):
    src = str(tmp_path / "vendors.parquet")
    spark.createDataFrame(
        [(1, "acme corp", 10.0), (2, "acme c0rp", 20.0), (3, "zeta llc", 30.0)],
        "id long, vendor string, x double",
    ).write.parquet(src)
    out = str(tmp_path / "out_resolve")
    cli.main(["resolve", src, "vendor", "2", "--out", out])
    got = {
        (r["name"], r["canonical"])
        for r in spark.read.parquet(os.path.join(out, "resolve")).collect()
    }
    assert got == {
        ("acme corp", "acme c0rp"),
        ("acme c0rp", "acme c0rp"),
        ("zeta llc", "zeta llc"),
    }

    zout = str(tmp_path / "out_zorder")
    cli.main(["zorder", src, "id,x", "2", "--out", zout])
    back = spark.read.parquet(os.path.join(zout, "zorder"))
    assert back.count() == 3 and set(back.columns) == {"id", "vendor", "x"}


def test_cli_skew(spark, tmp_path):
    src = str(tmp_path / "skewed.parquet")
    spark.createDataFrame(
        [("h",)] * 8 + [("a",), ("b",)], "k string"
    ).write.parquet(src)
    out = str(tmp_path / "out_skew")
    cli.main(["skew", src, "k", "2", "--out", out])
    rep = sorted(
        (r["rank"], r["key"], r["cnt"])
        for r in spark.read.parquet(os.path.join(out, "skew")).collect()
    )
    assert rep == [(1, "h", 8), (2, "a", 1)]


def test_cli_retrieve(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "delta epsilon zeta"),
            (4, "unrelated words here"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "out_retrieve")
    cli.main(["retrieve", src, "2", "100", "1,3", "--out", out])
    got = spark.read.parquet(os.path.join(out, "retrieve")).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(r["cid"])
    # doc 1's only shared-term neighbor is its twin doc 2; doc 3 shares
    # nothing with anyone, so it has no candidates at all
    assert by_q.get(1) == [2]
    assert 3 not in by_q
    assert set(by_q) <= {1}


def test_cli_diff(spark, tmp_path):
    old = str(tmp_path / "old.parquet")
    new = str(tmp_path / "new.parquet")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.parquet(old)
    spark.createDataFrame([(1, "a"), (3, "c")], "k long, v string").write.parquet(new)
    out = str(tmp_path / "out_diff")
    cli.main(["diff", old, new, "k", "--out", out])
    got = {(r["status"], r["k"]) for r in
           spark.read.parquet(os.path.join(out, "diff")).collect()}
    assert got == {("deleted", 2), ("inserted", 3)}


def test_cli_funnel_and_sample_budget(spark, tmp_path):
    events = spark.createDataFrame(
        [
            (1, 1, "view", 100), (1, 2, "click", 200),
            (2, 3, "view", 100), (2, 4, "click", 2_000_000_000),
        ],
        "user_id long, event_id long, event_type string, ts_ns long",
    )
    src = str(tmp_path / "events.parquet")
    events.write.parquet(src)
    out = str(tmp_path / "out_funnel")
    cli.main(["funnel", src, "view,click", "--out", out])
    plain = {r["user_id"]: r["n_steps"] for r in
             spark.read.parquet(os.path.join(out, "funnel")).collect()}
    assert plain == {1: 2, 2: 2}
    out2 = str(tmp_path / "out_funnel_sess")
    cli.main(["funnel", src, "view,click", "1", "--out", out2])  # 1 s gap
    sess = {r["user_id"]: r["n_steps"] for r in
            spark.read.parquet(os.path.join(out2, "funnel")).collect()}
    assert sess == {1: 2, 2: 1}  # u2's click is in a later session

    docs = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, n long"
    )
    dsrc = str(tmp_path / "docs.parquet")
    docs.write.parquet(dsrc)
    out3 = str(tmp_path / "out_budget")
    cli.main(["sample_budget", dsrc, "500", "n", "--out", out3])
    kept = spark.read.parquet(os.path.join(out3, "sample_budget"))
    assert kept.count() == 50  # 500 / 10 tokens each

    # bad numeric operand dies with a usage message, not a traceback
    with pytest.raises(SystemExit, match="usage"):
        cli.main(["funnel", src, "view,click", "1,2", "--out", out])


def test_cli_cluster(spark, tmp_path):
    src = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        [
            (0, [0.0, 0.1]),
            (1, [10.0, 10.0]),
            (2, [0.1, 0.0]),
            (3, [9.9, 10.1]),
        ],
        "vec_id long, embedding array<double>",
    ).write.parquet(src)
    out = str(tmp_path / "out_cluster")
    cli.main(["cluster", src, "2", "3", "--out", out])
    got = {
        r["vec_id"]: r["cluster"]
        for r in spark.read.parquet(os.path.join(out, "cluster")).collect()
    }
    assert got == {0: 0, 2: 0, 1: 1, 3: 1}
    with pytest.raises(SystemExit, match="usage"):
        cli.main(["cluster", src, "not_a_number", "--out", out])


def test_cli_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "frag.parquet")
    spark.range(20000).selectExpr("id", "id % 7 AS g").repartition(64).write.parquet(src)
    n_small = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_small >= 32
    out = str(tmp_path / "out_compact")
    cli.main(["compact", src, "256", "g,id", "--out", out])
    dst = os.path.join(out, "compact")
    n_big = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_big < n_small
    back = spark.read.parquet(dst)
    assert back.count() == 20000
    assert back.agg(F.sum("id")).first()[0] == sum(range(20000))


def test_compact_refuses_inplace(spark, tmp_path):
    from bigdata_hits_spark.sources.bucketed import compact_parquet

    src = str(tmp_path / "t.parquet")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="differ"):
        compact_parquet(spark, src, src)


def test_cli_maintain_rollup_and_compact_log(spark, tmp_path):
    # bootstrap a rollup from a delta, then maintain it with a second one
    d1 = str(tmp_path / "d1.parquet")
    spark.createDataFrame(
        [(1, "a", 10.0), (1, "a", 20.0), (1, "b", 5.0)], "sign int, g string, x double"
    ).write.parquet(d1)
    out1 = str(tmp_path / "r1")
    cli.main(["maintain_rollup", "-", d1, "g", "x", "--out", out1])
    r1 = {r["g"]: (r["n"], r["x"]) for r in spark.read.parquet(os.path.join(out1, "rollup")).collect()}
    assert r1 == {"a": (2, 30.0), "b": (1, 5.0)}

    d2 = str(tmp_path / "d2.parquet")
    spark.createDataFrame(
        [(-1, "a", 10.0), (-1, "b", 5.0)], "sign int, g string, x double"
    ).write.parquet(d2)
    out2 = str(tmp_path / "r2")
    cli.main(["maintain_rollup", os.path.join(out1, "rollup"), d2, "g", "x", "--out", out2])
    r2 = {r["g"]: (r["n"], r["x"]) for r in spark.read.parquet(os.path.join(out2, "rollup")).collect()}
    assert r2 == {"a": (1, 20.0)}  # b emptied out and dropped

    # compact_log: newest row per key
    log = str(tmp_path / "log.parquet")
    spark.createDataFrame(
        [("u1", 1, "old"), ("u1", 2, "new"), ("u2", 7, "only")],
        "k string, ts long, v string",
    ).write.parquet(log)
    out3 = str(tmp_path / "snap")
    cli.main(["compact_log", log, "k", "ts", "--out", out3])
    snap = {r["k"]: r["v"] for r in spark.read.parquet(os.path.join(out3, "snapshot")).collect()}
    assert snap == {"u1": "new", "u2": "only"}

    # usage errors, not tracebacks
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="usage"):
        cli.main(["maintain_rollup", "-", d1, "--out", out1])


def test_cli_checksum_psi_keywords(spark, tmp_path):
    import os

    from bigdata_hits_spark import cli

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common", f"src{i % 2}", float(i))
         for i in range(40)],
        "doc_id long, text string, source string, score double",
    )
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "out")

    cli.main(["checksum", src, "doc_id", "8", "--out", out])
    ck = spark.read.parquet(os.path.join(out, "checksum"))
    assert ck.count() <= 8 and set(ck.columns) == {
        "bucket", "n_rows", "xor_hash", "sum_hash"
    }

    cli.main(["psi", src, src, "score", "4", "--out", out])
    psi = spark.read.parquet(os.path.join(out, "psi")).collect()
    assert len(psi) == 4 and all(r["psi_term"] == 0.0 for r in psi)

    cli.main(["keywords", src, "source", "3", "--out", out])
    kw = spark.read.parquet(os.path.join(out, "keywords"))
    assert kw.count() == 6  # 3 per source


def test_cli_link_predict_and_clustering(spark, csv_graph, tmp_path):
    import os

    from bigdata_hits_spark import cli

    nodes, edges, _ = csv_graph
    out = str(tmp_path / "out")
    cli.main(["link_predict", "64", "1", nodes, edges, "--out", out])
    lp = spark.read.parquet(os.path.join(out, "link_predict"))
    assert set(lp.columns) == {"a", "b", "common_neighbors", "adamic_adar"}
    cli.main(["clustering", nodes, edges, "--out", out])
    cc = spark.read.parquet(os.path.join(out, "clustering"))
    assert set(cc.columns) == {"id", "degree", "triangles", "coeff"}
    assert cc.count() > 0


def test_cli_round8_jobs(spark, tmp_path):
    """pca / reweight / split_safe / dup_profile end to end on the tiny
    sf0.001 tables."""
    docs_src = str(tmp_path / "docs_r8")
    emb_src = str(tmp_path / "emb_r8")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(docs_src)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").write.parquet(emb_src)

    out = str(tmp_path / "out_pca")
    cli.main(["pca", emb_src, "2", "8", "project", "--out", out])
    comps = spark.read.parquet(os.path.join(out, "pca_components"))
    assert {r["component"] for r in comps.select("component").distinct().collect()} == {0, 1}
    proj = spark.read.parquet(os.path.join(out, "pca_projection"))
    assert proj.count() == spark.read.parquet(emb_src).count() * 2

    out = str(tmp_path / "out_rw")
    cli.main(["reweight", docs_src, "source", "src0=0.5,src1=0.5", "--out", out])
    plan = {r["source"]: r for r in spark.read.parquet(os.path.join(out, "reweight")).collect()}
    assert set(plan) == {"src0", "src1"}
    assert abs(sum(r["current_share"] for r in plan.values()) - 1.0) < 1e-6

    out = str(tmp_path / "out_ss")
    cli.main(["split_safe", docs_src, "train=0.8,val=0.1,test=0.1", "--out", out])
    split = spark.read.parquet(os.path.join(out, "split_safe"))
    assert split.count() == spark.read.parquet(docs_src).count()
    assert {r["split"] for r in split.select("split").distinct().collect()} <= {"train", "val", "test"}

    out = str(tmp_path / "out_dp")
    cli.main(["dup_profile", docs_src, "--out", out])
    prof = spark.read.parquet(os.path.join(out, "dup_profile"))
    assert prof.count() == spark.read.parquet(docs_src).count()
    assert {f.name for f in prof.schema.fields} == {"id", "n_shingles", "n_dup", "dup_fraction"}


def test_cli_round8_eval_jobs(spark, tmp_path):
    """smooth / bootstrap / ann_recall end to end."""
    emb_src = str(tmp_path / "emb_r8b")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").write.parquet(emb_src)

    edges = str(tmp_path / "edges_r8")
    feats = str(tmp_path / "feats_r8")
    spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    ).write.parquet(edges)
    spark.createDataFrame(
        [("a", 1.5), ("b", 2.5), ("c", 3.5)], "id string, value double"
    ).write.parquet(feats)
    out = str(tmp_path / "out_sm")
    cli.main(["smooth", edges, feats, "2", "0.5", "--out", out])
    sm = spark.read.parquet(os.path.join(out, "smooth"))
    assert sm.count() == 3 and set(sm.columns) == {"id", "value"}

    orders = str(tmp_path / "orders_r8")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").write.parquet(orders)
    out = str(tmp_path / "out_bs")
    cli.main(["bootstrap", orders, "o_orderpriority", "o_totalprice", "o_orderkey", "8", "--out", out])
    bs = spark.read.parquet(os.path.join(out, "bootstrap"))
    assert bs.count() == 5
    for r in bs.collect():
        assert r["lo_ci"] <= r["mean"] <= r["hi_ci"]

    out = str(tmp_path / "out_ar")
    cli.main(["ann_recall", emb_src, "5", "lsh", "50", "--out", out])
    ar = spark.read.parquet(os.path.join(out, "ann_recall"))
    assert ar.count() > 0
    for r in ar.collect():
        assert 0.0 <= r["recall"] <= 1.0


def test_cli_round9_jobs(spark, tmp_path):
    """toxicity / epoch_shuffle / dedup_norm / diversity / ann_recall
    ivfq+rerank end to end on the tiny tables."""
    docs_src = str(tmp_path / "docs_r9")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(docs_src)

    out = str(tmp_path / "out_tox")
    cli.main(["toxicity", docs_src, "--out", out])
    tox = spark.read.parquet(os.path.join(out, "toxicity"))
    assert tox.count() > 0 and "n_blocked" in tox.columns and "flagged" in tox.columns

    out = str(tmp_path / "out_ep")
    cli.main(["epoch_shuffle", docs_src, "doc_id", "3", "--out", out])
    ep = spark.read.parquet(os.path.join(out, "epoch_shuffle"))
    n = ep.count()
    assert sorted(r["pos"] for r in ep.select("pos").collect()) == list(range(1, n + 1))

    out = str(tmp_path / "out_dn")
    cli.main(["dedup_norm", docs_src, "--out", out])
    dn = spark.read.parquet(os.path.join(out, "dedup_norm"))
    assert dn.count() > 0 and set(dn.columns) == {"text_hash", "keep_id", "n_dups"}

    out = str(tmp_path / "out_dv")
    cli.main(["diversity", docs_src, "2", "source", "--out", out])
    dv = spark.read.parquet(os.path.join(out, "diversity"))
    assert dv.count() > 0
    for r in dv.collect():
        assert 0.0 < r["distinct_ratio"] <= 1.0

    emb_src = str(tmp_path / "emb_r9")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").write.parquet(emb_src)
    out = str(tmp_path / "out_ivfq")
    cli.main(["ann_recall", emb_src, "5", "ivfq", "50", "rerank", "--out", out])
    ar = spark.read.parquet(os.path.join(out, "ann_recall"))
    assert ar.count() > 0
    for r in ar.collect():
        assert 0.0 <= r["recall"] <= 1.0


def test_cli_winnow(spark, tmp_path):
    docs_src = str(tmp_path / "docs_wn")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(docs_src)
    out = str(tmp_path / "out_wn")
    cli.main(["winnow", docs_src, "4", "4", "--out", out])
    fp = spark.read.parquet(os.path.join(out, "winnow"))
    assert fp.count() > 0 and set(fp.columns) == {"id", "fp", "pos"}
    out = str(tmp_path / "out_wnr")
    cli.main(["winnow", docs_src, "4", "4", "report", "--out", out])
    rep = spark.read.parquet(os.path.join(out, "winnow"))
    assert set(rep.columns) == {"id", "n_fp", "n_shared", "shared_frac"}


def test_cli_winnow_pairs_and_outliers(spark, tmp_path):
    docs_src = str(tmp_path / "docs_wp")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").write.parquet(docs_src)
    out = str(tmp_path / "out_wp")
    cli.main(["winnow", docs_src, "4", "4", "pairs", "--out", out])
    pr = spark.read.parquet(os.path.join(out, "winnow"))
    assert set(pr.columns) == {"id1", "id2", "jaccard"}

    orders = str(tmp_path / "orders_r9")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").write.parquet(orders)
    out = str(tmp_path / "out_ol")
    cli.main(["outliers", orders, "o_orderpriority", "o_totalprice", "--out", out])
    ol = spark.read.parquet(os.path.join(out, "outliers"))
    assert ol.count() == 5 and "n_outliers" in ol.columns
