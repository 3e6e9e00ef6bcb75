"""Drop-in CLI mirroring the reference's 13 ``spark-submit`` jobs.

Each reference script is a standalone job with positional args (manual
arity checks — ``/root/reference/src/base_hits.py:27-33``); here they are
subcommands of one entry point with the SAME positional conventions, so a
reference user can swap ``spark-submit src/base_hits.py 8 nodes.csv
edges.csv`` for ``python -m bigdata_hits_spark.cli base_hits 8 nodes.csv
edges.csv``.

Positional conventions mirrored (file:line of the reference parser):

- ``base_hits [num_iter] [nodes edges]``            (base_hits.py:27-32)
- ``weighted_hits [num_iter] [weight_col] [nodes edges]``
                                                    (weighted_hits.py:28-35)
- ``random_teleport_hits [num_iter] [beta] [nodes edges]``
                                                    (random_teleport_hits.py:28-35)
- ``topic_specific_hits topic [num_iter] [beta] [nodes edges]``
                                                    (topic_specific_hits.py:29-38)
- ``topic_exclusive_hits topic [num_iter] [nodes edges]``
                                                    (topic_exclusive_hits.py:29-36)
- ``query_dependent_hits topic [num_iter] [nodes edges]``
                                                    (query_dependent_hits.py:29-36)
- ``base_salsa [nodes edges]``                      (base_salsa.py:22-25)
- ``base_salsa_2 [num_iter] [beta] [nodes edges]``  (base_salsa_2.py:40-47)
- ``weighted_salsa [weight_col] [nodes edges]``     (weighted_salsa.py:23-28)
- ``random_teleport_salsa [num_iter] [beta] [nodes edges]``
                                                    (random_teleport_salsa.py:37-44)
- ``topic_specific_salsa topic [num_iter] [beta] [nodes edges]``
                                                    (topic_specific_salsa.py:40-49)
- ``query_dependent_salsa topic [nodes edges]``     (query_dependent_salsa.py:22-29)
- ``list_topics [nodes]``                           (list_topics.py)

Differences from the reference, by design: output goes under ``--out DIR``
(default ``./outputs``) instead of hard-coded relative paths; the weight
column is the CLEAN name (``mrho``, not ``mrho:double`` —
weighted_hits.py:26 selects by raw header); the master is not hard-coded
(session.py).  Defaults match the reference: num_iter=8, beta=0.8.

Beyond-reference pipeline jobs (no reference twin):

- ``pagerank [num_iter [beta [nodes edges]]]`` — textbook PageRank
  scores as ``pagerank_scores.txt``.
- ``link_predict [cap [min_common [nodes edges]]]`` — Adamic-Adar
  link prediction; ``clustering nodes edges`` — local clustering
  coefficients.
- ``triangles nodes edges`` / ``label_propagation [k [nodes edges]]`` /
  ``kcore [k [nodes edges]]`` / ``bfs seed1,seed2 [depth [nodes edges]]``
  — graph analytics written as parquet.
- ``draw_graphs [num_iter [nodes edges]]`` — base HITS + the three
  reference figures (PNG when matplotlib exists, else SVG).

- ``clean_corpus docs.parquet [min_quality] [near_dup_threshold]
  [embeddings.parquet [semantic_threshold]]`` — quality floor +
  exact/near dedup (+ optional embedding-space dedup) + stat columns,
  written as parquet.
- ``skew table.parquet col1,col2 [k]`` — top-k key-skew report with
  row shares, written as parquet.
- ``resolve table.parquet name_col [max_dist]`` — canonical entity per
  distinct value via edit-distance clusters, written as parquet.
- ``zorder table.parquet col1,col2 [num_files]`` — rewrite clustered on
  a Morton curve for multi-column data skipping.
- ``compact table.parquet [target_mb] [sort_col1,col2]`` — rewrite a
  small-files directory into ~target_mb files, optionally sorted
  (clustering compaction).
- ``semantic_dedup docs.parquet embeddings.parquet [threshold]`` —
  embedding near-dup removal alone (sign-LSH candidates + exact cosine
  verify), survivors written as parquet.
- ``chunk_corpus docs.parquet max_tokens [overlap]`` — overlapping
  token-window chunking of long documents, written as parquet.
- ``pack_corpus docs.parquet max_tokens [token_col]`` — greedy sequence
  packing into token-budgeted bins, written as parquet.
- ``split_corpus docs.parquet key_col [train=0.9,test=0.1]`` —
  deterministic hash splits, written partitioned by split.
- ``profile table.parquet [exact]`` — per-column rows/nulls/distincts/
  extrema (HLL++ by default; ``exact`` opts into exact distincts).
- ``mixture docs.parquet group_col key_col name=rate[,...]`` —
  deterministic per-group mixture rates with upsampling epochs.
- ``checksum table.parquet key1[,key2...] [buckets]`` — anti-entropy
  bucket digests (count / 60-bit xor / modular sum) for replica-drift
  triage; compare two outputs to locate divergent buckets.
- ``psi ref.parquet new.parquet col [buckets]`` — Population Stability
  Index drift report on the reference's exact equi-depth edges.
- ``keywords docs.parquet [group_col] [k]`` — top-k tf-idf keywords per
  group: the per-source corpus digest.
- ``tfidf docs.parquet [id_col] [text_col]`` — per-(doc, term) tf-idf
  parquet (join onto an edge list for weighted_hits weights).
- ``decontaminate docs.parquet benchmark.parquet [n] [max_frac]`` —
  splits the corpus into decontaminated/ and contaminated/ by benchmark
  n-gram overlap.
- ``retrieve docs.parquet [k] [max_df] [qid1,qid2,...]`` — top-k
  tf-idf-cosine neighbors per document via the inverted-index posting
  join, written as parquet.
- ``diff old.parquet new.parquet key1,key2`` — dataset-versioning CDC:
  inserted/deleted/changed rows between snapshots, written as parquet.
- ``funnel events.parquet step1,step2[,...] [gap_s]`` — ordered
  conversion funnel per user; with ``gap_s``, conversion must complete
  within one gap-based session.
- ``sample_budget docs.parquet budget token_col [group_col]`` —
  deterministic token-budget cut (prefix of a fixed permutation).
- ``cluster embeddings.parquet k [iters] [id_col] [vec_col]`` —
  distributed Lloyd's k-means; (id, cluster, dist) assignments written
  as parquet.
- ``maintain_rollup rollup.parquet|- delta.parquet g1[,g2] s1[,s2]`` —
  merge a retraction-stream delta into a stored COUNT+SUM rollup
  (``-`` bootstraps an empty rollup); O(|delta| + |groups|).
- ``compact_log log.parquet key1[,key2] order1[,order2]`` — changelog
  to snapshot: newest row per key via one max_by hash-agg.
- ``pca embeddings.parquet [r] [iters] [project]`` — top-r principal
  components by deflated power iteration; ``project`` also writes each
  vector's r-D coordinates.
- ``reweight docs.parquet group_col name=share[,...] [weight_col]`` —
  per-domain rates steering the corpus to target shares (feed into
  ``mixture``).
- ``split_safe docs.parquet [name=frac,...] [threshold]`` — leakage-safe
  splits keyed on MinHash near-dup components (dup families never
  straddle a split), written partitioned by split.
- ``dup_profile docs.parquet [min_docs]`` — per-document cross-doc
  duplicated-shingle fraction (span-level duplication signal).
- ``smooth edges.parquet features.parquet [k] [alpha]`` — graph feature
  smoothing with restart (the node-feature PPR twin).
- ``bootstrap table.parquet group_col value_col key_col [B]`` —
  deterministic subsampling CIs for per-group means.
- ``ann_recall embeddings.parquet [k] [method] [qid_mod] [rerank]`` —
  recall@k of the lsh/ivf/ivfq path against exact cosine (``ivfq`` +
  ``rerank`` adds the full-precision re-rank arm).
- ``toxicity docs.parquet`` — per-document blocklist match counts by
  category (the curation screen beside PII).
- ``epoch_shuffle table.parquet key_col epoch [seed]`` — deterministic
  md5(seed|epoch|key) training order, re-derivable by any engine.
- ``dedup_norm docs.parquet`` — exact dedup over canonicalized text
  (case/punctuation/whitespace variants collapse into one family).
- ``diversity docs.parquet [n] [group_col]`` — distinct-n diversity per
  group (templated-content screen).
- ``winnow docs.parquet [k] [w] [report|pairs]`` — winnowing
  fingerprints (MOSS scheme); ``report`` writes per-doc shared-fp
  fractions, ``pairs`` near-duplicate pairs by fingerprint Jaccard.
- ``outliers table.parquet group_col value_col [z]`` — per-group robust
  outlier screen by modified z-score (median/MAD).
- ``scc edges.parquet`` — strongly connected components of a directed
  edge list (trim + FW-BW coloring; scc = min member id).
- ``vocab docs.parquet [top_n]`` — tokenizer vocabulary-coverage plan
  (top-n tokens, rank, cumulative token-mass share).
- ``bpe_train docs.parquet [merges]`` — multi-merge BPE trainer (the
  merge table a tokenizer ships).
- ``bpe_pairs docs.parquet [top_n]`` — first BPE merge iteration:
  top-n adjacent character pairs by corpus frequency.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, functions as F

from bigdata_hits_spark.operators.graph import Graph, neighborhood, topic_induced
from bigdata_hits_spark.operators.ranking import (
    RankResult,
    hits,
    list_topics,
    salsa,
    salsa_query_dependent,
    salsa_simplified,
)
from bigdata_hits_spark.session import get_spark
from bigdata_hits_spark.sinks import write_scores_text
from bigdata_hits_spark.sources.readers import read_edges_csv, read_nodes_csv

DEFAULT_ITER = 8  # base_hits.py:25
DEFAULT_BETA = 0.8  # random_teleport_hits.py:26


class _Args:
    """Positional-arg cursor with reference-style optional tails."""

    def __init__(self, argv: list[str]):
        self.argv = argv
        self.pos = 0

    def take(self, cast=str, default=None, usage: str | None = None):
        if self.pos < len(self.argv):
            try:
                value = cast(self.argv[self.pos])
            except ValueError:
                # e.g. `retrieve docs.parquet 1,3` — qids given where the
                # optional int positionals were expected; a usage message
                # beats an int() traceback.
                want = getattr(cast, "__name__", str(cast))
                msg = f"bad operand {self.argv[self.pos]!r} (expected {want})"
                raise SystemExit(f"{msg}\nusage: {usage}" if usage else msg)
            self.pos += 1
            return value
        return default

    def take_paths(self) -> tuple[str | None, str | None]:
        """Trailing ``[nodes edges]`` pair; both or neither
        (mirrors the reference's arity checks, base_hits.py:32)."""
        remaining = len(self.argv) - self.pos
        if remaining >= 2:
            return self.argv[self.pos], self.argv[self.pos + 1]
        if remaining == 1:
            raise SystemExit("nodes and edges paths must be given together")
        return None, None


def _load_graph(spark, nodes_path: str | None, edges_path: str | None) -> Graph:
    if nodes_path is None or edges_path is None:
        raise SystemExit("this job needs nodes and edges CSV paths")
    return Graph(nodes=read_nodes_csv(spark, nodes_path), edges=read_edges_csv(spark, edges_path))


def _save(result: RankResult, out_dir: str, prefix: str) -> None:
    """Two sorted score files, named like the reference's outputs
    (``<prefix>_hub_scores.txt`` / ``<prefix>_authority_scores.txt``)."""
    write_scores_text(result.hubs, os.path.join(out_dir, f"{prefix}_hub_scores.txt"))
    write_scores_text(result.auths, os.path.join(out_dir, f"{prefix}_authority_scores.txt"))


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    out_dir = "./outputs"
    if "--out" in argv:
        i = argv.index("--out")
        out_dir = argv[i + 1]
        del argv[i : i + 2]
    if not argv:
        raise SystemExit(__doc__)
    job, args = argv[0], _Args(argv[1:])

    spark = get_spark(f"bigdata-hits-spark-{job}")

    if job == "base_hits":
        k = args.take(int, DEFAULT_ITER)
        g = _load_graph(spark, *args.take_paths())
        _save(hits(g, k=k), out_dir, "base")
    elif job == "weighted_hits":
        k = args.take(int, DEFAULT_ITER)
        weight = args.take(str, "mrho")
        g = _load_graph(spark, *args.take_paths())
        _save(hits(g, k=k, weight=weight), out_dir, "weighted")
    elif job == "random_teleport_hits":
        k = args.take(int, DEFAULT_ITER)
        beta = args.take(float, DEFAULT_BETA)
        g = _load_graph(spark, *args.take_paths())
        _save(hits(g, k=k, teleport="uniform", beta=beta), out_dir, "teleport")
    elif job == "topic_specific_hits":
        topic = args.take()
        k = args.take(int, DEFAULT_ITER)
        beta = args.take(float, DEFAULT_BETA)
        g = _load_graph(spark, *args.take_paths())
        _save(
            hits(g, k=k, teleport="topic", beta=beta, topic=topic),
            out_dir,
            f"{topic}_specific",
        )
    elif job == "topic_exclusive_hits":
        topic = args.take()
        k = args.take(int, DEFAULT_ITER)
        g = _load_graph(spark, *args.take_paths())
        _save(hits(topic_induced(g, topic), k=k), out_dir, f"{topic}_exclusive")
    elif job == "query_dependent_hits":
        topic = args.take()
        k = args.take(int, DEFAULT_ITER)
        g = _load_graph(spark, *args.take_paths())
        _save(hits(neighborhood(g, topic), k=k), out_dir, f"{topic}_dependent")
    elif job == "base_salsa":
        g = _load_graph(spark, *args.take_paths())
        _save(salsa_simplified(g), out_dir, "baseSALSA")
    elif job == "base_salsa_2":
        k = args.take(int, DEFAULT_ITER)
        args.take(float, DEFAULT_BETA)  # parsed-but-unused, like the reference (SURVEY §2.4(g))
        g = _load_graph(spark, *args.take_paths())
        _save(salsa(g, k=k), out_dir, "SALSA2")
    elif job == "weighted_salsa":
        weight = args.take(str, "mrho")
        g = _load_graph(spark, *args.take_paths())
        _save(salsa_simplified(g, weight=weight), out_dir, "weightedSALSA")
    elif job == "random_teleport_salsa":
        k = args.take(int, DEFAULT_ITER)
        beta = args.take(float, DEFAULT_BETA)
        g = _load_graph(spark, *args.take_paths())
        _save(salsa(g, k=k, teleport="uniform", beta=beta), out_dir, "teleportSALSA")
    elif job == "topic_specific_salsa":
        topic = args.take()
        k = args.take(int, DEFAULT_ITER)
        beta = args.take(float, DEFAULT_BETA)
        g = _load_graph(spark, *args.take_paths())
        _save(
            salsa(g, k=k, teleport="topic", beta=beta, topic=topic),
            out_dir,
            f"{topic}_specificSALSA",
        )
    elif job == "query_dependent_salsa":
        topic = args.take()
        g = _load_graph(spark, *args.take_paths())
        _save(salsa_query_dependent(g, topic), out_dir, f"{topic}_dependentSALSA")
    elif job == "list_topics":
        nodes_path = args.take()
        if nodes_path is None:
            raise SystemExit("list_topics needs a nodes CSV path")
        g = Graph(nodes=read_nodes_csv(spark, nodes_path), edges=None)
        labels: DataFrame = list_topics(g)
        labels.coalesce(1).write.mode("overwrite").text(
            os.path.join(out_dir, "node_topics.txt")
        )
    # --- beyond-reference pipeline jobs (no reference twin) ------------
    elif job == "pagerank":
        # pagerank [num_iter [beta [nodes edges]]] — textbook semantics
        # (full node set, L1 renormalized), scores written like the
        # ranking jobs but as a single vector.
        from bigdata_hits_spark.operators.ranking import pagerank

        k = args.take(int, DEFAULT_ITER)
        beta = args.take(float, 0.85)
        g = _load_graph(spark, *args.take_paths())
        write_scores_text(
            pagerank(g, k=k, beta=beta), os.path.join(out_dir, "pagerank_scores.txt")
        )
    elif job == "triangles":
        # triangles <nodes> <edges> — per-node undirected triangle counts
        from bigdata_hits_spark.operators.graphalgs import triangle_counts

        g = _load_graph(spark, *args.take_paths())
        triangle_counts(g.edges).write.mode("overwrite").parquet(
            os.path.join(out_dir, "triangles")
        )
    elif job == "link_predict":
        # link_predict [cap [min_common [nodes edges]]] — Adamic-Adar
        # candidate non-edges with the pivot-degree cap as semantics
        from bigdata_hits_spark.operators.graphalgs import link_prediction

        cap = args.take(int, 64, usage="link_predict [cap [min_common [nodes edges]]]")
        min_common = args.take(int, 2, usage="link_predict [cap [min_common [nodes edges]]]")
        g = _load_graph(spark, *args.take_paths())
        link_prediction(
            g.edges, max_pivot_degree=cap, min_common=min_common
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "link_predict"))
    elif job == "clustering":
        # clustering <nodes> <edges> — per-node local clustering coeff
        from bigdata_hits_spark.operators.graphalgs import clustering_coefficient

        g = _load_graph(spark, *args.take_paths())
        clustering_coefficient(g.edges).write.mode("overwrite").parquet(
            os.path.join(out_dir, "clustering")
        )
    elif job == "label_propagation":
        # label_propagation [k [nodes edges]] — deterministic communities
        from bigdata_hits_spark.operators.graphalgs import label_propagation

        k = args.take(int, 5)
        g = _load_graph(spark, *args.take_paths())
        label_propagation(g.edges, k=k).write.mode("overwrite").parquet(
            os.path.join(out_dir, "label_propagation")
        )
    elif job == "kcore":
        # kcore [k [nodes edges]] — node ids of the k-core (iterative
        # peeling with the escalating-batch fixpoint loop)
        from bigdata_hits_spark.operators.graphalgs import k_core

        k = args.take(int, 2)
        g = _load_graph(spark, *args.take_paths())
        k_core(g.edges, k).write.mode("overwrite").parquet(
            os.path.join(out_dir, "kcore")
        )
    elif job == "bfs":
        # bfs <seed_ids_comma_separated> [max_depth [nodes edges]] —
        # minimum hop distance from the nearest seed (undirected)
        from bigdata_hits_spark.operators.graphalgs import bfs_distances

        seeds_arg = args.take()
        if seeds_arg is None:
            raise SystemExit("bfs needs comma-separated seed node ids")
        depth = args.take(int, 3)
        g = _load_graph(spark, *args.take_paths())
        seeds = spark.createDataFrame(
            [(s,) for s in seeds_arg.split(",")], ["id"]
        )
        bfs_distances(g.edges, seeds, depth).write.mode("overwrite").parquet(
            os.path.join(out_dir, "bfs")
        )
    elif job == "draw_graphs":
        # draw_graphs [num_iter [nodes edges]] — run base HITS and render
        # the three reference figures (sampled graph, top hubs red, top
        # authorities blue — draw_graphs.py:13,35).  PNG via matplotlib
        # when available, else the dependency-free SVG path.
        from bigdata_hits_spark import viz

        k = args.take(int, DEFAULT_ITER)
        g = _load_graph(spark, *args.take_paths())
        data = viz.prepare_render_data(g, hits(g, k=k))
        try:
            paths = viz.draw(data, "base", out_dir=out_dir)
        except NotImplementedError:
            paths = viz.draw_svg(data, "base", out_dir=out_dir)
        print("\n".join(paths))
    elif job == "clean_corpus":
        # clean_corpus <docs.parquet> [min_quality] [near_dup_threshold]
        from bigdata_hits_spark.operators.pipeline import clean_corpus

        docs_path = args.take()
        if docs_path is None:
            raise SystemExit("clean_corpus needs a documents parquet path")
        min_q = args.take(float, 0.4)
        near_t = args.take(float, 0.5)
        emb_path = args.take()
        sem_t = args.take(float, 0.95)
        vectors = spark.read.parquet(emb_path) if emb_path else None
        cleaned, stats = clean_corpus(
            spark.read.parquet(docs_path),
            min_q,
            near_t,
            with_stats=True,
            vectors=vectors,
            semantic_threshold=sem_t,
        )
        cleaned.write.mode("overwrite").parquet(os.path.join(out_dir, "clean_corpus"))
        lex = f" lexical={stats.n_lexical}" if stats.n_lexical is not None else ""
        print(
            f"clean_corpus: raw={stats.n_raw} quality={stats.n_quality} "
            f"exact={stats.n_exact}{lex} final={stats.n_final}"
        )
    elif job == "pack_corpus":
        # pack_corpus <docs.parquet> <max_tokens> [token_col]
        # token_col defaults to a whitespace token count computed on the fly.
        from bigdata_hits_spark.operators.sampling import pack_documents

        docs_path = args.take()
        max_tokens = args.take(int)
        if docs_path is None or max_tokens is None:
            raise SystemExit("pack_corpus needs a docs parquet path and max_tokens")
        token_col = args.take()
        docs = spark.read.parquet(docs_path)
        if token_col is None:
            token_col = "__n_tok"
            docs = docs.withColumn(token_col, F.size(F.split(F.col("text"), " ")))
        packs = pack_documents(docs, max_tokens, token_col)
        packs.write.mode("overwrite").parquet(os.path.join(out_dir, "pack_corpus"))
        print(f"pack_corpus: packs={packs.count()}")
    elif job == "chunk_corpus":
        # chunk_corpus <docs.parquet> <max_tokens> [overlap] — split long
        # documents into overlapping token windows (feed into pack_corpus).
        from bigdata_hits_spark.operators.sampling import chunk_documents

        docs_path = args.take()
        max_tokens = args.take(int)
        if docs_path is None or max_tokens is None:
            raise SystemExit("chunk_corpus needs a docs parquet path and max_tokens")
        overlap = args.take(int, 0)
        chunk_documents(spark.read.parquet(docs_path), max_tokens, overlap).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "chunk_corpus"))
    elif job == "skew":
        # skew <table.parquet> <col1,col2[,...]> [k] — top-k key skew
        # report with row shares (run before choosing a shuffle strategy)
        from bigdata_hits_spark.operators.profiling import skew_report

        path = args.take()
        cols_arg = args.take()
        if path is None or cols_arg is None:
            raise SystemExit("skew needs a parquet path and comma-separated columns")
        k = args.take(int, 20)
        skew_report(spark.read.parquet(path), cols_arg.split(","), k=k).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "skew"))
    elif job == "resolve":
        # resolve <table.parquet> <name_col> [max_dist] — canonical form
        # per distinct value via edit-distance clusters
        from bigdata_hits_spark.operators.pipeline import resolve_entities

        path = args.take()
        name_col = args.take()
        if path is None or name_col is None:
            raise SystemExit("resolve needs a parquet path and a name column")
        max_dist = args.take(int, 2)
        resolve_entities(spark.read.parquet(path), name_col, max_dist=max_dist).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "resolve"))
    elif job == "zorder":
        # zorder <table.parquet> <col1,col2[,...]> [num_files] — rewrite
        # clustered on a Morton curve for multi-column data skipping
        from bigdata_hits_spark.sources.bucketed import write_zordered

        path = args.take()
        cols_arg = args.take()
        if path is None or cols_arg is None:
            raise SystemExit("zorder needs a parquet path and comma-separated columns")
        num_files = args.take(int, 32)
        write_zordered(
            spark.read.parquet(path),
            os.path.join(out_dir, "zorder"),
            cols_arg.split(","),
            num_files=num_files,
        )
    elif job == "compact":
        # compact <table.parquet> [target_mb] [sort_col1,col2] — rewrite
        # a small-files directory into ~target_mb files (optionally
        # sorted/clustered); writes to <out>/compact
        from bigdata_hits_spark.sources.bucketed import compact_parquet

        path = args.take()
        usage = "compact <table.parquet> [target_mb] [sort_col1,col2]"
        if path is None:
            raise SystemExit(usage)
        target_mb = args.take(int, 256, usage=usage)
        sort_arg = args.take()
        compact_parquet(
            spark,
            path,
            os.path.join(out_dir, "compact"),
            target_mb=target_mb,
            sort_by=sort_arg.split(",") if sort_arg else None,
        )
    elif job == "semantic_dedup":
        # semantic_dedup <docs.parquet> <embeddings.parquet> [threshold]
        from bigdata_hits_spark.operators.similarity import semantic_dedup

        docs_path = args.take()
        emb_path = args.take()
        if docs_path is None or emb_path is None:
            raise SystemExit("semantic_dedup needs docs and embeddings parquet paths")
        threshold = args.take(float, 0.95)
        survivors = semantic_dedup(
            spark.read.parquet(docs_path), spark.read.parquet(emb_path), threshold
        )
        survivors.write.mode("overwrite").parquet(os.path.join(out_dir, "semantic_dedup"))
        print(f"semantic_dedup: survivors={survivors.count()}")
    elif job == "diff":
        # diff <old.parquet> <new.parquet> <key1,key2[,...]> — dataset-
        # versioning CDC: inserted/deleted/changed rows between snapshots
        from bigdata_hits_spark.operators.relops import snapshot_diff

        old_path = args.take()
        new_path = args.take()
        keys_arg = args.take()
        if old_path is None or new_path is None or keys_arg is None:
            raise SystemExit("diff needs old and new parquet paths and key columns")
        out = snapshot_diff(
            spark.read.parquet(old_path),
            spark.read.parquet(new_path),
            keys_arg.split(","),
        )
        out.write.mode("overwrite").parquet(os.path.join(out_dir, "diff"))
    elif job == "maintain_rollup":
        # maintain_rollup <rollup.parquet|-> <delta.parquet> <g1[,g2]> <s1[,s2]>
        # — merge a retraction-stream delta (sign column, snapshot_delta
        # shape) into a stored COUNT+SUM rollup; '-' bootstraps an empty
        # rollup from the delta's schema.  O(|delta| + |groups|).
        # (F comes from the module import — a local import here would
        # shadow it for EVERY branch of this function.)
        from bigdata_hits_spark.operators.relops import apply_delta_rollup

        usage = "maintain_rollup <rollup.parquet|-> <delta.parquet> <g1[,g2]> <s1[,s2]>"
        rollup_path = args.take(usage=usage)
        delta_path = args.take(usage=usage)
        groups_arg = args.take(usage=usage)
        sums_arg = args.take(usage=usage)
        if None in (rollup_path, delta_path, groups_arg, sums_arg):
            raise SystemExit(f"usage: {usage}")
        group_cols = groups_arg.split(",")
        sum_cols = sums_arg.split(",")
        delta = spark.read.parquet(delta_path)
        if rollup_path == "-":
            old = (
                delta.filter(F.lit(False))
                .groupBy(*group_cols)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[F.sum(c).alias(c) for c in sum_cols],
                )
            )
        else:
            old = spark.read.parquet(rollup_path)
        out = apply_delta_rollup(old, delta, group_cols, sum_cols)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, "rollup"))
    elif job == "compact_log":
        # compact_log <log.parquet> <key1[,key2]> <order1[,order2]> —
        # changelog -> snapshot: newest row per key (one max_by hash-agg)
        from bigdata_hits_spark.operators.relops import latest_by_key

        usage = "compact_log <log.parquet> <key1[,key2]> <order1[,order2]>"
        log_path = args.take(usage=usage)
        keys_arg = args.take(usage=usage)
        order_arg = args.take(usage=usage)
        if None in (log_path, keys_arg, order_arg):
            raise SystemExit(f"usage: {usage}")
        out = latest_by_key(
            spark.read.parquet(log_path), keys_arg.split(","), order_arg.split(",")
        )
        out.write.mode("overwrite").parquet(os.path.join(out_dir, "snapshot"))
    elif job == "funnel":
        # funnel <events.parquet> <step1,step2[,...]> [gap_s] — ordered
        # conversion funnel over (user_id, event_type, ts_ns[, event_id])
        # rows; with gap_s the funnel must complete within one gap-based
        # session (events.py funnel_steps_sessioned; needs event_id for
        # the deterministic in-session order)
        from bigdata_hits_spark.operators.events import (
            funnel_steps,
            funnel_steps_sessioned,
        )

        events_path = args.take()
        steps_arg = args.take()
        if events_path is None or steps_arg is None:
            raise SystemExit("funnel needs an events parquet path and a step list")
        usage = "funnel <events.parquet> <step1,step2[,...]> [gap_s]"
        gap_s = args.take(int, None, usage=usage)
        events = spark.read.parquet(events_path)
        steps = steps_arg.split(",")
        if gap_s is None:
            out = funnel_steps(events, steps)
        else:
            out = funnel_steps_sessioned(events, steps, gap_ns=gap_s * 1_000_000_000)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, "funnel"))
    elif job == "sample_budget":
        # sample_budget <docs.parquet> <budget> <token_col> [group_col] —
        # deterministic prefix-of-permutation cut whose token sum stays
        # within budget (globally, or per group_col value)
        from bigdata_hits_spark.operators.sampling import sample_to_token_budget

        docs_path = args.take()
        usage = "sample_budget <docs.parquet> <budget> <token_col> [group_col]"
        budget = args.take(int, None, usage=usage)
        token_col = args.take()
        if docs_path is None or budget is None or token_col is None:
            raise SystemExit(usage)
        group_col = args.take()
        out = sample_to_token_budget(
            spark.read.parquet(docs_path), budget, token_col, group_col=group_col
        )
        out.write.mode("overwrite").parquet(os.path.join(out_dir, "sample_budget"))
    elif job == "retrieve":
        # retrieve <docs.parquet> [k] [max_df] [qid1,qid2,...] — top-k
        # tf-idf-cosine neighbors per document via the inverted-index
        # posting join (lexical retrieval / near-dup triage)
        from bigdata_hits_spark.operators.similarity import sparse_cosine_topk
        from bigdata_hits_spark.operators.textstats import tfidf

        docs_path = args.take()
        if docs_path is None:
            raise SystemExit("retrieve needs a docs parquet path")
        usage = "retrieve <docs.parquet> [k] [max_df] [qid1,qid2,...]"
        k = args.take(int, 10, usage=usage)
        max_df = args.take(int, 1000, usage=usage)
        qids_arg = args.take()
        docs = spark.read.parquet(docs_path)
        queries_df = None
        if qids_arg:
            queries_df = spark.createDataFrame(
                [(int(q),) for q in qids_arg.split(",")], "doc_id long"
            )
        sparse_cosine_topk(
            tfidf(docs), queries_df, k=k, max_df=max_df
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "retrieve"))
    elif job == "cluster":
        # cluster <embeddings.parquet> <k> [iters] [id_col] [vec_col] —
        # distributed Lloyd's k-means (operators/clustering.py): the
        # IVF-centroid-training / corpus-partitioning step.
        from bigdata_hits_spark.operators.clustering import kmeans

        src = args.take()
        usage = "cluster <embeddings.parquet> <k> [iters] [id_col] [vec_col]"
        k = args.take(int, None, usage=usage)
        if src is None or k is None:
            raise SystemExit(usage)
        iters = args.take(int, 3, usage=usage)
        id_col = args.take(str, "vec_id")
        vec_col = args.take(str, "embedding")
        res = kmeans(
            spark.read.parquet(src), k, id_col=id_col, vec_col=vec_col, iters=iters
        )
        res.assignments.write.mode("overwrite").parquet(
            os.path.join(out_dir, "cluster")
        )
    elif job == "split_corpus":
        # split_corpus <docs.parquet> <key_col> [name=frac,name=frac,...]
        from bigdata_hits_spark.operators.sampling import deterministic_split

        docs_path = args.take()
        key_col = args.take()
        if docs_path is None or key_col is None:
            raise SystemExit("split_corpus needs a parquet path and a key column")
        spec = args.take(str, "train=0.9,test=0.1")
        weights = {
            name: float(frac)
            for name, frac in (part.split("=") for part in spec.split(","))
        }
        out = deterministic_split(spark.read.parquet(docs_path), key_col, weights)
        # One directory per split: partition pruning makes reading a split
        # free of the others.
        out.write.mode("overwrite").partitionBy("split").parquet(
            os.path.join(out_dir, "split_corpus")
        )
    elif job == "profile":
        # profile <table.parquet> [exact] — per-column rows/nulls/
        # distincts/extrema; 'exact' switches HLL++ to exact distincts.
        from bigdata_hits_spark.operators.profiling import profile_table

        src = args.take()
        if src is None:
            raise SystemExit("profile needs a parquet path")
        exact = args.take(str, "") == "exact"
        profile_table(spark.read.parquet(src), exact_distinct=exact).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "profile"))
    elif job == "mixture":
        # mixture <docs.parquet> <group_col> <key_col> <name=rate,...>
        # e.g. mixture docs.parquet source doc_id wiki=2.5,crawl=0.1
        from bigdata_hits_spark.operators.sampling import mixture_sample

        src = args.take()
        group_col = args.take()
        key_col = args.take()
        spec = args.take()
        if None in (src, group_col, key_col, spec):
            raise SystemExit("mixture needs docs.parquet group_col key_col name=rate[,...]")
        rates = {name: float(r) for name, r in (p.split("=") for p in spec.split(","))}
        mixture_sample(spark.read.parquet(src), group_col, rates, key_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "mixture"))
    elif job == "tfidf":
        # tfidf <docs.parquet> [id_col] [text_col]
        from bigdata_hits_spark.operators.textstats import tfidf

        docs_path = args.take()
        if docs_path is None:
            raise SystemExit("tfidf needs a documents parquet path")
        id_col = args.take(str, "doc_id")
        text_col = args.take(str, "text")
        tfidf(spark.read.parquet(docs_path), id_col, text_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "tfidf"))
    elif job == "decontaminate":
        # decontaminate <docs.parquet> <benchmark.parquet> [n] [max_frac]
        # Writes docs whose benchmark n-gram overlap fraction is <= max_frac
        # (clean set) plus a report of the flagged ones.
        from bigdata_hits_spark.operators.textstats import CONTAMINATION_N, ngram_overlap

        docs_path = args.take()
        bench_path = args.take()
        if docs_path is None or bench_path is None:
            raise SystemExit("decontaminate needs docs and benchmark parquet paths")
        n = args.take(int, CONTAMINATION_N)
        max_frac = args.take(float, 0.0)
        docs = spark.read.parquet(docs_path)
        flagged = ngram_overlap(docs, spark.read.parquet(bench_path), n=n).filter(
            F.col("contaminated_frac") > max_frac
        )
        clean = docs.join(flagged.select("doc_id"), "doc_id", "left_anti")
        flagged.write.mode("overwrite").parquet(os.path.join(out_dir, "contaminated"))
        clean.write.mode("overwrite").parquet(os.path.join(out_dir, "decontaminated"))
        print(f"decontaminate: kept={clean.count()} flagged={flagged.count()}")
    elif job == "checksum":
        # checksum <table.parquet> <key1[,key2...]> [buckets] — anti-
        # entropy bucket digests; compare two runs' outputs to locate
        # replica drift without shipping rows.
        from bigdata_hits_spark.operators.relops import table_checksum

        src = args.take()
        keys_arg = args.take()
        if src is None or keys_arg is None:
            raise SystemExit("checksum needs a parquet path and key columns")
        buckets = args.take(int, 64, usage="checksum <table.parquet> <keys> [buckets]")
        table_checksum(
            spark.read.parquet(src), keys_arg.split(","), buckets=buckets
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "checksum"))
    elif job == "psi":
        # psi <ref.parquet> <new.parquet> <col> [buckets] — population
        # stability drift report on the reference's equi-depth edges.
        from bigdata_hits_spark.operators.profiling import psi_report

        ref_path = args.take()
        new_path = args.take()
        col = args.take()
        if None in (ref_path, new_path, col):
            raise SystemExit("psi needs ref and new parquet paths and a column")
        buckets = args.take(int, 8, usage="psi <ref> <new> <col> [buckets]")
        psi_report(
            spark.read.parquet(ref_path), spark.read.parquet(new_path), col, buckets
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "psi"))
    elif job == "keywords":
        # keywords <docs.parquet> [group_col] [k] — top-k tf-idf terms
        # per group (source by default): the corpus-mix digest.
        from bigdata_hits_spark.operators.textstats import keywords_per_group

        docs_path = args.take()
        if docs_path is None:
            raise SystemExit("keywords needs a documents parquet path")
        group_col = args.take(str, "source")
        k = args.take(int, 10, usage="keywords <docs.parquet> [group_col] [k]")
        keywords_per_group(
            spark.read.parquet(docs_path), group_col=group_col, k=k
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "keywords"))
    elif job == "pca":
        # pca <embeddings.parquet> [r] [iters] [project] — top-r principal
        # components by distributed power iteration with deflation
        # (operators/profiling.py); 'project' also writes every vector's
        # r-D subspace coordinates.
        from bigdata_hits_spark.operators.profiling import (
            pca_components,
            pca_project_components,
        )

        src = args.take()
        if src is None:
            raise SystemExit("pca needs an embeddings parquet path")
        r = args.take(int, 2, usage="pca <embeddings.parquet> [r] [iters] [project]")
        iters = args.take(int, 15)
        project = args.take(str, "") == "project"
        emb = spark.read.parquet(src)
        pca_components(emb, r=r, iters=iters).write.mode("overwrite").parquet(
            os.path.join(out_dir, "pca_components")
        )
        if project:
            pca_project_components(emb, r=r, iters=iters).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, "pca_projection"))
    elif job == "reweight":
        # reweight <docs.parquet> <group_col> <name=share,...> [weight_col]
        # — the per-domain rates that steer the corpus to target shares;
        # feed the output's rate column to `mixture`.
        from bigdata_hits_spark.operators.sampling import domain_reweight_plan

        src = args.take()
        group_col = args.take()
        spec = args.take()
        if None in (src, group_col, spec):
            raise SystemExit(
                "reweight needs docs.parquet group_col name=share[,...] [weight_col]"
            )
        targets = {name: float(s) for name, s in (p.split("=") for p in spec.split(","))}
        weight_col = args.take(str, None)
        domain_reweight_plan(
            spark.read.parquet(src), group_col, targets, weight_col=weight_col
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "reweight"))
    elif job == "split_safe":
        # split_safe <docs.parquet> [name=frac,...] [threshold] — leakage-
        # safe train/val/test: MinHash near-dup components keyed so dup
        # families never straddle a split; written partitioned by split.
        from bigdata_hits_spark.operators.components import connected_components
        from bigdata_hits_spark.operators.dedup import minhash_near_duplicates
        from bigdata_hits_spark.operators.sampling import leakage_safe_split

        docs_path = args.take()
        if docs_path is None:
            raise SystemExit("split_safe needs a documents parquet path")
        spec = args.take(str, "train=0.8,val=0.1,test=0.1")
        threshold = args.take(float, 0.2)
        weights = {
            name: float(frac)
            for name, frac in (part.split("=") for part in spec.split(","))
        }
        docs = spark.read.parquet(docs_path)
        comps = connected_components(minhash_near_duplicates(docs, threshold=threshold))
        leakage_safe_split(docs, comps, weights).write.mode("overwrite").partitionBy(
            "split"
        ).parquet(os.path.join(out_dir, "split_safe"))
    elif job == "smooth":
        # smooth <edges.parquet> <features.parquet> [k] [alpha] — graph
        # feature smoothing with restart over (src, dst) edges and
        # (id, value) features.
        from bigdata_hits_spark.operators.graphalgs import feature_propagation

        edges_path = args.take()
        feats_path = args.take()
        if edges_path is None or feats_path is None:
            raise SystemExit("smooth needs edges and features parquet paths")
        k = args.take(int, 3, usage="smooth <edges> <features> [k] [alpha]")
        alpha = args.take(float, 0.5)
        feature_propagation(
            spark.read.parquet(edges_path), spark.read.parquet(feats_path), k=k, alpha=alpha
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "smooth"))
    elif job == "bootstrap":
        # bootstrap <table.parquet> <group_col> <value_col> <key_col> [B]
        from bigdata_hits_spark.operators.profiling import bootstrap_mean_ci

        src = args.take()
        group_col = args.take()
        value_col = args.take()
        key_col = args.take()
        if None in (src, group_col, value_col, key_col):
            raise SystemExit("bootstrap needs table.parquet group_col value_col key_col [B]")
        B = args.take(int, 32, usage="bootstrap <table> <group> <value> <key> [B]")
        bootstrap_mean_ci(
            spark.read.parquet(src), group_col, value_col, key_col, B=B
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "bootstrap"))
    elif job == "ann_recall":
        # ann_recall <embeddings.parquet> [k] [method] [qid_mod] — recall@k
        # of the lsh/ivf path vs exact cosine for every qid_mod-th vector.
        from bigdata_hits_spark.operators.similarity import ann_recall_report

        src = args.take()
        if src is None:
            raise SystemExit("ann_recall needs an embeddings parquet path")
        k = args.take(int, 10, usage="ann_recall <embeddings> [k] [method] [qid_mod] [rerank]")
        method = args.take(str, "lsh")
        qid_mod = args.take(int, 100)
        rerank = args.take(str, "") == "rerank"
        emb = spark.read.parquet(src)
        queries = emb.filter(F.col("vec_id") % qid_mod == 0)
        kwargs = {"rerank": True} if (method == "ivfq" and rerank) else {}
        ann_recall_report(emb, queries, k=k, method=method, **kwargs).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "ann_recall"))
    elif job == "dup_profile":
        # dup_profile <docs.parquet> [min_docs] — per-document cross-doc
        # duplicated-shingle fraction (span-level duplication signal).
        from bigdata_hits_spark.operators.dedup import duplicated_ngram_profile

        docs_path = args.take()
        if docs_path is None:
            raise SystemExit("dup_profile needs a documents parquet path")
        min_docs = args.take(int, 2, usage="dup_profile <docs.parquet> [min_docs]")
        duplicated_ngram_profile(
            spark.read.parquet(docs_path), min_docs=min_docs
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "dup_profile"))
    elif job == "toxicity":
        # toxicity <docs.parquet> — per-document blocklist match counts by
        # category (swap in your own taxonomy via the library API).
        from bigdata_hits_spark.operators.textstats import toxicity_screen

        docs_path = args.take()
        if docs_path is None:
            raise SystemExit("toxicity needs a documents parquet path")
        toxicity_screen(spark.read.parquet(docs_path)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "toxicity"))
    elif job == "epoch_shuffle":
        # epoch_shuffle <table.parquet> <key_col> <epoch> [seed] — the
        # deterministic md5(seed|epoch|key) training order, re-derivable
        # by any engine with md5.
        from bigdata_hits_spark.operators.sampling import epoch_shuffle

        src = args.take()
        key_col = args.take()
        epoch = args.take(int, None, usage="epoch_shuffle <table> <key_col> <epoch> [seed]")
        if None in (src, key_col, epoch):
            raise SystemExit("epoch_shuffle needs table.parquet key_col epoch [seed]")
        seed = args.take(int, 0)
        epoch_shuffle(spark.read.parquet(src), key_col, epoch, seed=seed).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "epoch_shuffle"))
    elif job == "dedup_norm":
        # dedup_norm <docs.parquet> — exact dedup over canonicalized text
        # (case/punctuation/whitespace variants collapse).
        from bigdata_hits_spark.operators.dedup import exact_duplicates_normalized

        docs_path = args.take()
        if docs_path is None:
            raise SystemExit("dedup_norm needs a documents parquet path")
        exact_duplicates_normalized(spark.read.parquet(docs_path)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "dedup_norm"))
    elif job == "diversity":
        # diversity <docs.parquet> [n] [group_col] — distinct-n diversity
        # per group (templated-content screen).
        from bigdata_hits_spark.operators.textstats import distinct_ngram_diversity

        docs_path = args.take()
        if docs_path is None:
            raise SystemExit("diversity needs a documents parquet path")
        n = args.take(int, 2, usage="diversity <docs.parquet> [n] [group_col]")
        group_col = args.take(str, "source")
        distinct_ngram_diversity(
            spark.read.parquet(docs_path), n=n, group_col=group_col
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "diversity"))
    elif job == "winnow":
        # winnow <docs.parquet> [k] [w] [report] — winnowing fingerprints
        # (Schleimer et al. 2003); 'report' writes per-doc shared-fp
        # fractions instead of the raw (id, fp, pos) selections.
        from bigdata_hits_spark.operators.dedup import (
            winnow_dup_report,
            winnow_fingerprints,
        )

        from bigdata_hits_spark.operators.dedup import winnow_near_duplicates

        docs_path = args.take()
        if docs_path is None:
            raise SystemExit("winnow needs a documents parquet path")
        kk = args.take(int, 4, usage="winnow <docs.parquet> [k] [w] [report|pairs]")
        ww = args.take(int, 4)
        mode = args.take(str, "")
        modes = {
            "": winnow_fingerprints,
            "report": winnow_dup_report,
            "pairs": winnow_near_duplicates,
        }
        if mode not in modes:
            raise SystemExit(
                f"winnow: unknown mode {mode!r} (expected report|pairs or none)"
            )
        fn = modes[mode]
        fn(spark.read.parquet(docs_path), k=kk, w=ww).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "winnow"))
    elif job == "outliers":
        # outliers <table.parquet> <group_col> <value_col> [z] — robust
        # per-group outlier screen (median/MAD modified z-score).
        from bigdata_hits_spark.operators.profiling import robust_outlier_report

        src = args.take()
        group_col = args.take()
        value_col = args.take()
        if None in (src, group_col, value_col):
            raise SystemExit("outliers needs table.parquet group_col value_col [z]")
        zt = args.take(float, 3.5, usage="outliers <table> <group> <value> [z]")
        robust_outlier_report(
            spark.read.parquet(src), value_col, group_col, z_thresh=zt
        ).write.mode("overwrite").parquet(os.path.join(out_dir, "outliers"))
    elif job == "scc":
        # scc <edges.parquet> — strongly connected components of a
        # directed edge list (src, dst columns); scc = min member id.
        from bigdata_hits_spark.operators.components import (
            strongly_connected_components,
        )

        src = args.take()
        if src is None:
            raise SystemExit("scc needs an edges parquet path (src, dst)")
        strongly_connected_components(spark.read.parquet(src)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "scc"))
    elif job == "vocab":
        # vocab <docs.parquet> [top_n] — tokenizer vocabulary-coverage
        # plan: top-n tokens with rank + cumulative token-mass share.
        from bigdata_hits_spark.operators.textstats import vocab_coverage

        src = args.take()
        if src is None:
            raise SystemExit("vocab needs a documents parquet path")
        top_n = args.take(int, 100, usage="vocab <docs.parquet> [top_n]")
        vocab_coverage(spark.read.parquet(src), top_n=top_n).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "vocab"))
    elif job == "bpe_pairs":
        # bpe_pairs <docs.parquet> [top_n] — first BPE merge iteration:
        # top-n adjacent character pairs by corpus frequency.
        from bigdata_hits_spark.operators.textstats import bpe_pair_counts

        src = args.take()
        if src is None:
            raise SystemExit("bpe_pairs needs a documents parquet path")
        top_n = args.take(int, 50, usage="bpe_pairs <docs.parquet> [top_n]")
        bpe_pair_counts(spark.read.parquet(src), top_n=top_n).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "bpe_pairs"))
    elif job == "bpe_train":
        # bpe_train <docs.parquet> [merges] — multi-merge BPE trainer:
        # the (merge_idx, left, right, merged, cnt) merge table a
        # tokenizer ships.
        from bigdata_hits_spark.operators.textstats import bpe_train

        src = args.take()
        if src is None:
            raise SystemExit("bpe_train needs a documents parquet path")
        merges = args.take(int, 4, usage="bpe_train <docs.parquet> [merges]")
        bpe_train(spark.read.parquet(src), merges=merges).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "bpe_train"))
    else:
        raise SystemExit(f"unknown job {job!r}\n\n{__doc__}")


if __name__ == "__main__":
    main()
