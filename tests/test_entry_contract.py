"""Invariants of the driver contract (__spark_entry__.py) that no
operator addition may break.  Pure-Python: no Spark session needed."""

import json
import os

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_oracle_key_is_a_declared_query():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)
    # rows-only entries are the documented approximate/sampling paths
    rows_only = set(q) - set(o)
    assert rows_only == {
        "sample_bernoulli",
        "sketch_distinct_parts",
        "sketch_price_quantiles",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "kmeans_parallel_embeddings",
        "sketch_token_topk",
        "retrieval_mmr",
        "ann_lsh_recall",
        "compression_ratio_docs",
        "ann_ivf_quantized_topk",
        "ann_ivfq_recall",
        "ann_ivfpq_topk",
        # incremental execution: stream-batch equivalence asserted
        # INSIDE the query; output order/micro-batching engine-internal
        "streaming_hourly_agg",
        "streaming_sessionize",
        "streaming_incremental_dedup",
    }, rows_only


#: The driver's 50-slot correctness-gate prefix, pinned LITERALLY.
#: Registration order is load-bearing (queries._load_extensions +
#: per-module registration order feed the stable oracle-first sort); a
#: module reorder or a mid-registry oracle-backed insert would silently
#: evict a gate row.  Any intentional change must edit this list.
GATE_PREFIX = [
    "scan_project", "filter_conditional_flag", "join_inner",
    "join_leftsemi_and", "join_leftsemi_or", "groupby_degrees",
    "grand_agg_l2", "scalar_normalize", "sort_and_topk", "rename_chain",
    "window_topn_per_group", "anti_join_idle_customers", "rollup_revenue",
    "composite_order_revenue_topk", "composite_nation_volume",
    "setop_union_intersect_except", "list_topics", "base_salsa",
    "weighted_salsa", "query_dependent_salsa", "base_hits_k3",
    "weighted_hits_k3", "teleport_hits_k3", "topic_specific_hits_k3",
    "topic_exclusive_hits_k3", "query_dependent_hits_k3", "salsa_mutual_k3",
    "teleport_salsa_k3", "topic_specific_salsa_k3", "pagerank_k3",
    "text_token_count", "text_quality", "text_lang_id", "text_repetition",
    "text_tfidf", "contamination_ngrams", "text_fingerprint", "pii_screen",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_components", "ann_cosine_topk",
    "embedding_neardup_pairs", "events_hourly_agg", "events_sessionize",
    "events_asof_attribution", "multimodal_features",
    "multimodal_frame_offsets",
]


def test_gate_prefix_is_stable():
    """The driver's correctness gate consumes the FIRST 50 declared
    queries; new registrations must append AFTER that prefix (register in
    queries_postgate.py, not a theme module — a mid-registry insert
    silently evicts a gate row).  Pinned three ways: the literal list
    above, and the recorded r03/r04 driver gate keys."""
    q = list(entry.queries())
    assert q[:50] == GATE_PREFIX
    for rec in (
        os.path.join("artifacts", "r03", "CORRECTNESS_r03.json"),
        os.path.join("artifacts", "r04", "CORRECTNESS_r04.json"),
    ):
        recorded = json.load(open(os.path.join(REPO, rec)))
        assert q[:50] == list(recorded)[:50], rec


def test_oracle_backed_entries_precede_rows_only():
    q = list(entry.queries())
    o = set(entry.oracle_sql())
    first_rows_only = next(i for i, n in enumerate(q) if n not in o)
    assert all(n not in o for n in q[first_rows_only:]), (
        "rows-only entries must trail every oracle-backed one"
    )


def test_gate_prefix_survives_early_postgate_import():
    """Several tests import queries_postgate directly for its constants;
    in a fresh interpreter that registers postgate's entries before the
    theme modules load.  The explicit module-rank ordering must keep the
    gate prefix identical anyway (this was a real full-suite-order
    flake: the prefix test passed standalone and failed after
    test_clustering had pulled a postgate constant)."""
    import subprocess
    import sys

    code = (
        "import bigdata_hits_spark.queries_postgate\n"  # the bad order
        "import __spark_entry__ as e\n"
        "print('\\n'.join(list(e.queries())[:50]))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=True,
    )
    assert out.stdout.strip().splitlines() == GATE_PREFIX
