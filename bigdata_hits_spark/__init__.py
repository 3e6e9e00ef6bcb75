"""bigdata_hits_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first re-expression of the query surface of the
reference project ``JustAToaster/BigData_HITS`` (link-analysis over a
directed, labeled, weighted property graph: six HITS variants, six SALSA
variants, topic listing), extended with the operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing, streaming).

Design stance (see SURVEY.md §7): everything is declared via the DataFrame
API so Catalyst/AQE own the physical plan; the only imperative construct is
the driver-side power-iteration loop, which is checkpoint-disciplined.
No RDDs, no row-at-a-time Python UDFs in any hot path.
"""

from bigdata_hits_spark.session import get_spark
from bigdata_hits_spark.operators.graph import Graph, topic_induced, neighborhood
from bigdata_hits_spark.operators.ranking import (
    RankResult,
    hits,
    pagerank,
    salsa,
    salsa_simplified,
    list_topics,
)
from bigdata_hits_spark.operators.components import connected_components, dedup_survivors
from bigdata_hits_spark.operators.graphalgs import (
    bfs_distances,
    k_core,
    label_propagation,
    symmetric_edges,
    triangle_counts,
)
from bigdata_hits_spark.operators.dedup import (
    levenshtein_neardup_pairs,
    minhash_dedup_incremental,
    remove_repeated_spans,
    repeated_ngram_coverage,
    strip_boilerplate,
)
from bigdata_hits_spark.operators.similarity import (
    near_duplicate_pairs,
    quantize_embeddings,
    semantic_dedup,
)
from bigdata_hits_spark.operators.pipeline import clean_corpus, resolve_entities
from bigdata_hits_spark.operators.sampling import (
    cap_per_group,
    chunk_documents,
    deterministic_split,
    mixture_sample,
    pack_documents,
    sample_to_token_budget,
    stratified_sample,
    weighted_sample,
)
from bigdata_hits_spark.operators.profiling import profile_table, skew_report
from bigdata_hits_spark.operators.rangejoin import interval_count_sweep, range_join_bins
from bigdata_hits_spark.operators.ranks import (
    global_rank,
    ntile_exact,
    rank_stats,
    top_fraction,
    top_fraction_by,
    top_fraction_approx,
)
from bigdata_hits_spark.operators.events import sliding_event_counts
from bigdata_hits_spark.operators.textstats import (
    ngram_overlap,
    repetition_signals,
    tfidf,
    unigram_logprob,
)
from bigdata_hits_spark.functions.text import canonical_url, pii_counts, redact_pii
from bigdata_hits_spark.sql import register_graph_views, register_testdata_views

__all__ = [
    "get_spark",
    "Graph",
    "topic_induced",
    "neighborhood",
    "RankResult",
    "hits",
    "pagerank",
    "salsa",
    "salsa_simplified",
    "list_topics",
    "connected_components",
    "dedup_survivors",
    "bfs_distances",
    "k_core",
    "label_propagation",
    "symmetric_edges",
    "triangle_counts",
    "levenshtein_neardup_pairs",
    "minhash_dedup_incremental",
    "remove_repeated_spans",
    "repeated_ngram_coverage",
    "strip_boilerplate",
    "quantize_embeddings",
    "near_duplicate_pairs",
    "semantic_dedup",
    "clean_corpus",
    "resolve_entities",
    "cap_per_group",
    "chunk_documents",
    "mixture_sample",
    "profile_table",
    "skew_report",
    "interval_count_sweep",
    "range_join_bins",
    "global_rank",
    "ntile_exact",
    "rank_stats",
    "top_fraction",
    "top_fraction_by",
    "top_fraction_approx",
    "sliding_event_counts",
    "deterministic_split",
    "pack_documents",
    "sample_to_token_budget",
    "stratified_sample",
    "weighted_sample",
    "ngram_overlap",
    "repetition_signals",
    "tfidf",
    "unigram_logprob",
    "canonical_url",
    "pii_counts",
    "redact_pii",
    "register_graph_views",
    "register_testdata_views",
]

__version__ = "0.1.0"
