"""Composed corpus-cleaning pipeline: funnel behavior + stage parity."""

from pyspark.sql import functions as F

from bigdata_hits_spark.operators.pipeline import clean_corpus
from bigdata_hits_spark.sources.readers import load_table


def test_clean_corpus_funnel(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    final, stats = clean_corpus(docs, with_stats=True)
    # Monotone funnel, nothing invented.
    assert stats.n_raw >= stats.n_quality >= stats.n_exact >= stats.n_final
    assert stats.n_final > 0
    # The synthetic corpus contains exact and near duplicates.
    assert stats.n_exact < stats.n_quality or stats.n_final < stats.n_exact
    assert final.count() == stats.n_final


def test_clean_corpus_output_schema_and_floor(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    final = clean_corpus(docs, min_quality=0.4)
    for c in ("quality", "n_tokens", "n_bpe_tokens", "lang_pred", "fingerprint"):
        assert c in final.columns
    assert final.filter(F.col("quality") < 0.4).count() == 0
    assert final.filter(~F.col("lang_pred").isin("en", "de", "es", "fr")).count() == 0


def test_clean_corpus_no_surviving_exact_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    final = clean_corpus(docs)
    n = final.count()
    assert final.select("text").distinct().count() == n
    assert final.select("doc_id").distinct().count() == n


def test_clean_corpus_stays_jvm_side_after_pairs(spark, sf_dir):
    """The only Python stage is the Arrow-batched shingler inside MinHash;
    the stat columns must not add row-at-a-time Python."""
    docs = load_table(spark, sf_dir, "documents")
    plan = clean_corpus(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python UDFs


def test_clean_corpus_with_semantic_stage(spark, sf_dir):
    """The optional embedding stage composes end to end: output is a
    subset of the lexical-only survivors, stats carry the extra funnel
    point, and near-identical-embedding pairs collapse."""
    docs = load_table(spark, sf_dir, "documents")
    vecs = load_table(spark, sf_dir, "embeddings")
    lexical_only = clean_corpus(docs)
    final, stats = clean_corpus(docs, vectors=vecs, with_stats=True)
    kept = {r["doc_id"] for r in final.select("doc_id").collect()}
    lex = {r["doc_id"] for r in lexical_only.select("doc_id").collect()}
    assert kept <= lex
    assert stats.n_lexical == len(lex)
    assert stats.n_final == len(kept)


def test_clean_corpus_semantic_collapses_planted_cluster(spark):
    """Two docs with different text but near-identical embeddings must
    collapse in the semantic stage and survive it in the lexical-only
    run."""
    long_text = "the quick brown fox jumps over the lazy dog " * 20
    other_text = "completely different words here about spark engines " * 20
    docs = spark.createDataFrame(
        [(1, long_text), (2, other_text), (3, "short")], ["doc_id", "text"]
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0005, 0.0]), (3, [0.0, 1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    lex = {r["doc_id"] for r in
           clean_corpus(docs, min_quality=0.0).select("doc_id").collect()}
    sem = {r["doc_id"] for r in
           clean_corpus(docs, min_quality=0.0, vectors=vecs).select("doc_id").collect()}
    assert {1, 2} <= lex
    assert 2 not in sem and 1 in sem


def test_clean_corpus_boilerplate_and_lm_stages(spark):
    from bigdata_hits_spark.operators.pipeline import clean_corpus

    body = " ".join(f"word{i} common text flows naturally here" for i in range(6))
    footer = "click here to subscribe now"
    docs = spark.createDataFrame(
        [
            (1, f"{body} alpha.\n{footer}"),
            (2, f"{body} beta variant.\n{footer}"),
            (3, f"{body} gamma edition.\n{footer}"),
        ],
        "doc_id long, text string",
    )
    out = clean_corpus(
        docs,
        min_quality=0.0,
        near_dup_threshold=0.99,
        boilerplate_min_df=3,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # the shared footer line is gone from every survivor
    assert rows and all(footer not in r["text"] for r in rows.values())

    # LM floor: an impossible threshold empties the corpus, a permissive
    # one keeps it — the stage is wired and directional
    kept = clean_corpus(docs, min_quality=0.0, near_dup_threshold=0.99,
                        min_unigram_logprob=-1e9)
    none = clean_corpus(docs, min_quality=0.0, near_dup_threshold=0.99,
                        min_unigram_logprob=1.0)
    assert kept.count() == 3 and none.count() == 0


def test_resolve_entities_transitive_clusters(spark):
    from bigdata_hits_spark.operators.pipeline import resolve_entities

    # chain: "acme corp" ~ "acme c0rp" ~ "acme c0rpx" (ends differ by 3
    # edits -> only transitivity links them); "zeta llc" isolated; rows
    # duplicated to prove distinct-value semantics; a null is ignored
    rows = [
        ("acme corp",), ("acme c0rp",), ("acme c0rpx",),
        ("zeta llc",), ("acme corp",), (None,),
    ]
    df = spark.createDataFrame(rows, "vendor string")
    got = {
        r["name"]: r["canonical"]
        for r in resolve_entities(df, "vendor", max_dist=2).collect()
    }
    assert got == {
        "acme corp": "acme c0rp",
        "acme c0rp": "acme c0rp",
        "acme c0rpx": "acme c0rp",
        "zeta llc": "zeta llc",
    }


def test_clean_corpus_oracle_quality_margin(spark, sf_dir, sf_dir_oracle):
    """Fixture guard for the clean_corpus_docs declared row: the quality
    floor filters the UNROUNDED double on both engines, whose last-ulp
    arithmetic may differ — safe only while no document's quality sits
    within float-accumulation distance of the threshold.  Assert the
    margin at both test scales so a testdata refresh fails HERE with a
    clear message, not as a driver-gate hash mismatch (the
    test_lsh_oracle_fixture_dot_margin pattern)."""
    from bigdata_hits_spark.functions.text import quality_score
    from bigdata_hits_spark.queries_postgate import CLEAN_MIN_QUALITY

    for d in (sf_dir, sf_dir_oracle):
        docs = load_table(spark, d, "documents")
        margin = docs.select(
            F.min(F.abs(quality_score(F.col("text")) - F.lit(CLEAN_MIN_QUALITY))).alias("m")
        ).first()["m"]
        assert margin > 1e-9, (
            f"{d}: a document's quality is within {margin:.2e} of the "
            f"{CLEAN_MIN_QUALITY} floor; the clean_corpus_docs oracle would "
            "be engine-ulp fragile — adjust CLEAN_MIN_QUALITY or the fixture"
        )
