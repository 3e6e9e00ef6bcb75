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
