"""Declared queries for the text-analysis operators (documents table).

Each Spark query mirrors its DuckDB oracle expression-for-expression so
integer counts are exact and double arithmetic follows the same op shape
(see oracles.py parity notes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_hits_spark.functions import text as TX
from bigdata_hits_spark.oracles import duck_token_hash
from bigdata_hits_spark.queries import register
from bigdata_hits_spark.sources.readers import load_table


def _sql_in(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


@register(
    "text_token_count",
    "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, "
    "len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens FROM documents",
)
def q_text_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


@register(
    "text_bpe_token_count",
    f"SELECT doc_id, len(regexp_extract_all(text, '{TX.BPE_SPLIT_PATTERN}')) AS n_bpe_tokens "
    "FROM documents",
)
def q_text_bpe_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.size(TX.bpe_tokens(F.col("text"))).alias("n_bpe_tokens"))


@register(
    "text_quality",
    "SELECT doc_id, ROUND(CAST("
    "0.5 * LEAST(1.0, len(w) / 100.0) "
    f"+ 0.3 * (1.0 - len(list_filter(w, x -> x IN ({_sql_in(TX.STOPWORDS['en'])}))) "
    "/ (CASE WHEN len(w) > 0 THEN len(w) ELSE 1 END)) "
    "+ 0.2 * LEAST(1.0, ((length(text) - (len(w) - 1)) "
    "/ (CASE WHEN len(w) > 0 THEN len(w) ELSE 1 END)) / 8.0) "
    "AS DOUBLE), 7) AS quality "
    "FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)",
)
def q_text_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.round(TX.quality_score(F.col("text")), 7).alias("quality"))


def _lang_id_sql() -> str:
    score_cols = ", ".join(
        f"len(list_filter(w, x -> x IN ({_sql_in(TX.STOPWORDS[lang])}))) "
        f"/ (CASE WHEN len(w) > 0 THEN len(w) ELSE 1 END) AS s_{lang}"
        for lang in TX.LANG_ORDER
    )
    case = (
        "CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en' "
        "WHEN s_de >= s_es AND s_de >= s_fr THEN 'de' "
        "WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END"
    )
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
        f"s AS (SELECT doc_id, {score_cols} FROM t) "
        f"SELECT doc_id, {case} AS pred_lang, ROUND(CAST(s_en AS DOUBLE), 7) AS en_score FROM s"
    )


@register("text_lang_id", _lang_id_sql())
def q_text_lang_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    scores = TX.lang_scores(toks)
    return docs.select(
        "doc_id",
        TX.predicted_lang(scores).alias("pred_lang"),
        F.round(scores["en"], 7).alias("en_score"),
    )


@register(
    "text_fingerprint",
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
    "e AS (SELECT doc_id, w, unnest(range(len(w))) AS i FROM t), "
    f"h AS (SELECT doc_id, {duck_token_hash('w[i + 1]')} * (i + 1) AS term FROM e) "
    f"SELECT doc_id, CAST(SUM(term) % {TX.FINGERPRINT_MOD} AS BIGINT) AS fp "
    "FROM h GROUP BY doc_id",
)
def q_text_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.doc_fingerprint(F.col("text")).alias("fp"))
