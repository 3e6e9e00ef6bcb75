"""Declared queries for the text-analysis operators (documents table).

Each Spark query mirrors its DuckDB oracle expression-for-expression so
integer counts are exact and double arithmetic follows the same op shape
(see oracles.py parity notes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_hits_spark.functions import text as TX
from bigdata_hits_spark.operators import textstats
from bigdata_hits_spark.oracles import duck_token_hash
from bigdata_hits_spark.queries import register
from bigdata_hits_spark.sources.readers import load_table

#: Benchmark partition for the contamination screen: every 20th doc_id
#: plays the held-out eval set, the rest are the training corpus.
CONTAM_BENCH_MOD = 20


def _sql_in(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


@register(
    "text_token_count",
    "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, "
    "len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens, "
    f"len(regexp_extract_all(text, '{TX.BPE_SPLIT_PATTERN}')) AS n_bpe_tokens "
    "FROM documents",
)
def q_text_token_count(spark, sf_dir):
    """Whitespace token counts AND the BPE-ish regex token count in one
    declared entry (merged to free a slot in the driver's bounded
    first-50 gate): both are per-document token statistics over the same
    scan, each backed by its own library function (TX.tokens /
    TX.bpe_tokens)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(TX.bpe_tokens(F.col("text"))).alias("n_bpe_tokens"),
    )


#: DuckDB twin of functions/text.py quality_score over (text, w) columns,
#: UNROUNDED — the form threshold filters use (Spark filters the raw
#: double; see the clean-corpus composite in queries_postgate).
QUALITY_RAW_SQL_EXPR = (
    "CAST("
    "0.5 * LEAST(1.0, len(w) / 100.0) "
    f"+ 0.3 * (1.0 - len(list_filter(w, x -> x IN ({_sql_in(TX.STOPWORDS['en'])}))) "
    "/ (CASE WHEN len(w) > 0 THEN len(w) ELSE 1 END)) "
    "+ 0.2 * LEAST(1.0, ((length(text) - (len(w) - 1)) "
    "/ (CASE WHEN len(w) > 0 THEN len(w) ELSE 1 END)) / 8.0) "
    "AS DOUBLE)"
)

def portable_round_sql(expr: str, digits: int = 7) -> str:
    """DuckDB twin of functions/text.py round_portable: floor-scale
    rounding as three IEEE ops, bit-stable across engines for the same
    input double (see round_portable's docstring for why plain ROUND
    diverges near decimal ties)."""
    s = f"{10**digits}.0"
    return f"(FLOOR(({expr}) * {s} + 0.5) / {s})"


#: Rounded-to-7 form for value compares — shared with the quality NTILE
#: gate in queries_postgate.  Floor-scale portable rounding (NOT SQL
#: ROUND): quality rationals land exactly on decimal rounding ties and
#: the engines' ROUND algorithms disagree there (sf0.1 finding, round 13).
QUALITY_SQL_EXPR = portable_round_sql(QUALITY_RAW_SQL_EXPR)


@register(
    "text_quality",
    f"SELECT doc_id, {QUALITY_SQL_EXPR} AS quality "
    "FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)",
)
def q_text_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.round_portable(TX.quality_score(F.col("text"))).alias("quality"))


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
    "text_repetition",
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
    "tok AS (SELECT doc_id, unnest(w) AS term FROM t), "
    "uc AS (SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY doc_id, term), "
    "u AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS n FROM uc GROUP BY doc_id), "
    "bg AS (SELECT doc_id, w[i + 1] || ' ' || w[i + 2] AS term FROM "
    "(SELECT doc_id, w, unnest(range(len(w) - 1)) AS i FROM t)), "
    "bc AS (SELECT doc_id, term, COUNT(*) AS c FROM bg GROUP BY doc_id, term), "
    "b AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS n FROM bc GROUP BY doc_id) "
    "SELECT u.doc_id, ROUND(CAST(u.mx AS DOUBLE) / u.n, 7) AS top_token_frac, "
    "ROUND(COALESCE(CAST(b.mx AS DOUBLE) / b.n, 0.0), 7) AS top_bigram_frac "
    "FROM u LEFT JOIN b ON u.doc_id = b.doc_id",
)
def q_text_repetition(spark, sf_dir):
    """Gopher-style within-document repetition gate (top-token / top-
    bigram occurrence fractions) — operators/textstats.py."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.repetition_signals(docs)


@register(
    "text_tfidf",
    "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents), "
    "tc AS (SELECT doc_id, term, COUNT(*) AS c FROM tok GROUP BY doc_id, term), "
    "dl AS (SELECT doc_id, SUM(c) AS n_tokens FROM tc GROUP BY doc_id), "
    "dfc AS (SELECT term, COUNT(*) AS df FROM tc GROUP BY term), "
    "nd AS (SELECT COUNT(*) AS n_docs FROM documents) "
    "SELECT tc.doc_id, tc.term, "
    "ROUND(tc.c / dl.n_tokens * LN(nd.n_docs / dfc.df), 7) AS tfidf "
    "FROM tc JOIN dl ON tc.doc_id = dl.doc_id "
    "JOIN dfc ON tc.term = dfc.term CROSS JOIN nd",
)
def q_text_tfidf(spark, sf_dir):
    """Per-(doc, term) tf-idf — the reference's tf-idf edge-weight
    story (its committed weighted_HITS_tfidf outputs) as a first-class
    operator; operators/textstats.py tfidf."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.tfidf(docs)


def _contamination_sql(n: int = textstats.CONTAMINATION_N) -> str:
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
        f"g AS (SELECT doc_id, list_aggregate(w[i + 1:i + {n}], 'string_agg', ' ') AS ng "
        f"FROM (SELECT doc_id, w, unnest(range(len(w) - {n - 1})) AS i FROM t)), "
        f"bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % {CONTAM_BENCH_MOD} = 0), "
        f"corp AS (SELECT DISTINCT doc_id, ng FROM g WHERE doc_id % {CONTAM_BENCH_MOD} <> 0), "
        "tot AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM corp GROUP BY doc_id), "
        "hit AS (SELECT c.doc_id, COUNT(*) AS n_overlap FROM corp c "
        "JOIN bench b ON c.ng = b.ng GROUP BY c.doc_id) "
        "SELECT h.doc_id, h.n_overlap, t.n_ngrams, "
        "ROUND(CAST(h.n_overlap AS DOUBLE) / t.n_ngrams, 7) AS contaminated_frac "
        "FROM hit h JOIN tot t ON h.doc_id = t.doc_id"
    )


@register("contamination_ngrams", _contamination_sql())
def q_contamination_ngrams(spark, sf_dir):
    """Benchmark-decontamination screen: docs sharing a 4-gram with the
    held-out benchmark partition (doc_id % 20 == 0 stands in for the
    eval set) — operators/textstats.py ngram_overlap."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % CONTAM_BENCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % CONTAM_BENCH_MOD != 0)
    return textstats.ngram_overlap(corpus, bench)


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


@register(
    "pii_screen",
    "SELECT doc_id, "
    + ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{kind}"
        for kind, pat in TX.PII_PATTERNS.items()
    )
    + " FROM documents",
)
def q_pii_screen(spark, sf_dir):
    """Per-document PII match counts (functions/text.py pii_counts) —
    the screening half of the PII story under the oracle hash gate.
    Redaction stays library-only: replacement semantics differ across
    regex engines, counts do not (PII_PATTERNS is restricted to the
    subset Java and RE2 interpret identically)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", *TX.pii_counts(F.col("text")).values())

