"""Corpus-statistics operators beyond per-document column expressions:
repetition signals and benchmark-contamination screening.

Both are standard gates in large-scale training-data pipelines:

- :func:`repetition_signals` computes the Gopher-style within-document
  repetition fractions (most-frequent-token fraction, most-frequent-
  bigram fraction) used to drop degenerate/boilerplate documents
  (Rae et al. 2021, "Scaling Language Models", Table A1 repetition
  filters).
- :func:`ngram_overlap` screens a corpus against a benchmark/eval set
  by exact n-gram collision — the decontamination check every LLM
  training pipeline runs before training (GPT-3 appendix C style
  13-gram overlap; n is a parameter).

Scale notes (100 TB): both operators shuffle only compact derived keys
(``(doc_id, token-or-ngram)``), never full documents.  The per-document
aggregations are single hash-partial-agg shapes with map-side combine.
``ngram_overlap`` broadcasts the benchmark n-gram set when it is small
(the usual case — eval sets are MBs against a multi-TB corpus) and
falls back to a shuffle join otherwise; candidate work is bounded by
the posting-list sizes, not corpus².
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from bigdata_hits_spark.functions.text import token_hash, tokens, url_host

#: Default n for contamination screening.  13 is the GPT-3 convention;
#: the synthetic corpus' ~50-token documents motivate a smaller default
#: so tests exercise non-empty overlap.
CONTAMINATION_N = 4


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", digits: int = 7
) -> DataFrame:
    """Per-document repetition fractions:

    - ``top_token_frac``: occurrences of the most frequent token divided
      by the token count.
    - ``top_bigram_frac``: occurrences of the most frequent adjacent
      bigram divided by the bigram count (0.0 for single-token docs).

    Implementation: one ``posexplode``-free pass — tokens/bigrams are
    built as array columns row-side (cheap, bounded by doc length),
    exploded, and aggregated with two hash aggregations whose partial
    (map-side) combine keeps the shuffle to distinct
    ``(doc_id, term)`` keys.  No Python UDFs.
    """
    w = tokens(F.col(text_col))
    base = docs.select(id_col, w.alias("w"))
    uni = base.select(id_col, F.explode("w").alias("term"))
    bi = base.select(
        id_col,
        F.explode(
            F.expr(
                "zip_with(slice(w, 1, greatest(size(w) - 1, 0)), "
                "slice(w, 2, greatest(size(w) - 1, 0)), "
                "(a, b) -> concat_ws(' ', a, b))"
            )
        ).alias("term"),
    )

    def top_frac(exploded: DataFrame, out: str) -> DataFrame:
        per_term = exploded.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("c"))
        return per_term.groupBy(id_col).agg(
            F.max("c").alias(f"{out}_max"), F.sum("c").alias(f"{out}_n")
        )

    u = top_frac(uni, "u")
    b = top_frac(bi, "b")
    return (
        u.join(b, id_col, "left")
        .select(
            id_col,
            F.round(F.col("u_max") / F.col("u_n"), digits).alias("top_token_frac"),
            F.round(
                F.coalesce(F.col("b_max") / F.col("b_n"), F.lit(0.0)), digits
            ).alias("top_bigram_frac"),
        )
    )


def tfidf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    digits: int = 7,
) -> DataFrame:
    """Per-(document, term) tf-idf over whitespace tokens:

    ``tf = count(term in doc) / n_tokens(doc)``,
    ``idf = ln(N / df(term))`` (classic, unsmoothed — df >= 1 for every
    emitted term so the log is always defined).

    This is the reference's tf-idf edge-weight story (its committed
    ``weighted_HITS_tfidf`` outputs show HITS run with a tf-idf weight
    column, SURVEY §2): join the result onto an edge list by term/node
    key to produce the weight column ``hits(weight=...)`` consumes.

    Scale: two hash aggregations over ``(doc_id, term)`` keys plus one
    grand count; the document-frequency side is term-keyed (vocabulary-
    sized, orders of magnitude smaller than the corpus).  Full documents
    never shuffle.
    """
    terms = docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("term"))
    tf_counts = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("c"))
    doc_len = tf_counts.groupBy(id_col).agg(F.sum("c").alias("n_tokens"))
    df_counts = tf_counts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # Regime split (the LSH_SAFE_THRESHOLD discipline): df_counts is
    # vocabulary-sized — tiny at bench scale, but a 100 TB web corpus's
    # distinct-term relation (typo/URL/numeric noise) can reach tens of
    # GB, where a hard broadcast hint is a driver/executor OOM.  No hint:
    # the join stays a term-keyed equi-join either way, and AQE converts
    # it to a broadcast join at runtime exactly when the built side is
    # actually small.  The one-row grand aggregates keep their explicit
    # broadcast attach — those are O(1) by construction.
    return (
        tf_counts.join(doc_len, id_col)
        .join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                (F.col("c") / F.col("n_tokens"))
                * F.log(F.col("n_docs") / F.col("df")),
                digits,
            ).alias("tfidf"),
        )
    )


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    digits: int = 7,
) -> DataFrame:
    """Per-(document, term) Okapi BM25 weight — the standard lexical
    retrieval scorer (tf saturation + document-length normalization,
    the two effects raw tf-idf lacks):

    ``idf = ln((N - df + 0.5) / (df + 0.5) + 1)`` (the Lucene +1 form —
    always positive, so corpus-universal terms are damped, not zeroed),
    ``w = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``.

    Same plan shape as :func:`tfidf` plus one extra one-row grand
    aggregate (the corpus-average document length, broadcast-attached):
    two (doc, term) hash-aggs, a vocabulary-sized df side (unhinted —
    see the regime comment in :func:`tfidf`; AQE broadcasts it when it
    is actually small), full documents never shuffle.  Feed the output
    to ``similarity.sparse_cosine_topk`` for BM25-weighted retrieval."""
    terms = docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("term"))
    tf_counts = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("c"))
    doc_len = tf_counts.groupBy(id_col).agg(F.sum("c").alias("n_tokens"))
    df_counts = tf_counts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    totals = doc_len.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("n_tokens").alias("avgdl")
    )
    tf = F.col("c").cast("double")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("n_tokens") / F.col("avgdl")
    )
    return (
        tf_counts.join(doc_len, id_col)
        .join(df_counts, "term")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "term",
            F.round(idf * tf * F.lit(k1 + 1.0) / norm, digits).alias("bm25"),
        )
    )


def _ngram_terms(text_col: str, n: int):
    """Array of space-joined adjacent n-grams of the whitespace tokens.
    Guarded so docs shorter than n yield an empty array (``sequence``
    would otherwise count *down* and explode)."""
    return F.when(
        F.size(F.split(F.col(text_col), " ")) >= n,
        F.expr(
            f"transform(sequence(0, size(split({text_col}, ' ')) - {n}), "
            f"i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = CONTAMINATION_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
    digits: int = 7,
) -> DataFrame:
    """Benchmark-contamination screen: for each corpus document, the
    number and fraction of its distinct n-grams that also appear in the
    benchmark set.  Emits only contaminated documents (``n_overlap >=
    1``) — at corpus scale the clean majority would dominate the output
    for no decision value.

    Returns ``(id_col, n_overlap, n_ngrams, contaminated_frac)``.

    ``benchmark`` rows need only ``text_col``.  With
    ``broadcast_benchmark=True`` (default) the distinct benchmark n-gram
    set is broadcast — correct whenever the eval set is MB-scale against
    a TB-scale corpus; pass False to shuffle-join instead when the
    benchmark itself is large.
    """
    # Hash n-grams to int64 before anything shuffles: the distinct and the
    # join then move 8-byte keys instead of ~n-word strings (a 3-5x shuffle
    # width cut).  xxhash64 collisions (~2^-64 per pair) can in principle
    # miscount by 1; that is noise against the screen's purpose.
    ng_hash = F.xxhash64(F.col("ng"))
    from bigdata_hits_spark.sources.readers import spread_small_scan

    # HOF-interpreted n-gram transform = the expensive per-row map;
    # spread a single-row-group corpus scan first (no-op at scale; r13).
    corpus_docs = spread_small_scan(
        docs.select(F.col(id_col), F.col(text_col).alias("__t")), id_col
    )
    corpus_ngrams = (
        corpus_docs.select(id_col, F.explode(_ngram_terms("__t", n)).alias("ng"))
        .select(id_col, ng_hash.alias("ng"))
        .distinct()
    )
    bench_ngrams = (
        benchmark.select(F.explode(_ngram_terms(text_col, n)).alias("ng"))
        .select(ng_hash.alias("ng"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_ngrams = F.broadcast(bench_ngrams)
    totals = corpus_ngrams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_ngrams"))
    hits = (
        corpus_ngrams.join(bench_ngrams, "ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return hits.join(totals, id_col).select(
        id_col,
        "n_overlap",
        "n_ngrams",
        F.round(F.col("n_overlap") / F.col("n_ngrams"), digits).alias(
            "contaminated_frac"
        ),
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_tokens, avg_logprob): mean natural-log probability of each
    document's tokens under the CORPUS's own add-``alpha``-smoothed
    unigram distribution — a dependency-free perplexity-style quality
    signal (documents dominated by tokens rare in the corpus score low:
    gibberish, OCR noise, wrong-language fragments).

    Self-trained: p(w) = (count(w) + alpha) / (total + alpha·|V|) over
    the same corpus being scored — the standard cheap LM gate when no
    external model is shippable.  Two hash-aggs (term counts, per-doc
    sums) plus one token->logprob equi-join; only (doc, token) keys and
    the vocabulary-sized frequency table shuffle, never documents.  At
    100 TB the frequency table is vocabulary-sized (≪ corpus); broadcast
    it below ~100M terms, let AQE decide otherwise.
    """
    # null text scores as empty text (one "" token), not as a silently
    # absent document
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("w"),
    )
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    probs = counts.crossJoin(F.broadcast(totals)).select(
        "w",
        F.log(
            (F.col("c") + F.lit(alpha))
            / (F.col("total") + F.lit(alpha) * F.col("vocab"))
        ).alias("lp"),
    )
    return (
        toks.join(probs, "w")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "avg_logprob")
    )


def collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    digits: int = 7,
) -> DataFrame:
    """(a, b, c_ab, pmi): corpus-level adjacent-bigram collocation
    scoring by pointwise mutual information — the classic phrase-mining
    signal ("new york" scores high because its parts rarely appear
    apart; "of the" scores low despite its raw count).  Phrase tables
    feed tokenizer vocab curation, boilerplate phrase discovery, and
    n-gram feature selection over a training corpus.

    PMI = ln( p(a,b) / (p(a) p(b)) ) with p(a,b) = c_ab / N over the N
    adjacent bigram slots and p(x) = c_x / U over the U unigram tokens
    — evaluated as a log-of-integer-counts sum, so both engines see
    identical inputs and the round at ``digits`` absorbs last-ulp ln()
    differences (the unigram_logprob discipline).

    Plan: one explode for unigram counts, one slice-zip explode for
    bigram counts (each collapsing map-side to its key cardinality),
    the ``min_count`` filter BEFORE the two vocabulary-sized joins —
    candidate work is frequent-bigram-sized, not bigram-vocab-sized.
    The two scalar totals attach via broadcast crossJoin (O(1) rows);
    the unigram-count joins carry no hint — vocabulary can reach tens
    of GB on a web corpus, so AQE picks broadcast exactly when the
    built side is actually small (the tfidf regime comment)."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    w = docs.select(tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("w"))
    uni = (
        w.select(F.explode("w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    u_total = uni.agg(F.sum("c").alias("u"))
    pairs = w.select(
        F.explode(
            F.expr("transform(slice(w, 1, size(w) - 1), (x, i) -> struct(x AS a, w[i + 1] AS b))")
        ).alias("p")
    )
    bi = (
        pairs.select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    n_total = bi.agg(F.sum("c_ab").alias("n"))
    ua = uni.select(F.col("t").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("t").alias("b"), F.col("c").alias("c_b"))
    return (
        bi.filter(F.col("c_ab") >= min_count)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(u_total))
        .crossJoin(F.broadcast(n_total))
        .select(
            "a",
            "b",
            "c_ab",
            F.round(
                F.log("c_ab")
                + F.lit(2.0) * F.log("u")
                - F.log("n")
                - F.log("c_a")
                - F.log("c_b"),
                digits,
            ).alias("pmi"),
        )
    )

def feature_hash(
    docs: DataFrame,
    n_features: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket, tf): hashing-trick bag-of-words — every token is
    hashed into one of ``n_features`` buckets and counted, the
    fixed-width featurizer that needs NO vocabulary pass (the classic
    sklearn HashingVectorizer / VW trick).  Output is the sparse triplet
    form; a consumer pivots or collect_lists per doc as needed.

    The bucket hash is the engine's portable md5-hex8 token hash (
    functions/text.py token_hash) mod ``n_features`` — deterministic
    across engines, runs, and partitionings, unlike xxhash64.

    Scale: explode + ONE hash aggregate keyed (doc_id, bucket); partial
    aggregation caps each task's output at docs x n_features rows before
    the exchange, and no vocabulary-sized relation exists at all — the
    point of the hashing trick."""
    terms = docs.select(id_col, F.explode(tokens(F.col(text_col))).alias("term"))
    bucket = (token_hash(F.col("term")) % n_features).alias("bucket")
    return terms.groupBy(id_col, bucket).agg(F.count(F.lit(1)).alias("tf"))


def bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    digits: int = 6,
) -> DataFrame:
    """(w1, w2, n, logp): maximum-likelihood bigram language model over
    the corpus — ``logp = ln(count(w1 w2) / count(w1 _))``, the
    conditional next-token log-probability.  The docs-table twin of the
    event-stream Markov ``transition_counts``; a scorer joins a
    document's bigrams against this table to compute per-doc perplexity
    (the fluency filter next to the unigram-LM floor).

    ``min_count`` prunes the long tail AFTER normalization, so rare
    continuations are dropped without inflating the survivors'
    probabilities.

    Scale: bigrams come from zipping each token array with its own tail
    (array ops inside the row — no self-join, no posexplode pair build),
    then ONE corpus-wide hash agg to (w1, w2) counts; the context
    normalization is a w1-keyed window over the already-aggregated
    vocabulary-sized relation.  Full documents never shuffle."""
    pairs = docs.select(
        F.explode(
            F.expr(
                f"transform(slice(split({text_col}, ' '), 1, "
                f"size(split({text_col}, ' ')) - 1), "
                f"(x, i) -> struct(x AS w1, split({text_col}, ' ')[i + 1] AS w2))"
            )
        ).alias("z")
    ).select("z.w1", "z.w2")
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    w_ctx = Window.partitionBy("w1")
    return (
        counts.withColumn(
            "logp",
            F.round(F.log(F.col("n").cast("double") / F.sum("n").over(w_ctx)), digits),
        )
        .filter(F.col("n") >= min_count)
    )


def domain_mix(
    df: DataFrame, url_col: str = "url", digits: int = 6
) -> DataFrame:
    """Per-domain corpus mix report: ``(host, n_docs, share)`` — the
    first table a web-corpus curation review reads (is one domain 40%
    of the corpus?) and the input to per-domain caps and domain-level
    quality policy.  Hosts come from functions/text.py url_host
    (lowercased, www/port/userinfo stripped); URLs with no extractable
    host aggregate under a NULL host row, so the shares still sum to 1
    over the whole corpus.

    Plan: one hash aggregate keyed by host (map-side partial counts —
    the shuffle moves O(partitions x domains) rows, not documents), the
    grand total reduced from the domain-sized counts and attached as the
    engine's standard one-row broadcast crossJoin.  The counts relation
    is pinned (lazy localCheckpoint) so the total and the share
    projection read ONE evaluation rather than re-scanning the corpus
    twice."""
    counts = (
        df.select(url_host(F.col(url_col)).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint(eager=False)
    )
    total = counts.agg(F.sum("n_docs").alias("__N"))
    return counts.crossJoin(F.broadcast(total)).select(
        "host",
        "n_docs",
        F.round(F.col("n_docs") / F.col("__N"), digits).alias("share"),
    )


def zipf_fit(df: DataFrame, text_col: str = "text", digits: int = 6) -> DataFrame:
    """One-row Zipf law fit of the corpus vocabulary:
    ``(n_types, slope, intercept, r2)`` from an OLS of ln(freq) on
    ln(rank) over the full term-frequency table — slope near -1 is the
    healthy-natural-text signature; a flat slope flags boilerplate/spam
    floods and a cliff flags template dedup debt.  The whole-vocabulary
    regression (not a top-k eyeball) is the version that needs an
    engine: at web scale the type table itself is hundreds of millions
    of rows.

    Plan: one term-keyed hash agg (map-side combine collapses the
    token stream), ranks from the two-phase distributed global_rank
    (range exchange + bucket offsets — no single-task window over the
    vocabulary; operators/ranks.py), then ONE merged-moment aggregate
    for the fit (the grouped_linreg formulas, operators/profiling.py).
    Ties in freq break on the term itself, so ranks — and hence the
    fit — are fully deterministic and engine-portable.  freq >= 1 so
    both logs are defined; slope/r2 guards inherit from grouped_linreg
    (a one-type corpus yields NULLs, not an error)."""
    from bigdata_hits_spark.functions.text import tokens
    from bigdata_hits_spark.operators.profiling import grouped_linreg
    from bigdata_hits_spark.operators.ranks import global_rank

    tf = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = global_rank(
        tf, [F.col("freq").desc(), F.col("term").asc()], rank_col="rank"
    )
    pts = ranked.select(
        F.lit(1).alias("__g"),
        F.log("rank").alias("__lx"),
        F.log("freq").alias("__ly"),
    )
    fit = grouped_linreg(pts, "__lx", "__ly", "__g", digits_intercept=digits,
                         digits_slope=digits, digits_r2=digits)
    return fit.select(F.col("n").alias("n_types"), "slope", "intercept", "r2")


def keywords_per_group(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    id_col: str | None = "doc_id",
    k: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Top-``k`` distinctive terms per group: ``(group, term, tf,
    score)`` where ``score = tf_in_group * ln(N_docs / df_term)`` — the
    classic tf-idf keyword extraction, run per SOURCE rather than per
    document: the one-page "what is each slice of the corpus about"
    digest a curation review reads before weighting a mixture.

    Plan: one token explode feeding two hash aggs — (group, term)
    term frequencies and (term) document frequencies — joined back on
    the TERM (vocab-sized equi-join, never document-sized), the
    corpus doc count attached as the engine's standard one-row
    broadcast.  Top-k is a per-group window whose partition is the
    group's distinct vocabulary (bounded by vocabulary, not documents);
    ORDER is on the ROUNDED score with a term tiebreak, so rank — and
    the selected set — is deterministic under last-ulp ln() drift
    between engines (the discipline every declared top-k shares).
    ``id_col`` keys document frequency; pass ``None`` to mint ids with
    ``monotonically_increasing_id`` (same-session stable only — fine
    for df, which only needs per-document distinctness).
    """
    from bigdata_hits_spark.functions.text import tokens

    did = F.col(id_col) if id_col else F.monotonically_increasing_id()
    toks = df.select(
        F.col(group_col).alias("grp"),
        did.alias("__did"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.select("__did", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("__df")
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("__N"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "grp",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("__N") / F.col("__df")), digits
            ).alias("score"),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(F.col("grp").alias(group_col), "term", "tf", "score")
    )


def sentence_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    digits: int = 6,
) -> DataFrame:
    """Per-document sentence shape: ``(id, n_sentences, avg_sentence_
    tokens, max_sentence_tokens)`` — the readability/structure signal
    quality gates use beside the flat token counts: boilerplate and
    keyword-stuffed spam skew to degenerate one-token "sentences",
    machine-merged text to enormous ones.

    Sentences split on the terminator run ``[.!?]+`` followed by
    whitespace-or-end (a pragmatic segmenter, not a linguistic one —
    abbreviations split; the declared contract is the regex, identical
    bytes in Java regex and RE2 so both engines segment identically);
    empty segments (trailing terminator) are dropped.  Tokens per
    sentence reuse the corpus' whitespace convention.  Pure Column
    expressions — narrow map + nothing, no shuffle at all."""
    sents = F.filter(
        F.split(F.col(text_col), r"[.!?]+( |$)"),
        lambda s: F.trim(s) != "",
    )
    toks_per = F.transform(sents, lambda s: F.size(F.split(F.trim(s), " ")))
    return df.select(
        F.col(id_col),
        F.size(sents).alias("n_sentences"),
        F.round(
            F.when(
                F.size(sents) > 0,
                F.aggregate(toks_per, F.lit(0), lambda a, x: a + x).cast("double")
                / F.size(sents),
            ),
            digits,
        ).alias("avg_sentence_tokens"),
        F.array_max(toks_per).alias("max_sentence_tokens"),
    )


def readability(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    digits: int = 6,
) -> DataFrame:
    """(id, n_words, n_sentences, n_syllables, flesch): Flesch
    reading-ease per document — the classic readability gate a corpus
    cleaner applies alongside the length/stopword quality score
    (a wall of legalese and a keyword-stuffed spam page both fall out
    of the mid-band).

    All three counts are JVM-side regexp aggregates over one scan:
    words = whitespace tokens, sentences = runs of ``[.!?]`` (floored
    at 1 so headline-like fragments don't divide by zero), syllables =
    vowel-group runs per lowercased text, the standard dictionary-free
    approximation.  flesch = 206.835 - 1.015 w/s - 84.6 syl/w, rounded
    to ``digits`` — both ratios are exact-integer divisions widened to
    double in the same op shape on both engines, so 6 digits holds with
    wide margin.  Column exprs only: shuffle-free, pipelined with any
    downstream quality filter."""
    words = F.size(F.split(F.col(text_col), " "))
    sents = F.greatest(
        F.regexp_count(F.col(text_col), F.lit("[.!?]+")), F.lit(1)
    )
    syl = F.regexp_count(F.lower(F.col(text_col)), F.lit("[aeiouy]+"))
    return df.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        syl.cast("long").alias("n_syllables"),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * words.cast("double") / sents.cast("double")
            - F.lit(84.6) * syl.cast("double") / words.cast("double"),
            digits,
        ).alias("flesch"),
    )


_COMPRESS_UDF = None


def compression_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
    digits: int = 6,
) -> DataFrame:
    """(id, n_bytes, n_compressed, compression_ratio): zlib-compressed
    size over raw UTF-8 size per document — the classic
    machine-generated/boilerplate detector (Gopher-style): highly
    repetitive text compresses far below prose (~0.3 vs ~0.6), random
    noise compresses above 1.0 with header overhead.  A filter signal
    the n-gram repetition fractions miss when the repetition unit is
    long.

    Arrow-batched pandas UDF (zlib is a tight C loop per batch; a
    row-at-a-time Python UDF would pay per-row serialization) — the
    honest shape for a kernel no Column expression can express.
    Shuffle-free: one projection over the scan.  zlib output at a fixed
    level is deterministic for a given input, so the ratio is stable
    across runs and partitionings; declared rows-only (no SQL twin —
    DuckDB has no zlib surface), invariants pinned in
    tests/test_textstats.py.  Empty documents report ratio 0.0."""
    global _COMPRESS_UDF
    if _COMPRESS_UDF is None:
        # module-level pandas import (below) is required: pandas_udf
        # resolves the STRING annotations (future-annotations module)
        # against the function's globals, so `pd` must live there.
        from pyspark.sql.functions import pandas_udf

        # array<long> [n_bytes, n_compressed] rather than a struct: the
        # struct-returning (Series -> DataFrame) signature is rejected
        # under `from __future__ import annotations` (string annotations).
        @pandas_udf("array<long>")
        def _stats(texts: pd.Series) -> pd.Series:
            import zlib

            out = []
            for t in texts:
                raw = (t or "").encode("utf-8")
                out.append([len(raw), len(zlib.compress(raw, 6))])
            return pd.Series(out)

        _COMPRESS_UDF = _stats
    if level != 6:
        raise ValueError(
            "compression_stats pins zlib level 6 (the cached-UDF default); "
            f"got level={level}"
        )
    st = _COMPRESS_UDF(F.col(text_col))
    nb, nc = st[0], st[1]
    return docs.select(
        F.col(id_col).alias("id"),
        nb.alias("n_bytes"),
        nc.alias("n_compressed"),
        F.round(
            F.when(nb > 0, nc.cast("double") / nb.cast("double")).otherwise(F.lit(0.0)),
            digits,
        ).alias("compression_ratio"),
    )


#: Demo blocklists for :func:`toxicity_screen` — one category -> word
#: tuple each, deliberately MILD stand-ins exercising the machinery (a
#: real deployment swaps in its own taxonomy, e.g. an LDNOOBW-style
#: list, via the ``categories=`` parameter).  Words must be lowercase
#: ASCII alphanumerics so the generated alternation is regex-safe and
#: the ``\b`` boundaries mean the same thing in Java regex and RE2
#: (both define ``\b`` against the ASCII word class) — the same
#: portability subset discipline as functions/text.py PII_PATTERNS.
TOXICITY_BLOCKLISTS: dict[str, tuple[str, ...]] = {
    "profanity": ("damn", "hell", "crap", "bastard"),
    "violence": ("kill", "murder", "assault", "slaughter", "massacre"),
    "sexual": ("porn", "nude", "xxx", "erotic"),
    "harassment": ("idiot", "stupid", "loser", "moron"),
}


def blocklist_pattern(words: tuple[str, ...]) -> str:
    """Whole-word alternation over a category word list, portable across
    Java regex and RE2 (DuckDB).  Exact-token matching by design —
    inflected forms belong in the list, not in suffix magic the two
    engines might disagree on."""
    import re as _re

    for w in words:
        if not _re.fullmatch(r"[a-z0-9]+", w):
            raise ValueError(f"blocklist words must be lowercase alnum: {w!r}")
    return r"\b(?:" + "|".join(words) + r")\b"


def toxicity_screen(
    docs: DataFrame,
    categories: dict[str, tuple[str, ...]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_<category>..., n_blocked, flagged): per-document match
    counts against per-category blocklists — the standard corpus-curation
    screen beside PII (counts feed thresholds downstream; a hard drop on
    any match is ``flagged = 1``).  Counting, not redaction: counts are
    engine-portable where replacement semantics are not (the pii_screen
    precedent).

    JVM-side ``regexp_count`` over ``lower(text)`` per category —
    whole-stage-codegen projection, shuffle-free, survives any scale by
    construction."""
    cats = categories or TOXICITY_BLOCKLISTS
    low = F.lower(F.col(text_col))
    counts = {
        c: F.regexp_count(low, F.lit(blocklist_pattern(ws))) for c, ws in cats.items()
    }
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    return docs.select(
        id_col,
        *[col.alias(f"n_{c}") for c, col in counts.items()],
        total.alias("n_blocked"),
        (total > 0).cast("int").alias("flagged"),
    )


def distinct_ngram_diversity(
    docs: DataFrame,
    n: int = 2,
    group_col: str = "source",
    text_col: str = "text",
    digits: int = 7,
) -> DataFrame:
    """(group, n_ngrams, n_distinct, distinct_ratio): distinct-n
    diversity per group — the share of n-gram OCCURRENCES that are
    distinct types (Li et al. 2016's distinct-n, the standard
    mode-collapse / templated-content readout).  A source whose docs are
    stamped from one template scores near 0; diverse prose scores high.
    Complements zipf_fit (distribution shape) and repetition_signals
    (within-doc): this one is ACROSS docs within a group.

    Scale shape: one explode to (group, ngram) rows, then a two-level
    aggregation — count per (group, ngram) with map-side combine, then
    per-group totals — so the shuffle carries compact n-gram keys, never
    documents, and no COUNT DISTINCT expansion (the distinct count is
    the row count of the first level)."""
    from bigdata_hits_spark.sources.readers import spread_small_scan

    # Keyed on the text itself: the group column has too few distinct
    # values to spread evenly (a handful of sources vs 32 partitions).
    docs = spread_small_scan(
        docs.select(F.col(group_col).alias("grp"), F.col(text_col).alias("__t")),
        "__t",
    )
    grams = docs.select(
        "grp",
        F.explode(_ngram_terms("__t", n)).alias("ng"),
    )
    per_gram = grams.groupBy("grp", "ng").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy("grp")
        .agg(
            F.sum("c").alias("n_ngrams"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_ngrams",
            "n_distinct",
            F.round(F.col("n_distinct") / F.col("n_ngrams"), digits).alias(
                "distinct_ratio"
            ),
        )
    )


def vocab_coverage(
    df: DataFrame,
    top_n: int = 100,
    text_col: str = "text",
    digits: int = 6,
) -> DataFrame:
    """Vocabulary-truncation plan: the ``top_n`` corpus tokens by
    frequency with ``(token, cnt, rank, cum_share)`` — the cumulative
    token-mass coverage a tokenizer/vocab of that size would reach.
    The standard first artifact of tokenizer training: pick the vocab
    cut where cum_share crosses the budget (0.95/0.99/...).

    Scale shape: one hash-agg over exploded tokens (map-side combine
    reduces each partition to its distinct types before the exchange),
    then a DISTRIBUTED top-k (``orderBy().limit()`` = per-partition
    top-n + driver-side merge of n-row heads, never a global sort of
    the vocabulary), and only then the single-partition running-sum
    window — over exactly ``top_n`` rows, not the corpus vocabulary.
    The prefix property makes this exact: the running sum over the
    top-n rows in global order equals the global prefix sums.  The
    grand total rides a broadcast one-row cross join (no driver
    collect)."""
    from bigdata_hits_spark.functions.text import tokens

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("__total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "token",
            "cnt",
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), F.col("token")))
            .cast("long")
            .alias("rank"),
            F.round(
                F.sum("cnt").over(w).cast("double") / F.col("__total"), digits
            ).alias("cum_share"),
        )
    )


def bpe_pair_counts(
    df: DataFrame,
    top_n: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """First BPE merge iteration at corpus scale: the ``top_n`` adjacent
    character pairs by corpus frequency, ``(pair, cnt, rank)`` — the
    pair the tokenizer trainer would merge next (Sennrich et al. 2016).
    A full BPE train is this, re-run per merge against the evolving
    symbol table; the per-iteration dataflow is what needs an engine.

    Scale shape: pair generation runs on the DISTINCT-WORD table
    weighted by word frequency (the classic trick — corpus positions
    collapse to the type table before any character work), via a
    JVM-side ``transform(sequence(...))`` array expression, no Python
    UDF.  Two hash-aggs (word counts, pair counts) and a distributed
    top-k; nothing single-partition except the final ``top_n`` rows."""
    from bigdata_hits_spark.functions.text import tokens

    wc = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # sequence(1, 0) would be DESCENDING in Spark, not empty — guard
    # single-char words explicitly.
    pairs = wc.select(
        F.explode(
            F.when(
                F.length("word") >= 2,
                F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
        "cnt",
    )
    pc = pairs.groupBy("pair").agg(F.sum("cnt").alias("cnt"))
    top = pc.orderBy(F.col("cnt").desc(), F.col("pair")).limit(top_n)
    return top.select(
        "pair",
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("pair")))
        .cast("long")
        .alias("rank"),
    )


def bpe_train(
    df: DataFrame,
    merges: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Multi-merge BPE trainer (Sennrich et al. 2016): ``merges``
    successive merge iterations over the corpus, each round re-pairing
    against the symbol table the previous round's merge produced —
    the loop :func:`bpe_pair_counts` computes one step of (VERDICT r12
    #6).  Returns the merge table ``(merge_idx, left, right, merged,
    cnt)`` — the artifact a tokenizer ships.

    Scale shape: all character work runs on the DISTINCT-WORD table
    weighted by corpus frequency (positions collapse before any symbol
    work — the classic trick; the working set is vocabulary-sized, not
    corpus-sized).  Per round: one pair-count hash agg over the symbol
    arrays (JVM-side ``transform``/``explode``, no Python UDF), a
    distributed top-1 (``orderBy.limit(1)`` = TakeOrdered, one scalar to
    the driver — the same k-bounded driver loop as k-means), and the
    greedy merge as a JVM-side ``aggregate`` fold over each word's
    symbol array, applied only to words containing the pair.  Words
    reduced to one symbol can never pair again and are dropped from the
    working set.  Each round ends in :func:`materialize` — the adaptive
    size-estimate guard exists precisely for such loops.

    Greedy semantics: non-overlapping left-to-right occurrences merge
    (``aaa`` + pair (a,a) -> ``[aa, a]``), matching the reference BPE
    implementation; a fold whose accumulator checks only its last
    element implements exactly that, because within one round the
    merged symbol ``l||r`` can never equal ``l``.  Tiebreak: highest
    count, then lexicographic (left, right) — deterministic across
    partitionings."""
    from bigdata_hits_spark.functions.text import tokens
    from bigdata_hits_spark.plans.iterate import materialize

    wc = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # length >= 2 BEFORE the char split: shorter words contribute no
    # pairs, and sequence(1, 0) on the empty token (double spaces) would
    # be DESCENDING, fabricating two empty symbols.
    words = wc.filter(F.length("word") >= 2).select(
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
        "cnt",
    )
    words = materialize(words)
    out_rows: list[tuple[int, str, str, str, int]] = []
    for m in range(merges):
        pairs = words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i - 1] AS l, syms[i] AS r))"
                )
            ).alias("p"),
            "cnt",
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break  # vocabulary exhausted (every word is one symbol)
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        out_rows.append((m, left, right, left + right, cnt))
        lc, rc = F.lit(left), F.lit(right)
        fold = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            # F.get (0-based) returns NULL on the empty accumulator
            # instead of an ANSI out-of-bounds error; NULL == l is NULL,
            # so the when() falls through to append — no short-circuit
            # assumption needed.
            lambda acc, x: F.when(
                (F.get(acc, F.size(acc) - 1) == lc) & (x == rc),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(lc, rc)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        has_pair = F.exists(
            F.expr(
                "transform(sequence(1, size(syms) - 1), "
                "i -> struct(syms[i - 1] AS l, syms[i] AS r))"
            ),
            lambda p: (p["l"] == lc) & (p["r"] == rc),
        )
        words = materialize(
            words.select(
                F.when(has_pair, fold).otherwise(F.col("syms")).alias("syms"),
                "cnt",
            ).filter(F.size("syms") >= 2)
        )
    spark = df.sparkSession
    return spark.createDataFrame(
        out_rows, "merge_idx long, left string, right string, merged string, cnt long"
    )


def bpe_encode_token_counts(
    df: DataFrame,
    merges: int = 4,
    text_col: str = "text",
    group_col: str = "source",
    digits: int = 6,
) -> DataFrame:
    """Train ``merges`` BPE merges (:func:`bpe_train`) and ENCODE the
    corpus under them: per ``group_col``, ``(group, n_tokens, n_chars,
    n_bpe_symbols, symbols_per_char)`` — the token-budget readout a
    pretraining mix actually consumes (how many sequence positions each
    source costs under the tokenizer trained on this corpus; lower
    symbols_per_char = better compressed by the learned vocabulary).

    Scale shape: the merge table is k rows on the driver (the same
    k-bounded collect the trainer already does); encoding applies the k
    merge folds NESTED IN ONE PROJECTION over the distinct-word table
    (vocabulary-sized, one pass, zero shuffles beyond its hash agg),
    then one broadcast-sized join back to per-(group, word) counts and
    a group-count-sized rollup.  Corpus bodies are read once."""
    from bigdata_hits_spark.functions.text import tokens

    merge_rows = bpe_train(df, merges, text_col).orderBy("merge_idx").collect()
    per = (
        df.select(F.col(group_col), F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") >= 1)  # empty tokens cost no positions
        .groupBy(group_col, "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    syms = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )

    def _fold(col, lc, rc):
        # closure factory: F.aggregate introspects the lambda's arity,
        # so the pair literals can't ride as default args
        return F.aggregate(
            col,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.get(acc, F.size(acc) - 1) == lc) & (x == rc),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(lc, rc)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )

    for r in merge_rows:
        syms = _fold(syms, F.lit(r["left"]), F.lit(r["right"]))
    sizes = (
        per.select("word")
        .distinct()
        .select("word", F.size(syms).cast("long").alias("n_syms"))
    )
    tot_syms = F.sum(F.col("n") * F.col("n_syms"))
    tot_chars = F.sum(F.col("n") * F.length("word"))
    return (
        per.join(sizes, "word")
        .groupBy(group_col)
        .agg(
            F.sum("n").alias("n_tokens"),
            tot_chars.cast("long").alias("n_chars"),
            tot_syms.cast("long").alias("n_bpe_symbols"),
            F.round(tot_syms / tot_chars, digits).alias("symbols_per_char"),
        )
    )


def chunk_tokens(
    docs: DataFrame,
    chunk: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, n_chunk_tokens, chunk_text): fixed-size
    token-window chunks with overlap — the standard pretraining-prep
    step that turns variable-length documents into model-context-sized
    training examples while the ``chunk - stride`` token overlap
    preserves cross-boundary context (the sliding-window convention of
    GPT-2-style packing and every RAG chunker).

    Chunk ``i`` covers whitespace tokens ``[i*stride, i*stride+chunk)``
    (clamped to the document end); a document emits
    ``1 + ceil((n - chunk)/stride)`` chunks when ``n > chunk``, else
    exactly one, so every token lands in >= 1 chunk and no start offset
    is wasted on a pure-suffix duplicate.

    Scale shape (100 TB): pure per-row arithmetic — one ``sequence`` +
    ``explode`` + ``slice`` per document, ZERO shuffles and no UDF; the
    output is data-parallel with the input scan, and the ~chunk/stride
    row fan-out is the unavoidable output size, not an intermediate.
    """
    if not (0 < stride <= chunk):
        raise ValueError(f"need 0 < stride <= chunk, got {stride=} {chunk=}")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.when(n <= chunk, F.lit(1)).otherwise(
        (F.lit(1) + F.ceil((n - F.lit(chunk)).cast("double") / F.lit(stride))).cast("int")
    )
    return (
        docs.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.slice(
                F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk
            ).alias("__ct"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("__ct").cast("long").alias("n_chunk_tokens"),
            F.array_join("__ct", " ").alias("chunk_text"),
        )
    )
