"""Unit tests for repetition signals, contamination screening, and PII
scan/redaction (operators/textstats.py, functions/text.py)."""

import pytest
from pyspark.sql import Row, functions as F

from bigdata_hits_spark.functions import text as TX
from bigdata_hits_spark.operators import textstats


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="a b a b a c"),  # 6 tokens: a×3; bigram "a b"×2 of 5
            Row(doc_id=1, text="x x x x"),  # all same: token frac 1.0, bigram 1.0
            Row(doc_id=2, text="solo"),  # single token: bigram frac 0.0
            Row(doc_id=3, text="p q r s t u v w"),  # all distinct
        ]
    )


def test_repetition_signals(docs):
    rows = {
        r["doc_id"]: r
        for r in textstats.repetition_signals(docs).collect()
    }
    assert rows[0]["top_token_frac"] == pytest.approx(3 / 6)
    assert rows[0]["top_bigram_frac"] == pytest.approx(2 / 5)
    assert rows[1]["top_token_frac"] == 1.0
    assert rows[1]["top_bigram_frac"] == 1.0
    assert rows[2]["top_token_frac"] == 1.0
    assert rows[2]["top_bigram_frac"] == 0.0  # no bigrams in a 1-token doc
    assert rows[3]["top_token_frac"] == pytest.approx(1 / 8)
    assert rows[3]["top_bigram_frac"] == pytest.approx(1 / 7)


def test_ngram_overlap_counts(spark):
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="completely disjoint words here only"),
            Row(doc_id=3, text="short"),  # shorter than n: zero n-grams, no row
        ]
    )
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="quick brown fox jumps away now")]
    )
    out = {
        r["doc_id"]: r
        for r in textstats.ngram_overlap(corpus, bench, n=4).collect()
    }
    # doc 1 shares exactly one 4-gram: "quick brown fox jumps"
    assert out[1]["n_overlap"] == 1
    assert out[1]["n_ngrams"] == 6
    assert out[1]["contaminated_frac"] == pytest.approx(1 / 6)
    # clean and too-short docs emit no rows
    assert 2 not in out and 3 not in out


def test_ngram_overlap_shuffle_mode_matches(spark):
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=f"w{i} common run of tokens t{i}") for i in range(6)]
    )
    bench = spark.createDataFrame([Row(doc_id=99, text="common run of tokens")])
    a = textstats.ngram_overlap(corpus, bench, n=4, broadcast_benchmark=True)
    b = textstats.ngram_overlap(corpus, bench, n=4, broadcast_benchmark=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_tfidf_values(spark):
    import math

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a"),  # a: tf 2/3, df 2; b: tf 1/3, df 1
            Row(doc_id=2, text="a c"),
        ]
    )
    out = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in textstats.tfidf(docs).collect()
    }
    assert out[(1, "a")] == pytest.approx(2 / 3 * math.log(2 / 2))  # idf 0
    assert out[(1, "b")] == pytest.approx(1 / 3 * math.log(2 / 1), abs=1e-6)
    assert out[(2, "c")] == pytest.approx(1 / 2 * math.log(2 / 1), abs=1e-6)


def test_tfidf_as_hits_edge_weight(spark):
    """The reference's weighted_HITS_tfidf shape: tf-idf scores joined
    onto an edge list as the weight column hits() consumes."""
    import bigdata_hits_spark as bhs

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="x y x"), Row(doc_id=2, text="y z")]
    )
    w = textstats.tfidf(docs)
    edges = (
        w.select(
            F.concat(F.lit("D"), "doc_id").alias("src"),
            F.concat(F.lit("T"), "term").alias("dst"),
            F.col("tfidf").alias("weight"),
        )
        .filter(F.col("tfidf") > 0)
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select("dst"))
        .distinct()
        .withColumn("labels", F.lit("n"))
    )
    res = bhs.hits(bhs.Graph(nodes=nodes, edges=edges), k=2, weight="weight")
    assert res.hubs.count() > 0 and res.auths.count() > 0


def test_pii_counts_and_redact(spark):
    df = spark.createDataFrame(
        [
            Row(
                id=1,
                text=(
                    "mail bob.smith+x@example.co.uk call +1 (415) 555-0199 "
                    "ssn 123-45-6789 host 10.0.0.255 done"
                ),
            ),
            Row(id=2, text="no pii at all"),
        ]
    )
    counts = df.select("id", *TX.pii_counts(F.col("text")).values()).collect()
    by_id = {r["id"]: r for r in counts}
    assert by_id[1]["n_email"] == 1
    assert by_id[1]["n_ssn"] == 1
    assert by_id[1]["n_ipv4"] == 1
    assert by_id[1]["n_phone"] >= 1  # phone pattern also covers ssn/ip shapes
    assert all(by_id[2][c] == 0 for c in ("n_email", "n_phone", "n_ssn", "n_ipv4"))

    red = {r["id"]: r["red"] for r in df.select("id", TX.redact_pii(F.col("text")).alias("red")).collect()}
    assert "<EMAIL>" in red[1] and "<SSN>" in red[1] and "<IPV4>" in red[1] and "<PHONE>" in red[1]
    assert "example.co.uk" not in red[1]
    assert "123-45-6789" not in red[1]
    assert "10.0.0.255" not in red[1]
    assert red[2] == "no pii at all"


def test_unigram_logprob_ranks_common_above_rare(spark):
    """Documents made of corpus-common tokens must score higher than
    rare-token gibberish; exact smoothed values check against hand math."""
    import math

    rows = [(i, "the cat sat") for i in range(9)] + [(9, "zxqv jklm")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textstats.unigram_logprob(df).collect()}
    assert got[0]["n_tokens"] == 3 and got[9]["n_tokens"] == 2
    assert got[0]["avg_logprob"] > got[9]["avg_logprob"]
    # hand-check: vocab = {the, cat, sat, zxqv, jklm} (V=5), total=29
    # p(common) = (9+1)/(29+5); p(rare) = (1+1)/(29+5)
    assert got[0]["avg_logprob"] == pytest.approx(math.log(10 / 34), abs=1e-6)
    assert got[9]["avg_logprob"] == pytest.approx(math.log(2 / 34), abs=1e-6)


def test_canonical_url(spark):
    from bigdata_hits_spark.functions.text import canonical_url
    from pyspark.sql import functions as F

    cases = {
        # tracking params dropped, survivors sorted, www + fragment gone
        "HTTPS://WWW.Example.com:443/a/b/?b=2&utm_source=x&a=1#frag":
            "https://example.com/a/b?a=1&b=2",
        "http://example.com:80/path/": "http://example.com/path",
        # param order cannot split a dup group
        "http://e.com/p?z=1&a=2": "http://e.com/p?a=2&z=1",
        "http://e.com/p?a=2&z=1": "http://e.com/p?a=2&z=1",
        # fully-stripped query drops its '?'
        "http://e.com/p?gclid=abc": "http://e.com/p",
        # path case preserved; root slash == empty
        "http://e.com/CaseSensitive": "http://e.com/CaseSensitive",
        "http://e.com/": "http://e.com",
        # scheme-less input survives
        "www.e.com/x?fbclid=1": "e.com/x",
        # content-selecting params (e.g. GitHub ?ref=<branch>) are NOT
        # dropped by default — only unambiguous tracking names are
        "http://e.com/tree?ref=main&sid=42": "http://e.com/tree?ref=main&sid=42",
    }
    df = spark.createDataFrame([(u,) for u in cases] + [(None,)], ["url"])
    got = {
        r["url"]: r["canon"]
        for r in df.select("url", canonical_url(F.col("url")).alias("canon")).collect()
    }
    for raw, want in cases.items():
        assert got[raw] == want, (raw, got[raw])
    assert got[None] is None

    # opt-in: a corpus that treats ref/sid as noise passes them explicitly
    extra = df.filter(F.col("url").contains("tree")).select(
        canonical_url(F.col("url"), drop_params=("ref", "sid")).alias("canon")
    )
    assert extra.first()["canon"] == "http://e.com/tree"


def test_bm25_weights_hand_check(spark):
    import math

    from bigdata_hits_spark.operators.textstats import bm25_weights

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "c c c c c")], "doc_id long, text string"
    )
    got = {(r["doc_id"], r["term"]): r["bm25"] for r in bm25_weights(docs).collect()}
    # N=3, avgdl = (3+2+5)/3; term 'a': df=2; doc 1: tf=2, dl=3
    n, avgdl, k1, b = 3, 10 / 3, 1.2, 0.75
    idf_a = math.log((n - 2 + 0.5) / (2 + 0.5) + 1)
    w = idf_a * 2 * (k1 + 1) / (2 + k1 * (1 - b + b * 3 / avgdl))
    assert got[(1, "a")] == pytest.approx(w, abs=1e-6)
    # rarer term outranks a common one at equal tf/dl: df('b')=1 < df('a')=2
    assert got[(1, "b")] > 0 and got[(1, "b")] < got[(1, "a")] * 10
    idf_b = math.log((n - 1 + 0.5) / (1 + 0.5) + 1)
    assert idf_b > idf_a
    # tf saturation: 5 occurrences of 'c' score < 5x one occurrence's weight
    one_c = got[(2, "c")]
    five_c = got[(3, "c")]
    assert five_c < 5 * one_c


def test_collocations_pmi_ranks_bound_pairs(spark):
    import math

    from bigdata_hits_spark.operators.textstats import collocations

    # "new york" always co-occurs; "of the" parts are everywhere.
    docs = spark.createDataFrame(
        [
            (1, "new york is big and the map of the city"),
            (2, "new york and the story of the people"),
            (3, "the end of the day in new york"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["a"], r["b"]): (r["c_ab"], r["pmi"])
        for r in collocations(docs, min_count=2).collect()
    }
    assert ("new", "york") in got and ("of", "the") in got
    assert got[("new", "york")][0] == 3
    # the bound pair outranks the stop-word pair: both always co-occur
    # here, but "the" also appears standalone, diluting p(the)
    assert got[("new", "york")][1] > got[("of", "the")][1] + 0.5
    # hand-check the PMI arithmetic for (new, york): c_ab=3, c_new=c_york=3
    rows = docs.select(F.explode(F.split("text", " ")).alias("t")).count()
    n_bigrams = sum(len(t.split(" ")) - 1 for t in [r["text"] for r in docs.collect()])
    expect = math.log(3) + 2 * math.log(rows) - math.log(n_bigrams) - 2 * math.log(3)
    assert got[("new", "york")][1] == pytest.approx(expect, abs=1e-6)
    # min_count prunes singletons before the joins
    assert all(c >= 2 for c, _ in got.values())


def test_feature_hash_buckets_and_counts(spark):
    from bigdata_hits_spark.operators.textstats import feature_hash

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a")], "doc_id long, text string"
    )
    out = feature_hash(docs, n_features=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["bucket"]] = r["tf"]
    # same token -> same bucket in every doc; counts are per-doc tfs
    (a_bucket,) = [b for b, tf in by_doc[1].items() if tf == 2]
    assert by_doc[2] == {a_bucket: 1}
    assert all(0 <= r["bucket"] < 8 for r in out)
    # doc 1 has exactly two distinct tokens -> at most two buckets
    assert len(by_doc[1]) == 2


def test_bigram_lm_conditional_logp_and_tail_prune(spark):
    import math

    from bigdata_hits_spark.operators.textstats import bigram_lm

    docs = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id long, text string"
    )
    out = {(r["w1"], r["w2"]): r for r in bigram_lm(docs, min_count=1).collect()}
    # bigrams: (a,b)x2 (b,a)x2 (a,c)x1 -> p(b|a)=2/3, p(c|a)=1/3, p(a|b)=1
    assert out[("a", "b")]["n"] == 2
    assert out[("a", "b")]["logp"] == round(math.log(2 / 3), 6)
    assert out[("a", "c")]["logp"] == round(math.log(1 / 3), 6)
    assert out[("b", "a")]["logp"] == 0.0
    # min_count prunes AFTER normalization: survivors keep their probs
    pruned = {
        (r["w1"], r["w2"]): r for r in bigram_lm(docs, min_count=2).collect()
    }
    assert ("a", "c") not in pruned
    assert pruned[("a", "b")]["logp"] == round(math.log(2 / 3), 6)


def test_url_host_forms(spark):
    from bigdata_hits_spark.functions.text import url_host

    cases = [
        ("https://WWW.Example.com:8080/x?a=1#f", "example.com"),
        ("http://user:pw@Foo.Bar.org/p", "foo.bar.org"),
        ("example.com/path", "example.com"),
        ("https:///nohost/path", None),
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["h"] for r in df.select(url_host(F.col("url")).alias("h")).collect()]
    assert got == [h for _, h in cases]


def test_normalize_text_canonical_form(spark):
    from bigdata_hits_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [("  Hello\tWorld\r\n  FOO\x07bar  ",), (None,)], "t string"
    )
    got = [r["n"] for r in df.select(normalize_text(F.col("t")).alias("n")).collect()]
    assert got == ["hello world foo bar", None]


def test_normalize_vs_canonicalize_punctuation(spark):
    """normalize_text PRESERVES punctuation (only control chars /
    whitespace / case fold); canonicalize_text strips every
    non-alphanumeric run.  Pins the two functions apart so a rename or
    re-shadowing regression on punctuated text fails loudly (the
    synthetic corpus has no punctuation, so only this test sees it)."""
    from bigdata_hits_spark.functions.text import canonicalize_text, normalize_text

    df = spark.createDataFrame([("  Hello, World!\t(Par-t #2)  ",)], "t string")
    row = df.select(
        normalize_text(F.col("t")).alias("norm"),
        canonicalize_text(F.col("t")).alias("canon"),
    ).first()
    assert row["norm"] == "hello, world! (par-t #2)"
    assert row["canon"] == "hello world par t 2"


def test_domain_mix_shares_sum_to_one(spark):
    from bigdata_hits_spark.operators.textstats import domain_mix

    df = spark.createDataFrame(
        [
            ("https://a.com/1",), ("http://www.a.com/2",), ("b.org/x",),
            ("https:///none",),
        ],
        "url string",
    )
    rows = {r["host"]: r for r in domain_mix(df, "url").collect()}
    assert rows["a.com"]["n_docs"] == 2 and rows["a.com"]["share"] == 0.5
    assert rows["b.org"]["n_docs"] == 1
    assert rows[None]["n_docs"] == 1  # URL without a host still counts
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-9


def test_zipf_fit_recovers_planted_power_law(spark):
    import math

    from bigdata_hits_spark.operators.textstats import zipf_fit

    # plant freq(rank) = round(1000 * rank^-1): t1 x1000, t2 x500, ...
    words = []
    for r in range(1, 21):
        words += [f"t{r:02d}"] * round(1000 / r)
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    out = zipf_fit(docs).collect()[0]
    assert out["n_types"] == 20
    assert abs(out["slope"] + 1.0) < 0.02  # near-exact -1 power law
    assert out["r2"] > 0.999
    # brute-force the same OLS
    pts = [(math.log(r), math.log(round(1000 / r))) for r in range(1, 21)]
    mx = sum(x for x, _ in pts) / 20
    my = sum(y for _, y in pts) / 20
    cov = sum((x - mx) * (y - my) for x, y in pts) / 20
    vx = sum((x - mx) ** 2 for x, _ in pts) / 20
    assert abs(out["slope"] - cov / vx) < 1e-6


def test_zipf_fit_single_type_yields_nulls(spark):
    from bigdata_hits_spark.operators.textstats import zipf_fit

    docs = spark.createDataFrame([(1, "a a a")], "doc_id long, text string")
    out = zipf_fit(docs).collect()[0]
    assert out["n_types"] == 1 and out["slope"] is None and out["r2"] is None


def test_keywords_per_group_scores_and_topk(spark):
    import math

    from bigdata_hits_spark.operators.textstats import keywords_per_group

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana", "A"),
            (2, "apple cherry", "A"),
            (3, "banana banana", "B"),
            (4, "cherry dates dates", "B"),
        ],
        "doc_id long, text string, source string",
    )
    out = keywords_per_group(docs, k=2)
    rows = {(r.source, r.term): r for r in out.collect()}
    # df: apple 2, banana 2, cherry 2, dates 1; N=4
    assert rows[("A", "apple")].tf == 3
    assert rows[("A", "apple")].score == round(3 * math.log(4 / 2), 6)
    assert rows[("B", "dates")].score == round(2 * math.log(4 / 1), 6)
    # top-2 per group only
    counts = {}
    for (g, _t), _ in rows.items():
        counts[g] = counts.get(g, 0) + 1
    assert counts == {"A": 2, "B": 2}
    # dates (idf ln4) outranks banana (tf2 * ln2 = 1.386 < 2.77)
    assert ("B", "dates") in rows and ("B", "banana") in rows


def test_sentence_stats_shapes(spark):
    from bigdata_hits_spark.operators.textstats import sentence_stats

    docs = spark.createDataFrame(
        [
            (1, "One two. Three four five! Six?"),
            (2, "No terminator here at all"),
            (3, "Trailing. "),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in sentence_stats(docs).collect()}
    assert out[1]["n_sentences"] == 3
    assert out[1]["avg_sentence_tokens"] == round((2 + 3 + 1) / 3, 6)
    assert out[1]["max_sentence_tokens"] == 3
    assert out[2]["n_sentences"] == 1 and out[2]["avg_sentence_tokens"] == 5.0
    assert out[3]["n_sentences"] == 1 and out[3]["max_sentence_tokens"] == 1


def test_readability_hand_example(spark):
    from bigdata_hits_spark.operators.textstats import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "word")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in readability(df).collect()}
    r1 = rows[1]
    # 6 words, 2 sentence runs, syllable groups: e/a/a/e/o/a -> 6
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    assert r1["n_syllables"] == 6
    assert abs(r1["flesch"] - (206.835 - 1.015 * 3.0 - 84.6 * 1.0)) < 1e-6
    # fragment with no terminator: sentence count floored at 1
    assert rows[2]["n_sentences"] == 1


def test_compression_stats_orders_repetition_below_prose(spark):
    """Repetitive text compresses far below varied prose; tiny/empty
    inputs behave; deterministic across partitionings."""
    import pytest

    from bigdata_hits_spark.operators.textstats import compression_stats

    rows = [
        (1, "spam ham " * 500),
        (2, " ".join(f"w{i * 7919 % 10007}x{i}" for i in range(1000))),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in compression_stats(df).collect()}
    assert got[1]["compression_ratio"] < 0.05
    assert got[2]["compression_ratio"] > 0.3
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"]
    assert got[3]["n_bytes"] == 0 and got[3]["compression_ratio"] == 0.0
    assert got[4]["n_bytes"] == 0
    import zlib

    raw = rows[0][1].encode("utf-8")
    assert got[1]["n_bytes"] == len(raw)
    assert got[1]["n_compressed"] == len(zlib.compress(raw, 6))
    again = {r["id"]: tuple(r) for r in compression_stats(df.repartition(3)).collect()}
    assert again == {k: tuple(v) for k, v in got.items()}
    with pytest.raises(ValueError, match="level 6"):
        compression_stats(df, level=1)


def test_toxicity_screen_known_counts(spark):
    rows = {
        r["doc_id"]: r
        for r in textstats.toxicity_screen(
            spark.createDataFrame(
                [
                    Row(doc_id=0, text="Damn the HELL out of it"),
                    Row(doc_id=1, text="the killer kill kills nothing"),
                    Row(doc_id=2, text="porn and an idiot walk in"),
                    Row(doc_id=3, text=""),
                    Row(doc_id=4, text="perfectly clean prose"),
                ]
            )
        ).collect()
    }
    # case-insensitive whole-word counts
    assert rows[0]["n_profanity"] == 2 and rows[0]["flagged"] == 1
    # word boundaries: "killer"/"kills" do NOT match "kill"
    assert rows[1]["n_violence"] == 1 and rows[1]["n_blocked"] == 1
    assert rows[2]["n_sexual"] == 1 and rows[2]["n_harassment"] == 1
    assert rows[2]["n_blocked"] == 2 and rows[2]["flagged"] == 1
    for i in (3, 4):
        assert rows[i]["n_blocked"] == 0 and rows[i]["flagged"] == 0


def test_toxicity_screen_custom_categories_and_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="foo bar foo")])
    out = textstats.toxicity_screen(df, categories={"custom": ("foo",)}).first()
    assert out["n_custom"] == 2 and out.asDict().keys() == {
        "doc_id", "n_custom", "n_blocked", "flagged"
    }
    with pytest.raises(ValueError, match="lowercase alnum"):
        textstats.blocklist_pattern(("Bad Word",))


def test_distinct_ngram_diversity_known_ratios(spark):
    df = spark.createDataFrame(
        [
            (0, "tmpl", "a b a b"),    # bigrams: ab, ba, ab -> 3 occ, 2 types
            (1, "tmpl", "a b"),        # ab -> total 4 occ, 2 types = 0.5
            (2, "rich", "p q r s"),    # pq qr rs -> 3 occ, 3 types = 1.0
            (3, "tiny", "x"),          # shorter than n: no bigrams, no row
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        r["source"]: r
        for r in textstats.distinct_ngram_diversity(df).collect()
    }
    assert rows["tmpl"]["n_ngrams"] == 4 and rows["tmpl"]["n_distinct"] == 2
    assert rows["tmpl"]["distinct_ratio"] == 0.5
    assert rows["rich"]["distinct_ratio"] == 1.0
    assert "tiny" not in rows


def test_vocab_coverage_exact_shares(spark):
    from bigdata_hits_spark.operators.textstats import vocab_coverage

    df = spark.createDataFrame(
        [(0, "a a a b"), (1, "b c")], "doc_id long, text string"
    )
    rows = {r["token"]: r for r in vocab_coverage(df, top_n=10).collect()}
    assert rows["a"]["rank"] == 1 and rows["a"]["cnt"] == 3
    assert rows["a"]["cum_share"] == 0.5
    assert rows["b"]["rank"] == 2 and rows["b"]["cum_share"] == round(5 / 6, 6)
    assert rows["c"]["rank"] == 3 and rows["c"]["cum_share"] == 1.0
    # Prefix property: a truncated top-n reports the SAME shares.
    top2 = {r["token"]: r for r in vocab_coverage(df, top_n=2).collect()}
    assert set(top2) == {"a", "b"}
    assert top2["b"]["cum_share"] == rows["b"]["cum_share"]


def test_bpe_pair_counts_and_single_char_guard(spark):
    """Pair counts weight the distinct-word table by word frequency;
    single-char words contribute nothing (the sequence(1, 0) descending
    pitfall must not fabricate pairs)."""
    from bigdata_hits_spark.operators.textstats import bpe_pair_counts

    df = spark.createDataFrame(
        [(0, "ab ab x"), (1, "abc x x")], "doc_id long, text string"
    )
    rows = {r["pair"]: r for r in bpe_pair_counts(df, top_n=10).collect()}
    assert rows["ab"]["cnt"] == 3 and rows["ab"]["rank"] == 1
    assert rows["bc"]["cnt"] == 1 and rows["bc"]["rank"] == 2
    assert set(rows) == {"ab", "bc"}


def test_bpe_train_hand_computed_merges(spark):
    """bpe_train: four merges over a hand-computable corpus — pair
    counts weight the distinct-word table by frequency, overlapping
    occurrences count but merge greedily non-overlapping left-to-right
    (aaa + (a,a) -> [aa, a]), ties break lexicographic on (left, right),
    and fully-merged words drop out of the working set."""
    from bigdata_hits_spark.operators.textstats import bpe_train

    # the double space yields an EMPTY token — it must contribute no
    # pairs (the sequence(1, 0)-descending pitfall would fabricate two
    # empty symbols from it)
    df = spark.createDataFrame(
        [(0, "aaa  bb"), (1, "aaa aaa"), (2, "ab")], "doc_id long, text string"
    )
    # wc: aaa->3, bb->1, ab->1
    # r0: (a,a) 2x3=6 wins -> aaa becomes [aa, a]
    # r1: (aa,a) 3 wins -> aaa fully merged, drops out
    # r2: (a,b) 1 ties (b,b) 1, lexicographic -> (a,b)
    # r3: (b,b) 1
    got = [tuple(r) for r in bpe_train(df, merges=4).orderBy("merge_idx").collect()]
    assert got == [
        (0, "a", "a", "aa", 6),
        (1, "aa", "a", "aaa", 3),
        (2, "a", "b", "ab", 1),
        (3, "b", "b", "bb", 1),
    ]
    # greedy non-overlap on an even run: aaaa + (a,a) -> [aa, aa], so
    # round 1's top pair is (aa, aa)
    df2 = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id long, text string")
    got2 = [tuple(r) for r in bpe_train(df2, merges=2).orderBy("merge_idx").collect()]
    assert got2 == [(0, "a", "a", "aa", 6), (1, "aa", "aa", "aaaa", 2)]
    # vocabulary exhaustion ends the loop early instead of erroring
    df3 = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    got3 = [tuple(r) for r in bpe_train(df3, merges=4).collect()]
    assert got3 == [(0, "a", "b", "ab", 2)]


def test_bpe_encode_token_counts_hand_computed(spark):
    """bpe_encode_token_counts: after 2 merges ((a,a) then (aa,a)) the
    word 'aaa' costs 1 symbol, 'bb' and 'ab' cost 2 — per-source totals
    and symbols_per_char follow exactly."""
    from bigdata_hits_spark.operators.textstats import bpe_encode_token_counts

    df = spark.createDataFrame(
        [("s1", "aaa bb"), ("s1", "aaa aaa"), ("s2", "ab")],
        "source string, text string",
    )
    rows = {r["source"]: r for r in bpe_encode_token_counts(df, merges=2).collect()}
    assert rows["s1"]["n_tokens"] == 4
    assert rows["s1"]["n_chars"] == 11
    assert rows["s1"]["n_bpe_symbols"] == 3 * 1 + 2  # aaa->1 sym x3, bb->2
    assert rows["s1"]["symbols_per_char"] == pytest.approx(round(5 / 11, 6))
    assert rows["s2"]["n_tokens"] == 1
    assert rows["s2"]["n_bpe_symbols"] == 2  # ab: (a,b) never merged
    assert rows["s2"]["symbols_per_char"] == 1.0


def test_chunk_tokens_windows_and_overlap(spark):
    """chunk_tokens: a short doc emits one clamped chunk; a long doc
    emits 1 + ceil((n-chunk)/stride) windows at stride offsets with the
    final one clamped to the document end; overlap tokens repeat across
    consecutive chunks; reconstruction of the stride-prefix of every
    non-final chunk plus the full final chunk is the original text."""
    toks = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame(
        [("short", "a b c"), ("long", " ".join(toks))], "doc_id string, text string"
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in textstats.chunk_tokens(df, chunk=4, stride=3).collect()
    }
    assert out[("short", 0)] == (3, "a b c")
    assert ("short", 1) not in out
    # n=10, chunk=4, stride=3 -> 1 + ceil(6/3) = 3 chunks: [0:4), [3:7), [6:10)
    assert out[("long", 0)] == (4, "w0 w1 w2 w3")
    assert out[("long", 1)] == (4, "w3 w4 w5 w6")
    assert out[("long", 2)] == (4, "w6 w7 w8 w9")
    assert ("long", 3) not in out
    # n=11 -> ceil(7/3) = 3 extra chunks, final clamped to 2 tokens
    df2 = spark.createDataFrame([("x", " ".join(f"w{i}" for i in range(11)))],
                                "doc_id string, text string")
    rows = {r["chunk_idx"]: r for r in textstats.chunk_tokens(df2, 4, 3).collect()}
    assert len(rows) == 4 and rows[3]["chunk_text"] == "w9 w10"

    with pytest.raises(ValueError, match="stride"):
        textstats.chunk_tokens(df, chunk=4, stride=5)


def test_round_portable_matches_duckdb_twin_on_tie_neighbors(spark):
    """The floor-scale portable rounding (functions/text.py
    round_portable) and its SQL twin must agree on the EXACT doubles
    around decimal rounding ties — the values where Spark's BigDecimal
    HALF_UP and DuckDB's scaled-float ROUND legitimately diverge (the
    sf0.1 quality failures, round 13)."""
    import math

    import duckdb
    from pyspark.sql import functions as F

    from bigdata_hits_spark.functions.text import round_portable
    from bigdata_hits_spark.queries_text import portable_round_sql

    ties = [0.10546875, 0.86359375, 0.88859375, 0.22265625, 0.12345675]
    xs = []
    for t in ties:
        x = float(t)
        xs.append(x)
        xs.append(math.nextafter(x, 0.0))
        xs.append(math.nextafter(x, 2.0))
    df = spark.createDataFrame([(v,) for v in xs], "x double")
    got = [
        r["r"]
        for r in df.select(round_portable(F.col("x")).alias("r")).collect()
    ]
    con = duckdb.connect()
    expr = portable_round_sql("x")
    duck = [
        con.execute(f"SELECT {expr} AS r FROM (SELECT CAST(? AS DOUBLE) AS x)", [v]).fetchone()[0]
        for v in xs
    ]
    assert got == duck
