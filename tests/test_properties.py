"""Property-based tests (hypothesis): distributed operators vs trusted
single-node reference implementations on randomized inputs.

Sessions are expensive, so strategies are bounded and example counts kept
small; the value is shape coverage (dup timestamps, empty sides, single
users, gap edges) rather than volume.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_hits_spark.operators.asof import asof_join
from bigdata_hits_spark.operators.events import sessionize

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=10_000),  # ts (small units)
    ),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(raw=events_strategy)
def test_sessionize_matches_bruteforce(spark, raw):
    gap = 1_000
    rows = [(i, u, t) for i, (u, t) in enumerate(raw)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_ns long")
    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["start_s"], r["end_s"])
        for r in sessionize(df, gap_ns=gap).collect()
    }

    expect = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, t) in enumerate(raw):
        by_user.setdefault(u, []).append((t, i))
    for u, ts in by_user.items():
        ts.sort()
        idx, prev = 0, None
        bucket: list[int] = []
        for t, _ in ts:
            if prev is None or t - prev > gap:
                if bucket:
                    expect[(u, idx)] = (
                        len(bucket),
                        min(bucket) // 1_000_000_000,
                        max(bucket) // 1_000_000_000,
                    )
                idx += 1
                bucket = []
            bucket.append(t)
            prev = t
        expect[(u, idx)] = (
            len(bucket),
            min(bucket) // 1_000_000_000,
            max(bucket) // 1_000_000_000,
        )
    assert got == expect


_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=3, max_size=10).map(" ".join),
    min_size=2,
    max_size=6,
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=docs_strategy)
def test_minhash_pairs_sound_and_finds_identicals(spark, texts):
    """LSH+verify is SOUND (every reported pair's jaccard is the true
    jaccard and above threshold; recall is by design probabilistic) and
    COMPLETE for identical shingle sets (equal signatures always share
    every band)."""
    from bigdata_hits_spark.operators.dedup import SHINGLE_K, minhash_near_duplicates

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in minhash_near_duplicates(df, threshold=0.5).collect()
    }

    def shingles(t):
        w = t.split(" ")
        return set(" ".join(w[i : i + SHINGLE_K]) for i in range(len(w) - SHINGLE_K + 1))

    truth = {}
    for i, ti in rows:
        for j, tj in rows:
            if i < j:
                si, sj = shingles(ti), shingles(tj)
                if si | sj:
                    truth[(i, j)] = len(si & sj) / len(si | sj)
    for pair, jac in got.items():
        assert pair in truth and truth[pair] >= 0.5
        assert jac == pytest.approx(round(truth[pair], 7), abs=1e-7)
    for pair, jac in truth.items():
        if jac == 1.0:
            assert pair in got, f"identical shingle sets {pair} missed"


asof_strategy = st.tuples(
    st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 100)), min_size=1, max_size=15
    ),  # left (key, t)
    st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 100)), min_size=0, max_size=15
    ),  # right (key, t)
)


@settings(**_SETTINGS)
@given(data=asof_strategy)
def test_asof_matches_pandas_merge_asof(spark, data):
    lraw, rraw = data
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lraw)], "lid long, k long, t long"
    )
    # unique right timestamps per key keep pandas merge_asof's tie handling
    # out of play; the engine's explicit tiebreak is covered in test_asof.py
    rrows = [(100 + i, k, t) for i, (k, t) in enumerate({(k, t) for k, t in rraw})]
    if rrows:
        right = spark.createDataFrame(rrows, "rid long, k long, t long")
    else:
        right = spark.createDataFrame([], "rid long, k long, t long")
    got = {
        r["lid"]: r["rid_r"]
        for r in asof_join(
            left, right, on="t", by="k", value_cols=["rid"], tiebreak="rid"
        ).collect()
    }

    lpdf = pd.DataFrame([(i, k, t) for i, (k, t) in enumerate(lraw)], columns=["lid", "k", "t"])
    rpdf = pd.DataFrame(rrows, columns=["rid", "k", "t"]).astype("int64")
    merged = pd.merge_asof(
        lpdf.sort_values("t", kind="stable"),
        rpdf.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    expect = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid)) for r in merged.itertuples()
    }
    assert got == expect


cap_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=400),          # doc_id-ish
        st.sampled_from(["hot", "g1", "g2", "g3"]),       # skewed groups
        st.integers(min_value=0, max_value=50),           # order/quality
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(**_SETTINGS)
@given(rows=cap_rows_strategy, cap=st.integers(min_value=1, max_value=5))
def test_cap_per_group_salted_equals_single_window(spark, rows, cap):
    from bigdata_hits_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(rows, "doc_id long, source string, q long")
    salted = {r["doc_id"] for r in cap_per_group(df, "source", cap, order_col="q", salts=4).collect()}
    single = {r["doc_id"] for r in cap_per_group(df, "source", cap, order_col="q", salts=1).collect()}
    assert salted == single
    salted_r = {r["doc_id"] for r in cap_per_group(df, "source", cap, salts=4).collect()}
    single_r = {r["doc_id"] for r in cap_per_group(df, "source", cap, salts=1).collect()}
    assert salted_r == single_r


pack_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),     # doc_id
        st.integers(min_value=1, max_value=300),     # n_tok (some > budget)
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@settings(**_SETTINGS)
@given(rows=pack_rows_strategy)
def test_pack_documents_is_exact_partition_within_budget(spark, rows):
    from bigdata_hits_spark.operators.sampling import pack_documents

    budget = 200
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    packs = pack_documents(df, budget, "n_tok").collect()
    ids = [d for p in packs for d in p["doc_ids"]]
    assert sorted(ids) == sorted(r[0] for r in rows)
    sizes = dict(rows)
    for p in packs:
        assert p["total_tokens"] == sum(sizes[d] for d in p["doc_ids"])
        assert p["total_tokens"] <= budget or p["n_docs"] == 1


chunk_strategy = st.lists(
    st.integers(min_value=0, max_value=60),  # words per doc
    min_size=1,
    max_size=8,
)


@settings(**_SETTINGS)
@given(lens=chunk_strategy, max_tokens=st.integers(2, 12), overlap=st.integers(0, 5))
def test_chunk_documents_matches_bruteforce(spark, lens, max_tokens, overlap):
    from bigdata_hits_spark.operators.sampling import chunk_documents

    if overlap >= max_tokens:
        overlap = max_tokens - 1
    stride = max_tokens - overlap
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(n))) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, max_tokens, overlap).collect()
    }

    expect = {}
    for i, n in enumerate(lens):
        # split(' ') on an empty string yields [''] — one empty token,
        # mirroring both engines' convention
        words = [f"w{i}_{j}" for j in range(n)] if n else [""]
        n_eff = len(words)
        n_chunks = max(1, -(-(n_eff - overlap) // stride))
        for c in range(n_chunks):
            w = words[c * stride : c * stride + max_tokens]
            expect[(i, c)] = (" ".join(w), len(w))
    assert got == expect


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 200), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    ),
    rate_num=st.integers(0, 27),
)
def test_mixture_sample_matches_bruteforce(spark, rows, rate_num):
    """mixture_sample must equal the single-node replay of the same md5
    arithmetic: per-key uniform u, n_copies = floor(rate) + (u < frac)."""
    import hashlib

    from bigdata_hits_spark.operators.sampling import mixture_sample

    rate = rate_num / 10.0  # 0.0 .. 2.7 covers drop/down/keep/upsample
    rates = {"a": rate, "b": 1.0}
    df = spark.createDataFrame(rows, "k long, grp string")
    got = sorted(
        (r["k"], r["grp"], r["epoch"])
        for r in mixture_sample(df, "grp", rates, key_col="k").collect()
    )

    import math

    expect = []
    for k, g in rows:
        r = rates.get(g)
        if r is None:
            continue
        u = int(hashlib.md5(f"mix|{k}".encode()).hexdigest()[:8], 16) / 2**32
        n = int(math.floor(r)) + (1 if u < r - math.floor(r) else 0)
        expect += [(k, g, e) for e in range(n)]
    assert got == sorted(expect)


boiler_strategy = st.lists(
    st.lists(st.integers(0, 4), min_size=1, max_size=5),  # docs as line-id lists
    min_size=1,
    max_size=6,
)


@settings(**_SETTINGS)
@given(docs_lines=boiler_strategy, min_df=st.integers(2, 4))
def test_strip_boilerplate_matches_bruteforce(spark, docs_lines, min_df):
    from bigdata_hits_spark.operators.dedup import strip_boilerplate

    line_text = {i: f"line body number {i}" for i in range(5)}
    rows = [
        (d, "\n".join(line_text[l] for l in lines))
        for d, lines in enumerate(docs_lines)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in strip_boilerplate(df, min_df=min_df).collect()
    }

    from collections import defaultdict

    df_count = defaultdict(set)
    for d, lines in enumerate(docs_lines):
        for l in lines:
            df_count[l].add(d)
    common = {l for l, ds in df_count.items() if len(ds) >= min_df}
    expect = {}
    for d, lines in enumerate(docs_lines):
        kept = [line_text[l] for l in lines if l not in common]
        dropped = sum(1 for l in lines if l in common)
        expect[d] = ("\n".join(kept), len(kept), dropped)
    assert got == expect


@settings(**_SETTINGS)
@given(
    docs_toks=st.lists(
        st.lists(st.integers(0, 5), min_size=1, max_size=12),
        min_size=1,
        max_size=5,
    ),
    n=st.integers(2, 4),
)
def test_repeated_ngram_coverage_matches_bruteforce(spark, docs_toks, n):
    from bigdata_hits_spark.operators.dedup import repeated_ngram_coverage

    rows = [(d, " ".join(f"t{t}" for t in toks)) for d, toks in enumerate(docs_toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
        for r in repeated_ngram_coverage(df, n=n, min_count=2).collect()
    }

    from collections import Counter

    grams = Counter()
    for toks in docs_toks:
        for i in range(len(toks) - n + 1):
            grams[tuple(toks[i : i + n])] += 1
    expect = {}
    for d, toks in enumerate(docs_toks):
        covered = set()
        for i in range(len(toks) - n + 1):
            if grams[tuple(toks[i : i + n])] >= 2:
                covered.update(range(i, i + n))
        expect[d] = (len(toks), len(covered))
    assert got == expect


# ---------------------------------------------------------------------------
# Bin-bucketed range join and distributed NTILE vs single-node references
# ---------------------------------------------------------------------------

rangejoin_strategy = st.tuples(
    st.lists(st.integers(min_value=-40, max_value=40), min_size=1, max_size=25),
    st.lists(
        st.tuples(
            st.integers(min_value=-40, max_value=40),
            st.integers(min_value=0, max_value=30),  # span (hi = lo + span)
        ),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([1.0, 3.0, 7.5, 100.0]),
)


@settings(**_SETTINGS)
@given(data=rangejoin_strategy)
def test_range_join_bins_matches_bruteforce(spark, data):
    from bigdata_hits_spark.operators.rangejoin import range_join_bins

    values, intervals, width = data
    probe = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "pid long, value double"
    )
    ivals = spark.createDataFrame(
        [(j, float(lo), float(lo + span)) for j, (lo, span) in enumerate(intervals)],
        "iid long, lo double, hi double",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join_bins(probe, ivals, "value", "lo", "hi", width).collect()
    )
    want = sorted(
        (i, j)
        for i, v in enumerate(values)
        for j, (lo, span) in enumerate(intervals)
        if lo <= v <= lo + span
    )
    assert got == want


ntile_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=7),
)


@settings(**_SETTINGS)
@given(data=ntile_strategy)
def test_ntile_exact_matches_sql_semantics(spark, data):
    from bigdata_hits_spark.operators.ranks import ntile_exact
    from pyspark.sql import functions as F

    scores, n = data
    df = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(scores)], "id long, score double"
    )
    got = {
        r["id"]: r["tile"]
        for r in ntile_exact(df, n, [F.asc("score"), F.asc("id")]).collect()
    }
    # single-node SQL NTILE: first (N mod n) tiles get one extra row
    order = sorted(range(len(scores)), key=lambda i: (scores[i], i))
    N = len(order)
    q, r_ = divmod(N, n)
    want, rank = {}, 0
    for tile in range(1, n + 1):
        size = q + (1 if tile <= r_ else 0)
        for _ in range(size):
            if rank < N:
                want[order[rank]] = tile
                rank += 1
    assert got == want


wm_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # group
        st.integers(min_value=-20, max_value=20),  # value
        st.integers(min_value=0, max_value=5),  # weight (0 = dropped)
    ),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(rows=wm_strategy)
def test_weighted_median_matches_bruteforce(spark, rows):
    from bigdata_hits_spark.operators.ranks import weighted_median

    df = spark.createDataFrame(
        [(g, float(v), float(w)) for g, v, w in rows], "g int, v double, w double"
    )
    got = {
        r["g"]: r["wmedian_v"]
        for r in weighted_median(df, "v", "w", "g").collect()
    }
    expected = {}
    by_g = {}
    for g, v, w in rows:
        if w > 0:
            by_g.setdefault(g, []).append((v, w))
    for g, vw in by_g.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        cum = 0
        for v, w in vw:
            cum += w
            if 2 * cum >= tot:
                expected[g] = float(v)
                break
    assert got == expected


psi_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=100), min_size=16, max_size=60),
    st.lists(st.integers(min_value=-50, max_value=150), min_size=1, max_size=60),
)


@settings(**_SETTINGS)
@given(data=psi_strategy)
def test_psi_terms_nonnegative_and_probabilities_sum(spark, data):
    from bigdata_hits_spark.operators.profiling import psi_report

    ref_vals, new_vals = data
    ref = spark.createDataFrame([(float(v),) for v in ref_vals], "x double")
    new = spark.createDataFrame([(float(v),) for v in new_vals], "x double")
    out = psi_report(ref, new, "x", buckets=4).collect()
    assert len(out) == 4
    # (p-q)ln(p/q) >= 0 for any p,q > 0 — each floored term is nonneg
    assert all(r["psi_term"] >= 0 for r in out)
    assert abs(sum(r["p_ref"] for r in out) - 1.0) < 1e-4
    assert abs(sum(r["p_new"] for r in out) - 1.0) < 1e-4


trigram_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),  # user
        st.integers(min_value=0, max_value=60),  # ts step
        st.sampled_from("ABC"),  # type
    ),
    min_size=1,
    max_size=25,
)


@settings(**_SETTINGS)
@given(raw=trigram_strategy)
def test_session_path_ngrams_matches_bruteforce(spark, raw):
    from bigdata_hits_spark.operators.events import session_path_ngrams

    GAP = 10  # session gap in the same small units
    rows = [(i, u, t, ty) for i, (u, t, ty) in enumerate(raw)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_ns long, event_type string"
    )
    got = {
        (r.t1, r.t2, r.t3): r["count"]
        for r in session_path_ngrams(df, n=3, gap_ns=GAP).collect()
    }
    # brute force: per user, order by (ts, event_id), split on gap > GAP,
    # count trigrams inside each session
    expect = {}
    for u in {r[1] for r in rows}:
        evs = sorted([r for r in rows if r[1] == u], key=lambda r: (r[2], r[0]))
        sessions, cur, prev_t = [], [], None
        for eid, _, t, ty in evs:
            if prev_t is not None and t - prev_t > GAP:
                sessions.append(cur)
                cur = []
            cur.append(ty)
            prev_t = t
        sessions.append(cur)
        for sess in sessions:
            for i in range(len(sess) - 2):
                k = (sess[i], sess[i + 1], sess[i + 2])
                expect[k] = expect.get(k, 0) + 1
    assert got == expect


checksum_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.sampled_from("xyz")),
    min_size=0,
    max_size=25,
)


@settings(**_SETTINGS)
@given(rows=checksum_strategy)
def test_table_checksum_is_multiset_invariant(spark, rows):
    from bigdata_hits_spark.operators.relops import table_checksum

    import random as _r

    schema = "k long, v string"
    a = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    shuffled = list(rows)
    _r.Random(3).shuffle(shuffled)
    b = (
        spark.createDataFrame(shuffled, schema).repartition(5)
        if rows
        else spark.createDataFrame([], schema)
    )
    key = lambda df: sorted(map(tuple, table_checksum(df, ["k"], buckets=4).collect()))  # noqa: E731
    assert key(a) == key(b)  # multiset-equal inputs digest identically
    if rows:
        # dropping one row must change SOME bucket's digest triple
        c = spark.createDataFrame(rows[1:], schema) if rows[1:] else spark.createDataFrame([], schema)
        assert key(a) != key(c)
