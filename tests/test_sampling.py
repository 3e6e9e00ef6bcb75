"""Stratified sampling + deterministic hash splits."""

import pytest
from pyspark.sql import functions as F

from bigdata_hits_spark.operators.sampling import deterministic_split, stratified_sample
from bigdata_hits_spark.sources.readers import load_table


def test_stratified_sample_respects_fractions(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    frac = {"F": 0.5, "O": 0.1}  # 'P' absent -> dropped
    got = stratified_sample(orders, "o_orderstatus", frac, seed=7)
    counts = {r["o_orderstatus"]: r["n"] for r in
              got.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    base = {r["o_orderstatus"]: r["n"] for r in
            orders.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"F", "O"}
    for k in counts:
        assert abs(counts[k] / base[k] - frac[k]) < 0.15
    # Seeded: identical plan re-executed returns identical rows.
    again = stratified_sample(orders, "o_orderstatus", frac, seed=7)
    assert sorted(r["o_orderkey"] for r in got.select("o_orderkey").collect()) == \
           sorted(r["o_orderkey"] for r in again.select("o_orderkey").collect())


def test_deterministic_split_partitions_exhaustively(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    split = deterministic_split(cust, "c_custkey", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = cust.count()
    assert sum(counts.values()) == n  # exhaustive, disjoint by construction
    assert abs(counts["train"] / n - 0.8) < 0.1


def test_deterministic_split_stable_under_reordering(spark, sf_dir):
    """The split is a pure function of the key: shuffling/reordering the
    input does not move any row across splits (rand()-based splits fail
    this)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    w = {"train": 0.9, "test": 0.1}
    a = {r["c_custkey"]: r["split"] for r in deterministic_split(cust, "c_custkey", w).collect()}
    reordered = cust.repartition(13).sortWithinPartitions(F.desc("c_custkey"))
    b = {r["c_custkey"]: r["split"] for r in
         deterministic_split(reordered, "c_custkey", w).collect()}
    assert a == b


def test_deterministic_split_portable_matches_python_md5(spark, sf_dir):
    """portable=True is a cross-engine contract: any system with md5 can
    re-derive the identical assignment from raw keys.  Re-derive it in
    pure Python and compare every label."""
    import hashlib

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r["c_custkey"]: r["split"] for r in
           deterministic_split(cust, "c_custkey", w, portable=True).collect()}

    def expect(key):
        b = int(hashlib.md5(f"0|{key}".encode()).hexdigest()[:8], 16) % 10_000
        return "train" if b < 8000 else ("val" if b < 9000 else "test")

    assert got and all(got[k] == expect(k) for k in got)
    # The portable arm stays JVM-side too — no Python UDF.
    plan = deterministic_split(cust, "c_custkey", w, portable=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_deterministic_split_rejects_bad_weights(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    with pytest.raises(ValueError, match="sum to 1"):
        deterministic_split(cust, "c_custkey", {"train": 0.5, "test": 0.2})


def test_split_is_jvm_only(spark, sf_dir):
    """No Python UDF in the split path — the expression stays codegen-able."""
    cust = load_table(spark, sf_dir, "customer")
    plan = deterministic_split(cust, "c_custkey", {"a": 0.5, "b": 0.5}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cap_per_group_by_quality(spark, sf_dir):
    """Domain balancing: at most N docs per source, best-quality first."""
    from bigdata_hits_spark.operators.sampling import cap_per_group

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "q", F.length("text").cast("double")
    )
    capped = cap_per_group(docs, "source", 10, order_col="q")
    per_src = {r["source"]: r["n"] for r in
               capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per_src and all(n <= 10 for n in per_src.values())
    # survivors are the top-quality docs of each source
    src = next(iter(per_src))
    kept_min = capped.filter(F.col("source") == src).agg(F.min("q")).first()[0]
    dropped = docs.join(capped.select("doc_id"), "doc_id", "left_anti") \
        .filter(F.col("source") == src)
    if dropped.count() > 0:
        assert dropped.agg(F.max("q")).first()[0] <= kept_min


def test_cap_per_group_deterministic_without_order(spark, sf_dir):
    from bigdata_hits_spark.operators.sampling import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in cap_per_group(docs, "source", 5).select("doc_id").collect()}
    reordered = docs.repartition(13).sortWithinPartitions(F.desc("doc_id"))
    b = {r["doc_id"] for r in cap_per_group(reordered, "source", 5).select("doc_id").collect()}
    assert a == b and len(a) > 0


def test_cap_per_group_skewed_hot_group_spreads_and_matches_single_window(spark):
    """One group holding 50% of all rows: the salted two-phase plan must
    spread the hot group's phase-1 work over >1 salt bucket (i.e. >1
    task after the (group, salt) shuffle) and keep EXACTLY the same
    survivors as the single-window plan."""
    from bigdata_hits_spark.operators.sampling import cap_per_group

    n = 4000
    rows = [(i, "hot" if i < n // 2 else f"g{i % 37}", float(i % 997)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")

    salted = cap_per_group(df, "source", 10, order_col="q", salts=8)
    single = cap_per_group(df, "source", 10, order_col="q", salts=1)
    assert {r["doc_id"] for r in salted.collect()} == {r["doc_id"] for r in single.collect()}

    # deterministic choice (no order_col) agrees too
    salted_d = cap_per_group(df, "source", 7, salts=8)
    single_d = cap_per_group(df, "source", 7, salts=1)
    assert {r["doc_id"] for r in salted_d.collect()} == {r["doc_id"] for r in single_d.collect()}

    # the hot group's rows really occupy >1 salt bucket — the property
    # that splits its window work across tasks
    salt = F.pmod(F.xxhash64(*df.columns, F.lit(1)), F.lit(8))
    n_salts = (
        df.filter(F.col("source") == "hot").select(salt.alias("s")).distinct().count()
    )
    assert n_salts > 1

    # plan shape: two Window nodes, the first partitioned by the salt too
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2


def test_sample_to_token_budget_per_group_and_nesting(spark, sf_dir):
    from bigdata_hits_spark.operators.sampling import sample_to_token_budget

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(F.split(F.col("text"), " "))
    )
    small = sample_to_token_budget(docs, 300, "n_tok", group_col="source")
    big = sample_to_token_budget(docs, 1_500, "n_tok", group_col="source")
    sums = {r["source"]: r["s"] for r in
            small.groupBy("source").agg(F.sum("n_tok").alias("s")).collect()}
    assert sums and all(s <= 300 for s in sums.values())
    # nested-sample property: the small budget's rows are a subset of the
    # big budget's rows (same fixed permutation, shorter prefix)
    small_ids = {r["doc_id"] for r in small.select("doc_id").collect()}
    big_ids = {r["doc_id"] for r in big.select("doc_id").collect()}
    assert small_ids <= big_ids and len(small_ids) < len(big_ids)
    # determinism under reordering
    reordered = docs.repartition(13).sortWithinPartitions(F.desc("doc_id"))
    again = {r["doc_id"] for r in
             sample_to_token_budget(reordered, 300, "n_tok", group_col="source")
             .select("doc_id").collect()}
    assert again == small_ids


def test_pack_documents_budget_and_coverage(spark, sf_dir):
    from bigdata_hits_spark.operators.sampling import pack_documents

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(F.split(F.col("text"), " "))
    )
    packs = pack_documents(docs, 500, "n_tok").collect()
    assert len(packs) > 0
    # every pack within budget unless it is a single oversized doc
    for p in packs:
        assert p["total_tokens"] <= 500 or p["n_docs"] == 1
    # exact partition of the corpus: every doc in exactly one pack
    all_ids = [d for p in packs for d in p["doc_ids"]]
    assert len(all_ids) == len(set(all_ids)) == docs.count()
    # token totals agree with the source
    total = docs.agg(F.sum("n_tok")).first()[0]
    assert sum(p["total_tokens"] for p in packs) == total
    # packing is dense: average fill of multi-doc packs is reasonable
    multi = [p for p in packs if p["total_tokens"] <= 500]
    assert sum(p["total_tokens"] for p in multi) / (500 * len(multi)) > 0.5


def test_sample_to_token_budget_global_bucketed_matches_single_window(spark, sf_dir):
    """The global (group_col=None) form must produce EXACTLY the
    single-global-window survivors while spreading the running sum over
    hash buckets (no whole-dataset single-task window)."""
    from pyspark.sql import Window

    from bigdata_hits_spark.operators.sampling import sample_to_token_budget

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(F.split(F.col("text"), " "))
    )
    got = sample_to_token_budget(docs, 2_000, "n_tok")
    # reference: the naive single-partition global window
    w = Window.partitionBy().orderBy(F.xxhash64(*docs.columns, F.lit(0)).asc())
    expected = (
        docs.withColumn(
            "__cum",
            F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
        .filter(F.col("__cum") <= 2_000)
        .drop("__cum")
    )
    got_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    exp_ids = {r["doc_id"] for r in expected.select("doc_id").collect()}
    assert got_ids == exp_ids and len(got_ids) > 0
    assert got.agg(F.sum("n_tok")).first()[0] <= 2_000
    # nesting survives the bucketed plan
    big_ids = {r["doc_id"] for r in
               sample_to_token_budget(docs, 6_000, "n_tok").select("doc_id").collect()}
    assert got_ids <= big_ids
    # plan shape: the data-sized window is partitioned (by the hash
    # bucket), not a global Window over a SinglePartition exchange of
    # the full input.  The only SinglePartition window is the 256-row
    # offsets frame.
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "__b" in plan


def test_pack_documents_insensitive_to_arrow_batch_size(spark, sf_dir):
    """Packing is per PARTITION, not per Arrow record batch: shrinking
    maxRecordsPerBatch must not fragment bins or change pack count."""
    from bigdata_hits_spark.operators.sampling import pack_documents

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(F.split(F.col("text"), " "))
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    baseline = pack_documents(docs, 500, "n_tok").collect()
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")  # force many tiny batches per partition
        tiny = pack_documents(docs, 500, "n_tok").collect()
    finally:
        spark.conf.set(key, old)
    assert len(tiny) == len(baseline)
    assert sorted(p["pack_key"] for p in tiny) == sorted(p["pack_key"] for p in baseline)
    assert len({p["pack_key"] for p in tiny}) == len(tiny)  # globally unique keys
    # same bins regardless of batching
    assert sorted(tuple(p["doc_ids"]) for p in tiny) == \
           sorted(tuple(p["doc_ids"]) for p in baseline)


def test_chunk_documents_windows_and_reconstruction(spark):
    from bigdata_hits_spark.operators.sampling import chunk_documents

    words = [f"t{i}" for i in range(100)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "short doc"), (3, "x")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_tokens=16, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r

    # doc 1: 100 tokens, stride 12 -> ceil(96/12) = 8 chunks
    c1 = by_doc[1]
    assert sorted(c1) == list(range(8))
    assert all(c1[i]["n_tokens"] == 16 for i in range(7))
    assert c1[7]["n_tokens"] == 100 - 7 * 12  # final short chunk
    # window contents: chunk i starts at token i*stride
    for i in range(8):
        toks = c1[i]["chunk_text"].split(" ")
        assert toks == words[i * 12 : i * 12 + 16]
        assert len(toks) == c1[i]["n_tokens"]
    # consecutive chunks share exactly `overlap` tokens
    assert c1[0]["chunk_text"].split(" ")[-4:] == c1[1]["chunk_text"].split(" ")[:4]
    # every token is covered (union of windows == original)
    covered = sorted({t for i in c1 for t in c1[i]["chunk_text"].split(" ")},
                     key=lambda t: int(t[1:]))
    assert covered == words

    # short docs: exactly one chunk, intact
    assert list(by_doc[2]) == [0] and by_doc[2][0]["chunk_text"] == "short doc"
    assert by_doc[3][0]["n_tokens"] == 1


def test_chunk_documents_rejects_bad_params(spark):
    from bigdata_hits_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError):
        chunk_documents(docs, 8, overlap=8)


def test_chunk_documents_is_jvm_only(spark):
    """No Python UDF in the chunking plan — narrow map over the scan."""
    from bigdata_hits_spark.operators.sampling import chunk_documents

    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = chunk_documents(docs, 4, 1)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # shuffle-free


def test_mixture_sample_rates_and_epochs(spark, sf_dir):
    from bigdata_hits_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    rates = {"src0": 0.25, "src1": 1.0, "src2": 2.5}
    out = mixture_sample(docs, "source", rates, key_col="doc_id")
    per_source_in = {r["source"]: r["n"] for r in
                     docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    per_source_out = {r["source"]: r["n"] for r in
                      out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # dropped sources absent; kept source exact; up/down-sampled within
    # binomial tolerance of rate * n
    assert set(per_source_out) == set(rates)
    assert per_source_out["src1"] == per_source_in["src1"]
    for s in ("src0", "src2"):
        n = per_source_in[s]
        expect = rates[s] * n
        assert abs(per_source_out[s] - expect) < 4 * (0.25 * n) ** 0.5 + 4
    # upsampled rows carry dense 0-based epochs
    epochs = out.filter(F.col("source") == "src2").groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("epoch").alias("mx"), F.min("epoch").alias("mn")
    )
    bad = epochs.filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)).count()
    assert bad == 0
    assert {r["n"] for r in epochs.collect()} == {2, 3}  # floor(2.5) or +1
    # determinism: second run identical
    again = mixture_sample(docs, "source", rates, key_col="doc_id")
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_mixture_sample_rejects_bad_rates(spark, sf_dir):
    from bigdata_hits_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        mixture_sample(docs, "source", {}, key_col="doc_id")
    with pytest.raises(ValueError):
        mixture_sample(docs, "source", {"src0": -0.5}, key_col="doc_id")


def test_mixture_sample_large_rate_map_join_path(spark, sf_dir):
    """Past 64 groups the rate attach switches to a broadcast join; the
    two paths must produce identical multisets on overlapping groups."""
    from bigdata_hits_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    small = {"src0": 1.5, "src1": 0.5}
    big = dict(small)
    big.update({f"ghost{i}": 1.0 for i in range(70)})  # absent groups
    a = mixture_sample(docs, "source", small, key_col="doc_id")
    b = mixture_sample(docs, "source", big, key_col="doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert "BroadcastHashJoin" in b._jdf.queryExecution().executedPlan().toString()


class TestWeightedSample:
    def test_expected_fraction_and_determinism(self, spark):
        from bigdata_hits_spark.operators.sampling import weighted_sample

        n = 4000
        df = spark.range(n).select(
            F.col("id").alias("doc_id"), (F.col("id") % 100).cast("double").alias("w")
        )
        scale = 1.0 / 100.0
        kept = weighted_sample(df, "w", scale, key_col="doc_id")
        got = {r["doc_id"] for r in kept.collect()}
        # E[kept] = sum(min(1, w/100)) = sum over id of (id%100)/100 = n * 0.495
        expect = 0.495 * n
        assert abs(len(got) - expect) < 0.1 * n
        # pure function of the data: same ids survive any partitioning
        again = {
            r["doc_id"]
            for r in weighted_sample(df.repartition(13), "w", scale, key_col="doc_id").collect()
        }
        assert got == again
        # zero-weight rows can never survive
        zeros = {i for i in range(0, n, 100)}
        assert not (got & zeros)

    def test_negative_weight_raises(self, spark):
        from bigdata_hits_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame([(1, -1.0)], "doc_id long, w double")
        import pytest as _pytest

        with _pytest.raises(Exception, match="negative weight"):
            weighted_sample(df, "w", 1.0).collect()


def test_sample_to_token_budget_custom_order_key(spark, sf_dir):
    """order_key= swaps the permutation: survivors equal the prefix of
    the md5-key order (cross-checked against a driver-side cumsum), and
    the bucketed plan still matches the single-window form's rows."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    key = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    budget = 100_000
    from bigdata_hits_spark.operators.sampling import sample_to_token_budget

    got = {
        r["doc_id"]
        for r in sample_to_token_budget(docs, budget, "n_chars", order_key=key).collect()
    }
    rows = docs.collect()
    order = sorted(
        rows, key=lambda r: int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16)
    )
    cum, want = 0, set()
    for r in order:
        cum += r["n_chars"]
        if cum <= budget:
            want.add(r["doc_id"])
    assert got == want and 0 < len(got) < len(rows)


def test_stratified_sample_portable_deterministic_and_rate_bounded(spark):
    from bigdata_hits_spark.operators.sampling import stratified_sample_portable

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(2000)], "k long, s string"
    )
    out1 = stratified_sample_portable(df, "s", {"a": 0.3, "b": 1.0}, "k", seed=1)
    out2 = stratified_sample_portable(
        df.repartition(13), "s", {"a": 0.3, "b": 1.0}, "k", seed=1
    )
    ids1 = sorted(r["k"] for r in out1.collect())
    assert ids1 == sorted(r["k"] for r in out2.collect())  # order/partition invariant
    by_s = {r["s"]: r["n"] for r in out1.groupBy("s").count().withColumnRenamed("count", "n").collect()}
    assert by_s["b"] == 1000  # frac 1.0 keeps everything
    assert abs(by_s["a"] - 300) < 60  # ~30% of 1000
    # stratum absent from fractions is dropped
    df2 = df.withColumn("s", F.lit("zzz"))
    assert stratified_sample_portable(df2, "s", {"a": 0.5}, "k").count() == 0


def test_stratified_sample_portable_empty_fractions(spark):
    from bigdata_hits_spark.operators.sampling import stratified_sample_portable

    df = spark.createDataFrame([(1, "a")], "k long, s string")
    assert stratified_sample_portable(df, "s", {}, "k").count() == 0


def test_pack_documents_nextfit_budget_coverage_and_determinism(spark, sf_dir):
    from bigdata_hits_spark.operators.sampling import pack_documents_nextfit

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    out = pack_documents_nextfit(docs, 500, "n_tok").collect()
    # exact partition of the corpus: every doc assigned exactly once
    assert len(out) == docs.count()
    assert len({r["doc_id"] for r in out}) == len(out)
    # every pack within budget unless it is a single oversized doc
    totals: dict = {}
    for r in out:
        totals.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for ns in totals.values():
        assert sum(ns) <= 500 or len(ns) == 1
    # placement is a pure function of the data: physical partitioning
    # must not move a single assignment (the greedy packer can't say this)
    again = pack_documents_nextfit(docs.repartition(7), 500, "n_tok").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pack_documents_nextfit_oversized_doc_isolated(spark):
    from bigdata_hits_spark.operators.sampling import pack_documents_nextfit

    df = spark.createDataFrame(
        [(i, 10_000 if i == 3 else 50) for i in range(10)], "doc_id long, n long"
    )
    out = pack_documents_nextfit(df, 500, "n").collect()
    big = [r for r in out if r["doc_id"] == 3]
    assert len(big) == 1
    # the oversized doc shares its pack with nobody
    assert sum(1 for r in out if r["pack_id"] == big[0]["pack_id"]) == 1


def test_domain_reweight_plan_feeds_mixture(spark):
    """Rates steer the mixture toward the target shares: plan on a
    skewed two-group corpus, feed the rates to mixture_sample, and the
    realized weight shares land near the targets; guards reject bad
    target specs; the one-row total attach keeps everything in-plan."""
    import pytest
    from pyspark.sql import functions as F

    from bigdata_hits_spark.operators.sampling import (
        domain_reweight_plan,
        mixture_sample,
    )

    rows = [(i, "a", 10) for i in range(900)] + [
        (i + 900, "b", 10) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    plan = domain_reweight_plan(
        df, "source", {"a": 0.5, "b": 0.5}, weight_col="n_tokens"
    )
    got = {r["source"]: r for r in plan.collect()}
    assert got["a"]["current_share"] == 0.9 and got["b"]["current_share"] == 0.1
    assert got["a"]["rate"] == round(0.5 / 0.9, 7)
    assert got["b"]["rate"] == 5.0
    rates = {r["source"]: r["rate"] for r in plan.collect()}
    mixed = mixture_sample(df, "source", rates, key_col="doc_id")
    shares = {
        r["source"]: r["w"]
        for r in mixed.groupBy("source").agg(F.sum("n_tokens").alias("w")).collect()
    }
    tot = sum(shares.values())
    assert abs(shares["a"] / tot - 0.5) < 0.05
    assert abs(shares["b"] / tot - 0.5) < 0.05
    # capped plan
    capped = {
        r["source"]: r["rate"]
        for r in domain_reweight_plan(
            df, "source", {"a": 0.5, "b": 0.5}, weight_col="n_tokens", max_rate=2.0
        ).collect()
    }
    assert capped["b"] == 2.0
    with pytest.raises(ValueError, match="sum to 1"):
        domain_reweight_plan(df, "source", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        domain_reweight_plan(df, "source", {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="non-empty"):
        domain_reweight_plan(df, "source", {})


def test_leakage_safe_split_groups_families(spark):
    """Members of a dup family share a split; singletons split on their
    own id exactly like deterministic_split; splits stay exhaustive."""
    from bigdata_hits_spark.operators.sampling import (
        deterministic_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(200)], "doc_id long, source string"
    )
    comps = spark.createDataFrame(
        [(i, (i // 10) * 10) for i in range(100)], "id long, component long"
    )
    out = leakage_safe_split(docs, comps, {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == 200 and set(rows.values()) <= {"train", "val", "test"}
    for i in range(100):
        assert rows[i] == rows[(i // 10) * 10], f"doc {i} left its family"
    # singletons (100..199) match the row-keyed portable split on doc_id
    single = docs.filter("doc_id >= 100")
    want = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(
            single, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, portable=True
        ).collect()
    }
    for i in range(100, 200):
        assert rows[i] == want[i]


def test_epoch_shuffle_determinism_and_permutation(spark):
    from bigdata_hits_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(97)], "doc_id long, source string"
    )
    e1 = epoch_shuffle(df, "doc_id", epoch=1)
    a = {r["doc_id"]: r["pos"] for r in e1.collect()}
    b = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, "doc_id", epoch=1).collect()}
    # deterministic: identical assignment on re-run
    assert a == b
    # a permutation: positions are exactly 1..N
    assert sorted(a.values()) == list(range(1, 98))
    # a DIFFERENT epoch is a different permutation of the same positions
    c = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, "doc_id", epoch=2).collect()}
    assert sorted(c.values()) == list(range(1, 98)) and a != c
    # and so is a different seed at the same epoch
    d = {r["doc_id"]: r["pos"] for r in epoch_shuffle(df, "doc_id", epoch=1, seed=7).collect()}
    assert sorted(d.values()) == list(range(1, 98)) and a != d
    # input columns survive
    assert set(e1.columns) == {"doc_id", "source", "pos"}
