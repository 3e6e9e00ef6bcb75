"""Sampling operators beyond the reference's single Bernoulli sample.

The reference samples only for plotting (``rdd.sample(False, 0.01, 81)``
— ``/root/reference/src/base_hits.py:78-79``; relops.bernoulli_sample is
the parity twin).  A training-data pipeline needs two more shapes:

- **Stratified sampling** — per-class fractions (rebalance a skewed label
  distribution before training).  Spark's ``sampleBy`` is a one-pass
  filter on a per-row uniform draw: no shuffle, no collect, scale-free.
- **Deterministic splits** — train/validation/test partitions that are a
  pure function of a key column.  ``rand()``-based splits are NOT
  reproducible at scale (task retries and partition reordering reseed
  them); hashing the key is stable across runs, engines, cluster sizes,
  and input order, and co-locates all copies of a key in one split
  (no train/test leakage through duplicated rows).

Plus the corpus-construction family built on the same determinism:
per-group caps and token budgets, greedy sequence packing, overlapping
token-window chunking, and per-source mixture rates with upsampling
(``mixture_sample`` — the "epochs per dataset" step).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Granularity of the hash-split buckets: fractions are rounded to 1/10000.
_SPLIT_BUCKETS = 10_000


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 81
) -> DataFrame:
    """Per-stratum Bernoulli sample: keep ``fractions[v]`` of rows whose
    ``strata_col`` equals ``v`` (strata absent from the dict are dropped,
    matching ``DataFrame.sampleBy``)."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def hash_bucket(key_col: str, seed: int = 0, buckets: int = _SPLIT_BUCKETS):
    """Uniform bucket in [0, buckets) as a pure function of the key value:
    ``pmod(xxhash64(key, seed), buckets)``.  JVM-side, codegen-friendly,
    no state."""
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(buckets))


def portable_hash_bucket(key_col: str, seed: int = 0, buckets: int = _SPLIT_BUCKETS):
    """Cross-engine twin of :func:`hash_bucket`: bucket from the first 8
    md5 hex digits of ``'seed|' || key`` — the repo's portable-hash
    discipline (``weighted_sample``, the MinHash chain), reproducible in
    any engine with md5 + hex parsing.  ~3x the cost of xxhash64 (string
    concat + md5 + substring + base-16 parse, still all JVM-side Column
    ops); use :func:`hash_bucket` unless an external system must
    re-derive the same assignment.  The pmod-of-2^32 bias is < 1e-5
    relative for the default 10k buckets."""
    u32 = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(u32, F.lit(buckets))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    order_col: str | None = None,
    seed: int = 0,
    salts: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``group_col`` value — the domain-
    balancing gate of corpus curation (no single source/domain dominates
    the training mix).

    With ``order_col``, the top-``cap`` rows by that column (descending —
    e.g. keep the highest-quality docs per domain) survive; without it,
    survivors are a deterministic pseudo-random choice (ordered by
    ``xxhash64(all columns, seed)``), stable across runs, cluster sizes,
    and input order — ``rand()`` would reseed per task attempt.

    Skew-safe two-phase plan (default): phase 1 windows over
    ``(group, salt)`` where the salt is a deterministic row hash into
    ``salts`` buckets, so a pathologically hot domain's work spreads
    across up to ``salts`` tasks and each (group, salt) cell keeps its
    own top-``cap``; phase 2 re-windows the ≤ ``salts``·``cap``
    survivors per group to the final top-``cap``.  The global top-``cap``
    of a group is a subset of the union of its per-salt top-``cap``s, so
    survivors are IDENTICAL to the single-window plan (the ordering is a
    total order per group — hash tiebreak — and duplicate rows hash to
    the same salt, keeping the multiset stable).  Phase 1 shuffles the
    full data once (same volume as the single-window plan, finer keys);
    phase 2 shuffles only the per-group survivor slices.  ``salts=1``
    degenerates to the classic single-window top-N-per-group plan.

    Limitation: rows that are bit-identical across EVERY column share a
    salt (there is no deterministic row identity to split them on), so a
    group consisting of one row repeated N times still lands in one task.
    """
    if order_col is not None:
        order = [F.desc(order_col), F.xxhash64(*df.columns, F.lit(seed)).asc()]
    else:
        order = [F.xxhash64(*df.columns, F.lit(seed)).asc()]
    if salts <= 1:
        w = Window.partitionBy(group_col).orderBy(*order)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn")
        )
    salt = F.pmod(F.xxhash64(*df.columns, F.lit(seed + 1)), F.lit(salts))
    w1 = Window.partitionBy(group_col, "__salt").orderBy(*order)
    partial = (
        df.withColumn("__salt", salt)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= cap)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        partial.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Assign each row a split label (``train``/``test``/...) by hashing
    ``key_col`` into cumulative weight ranges.  Same key -> same split,
    always.  ``weights`` must sum to 1 (to 1/10000 granularity).

    Returns the input plus a ``split`` column; filter on it to obtain the
    parts.  Splits are disjoint and exhaustive by construction.

    ``portable=True`` derives the bucket from md5 instead of xxhash64
    (:func:`portable_hash_bucket`) so a DIFFERENT engine — the eval
    harness, a downstream trainer, the DuckDB oracle — can recompute the
    identical train/val/test assignment from the raw keys.  Split
    membership is a contract with the training run (a val doc leaking
    into train on re-derivation is contamination), which makes the
    cross-engine-reproducible arm the right one whenever the split
    leaves this engine.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = (portable_hash_bucket if portable else hash_bucket)(key_col, seed)
    expr = None
    hi = 0
    # Deterministic iteration: dict preserves insertion order (py3.7+).
    for name, w in weights.items():
        hi += round(w * _SPLIT_BUCKETS)
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # Rounding can leave the last range short of the final bucket; fold the
    # remainder into the last split so the assignment is exhaustive.
    last = list(weights)[-1]
    return df.withColumn("split", expr.otherwise(F.lit(last)))


def sample_to_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str,
    group_col: str | None = None,
    seed: int = 0,
    order_key: Column | None = None,
) -> DataFrame:
    """Keep a deterministic pseudo-random subset whose ``token_col`` sum
    stays within ``budget`` (per ``group_col`` value when given, else
    globally) — the "give me ~N tokens of this source" gate of training-
    mix construction, where capping ROWS (cap_per_group) is the wrong
    unit because document lengths vary by orders of magnitude.

    Rows are ordered by ``xxhash64(all columns, seed)`` (stable across
    runs, partitionings, and input order) and kept while the running
    token total up to and INCLUDING the row is <= budget: the kept set is
    a prefix of a fixed permutation, so shrinking the budget yields a
    subset of a larger budget's sample (nested samples — useful for
    scaling-law sweeps).

    With ``group_col`` the running sum is one window pass per group.
    WITHOUT it, a naive global window would funnel the whole dataset
    through ONE task; instead the global form runs the classic
    distributed prefix-sum: rows bucket by the hash's high byte (buckets
    are hash-order-preserving, so bucket-major + in-bucket hash order ==
    global hash order), per-bucket token totals roll into exclusive
    prefix offsets (a 256-row window — trivially single-task), and each
    bucket's running sum adds its offset.  Survivors are IDENTICAL to
    the single-window form; the per-task load is ~1/256 of the data.

    ``order_key`` replaces the xxhash64 permutation with a caller-chosen
    deterministic long Column (must be collision-free over the input for
    a well-defined boundary).  The md5-derived key the declared oracle
    row uses (queries_postgate.py sample_token_budget) is the portable
    choice — DuckDB cannot reproduce xxhash64, but reproduces the md5
    prefix parse bit-for-bit.  The bucket split (high byte of the key)
    stays order-preserving for any long key; a key spanning fewer high
    bytes just lands in fewer buckets (coarser parallelism, same rows).
    """
    order_hash = F.xxhash64(*df.columns, F.lit(seed)) if order_key is None else order_key
    running_in = lambda w: F.sum(F.col(token_col)).over(  # noqa: E731
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if group_col:
        w = Window.partitionBy(group_col).orderBy(order_hash.asc())
        return (
            df.withColumn("__cum", running_in(w))
            .filter(F.col("__cum") <= budget)
            .drop("__cum")
        )
    # Global budget: two-phase bucketed prefix sum.  Arithmetic shiftright
    # keeps the sign bit, so bucket order (-128..127) matches signed
    # 64-bit hash order and equal hashes share a bucket.
    dfh = df.withColumn("__h", order_hash).withColumn(
        "__b", F.shiftright(F.col("__h"), 56).cast("int")
    )
    totals = dfh.groupBy("__b").agg(F.sum(F.col(token_col)).alias("__t"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__off")
    )
    w_run = Window.partitionBy("__b").orderBy(F.col("__h").asc())
    return (
        dfh.join(F.broadcast(offsets), "__b")
        .withColumn("__cum", F.col("__off") + running_in(w_run))
        .filter(F.col("__cum") <= budget)
        .drop("__h", "__b", "__off", "__cum")
    )


def pack_documents(
    df: DataFrame,
    max_tokens: int,
    token_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """(pack_id, doc_ids, n_docs, total_tokens): greedy sequence packing —
    group documents into bins of at most ``max_tokens`` combined tokens,
    the standard preprocessing step that turns a ragged corpus into
    dense fixed-budget training sequences.

    Deterministic and shuffle-light: rows are hash-partitioned by id,
    then packed per PARTITION in (token desc, id) order with a greedy
    running-total cut (a document longer than ``max_tokens`` gets a pack
    of its own).  The whole partition is concatenated before packing —
    Arrow hands ``mapInPandas`` the partition as MULTIPLE record batches
    (maxRecordsPerBatch, default 10k rows), and packing each batch
    independently would fragment bins at every batch boundary.  Packing
    never crosses partitions, so there is no global coordination — at
    100 TB each task packs its own slice, and pack ids are globally
    unique by construction: ``pack_key = f"{partitionId}_{local index}"``
    from TaskContext, not from any data value.  The greedy
    first-fit-decreasing order wastes at most ~the largest document per
    bin boundary versus optimal.
    """
    import pandas as pd

    src = df.select(F.col(id_col).alias("id"), F.col(token_col).cast("long").alias("n"))
    parted = src.repartition(F.col("id"))

    def pack(pdf_iter):
        from pyspark import TaskContext

        pdfs = [pdf for pdf in pdf_iter if len(pdf)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        pdf = pdf.sort_values(["n", "id"], ascending=[False, True])
        tc = TaskContext.get()
        part_key = str(tc.partitionId()) if tc is not None else "0"
        packs: list[tuple[list, int]] = []
        for doc_id, n in zip(pdf["id"], pdf["n"]):
            placed = False
            for p in packs:
                if p[1] + n <= max_tokens:
                    p[0].append(doc_id)
                    p[1] += n
                    placed = True
                    break
            if not placed:
                packs.append([[doc_id], n])
        yield pd.DataFrame(
            {
                "pack_key": [f"{part_key}_{i}" for i in range(len(packs))],
                "doc_ids": [sorted(p[0]) for p in packs],
                "n_docs": [len(p[0]) for p in packs],
                "total_tokens": [p[1] for p in packs],
            }
        )

    id_type = df.schema[id_col].dataType.simpleString()
    return parted.mapInPandas(
        pack,
        schema=(
            f"pack_key string, doc_ids array<{id_type}>, "
            "n_docs long, total_tokens long"
        ),
    )


def pack_documents_nextfit(
    df: DataFrame,
    max_tokens: int,
    token_col: str,
    id_col: str = "doc_id",
    bucket_hex: int = 2,
) -> DataFrame:
    """(doc_id, n_tokens, pack_id): DETERMINISTIC next-fit sequence
    packing — the declarable twin of :func:`pack_documents`, whose
    greedy first-fit bins depend on which physical partition a row lands
    in (honest rows-only-at-best).  Here placement is a pure function of
    the data: documents are laid out in global md5(id) order, that order
    is cut into 16^``bucket_hex`` contiguous BUCKETS by md5 prefix, and
    each bucket is packed sequentially next-fit (a doc joins the current
    pack if the running total stays within ``max_tokens``, else opens a
    new one; an oversized doc gets a pack of its own).  Pack ids are
    ``f"{bucket}_{index}"`` — globally unique and reproducible across
    runs, partitionings, and engines, so the operator carries a full
    DuckDB oracle (a grouped-reset recursive CTE over the same order).

    Scale: the packed relation is METADATA-ONLY — (id, token_count)
    pairs, never document bodies — so the single bucket-keyed shuffle
    moves ~16 bytes/doc.  Each task packs one bucket sequentially:
    at 10^9 docs and ``bucket_hex=3`` (4096 buckets) a bucket is
    ~244k (id, n) rows ≈ 4 MB of pandas — raise ``bucket_hex`` with
    corpus size to keep buckets bounded (boundaries only move between
    prefix lengths, and packing never crosses a bucket).  Next-fit
    wastes at most one doc's tokens per boundary vs first-fit-decreasing
    but buys engine-portable determinism; use :func:`pack_documents`
    when bin tightness matters more than reproducibility."""
    import pandas as pd

    src = df.select(
        F.col(id_col).alias("id"),
        F.col(token_col).cast("long").alias("n"),
    ).withColumn("__key", F.md5(F.col("id").cast("string").cast("binary")))
    src = src.withColumn("__bucket", F.substring("__key", 1, bucket_hex))

    def pack(key, pdf):
        bucket = key[0]
        pdf = pdf.sort_values(["__key", "id"]).reset_index(drop=True)
        idx = []
        cur, run = -1, 0
        for n in pdf["n"]:
            if cur < 0 or run + n > max_tokens:
                cur, run = cur + 1, int(n)
            else:
                run += int(n)
            idx.append(cur)
        return pd.DataFrame(
            {
                "doc_id": pdf["id"],
                "n_tokens": pdf["n"],
                "pack_id": [f"{bucket}_{i}" for i in idx],
            }
        )

    id_type = df.schema[id_col].dataType.simpleString()
    return src.groupBy("__bucket").applyInPandas(
        pack, schema=f"doc_id {id_type}, n_tokens long, pack_id string"
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_idx, chunk_text, n_tokens): split each document's
    whitespace tokens into windows of ``max_tokens`` with ``overlap``
    tokens shared between consecutive windows — the standard
    long-document preparation step before sequence packing (a 50k-token
    document cannot ride one training sample; its chunks can).

    Chunk i covers tokens [i·stride, i·stride + max_tokens) with
    stride = max_tokens − overlap; the last chunk may be shorter, and a
    document of <= max_tokens tokens yields exactly one chunk (idx 0).
    Number of chunks: max(1, ceil((n − overlap) / stride)).

    Scale shape: pure Column expressions (split → explode(sequence) →
    slice → array_join), whole-stage-codegen friendly, no UDF, no
    shuffle — a narrow map over the documents scan whose output row
    count is bounded by n_tokens/stride per doc.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must be in [0, max_tokens)")
    stride = max_tokens - overlap
    # null text behaves as empty: one chunk of the empty string, not a
    # null-propagated junk row
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(toks)
    # ceil((n - overlap) / stride) in exact integer arithmetic (floats
    # would drift for huge n); greatest(1, ·) covers n <= max_tokens.
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride)).cast("int"),
    )
    return (
        docs.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.array_join(F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, max_tokens), " ").alias("chunk_text"),
            F.size(F.slice(F.col("__toks"), F.col("chunk_idx") * stride + 1, max_tokens)).alias("n_tokens"),
        )
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    rates: dict,
    key_col: str,
    seed: str = "mix",
) -> DataFrame:
    """Compose a training mixture by per-group rates — the "epochs per
    dataset" step of corpus construction.  ``rates[g]`` may be
    fractional (downsample: keep that hash-fraction of group ``g``) or
    > 1 (upsample: each row appears floor(rate) times plus one more for
    a hash-fraction of rows).  Groups absent from ``rates`` are dropped.

    Output adds an ``epoch`` column (0-based copy index) so downstream
    shuffling/packing can spread the copies.

    Deterministic by design: the keep/extra-copy decision hashes
    (seed, key) through md5 — a pure function of the DATA, stable across
    runs, engines, partitionings, and cluster sizes, unlike seeded
    ``sample``/``sampleBy`` whose draws reseed per task attempt.  The
    md5-derived uniform follows the repo's portable-hash discipline, so
    a DuckDB oracle reproduces the exact row multiset
    (queries_postgate.py mixture_sample).

    Scale shape: one narrow filter + a bounded explode (ceil(rate)
    copies max), no shuffle, no UDF.
    """
    if not rates:
        raise ValueError("rates must be non-empty")
    for g, r in rates.items():
        if r < 0:
            raise ValueError(f"rate for group {g!r} must be >= 0")
    if "epoch" in df.columns:
        raise ValueError(
            "input already has an 'epoch' column; rename it before mixture_sample"
        )
    # uniform in [0, 1) from the first 8 md5 hex digits of (seed, key)
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 32))
    )
    if len(rates) <= 64:
        # chained CASE over the rate map (create_map needs homogeneous
        # keys; a when-chain keeps group values typed as-is) — fine for
        # hand-written mixes, but expression depth grows linearly, so a
        # LARGE rate table (per-domain weights, thousands of entries)
        # switches to a broadcast equi-join below.
        rate_expr = None
        for g, r in rates.items():
            cond = F.col(group_col) == F.lit(g)
            rate_expr = (
                F.when(cond, F.lit(float(r)))
                if rate_expr is None
                else rate_expr.when(cond, F.lit(float(r)))
            )
        rate_expr = rate_expr.otherwise(F.lit(0.0))
        rated = df.withColumn("__rate", rate_expr)
    else:
        spark = df.sparkSession
        rate_df = spark.createDataFrame(
            [(g, float(r)) for g, r in rates.items()], f"{group_col} string, __rate double"
        )
        rated = (
            df.join(F.broadcast(rate_df), group_col, "left")
            # the join moves the key column first; restore the caller's
            # column order so both rate paths emit identical schemas
            .select(*df.columns, F.coalesce(F.col("__rate"), F.lit(0.0)).alias("__rate"))
        )
    n_copies = (
        F.floor(F.col("__rate"))
        + F.when(u < F.col("__rate") - F.floor(F.col("__rate")), 1).otherwise(0)
    ).cast("int")
    return (
        rated.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1)))
        .drop("__n_copies", "__rate")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    rate_scale: float,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep each row with
    probability ``min(1, weight * rate_scale)`` — "sample documents
    proportional to quality/length" for training-mix construction, where
    a uniform rate over- or under-represents exactly the rows a weight
    column exists to distinguish.

    Same discipline as :func:`mixture_sample`: the keep decision hashes
    (seed, key) through md5 into a uniform in [0, 1) and compares it to
    the row's threshold — a pure function of the DATA, stable across
    runs, partitionings, and engines (the md5-derived uniform is a
    53-bit-exact rational and the threshold an IEEE product, so the
    comparison is bit-identical everywhere, unlike ln/pow-based
    priority-sampling keys whose libm last-ulp may differ).  Negative
    weights are rejected in-plan; NULL weights drop the row (weightless
    rows have no business in a weighted sample — coalesce upstream to
    keep them).

    Expected kept rows = sum(min(1, w * rate_scale)); pick
    ``rate_scale = target_rows / sum(w)`` when no weight saturates.
    Plan: one narrow map + filter, no shuffle, no actions.
    """
    if rate_scale < 0:
        raise ValueError(f"rate_scale must be >= 0, got {rate_scale}")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 32))
    )
    w = F.col(weight_col).cast("double")
    threshold = F.when(
        w < 0, F.raise_error(F.lit("weighted_sample: negative weight"))
    ).otherwise(F.least(F.lit(1.0), w * F.lit(float(rate_scale))))
    return df.filter(u < threshold)


def stratified_sample_portable(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
    seed: int = 0,
    buckets: int = _SPLIT_BUCKETS,
) -> DataFrame:
    """Deterministic twin of :func:`stratified_sample`: keep a row iff
    its key's portable md5 bucket falls below ``round(frac * buckets)``
    for its stratum — the keep decision is a pure function of (seed,
    key), so the SAME rows survive across engines, reruns, cluster
    sizes, and input order (``sampleBy``'s per-partition RNG guarantees
    none of these; use it when statistical independence from the key
    matters more than reproducibility).  Strata absent from ``fractions``
    are dropped, matching ``sampleBy``.  Realized rates are exact to
    1/buckets granularity in expectation over keys, same as the split
    machinery this reuses (:func:`portable_hash_bucket`); narrow map,
    no shuffle."""
    b = portable_hash_bucket(key_col, seed, buckets)
    arms = None
    for v, frac in fractions.items():
        cut = int(round(float(frac) * buckets))
        cond = (F.col(strata_col) == v) & (b < cut)
        arms = cond if arms is None else (arms | cond)
    if arms is None:
        return df.filter(F.lit(False))
    return df.filter(arms)


def domain_reweight_plan(
    df: DataFrame,
    group_col: str,
    targets: dict,
    weight_col: str | None = None,
    max_rate: float | None = None,
    digits: int = 7,
) -> DataFrame:
    """(group, n_rows, weight, current_share, target_share, rate): the
    per-domain sampling rates that steer a corpus toward TARGET weight
    shares — the planning step in front of :func:`mixture_sample` (feed
    the ``rate`` column straight in as ``rates``), i.e. the static
    domain-reweighting move of DoReMi-style recipes with the target
    distribution supplied instead of learned.

    ``targets`` maps group -> target share and must sum to ~1; groups
    not named are excluded from the plan (and thus dropped by the
    mixture — mixture_sample's convention).  ``weight_col`` is the
    per-row mass (token counts for token-share targets); None weights
    rows equally.  rate_g = target_g * total_w / w_g, optionally capped
    at ``max_rate`` (upsample ceilings; a capped plan's realized shares
    shift, which is visible right in the output).  Everything before
    the division is exact integers + one exact literal, so rates are
    bit-identical across engines before the final round.

    Plan: one group-keyed hash agg (map-side combined), the group-count
    -sized total rides in-plan as a broadcast one-row aggregate, then a
    pure projection — nothing row-sized leaves the cluster."""
    if not targets:
        raise ValueError("targets must be non-empty")
    for g, s in targets.items():
        if not (0.0 < float(s) <= 1.0):
            raise ValueError(f"target share for {g!r} must be in (0, 1], got {s}")
    ssum = sum(float(s) for s in targets.values())
    if abs(ssum - 1.0) > 1e-9:
        raise ValueError(f"target shares must sum to 1 (got {ssum})")
    w = F.col(weight_col) if weight_col else F.lit(1)
    grp = (
        df.filter(F.col(group_col).isin(list(targets)))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum(w).alias("weight"))
    )
    total = grp.agg(F.sum("weight").alias("__total"))
    ts = None
    for g, s in targets.items():
        cond = F.col(group_col) == F.lit(g)
        ts = F.when(cond, F.lit(float(s))) if ts is None else ts.when(cond, F.lit(float(s)))
    rate = ts * F.col("__total") / F.col("weight")
    if max_rate is not None:
        rate = F.least(rate, F.lit(float(max_rate)))
    return grp.crossJoin(F.broadcast(total)).select(
        group_col,
        "n_rows",
        "weight",
        F.round(F.col("weight") / F.col("__total"), digits).alias("current_share"),
        ts.alias("target_share"),
        F.round(rate, digits).alias("rate"),
    )


def leakage_safe_split(
    df: DataFrame,
    components: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    portable: bool = True,
) -> DataFrame:
    """:func:`deterministic_split` keyed on the NEAR-DUP COMPONENT
    instead of the row id, so every member of a duplicate family lands
    in the SAME split — the leakage guard for train/val/test
    construction (a near-copy of a val document sitting in train is
    contamination that row-keyed splitting cannot prevent).

    ``components`` is the (id, component) relation from the dedup
    machinery (operators/components.py over MinHash/SimHash pairs);
    rows absent from it are singletons and split on their own id.  The
    join is id-keyed and component is the only added traffic; the split
    itself stays a pure projection.  ``portable=True`` (default here,
    unlike the row-keyed splitter) because a leakage contract is
    exactly the split a downstream trainer must be able to re-derive."""
    comp = components.select(
        F.col("id").alias(id_col), F.col("component").alias("__comp")
    )
    withc = df.join(comp, id_col, "left").withColumn(
        "__key", F.coalesce(F.col("__comp"), F.col(id_col)).cast("string")
    )
    out = deterministic_split(withc, "__key", weights, seed=seed, portable=portable)
    return out.drop("__comp", "__key")


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epoch: int,
    seed: int = 0,
    pos_col: str = "pos",
    num_buckets: int | None = None,
) -> DataFrame:
    """All input columns + ``pos_col``: the deterministic training order
    for one epoch — contiguous 1-based positions in
    ``md5(seed|epoch|key)``-shuffled order (VERDICT r8 #7).  Every epoch
    is an independent uniform permutation of the corpus (the epoch sits
    INSIDE the hash, so consecutive epochs share no ordering structure),
    and any engine with md5 — the trainer's data loader, an audit job,
    the DuckDB oracle — re-derives the identical order from the raw
    keys: the last reproducibility contract the training-mix family
    lacked (mixture, packing, and splits already have portable twins).

    Plan: operators/ranks.py global_rank — one range exchange on the
    md5 key + a bucket-offset broadcast + per-bucket local windows,
    nothing data-sized on one task.  ``key_col`` must be unique (the
    md5+key compound is then a total order, same contract as
    assign_stable_ids)."""
    from bigdata_hits_spark.operators.ranks import global_rank

    md5_key = F.md5(
        F.concat_ws(
            "|", F.lit(seed), F.lit(epoch), F.col(key_col).cast("string")
        )
    )
    return global_rank(
        df.withColumn("__ek", md5_key),
        [F.col("__ek").asc(), F.col(key_col).asc()],
        rank_col=pos_col,
        num_buckets=num_buckets,
    ).drop("__ek")
