"""Relational primitives — the reference's operator inventory (SURVEY §2.1,
O1-O22) as thin, tested DataFrame wrappers.

Most primitives are one Catalyst expression; they exist as named functions
so each has a declared query + DuckDB oracle in the driver contract, and so
scale-sensitive rewrites (OR-semi-join, top-K) live in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def project(df: DataFrame, *cols: str) -> DataFrame:
    """O2 — column pruning; reaches the parquet scan as ReadSchema."""
    return df.select(*cols)


def filter_eq(df: DataFrame, col: str, value) -> DataFrame:
    """O4 — equality predicate; pushes down to the scan (PushedFilters)."""
    return df.filter(F.col(col) == F.lit(value))


def conditional_flag(df: DataFrame, cond: Column, flag_col: str) -> DataFrame:
    """O5 — 0/1 indicator column via when/otherwise
    (``topic_specific_hits.py:54``)."""
    return df.withColumn(flag_col, F.when(cond, F.lit(1)).otherwise(F.lit(0)))


def semi_join_and(
    left: DataFrame, right_a: DataFrame, cond_a: Column, right_b: DataFrame, cond_b: Column
) -> DataFrame:
    """O8 — conjunctive existence filter as two equi left-semi joins
    (the intended semantics of ``topic_exclusive_hits.py:49``,
    SURVEY §2.4(b))."""
    return left.join(right_a, cond_a, "leftsemi").join(right_b, cond_b, "leftsemi")


def semi_join_or(
    left: DataFrame, conds: list[tuple[DataFrame, str, str]]
) -> DataFrame:
    """O9 — disjunctive existence filter: keep left rows where ANY
    ``(right_df, left_key, right_key)`` membership condition holds.

    The reference writes this as one OR-predicate left-semi join
    (``query_dependent_hits.py:50``), which Spark must execute as a
    BroadcastNestedLoopJoin — O(|L|·|R|) and a full broadcast.  Rewritten
    here as k equi left-joins against the distinct key sets with existence
    markers, filtered on any marker: hash joins all the way down,
    multiplicity-preserving, AQE/skew-eligible.
    """
    out = left
    markers = []
    for i, (right, lk, rk) in enumerate(conds):
        marker = f"__hit_{i}"
        markers.append(marker)
        hit = right.select(F.col(rk).alias(f"__k_{i}"), F.lit(True).alias(marker)).distinct()
        out = out.join(hit, out[lk] == hit[f"__k_{i}"], "left")
    pred = F.lit(False)
    for marker in markers:
        pred = pred | F.col(marker).isNotNull()
    return out.filter(pred).drop(*[f"__k_{i}" for i in range(len(conds))], *markers)


def degrees(edges: DataFrame, key: str, *, weight: str | None = None, out_col: str = "degree") -> DataFrame:
    """O10/O11 — grouped count (degree) or grouped sum (weighted degree)
    per node (``base_salsa_2.py:14-17``, ``weighted_salsa.py:41-42``).
    HashAggregate with map-side partials — one shuffle."""
    agg = F.sum(F.col(weight)) if weight else F.count(F.lit(1))
    return edges.groupBy(F.col(key).alias("id")).agg(agg.alias(out_col))


def grand_norm(df: DataFrame, col: str, how: str = "l2") -> DataFrame:
    """O12 — one-row grand aggregate: L2 norm or L1 sum of a column
    (``base_hits.py:16-19``, ``base_salsa.py:13-15``).  Stays a DataFrame
    (no driver collect)."""
    c = F.col(col)
    agg = F.sqrt(F.sum(c * c)) if how == "l2" else F.sum(c)
    return df.agg(agg.cast("double").alias("norm"))


def count_rows(df: DataFrame, alias: str = "n") -> DataFrame:
    """O20 — one-row count (``base_hits.py:44`` count action), kept as a
    DataFrame so it composes (no driver collect)."""
    return df.agg(F.count(F.lit(1)).alias(alias))


def distinct_values(df: DataFrame, col: str, alias: str | None = None) -> DataFrame:
    """O15 — distinct values of one column (``list_topics.py:17``)."""
    return df.select(F.col(col).alias(alias or col)).distinct()


def top_k(df: DataFrame, order_col: str, k: int, *tiebreak: str) -> DataFrame:
    """O16/O17 — global desc sort + limit; Spark plans it as
    TakeOrderedAndProject (per-partition heaps + driver merge), never a
    full sort at scale.  Tiebreak columns make the result set
    deterministic across engines."""
    order = [F.desc(order_col), *[F.asc(c) for c in tiebreak]]
    return df.orderBy(*order).limit(k)


def bernoulli_sample(df: DataFrame, fraction: float, seed: int) -> DataFrame:
    """O19 — seeded Bernoulli sample without replacement
    (``base_hits.py:78-79``).  Seeded per-engine, so correctness checks
    are rows-only (SURVEY §2.5)."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(status, *key_cols, *compare_cols): dataset-versioning diff of two
    snapshots of the same table — ``inserted`` (key only in new),
    ``deleted`` (key only in old), ``changed`` (key in both, any compare
    column differs, NULL-safe).  Unchanged rows are omitted, so the
    output is change-sized, not table-sized — the audit/QA primitive
    behind "what did this pipeline rerun actually touch".

    Value columns carry the NEW side for inserted/changed rows and the
    OLD side for deleted ones — selected by status, not coalesce, so a
    change TO NULL shows NULL rather than leaking the old value.

    ``compare_cols`` defaults to every non-key column the two snapshots
    share.  Plan: ONE full-outer equi-join on the keys (shuffle keyed,
    AQE/skew eligible) + column comparisons inside the projection; no
    second pass, nothing collected.

    Keys must be UNIQUE within each snapshot: a duplicated key fans out
    through the full-outer join (every old copy pairs with every new
    copy) and the resulting rows classify arbitrarily.  The join is
    NULL-safe, so a legitimately-NULL key is a key value like any other
    — side presence is tracked by literal marker columns (the
    ``F.lit(True)`` pattern), not key-IS-NOT-NULL, so NULL-keyed rows
    classify correctly too."""
    if not key_cols:
        raise ValueError("snapshot_diff needs at least one key column")
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in set(key_cols)
        ]
    o = old.select(
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__ok_{c}") for c in key_cols],
        *[F.col(c).alias(f"__ov_{c}") for c in compare_cols],
    )
    n = new.select(
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__nk_{c}") for c in key_cols],
        *[F.col(c).alias(f"__nv_{c}") for c in compare_cols],
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"__ok_{c}").eqNullSafe(F.col(f"__nk_{c}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__ov_{c}").eqNullSafe(F.col(f"__nv_{c}"))
    status = (
        F.when(~in_old, F.lit("inserted"))
        .when(~in_new, F.lit("deleted"))
        .when(~same, F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            "status",
            *[
                F.coalesce(F.col(f"__nk_{c}"), F.col(f"__ok_{c}")).alias(c)
                for c in key_cols
            ],
            *[
                F.when(F.col("status") == "deleted", F.col(f"__ov_{c}"))
                .otherwise(F.col(f"__nv_{c}"))
                .alias(c)
                for c in compare_cols
            ],
        )
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigating equi-join: split each hot key across ``salts``
    shuffle partitions.

    The probe (left) side gets a random salt per row; the build (right)
    side is replicated across every salt value, so the join key becomes
    (key, salt) and a single hot key's rows spread over ``salts``
    reducers.  Which salt a row draws never changes the OUTPUT (the right
    row exists under every salt), so task retries are safe despite the
    nondeterministic draw.  Cost: right side ×``salts`` — use for
    skewed-fact × modest-dim joins when AQE's skew-join can't apply
    (e.g. the exchange feeds a non-join operator).  grouped aggregation
    does NOT need this: partial aggregation already collapses hot groups
    map-side.

    Only inner/left-flavored joins are supported: the right side is
    replicated across every salt value, so a right/full outer join would
    emit each unmatched right row ``salts`` times."""
    allowed = {"inner", "left", "left_outer", "leftouter", "leftsemi", "left_semi", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/leftsemi/leftanti joins only, got how={how!r}: "
            "the replicated right side would duplicate unmatched right rows "
            "under right/full outer semantics"
        )
    salted_left = left.withColumn("__salt", (F.rand(seed=0) * salts).cast("int"))
    salt_values = F.explode(F.sequence(F.lit(0), F.lit(salts - 1))).alias("__salt")
    salted_right = right.select("*", salt_values)
    joined = salted_left.join(
        salted_right,
        (salted_left[left_key] == salted_right[right_key])
        & (salted_left["__salt"] == salted_right["__salt"]),
        how,
    )
    return joined.drop("__salt")


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    cols: list[str] | None = None,
) -> DataFrame:
    """(sign, *key_cols, *cols): the two snapshots' difference as a
    RETRACTION STREAM — the changelog form aggregate-maintenance needs
    (the public stream-processing convention: insertions carry +1,
    retractions -1; a changed row is a -1 with its OLD values plus a +1
    with its NEW ones).  Feeding this to ``apply_delta_rollup`` updates
    a stored rollup without touching the fact table.

    ``cols`` defaults to every shared non-key column.  A row whose
    change is confined to columns OUTSIDE ``cols`` emits nothing — the
    right call for maintenance, because a rollup over ``cols`` cannot
    depend on such a change.

    Same plan as ``snapshot_diff`` (one NULL-safe full-outer key join,
    change-sized output, unique keys required); the changed-row pair is
    produced by exploding a 2-slot literal array inside the projection,
    not by a second pass."""
    if not key_cols:
        raise ValueError("snapshot_delta needs at least one key column")
    if cols is None:
        cols = [
            c for c in old.columns if c in set(new.columns) and c not in set(key_cols)
        ]
    o = old.select(
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__ok_{c}") for c in key_cols],
        *[F.col(c).alias(f"__ov_{c}") for c in cols],
    )
    n = new.select(
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__nk_{c}") for c in key_cols],
        *[F.col(c).alias(f"__nv_{c}") for c in cols],
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"__ok_{c}").eqNullSafe(F.col(f"__nk_{c}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"__ov_{c}").eqNullSafe(F.col(f"__nv_{c}"))

    def _contrib(sign: int, prefix: str) -> Column:
        return F.named_struct(
            F.lit("sign"),
            F.lit(sign),
            *[x for c in cols for x in (F.lit(c), F.col(f"{prefix}_{c}"))],
        )

    contribs = F.array_compact(
        F.array(
            F.when(in_old & (~in_new | ~same), _contrib(-1, "__ov")),
            F.when(in_new & (~in_old | ~same), _contrib(+1, "__nv")),
        )
    )
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"__nk_{c}"), F.col(f"__ok_{c}")).alias(c)
                for c in key_cols
            ],
            F.explode(contribs).alias("__delta"),
        )
        .select(
            F.col("__delta.sign").alias("sign"),
            *key_cols,
            *[F.col(f"__delta.{c}").alias(c) for c in cols],
        )
    )


def apply_delta_rollup(
    old_agg: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    count_col: str = "n",
    sign_col: str = "sign",
) -> DataFrame:
    """Merge a retraction-stream ``delta`` (``snapshot_delta`` shape, or
    any CDC feed carrying a ±1 ``sign_col``) into a stored COUNT+SUM
    rollup: ``count_col`` moves by the signed row count, each column in
    ``sum_cols`` by the signed value sum, and groups whose count reaches
    zero drop out.  Only commutative-group measures maintain this way —
    count, sum, and anything derived from them (avg = sum/count); min
    and max cannot absorb retractions without re-reading the group.

    Scale contract: the plan aggregates the delta (delta-sized shuffle
    collapsing to its group count), unions the group-sized ``old_agg``,
    and re-aggregates group-sized rows — cost O(|delta| + |groups|),
    NEVER O(fact table).  At 100 TB this is the difference between a
    rollup refresh that reads gigabytes and one that reads everything.

    ``old_agg`` must carry UNROUNDED sums (round only what you serve):
    merging rounds on top of rounds drifts.  Float caveat: the merged
    sum's accumulation order differs from a direct recompute's, so
    serve-side rounding is what makes the two paths agree bit-for-bit —
    the engine-portability discipline used across this repo."""
    if not group_cols:
        raise ValueError("apply_delta_rollup needs at least one group column")
    d = delta.groupBy(*group_cols).agg(
        F.sum(sign_col).cast("long").alias(count_col),
        *[F.sum(F.col(sign_col) * F.col(c)).alias(c) for c in sum_cols],
    )
    merged = old_agg.select(*group_cols, count_col, *sum_cols).unionByName(d)
    return (
        merged.groupBy(*group_cols)
        .agg(
            F.sum(count_col).alias(count_col),
            *[F.sum(c).alias(c) for c in sum_cols],
        )
        .filter(F.col(count_col) > 0)
    )


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key: the row with the greatest ``order_cols`` tuple —
    changelog-to-snapshot compaction (the newest version of every URL in
    a crawl log, the final state of every row in a CDC feed, the last
    event per user).  ``order_cols`` must totally order rows WITHIN a
    key (include a unique tiebreak like an event/sequence id): with
    ties, max_by picks an arbitrary peer, exactly as the row_number
    idiom would under a non-total sort.

    Plan: ONE hash aggregate of ``max_by(struct(payload),
    struct(order))`` — deliberately NOT the ``row_number() = 1`` window
    idiom.  Partial aggregation collapses every mapper's rows to one
    candidate per key BEFORE the exchange, so a hot key (one URL
    recrawled a billion times) reduces map-side and shuffles a handful
    of candidate rows; the window form shuffles and SORTS every version
    of the hot key in one task.  Same answer, skew-immune plan.
    """
    if not key_cols or not order_cols:
        raise ValueError("latest_by_key needs key_cols and order_cols")
    if payload_cols is None:
        payload_cols = [c for c in df.columns if c not in set(key_cols)]
    picked = F.max_by(
        F.struct(*[F.col(c) for c in payload_cols]),
        F.struct(*[F.col(c) for c in order_cols]),
    )
    return (
        df.groupBy(*key_cols)
        .agg(picked.alias("__r"))
        .select(*key_cols, *[F.col(f"__r.{c}").alias(c) for c in payload_cols])
    )

def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    *,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a changelog: every
    version of a key gets half-open validity bounds ``[valid_from,
    valid_to)`` and an ``is_current`` flag — the dimension-table build
    that lets an as-of join answer "what was this user's state when the
    event happened".  ``valid_from`` is the version's own
    ``order_cols[0]`` value; ``valid_to`` is the NEXT version's (NULL on
    the open, current version).  ``order_cols`` must totally order
    versions within a key (include a unique tiebreak id) — the same
    precondition as ``latest_by_key``.

    Plan: ONE key-partitioned window (a single LEAD over
    ``partitionBy(key)``) — one shuffle on the key, no self-join; skew
    is bounded by the busiest key's version count, the same envelope as
    sessionize.  Complements ``latest_by_key`` (which keeps only the
    newest version) and ``snapshot_diff`` (which compares two whole
    snapshots): this keeps the full history, queryable by time range.
    """
    if not key_cols or not order_cols:
        raise ValueError("scd2_history needs key_cols and order_cols")
    w = Window.partitionBy(*key_cols).orderBy(*[F.asc(c) for c in order_cols])
    lead_from = F.lead(F.col(order_cols[0])).over(w)
    return (
        df.withColumn(from_col, F.col(order_cols[0]))
        .withColumn(to_col, lead_from)
        .withColumn(
            current_col,
            F.when(F.col(to_col).isNull(), F.lit(1)).otherwise(F.lit(0)),
        )
    )


#: Modulus for the checksum's order-independent partial sum (a prime
#: ~1e6): keeps SUM(h % P) under int64 for ~9e12 rows per bucket.
CHECKSUM_SUM_MOD = 1_000_003


def table_checksum(
    df: DataFrame,
    key_cols: list[str],
    cols: list[str] | None = None,
    buckets: int = 64,
) -> DataFrame:
    """Order-independent per-bucket content fingerprint: ``(bucket,
    n_rows, xor_hash, sum_hash)`` — the anti-entropy digest two replicas
    (or two pipeline runs, or a table and its restored backup) exchange
    to locate divergence WITHOUT shipping rows: compare bucket rows,
    recurse into (or re-sync) only the buckets that differ.  Rows are
    bucketed by a portable hash of ``key_cols`` — a modified row lands
    in the SAME bucket on both sides, so each divergent logical row
    perturbs exactly one bucket row.

    Per-row hash: md5 over a canonical '|'-joined rendering of ``cols``
    (NULL encoded as chr(1), distinct from the empty string), first 15
    hex digits as a 60-bit long.  Three aggregates per bucket, each
    order-independent and overflow-free at ANY row count (ANSI-safe:
    a plain SUM of 60-bit hashes would overflow long at ~32k rows):
    COUNT (catches adds/drops), BIT_XOR of the 60-bit hash (catches any
    single changed row; a k-row cancellation needs the xor of k
    60-bit deltas to vanish), and SUM of hash mod CHECKSUM_SUM_MOD
    (catches the duplicate-pair insert/delete that xor alone cancels).
    Matching all three is not a proof of equality but a 1-in-~2^80
    accident; the declared use is drift TRIAGE, not a cryptographic
    audit.

    Columns are rendered via CAST(x AS STRING), which is
    engine-portable for ints, strings, and dates; canonicalize floats
    and timestamps yourself (round/format to a fixed scale) before
    including them, or their last-ulp formatting differences read as
    divergence.  Plan: one map-side projection + one hash agg to
    ``buckets`` rows — nothing row-sized shuffles."""
    cols = cols if cols is not None else list(df.columns)

    def _canon(cs: list[str]) -> Column:
        return F.md5(
            F.concat_ws(
                "|",
                *[F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cs],
            )
        )

    h = F.conv(F.substring(_canon(cols), 1, 15), 16, 10).cast("long")
    bucket = (
        F.conv(F.substring(_canon(key_cols), 1, 8), 16, 10).cast("long") % buckets
    )
    return (
        df.select(bucket.alias("bucket"), h.alias("__h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("__h").alias("xor_hash"),
            F.sum(F.col("__h") % CHECKSUM_SUM_MOD).alias("sum_hash"),
        )
    )


def checksum_delta(
    delta: DataFrame,
    key_cols: list[str],
    cols: list[str] | None = None,
    buckets: int = 64,
    sign_col: str = "sign",
) -> DataFrame:
    """Signed digest delta of a retraction batch (``sign`` = +1 insert /
    -1 retract, the snapshot_delta shape): per bucket ``(bucket, d_n,
    d_xor, d_sum)`` such that merging into a stored
    :func:`table_checksum` digest (:func:`apply_delta_checksum`) yields
    EXACTLY the digest of the net table — every term of the checksum is
    chosen to be incrementally maintainable: COUNT adds signs, the
    60-bit XOR is its own inverse (a retraction re-XORs the hash it
    inserted), and the modular SUM adds ``sign * (h % P)``.  Work is
    O(|batch|) with one bucket-keyed hash agg; the maintained table is
    never re-read."""
    cols = cols if cols is not None else [
        c for c in delta.columns if c != sign_col
    ]

    def _canon(cs: list[str]) -> Column:
        return F.md5(
            F.concat_ws(
                "|",
                *[F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cs],
            )
        )

    h = F.conv(F.substring(_canon(cols), 1, 15), 16, 10).cast("long")
    bucket = (
        F.conv(F.substring(_canon(key_cols), 1, 8), 16, 10).cast("long") % buckets
    )
    return (
        delta.select(
            bucket.alias("bucket"),
            h.alias("__h"),
            F.col(sign_col).cast("long").alias("__s"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("__s").alias("d_n"),
            F.bit_xor("__h").alias("d_xor"),
            F.sum(F.col("__s") * (F.col("__h") % CHECKSUM_SUM_MOD)).alias("d_sum"),
        )
    )


def apply_delta_checksum(old: DataFrame, delta_digest: DataFrame) -> DataFrame:
    """Merge a :func:`checksum_delta` into a stored digest: one
    bucket-keyed full-outer join (buckets-sized on BOTH sides — nothing
    row-sized moves), XOR/add per term, empty buckets dropped.  The
    result is bit-identical to :func:`table_checksum` over the net
    table (pytest-enforced stream-batch equivalence,
    tests/test_streaming.py)."""
    d = delta_digest.select(
        F.col("bucket").alias("__b"), "d_n", "d_xor", "d_sum"
    )
    merged = old.join(d, F.col("bucket").eqNullSafe(F.col("__b")), "full_outer")
    z = F.lit(0)
    return (
        merged.select(
            F.coalesce("bucket", "__b").alias("bucket"),
            (F.coalesce(F.col("n_rows"), z) + F.coalesce(F.col("d_n"), z)).alias(
                "n_rows"
            ),
            F.coalesce(F.col("xor_hash"), z)
            .bitwiseXOR(F.coalesce(F.col("d_xor"), z))
            .alias("xor_hash"),
            (
                F.coalesce(F.col("sum_hash"), z) + F.coalesce(F.col("d_sum"), z)
            ).alias("sum_hash"),
        )
        .filter(F.col("n_rows") > 0)
    )
