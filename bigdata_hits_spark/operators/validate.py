"""Declarative data-quality validation — the Deequ/Great-Expectations
primitive a 100 TB ingestion pipeline gates on ("no NULL keys, orderkey
unique, status in {O,F,P}, every custkey resolves") — compiled into the
MINIMUM number of passes over the data:

- Every row-level rule (not_null, accepted_values, in_range, matches,
  unique-via-count-distinct) becomes one column of a SINGLE wide
  aggregate — one scan, one map-side-combined agg no matter how many
  rules — then ``stack`` pivots the one-row result into one row per
  rule IN-PLAN (no driver round-trip, the histogram/profiling
  discipline).
- Each foreign_key rule is one key-only left join against the distinct
  parent keys: violations AND total come out of the same aggregate, so
  a FK rule costs exactly one pass over the child keys.  Payload
  columns never shuffle.

Output is rule-sized, one row per rule: (rule, column, violations,
total, passed) — tiny, alert-able, composable.

``unique`` counts duplicate ROWS (total - distinct keys) via exact
count-distinct; Spark plans aggregates mixing distinct and plain
columns with an Expand (the profile_orders trade-off, documented
there) — at 100 TB gate on approx_count_distinct instead and audit
exactly only on failure.

The reference engine has no validation surface; this module belongs to
the training-data-pipeline extension.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Rule:
    kind: str
    column: str
    params: tuple = field(default_factory=tuple)


def not_null(column: str) -> Rule:
    return Rule("not_null", column)


def unique(column: str) -> Rule:
    return Rule("unique", column)


def accepted_values(column: str, values: list) -> Rule:
    return Rule("accepted_values", column, tuple(values))


def in_range(column: str, lo, hi) -> Rule:
    return Rule("in_range", column, (lo, hi))


def matches(column: str, regex: str) -> Rule:
    return Rule("matches", column, (regex,))


def foreign_key(column: str, parent: DataFrame, parent_column: str) -> Rule:
    """Every non-NULL child value must exist among the parent keys
    (NULL children pass, the SQL FK convention)."""
    return Rule("foreign_key", column, (parent, parent_column))


def _violation_expr(rule: Rule) -> Column:
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return F.sum(F.when(c.isNull(), 1).otherwise(0))
    if rule.kind == "unique":
        # duplicate rows = total - distinct keys (NULL keys count as
        # rows but never as a distinct key — the conservative read for
        # a key column; state not_null too for the full key contract)
        return F.count(F.lit(1)) - F.count_distinct(c)
    if rule.kind == "accepted_values":
        return F.sum(F.when(c.isin(list(rule.params)) | c.isNull(), 0).otherwise(1))
    if rule.kind == "in_range":
        lo, hi = rule.params
        return F.sum(F.when(c.isNull() | c.between(F.lit(lo), F.lit(hi)), 0).otherwise(1))
    if rule.kind == "matches":
        (regex,) = rule.params
        return F.sum(F.when(c.isNull() | c.rlike(regex), 0).otherwise(1))
    raise ValueError(f"unknown rule kind: {rule.kind}")


def _lit_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def check_table(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, column, violations, total, passed): evaluate every rule.
    NULLs violate only ``not_null`` (a range/set/regex predicate on
    NULL is unknown in SQL; gating on missingness is what not_null is
    for — state both rules to get both checks).  Fully lazy: the result
    is a rule-sized DataFrame, nothing is collected here."""
    if not rules:
        raise ValueError("check_table needs at least one rule")
    row_rules = [r for r in rules if r.kind != "foreign_key"]
    fk_rules = [r for r in rules if r.kind == "foreign_key"]
    parts = []
    if row_rules:
        aggs = [F.count(F.lit(1)).cast("long").alias("__total")] + [
            _violation_expr(r).cast("long").alias(f"__v{i}")
            for i, r in enumerate(row_rules)
        ]
        stack_args = ", ".join(
            f"{_lit_str(r.kind)}, {_lit_str(r.column)}, __v{i}"
            for i, r in enumerate(row_rules)
        )
        parts.append(
            df.agg(*aggs).select(
                F.expr(
                    f"stack({len(row_rules)}, {stack_args}) "
                    "AS (rule, column, violations)"
                ),
                F.col("__total").alias("total"),
            )
        )
    for r in fk_rules:
        parent, parent_col = r.params
        pkeys = (
            parent.select(F.col(parent_col).alias(r.column))
            .distinct()
            .withColumn("__p", F.lit(True))
        )
        joined = df.select(F.col(r.column)).join(pkeys, r.column, "left")
        parts.append(
            joined.agg(
                F.count(F.lit(1)).cast("long").alias("total"),
                F.sum(
                    F.when(
                        F.col(r.column).isNotNull() & F.col("__p").isNull(), 1
                    ).otherwise(0)
                )
                .cast("long")
                .alias("violations"),
            ).select(
                F.lit("foreign_key").alias("rule"),
                F.lit(r.column).alias("column"),
                "violations",
                "total",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0)
