"""Table profiling: the one-pass "ANALYZE" a pipeline runs before and
after every curation stage (did dedup drop the nulls? did the join
explode a column's cardinality?).

Beyond-reference breadth (the reference has no profiling surface); the
operator is a single wide aggregation whose output is COLUMN-count-sized
— the only driver-facing data is one row per column, at any input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, exact_distinct: bool = False) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value): one
    row per input column, values rendered as strings so heterogeneous
    column types share one schema.

    ``exact_distinct=False`` (default, the 100 TB mode) uses
    ``approx_count_distinct`` (HLL++, one pass, no expand).  ``True``
    computes exact distincts — Spark plans multiple COUNT(DISTINCT) via
    an Expand (rows × columns before the partial agg), which is the
    honest cost of exactness; use it on samples or when the gate needs
    bit-reproducible numbers (the declared oracle query does).

    Min/max order strings lexicographically on both engines for string
    columns and numerically otherwise; the rendered value is the
    engine-portable ``CAST(x AS STRING)`` of the typed extremum.
    """
    distinct = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = []
    for c in df.columns:
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            distinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__rows_{c}").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in df.columns
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
