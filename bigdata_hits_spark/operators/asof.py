"""As-of (time-travel) join — an operator Spark's built-ins lack.

``asof_join(left, right, ...)`` attaches, to each left row, the columns of
the LATEST right row whose time is <= the left row's time, per key
(backward direction, inclusive — the semantics of DuckDB/pandas
``ASOF JOIN``).

Plan: instead of a range join (which Spark would execute as a
broadcast-nested-loop or an exploded inequality join — quadratic per key),
both sides are tagged and UNIONED, then a single window pass per key
carries the most recent right-side values forward into the left rows
(``last(..., ignorenulls=True)`` over rows unbounded-preceding).  One
shuffle on the key, linear work, no row explosion — survives keys with
millions of rows on both sides.  Tie discipline: ordering is
(time, side, right-tiebreak) with right rows first, so an exactly-equal
timestamp matches, and duplicate right timestamps resolve to the highest
tiebreak value deterministically (both engines agree — the SQL oracle
mirrors the same window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    tiebreak: str,
    suffix: str = "_r",
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join: left columns + ``<value_col><suffix>`` columns
    from the latest right row with ``right.on <= left.on`` per ``by`` key.

    ``tiebreak`` is a right-side column that makes duplicate right
    timestamps deterministic (highest wins).  ``tolerance`` (same unit as
    ``on``) nulls out matches older than ``left.on - tolerance``.
    """
    carried = list(value_cols)
    if tolerance is not None and on not in carried:
        carried = carried + [on]

    left_only = [c for c in left.columns]
    l_tagged = left.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in left_only],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in carried],
    )
    r_tagged = right.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).cast("long").alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        *[F.col(c).alias(f"__v_{c}") for c in carried],
    )
    w = (
        Window.partitionBy("__by")
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *left_only,
        F.col("__side").alias("__side"),
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in carried],
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        age_ok = (F.col(on) - F.col(f"{on}{suffix}")) <= F.lit(tolerance)
        out = out.select(
            *left_only,
            *[
                F.when(age_ok, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
    else:
        out = out.select(*left_only, *[F.col(f"{c}{suffix}") for c in value_cols])
    return out
