"""Output sinks: Parquet/CSV writers plus a reference-parity score sink.

The reference's only data sink is a single-partition text file of Python
tuple ``repr`` strings (``rdd.coalesce(1, False).saveAsTextFile(...)`` —
``/root/reference/src/base_hits.py:70-71``, acknowledged in-code as "not
recommended for big data", ``base_hits.py:69``).  Here the engine-native
sinks are columnar and partition-parallel; the tuple-text shape survives
only behind :func:`write_scores_text` for golden-output compatibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Engine-native sink.  ``partition_by`` yields directory-partitioned
    output (partition pruning on read)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """Plain CSV sink (one file per partition)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange shape most text/LLM-corpus tools
    consume (one object per line, splittable, partition-parallel)."""
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — columnar alternative to parquet for warehouses
    standardized on the ORC stack; same predicate-pushdown/pruning story."""
    df.write.mode(mode).orc(path)


def scores_as_tuple_text(scores: DataFrame, id_col: str = "id", score_col: str = "score") -> DataFrame:
    """One-column DataFrame of ``('<id>', <score>)`` lines, the shape of the
    reference's committed golden outputs
    (``outputs/base_HITS/base_hub_scores.txt/part-00000``).

    Float formatting follows Spark's double->string cast (Java
    ``Double.toString``), which matches Python ``repr`` for the typical
    score magnitudes; tiny magnitudes (<1e-3) render in scientific
    notation in both, with case differing (E vs e) — cosmetic only.
    """
    return scores.select(
        F.concat(
            F.lit("('"), F.col(id_col), F.lit("', "), F.col(score_col).cast("string"), F.lit(")")
        ).alias("value")
    )


def write_scores_text(
    scores: DataFrame,
    path: str,
    mode: str = "overwrite",
    single_file: bool = True,
    id_col: str = "id",
    score_col: str = "score",
) -> None:
    """Reference-parity sink: sorted ``('id', score)`` lines.

    ``single_file=True`` reproduces the reference's ``coalesce(1)`` layout
    (one ``part-00000``).  Order is preserved: coalesce(1) reads the sorted
    upstream partitions sequentially.  For genuinely large score vectors
    pass ``single_file=False`` to keep the write parallel.
    """
    lines = scores_as_tuple_text(scores, id_col, score_col)
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode(mode).text(path)
