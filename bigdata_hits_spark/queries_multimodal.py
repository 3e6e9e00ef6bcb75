"""Declared query + oracle for the multimodal feature-extraction path.

The Spark side runs the REAL plumbing (binary payload column ->
Arrow-batched mapInPandas -> flat feature rows); the oracle reproduces the
deterministic fake features in SQL (md5 hex pairs / 255), so the gate
checks the whole pandas-UDF pipeline end to end.
"""

from __future__ import annotations

from bigdata_hits_spark.operators import multimodal as MM
from bigdata_hits_spark.oracles import duck_hex_to_long
from bigdata_hits_spark.queries import register
from bigdata_hits_spark.sources.readers import load_table


def _features_sql() -> str:
    # feature i reads hex pair (i mod 16): chars 2*(i%16)+1 .. +2 of md5(text)
    byte_expr = duck_hex_to_long("substr(md5(text), 2 * (i % 16) + 1, 2)", 2)
    return (
        f"WITH e AS (SELECT doc_id, text, unnest(range({MM.FEATURE_DIM})) AS i FROM documents) "
        f"SELECT doc_id, CAST(i AS INTEGER) AS i, "
        f"ROUND(CAST({byte_expr} / 255.0 AS DOUBLE), 7) AS feat FROM e"
    )


@register("multimodal_features", _features_sql())
def q_multimodal_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return MM.extract_features(MM.with_payload(docs))


N_FRAMES = 4


@register(
    "multimodal_frame_offsets",
    f"WITH f AS (SELECT doc_id, n_chars, unnest(range({N_FRAMES})) AS frame_idx FROM documents) "
    "SELECT doc_id AS id, CAST(frame_idx AS INTEGER) AS frame_idx, "
    f"CAST(n_chars * frame_idx / {N_FRAMES} AS DOUBLE) AS offset_pos FROM f",
)
def q_multimodal_frame_offsets(spark, sf_dir):
    """Frame-sampling plumbing over the documents table, with n_chars
    standing in for a media duration (no codecs in this container)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    frames = MM.sample_frames(docs, duration_col="n_chars", n_frames=N_FRAMES)
    return frames.select(
        "id", F.col("frame_idx").cast("int").alias("frame_idx"), F.col("offset").alias("offset_pos")
    )
