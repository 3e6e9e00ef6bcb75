"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed
(clearly marked, raises unless the optional lib is importable), while all
the Spark-side plumbing is real and tested: binary schema, metadata
struct, Arrow batch shape, partition-parallel pandas processing, and a
deterministic fake feature extractor whose output is oracle-checkable
(features derive from md5 bytes of the payload).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

#: Schema of the metadata struct attached alongside every payload.
METADATA_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("source_len", T.IntegerType()),
    ]
)


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a deterministic 16-byte binary payload (md5 digest of the
    text) plus a typed metadata struct — the stand-in for real image/audio
    bytes while exercising the exact schema a multimodal table would use."""
    return docs.withColumn("payload", F.unhex(F.md5(F.col(text_col)))).withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.unhex(F.md5(F.col(text_col)))).cast("int").alias("n_bytes"),
            F.length(F.col(text_col)).cast("int").alias("source_len"),
        ),
    )


def decode_image(payload: bytes):
    """Decode image bytes to an (H, W, 3) uint8 RGB numpy array.

    The real path is wired through OPTIONAL pillow: when ``PIL`` imports,
    this decodes for real (any format pillow reads), so the moment the
    environment grows codecs the pipeline lights up with no code change.
    Without pillow (this container) it raises a clearly-marked
    NotImplementedError and ``extract_features`` keeps using the
    deterministic fake path.  tests/test_multimodal.py covers both arms:
    the raise arm runs here, the decode arm under
    ``pytest.importorskip('PIL')``."""
    try:
        import io

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires pillow, which is not installed; "
            "extract_features uses the deterministic fake path instead"
        ) from e
    import numpy as np

    with Image.open(io.BytesIO(bytes(payload))) as im:
        return np.asarray(im.convert("RGB"))


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", dim: int = FEATURE_DIM
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas``: feature i = payload_byte[i mod 16] / 255.0.

    Deterministic fake (no codecs), but the execution path is the real
    one a GPU/codec-backed extractor would use: batched pandas in, flat
    (id, i, feat) rows out, partition-parallel."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("feat", T.DoubleType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            payloads = pdf[payload_col]
            rows_id, rows_i, rows_f = [], [], []
            for did, pl in zip(ids, payloads):
                b = bytes(pl)
                for i in range(dim):
                    rows_id.append(did)
                    rows_i.append(i)
                    rows_f.append(round(b[i % len(b)] / 255.0, 7))
            yield pd.DataFrame({"doc_id": rows_id, "i": rows_i, "feat": rows_f})

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing: emits (id, payload, target_w, target_h,
    scale_meta) where the payload passes through untouched and scale_meta
    records what a decoder-backed resizer would do.  The real pixel work
    belongs in the same ``mapInPandas`` slot as
    :func:`extract_features`; without codecs (:func:`decode_image`) the
    contract — binary in, binary + typed metadata out, partition-parallel
    — is what the pipeline depends on and what is tested."""
    return df.select(
        id_col,
        payload_col,
        F.lit(target_w).alias("target_w"),
        F.lit(target_h).alias("target_h"),
        F.struct(
            F.length(F.col(payload_col)).cast("int").alias("in_bytes"),
            F.lit("pass-through-stub").alias("method"),
        ).alias("scale_meta"),
    )


def sample_frames(
    df: DataFrame, duration_col: str, n_frames: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit the frame offsets
    a decoder would seek to (uniform stride over the duration), one row
    per (id, frame_idx, offset).  Decoding itself is stubbed
    (:func:`decode_image`); the offsets/partitioning are the real part."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    out = df.select(F.col(id_col).alias("id"), F.col(duration_col).alias("dur"), idx)
    return out.select(
        "id",
        "frame_idx",
        (F.col("dur") * F.col("frame_idx") / F.lit(n_frames)).cast("double").alias("offset"),
    )
