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
