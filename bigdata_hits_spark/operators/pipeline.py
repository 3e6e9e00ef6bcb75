"""Composed corpus-cleaning pipeline — the operators wired end to end.

Individually, quality scoring (functions/text.py), exact dedup, near-dup
pair detection (operators/dedup.py), and cluster-based survivor election
(operators/components.py) are each one stage of the standard
training-corpus preparation recipe.  This module is the composition:

    raw docs -> quality floor -> exact dedup -> near-dup removal
             -> per-doc stats (tokens, language, fingerprint)

Stage order is the cost order: the quality filter is a narrow map (no
shuffle) and runs first so every later shuffle sees fewer rows; exact
dedup is one hash-groupBy and removes the easy mass before the (more
expensive) MinHash+LSH stage ever shingles a body.  All stages pass
document bodies through narrowly — shuffles carry hashes, ids, and
signatures only — so the composition inherits each stage's 100 TB story
unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from bigdata_hits_spark.functions.text import (
    bpe_tokens,
    doc_fingerprint,
    lang_scores,
    predicted_lang,
    quality_score,
    tokens,
)
from bigdata_hits_spark.operators.components import dedup_survivors
from bigdata_hits_spark.operators.dedup import exact_duplicates, minhash_near_duplicates


@dataclass(frozen=True)
class CleanStats:
    """Row counts after each stage, for pipeline observability.
    ``n_lexical`` is None when the optional semantic stage is off (then
    ``n_final`` IS the post-lexical count)."""

    n_raw: int
    n_quality: int
    n_exact: int
    n_final: int
    n_lexical: int | None = None


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.4,
    near_dup_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_stats: bool = False,
    vectors: DataFrame | None = None,
    vec_id_col: str = "vec_id",
    semantic_threshold: float = 0.95,
    boilerplate_min_df: int | None = None,
    min_unigram_logprob: float | None = None,
) -> DataFrame | tuple[DataFrame, CleanStats]:
    """Clean a document corpus; returns surviving docs with per-doc stat
    columns (``quality``, ``n_tokens``, ``n_bpe_tokens``, ``lang_pred``,
    ``fingerprint``) appended.

    ``vectors`` (optional) enables the embedding-space stage: after
    lexical near-dup removal, documents whose embeddings are
    cosine-similar beyond ``semantic_threshold`` collapse to one survivor
    (operators/similarity.py semantic_dedup, sign-LSH candidates + exact
    verify) — catches paraphrases MinHash misses.  It runs LAST so the
    (most expensive) vector stage only sees lexically-unique survivors,
    and the vector table is semi-joined down to them first.

    ``with_stats=True`` additionally returns per-stage row counts — each
    count is an extra action, so it is opt-in (a production run wants the
    one-pass plan, a calibration run wants the funnel).
    """
    text = F.col(text_col)

    # 0. Optional line-level boilerplate stripping (CCNet-style) — runs
    #    FIRST so repeated chrome neither depresses quality scores nor
    #    glues unrelated documents together in the near-dup stages.
    if boilerplate_min_df is not None:
        from bigdata_hits_spark.operators.dedup import strip_boilerplate

        cleaned = strip_boilerplate(docs, boilerplate_min_df, id_col, text_col)
        docs = (
            docs.drop(text_col)
            .join(cleaned.select(id_col, "clean_text"), id_col)
            .withColumnRenamed("clean_text", text_col)
        )

    # 1. Quality floor — narrow, no shuffle, prunes before any join.
    scored = docs.withColumn("quality", quality_score(text))
    quality = scored.filter(F.col("quality") >= min_quality)

    # 1b. Optional corpus-LM floor: drop documents whose tokens are
    #     improbably rare under the corpus's own unigram distribution
    #     (gibberish/OCR noise).  Two hash-aggs + one id-semi-join; runs
    #     after the free quality floor so the LM only trains/scores on
    #     plausibly-clean mass.
    if min_unigram_logprob is not None:
        from bigdata_hits_spark.operators.textstats import unigram_logprob

        lm_ok = unigram_logprob(quality, id_col, text_col).filter(
            F.col("avg_logprob") >= min_unigram_logprob
        )
        quality = quality.join(lm_ok.select(id_col), id_col, "left_semi")

    # 2. Exact dedup — keep each text's minimum-id row (one hash-groupBy;
    #    join back by id so bodies don't ride the aggregate).
    keep_exact = exact_duplicates(quality, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    exact = quality.join(keep_exact, id_col, "left_semi")

    # 3. Near-dup removal — MinHash+LSH pairs, clustered, one survivor
    #    per cluster (operators/components.py).
    pairs = minhash_near_duplicates(
        exact, near_dup_threshold, id_col=id_col, text_col=text_col
    )
    final = dedup_survivors(exact, pairs, id_col)
    n_lexical = None

    # 3b. Optional semantic (embedding) near-dup removal — vectors are
    #     first narrowed to the lexical survivors so the LSH stage never
    #     signatures a document already dropped upstream.
    if vectors is not None:
        from bigdata_hits_spark.operators.similarity import semantic_dedup

        if with_stats:
            n_lexical = final.count()
        vec_alive = vectors.join(
            final.select(F.col(id_col).alias(vec_id_col)), vec_id_col, "left_semi"
        )
        final = semantic_dedup(
            final,
            vec_alive,
            semantic_threshold,
            doc_id_col=id_col,
            vec_id_col=vec_id_col,
        )

    # 4. Per-doc stats for downstream budgeting/routing — all JVM Column
    #    expressions, computed only for survivors.  ``lang_pred`` (not
    #    ``lang``): the documents table carries a ground-truth ``lang``
    #    column that must not be shadowed.
    toks = tokens(text)
    final = final.select(
        "*",
        F.size(toks).alias("n_tokens"),
        F.size(bpe_tokens(text)).alias("n_bpe_tokens"),
        predicted_lang(lang_scores(toks)).alias("lang_pred"),
        doc_fingerprint(text).alias("fingerprint"),
    )

    if not with_stats:
        return final
    stats = CleanStats(
        n_raw=docs.count(),
        n_quality=quality.count(),
        n_exact=exact.count(),
        n_final=final.count(),
        n_lexical=n_lexical,
    )
    return final, stats


def resolve_entities(
    df: DataFrame,
    name_col: str,
    max_dist: int = 2,
    block: Column | None = None,
) -> DataFrame:
    """(name, canonical): map every distinct ``name_col`` value to the
    canonical (lexicographically smallest) member of its edit-distance
    cluster — entity resolution for short-string identity columns
    (vendor names, product titles, author strings), composed entirely
    from existing scale-safe pieces:

    1. candidate pairs within ``max_dist`` edits
       (operators/dedup.py levenshtein_neardup_pairs — complete
       length-band candidates, optional ``block`` key);
    2. transitive closure over the pair graph
       (operators/components.py connected_components — min-label
       propagation, auto-escalating to star contraction), so A~B and
       B~C canonicalize together even when A and C differ by more than
       ``max_dist`` (the standard, documented transitivity bargain of
       cluster-based resolution);
    3. names in no pair map to themselves.

    Join the result back on ``name_col`` to rewrite a fact table to
    canonical entities — names shuffle, fact rows join by name key.
    """
    from bigdata_hits_spark.operators.components import connected_components
    from bigdata_hits_spark.operators.dedup import levenshtein_neardup_pairs

    names = (
        df.select(F.col(name_col).alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
    )
    pairs = levenshtein_neardup_pairs(df, name_col, max_dist=max_dist, block=block)
    comp = connected_components(pairs, "name_a", "name_b")
    return (
        names.join(comp, names["name"] == comp["id"], "left")
        .select("name", F.coalesce(F.col("component"), F.col("name")).alias("canonical"))
    )
