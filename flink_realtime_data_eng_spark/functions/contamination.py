"""Train/eval decontamination: n-gram overlap against a held-out set.

The standard LLM-pretraining hygiene step (the reference engine has no
analog; this extends SURVEY §2.9's dedup family): any training document
sharing >= ``min_shared`` distinct word n-grams with an evaluation document
is flagged as contaminated and dropped before training.

Scale shape: the eval set is orders of magnitude smaller than the corpus,
so its shingle set is explicitly broadcast — the training corpus streams
map-side through one explode + hash-join + partial-count, never shuffling
the raw text. The n-gram inner join is the same bucketed-candidate pattern
as MinHash LSH (functions/dedup.py): work is proportional to MATCHING
shingles, not to the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles


def ngram_overlap(train: DataFrame, eval_df: DataFrame, n: int = 5,
                  min_shared: int = 1, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Pairs (train_id, eval_id, shared_ngrams) with at least ``min_shared``
    distinct shared word n-grams. ``shingles`` already emits DISTINCT
    per-doc n-grams, so the count is set-intersection cardinality."""
    t = shingles(train, n=n, text_col=text_col, id_col=id_col) \
        .withColumnRenamed(id_col, "train_id")
    e = shingles(eval_df, n=n, text_col=text_col, id_col=id_col) \
        .withColumnRenamed(id_col, "eval_id")
    return (t.join(F.broadcast(e), "shingle")
             .groupBy("train_id", "eval_id")
             .agg(F.count(F.lit(1)).alias("shared_ngrams"))
             .filter(F.col("shared_ngrams") >= min_shared))


def contaminated_ids(train: DataFrame, eval_df: DataFrame, n: int = 5,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Ids of train docs sharing ANY distinct word n-gram with ANY eval
    doc — the ``min_shared=1`` fast path of :func:`ngram_overlap`
    (identical flagged set): LEFT SEMI against the DISTINCT eval shingle
    set, so a train shingle matching k eval docs emits one probe row
    instead of k joined rows and the per-pair count aggregate disappears
    (r11 profile: the pair fanout was ~2x the semi-join cost at 100x SF).
    Use :func:`ngram_overlap` when the per-pair shared count matters."""
    t = shingles(train, n=n, text_col=text_col, id_col=id_col)
    e = (shingles(eval_df, n=n, text_col=text_col, id_col=id_col)
         .select("shingle").distinct())
    return (t.join(F.broadcast(e), "shingle", "left_semi")
             .select(id_col).distinct())


def decontaminate(train: DataFrame, eval_df: DataFrame, n: int = 5,
                  min_shared: int = 1, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """The training corpus minus contaminated docs (LEFT ANTI against the
    flagged id set). Keeps all train columns."""
    flagged = (ngram_overlap(train, eval_df, n=n, min_shared=min_shared,
                             text_col=text_col, id_col=id_col)
               .select(F.col("train_id").alias(id_col)).distinct())
    return train.join(flagged, id_col, "left_anti")
