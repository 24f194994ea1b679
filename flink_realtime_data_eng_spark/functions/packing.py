"""Corpus-assembly operators: sequence packing offsets and source mixture
weighting (the last mile of an LLM pretraining data pipeline).

Packing uses the concat-and-chunk discipline: documents are laid out
back-to-back in a deterministic order and the token stream is cut into
fixed ``seq_len`` windows. The assignment is pure prefix-sum arithmetic, so
it runs as ONE window pass — no driver loop, no UDF.

Scale shape: the running offset is computed per ``shard_col`` partition
(real pipelines pack per shard/source, never globally) — a global order-by
would funnel the corpus through one partition; per-shard windows keep every
partition independent. Mixture weighting is a single tiny aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .text import tokens


def pack_offsets(df: DataFrame, seq_len: int = 2048,
                 text_col: str = "text", id_col: str = "doc_id",
                 shard_col: str = "source") -> DataFrame:
    """Token-offset assignment for concat-and-chunk packing.

    Per shard, documents are concatenated in ``id_col`` order; each doc gets
    its starting token offset and the range of ``seq_len``-sized chunks it
    lands in. Output: shard, id, n_tokens, start_offset, chunk_first,
    chunk_last (empty docs take chunk range [-1, -1] — they occupy no
    tokens, so membership in a chunk would be a lie).
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    n_tok = F.size(tokens(text_col))
    # n_tokens as tiebreak: with duplicate (shard, id) rows a plain
    # ORDER BY id leaves the running sum engine/run-nondeterministic;
    # adding the measure makes the assignment a deterministic multiset
    # (equal rows are interchangeable, unequal rows are ordered).
    w = (W.partitionBy(shard_col).orderBy(id_col, "n_tokens")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    with_off = (df.select(F.col(shard_col), F.col(id_col),
                          n_tok.alias("n_tokens"))
                  .withColumn("end_offset", F.sum("n_tokens").over(w))
                  .withColumn("start_offset",
                              (F.col("end_offset") - F.col("n_tokens"))
                              .cast("bigint")))
    return with_off.select(
        shard_col, id_col, F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "start_offset",
        F.when(F.col("n_tokens") > 0,
               F.floor(F.col("start_offset") / seq_len))
         .otherwise(F.lit(-1)).cast("bigint").alias("chunk_first"),
        F.when(F.col("n_tokens") > 0,
               F.floor((F.col("end_offset") - 1) / seq_len))
         .otherwise(F.lit(-1)).cast("bigint").alias("chunk_last"))


def source_mixture(df: DataFrame, text_col: str = "text",
                   source_col: str = "source",
                   target_share: dict[str, float] | None = None) -> DataFrame:
    """Per-source corpus statistics + sampling weight.

    token_share is each source's fraction of corpus tokens; sample_weight is
    the per-doc repetition factor needed to hit ``target_share`` (uniform
    across sources when not given) — the knob pipelines tune to re-balance a
    web-heavy crawl. One aggregate over (source); the corpus total comes
    from an unpartitioned window over the per-source rows (source
    cardinality is tiny), NOT a second aggregate branch — Spark would
    recompute the branch and re-scan the corpus (same pitfall as
    plans.relational.top_supplier). Shares round to 6 dp for cross-engine
    hashing.
    """
    n_tok = F.size(tokens(text_col))
    per_src = (df.groupBy(source_col)
                 .agg(F.count(F.lit(1)).alias("n_docs"),
                      F.sum(n_tok).cast("bigint").alias("total_tokens")))
    w = W.partitionBy()
    with_tot = per_src.withColumn(
        "corpus_tokens", F.sum("total_tokens").over(w)) \
        .withColumn("n_sources", F.count(F.lit(1)).over(w))
    if target_share is None:
        target = F.lit(1.0) / F.col("n_sources")
    else:
        target = F.coalesce(
            *[F.when(F.col(source_col) == k, F.lit(v))
              for k, v in target_share.items()],
            F.lit(0.0))
    share = F.col("total_tokens") / F.col("corpus_tokens")
    return (with_tot
            .select(source_col, "n_docs", "total_tokens",
                    F.round(share, 6).alias("token_share"),
                    F.round(target / share, 6).alias("sample_weight"))
            .orderBy(source_col))
