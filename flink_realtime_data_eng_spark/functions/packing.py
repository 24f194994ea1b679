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


def chunk_documents(df: DataFrame, chunk_size: int = 64, overlap: int = 16,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Overlapping token-window chunking (context-window prep: one training
    sample per chunk, ``overlap`` tokens of left context carried over).

    Chunks start every ``chunk_size - overlap`` tokens; the last chunk may
    be short; an empty doc still yields one empty chunk (the id survives).
    Pure JVM higher-order expressions — tokenize once, ``posexplode`` the
    start sequence, ``slice`` per start — so the op is map-side only: no
    shuffle, no UDF, and the explode fan-out is bounded by
    ceil(n_tokens/step) rows per doc. Chunk text leaves the operator only
    as an md5 fingerprint (``chunk_fp``) — at 100 TB the chunk bodies are
    re-sliced by the consumer from the token stream, not shipped through
    every downstream exchange.

    Output: id, chunk_idx (0-based), chunk_start (0-based token offset),
    chunk_len, chunk_fp.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    step = chunk_size - overlap
    d = df.select(F.col(id_col), tokens(text_col).alias("tk"))
    starts = F.expr(f"sequence(1, greatest(size(tk), 1), {step})")
    e = d.select(F.col(id_col), F.col("tk"),
                 F.posexplode(starts).alias("chunk_idx", "s"))
    chunk = F.expr(f"slice(tk, s, {chunk_size})")
    return e.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (F.col("s") - 1).cast("bigint").alias("chunk_start"),
        F.size(chunk).cast("bigint").alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_fp"))


def temperature_sample(df: DataFrame, tau: float = 0.5,
                       text_col: str = "text", source_col: str = "source",
                       id_col: str = "doc_id",
                       prefix: str = "tsample") -> DataFrame:
    """Temperature resampling toward a uniform source mixture: source ``i``
    keeps docs with probability ``min(1, w_i^τ)`` where ``w_i`` is
    :func:`source_mixture`'s uniform-target weight — τ=1 fully rebalances
    a web-heavy crawl by downsampling dominant sources, τ=0 keeps the
    natural mixture (upsampling/repetition of rare sources is the
    complementary knob, left to the loader).

    Fully distributed: the per-source probabilities are a source-cardinality
    frame that broadcasts into one map-side filter — no driver collect, no
    corpus shuffle. The keep decision hashes the DOC id (md5 unit draw), so
    it is reproducible across engines/runs and consistent per doc.
    ``w_i`` enters the pow already rounded to 6 dp (the published
    source_mixture contract) and ``keep_prob`` rounds to 6 dp again, so
    both engines compare hash draws against bit-identical thresholds.

    Output: kept (id, source) rows.
    """
    if not 0.0 <= tau <= 1.0:
        raise ValueError(f"tau must be in [0, 1], got {tau}")
    from .dedup import _md5_hash32
    mix = source_mixture(df, text_col, source_col)
    probs = mix.select(
        source_col,
        F.round(F.least(F.lit(1.0), F.pow(F.col("sample_weight"),
                                          F.lit(float(tau)))), 6)
         .alias("keep_prob"))
    draw = _md5_hash32(prefix, F.col(id_col).cast("string")) / F.lit(float(2**32))
    return (df.join(F.broadcast(probs), source_col)
            .where(draw < F.col("keep_prob"))
            .select(F.col(id_col), F.col(source_col)))


def mixture_allocation(df: DataFrame, budget_tokens: int,
                       epochs_cap: int = 4, rounds: int = 3,
                       text_col: str = "text",
                       source_col: str = "source") -> DataFrame:
    """Token-budget water-filling across sources — the data-mixing
    PLANNING step: given a training budget, allocate tokens per source
    proportionally to target weight (uniform here), capped at
    ``epochs_cap`` epochs of what the source actually has (repeating a
    small source beyond a few epochs stops helping — Muennighoff et al.
    2023, "Scaling Data-Constrained Language Models"), then redistribute
    what the saturated sources could not absorb among the unsaturated
    ones. ``rounds`` redistribution passes are UNROLLED with pure
    integer arithmetic (floored proportional shares), so the allocation
    is deterministic and a SQL engine replays it bit-for-bit; the
    integer floor may strand a few tokens per pass — reported, not
    hidden.

    Scale shape: one corpus aggregate to (source) rows, then every pass
    is window arithmetic over the |sources|-bounded frame (the
    source_mixture justification) — the corpus is scanned exactly once.

    Output: (source, n_docs, avail_tokens, cap_tokens, alloc_tokens,
    epochs6, saturated), ordered by source.
    """
    n_tok = F.size(tokens(text_col))
    per_src = (df.groupBy(source_col)
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                    # coalesce: a source whose docs all have NULL text sums
                    # to NULL, not 0 — the oracle coalesces to 0, and a NULL
                    # avail would poison every cap/alloc comparison below.
                    F.coalesce(F.sum(n_tok), F.lit(0))
                     .cast("bigint").alias("avail")))
    cur = per_src.withColumn(
        "cap", (F.lit(epochs_cap) * F.col("avail")).cast("bigint")) \
        .withColumn("alloc", F.lit(0).cast("bigint"))
    w = W.partitionBy()
    for _ in range(rounds):
        unsat_w = F.when(F.col("alloc") < F.col("cap"), F.lit(1)) \
                   .otherwise(F.lit(0))
        cur = (cur.withColumn("_rem",
                              F.lit(budget_tokens) - F.sum("alloc").over(w))
               .withColumn("_uw", F.sum(unsat_w).over(w))
               .withColumn("_give", F.when(
                   (F.col("alloc") < F.col("cap")) & (F.col("_uw") > 0),
                   F.least(F.col("cap") - F.col("alloc"),
                           F.expr("_rem div _uw")))
                   .otherwise(F.lit(0)).cast("bigint"))
               .withColumn("alloc", F.col("alloc") + F.col("_give"))
               .drop("_rem", "_uw", "_give"))
    return (cur.select(
        source_col, "n_docs",
        F.col("avail").alias("avail_tokens"),
        F.col("cap").alias("cap_tokens"),
        F.col("alloc").alias("alloc_tokens"),
        F.when(F.col("avail") > 0,
               F.round(F.col("alloc") / F.col("avail").cast("double"), 6))
         .otherwise(F.lit(0.0)).alias("epochs6"),
        (F.col("alloc") >= F.col("cap")).alias("saturated"))
        .orderBy(source_col))


def token_budget_select(df: DataFrame, budget_pct: int = 50,
                        band_div: int = 10_000_000,
                        text_col: str = "text", id_col: str = "doc_id",
                        group_col: str = "source") -> DataFrame:
    """Budget-constrained corpus selection — the "build an N-token
    training set from a bigger pool" step: take documents best-quality
    first (mean unigram logprob, the CCNet-style key shared with
    :func:`~..functions.text.quality_buckets`) until the selected token
    count reaches ``budget_pct`` percent of the pool, then report what
    was taken per ``group_col``. Complements :func:`mixture_allocation`:
    that op PLANS per-source token counts against weights; this one
    EXECUTES a global greedy selection against a single budget.

    The greedy prefix under a budget is a running sum over a global
    quality ordering — the textbook driver-side trap. Here it is a
    two-tier distributed prefix sum:

    - tier 1: coarse quality BANDS (``qkey_milli div band_div``). The
      key is mean-logprob in milli-e6 units, so its span is bounded by
      the token-probability range, not the corpus: ~2,000-4,000 bands at
      any SF. Band token totals + a cumulative window over that tiny
      frame give each band's global offset.
    - tier 2: within-band running sum, windowed ``partitionBy(band)`` —
      per-band state only, never a single global partition.

    A document is selected iff band_offset + its within-band running
    total stays inside the budget — exactly the sequential greedy
    answer, with deterministic (qkey desc, id) tie order. Empty docs are
    excluded up front (they consume no budget and train nothing).

    Output: (group_col, docs_sel, tokens_sel) BIGINT, one row per group
    with at least one selected doc.
    """
    from .text import _quality_key, unigram_logprob

    # Materialize ONCE (ids + int key columns only): band totals, the
    # budget aggregate, and the per-doc running sum all consume this
    # frame — without the checkpoint each reference re-derives the
    # unigram scoring chain.
    scored = (unigram_logprob(df, text_col=text_col, id_col=id_col)
              .filter(F.col("n_tokens") > 0)
              .withColumn("qkey_milli", _quality_key())
              .withColumn("band", F.expr(f"qkey_milli div {band_div}"))
              .select(id_col, "n_tokens", "qkey_milli", "band")
              .localCheckpoint(eager=True))
    btot = scored.groupBy("band").agg(F.sum("n_tokens").alias("bt"))
    w_b = (W.orderBy(F.col("band").desc())
            .rowsBetween(W.unboundedPreceding, -1))
    boff = btot.withColumn(
        "prev", F.coalesce(F.sum("bt").over(w_b), F.lit(0)).cast("bigint"))
    w_in = (W.partitionBy("band")
             .orderBy(F.col("qkey_milli").desc(), F.col(id_col)))
    budget = scored.agg(
        F.expr(f"(sum(n_tokens) * {budget_pct}) div 100").alias("B"))
    cum = (scored.join(boff.select("band", "prev"), "band")
           .withColumn("cum", F.col("prev")
                       + F.sum("n_tokens").over(w_in).cast("bigint")))
    sel = cum.crossJoin(budget).filter(F.col("cum") <= F.col("B"))
    return (sel.join(df.select(id_col, group_col), id_col)
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("docs_sel"),
                 F.sum("n_tokens").cast("bigint").alias("tokens_sel"))
            .orderBy(group_col))


def curriculum_order(df: DataFrame, n_phases: int = 3,
                     band_div: int = 10_000_000,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic curriculum ordering: a dense global rank over the
    corpus by quality (best first — the CCNet-style mean-unigram-logprob
    key shared with :func:`~..functions.text.quality_buckets`), plus an
    equal-count training phase 1..``n_phases``. Curriculum schedules
    need a STABLE global order any re-run reproduces; a naive
    ``row_number() over (order by ...)`` is a single global partition,
    so the rank is assembled the same two-tier way as
    :func:`token_budget_select`: per-band doc-count offsets over the
    bounded band frame + a within-band row_number. Phases come from the
    rank arithmetically (``1 + (rank-1)*n div total``) — no second sort.

    Docs with no tokens rank last (the shared key's -1 empty sentinel
    lands them in band -1, ordered by id after all scored docs — the
    rank still covers EVERY input doc, which a filter-then-rank would
    lose).

    Output: (id, rank BIGINT dense 1..N, phase INT), exactly one row per
    input doc.
    """
    from .text import _quality_key, unigram_logprob

    # unigram_logprob left-joins its own id spine, so every input doc is
    # already present (empty docs at n_tokens=0 -> qkey -1).
    scored = (unigram_logprob(df, text_col=text_col, id_col=id_col)
              .withColumn("qkey_milli", _quality_key())
              .withColumn("band",
                          F.when(F.col("qkey_milli") < 0, F.lit(-1))
                           .otherwise(F.expr(f"qkey_milli div {band_div}")))
              .select(id_col, "qkey_milli", "band")
              .localCheckpoint(eager=True))
    btot = scored.groupBy("band").agg(F.count(F.lit(1)).alias("bc"))
    w_b = (W.orderBy(F.col("band").desc())
            .rowsBetween(W.unboundedPreceding, -1))
    boff = btot.withColumn(
        "prev", F.coalesce(F.sum("bc").over(w_b), F.lit(0)).cast("bigint"))
    w_in = (W.partitionBy("band")
             .orderBy(F.col("qkey_milli").desc(), F.col(id_col)))
    total = scored.agg(F.count(F.lit(1)).alias("n_total"))
    ranked = (scored.join(boff.select("band", "prev"), "band")
              .withColumn("rank", (F.col("prev")
                                   + F.row_number().over(w_in)).cast("bigint")))
    return (ranked.crossJoin(total)
            .select(id_col, "rank",
                    (F.lit(1) + F.expr(f"((rank - 1) * {n_phases})"
                                       " div n_total"))
                    .cast("int").alias("phase")))
