"""Composed corpus filtering: one keep/drop verdict per document.

The standard C4/Gopher-style cleaning pass — length bounds, stopword-density
floor, repetition cap, PII cap, exact-dup removal — composed into a single
operator so a pipeline applies ONE filter with auditable per-rule flags
instead of five sequential scans.

Scale shape: every rule except dedup is a map-side expression over one
tokenization (shared subexpression; Catalyst computes ``tk`` once), so the
whole verdict is a single scan plus ONE shuffle for the duplicate window
(keyed by content fingerprint). Rules emit individual booleans — the keep
decision is their conjunction — because at 100 TB you audit *why* docs were
dropped from the same pass that dropped them (per-rule drop rates are one
tiny aggregate away, no recompute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .pii import PII_PATTERNS
from .text import tokens


def _rule_flags(df: DataFrame, text_col: str, id_col: str,
                min_tokens: int, max_tokens: int, max_dup_frac: float,
                min_stop_ratio: float, max_pii: int) -> DataFrame:
    """The stateless (map-side) rule flags plus the content fingerprint —
    shared by the batch and streaming forms; only batch adds the dedup
    window on top."""
    tk = tokens(text_col)
    n_tok = F.size(tk)
    dup_frac = F.when(
        n_tok > 0,
        1.0 - F.size(F.array_distinct(tk)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0,
        F.regexp_count(F.lower(F.col(text_col)),
                       F.lit(r"\b(the|and|of|to|is|a|in|that)\b"))
         .cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    staged, n_pii = F.col(text_col), F.lit(0).cast("bigint")
    for pat, tag in PII_PATTERNS.values():
        n_pii = n_pii + F.regexp_count(staged, F.lit(pat)).cast("bigint")
        staged = F.regexp_replace(staged, pat, tag)
    norm_fp = F.md5(F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
        " +", " ")))
    return df.select(
        F.col(id_col),
        n_tok.cast("bigint").alias("n_tokens"),
        ((n_tok < min_tokens) | (n_tok > max_tokens)).alias("fail_len"),
        (dup_frac > max_dup_frac).alias("fail_rep"),
        (stop_ratio < min_stop_ratio).alias("fail_stop"),
        (n_pii > max_pii).alias("fail_pii"),
        norm_fp.alias("_fp"))


def corpus_filter(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  min_tokens: int = 20, max_tokens: int = 10_000,
                  max_dup_frac: float = 0.6,
                  min_stop_ratio: float = 0.02,
                  max_pii: int = 0) -> DataFrame:
    """Per-document verdict: id, n_tokens, per-rule fail flags, keep.

    Rules (each an independent boolean):
      fail_len   — token count outside [min_tokens, max_tokens]
      fail_rep   — duplicate-token fraction > max_dup_frac
      fail_stop  — stopword ratio < min_stop_ratio (gibberish floor)
      fail_pii   — more than ``max_pii`` PII spans (staged counts, so an
                   email's phone-shaped interior is not double-counted)
      is_dup     — an identical (normalized) doc with a lower id exists
    keep = NOT (any of the above).
    """
    base = _rule_flags(df, text_col, id_col, min_tokens, max_tokens,
                       max_dup_frac, min_stop_ratio, max_pii)
    is_dup = (F.min(id_col).over(W.partitionBy("_fp")) != F.col(id_col))
    return (base.withColumn("is_dup", is_dup)
                .select(id_col, "n_tokens", "fail_len", "fail_rep",
                        "fail_stop", "fail_pii", "is_dup",
                        (~(F.col("fail_len") | F.col("fail_rep")
                           | F.col("fail_stop") | F.col("fail_pii")
                           | F.col("is_dup"))).alias("keep")))


def corpus_filter_stream(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         min_tokens: int = 20, max_tokens: int = 10_000,
                         max_dup_frac: float = 0.6,
                         min_stop_ratio: float = 0.02,
                         max_pii: int = 0) -> DataFrame:
    """Streaming ingest filter: the same rule flags on an unbounded stream.

    Deliberately STATELESS — every rule is a map-side expression, so the
    stream needs no watermark, no state store, and a micro-batch adds zero
    shuffle. Cross-document dedup is NOT a flag here (first-vs-lowest-id
    winners are arrival-order-dependent on a stream); route kept docs to
    the batch :func:`corpus_filter` compaction, or chain
    ``dropDuplicatesWithinWatermark`` on ``_fp`` when at-most-once
    admission is enough. keep = NOT (any rule flag).
    """
    base = _rule_flags(df, text_col, id_col, min_tokens, max_tokens,
                       max_dup_frac, min_stop_ratio, max_pii)
    return base.select(
        F.col(id_col), F.col("n_tokens"), "fail_len", "fail_rep",
        "fail_stop", "fail_pii",
        (~(F.col("fail_len") | F.col("fail_rep") | F.col("fail_stop")
           | F.col("fail_pii"))).alias("keep"))


def cooldown_throttle(df: DataFrame, key_col: str, id_col: str,
                      ts_col: str, cooldown_ms: int) -> DataFrame:
    """Per-key event throttling: within each key, keep an event only if it
    arrives strictly more than ``cooldown_ms`` after the LAST KEPT event
    (the first event of a key always passes) — the alert-deduplication /
    rate-limiting primitive every monitoring pipeline runs (one page per
    incident, not one per error line). The recurrence anchors on the last
    *kept* event, NOT the previous event, so it is not expressible as a
    lag/session window: a burst must not let consecutive sub-cooldown
    gaps chain into suppression of everything after the first.

    Scale shape: ``applyInPandas`` grouped on the key — the decision is
    inherently serial per key (exactly the keyed-ValueState form the
    reference's ST1 uses for its delete-interval alert), keys spread
    across executors, Arrow-batched. The DuckDB oracle replays the kept
    set through its refresh-point characterization (kept events are
    >= cooldown apart, so a recursive CTE walks kept -> next kept:
    lex-min (ts, id) strictly past prev + cooldown) — no event-by-event
    recursion.

    Output: the kept rows (key, id, ts), one per emitted alert.
    """
    import pandas as pd

    out_schema = f"{key_col} string, {id_col} bigint, {ts_col} bigint"

    def _throttle(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, id_col])
        last = None
        keep = []
        for t in pdf[ts_col].to_numpy():
            ok = last is None or t - last > cooldown_ms
            if ok:
                last = int(t)
            keep.append(ok)
        return pdf.loc[keep, [key_col, id_col, ts_col]]

    return (df.select(key_col, id_col, ts_col)
              .groupBy(key_col).applyInPandas(_throttle, out_schema))
