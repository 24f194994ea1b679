"""Cross-engine property tests: Spark operator vs its DuckDB oracle on
RANDOM printable-ASCII corpora — not just the driver fixture. This is the
hard test of the repo's oracle contract ("patterns kept to the syntax
subset Java regex and RE2 agree on"): a regex-dialect divergence or a
rounding-contract slip shows up here as a falsifying example long before
a fixture regeneration would expose it."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from flink_realtime_data_eng_spark.functions import text as ftext

# printable ASCII incl. the characters the normalizers treat specially
# (spaces, '.', '#' appear often enough that runs like '...' and double
# spaces occur naturally)
_TEXTS = st.lists(
    st.text(alphabet=list("abcXYZ019 .,#!?thendoisa "), min_size=0,
            max_size=40),
    min_size=1, max_size=6)

_GOPHER_SQL = r"""
WITH t AS (
  SELECT doc_id, text,
         CASE WHEN len(trim(text)) > 0
              THEN string_split_regex(trim(text), '\s+')
              ELSE [] END AS w
  FROM docs
), feat AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0)
              AS BIGINT) AS sum_len,
         CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
              AS BIGINT) AS n_alpha,
         CAST(len(regexp_extract_all(text, '#'))
              + len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS n_sym,
         CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|is|a|in|that)\b')) AS BIGINT) AS n_stop
  FROM t
)
SELECT doc_id, n_words,
       round(CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE) / n_words
                  ELSE 0.0 END, 6) AS mean_word_len,
       round(CASE WHEN n_words > 0 THEN CAST(n_alpha AS DOUBLE) / n_words
                  ELSE 0.0 END, 6) AS alpha_word_frac,
       round(CASE WHEN n_words > 0 THEN CAST(n_sym AS DOUBLE) / n_words
                  ELSE 0.0 END, 6) AS symbol_word_ratio,
       n_stop AS n_stopwords
FROM feat
"""


@given(texts=_TEXTS)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gopher_features_match_duckdb_on_random_text(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["n_words"], r["mean_word_len"],
         r["alpha_word_frac"], r["symbol_word_ratio"], r["n_stopwords"])
        for r in ftext.gopher_rules(df).collect())
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.execute(_GOPHER_SQL).fetchall()))
    assert got == want


@given(texts=_TEXTS)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fingerprint_matches_duckdb_on_random_text(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r["doc_id"], r["fp"])
                 for r in ftext.fingerprint(df).collect())
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.execute(r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
FROM docs""").fetchall()))
    assert got == want


@given(texts=st.lists(
    st.text(alphabet=list("the andqueloslaisder .!"), min_size=0,
            max_size=50),
    min_size=1, max_size=6))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_language_id_matches_duckdb_on_random_text(spark, texts):
    """language_id is the regex-dialect-heaviest op (word-boundary
    alternations per language); Java regex and RE2 must agree on the
    marker counts AND the tie-broken argmax."""
    from flink_realtime_data_eng_spark.registry import _language_oracle
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in ftext.language_id(df).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.execute(_language_oracle()).fetchall()))
    assert got == want


@given(texts=st.lists(
    st.text(alphabet=list("abcde  .x"), min_size=0, max_size=25),
    min_size=1, max_size=5))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_pair_counts_match_duckdb_on_random_text(spark, texts):
    """The vocab-compressed pair counting (normalize → word freq → char
    pairs weighted by freq → ranked) must agree cross-engine including
    the single-char-word guard and tie-ordering."""
    from flink_realtime_data_eng_spark.registry import ORACLES
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in ftext.bpe_pair_counts(df, k=20).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.execute(ORACLES["x_bpe_merges"]).fetchall()))
    assert got == want


@given(texts=st.lists(
    st.text(alphabet=list("ab c1 dd"), min_size=0, max_size=30),
    min_size=1, max_size=5))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_token_entropy_matches_duckdb_on_random_text(spark, texts):
    """Entropy mixes counts with ln — the float-tree contract (exact
    integer counts, one identical IEEE expression, round 6) must hold on
    arbitrary token distributions, not just the fixture's."""
    from flink_realtime_data_eng_spark.registry import ORACLES
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in ftext.token_entropy(df).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.execute(ORACLES["x_token_entropy"]).fetchall()))
    assert got == want


@given(texts=st.lists(
    st.text(alphabet=list("aab bc c "), min_size=0, max_size=30),
    min_size=1, max_size=5))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_repetition_features_match_duckdb_on_random_text(spark, texts):
    """Repetition signals (dup-token/top-token/top-bigram fractions) mix a
    window (bigrams via lead) with two-level aggregates — the dialect
    agreement must hold on degenerate docs too (empty, one token, all
    repeats)."""
    from flink_realtime_data_eng_spark.registry import ORACLES
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 ftext.repetition_features(df).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.execute(ORACLES["x_repetition"]).fetchall()))
    assert got == want


@given(docs=st.lists(
    st.tuples(st.text(alphabet=list("the cat a b "), min_size=0,
                      max_size=30),
              st.sampled_from(["s0", "s1"])),
    min_size=1, max_size=8))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_quality_calibration_matches_duckdb(spark, docs):
    """percent_rank within source over the quality score: rank ties and
    single-doc sources must agree cross-engine."""
    from flink_realtime_data_eng_spark.registry import ORACLES
    rows = [(i, t, s) for i, (t, s) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # inline the query body against the in-memory frame
    from pyspark.sql import Window as W, functions as SF
    qf = ftext.quality_features(df).select("doc_id", "quality_score")
    j = df.select("doc_id", "source").join(qf, "doc_id")
    w = W.partitionBy("source").orderBy("quality_score")
    got = sorted(tuple(r) for r in
                 (j.withColumn("pct_rank",
                               SF.round(SF.percent_rank().over(w), 6))
                  .withColumn("keep_top_half", SF.col("pct_rank") >= 0.5)
                  .select("doc_id", "source", "quality_score", "pct_rank",
                          "keep_top_half")).collect())
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(rows, columns=["doc_id", "text", "source"]))
    want = sorted(map(tuple,
                      con.execute(ORACLES["x_quality_calibration"]).fetchall()))
    assert got == want


@given(events=st.lists(
    st.tuples(st.integers(0, 2),                       # user
              st.integers(0, 5000),                    # ts offset ms
              st.sampled_from(["view", "click", "buy"])),
    min_size=1, max_size=20))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_markov_transitions_match_duckdb(spark, events):
    """Transition counting over (ts, id)-ordered per-user sequences with
    duplicate timestamps must tie-break identically in both engines."""
    import datetime
    from pyspark.sql import Window as W, functions as SF
    rows = [(u, datetime.datetime(2024, 1, 1)
             + datetime.timedelta(milliseconds=ts), i, t)
            for i, (u, ts, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    ).withColumn("ts_ms", SF.unix_millis("ts"))
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    t = (df.withColumn("next_type", SF.lead("event_type").over(w))
         .filter(SF.col("next_type").isNotNull()))
    counts = (t.groupBy(SF.col("event_type").alias("from_type"),
                        SF.col("next_type").alias("to_type"))
              .agg(SF.count(SF.lit(1)).alias("n")))
    w2 = W.partitionBy("from_type")
    got = sorted(tuple(r) for r in
                 counts.withColumn("p", SF.round(SF.col("n")
                                                 / SF.sum("n").over(w2), 6))
                 .select("from_type", "to_type",
                         SF.col("n").cast("bigint").alias("n"), "p")
                 .collect())
    con = duckdb.connect()
    con.register("events", pd.DataFrame(
        rows, columns=["user_id", "ts", "event_id", "event_type"]))
    from flink_realtime_data_eng_spark.registry import ORACLES
    want = sorted(map(tuple,
                      con.execute(ORACLES["x_markov_transitions"]).fetchall()))
    assert got == want


@given(vals=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=1, max_size=60))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hll_portable_matches_duckdb_on_random_ints(spark, vals):
    """The portable HLL's whole point is bit-exact cross-engine registers
    AND estimate; random collision-heavy ints probe the linear-counting
    branch, the bin()/length rho math, and the scaled-BIGINT fold."""
    from flink_realtime_data_eng_spark.functions import sketches
    p = 6
    m, wbits = 1 << p, 32 - p
    shift, wspace = wbits + 1, 1 << wbits
    num = repr(0.7213 / (1.0 + 1.079 / m) * m * m * (1 << shift))
    rows = [("g", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v int")
    got = sorted(tuple(r) for r in
                 sketches.hll_portable(df, "g", "v", p=p).collect())
    con = duckdb.connect()
    con.register("vals", pd.DataFrame(rows, columns=["g", "v"]))
    want = sorted(map(tuple, con.execute(f"""
WITH h AS (
  SELECT g, CAST(concat('0x', substring(md5(concat('hll', ':',
            CAST(v AS VARCHAR))), 1, 8)) AS BIGINT) AS h
  FROM vals
), b AS (
  SELECT g, h // {wspace} AS bucket, h % {wspace} AS w FROM h
), r AS (
  SELECT g, bucket,
         MAX(CASE WHEN w = 0 THEN {wbits + 1}
                  ELSE {wbits + 1} - length(bin(w)) END) AS reg
  FROM b GROUP BY 1, 2
), gg AS (
  SELECT g, COUNT(*) AS v_nonzero,
         SUM(CAST(1 AS BIGINT) << ({shift} - reg)) AS z_scaled
  FROM r GROUP BY 1
), e AS (
  SELECT g, v_nonzero,
         {num} / (z_scaled + ({m} - v_nonzero)
                  * CAST(1 AS BIGINT) * {1 << shift}) AS raw,
         {m} - v_nonzero AS zeros
  FROM gg
)
SELECT g, v_nonzero,
       ROUND(CASE WHEN raw <= {2.5 * m} AND zeros > 0
                  THEN {float(m)} * ln({float(m)} / CAST(zeros AS DOUBLE))
                  ELSE raw END, 6) AS hll_est
FROM e""").fetchall()))
    assert got == want


@given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                               allow_nan=False, allow_infinity=False),
                     min_size=1, max_size=60))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hist_quantiles_match_duckdb_on_random_doubles(spark, vals):
    """Fixed-bin quantile sketch vs its SQL mirror on arbitrary doubles:
    probes the width guard (all-equal), edge-bin clamping, and the
    integer threshold selection."""
    from flink_realtime_data_eng_spark.functions import sketches
    bins = 16
    rows = [("g", float(v)) for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    got = sorted(tuple(r) for r in
                 sketches.hist_quantiles(df, "g", "v",
                                         bins=bins).collect())
    con = duckdb.connect()
    con.register("vals", pd.DataFrame(rows, columns=["g", "v"]))
    want = sorted(map(tuple, con.execute(f"""
WITH e AS (
  SELECT g, v FROM vals WHERE v IS NOT NULL
), s AS (
  SELECT g, MIN(v) AS lo, MAX(v) AS hi, COUNT(v) AS n FROM e GROUP BY g
), sw AS (
  SELECT g, lo, n,
         CASE WHEN hi > lo THEN (hi - lo) / {float(bins)} ELSE 1.0 END AS w
  FROM s
), b AS (
  SELECT e.g,
         LEAST(CAST(floor((e.v - sw.lo) / sw.w) AS BIGINT), {bins - 1})
           AS bin,
         COUNT(*) AS cnt
  FROM e JOIN sw ON e.g = sw.g
  GROUP BY 1, 2
), c AS (
  SELECT g, bin, SUM(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum
  FROM b
), q AS (
  SELECT c.g, bp.bp, MIN(c.bin) AS qbin
  FROM c JOIN sw ON c.g = sw.g
  JOIN (VALUES (2500), (5000), (9000), (9900)) bp(bp)
    ON 10000 * c.cum >= bp.bp * sw.n
  GROUP BY 1, 2
)
SELECT sw.g, sw.n,
       ROUND(sw.lo + MAX(CASE WHEN q.bp = 2500 THEN q.qbin END) * sw.w, 6) AS p2500,
       ROUND(sw.lo + MAX(CASE WHEN q.bp = 5000 THEN q.qbin END) * sw.w, 6) AS p5000,
       ROUND(sw.lo + MAX(CASE WHEN q.bp = 9000 THEN q.qbin END) * sw.w, 6) AS p9000,
       ROUND(sw.lo + MAX(CASE WHEN q.bp = 9900 THEN q.qbin END) * sw.w, 6) AS p9900
FROM q JOIN sw ON q.g = sw.g
GROUP BY sw.g, sw.n, sw.lo, sw.w""").fetchall()))
    assert got == want


_EVENT_STREAMS = st.lists(
    st.tuples(st.integers(0, 3),                      # user_id
              st.integers(0, 1000),                   # ts_ms
              st.sampled_from(["view", "click", "signup", "purchase"]),
              st.integers(0, 9999)),                  # cents -> value
    min_size=1, max_size=40)


@given(evs=_EVENT_STREAMS)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_touch_attribution_matches_duckdb(spark, evs):
    """The two-window attribution recipe must agree with DuckDB's
    IGNORE NULLS window replay on arbitrary event streams (incl. ties
    broken by event_id and conversions with no prior touch)."""
    from flink_realtime_data_eng_spark.operators.funnel import (
        touch_attribution)
    rows = [(u, t, ty, i, c / 100.0)
            for i, (u, t, ty, c) in enumerate(evs)]
    cols = ["user_id", "ts_ms", "event_type", "event_id", "value"]
    df = spark.createDataFrame(
        rows, "user_id long, ts_ms long, event_type string, "
              "event_id long, value double")
    got = sorted(tuple(r) for r in
                 touch_attribution(df, value_col="value").collect())
    con = duckdb.connect()
    con.register("e", pd.DataFrame(rows, columns=cols))
    want = sorted(map(tuple, con.execute("""
WITH tagged AS (
  SELECT event_type, value,
         first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                     IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS first_touch,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_touch
  FROM e
)
SELECT coalesce(first_touch, '(none)') AS first_touch,
       coalesce(last_touch, '(none)') AS last_touch,
       CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
         AS revenue_e6
FROM tagged WHERE event_type = 'purchase'
GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()))
    assert got == want
