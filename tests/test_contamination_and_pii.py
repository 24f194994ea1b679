"""Decontamination, repetition signals, and PII redaction on synthetic
frames with known ground truth (the parquet fixture has no PII, so these
tests supply the positive cases the registry row can't)."""

from __future__ import annotations

from flink_realtime_data_eng_spark.functions import contamination, pii, text


def test_ngram_overlap_flags_only_real_overlap(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "completely different words about spark and shuffles here"),
         (3, "the quick brown fox jumps over a sleeping cat today")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "someone saw the quick brown fox jumps over the fence")],
        "doc_id long, text string")
    got = {(r["train_id"], r["eval_id"]): r["shared_ngrams"]
           for r in contamination.ngram_overlap(train, ev, n=5).collect()}
    # doc 1 shares 'the quick brown fox jumps', 'quick brown fox jumps
    # over', and 'brown fox jumps over the'; doc 3 diverges after 'over'
    # (...'over a sleeping') so shares only the first two; doc 2 nothing
    assert set(got) == {(1, 100), (3, 100)}
    assert got[(1, 100)] == 3 and got[(3, 100)] == 2


def test_decontaminate_drops_flagged_keeps_rest(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon")], "doc_id long, text string")
    kept = contamination.decontaminate(train, ev, n=5).collect()
    assert [r["doc_id"] for r in kept] == [2]
    assert set(kept[0].asDict()) == {"doc_id", "text"}  # columns preserved


def test_repetition_features_known_values(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"),          # 4 tokens, 2 distinct, top 'a'=3
         (2, "x y x y x y"),      # bigram 'x y' 3 of 5, 'y x' 2 of 5
         (3, "")],                # empty -> all zeros
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.repetition_features(df).collect()}
    r1 = got[1]
    assert (r1["n_tokens"], r1["n_distinct_tokens"]) == (4, 2)
    assert r1["dup_token_frac"] == 0.5
    assert r1["top_token_frac"] == 0.75
    # doc1 bigrams: 'a a','a a','a b' -> top 2/3
    assert r1["top_bigram_frac"] == round(2 / 3, 6)
    r2 = got[2]
    assert r2["top_bigram_frac"] == 0.6
    assert r2["dup_token_frac"] == round(4 / 6, 6)
    r3 = got[3]
    assert (r3["n_tokens"], r3["dup_token_frac"], r3["top_bigram_frac"]) \
        == (0, 0.0, 0.0)


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@example.com or alice@test.org, call 555-123-4567"),
         (2, "ssn 123-45-6789 from host 192.168.0.1 and 10.0.0.255"),
         (3, "no pii here at all")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii.pii_features(df).collect()}
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_pii"]) == (2, 1, 3)
    assert (got[2]["n_ssn"], got[2]["n_ipv4"], got[2]["n_pii"]) == (1, 2, 3)
    assert got[3]["n_pii"] == 0

    red = {r["doc_id"]: r["text"] for r in pii.redact(df).collect()}
    assert red[1] == "mail <EMAIL> or <EMAIL>, call <PHONE>"
    assert red[2] == "ssn <SSN> from host <IP> and <IP>"
    assert red[3] == "no pii here at all"


def test_pii_ssn_not_eaten_by_phone_pattern(spark):
    # 123-45-6789 must be SSN (3-2-4), not phone (3-3-4); and an email
    # containing digits must be redacted as one unit before digit patterns
    df = spark.createDataFrame(
        [(1, "x 555-123-4567 y 123-45-6789 z a1.2.3.4@b.co")],
        "doc_id long, text string")
    r = pii.pii_features(df).collect()[0]
    assert (r["n_phone"], r["n_ssn"], r["n_email"]) == (1, 1, 1)
    red = pii.redact(df).collect()[0]["text"]
    assert red == "x <PHONE> y <SSN> z <EMAIL>"


def test_pack_offsets_chunk_arithmetic(spark):
    from flink_realtime_data_eng_spark.functions import packing
    df = spark.createDataFrame(
        [("web", 1, "a b c d e"),     # 5 tokens: offsets 0-4, chunks 0-1
         ("web", 2, "f g h"),         # 3 tokens: offsets 5-7, chunk 1
         ("web", 3, ""),              # empty: start 8, chunks [-1,-1]
         ("web", 4, "i j"),           # offsets 8-9, chunk 2-2? (8//4=2)
         ("book", 9, "x y z")],       # separate shard restarts at 0
        "source string, doc_id long, text string")
    got = {(r["source"], r["doc_id"]):
           (r["n_tokens"], r["start_offset"], r["chunk_first"], r["chunk_last"])
           for r in packing.pack_offsets(df, seq_len=4).collect()}
    assert got[("web", 1)] == (5, 0, 0, 1)
    assert got[("web", 2)] == (3, 5, 1, 1)
    assert got[("web", 3)] == (0, 8, -1, -1)
    assert got[("web", 4)] == (2, 8, 2, 2)
    assert got[("book", 9)] == (3, 0, 0, 0)


def test_source_mixture_weights(spark):
    from flink_realtime_data_eng_spark.functions import packing
    df = spark.createDataFrame(
        [("web", 1, "a b c d e f"),   # 6 tokens -> share 0.75
         ("book", 2, "g h")],         # 2 tokens -> share 0.25
        "source string, doc_id long, text string")
    got = {r["source"]: r for r in packing.source_mixture(df).collect()}
    assert got["web"]["token_share"] == 0.75
    assert got["book"]["token_share"] == 0.25
    # uniform target 0.5: web downweighted, book upweighted
    assert got["web"]["sample_weight"] == round(0.5 / 0.75, 6)
    assert got["book"]["sample_weight"] == 2.0
    # explicit target mixture
    got2 = {r["source"]: r["sample_weight"] for r in packing.source_mixture(
        df, target_share={"web": 0.9, "book": 0.1}).collect()}
    assert got2["web"] == round(0.9 / 0.75, 6)
    assert got2["book"] == round(0.1 / 0.25, 6)


def test_funnel_order_matters(spark):
    from flink_realtime_data_eng_spark.operators import funnel
    rows = [
        # u1 completes in order
        ("u1", 100, "view"), ("u1", 200, "click"), ("u1", 300, "purchase"),
        # u2 purchases BEFORE clicking: must NOT count at step 3
        ("u2", 100, "view"), ("u2", 300, "click"), ("u2", 200, "purchase"),
        # u3 never clicks
        ("u3", 100, "view"), ("u3", 200, "purchase"),
        # u4 clicks at the SAME ts as view: strictly-after -> not converted
        ("u4", 100, "view"), ("u4", 100, "click"),
        # u5 has no view at all
        ("u5", 50, "click"), ("u5", 60, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts_ms long, event_type string")
    got = {r["step"]: (r["step_name"], r["n_users"], r["conversion"])
           for r in funnel.funnel_counts(
               df, ["view", "click", "purchase"]).collect()}
    assert got[1] == ("view", 4, 1.0)
    assert got[2] == ("click", 2, 0.5)       # u1 and u2 (click after view)
    assert got[3] == ("purchase", 1, 0.25)   # only u1 in order
    # one user-partition exchange: the chained windows must not stack
    # shuffles (funnel cost is ONE hash partitioning at any scale)
    plan = funnel.funnel_counts(df, ["view", "click", "purchase"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(user_id") <= 1


def test_retention_cohort_weeks(spark):
    from flink_realtime_data_eng_spark.operators import funnel
    WK = funnel.WEEK_MS
    rows = [
        ("a", 0), ("a", WK + 5), ("a", 3 * WK),   # cohort w0, active w0/1/3
        ("b", 10), ("b", 20),                     # cohort w0, only w0
        ("c", WK), ("c", 2 * WK),                 # cohort w1, active w1/2
    ]
    df = spark.createDataFrame(rows, "user_id string, ts_ms long")
    got = {(r["cohort_week_ms"], r["week_idx"]): r["n_users"]
           for r in funnel.retention_cohorts(df).collect()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 3): 1,
                   (WK, 0): 1, (WK, 1): 1}


def test_pii_counts_match_masked_spans(spark):
    # a phone-shaped substring INSIDE an email is part of the email: counts
    # are staged like the redaction, so n_pii == number of <TAG> spans
    df = spark.createDataFrame(
        [(1, "call 555-123-4567@corp.com")], "doc_id long, text string")
    r = pii.pii_features(df).collect()[0]
    assert (r["n_email"], r["n_phone"], r["n_pii"]) == (1, 0, 1)
    assert pii.redact(df).collect()[0]["text"] == "call <EMAIL>"


def test_chunk_documents_covers_every_token_once_per_stride(spark):
    from flink_realtime_data_eng_spark.functions import packing
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "")],
        "doc_id long, text string")
    out = packing.chunk_documents(df, chunk_size=4, overlap=2).collect()
    d1 = sorted((r["chunk_idx"], r["chunk_start"], r["chunk_len"])
                for r in out if r["doc_id"] == 1)
    # starts every stride=2 tokens: 0,2,4,6,8; last chunk truncated
    assert d1 == [(0, 0, 4), (1, 2, 4), (2, 4, 4), (3, 6, 4), (4, 8, 2)]
    d2 = [(r["chunk_idx"], r["chunk_len"]) for r in out if r["doc_id"] == 2]
    assert d2 == [(0, 0)]  # empty doc keeps its id with one empty chunk


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest
    from flink_realtime_data_eng_spark.functions import packing
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        packing.chunk_documents(df, chunk_size=4, overlap=4)


def test_repeated_spans_finds_cross_doc_boilerplate(spark):
    from flink_realtime_data_eng_spark.functions import dedup
    boiler = "this content is provided as is without any warranty"
    df = spark.createDataFrame(
        [(1, "intro text " + boiler), (2, boiler + " and more"),
         (3, "totally different words here entirely unique content stream")],
        "doc_id long, text string")
    out = dedup.repeated_spans(df, n=5, min_docs=2).collect()
    # every 5-gram inside the shared 9-token span appears in docs 1 and 2
    assert len(out) == 5 and all(r["n_docs"] == 2 for r in out)


def test_corpus_filter_each_rule_fires_independently(spark):
    from flink_realtime_data_eng_spark.functions import filtering
    good = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away to the old barn where it sleeps in a pile of hay")
    docs = [
        (1, good),                               # keeps
        (2, "too short of a doc"),               # fail_len (<20 tokens)
        (3, " ".join(["word"] * 40)),            # fail_rep + fail_stop
        (4, good + " mail me at a@b.com now ok"),  # fail_pii
        (5, good),                               # is_dup of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = {x["doc_id"]: x for x in filtering.corpus_filter(df).collect()}
    assert r[1]["keep"] and not any(
        r[1][c] for c in ("fail_len", "fail_rep", "fail_stop",
                          "fail_pii", "is_dup"))
    assert r[2]["fail_len"] and not r[2]["keep"]
    assert r[3]["fail_rep"] and r[3]["fail_stop"]
    assert r[4]["fail_pii"] and not r[4]["fail_len"]
    assert r[5]["is_dup"] and not r[5]["fail_pii"] and r[1]["is_dup"] is False


def test_corpus_filter_verdict_is_nontrivial_on_fixtures(spark):
    """The default thresholds must actually split the fixture corpus —
    an all-keep or all-drop verdict means the rules are dead code."""
    from flink_realtime_data_eng_spark.functions import filtering
    from flink_realtime_data_eng_spark.schemas import load_table
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    from pyspark.sql import functions as F
    agg = (filtering.corpus_filter(docs)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("keep").cast("int")).alias("kept")).collect()[0])
    assert 0 < agg["kept"] < agg["n"]


def test_sequence_match_strict_contiguity(spark):
    from flink_realtime_data_eng_spark.operators import funnel
    rows = [
        # u1: exact consecutive A,B,C -> match at ts 100
        ("u1", 100, 1, "view"), ("u1", 200, 2, "click"),
        ("u1", 300, 3, "purchase"),
        # u2: intervening error between click and purchase -> NO match
        ("u2", 100, 4, "view"), ("u2", 200, 5, "click"),
        ("u2", 250, 6, "error"), ("u2", 300, 7, "purchase"),
        # u3: pattern present twice, overlapping tail -> both matches
        ("u3", 10, 8, "view"), ("u3", 20, 9, "click"),
        ("u3", 30, 10, "purchase"), ("u3", 40, 11, "view"),
        ("u3", 50, 12, "click"), ("u3", 60, 13, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts_ms long, event_id long, event_type string")
    got = {(r["user_id"], r["start_ts_ms"], r["end_ts_ms"],
            r["start_event_id"])
           for r in funnel.sequence_match(
               df, ["view", "click", "purchase"]).collect()}
    assert got == {("u1", 100, 300, 1), ("u3", 10, 30, 8),
                   ("u3", 40, 60, 11)}


def test_sequence_match_within_bound(spark):
    from flink_realtime_data_eng_spark.operators import funnel
    rows = [("u", 0, 1, "a"), ("u", 10, 2, "b"),        # fast pair
            ("u", 1000, 3, "a"), ("u", 9000, 4, "b")]   # slow pair
    df = spark.createDataFrame(
        rows, "user_id string, ts_ms long, event_id long, event_type string")
    got = {r["start_ts_ms"] for r in
           funnel.sequence_match(df, ["a", "b"], within_ms=100).collect()}
    assert got == {0}


def test_sequence_match_single_shuffle(spark):
    from flink_realtime_data_eng_spark.operators import funnel
    df = spark.createDataFrame(
        [("u", 0, 1, "a")],
        "user_id string, ts_ms long, event_id long, event_type string")
    plan = funnel.sequence_match(df, ["a", "b", "c"]) \
        ._jdf.queryExecution().executedPlan().toString()
    # all the lead() windows must share one user hash-partitioning
    assert plan.count("hashpartitioning(user_id") <= 1


def test_sequence_match_rejects_short_pattern(spark):
    from flink_realtime_data_eng_spark.operators import funnel
    import pytest as _pytest
    df = spark.createDataFrame(
        [("u", 0, 1, "a")],
        "user_id string, ts_ms long, event_id long, event_type string")
    with _pytest.raises(ValueError):
        funnel.sequence_match(df, ["a"])


def test_scd2_intervals_runs_and_current_flag(spark):
    from flink_realtime_data_eng_spark.operators import funnel
    rows = [
        ("u1", 100, 1, "bronze"), ("u1", 200, 2, "bronze"),
        ("u1", 300, 3, "gold"), ("u1", 400, 4, "bronze"),
        ("u2", 50, 5, "silver"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts_ms long, event_id long, event_type string")
    got = sorted((r["user_id"], r["event_type"], r["valid_from_ms"],
                  r["valid_to_ms"], r["is_current"])
                 for r in funnel.scd2_intervals(df).collect())
    assert got == [
        ("u1", "bronze", 100, 300, False),   # run of 2 collapses to one row
        ("u1", "bronze", 400, None, True),   # value can recur later
        ("u1", "gold", 300, 400, False),
        ("u2", "silver", 50, None, True),
    ]


def test_unpivot_round_trips_pivot(spark):
    from flink_realtime_data_eng_spark.operators import stats
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b")], "k long, t string")
    wide = stats.pivot_counts(df, "k", "t", ["a", "b", "c"])
    long = {(r["k"], r["event_type"], r["cnt"])
            for r in stats.unpivot_counts(wide, "k", ["a", "b", "c"])
            .collect()}
    assert long == {(1, "a", 2), (1, "b", 1), (1, "c", 0),
                    (2, "a", 0), (2, "b", 1), (2, "c", 0)}
