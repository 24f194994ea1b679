"""Text analysis over document tables: tokenization, quality scoring,
language-ID heuristic, fingerprinting.

Everything is a Catalyst expression (regexp_count / split / md5 / length) so
the whole stage codegens into the parquet scan — at 100 TB these are pure
map-side columns with zero shuffle. Regex patterns are kept to the syntax
subset Java regex and RE2 (DuckDB oracle) agree on: character classes,
alternation, ``\\b`` word boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# Tiny per-language stopword marker lists for the heuristic language scorer.
# Deliberately small + high-frequency; the heuristic is deterministic and
# SQL-expressible, which is the point (real lang-id would be a model).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "und", "das", "ist"],
}

_WORD_RE = "[a-z0-9]+"


def tokens(text_col: str) -> Column:
    """Whitespace-ish tokenization: lowercase word/number runs (JVM regex)."""
    return F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")


def token_count(text_col: str) -> Column:
    """Whitespace token count (JVM-side; no UDF)."""
    return F.size(tokens(text_col)).alias("n_tokens")


def word_token_count(text_col: str) -> Column:
    """BPE-ish sub-token count: letter runs, digit runs, and single
    punctuation marks each count as one token."""
    pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    return F.regexp_count(F.lower(F.col(text_col)), F.lit(pat)).alias("n_subtokens")


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features + a composite score.

    Features: char length, token count, mean token length, punctuation ratio,
    stopword ratio. Score: a simple interpretable combination, rounded so the
    double arithmetic hashes identically against the SQL oracle.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = F.regexp_count(F.col(text_col), F.lit("[^a-zA-Z0-9 ]"))
    n_stop = F.regexp_count(
        F.lower(F.col(text_col)),
        F.lit(r"\b(the|and|of|to|is|a|in|that)\b"))
    mean_tok_len = F.when(n_tok > 0,
                          F.aggregate(toks, F.lit(0).cast("double"),
                                      lambda acc, x: acc + F.length(x)) / n_tok
                          ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(0.0)
    score = (F.least(n_tok.cast("double") / 100.0, F.lit(1.0)) * 0.4
             + stop_ratio * 0.4 + (1.0 - punct_ratio) * 0.2)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_m"),
        n_tok.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: count per-language marker stopwords, pick the
    argmax (ties + zero-evidence -> 'und'). One regexp_count per language —
    map-side only."""
    scores = {lang: F.regexp_count(F.lower(F.col(text_col)),
                                   F.lit(r"\b(" + "|".join(ws) + r")\b"))
              for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    guess = F.lit("und")
    # Deterministic priority order on ties: en > es > fr > de (first match).
    for lang in ["de", "fr", "es", "en"]:
        guess = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(guess)
    sel = [F.col(id_col)]
    sel += [v.alias(f"score_{k}") for k, v in scores.items()]
    sel.append(guess.alias("lang_guess"))
    return df.select(*sel)


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Content fingerprint: md5 of the normalized text (lowercased, non-
    alphanumeric stripped) — the exact-dedup key at scale. 128-bit as hex."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    norm = F.regexp_replace(norm, " +", " ")
    return df.select(F.col(id_col), F.md5(F.trim(norm)).alias("fp"))


def vocab_topk(df: DataFrame, k: int = 100, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary: the ``k`` most frequent tokens with term and
    document frequencies — the first pass of any tokenizer/vocab build.

    Shape: explode → one hash aggregate on token (map-side partials; the
    distinct doc count rides the same shuffle via a two-phase distinct
    aggregate) → ``orderBy().limit(k)`` = TakeOrderedAndProject, so the
    driver sees k rows however large the corpus. Ties break by token
    text ascending to keep the selected set deterministic.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    counts = tok.groupBy("tok").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.countDistinct(id_col).alias("doc_freq"))
    return counts.orderBy(F.col("term_freq").desc(), F.col("tok")).limit(k)


def tfidf_topk(df: DataFrame, k: int = 5, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` TF-IDF terms per document: the keyword-extraction /
    relevance-weighting primitive.

    ``tfidf = tf * ln((N + 1) / (df + 1))`` (the +1-smoothed IDF), with
    ``tf`` the in-document term count, ``df`` the number of documents
    containing the term, ``N`` the corpus size.

    Plan: explode → ONE (doc, term) count aggregate; document frequency
    derives from it (count over terms) and joins back on term — the only
    big shuffles are keyed by (doc, term) and term. N rides in as a
    broadcast scalar (1-row cross join; Catalyst broadcasts it). Rank =
    row_number per doc (partition-local top-k), ties broken by term text.
    Score rounded to 6 dp for the cross-engine hash.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    # Materialize ONCE: dfreq and the scored join both consume tf with
    # different prunings, so without this the tokenize+explode+count runs
    # twice over the corpus.
    tf = (tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
             .localCheckpoint(eager=True))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(dfreq, "tok").crossJoin(F.broadcast(n_docs))
                .select(F.col(id_col), F.col("tok"), F.col("tf"),
                        F.col("df"),
                        F.round(F.col("tf")
                                * F.log((F.col("n_docs") + 1)
                                        / (F.col("df") + 1)), 6)
                         .alias("tfidf")))
    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (scored.withColumn("rk", F.row_number().over(w))
                  .filter(F.col("rk") <= k)
                  .select(id_col, "tok", "tf", "df", "tfidf", "rk"))


def repetition_features(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition signals (Gopher-style quality filters):
    duplicate-token fraction, most-frequent-token fraction, and
    most-frequent-bigram fraction.

    Scale shape: explode + two-level aggregate — per-(doc, token) counts
    partial-aggregate map-side (repeats collapse before the shuffle), then
    one small per-doc aggregate; bigrams come from a lead() window over the
    same exploded rows, reusing the doc_id partitioning. Nothing is
    quadratic in document length, so multi-MB documents cost O(len) like
    every other map-side op. Docs with no tokens keep 0-valued features
    (left join from the id spine).
    """
    spine = df.select(F.col(id_col))
    # Materialize ONCE: the token-count and bigram branches both consume
    # the positional explode — otherwise documents tokenize twice.
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "tok")) \
        .localCheckpoint(eager=True)
    tc = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    tstats = tc.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.max("c").alias("top_cnt"))
    w = W.partitionBy(id_col).orderBy("pos")
    bg = (toks.withColumn("nxt", F.lead("tok").over(w))
              .filter(F.col("nxt").isNotNull())
              .select(F.col(id_col),
                      F.concat_ws(" ", "tok", "nxt").alias("bg")))
    bc = bg.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("c"))
    bstats = bc.groupBy(id_col).agg(F.sum("c").alias("n_bigrams"),
                                    F.max("c").alias("top_bg_cnt"))
    frac = lambda num, den: F.round(
        F.when(den > 0, num.cast("double") / den).otherwise(0.0), 6)
    return (spine.join(tstats, id_col, "left_outer")
                 .join(bstats, id_col, "left_outer")
                 .select(
                     F.col(id_col),
                     F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                     F.coalesce("n_distinct_tokens", F.lit(0))
                      .alias("n_distinct_tokens"),
                     frac(F.coalesce("n_tokens", F.lit(0))
                          - F.coalesce("n_distinct_tokens", F.lit(0)),
                          F.coalesce("n_tokens", F.lit(0)))
                     .alias("dup_token_frac"),
                     frac(F.coalesce("top_cnt", F.lit(0)),
                          F.coalesce("n_tokens", F.lit(0)))
                     .alias("top_token_frac"),
                     frac(F.coalesce("top_bg_cnt", F.lit(0)),
                          F.coalesce("n_bigrams", F.lit(0)))
                     .alias("top_bigram_frac")))


def collocations(df: DataFrame, min_count: int = 5,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Bigram collocation strength by pointwise mutual information:
    PMI = ln( c(ab) · N / (c(a) · c(b)) ) over corpus token occurrences —
    the "new-york"-detector that drives tokenizer merge rules and phrase
    mining.

    Plan: ONE tokenize pass; bigrams pair adjacent tokens map-side
    (``zip_with`` of the array against its own tail — no posexplode joins);
    one aggregate each for bigram and unigram counts; unigram counts join
    back twice (broadcast — the distinct-token table is vocabulary-sized,
    not corpus-sized). The PMI double is a single division of exact BIGINT
    products before one ln(), so both engines evaluate ln on the identical
    IEEE value.

    Output: tok_a, tok_b, n_ab, pmi (6 dp), for bigrams with
    n_ab >= min_count.
    """
    # Materialize the token arrays ONCE (unigram counts and bigram pairing
    # both consume them) and the vocabulary-sized unigram table ONCE (it is
    # referenced as left side, right side, and total).
    toks = (df.select(F.col(id_col), tokens(text_col).alias("tk"))
              .localCheckpoint(eager=True))
    uni = (toks.select(F.explode("tk").alias("tok"))
               .groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
               .localCheckpoint(eager=True))
    bigrams = toks.select(F.explode(F.expr(
        "zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)),"
        "         slice(tk, 2, greatest(size(tk) - 1, 0)),"
        "         (a, b) -> struct(a AS tok_a, b AS tok_b))")).alias("bg"))
    pair_counts = (bigrams.select("bg.tok_a", "bg.tok_b")
                   .groupBy("tok_a", "tok_b")
                   .agg(F.count(F.lit(1)).alias("n_ab"))
                   .filter(F.col("n_ab") >= min_count))
    total = uni.agg(F.sum("n_tok").alias("n_total"))
    ua = uni.select(F.col("tok").alias("tok_a"), F.col("n_tok").alias("n_a"))
    ub = uni.select(F.col("tok").alias("tok_b"), F.col("n_tok").alias("n_b"))
    # the unigram frames are VOCABULARY-sized (10^8-10^9 tokens at
    # 100 TB) — join strategy stays with AQE; the token-key equi-join
    # distributes well either way. Only the 1-row total is hinted.
    return (pair_counts
            .join(ua, "tok_a")
            .join(ub, "tok_b")
            .crossJoin(F.broadcast(total))
            .select("tok_a", "tok_b", "n_ab",
                    F.round(F.log((F.col("n_ab") * F.col("n_total"))
                                  / (F.col("n_a") * F.col("n_b"))), 6)
                     .alias("pmi")))


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document mean unigram log-probability — the cheap stand-in for
    LM-perplexity filtering (docs whose tokens are corpus-improbable score
    low: gibberish, wrong-language, encoding noise).

    Model: add-one-smoothed corpus unigram, p(t) = (c(t)+1) / (N+V).
    Plan: the (doc, token) counts aggregate feeds BOTH the corpus unigram
    table (second small aggregate) and the per-doc score join — token rows
    shuffle once, and the unigram join's strategy stays with AQE (the
    vocabulary is NOT bounded at 100 TB).
    Each term's tf·ln(p) rounds to exact ×10⁶ fixed point BEFORE the
    per-doc sum (float addition is not associative; partition order must
    not change the score), so the aggregate is an order-free integer sum
    and the mean is one exact division at the end.

    Output: id, n_tokens, logprob_e6 (BIGINT), mean_logprob (6 dp). Empty
    docs score 0.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    # Materialize ONCE: the unigram model and the per-doc scoring both
    # consume tf — otherwise the corpus tokenizes twice.
    tf = (tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
             .localCheckpoint(eager=True))
    uni = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    totals = uni.agg(F.sum("c").alias("n_corpus"),
                     F.count(F.lit(1)).alias("vocab"))
    term_e6 = F.round(F.col("tf")
                      * F.log((F.col("c") + 1)
                              / (F.col("n_corpus") + F.col("vocab")))
                      * 1_000_000).cast("bigint")
    # uni is vocabulary-sized: AQE chooses (broadcast while it fits,
    # token-key shuffle at 100 TB); only the 1-row totals are hinted.
    scored = (tf.join(uni, "tok")
                .crossJoin(F.broadcast(totals))
                .groupBy(id_col)
                .agg(F.sum(term_e6).alias("logprob_e6"),
                     F.sum("tf").alias("n_tokens")))
    spine = df.select(F.col(id_col))
    return (spine.join(scored, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint")
                     .alias("n_tokens"),
                    F.coalesce(F.col("logprob_e6"), F.lit(0)).cast("bigint")
                     .alias("logprob_e6"),
                    F.coalesce(F.round(F.col("logprob_e6")
                                       / F.col("n_tokens") / 1e6, 6),
                               F.lit(0.0)).alias("mean_logprob")))


def quality_buckets(df: DataFrame, n_buckets: int = 3,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """CCNet-style corpus partition into quality buckets (head/middle/tail)
    by mean unigram log-probability (CCNet buckets by LM perplexity; the
    corpus unigram model of :func:`unigram_logprob` is the engine-native
    stand-in).

    Ranking key: exact integer milli-units of mean logprob, computed as
    ``(logprob_e6 + C·n_tokens)·1000 div n_tokens`` with C large enough to
    make the numerator positive — truncating and flooring division then
    agree, so Spark's ``div`` and DuckDB's ``//`` produce identical keys
    and the ntile assignment hash-matches across engines (a raw float mean
    could flip a boundary doc on a last-ulp difference). Empty docs key to
    -1 (worst bucket).

    Scale: ntile is a global-sort window — fine for the corpus sizes where
    exact terciles matter (eval/report sets). The 100 TB path replaces it
    with approx-quantile cutoffs on the key + a map-side bucket filter;
    the key computation is shared by both paths.
    """
    scored = unigram_logprob(df, text_col=text_col, id_col=id_col)
    key = _quality_key()
    from pyspark.sql import Window as W
    w = W.orderBy(F.col("qkey_milli").desc(), F.col(id_col))
    named = (F.when(F.col("bucket") == 1, "head")
              .when(F.col("bucket") == n_buckets, "tail")
              .otherwise("middle"))
    return (scored.withColumn("qkey_milli", key)
            .withColumn("bucket", F.ntile(n_buckets).over(w))
            .withColumn("bucket_name", named)
            .select(id_col, "n_tokens", "logprob_e6", "qkey_milli",
                    "bucket", "bucket_name"))


def _quality_key() -> Column:
    """Exact-integer mean-logprob ranking key over unigram_logprob's
    (n_tokens, logprob_e6) columns; shared by the exact-ntile and
    approx-cutoff bucket paths. The +1e8·n_tokens offset keeps the
    numerator positive so truncating (Spark ``div``) and flooring
    (DuckDB ``//``) division agree; empty docs key to -1."""
    offset = 100_000_000  # |mean logprob| stays far below 100 in e6 units
    return (F.when(F.col("n_tokens") > 0,
                   F.expr(f"((logprob_e6 + {offset}*n_tokens) * 1000)"
                          f" div n_tokens"))
             .otherwise(F.lit(-1)).cast("bigint"))


def quality_buckets_approx(df: DataFrame, n_buckets: int = 3,
                           rel_err: float = 0.001,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """The 100 TB form of :func:`quality_buckets`: approx-quantile cutoffs
    on the shared ranking key + a map-side bucket assignment — no global
    sort, no single-partition window anywhere in the plan.

    ``percentile_approx`` is a bounded-memory mergeable sketch (one
    aggregate); its 1-row cutoff frame broadcasts into the bucket CASE.
    Bucket boundaries can differ from exact ntile by the sketch's rank
    error (``rel_err``, accuracy = 1/rel_err) and ties are NOT split to
    equalize bucket sizes — acceptable for corpus curation, where the
    filter threshold itself is a heuristic. Registered nowhere: the exact
    form is the oracle-checked contract; this one is pytest-checked
    against it (same keys, bucket agreement within sketch error).
    """
    scored = (unigram_logprob(df, text_col=text_col, id_col=id_col)
              .withColumn("qkey_milli", _quality_key()))
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = scored.agg(
        F.percentile_approx("qkey_milli", probs,
                            F.lit(int(1 / rel_err))).alias("cuts"))
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        # cuts are ascending; bucket 1 = highest keys (head)
        bucket = bucket + F.when(
            F.col("qkey_milli") <= F.col("cuts")[n_buckets - 2 - i],
            F.lit(1)).otherwise(F.lit(0))
    named = (F.when(F.col("bucket") == 1, "head")
              .when(F.col("bucket") == n_buckets, "tail")
              .otherwise("middle"))
    return (scored.crossJoin(F.broadcast(cuts))
            .withColumn("bucket", bucket.cast("int"))
            .withColumn("bucket_name", named)
            .select(id_col, "n_tokens", "logprob_e6", "qkey_milli",
                    "bucket", "bucket_name"))


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document mean bigram conditional log-probability — the
    order-aware upgrade of :func:`unigram_logprob` (a shuffled bag of
    common words scores high under a unigram model; a bigram model
    penalizes improbable ADJACENCY, the cheap stand-in for LM perplexity).

    Model: add-one smoothing, p(b|a) = (c(a,b)+1) / (c(a) + V).
    Plan: ONE (doc, bigram) count aggregate feeds both the corpus bigram
    table and the per-doc scoring join (same materialize-once discipline
    as the unigram model); the unigram counts and vocabulary ride a
    second small aggregate over the same checkpointed frame. Per-term
    values round to exact e6 fixed point BEFORE the order-free integer
    sum. Vocabulary-sized joins stay with AQE. Empty/1-token docs score 0.

    Output: id, n_bigrams, logprob_e6 (BIGINT), mean_logprob (6 dp).
    """
    bg_struct = F.expr(
        "zip_with(slice(tk, 1, greatest(size(tk) - 1, 0)),"
        "         slice(tk, 2, greatest(size(tk) - 1, 0)),"
        "         (a, b) -> struct(a AS tok_a, b AS tok_b))")
    toks = df.select(F.col(id_col), tokens(text_col).alias("tk"))
    pairs = (toks.select(F.col(id_col), F.explode(bg_struct).alias("bg"))
                 .select(id_col, "bg.tok_a", "bg.tok_b"))
    # Materialize ONCE: corpus bigram counts AND per-doc scoring read tf.
    tf = (pairs.groupBy(id_col, "tok_a", "tok_b")
               .agg(F.count(F.lit(1)).alias("tf"))
               .localCheckpoint(eager=True))
    c_ab = tf.groupBy("tok_a", "tok_b").agg(F.sum("tf").alias("c_ab"))
    uni = (toks.select(F.explode("tk").alias("tok"))
               .groupBy("tok").agg(F.count(F.lit(1)).alias("c_a")))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    term_e6 = F.round(F.col("tf")
                      * F.log((F.col("c_ab") + 1)
                              / (F.col("c_a") + F.col("v")))
                      * 1_000_000).cast("bigint")
    scored = (tf.join(c_ab, ["tok_a", "tok_b"])
                .join(uni.withColumnRenamed("tok", "tok_a"), "tok_a")
                .crossJoin(F.broadcast(vocab))
                .groupBy(id_col)
                .agg(F.sum(term_e6).alias("logprob_e6"),
                     F.sum("tf").alias("n_bigrams")))
    spine = df.select(F.col(id_col))
    return (spine.join(scored, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint")
                     .alias("n_bigrams"),
                    F.coalesce(F.col("logprob_e6"), F.lit(0)).cast("bigint")
                     .alias("logprob_e6"),
                    F.coalesce(F.round(F.col("logprob_e6")
                                       / F.col("n_bigrams") / 1e6, 6),
                               F.lit(0.0)).alias("mean_logprob")))


def token_entropy(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document unigram (token-distribution) entropy in nats —
    low entropy flags repetitive/gibberish docs from the distribution
    side, complementing :func:`repetition_features`' span signals.

    H = -Σ (tf/n)·ln(tf/n) over the doc's own term frequencies. Per-term
    values round to exact e6 fixed point BEFORE the order-free sum (the
    same cross-engine determinism contract as the LM scorers); one
    (doc, token) aggregate, the doc total via a window over the SAME
    partitioning (no second aggregate branch), one per-doc aggregate.
    Empty docs score 0.

    Output: id, n_tokens, entropy_e6 (BIGINT), entropy (6 dp nats).
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    tf = tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    with_n = tf.withColumn("n", F.sum("tf").over(W.partitionBy(id_col)))
    term_e6 = F.round(-(F.col("tf") / F.col("n"))
                      * F.log(F.col("tf") / F.col("n")) * 1_000_000) \
               .cast("bigint")
    scored = (with_n.groupBy(id_col)
              .agg(F.sum(term_e6).alias("entropy_e6"),
                   F.max("n").alias("n_tokens")))
    spine = df.select(F.col(id_col))
    return (spine.join(scored, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint")
                     .alias("n_tokens"),
                    F.coalesce(F.col("entropy_e6"), F.lit(0)).cast("bigint")
                     .alias("entropy_e6"),
                    F.coalesce(F.round(F.col("entropy_e6") / 1e6, 6),
                               F.lit(0.0)).alias("entropy")))


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", min_words: int = 50,
                 max_words: int = 100_000, min_mean_len: float = 3.0,
                 max_mean_len: float = 10.0, min_alpha_frac: float = 0.8,
                 max_symbol_ratio: float = 0.1,
                 min_stopwords: int = 2) -> DataFrame:
    """Gopher-style document quality rule table (Rae et al. 2021, App. A):
    the named heuristic gates web-corpus pipelines apply before any model
    scoring, each as an explicit boolean column plus the composite ``keep``
    verdict — rule-level columns are what lets an ops dashboard answer
    "WHICH rule is rejecting 40% of source X".

    Rules (thresholds are the published defaults, overridable): word count
    in [min_words, max_words]; mean word length in [min_mean_len,
    max_mean_len]; >= min_alpha_frac of words contain an alphabetic char;
    symbol-to-word ratio (# and ellipsis) <= max_symbol_ratio; at least
    min_stopwords stopword hits. Line-level Gopher rules (bullet/dup-line
    fractions) need newline structure the fixture corpus lacks; the
    cross-doc repetition analog lives in :func:`repetition_features` and
    ``dedup.dup_ngram_fraction``.

    Plan shape: every feature and verdict is a map-side expression over the
    raw text — no explode, no join, no shuffle; at 100 TB this runs at scan
    speed and composes with predicate pushdown when used as a filter.
    """
    raw = F.col(text_col)
    w = F.split(F.trim(raw), r"\s+")
    has_text = F.length(F.trim(raw)) > 0
    n_words = F.when(has_text, F.size(w)).otherwise(F.lit(0)).cast("bigint")
    sum_len = F.when(has_text,
                     F.aggregate(w, F.lit(0).cast("bigint"),
                                 lambda acc, x: acc + F.length(x))
                     ).otherwise(F.lit(0))
    mean_len = F.round(F.when(n_words > 0,
                              sum_len.cast("double") / n_words)
                       .otherwise(F.lit(0.0)), 6)
    n_alpha = F.when(has_text,
                     F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]")))
                     ).otherwise(F.lit(0)).cast("bigint")
    alpha_frac = F.round(F.when(n_words > 0,
                                n_alpha.cast("double") / n_words)
                         .otherwise(F.lit(0.0)), 6)
    n_sym = (F.regexp_count(raw, F.lit("#"))
             + F.regexp_count(raw, F.lit(r"\.\.\."))).cast("bigint")
    sym_ratio = F.round(F.when(n_words > 0,
                               n_sym.cast("double") / n_words)
                        .otherwise(F.lit(0.0)), 6)
    n_stop = F.regexp_count(
        F.lower(raw),
        F.lit(r"\b(the|and|of|to|is|a|in|that)\b")).cast("bigint")
    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_mean = (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
    r_alpha = alpha_frac >= min_alpha_frac
    r_sym = sym_ratio <= max_symbol_ratio
    r_stop = n_stop >= min_stopwords
    return df.select(
        F.col(id_col), n_words.alias("n_words"),
        mean_len.alias("mean_word_len"), alpha_frac.alias("alpha_word_frac"),
        sym_ratio.alias("symbol_word_ratio"), n_stop.alias("n_stopwords"),
        r_words.alias("r_word_count"), r_mean.alias("r_mean_word_len"),
        r_alpha.alias("r_alpha_words"), r_sym.alias("r_symbol_ratio"),
        r_stop.alias("r_stopwords"),
        (r_words & r_mean & r_alpha & r_sym & r_stop).alias("keep"))


def bpe_pair_counts(df: DataFrame, k: int = 20,
                    text_col: str = "text") -> DataFrame:
    """One BPE-training merge round (Sennrich et al. 2016): the k most
    frequent ADJACENT symbol pairs over the corpus, weighted by word
    frequency — the statistic whose argmax becomes the next merge rule.
    Symbols here are characters (round 0); iterating = re-tokenizing with
    the merged symbol and re-running.

    Scale shape — the reason BPE training is feasible on a corpus at all:
    pair counting runs over the WORD-FREQUENCY table (vocab-scale), not
    the token stream. One explode+agg builds the vocab (corpus-scale
    shuffle of tokens, partial aggs collapse repeats map-side), then the
    per-word pair expansion is map-side over vocab rows and the final
    aggregate shuffles pair-scale rows. Top-k is one small sort of the
    pair table.

    Output: (pair, cnt, rk) — pair as space-joined symbols, BPE
    convention; ties broken lexicographically so the result is total.
    """
    from pyspark.sql import Window as W
    from .dedup import _norm
    words = (df.select(F.explode(F.split(_norm(text_col), " ")).alias("w"))
             .filter(F.length("w") > 0))
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    # Guard single-char words: Spark's sequence(1, 0) DESCENDS ([1, 0]),
    # it does not return empty — the empty array must be explicit.
    grams = F.when(
        F.length("w") >= 2,
        F.expr("transform(sequence(1, length(w) - 1),"
               " i -> concat(substring(w, i, 1), ' ',"
               " substring(w, i + 1, 1)))"),
    ).otherwise(F.array().cast("array<string>"))
    pairs = wc.select(F.explode(grams).alias("pair"), "freq")
    agg = pairs.groupBy("pair").agg(F.sum("freq").cast("bigint").alias("cnt"))
    # Top-k via orderBy().limit() — TakeOrderedAndProject (per-partition
    # heap + k-way driver merge), never the single-partition global-rank
    # window; the rank is then a window over k rows only.
    top = agg.orderBy(F.col("cnt").desc(), F.col("pair")).limit(k)
    rk = F.row_number().over(W.orderBy(F.col("cnt").desc(), F.col("pair")))
    return top.select("pair", "cnt", rk.cast("int").alias("rk"))


def heldout_logprob(train_df: DataFrame, eval_df: DataFrame,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """HELD-OUT mean unigram log-probability — the evaluation form of
    :func:`unigram_logprob`: the add-one model fits on ``train_df`` ONLY
    and scores ``eval_df``, so the score measures generalization, not
    memorization (the same-corpus form trivially favors every document
    it trained on). Out-of-vocabulary eval tokens take the smoothing
    floor p = 1/(N+V) — exactly what add-one assigns an unseen type.

    Same exactness contract: per-term tf·ln(p) rounds to e6 integers
    BEFORE the order-free per-doc sum; one division at the end. The
    model join stays with AQE (vocabulary-scale); only the 1-row totals
    broadcast.

    Output: (id, n_tokens, oov_tokens, logprob_e6, mean_logprob).
    """
    train_tok = train_df.select(F.explode(tokens(text_col)).alias("tok"))
    uni = (train_tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
           .localCheckpoint(eager=True))
    totals = uni.agg(F.sum("c").alias("n_corpus"),
                     F.count(F.lit(1)).alias("vocab"))
    ev_tf = (eval_df.select(F.col(id_col),
                            F.explode(tokens(text_col)).alias("tok"))
             .groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf")))
    joined = (ev_tf.join(uni, "tok", "left")
              .crossJoin(F.broadcast(totals))
              .withColumn("c", F.coalesce("c", F.lit(0))))
    term_e6 = F.round(F.col("tf")
                      * F.log((F.col("c") + 1)
                              / (F.col("n_corpus") + F.col("vocab")))
                      * 1_000_000).cast("bigint")
    scored = (joined.groupBy(id_col)
              .agg(F.sum(term_e6).alias("logprob_e6"),
                   F.sum("tf").alias("n_tokens"),
                   F.sum(F.when(F.col("c") == 0, F.col("tf"))
                         .otherwise(F.lit(0))).alias("oov_tokens")))
    spine = eval_df.select(F.col(id_col))
    z = F.lit(0)
    return (spine.join(scored, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_tokens", z).cast("bigint")
                     .alias("n_tokens"),
                    F.coalesce("oov_tokens", z).cast("bigint")
                     .alias("oov_tokens"),
                    F.coalesce("logprob_e6", z).cast("bigint")
                     .alias("logprob_e6"),
                    F.coalesce(F.round(F.col("logprob_e6")
                                       / F.col("n_tokens") / 1e6, 6),
                               F.lit(0.0)).alias("mean_logprob")))


def feature_hash(df: DataFrame, buckets: int = 64, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Hashing-trick bag-of-words (Weinberger et al., ICML'09): every
    token maps to ``md5 % buckets`` with a second md5 bit supplying the
    ±1 sign, so collision noise cancels in expectation — the fixed-width
    featurizer that needs NO vocabulary pass, no dictionary broadcast,
    and no fit/transform split, which is exactly what you want when the
    corpus is 100 TB and the vocabulary won't fit anywhere.

    Sparse output (id, bucket, feat): one explode + one (id, bucket)
    aggregate, all map-side expressible work before the single keyed
    shuffle. Hash = the repo's md5-derived 32-bit family, so the DuckDB
    oracle replays every bucket and sign bit-for-bit.
    """
    from .dedup import _md5_hash32
    tok = (df.select(F.col(id_col),
                     F.explode(tokens(text_col)).alias("tok")))
    h = _md5_hash32("fh", F.col("tok"))
    sign = F.when(_md5_hash32("fs", F.col("tok")) % 2 == 0,
                  F.lit(1)).otherwise(F.lit(-1))
    return (tok.select(F.col(id_col), (h % buckets).alias("bucket"),
                       sign.alias("sign"))
               .groupBy(id_col, "bucket")
               .agg(F.sum("sign").cast("bigint").alias("feat"))
               .orderBy(id_col, "bucket"))


def dsir_weights(df: DataFrame, target_col: str = "lang",
                 target_value: str = "en", buckets: int = 1024,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS'23
    — DSIR): score every document by how much more likely its hashed
    bag-of-words is under a TARGET distribution (here: the
    ``target_col = target_value`` slice) than under the RAW corpus,
    weight(doc) = sum over token occurrences of
    log(p_target(bucket) / p_raw(bucket)), add-1 smoothed. Docs with
    positive weight look more target-like than corpus-average — the
    signal DSIR resamples pretraining data by.

    Exactness: the per-bucket log-ratio rounds to an e6 BIGINT once
    (|buckets| rows), so per-doc sums are integer-exact and
    partition-order-independent; the DuckDB oracle replays the same md5
    bucket hash, the same smoothing, the same single rounding point.

    Scale shape: one token explode (linear, map-side), ONE bucket-keyed
    aggregate bounded at |buckets| rows, a 1-row totals broadcast, then
    the per-doc sum joins tokens against the BROADCAST |buckets|-row
    weight table — no corpus-keyed self-join, no vocabulary dictionary
    (the hashing trick needs no vocab pass: Weinberger ICML'09), nothing
    driver-side. Output: (doc_id, n_tokens, weight_e6, target_like).
    """
    w = dsir_bucket_weights(df, target_col, target_value, buckets,
                            text_col, id_col)
    return dsir_score(df, w, buckets, text_col, id_col)


def dsir_bucket_weights(df: DataFrame, target_col: str = "lang",
                        target_value: str = "en", buckets: int = 1024,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """The DSIR TRAINED ARTIFACT: one (bucket, w_e6) row per hash bucket,
    w_e6 = round(1e6 * [ln p_target(bucket) - ln p_raw(bucket)]), add-1
    smoothed — |buckets| rows total, persistable and broadcastable. One
    token explode + one bucket-keyed aggregate + a 1-row totals
    broadcast; the single rounding point keeps per-doc sums integer-exact
    downstream."""
    from .dedup import _md5_hash32
    tok = df.select(
        (F.col(target_col) == F.lit(target_value)).alias("is_tgt"),
        F.explode(tokens(text_col)).alias("tok"))
    bt = tok.select("is_tgt",
                    (_md5_hash32("dw", F.col("tok")) % buckets)
                    .alias("bucket"))
    counts = bt.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).alias("n_tgt"))
    totals = counts.agg(F.sum("n_raw").alias("tot_raw"),
                        F.sum("n_tgt").alias("tot_tgt"))
    return (counts.crossJoin(F.broadcast(totals))
            .select("bucket",
                    F.round((F.log((F.col("n_tgt") + 1).cast("double")
                                   / (F.col("tot_tgt") + buckets))
                             - F.log((F.col("n_raw") + 1).cast("double")
                                     / (F.col("tot_raw") + buckets)))
                            * 1_000_000).cast("bigint").alias("w_e6")))


def dsir_score(df: DataFrame, weights: DataFrame, buckets: int = 1024,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The DSIR SERVING pass: score documents against an already-trained
    (possibly persisted) bucket-weight table — one token explode + a
    broadcast join against the |buckets|-row artifact + one per-doc sum;
    the corpus that trained the weights is never rescanned. Missing
    buckets (never seen in training) score 0 via the left join."""
    from .dedup import _md5_hash32
    bt = df.select(F.col(id_col),
                   F.explode(tokens(text_col)).alias("tok")) \
           .select(id_col, (_md5_hash32("dw", F.col("tok")) % buckets)
                   .alias("bucket"))
    per_doc = (bt.join(F.broadcast(weights), "bucket", "left")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
                    F.sum(F.coalesce("w_e6", F.lit(0))).cast("bigint")
                     .alias("weight_e6")))
    return (df.select(id_col).join(per_doc, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_tokens", F.lit(0)).cast("bigint")
                     .alias("n_tokens"),
                    F.coalesce("weight_e6", F.lit(0)).cast("bigint")
                     .alias("weight_e6"))
            .withColumn("target_like", F.col("weight_e6") > 0))


def domain_caps(df: DataFrame, k: int = 50, text_col: str = "text",
                id_col: str = "doc_id",
                source_col: str = "source") -> DataFrame:
    """Per-source quality cap — the corpus-curation step that stops one
    domain from swamping the mixture: keep only each source's top-``k``
    docs by mean unigram log-probability (the engine's quality signal),
    ranked on the shared exact-integer key (:func:`_quality_key`) with
    doc-id tie-breaks so the cut is hash-stable cross-engine. Unlike
    :func:`sketches.group_sample` (hash-uniform per stratum), this cap is
    quality-ORDERED — what you want when the over-represented domain is
    also the noisy one.

    Scale: the per-source ranking window sorts each source's docs through
    one task — fine at report scale; the 100 TB path computes each
    source's k-th key with approx-quantiles and keeps docs above it
    map-side (the quality_buckets_approx recipe), sharing this exact key.

    Output: (source, doc_id, qkey_milli, rk) for kept docs.
    """
    from pyspark.sql import Window as W
    scored = unigram_logprob(df, text_col=text_col, id_col=id_col)
    keyed = (scored.join(df.select(id_col, source_col), id_col)
                   .withColumn("qkey_milli", _quality_key()))
    w = (W.partitionBy(source_col)
          .orderBy(F.col("qkey_milli").desc(), F.col(id_col)))
    return (keyed.withColumn("rk", F.row_number().over(w).cast("bigint"))
                 .filter(F.col("rk") <= k)
                 .select(source_col, id_col, "qkey_milli", "rk")
                 .orderBy(source_col, "rk"))
