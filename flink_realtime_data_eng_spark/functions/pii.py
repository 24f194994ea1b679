"""PII detection and redaction over text columns.

Training-data hygiene step (extends SURVEY §2.9; the reference has no
analog): count and mask emails, North-American phone numbers, SSN-shaped
ids, and IPv4 addresses. Everything is JVM-side regexp — one map-side pass,
no shuffle, no UDF — so it composes with any scan at 100 TB for free.

Patterns are deliberately written in the RE2-compatible subset (character
classes, bounded repeats, \\b) so the same pattern string runs unchanged in
Spark (Java regex) and the DuckDB oracle (RE2) — no lookbehind, no
backreferences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# pattern name -> (regex, replacement tag)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # order matters for redaction: emails first so their user part is not
    # half-eaten by the phone/ssn digit patterns
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    "ipv4": (r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b", "<IP>"),
}


def _redacted_col(text_col: str) -> "F.Column":
    """The masked-text expression — the ONE definition both the fingerprint
    and :func:`redact` use, so they can never drift apart."""
    red = F.col(text_col)
    for _, (pat, tag) in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, tag)
    return red


def pii_features(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts plus a fingerprint of the redacted text.

    Counts are STAGED like the redaction itself: each pattern counts on the
    text with all earlier patterns already masked, so n_<pattern> is
    exactly the number of ``<TAG>`` spans that pattern contributes and
    n_pii equals the total masked spans (a phone-shaped substring inside an
    email is part of the email, not a second hit).

    Output: id, n_email, n_phone, n_ssn, n_ipv4, n_pii (total), redacted_fp
    (md5 of the text after masking, so the oracle can verify the redaction
    byte-for-byte without shipping the redacted text around).
    """
    staged = F.col(text_col)
    count_cols = []
    for name, (pat, tag) in PII_PATTERNS.items():
        count_cols.append(
            F.regexp_count(staged, F.lit(pat)).cast("bigint")
             .alias(f"n_{name}"))
        staged = F.regexp_replace(staged, pat, tag)
    out = df.select(F.col(id_col), F.col(text_col), *count_cols)
    total = sum((F.col(f"n_{name}") for name in PII_PATTERNS),
                F.lit(0).cast("bigint"))
    return out.select(
        F.col(id_col),
        *[F.col(f"n_{name}") for name in PII_PATTERNS],
        total.alias("n_pii"),
        F.md5(_redacted_col(text_col)).alias("redacted_fp"))


def redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All input columns with ``text_col`` replaced by its masked form."""
    return df.withColumn(text_col, _redacted_col(text_col))
