"""PII detection and redaction over the document corpus — the scrubbing
pass every training-data pipeline runs before anything else sees the
text (emails / phone numbers / IP addresses -> typed placeholder
tokens). The reference never ships raw PII downstream either: its
silver layer carries only numeric per-participant aggregates
(transformer/ranking/feature_factory.py), so redaction-before-export is
the same contract expressed at corpus scale.

Supersedes the minimal q_redact scrub in operators/training.py (which
stays registered as the earlier two-pattern form): this module adds the
IP class, a composable ``pii_redact(df)`` operator (counts + redacted
column in one pass), pattern-ordering guarantees, and idempotence.

The synthetic fixture text contains no PII, so — like q_dead_letter's
corrupt-payload synthesis — the query INJECTS deterministic PII spans
keyed on doc_id, then detects and redacts them. The oracle derives the
same injection from the same arithmetic, so it cross-checks the regex
engine end-to-end (Java regex on the Spark side, RE2 on DuckDB's; the
patterns are written in the common subset).

Scale notes (100 TB): pure narrow per-row expressions — regexp_count +
regexp_replace inside whole-stage codegen. Zero shuffles, zero joins,
zero Python. Redacted text is emitted as an md5 fingerprint here so the
correctness gate ships 16-byte digests, not bodies; the production
``pii_redact`` operator returns the full redacted column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

# Written in the Java-regex / RE2 common subset: no backrefs, no
# lookaround, explicit character classes.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

_PATTERNS = (
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IP_RE, "<IP>"),
)


def pii_redact(df: DataFrame, col: str = "text") -> DataFrame:
    """Replace every email / phone / IP span in ``col`` with its typed
    placeholder and add per-type match counts. Replacement is a
    PROGRESSIVE chain (email first, so a dotted host or digit run inside
    an address is consumed before the narrower patterns see it; IP
    last); the ``n_*`` counts are measured on the RAW input — they
    report what the scrubber found, so a phone-shaped digit run inside
    an email counts as a phone even though the email replacement already
    swallowed it. All JVM-side codegen — this adds no stage boundary to
    any plan it is composed into."""
    out = df
    redacted = F.col(col)
    for pat, token in _PATTERNS:
        out = out.withColumn(
            f"n_{token[1:-1].lower()}s", F.regexp_count(F.col(col), F.lit(pat))
        )
        redacted = F.regexp_replace(redacted, pat, token)
    return out.withColumn(f"{col}_redacted", redacted)


@query(
    "q_pii_redact",
    oracle=f"""
WITH injected AS (
    SELECT doc_id,
        text
        || CASE WHEN doc_id % 5 = 0
                THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
        || CASE WHEN doc_id % 7 = 0
                THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
        || CASE WHEN doc_id % 9 = 0
                THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END
        AS text
    FROM documents
)
SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
    CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS INTEGER) AS n_phones,
    CAST(len(regexp_extract_all(text, '{IP_RE}')) AS INTEGER) AS n_ips,
    md5(regexp_replace(regexp_replace(regexp_replace(text,
        '{EMAIL_RE}', '<EMAIL>', 'g'),
        '{PHONE_RE}', '<PHONE>', 'g'),
        '{IP_RE}', '<IP>', 'g')) AS redacted_fp
FROM injected""",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inject deterministic PII spans (doc_id % 5 -> email, % 7 -> phone,
    % 9 -> IP; some docs get several), then count and redact them. The
    md5 of the fully-redacted text proves byte-identical replacement
    across both regex engines without shipping document bodies through
    the correctness gate."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 9 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    red = pii_redact(injected)
    return red.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        F.md5(F.col("text_redacted")).alias("redacted_fp"),
    )
