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


# --- re-identification audits -------------------------------------------
# k-anonymity / l-diversity over quasi-identifier classes: the governance
# readout a training-data release runs AFTER redaction — scrubbing direct
# identifiers (q_pii_redact) does not stop linkage attacks through
# quasi-identifier combinations (Sweeney 2002, k-anonymity; Machanavajjhala
# 2007, l-diversity). The fixture's QI tuple is (lang, source, doc-length
# bucket): language + provenance + size is exactly the metadata a released
# corpus ships per document.

K_ANON_K = 5
K_ANON_WIDTHS = (50, 100, 200, 400)  # generalization ladder, chars/bucket
L_DIV_L = 3
L_DIV_WIDTH = 100


@query(
    "q_k_anonymity",
    oracle=f"""
WITH widths AS (SELECT UNNEST(ARRAY{list(K_ANON_WIDTHS)}) AS width),
classes AS (
    SELECT w.width, d.lang, d.source,
        CAST(FLOOR(d.n_chars / w.width) AS BIGINT) AS bucket,
        CAST(COUNT(*) AS BIGINT) AS n
    FROM documents d CROSS JOIN widths w
    GROUP BY w.width, d.lang, d.source, bucket
), ladder AS (
    SELECT width,
        CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(MIN(n) AS BIGINT) AS min_class_size,
        CAST(COUNT(CASE WHEN n < {K_ANON_K} THEN 1 END) AS BIGINT)
            AS n_violations,
        CAST(COALESCE(SUM(CASE WHEN n < {K_ANON_K} THEN n END), 0) AS BIGINT)
            AS records_at_risk,
        ROUND(COALESCE(SUM(CASE WHEN n < {K_ANON_K} THEN n END), 0)
            * 1.0 / SUM(n), 6) AS pct_at_risk
    FROM classes GROUP BY width
)
SELECT width, n_classes, min_class_size, n_violations, records_at_risk,
    pct_at_risk,
    n_violations = 0 AS k_achieved,
    COALESCE(width = MIN(CASE WHEN n_violations = 0 THEN width END)
        OVER (), FALSE) AS chosen
FROM ladder""",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit with a generalization ladder: for each
    bucket width in {K_ANON_WIDTHS}, group the corpus into
    (lang, source, floor(n_chars/width)) quasi-identifier classes and
    report how far the release is from k={K_ANON_K} — class count,
    smallest class, violating classes, records at re-identification
    risk, and which ladder rung (if any) is the MINIMAL generalization
    achieving k for every record (`chosen`).

    Scale: the widths ladder EXPLODES per row (|widths| narrow rows per
    document — width int + QI tuple, never text), so the whole ladder is
    ONE scan + one shuffle on the class key; every per-width readout
    then aggregates a class table bounded by the QI domain, not the
    corpus. The alternative — one groupBy per rung — scans the corpus
    |widths| times."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    widths = F.array(*[F.lit(w) for w in K_ANON_WIDTHS])
    classes = (
        docs.select(
            "lang", "source", "n_chars", F.explode(widths).alias("width")
        )
        .groupBy(
            "width",
            "lang",
            "source",
            F.floor(F.col("n_chars") / F.col("width")).alias("bucket"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    risk = F.sum(F.when(F.col("n") < K_ANON_K, F.col("n")))
    ladder = classes.groupBy("width").agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("n").cast("bigint").alias("min_class_size"),
        F.count(F.when(F.col("n") < K_ANON_K, 1))
        .cast("bigint")
        .alias("n_violations"),
        F.coalesce(risk, F.lit(0)).cast("bigint").alias("records_at_risk"),
        F.round(F.coalesce(risk, F.lit(0)) * 1.0 / F.sum("n"), 6).alias(
            "pct_at_risk"
        ),
    )
    best = F.min(
        F.when(F.col("n_violations") == 0, F.col("width"))
    ).over(Window.partitionBy())
    return ladder.select(
        "width",
        "n_classes",
        "min_class_size",
        "n_violations",
        "records_at_risk",
        "pct_at_risk",
        (F.col("n_violations") == 0).alias("k_achieved"),
        F.coalesce(F.col("width") == best, F.lit(False)).alias("chosen"),
    )


@query(
    "q_l_diversity",
    oracle=f"""
WITH cells AS (
    SELECT lang, CAST(FLOOR(n_chars / {L_DIV_WIDTH}) AS BIGINT) AS bucket,
        source, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY lang, bucket, source
), with_p AS (
    SELECT lang, bucket, c,
        c * 1.0 / SUM(c) OVER (PARTITION BY lang, bucket) AS p
    FROM cells
), classes AS (
    SELECT lang, bucket,
        CAST(SUM(c) AS BIGINT) AS n,
        CAST(COUNT(*) AS INTEGER) AS distinct_l,
        ROUND(-SUM(p * LN(p)), 6) AS entropy_l
    FROM with_p GROUP BY lang, bucket
)
SELECT lang, bucket, n, distinct_l, entropy_l,
    distinct_l < {L_DIV_L} AS violates_l
FROM classes""",
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: within each (lang, doc-length-bucket)
    quasi-identifier class, how diverse is the SENSITIVE attribute
    (source — provenance can be sensitive for licensed corpora)? A class
    can be k-anonymous yet still leak: if every record in it shares one
    source, linkage reveals that source exactly. Reports per-class
    distinct-l, entropy l-diversity (-sum p ln p over the class's source
    distribution), and the l<{L_DIV_L} violation flag.

    Scale: one groupBy to (class x source) cells, then a window over
    CELLS (bounded by |QI domain| x |sources|, corpus-independent) for
    the entropy normalization — the corpus is scanned once."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy(
        "lang",
        F.floor(F.col("n_chars") / L_DIV_WIDTH).alias("bucket"),
        "source",
    ).agg(F.count("*").cast("bigint").alias("c"))
    wcls = Window.partitionBy("lang", "bucket")
    p = F.col("c") * 1.0 / F.sum("c").over(wcls)
    with_p = cells.select("lang", "bucket", "c", p.alias("p"))
    classes = with_p.groupBy("lang", "bucket").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("int").alias("distinct_l"),
        F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("entropy_l"),
    )
    return classes.select(
        "lang",
        "bucket",
        "n",
        "distinct_l",
        "entropy_l",
        (F.col("distinct_l") < L_DIV_L).alias("violates_l"),
    )


T_CLOSE_T = 0.3  # total-variation threshold


@query(
    "q_t_closeness",
    oracle=f"""
WITH cells AS MATERIALIZED (
    SELECT lang, CAST(FLOOR(n_chars / {L_DIV_WIDTH}) AS BIGINT) AS bucket,
        source, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY 1, 2, 3
), classes AS MATERIALIZED (
    SELECT lang, bucket, CAST(SUM(c) AS BIGINT) AS n
    FROM cells GROUP BY 1, 2
), gdist AS MATERIALIZED (
    SELECT source, SUM(c) * 1.0 / (SELECT SUM(c) FROM cells) AS pg
    FROM cells GROUP BY source
), grid AS MATERIALIZED (
    SELECT cl.lang, cl.bucket, cl.n, g.source, g.pg,
        COALESCE(ce.c, 0) * 1.0 / cl.n AS pc
    FROM classes cl CROSS JOIN gdist g
    LEFT JOIN cells ce ON ce.lang = cl.lang AND ce.bucket = cl.bucket
        AND ce.source = g.source
)
SELECT lang, bucket, CAST(MAX(n) AS BIGINT) AS n,
    ROUND(0.5 * SUM(ABS(pc - pg)), 6) AS tv_distance,
    0.5 * SUM(ABS(pc - pg)) > {T_CLOSE_T} AS violates_t
FROM grid GROUP BY lang, bucket""",
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al., ICDE 2007) — the step beyond
    q_k_anonymity (class sizes) and q_l_diversity (within-class
    diversity): a class whose SENSITIVE-attribute distribution merely
    differs from the corpus-wide one still leaks (skewness attack, e.g.
    one QI class 90% from a licensed source vs 10% globally). Per
    (lang, length-bucket) class: total-variation distance 0.5*sum|p_class
    - p_global| over the source distribution — the categorical ground
    distance of the paper — flagged at t > {T_CLOSE_T}.

    Scale: one corpus pass to (class x source) cells; the distance runs
    on the bounded classes x sources grid (built by a broadcast cross
    join of two tiny aggregates, never from rows), with absent cells
    supplied by the left join — the q_source_kl grid discipline."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy(
        "lang",
        F.floor(F.col("n_chars") / L_DIV_WIDTH).alias("bucket"),
        "source",
    ).agg(F.count("*").cast("bigint").alias("c"))
    cells = cells.localCheckpoint()
    total = cells.agg(F.sum("c")).first()[0]
    classes = cells.groupBy("lang", "bucket").agg(
        F.sum("c").cast("bigint").alias("n")
    )
    glob = cells.groupBy("source").agg(
        (F.sum("c") * 1.0 / F.lit(total)).alias("pg")
    )
    grid = (
        classes.crossJoin(F.broadcast(glob))
        .join(cells, ["lang", "bucket", "source"], "left")
        .select(
            "lang",
            "bucket",
            "n",
            "pg",
            (F.coalesce(F.col("c"), F.lit(0)) * 1.0 / F.col("n")).alias(
                "pc"
            ),
        )
    )
    tv = 0.5 * F.sum(F.abs(F.col("pc") - F.col("pg")))
    return grid.groupBy("lang", "bucket").agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(tv, 6).alias("tv_distance"),
        (tv > T_CLOSE_T).alias("violates_t"),
    )
