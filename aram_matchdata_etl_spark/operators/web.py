"""Web-curation operators: URL canonicalization and per-domain corpus
stats — the C4/RefinedWeb front-door passes (URL-level dedup needs
canonical URLs; domain-level filtering/blocklists need a registered-
domain rollup). The fixture corpus carries no URLs, so the queries
synthesize one deterministically per document (mixed-case host, utm
tracking params, fragments — the mess canonicalization exists for) and
the oracle re-derives the same construction, cross-checking the whole
string pipeline.

Scale notes (100 TB): canonicalization is pure per-row codegen
(regexp_extract + higher-order array filter — no UDFs, no shuffle);
the domain rollup is one groupBy on a low-cardinality key with
map-side partial aggregation. Blocklist filtering composes as a
broadcast left-anti join against the domain column (see
q_domain_stats' blocked flag for the in-row variant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

# RE2 / Java-regex common subset
_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY = r"\?([^#]*)"

BLOCKLIST = ("src3.example.com", "src7.example.com")


def _synth_url() -> Column:
    """Deterministic messy URL per doc: host case noise, tracking params
    interleaved with real ones, fragments."""
    d = F.col("doc_id")
    q = (
        F.when(d % 3 == 0, F.concat(F.lit("?utm_source=feed&id="), d.cast("string")))
        .when(d % 3 == 1, F.concat(F.lit("?id="), d.cast("string"), F.lit("&utm_campaign=x")))
        .otherwise(F.lit(""))
    )
    frag = F.when(d % 4 == 0, F.lit("#frag")).otherwise(F.lit(""))
    return F.concat(
        F.lit("HTTPS://"),
        F.col("source"),
        F.lit(".Example.COM/path/"),
        d.cast("string"),
        q,
        frag,
    )


_SYNTH_URL_SQL = """'HTTPS://' || source || '.Example.COM/path/' || CAST(doc_id AS VARCHAR)
        || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
                WHEN doc_id % 3 = 1 THEN '?id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x'
                ELSE '' END
        || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END"""


def canonicalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, path preserved, fragment
    dropped, ``utm_*`` tracking params stripped (other params kept in
    order), no dangling '?'. Pure codegen — composes into any scan."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME, 1))
    host = F.lower(F.regexp_extract(url, _HOST, 1))
    path = F.regexp_extract(url, _PATH, 1)
    # strip the fragment BEFORE extracting the query: an unanchored
    # \?([^#]*) on the full URL would resurrect fragment content as query
    # params for URLs whose first '?' sits inside the fragment, e.g.
    # https://h/p#frag?x=1 (ADVICE r5)
    pre_frag = F.substring_index(url, "#", 1)
    qs = F.regexp_extract(pre_frag, _QUERY, 1)
    kept = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qpart)


def registered_domain(url: Column) -> Column:
    """Last two host labels (example.com) — the eTLD+1 approximation the
    fixture needs; a real pipeline swaps in the public-suffix list."""
    host = F.lower(F.regexp_extract(url, _HOST, 1))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(n >= 2, F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))).otherwise(host)


# fragment stripped (string_split on '#', first piece) BEFORE the query
# extraction — mirrors canonicalize_url's pre_frag step (ADVICE r5)
_PRE_FRAG_SQL = "string_split(url, '#')[1]"
_KEPT_SQL = (
    f"list_filter(string_split(regexp_extract({_PRE_FRAG_SQL}, '\\?(.*)', 1), '&'), "
    "p -> p <> '' AND NOT starts_with(p, 'utm_'))"
)
_CANON_SQL = f"""lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://'
    || lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))
    || regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)
    || CASE WHEN len({_KEPT_SQL}) > 0
            THEN '?' || list_aggregate({_KEPT_SQL}, 'string_agg', '&')
            ELSE '' END"""

_HOST_SQL = "lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"


@query(
    "q_url_normalize",
    oracle=f"""
WITH raw AS (
    SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents
)
SELECT doc_id, url AS raw_url,
    {_CANON_SQL} AS canonical_url,
    CASE WHEN len(string_split({_HOST_SQL}, '.')) >= 2
         THEN array_to_string(string_split({_HOST_SQL}, '.')[-2:], '.')
         ELSE {_HOST_SQL} END AS domain
FROM raw""",
)
def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization: scheme/host case-folded, fragment dropped,
    utm_* params stripped, real params preserved in order — the key an
    URL-level dedup groups on."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", "source", _synth_url().alias("url"))
    return raw.select(
        "doc_id",
        F.col("url").alias("raw_url"),
        canonicalize_url(F.col("url")).alias("canonical_url"),
        registered_domain(F.col("url")).alias("domain"),
    )


@query(
    "q_domain_stats",
    oracle=f"""
WITH raw AS (
    SELECT doc_id, n_chars, {_SYNTH_URL_SQL} AS url FROM documents
), parsed AS (
    SELECT doc_id, n_chars,
        CASE WHEN len(string_split({_HOST_SQL}, '.')) >= 2
             THEN array_to_string(string_split({_HOST_SQL}, '.')[-2:], '.')
             ELSE {_HOST_SQL} END AS domain,
        {_HOST_SQL} AS host
    FROM raw
)
SELECT host, domain,
    host IN ('src3.example.com', 'src7.example.com') AS blocked,
    COUNT(*) AS n_docs,
    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
    ROUND(AVG(n_chars), 6) AS avg_chars
FROM parsed
GROUP BY host, domain""",
)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host corpus rollup with blocklist flag — the aggregate a
    domain-level quality filter consumes. The blocklist is an in-row
    membership test here (tiny literal set); a big blocklist becomes a
    broadcast anti-join on the same column."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select("doc_id", "n_chars", "source", _synth_url().alias("url"))
    host = F.lower(F.regexp_extract(F.col("url"), _HOST, 1))
    parsed = raw.select(
        "doc_id",
        "n_chars",
        host.alias("host"),
        registered_domain(F.col("url")).alias("domain"),
    )
    return (
        parsed.groupBy("host", "domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .select(
            "host",
            "domain",
            F.col("host").isin(*BLOCKLIST).alias("blocked"),
            "n_docs",
            "total_chars",
            "avg_chars",
        )
    )


def _curation_oracle() -> str:
    from .privacy import EMAIL_RE, IP_RE, PHONE_RE
    from .text import QUALITY_EXPR_SQL

    return f"""
WITH raw AS (
    SELECT doc_id, text, source, {_SYNTH_URL_SQL} AS url FROM documents
), unblocked AS (
    SELECT doc_id, text, source FROM raw
    WHERE {_HOST_SQL} NOT IN ('src3.example.com', 'src7.example.com')
), deduped AS (
    SELECT doc_id, text, source FROM (
        SELECT doc_id, text, source,
            ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM unblocked
    ) WHERE rn = 1
), gated AS (
    SELECT doc_id, text, source,
        ROUND({QUALITY_EXPR_SQL}, 6) AS quality
    FROM deduped
    WHERE {QUALITY_EXPR_SQL} >= 0.5
)
SELECT doc_id, source, quality,
    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
    md5(regexp_replace(regexp_replace(regexp_replace(text,
        '{EMAIL_RE}', '<EMAIL>', 'g'),
        '{PHONE_RE}', '<PHONE>', 'g'),
        '{IP_RE}', '<IP>', 'g')) AS clean_fp
FROM gated"""


@query("q_web_curation_pipeline", oracle=_curation_oracle())
def q_web_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end web-curation composition — the front half of a C4/
    RefinedWeb-style pipeline fused into ONE Spark plan: domain
    blocklist filter -> exact content dedup (keep lowest doc_id per
    md5 fingerprint) -> quality gate (>= 0.5) -> PII scrub -> token
    count + clean-text fingerprint.

    Plan shape (pinned in test_plans): the blocklist gate and both
    quality/scrub stages are narrow codegen; the ONLY exchange is the
    dedup window's hash partition on the 16-byte fingerprint. No joins,
    no second corpus scan — stage fusion is the point: at 100 TB this
    runs as scan -> filter -> one shuffle -> filter -> project."""
    from .privacy import pii_redact
    from .text import quality_score_col

    docs = load_table(spark, sf_dir, "documents")
    host = F.lower(F.regexp_extract(_synth_url(), _HOST, 1))
    unblocked = docs.filter(~host.isin(*BLOCKLIST)).select("doc_id", "text", "source")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        unblocked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    words = F.split(F.col("text"), " ")
    quality = quality_score_col(words)
    gated = deduped.filter(quality >= 0.5).withColumn(
        "quality", F.round(quality, 6)
    )
    red = pii_redact(gated)
    return red.select(
        "doc_id",
        "source",
        "quality",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.md5(F.col("text_redacted")).alias("clean_fp"),
    )


# --- Bloom-prefiltered blocklist join ----------------------------------------

BLOOM_M = 4096  # bits
BLOOM_K = 4  # hash functions


@query(
    "q_bloom_blocklist",
    oracle=f"""
WITH bad AS (
    SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 50 = 0
), seeds AS (
    SELECT CAST(s AS INTEGER) AS s
    FROM UNNEST(generate_series(0, {BLOOM_K - 1})) AS t(s)
), bits AS (
    SELECT DISTINCT
        ('0x' || substr(md5(CAST(s AS VARCHAR) || '_' || fp), 1, 8))::BIGINT
            % {BLOOM_M} AS bit
    FROM bad CROSS JOIN seeds
), docfp AS (
    SELECT doc_id, source, md5(text) AS fp FROM documents
), probed AS (
    SELECT d.doc_id, d.source, d.fp,
        CAST(COUNT(b.bit) AS INTEGER) AS hits
    FROM docfp d
    CROSS JOIN seeds s
    LEFT JOIN bits b
      ON ('0x' || substr(md5(CAST(s.s AS VARCHAR) || '_' || d.fp), 1, 8))::BIGINT
             % {BLOOM_M} = b.bit
    GROUP BY d.doc_id, d.source, d.fp
), flagged AS (
    SELECT p.doc_id, p.source,
        p.hits = {BLOOM_K} AS is_candidate,
        bad.fp IS NOT NULL AS is_blocked
    FROM probed p LEFT JOIN bad ON p.fp = bad.fp
)
SELECT source,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN is_blocked THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
    CAST(SUM(CASE WHEN is_candidate THEN 1 ELSE 0 END) AS BIGINT)
        AS n_bloom_candidates,
    CAST(SUM(CASE WHEN is_candidate AND NOT is_blocked THEN 1 ELSE 0 END)
        AS BIGINT) AS n_false_positives
FROM flagged GROUP BY source ORDER BY source""",
)
def q_bloom_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered blocklist audit — the LOSSLESS prefilter pattern
    (q_setsim_prefix_join's family) applied to membership joins: the
    blocklist compresses to a {BLOOM_M}-bit Bloom set (k={BLOOM_K}
    md5-derived positions per key), the corpus probes the BIT TABLE (at
    most {BLOOM_M} rows broadcast — bounded by m no matter how large the
    blocklist grows), and only bloom-candidates need the exact
    fingerprint verify join. Bloom-negatives are PROVABLY clean, so the
    expensive exact join shrinks to the candidate set; the emitted
    false-positive count is the knob-tuning readout (fp rate ~
    (1-e^(-kn/m))^k). Every hash is the repo's portable md5 bucket, so
    candidate sets — not just final verdicts — are bit-identical
    cross-engine, and the oracle checks the PREFILTER, not only the
    verify."""
    docs = load_table(spark, sf_dir, "documents")
    bad = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    seeds = spark.range(BLOOM_K).select(F.col("id").cast("int").alias("s"))

    def bit(fp_col, s_col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(s_col.cast("string"), F.lit("_"), fp_col)),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % BLOOM_M
        )

    bits = (
        bad.crossJoin(F.broadcast(seeds))
        .select(bit(F.col("fp"), F.col("s")).alias("bit"))
        .distinct()
    )
    docfp = docs.select("doc_id", "source", F.md5("text").alias("fp"))
    probed = (
        docfp.crossJoin(F.broadcast(seeds))
        .select("doc_id", "source", "fp", bit(F.col("fp"), F.col("s")).alias("bit"))
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "bit", "left")
        .groupBy("doc_id", "source", "fp")
        .agg(F.count("hit").cast("int").alias("hits"))
    )
    flagged = probed.join(
        F.broadcast(bad.withColumn("blocked", F.lit(1))), "fp", "left"
    ).select(
        "source",
        (F.col("hits") == BLOOM_K).alias("is_candidate"),
        F.col("blocked").isNotNull().alias("is_blocked"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("is_blocked").cast("int")).cast("bigint").alias("n_blocked"),
            F.sum(F.col("is_candidate").cast("int"))
            .cast("bigint")
            .alias("n_bloom_candidates"),
            F.sum((F.col("is_candidate") & ~F.col("is_blocked")).cast("int"))
            .cast("bigint")
            .alias("n_false_positives"),
        )
        .orderBy("source")
    )
