"""Text-analysis operators over the ``documents`` table (north-star
extensions, BASELINE.json: language-ID, quality scoring, token counting,
fingerprinting).

All hot-path logic is native ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Every operator is embarrassingly
parallel (per-row), so the 100 TB posture is simply "enough input
partitions"; nothing here shuffles except the histogram group-bys.

Dialect notes for the oracles: DuckDB LENGTH/len return BIGINT where
Spark returns INT (explicit casts); Spark ``split`` == DuckDB
``string_split``; both expose lambda higher-order functions
(filter/list_filter); md5() hex output is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

STOPWORDS = ("the", "a", "of", "and", "to", "in")
_STOP_SQL = "('" + "', '".join(STOPWORDS) + "')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def with_words(df: DataFrame) -> DataFrame:
    return df.withColumn("words", F.split(F.col("text"), " "))


@query(
    "q_text_stats",
    oracle=f"""
SELECT doc_id,
    CAST(LENGTH(text) AS INTEGER) AS n_chars_actual,
    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
    CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_words,
    CAST(len(list_filter(string_split(text, ' '), w -> w IN {_STOP_SQL})) AS INTEGER)
        AS n_stopwords
FROM documents""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: the building block for quality
    scoring. Pure narrow expressions."""
    df = with_words(_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        F.size("words").alias("n_words"),
        F.size(F.array_distinct("words")).alias("n_distinct_words"),
        F.size(F.filter(F.col("words"), lambda w: w.isin(*STOPWORDS))).alias("n_stopwords"),
    )


@query(
    "q_quality_score",
    oracle=f"""
WITH s AS (
    SELECT doc_id,
        len(string_split(text, ' ')) AS n_words,
        len(list_distinct(string_split(text, ' '))) AS n_distinct,
        len(list_filter(string_split(text, ' '), w -> w IN {_STOP_SQL})) AS n_stop
    FROM documents
)
SELECT doc_id,
    n_stop / n_words AS stopword_ratio,
    n_distinct / n_words AS distinct_ratio,
    LEAST(n_words / 100.0, 1.0) * 0.4
        + (1 - n_stop / n_words) * 0.3
        + n_distinct / n_words * 0.3 AS quality_score
FROM s""",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality score (length + lexical diversity +
    stopword balance) — the pre-training corpus filter pattern. Weights are
    illustrative; the operator shape (scored scan → threshold filter
    downstream) is what scales."""
    df = with_words(_docs(spark, sf_dir))
    n_words = F.size("words")
    n_stop = F.size(F.filter(F.col("words"), lambda w: w.isin(*STOPWORDS)))
    n_distinct = F.size(F.array_distinct("words"))
    stop_ratio = n_stop / n_words
    distinct_ratio = n_distinct / n_words
    return df.select(
        "doc_id",
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        (
            F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
            + (F.lit(1) - stop_ratio) * 0.3
            + distinct_ratio * 0.3
        ).alias("quality_score"),
    )


@query(
    "q_token_count",
    oracle="""
SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
    CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS re_tokens
FROM documents""",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex pass
    (both engines use the same '[a-z]+' pattern; Java regex and RE2 agree
    on this class of pattern)."""
    df = _docs(spark, sf_dir)
    return df.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)")).alias("re_tokens"),
    )


@query(
    "q_lang_id",
    oracle=f"""
WITH scored AS (
    SELECT doc_id, lang,
        len(list_filter(string_split(text, ' '), w -> w IN {_STOP_SQL})) AS en_hits,
        len(string_split(text, ' ')) AS n_words
    FROM documents
)
SELECT doc_id, lang,
    CASE WHEN en_hits / n_words >= 0.02 THEN 'en' ELSE 'unknown' END AS lang_pred
FROM scored""",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit-rate scoring (the classic
    dictionary n-gram approach). On this synthetic corpus every language
    shares one vocabulary, so the interesting part is the operator shape:
    per-row scoring against broadcastable dictionaries, one pass, no
    shuffle. Real corpora would carry per-language dictionaries in a
    broadcast map."""
    df = with_words(_docs(spark, sf_dir))
    en_hits = F.size(F.filter(F.col("words"), lambda w: w.isin(*STOPWORDS)))
    n_words = F.size("words")
    return df.select(
        "doc_id",
        "lang",
        F.when((en_hits / n_words) >= 0.02, "en").otherwise("unknown").alias("lang_pred"),
    )


@query(
    "q_fingerprint",
    oracle="""
SELECT doc_id,
    md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS fingerprint
FROM documents""",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whitespace-normalized lowercase md5 — the
    exact-dedup key (reference analogue: Mongo _id upsert key,
    db/mongodb.py:39-56). Note DuckDB regexp_replace needs the 'g' flag;
    Spark's is global by default."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.col("text")), " +", " ")).alias("fingerprint"),
    )


@query(
    "q_doc_length_hist",
    oracle="""
SELECT CAST(FLOOR(n_chars / 100) AS INTEGER) AS bucket, COUNT(*) AS n_docs
FROM documents GROUP BY 1""",
)
def q_doc_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length histogram — the profile-before-filter step of a
    training-data pipeline."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.floor(F.col("n_chars") / 100).cast("int").alias("bucket"))
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "q_udtf_chunks",
    oracle="""
SELECT doc_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s.i) - 1 AS INTEGER)
        AS sent_no,
    trim(s.sent) AS sentence,
    CAST(len(string_split(trim(s.sent), ' ')) AS INTEGER) AS n_words
FROM documents,
    LATERAL (SELECT unnest(string_split(text, '.')) AS sent,
                    generate_subscripts(string_split(text, '.'), 1) AS i) s
WHERE trim(s.sent) <> ''""",
)
def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (SURVEY §2.10 — the reference has none; this
    is the one table-function shape explode cannot express: multiple
    OUTPUT COLUMNS computed per emitted row from arbitrary Python).
    Splits each document into sentences and emits (sent_no, sentence,
    n_words) rows. UDTFs evaluate per-partition with no shuffle; the
    lateral join keeps the doc_id correlation. For pure single-column
    splits prefer explode(split(...)) (codegen); the UDTF is the escape
    hatch when the per-row expansion needs real Python."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="sent_no int, sentence string, n_words int")
    class SentenceSplit:
        def eval(self, text: str):
            n = 0
            for piece in (text or "").split("."):
                piece = piece.strip()
                if piece:
                    yield n, piece, len(piece.split(" "))
                    n += 1

    spark.udtf.register("sentence_split", SentenceSplit)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.sent_no, s.sentence, s.n_words "
        "FROM udtf_docs d, LATERAL sentence_split(d.text) s"
    )
