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
from ..sources.tables import load_table, spread_input

STOPWORDS = ("the", "a", "of", "and", "to", "in")
_STOP_SQL = "('" + "', '".join(STOPWORDS) + "')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def with_words(df: DataFrame) -> DataFrame:
    return df.withColumn("words", F.split(F.col("text"), " "))


# Heuristic quality score as a single expression, reusable by operators
# that rank docs by quality (q_quality_score, dedup keep-best): length
# saturation + stopword balance + lexical diversity.
QUALITY_EXPR_SQL = f"""LEAST(len(string_split(text, ' ')) / 100.0, 1.0) * 0.4
        + (1 - len(list_filter(string_split(text, ' '), w -> w IN {_STOP_SQL}))
            / len(string_split(text, ' '))) * 0.3
        + len(list_distinct(string_split(text, ' ')))
            / len(string_split(text, ' ')) * 0.3"""


def quality_score_col(words):
    """Spark twin of QUALITY_EXPR_SQL over a pre-split words array."""
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    n_distinct = F.size(F.array_distinct(words))
    return (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1) - n_stop / n_words) * 0.3
        + n_distinct / n_words * 0.3
    )


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
        quality_score_col(F.col("words")).alias("quality_score"),
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

    # useArrow: the one Python boundary in the registry crosses in Arrow
    # batches, not pickled rows — the repo-wide plan audit (r8) flagged
    # the default row-serialized BatchEvalPythonUDTF form
    @udtf(returnType="sent_no int, sentence string, n_words int", useArrow=True)
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


@query(
    "q_gopher_rules",
    oracle=f"""
WITH s AS (
    SELECT doc_id,
        len(string_split(text, ' ')) AS n_words,
        LENGTH(text) AS n_chars,
        len(list_filter(string_split(text, ' '), w -> w IN {_STOP_SQL})) AS n_stop,
        len(regexp_extract_all(text, '[^a-z ]')) AS n_symbols
    FROM documents
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
    ROUND((n_chars - (n_words - 1)) / CAST(n_words AS DOUBLE), 6)
        AS mean_word_len,
    CAST(n_stop AS BIGINT) AS n_stopwords,
    ROUND(n_symbols / CAST(n_chars AS DOUBLE), 6) AS symbol_ratio,
    (n_words BETWEEN 20 AND 10000)
        AND ((n_chars - (n_words - 1)) / CAST(n_words AS DOUBLE) BETWEEN 3 AND 10)
        AND n_stop >= 2
        AND n_symbols / CAST(n_chars AS DOUBLE) <= 0.1 AS keep
FROM s""",
)
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filter (Rae et al. 2021 §A1.1, public paper): the
    pre-training corpus gate built from cheap per-document statistics —
    word-count bounds, mean word length in [3, 10], minimum stopword
    evidence, and a symbol-ratio cap. Every rule is a narrow JVM
    expression over one row; at 100 TB this is a single scan with the
    keep-filter pushed into downstream reads (partition by `keep` on
    write to make the reject set auditable). Mean word length uses the
    identity (n_chars - (n_words - 1)) / n_words for single-space-joined
    text so both engines evaluate the identical formula."""
    df = with_words(_docs(spark, sf_dir))
    n_words = F.size("words")
    n_chars = F.length("text")
    n_stop = F.size(F.filter(F.col("words"), lambda w: w.isin(*STOPWORDS)))
    n_symbols = F.size(F.expr("regexp_extract_all(text, '[^a-z ]', 0)"))
    mean_wl = (n_chars - (n_words - F.lit(1))) / n_words.cast("double")
    symbol_ratio = n_symbols / n_chars.cast("double")
    return df.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        n_stop.cast("bigint").alias("n_stopwords"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        (
            n_words.between(20, 10000)
            & mean_wl.between(3, 10)
            & (n_stop >= 2)
            & (symbol_ratio <= 0.1)
        ).alias("keep"),
    )


@query(
    "q_repetition_ratio",
    oracle="""
WITH grams AS (
    SELECT doc_id, CONCAT(t[i], ' ', t[i + 1]) AS gram
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d,
        UNNEST(generate_series(1, len(t) - 1)) AS g(i)
),
counts AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2)
SELECT doc_id,
    CAST(SUM(c) AS BIGINT) AS total_grams,
    CAST(COUNT(*) AS BIGINT) AS distinct_grams,
    ROUND(1 - COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS dup_gram_ratio,
    ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_gram_frac
FROM counts GROUP BY doc_id""",
)
def q_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition statistics (the Gopher repetition
    filters): fraction of duplicated word-bigrams and the share of the
    most frequent bigram. Boilerplate/templated/looping documents light
    up on these.

    Two-level aggregation — (doc, gram) counts, then per-doc rollup; the
    only shuffle key is (doc_id, gram) with map-side partial counts, and
    the second aggregation reuses the first's partitioning on the
    doc_id prefix. Bigrams come from the same zip_with construction as
    the dedup shinglers (operators/dedup.py:bigram_col) — single-token
    docs yield zero grams and drop out in both engines."""
    from .dedup import bigram_col

    df = with_words(_docs(spark, sf_dir))
    counts = (
        df.select("doc_id", F.explode(bigram_col(F.col("words"))).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
    )
    total = F.sum("c")
    distinct = F.count("*")
    return counts.groupBy("doc_id").agg(
        total.cast("bigint").alias("total_grams"),
        distinct.cast("bigint").alias("distinct_grams"),
        F.round(F.lit(1) - distinct / total.cast("double"), 6).alias(
            "dup_gram_ratio"
        ),
        F.round(F.max("c") / total.cast("double"), 6).alias("top_gram_frac"),
    )


# --- boilerplate removal (CCNet/RefinedWeb-style line dedup) ----------------

BOILER_CHUNK_W = 10  # tokens per pseudo-line (fixture text has no newlines)
BOILER_MIN_DOCS = 2  # a chunk seen in >= this many distinct docs is boilerplate


def _boilerplate_sql(src: str = "documents", extra_ctes: str = "") -> str:
    """The chunk-frequency boilerplate-removal oracle over any (doc_id,
    text) relation ``src`` — shared by the fixture key and the Zipf twin
    (q_boilerplate_zipf). ``extra_ctes`` (if given, ending with a comma)
    prepends the CTEs that define ``src``."""
    return f"""
WITH {extra_ctes}toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM {src}),
chunks AS (
    SELECT doc_id, i AS chunk_idx,
        array_to_string(t[i * {BOILER_CHUNK_W} + 1 : i * {BOILER_CHUNK_W} + {BOILER_CHUNK_W}], ' ') AS chunk
    FROM toks,
        UNNEST(generate_series(0, CAST(ceil(len(t) / {BOILER_CHUNK_W}.0) AS BIGINT) - 1)) AS g(i)
),
freq AS (SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs FROM chunks GROUP BY chunk),
kept AS (
    SELECT c.doc_id, c.chunk_idx, c.chunk
    FROM chunks c JOIN freq f USING (chunk)
    WHERE f.ndocs < {BOILER_MIN_DOCS}
),
rebuilt AS (
    SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text,
        COUNT(*) AS n_chunks_kept
    FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
    COALESCE(r.clean_text, '') AS clean_text,
    CAST(COALESCE(r.n_chunks_kept, 0) AS BIGINT) AS n_chunks_kept,
    CAST(ceil(len(t.t) / {BOILER_CHUNK_W}.0) AS BIGINT) AS n_chunks_total
FROM toks t LEFT JOIN rebuilt r USING (doc_id)"""


@query("q_boilerplate_removal", oracle=_boilerplate_sql())
def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal, the CCNet/RefinedWeb "line-level dedup" pass:
    drop every pseudo-line (fixed 10-token chunk — fixture text carries no
    newlines) whose exact content appears in >= BOILER_MIN_DOCS distinct
    documents (headers, footers, license banners, nav chrome at web
    scale), then reassemble each document from its surviving chunks in
    order. The reference has no corpus-level text hygiene (its dedup is
    per-key upsert, extractor/riot/db/mongodb.py:52-56); this is a
    first-class pretraining-pipeline stage.

    Scale shape: chunking is a per-row generator (codegen explode); the
    frequency pass groups on the chunk string — at 100 TB swap the group
    key for xxhash64(chunk) (16-byte shuffle key, same semantics barring
    2^-64 collisions). The boilerplate set is usually tiny but NOT
    bounded (its cardinality grows with template farms / mirrored sites),
    so the membership join's broadcast decision is AQE's, on measured
    size; removal is an in-row filter over each doc's chunk array —
    DOCUMENT BODIES NEVER SHUFFLE; the only wide stage is the
    chunk-frequency aggregation."""
    return boilerplate_removal(_docs(spark, sf_dir))


def boilerplate_removal(
    docs: DataFrame,
    chunk_w: int = BOILER_CHUNK_W,
    min_docs: int = BOILER_MIN_DOCS,
) -> DataFrame:
    """Core of q_boilerplate_removal over any (doc_id, text) relation —
    input and thresholds pluggable so the hypothesis differential test
    drives the SHIPPED expression graph, not a replica.

    Membership testing happens in a HASH join of chunk rows against the
    boilerplate set (O(1) probes), producing the per-doc REMOVED chunk
    indices, which join back for an in-row filter by index. (A broadcast
    array + per-chunk array_contains scan is O(chunks x |boiler set|) and
    measured 2.2x slower at sf0.1.) The broadcast decision is left to AQE
    on the MEASURED post-aggregation size rather than forced with a hint:
    the set is usually small, but its cardinality is "distinct chunks
    repeated across >= min_docs docs", which grows with corpus size
    (template farms, mirrored sites) — an unconditional broadcast hint
    could OOM at exactly the web scale this module targets (ADVICE r4).
    AQE broadcasts it when it fits and shuffle-joins otherwise.

    Scale honesty on the join-back: the removed relation is tiny per row
    (doc_id + a few ints) but O(affected docs) rows; Spark broadcasts it
    while it fits and otherwise shuffle-joins — which would hash document
    bodies. At web scale, where most docs carry boilerplate, the
    zero-body-shuffle plan is storage-level: keep the corpus BUCKETED by
    doc_id (sources/warehouse.py::write_bucketed) so this join co-locates
    with no exchange on the doc side."""
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(chunk_w)))
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1),
        lambda i: F.array_join(F.slice(toks, i * chunk_w + 1, chunk_w), " "),
    )
    chunks = docs.select(
        "doc_id", F.posexplode(chunk_arr).alias("chunk_idx", "chunk")
    )
    boiler = (
        chunks.groupBy("chunk")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("chunk")
    )
    removed = (
        chunks.join(boiler, "chunk")
        .groupBy("doc_id")
        .agg(F.collect_set("chunk_idx").alias("rm"))
    )
    kept_arr = F.filter(
        chunk_arr, lambda c, i: ~F.array_contains(F.col("rm_safe"), i)
    )
    return (
        docs.join(removed, "doc_id", "left")
        .withColumn(
            "rm_safe",
            F.coalesce(F.col("rm"), F.expr("array()").cast("array<int>")),
        )
        .select(
            "doc_id",
            F.array_join(kept_arr, " ").alias("clean_text"),
            F.size(kept_arr).cast("bigint").alias("n_chunks_kept"),
            n_chunks.cast("bigint").alias("n_chunks_total"),
        )
    )


# --- BM25 lexical retrieval -------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 5
# Literal query workload: one row per (query_id, term). At production size
# this is a real (small) table that broadcasts, exactly like here.
BM25_QUERIES = (
    ("q1", "spark"), ("q1", "window"), ("q1", "agg"),
    ("q2", "dup"), ("q2", "merge"),
    ("q3", "fast"), ("q3", "scan"), ("q3", "table"),
)


def _bm25_queries_sql() -> str:
    rows = ", ".join(f"('{q}', '{t}')" for q, t in BM25_QUERIES)
    return f"(VALUES {rows}) AS q(query_id, term)"


@query(
    "q_bm25_topk",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tf AS (
    SELECT doc_id, dl, term, COUNT(*) AS tf
    FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks)
    GROUP BY doc_id, dl, term
),
stats AS (SELECT COUNT(*) AS n_docs, AVG(len(t)) AS avgdl FROM toks),
qterms AS (SELECT DISTINCT query_id, term FROM {_bm25_queries_sql()}),
df_ AS (
    SELECT tf.term, COUNT(*) AS df
    FROM tf JOIN (SELECT DISTINCT term FROM qterms) qt ON tf.term = qt.term
    GROUP BY tf.term
),
scored AS (
    SELECT q.query_id, tf.doc_id,
        ROUND(SUM(
            LN(1.0 + (s.n_docs - df_.df + 0.5) / (df_.df + 0.5))
            * tf.tf * ({BM25_K1} + 1.0)
            / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
        ), 6) AS score
    FROM qterms q
    JOIN tf ON tf.term = q.term
    JOIN df_ ON df_.term = q.term
    CROSS JOIN stats s
    GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, doc_id, score,
    CAST(rnk AS INTEGER) AS rank
FROM (
    SELECT query_id, doc_id, score,
        ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id
        ) AS rnk
    FROM scored
)
WHERE rnk <= {BM25_TOPK}""",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k lexical retrieval (Robertson & Zaragoza 2009; the
    Okapi BM25 used by Lucene/Elasticsearch and by LLM-corpus quality /
    decontamination tooling for query-side retrieval):

        score(q, d) = sum over t in q of
            IDF(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)),
        IDF(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   (Lucene's form,
        always positive).

    Scale shape — read the corpus once, shuffle ONLY queried postings:
    the broadcast left-semi term filter sits BETWEEN the token
    generator and the (doc, term) aggregation, so the tf shuffle
    carries only occurrences of queried terms — the moral equivalent of
    reading posting lists off an inverted index rather than building
    the whole index per query (r7: pruning after the full-corpus tf
    aggregation measured 13.0 s at the 10x tier; pruning before it,
    1.96 s — scan-bound, ratio ~1.1x at 10x data). The pruned postings
    are materialized with a lazy localCheckpoint because the two
    consumers (per-term df, per-(query,doc) scoring) prune different
    columns, which stops Spark reusing the exchange. df is a
    map-side-combined aggregation over the postings, broadcast back —
    NOT a window keyed by term, whose count frame would colocate a
    common term's entire posting list in one task (the skew that kills
    stopword-ish terms at scale); corpus stats (N, avgdl) are a 1-row
    broadcast over a narrow scan. Per-query ranking partitions its
    window by query_id, so top-k never funnels through a single task.
    A batch-of-thousands query workload amortizes the same plan: the
    semi-join filter keeps every queried term's postings, and at 100 TB
    the materialized postings become the bucketed-by-term tf table on
    disk."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    qterms = spark.createDataFrame(
        sorted(set(BM25_QUERIES)), "query_id string, term string"
    )
    qdistinct = qterms.select("term").distinct()
    # prune BEFORE the (doc, term) aggregation: the broadcast left-semi
    # term filter sits between the generator and the shuffle, so only
    # query-term occurrences ever shuffle — at corpus scale that is the
    # difference between shuffling every token and shuffling the handful
    # of queried posting lists (r7: the 10x tier flagged the full-tf
    # form as the most expensive tier query; term counts per (doc, term)
    # are unaffected, so results and oracle are unchanged)
    tf = (
        docs.select(
            "doc_id",
            F.size(toks).alias("dl"),
            F.explode(toks).alias("term"),
        )
        .join(F.broadcast(qdistinct), "term", "left_semi")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    stats = docs.select(F.size(toks).alias("dl")).agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    postings = tf.localCheckpoint(eager=False)
    # postings rows are unique per (doc, term): df = row count per term,
    # map-side combined over the materialized postings
    df_ = postings.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.sum(idf * F.col("tf") * (BM25_K1 + 1.0) / norm), 6
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query_id", "doc_id", "score", "rank")
    )


# --- PMI collocations ------------------------------------------------------

PMI_MIN_COUNT = 5
PMI_TOPK = 50


@query(
    "q_collocations",
    oracle=f"""
WITH ws AS (
    SELECT string_split(text, ' ') AS w FROM documents
), bigrams AS (
    SELECT w[CAST(t.i AS INTEGER)] AS word_a,
           w[CAST(t.i AS INTEGER) + 1] AS word_b
    FROM ws, UNNEST(range(1, len(w))) AS t(i)
), uni AS (
    SELECT word, COUNT(*) AS c FROM (
        SELECT unnest(w) AS word FROM ws
    ) GROUP BY word
), bg AS (
    SELECT word_a, word_b, COUNT(*) AS c_ab FROM bigrams GROUP BY 1, 2
), tot AS (
    SELECT (SELECT SUM(c) FROM uni) AS n_words,
           (SELECT SUM(c_ab) FROM bg) AS n_bigrams
)
SELECT word_a, word_b, c_ab,
    ROUND(LN((c_ab / n_bigrams) / ((ua.c / n_words) * (ub.c / n_words))), 6)
        AS pmi
FROM bg
JOIN uni ua ON bg.word_a = ua.word
JOIN uni ub ON bg.word_b = ub.word
CROSS JOIN tot
WHERE c_ab >= {PMI_MIN_COUNT}
ORDER BY pmi DESC, word_a, word_b
LIMIT {PMI_TOPK}""",
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k collocations by pointwise mutual information over adjacent
    word pairs — the classic association-mining pass (Church & Hanks
    1990) a corpus-analysis pipeline runs to find multi-word expressions
    worth protecting from tokenization splits.

    Plan shape (100 TB): bigrams explode in-row (no self-join — the pair
    relation is adjacency, linear in corpus size); one shuffle counts
    bigrams, one counts unigrams; the unigram frame joins back twice on
    the word key (broadcastable while the vocabulary fits, shuffled
    hash-join beyond); totals ride a broadcast single-row frame; the
    final top-k is TakeOrderedAndProject, never a global sort. PMI is
    ordered on its ROUNDED value with a lexicographic tie-break so the
    cutoff is deterministic across engines."""
    docs = with_words(_docs(spark, sf_dir))
    words = F.col("words")
    bigrams = docs.select(
        F.explode(
            F.expr(
                "transform(slice(words, 1, size(words) - 1),"
                " (x, i) -> struct(x AS word_a, element_at(words, i + 2) AS word_b))"
            )
        ).alias("p")
    ).select("p.word_a", "p.word_b")
    uni = (
        docs.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    bg = bigrams.groupBy("word_a", "word_b").agg(F.count("*").alias("c_ab"))
    tot = uni.agg(F.sum("c").alias("n_words")).crossJoin(
        bg.agg(F.sum("c_ab").alias("n_bigrams"))
    )
    ua = uni.select(F.col("word").alias("word_a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("word").alias("word_b"), F.col("c").alias("cb"))
    pmi = F.round(
        F.log(
            (F.col("c_ab") / F.col("n_bigrams"))
            / ((F.col("ca") / F.col("n_words")) * (F.col("cb") / F.col("n_words")))
        ),
        6,
    )
    return (
        bg.filter(F.col("c_ab") >= PMI_MIN_COUNT)
        .join(ua, "word_a")
        .join(ub, "word_b")
        .crossJoin(F.broadcast(tot))
        .select("word_a", "word_b", "c_ab", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "word_a", "word_b")
        .limit(PMI_TOPK)
    )


KL_SMOOTH = 0.5  # add-half smoothing over the shared vocabulary


@query(
    "q_source_kl",
    oracle=f"""
WITH tok AS (
    SELECT source, w.w AS word
    FROM documents, UNNEST(string_split(text, ' ')) AS w(w)
    WHERE w.w <> ''
), vocab AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS c_all FROM tok GROUP BY word
), vn AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS v, CAST(SUM(c_all) AS BIGINT) AS n_all
    FROM vocab
), src AS (
    SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c_src FROM tok GROUP BY 1, 2
), sn AS (
    SELECT source, CAST(SUM(c_src) AS BIGINT) AS n_src FROM src GROUP BY source
), terms AS (
    SELECT s.source,
        (COALESCE(sc.c_src, 0) + {KL_SMOOTH}) / (sn.n_src + {KL_SMOOTH} * vn.v)
            AS p,
        (v.c_all + {KL_SMOOTH}) / (vn.n_all + {KL_SMOOTH} * vn.v) AS q
    FROM (SELECT DISTINCT source FROM documents) s
    CROSS JOIN vocab v CROSS JOIN vn
    JOIN sn ON sn.source = s.source
    LEFT JOIN src sc ON sc.source = s.source AND sc.word = v.word
)
SELECT source, ROUND(SUM(p * LN(p / q)), 6) AS kl_divergence
FROM terms GROUP BY source""",
)
def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence of the unigram distribution from the
    corpus-wide distribution (add-half smoothing over the shared vocab) —
    the domain-drift / mixture-diagnostic number behind data-mixing
    decisions (which sources are distributionally far from the blend the
    model actually trains on). Fully oracled.

    Scale shape: ONE pass over the exploded token stream feeds both
    count tables (per-word corpus counts; per-(source, word) counts —
    same exchange key family); totals are one-row aggregates that
    broadcast back. The per-source sum then runs over the (source x
    vocab) grid — vocab-bounded, corpus-size-independent, and the grid
    join is vocab-keyed (both sides hash-partitioned on word), with the
    missing-word smoothing mass handled by the LEFT JOIN + COALESCE
    rather than densifying anything row-wise. At web vocab (10^8 words x
    10 sources) the grid is ~10^9 16-byte rows — a routine shuffle,
    vs the corpus's 10^12 tokens."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    vocab = tok.groupBy("word").agg(F.count("*").cast("bigint").alias("c_all"))
    vn = vocab.agg(
        F.count("*").cast("bigint").alias("v"),
        F.sum("c_all").cast("bigint").alias("n_all"),
    )
    src = tok.groupBy("source", "word").agg(
        F.count("*").cast("bigint").alias("c_src")
    )
    sn = src.groupBy("source").agg(F.sum("c_src").cast("bigint").alias("n_src"))
    sources = docs.select("source").distinct()
    grid = sources.crossJoin(vocab).crossJoin(F.broadcast(vn)).join(
        F.broadcast(sn), "source"
    )
    terms = grid.join(src, ["source", "word"], "left").select(
        "source",
        (
            (F.coalesce(F.col("c_src"), F.lit(0)) + KL_SMOOTH)
            / (F.col("n_src") + KL_SMOOTH * F.col("v"))
        ).alias("p"),
        (
            (F.col("c_all") + KL_SMOOTH) / (F.col("n_all") + KL_SMOOTH * F.col("v"))
        ).alias("q"),
    )
    return terms.groupBy("source").agg(
        F.round(F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6).alias(
            "kl_divergence"
        )
    )


RRF_K = 60  # the standard reciprocal-rank-fusion constant
RRF_TOPK = 50


@query(
    "q_rank_fusion",
    oracle=f"""
WITH ranked AS (
    SELECT doc_id,
        ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r1,
        ROW_NUMBER() OVER (ORDER BY len(string_split(text, ' ')) DESC, doc_id)
            AS r2
    FROM documents
)
SELECT doc_id, CAST(r1 AS BIGINT) AS rank_chars, CAST(r2 AS BIGINT) AS rank_tokens,
    ROUND(1.0 / ({RRF_K} + r1) + 1.0 / ({RRF_K} + r2), 6) AS rrf_score
FROM ranked
ORDER BY rrf_score DESC, doc_id
LIMIT {RRF_TOPK}""",
)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank fusion (Cormack et al., SIGIR'09) of two document
    rankings — THE standard way hybrid retrieval merges lexical and
    vector result lists without score calibration: fused = sum over
    rankers of 1/(k + rank), k = {RRF_K}. Here the two deterministic
    rankers are char-length and token-length; in production they are the
    BM25 list (q_bm25_topk) and the ANN list (q_similarity_topk), fused
    per query group by adding PARTITION BY query to the windows.

    Scale: each ranking is a row_number window (per query group in the
    real setting — no global sort at scale); the fusion is a pure
    projection and the cut is TakeOrderedAndProject."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    nw = F.size(F.split("text", " "))
    r1 = F.row_number().over(Window.orderBy(F.desc("n_chars"), "doc_id"))
    r2 = F.row_number().over(Window.orderBy(nw.desc(), F.col("doc_id")))
    ranked = docs.select(
        "doc_id", r1.cast("bigint").alias("rank_chars"), r2.cast("bigint").alias("rank_tokens")
    )
    rrf = F.round(
        1.0 / (RRF_K + F.col("rank_chars")) + 1.0 / (RRF_K + F.col("rank_tokens")), 6
    )
    return (
        ranked.select("doc_id", "rank_chars", "rank_tokens", rrf.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(RRF_TOPK)
    )


# Hybrid retrieval (q_rank_fusion's "in production" claim, registered):
# query docs retrieve over the COMMON corpus (documents with an aligned
# embedding, vec_id = doc_id) through BOTH rankers — BM25 with the query
# doc's own distinct terms as the lexical query (more-like-this), and
# brute-force cosine as the dense ranker — each list cut at top
# HYBRID_TOPK, then RRF-fused. Constants are the hybrid workload's own
# (they happen to equal the single-ranker keys' N_QUERIES/TOPK today,
# but the workloads are independently tunable).
HYBRID_QUERIES = 5   # doc_id < 5 are the query documents
HYBRID_TOPK = 10     # per-ranker list cut AND final fused cut


def _hybrid_rrf_oracle() -> str:
    return f"""
WITH emb AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
        sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS vnorm
    FROM embeddings
),
emb_d AS (
    SELECT e.* FROM emb e JOIN documents d ON e.vec_id = d.doc_id
),
dense AS (
    SELECT query_id, doc_id, CAST(rnk AS INTEGER) AS dense_rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
            ROW_NUMBER() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_dot_product(q.vec, c.vec) / (q.vnorm * c.vnorm) DESC,
                    c.vec_id
            ) AS rnk
        FROM emb_d q, emb_d c
        WHERE q.vec_id < {HYBRID_QUERIES} AND c.vec_id <> q.vec_id
    ) t WHERE rnk <= {HYBRID_TOPK}
),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
tf AS (
    SELECT doc_id, dl, term, COUNT(*) AS tf
    FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks)
    GROUP BY doc_id, dl, term
),
stats AS (SELECT COUNT(*) AS n_docs, AVG(len(t)) AS avgdl FROM toks),
hqterms AS (
    SELECT DISTINCT doc_id AS query_id, term
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents WHERE doc_id < {HYBRID_QUERIES})
),
hdf AS (
    SELECT tf.term, COUNT(*) AS df
    FROM tf JOIN (SELECT DISTINCT term FROM hqterms) qt ON tf.term = qt.term
    GROUP BY tf.term
),
lex_scored AS (
    SELECT q.query_id, tf.doc_id,
        ROUND(SUM(
            LN(1.0 + (s.n_docs - hdf.df + 0.5) / (hdf.df + 0.5))
            * tf.tf * ({BM25_K1} + 1.0)
            / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
        ), 6) AS score
    FROM hqterms q
    JOIN tf ON tf.term = q.term
    JOIN hdf ON hdf.term = q.term
    CROSS JOIN stats s
    WHERE tf.doc_id <> q.query_id
    GROUP BY q.query_id, tf.doc_id
),
lex AS (
    SELECT query_id, doc_id, CAST(rnk AS INTEGER) AS lex_rank FROM (
        SELECT query_id, doc_id,
            ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY score DESC, doc_id
            ) AS rnk
        FROM lex_scored
    ) t WHERE rnk <= {HYBRID_TOPK}
),
fused AS (
    SELECT COALESCE(l.query_id, d.query_id) AS query_id,
        COALESCE(l.doc_id, d.doc_id) AS doc_id,
        l.lex_rank, d.dense_rank,
        COALESCE(1.0 / ({RRF_K} + l.lex_rank), 0.0)
            + COALESCE(1.0 / ({RRF_K} + d.dense_rank), 0.0) AS rrf_raw
    FROM lex l
    FULL OUTER JOIN dense d
        ON l.query_id = d.query_id AND l.doc_id = d.doc_id
)
SELECT query_id, doc_id, lex_rank, dense_rank,
    ROUND(rrf_raw, 6) AS rrf_score, CAST(frk AS INTEGER) AS fused_rank
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY rrf_raw DESC, doc_id
    ) AS frk
    FROM fused
) t WHERE frk <= {HYBRID_TOPK}"""


@query("q_hybrid_rrf", oracle=_hybrid_rrf_oracle())
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion — the production
    form q_rank_fusion's docstring promised: each query document
    (doc_id < HYBRID_QUERIES) retrieves over the common corpus
    (documents with an aligned embedding, vec_id = doc_id) through BOTH
    production rankers, and the two top-HYBRID_TOPK lists are RRF-fused
    (Cormack et al., SIGIR'09: fused = sum of 1/(RRF_K + rank) over the
    lists that contain the candidate; absent = contributes 0).

      - lexical: the q_bm25_topk scoring graph with the query doc's own
        DISTINCT terms as the query (more-like-this retrieval) — same
        pruned-postings shape: the broadcast left-semi term filter sits
        between the token generator and the tf shuffle, so only query
        terms' postings ever shuffle; ranks on the ROUNDED score
        (doc_id tie-break), the proven cross-engine discipline;
      - dense: the q_similarity_topk brute-force cosine graph restricted
        to embedded documents — broadcast query block, one corpus scan,
        per-query rank window, raw-cosine ordering (hash-proven stable).

    The fusion itself is rank arithmetic on INTEGER ranks (1/(60+r):
    bit-identical across engines), so the fused ordering carries no new
    FP-boundary exposure; the full-outer join of two top-k lists is
    ~queries x 2k rows — driver-free, broadcastable, trivially
    shuffled. Scale: both ranker plans are the registered keys' (their
    100 TB postures documented there); the fusion adds one outer join
    and one rank window at per-query top-k grain, negligible at any
    corpus size. A batched query workload (thousands of query docs)
    amortizes identically — every stage is keyed on query_id."""
    from pyspark.sql import Window

    from .similarity import dot, embeddings_d

    docs = _docs(spark, sf_dir)
    doc_ids = docs.select("doc_id")

    # dense ranker over the common corpus
    emb = embeddings_d(spark, sf_dir).join(
        F.broadcast(doc_ids.withColumnRenamed("doc_id", "vec_id")),
        "vec_id",
        "left_semi",
    )
    q = emb.filter(F.col("vec_id") < HYBRID_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
    )
    cosine = dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("vnorm"))
    wd = Window.partitionBy("query_id").orderBy(F.desc("raw_cosine"), "doc_id")
    dense = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("doc_id"), cosine.alias("raw_cosine"))
        .withColumn("dense_rank", F.row_number().over(wd).cast("int"))
        .filter(F.col("dense_rank") <= HYBRID_TOPK)
        .select("query_id", "doc_id", "dense_rank")
    )

    # lexical ranker: BM25 with the query docs' distinct terms
    toks = F.split(F.col("text"), " ")
    hqterms = (
        docs.filter(F.col("doc_id") < HYBRID_QUERIES)
        .select(F.col("doc_id").alias("query_id"), F.explode(toks).alias("term"))
        .distinct()
    )
    tf = (
        docs.select(
            "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("term")
        )
        .join(F.broadcast(hqterms.select("term").distinct()), "term", "left_semi")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    stats = docs.select(F.size(toks).alias("dl")).agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hdf = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    wl = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    lex = (
        F.broadcast(hqterms)
        .join(tf, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(hdf), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * F.col("tf") * (BM25_K1 + 1.0) / norm), 6).alias("score"))
        .withColumn("lex_rank", F.row_number().over(wl).cast("int"))
        .filter(F.col("lex_rank") <= HYBRID_TOPK)
        .select("query_id", "doc_id", "lex_rank")
    )

    # RRF fusion of the two top-k lists (integer-rank arithmetic only)
    rrf_raw = F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0)) + F.coalesce(
        1.0 / (RRF_K + F.col("dense_rank")), F.lit(0.0)
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_raw"), "doc_id")
    return (
        lex.join(dense, ["query_id", "doc_id"], "full_outer")
        .withColumn("rrf_raw", rrf_raw)
        .withColumn("fused_rank", F.row_number().over(wf).cast("int"))
        .filter(F.col("fused_rank") <= HYBRID_TOPK)
        .select(
            "query_id",
            "doc_id",
            "lex_rank",
            "dense_rank",
            F.round("rrf_raw", 6).alias("rrf_score"),
            "fused_rank",
        )
    )


@query(
    "q_zipf_fit",
    oracle="""
WITH vocab AS (
    SELECT word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
), ranked AS (
    SELECT freq,
        ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rank
    FROM vocab
)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
    CAST(SUM(freq) AS BIGINT) AS n_tokens,
    ROUND(regr_slope(LN(freq), LN(rank)), 6) AS zipf_slope,
    ROUND(regr_r2(LN(freq), LN(rank)), 6) AS r2
FROM ranked""",
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: OLS slope of
    log(freq) ~ log(rank) plus R^2 — the one-row corpus-health readout
    (natural text sits near slope -1; scraped boilerplate, synthetic
    spam, or a broken tokenizer all bend the curve and show up as a
    slope/R^2 shift between snapshots).

    regr_slope/regr_r2 are single-pass sufficient-statistic aggregates
    in both engines. Scale: one token shuffle with map-side combine to
    the vocab rollup; the rank window orders the VOCABULARY (bounded by
    distinct words, corpus-size-independent), never the token stream."""
    from pyspark.sql import Window

    vocab = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    ranked = vocab.select(
        "freq",
        F.row_number()
        .over(Window.orderBy(F.desc("freq"), "word"))
        .alias("rank"),
    )
    lf, lr = F.log(F.col("freq")), F.log(F.col("rank"))
    return ranked.agg(
        F.count("*").cast("bigint").alias("vocab_size"),
        F.sum("freq").cast("bigint").alias("n_tokens"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"),
    )


@query(
    "q_js_divergence",
    oracle=f"""
WITH tok AS (
    SELECT source, w.w AS word
    FROM documents, UNNEST(string_split(text, ' ')) AS w(w)
    WHERE w.w <> ''
), vocab AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS c_all FROM tok GROUP BY word
), vn AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS v, CAST(SUM(c_all) AS BIGINT) AS n_all
    FROM vocab
), src AS (
    SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c_src FROM tok GROUP BY 1, 2
), sn AS (
    SELECT source, CAST(SUM(c_src) AS BIGINT) AS n_src FROM src GROUP BY source
), terms AS (
    SELECT s.source,
        (COALESCE(sc.c_src, 0) + {KL_SMOOTH}) / (sn.n_src + {KL_SMOOTH} * vn.v)
            AS p,
        (v.c_all + {KL_SMOOTH}) / (vn.n_all + {KL_SMOOTH} * vn.v) AS q
    FROM (SELECT DISTINCT source FROM documents) s
    CROSS JOIN vocab v CROSS JOIN vn
    JOIN sn ON sn.source = s.source
    LEFT JOIN src sc ON sc.source = s.source AND sc.word = v.word
)
SELECT source,
    ROUND(0.5 * SUM(p * LN(p / ((p + q) / 2)))
          + 0.5 * SUM(q * LN(q / ((p + q) / 2))), 6) AS js_divergence,
    ROUND((0.5 * SUM(p * LN(p / ((p + q) / 2)))
           + 0.5 * SUM(q * LN(q / ((p + q) / 2)))) / LN(2), 6) AS js_bits
FROM terms GROUP BY source""",
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution
    from the corpus blend — q_source_kl's SYMMETRIC, bounded companion
    (JS is finite even on disjoint support and js_bits lives in [0,1],
    so sources are comparable on an absolute scale — the number data-
    mixing dashboards actually plot). Same add-half smoothing and the
    same (source x vocab) grid shape as q_source_kl: one pass over the
    exploded token stream, vocab-keyed grid join, missing-word mass via
    LEFT JOIN + COALESCE, never row-wise densification."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    vocab = tok.groupBy("word").agg(F.count("*").cast("bigint").alias("c_all"))
    vn = vocab.agg(
        F.count("*").cast("bigint").alias("v"),
        F.sum("c_all").cast("bigint").alias("n_all"),
    )
    src = tok.groupBy("source", "word").agg(
        F.count("*").cast("bigint").alias("c_src")
    )
    sn = src.groupBy("source").agg(F.sum("c_src").cast("bigint").alias("n_src"))
    sources = docs.select("source").distinct()
    grid = sources.crossJoin(vocab).crossJoin(F.broadcast(vn)).join(
        F.broadcast(sn), "source"
    )
    terms = grid.join(src, ["source", "word"], "left").select(
        "source",
        (
            (F.coalesce(F.col("c_src"), F.lit(0)) + KL_SMOOTH)
            / (F.col("n_src") + KL_SMOOTH * F.col("v"))
        ).alias("p"),
        (
            (F.col("c_all") + KL_SMOOTH) / (F.col("n_all") + KL_SMOOTH * F.col("v"))
        ).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    js = 0.5 * F.sum(F.col("p") * F.log(F.col("p") / m)) + 0.5 * F.sum(
        F.col("q") * F.log(F.col("q") / m)
    )
    import math as _math

    return terms.groupBy("source").agg(
        F.round(js, 6).alias("js_divergence"),
        F.round(js / _math.log(2), 6).alias("js_bits"),
    )


@query(
    "q_token_entropy",
    oracle="""
WITH tok AS (
    SELECT doc_id, w.w AS word
    FROM documents, UNNEST(string_split(text, ' ')) AS w(w)
    WHERE w.w <> ''
), tc AS (
    SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
), d AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        CAST(COUNT(*) AS BIGINT) AS n_types, SUM(c * LN(c)) AS slc
    FROM tc GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_types,
    ROUND(LN(n_tokens) - slc / n_tokens, 6) AS entropy,
    ROUND(n_types * 1.0 / n_tokens, 6) AS ttr
FROM d""",
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy + type-token ratio — the
    lexical-diversity quality signals (low entropy flags template/spam
    pages that length and stopword ratios miss; used alongside
    q_repetition_ratio in curation filters). Uses the identity
    H = ln(n) - (1/n) * sum(c * ln c), so the per-(doc, word) rollup is
    the ONLY state — no per-row probability materialization.

    Scale: one token explode + one (doc_id, word) groupBy — the exact
    exchange shape q_tfidf already runs; the per-doc reduce is keyed by
    doc_id, so everything partial-aggregates map-side."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    tc = tok.groupBy("doc_id", "word").agg(
        F.count("*").cast("bigint").alias("c")
    )
    d = tc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_types"),
        F.sum(F.col("c") * F.log("c")).alias("slc"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.round(
            F.log("n_tokens") - F.col("slc") / F.col("n_tokens"), 6
        ).alias("entropy"),
        F.round(F.col("n_types") * 1.0 / F.col("n_tokens"), 6).alias("ttr"),
    )


@query(
    "q_heaps_fit",
    oracle="""
WITH tok AS (
    SELECT source, w.w AS word
    FROM documents, UNNEST(string_split(text, ' ')) AS w(w)
    WHERE w.w <> ''
), per_src AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(COUNT(DISTINCT word) AS BIGINT) AS vocab
    FROM tok GROUP BY source
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
    ROUND(regr_slope(LN(vocab), LN(n_tokens)), 6) AS heaps_beta,
    ROUND(EXP(regr_intercept(LN(vocab), LN(n_tokens))), 6) AS heaps_k,
    -- degenerate-fit guard (r10 sweep forensics): when the fixture's
    -- 31-word vocabulary saturates, vocab is CONSTANT across sources and
    -- DuckDB's regr_r2 becomes noise/noise (sum-of-squares cancellation;
    -- its value varied run-to-run: 1.0 vs 0.086872 at sf0.1). Spark's
    -- Welford-style syy is exactly 0 there and its regr_r2 returns 1.0
    -- deterministically, so pin the exact constant-y case to 1.0; the
    -- MIN = MAX comparison is exact double equality in both engines.
    ROUND(CASE WHEN MIN(LN(vocab)) = MAX(LN(vocab)) THEN 1.0
          ELSE regr_r2(LN(vocab), LN(n_tokens)) END, 6) AS r2
FROM per_src""",
)
def q_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V = K * N^beta across sources (log-log OLS of
    vocabulary size on token count, one point per source) — the
    vocabulary-growth model that sizes tokenizer vocab and predicts how
    many NEW types the next shard of a 100 TB corpus will add (natural
    text: beta ~ 0.4-0.6; beta near 1 flags id-like/synthetic junk).
    Companion to q_zipf_fit, which fits the rank side of the same law.

    Scale: one pass over the exploded token stream into a per-(source,
    word) distinct + per-source count — the q_source_kl exchange family;
    the regression consumes |sources| points via builtin regr_* partial
    aggregates."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    per_src = tok.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.count_distinct("word").cast("bigint").alias("vocab"),
    )
    lv, ln_ = F.log("vocab"), F.log("n_tokens")
    return per_src.agg(
        F.count("*").cast("bigint").alias("n_sources"),
        F.round(F.regr_slope(lv, ln_), 6).alias("heaps_beta"),
        F.round(F.exp(F.regr_intercept(lv, ln_)), 6).alias("heaps_k"),
        F.round(F.regr_r2(lv, ln_), 6).alias("r2"),
    )


@query(
    "q_readability",
    oracle="""
WITH s AS (
    SELECT doc_id,
        CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
            AS BIGINT) AS n_words,
        CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
            AS BIGINT) AS n_sentences,
        CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
            AS BIGINT) AS n_syllables
    FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
    ROUND(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
          - 84.6 * (n_syllables * 1.0 / n_words), 4) AS flesch
FROM s""",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the classic curation-filter
    readability score, with the standard cheap proxies: syllables =
    vowel-group runs (a run never crosses a space, so one corpus-wide
    regex count equals the per-word sum), sentences = terminal-
    punctuation runs clamped to >= 1 (the synthetic fixture has no
    punctuation, so every doc honestly scores as one long sentence —
    documented degeneracy, not a bug; real corpora exercise the count).
    Both engines run the same character-class regexes (Java regex and
    RE2 agree on these).

    Scale: pure narrow per-row expressions — whole-stage codegen, no
    exchange at all."""
    df = _docs(spark, sf_dir)
    n_words = F.size(
        F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    ).cast("bigint")
    n_sent = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    ).cast("bigint")
    n_syl = F.size(
        F.expr("regexp_extract_all(text, '[aeiouyAEIOUY]+', 0)")
    ).cast("bigint")
    out = df.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syl.alias("n_syllables"),
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            206.835
            - 1.015 * (F.col("n_words") * 1.0 / F.col("n_sentences"))
            - 84.6 * (F.col("n_syllables") * 1.0 / F.col("n_words")),
            4,
        ).alias("flesch"),
    )


# --- lexical diversity --------------------------------------------------------


@query(
    "q_lexical_diversity",
    oracle="""
WITH per_doc AS (
    SELECT doc_id, source,
        len(list_distinct(string_split(text, ' '))) * 1.0
            / len(string_split(text, ' ')) AS ttr
    FROM documents
), wcount AS (
    SELECT source, w AS word, CAST(COUNT(*) AS BIGINT) AS c
    FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY source, w
)
SELECT p.source,
    CAST(COUNT(DISTINCT p.doc_id) AS BIGINT) AS n_docs,
    ROUND(AVG(p.ttr), 6) AS avg_ttr,
    MAX(v.vocab) AS vocab_size,
    ROUND(MAX(v.hapax_share), 6) AS hapax_share
FROM per_doc p
JOIN (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
        AVG(CASE WHEN c = 1 THEN 1.0 ELSE 0.0 END) AS hapax_share
    FROM wcount GROUP BY source
) v ON p.source = v.source
GROUP BY p.source ORDER BY p.source""",
)
def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity profile per source: mean type-token ratio (a
    per-doc ARRAY expression — array_distinct/size inside codegen, no
    explode), vocabulary size, and hapax share (fraction of the source's
    vocabulary occurring exactly once — high hapax = rich or noisy,
    near-zero = templated). The repetition/quality family's
    vocabulary-level complement to q_token_entropy and
    q_repetition_ratio. One word-explode groupBy for the vocab rollup
    (word-keyed, partial-agg), one broadcast join of the k-row source
    profile back to the per-doc TTR aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    per_doc = docs.select(
        "doc_id",
        "source",
        (F.size(F.array_distinct(words)) * 1.0 / F.size(words)).alias("ttr"),
    )
    wcount = (
        docs.select("source", F.explode(words).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    vocab = wcount.groupBy("source").agg(
        F.count("*").cast("bigint").alias("vocab_size"),
        F.avg(F.when(F.col("c") == 1, 1.0).otherwise(0.0)).alias("hapax_share"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.round(F.avg("ttr"), 6).alias("avg_ttr"),
        )
        .join(F.broadcast(vocab), "source")
        .select(
            "source",
            "n_docs",
            "avg_ttr",
            "vocab_size",
            F.round("hapax_share", 6).alias("hapax_share"),
        )
        .orderBy("source")
    )


# --- RAKE keyword extraction --------------------------------------------------

RAKE_TOP = 25


@query(
    "q_rake_keywords",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, i AS pos, t[i] AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d,
        UNNEST(generate_series(1, len(t))) AS g(i)
), content AS (
    SELECT doc_id, pos, word,
        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
    FROM toks WHERE word NOT IN {_STOP_SQL}
), phrase_rows AS (
    SELECT doc_id, grp, word,
        CAST(COUNT(*) OVER (PARTITION BY doc_id, grp) AS BIGINT) AS plen
    FROM content
), word_stats AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
        CAST(SUM(plen) AS BIGINT) AS degree
    FROM phrase_rows GROUP BY word
), phrases AS (
    SELECT p.doc_id, p.grp,
        string_agg(c.word, ' ' ORDER BY c.pos) AS phrase,
        SUM(w.degree * 1.0 / w.freq) AS score
    FROM (SELECT DISTINCT doc_id, grp FROM phrase_rows) p
    JOIN content c ON c.doc_id = p.doc_id AND c.grp = p.grp
    JOIN word_stats w ON w.word = c.word
    GROUP BY p.doc_id, p.grp
)
SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
    ROUND(MAX(score), 6) AS score
FROM phrases
GROUP BY phrase
ORDER BY MAX(score) DESC, phrase LIMIT {RAKE_TOP}""",
)
def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free word runs — found with the gaps-and-islands
    trick (pos - row_number) INSIDE text processing — scored by
    sum over member words of degree(w)/freq(w), where freq counts phrase
    memberships and degree sums the lengths of the phrases containing
    the word (words that live in long phrases score high). The
    graph-free complement of q_textrank_keywords: no iteration, two
    word-keyed aggregations, corpus-scale-safe by construction (all
    shuffles key on word / (doc, phrase) — phrase strings themselves
    shuffle only for the final distinct-phrase rollup).

    Top 25 by (score desc, phrase) — deterministic; identical
    phrases share the identical score by construction (scores derive
    from corpus-global word stats), so MAX(score) is exact, not a
    tie-break hack."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    content = toks.filter(~F.col("word").isin(*STOPWORDS)).withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    plen_w = Window.partitionBy("doc_id", "grp")
    phrase_rows = content.select(
        "doc_id", "grp", "word", F.count("*").over(plen_w).cast("bigint").alias("plen")
    )
    word_stats = phrase_rows.groupBy("word").agg(
        F.count("*").cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("degree"),
    )
    phrases = (
        content.join(F.broadcast(word_stats), "word")
        .groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("phrase"),
            F.sum(F.col("degree") * 1.0 / F.col("freq")).alias("score"),
        )
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.round(F.max("score"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(RAKE_TOP)
    )


PHRASES = (("table", "hash"), ("part", "filter"), ("merge", "group"))


@query(
    "q_phrase_search",
    oracle=f"""
WITH toks AS (
    SELECT doc_id,
        unnest(string_split(text, ' ')) AS w,
        generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
),
phrases AS (
    SELECT * FROM (VALUES {", ".join(f"('{a}', '{b}')" for a, b in PHRASES)})
        p(w1, w2)
)
SELECT p.w1 || ' ' || p.w2 AS phrase, a.doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_matches
FROM phrases p
JOIN toks a ON a.w = p.w1
JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.w = p.w2
GROUP BY 1, 2""",
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase search: exact adjacent-bigram matches per
    document for a fixed phrase list, via the inverted positional index
    (token, position) self-joined at distance 1 — the retrieval
    mechanism behind quoted-phrase queries, complementing q_bm25_topk's
    bag-of-words ranking and q_collocations' corpus-level statistics.

    Scale: the positional index is built in one pass; BOTH join legs
    are pre-filtered to the phrase vocabulary (a broadcast of the tiny
    phrase list), so only postings of queried words shuffle — the
    corpus-wide token stream never joins itself. Position arithmetic
    is integer and identical in both engines (relative offset +1 on
    each engine's own subscript base)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    phrases = spark.createDataFrame(list(PHRASES), "w1 string, w2 string")
    a = toks.select("doc_id", F.col("w").alias("w1"), F.col("pos").alias("pa"))
    b = toks.select("doc_id", F.col("w").alias("w2"), F.col("pos").alias("pb"))
    return (
        F.broadcast(phrases)
        .join(a, "w1")
        .join(b, ["doc_id", "w2"])
        .filter(F.col("pb") == F.col("pa") + 1)
        .groupBy(
            F.concat_ws(" ", "w1", "w2").alias("phrase"), "doc_id"
        )
        .agg(F.count("*").cast("bigint").alias("n_matches"))
    )


LOGODDS_A, LOGODDS_B = "src0", "src1"  # the two corpora compared
LOGODDS_PRIOR = 0.5  # uniform Dirichlet pseudo-count per word


@query(
    "q_log_odds_ratio",
    oracle=f"""
WITH toks AS (
    SELECT source, unnest(string_split(text, ' ')) AS w
    FROM documents WHERE source IN ('{LOGODDS_A}', '{LOGODDS_B}')
),
wc AS (
    SELECT w,
        CAST(SUM(CASE WHEN source = '{LOGODDS_A}' THEN 1 ELSE 0 END)
            AS BIGINT) AS ya,
        CAST(SUM(CASE WHEN source = '{LOGODDS_B}' THEN 1 ELSE 0 END)
            AS BIGINT) AS yb
    FROM toks WHERE w <> '' GROUP BY 1
),
tot AS (
    SELECT SUM(ya) AS na, SUM(yb) AS nb,
        CAST(COUNT(*) AS BIGINT) AS v
    FROM wc
)
SELECT w AS word, ya AS n_a, yb AS n_b,
    ROUND(
        (LN((ya + {LOGODDS_PRIOR})
            / (na + {LOGODDS_PRIOR} * v - ya - {LOGODDS_PRIOR}))
         - LN((yb + {LOGODDS_PRIOR})
            / (nb + {LOGODDS_PRIOR} * v - yb - {LOGODDS_PRIOR})))
        / SQRT(1.0 / (ya + {LOGODDS_PRIOR}) + 1.0 / (yb + {LOGODDS_PRIOR})),
        6) AS z_score
FROM wc CROSS JOIN tot""",
)
def q_log_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe et al. (2008) "Fightin' Words" log-odds ratio with a
    Dirichlet prior, comparing the {LOGODDS_A} and {LOGODDS_B} corpora:
    per word, the difference of smoothed log-odds standardized by its
    estimated variance 1/(y_a + a) + 1/(y_b + a). The principled
    "which words distinguish these two corpora" statistic — unlike raw
    frequency ratios it neither explodes on rare words (the prior
    shrinks them) nor ignores sampling noise (the z standardization) —
    complementing q_chi2_feature_selection's presence-based ranking and
    q_source_kl's distribution-level divergence.

    Scale: one token pass to the per-word count rollup; totals ride in
    as a broadcast scalar; all arithmetic on |V| rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.col("source").isin(LOGODDS_A, LOGODDS_B))
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    wc = toks.groupBy("w").agg(
        F.sum((F.col("source") == LOGODDS_A).cast("int"))
        .cast("bigint")
        .alias("ya"),
        F.sum((F.col("source") == LOGODDS_B).cast("int"))
        .cast("bigint")
        .alias("yb"),
    )
    tot = wc.agg(
        F.sum("ya").alias("na"),
        F.sum("yb").alias("nb"),
        F.count("*").cast("bigint").alias("v"),
    )
    a = LOGODDS_PRIOR
    ya, yb = F.col("ya"), F.col("yb")
    na, nb, v = F.col("na"), F.col("nb"), F.col("v")
    delta = F.log((ya + a) / (na + a * v - ya - a)) - F.log(
        (yb + a) / (nb + a * v - yb - a)
    )
    var = 1.0 / (ya + a) + 1.0 / (yb + a)
    return wc.crossJoin(F.broadcast(tot)).select(
        F.col("w").alias("word"),
        ya.alias("n_a"),
        yb.alias("n_b"),
        F.round(delta / F.sqrt(var), 6).alias("z_score"),
    )


# Gopher/MassiveText repetition thresholds (Rae et al. 2021, table A1:
# top-2-gram 0.20, top-3-gram 0.18; the duplicate-n-gram family there is
# specified for 5..10-grams — on this fixture's 31-word vocabulary 5-gram
# repeats are vanishingly rare, so the duplicate signal is computed over
# 2/3-grams with an illustrative 0.60 cap on BOTH (the composite flag
# gates every reported fraction — top2/top3/dup2/dup3; r10 advisory).
# The paper's full 5..10-gram duplicate family, with its real per-n
# thresholds, is exercised by q_repetition_gopher_zipf on a Zipf-shaped
# corpus where it is non-degenerate.
REP_TOP2_MAX = 0.20
REP_TOP3_MAX = 0.18
REP_DUP2_MAX = 0.60
REP_DUP3_MAX = 0.60


def _ngram_sql(n: int) -> str:
    """DuckDB: list of space-joined word n-grams (empty when too short)."""
    if n == 2:
        grams = "words[i] || ' ' || words[i+1]"
    else:
        grams = f"array_to_string(list_slice(words, i, i+{n - 1}), ' ')"
    return (
        f"CASE WHEN len(words) >= {n} THEN "
        f"list_transform(generate_series(1, len(words)-{n - 1}), i -> {grams}) "
        "ELSE [] END"
    )


def _top_sql(g: str) -> str:
    """DuckDB: chars covered by the most-repeated n-gram (count x length,
    maxed over distinct grams — the count*length max is tie-free even when
    the raw count ties)."""
    return (
        f"COALESCE(list_max(list_transform(list_distinct({g}), "
        f"gg -> len(list_filter({g}, x -> x = gg)) * LENGTH(gg))), 0)"
    )


def _dup_sql(g: str) -> str:
    """DuckDB: chars covered by all occurrences of n-grams seen >= 2 times."""
    return (
        f"COALESCE(list_sum(list_transform(list_distinct({g}), "
        f"gg -> CASE WHEN len(list_filter({g}, x -> x = gg)) >= 2 "
        f"THEN len(list_filter({g}, x -> x = gg)) * LENGTH(gg) ELSE 0 END)), 0)"
    )


def _word_ngrams(n: int, words: str = "words"):
    """Space-joined word n-grams of the ``words`` array column (empty
    array when the document is shorter than n) — the in-row twin of
    ``_ngram_sql``."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# run-length fold over the sorted gram array: one pass yields both
# max(count x chars) and sum(count x chars | count >= 2). The ""
# sentinel in `prev` cannot collide with a real gram: run = 0
# guards the first comparison. Accumulators are BIGINT so a single
# ~1 GB document (2^31+ gram-chars) degrades only in latency, never
# by silent 32-bit wraparound (r10 advisory; non-ANSI Spark would
# wrap an int accumulator while the DuckDB oracle stays exact).
def _rl_init():
    return F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit(0).cast("long").alias("dup"),
    )


def _rl_fold(acc):
    contrib = acc["run"] * F.length(acc["prev"])
    return (
        F.greatest(acc["best"], contrib),
        acc["dup"] + F.when(acc["run"] >= 2, contrib).otherwise(F.lit(0)),
    )


def _rl_merge(acc, x):
    same = (acc["run"] > 0) & (acc["prev"] == x)
    best_f, dup_f = _rl_fold(acc)
    return F.struct(
        x.alias("prev"),
        F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.when(same, acc["best"]).otherwise(best_f).alias("best"),
        F.when(same, acc["dup"]).otherwise(dup_f).alias("dup"),
    )


def _rl_finish(acc):
    best_f, dup_f = _rl_fold(acc)
    return F.struct(
        F.when(acc["run"] > 0, best_f).otherwise(acc["best"]).alias("best"),
        F.when(acc["run"] > 0, dup_f).otherwise(acc["dup"]).alias("dup"),
    )


def _rl_stats(g):
    """O(d log d) sorted run-length gram statistics: (best, dup) struct
    of max(count x chars) and sum(count x chars | count >= 2). Shared by
    the repetition-signal family (see q_repetition_signals for the
    measured plan history)."""
    return F.aggregate(F.sort_array(g), _rl_init(), _rl_merge, _rl_finish)


# Shared by all three q_repetition_signals twins (Arrow kernel / HOF
# sorted-runs / explode-rollup): every plan computes the SAME
# exact-integer divisions, so one oracle pins all of them (the twin
# equality is also asserted bit-for-bit in
# tests/test_stats_differential.py).
_REPETITION_ORACLE = f"""
WITH w AS (
    SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
        string_split(text, ' ') AS words
    FROM documents
), g AS (
    SELECT doc_id, n_chars,
        {_ngram_sql(2)} AS g2,
        {_ngram_sql(3)} AS g3
    FROM w
)
SELECT doc_id,
    {_top_sql("g2")} / n_chars AS top2_char_frac,
    {_top_sql("g3")} / n_chars AS top3_char_frac,
    {_dup_sql("g2")} / n_chars AS dup2_char_frac,
    {_dup_sql("g3")} / n_chars AS dup3_char_frac,
    ({_top_sql("g2")} / n_chars <= {REP_TOP2_MAX}
     AND {_top_sql("g3")} / n_chars <= {REP_TOP3_MAX}
     AND {_dup_sql("g2")} / n_chars <= {REP_DUP2_MAX}
     AND {_dup_sql("g3")} / n_chars <= {REP_DUP3_MAX}) AS passes_repetition
FROM g"""


@query("q_repetition_signals_hof", oracle=_REPETITION_ORACLE)
def q_repetition_signals_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-runs higher-order-function twin of q_repetition_signals —
    the r10 three-plan-flip winner, demoted to second by the r12 Arrow
    race (0.51/0.69/7.76 s vs this form's 1.64/2.34/14.67 s at
    1x/10x/100x; SCALE.md "Round-12: repetition-signals third twin").
    Kept registered under the same oracle as the all-JVM form and a
    third independent implementation hash-checked every rotation.

    Original description (still the metric contract):
    Gopher-style repetition quality signals (Rae et al. 2021 "Scaling
    Language Models: ... Gopher", MassiveText filtering, table A1): per
    document, the fraction of characters covered by (a) the single most
    frequent word 2-gram / 3-gram (boilerplate headers, SEO keyword
    stuffing) and (b) every occurrence of any 2-gram / 3-gram appearing
    at least twice (loops, template spam), plus the pass/fail flag the
    corpus filter would apply. The sibling q_repetition_ratio reports
    COUNT-based bigram shares (what fraction of bigram slots repeat);
    this one is the paper's actual filter metric — CHARACTER coverage,
    which weights long repeated phrases the way the filter intends —
    extended to 3-grams, the duplicate-gram family, and the composite
    threshold flag a curation pipeline would gate on.

    Convention pinned for the oracle: "fraction of characters" =
    occurrences x chars-of-the-gram (grams joined by single spaces)
    over LENGTH(text); the top gram is chosen by max(count x length),
    which is tie-free where raw counts tie. Every ratio is one IEEE
    division of exact integers, so Spark and DuckDB agree bit-for-bit
    (no ROUND anywhere — the r9/r10 FP-boundary class cannot occur).

    Scale: pure narrow per-row higher-order functions (transform /
    sort_array / one run-length aggregate, all inside codegen), zero
    shuffles, zero UDFs. Per-doc cost is O(d log d): grams are sorted
    and equal runs folded in a single pass with a struct accumulator.
    MEASURED as the production path for bounded-document corpora after
    two plan iterations (SCALE.md r10 "repetition-signals twins"): the
    first draft's nested filter-per-distinct-gram counting was O(d^2)
    and LOST to the explode/rollup twin at every scale (5.4 s vs 1.6 s
    at 1x); this sorted-runs form wins at both measured scales (1x:
    1.8 s vs 1.9 s; 100x tier: 14.4 s vs 34.3 s — no gram ever leaves
    its row). q_repetition_signals_agg remains the safety twin for the
    one shape this form cannot spread: a single multi-megabyte document
    whose per-row sort would pin one task."""
    df = with_words(_docs(spark, sf_dir))
    n_chars = F.length("text").cast("bigint")
    df = df.withColumn("s2", _rl_stats(_word_ngrams(2))).withColumn(
        "s3", _rl_stats(_word_ngrams(3))
    )
    top2 = F.col("s2")["best"] / n_chars
    top3 = F.col("s3")["best"] / n_chars
    dup2 = F.col("s2")["dup"] / n_chars
    dup3 = F.col("s3")["dup"] / n_chars
    return df.select(
        "doc_id",
        top2.alias("top2_char_frac"),
        top3.alias("top3_char_frac"),
        dup2.alias("dup2_char_frac"),
        dup3.alias("dup3_char_frac"),
        (
            (top2 <= REP_TOP2_MAX)
            & (top3 <= REP_TOP3_MAX)
            & (dup2 <= REP_DUP2_MAX)
            & (dup3 <= REP_DUP3_MAX)
        ).alias("passes_repetition"),
    )


@query("q_repetition_signals_agg", oracle=_REPETITION_ORACLE)
def q_repetition_signals_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mega-document twin of q_repetition_signals: identical output
    (same oracle string — every value is the same exact-integer
    division, so the two plans are bit-equal), different physical
    shape: explode -> (doc_id, n, gram) count -> per-doc conditional
    rollup, where the work is O(total grams) and a single monster
    document spreads across map tasks before the combiner collapses
    it. On bounded-document corpora the zero-shuffle sorted-runs form
    wins (1x: 1.9 s vs its 1.8 s; 100x tier: 34.3 s vs 14.4 s — this
    plan pays the full gram volume through an exchange); this twin is
    the right plan only when single documents are large enough that a
    per-row sort would pin one task. It also beat the FIRST HOF draft
    (O(d^2) nested filters) at every scale — the round's reminder that
    "zero shuffles" is not free when the narrow replacement is
    super-linear per row. Same twin discipline as dedup exact-vs-LSH
    and q_quantile_normalize(_approx): the semantics are pinned once,
    the plan is chosen by measurement.

    Shuffle budget: one exchange on (doc_id, gram_size, gram) with
    map-side partial counts, one on doc_id for the rollup, one
    broadcast-free join back to the (doc_id, n_chars) base (AQE turns
    it into a broadcast at fixture scale). Char totals never ride
    through the gram shuffle — only 16-byte-ish gram keys do."""
    df = with_words(_docs(spark, sf_dir)).select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        "words",
    )

    def grams(n: int):
        return F.when(
            F.size("words") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("words") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice("words", i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    exploded = df.select(
        "doc_id",
        F.explode(
            F.map_from_arrays(
                F.array(F.lit(2), F.lit(3)),
                F.array(grams(2), grams(3)),
            )
        ).alias("n", "gs"),
    ).select("doc_id", "n", F.explode("gs").alias("gram"))
    counts = exploded.groupBy("doc_id", "n", "gram").agg(
        F.count("*").alias("c")
    )
    chars = F.col("c") * F.length("gram")
    rolled = counts.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == 2, chars)).alias("t2"),
        F.max(F.when(F.col("n") == 3, chars)).alias("t3"),
        F.sum(
            F.when((F.col("n") == 2) & (F.col("c") >= 2), chars).otherwise(0)
        ).alias("d2"),
        F.sum(
            F.when((F.col("n") == 3) & (F.col("c") >= 2), chars).otherwise(0)
        ).alias("d3"),
    )
    base = df.select("doc_id", "n_chars")
    joined = base.join(rolled, "doc_id", "left")
    top2 = F.coalesce(F.col("t2"), F.lit(0)) / F.col("n_chars")
    top3 = F.coalesce(F.col("t3"), F.lit(0)) / F.col("n_chars")
    dup2 = F.coalesce(F.col("d2"), F.lit(0)) / F.col("n_chars")
    dup3 = F.coalesce(F.col("d3"), F.lit(0)) / F.col("n_chars")
    return joined.select(
        "doc_id",
        top2.alias("top2_char_frac"),
        top3.alias("top3_char_frac"),
        dup2.alias("dup2_char_frac"),
        dup3.alias("dup3_char_frac"),
        (
            (top2 <= REP_TOP2_MAX)
            & (top3 <= REP_TOP3_MAX)
            & (dup2 <= REP_DUP2_MAX)
            & (dup3 <= REP_DUP3_MAX)
        ).alias("passes_repetition"),
    )

def _rep_stats_arrow_batches(it):
    """numpy kernel behind q_repetition_signals (the SHIPPED plan since
    the r12 race), built with the r12 gopher-kernel techniques (batch-wide word factorize, void-viewed (doc, codes)
    gram keys, one exact np.unique per n per batch; see
    _gopher_stats_arrow_batches). Simpler than the gopher kernel: the
    2/3-gram dup statistic here is COUNT coverage (sum of count x chars
    over grams seen >= 2 times), not the positional interval union, so
    no offset table or segmented running-max is needed. Emits the exact
    integer statistics; fractions stay Spark-side divisions."""
    import numpy as np
    import pandas as pd

    out_cols = ["doc_id", "n_chars", "best2", "dup2", "best3", "dup3"]
    for pdf in it:
        B = len(pdf)
        if B == 0:
            continue
        res: dict = {
            "doc_id": pdf["doc_id"].to_numpy(),
            "n_chars": pdf["n_chars"].to_numpy(),
        }
        words_lists = [np.asarray(w, dtype=object) for w in pdf["words"]]
        counts = np.array([len(w) for w in words_lists], dtype=np.int64)
        total = int(counts.sum())
        zeros = np.zeros(B, dtype=np.int64)
        if total == 0:
            for m in (2, 3):
                res[f"best{m}"] = zeros
                res[f"dup{m}"] = zeros
            yield pd.DataFrame(res)[out_cols]
            continue
        flat = np.concatenate(words_lists)
        codes, uniques = pd.factorize(flat)
        ulen = np.fromiter(
            (len(u) for u in uniques), dtype=np.int64, count=len(uniques)
        )
        wlen = ulen[codes]
        docix = np.repeat(np.arange(B, dtype=np.int64), counts)
        doc_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos_in_doc = np.arange(total, dtype=np.int64) - doc_start[docix]
        # gram char length = sum of word lens in window + (m - 1) spaces
        wcum = np.concatenate([[0], np.cumsum(wlen)])
        for m in (2, 3):
            t = np.nonzero(pos_in_doc <= counts[docix] - m)[0]
            if t.size == 0:
                res[f"best{m}"] = zeros.copy()
                res[f"dup{m}"] = zeros.copy()
                continue
            K = np.empty((t.size, m + 1), dtype=np.int64)
            K[:, 0] = docix[t]
            for j in range(m):
                K[:, j + 1] = codes[t + j]
            kv = np.ascontiguousarray(K).view(
                np.dtype((np.void, K.dtype.itemsize * (m + 1)))
            ).ravel()
            _, first, cnt = np.unique(kv, return_index=True, return_counts=True)
            glen = wcum[t + m] - wcum[t] + (m - 1)
            gdoc = docix[t][first]
            chars = cnt * glen[first]
            best = zeros.copy()
            np.maximum.at(best, gdoc, chars)
            dup = zeros.copy()
            dupmask = cnt >= 2
            np.add.at(dup, gdoc[dupmask], chars[dupmask])
            res[f"best{m}"] = best
            res[f"dup{m}"] = dup
        yield pd.DataFrame(res)[out_cols]


@query("q_repetition_signals", oracle=_REPETITION_ORACLE)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals over the fixture corpus
    (Rae et al. 2021, the 2/3-gram top and duplicate CHARACTER-coverage
    fractions + composite pass flag; full metric contract in the
    q_repetition_signals_hof docstring, which this key is bit-equal
    to). SHIPPED plan since r12: the Arrow numpy kernel — the
    gopher-kernel playbook applied to the fixture family after the
    measured win there — which beat the r10-flip sorted-runs HOF form
    at every scale (0.51/0.69/7.76 s vs 1.64/2.34/14.67 s at
    1x/10x/100x; SCALE.md "Round-12: repetition-signals third twin").
    All THREE twins stay registered under one oracle: this kernel, the
    sorted-runs HOF form (q_repetition_signals_hof, the all-JVM plan),
    and the explode/rollup form (q_repetition_signals_agg, the
    mega-document safety — a single monster doc spreads across map
    tasks there, while both per-row forms pin it to one task). Plan
    class: zero-exchange per-row map (MapInPandas stage), identical
    100 TB posture to the HOF form with a ~2-3x smaller constant."""
    df = with_words(_docs(spark, sf_dir)).select(
        "doc_id", F.length("text").cast("bigint").alias("n_chars"), "words"
    )
    stats = df.mapInPandas(
        _rep_stats_arrow_batches,
        "doc_id bigint, n_chars bigint, best2 bigint, dup2 bigint,"
        " best3 bigint, dup3 bigint",
    )
    top2 = F.col("best2") / F.col("n_chars")
    top3 = F.col("best3") / F.col("n_chars")
    dup2 = F.col("dup2") / F.col("n_chars")
    dup3 = F.col("dup3") / F.col("n_chars")
    return stats.select(
        "doc_id",
        top2.alias("top2_char_frac"),
        top3.alias("top3_char_frac"),
        dup2.alias("dup2_char_frac"),
        dup3.alias("dup3_char_frac"),
        (
            (top2 <= REP_TOP2_MAX)
            & (top3 <= REP_TOP3_MAX)
            & (dup2 <= REP_DUP2_MAX)
            & (dup3 <= REP_DUP3_MAX)
        ).alias("passes_repetition"),
    )


# ---------------------------------------------------------------------------
# The FULL Gopher repetition rule set (Rae et al. 2021, table A1) on a
# corpus where it is non-degenerate. The fixture documents' 31-word
# vocabulary makes 5..10-gram duplicates vanishingly rare (the reason
# q_repetition_signals gates 2/3-grams with illustrative caps), so this
# key generates a deterministic Zipf-headed corpus sized from the
# documents table — the q_setsim_zipf discipline (dedup.py) applied to
# the text-quality family (r10 verdict gap 1) — with four planted
# repetition classes so every threshold has real work to do:
#   doc_id % 10 == 0: words 45..119 replay words 0..74 (period-45
#                     template — near-total duplication, fails the whole
#                     dup5..dup10 family at ~1.0)
#   doc_id % 10 == 1: last 25 of 120 words repeat the first 25
#                     (moderate — union covers ~42% of chars, fails all
#                     six dup thresholds but passes the top family)
#   doc_id % 10 == 2: last 6 words repeat the first 6 (light — dup5/dup6
#                     ~0.10 stay under the 0.15/0.14 caps, dup7..dup10
#                     are exactly 0; a pass WITH signal)
#   doc_id % 10 == 3: first 60 words alternate two tokens (keyword
#                     stuffing — top2 ~0.28 > 0.20, top3/top4 worse; the
#                     stuffed block is also self-duplicating, so it fails
#                     the dup family too, like real SEO spam)
#   else:             pure Zipf draws (head word ~15% of tokens; 5-gram
#                     collisions have probability ~1e-8 per pair, so the
#                     dup family is ~0 and the doc passes)
# Dup-n follows the paper's definition EXACTLY: the fraction of
# characters covered by the UNION of all occurrences of n-grams that
# appear >= 2 times (overlapping occurrences counted once), computed as
# an exact integer interval union in joined-text char space. Top-n keeps
# the repo's pinned tie-free convention (gram maximizing count x chars;
# occurrences of a single top gram rarely overlap, and the paper does
# not union them). Every fraction is one IEEE division of exact
# integers, so Spark and DuckDB agree bit-for-bit at any SF.
GOPHER_ZIPF_LEN = 120
GOPHER_ZIPF_VOCAB = 2000
# table A1 thresholds, verbatim
GOPHER_TOP_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _gopher_zipf_words_sql() -> str:
    """DuckDB CTEs producing (doc_id, words[]) for the planted-repetition
    Zipf corpus; shared md5/integer arithmetic with zipf_corpus_words so
    both engines derive the identical corpus."""
    n = GOPHER_ZIPF_LEN
    return f"""
zgrid AS (
    SELECT d.doc_id, g.pos,
        CASE d.doc_id % 10 WHEN 0 THEN 75 WHEN 1 THEN 25 WHEN 2 THEN 6
             ELSE 0 END AS k
    FROM documents d
    CROSS JOIN UNNEST(generate_series(0, {n - 1})) AS g(pos)
),
zw AS (
    SELECT doc_id, pos,
        CASE WHEN doc_id % 10 = 3 AND pos < 60 THEN CAST(pos % 2 AS VARCHAR)
             ELSE CAST(CAST(FLOOR(u * u * u * u * {GOPHER_ZIPF_VOCAB})
                 AS BIGINT) AS VARCHAR)
        END AS word
    FROM (
        SELECT doc_id, pos,
            ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_'
                || CAST(p_eff AS VARCHAR)), 1, 8))::BIGINT
            / 4294967296.0 AS u
        FROM (
            SELECT doc_id, pos,
                CASE WHEN k > 0 AND pos >= {n} - k THEN pos - ({n} - k)
                     ELSE pos END AS p_eff
            FROM zgrid
        )
    )
),
zdocs AS MATERIALIZED (
    SELECT doc_id, array_agg(word ORDER BY pos) AS words
    FROM zw GROUP BY doc_id
)"""


def zipf_corpus_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _gopher_zipf_words_sql: (doc_id, words) built
    entirely IN-ROW — one transform over a literal position sequence per
    document, so corpus generation is a narrow codegen'd projection with
    zero shuffles (the oracle's explode/array_agg shape exists only
    because SQL lacks higher-order generation)."""
    docs = spread_input(_docs(spark, sf_dir).select("doc_id"))
    did = F.col("doc_id")
    n = GOPHER_ZIPF_LEN
    k = (
        F.when(did % 10 == 0, F.lit(75))
        .when(did % 10 == 1, F.lit(25))
        .when(did % 10 == 2, F.lit(6))
        .otherwise(F.lit(0))
    )

    def word(p):
        p_eff = F.when(
            (k > 0) & (p >= F.lit(n) - k), p - (F.lit(n) - k)
        ).otherwise(p)
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_", did.cast("string"), p_eff.cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            / F.lit(4294967296.0)
        )
        wid = F.floor(u * u * u * u * F.lit(GOPHER_ZIPF_VOCAB)).cast("bigint")
        return F.when(
            (did % 10 == 3) & (p < 60), (p % 2).cast("string")
        ).otherwise(wid.cast("string"))

    return docs.select(
        "doc_id",
        F.transform(F.sequence(F.lit(0), F.lit(n - 1)), word).alias("words"),
    )


def _char_offsets(words) -> Column:
    """0-based start-char offset of each word inside the single-space
    joined text: off[0] = 0, off[w] = len(join(words[:w])) + 1. O(d^2)
    chars per row — d is the (small, bounded) per-document word count,
    and the array is built once and shared by all six dup-n unions."""
    return F.transform(
        F.sequence(F.lit(0), F.size(words) - 1),
        lambda w: F.when(w == 0, F.lit(0))
        .otherwise(F.length(F.concat_ws(" ", F.slice(words, 1, w))) + 1)
        .cast("long"),
    )


def _with_dup_union(df: DataFrame, m: int) -> DataFrame:
    """Exact Gopher dup-n character coverage: adds ``cov{m}`` = chars
    covered by the UNION of all occurrences of duplicated n-grams, as an
    integer interval union. O(s log s) per row: sort (gram, idx)
    structs, mark duplicate runs by neighbor equality, then fold the
    (already start-sorted) fixed-shape intervals left to right. No gram
    ever leaves its row.

    Each intermediate (the sorted pair array, the duplicate-start index
    list) is MATERIALIZED as its own column: higher-order-function
    lambdas are interpreted, so an inlined subexpression re-evaluates on
    every F.get reference — the first draft inlined the sort and cost
    ~450 re-sorts per document per n (82 s for 500 docs; this form is
    <1 s). CollapseProject keeps multi-referenced non-cheap aliases in
    their own projection, so naming the columns pins the evaluate-once
    shape."""
    g = F.col(f"g{m}")
    sz = F.size(g)
    df = df.withColumn(
        f"sp{m}",
        F.sort_array(
            F.transform(
                F.sequence(F.lit(0), sz - 1),
                lambda i: F.struct(F.get(g, i).alias("g"), i.alias("i")),
            )
        ),
    )
    sp = F.col(f"sp{m}")
    # F.get is 0-based and NULL out of bounds, so the edge comparisons
    # degrade to NULL (= dropped by filter) without explicit guards
    df = df.withColumn(
        f"dupidx{m}",
        F.array_sort(
            F.transform(
                F.filter(
                    F.sequence(F.lit(0), sz - 1),
                    lambda j: (F.get(sp, j)["g"] == F.get(sp, j - 1)["g"])
                    | (F.get(sp, j)["g"] == F.get(sp, j + 1)["g"]),
                ),
                lambda j: F.get(sp, j)["i"],
            )
        ),
    )
    off = F.col("off")

    def start(i):
        return F.get(off, i)

    def end(i):
        return F.get(off, i) + F.length(F.get(g, i))

    return df.withColumn(
        f"cov{m}",
        F.aggregate(
            F.col(f"dupidx{m}"),
            F.struct(
                F.lit(0).cast("long").alias("last_end"),
                F.lit(0).cast("long").alias("cov"),
            ),
            lambda acc, i: F.struct(
                F.greatest(acc["last_end"], end(i)).alias("last_end"),
                (
                    acc["cov"]
                    + F.greatest(
                        F.lit(0).cast("long"),
                        end(i) - F.greatest(start(i), acc["last_end"]),
                    )
                ).alias("cov"),
            ),
            lambda acc: acc["cov"],
        ),
    )


def _gopher_zipf_oracle() -> str:
    """Oracle: same corpus CTEs, naive O(s^2) duplicate detection per
    document (list_filter counting — deliberately independent of the
    sorted-runs trick), then the classic relational interval union: dup
    starts UNNEST to rows and a running MAX(end) window subtracts
    overlap. Top-n reuses _top_sql (max count x chars)."""
    n_grams = ",\n        ".join(
        f"{_ngram_sql(m)} AS g{m}" for m in (*GOPHER_TOP_MAX, *GOPHER_DUP_MAX)
    )
    frac_top = ",\n    ".join(
        f'{_top_sql(f"g{m}")} / n_chars AS top{m}_frac' for m in GOPHER_TOP_MAX
    )
    # one UNNEST per dup n: duplicated gram start indices (1-based in
    # DuckDB lists) with their char intervals in the joined text
    dup_rows = "\n    UNION ALL\n    ".join(
        f"""SELECT doc_id, {m} AS n, off[i] AS s, off[i] + LENGTH(g{m}[i]) AS e
    FROM zgram, UNNEST(list_filter(generate_series(1, len(g{m})),
        i -> len(list_filter(g{m}, x -> x = g{m}[i])) >= 2)) AS u(i)"""
        for m in GOPHER_DUP_MAX
    )
    dup_cols = ",\n    ".join(
        f"COALESCE(d{m}.cov, 0) / z.n_chars AS dup{m}_frac"
        for m in GOPHER_DUP_MAX
    )
    dup_joins = "\n".join(
        f"LEFT JOIN dcov d{m} ON d{m}.doc_id = z.doc_id AND d{m}.n = {m}"
        for m in GOPHER_DUP_MAX
    )
    flag = " AND ".join(
        [f"top{m}_frac <= {t}" for m, t in GOPHER_TOP_MAX.items()]
        + [f"dup{m}_frac <= {t}" for m, t in GOPHER_DUP_MAX.items()]
    )
    return f"""WITH {_gopher_zipf_words_sql().strip()},
zgram AS (
    SELECT doc_id,
        CAST(LENGTH(array_to_string(words, ' ')) AS BIGINT) AS n_chars,
        list_transform(generate_series(1, len(words)),
            w -> CASE WHEN w = 1 THEN CAST(0 AS BIGINT)
                 ELSE CAST(LENGTH(array_to_string(list_slice(words, 1, w - 1),
                     ' ')) + 1 AS BIGINT) END) AS off,
        {n_grams}
    FROM zdocs
),
dstart AS (
    {dup_rows}
),
dcov AS (
    SELECT doc_id, n, SUM(GREATEST(0, e - GREATEST(s, prev_end))) AS cov
    FROM (
        SELECT doc_id, n, s, e,
            COALESCE(MAX(e) OVER (PARTITION BY doc_id, n ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS prev_end
        FROM dstart
    )
    GROUP BY doc_id, n
)
SELECT doc_id,
    top2_frac, top3_frac, top4_frac,
    dup5_frac, dup6_frac, dup7_frac, dup8_frac, dup9_frac, dup10_frac,
    ({flag}) AS passes_gopher_repetition
FROM (
    SELECT z.doc_id, z.n_chars,
        {frac_top},
        {dup_cols}
    FROM zgram z
    {dup_joins}
) t"""


@query("q_repetition_gopher_zipf_hof", oracle=_gopher_zipf_oracle())
def q_repetition_gopher_zipf_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function twin of q_repetition_gopher_zipf — the r11
    original, now the measured LOSER of the r12 twin race (SCALE.md
    "Round-12: gopher twins": 4.31 s vs the Arrow kernel's 1.26 s at
    1x, 27.3 s vs 6.8 s at the 10x tier — interpreted Catalyst lambda
    evaluation is the whole gap; both plans are zero-exchange per-row
    maps, so the constant IS the bill at 100 TB). Kept registered under
    the same oracle per the repo's twin discipline: it is the
    all-JVM form (no Python workers — the right plan where executors
    cannot host them), and a second independent implementation that
    hash-checks against the same oracle every rotation.

    Semantics and output: identical to q_repetition_gopher_zipf
    bit-for-bit (same exact integer statistics, same IEEE divisions);
    see that key's docstring for the metric definitions.

    Per-doc cost is O(9 x d log d) (transform + the shared _rl_stats
    fold for top-n; sorted-neighbor duplicate marking + an O(dups)
    interval-union fold for dup-n) plus one O(d^2)-char offset table
    (d = 120 words, built once, shared by all six unions)."""
    df = zipf_corpus_words(spark, sf_dir)
    n_chars = F.length(F.concat_ws(" ", F.col("words"))).cast("bigint")
    df = df.withColumn("n_chars", n_chars).withColumn(
        "off", _char_offsets(F.col("words"))
    )
    for m in GOPHER_TOP_MAX:
        df = df.withColumn(f"s{m}", _rl_stats(_word_ngrams(m)))
    for m in GOPHER_DUP_MAX:
        df = _with_dup_union(df.withColumn(f"g{m}", _word_ngrams(m)), m)
    cols = [F.col("doc_id")]
    flag = F.lit(True)
    for m, t in GOPHER_TOP_MAX.items():
        frac = F.col(f"s{m}")["best"] / F.col("n_chars")
        cols.append(frac.alias(f"top{m}_frac"))
        flag = flag & (frac <= F.lit(t))
    for m, t in GOPHER_DUP_MAX.items():
        frac = F.col(f"cov{m}") / F.col("n_chars")
        cols.append(frac.alias(f"dup{m}_frac"))
        flag = flag & (frac <= F.lit(t))
    cols.append(flag.alias("passes_gopher_repetition"))
    return df.select(*cols)


def _gopher_stats_arrow_batches(it):
    """numpy kernel behind q_repetition_gopher_zipf_arrow: per Arrow
    batch, compute the INTEGER gram statistics (top-n best = max
    count x chars; dup-n cov = exact positional interval union) for all
    nine n simultaneously, vectorized ACROSS documents — no per-gram
    string is ever built. Words factorize to integer codes once per
    batch; an m-gram's identity is its (doc, code_1..code_m) row viewed
    as one void scalar, so np.unique gives counts + first-occurrence
    lengths exactly; the interval union is a segmented running-max
    (groups offset by a per-doc constant larger than any document's
    char length, so np.maximum.accumulate never leaks across docs —
    clamping the shifted carry-in at 0 reproduces the oracle's
    COALESCE(prev_end, 0))."""
    import numpy as np
    import pandas as pd

    ms_top = tuple(GOPHER_TOP_MAX)
    ms_dup = tuple(GOPHER_DUP_MAX)
    out_cols = (
        ["doc_id"]
        + [f"best{m}" for m in ms_top]
        + [f"cov{m}" for m in ms_dup]
        + ["n_chars"]
    )
    for pdf in it:
        B = len(pdf)
        if B == 0:
            continue
        res: dict = {"doc_id": pdf["doc_id"].to_numpy()}
        words_lists = [np.asarray(w, dtype=object) for w in pdf["words"]]
        counts = np.array([len(w) for w in words_lists], dtype=np.int64)
        total = int(counts.sum())
        zeros = np.zeros(B, dtype=np.int64)
        if total == 0:
            for m in ms_top:
                res[f"best{m}"] = zeros
            for m in ms_dup:
                res[f"cov{m}"] = zeros
            res["n_chars"] = zeros
            yield pd.DataFrame(res)[out_cols]
            continue
        flat = np.concatenate(words_lists)
        codes, uniques = pd.factorize(flat)
        ulen = np.fromiter(
            (len(u) for u in uniques), dtype=np.int64, count=len(uniques)
        )
        wlen = ulen[codes]
        docix = np.repeat(np.arange(B, dtype=np.int64), counts)
        # char offset of token t inside its doc's single-space join:
        # cumulative (len + 1) of the doc's preceding tokens
        cum = np.concatenate([[0], np.cumsum(wlen + 1)])
        doc_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
        off = cum[:-1] - cum[doc_start][docix]
        # joined length = sum(len) + (count - 1); empty doc clamps to 0
        n_chars = np.maximum(cum[np.cumsum(counts)] - cum[doc_start] - 1, 0)
        pos_in_doc = np.arange(total, dtype=np.int64) - doc_start[docix]
        BIG = int(n_chars.max()) + 2
        for m in ms_top + ms_dup:
            col = f"best{m}" if m in GOPHER_TOP_MAX else f"cov{m}"
            t = np.nonzero(pos_in_doc <= counts[docix] - m)[0]
            if t.size == 0:
                res[col] = zeros.copy()
                continue
            K = np.empty((t.size, m + 1), dtype=np.int64)
            K[:, 0] = docix[t]
            for j in range(m):
                K[:, j + 1] = codes[t + j]
            kv = np.ascontiguousarray(K).view(
                np.dtype((np.void, K.dtype.itemsize * (m + 1)))
            ).ravel()
            _, first, inv, cnt = np.unique(
                kv, return_index=True, return_inverse=True, return_counts=True
            )
            glen = off[t + m - 1] + wlen[t + m - 1] - off[t]
            gdoc = docix[t]
            if m in GOPHER_TOP_MAX:
                best = zeros.copy()
                np.maximum.at(best, gdoc[first], cnt * glen[first])
                res[col] = best
            else:
                dup = cnt[inv] >= 2
                cov = zeros.copy()
                if dup.any():
                    s = off[t[dup]]
                    e = s + glen[dup]
                    g = gdoc[dup]
                    # t ascending => (g, s) ascending: already union-ready
                    shifted = e + g * BIG
                    prev = np.empty_like(shifted)
                    prev[0] = -1
                    np.maximum.accumulate(shifted[:-1], out=prev[1:])
                    prev_end = np.maximum(prev - g * BIG, 0)
                    np.add.at(
                        cov, g, np.maximum(e - np.maximum(s, prev_end), 0)
                    )
                res[col] = cov
        res["n_chars"] = n_chars
        yield pd.DataFrame(res)[out_cols]


def gopher_zipf_flags(df: DataFrame) -> DataFrame:
    """The Arrow gopher-stats kernel + table-A1 threshold flags over any
    (doc_id, words) corpus frame — q_repetition_gopher_zipf's body,
    factored (r13 optimization round) so q_zipf_curation_pipeline can
    feed all three gate branches from ONE materialized corpus instead
    of re-generating it per branch. Expression graph unchanged: the
    registered key calls this with the default in-row generator and its
    plan stays byte-identical."""
    schema = (
        "doc_id bigint, "
        + ", ".join(f"best{m} bigint" for m in GOPHER_TOP_MAX)
        + ", "
        + ", ".join(f"cov{m} bigint" for m in GOPHER_DUP_MAX)
        + ", n_chars bigint"
    )
    stats = df.select("doc_id", "words").mapInPandas(
        _gopher_stats_arrow_batches, schema
    )
    cols = [F.col("doc_id")]
    flag = F.lit(True)
    for m, thr in GOPHER_TOP_MAX.items():
        frac = F.col(f"best{m}") / F.col("n_chars")
        cols.append(frac.alias(f"top{m}_frac"))
        flag = flag & (frac <= F.lit(thr))
    for m, thr in GOPHER_DUP_MAX.items():
        frac = F.col(f"cov{m}") / F.col("n_chars")
        cols.append(frac.alias(f"dup{m}_frac"))
        flag = flag & (frac <= F.lit(thr))
    cols.append(flag.alias("passes_gopher_repetition"))
    return stats.select(*cols)


@query("q_repetition_gopher_zipf", oracle=_gopher_zipf_oracle())
def q_repetition_gopher_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters at FULL table-A1 strength (Rae et al.
    2021): fraction of characters in the most frequent 2/3/4-gram and
    the paper-exact UNION fraction of characters in duplicated
    5..10-grams, each against the paper's own threshold, over a
    deterministic Zipf-vocabulary corpus with planted repetition classes
    (module comment above GOPHER_ZIPF_LEN) — the shape the 31-word
    fixture cannot exercise. The pass/fail split is non-trivial by
    construction (template duplication and keyword stuffing fail on
    DIFFERENT thresholds; pure-Zipf docs pass with live dup2-level
    signal) and asserted in tests/test_stats_differential.py together
    with a pure-Python rederivation of both the generator and the
    union metrics.

    Shipped plan (r12 twin race, VERDICT r11 "what's wrong" 1): the
    Arrow-vectorized numpy kernel (_gopher_stats_arrow_batches), which
    beat the r11 interpreted-HOF form 1.26 s vs 4.31 s at 1x and 6.8 s
    vs 27.3 s at the 10x tier (SCALE.md "Round-12: gopher twins"); the
    HOF form stays registered as q_repetition_gopher_zipf_hof under the
    same oracle, bit-equal by construction. Both plans are zero-exchange
    per-row maps (mapInPandas is an ArrowEvalPython stage, NOT a
    shuffle — the no-corpus-shuffle plan pin in tests/test_plans.py
    holds for both), so the 100 TB posture is unchanged: partition
    count is the only knob, and the race bought a ~3.4x smaller per-doc
    constant (~0.13 ms/doc, all nine statistics)."""
    return gopher_zipf_flags(zipf_corpus_words(spark, sf_dir))


@query(
    "q_boilerplate_zipf",
    oracle=_boilerplate_sql(
        "zd",
        extra_ctes=_gopher_zipf_words_sql().strip()
        + ",\nzd AS MATERIALIZED (SELECT doc_id, array_to_string(words, ' ')"
        + " AS text FROM zdocs),\n",
    ),
)
def q_boilerplate_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_boilerplate_removal on the Zipf corpus (r10 verdict gap 1): the
    fixture's 31-word vocabulary makes cross-document 10-token chunks
    common by accident; on the Zipf corpus chunk collisions across
    documents are VANISHINGLY rare for natural text (doc-keyed hashes)
    while the keyword-stuffing class (doc_id % 10 == 3) shares its
    60-word alternating template VERBATIM across all its documents —
    the exact shape of real web boilerplate (nav chrome, license
    banners, SEO templates repeated across a site). The filter must
    therefore remove exactly the 6 template chunks from every stuffed
    doc and nothing else, giving the operator a sharp, fully predicted
    oracle on realistic df shape (asserted chunk-for-chunk in
    tests/test_stats_differential.py). Same SHIPPED expression graph as
    the fixture key (boilerplate_removal core); same plan shape on top
    of the zero-shuffle corpus generator.

    r13 optimization: the generated corpus is materialized once
    (localCheckpoint inside the timed query) — boilerplate_removal
    reads its docs relation twice (chunk explode, final join-back) and
    re-derives the chunk array in the final projection, so the
    generator ran three times in the un-shared plan (guide §2.4)."""
    zd = zipf_corpus_words(spark, sf_dir).select(
        "doc_id", F.concat_ws(" ", F.col("words")).alias("text")
    ).localCheckpoint()
    return boilerplate_removal(zd)


def _zipf_curation_oracle() -> str:
    """Compose the three Zipf-gate oracles VERBATIM as nested-WITH
    subqueries (zero re-derivation — whatever those oracles pin, this
    one joins), then apply the final verdict."""
    from .training import _perplexity_zipf_oracle

    rep = _gopher_zipf_oracle()
    ppl = _perplexity_zipf_oracle()
    boiler = _boilerplate_sql(
        "zd",
        extra_ctes=_gopher_zipf_words_sql().strip()
        + ",\nzd AS MATERIALIZED (SELECT doc_id, array_to_string(words, ' ')"
        + " AS text FROM zdocs),\n",
    )
    return f"""WITH rep AS (
    SELECT doc_id, passes_gopher_repetition FROM ({rep}) g
), ppl AS (
    SELECT doc_id, lang, keep AS ppl_keep FROM ({ppl}) p
), boiler AS (
    SELECT doc_id, n_chunks_kept, n_chunks_total FROM ({boiler}) b
)
SELECT r.doc_id, ppl.lang, r.passes_gopher_repetition, ppl.ppl_keep,
    b.n_chunks_kept * 1.0 / b.n_chunks_total AS boiler_frac_kept,
    (r.passes_gopher_repetition AND ppl.ppl_keep
     AND b.n_chunks_kept * 1.0 / b.n_chunks_total >= 0.5) AS keep_final
FROM rep r JOIN ppl USING (doc_id) JOIN boiler b USING (doc_id)"""


@query("q_zipf_curation_pipeline", oracle=_zipf_curation_oracle())
def q_zipf_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full text-quality stack fused into one verdict per document
    on the realistic Zipf corpus: Gopher table-A1 repetition flag
    (q_repetition_gopher_zipf) AND CCNet per-class perplexity keep
    (q_perplexity_zipf) AND a boilerplate-survival floor (>= half the
    doc's chunks survive q_boilerplate_zipf's removal). The three gate
    columns ship alongside the composite so a pipeline owner sees WHY a
    doc dropped. Composes the SHIPPED query graphs (the registered
    functions are called, not re-implemented) and the oracle composes
    the three oracle strings verbatim as nested-WITH subqueries — the
    verdict can never drift from its constituent gates.

    The gates measurably interact (the reason curation stacks them):
    the light-repetition class passes Gopher but is the LEAST
    predictable of the repetition-language group, so the perplexity
    tercile sends most of it to tail; heavy repetition fails Gopher
    outright while ranking HEAD on perplexity; stuffing fails Gopher
    and loses half its chunks to boilerplate removal. Splits asserted
    per class in tests/test_stats_differential.py.

    Scale shape: three independent branches over the zero-shuffle
    corpus generator (the zero-exchange Arrow repetition kernel, the
    LM's two count shuffles,
    the chunk-frequency shuffle) joined twice on doc_id — doc-level
    rows only; document bodies cross no join. At warehouse scale the
    doc_id joins co-locate under bucketing like every other doc-keyed
    composition here.

    r13 optimization: the three gate branches consume ONE materialized
    corpus (localCheckpoint inside the timed query) instead of each
    re-running the generator projection — the un-shared plan carried 14
    parquet scans / 30 exchanges with the generator + its concat/split
    re-derived per branch reference (guide §2.4/§3.3: dedupe repeated
    subtrees, truncate enormous plans). Values are unchanged: the
    corpus is deterministic and every branch reads the same rows the
    per-branch generators produced; the three registered gate keys keep
    their original self-generating plans."""
    from .training import perplexity_zipf_frame, zipf_lang_col

    zc = (
        zipf_corpus_words(spark, sf_dir)
        .withColumn("text", F.concat_ws(" ", F.col("words")))
        .localCheckpoint()
    )
    rep = gopher_zipf_flags(zc.select("doc_id", "words")).select(
        "doc_id", "passes_gopher_repetition"
    )
    ppl = perplexity_zipf_frame(
        spark, sf_dir, zd=zc.select("doc_id", "text", zipf_lang_col())
    ).select("doc_id", "lang", F.col("keep").alias("ppl_keep"))
    boiler = boilerplate_removal(zc.select("doc_id", "text")).select(
        "doc_id", "n_chunks_kept", "n_chunks_total"
    )
    frac = F.col("n_chunks_kept") * 1.0 / F.col("n_chunks_total")
    return (
        rep.join(ppl, "doc_id")
        .join(boiler, "doc_id")
        .select(
            "doc_id",
            "lang",
            "passes_gopher_repetition",
            "ppl_keep",
            frac.alias("boiler_frac_kept"),
            (
                F.col("passes_gopher_repetition")
                & F.col("ppl_keep")
                & (frac >= 0.5)
            ).alias("keep_final"),
        )
    )
