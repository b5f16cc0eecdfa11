"""Batch-checkable re-expressions of the reference's streaming semantics
(SURVEY.md §2.9): the Redis dedup queues, TTL-bounded dedup, idempotent
upsert, and event-time windowing — each as a deterministic batch query
with a DuckDB oracle. The live Structured Streaming forms (with real
watermarks and state stores) live in `streaming/crawl.py`; these batch
twins define the semantics the streams must converge to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

TTL_SECONDS = 6 * 3600  # the reference's 6 h user-dedup TTL (tasks.py:125-129)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "q_event_window_agg",
    oracle="""
SELECT make_timestamp(CAST(FLOOR(epoch(ts) / 600) AS BIGINT) * 600 * 1000000)
        AS window_start,
    event_type,
    COUNT(*) AS n_events,
    ROUND(SUM(value), 4) AS total_value
FROM events GROUP BY 1, 2""",
)
def q_event_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window (capability row, §2.9): 10-minute
    windows, count + sum per event type. Streaming form: identical
    groupBy(F.window(...)) plus withWatermark — see streaming/crawl.py."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_sliding_window_agg",
    oracle="""
WITH base AS (
    SELECT make_timestamp(
            (CAST(FLOOR(epoch(ts) / 300) AS BIGINT) * 300 - j * 300) * 1000000
        ) AS window_start,
        event_type, value
    FROM events, UNNEST(generate_series(0, 1)) AS u(j)
)
SELECT window_start, event_type,
    COUNT(*) AS n_events,
    ROUND(SUM(value), 4) AS total_value
FROM base GROUP BY 1, 2""",
)
def q_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time SLIDING window (capability row, §2.9): 10-minute windows
    sliding every 5 — each event lands in exactly duration/slide = 2
    overlapping windows. The oracle expands that membership explicitly
    (each event joins its 2 grid-aligned window starts); Spark's window()
    generates the same assignment inside codegen. Streaming form is the
    identical expression under a watermark. Scale: output is ~2x the
    tumbling rollup, shuffle key (window, type) — partials map-side."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_dedup_stream",
    oracle="""
SELECT event_id, ts, user_id, event_type FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
) t WHERE rn = 1""",
)
def q_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: permanent stream dedup (the match-id Redis SET,
    match/queue.py:24-25) — first event per key, deterministic
    (ts, event_id) arrival order. Streaming twin: dropDuplicates on an
    unbounded stream (state grows like the Redis SET grows)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type")
    )


@query(
    "q_dedup_ttl",
    oracle=f"""
SELECT event_id, ts, user_id, event_type FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, CAST(FLOOR(epoch(ts) / {TTL_SECONDS}) AS BIGINT)
        ORDER BY ts, event_id) AS rn
    FROM events
) t WHERE rn = 1""",
)
def q_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: TTL-bounded dedup (the 6 h Redis SETEX on user ids,
    redis.py:48-64) — first event per (key, 6 h epoch window). The
    streaming twin is withWatermark('ts','6 hours') +
    dropDuplicatesWithinWatermark (streaming/crawl.py); this batch form
    pins deterministic semantics the oracle can check."""
    bucket = F.floor(F.unix_timestamp("ts") / TTL_SECONDS).cast("bigint")
    w = Window.partitionBy("user_id", bucket).orderBy("ts", "event_id")
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "ts", "user_id", "event_type")
    )


@query(
    "q_idempotent_upsert",
    oracle="""
SELECT user_id, event_type, event_id, ts, value FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) t WHERE rn = 1""",
)
def q_idempotent_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3/S7: idempotent upsert (replace_one(upsert=True) keyed by _id,
    db/mongodb.py:52-56) — last-writer-wins per key. Streaming form:
    foreachBatch + MERGE INTO (Delta); emulated here as the
    latest-row-per-key window, which is also the batch backfill plan."""
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@query(
    "q_sessionize",
    oracle="""
WITH marked AS (
    SELECT user_id, ts, event_id,
        CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) > 1800 * 1000000
             OR LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS is_new
    FROM events
),
sessions AS (
    SELECT user_id, ts, event_id,
        SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
    FROM marked
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
    COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions GROUP BY user_id, session_no""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30 min inactivity gap) — the batch equivalent of
    streaming session_window. Gap test on exact integer microseconds so
    both engines agree. One exchange on user_id serves both windows and
    the final group-by."""
    return sessionize(_events(spark, sf_dir))


def sessionize(ev: DataFrame) -> DataFrame:
    """Reusable kernel behind q_sessionize (also driven by the bench's
    power-law skew microbench); see the query docstring."""
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(order_w)
    is_new = F.when(
        prev_us.isNull() | ((F.unix_micros(F.col("ts")) - prev_us) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_no", F.sum("is_new").over(run_w))
        .groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_no", "n_events", "session_start", "session_end")
    )


@query(
    "q_session_window_native",
    oracle="""
WITH marked AS (
    SELECT user_id, ts, event_id,
        CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
             OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800 * 1000000
             THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts,
        SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
    FROM marked
)
SELECT MIN(ts) AS session_start,
    MAX(ts) + INTERVAL 30 MINUTE AS session_end,
    user_id,
    COUNT(*) AS n_events
FROM sessions GROUP BY user_id, session_no""",
)
def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window (merging event-time sessions, the
    state-store operator streaming uses) differentially pinned against the
    independent lag+cumsum SQL formulation in the oracle — two unrelated
    session constructions must produce identical sessions. Boundary
    semantics encoded in the oracle: session_window's end (last event +
    gap) is EXCLUSIVE, so an event arriving exactly gap after its
    predecessor starts a NEW session (>= in the oracle's gap test, vs the
    strict > of q_sessionize's 'within-gap' convention)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


@query(
    "q_scd2",
    oracle="""
SELECT user_id, event_type, value, ts AS valid_from,
    LEAD(ts) OVER w AS valid_to,
    (LEAD(ts) OVER w IS NULL) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)""",
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history build: each observation of a (user_id,
    event_type) attribute becomes a versioned row with a validity
    interval — valid_from = its timestamp, valid_to = the next
    observation's (NULL ⇒ current). This is the batch backfill of the
    upsert sink's history (the reference's replace_one keeps only the
    last state, db/mongodb.py:52-56; SCD2 keeps them all, which is what
    time-travel joins like the as-of operator consume). One exchange on
    the key; lead() is the interval close — no self-join."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query("q_hll_rollup")
def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL sketches of distinct users,
    unioned upward for the all-time estimate WITHOUT rescanning raw data —
    the 100 TB distinct-count pattern (store a few-KB sketch per
    partition/day; any rollup level is a cheap sketch union, where exact
    countDistinct would re-shuffle every row every time). Spark's
    DataSketches hll_sketch_agg partials merge associatively, so map-side
    combine does most of the work. Rows-only check (sketch estimates are
    engine-specific); the error-bound test compares against exact."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n_events"),
    )
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_users"),
        F.sum("n_events").alias("n_events"),
    ).select(F.lit(None).cast("timestamp").alias("day"), "distinct_users", "n_events")
    per_day = daily.select(
        "day", F.hll_sketch_estimate("sk").alias("distinct_users"), "n_events"
    )
    return per_day.unionByName(total)


# --- count-min sketch: the mergeable heavy-hitters pattern ------------------

CM_DEPTH = 4  # independent hash rows
CM_WIDTH = 1024  # cells per row
CM_TOPK = 20


@query(
    "q_countmin_topk",
    oracle=f"""
WITH words AS (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
), exact_top AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS true_count
    FROM words GROUP BY word
    ORDER BY true_count DESC, word LIMIT {CM_TOPK}
), cells AS (
    SELECT seed,
        ('0x' || substr(md5(word || '#' || CAST(seed AS VARCHAR)), 1, 8))::BIGINT
            % {CM_WIDTH} AS cell,
        CAST(COUNT(*) AS BIGINT) AS c
    FROM words CROSS JOIN range({CM_DEPTH}) s(seed)
    GROUP BY 1, 2
), cand AS (
    SELECT t.word, t.true_count, s.seed,
        ('0x' || substr(md5(t.word || '#' || CAST(s.seed AS VARCHAR)), 1, 8))::BIGINT
            % {CM_WIDTH} AS cell
    FROM exact_top t CROSS JOIN range({CM_DEPTH}) s(seed)
)
SELECT cand.word, cand.true_count, MIN(cells.c) AS cm_estimate
FROM cand JOIN cells USING (seed, cell)
GROUP BY cand.word, cand.true_count""",
)
def q_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters over document tokens — the second
    mergeable-sketch pattern beside q_hll_rollup (Cormode & Muthukrishnan
    2005): the sketch is a fixed d x w grid of counters (here 4 x 1024 =
    4096 cells regardless of corpus size), each token increments one cell
    per hash row, and a token's estimate is the MIN over its d cells.
    Guarantees: estimate >= true count always; overestimate <= eps * N
    with probability ~1 - (1/2)^d for w = 2/eps. (The d rows are
    DIFFERENTLY-SEEDED applications of one base hash, not independent
    hash functions: two words colliding at the full-hash level collide in
    every row at once. That correlated tail is far below the sketch's own
    eps and is the standard engineering approximation.) At 100 TB the
    sketch is the state you keep per partition/day — cells merge by
    ADDITION, so any rollup level is a cheap cell-wise sum (the same
    store-the-sketch-not-the-rows move as the HLL rollup), and streaming
    updates are the same increment.

    Everything is native exprs: cell assignment is md5-prefix(word, seed)
    mod w inside the explode projection — the engine-portable bucket hash
    shared with KMV/link-graph/DSIR, which makes every cell count a
    deterministic GROUP BY in both engines and the whole sketch
    HASH-ORACLED (the second fully-oracled sketch after q_kmv_overlap;
    VERDICT r6 item 5). The sketch build is ONE groupBy over (seed, cell)
    with map-side partials; estimation joins candidate words' cells back
    and takes min over seeds. The invariant test asserts the CM bounds
    against exact counts."""
    from ..sources.tables import spread_input

    docs = spread_input(load_table(spark, sf_dir, "documents"))
    words = docs.select(F.explode(F.split("text", " ")).alias("word"))

    # candidates: the exact top-k words (what a production pipeline would
    # feed from a sample or a prior epoch); estimate each from the sketch
    exact_top = (
        words.groupBy("word")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.desc("true_count"), "word")
        .limit(CM_TOPK)
    )
    return (
        countmin_estimates(words, exact_top)
        .orderBy(F.desc("true_count"), "word")
        .select("word", "true_count", "cm_estimate")
    )


def _cm_seeds():
    return F.array(*[F.lit(i) for i in range(CM_DEPTH)])


def _cm_cell(word, seed):
    """Counter-cell assignment: md5-hex-prefix bucket of (word, seed) —
    the engine-portable hash shared with KMV / link_graph / hash_bucket,
    so DuckDB reproduces every cell bit-identically (the md5 prefix is in
    [0, 2^32), nonnegative, so % == pmod in both engines)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(word, F.lit("#"), seed.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % CM_WIDTH
    )


def countmin_sketch(words: DataFrame) -> DataFrame:
    """Build the d x w counter grid as a (seed, cell, c) frame: one groupBy
    with map-side partials; at most CM_DEPTH * CM_WIDTH rows regardless of
    corpus size. Cells merge by addition across partitions/days."""
    cells = words.select(
        F.col("word"), F.explode(_cm_seeds()).alias("seed")
    ).select("seed", _cm_cell(F.col("word"), F.col("seed")).alias("cell"))
    return cells.groupBy("seed", "cell").agg(F.count("*").alias("c"))


def countmin_estimates(words: DataFrame, candidates: DataFrame) -> DataFrame:
    """Estimate counts for an ARBITRARY candidate word set from the sketch
    built over `words` (column `word`; extra candidate columns pass
    through). The sketch side is tiny (<= d*w rows) and broadcast; the
    candidate side stays distributed, so corpus-wide estimation (every
    distinct word, as the invariant tests do) is a broadcast join, not a
    collect."""
    sketch = countmin_sketch(words)
    pass_through = [c for c in candidates.columns if c != "word"]
    cand_cells = candidates.select(
        "word", *pass_through, F.explode(_cm_seeds()).alias("seed")
    ).withColumn("cell", _cm_cell(F.col("word"), F.col("seed")))
    return (
        cand_cells.join(F.broadcast(sketch), ["seed", "cell"])
        .groupBy("word", *pass_through)
        .agg(F.min("c").alias("cm_estimate"))
    )


def _force_mtime_order(*dirs: str) -> None:
    """Pin strictly increasing modification times on the data files of the
    given spool directories, in argument order. FileStreamSource orders
    files by ms-granularity mtime, so sequentially written spool dirs can
    tie and be processed out of order — which would silently violate the
    cross-trigger ordering the live-stream correctness queries assume
    (ADVICE r5). Explicit utimes make the order guaranteed, not
    incidental."""
    import os
    import time

    base = time.time() - 600  # well in the past; only relative order matters
    step = 0
    for d in dirs:
        for fname in sorted(os.listdir(d)):
            if fname.startswith(("_", ".")):
                continue
            step += 1
            t = base + step * 2.0  # 2 s apart: far beyond ms granularity
            os.utime(os.path.join(d, fname), (t, t))


def _spool_event_slices(spark: SparkSession, ev: DataFrame, prefix: str) -> tuple:
    """Write the events frame as three mtime-ordered time-sliced parquet
    files and open a maxFilesPerTrigger=1 file stream over them — the
    shared spool for every live-streaming gate query (one definition so
    slice boundaries / ordering guarantees cannot drift between them).
    Returns (src_dir, stream_df); the caller owns cleanup of src_dir."""
    import tempfile

    src = tempfile.mkdtemp(prefix=prefix)
    ev.filter(F.col("ts") < "2024-01-11").coalesce(1).write.parquet(src + "/f=0")
    ev.filter(
        (F.col("ts") >= "2024-01-11") & (F.col("ts") < "2024-01-21")
    ).coalesce(1).write.parquet(src + "/f=1")
    ev.filter(F.col("ts") >= "2024-01-21").coalesce(1).write.parquet(src + "/f=2")
    _force_mtime_order(src + "/f=0", src + "/f=1", src + "/f=2")
    stream = (
        spark.readStream.schema(spark.read.parquet(src + "/f=0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f=*")
    )
    return src, stream


_STREAM_FUNNEL_RUNS = 0


@query(
    "q_stream_funnel_live",
    oracle="""
WITH anchored AS (
    SELECT user_id, ts, event_type,
        MIN(CASE WHEN event_type = 'view' THEN ts END)
            OVER (PARTITION BY user_id) AS t0
    FROM events
), a2 AS (
    SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= t0 THEN ts END)
            OVER (PARTITION BY user_id) AS t1
    FROM anchored
), a3 AS (
    SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= t1 THEN ts END)
            OVER (PARTITION BY user_id) AS t2
    FROM a2
), c AS (
    SELECT COUNT(DISTINCT CASE WHEN t0 IS NOT NULL THEN user_id END) AS n0,
        COUNT(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS n1,
        COUNT(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS n2
    FROM a3
)
SELECT 1 AS stage_no, 'view' AS stage, n0 AS n_users FROM c
UNION ALL SELECT 2, 'click', n1 FROM c
UNION ALL SELECT 3, 'purchase', n2 FROM c""",
)
def q_stream_funnel_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Structured Streaming execution under the correctness gate:
    the events fixture is written as three time-sliced files, the
    applyInPandasWithState funnel tracker (streaming/stateful.py) drains
    them as three micro-batches (state carrying across triggers), and
    the accumulated per-user stage anchors aggregate to stage counts —
    hash-compared against the BATCH window-cascade oracle. Counts are
    integers, so stream==batch equality is exact, not approximate
    (unlike the z-score twin, whose float baseline is tolerance-checked
    in pytest instead).

    The temp spool below is driver-local test plumbing; the operator
    under test is the stateful stream itself."""
    import shutil

    global _STREAM_FUNNEL_RUNS
    _STREAM_FUNNEL_RUNS += 1
    run_id = _STREAM_FUNNEL_RUNS

    from ..streaming.crawl import run_to_completion
    from ..streaming.stateful import streaming_funnel

    ev = _events(spark, sf_dir)
    src, stream = _spool_event_slices(spark, ev, "graft_funnel_stream_")
    try:
        table = f"funnel_live_{run_id}"
        run_to_completion(
            streaming_funnel(stream), query_name=table, output_mode="update"
        )
        out = spark.table(table)
        # memory sink holds every trigger's emission; anchors only ever
        # fill in, so the row with the most non-null anchors per user is
        # the final state
        filled = (
            F.when(F.col("t0").isNotNull(), 1).otherwise(0)
            + F.when(F.col("t1").isNotNull(), 1).otherwise(0)
            + F.when(F.col("t2").isNotNull(), 1).otherwise(0)
        )
        w = Window.partitionBy("user_id").orderBy(F.col("filled").desc())
        latest = (
            out.withColumn("filled", filled)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        counts = latest.agg(
            F.sum(F.when(F.col("t0").isNotNull(), 1).otherwise(0)).alias("n0"),
            F.sum(F.when(F.col("t1").isNotNull(), 1).otherwise(0)).alias("n1"),
            F.sum(F.when(F.col("t2").isNotNull(), 1).otherwise(0)).alias("n2"),
        )
        rows = [
            F.struct(
                F.lit(i + 1).alias("stage_no"),
                F.lit(stage).alias("stage"),
                F.col(f"n{i}").alias("n_users"),
            )
            for i, stage in enumerate(("view", "click", "purchase"))
        ]
        result = counts.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
        # materialize before the source spool disappears (memory-sink
        # rows are already driver-side; this pins the derived frame too)
        result = result.localCheckpoint()
        return result
    finally:
        shutil.rmtree(src, ignore_errors=True)


_STREAM_DEDUP_RUNS = 0


from .dedup import _BOW_FP_SQL as _DEDUP_BOW_FP_SQL
from .dedup import _INGEST_MOD as _DEDUP_INGEST_MOD

@query(
    "q_stream_dedup_live",
    oracle=f"""
WITH fp AS (
    SELECT doc_id, {_DEDUP_BOW_FP_SQL} AS fingerprint,
        doc_id % {_DEDUP_INGEST_MOD} = {_DEDUP_INGEST_MOD - 1} AS is_batch
    FROM documents
),
existing AS (SELECT DISTINCT fingerprint FROM fp WHERE NOT is_batch)
SELECT MIN(doc_id) AS doc_id, fingerprint
FROM fp
WHERE is_batch
    AND fingerprint NOT IN (SELECT fingerprint FROM existing)
GROUP BY fingerprint""",
)
def q_stream_dedup_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second REAL Structured Streaming execution under the
    correctness gate (after q_stream_funnel_live): incremental-ingest
    dedup admission on a LIVE stream. The already-ingested corpus
    (doc_id % 5 != 4) and the new batch (doc_id % 5 == 4) are spooled as
    two mtime-ordered files; `dedup_forever` (dropDuplicates on the
    order-insensitive bow fingerprint — the reference's Redis SET
    admission, extractor/riot/db/redis.py:48-64, lifted to content) drains
    them as two micro-batches with the dedup state store carrying the
    corpus fingerprints across the trigger boundary. A batch doc reaches
    the sink iff its fingerprint was NOT seen in the corpus trigger nor
    earlier in its own — i.e. exactly q_dedup_incremental's accept=true
    set at fingerprint granularity.

    Which batch doc survives a within-batch collision is dropDuplicates-
    nondeterministic, so the output is fingerprint-keyed with the
    min batch doc_id joined back after completion (integer + hex columns
    -> exact hash equality against the batch oracle, like the funnel's
    integer stage counts and unlike the float z-score twin)."""
    import shutil
    import tempfile

    global _STREAM_DEDUP_RUNS
    _STREAM_DEDUP_RUNS += 1
    run_id = _STREAM_DEDUP_RUNS

    from ..streaming.crawl import dedup_forever, run_to_completion
    from .dedup import _INGEST_MOD, bow_fingerprint

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        bow_fingerprint().alias("fingerprint"),
        (F.col("doc_id") % _INGEST_MOD == _INGEST_MOD - 1).alias("is_batch"),
    )
    src = tempfile.mkdtemp(prefix="graft_dedup_stream_")
    try:
        docs.filter(~F.col("is_batch")).coalesce(1).write.parquet(src + "/f=0")
        docs.filter(F.col("is_batch")).coalesce(1).write.parquet(src + "/f=1")
        _force_mtime_order(src + "/f=0", src + "/f=1")
        stream = (
            spark.readStream.schema(spark.read.parquet(src + "/f=0").schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/f=*")
        )
        table = f"dedup_live_{run_id}"
        run_to_completion(dedup_forever(stream, "fingerprint"), query_name=table)
        admitted = spark.table(table).filter(F.col("is_batch")).select("fingerprint")
        result = (
            docs.filter(F.col("is_batch"))
            .join(admitted, "fingerprint", "left_semi")
            .groupBy("fingerprint")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id", "fingerprint")
        )
        # materialize before the source spool disappears
        return result.localCheckpoint()
    finally:
        shutil.rmtree(src, ignore_errors=True)


KMV_K = 256


@query(
    "q_kmv_overlap",
    oracle=f"""
WITH wh AS (
    SELECT DISTINCT source,
        ('0x' || substr(md5(w.w), 1, 8))::BIGINT AS h
    FROM documents, UNNEST(string_split(text, ' ')) AS w(w)
    WHERE w.w <> ''
),
sk AS (
    SELECT source, h FROM (
        SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM wh
    ) WHERE rn <= {KMV_K}
),
names AS (SELECT DISTINCT source FROM documents),
prs AS (
    SELECT x.source AS s1, y.source AS s2 FROM names x JOIN names y
    ON x.source < y.source
),
uni AS (
    SELECT p.s1, p.s2, k.h,
        MAX(CASE WHEN k.source = p.s1 THEN 1 ELSE 0 END) AS in1,
        MAX(CASE WHEN k.source = p.s2 THEN 1 ELSE 0 END) AS in2
    FROM prs p JOIN sk k ON k.source IN (p.s1, p.s2)
    GROUP BY p.s1, p.s2, k.h
),
kept AS (
    SELECT s1, s2, h, in1, in2,
        ROW_NUMBER() OVER (PARTITION BY s1, s2 ORDER BY h) AS rn
    FROM uni
)
SELECT s1, s2,
    CAST(COUNT(*) AS BIGINT) AS k_eff,
    CAST(SUM(in1 * in2) AS BIGINT) AS n_both,
    ROUND(SUM(in1 * in2) * 1.0 / COUNT(*), 6) AS jaccard_kmv,
    ROUND(CASE WHEN COUNT(*) >= {KMV_K}
        THEN ({KMV_K} - 1) * 4294967296.0 / MAX(h)
        ELSE COUNT(*) END, 2) AS union_distinct_est
FROM kept WHERE rn <= {KMV_K}
GROUP BY s1, s2""",
)
def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values sketch overlap between per-source vocabularies:
    for every source pair, the KMV Jaccard estimate (|kept ∩ both| / k
    over the k smallest hashes of the union — Beyer et al., SIGMOD'07),
    plus the KMV union-distinct estimate ((k-1)/u_k). The deterministic
    md5-prefix hash makes the whole sketch BIT-IDENTICAL in both engines,
    so unlike HLL/count-min (rows-only + bound tests) this sketch is
    fully hash-oracled; the accuracy-vs-exact bound is asserted in
    tests/test_northstar.py.

    Scale shape: the only corpus-wide work is one distinct over
    (source, hash) — map-side partial dedup on 8-byte keys, never words
    after the hash. Each source's sketch is <= k rows BY CONSTRUCTION,
    so the pair stage (union, re-rank, membership) runs on
    |sources|^2 * k rows — broadcast-sized regardless of corpus scale,
    exactly why KMV beats exact pairwise vocabulary Jaccard (which needs
    a vocab x vocab join per pair) at 100 TB. Sketches are mergeable:
    the streaming form unions per-batch sketches and re-trims to k."""
    docs = load_table(spark, sf_dir, "documents")
    wh = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .select(
            "source",
            F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("bigint").alias("h"),
        )
    )
    return kmv_overlap_from_hashes(wh)


def kmv_overlap_from_hashes(wh: DataFrame, k: int = KMV_K) -> DataFrame:
    """KMV pair-overlap core over a RAW (source, h) token-hash stream
    with h uniform in [0, 2^32) — duplicates welcome; factored out so the
    bench's large-vocabulary microbench (where the sketch's shape
    actually matters; the fixture vocabulary is 31 words) can drive it
    with synthetic data.

    The build needs ZERO corpus-wide shuffles — the structural win over
    the exact pairwise form (which must distinct the full (source, word)
    relation and then pay sum_w C(sources_with_w, 2) join rows):
    1. per-source approx-distinct — map-side partial HLL aggregation;
    2. threshold pre-filter h <= 8k/(nd/(1+3*rsd)) * 2^32 on the RAW
       stream (uniform hashes put the true k-th distinct minimum at
       ~k/n * 2^32; the 8x margin makes losing a minimum a Chernoff-tail
       event, and deflating nd by HLL's 3-sigma relative error band
       (default rsd 0.05) covers the estimator overshooting the true
       distinct count; sources with n <= 8k skip the filter);
    3. distinct + exact k-minima window over only the ~9k survivors per
       source.
    The filter is PROBABILISTICALLY result-invariant, not certainly so:
    a >3-sigma HLL overestimate combined with an extreme upper-tail hash
    layout could still drop a true k-minimum (probability bounded by the
    product of a 3-sigma Gaussian tail and a Chernoff tail at 8x margin,
    << 1e-9 per source). Oracle parity therefore holds up to that
    negligible tail, and the paired DuckDB oracle applies no pre-filter
    at all — a filter-induced divergence would surface as a driver hash
    mismatch rather than pass silently."""
    hll_rsd = 0.05  # approx_count_distinct default relative s.d.
    approx = wh.groupBy("source").agg(F.approx_count_distinct("h").alias("nd"))
    thr = approx.select(
        "source",
        F.when(F.col("nd") <= 8 * k, F.lit(2**32))
        .otherwise(
            (
                F.lit(float(8 * k * 2**32) * (1.0 + 3.0 * hll_rsd))
                / F.col("nd")
            ).cast("long")
        )
        .alias("thr"),
    )
    pre = (
        wh.join(F.broadcast(thr), "source")
        .filter(F.col("h") <= F.col("thr"))
        .select("source", "h")
        .distinct()
    )
    wsk = Window.partitionBy("source").orderBy("h")
    sk = pre.withColumn("rn", F.row_number().over(wsk)).filter(
        F.col("rn") <= k
    ).select("source", "h")
    names = wh.select("source").distinct()
    prs = (
        names.select(F.col("source").alias("s1"))
        .crossJoin(names.select(F.col("source").alias("s2")))
        .filter(F.col("s1") < F.col("s2"))
    )
    uni = (
        F.broadcast(prs)
        .join(sk, (sk.source == prs.s1) | (sk.source == prs.s2))
        .groupBy("s1", "s2", "h")
        .agg(
            F.max(F.when(F.col("source") == F.col("s1"), 1).otherwise(0)).alias("in1"),
            F.max(F.when(F.col("source") == F.col("s2"), 1).otherwise(0)).alias("in2"),
        )
    )
    wp = Window.partitionBy("s1", "s2").orderBy("h")
    kept = uni.withColumn("rn", F.row_number().over(wp)).filter(F.col("rn") <= k)
    return kept.groupBy("s1", "s2").agg(
        F.count("*").cast("bigint").alias("k_eff"),
        F.sum(F.col("in1") * F.col("in2")).cast("bigint").alias("n_both"),
        F.round(
            F.sum(F.col("in1") * F.col("in2")) * 1.0 / F.count("*"), 6
        ).alias("jaccard_kmv"),
        F.round(
            F.when(
                F.count("*") >= k,
                (k - 1) * 4294967296.0 / F.max("h"),
            ).otherwise(F.count("*").cast("double")),
            2,
        ).alias("union_distinct_est"),
    )


_STREAM_WINDOW_RUNS = 0


@query(
    "q_stream_window_live",
    oracle="""
SELECT make_timestamp(CAST(FLOOR(epoch(ts) / 600) AS BIGINT) * 600 * 1000000)
        AS window_start,
    event_type,
    COUNT(*) AS n_events
FROM events GROUP BY 1, 2""",
)
def q_stream_window_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third REAL Structured Streaming execution under the correctness
    gate: event-time tumbling-window counts (10 min x event_type) over a
    watermarked stream drained as three mtime-ordered micro-batches,
    hash-compared against the batch GROUP BY oracle. Update-mode memory
    sink holds every trigger's emission for a window; counts only grow,
    so MAX per key is the final state — and counts are integers, so
    stream == batch equality is exact (the float-sum twin
    q_event_window_agg stays the batch-oracled form).

    The windowed-aggregation state store (not dropDuplicates, not
    applyInPandasWithState) is the operator family this run covers —
    with q_stream_funnel_live and q_stream_dedup_live, all three
    stateful-streaming families Spark offers are now driver-gated."""
    import shutil

    global _STREAM_WINDOW_RUNS
    _STREAM_WINDOW_RUNS += 1
    run_id = _STREAM_WINDOW_RUNS

    from ..streaming.crawl import run_to_completion

    ev = _events(spark, sf_dir)
    src, stream = _spool_event_slices(spark, ev, "graft_window_stream_")
    try:
        counts = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "10 minutes"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("window.start").alias("window_start"), "event_type", "n"
            )
        )
        table = f"window_live_{run_id}"
        run_to_completion(counts, query_name=table, output_mode="update")
        result = (
            spark.table(table)
            .groupBy("window_start", "event_type")
            .agg(F.max("n").alias("n_events"))
        )
        return result.localCheckpoint()
    finally:
        shutil.rmtree(src, ignore_errors=True)


_STREAM_SESSION_RUNS = 0


@query(
    "q_stream_session_live",
    oracle="""
WITH marked AS (
    -- >= gap, not >: F.session_window opens a NEW session when the gap
    -- EQUALS the timeout (end-exclusive windows), matching the
    -- q_session_window_native oracle; event_id tie-break on BOTH windows
    SELECT user_id, ts, event_id,
        CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) >= 1800 * 1000000
             OR LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS is_new
    FROM events
),
sessions AS (
    SELECT user_id, ts,
        SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
    FROM marked
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
    COUNT(*) AS n_events
FROM sessions GROUP BY user_id, session_no""",
)
def q_stream_session_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth REAL Structured Streaming execution under the correctness
    gate, covering the last stateful-streaming family: SESSION-WINDOW
    state (F.session_window — gap-based window merging inside the state
    store, a different implementation from tumbling-window aggregation
    state). Events drain as three mtime-ordered time-sliced triggers; a
    user's open session must survive the trigger boundary and extend
    when the next slice continues it. Complete-mode output (session
    windows support append/complete only) re-emits the fully merged
    state per trigger, so the sink's last snapshot is the final session
    table. session_end converts from Spark's
    window.end (last event + gap) back to last-event time, making the
    result comparable — exactly — to the batch gap-cascade oracle
    (q_sessionize's semantics, integer counts + timestamps)."""
    import shutil

    global _STREAM_SESSION_RUNS
    _STREAM_SESSION_RUNS += 1
    run_id = _STREAM_SESSION_RUNS

    from ..streaming.crawl import run_to_completion

    ev = _events(spark, sf_dir)
    src, stream = _spool_event_slices(spark, ev, "graft_session_stream_")
    try:
        sess = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("session_window.start").alias("session_start"),
                (F.col("session_window.end") - F.expr("INTERVAL 30 MINUTES")).alias(
                    "session_end"
                ),
                "user_id",
                "n",
            )
        )
        table = f"session_live_{run_id}"
        # session-window aggregation supports append/complete only (update
        # raises STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION); complete
        # re-emits the full merged state every trigger, so the sink's
        # final content IS the final session table — no per-key
        # finalization needed
        run_to_completion(sess, query_name=table, output_mode="complete")
        result = spark.table(table).select(
            "user_id", "session_start", "session_end", F.col("n").alias("n_events")
        )
        return result.localCheckpoint()
    finally:
        shutil.rmtree(src, ignore_errors=True)


_STREAM_JOIN_RUNS = 0


@query(
    "q_stream_join_live",
    oracle="""
SELECT p.event_id, p.user_id,
    COUNT(c.event_id) AS n_clicks,
    ROUND(COALESCE(SUM(c.value), 0.0), 4) AS click_value
FROM events p LEFT JOIN events c
    ON c.user_id = p.user_id AND c.event_type = 'click'
    AND epoch_us(c.ts) > epoch_us(p.ts)
    AND epoch_us(c.ts) <= epoch_us(p.ts) + 1800000000
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id""",
)
def q_stream_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth REAL Structured Streaming execution under the correctness
    gate: the watermarked STREAM-STREAM interval join (attribution_join —
    clicks within 30 min after a purchase by the same user), covering the
    join state store (buffered rows on both sides, watermark-bounded
    eviction) — the last stateful-streaming mechanism beside dedup,
    arbitrary state, windowed-agg and session-window state, all now
    driver-gated. Events drain as three mtime-ordered time slices;
    matches whose purchase and click arrive in DIFFERENT triggers must
    come out of buffered join state.

    Inner-join matches emit as found (append mode; the watermark bounds
    state, not emission), so the sink holds the exact matched pair set;
    the batch LEFT-join shape (zero-click purchases included) is
    restored by joining the rollup back to the purchase table — the
    operator under test is the streaming join itself."""
    import shutil

    global _STREAM_JOIN_RUNS
    _STREAM_JOIN_RUNS += 1
    run_id = _STREAM_JOIN_RUNS

    from ..streaming.crawl import attribution_join, run_to_completion

    ev = _events(spark, sf_dir)
    src, stream = _spool_event_slices(spark, ev, "graft_join_stream_")
    try:
        joined = attribution_join(
            stream.filter(F.col("event_type") == "purchase"),
            stream.filter(F.col("event_type") == "click"),
        )
        table = f"join_live_{run_id}"
        run_to_completion(joined, query_name=table)
        matched = (
            spark.table(table)
            .groupBy(F.col("p_id").alias("event_id"), F.col("p_user").alias("user_id"))
            .agg(
                F.count("*").alias("mn"),
                F.sum("click_value").alias("mv"),
            )
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id"
        )
        result = purchases.join(matched, ["event_id", "user_id"], "left").select(
            "event_id",
            "user_id",
            F.coalesce("mn", F.lit(0)).alias("n_clicks"),
            F.round(F.coalesce("mv", F.lit(0.0)), 4).alias("click_value"),
        )
        return result.localCheckpoint()
    finally:
        shutil.rmtree(src, ignore_errors=True)


# --- CDC apply (change-log -> snapshot) --------------------------------------


_CDC_ORACLE = """
WITH log AS (
    SELECT user_id,
        CASE event_type WHEN 'signup' THEN 'I'
                        WHEN 'error' THEN 'D'
                        ELSE 'U' END AS op,
        value, ts, event_id
    FROM events
), latest AS (
    SELECT user_id, op, value,
        CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes,
        ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn
    FROM log
)
SELECT user_id, op AS last_op, ROUND(value, 6) AS last_value, n_changes
FROM latest WHERE rn = 1 AND op <> 'D'
ORDER BY user_id"""


@query("q_cdc_apply", oracle=_CDC_ORACLE)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: collapse an insert/update/delete change
    log to the live snapshot with latest-wins semantics — the batch core
    of every lakehouse MERGE (the op mapping here derives a deterministic
    I/U/D log from the events fixture; in production it is the Debezium
    `op` field). A key whose LAST change is a delete leaves the snapshot
    entirely (tombstone); everything else surfaces its most recent value
    with the change count as audit metadata.

    Scale shape: one user_id exchange shared by both windows (count +
    row_number over the same partition), then a rank-1 filter — never a
    self-join against "current state", which is how CDC apply quadratic
    blowups happen. Ties broken by (ts, event_id) so replayed logs are
    idempotent. Complements q_idempotent_upsert (per-batch sink
    semantics) and q_scd2_build (full history); this is the
    snapshot-read path."""
    log = _events(spark, sf_dir).select(
        "user_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        "value",
        "ts",
        "event_id",
    )
    pk = Window.partitionBy("user_id")
    latest = log.select(
        "user_id",
        "op",
        "value",
        F.count("*").over(pk).cast("bigint").alias("n_changes"),
        F.row_number()
        .over(pk.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn"),
    )
    return (
        latest.filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("op").alias("last_op"),
            F.round("value", 6).alias("last_value"),
            "n_changes",
        )
        .orderBy("user_id")
    )


_STREAM_CDC_RUNS = 0


@query("q_stream_cdc_live", oracle=_CDC_ORACLE)
def q_stream_cdc_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SIXTH live stateful-streaming gate query: CDC latest-wins apply
    on a REAL stream. The derived I/U/D change log replays through the
    shared three-slice spool as three micro-batches; the
    applyInPandasWithState tracker (streaming/stateful.py::cdc_tracker)
    folds each trigger into per-key (count, latest-watermark, op, value)
    state and emits the key's current snapshot. The final answer takes
    each user's LAST emitted snapshot (max n_changes — strictly
    increasing, so it identifies the final trigger that saw the key),
    drops delete-tombstoned keys, and must hash-match q_cdc_apply's
    BATCH oracle exactly: the change count accumulates across all three
    triggers, so parity is impossible unless the state store carries —
    this is the streaming shape of a foreachBatch MERGE INTO
    (upsert_sink's transactional twin) under the exact driver gate."""
    import shutil

    global _STREAM_CDC_RUNS
    _STREAM_CDC_RUNS += 1
    run_id = _STREAM_CDC_RUNS

    from ..streaming.crawl import run_to_completion
    from ..streaming.stateful import apply_cdc

    log = _events(spark, sf_dir).select(
        "user_id",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        "value",
        "ts",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    src, stream = _spool_event_slices(spark, log, "graft_cdc_stream_")
    try:
        table = f"cdc_live_{run_id}"
        run_to_completion(
            apply_cdc(
                stream.select("user_id", "op", "value", "ts_us", "event_id")
            ),
            query_name=table,
            output_mode="update",
        )
        emitted = spark.table(table)
        w = Window.partitionBy("user_id").orderBy(F.col("n_changes").desc())
        result = (
            emitted.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("last_op") != "D"))
            .select(
                "user_id",
                "last_op",
                F.round("last_value", 6).alias("last_value"),
                "n_changes",
            )
            .orderBy("user_id")
        )
        return result.localCheckpoint()
    finally:
        shutil.rmtree(src, ignore_errors=True)


_STREAM_ENRICH_RUNS = 0


@query(
    "q_stream_enrich_live",
    oracle="""
WITH dim AS (
    SELECT c_custkey, c_mktsegment, c_nationkey
    FROM customer
), keyed AS (
    SELECT e.event_id, e.user_id, e.event_type, e.value,
        d.c_mktsegment AS segment
    FROM events e
    JOIN dim d
      ON d.c_custkey = e.user_id % (SELECT MAX(c_custkey) + 1 FROM customer)
)
SELECT segment, event_type,
    CAST(COUNT(*) AS BIGINT) AS n_events,
    ROUND(SUM(value), 4) AS total_value
FROM keyed GROUP BY segment, event_type
ORDER BY segment, event_type""",
)
def q_stream_enrich_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SEVENTH live streaming gate query, exercising the one join
    mechanism not yet under the hash gate: STREAM-STATIC enrichment —
    each micro-batch of the event stream joins the static customer
    dimension (the canonical bronze->silver enrichment step; Spark
    re-resolves the static side per trigger, broadcast-joining it
    against each batch). Stateless by design — the gate here proves the
    per-trigger join plumbing and the cross-trigger AGGREGATION of
    enriched results, complementing the five stateful mechanisms and
    the stream-stream join. The user->customer key is the deterministic
    modulo mapping (every user resolves; no null segment branch to
    hide in)."""
    import shutil

    global _STREAM_ENRICH_RUNS
    _STREAM_ENRICH_RUNS += 1
    run_id = _STREAM_ENRICH_RUNS

    from ..streaming.crawl import run_to_completion

    ev = _events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    n_cust = cust.agg((F.max("c_custkey") + 1).alias("n")).first()["n"]
    dim = cust.select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    src, stream = _spool_event_slices(spark, ev, "graft_enrich_stream_")
    try:
        enriched = (
            stream.withColumn("c_custkey", F.col("user_id") % F.lit(int(n_cust)))
            .join(F.broadcast(dim), "c_custkey")
            .select("event_id", "segment", "event_type", "value")
        )
        table = f"enrich_live_{run_id}"
        run_to_completion(enriched, query_name=table)
        return (
            spark.table(table)
            .groupBy("segment", "event_type")
            .agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.round(F.sum("value"), 4).alias("total_value"),
            )
            .orderBy("segment", "event_type")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


_STREAM_TIMEOUT_RUNS = 0

SESSION_CLOSE_DELAY = "0 seconds"  # watermark delay for the timeout query


def stream_timeout_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the EventTimeTimeout sessionizer over the three-slice spool;
    returns the emitted (user_id, start_us, end_us, n_events) frame."""
    import shutil

    global _STREAM_TIMEOUT_RUNS
    _STREAM_TIMEOUT_RUNS += 1
    run_id = _STREAM_TIMEOUT_RUNS

    from ..streaming.crawl import run_to_completion
    from ..streaming.stateful import close_sessions

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id")
    src, stream = _spool_event_slices(spark, ev, "graft_timeout_stream_")
    try:
        prepared = stream.withWatermark("ts", SESSION_CLOSE_DELAY).select(
            "user_id", "ts", F.unix_micros("ts").alias("ts_us"), "event_id"
        )
        table = f"timeout_sessions_{run_id}"
        run_to_completion(
            close_sessions(prepared, 1800),
            query_name=table,
            output_mode="append",
        )
        return spark.table(table).localCheckpoint()
    finally:
        shutil.rmtree(src, ignore_errors=True)


@query(
    "q_stream_timeout_sessions_live",
    oracle="""
WITH marked AS (
    SELECT user_id, ts, event_id,
        CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000
             OR LAG(epoch_us(ts)) OVER w IS NULL
             THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
    SELECT user_id, ts, event_id,
        SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
    FROM marked
), per_sess AS (
    SELECT user_id, session_no,
        MIN(epoch_us(ts)) AS start_us,
        MAX(epoch_us(ts)) AS end_us,
        CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_no
), flagged AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY session_no DESC) = 1 AS is_last
    FROM per_sess
), wm AS (SELECT MAX(epoch_us(ts)) AS wm_us FROM events)
SELECT user_id, start_us, end_us, n_events
FROM flagged CROSS JOIN wm
WHERE NOT is_last
   OR (end_us + 1800 * 1000000) // 1000 < wm_us // 1000
ORDER BY user_id, start_us""",
)
def q_stream_timeout_sessions_live(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The EIGHTH live streaming gate query, and the first to put
    **event-time TIMEOUTS** (GroupStateTimeout.EventTimeTimeout) under
    the exact hash gate — the one stateful-streaming mechanism the
    NoTimeout trackers left unexercised. Custom sessionization in
    applyInPandasWithState: gap-closed sessions emit when their closing
    event arrives; each key's TRAILING session emits only when Spark's
    watermark passes last_event + gap and invokes the function with
    hasTimedOut (no data for the key needed).

    The oracle replays the timeout rule deterministically: with a
    0-second watermark delay over the mtime-pinned three-slice spool,
    availableNow runs a final timeout pass after the last data batch, so
    a trailing session fires iff floor((end+gap)/1ms) < floor(final
    watermark/1ms) — the millisecond floors are Spark's internal
    watermark granularity, EMPIRICALLY pinned (143 of 150 fixture
    trailing sessions fire; the 7 ending within the gap of corpus end
    stay in state forever, exactly as a real deployment would hold them
    open). Integer microsecond outputs -> exact hash equality."""
    return stream_timeout_sessions(spark, sf_dir).orderBy(
        "user_id", "start_us"
    )


_STREAM_RIDGE_RUNS = 0


def _ridge_feats_cols():
    """Deterministic event features for the streaming ridge model:
    y = value, x1 = user decile, x2 = hour-of-day fraction."""
    return (
        F.col("value").alias("y"),
        ((F.col("user_id") % 10) / 10.0).alias("x1"),
        (F.hour("ts") / 24.0).alias("x2"),
    )


def _stream_ridge_oracle() -> str:
    from .mlkit import _solve_sql

    e0, e1, e2 = _solve_sql("zb", "s")
    return f"""WITH feats AS (
    SELECT value AS y,
        CAST(user_id % 10 AS DOUBLE) / 10.0 AS x1,
        EXTRACT(hour FROM ts) / 24.0 AS x2
    FROM events
),
zb AS (SELECT 0.0 b0, 0.0 b1, 0.0 b2),
s AS (
    SELECT SUM(1.0) AS sw, SUM(x1) AS swx1, SUM(x2) AS swx2,
        SUM(x1 * x1) AS sw11, SUM(x1 * x2) AS sw12, SUM(x2 * x2) AS sw22,
        SUM(y) AS g0, SUM(y * x1) AS g1, SUM(y * x2) AS g2,
        CAST(COUNT(*) AS DOUBLE) AS n
    FROM feats
),
beta AS (SELECT {e0} AS b0, {e1} AS b1, {e2} AS b2, n FROM s CROSS JOIN zb)
SELECT param, ROUND(value, 6) AS value FROM (
    SELECT 'beta0' AS param, b0 AS value FROM beta
    UNION ALL SELECT 'beta1', b1 FROM beta
    UNION ALL SELECT 'beta2', b2 FROM beta
    UNION ALL SELECT 'n_rows', n FROM beta
    UNION ALL SELECT 'n_batches', 3.0
)"""


@query("q_stream_ridge_live", oracle=_stream_ridge_oracle())
def q_stream_ridge_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NINTH live Structured Streaming gate query — and the first that
    TRAINS A MODEL on the stream: ridge OLS maintained incrementally
    via MERGEABLE SUFFICIENT STATISTICS. Each micro-batch (three
    mtime-ordered event-time slices) reduces to its 9 Gram/moment sums
    inside foreachBatch; the driver accumulates them (pure scalar
    addition — the merge operation that makes this pattern work on any
    number of executors, batches, or days), and after the final trigger
    ONE Cramer solve yields betas that hash-match the batch SQL fit
    over the same rows. This is incremental model maintenance as a
    warehouse should do it: no replay, no parameter server, state =
    9 doubles.

    Scale: per batch one codegen pass + a 9-double reduce; cross-batch
    state is O(1) regardless of history length; the final solve is
    driver arithmetic."""
    import shutil

    from .mlkit import _solve_py

    global _STREAM_RIDGE_RUNS
    _STREAM_RIDGE_RUNS += 1

    ev = _events(spark, sf_dir)
    src, stream = _spool_event_slices(spark, ev, "graft_ridge_stream_")
    acc = {"sums": [0.0] * 9, "n": 0.0, "batches": 0}

    def sink(batch_df, batch_id):
        feats = batch_df.select(*_ridge_feats_cols())
        r = feats.agg(
            F.sum(F.lit(1.0)),
            F.sum("x1"),
            F.sum("x2"),
            F.sum(F.col("x1") * F.col("x1")),
            F.sum(F.col("x1") * F.col("x2")),
            F.sum(F.col("x2") * F.col("x2")),
            F.sum("y"),
            F.sum(F.col("y") * F.col("x1")),
            F.sum(F.col("y") * F.col("x2")),
            F.count("*").cast("double"),
        ).first()
        if r[9] and r[9] > 0:
            for i in range(9):
                acc["sums"][i] += r[i]
            acc["n"] += r[9]
            acc["batches"] += 1

    try:
        from ..streaming.crawl import run_to_completion

        run_to_completion(stream, sink_fn=sink)
    finally:
        shutil.rmtree(src, ignore_errors=True)
    beta = _solve_py((0.0, 0.0, 0.0), tuple(acc["sums"]))
    rows = [
        ("beta0", beta[0]),
        ("beta1", beta[1]),
        ("beta2", beta[2]),
        ("n_rows", acc["n"]),
        ("n_batches", float(acc["batches"])),
    ]
    out = spark.createDataFrame(rows, "param string, value double")
    return out.select("param", F.round("value", 6).alias("value"))


# Correlated-sampling join cardinality estimation (Vengerov et al.,
# VLDB 2015): sample JOIN KEYS with a shared deterministic hash so both
# sides keep the SAME keys, estimate |A join B| = sum over sampled keys
# of f_A * f_B, scaled by 1/p. The planner-statistics primitive for
# 100 TB joins: the estimate costs one filtered scan per side.
JOINEST_MOD = 64  # p = 1/64


@query(
    "q_join_size_estimate",
    oracle=f"""
WITH fa AS MATERIALIZED (
    SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS fa
    FROM lineitem GROUP BY 1
), fb AS MATERIALIZED (
    SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS fb
    FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
), joined AS MATERIALIZED (
    SELECT fa.k, fa.fa, fb.fb,
        ('0x' || substr(md5(CAST(fa.k AS VARCHAR)), 1, 8))::BIGINT
            % {JOINEST_MOD} = 0 AS sampled
    FROM fa JOIN fb USING (k)
)
SELECT
    CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
        AS n_sampled_keys,
    CAST(SUM(fa * fb) AS BIGINT) AS true_join_size,
    CAST({JOINEST_MOD} * SUM(CASE WHEN sampled THEN fa * fb ELSE 0 END)
        AS BIGINT) AS est_join_size,
    ROUND({JOINEST_MOD} * SUM(CASE WHEN sampled THEN fa * fb ELSE 0 END)
        * 1.0 / SUM(fa * fb) - 1, 6) AS rel_error
FROM joined""",
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation by CORRELATED SAMPLING (Vengerov et al.
    2015): |A join B on k| = sum_k f_A(k)*f_B(k); sampling KEYS with a
    shared md5 hash (p = 1/{JOINEST_MOD}) keeps the SAME keys on both
    sides, so the estimator sum_sampled f_A*f_B / p is unbiased even
    under skew that independent row-level (Bernoulli) sampling
    catastrophically misses. Demonstrated on the self-join
    lineitem x returned-lineitem keyed by l_partkey; the exact size is
    also computed so the estimate's relative error is INSIDE the hash
    gate.

    Scale: at 100 TB the estimator needs only the hash-filtered scans
    (the md5-mod predicate prunes ~98.4% of rows before any shuffle,
    and the per-key counts partial-aggregate map-side); the exact
    branch here exists for the oracle gate and would be the thing one
    AVOIDS computing in production."""
    li = load_table(spark, sf_dir, "lineitem")
    fa = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count("*").cast("bigint").alias("fa")
    )
    fb = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count("*").cast("bigint").alias("fb"))
    )
    sampled = (
        F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % JOINEST_MOD
        == 0
    )
    joined = fa.join(fb, "k").select(
        "k", "fa", "fb", sampled.alias("sampled")
    )
    prod = F.col("fa") * F.col("fb")
    return joined.agg(
        F.sum(F.when(F.col("sampled"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_sampled_keys"),
        F.sum(prod).cast("bigint").alias("true_join_size"),
        (
            JOINEST_MOD
            * F.sum(F.when(F.col("sampled"), prod).otherwise(0))
        )
        .cast("bigint")
        .alias("est_join_size"),
        F.round(
            JOINEST_MOD
            * F.sum(F.when(F.col("sampled"), prod).otherwise(0))
            * 1.0
            / F.sum(prod)
            - 1,
            6,
        ).alias("rel_error"),
    )
