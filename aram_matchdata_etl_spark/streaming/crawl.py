"""Structured Streaming re-expression of the reference's crawl loop
(SURVEY.md §2.9, EP1/EP2): Celery-beat micro-batches + Redis dedup queues
+ Mongo upsert become stream triggers + state-store dedup + foreachBatch
merge.

Topology (mirrors the two Redis queues, tasks.py:187-254 / 28-180):

    users table ──(stream A: fetch match ids, dedup forever)──▶ match_ids
    match_ids  ──(stream B: fetch detail+timeline, ARAM filter,
                  idempotent upsert)──▶ bronze matches
                └─(side output: participant puuids, 6 h TTL dedup)──▶ users

Spark cannot cycle one query, so — like the reference's two queues — the
loop is two independent streams bridged by durable storage (T6).

Scale: dedup state lives in the state store (RocksDB on a real cluster),
partitioned by key — the distributed form of the Redis SET. Throughput
ceilings (2,000 ids / 2 min, tasks.py:18) are trigger config:
``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger`` + processingTime
trigger, not hand-rolled sleeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TTL = "6 hours"  # the reference's user-dedup TTL (tasks.py:125-129)


def events_stream(spark: SparkSession, source_dir: str, schema_file: str) -> DataFrame:
    """File-source stream over a directory of events parquet files (stands
    in for the Kafka topic of ids the reference drains from Redis). The
    file source requires a DIRECTORY; schema comes from a sample file —
    streaming sources require an explicit schema."""
    from ..sources.tables import ensure_session_confs

    ensure_session_confs(spark)  # foreign sessions: nanos timestamps, UTC
    raw = (
        spark.readStream.schema(spark.read.parquet(schema_file).schema)
        .option("maxFilesPerTrigger", 1)  # T2: bounded batch per trigger
        .parquet(source_dir)
    )
    # same ns->us conversion as the batch loader
    from pyspark.sql import types as T

    if isinstance(raw.schema["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


def dedup_forever(stream: DataFrame, key: str) -> DataFrame:
    """T4: permanent dedup — the match-id Redis SET (match/queue.py:24-25).
    State grows unboundedly, exactly as the reference's SET does."""
    return stream.dropDuplicates([key])


def dedup_with_ttl(stream: DataFrame, key: str, ts_col: str = "ts") -> DataFrame:
    """T5: TTL dedup — the 6 h SETEX on user ids (redis.py:48-64).
    Watermark evicts state older than the TTL, like Redis key expiry."""
    return stream.withWatermark(ts_col, TTL).dropDuplicatesWithinWatermark([key])


def windowed_counts(stream: DataFrame) -> DataFrame:
    """Event-time tumbling window aggregation (capability row §2.9);
    batch twin with DuckDB oracle: operators/streaming_batch.py
    q_event_window_agg."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Event-time session windows (capability row §2.9): per-user sessions
    closed after `gap` of inactivity. The deterministic batch twin with a
    DuckDB oracle is operators/streaming_batch.py::q_sessionize (lag+cumsum
    formulation); this is the native streaming operator whose state store
    merges/extends windows as events arrive."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def upsert_sink(target_dir: str, key_cols: list[str], order_cols: tuple[str, ...] = ("ts", "event_id")):
    """T3/S7: idempotent foreachBatch upsert — replace_one(upsert=True)
    keyed by _id (db/mongodb.py:52-56). Routed through
    streaming/lakehouse.py: a transactional Delta MERGE INTO where the
    package is installed, else last-writer-wins merge committed as a NEW
    version with an atomic pointer swap (streaming/atomic.py) — the merge
    plan never overwrites the directory it reads, and a crash at any
    point leaves one complete version readable."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        from .lakehouse import merge_upsert

        merge_upsert(batch, target_dir, key_cols, order_cols)

    return apply


def run_to_completion(
    stream_df: DataFrame, sink_fn=None, query_name: str = "out", output_mode: str = "append"
):
    """Drive a stream over the (finite) fixture synchronously: memory sink
    for assertions, or foreachBatch when sink_fn is given."""
    if sink_fn is not None:
        q = (
            stream_df.writeStream.outputMode("update")
            .foreachBatch(sink_fn)
            .trigger(availableNow=True)
            .start()
        )
    else:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    return q


def queue_stats(query) -> dict:
    """S11: queue introspection — the reference's `queue_size()` (LLEN) and
    `set_size()` (SCARD) probes (extractor/riot/db/redis.py:92-109) mapped
    onto StreamingQuery progress telemetry:

      - ``input_rows`` / ``last_batch_rows``: rows drained per trigger —
        the LLEN drain-rate view of the upstream queue.
      - ``state_rows``: total keys held by stateful operators (the dedup
        state store) — exactly SCARD of the Redis dedup SET. Read from the
        LATEST progress event, so it is a point-in-time gauge (accurate
        regardless of retention).
      - ``batches`` / ``last_batch_id``: triggers retained vs the engine's
        monotone batch counter.

    CAVEAT: ``recentProgress`` is a ring buffer capped at
    spark.sql.streaming.numRecentProgressUpdates (default 100), so
    ``batches``/``input_rows`` cover only the RETAINED window on
    longer-running queries — compare ``batches`` with ``last_batch_id + 1``
    to detect truncation before treating input_rows as a running total.
    Returns zeros before the first progress event."""
    import json as _json

    progresses = []
    for p in query.recentProgress:
        if not isinstance(p, dict):
            # PySpark returns StreamingQueryProgress objects in newer
            # versions; normalize through their json form.
            j = p.json
            p = _json.loads(j if isinstance(j, str) else j())
        progresses.append(p)
    input_rows = 0
    last_batch_rows = 0
    state_rows = 0
    last_batch_id = -1
    for p in progresses:
        n = int(p.get("numInputRows", 0))
        input_rows += n
        last_batch_rows = n
    if progresses:
        ops = progresses[-1].get("stateOperators") or []
        state_rows = sum(int(op.get("numRowsTotal", 0)) for op in ops)
        last_batch_id = int(progresses[-1].get("batchId", -1))
    return {
        "batches": len(progresses),
        "last_batch_id": last_batch_id,
        "input_rows": input_rows,
        "last_batch_rows": last_batch_rows,
        "state_rows": state_rows,
    }


def reset_queue(checkpoint_dir: str) -> None:
    """S11: the reference's ``queue.clear()`` (extractor/riot/main.py:6-18,
    db/redis.py:110-119 — delete queue + SET + TTL keys). In the Spark
    topology the durable queue/dedup state IS the checkpoint (offsets +
    state store), so clearing the queue = removing the checkpoint dir; the
    next start() re-seeds from scratch (T7 cold start)."""
    import shutil

    shutil.rmtree(checkpoint_dir, ignore_errors=True)


def attribution_join(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Watermarked stream-stream inner join: clicks within 30 min after a
    purchase by the same user — the native streaming twin of the batch
    q_interval_join_binned (operators/advanced.py), which pins the
    deterministic semantics with a DuckDB oracle. Both sides carry a
    watermark so the state store can discard a buffered row once no
    future match can arrive (purchase state expires 30 min past the
    click watermark and vice versa); without the time-range condition in
    the join predicate, stream-stream state would grow forever."""
    p = purchases.select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", "1 hour")
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("click_value"),
    ).withWatermark("c_ts", "1 hour")
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("p_id", "p_user", "c_ts", "click_value")
