"""Incremental continuous aggregate (hypertable rollup maintenance):
each micro-batch folds its rows into an HOUR-grain partial table, and the
DAY grain is re-derived from the hour PARTIALS — never from raw events.

This is the streaming complement of operators/advanced.py::q_time_rollup
(which recomputes both grains in one batch pass and carries the DuckDB
oracle). At 100 TB the hour table is the only state that grows, day reads
24 partial rows per key instead of billions of events, and the versioned
commit (streaming/atomic.py) becomes a transactional MERGE on a lakehouse
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _aggregate_hours(df: DataFrame) -> DataFrame:
    return df.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("total"))


def _merge_partials(parts: DataFrame) -> DataFrame:
    return parts.groupBy("bucket", "event_type").agg(
        F.sum("n").alias("n"), F.sum("total").alias("total")
    )


def incremental_rollup_sink(hour_dir: str, day_dir: str):
    """foreachBatch: fold the batch into hour partials, then derive day
    from the merged hour table (re-aggregation of partials)."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        from .atomic import commit_version, read_current

        spark = batch.sparkSession
        hour_new = _aggregate_hours(batch)
        hour_old = read_current(spark, hour_dir)
        hour = (
            hour_new
            if hour_old is None
            else _merge_partials(hour_old.unionByName(hour_new))
        )
        # commit_version writes the merged plan to a NEW directory before
        # pruning the old one, so the read side of the merge stays intact
        # for the whole write — no cache pinning, no lost-history crash
        # window (streaming/atomic.py)
        commit_version(hour, hour_dir)
        # derive day from a fresh read of the just-committed hour version
        hour_fresh = read_current(spark, hour_dir)
        day = (
            hour_fresh.groupBy(
                F.date_trunc("day", F.col("bucket")).alias("bucket"), "event_type"
            )
            .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        )
        commit_version(day, day_dir)

    return apply


def _day_sketches(df: DataFrame) -> DataFrame:
    return df.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n_events"),
    )


def incremental_hll_sink(day_dir: str):
    """foreachBatch maintaining per-day HLL sketches across micro-batches —
    the streaming twin of operators/streaming_batch.py::q_hll_rollup
    (ROADMAP: the sketches' mergeability IS the streaming story). Each
    batch folds its per-day partial sketches into the stored table with
    hll_union (register-wise max: order-insensitive and associative, so
    trigger-at-a-time accumulation lands on EXACTLY the batch operator's
    sketches — asserted estimate-exact in the parity test). State growth
    is one few-KB sketch row per day, never the raw stream; any rollup
    level above day is a cheap sketch union at read time."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        from .atomic import commit_version, read_current

        spark = batch.sparkSession
        new = _day_sketches(batch)
        old = read_current(spark, day_dir)
        merged = (
            new
            if old is None
            else old.unionByName(new)
            .groupBy("day")
            .agg(
                F.expr("hll_union_agg(sk)").alias("sk"),
                F.sum("n_events").alias("n_events"),
            )
        )
        commit_version(merged, day_dir)

    return apply
