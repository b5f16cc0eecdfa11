"""Incremental continuous aggregate (hypertable rollup maintenance):
each micro-batch folds its rows into an HOUR-grain partial table, and the
DAY grain is re-derived from the hour PARTIALS — never from raw events.

This is the streaming complement of operators/advanced.py::q_time_rollup
(which recomputes both grains in one batch pass and carries the DuckDB
oracle). At 100 TB the hour table is the only state that grows, day reads
24 partial rows per key instead of billions of events, and the
read-merge-overwrite below becomes a transactional MERGE on a lakehouse
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
        spark = batch.sparkSession
        hour_new = _aggregate_hours(batch)
        try:
            hour_old = spark.read.parquet(hour_dir)
            hour = _merge_partials(hour_old.unionByName(hour_new))
        except Exception:
            hour = hour_new
        hour.cache()
        hour.count()  # materialize before overwriting the dir it reads
        hour.write.mode("overwrite").parquet(hour_dir)
        hour.unpersist()
        # derive day from a FRESH read of what was just written: the cached
        # plan still has the old dir in its lineage, and evicted partitions
        # would silently recompute against the overwritten (merged) data —
        # double counting
        hour_fresh = spark.read.parquet(hour_dir)
        day = (
            hour_fresh.groupBy(
                F.date_trunc("day", F.col("bucket")).alias("bucket"), "event_type"
            )
            .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
        )
        day.write.mode("overwrite").parquet(day_dir)

    return apply
