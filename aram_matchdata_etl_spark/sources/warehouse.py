"""Storage layout for the 100 TB posture: partitioned parquet writes
(partition pruning on read) and bucketed tables (co-located joins with no
exchange).

The reference's storage layer is a single Mongo collection keyed by
matchId (db/mongodb.py:27-67); at Spark scale the bronze store is
date/region-partitioned parquet (or Delta/Iceberg), and repeatedly-joined
fact tables are bucketed on their join key so the shuffle happens once at
WRITE time instead of on every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Hive-style partitioned layout: queries filtering on the partition
    columns prune directories at planning time (no file IO for pruned
    partitions — `PartitionFilters` in the scan node)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Bucketed + sorted table: rows are hash-clustered on the join key at
    write time. Equi-joins between tables bucketed on the same key with the
    same bucket count plan WITHOUT a shuffle exchange (asserted in
    tests/test_warehouse.py)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog is per-session but table files persist: a
    # leftover location from an earlier session would fail saveAsTable
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[5:]
    if wh:
        import shutil

        shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files and atomically swap it in. Streaming
    sinks and frequent upserts accrete many small files; at scale the
    scan's task count (and the namenode/listing load) tracks file count,
    not data size, so compaction is routine table maintenance (what
    OPTIMIZE does on a lakehouse table). Returns the new file count.

    The rewrite is one coalesce-free repartition(n) pass — a full shuffle,
    chosen over coalesce() because coalesce at small n would also shrink
    the PARALLELISM of the read stage, while repartition keeps the scan
    wide and only narrows the write. Swap via a temp dir + os.replace of
    the directory name keeps a complete table visible at every instant
    (same single-writer story as streaming/atomic.py)."""
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return n_files
