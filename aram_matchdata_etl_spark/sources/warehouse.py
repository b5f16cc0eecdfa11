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
    wide and only narrows the write.

    Swap semantics by layout:

    * **versioned table** (a streaming/atomic.py ``_CURRENT`` pointer is
      present): the compacted data is committed as a fresh version via the
      pointer swap — truly atomic, a complete table is visible at every
      instant (``os.replace`` of the pointer file).
    * **plain parquet directory**: POSIX cannot atomically exchange two
      directories, so the swap is rename(path → .old) then
      rename(.compacting → path). There IS a window (and a crash state)
      with no directory at ``path``; ``.old`` stays complete throughout,
      and ``recover_compact()`` (called here on entry) rolls an
      interrupted swap back. Single-writer, maintenance-window operation —
      for always-readable compaction store the table versioned."""
    import math
    import os
    import shutil

    from ..streaming.atomic import (
        POINTER,
        commit_version,
        current_version_path,
        read_current,
    )

    pointer_present = os.path.isfile(os.path.join(path, POINTER))
    recover_compact(path)

    if pointer_present:
        current = read_current(spark, path)
        total = _parquet_bytes(current_version_path(path))
        n_files = max(1, math.ceil(total / target_file_bytes))
        # keep_versions=2: in-flight readers of the pre-compaction version
        # keep their files through one more commit (see lakehouse.merge_upsert)
        commit_version(current.repartition(n_files), path, keep_versions=2)
        return n_files

    total = _parquet_bytes(path)
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


def _parquet_bytes(path: str) -> int:
    import os

    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def recover_compact(path: str) -> bool:
    """Roll back a plain-directory compact() interrupted between its two
    renames: if nothing exists at ``path`` but a complete ``.old`` does,
    restore it (and drop any half-written ``.compacting``). Returns True
    when a recovery was performed."""
    import os
    import shutil

    old = path.rstrip("/") + ".old"
    if not os.path.isdir(path) and os.path.isdir(old):
        shutil.rmtree(path.rstrip("/") + ".compacting", ignore_errors=True)
        os.rename(old, path)
        return True
    return False
