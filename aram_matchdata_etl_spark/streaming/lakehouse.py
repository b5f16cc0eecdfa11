"""Transactional MERGE upsert with lakehouse dispatch.

The production path for the idempotent match-document sink (the
reference's ``replace_one(upsert=True)``, db/mongodb.py:52-56) is a
lakehouse table: one ACID ``MERGE INTO`` per micro-batch, with the table
format's transaction log providing what streaming/atomic.py hand-builds
(snapshot isolation, crash atomicity, time travel).

Delta's python package and jars are not in this image, so the dispatch
is import-gated: ``merge_upsert`` uses Delta when importable and
configured, else falls back to the versioned-parquet pointer-swap store
(streaming/atomic.py) with identical last-writer-wins semantics. Callers
write against ONE function either way; tests assert the fallback is
taken here and exercise the Delta body only when the package exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_available(spark: SparkSession) -> bool:
    """True when the delta-spark package AND its SQL extension are usable
    in this session (both are required: the pip package alone cannot
    MERGE without the jars on the driver classpath)."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    try:
        # cheap end-to-end probe: the extension registers this SQL keyword
        spark.sql("SELECT 1").collect()
        return "io.delta.sql.DeltaSparkSessionExtension" in spark.conf.get(
            "spark.sql.extensions", ""
        )
    except Exception:
        return False


def merge_upsert(
    batch: DataFrame,
    target_dir: str,
    key_cols: list[str],
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> str:
    """Upsert ``batch`` into the table at ``target_dir`` keyed by
    ``key_cols``, newest row per key wins (ties broken by ``order_cols``
    descending). Returns which engine handled it: 'delta' or 'versioned'.

    Delta path: one transactional ``MERGE INTO`` — at 100 TB the match
    key is the partition/Z-ORDER column so the merge rewrites only
    touched files. Fallback path: union-with-current + window row_number
    + atomic pointer swap (streaming/atomic.py), same observable state.
    """
    spark = batch.sparkSession
    if delta_available(spark):
        from delta.tables import DeltaTable

        if not DeltaTable.isDeltaTable(spark, target_dir):
            batch.write.format("delta").mode("overwrite").save(target_dir)
            return "delta"
        cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        (
            DeltaTable.forPath(spark, target_dir)
            .alias("t")
            .merge(batch.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return "delta"

    from pyspark.sql import Window

    from .atomic import commit_version, read_current

    current = read_current(spark, target_dir)
    merged = batch if current is None else current.unionByName(batch)
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    latest = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    commit_version(latest, target_dir)
    return "versioned"
