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


def dedup_newest_per_key(
    df: DataFrame, key_cols: list[str], order_cols: tuple[str, ...]
) -> DataFrame:
    """Keep the newest row per key (``order_cols`` descending, lexicographic)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def source_wins_condition(order_cols: tuple[str, ...]) -> str:
    """SQL condition 'source (s) is at least as new as target (t)' under the
    lexicographic ordering of ``order_cols``. Gates whenMatchedUpdate so a
    replayed OLDER micro-batch cannot regress target rows — the MERGE path
    must be idempotent exactly like the fallback's row_number dedup. The
    all-equal term is included: re-applying the same batch rewrites the row
    with identical values (harmless, keeps replay a no-op observably)."""
    terms: list[str] = []
    eq_prefix: list[str] = []
    for c in order_cols:
        terms.append(" AND ".join([*eq_prefix, f"s.{c} > t.{c}"]))
        eq_prefix.append(f"s.{c} = t.{c}")
    terms.append(" AND ".join(eq_prefix))
    return "(" + ") OR (".join(terms) + ")"


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

    Either way the batch is first deduplicated to one (newest) row per key:
    Delta's MERGE throws on multiple source rows matching one target row,
    and the initial-overwrite branch must not persist intra-batch dupes.
    """
    spark = batch.sparkSession
    batch = dedup_newest_per_key(batch, key_cols, order_cols)
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
            .whenMatchedUpdateAll(condition=source_wins_condition(order_cols))
            .whenNotMatchedInsertAll()
            .execute()
        )
        return "delta"

    from .atomic import commit_version, read_current

    current = read_current(spark, target_dir)
    merged = batch if current is None else current.unionByName(batch)
    latest = dedup_newest_per_key(merged, key_cols, order_cols)
    # keep_versions=2: a concurrent reader that resolved the pointer just
    # before this swap still finds its version's files for one more commit
    # (the poor man's snapshot-retention window; with keep_versions=1 a
    # slow reader hits FAILED_READ_FILE when its version is pruned mid-scan).
    commit_version(latest, target_dir, keep_versions=2)
    return "versioned"
