"""Parquet table loaders for the driver-generated fixtures.

Mirrors the reference's MongoDB scan layer
(/root/reference/transformer/ranking/data_extractor.py:42-67) — there the
"source" is a filtered+projected Mongo cursor; here it is
``spark.read.parquet`` where Catalyst pushes filters into the scan and
prunes columns automatically (DataSource V2 pushdown), so every downstream
operator gets predicate pushdown / column pruning for free.

At 100 TB the same code path applies: parquet (or Delta/Iceberg) tables,
partitioned on ingest date / match region, read with pushed filters —
nothing here materializes on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_session_confs(spark: SparkSession) -> None:
    """Defensive dynamic configs for FOREIGN sessions (the driver hands us
    its own SparkSession): events.parquet is TIMESTAMP(NANOS) which the
    reader rejects without nanosAsLong, and oracle comparison requires the
    UTC session timezone. All of these are runtime-settable SQL confs."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # never fail a query over a tuning conf


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_session_confs(spark)
    # inferTimestampNTZ=false: fixture timestamps carry no zone annotation
    # (isAdjustedToUTC unset), and Spark 4 would otherwise read them as
    # TIMESTAMP_NTZ — which unix_micros()/window() reject or shift under a
    # non-UTC session. Reading them as LTZ takes the stored micros verbatim
    # as UTC-epoch micros: timezone-independent and equal to the DuckDB
    # oracle's naive-timestamp epoch values.
    df = spark.read.option("inferTimestampNTZ", "false").parquet(
        f"{sf_dir}/{name}.parquet"
    )
    if name == "events":
        # Older fixture generations wrote events.ts as parquet
        # TIMESTAMP(NANOS): read as long (see session config
        # spark.sql.legacy.parquet.nanosAsLong) and convert; fixture
        # values are microsecond-aligned so ns -> us is lossless.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer division: epoch-ns exceeds 2^53, double math loses 1us
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views (for the SQL-API operators)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
