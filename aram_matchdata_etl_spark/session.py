"""SparkSession factory.

Scale posture (targets a 1000-executor cluster even though tests run
local[32]):
  - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
    and broadcast-join demotion/promotion based on observed sizes.
  - shuffle.partitions sized to the local core count for tests; on a real
    cluster this is overridden (or left to AQE's coalescer) per deployment.
  - UTC session timezone so timestamp semantics match the DuckDB oracle.
  - Arrow enabled so the few Pandas-UDF operators move data in columnar
    batches, not row-at-a-time pickles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", _DEFAULT_SF_DIR)


def default_cpus() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", "32")


def _export_pythonpath() -> None:
    """Python UDF workers resolve this package by module reference
    (cloudpickle pickles mapInPandas closures by name): the repo root must
    be importable in the worker processes, which inherit PYTHONPATH."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )


def get_spark(
    app_name: str = "aram-matchdata-etl-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    _export_pythonpath()
    cpus = default_cpus()
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the events fixture stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long and convert in the loader (lossless:
        # fixture values are microsecond-aligned)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # zone-less fixture timestamps must read as LTZ (UTC-epoch micros),
        # not TIMESTAMP_NTZ — see sources/tables.py _CORRECTNESS_CONFS;
        # set here too so sessions built before any load_table() call (e.g.
        # streaming schema inference) start correct
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # keep managed tables (bucketing demos) out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/aram_spark_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
