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


# Correctness-critical confs: a silent set-failure on a foreign session
# would reintroduce wrong results (oracle drift / analysis errors) with no
# signal, so these raise if they cannot be applied and verified.
_CORRECTNESS_CONFS = (
    # Fixture timestamps carry no zone annotation (isAdjustedToUTC unset);
    # Spark 4 infers them as TIMESTAMP_NTZ by default, which unix_micros()
    # rejects (DATATYPE_MISMATCH) and which drifts from the session-timezone
    # design. With inference off they read as TimestampType (LTZ) taking the
    # stored micros verbatim as UTC-epoch micros — timezone-independent and
    # equal to the DuckDB oracle's naive-timestamp epoch values. The
    # per-read `.option("inferTimestampNTZ", ...)` does NOT exist for
    # parquet (it is a CSV/JSON option) — only this session conf works, and
    # it also covers streaming schema-inference reads.
    ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
    # Oracle comparison requires LTZ rendering pinned to UTC.
    ("spark.sql.session.timeZone", "UTC"),
    # Some fixture generations wrote events.ts as TIMESTAMP(NANOS), which
    # the reader rejects without nanosAsLong.
    ("spark.sql.legacy.parquet.nanosAsLong", "true"),
)

# Pure tuning confs: best-effort, never fail a query over them.
_TUNING_CONFS = (
    ("spark.sql.adaptive.enabled", "true"),
    ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
)


import weakref

_SESSION_CONFS_APPLIED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def ensure_session_confs(spark: SparkSession) -> None:
    """Defensive dynamic configs for FOREIGN sessions (the driver hands us
    its own SparkSession). All are runtime-settable SQL confs.

    Memoized per live session object (r13 optimization round):
    load_table runs this on every call and each conf set+verify is a
    py4j round-trip — measurable fixed cost on constructions that load
    several tables. A WeakSet keys on the session object itself (no
    id-reuse aliasing: the entry dies with the session), and a cloned
    newSession() — separate SQLConf — is a different object, so it
    still gets the full set+verify on its first load. Valid because
    nothing in this repo unsets these confs mid-session."""
    if spark in _SESSION_CONFS_APPLIED:
        return
    for k, v in _CORRECTNESS_CONFS:
        spark.conf.set(k, v)
        got = spark.conf.get(k)
        if str(got).lower() != v.lower():
            raise RuntimeError(
                f"correctness-critical conf {k}={v!r} did not take (got {got!r})"
            )
    for k, v in _TUNING_CONFS:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    _SESSION_CONFS_APPLIED.add(spark)


# Schema-drift guard: expected dtype (simpleString) per critical column.
# Fixtures can silently change generation-to-generation (the round-3 NTZ
# incident); fail at the loader, not three operators downstream. Only
# columns whose type semantics operators depend on are pinned.
_EXPECTED_DTYPES = {
    "events": {"ts": ("timestamp", "bigint")},  # bigint before ns->us conversion
    "documents": {"doc_id": ("bigint",), "text": ("string",)},
    "embeddings": {"embedding": ("array<float>", "array<double>")},
    "lineitem": {"l_quantity": ("double",), "l_shipdate": ("timestamp",)},
    "orders": {"o_orderdate": ("timestamp",)},
}


def _check_dtypes(name: str, df: DataFrame) -> None:
    expected = _EXPECTED_DTYPES.get(name)
    if not expected:
        return
    actual = dict(df.dtypes)
    for col, allowed in expected.items():
        got = actual.get(col)
        if got not in allowed:
            raise TypeError(
                f"fixture schema drift: {name}.{col} is {got!r}, expected one "
                f"of {allowed} — check parquet generation / session confs"
            )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _check_dtypes(name, df)
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
        if not isinstance(df.schema["ts"].dataType, T.TimestampType):
            raise TypeError(
                f"events.ts must load as TimestampType (LTZ), got "
                f"{df.schema['ts'].dataType} — NTZ inference conf not applied?"
            )
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views (for the SQL-API operators)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# Memoized spread_input probes: the precise probe (df.rdd.getNumPartitions)
# forces a full DataFrame->RDD physical-plan conversion per call, which on
# well-partitioned production input is pure waste (ADVICE r4). Keyed by
# (session id, sorted input files) — valid because a file-scan plan's
# partitioning is a function of its file set + session read confs, both
# stable within a session.
_SPREAD_PROBE_CACHE: dict[tuple, int] = {}


def spread_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition ONLY when the input is under-partitioned
    (the single-row-group fixture parquet arrives as 1 partition, which
    would serialize per-row generator work on one core). Well-partitioned
    production input passes through untouched — operators calling this do
    NOT pay a corpus shuffle outside the fixture environment, keeping
    their zero-shuffle claims honest.

    Probe cost: file-scan plans short-circuit on ``df.inputFiles()`` (a
    logical-plan FileIndex lookup, no physical planning) — a file count at
    or above the spread threshold already proves enough partitions (Spark
    assigns >=1 partition per non-coalesced file at fixture sizes; large
    multi-file production scans pass this trivially). Only small-file-count
    plans (the fixture case) or non-file plans pay the precise RDD probe,
    and file-backed probes are memoized per (session, fileset)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    threshold = max(2, target // 4)
    try:
        files = sorted(df.inputFiles())
    except Exception:
        files = []
    if files:
        if len(files) >= threshold:
            return df
        key = (id(df.sparkSession), tuple(files))
        n = _SPREAD_PROBE_CACHE.get(key)
        if n is None:
            n = df.rdd.getNumPartitions()
            _SPREAD_PROBE_CACHE[key] = n
    else:
        n = df.rdd.getNumPartitions()
    if n < threshold:
        return df.repartition(target)
    return df
