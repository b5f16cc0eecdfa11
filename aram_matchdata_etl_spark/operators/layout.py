"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping — the lakehouse OPTIMIZE ZORDER BY pattern (Delta/Iceberg
expose it as a table service; the engine-side primitive is just a
space-filling-curve sort key). At 100 TB the win is file pruning: a
scan with predicates on EITHER clustered column skips the files whose
min/max footer ranges exclude it, which a single-column sort only
provides for its leading column.

Everything here is pure integer codegen (shift/mask/or folded into one
expression) plus one range repartition — the exact cost profile of a
production OPTIMIZE job: full-scan + one shuffle + rewrite.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

Z_BITS = 10  # 10 bits per dimension -> 20-bit key, 1024x1024 grid


def z_value(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    bit i of x lands at position 2i+1, bit i of y at 2i. Single folded
    bitwise expression — whole-stage codegen, no UDF."""
    parts = []
    for i in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        parts.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def _z_value_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i})")
    return " | ".join(terms)


def zorder_by(
    df: DataFrame, cols: tuple[str, str], num_files: int = 16, bits: int = Z_BITS
) -> DataFrame:
    """Re-layout ``df`` so writes cluster on the Morton curve of two
    columns: range-repartition + within-partition sort on the z-key.
    Writing the result produces files whose per-file min/max footers are
    tight on BOTH columns — the input to parquet/Delta file skipping.
    (Columns must already be bucketized to [0, 2^bits); see
    q_zorder_layout for the pmod bucketization idiom.)

    ``num_files`` is explicit and required-by-design: an implicit range
    repartition is a small-partition coalescing target for AQE, which
    happily merges the whole layout back into one file at fixture scale
    (observed), and at production scale the file count is a sizing
    decision (target ~1 GB/file), not something to leave to the planner."""
    keyed = df.withColumn("_z", z_value(F.col(cols[0]), F.col(cols[1]), bits))
    return (
        keyed.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


@query(
    "q_zorder_layout",
    oracle=f"""
WITH keyed AS (
    SELECT l_partkey % 1024 AS px, l_orderkey % 1024 AS ox,
        ({_z_value_sql('l_partkey % 1024', 'l_orderkey % 1024')}) AS zkey
    FROM lineitem
)
SELECT CAST(zkey >> 13 AS INTEGER) AS z_bucket,
    COUNT(*) AS n_rows,
    MIN(px) AS min_part, MAX(px) AS max_part,
    MIN(ox) AS min_ord, MAX(ox) AS max_ord
FROM keyed GROUP BY 1""",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout profile: bucket lineitem by the top bits of the
    (partkey, orderkey) Morton key and report each bucket's min/max per
    dimension — the footer ranges a z-ordered file would carry. Every
    bucket's span is bounded on BOTH dimensions (the test asserts the
    pruning advantage vs a single-column sort quantitatively; suppkey is
    not used because its domain is degenerate at small SF)."""
    li = load_table(spark, sf_dir, "lineitem")
    px = F.pmod(F.col("l_partkey"), F.lit(1024))
    ox = F.pmod(F.col("l_orderkey"), F.lit(1024))
    keyed = li.select(px.alias("px"), ox.alias("ox"), z_value(px, ox).alias("zkey"))
    return (
        keyed.groupBy(
            F.shiftright(F.col("zkey"), 13).cast("int").alias("z_bucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("px").alias("min_part"),
            F.max("px").alias("max_part"),
            F.min("ox").alias("min_ord"),
            F.max("ox").alias("max_ord"),
        )
    )


SKEW_TOPN = 10
SKEW_TARGET_ROWS = 2000  # target rows per (key, salt) reducer partition


@query(
    "q_skew_report",
    oracle=f"""
WITH freq AS MATERIALIZED (
    SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS f
    FROM lineitem GROUP BY 1
), stats AS MATERIALIZED (
    SELECT AVG(f) AS mean_f, COUNT(*) AS n_keys FROM freq
)
SELECT f.key, f.f AS freq,
    ROUND(f.f / s.mean_f, 6) AS skew_factor,
    CAST(CEIL(f.f * 1.0 / {SKEW_TARGET_ROWS}) AS BIGINT) AS salt_factor
FROM freq f CROSS JOIN stats s
ORDER BY f.f DESC, f.key
LIMIT {SKEW_TOPN}""",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew report — the diagnostic that decides WHEN the
    salted-join/salted-agg operators (q_join_salted, q_groupby_salted)
    are worth their extra exchange: the {SKEW_TOPN} heaviest keys of a
    join column with each key's frequency, its skew factor vs the mean
    key, and the recommended salt fan-out ceil(freq/{SKEW_TARGET_ROWS})
    to land every (key, salt) bucket under the target reducer size.

    Scale: one partial-agg pass to the key-frequency table, a broadcast
    of the 2-scalar stats row, and a top-{SKEW_TOPN} — the report that
    prevents the 100 TB straggler, priced at one scan."""
    li = load_table(spark, sf_dir, "lineitem")
    freq = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").cast("bigint").alias("f")
    )
    stats = freq.agg(F.avg("f").alias("mean_f"))
    return (
        freq.crossJoin(F.broadcast(stats))
        .select(
            "key",
            F.col("f").alias("freq"),
            F.round(F.col("f") / F.col("mean_f"), 6).alias("skew_factor"),
            F.ceil(F.col("f") * 1.0 / SKEW_TARGET_ROWS)
            .cast("bigint")
            .alias("salt_factor"),
        )
        .orderBy(F.desc("freq"), "key")
        .limit(SKEW_TOPN)
    )


COMPACT_TARGET_BYTES = 4 * 1024 * 1024  # demo target: 4 MiB per file


@query(
    "q_compaction_plan",
    oracle=f"""
SELECT source,
    CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(SUM(strlen(text)) AS BIGINT) AS text_bytes,
    CAST(CEIL(SUM(strlen(text)) * 1.0 / {COMPACT_TARGET_BYTES})
        AS BIGINT) AS target_files,
    CAST(CEIL(COUNT(*) * 1.0
        / CEIL(SUM(strlen(text)) * 1.0 / {COMPACT_TARGET_BYTES}))
        AS BIGINT) AS rows_per_file
FROM documents GROUP BY source""",
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan per source partition — the lakehouse
    maintenance readout behind every `repartitionByRange + write`
    job: payload bytes (octet_length of the text column — the
    dominant term), the target file count at
    {COMPACT_TARGET_BYTES / 1024 / 1024:.0f} MiB/file, and the derived
    rows-per-file. Feeding `df.repartition(target_files, col)` with
    these numbers is how q_zorder_layout's writer sizes its output.

    Scale: ONE map-side partial aggregation (count + byte sum per
    partition key); no row ever shuffles — the plan is computed from
    sufficient statistics, then the rewrite itself streams."""
    docs = load_table(spark, sf_dir, "documents")
    tb = F.sum(F.octet_length("text"))
    tf = F.ceil(tb * 1.0 / COMPACT_TARGET_BYTES)
    return docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        tb.cast("bigint").alias("text_bytes"),
        tf.cast("bigint").alias("target_files"),
        F.ceil(F.count("*") * 1.0 / tf).cast("bigint").alias(
            "rows_per_file"
        ),
    )
