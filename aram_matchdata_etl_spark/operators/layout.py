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
