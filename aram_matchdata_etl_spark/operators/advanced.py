"""Advanced operator batch: skew-salted join, hypertable-style
multi-granularity time rollup, Pandas UDAF (grouped-agg), and grouped-map
normalization (applyInPandas) — rounding out the §2.10 UDAF/grouped-map
surface and the §4 skew toolbox.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

SALT = 8


@query(
    "q_join_salted",
    oracle="""
SELECT l.l_returnflag, COUNT(*) AS n, ROUND(SUM(l.l_quantity * f.factor), 4) AS weighted_qty
FROM lineitem l
JOIN (
    SELECT * FROM (VALUES ('A', 1.0), ('N', 2.0), ('R', 3.0)) AS t(flag, factor)
) f ON l.l_returnflag = f.flag
GROUP BY l.l_returnflag""",
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted JOIN (SURVEY §4): l_returnflag has 3 values — a direct
    shuffle join would put ~20k rows on each of 3 reducers regardless of
    cluster size. Salt the fact side (key, salt=hash%8) and EXPLODE the dim
    side once per salt value, join on (key, salt): each hot key spreads
    over 8 reducers. Oracle = the plain join it must equal. (For dims this
    small a broadcast join is what AQE would actually pick — the salt
    pattern is for when BOTH sides are too big to broadcast.)"""
    li = load_table(spark, sf_dir, "lineitem")
    dim = spark.createDataFrame(
        [("A", 1.0), ("N", 2.0), ("R", 3.0)], "flag string, factor double"
    )
    salted_fact = li.withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(SALT))
    )
    replicated_dim = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    joined = salted_fact.join(
        replicated_dim,
        (salted_fact.l_returnflag == replicated_dim.flag)
        & (salted_fact.salt == replicated_dim.salt),
    )
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_quantity") * F.col("factor")), 4).alias("weighted_qty"),
    )


@query(
    "q_time_rollup",
    oracle="""
SELECT granularity, bucket, event_type, COUNT(*) AS n,
    ROUND(SUM(value), 4) AS total
FROM (
    SELECT 'hour' AS granularity, DATE_TRUNC('hour', ts) AS bucket, event_type, value
    FROM events
    UNION ALL
    SELECT 'day', DATE_TRUNC('day', ts), event_type, value FROM events
) u GROUP BY granularity, bucket, event_type""",
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous rollup: the same events aggregated at
    hour and day granularity in one pass. At scale the day level is
    derived from the hour partials (re-aggregation, not re-scan) — here the
    union form keeps the oracle exact; the incremental form is the
    foreachBatch variant of streaming/crawl.py."""
    ev = load_table(spark, sf_dir, "events")
    hour = ev.select(
        F.lit("hour").alias("granularity"),
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "event_type",
        "value",
    )
    day = ev.select(
        F.lit("day").alias("granularity"),
        F.date_trunc("day", F.col("ts")).alias("bucket"),
        "event_type",
        "value",
    )
    return (
        hour.unionByName(day)
        .groupBy("granularity", "bucket", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )


@query(
    "q_grouped_agg_udf",
    oracle="""
SELECT event_type,
    ROUND(SUM(value * value) / SUM(value), 4) AS self_weighted_mean
FROM events GROUP BY event_type""",
)
def q_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF (GROUPED_AGG pandas_udf) — the §2.10 'UDAF if ever
    needed' row: a self-weighted mean sum(v^2)/sum(v) per group, computed
    in numpy over Arrow batches. Rounded on both sides: numpy pairwise
    summation order differs from the engines' sequential sums."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def self_weighted_mean(v: pd.Series) -> float:
        return float((v * v).sum() / v.sum())

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(self_weighted_mean("value"), 4).alias("self_weighted_mean")
    )


@query(
    "q_group_normalize",
    oracle="""
SELECT event_id, event_type,
    ROUND((value - AVG(value) OVER (PARTITION BY event_type))
        / STDDEV(value) OVER (PARTITION BY event_type), 4) AS value_z
FROM events""",
)
def q_group_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the snippet-classic per-group z-score):
    whole pandas DataFrame per group in, transformed frame out. Matches
    the pure-SQL window formulation to 4 decimals (pandas std ddof=1 ==
    STDDEV_SAMP; only summation order differs)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        pdf = pdf.assign(value_z=((v - v.mean()) / v.std()).round(4))
        return pdf[["event_id", "event_type", "value_z"]]

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        normalize, schema="event_id long, event_type string, value_z double"
    )
