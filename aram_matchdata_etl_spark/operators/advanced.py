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


ATTR_WINDOW_US = 1800 * 1_000_000  # 30 min attribution window


@query(
    "q_interval_join_binned",
    oracle=f"""
SELECT p.event_id, p.user_id,
    COUNT(c.event_id) AS n_clicks,
    ROUND(COALESCE(SUM(c.value), 0.0), 4) AS click_value
FROM events p LEFT JOIN events c
    ON c.user_id = p.user_id AND c.event_type = 'click'
    AND epoch_us(c.ts) > epoch_us(p.ts)
    AND epoch_us(c.ts) <= epoch_us(p.ts) + {ATTR_WINDOW_US}
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id""",
)
def q_interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big interval join via time binning: for every purchase, count
    and sum the same user's clicks in the following 30 minutes
    (attribution). A naive plan for `c.ts BETWEEN p.ts AND p.ts + W` is a
    broadcast-nested-loop join — fine for q_join_range's 4-row band table,
    quadratic death when BOTH sides are fact tables. The scalable plan
    makes the range condition an equi-join: with bin width == window
    length, each probe interval overlaps exactly 2 bins, so the purchase
    side fans out x2 into (user_id, bin) keys, the click side maps to its
    single bin, and one hash shuffle on (user_id, bin) co-locates every
    possibly-matching pair; the exact inequality then filters inside the
    partition. Shuffle volume is 2|P| + |C| rows — linear, AQE-skew-
    splittable, no driver-side anything. Exact integer microsecond math
    (unix_micros / epoch_us) keeps both engines bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("p_us")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("c_us"),
        "value",
        F.floor(F.unix_micros("ts") / ATTR_WINDOW_US).alias("bin"),
    )
    p_binned = p.withColumn(
        "bin",
        F.explode(
            F.array(
                F.floor(F.col("p_us") / ATTR_WINDOW_US),
                F.floor(F.col("p_us") / ATTR_WINDOW_US) + 1,
            )
        ),
    )
    hits = (
        p_binned.join(c, ["user_id", "bin"])
        .filter(
            (F.col("c_us") > F.col("p_us"))
            & (F.col("c_us") <= F.col("p_us") + ATTR_WINDOW_US)
        )
        .groupBy("event_id", "user_id")
        .agg(
            F.count("*").alias("n_clicks"),
            F.round(F.sum("value"), 4).alias("click_value"),
        )
    )
    return p.join(hits, ["event_id", "user_id"], "left").select(
        "event_id",
        "user_id",
        F.coalesce(F.col("n_clicks"), F.lit(0)).cast("bigint").alias("n_clicks"),
        F.coalesce(F.col("click_value"), F.lit(0.0)).alias("click_value"),
    )


COGROUP_SHARDS = 64


@query(
    "q_cogroup_enrich",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice,
    CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines,
    ROUND(COALESCE(SUM(l.l_quantity), 0.0), 4) AS sum_qty
FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_totalprice""",
)
def q_cogroup_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas (the two-table grouped-map surface, SURVEY
    §2.10): orders and lineitems cogrouped on a hash shard, merged with a
    pandas join inside each shard. This is the escape hatch for per-key
    logic that needs BOTH sides as materialized frames (custom conflation,
    per-entity reconciliation) — for a plain aggregate join like this the
    declarative form is strictly better (see the oracle); the operator
    exists to pin the API's semantics and its scale shape: sharding keys
    by hash keeps Python invocations O(shards), not O(keys), and each
    shard's pair of Arrow batches bounds memory."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "shard", F.pmod(F.col("o_orderkey"), F.lit(COGROUP_SHARDS))
    )
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "shard", F.pmod(F.col("l_orderkey"), F.lit(COGROUP_SHARDS))
    )

    def merge(odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        agg = (
            ldf.groupby("l_orderkey")
            .agg(n_lines=("l_quantity", "size"), sum_qty=("l_quantity", "sum"))
            .reset_index()
        )
        out = odf[["o_orderkey", "o_totalprice"]].merge(
            agg, left_on="o_orderkey", right_on="l_orderkey", how="left"
        )
        out["n_lines"] = out["n_lines"].fillna(0).astype("int64")
        out["sum_qty"] = out["sum_qty"].fillna(0.0).round(4)
        return out[["o_orderkey", "o_totalprice", "n_lines", "sum_qty"]]

    return (
        orders.groupBy("shard")
        .cogroup(li.groupBy("shard"))
        .applyInPandas(
            merge,
            schema="o_orderkey bigint, o_totalprice double, n_lines bigint, sum_qty double",
        )
    )


@query(
    "q_skyline",
    # Deliberately a DIFFERENT algorithm than the Spark side: the oracle
    # states the skyline DEFINITION (no dominating point exists) as a
    # quadratic NOT EXISTS over distinct points — fine at oracle SF —
    # while the operator uses the sort-cummax formulation. Agreement
    # checks the algorithm, not just the arithmetic.
    oracle="""
WITH pts AS (
    SELECT p_retailprice AS price, p_size AS sz,
        CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM part GROUP BY 1, 2
)
SELECT price, sz AS size, n_parts FROM pts p
WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE q.price <= p.price AND q.sz >= p.sz
      AND (q.price < p.price OR q.sz > p.sz)
)""",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): the parts no other part beats on
    BOTH price (lower better) and size (higher better) — the
    multi-objective shortlist query (BNL/SFS family, Börzsönyi 2001)
    that no SQL builtin expresses directly.

    Scale-correct single-pass formulation instead of the naive O(n^2)
    dominance anti-join: (1) ONE corpus groupBy to distinct
    (price, size) points; (2) per-price max size — a rollup bounded by
    |distinct prices|; (3) a cumulative max over the price-ordered
    rollup, lagged one row so it covers STRICTLY-cheaper points only;
    (4) broadcast-join back: a point survives iff no strictly-cheaper
    price reached its size (lagged cummax < size) and it carries its own
    price's max size (equal-price dominance). The corpus is touched
    once; every window runs at distinct-price scale."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    pts = part.groupBy(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("sz")
    ).agg(F.count("*").cast("bigint").alias("n_parts"))
    per_price = pts.groupBy("price").agg(F.max("sz").alias("mp"))
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, 0)
    ladder = per_price.select(
        "price",
        "mp",
        F.lag(F.max("mp").over(w)).over(Window.orderBy("price")).alias("m1"),
    )
    joined = pts.join(F.broadcast(ladder), "price")
    survives = (
        F.col("m1").isNull() | (F.col("m1") < F.col("sz"))
    ) & (F.col("sz") == F.col("mp"))
    return joined.filter(survives).select(
        "price", F.col("sz").alias("size"), "n_parts"
    )
