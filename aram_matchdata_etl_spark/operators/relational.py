"""Relational operator breadth (SURVEY.md §2.1-§2.8) over the TPC-H-ish
fixtures.

Each query maps a reference behavior (file:line cited per function) onto
the stock Spark operator that Catalyst plans best. Conventions shared with
the DuckDB oracles:

  - double-typed aggregates are wrapped in ROUND(x, 4) on BOTH sides —
    partial-aggregation order differs between engines, so raw float sums
    are not bit-stable (SURVEY §7 float-parity risk);
  - integer SUM/LENGTH/YEAR are CAST to BIGINT/INT explicitly because
    DuckDB widens (HUGEINT) where Spark stays at LongType;
  - every computed column is aliased identically on both sides (driver
    hashes after sorting columns by name).

Scale notes are per-operator docstrings; the global posture: AQE picks
broadcast vs sort-merge joins from runtime sizes, small dims get explicit
``F.broadcast`` hints, aggregations are hash-based with map-side partial
aggregation, and all filters/projections push into the parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.match_view import oracle_player_base_cte, player_base
from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- §2.2 projections / filters -------------------------------------------


@query(
    "q_project",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: column projection (the reference's Mongo projection doc,
    data_extractor.py:57-63). Catalyst prunes the parquet ReadSchema to
    exactly these three columns."""
    return _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "q_filter_eq",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'",
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: equality predicate (gameMode == 'ARAM', data_extractor.py:53).
    Pushed to the parquet scan (row-group skipping via min/max stats)."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "q_filter_range",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_quantity BETWEEN 10 AND 20""",
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: range predicate (gameDuration >= 300, data_extractor.py:54)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1998-01-01 00:00:00")))
        & F.col("l_quantity").between(10, 20)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@query(
    "q_filter_notnull",
    oracle=oracle_player_base_cte()
    + """
SELECT match_id, puuid, skillshots_hit, skillshots_dodged
FROM player_base
WHERE skillshots_hit IS NOT NULL AND skillshots_dodged IS NOT NULL""",
)
def q_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: null/exists guards (tasks.py:113-115, db/mongodb.py:41-43) as
    ``na.drop`` over the nullable challenge fields."""
    return player_base(spark, sf_dir).na.drop(
        subset=["skillshots_hit", "skillshots_dodged"]
    ).select("match_id", "puuid", "skillshots_hit", "skillshots_dodged")


@query(
    "q_explode",
    oracle="""
SELECT p_partkey, t.token AS token
FROM part, UNNEST(string_split(p_name, ' ')) AS t(token)""",
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: array explode (the 10-participant fan-out,
    data_extractor.py:84-91). Generator runs inside codegen — no shuffle."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey", F.explode(F.split(F.col("p_name"), " ")).alias("token")
    )


@query(
    "q_limit",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100",
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: scan limit (cursor.limit, data_extractor.py:66-67). Ordered so
    the result is deterministic; Spark plans TakeOrderedAndProject."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )


# --- §2.3 joins -------------------------------------------------------------


@query(
    "q_join_outer",
    oracle="""
WITH l AS (
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0
),
r AS (
    SELECT l_orderkey, ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY l_orderkey
)
SELECT l.o_orderkey, l.o_totalprice, r.l_orderkey, r.sum_qty
FROM l FULL OUTER JOIN r ON l.o_orderkey = r.l_orderkey""",
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the detail+timeline merge (tasks.py:113-143) — a 1:1 outer join
    that proceeds when either side is missing. Equi-join → AQE picks
    sort-merge or shuffled-hash; both sides are pre-filtered so the
    exchange is minimal."""
    left = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 3 != 0)
        .select("o_orderkey", "o_totalprice")
    )
    right = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 2 == 0)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
    )
    return left.join(right, left.o_orderkey == right.l_orderkey, "full_outer")


@query(
    "q_semi_join",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000
)""",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: the isin() train/test semi-join (feature_factory.py:279-287)."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_anti_join",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000
)""",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 anti side (the complement split of feature_factory.py:279-287)."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_broadcast",
    oracle="""
SELECT r.r_name, COUNT(*) AS n_customers, ROUND(AVG(c.c_acctbal), 4) AS avg_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop dim join with explicit broadcast hints — the Spark analogue
    of the reference's in-memory dict lookup (feature_factory.py:57-60).
    nation (25 rows) and region (5 rows) replicate to every executor; the
    fact side never shuffles for the join, only for the final group-by."""
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


@query(
    "q_join_range",
    oracle="""
WITH bands AS (
    SELECT * FROM (VALUES
        ('p00_25', 900.0, 925.0),
        ('p25_50', 925.0, 950.0),
        ('p50_75', 950.0, 975.0),
        ('p75_00', 975.0, 1000.0)
    ) AS t(band, lo, hi)
)
SELECT b.band, COUNT(*) AS n_parts, ROUND(AVG(p.p_retailprice), 4) AS avg_price
FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band""",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/theta join (capability row, SURVEY §2.3). The band table is
    tiny → broadcast nested-loop join, which is the right physical plan; a
    big-big range join would instead bucketize the range key and equi-join
    on bucket (see operators/similarity.py for that pattern)."""
    part = _t(spark, sf_dir, "part")
    bands = F.broadcast(
        spark.createDataFrame(
            [
                ("p00_25", 900.0, 925.0),
                ("p25_50", 925.0, 950.0),
                ("p50_75", 950.0, 975.0),
                ("p75_00", 975.0, 1000.0),
            ],
            "band string, lo double, hi double",
        )
    )
    return (
        part.join(bands, (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


# --- §2.4 aggregations ------------------------------------------------------


@query(
    "q_groupby_sum",
    oracle="""
SELECT l_returnflag, l_linestatus,
    ROUND(SUM(l_quantity), 4) AS sum_qty,
    ROUND(SUM(l_extendedprice), 4) AS sum_price,
    ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
    COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def q_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (+TPC-H Q1 shape): hash aggregate with map-side partial agg —
    the distributed form of the reference's dict accumulation
    (data_extractor.py:76-81)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_groupby_avg",
    oracle="""
SELECT o_orderpriority, ROUND(AVG(o_totalprice), 4) AS avg_price, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority""",
)
def q_groupby_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: group-by mean (test_labeling.py:80-82)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "q_count_distinct",
    oracle="""
SELECT l_returnflag,
    COUNT(DISTINCT l_partkey) AS n_parts,
    COUNT(DISTINCT l_suppkey) AS n_supps
FROM lineitem GROUP BY l_returnflag""",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: exact distinct counts (nunique, test_modeling.py:27). At 100 TB
    prefer q_approx_distinct (HLL sketch, no per-key state explosion)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@query("q_approx_distinct")
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 sketch variant: HyperLogLog++ approx_count_distinct — the 100 TB
    path (single pass, fixed memory per group, no distinct shuffle).
    No SQL oracle: DuckDB's approx_count_distinct uses a different sketch,
    so values legitimately differ; correctness is bounded-error vs
    q_count_distinct (asserted in tests/test_northstar.py)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("n_parts_approx"),
            F.approx_count_distinct("l_suppkey", 0.01).alias("n_supps_approx"),
        )
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: distinct key extraction (df.unique(), feature_factory.py:255)."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_quantile",
    oracle="""
SELECT l_linestatus,
    ROUND(quantile_cont(l_quantity, 0.01), 6) AS q01,
    ROUND(quantile_cont(l_quantity, 0.50), 6) AS q50,
    ROUND(quantile_cont(l_quantity, 0.99), 6) AS q99
FROM lineitem GROUP BY l_linestatus""",
)
def q_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: exact interpolated percentiles (the clip bounds fit,
    feature_factory.py:230-238). Spark `percentile` == DuckDB
    `quantile_cont` (both linear interpolation). At 100 TB switch to
    `percentile_approx` (t-digest sketch, single pass)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.01)"), 6).alias("q01"),
            F.round(F.expr("percentile(l_quantity, 0.50)"), 6).alias("q50"),
            F.round(F.expr("percentile(l_quantity, 0.99)"), 6).alias("q99"),
        )
    )


@query("q_quantile_approx")
def q_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 sketch variant: percentile_approx (t-digest-style sketch, single
    pass, fixed memory) — the 100 TB path beside exact `q_quantile`.
    No SQL oracle (DuckDB's approx_quantile uses a different sketch);
    bounded error vs the exact operator asserted in
    tests/test_northstar.py."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.percentile_approx("l_quantity", 0.5, 10000).alias("p50_approx"),
            F.percentile_approx("l_quantity", 0.99, 10000).alias("p99_approx"),
        )
    )


@query(
    "q_null_profile",
    oracle=oracle_player_base_cte()
    + """
SELECT
    COUNT(*) AS n_rows,
    COUNT(CASE WHEN kill_participation IS NULL THEN 1 END) AS kp_nulls,
    COUNT(CASE WHEN team_damage_percentage IS NULL THEN 1 END) AS tdp_nulls,
    COUNT(CASE WHEN skillshots_hit IS NULL THEN 1 END) AS sh_nulls,
    COUNT(CASE WHEN skillshots_dodged IS NULL THEN 1 END) AS sd_nulls
FROM player_base""",
)
def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: null-count profile (df.isnull().sum(), test_labeling.py:92-97)."""
    df = player_base(spark, sf_dir)
    return df.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("kill_participation").isNull(), 1)).alias("kp_nulls"),
        F.count(F.when(F.col("team_damage_percentage").isNull(), 1)).alias("tdp_nulls"),
        F.count(F.when(F.col("skillshots_hit").isNull(), 1)).alias("sh_nulls"),
        F.count(F.when(F.col("skillshots_dodged").isNull(), 1)).alias("sd_nulls"),
    )


@query(
    "q_minmax",
    oracle="""
SELECT MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
    MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order
FROM orders""",
)
def q_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: min/max summary (test_modeling.py:33); exact, no float risk."""
    return _t(spark, sf_dir, "orders").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@query(
    "q_unpivot_stats",
    oracle="""
SELECT feature, ROUND(AVG(val), 4) AS mean_val, ROUND(STDDEV(val), 4) AS std_val
FROM (
    SELECT 'quantity' AS feature, l_quantity AS val FROM lineitem
    UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL SELECT 'discount', l_discount FROM lineitem
) u GROUP BY feature""",
)
def q_unpivot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: per-feature mean/std via unpivot (the feature-importance matrix
    stats, modeling.py:234-241). `stack` is a generator — no shuffle until
    the group-by."""
    li = _t(spark, sf_dir, "lineitem")
    unpivoted = li.selectExpr(
        "stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
        " 'discount', l_discount) AS (feature, val)"
    )
    return unpivoted.groupBy("feature").agg(
        F.round(F.avg("val"), 4).alias("mean_val"),
        F.round(F.stddev("val"), 4).alias("std_val"),
    )


@query(
    "q_cond_fraction",
    oracle="""
SELECT o_orderpriority,
    AVG(CASE WHEN o_totalprice > 250000 THEN 1.0 ELSE 0.0 END) AS frac_big
FROM orders GROUP BY o_orderpriority""",
)
def q_cond_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: conditional-fraction aggregate ((cond).mean(),
    test_modeling.py:118-123). 0/1 sums are exact in float → no rounding."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.avg(F.when(F.col("o_totalprice") > 250000, 1.0).otherwise(0.0)).alias("frac_big")
        )
    )


@query(
    "q_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 4) AS sum_qty, COUNT(*) AS n_rows
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets capability demo (SURVEY §2.4 'free' row)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q_pivot",
    oracle="""
SELECT l_returnflag,
    ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS O,
    ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS F
FROM lineitem GROUP BY l_returnflag""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot capability demo — explicit value list so no extra pass to
    discover pivot values (matters at scale)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 4))
    )


# --- §2.5 windows (beyond the match pipeline) -------------------------------


@query(
    "q_window_lag",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
    LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        AS prev_price
FROM orders""",
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag capability demo (SURVEY §2.5 'free' row); deterministic
    order via the unique o_orderkey tie-break."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.lag("o_totalprice").over(w).alias("prev_price"),
        )
    )


@query(
    "q_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
    ROUND(SUM(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
FROM orders""",
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total frame demo (rowsBetween)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 4).alias("running_spend"),
        )
    )


# --- §2.6 sorts / top-k -----------------------------------------------------


@query(
    "q_orderby",
    oracle="SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_acctbal DESC, c_custkey",
)
def q_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: global sort (test_labeling.py:62) — range-partitioned exchange,
    scales as a sample-then-scatter (no single-node sort)."""
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
    )


@query(
    "q_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: top-k (importance head(10), test_modeling.py:129). Spark plans
    TakeOrderedAndProject: per-partition heap of k, then driver merge —
    O(k) memory regardless of input size (100 TB-safe)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@query(
    "q_topk_per_group",
    oracle="""
SELECT * FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(ROW_NUMBER() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
    FROM orders
) t WHERE rn <= 3""",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the common OLAP pattern (guide); window + filter,
    one exchange on the group key."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- §2.7 set operations ----------------------------------------------------


@query(
    "q_union",
    oracle="""
SELECT c_custkey AS custkey, c_acctbal AS acctbal FROM customer WHERE c_acctbal > 9000
UNION ALL
SELECT c_custkey AS custkey, c_acctbal AS acctbal FROM customer WHERE c_nationkey < 5""",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL capability (SURVEY §2.7 — absent in reference). unionByName
    keeps duplicates; no shuffle (pure concatenation of partitions)."""
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey"), F.col("c_acctbal").alias("acctbal")
    )
    b = cust.filter(F.col("c_nationkey") < 5).select(
        F.col("c_custkey").alias("custkey"), F.col("c_acctbal").alias("acctbal")
    )
    return a.unionByName(b)


@query(
    "q_except",
    oracle="""
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT ALL
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL capability."""
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = cust.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("custkey"))
    return a.exceptAll(b)


@query(
    "q_intersect",
    oracle="""
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT ALL
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL capability."""
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = cust.filter(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("custkey"))
    return a.intersectAll(b)


# --- §2.8 scalar functions ---------------------------------------------------


@query(
    "q_json_extract",
    oracle="""
SELECT event_id, json_extract_string(props, '$.k') AS k_val
FROM events WHERE event_type = 'purchase'""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: JSON parsing (orjson.loads of API payloads, api.py:33,59).
    get_json_object evaluates JVM-side; for full-document shredding use
    from_json with the explicit bronze StructType (sources/match_view.py
    discussion, SURVEY §1.3)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", F.get_json_object(F.col("props"), "$.k").alias("k_val")
        )
    )


@query(
    "q_string_funcs",
    oracle="""
SELECT p_partkey,
    UPPER(p_name) AS name_upper,
    CAST(LENGTH(p_name) AS INTEGER) AS name_len,
    SUBSTRING(p_type, 1, 5) AS type_prefix,
    REPLACE(p_brand, '#', '-') AS brand_norm,
    CONCAT(p_brand, ':', p_type) AS brand_type
FROM part""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15-ish string surface (URL templating/formatting in the reference,
    api.py:21-22) as JVM-side string functions."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.regexp_replace("p_brand", "#", "-").alias("brand_norm"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
    )


@query(
    "q_date_parts",
    oracle="""
SELECT o_orderkey,
    CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
    CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
    DATE_TRUNC('month', o_orderdate) AS order_month_start
FROM orders""",
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface (SURVEY §2.8 'free' row)."""
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
    )


@query(
    "q_bucketize",
    oracle="""
SELECT
    CASE WHEN c_acctbal < 0 THEN 'negative'
         WHEN c_acctbal < 5000 THEN 'low'
         ELSE 'high' END AS balance_band,
    COUNT(*) AS n, ROUND(AVG(c_acctbal), 4) AS avg_bal
FROM customer GROUP BY 1""",
)
def q_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F7-style guarded CASE expressions as a bucketing aggregate."""
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return (
        _t(spark, sf_dir, "customer")
        .groupBy(band.alias("balance_band"))
        .agg(F.count("*").alias("n"), F.round(F.avg("c_acctbal"), 4).alias("avg_bal"))
    )
