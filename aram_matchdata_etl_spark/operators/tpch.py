"""Adapted TPC-H Q1-Q22 over the driver fixtures.

The reference pipeline never runs SQL benchmarks (SURVEY.md §6: no
TPC-H/DS/SSB anywhere), but an analytics engine's canonical capability
evidence is the TPC-H suite, and the fixtures are TPC-H-ish by design
(TESTDATA.md). This module carries every one of the 22 queries, adapted
to the trimmed fixture schema:

  - no ``partsupp`` table -> Q2/Q11/Q16/Q20 re-derive the part<->supplier
    relationship from ``lineitem`` (same join/subquery shape, different
    base table);
  - no ``l_commitdate``/``l_receiptdate`` -> "late" is re-defined as
    ``l_shipdate > o_orderdate + INTERVAL n DAY`` (Q4/Q12/Q21);
  - no ``l_shipmode``/``p_container``/``c_phone`` -> the categorical
    group/filter columns swap to ``l_returnflag``/``p_size``/
    ``c_nationkey`` (Q12/Q17/Q19/Q22);
  - constants re-calibrated so every query is non-empty at sf0.01 (the
    driver's oracle gate) and selective enough to exercise pushdown.

Shared float-parity conventions from operators/relational.py apply:
ROUND(sum,2)/ROUND(avg|ratio,4) on BOTH sides, identical aliases, unique
tie-break keys in every ORDER BY ... LIMIT.

Scale notes (100 TB posture): every query below compiles to stock
Catalyst operators -- scans with pushed filters + pruned columns, hash
aggregates with map-side partials, AQE-picked broadcast vs sort-merge
joins (dim tables region/nation/supplier/customer/part get explicit
``F.broadcast`` hints where they are guaranteed small relative to
lineitem/orders), and window functions only where the query semantics
need them. Correlated subqueries are expressed as aggregate-then-join --
the plan Catalyst's decorrelation would produce anyway, made explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table
from .oracle_helpers import spark_round as _spark_round


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


def _disc():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q_tpch_q1",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
       ROUND(AVG(l_discount), 4)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary (verbatim). One scan, one hash aggregate with
    map-side partials; the shipdate filter pushes into the parquet scan.
    At 100 TB this is the textbook partial-agg query: 6 groups, so the
    shuffle moves ~6 rows per map task."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= _ts("1998-09-02 00:00:00")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(_disc()), 2).alias("sum_disc_price"),
        F.round(F.sum(_disc() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q_tpch_q2",
    oracle=f"""
WITH offers AS (
    SELECT l_partkey AS op_partkey, l_suppkey AS op_suppkey,
           MIN(l_extendedprice / l_quantity) AS unit_price
    FROM lineitem
    GROUP BY l_partkey, l_suppkey)
-- spark_round: DuckDB's FP ROUND diverges from Spark's shortest-string
-- BigDecimal round on boundary doubles (here: 26.241249999999997 * 1e4
-- lands exactly on 262412.5 in FP -> 26.2413, Spark says 26.2412);
-- see operators/oracle_helpers.py
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       {_spark_round("unit_price", 4)} AS unit_price
FROM offers
JOIN part     ON p_partkey = op_partkey
JOIN supplier ON s_suppkey = op_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN region   ON r_regionkey = n_regionkey
WHERE p_size = 15 AND r_name = 'EUROPE'
  AND unit_price = (SELECT MIN(o2.unit_price) FROM offers o2
                    WHERE o2.op_partkey = offers.op_partkey)""",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 min-cost supplier. No partsupp fixture, so the part<->supplier
    offer price is re-derived from lineitem (min observed unit price per
    pair); the correlated MIN subquery becomes a window-min over the part
    key -- one shuffle on op_partkey instead of a self-join re-shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    offers = li.groupBy(
        F.col("l_partkey").alias("op_partkey"),
        F.col("l_suppkey").alias("op_suppkey"),
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    # Window-min per part == the correlated scalar subquery, decorrelated.
    w = Window.partitionBy("op_partkey")
    best = offers.withColumn("min_up", F.min("unit_price").over(w)).filter(
        F.col("unit_price") == F.col("min_up")
    )
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        best.join(F.broadcast(part), F.col("p_partkey") == F.col("op_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("op_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("unit_price", 4).alias("unit_price"),
        )
    )


@query(
    "q_tpch_q3",
    oracle="""
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10""",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority (o_shippriority column absent ->
    o_orderpriority). Customer is the small side -> broadcast into
    orders; the orders->lineitem join shuffles on orderkey; top-10 plans
    as TakeOrderedAndProject (no global sort materialization)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-03-15 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1998-03-15 00:00:00")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_disc()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q4",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority""",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking. "Late" redefined as shipped >60 days
    after order date (no commit/receipt dates in the fixture). The EXISTS
    becomes a left-semi join -- Spark's native decorrelation target -- so
    lineitem is never widened, only probed."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-10-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q_tpch_q5",
    oracle="""
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name""",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume (verbatim). The only big-big join is
    lineitem><orders on orderkey; customer/supplier/nation/region all
    broadcast. The c_nationkey = s_nationkey residual rides on the
    supplier join rather than forcing an extra shuffle."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc()), 2).alias("revenue"))
    )


@query(
    "q_tpch_q6",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24""",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting-revenue change (verbatim). Pure scan+filter+agg:
    every predicate pushes to the parquet reader (row-group min/max
    skipping on shipdate), no shuffle at all beyond the final 1-row
    reduce."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@query(
    "q_tpch_q7",
    oracle="""
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00') shipping
GROUP BY supp_nation, cust_nation, l_year""",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping (verbatim). Self-joined nation dim aliased
    twice; both sides broadcast. The nation-pair OR predicate lands after
    the broadcast joins, where it's a codegen'd row filter."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            _ts("1996-01-01 00:00:00"), _ts("1997-12-31 00:00:00")
        )
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(_t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair | rpair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            _disc().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@query(
    "q_tpch_q8",
    oracle="""
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00') allnations
GROUP BY o_year""",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share (verbatim; p_type='ECONOMY' stands in for
    the 3-word TPC-H type). The selective part filter broadcasts into
    lineitem FIRST, shrinking the orderkey shuffle by ~6x before the
    orders join."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            _ts("1996-01-01 00:00:00"), _ts("1997-12-31 00:00:00")
        )
    )
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _disc().alias("volume"),
            "nation",
        )
    )
    share = F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(0.0))
    return vol.groupBy("o_year").agg(
        F.round(share / F.sum("volume"), 4).alias("mkt_share")
    )


@query(
    "q_tpch_q9",
    oracle="""
SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.5 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%') profit
GROUP BY nation, o_year""",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit. No partsupp.ps_supplycost in the fixture,
    so cost is proxied as 0.5*p_retailprice per unit -- the plan shape
    (selective LIKE on part -> broadcast -> big orderkey join -> two-key
    agg) is identical to canonical Q9."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    amount = _disc() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(_t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


@query(
    "q_tpch_q10",
    oracle="""
SELECT c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20""",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting (address/phone/comment columns absent
    from the fixture, otherwise verbatim). Group-by carries the customer
    attributes through the agg instead of re-joining after -- one shuffle."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-10-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_disc()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_tpch_q11",
    oracle="""
WITH partvalue AS (
    SELECT l_partkey AS pv_partkey,
           SUM(l_extendedprice * l_quantity) AS value
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE s_nationkey = 3
    GROUP BY l_partkey)
SELECT pv_partkey, ROUND(value, 2) AS value
FROM partvalue
WHERE value > (SELECT SUM(value) * 0.001 FROM partvalue)""",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock. partsupp value re-proxied as traded value
    (extendedprice*quantity) per part from one nation's suppliers. The
    global-total scalar subquery becomes an agg cross-joined back --
    a 1-row broadcast, not a second scan of the base table (the grouped
    frame is reused for both branches)."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    pv = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("pv_partkey"))
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    total = pv.agg((F.sum("value") * 0.001).alias("threshold"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("pv_partkey", F.round("value", 2).alias("value"))
    )


@query(
    "q_tpch_q12",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag""",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-mode priority split (no l_shipmode -> group by
    l_returnflag; "late" = shipped >30 days after order). The CASE-sum
    pattern compiles to a single hash agg over the joined rows."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    joined = li.join(
        _t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey")
    ).filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_returnflag").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~is_high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


@query(
    "q_tpch_q13",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey) c_orders
GROUP BY c_count""",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution (the o_comment NOT LIKE
    filter becomes a priority exclusion -- same join-predicate placement:
    it must ride ON the left join, not WHERE, to keep 0-order customers).
    COUNT(o_orderkey) ignores nulls so unmatched customers count 0."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_tpch_q14",
    oracle="""
SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'""",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect (fixture p_type is the single word 'PROMO' --
    equality instead of LIKE 'PROMO%'). Part broadcasts; one month of
    lineitem survives the pushed shipdate filter."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    )
    joined = li.join(
        F.broadcast(_t(spark, sf_dir, "part")), F.col("l_partkey") == F.col("p_partkey")
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _disc()).otherwise(0.0))
    return joined.agg(
        F.round(100.0 * promo / F.sum(_disc()), 4).alias("promo_revenue")
    )


@query(
    "q_tpch_q15",
    oracle="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey)
SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)""",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier (verbatim, CTE view inlined). The max-revenue
    scalar subquery is a 1-row agg broadcast back over the grouped frame;
    the supplier dim joins broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc()).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
    )


@query(
    "q_tpch_q16",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size""",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 part/supplier relationship. partsupp re-derived from lineitem;
    the "complaints" supplier exclusion becomes a negative-acctbal
    exclusion, planned as a broadcast left-anti join (NOT IN with
    guaranteed-non-null keys)."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q17",
    oracle="""
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_size <= 10
  AND l_quantity < (SELECT 0.5 * AVG(l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)""",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue (p_container absent -> p_size
    filter; 0.2 multiplier relaxed to 0.5 for fixture selectivity). The
    correlated AVG decorrelates to a per-part aggregate joined back; the
    per-part avg frame is tiny (few parts survive the brand filter) so it
    broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10)
    )
    target = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    per_part_avg = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg((0.5 * F.avg("l_quantity")).alias("qty_cut"))
    )
    return (
        target.join(F.broadcast(per_part_avg), F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q_tpch_q18",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice""",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers (threshold 250 calibrated to the
    fixture's max per-order quantity of ~460). The IN-subquery is a
    semi-join against the HAVING aggregate; both the aggregate and the
    outer agg shuffle on l_orderkey, so AQE can reuse the exchange."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(_t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "customer")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


@query(
    "q_tpch_q19",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)""",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue (container/shipmode clauses -> size/quantity
    clauses). The disjunction references both sides, so it stays a
    post-join residual -- but Catalyst extracts the common p_brand IN
    (...) / p_size <= 15 envelope and pushes it into the part scan."""
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(_t(spark, sf_dir, "part")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(b1 | b2 | b3)
        .agg(F.round(F.sum(_disc()), 2).alias("revenue"))
    )


@query(
    "q_tpch_q20",
    oracle="""
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 300)""",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion. partsupp availability re-proxied as
    shipped PROMO volume per supplier in the year; the nested IN
    subqueries become two stacked semi-joins (part list broadcasts into
    lineitem, supplier aggregate broadcasts into supplier)."""
    promo_parts = (
        _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    heavy = (
        li.join(
            F.broadcast(promo_parts),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 300)
        .select("l_suppkey")
    )
    return _t(spark, sf_dir, "supplier").join(
        F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name", "s_acctbal")


@query(
    "q_tpch_q21",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders      ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name""",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting ("late" = shipped >60 days
    after order date). The EXISTS / NOT EXISTS pair is decorrelated into
    ONE per-order aggregate (distinct suppliers, distinct late suppliers)
    joined back -- one extra shuffle on orderkey instead of two
    correlated re-scans of lineitem."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    base = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    stats = base.groupBy(F.col("l_orderkey").alias("st_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("nlate"),
    )
    sole_late = (
        base.filter(F.col("late"))
        .join(stats, F.col("l_orderkey") == F.col("st_orderkey"))
        .filter((F.col("nsupp") > 1) & (F.col("nlate") == 1))
    )
    return (
        sole_late.join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q_tpch_q22",
    oracle="""
WITH hot AS (SELECT * FROM customer
             WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM hot
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM hot WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
GROUP BY c_nationkey""",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity (c_phone country codes -> c_nationkey;
    "never ordered" -> "no orders since 2001", because every fixture
    customer has some order). Scalar avg broadcasts; the NOT EXISTS is a
    left-anti join against date-filtered orders."""
    hot = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    avg_bal = hot.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2001-01-01 00:00:00")
    )
    return (
        hot.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            F.broadcast(recent.select("o_custkey")),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
