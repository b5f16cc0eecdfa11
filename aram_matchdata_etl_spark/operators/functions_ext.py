"""Scalar/window/set-op function surface not covered elsewhere.

SURVEY.md §2.7/§2.8 records these as "free with Spark" capability rows --
the reference itself never uses them (its only set-op analogue is queue
dedup, redis.py:54-59; its only date use is datetime.now() stamping,
feature_factory.py:104). They are engine capabilities a reference user
would expect when switching, so each gets a real query + DuckDB oracle:

  - window navigation: first/last/nth_value with explicit frames (the
    frame default trap: last_value over the default frame is the CURRENT
    row -- both engines agree, the query pins it);
  - multiset algebra: EXCEPT ALL / INTERSECT ALL (bag semantics, vs the
    set-semantics q_except/q_intersect in relational.py);
  - posexplode == UNNEST WITH ORDINALITY;
  - three-valued-logic toolkit: null-safe equality, NULLIF/COALESCE/
    GREATEST over nullable columns;
  - date arithmetic beyond q_date_parts: datediff, interval add,
    last_day, week truncation, day-of-week;
  - distribution moments: stddev/variance/skewness/kurtosis -- Spark's
    skewness/kurtosis are POPULATION g1 / excess g2, so the oracle
    spells the same formula from central moments instead of DuckDB's
    bias-corrected sample versions.

Scale: all pure column expressions or single-exchange aggregates/windows;
nothing here adds a shuffle beyond its group/partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.match_view import oracle_player_base_cte, player_base
from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q_window_navigation",
    oracle="""
SELECT event_id, user_id,
       first_value(value) OVER w_full            AS first_val,
       last_value(value)  OVER w_full            AS last_val,
       nth_value(value, 3) OVER w_full           AS third_val,
       last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                                 AS running_last
FROM events
WINDOW w_full AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window navigation functions (SURVEY §2.5 'free' row). The
    unbounded frame is spelled explicitly because the ORDER BY default
    frame ends at CURRENT ROW -- `running_last` pins that default (it
    degenerates to the current row's value in both engines). One
    exchange on user_id serves all four functions."""
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_default = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.first("value").over(w_full).alias("first_val"),
        F.last("value").over(w_full).alias("last_val"),
        F.nth_value("value", 3).over(w_full).alias("third_val"),
        F.last("value").over(w_default).alias("running_last"),
    )


@query(
    "q_except_all",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'""",
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL -- bag difference (each 'P' occurrence cancels ONE 'F'
    occurrence), vs the set-semantics q_except. Spark plans it as a
    count-tagged aggregate + generate, one shuffle on the value."""
    orders = _t(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    p = orders.filter(F.col("o_orderstatus") == "P").select("o_orderpriority")
    return f.exceptAll(p)


@query(
    "q_intersect_all",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'""",
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL -- bag intersection (multiplicity = min of the two
    sides), completing the §2.7 set-algebra family."""
    orders = _t(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    p = orders.filter(F.col("o_orderstatus") == "P").select("o_orderpriority")
    return f.intersectAll(p)


@query(
    "q_posexplode",
    oracle="""
SELECT p_partkey, CAST(pos AS INT) AS pos, token
FROM (SELECT p_partkey,
             UNNEST(list_transform(string_split(p_name, ' '),
                                   (t, i) -> {'pos': i - 1, 'token': t}),
                    recursive := true)
      FROM part)""",
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode == position-preserving UNNEST (DuckDB 1.0 has no WITH
    ORDINALITY, so the oracle zips the index in via list_transform's
    (element, 1-based-index) lambda). Position-preserving fan-out matters
    for the sequence-packing/chunking operators, which must keep token
    order after explode."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "token"),
    )


@query(
    "q_null_semantics",
    oracle=oracle_player_base_cte()
    + """
SELECT match_id, puuid,
       (skillshots_hit IS NOT DISTINCT FROM skillshots_dodged) AS ns_eq,
       COALESCE(skillshots_hit, -1)                  AS hit_or_default,
       NULLIF(gold_earned, 0)                        AS gold_nonzero,
       GREATEST(COALESCE(skillshots_hit, 0),
                COALESCE(skillshots_dodged, 0))      AS best_skill
FROM player_base""",
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic toolkit over the nullable challenges columns
    (the reference's .get(..., 0) defaults, feature_factory.py:53-60,86):
    null-safe equality (<=> / IS NOT DISTINCT FROM), NULLIF as the
    replace(0, NULL) guard, COALESCE defaults, GREATEST."""
    return player_base(spark, sf_dir).select(
        "match_id",
        "puuid",
        F.col("skillshots_hit").eqNullSafe(F.col("skillshots_dodged")).alias("ns_eq"),
        F.coalesce(F.col("skillshots_hit"), F.lit(-1)).alias("hit_or_default"),
        F.nullif(F.col("gold_earned"), F.lit(0)).alias("gold_nonzero"),
        F.greatest(
            F.coalesce(F.col("skillshots_hit"), F.lit(0)),
            F.coalesce(F.col("skillshots_dodged"), F.lit(0)),
        ).alias("best_skill"),
    )


@query(
    "q_date_arith",
    oracle="""
SELECT o_orderkey,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2001-08-01 00:00:00')
            AS INT)                                       AS age_days,
       o_orderdate + INTERVAL 90 DAY                      AS due_ts,
       CAST(last_day(o_orderdate) AS TIMESTAMP)           AS month_end,
       date_trunc('week', o_orderdate)                    AS week_start,
       CAST(dayofweek(o_orderdate) AS INT)                AS dow
FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'""",
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic (SURVEY §2.8 'free' row; the reference only ever
    stamps datetime.now()). Engine deltas reconciled: Spark datediff is
    (end, start) vs DuckDB date_diff('day', start, end); Spark dayofweek
    is 1=Sunday vs DuckDB 0=Sunday, so the Spark side subtracts 1; both
    last_day() return DATE and both week-truncate to Monday."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("2001-01-01 00:00:00")))
        .select(
            "o_orderkey",
            F.datediff(
                F.to_timestamp(F.lit("2001-08-01 00:00:00")), F.col("o_orderdate")
            ).alias("age_days"),
            (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_ts"),
            # cast to timestamp on BOTH sides: a bare DATE reaches pandas
            # as datetime.date from Spark but datetime64 from DuckDB
            F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
            F.date_trunc("week", "o_orderdate").alias("week_start"),
            (F.dayofweek("o_orderdate") - F.lit(1)).alias("dow"),
        )
    )


@query(
    "q_stats_moments",
    oracle="""
WITH mu AS (SELECT event_type, AVG(value) AS m FROM events GROUP BY event_type)
SELECT e.event_type,
       ROUND(STDDEV_SAMP(value), 6)  AS sd,
       ROUND(VAR_SAMP(value), 6)     AS var,
       ROUND(AVG(POW(value - m, 3)) / POW(STDDEV_POP(value), 3), 6) AS skew,
       ROUND(AVG(POW(value - m, 4)) / POW(VAR_POP(value), 2) - 3, 6) AS kurt
FROM events e JOIN mu USING (event_type)
GROUP BY e.event_type""",
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution moments per group. Spark's skewness/kurtosis are the
    POPULATION g1 and excess g2 (single-pass streaming central moments);
    DuckDB's builtins are bias-corrected sample statistics, so the oracle
    computes the population formula explicitly via a two-pass
    mean-join. Single exchange on event_type on the Spark side."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("value"), 6).alias("sd"),
            F.round(F.var_samp("value"), 6).alias("var"),
            F.round(F.skewness("value"), 6).alias("skew"),
            F.round(F.kurtosis("value"), 6).alias("kurt"),
        )
    )
