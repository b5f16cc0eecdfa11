"""Second relational sweep: fitted-statistic ops (label encode, quantile
clip), metric aggregates, JSON shredding, cube/ntile capability rows, and
the salted group-by skew pattern (SURVEY §2.4/§2.8, §7 hard parts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.match_view import oracle_player_base_cte, player_base
from ..sources.tables import load_table


@query(
    "q_label_encode",
    oracle=oracle_player_base_cte()
    + """,
vocab AS (
    SELECT champion, CAST(ROW_NUMBER() OVER (ORDER BY champion) - 1 AS INT) AS champion_code
    FROM (SELECT DISTINCT champion FROM player_base) d
)
SELECT p.match_id, p.puuid, p.champion,
    COALESCE(v.champion_code, -1) AS champion_code
FROM player_base p LEFT JOIN vocab v ON p.champion = v.champion""",
)
def q_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: categorical -> int encode with unseen -> -1
    (feature_factory.py:254-263). Deterministic vocabulary (alphabetical)
    instead of first-seen order so the oracle agrees; the vocab is tiny ->
    broadcast map-side join, no fact shuffle. StringIndexer covers the
    ML-pipeline variant (ml/ranking.py)."""
    base = player_base(spark, sf_dir)
    vocab_w = Window.orderBy("champion")
    vocab = (
        base.select("champion")
        .distinct()
        .withColumn("champion_code", (F.row_number().over(vocab_w) - 1).cast("int"))
    )
    return (
        base.join(F.broadcast(vocab), "champion", "left")
        .select(
            "match_id",
            "puuid",
            "champion",
            F.coalesce("champion_code", F.lit(-1)).alias("champion_code"),
        )
    )


@query(
    "q_quantile_clip",
    oracle="""
WITH bounds AS (
    SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
           quantile_cont(l_extendedprice, 0.99) AS hi
    FROM lineitem
)
SELECT l_orderkey, l_linenumber,
    LEAST(GREATEST(l_extendedprice, b.lo), b.hi) AS price_clipped
FROM lineitem, bounds b""",
)
def q_quantile_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+F8: winsorize to the global [q01, q99] (feature_factory.py:230-238).
    Quantiles computed in one pass, then broadcast as a 1-row dimension —
    the fit-once/apply-everywhere shape that ml/ranking.py uses per split."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.expr("percentile(l_extendedprice, 0.01)").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("hi"),
    )
    return li.crossJoin(F.broadcast(bounds)).select(
        "l_orderkey",
        "l_linenumber",
        F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")).alias(
            "price_clipped"
        ),
    )


@query(
    "q_error_metrics",
    oracle="""
SELECT
    ROUND(AVG((l_extendedprice - l_quantity * p_retailprice)
        * (l_extendedprice - l_quantity * p_retailprice)), 4) AS mse,
    ROUND(SQRT(AVG((l_extendedprice - l_quantity * p_retailprice)
        * (l_extendedprice - l_quantity * p_retailprice))), 4) AS rmse,
    ROUND(AVG(ABS(l_extendedprice - l_quantity * p_retailprice)), 4) AS mae,
    ROUND(MEDIAN(ABS(l_extendedprice - l_quantity * p_retailprice)), 4) AS median_ae
FROM lineitem JOIN part ON l_partkey = p_partkey""",
)
def q_error_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: MSE/RMSE/MAE/median-AE (test_modeling.py:81-86,118-120) as one
    distributed aggregation — here 'prediction' is the list-price estimate
    quantity*retailprice vs the actual extended price."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    err = F.col("l_extendedprice") - F.col("l_quantity") * F.col("p_retailprice")
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(F.avg(err * err), 4).alias("mse"),
        F.round(F.sqrt(F.avg(err * err)), 4).alias("rmse"),
        F.round(F.avg(F.abs(err)), 4).alias("mae"),
        F.round(F.median(F.abs(err)), 4).alias("median_ae"),
    )


@query(
    "q_json_shred",
    oracle="""
SELECT event_id, event_type,
    CAST(json_extract(props, '$.k') AS INTEGER) AS k
FROM events""",
)
def q_json_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: full JSON shred against an explicit schema (from_json — the
    schema-on-write bronze parse, SURVEY §1.3), not per-path string
    extraction like q_json_extract."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )


@query(
    "q_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
    COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE capability row (SURVEY §2.4): all 4 grouping sets in one pass
    (Spark expands grouping sets without rescanning)."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total"))
    )


@query(
    "q_window_ntile",
    oracle="""
SELECT c_custkey, c_acctbal,
    CAST(NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS balance_quartile
FROM customer""",
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile capability row (SURVEY §2.5). Deterministic tie-break via the
    unique key. Single unpartitioned window: fine for a 1.5k-row dim; on a
    fact table use bucketed approxQuantile boundaries instead."""
    w = Window.orderBy(F.desc("c_acctbal"), "c_custkey")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.ntile(4).over(w).alias("balance_quartile")
    )


@query(
    "q_groupby_salted",
    oracle="""
SELECT l_returnflag,
    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
        AS total_price,
    COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag""",
)
def q_groupby_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew pattern (SURVEY §4 / guide): two-stage salted aggregation.
    l_returnflag has only ~3 values — the worst-case skew for a direct
    groupBy (3 reducers own everything). Stage 1 groups on
    (key, salt=hash%16) spreading each hot key over 16 reducers; stage 2
    merges the 48 partials. Oracle = the plain GROUP BY it must equal.

    The sum runs over exact integer CENTS (prices are 2-decimal values;
    ROUND(x*100) per row is one deterministic IEEE op in both engines),
    so partial-aggregation order cannot move the total — the r9 sf0.1
    sweep caught the previous ROUND(SUM(double), 4) form diverging by
    an accumulated-reorder ulp that crossed the rounding grain at 10x
    data (…881.9 vs …882 on a ~1e10 sum). The BIGINT total (< 2^53)
    converts to DOUBLE exactly; /100.0 is one more shared IEEE op."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    salted = (
        li.withColumn("salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(16)))
        .withColumn("cents", cents)
        .groupBy("l_returnflag", "salt")
        .agg(F.sum("cents").alias("partial_sum"), F.count("*").alias("partial_n"))
    )
    return salted.groupBy("l_returnflag").agg(
        (F.sum("partial_sum").cast("double") / 100.0).alias("total_price"),
        F.sum("partial_n").alias("n"),
    )


@query(
    "q_dead_letter",
    oracle="""
SELECT event_id,
    (event_id % 13 = 0) AS is_corrupt,
    CASE WHEN event_id % 13 = 0 THEN NULL
         ELSE CAST(json_extract(props, '$.k') AS INTEGER) END AS k
FROM events""",
)
def q_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: per-record error isolation (the reference's
    return_exceptions=True skip-and-continue, tasks.py:86-115). Corrupt
    payloads are synthesized deterministically, parsed in PERMISSIVE mode
    (from_json -> NULL on malformed input), and flagged — the flagged rows
    are the dead-letter stream, the rest continue. The ORACLE derives
    corruptness from construction, so it cross-checks Spark's permissive
    parser against ground truth."""
    ev = load_table(spark, sf_dir, "events")
    corrupted = F.when(
        F.col("event_id") % 13 == 0, F.concat(F.lit("{bad"), F.col("props"))
    ).otherwise(F.col("props"))
    # PERMISSIVE from_json yields a struct of NULL fields (not a NULL
    # struct) on malformed input; k is always present in valid payloads,
    # so a null k IS the corruption signal.
    parsed = F.from_json(corrupted, "k INT")
    return ev.select(
        "event_id",
        parsed.getField("k").isNull().alias("is_corrupt"),
        parsed.getField("k").alias("k"),
    )


@query(
    "q_array_funcs",
    oracle="""
SELECT doc_id,
    array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], '|')
        AS first_words,
    CAST(len(list_filter(string_split(text, ' '), w -> LENGTH(w) > 5)) AS INTEGER)
        AS n_long_words,
    ROUND(list_sum(list_transform(string_split(text, ' '),
        w -> CAST(LENGTH(w) AS DOUBLE))) / len(string_split(text, ' ')), 6)
        AS avg_word_len
FROM documents""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order function surface (SURVEY §2.8 'free' row):
    sort/distinct/slice, lambda filter, transform+aggregate — all
    JVM-evaluated, no UDFs.

    ``first_words`` is emitted as a '|'-joined string (array_join) rather
    than a raw array column: the driver's canonicalizer hashes sorted pandas
    frames and cannot sort a list-typed column (r4's only red row). The
    higher-order-function surface (array_sort/array_distinct/slice) is
    still fully exercised upstream of the join."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    word_lens = F.transform(words, lambda w: F.length(w).cast("double"))
    return docs.select(
        "doc_id",
        F.array_join(
            F.slice(F.array_sort(F.array_distinct(words)), 1, 5), "|"
        ).alias("first_words"),
        F.size(F.filter(words, lambda w: F.length(w) > 5)).alias("n_long_words"),
        F.round(
            F.aggregate(word_lens, F.lit(0.0), lambda acc, x: acc + x) / F.size(words), 6
        ).alias("avg_word_len"),
    )


_SCALAR_SUBQUERY_SQL = """
SELECT c_custkey, c_name,
    CAST((SELECT COUNT(*) FROM orders o
          WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
    ROUND((SELECT COALESCE(MAX(o_totalprice), 0.0) FROM orders o
           WHERE o.o_custkey = c.c_custkey), 4) AS max_price
FROM customer c"""


@query("q_scalar_subquery", oracle=_SCALAR_SUBQUERY_SQL)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (SURVEY §4 'free' row: Catalyst's
    RewriteCorrelatedScalarSubquery). The SAME SQL text runs on both
    engines; Spark decorrelates each subquery into an aggregate + left
    outer join — .explain shows no per-row re-execution, which is what
    makes the construct usable at 100 TB (a naive nested loop would be
    O(customers x orders))."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_SCALAR_SUBQUERY_SQL)


@query(
    "q_window_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey,
    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS INTEGER) AS d,
    ROUND(SUM(o_totalprice) OVER (
        PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1992-01-01', o_orderdate)
        RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 4) AS trailing_30d
FROM orders""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window, SURVEY §2.5 'free' row): trailing
    30-day spend per customer. rangeBetween keys on the ORDER BY value —
    rows 31+ days older fall out regardless of row count — unlike
    q_running_sum's rowsBetween. One exchange on o_custkey."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    w = Window.partitionBy("o_custkey").orderBy(d).rangeBetween(-30, 0)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        d.alias("d"),
        F.round(F.sum("o_totalprice").over(w), 4).alias("trailing_30d"),
    )


@query(
    "q_percent_rank",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice,
    ROUND(percent_rank() OVER (
        PARTITION BY p_brand ORDER BY p_retailprice, p_partkey), 6) AS pr,
    ROUND(cume_dist() OVER (
        PARTITION BY p_brand ORDER BY p_retailprice, p_partkey), 6) AS cd
FROM part""",
)
def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist (SURVEY §2.5 'free' row) — the normalized
    rank statistics feature pipelines use for per-group percentile
    features. Deterministic tie-break via the unique p_partkey; one
    exchange on p_brand."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


_TPCH_Q3_SQL = """
SELECT l.l_orderkey,
    ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
    o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority"""


@query("q_multijoin_pushdown", oracle=_TPCH_Q3_SQL)
def q_multijoin_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join (customer ⋈ orders ⋈ lineitem) with
    per-table filters — the §4 evidence row for what Catalyst does
    unprompted: each predicate pushes into its own parquet scan
    (PushedFilters), pruned columns never leave the scan (ReadSchema),
    and AQE broadcasts the filtered customer side instead of shuffling
    the fact table against it. SAME SQL text on both engines — the query
    is declared, the physical strategy is the optimizer's."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_TPCH_Q3_SQL)


_TPCH_Q5_SQL = """
SELECT n.n_name,
    ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1994-01-01'
  AND o.o_orderdate < TIMESTAMP '1995-01-01'
GROUP BY n.n_name"""


@query("q_multijoin_star", oracle=_TPCH_Q5_SQL)
def q_multijoin_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way star join: two broadcast-size dims
    (region, nation) chain into customer, then the orders/lineitem facts.
    Catalyst reorders so the selective region filter prunes nation →
    customer before any fact shuffle, and the dim joins broadcast — the
    join tree a planner must get right at 100 TB, obtained here from
    declarative SQL with zero hints."""
    from ..sources.tables import register_views

    register_views(
        spark, sf_dir, ("region", "nation", "customer", "orders", "lineitem")
    )
    return spark.sql(_TPCH_Q5_SQL)


def _feature_corr_oracle() -> str:
    from .match_pipeline import _oracle

    return _oracle("""
SELECT
    ROUND(corr(kda, performance_score), 6) AS kda_corr,
    ROUND(corr(damage_per_min, performance_score), 6) AS dpm_corr,
    ROUND(corr(gold_per_min, performance_score), 6) AS gpm_corr,
    ROUND(covar_samp(kda, damage_per_min), 6) AS kda_dpm_cov
FROM labeled""")


@query("q_feature_corr", oracle=_feature_corr_oracle())
def q_feature_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature↔label correlation screen over the silver table — the
    statistical profile a feature pipeline runs before training (the
    reference eyeballs feature importance post-hoc, modeling.py:215-243;
    correlating BEFORE training is the scalable first cut). Pearson corr
    and sample covariance are single-pass streaming aggregates
    (sum/sum-sq/cross-moment partials) — one reduce, no per-row state,
    identical math in both engines."""
    from .match_pipeline import filtered_players, performance_scored, player_features

    base = performance_scored(player_features(filtered_players(spark, sf_dir)))
    return base.agg(
        F.round(F.corr("kda", "performance_score"), 6).alias("kda_corr"),
        F.round(F.corr("damage_per_min", "performance_score"), 6).alias("dpm_corr"),
        F.round(F.corr("gold_per_min", "performance_score"), 6).alias("gpm_corr"),
        F.round(F.covar_samp("kda", "damage_per_min"), 6).alias("kda_dpm_cov"),
    )


_GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
    CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
    CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
    COUNT(*) AS n, ROUND(SUM(o_totalprice), 4) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())"""


@query("q_grouping_sets", oracle=_GROUPING_SETS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() disambiguation (SURVEY §2.4
    'free' row, beyond q_rollup/q_cube's fixed hierarchies): two
    independent one-dimension sets plus the grand total in ONE pass —
    Spark expands the sets over a single scan (Expand + one aggregate
    exchange), where hand-running three group-bys would scan three times.
    Identical SQL on both engines; GROUPING() tells a NULL group key from
    a NULL data value."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_GROUPING_SETS_SQL)


@query(
    "q_map_funcs",
    oracle="""
SELECT o_custkey, o_orderpriority AS priority, COUNT(*) AS n
FROM orders
GROUP BY o_custkey, o_orderpriority""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface (SURVEY §2.8 'free' row): per-customer
    order counts carried as a map<priority, count> column
    (map_from_entries over collected per-group structs), then unpacked
    with explode(map) — proving the build/carry/unpack round-trip is
    lossless against the plain GROUP BY oracle. The map stage is where a
    document-shaped gold table would keep per-key aggregates; everything
    is JVM-side (no UDF) and adds no exchange beyond the group-by's."""
    orders = load_table(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    as_map = per_key.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("o_orderpriority"), F.col("n")))
        ).alias("by_priority")
    )
    return as_map.select(
        "o_custkey", F.explode("by_priority").alias("priority", "n")
    )


@query(
    "q_mode_per_group",
    oracle="""
WITH counts AS (
    SELECT p_type, p_brand, CAST(COUNT(*) AS BIGINT) AS c
    FROM part GROUP BY p_type, p_brand
)
SELECT p_type, p_brand AS mode_brand, c AS n_rows
FROM (
    SELECT p_type, p_brand, c,
        ROW_NUMBER() OVER (PARTITION BY p_type ORDER BY c DESC, p_brand) AS rn
    FROM counts
)
WHERE rn = 1 ORDER BY p_type""",
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with a deterministic tie-break (largest
    count, then lexicographically smallest value) — the categorical
    companion to q_quantile. Two-level aggregation: the corpus reduces to
    (group, value) cells FIRST (partial-agg map-side), then the argmax
    window runs over cells only — never a rank window over raw rows (the
    naive formulation's corpus-wide sort). Spark's mode() builtin is
    deliberately avoided: its tie behavior is undefined, which can never
    hash-match a second engine."""
    from pyspark.sql import Window

    counts = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_type", "p_brand")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    w = Window.partitionBy("p_type").orderBy(F.col("c").desc(), "p_brand")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_type", F.col("p_brand").alias("mode_brand"), F.col("c").alias("n_rows")
        )
        .orderBy("p_type")
    )
