"""Data-quality rule engine: declarative row-level constraints + a
referential-integrity check, evaluated in ONE corpus pass with a
per-rule violation report — the contract-validation stage (Deequ-style)
a warehouse runs on every ingest batch. The reference's implicit
contract (positive quantities, bounded rates, every lineitem row
belonging to an order) is made explicit and measured.

Scale notes (100 TB): all row-level rules evaluate as conditional
aggregates in a single scan (map-side partials -> one readout row per
rule — the corpus is never scanned per rule). The referential check is
the only join: a LEFT ANTI against the orders keys, which AQE
broadcast-executes while the key set fits and shuffle-joins beyond.

The fixture is clean by construction, so violations are INJECTED
deterministically (the q_dead_letter pattern): a keyed subset of rows
is corrupted before validation and the oracle derives the same
corruption, proving the rule engine counts exactly the planted bugs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

# rule name -> violation predicate over the (corrupted) lineitem row
RULES_SQL = (
    ("quantity_positive", "qty <= 0"),
    ("price_non_negative", "price < 0"),
    ("discount_in_unit_range", "disc < 0 OR disc > 1"),
)


def dq_report(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate named violation predicates in one pass: returns one row
    per rule with (n_checked, n_violations). Pure conditional
    aggregation — adding a rule adds a column, never a scan."""
    aggs = []
    for name, pred in rules:
        aggs.append(F.count("*").alias(f"__n_{name}"))
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).alias(f"__v_{name}")
        )
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(f"__n_{name}").alias("n_checked"),
            F.col(f"__v_{name}").alias("n_violations"),
        )
        for name, _ in rules
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


@query(
    "q_dq_violations",
    oracle=f"""
WITH corrupted AS (
    SELECT l_orderkey,
        CASE WHEN l_orderkey % 97 = 0 THEN -l_quantity ELSE l_quantity END AS qty,
        CASE WHEN l_orderkey % 89 = 0 THEN -l_extendedprice ELSE l_extendedprice END AS price,
        CASE WHEN l_orderkey % 83 = 0 THEN l_discount + 2.0 ELSE l_discount END AS disc
    FROM lineitem
), row_rules AS (
    {" UNION ALL ".join(
        f"SELECT '{name}' AS rule, COUNT(*) AS n_checked, "
        f"CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_violations FROM corrupted"
        for name, pred in RULES_SQL
    )}
), ref AS (
    SELECT 'orderkey_references_orders' AS rule,
        (SELECT COUNT(*) FROM corrupted) AS n_checked,
        (SELECT COUNT(*) FROM corrupted c
         WHERE (c.l_orderkey * 2) NOT IN (SELECT o_orderkey FROM orders))
            AS n_violations
)
SELECT * FROM row_rules UNION ALL SELECT * FROM ref""",
)
def q_dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ report over lineitem with planted violations: negated
    quantities (every 97th orderkey), negated prices (89th),
    out-of-range discounts (83rd), and a referential check evaluated on
    a DOUBLED key (l_orderkey * 2 — odd orderkeys then reference
    nothing, giving the anti-join a real miss population). Row rules are
    one conditional-aggregation pass; the referential rule is the one
    anti-join."""
    li = load_table(spark, sf_dir, "lineitem")
    corrupted = li.select(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 97 == 0, -F.col("l_quantity"))
        .otherwise(F.col("l_quantity"))
        .alias("qty"),
        F.when(F.col("l_orderkey") % 89 == 0, -F.col("l_extendedprice"))
        .otherwise(F.col("l_extendedprice"))
        .alias("price"),
        F.when(F.col("l_orderkey") % 83 == 0, F.col("l_discount") + 2.0)
        .otherwise(F.col("l_discount"))
        .alias("disc"),
    )
    rules = [
        ("quantity_positive", F.col("qty") <= 0),
        ("price_non_negative", F.col("price") < 0),
        ("discount_in_unit_range", (F.col("disc") < 0) | (F.col("disc") > 1)),
    ]
    row_report = dq_report(corrupted, rules)

    orders = load_table(spark, sf_dir, "orders")
    misses = corrupted.select(
        (F.col("l_orderkey") * 2).alias("ref_key")
    ).join(
        orders.select(F.col("o_orderkey").alias("ref_key")), "ref_key", "left_anti"
    )
    ref_report = (
        corrupted.agg(F.count("*").alias("n_checked"))
        .crossJoin(misses.agg(F.count("*").alias("n_violations")))
        .select(
            F.lit("orderkey_references_orders").alias("rule"),
            "n_checked",
            "n_violations",
        )
    )
    return row_report.unionByName(ref_report)


@query(
    "q_benford",
    oracle="""
WITH digits AS (
    -- explicit FLOOR: DuckDB's double->BIGINT cast rounds, Spark's
    -- truncates; floor pins both to the same integer
    SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
        AS INTEGER) AS digit
    FROM orders WHERE o_totalprice >= 1
), obs AS (
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
    FROM digits GROUP BY digit
), dense AS (
    -- densify 1..9: a digit that NEVER occurs is the loudest Benford
    -- signal and must appear with n=0 (chi2_term = benford_p), not
    -- silently vanish from the readout
    SELECT CAST(d.d AS INTEGER) AS digit, COALESCE(o.n, 0) AS n,
        SUM(COALESCE(o.n, 0)) OVER () AS total
    FROM range(1, 10) d(d) LEFT JOIN obs o ON o.digit = d.d
)
SELECT digit, n,
    ROUND(n * 1.0 / total, 6) AS observed_p,
    ROUND(LOG(1.0 + 1.0 / digit) / LOG(10.0), 6) AS benford_p,
    ROUND(POW(n * 1.0 / total - LOG(1.0 + 1.0 / digit) / LOG(10.0), 2)
        / (LOG(1.0 + 1.0 / digit) / LOG(10.0)), 6) AS chi2_term
FROM dense""",
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit test on order totals — the classic
    fraud/fabrication screen for naturally occurring amounts (first
    digit d should appear with probability log10(1 + 1/d)); the chi2
    contribution per digit localizes WHICH digit deviates. Composes
    with the DQ rule engine as a distribution-level rule beside the
    row-level predicates.

    One pass: the digit extraction is string codegen on the scan, the
    digit histogram is a 9-row groupBy with map-side partials, and the
    expected-frequency math runs on those 9 rows."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    obs = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    # densify 1..9: an absent digit is the loudest deviation and must
    # surface as n=0 (chi2_term = benford_p) instead of vanishing
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    obs = (
        digits.join(obs, "digit", "left")
        .select("digit", F.coalesce("n", F.lit(0)).alias("n"))
        .withColumn("total", F.sum("n").over(Window.partitionBy()))
    )
    p = F.col("n") * 1.0 / F.col("total")
    bp = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return obs.select(
        "digit",
        "n",
        F.round(p, 6).alias("observed_p"),
        F.round(bp, 6).alias("benford_p"),
        F.round(F.pow(p - bp, 2) / bp, 6).alias("chi2_term"),
    )
