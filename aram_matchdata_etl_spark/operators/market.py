"""Market-basket mining and item-item collaborative filtering over the
order history: frequent pair itemsets (A-Priori pass-2 pair counting),
association rules (confidence / lift), and capped-basket item-item
cosine neighbors (the co-occurrence form of item-based CF, Sarwar et
al. WWW'01 / Linden et al. IEEE IC'03) — the recommendation family a
retail-shaped warehouse runs directly on the fact table.

Baskets are CUSTOMER part-sets (``lineitem x orders -> (o_custkey,
l_partkey) DISTINCT``): the repeat-purchase grain where co-occurrence
is dense enough to rank (order-grain baskets on the fixture average ~4
items and produce almost no repeated pairs).

Scale notes (100 TB):
- Pair generation is a SELF-JOIN WITHIN BASKET — per-basket cost is
  |basket|^2, corpus cost sum(b_i^2), NOT |items|^2. Baskets are
  naturally bounded at the order grain; at the customer grain the CF
  operator enforces a deterministic md5-order cap (``CF_CAP``) first,
  the standard DIMSUM-style mitigation, so one hoarder account cannot
  quadratically dominate a task. The itemset/rule pair counting keeps
  the raw basket (support counts must be exact) but its growth is
  linear in baskets for bounded basket size.
- Pair counting shuffles 16-byte (item, item) keys with map-side
  partial aggregation; item bodies/descriptions never move.
- The support filter runs AFTER the exact count (A-Priori's pass-2:
  candidate pruning cannot precede counting for pairs) but every
  downstream stage — rules, confidence, lift — works on the pruned
  pair table, which is orders of magnitude smaller than the pair
  stream.
- Rule statistics (confidence, lift) join the pruned pairs against the
  per-item basket counts — a broadcast-sized dimension (|catalog|
  rows) for any real catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

MIN_SUP = 5  # minimum pair (co-occurrence) count
MIN_CONF = 0.2  # minimum rule confidence
CF_CAP = 32  # per-basket item cap for the CF cosine (md5 order)
CF_MIN_CO = 3  # minimum co-count for a CF candidate pair
CF_TOPK = 5  # neighbors kept per item

_ITEMS_SQL = """
    SELECT DISTINCT o_custkey AS bid, l_partkey AS item
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def _baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bid, item) DISTINCT customer baskets."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("bid"), F.col("l_partkey").alias("item"))
        .distinct()
    )


def pair_counts(items: DataFrame) -> DataFrame:
    """Exact within-basket pair co-occurrence counts (item_a < item_b)."""
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bid") == F.col("b.bid"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count("*").cast("bigint").alias("pair_count"))
    )


@query(
    "q_itemset_pairs",
    oracle=f"""
WITH items AS ({_ITEMS_SQL}),
n AS (SELECT COUNT(DISTINCT bid) AS n_baskets FROM items),
pairs AS (
    SELECT a.item AS item_a, b.item AS item_b,
        CAST(COUNT(*) AS BIGINT) AS pair_count
    FROM items a JOIN items b ON a.bid = b.bid AND a.item < b.item
    GROUP BY 1, 2
)
SELECT item_a, item_b, pair_count,
    ROUND(pair_count * 1.0 / n_baskets, 6) AS support
FROM pairs CROSS JOIN n
WHERE pair_count >= {MIN_SUP}""",
)
def q_itemset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent pair itemsets with exact support: every part pair bought
    by at least {MIN_SUP} distinct customers, support = pair count over
    the basket universe. The A-Priori pass the rest of the family
    builds on; support is exact (no sampling, no sketch) because rule
    confidence downstream divides these counts.

    Plan: one join to form baskets, one distinct, one bounded
    within-basket self-join, one pair groupBy with map-side partials;
    the basket-universe size rides in as a broadcast scalar."""
    items = _baskets(spark, sf_dir)
    n = items.agg(F.countDistinct("bid").alias("n_baskets"))
    return (
        pair_counts(items)
        .filter(F.col("pair_count") >= MIN_SUP)
        .crossJoin(F.broadcast(n))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.round(F.col("pair_count") / F.col("n_baskets"), 6).alias(
                "support"
            ),
        )
    )


@query(
    "q_assoc_rules",
    oracle=f"""
WITH items AS ({_ITEMS_SQL}),
n AS (SELECT COUNT(DISTINCT bid) AS n_baskets FROM items),
item_n AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_b FROM items GROUP BY 1),
pairs AS (
    SELECT a.item AS item_a, b.item AS item_b,
        CAST(COUNT(*) AS BIGINT) AS pair_count
    FROM items a JOIN items b ON a.bid = b.bid AND a.item < b.item
    GROUP BY 1, 2
    HAVING COUNT(*) >= {MIN_SUP}
),
rules AS (
    SELECT item_a AS antecedent, item_b AS consequent, pair_count FROM pairs
    UNION ALL
    SELECT item_b, item_a, pair_count FROM pairs
)
SELECT r.antecedent, r.consequent, r.pair_count,
    ROUND(r.pair_count * 1.0 / na.n_b, 6) AS confidence,
    ROUND(r.pair_count * 1.0 * n.n_baskets / (na.n_b * nc.n_b), 6) AS lift
FROM rules r
JOIN item_n na ON na.item = r.antecedent
JOIN item_n nc ON nc.item = r.consequent
CROSS JOIN n
WHERE r.pair_count * 1.0 / na.n_b >= {MIN_CONF}""",
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from the frequent pairs: both directions of
    every supported pair, confidence = P(consequent | antecedent) =
    pair/|antecedent baskets|, lift = confidence / P(consequent) —
    kept when confidence >= {MIN_CONF}. Lift > 1 marks genuinely
    associated parts vs popularity coincidence.

    Plan: the pruned pair table (post-support) joins the per-item
    basket-count dimension twice — a |catalog|-row broadcast — so rule
    scoring never revisits the corpus."""
    items = _baskets(spark, sf_dir)
    n = items.agg(F.countDistinct("bid").alias("n_baskets"))
    item_n = items.groupBy("item").agg(F.count("*").cast("bigint").alias("n_b"))
    pairs = pair_counts(items).filter(F.col("pair_count") >= MIN_SUP)
    rules = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_count",
    ).unionAll(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_count",
        )
    )
    na = item_n.select(F.col("item").alias("antecedent"), F.col("n_b").alias("na"))
    nc = item_n.select(F.col("item").alias("consequent"), F.col("n_b").alias("nc"))
    return (
        rules.join(F.broadcast(na), "antecedent")
        .join(F.broadcast(nc), "consequent")
        .crossJoin(F.broadcast(n))
        .filter(F.col("pair_count") / F.col("na") >= MIN_CONF)
        .select(
            "antecedent",
            "consequent",
            "pair_count",
            F.round(F.col("pair_count") / F.col("na"), 6).alias("confidence"),
            F.round(
                F.col("pair_count") * F.col("n_baskets")
                / (F.col("na") * F.col("nc")),
                6,
            ).alias("lift"),
        )
    )


_CAPPED_SQL = f"""
    SELECT bid, item FROM (
        SELECT bid, item, ROW_NUMBER() OVER (
            PARTITION BY bid
            ORDER BY md5(CAST(bid AS VARCHAR) || '#' || CAST(item AS VARCHAR))
        ) AS rn
        FROM ({_ITEMS_SQL})
    ) WHERE rn <= {CF_CAP}
"""


@query(
    "q_item_cf",
    oracle=f"""
WITH capped AS ({_CAPPED_SQL}),
item_n AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_b FROM capped GROUP BY 1),
co AS (
    SELECT a.item AS item_a, b.item AS item_b,
        CAST(COUNT(*) AS BIGINT) AS co_count
    FROM capped a JOIN capped b ON a.bid = b.bid AND a.item < b.item
    GROUP BY 1, 2
    HAVING COUNT(*) >= {CF_MIN_CO}
),
directed AS (
    SELECT item_a AS item, item_b AS neighbor, co_count FROM co
    UNION ALL
    SELECT item_b, item_a, co_count FROM co
),
scored AS (
    SELECT d.item, d.neighbor, d.co_count,
        d.co_count / SQRT(ni.n_b * nn.n_b) AS cosine
    FROM directed d
    JOIN item_n ni ON ni.item = d.item
    JOIN item_n nn ON nn.item = d.neighbor
)
SELECT item, nbr_rank, neighbor, co_count, ROUND(cosine, 6) AS cosine
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY item ORDER BY cosine DESC, neighbor
    ) AS nbr_rank
    FROM scored
) WHERE nbr_rank <= {CF_TOPK}""",
)
def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: top-{CF_TOPK} cosine neighbors
    per part over the binary customer-part matrix — cos(a, b) =
    co(a, b) / sqrt(|a| |b|) with counts taken AFTER the deterministic
    {CF_CAP}-item basket cap (md5 order, bit-identical in both
    engines), so a single hoarder basket cannot quadratically dominate
    pair generation NOR distort similarity (the DIMSUM-style frequent-
    user downweighting, made exact and reproducible).

    Ordering is fully deterministic: cosine is a single IEEE division
    of integers (identical doubles in both engines), ties break on
    neighbor id."""
    items = _baskets(spark, sf_dir)
    capped = (
        items.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("bid").orderBy(
                    F.md5(
                        F.concat_ws(
                            "#", F.col("bid").cast("string"),
                            F.col("item").cast("string"),
                        )
                    )
                )
            ),
        )
        .filter(F.col("rn") <= CF_CAP)
        .drop("rn")
    )
    item_n = capped.groupBy("item").agg(
        F.count("*").cast("bigint").alias("n_b")
    )
    co = pair_counts(capped).withColumnRenamed("pair_count", "co_count").filter(
        F.col("co_count") >= CF_MIN_CO
    )
    directed = co.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("neighbor"),
        "co_count",
    ).unionAll(
        co.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("neighbor"),
            "co_count",
        )
    )
    ni = item_n.select(F.col("item"), F.col("n_b").alias("ni"))
    nn = item_n.select(F.col("item").alias("neighbor"), F.col("n_b").alias("nn"))
    scored = (
        directed.join(F.broadcast(ni), "item")
        .join(F.broadcast(nn), "neighbor")
        .select(
            "item",
            "neighbor",
            "co_count",
            (F.col("co_count") / F.sqrt(F.col("ni") * F.col("nn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        scored.withColumn("nbr_rank", F.row_number().over(w))
        .filter(F.col("nbr_rank") <= CF_TOPK)
        .select(
            "item", "nbr_rank", "neighbor", "co_count",
            F.round("cosine", 6).alias("cosine"),
        )
    )


TRIPLE_SUP = 3  # minimum triple (co-occurrence) count


@query(
    "q_itemset_triples",
    oracle=f"""
WITH items AS ({_ITEMS_SQL}),
n AS (SELECT COUNT(DISTINCT bid) AS n_baskets FROM items),
triples AS (
    SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c,
        CAST(COUNT(*) AS BIGINT) AS triple_count
    FROM items a
    JOIN items b ON a.bid = b.bid AND a.item < b.item
    JOIN items c ON a.bid = c.bid AND b.item < c.item
    GROUP BY 1, 2, 3
    HAVING COUNT(*) >= {TRIPLE_SUP}
)
SELECT item_a, item_b, item_c, triple_count,
    ROUND(triple_count * 1.0 / n_baskets, 6) AS support
FROM triples CROSS JOIN n""",
)
def q_itemset_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets via the A-Priori candidate-generation join:
    instead of enumerating every within-basket triple (|basket|^3 / 6
    per basket — the oracle's brute-force definition), first count
    pairs, keep only pairs with support >= {TRIPLE_SUP} (monotonicity:
    a frequent triple's sub-pairs are at least as frequent, so this
    prune is LOSSLESS), locate the baskets containing each surviving
    pair, and extend by one item ordered above the pair. The oracle is
    the unpruned brute-force triple count, so the driver gate doubles
    as a completeness proof for the prune — the q_setsim_prefix_join
    pattern applied to A-Priori.

    Scale: the uniform fixture is the WORST case for A-Priori (nearly
    every pair survives pass 2, so pruning only wins ~3x here); on a
    real skewed catalog pass-2 pruning removes almost all pairs and the
    candidate stream collapses by orders of magnitude. Either way the
    candidate join moves only (basket, item) ids, never item bodies,
    and the extension join shuffles on bid — one co-partitioned key."""
    items = _baskets(spark, sf_dir).localCheckpoint(eager=False)
    n = items.agg(F.countDistinct("bid").alias("n_baskets"))
    fp = (
        pair_counts(items)
        .filter(F.col("pair_count") >= TRIPLE_SUP)
        .select("item_a", "item_b")
    )
    a = items.select("bid", F.col("item").alias("item_a"))
    b = items.select("bid", F.col("item").alias("item_b"))
    pair_sites = fp.join(a, "item_a").join(b, ["bid", "item_b"])
    c = items.select("bid", F.col("item").alias("item_c"))
    cand = pair_sites.join(c, "bid").filter(
        F.col("item_c") > F.col("item_b")
    )
    return (
        cand.groupBy("item_a", "item_b", "item_c")
        .agg(F.count("*").cast("bigint").alias("triple_count"))
        .filter(F.col("triple_count") >= TRIPLE_SUP)
        .crossJoin(F.broadcast(n))
        .select(
            "item_a",
            "item_b",
            "item_c",
            "triple_count",
            F.round(F.col("triple_count") / F.col("n_baskets"), 6).alias(
                "support"
            ),
        )
    )


ABC_A, ABC_B = 0.8, 0.95  # cumulative revenue share cut-offs


@query(
    "q_abc_analysis",
    oracle=f"""
WITH item_rev AS (
    SELECT l_partkey AS item, SUM(l_extendedprice) AS revenue
    FROM lineitem GROUP BY 1
),
ranked AS (
    SELECT item, revenue,
        SUM(revenue) OVER (ORDER BY revenue DESC, item) AS cum_rev,
        SUM(revenue) OVER () AS tot
    FROM item_rev
),
classed AS (
    SELECT item, revenue,
        CASE WHEN cum_rev / tot <= {ABC_A} THEN 'A'
             WHEN cum_rev / tot <= {ABC_B} THEN 'B'
             ELSE 'C' END AS abc_class
    FROM ranked
)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_items,
    ROUND(SUM(revenue), 4) AS class_revenue,
    ROUND(SUM(revenue) / SUM(SUM(revenue)) OVER (), 6) AS revenue_share
FROM classed GROUP BY 1""",
)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: items ranked by revenue,
    class A = the head covering {ABC_A:.0%} of cumulative revenue, B up
    to {ABC_B:.0%}, C the tail — THE assortment-management rollup, and
    the categorical twin of q_lorenz_curve's decile view. Ties in the
    cumulative ordering break on item id so the class boundary is
    deterministic in both engines.

    Scale: one corpus pass to the |catalog|-row revenue rollup; the
    ranking window runs at catalog scale (documented single-exchange
    window over item rows, NOT corpus rows), and the readout is three
    rows."""
    li = load_table(spark, sf_dir, "lineitem")
    item_rev = li.groupBy(F.col("l_partkey").alias("item")).agg(
        F.sum("l_extendedprice").alias("revenue")
    )
    wcum = Window.orderBy(F.desc("revenue"), F.asc("item"))
    wall = Window.partitionBy()
    ranked = item_rev.select(
        "item",
        "revenue",
        F.sum("revenue").over(wcum).alias("cum_rev"),
        F.sum("revenue").over(wall).alias("tot"),
    )
    share = F.col("cum_rev") / F.col("tot")
    classed = ranked.select(
        "revenue",
        F.when(share <= ABC_A, "A")
        .when(share <= ABC_B, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.round(F.sum("revenue"), 4).alias("class_revenue"),
        F.round(
            F.sum("revenue") / F.sum(F.sum("revenue")).over(wall), 6
        ).alias("revenue_share"),
    )
