"""As-of join — the canonical missing-operator composition (guide: Spark
has no native as-of join; DuckDB does, which makes a perfect differential
oracle: our composition vs the built-in).

Semantics: for each left row (key, t), attach the greatest right-side t'
<= t for the same key (trailing match). Composition (scale-correct — no
range-join explosion):

    tag both sides, UNION, window over (key) ORDER BY (t, side) with
    last_value(right_value IGNORE NULLS) over the unbounded-preceding
    frame, keep left rows.

One exchange on the key, one sort — same cost as a sort-merge join; never
materializes the O(left x right) candidate pairs a naive range join would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_t: str,
    right_t: str,
    value_cols: list[str],
) -> DataFrame:
    """Trailing as-of join: left rows get the latest right values with
    right_t <= left_t per key. Left columns are preserved.

    Value columns are struct-packed into ONE payload column before the
    window: every right row contributes a non-null struct (a struct of
    NULL fields is itself non-null), so last(ignorenulls=True) always
    picks the LATEST matching right row — a genuine NULL value in that
    row surfaces as NULL instead of silently falling back to an older
    row, matching DuckDB ASOF JOIN semantics for nullable columns."""
    lcols = left.columns
    payload_type = right.select(
        F.struct(*[F.col(c) for c in value_cols]).alias("_p")
    ).schema["_p"].dataType
    l = (
        left.withColumn("_t", F.col(left_t))
        .withColumn("_side", F.lit(1))
        .withColumn("_payload", F.lit(None).cast(payload_type))
    )
    r = (
        right.withColumn("_t", F.col(right_t))
        .withColumn("_side", F.lit(0))
        .withColumn("_payload", F.struct(*[F.col(c) for c in value_cols]))
    )
    for c in lcols:
        if c != key and c not in right.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [key, "_t", "_side", *[c for c in lcols if c != key], "_payload"]
    unioned = l.select(*cols).unionByName(r.select(*cols))
    # right rows sort BEFORE left rows at equal t (side 0 < 1) => ties are
    # inclusive (right_t == left_t matches), like ASOF JOIN's >=
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last("_payload", ignorenulls=True).over(w).alias("_asof")
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *[c for c in lcols],
            *[F.col(f"_asof.{c}").alias(c) for c in value_cols],
        )
    )


@query(
    "q_asof_join",
    oracle="""
WITH l AS (
    SELECT event_id,
        CAST(user_id % 50 + 1 AS BIGINT) AS custkey,
        788918400 + (event_id * 9973) % 220000000 AS t
    FROM events
),
r AS (
    SELECT o_custkey AS custkey,
        CAST(epoch(o_orderdate) AS BIGINT) AS t,
        MAX(o_totalprice) AS best_price
    FROM orders GROUP BY 1, 2
)
SELECT l.event_id, l.custkey, l.t, r.best_price AS last_price
FROM l ASOF LEFT JOIN r ON l.custkey = r.custkey AND l.t >= r.t""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join differential: events mapped onto the orders time axis,
    each event picks the customer's most recent order price at or before
    its timestamp. The oracle uses DuckDB's NATIVE ASOF JOIN — so the
    union+window composition is checked against a first-class
    implementation, not against itself. Right side is pre-aggregated to
    one row per (key, t) so the pick is deterministic under date ties."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.select(
        "event_id",
        (F.col("user_id") % 50 + 1).cast("bigint").alias("custkey"),
        (F.lit(788918400) + (F.col("event_id") * 9973) % 220000000).alias("t"),
    )
    orders = load_table(spark, sf_dir, "orders")
    right = (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.unix_timestamp("o_orderdate").alias("t"),
            "o_totalprice",
        )
        .groupBy("custkey", "t")
        .agg(F.max("o_totalprice").alias("last_price"))
    )
    return asof_join(
        left, right, key="custkey", left_t="t", right_t="t", value_cols=["last_price"]
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_t: str,
    right_t: str,
    value_cols: list[str],
    bucket_width: int,
) -> DataFrame:
    """Skew-robust as-of join: identical semantics to asof_join, but the
    per-key window is split into time buckets of ``bucket_width`` so a hot
    key's rows spread over (key, bucket) partitions instead of serializing
    on one reducer — the worst case asof_join cannot parallelize.

    Three passes, all linear:
      1. per (key, bucket) LAST right payload (one aggregation);
      2. bucket-level carry-in: for every left bucket, the latest
         right payload from any STRICTLY EARLIER bucket — an as-of join
         at bucket granularity (rows per key = touched buckets, tiny);
      3. in-bucket union+window partitioned by (key, bucket): left rows
         resolve against same-bucket right rows plus the carry-in row.
    The left columns and tie semantics (right_t == left_t matches) are
    exactly asof_join's; differential equality is pinned in tests."""
    lcols = left.columns
    payload_type = right.select(
        F.struct(*[F.col(c) for c in value_cols]).alias("_p")
    ).schema["_p"].dataType
    bucket = lambda c: F.floor(F.col(c) / F.lit(bucket_width))  # noqa: E731

    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_t).alias("_t"),
        bucket(right_t).alias("_b"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_payload"),
    )
    # 1. last payload per (key, bucket) — max_by keeps the latest row's
    # struct; deterministic because (key, t) collisions were the caller's
    # to resolve, same as asof_join
    per_bucket = r.groupBy("_k", "_b").agg(
        F.max_by("_payload", "_t").alias("_payload"),
        F.max("_t").alias("_t_last"),
    )

    # 2. carry-in per left bucket: probes sort BEFORE data rows of the
    # same bucket (probe _side=0 < data _side=1), so last() sees only
    # strictly-earlier buckets' payloads
    probes = left.select(
        F.col(key).alias("_k"), bucket(left_t).alias("_b")
    ).distinct()
    cw = (
        Window.partitionBy("_k")
        .orderBy("_b", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        probes.select("_k", "_b", F.lit(0).alias("_side"), F.lit(None).cast(payload_type).alias("_payload"))
        .unionByName(per_bucket.select("_k", "_b", F.lit(1).alias("_side"), "_payload"))
        .select("*", F.last("_payload", ignorenulls=True).over(cw).alias("_carry"))
        .filter(F.col("_side") == 0)
        .select("_k", "_b", "_carry")
    )

    # 3. in-bucket resolution: carry rows order before everything in the
    # bucket (_pre=0), right rows before left at equal t (side 0 < 1)
    l3 = left.select(
        F.col(key).alias("_k"),
        bucket(left_t).alias("_b"),
        F.lit(1).alias("_pre"),
        F.col(left_t).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_payload"),
        *[F.col(c) for c in lcols if c != key],
    )
    pad = [
        F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in lcols
        if c != key
    ]
    r3 = r.select(
        "_k", "_b", F.lit(1).alias("_pre"), "_t", F.lit(0).alias("_side"), "_payload", *pad
    )
    c3 = carry.select(
        "_k",
        "_b",
        F.lit(0).alias("_pre"),
        F.lit(0).cast(r.schema["_t"].dataType).alias("_t"),
        F.lit(0).alias("_side"),
        F.col("_carry").alias("_payload"),
        *pad,
    )
    w = (
        Window.partitionBy("_k", "_b")
        .orderBy("_pre", "_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l3.unionByName(r3)
        .unionByName(c3)
        .select("*", F.last("_payload", ignorenulls=True).over(w).alias("_asof"))
    )
    return filled.filter(F.col("_side") == 1).select(
        F.col("_k").alias(key),
        *[c for c in lcols if c != key],
        *[F.col(f"_asof.{c}").alias(c) for c in value_cols],
    )


ASOF_BUCKET_WIDTH = 1 << 23  # ~97 days on an epoch-seconds axis


@query(
    "q_asof_join_bucketed",
    oracle="""
WITH l AS (
    SELECT event_id,
        CAST(user_id % 50 + 1 AS BIGINT) AS custkey,
        788918400 + (event_id * 9973) % 220000000 AS t
    FROM events
),
r AS (
    SELECT o_custkey AS custkey,
        CAST(epoch(o_orderdate) AS BIGINT) AS t,
        MAX(o_totalprice) AS best_price
    FROM orders GROUP BY 1, 2
)
SELECT l.event_id, l.custkey, l.t, r.best_price AS last_price
FROM l ASOF LEFT JOIN r ON l.custkey = r.custkey AND l.t >= r.t""",
)
def q_asof_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-robust as-of variant on the same inputs and the same
    native DuckDB ASOF oracle as q_asof_join — two independent
    implementations (per-key window vs time-bucketed with carry-in)
    checked against a third engine's built-in."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.select(
        "event_id",
        (F.col("user_id") % 50 + 1).cast("bigint").alias("custkey"),
        (F.lit(788918400) + (F.col("event_id") * 9973) % 220000000).alias("t"),
    )
    orders = load_table(spark, sf_dir, "orders")
    right = (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.unix_timestamp("o_orderdate").alias("t"),
            "o_totalprice",
        )
        .groupBy("custkey", "t")
        .agg(F.max("o_totalprice").alias("last_price"))
    )
    return asof_join_bucketed(
        left,
        right,
        key="custkey",
        left_t="t",
        right_t="t",
        value_cols=["last_price"],
        bucket_width=ASOF_BUCKET_WIDTH,
    )


@query(
    "q_join_nearest",
    oracle="""
WITH tagged AS (
    SELECT user_id, ts, event_id, event_type, value,
        LAST_VALUE(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
            IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_us,
        FIRST_VALUE(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
            IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_us
    FROM events
)
SELECT event_id, user_id,
    CAST(CASE
        WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
        WHEN next_us IS NULL THEN epoch_us(ts) - prev_us
        WHEN prev_us IS NULL THEN next_us - epoch_us(ts)
        WHEN epoch_us(ts) - prev_us <= next_us - epoch_us(ts)
            THEN epoch_us(ts) - prev_us
        ELSE next_us - epoch_us(ts)
    END AS BIGINT) AS nearest_gap_us,
    CASE
        WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
        WHEN next_us IS NULL THEN 'before'
        WHEN prev_us IS NULL THEN 'after'
        WHEN epoch_us(ts) - prev_us <= next_us - epoch_us(ts) THEN 'before'
        ELSE 'after'
    END AS nearest_side
FROM tagged WHERE event_type = 'purchase'
ORDER BY event_id""",
)
def q_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-event temporal join (both directions): each purchase finds
    its closest click of the same user — backward OR forward, ties to
    backward — widening the as-of family (q_asof_join is
    backward-only, the SQL-standard semantics; sensor/event alignment
    often wants nearest). Implementation is the interleaved-window
    trick: one user_id exchange carries BOTH the
    LAST_VALUE(IGNORE NULLS) lookback and the FIRST_VALUE lookahead
    over the mixed event stream — never a purchases x clicks join, so
    no fan-out exists to bound. Integer microsecond gaps -> exact
    hash."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    click_us = F.when(
        F.col("event_type") == "click", F.unix_micros(F.col("ts"))
    )
    prev_us = F.last(click_us, ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_us = F.first(click_us, ignorenulls=True).over(
        base.rowsBetween(1, Window.unboundedFollowing)
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        prev_us.alias("prev_us"),
        next_us.alias("next_us"),
    )
    d_prev = F.col("us") - F.col("prev_us")
    d_next = F.col("next_us") - F.col("us")
    both_null = F.col("prev_us").isNull() & F.col("next_us").isNull()
    gap = (
        F.when(both_null, F.lit(None))
        .when(F.col("next_us").isNull(), d_prev)
        .when(F.col("prev_us").isNull(), d_next)
        .when(d_prev <= d_next, d_prev)
        .otherwise(d_next)
    )
    side = (
        F.when(both_null, F.lit(None).cast("string"))
        .when(F.col("next_us").isNull(), F.lit("before"))
        .when(F.col("prev_us").isNull(), F.lit("after"))
        .when(d_prev <= d_next, F.lit("before"))
        .otherwise(F.lit("after"))
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            gap.cast("bigint").alias("nearest_gap_us"),
            side.alias("nearest_side"),
        )
        .orderBy("event_id")
    )
