"""In-engine statistical testing — the experiment-readout / data-drift
family: Welch's t-test for A/B readouts, chi-squared independence for
categorical drift, per-group OLS trend lines. All pure aggregations
(sufficient statistics, never row-level collection): each test reduces
to a handful of SUM/AVG/VAR aggregates that partial-aggregate map-side,
so a 100 TB readout costs one scan + one tiny shuffle.

The reference computes its model-quality readouts (MSE / rank accuracy)
driver-side over pandas frames (transformer/ranking/modeling.py:70-99);
this module is that capability expressed as distributed aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table


@query(
    "q_ab_test",
    oracle="""
WITH assigned AS (
    SELECT CAST(user_id % 2 AS INTEGER) AS variant, value FROM events
), stats AS (
    SELECT
        COUNT(CASE WHEN variant = 0 THEN 1 END) AS n0,
        COUNT(CASE WHEN variant = 1 THEN 1 END) AS n1,
        AVG(CASE WHEN variant = 0 THEN value END) AS mean0,
        AVG(CASE WHEN variant = 1 THEN value END) AS mean1,
        VAR_SAMP(CASE WHEN variant = 0 THEN value END) AS v0,
        VAR_SAMP(CASE WHEN variant = 1 THEN value END) AS v1
    FROM assigned
)
SELECT n0, n1,
    ROUND(mean0, 6) AS mean0, ROUND(mean1, 6) AS mean1,
    ROUND((mean1 - mean0) / SQRT(NULLIF(v0 / n0 + v1 / n1, 0)), 6) AS t_stat,
    ROUND(POW(v0 / n0 + v1 / n1, 2)
          / NULLIF(POW(v0 / n0, 2) / (n0 - 1) + POW(v1 / n1, 2) / (n1 - 1), 0), 4)
        AS welch_df
FROM stats""",
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two deterministic user
    buckets (variant = user_id % 2 — in production, the experiment
    assignment hash). ONE pass: every sufficient statistic is a
    conditional aggregate with map-side partials; the readout row is the
    only thing that leaves the executors. df via Welch–Satterthwaite."""
    ev = load_table(spark, sf_dir, "events")
    variant = (F.col("user_id") % 2).cast("int")
    s = ev.select(variant.alias("variant"), "value").agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("n0"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n1"),
        F.avg(F.when(F.col("variant") == 0, F.col("value"))).alias("mean0"),
        F.avg(F.when(F.col("variant") == 1, F.col("value"))).alias("mean1"),
        F.var_samp(F.when(F.col("variant") == 0, F.col("value"))).alias("v0"),
        F.var_samp(F.when(F.col("variant") == 1, F.col("value"))).alias("v1"),
    )
    # ANSI mode: double division by zero THROWS — a degenerate readout
    # (both variants constant => se2 == 0) must yield NULL statistics,
    # not a failed job. when()/NULLIF keep both dialects in lockstep.
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    df_den = (
        F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
        + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
    )
    return s.select(
        "n0",
        "n1",
        F.round("mean0", 6).alias("mean0"),
        F.round("mean1", 6).alias("mean1"),
        F.when(
            se2 > 0,
            F.round((F.col("mean1") - F.col("mean0")) / F.sqrt(se2), 6),
        ).alias("t_stat"),
        F.when(se2 > 0, F.round(F.pow(se2, 2) / df_den, 4)).alias("welch_df"),
    )


@query(
    "q_chi_squared",
    oracle="""
WITH obs AS (
    SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2
), margins AS (
    SELECT o.lang, o.source, o.o,
        SUM(o.o) OVER (PARTITION BY o.lang) AS row_tot,
        SUM(o.o) OVER (PARTITION BY o.source) AS col_tot,
        SUM(o.o) OVER () AS n
    FROM obs o
)
SELECT ROUND(SUM(POW(o - row_tot * col_tot / n, 2) / (row_tot * col_tot / n)), 6)
        AS chi2,
    CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1) AS INTEGER)
        AS dof,
    MAX(CAST(n AS BIGINT)) AS n
FROM margins""",
)
def q_chi_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence test on the (lang, source) contingency
    table — the categorical-drift check a corpus pipeline runs between
    snapshots. The contingency table is one groupBy (cells ~
    |lang|x|source|, tiny); margins are windows over the CELLS, never
    the raw rows — at 100 TB the corpus is touched once."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    margins = obs.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("source")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return margins.agg(
        F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 6).alias("chi2"),
        (
            (F.count_distinct("lang") - 1) * (F.count_distinct("source") - 1)
        ).cast("int").alias("dof"),
        F.max(F.col("n").cast("long")).alias("n"),
    )


@query(
    "q_group_ols",
    oracle="""
WITH pts AS (
    SELECT event_type, epoch_us(ts) / (86400.0 * 1000000) AS x, value AS y
    FROM events
)
SELECT event_type,
    ROUND(regr_slope(y, x), 6) AS slope,
    ROUND(regr_intercept(y, x), 4) AS intercept,
    ROUND(corr(y, x), 6) AS r,
    COUNT(*) AS n
FROM pts GROUP BY event_type""",
)
def q_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend line (value over time, x in days) via the
    closed-form regression aggregates — trend detection without an ML
    pass. regr_slope/regr_intercept/corr are single-pass sufficient-
    statistic aggregates in both engines: map-side partials, one tiny
    shuffle on the group key."""
    ev = load_table(spark, sf_dir, "events")
    x = F.unix_micros(F.col("ts")) / (86400.0 * 1_000_000)
    pts = ev.select("event_type", x.alias("x"), F.col("value").alias("y"))
    return pts.groupBy("event_type").agg(
        F.round(F.regr_slope("y", "x"), 6).alias("slope"),
        F.round(F.regr_intercept("y", "x"), 4).alias("intercept"),
        F.round(F.corr("y", "x"), 6).alias("r"),
        F.count("*").alias("n"),
    )


MAD_K = 3.5  # threshold in robust sigmas (1.4826 * MAD)


@query(
    "q_mad_outliers",
    oracle=f"""
WITH med AS (
    SELECT event_type, median(value) AS m FROM events GROUP BY event_type
), dev AS (
    SELECT e.event_type, e.value, m, ABS(e.value - m) AS ad
    FROM events e JOIN med USING (event_type)
), mad AS (
    SELECT event_type, median(ad) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type,
    ROUND(MAX(d.m), 6) AS median_value,
    ROUND(MAX(mad.mad), 6) AS mad,
    COUNT(*) AS n,
    CAST(SUM(CASE WHEN ABS(d.value - d.m) > {MAD_K} * 1.4826 * mad.mad
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad USING (event_type)
GROUP BY d.event_type""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per group via the median absolute deviation
    (|x - median| > k * 1.4826 * MAD — the robust z-score that a single
    extreme value cannot poison, unlike q_anomaly_zscore's mean/stddev).
    Two percentile passes by construction (MAD is a median OF deviations
    from a median); both group on the same low-cardinality key and the
    tiny per-group medians broadcast back — the corpus is scanned twice,
    shuffled never (partial aggs only). At 100 TB swap the exact median
    for percentile_approx and the second pass fuses into the first."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("m"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("value") - F.col("m"))
    )
    mad = dev.groupBy("event_type").agg(F.median("ad").alias("mad"))
    flagged = dev.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type").agg(
        F.round(F.max("m"), 6).alias("median_value"),
        F.round(F.max("mad"), 6).alias("mad"),
        F.count("*").alias("n"),
        F.sum(
            F.when(
                F.col("ad") > MAD_K * 1.4826 * F.col("mad"), 1
            ).otherwise(0)
        ).alias("n_outliers"),
    )


LEADLAG_MAX = 3


@query(
    "q_leadlag_corr",
    oracle=f"""
WITH daily0 AS (
    SELECT date_trunc('day', ts) AS day,
        SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
        SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases
    FROM events GROUP BY 1
), spans AS (
    SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily0
), cal AS (
    SELECT u.d AS day
    FROM spans s, UNNEST(generate_series(s.d0, s.d1, INTERVAL '1 day')) AS u(d)
), daily AS (
    SELECT c.day, COALESCE(d.clicks, 0) AS clicks,
        COALESCE(d.purchases, 0) AS purchases
    FROM cal c LEFT JOIN daily0 d ON d.day = c.day
), lagged AS (
    SELECT purchases,
        {", ".join(f"LAG(clicks, {k}) OVER (ORDER BY day) AS c{k}" for k in range(LEADLAG_MAX + 1))}
    FROM daily
)
{" UNION ALL ".join(
    f"SELECT {k} AS lag_days, ROUND(corr(purchases, c{k}), 6) AS correlation, "
    f"COUNT(c{k}) AS n_days FROM lagged"
    for k in range(LEADLAG_MAX + 1)
)}""",
)
def q_leadlag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between two event series: does click
    volume predict purchase volume k days later? (The time-series
    screening pass behind attribution modeling and demand forecasting.)

    Scale shape: the raw stream reduces to ONE daily two-column series
    first (a groupBy with map-side partials — the only pass over the
    events); every lag/correlation then runs on the tiny series frame.
    The unpartitioned ORDER BY day window is deliberate and safe: it
    sorts |days| rows, not |events| (a 10-year hourly series is <100k
    rows), and Spark's single-partition WindowExec warning refers to a
    frame that has already been reduced by ~6 orders of magnitude.

    The daily series is calendar-gap-filled (q_gap_fill's sequence-explode
    idiom, zero-filled) BEFORE the lags, so LAG(clicks, k) is a true
    k-calendar-day shift even when some day has no events — without the
    fill, a row lag silently drifts from the advertised day semantics
    (ADVICE r5)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily0 = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "purchases"
        ),
    )
    spans = daily0.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = spans.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    daily = cal.join(daily0, "day", "left").select(
        "day",
        F.coalesce("clicks", F.lit(0)).alias("clicks"),
        F.coalesce("purchases", F.lit(0)).alias("purchases"),
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "purchases",
        *[F.lag("clicks", k).over(w).alias(f"c{k}") for k in range(LEADLAG_MAX + 1)],
    )
    per_lag = lagged.agg(
        *[F.round(F.corr("purchases", f"c{k}"), 6).alias(f"r{k}") for k in range(LEADLAG_MAX + 1)],
        *[F.count(f"c{k}").alias(f"n{k}") for k in range(LEADLAG_MAX + 1)],
    )
    rows = [
        F.struct(
            F.lit(k).alias("lag_days"),
            F.col(f"r{k}").alias("correlation"),
            F.col(f"n{k}").alias("n_days"),
        )
        for k in range(LEADLAG_MAX + 1)
    ]
    return per_lag.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
