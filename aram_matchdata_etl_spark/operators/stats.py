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

from pyspark.sql import DataFrame, SparkSession, Window
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
), dense AS (
    SELECT l.lang, s.source, COALESCE(o.o, 0) AS o
    FROM (SELECT DISTINCT lang FROM documents) l
    CROSS JOIN (SELECT DISTINCT source FROM documents) s
    LEFT JOIN obs o ON o.lang = l.lang AND o.source = s.source
), margins AS (
    SELECT d.lang, d.source, d.o,
        SUM(d.o) OVER (PARTITION BY d.lang) AS row_tot,
        SUM(d.o) OVER (PARTITION BY d.source) AS col_tot,
        SUM(d.o) OVER () AS n
    FROM dense d
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
    the raw rows — at 100 TB the corpus is touched once.

    The cell table must be DENSIFIED first (distinct-lang x
    distinct-source grid, zero-filled): a (lang, source) combination
    with NO rows still contributes (0 - e)^2 / e = e to the statistic.
    The observed-cells-only formulation undercounted chi2 by the summed
    expectation of every empty cell — found by the numpy
    third-implementation differential (the DuckDB oracle had the same
    omission, so the cross-engine gate alone could not see it)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    dense = (
        docs.select("lang")
        .distinct()
        .crossJoin(F.broadcast(docs.select("source").distinct()))
        .join(obs, ["lang", "source"], "left")
        .select("lang", "source", F.coalesce("o", F.lit(0)).alias("o"))
    )
    margins = dense.select(
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


@query(
    "q_spearman_corr",
    oracle="""
WITH ranked AS (
    SELECT event_type,
        RANK() OVER (PARTITION BY event_type ORDER BY value)
            + (COUNT(*) OVER (PARTITION BY event_type, value) - 1) / 2.0 AS rv,
        RANK() OVER (PARTITION BY event_type ORDER BY ts)
            + (COUNT(*) OVER (PARTITION BY event_type, ts) - 1) / 2.0 AS rt
    FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
    ROUND(corr(rv, rt), 6) AS spearman
FROM ranked GROUP BY event_type""",
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between value and event time per event
    type — the monotone-trend detector that, unlike Pearson (q_group_ols'
    r), is immune to outliers and nonlinearity. True tie handling:
    average ranks (min-rank + (ties-1)/2), which is deterministic with
    NO tie-break column, so both engines agree bit-for-bit; the result
    is then one Pearson corr over the rank pairs.

    Scale: two rank windows + corr ride ONE exchange on event_type
    (same partitioning for both windows and the final agg). A group's
    rows must window-sort within its partitions — at extreme per-group
    cardinality the binned-ECDF approximation replaces exact ranks; the
    exact form is right wherever per-group sort fits (the usual case)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    rv = (
        F.rank().over(Window.partitionBy("event_type").orderBy("value"))
        + (F.count("*").over(Window.partitionBy("event_type", "value")) - 1) / 2.0
    )
    rt = (
        F.rank().over(Window.partitionBy("event_type").orderBy("ts"))
        + (F.count("*").over(Window.partitionBy("event_type", "ts")) - 1) / 2.0
    )
    ranked = ev.select("event_type", rv.alias("rv"), rt.alias("rt"))
    return ranked.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.corr("rv", "rt"), 6).alias("spearman"),
    )


MWU_A, MWU_B = "click", "view"


@query(
    "q_mannwhitney_u",
    oracle=f"""
WITH rollup AS (
    SELECT value,
        COUNT(CASE WHEN event_type = '{MWU_A}' THEN 1 END) AS ca,
        COUNT(CASE WHEN event_type = '{MWU_B}' THEN 1 END) AS cb
    FROM events
    WHERE event_type IN ('{MWU_A}', '{MWU_B}')
    GROUP BY value
), ranks AS (
    SELECT value, ca, cb, ca + cb AS c,
        SUM(ca + cb) OVER (ORDER BY value) - (ca + cb) + (ca + cb + 1) / 2.0
            AS avg_rank
    FROM rollup
), s AS (
    SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
        SUM(ca * avg_rank) AS ra,
        SUM(POW(c, 3) - c) AS tie_term
    FROM ranks
)
SELECT na, nb,
    ROUND(ra - na * (na + 1) / 2.0, 2) AS u_stat,
    ROUND((ra - na * (na + 1) / 2.0 - na * nb / 2.0)
        / SQRT(na * nb / 12.0
            * ((na + nb + 1) - tie_term / ((na + nb) * (na + nb - 1.0)))), 6)
        AS z_stat
FROM s""",
)
def q_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing the value
    distributions of '{MWU_A}' vs '{MWU_B}' events — the nonparametric
    A/B readout used when means mislead (heavy tails), with the standard
    tie-corrected normal approximation.

    Scale-correct formulation: the corpus first reduces to a PER-VALUE
    rollup (one groupBy with conditional-count partials — the only pass
    over the events); average ranks then derive from a cumulative sum
    over the ordered DISTINCT-VALUE table, which is orders of magnitude
    smaller than the event stream (the naive per-row rank window would
    instead sort the full corpus in one partition). Sufficient
    statistics (rank sum, tie term) aggregate from that rollup; only the
    one-row readout reaches the driver."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(MWU_A, MWU_B)
    )
    rollup = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == MWU_A, 1)).alias("ca"),
        F.count(F.when(F.col("event_type") == MWU_B, 1)).alias("cb"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    c = F.col("ca") + F.col("cb")
    ranks = rollup.select(
        "ca",
        "cb",
        c.alias("c"),
        (F.sum(c).over(w) - c + (c + 1) / 2.0).alias("avg_rank"),
    )
    s = ranks.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.sum(F.col("ca") * F.col("avg_rank")).alias("ra"),
        F.sum(F.pow(F.col("c"), 3) - F.col("c")).alias("tie_term"),
    )
    na, nb = F.col("na"), F.col("nb")
    u = F.col("ra") - na * (na + 1) / 2.0
    sigma = F.sqrt(
        na * nb / 12.0
        * ((na + nb + 1) - F.col("tie_term") / ((na + nb) * (na + nb - 1.0)))
    )
    return s.select(
        "na",
        "nb",
        F.round(u, 2).alias("u_stat"),
        F.round((u - na * nb / 2.0) / sigma, 6).alias("z_stat"),
    )


# Length-class thresholds sit near the corpus tertiles, so both raters
# produce genuinely mixed 3-class labels (kappa is undefined on a
# single-class rater).
KAPPA_CHAR_CUTS = (220, 380)
KAPPA_WORD_CUTS = (40, 70)


@query(
    "q_cohens_kappa",
    oracle=f"""
WITH rated AS (
    SELECT CASE WHEN n_chars < {KAPPA_CHAR_CUTS[0]} THEN 0
                WHEN n_chars < {KAPPA_CHAR_CUTS[1]} THEN 1 ELSE 2 END AS ra,
        CASE WHEN len(string_split(text, ' ')) < {KAPPA_WORD_CUTS[0]} THEN 0
             WHEN len(string_split(text, ' ')) < {KAPPA_WORD_CUTS[1]} THEN 1
             ELSE 2 END AS rb
    FROM documents
), s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
        {" + ".join(
            f"(SUM(CASE WHEN ra = {k} THEN 1 ELSE 0 END) * 1.0 / COUNT(*))"
            f" * (SUM(CASE WHEN rb = {k} THEN 1 ELSE 0 END) * 1.0 / COUNT(*))"
            for k in range(3)
        )} AS pe
    FROM rated
)
SELECT n, n_agree,
    ROUND(n_agree * 1.0 / n, 6) AS po,
    ROUND(pe, 6) AS pe,
    ROUND((n_agree * 1.0 / n - pe) / (1 - pe), 6) AS kappa
FROM s""",
)
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two annotators,
    here two deterministic document-length classifiers (char-based vs
    token-based 3-class labels): the standard readout for LLM labeling
    pipelines (model-vs-model or model-vs-human label agreement beyond
    chance). kappa = (po - pe) / (1 - pe) with pe from the raters'
    marginal class rates.

    ONE pass: every marginal and the agreement count are conditional
    aggregates with map-side partials; with K classes the sufficient
    statistics are 2K+2 scalars regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    nw = F.size(F.split("text", " "))
    ra = (
        F.when(F.col("n_chars") < KAPPA_CHAR_CUTS[0], 0)
        .when(F.col("n_chars") < KAPPA_CHAR_CUTS[1], 1)
        .otherwise(2)
    )
    rb = (
        F.when(nw < KAPPA_WORD_CUTS[0], 0)
        .when(nw < KAPPA_WORD_CUTS[1], 1)
        .otherwise(2)
    )
    rated = docs.select(ra.alias("ra"), rb.alias("rb"))
    pe = None
    aggs = [
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
    ]
    for k in range(3):
        term = (
            F.sum(F.when(F.col("ra") == k, 1).otherwise(0)) * 1.0 / F.count("*")
        ) * (F.sum(F.when(F.col("rb") == k, 1).otherwise(0)) * 1.0 / F.count("*"))
        pe = term if pe is None else pe + term
    s = rated.agg(*aggs, pe.alias("pe"))
    po = F.col("n_agree") * 1.0 / F.col("n")
    return s.select(
        "n",
        "n_agree",
        F.round(po, 6).alias("po"),
        F.round(F.col("pe"), 6).alias("pe"),
        F.round((po - F.col("pe")) / (1 - F.col("pe")), 6).alias("kappa"),
    )


@query(
    "q_kaplan_meier",
    oracle="""
WITH tv_tbl AS (
    SELECT user_id, MIN(ts) AS tv FROM events
    WHERE event_type = 'view' GROUP BY user_id
), per_user AS (
    SELECT e.user_id, t.tv,
        MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= t.tv
                 THEN e.ts END) AS tp,
        MAX(e.ts) AS tl
    FROM events e JOIN tv_tbl t USING (user_id)
    GROUP BY e.user_id, t.tv
), spells AS (
    SELECT user_id,
        CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS observed,
        CAST(FLOOR((epoch_us(CASE WHEN tp IS NOT NULL THEN tp ELSE tl END)
                    - epoch_us(tv)) / 86400000000.0) AS BIGINT) AS duration
    FROM per_user
), rollup AS (
    SELECT duration,
        CAST(SUM(observed) AS BIGINT) AS n_events,
        CAST(SUM(1 - observed) AS BIGINT) AS n_censored
    FROM spells GROUP BY duration
), km AS (
    SELECT duration, n_events, n_censored,
        SUM(n_events + n_censored) OVER () 
            - COALESCE(SUM(n_events + n_censored) OVER (
                ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), 0) AS n_risk
    FROM rollup
)
SELECT duration, CAST(n_risk AS BIGINT) AS n_risk, n_events, n_censored,
    CASE WHEN MIN(n_risk - n_events) OVER (
            ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0
        THEN 0.0
        ELSE ROUND(EXP(SUM(LN(NULLIF(1 - n_events * 1.0 / n_risk, 0))) OVER (
            ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
    END AS survival
FROM km""",
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time from first 'view' to first
    'purchase' (right-censored at the user's last observed event) — the
    conversion-latency readout that, unlike q_conversion_latency's
    completed-spell averages, handles users who have NOT converted yet
    without biasing the estimate. S(t) = prod over death times <= t of
    (1 - d_i / n_i), computed as EXP of a cumulative LN-sum.

    Scale shape: the event stream reduces to one per-user spell row
    (an anchor rollup plus one user-keyed join back — both partial-agg
    passes on the same exchange key), then
    to a per-duration life table (a second tiny groupBy); the at-risk
    counts and the cumulative product run as windows over the DISTINCT
    DURATION table (days — hundreds of rows at any corpus size). The
    guarded LN (NULLIF + cumulative-min zero flag) pins the S(t) = 0
    boundary case identically in both dialects."""
    from pyspark.sql import Window

    km = _life_table(spark, sf_dir)
    w_cum = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    dead_end = F.min(F.col("n_risk") - F.col("n_events")).over(w_cum) == 0
    ln_term = F.log(F.nullif(1 - F.col("n_events") * 1.0 / F.col("n_risk"), F.lit(0)))
    survival = F.when(dead_end, F.lit(0.0)).otherwise(
        F.round(F.exp(F.sum(ln_term).over(w_cum)), 6)
    )
    return km.select(
        "duration",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        "n_events",
        "n_censored",
        survival.alias("survival"),
    )


def _user_spells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user survival spell (user_id, observed, duration) for the
    view->purchase definition — shared by the life-table estimators
    (q_kaplan_meier / q_nelson_aalen via _life_table) and the Cox
    model (q_cox_regression), which needs the USER grain because its
    risk-set sums weight each subject by exp(beta * x)."""
    ev = load_table(spark, sf_dir, "events")
    # anchor FIRST, then take the first purchase AT-OR-AFTER the anchor:
    # a one-pass global MIN(purchase ts) would censor users whose first
    # purchase precedes their first view even when a later valid
    # conversion exists (caught by the numpy differential in
    # tests/test_stats_differential.py)
    tv_tbl = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    per_user = ev.join(tv_tbl, "user_id").groupBy("user_id", "tv").agg(
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("tv")),
                F.col("ts"),
            )
        ).alias("tp"),
        F.max("ts").alias("tl"),
    )
    observed = F.when(F.col("tp").isNotNull(), 1).otherwise(0)
    end_ts = F.when(F.col("tp").isNotNull(), F.col("tp")).otherwise(F.col("tl"))
    return per_user.select(
        "user_id",
        observed.alias("observed"),
        F.floor(
            (F.unix_micros(end_ts) - F.unix_micros(F.col("tv"))) / 86400000000.0
        )
        .cast("bigint")
        .alias("duration"),
    )


def _life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared survival life table (duration, n_events, n_censored, n_risk)
    for the view->purchase spell definition — the common rollup under
    q_kaplan_meier (product-limit survival) and q_nelson_aalen
    (cumulative hazard)."""
    from pyspark.sql import Window

    spells = _user_spells(spark, sf_dir)
    rollup = spells.groupBy("duration").agg(
        F.sum("observed").cast("bigint").alias("n_events"),
        F.sum(1 - F.col("observed")).cast("bigint").alias("n_censored"),
    )
    removed = F.col("n_events") + F.col("n_censored")
    w_all = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, -1)
    return rollup.select(
        "duration",
        "n_events",
        "n_censored",
        (
            F.sum(removed).over(w_all)
            - F.coalesce(F.sum(removed).over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )


# Life-table CTE chain shared by the KM and Nelson-Aalen oracles.
_LIFE_TABLE_CTES = """
tv_tbl AS (
    SELECT user_id, MIN(ts) AS tv FROM events
    WHERE event_type = 'view' GROUP BY user_id
), per_user AS (
    SELECT e.user_id, t.tv,
        MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= t.tv
                 THEN e.ts END) AS tp,
        MAX(e.ts) AS tl
    FROM events e JOIN tv_tbl t USING (user_id)
    GROUP BY e.user_id, t.tv
), spells AS (
    SELECT user_id,
        CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS observed,
        CAST(FLOOR((epoch_us(CASE WHEN tp IS NOT NULL THEN tp ELSE tl END)
                    - epoch_us(tv)) / 86400000000.0) AS BIGINT) AS duration
    FROM per_user
), rollup AS (
    SELECT duration,
        CAST(SUM(observed) AS BIGINT) AS n_events,
        CAST(SUM(1 - observed) AS BIGINT) AS n_censored
    FROM spells GROUP BY duration
), life AS (
    SELECT duration, n_events, n_censored,
        SUM(n_events + n_censored) OVER ()
            - COALESCE(SUM(n_events + n_censored) OVER (
                ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), 0) AS n_risk
    FROM rollup
)"""


@query(
    "q_nelson_aalen",
    oracle="WITH "
    + _LIFE_TABLE_CTES.lstrip()
    + """
SELECT duration, CAST(n_risk AS BIGINT) AS n_risk, n_events,
    ROUND(SUM(n_events * 1.0 / n_risk) OVER (
        ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ), 6) AS cum_hazard,
    ROUND(SUM(n_events * 1.0 / (n_risk * n_risk)) OVER (
        ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ), 6) AS hazard_var
FROM life""",
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = sum over death times <= t of
    d_i/n_i, with its variance estimator sum d_i/n_i^2 — the additive
    complement of q_kaplan_meier's product-limit curve (and the better
    estimator in heavy ties / small-risk-set tails, since it never hits
    the S(t)=0 absorbing state). Shares q_kaplan_meier's exact life-table
    rollup (_life_table): the corpus reduces to per-duration (d, c, n)
    rows before the only unpartitioned windows, which run over the
    distinct-duration table — days, bounded at any corpus size."""
    from pyspark.sql import Window

    km = _life_table(spark, sf_dir)
    w_cum = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    d, n = F.col("n_events"), F.col("n_risk")
    return km.select(
        "duration",
        n.cast("bigint").alias("n_risk"),
        "n_events",
        F.round(F.sum(d * 1.0 / n).over(w_cum), 6).alias("cum_hazard"),
        F.round(F.sum(d * 1.0 / (n * n)).over(w_cum), 6).alias("hazard_var"),
    )


NDCG_K = 10


@query(
    "q_ndcg_eval",
    oracle=f"""
WITH graded AS (
    SELECT source, doc_id, n_chars,
        CASE WHEN len(string_split(text, ' ')) < {KAPPA_WORD_CUTS[0]} THEN 0
             WHEN len(string_split(text, ' ')) < {KAPPA_WORD_CUTS[1]} THEN 1
             ELSE 2 END AS rel
    FROM documents
), ranked AS (
    SELECT source, rel,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
            AS pos,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY rel DESC, doc_id)
            AS ideal_pos
    FROM graded
)
SELECT source,
    ROUND(SUM(CASE WHEN pos <= {NDCG_K}
        THEN (POW(2, rel) - 1) / LOG2(pos + 1.0) ELSE 0 END), 6) AS dcg,
    ROUND(SUM(CASE WHEN ideal_pos <= {NDCG_K}
        THEN (POW(2, rel) - 1) / LOG2(ideal_pos + 1.0) ELSE 0 END), 6) AS idcg,
    ROUND(SUM(CASE WHEN pos <= {NDCG_K}
            THEN (POW(2, rel) - 1) / LOG2(pos + 1.0) ELSE 0 END)
        / NULLIF(SUM(CASE WHEN ideal_pos <= {NDCG_K}
            THEN (POW(2, rel) - 1) / LOG2(ideal_pos + 1.0) ELSE 0 END), 0), 6)
        AS ndcg
FROM ranked GROUP BY source""",
)
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{NDCG_K} per query group — the graded ranking-quality readout
    every retrieval/reranking pipeline reports (here: sources as query
    groups, a deterministic char-length ranker scored against token-count
    relevance grades; in production the ranker column is the model score
    and rel the human label). DCG with the standard (2^rel - 1) gains
    and log2(pos+1) discounts; IDCG from the per-group ideal ordering;
    both from the SAME two row_number windows.

    Scale: both windows and the final agg share one exchange on the
    query-group key; the discount sum is a conditional aggregate, so a
    billion-query eval is one shuffle of (group, rel, score) triples —
    no per-query driver work."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    nw = F.size(F.split("text", " "))
    rel = (
        F.when(nw < KAPPA_WORD_CUTS[0], 0)
        .when(nw < KAPPA_WORD_CUTS[1], 1)
        .otherwise(2)
    )
    graded = docs.select("source", "doc_id", "n_chars", rel.alias("rel"))
    pos = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    )
    ideal_pos = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("rel"), "doc_id")
    )
    ranked = graded.select(
        "source", "rel", pos.alias("pos"), ideal_pos.alias("ideal_pos")
    )
    gain = F.pow(2.0, F.col("rel")) - 1
    dcg = F.sum(
        F.when(F.col("pos") <= NDCG_K, gain / F.log2(F.col("pos") + 1.0)).otherwise(
            0.0
        )
    )
    idcg = F.sum(
        F.when(
            F.col("ideal_pos") <= NDCG_K, gain / F.log2(F.col("ideal_pos") + 1.0)
        ).otherwise(0.0)
    )
    return ranked.groupBy("source").agg(
        F.round(dcg, 6).alias("dcg"),
        F.round(idcg, 6).alias("idcg"),
        F.round(dcg / F.nullif(idcg, F.lit(0.0)), 6).alias("ndcg"),
    )


@query(
    "q_quantile_normalize",
    oracle="""
WITH src AS (
    SELECT doc_id, source, n_chars,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
        COUNT(*) OVER (PARTITION BY source) AS ns,
        COUNT(*) OVER () AS n
    FROM documents
), mapped AS (
    SELECT doc_id, source, n_chars,
        CASE WHEN ns > 1 THEN (r - 1) * 1.0 / (ns - 1) ELSE 0.0 END AS p,
        CAST(FLOOR(CASE WHEN ns > 1 THEN (r - 1) * 1.0 / (ns - 1) ELSE 0.0 END
            * (n - 1) + 0.5) + 1 AS BIGINT) AS tgt
    FROM src
), ref AS (
    SELECT ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS grank,
        n_chars AS norm_score
    FROM documents
)
SELECT m.doc_id, m.source, m.n_chars, ROUND(m.p, 6) AS pct,
    CAST(ref.norm_score AS BIGINT) AS norm_score
FROM mapped m JOIN ref ON ref.grank = m.tgt""",
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of a quality score: each doc's
    within-source percentile is mapped onto the POOLED score
    distribution (the value at the same percentile globally, half-up
    integer rank interpolation) — the calibration that makes quality
    thresholds comparable across sources whose raw score scales differ
    (a classic web-curation bias: one crawler's '500 chars' is another's
    boilerplate). Fully oracled; ranks tie-break on doc_id so both
    engines agree exactly.

    Scale: the per-source windows share one source-keyed exchange; the
    global reference ranking here is exact (fixture-sized) — at 100 TB
    the reference distribution is a fixed-size quantile sketch
    (percentile_approx / t-digest) broadcast to the mapping join, which
    turns the global sort into a lookup table and keeps everything else
    identical."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    src = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(ws).alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    p = F.when(
        F.col("ns") > 1, (F.col("r") - 1) * 1.0 / (F.col("ns") - 1)
    ).otherwise(F.lit(0.0))
    mapped = src.select(
        "doc_id",
        "source",
        "n_chars",
        p.alias("p"),
        (F.floor(p * (F.col("n") - 1) + 0.5) + 1).cast("bigint").alias("tgt"),
    )
    ref = docs.select(
        F.row_number()
        .over(Window.orderBy("n_chars", "doc_id"))
        .alias("grank"),
        F.col("n_chars").cast("bigint").alias("norm_score"),
    )
    return mapped.join(ref, mapped.tgt == ref.grank).select(
        "doc_id", "source", "n_chars", F.round("p", 6).alias("pct"), "norm_score"
    )


# reference-sketch resolution for the approx quantile normalization: the
# pooled distribution is summarized by B+1 quantiles, so the mapping
# error is bounded by 1/B of quantile rank plus the sketch's own error
QNORM_SKETCH_B = 1000


@query("q_quantile_normalize_approx")
def q_quantile_normalize_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_quantile_normalize's 100 TB path (r9 verdict item: the exact
    twin's docstring specified this design; now it is code): the POOLED
    reference distribution is a bounded percentile sketch
    (percentile_approx, QNORM_SKETCH_B + 1 cut points) broadcast to the mapping
    join, replacing the exact twin's full-corpus single-partition
    ROW_NUMBER ranking — the one remaining global-sort seam in the stats
    family. Within-source percentiles are unchanged (source-partitioned
    windows); each doc's normalized score is the sketch value at its
    percentile bucket.

    Rows-only at the driver (percentile_approx's Greenwald-Khanna sketch
    is not reproducible in DuckDB); tests/test_stats_differential.py
    tolerance-checks it against the exact twin (pooled-rank drift
    <= quantization + sketch error) and tests/test_plan_audit.py pins
    the plan free of global windows via the plan-audit detector.

    Scale: per-source windows share one source-keyed exchange (same as
    the exact twin); the reference is ONE sketch row (B+1 doubles) from
    a partial-aggregated pass — broadcast, never shuffled; no Sort or
    Window over the pooled corpus anywhere in the plan."""
    from pyspark.sql import Window

    B = QNORM_SKETCH_B
    docs = load_table(spark, sf_dir, "documents")
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    src = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(ws).alias("r"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"),
    )
    p = F.when(
        F.col("ns") > 1, (F.col("r") - 1) * 1.0 / (F.col("ns") - 1)
    ).otherwise(F.lit(0.0))
    mapped = src.select("doc_id", "source", "n_chars", p.alias("p"))
    sketch = docs.agg(
        F.percentile_approx(
            "n_chars", [i / B for i in range(B + 1)], 10_000
        ).alias("qs")
    )
    idx = (F.floor(F.col("p") * B + 0.5) + 1).cast("int")
    return mapped.crossJoin(F.broadcast(sketch)).select(
        "doc_id",
        "source",
        "n_chars",
        F.round("p", 6).alias("pct"),
        F.element_at("qs", idx).cast("bigint").alias("norm_score"),
    )


@query(
    "q_corr_matrix",
    oracle="""
WITH daily0 AS (
    SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
), spans AS (
    SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily0
), grid AS (
    SELECT t.event_type, u.d AS day
    FROM (SELECT DISTINCT event_type FROM events) t
    CROSS JOIN spans s
    CROSS JOIN UNNEST(generate_series(s.d0, s.d1, INTERVAL '1 day')) AS u(d)
), daily AS (
    SELECT g.event_type, g.day, COALESCE(d.n, 0) AS n
    FROM grid g LEFT JOIN daily0 d
        ON d.event_type = g.event_type AND d.day = g.day
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
    CAST(COUNT(*) AS BIGINT) AS n_days,
    ROUND(corr(a.n, b.n), 6) AS correlation
FROM daily a JOIN daily b
    ON a.day = b.day AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type""",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation matrix of the per-type daily volume series —
    the screening heatmap behind metric-relationship dashboards (which
    event volumes move together day over day). Upper triangle only
    (type_a < type_b), matched days via a day-keyed self-join of the
    rollup.

    The daily grid is calendar-gap-filled with ZEROS per type (the
    q_leadlag_corr idiom): an inner join on observed days would silently
    drop (A active, B silent) days and bias the correlations upward.

    Scale: the corpus reduces to the |days| x |types| rollup first (one
    partial-agg pass); the grid, self-join and corr aggregates run on
    that tiny series table. A thousand metrics -> ~500k pairs of
    |days|-row series — still rollup-scale, never event-scale."""
    ev = load_table(spark, sf_dir, "events")
    daily0 = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    spans = daily0.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = spans.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    types = ev.select("event_type").distinct()
    daily = (
        types.crossJoin(F.broadcast(cal))
        .join(daily0, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("n", F.lit(0)).alias("n"))
    )
    a = daily.select(
        "day", F.col("event_type").alias("type_a"), F.col("n").alias("na")
    )
    b = daily.select(
        "day", F.col("event_type").alias("type_b"), F.col("n").alias("nb")
    )
    return (
        a.join(b, "day")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.round(F.corr("na", "nb"), 6).alias("correlation"),
        )
    )


@query(
    "q_mrr_eval",
    oracle=f"""
WITH graded AS (
    SELECT source, doc_id, n_chars,
        len(string_split(text, ' ')) >= {KAPPA_WORD_CUTS[1]} AS relevant
    FROM documents
), ranked AS (
    SELECT source, relevant,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
            AS pos
    FROM graded
), firsts AS (
    SELECT source, MIN(CASE WHEN relevant THEN pos END) AS first_hit
    FROM ranked GROUP BY source
)
SELECT source, CAST(first_hit AS BIGINT) AS first_hit,
    ROUND(COALESCE(1.0 / first_hit, 0.0), 6) AS reciprocal_rank,
    (SELECT ROUND(AVG(COALESCE(1.0 / first_hit, 0.0)), 6) FROM firsts) AS mrr
FROM firsts""",
)
def q_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank — the first-relevant-result retrieval metric
    (chatbot retrieval / QA evals report this beside NDCG): per query
    group the rank of the first relevant document under the ranker, its
    reciprocal, and the corpus-level MRR repeated per row (so the single
    output frame carries both granularities). Relevance and ranker reuse
    q_ndcg_eval's deterministic setup.

    Same scale shape as NDCG: one window per query group on a shared
    exchange, then a per-group MIN — a billion-query eval is one shuffle
    of (group, relevant, score) rows."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    relevant = F.size(F.split("text", " ")) >= KAPPA_WORD_CUTS[1]
    pos = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    )
    ranked = docs.select(
        "source", relevant.alias("relevant"), pos.alias("pos")
    )
    firsts = ranked.groupBy("source").agg(
        F.min(F.when(F.col("relevant"), F.col("pos"))).alias("first_hit")
    )
    rr = F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0))
    return firsts.select(
        "source",
        F.col("first_hit").cast("bigint").alias("first_hit"),
        F.round(rr, 6).alias("reciprocal_rank"),
        F.round(F.avg(rr).over(Window.partitionBy()), 6).alias("mrr"),
    )


@query(
    "q_confusion_matrix",
    oracle=f"""
WITH rated AS (
    SELECT CASE WHEN n_chars < {KAPPA_CHAR_CUTS[0]} THEN 0
                WHEN n_chars < {KAPPA_CHAR_CUTS[1]} THEN 1 ELSE 2 END AS actual,
        CASE WHEN len(string_split(text, ' ')) < {KAPPA_WORD_CUTS[0]} THEN 0
             WHEN len(string_split(text, ' ')) < {KAPPA_WORD_CUTS[1]} THEN 1
             ELSE 2 END AS predicted
    FROM documents
), cells AS (
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
    FROM rated GROUP BY actual, predicted
), m AS (
    SELECT c.*,
        SUM(n) OVER (PARTITION BY actual) AS row_tot,
        SUM(n) OVER (PARTITION BY predicted) AS col_tot
    FROM cells c
)
SELECT actual, predicted, n,
    ROUND(CASE WHEN actual = predicted THEN n * 1.0 / col_tot END, 6)
        AS precision,
    ROUND(CASE WHEN actual = predicted THEN n * 1.0 / row_tot END, 6)
        AS recall,
    ROUND(CASE WHEN actual = predicted
        THEN 2.0 * n / (row_tot + col_tot) END, 6) AS f1
FROM m""",
)
def q_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class confusion matrix with per-class precision/recall/F1 on
    the diagonal cells — the classifier-eval readout every labeling
    pipeline reports (here the token-count classifier 'predicting' the
    char-count classes, reusing q_cohens_kappa's deterministic raters;
    in production: model labels vs human labels). F1 via the
    2*tp/(row+col) identity so no intermediate ratios stack rounding.

    One pass to the K x K cell table (map-side partials); margins are
    windows over the CELLS — at any corpus size the post-scan state is
    K^2 rows."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    nw = F.size(F.split("text", " "))
    actual = (
        F.when(F.col("n_chars") < KAPPA_CHAR_CUTS[0], 0)
        .when(F.col("n_chars") < KAPPA_CHAR_CUTS[1], 1)
        .otherwise(2)
    )
    predicted = (
        F.when(nw < KAPPA_WORD_CUTS[0], 0)
        .when(nw < KAPPA_WORD_CUTS[1], 1)
        .otherwise(2)
    )
    cells = (
        docs.select(actual.alias("actual"), predicted.alias("predicted"))
        .groupBy("actual", "predicted")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    m = cells.select(
        "actual",
        "predicted",
        "n",
        F.sum("n").over(Window.partitionBy("actual")).alias("row_tot"),
        F.sum("n").over(Window.partitionBy("predicted")).alias("col_tot"),
    )
    diag = F.col("actual") == F.col("predicted")
    return m.select(
        "actual",
        "predicted",
        "n",
        F.round(F.when(diag, F.col("n") * 1.0 / F.col("col_tot")), 6).alias(
            "precision"
        ),
        F.round(F.when(diag, F.col("n") * 1.0 / F.col("row_tot")), 6).alias(
            "recall"
        ),
        F.round(
            F.when(diag, 2.0 * F.col("n") / (F.col("row_tot") + F.col("col_tot"))),
            6,
        ).alias("f1"),
    )


# ---------------------------------------------------------------------------
# Resampling inference: Poisson bootstrap CI + permutation test. Both
# derive their "randomness" from the md5 bucket hash (the engine-portable
# trick shared with the DSIR/link-graph family), so every resample weight
# and permuted label is bit-identical in DuckDB and the CIs/p-values are
# hash-oracle-able — resampling without giving up the exactness gate.
# ---------------------------------------------------------------------------

import math as _math

BOOTSTRAP_B = 200
# Poisson(1) CDF cutoffs scaled to the 52-bit md5-prefix space: weight k
# iff cutoff[k-1] <= h < cutoff[k] (h uniform on [0, 2^52)). Literal
# integers so Spark and DuckDB compare the exact same constants.
_POIS1_CUTS = [
    _math.floor(
        sum(_math.exp(-1) / _math.factorial(j) for j in range(k + 1)) * 2**52
    )
    for k in range(8)
]
# sanity: cutlist is what the docstrings claim (fails at import if the
# formula above drifts)
assert _POIS1_CUTS[0] == 1656781714176974 and _POIS1_CUTS[7] == 4503553469092171
# the ladder compares 13-char HEX SUBSTRINGS, never integers: fixed-width
# lowercase hex orders lexicographically exactly like its numeric value,
# and profiling showed conv(hex, 16, 10) costs MORE than the md5 itself
# (~10 s vs ~8 s on the 20M-cell sf0.1 grid) — string cutoffs keep the
# whole ladder in cheap binary-collation compares in BOTH engines
_POIS1_CUTS_HEX = [format(c, "013x") for c in _POIS1_CUTS]


def _pois1_cases_sql(hx: str) -> str:
    branches = " ".join(
        f"WHEN {hx} < '{c}' THEN {k}" for k, c in enumerate(_POIS1_CUTS_HEX)
    )
    return f"CASE {branches} ELSE 8 END"


_BOOT_LO_RN = BOOTSTRAP_B * 25 // 1000 + 1   # 6  (2.5th pct, 1-indexed)
_BOOT_HI_RN = BOOTSTRAP_B * 975 // 1000      # 195 (97.5th pct)


@query(
    "q_bootstrap_ci",
    oracle=f"""
WITH grid AS (
    SELECT e.event_type, e.value, s.b,
        substr(md5(CAST(e.event_id AS VARCHAR) || ':'
            || CAST(s.b // 2 AS VARCHAR)), 1 + 13 * (s.b % 2), 13) AS hx
    FROM events e CROSS JOIN range({BOOTSTRAP_B}) s(b)
),
reps AS (
    SELECT event_type, b,
        SUM({_pois1_cases_sql('hx')} * value)
            / NULLIF(SUM({_pois1_cases_sql('hx')}), 0) AS mean_b
    FROM grid GROUP BY 1, 2
),
ranked AS (
    SELECT event_type, mean_b,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY mean_b, b) AS rn
    FROM reps
),
pt AS (SELECT event_type, AVG(value) AS mean FROM events GROUP BY 1)
SELECT p.event_type, ROUND(p.mean, 6) AS mean,
    ROUND(MAX(CASE WHEN rn = {_BOOT_LO_RN} THEN mean_b END), 6) AS ci_lo,
    ROUND(MAX(CASE WHEN rn = {_BOOT_HI_RN} THEN mean_b END), 6) AS ci_hi,
    CAST({BOOTSTRAP_B} AS BIGINT) AS n_boot
FROM ranked r JOIN pt p USING (event_type)
GROUP BY 1, 2""",
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% POISSON-bootstrap CI for the mean value per event_type.

    The classic bootstrap resamples n rows WITH replacement per
    replicate — a per-group n-dependent join that cannot map-side
    combine. The Poisson bootstrap (each row independently weighted
    Poisson(1) per replicate) is its large-n limit and is the form that
    scales: every (row, replicate) weight derives locally from an md5
    of (event_id, replicate-pair), so the B replicate means are ONE
    groupBy with map-side partials — no resample join, no per-group n
    anywhere, and the post-scan state is groups x B rows.

    Grid-cost engineering (this is the hot loop — rows x B cells): ONE
    digest feeds TWO replicates (hex chars 1-13 and 14-26 are
    independent 52-bit uniforms, halving the md5 count), and the
    Poisson(1) inverse-CDF ladder compares the 13-char hex SUBSTRING
    against hex-string cutoffs directly — fixed-width lowercase hex
    orders exactly like its numeric value, and the profiled
    conv(hex,16,10) integer decode cost more than the digest itself.
    Both engines run the identical substring + compare, so the weights
    stay bit-identical and the interval endpoints hash-match.

    The CI is percentile-rank over the B=200 replicate means
    (rn 6 / 195 of the (mean, b)-ordered replicates)."""
    ev = load_table(spark, sf_dir, "events")
    half = ev.select(
        "event_type",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(BOOTSTRAP_B // 2 - 1))).alias(
            "b2"
        ),
        "event_id",
    ).withColumn("d", F.md5(F.concat_ws(":", F.col("event_id"), F.col("b2"))))
    grid = half.select(
        "event_type",
        "value",
        "b2",
        F.posexplode(
            F.array(F.substring("d", 1, 13), F.substring("d", 14, 13))
        ).alias("j", "hx"),
    ).select(
        "event_type",
        "value",
        (F.col("b2") * 2 + F.col("j")).alias("b"),
        "hx",
    )
    w = F.lit(8)
    for k, c in reversed(list(enumerate(_POIS1_CUTS_HEX))):
        w = F.when(F.col("hx") < c, k).otherwise(w)
    reps = (
        grid.withColumn("w", w)
        .groupBy("event_type", "b")
        .agg(
            (
                F.sum(F.col("w") * F.col("value"))
                / F.nullif(F.sum("w"), F.lit(0))
            ).alias("mean_b")
        )
    )
    from pyspark.sql import Window

    rw = Window.partitionBy("event_type").orderBy("mean_b", "b")
    ranked = reps.withColumn("rn", F.row_number().over(rw))
    pt = ev.groupBy("event_type").agg(F.avg("value").alias("mean"))
    return (
        ranked.join(pt, "event_type")
        .groupBy("event_type", "mean")
        .agg(
            F.round(
                F.max(F.when(F.col("rn") == _BOOT_LO_RN, F.col("mean_b"))), 6
            ).alias("ci_lo"),
            F.round(
                F.max(F.when(F.col("rn") == _BOOT_HI_RN, F.col("mean_b"))), 6
            ).alias("ci_hi"),
        )
        .select(
            "event_type",
            F.round("mean", 6).alias("mean"),
            "ci_lo",
            "ci_hi",
            F.lit(BOOTSTRAP_B).cast("bigint").alias("n_boot"),
        )
    )


PERM_P = 199


@query(
    "q_permutation_test",
    oracle=f"""
WITH obs AS (
    SELECT AVG(CASE WHEN user_id % 2 = 1 THEN value END)
         - AVG(CASE WHEN user_id % 2 = 0 THEN value END) AS diff_obs
    FROM events
),
perms AS (
    SELECT s.p,
        AVG(CASE WHEN substr(md5(CAST(e.event_id AS VARCHAR) || '#'
                || CAST(s.p // 2 AS VARCHAR)), 31 + (s.p % 2), 1)
            NOT IN ('0','2','4','6','8','a','c','e')
            THEN e.value END)
      - AVG(CASE WHEN substr(md5(CAST(e.event_id AS VARCHAR) || '#'
                || CAST(s.p // 2 AS VARCHAR)), 31 + (s.p % 2), 1)
            IN ('0','2','4','6','8','a','c','e')
            THEN e.value END) AS diff_p
    FROM events e CROSS JOIN range({PERM_P}) s(p)
    GROUP BY s.p
)
SELECT ROUND(o.diff_obs, 6) AS diff_obs,
    CAST(COUNT(CASE WHEN ABS(p.diff_p) >= ABS(o.diff_obs) THEN 1 END) + 1
        AS BIGINT) AS n_extreme_plus_one,
    ROUND((COUNT(CASE WHEN ABS(p.diff_p) >= ABS(o.diff_obs) THEN 1 END) + 1)
        * 1.0 / ({PERM_P} + 1), 6) AS p_value
FROM perms p CROSS JOIN obs o
GROUP BY o.diff_obs""",
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the A/B mean difference (variant =
    user_id % 2, the q_ab_test assignment): re-label every event under
    P=199 md5-derived pseudo-permutations, and report the one-row
    readout (observed diff, count of as-extreme permutations + 1,
    p-value with the standard +1 smoothing) — the nonparametric twin of
    q_ab_test's Welch t.

    Label-flip permutation (parity of one md5 hex digit per
    (event, p)) rather than a shuffle join: each permuted label is
    computed WHERE THE ROW LIVES, so the whole distribution is one
    grid scan + groupBy with map-side partials; the post-scan state is
    P rows. Grid-cost engineering mirrors q_bootstrap_ci: one digest
    per PAIR of permutations (hex chars 31 and 32 are independent
    bits), and the bit is a set-membership test on the raw hex char —
    no integer decode anywhere. Deterministic => the DuckDB oracle
    reproduces every permuted diff bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.agg(
        (
            F.avg(F.when(F.col("user_id") % 2 == 1, F.col("value")))
            - F.avg(F.when(F.col("user_id") % 2 == 0, F.col("value")))
        ).alias("diff_obs")
    )
    half = ev.select(
        "event_id",
        "value",
        F.explode(
            F.sequence(F.lit(0), F.lit((PERM_P + 1) // 2 - 1))
        ).alias("p2"),
    ).withColumn("d", F.md5(F.concat_ws("#", F.col("event_id"), F.col("p2"))))
    grid = (
        half.select(
            "value",
            "p2",
            F.posexplode(
                F.array(F.substring("d", 31, 1), F.substring("d", 32, 1))
            ).alias("j", "c"),
        )
        .select("value", (F.col("p2") * 2 + F.col("j")).alias("p"), "c")
        # P is odd: the pair scheme mints one spare slot past P-1
        .filter(F.col("p") < PERM_P)
    )
    even = F.col("c").isin("0", "2", "4", "6", "8", "a", "c", "e")
    perms = grid.groupBy("p").agg(
        (
            F.avg(F.when(~even, F.col("value")))
            - F.avg(F.when(even, F.col("value")))
        ).alias("diff_p")
    )
    extreme = F.count(
        F.when(F.abs(F.col("diff_p")) >= F.abs(F.col("diff_obs")), 1)
    ) + F.lit(1)
    return (
        perms.crossJoin(F.broadcast(obs))
        .groupBy("diff_obs")
        .agg(
            extreme.cast("bigint").alias("n_extreme_plus_one"),
            F.round(extreme * 1.0 / (PERM_P + 1), 6).alias("p_value"),
        )
        .select(
            F.round("diff_obs", 6).alias("diff_obs"),
            "n_extreme_plus_one",
            "p_value",
        )
    )


@query(
    "q_ks_test",
    oracle="""
WITH rollup AS (
    SELECT value,
        COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS c0,
        COUNT(CASE WHEN user_id % 2 = 1 THEN 1 END) AS c1
    FROM events GROUP BY value
), ecdf AS (
    SELECT
        SUM(c0) OVER (ORDER BY value) * 1.0 / SUM(c0) OVER () AS f0,
        SUM(c1) OVER (ORDER BY value) * 1.0 / SUM(c1) OVER () AS f1,
        SUM(c0) OVER () AS n0, SUM(c1) OVER () AS n1
    FROM rollup
), s AS (
    SELECT CAST(MAX(n0) AS BIGINT) AS n0, CAST(MAX(n1) AS BIGINT) AS n1,
        MAX(ABS(f0 - f1)) AS d
    FROM ecdf
)
SELECT n0, n1, ROUND(d, 6) AS d_stat,
    ROUND(LEAST(1.0, 2 * (
        EXP(-2 * POW(d * SQRT(n0 * n1 * 1.0 / (n0 + n1)), 2))
      - EXP(-8 * POW(d * SQRT(n0 * n1 * 1.0 / (n0 + n1)), 2))
      + EXP(-18 * POW(d * SQRT(n0 * n1 * 1.0 / (n0 + n1)), 2))
      - EXP(-32 * POW(d * SQRT(n0 * n1 * 1.0 / (n0 + n1)), 2)))), 6)
        AS p_value
FROM s""",
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the value
    distributions of the two deterministic A/B buckets (user_id % 2,
    the q_ab_test assignment) — the distribution-shape readout that
    catches shifts Welch's mean test can't (variance, tails,
    bimodality). p-value via the 4-term Kolmogorov asymptotic series
    2*sum((-1)^(k-1) exp(-2 k^2 lambda^2)), clamped to [0,1].

    Scale-correct formulation (the q_mannwhitney_u discipline): the
    corpus reduces to a per-DISTINCT-value conditional-count rollup
    first; both ECDFs are cumulative sums over that ordered rollup, and
    D = max|F0 - F1| aggregates from it. The unpartitioned window runs
    over distinct values only — at 100 TB, bucketize values first (the
    q_value_histogram grid) and the same query computes the binned KS
    statistic."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    rollup = ev.groupBy("value").agg(
        F.count(F.when(F.col("user_id") % 2 == 0, 1)).alias("c0"),
        F.count(F.when(F.col("user_id") % 2 == 1, 1)).alias("c1"),
    )
    cum = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    ecdf = rollup.select(
        (F.sum("c0").over(cum) * 1.0 / F.sum("c0").over(tot)).alias("f0"),
        (F.sum("c1").over(cum) * 1.0 / F.sum("c1").over(tot)).alias("f1"),
        F.sum("c0").over(tot).alias("n0"),
        F.sum("c1").over(tot).alias("n1"),
    )
    s = ecdf.agg(
        F.max("n0").cast("bigint").alias("n0"),
        F.max("n1").cast("bigint").alias("n1"),
        F.max(F.abs(F.col("f0") - F.col("f1"))).alias("d"),
    )
    n0, n1, d = F.col("n0"), F.col("n1"), F.col("d")
    lam2 = F.pow(d * F.sqrt(n0 * n1 * 1.0 / (n0 + n1)), 2)
    series = (
        F.exp(-2 * lam2) - F.exp(-8 * lam2) + F.exp(-18 * lam2) - F.exp(-32 * lam2)
    )
    return s.select(
        "n0",
        "n1",
        F.round(d, 6).alias("d_stat"),
        F.round(F.least(F.lit(1.0), 2 * series), 6).alias("p_value"),
    )


ACF_MAX_LAG = 7


@query(
    "q_autocorr",
    oracle=f"""
WITH daily0 AS (
    SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
), spans AS (
    SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily0
), cal AS (
    SELECT CAST(u.d AS DATE) AS day
    FROM spans s, UNNEST(generate_series(s.d0, s.d1, INTERVAL '1 day')) u(d)
), daily AS (
    SELECT c.day, COALESCE(d.n, 0) AS n
    FROM cal c LEFT JOIN daily0 d USING (day)
), lags AS (
    SELECT CAST(i AS INTEGER) AS lag FROM range(1, {ACF_MAX_LAG + 1}) t(i)
)
SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_days,
    ROUND(corr(a.n, b.n), 6) AS acf
FROM lags l
CROSS JOIN daily a
JOIN daily b ON b.day = a.day - l.lag
GROUP BY l.lag""",
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-volume series at lags
    1..{ACF_MAX_LAG} — the seasonality screen (a weekly cycle shows as a
    lag-7 spike) run before any forecasting model. Pearson corr between
    the zero-gap-filled daily series and its lag-shifted self, one row
    per lag.

    Scale: the corpus reduces to the |days|-row rollup in one
    partial-agg pass; the calendar gap-fill, the lag self-join (DATE -
    integer key) and the corr aggregates all run at rollup scale — a
    decade of data is ~3.7k rows here regardless of corpus bytes."""
    ev = load_table(spark, sf_dir, "events")
    daily0 = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    spans = daily0.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = spans.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    daily = (
        cal.join(daily0, "day", "left")
        .select("day", F.coalesce("n", F.lit(0)).alias("n"))
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select(F.col("day").alias("day_a"), F.col("n").alias("na"))
    b = daily.select(F.col("day").alias("day_b"), F.col("n").alias("nb"))
    return (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("day_b") == F.date_sub(F.col("day_a"), F.col("lag")))
        .groupBy("lag")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.round(F.corr("na", "nb"), 6).alias("acf"),
        )
    )


@query(
    "q_cramers_v",
    oracle="""
WITH obs AS (
    SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY 1, 2
), dense AS (
    SELECT l.lang, s.source, COALESCE(o.o, 0) AS o
    FROM (SELECT DISTINCT lang FROM documents) l
    CROSS JOIN (SELECT DISTINCT source FROM documents) s
    LEFT JOIN obs o ON o.lang = l.lang AND o.source = s.source
), margins AS (
    SELECT d.lang, d.source, d.o,
        SUM(d.o) OVER (PARTITION BY d.lang) AS row_tot,
        SUM(d.o) OVER (PARTITION BY d.source) AS col_tot,
        SUM(d.o) OVER () AS n
    FROM dense d
), s AS (
    SELECT SUM(POW(o - row_tot * col_tot / n, 2) / (row_tot * col_tot / n))
            AS chi2,
        COUNT(DISTINCT lang) AS r, COUNT(DISTINCT source) AS c,
        MAX(CAST(n AS BIGINT)) AS n
    FROM margins
)
SELECT ROUND(chi2, 6) AS chi2, n,
    CAST(LEAST(r - 1, c - 1) AS INTEGER) AS min_dim,
    ROUND(SQRT(chi2 / (n * LEAST(r - 1, c - 1))), 6) AS cramers_v
FROM s""",
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0,1]-normalized effect size for the
    (lang, source) association: sqrt(chi2 / (n * min(r-1, c-1))).
    q_chi_squared answers "is there drift?"; V answers "how much?"
    (a chi2 that is huge only because n is huge reads as V ~ 0).
    Same single-pass contingency rollup as q_chi_squared, including its
    DENSIFIED grid (empty cells contribute their expectation — see the
    q_chi_squared docstring for the differential that caught this):
    windows run over CELLS, the corpus is scanned once."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    dense = (
        docs.select("lang")
        .distinct()
        .crossJoin(F.broadcast(docs.select("source").distinct()))
        .join(obs, ["lang", "source"], "left")
        .select("lang", "source", F.coalesce("o", F.lit(0)).alias("o"))
    )
    margins = dense.select(
        "lang",
        "source",
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("source")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    s = margins.agg(
        F.sum(F.pow(F.col("o") - e, 2) / e).alias("chi2"),
        F.count_distinct("lang").alias("r"),
        F.count_distinct("source").alias("c"),
        F.max(F.col("n").cast("long")).alias("n"),
    )
    min_dim = F.least(F.col("r") - 1, F.col("c") - 1)
    return s.select(
        F.round("chi2", 6).alias("chi2"),
        "n",
        min_dim.cast("int").alias("min_dim"),
        F.round(F.sqrt(F.col("chi2") / (F.col("n") * min_dim)), 6).alias(
            "cramers_v"
        ),
    )


@query(
    "q_gini",
    oracle="""
WITH per_user AS (
    SELECT event_type, user_id, SUM(value) AS x
    FROM events GROUP BY 1, 2
), ranked AS (
    SELECT event_type, x,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, user_id) AS i,
        COUNT(*) OVER (PARTITION BY event_type) AS n,
        SUM(x) OVER (PARTITION BY event_type) AS tot
    FROM per_user
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_users,
    ROUND(2.0 * SUM(i * x) / (MAX(n) * MAX(tot))
        - (MAX(n) + 1.0) / MAX(n), 6) AS gini
FROM ranked GROUP BY event_type""",
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of per-user total value within each
    event_type — the "do 1% of users carry 99% of the volume?" skew
    readout (the same statistic warns that a groupBy on user_id needs
    the salted path). Closed form over ascending ranks:
    G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n, ties broken by user_id so
    both engines rank identically.

    Scale: the corpus reduces to the per-(type, user) rollup in one
    partial-agg pass; ranking windows run over the rollup (bounded by
    |users|, and partitioned by type), never the event stream."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum("value").alias("x")
    )
    pw = Window.partitionBy("event_type")
    ranked = per_user.select(
        "event_type",
        "x",
        F.row_number().over(pw.orderBy("x", "user_id")).alias("i"),
        F.count("*").over(pw).alias("n"),
        F.sum("x").over(pw).alias("tot"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_users"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (F.max("n") * F.max("tot"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Model-evaluation readouts: AUC, calibration/Brier, lift deciles.  The
# reference evaluates its ranker driver-side over pandas frames
# (transformer/ranking/modeling.py:70-99); this family is the distributed
# version of the readouts a scoring pipeline runs after every batch.
# ---------------------------------------------------------------------------

AUC_POS = "purchase"  # the one-vs-rest "relevant" event class


@query(
    "q_auc_eval",
    oracle=f"""
WITH per_v AS (
    SELECT value, CAST(COUNT(*) AS BIGINT) AS ct FROM events GROUP BY value
), ranked AS (
    SELECT value, ct,
        SUM(ct) OVER (ORDER BY value) - ct + (ct + 1) / 2.0 AS avg_rank
    FROM per_v
), per_tv AS (
    SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events
), s AS (
    SELECT t.event_type,
        CAST(SUM(t.c) AS BIGINT) AS n_pos,
        SUM(t.c * r.avg_rank) AS rp
    FROM per_tv t JOIN ranked r ON r.value = t.value
    GROUP BY t.event_type
)
SELECT s.event_type, s.n_pos, CAST(tot.n - s.n_pos AS BIGINT) AS n_neg,
    ROUND((s.rp - s.n_pos * (s.n_pos + 1) / 2.0)
          / (s.n_pos * (tot.n - s.n_pos)), 6) AS auc
FROM s CROSS JOIN tot""",
)
def q_auc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest ROC AUC for every event class at once, scored by
    ``value`` — the rank-sum identity AUC = (R_pos - n_pos(n_pos+1)/2) /
    (n_pos * n_neg) with midrank tie handling, i.e. exactly the
    probability P(score_pos > score_neg) + 0.5 P(=). The ranking-model
    quality readout (which classes does the score actually separate?).

    Scale-correct formulation (the q_mannwhitney_u discipline): the
    corpus reduces to the per-DISTINCT-value rollup once; average ranks
    are a cumulative sum over that ordered rollup; and because
    one-vs-rest ranks are GLOBAL ranks, all K readouts reuse the same
    rank table — one scan, K rows out."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_v = ev.groupBy("value").agg(F.count("*").cast("bigint").alias("ct"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    ranked = per_v.select(
        "value",
        (F.sum("ct").over(w) - F.col("ct") + (F.col("ct") + 1) / 2.0).alias(
            "avg_rank"
        ),
    )
    per_tv = ev.groupBy("event_type", "value").agg(
        F.count("*").cast("bigint").alias("c")
    )
    tot = ev.agg(F.count("*").cast("bigint").alias("n"))
    s = (
        per_tv.join(ranked, "value")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("bigint").alias("n_pos"),
            F.sum(F.col("c") * F.col("avg_rank")).alias("rp"),
        )
        .crossJoin(F.broadcast(tot))
    )
    n_pos, n = F.col("n_pos"), F.col("n")
    return s.select(
        "event_type",
        "n_pos",
        (n - n_pos).cast("bigint").alias("n_neg"),
        F.round(
            (F.col("rp") - n_pos * (n_pos + 1) / 2.0) / (n_pos * (n - n_pos)), 6
        ).alias("auc"),
    )


CAL_BINS = 10


@query(
    "q_calibration_bins",
    oracle=f"""
WITH mm AS (
    SELECT MIN(value) AS mn, MAX(value) AS mx FROM events
), scored AS (
    SELECT LEAST(CAST(FLOOR((value - mn) / (mx - mn) * {CAL_BINS}) AS INTEGER),
                 {CAL_BINS - 1}) AS bin,
        (value - mn) / (mx - mn) AS p,
        CASE WHEN event_type = '{AUC_POS}' THEN 1.0 ELSE 0.0 END AS y
    FROM events CROSS JOIN mm
), b AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        SUM(p) AS sp, SUM(p * p) AS sp2, SUM(y) AS sy, SUM(p * y) AS spy
    FROM scored GROUP BY bin
)
SELECT bin, n,
    ROUND(sp / n, 6) AS mean_p,
    ROUND(sy / n, 6) AS frac_pos,
    ROUND(SUM(sp2 - 2 * spy + sy) OVER () / SUM(n) OVER (), 6) AS brier
FROM b""",
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration (reliability) table + Brier score for a pseudo-
    probability (min-max-normalized ``value``) against the one-vs-rest
    '{AUC_POS}' label: per equi-width probability bin, mean predicted
    vs observed positive rate; the corpus-level Brier score repeated per
    row (the q_mrr_eval single-frame convention). A calibrated scorer
    tracks the diagonal; AUC can be high while this table is wild.

    Scale: Brier decomposes into per-bin sufficient statistics
    (SUM p, SUM p^2, SUM y, SUM p*y) — ONE conditional-agg pass with
    map-side partials; the window runs over the {CAL_BINS} bins only."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    p = (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn"))
    scored = ev.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(p * CAL_BINS).cast("int"), F.lit(CAL_BINS - 1)
        ).alias("bin"),
        p.alias("p"),
        F.when(F.col("event_type") == AUC_POS, 1.0).otherwise(0.0).alias("y"),
    )
    b = scored.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("p").alias("sp"),
        F.sum(F.col("p") * F.col("p")).alias("sp2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("p") * F.col("y")).alias("spy"),
    )
    w = Window.partitionBy()
    return b.select(
        "bin",
        "n",
        F.round(F.col("sp") / F.col("n"), 6).alias("mean_p"),
        F.round(F.col("sy") / F.col("n"), 6).alias("frac_pos"),
        F.round(
            F.sum(F.col("sp2") - 2 * F.col("spy") + F.col("sy")).over(w)
            / F.sum("n").over(w),
            6,
        ).alias("brier"),
    )


LIFT_DECILES = 10


@query(
    "q_lift_deciles",
    oracle=f"""
WITH r AS (
    SELECT value, CAST(COUNT(*) AS BIGINT) AS cnt,
        CAST(COUNT(CASE WHEN event_type = '{AUC_POS}' THEN 1 END) AS BIGINT)
            AS cp
    FROM events GROUP BY value
), c AS (
    SELECT cnt, cp,
        SUM(cnt) OVER (ORDER BY value DESC) AS cume,
        SUM(cnt) OVER () AS n, SUM(cp) OVER () AS np
    FROM r
), d AS (
    SELECT LEAST(CAST(CEIL(cume * {LIFT_DECILES}.0 / n) AS INTEGER),
                 {LIFT_DECILES}) AS decile,
        cnt, cp, n, np
    FROM c
)
SELECT decile, CAST(SUM(cnt) AS BIGINT) AS n_rows,
    CAST(SUM(cp) AS BIGINT) AS n_pos,
    ROUND(SUM(cp) * 1.0 / SUM(cnt), 6) AS response_rate,
    ROUND((SUM(cp) * 1.0 / SUM(cnt)) / (MAX(np) * 1.0 / MAX(n)), 6) AS lift
FROM d GROUP BY decile""",
)
def q_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift / gains table: rank by score (``value``) descending, cut into
    {LIFT_DECILES} grouped-data deciles, report each decile's
    '{AUC_POS}' response rate and its lift over the base rate — the
    "does the top decile convert 3x?" readout behind every targeting
    decision. Grouped-data semantics: a tied score lands wholly in the
    decile of its cumulative END position (documented deviation from
    row-ntile, which would split ties engine-dependently).

    Scale: deciles derive from the cumulative count over the DISTINCT
    score rollup — never a corpus-wide ntile window. One scan."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    r = ev.groupBy("value").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.count(F.when(F.col("event_type") == AUC_POS, 1))
        .cast("bigint")
        .alias("cp"),
    )
    cum = Window.orderBy(F.col("value").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy()
    c = r.select(
        "cnt",
        "cp",
        F.sum("cnt").over(cum).alias("cume"),
        F.sum("cnt").over(tot).alias("n"),
        F.sum("cp").over(tot).alias("np"),
    )
    d = c.select(
        F.least(
            F.ceil(F.col("cume") * float(LIFT_DECILES) / F.col("n")).cast(
                "int"
            ),
            F.lit(LIFT_DECILES),
        ).alias("decile"),
        "cnt",
        "cp",
        "n",
        "np",
    )
    rate = F.sum("cp") * 1.0 / F.sum("cnt")
    return d.groupBy("decile").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.sum("cp").cast("bigint").alias("n_pos"),
        F.round(rate, 6).alias("response_rate"),
        F.round(rate / (F.max("np") * 1.0 / F.max("n")), 6).alias("lift"),
    )


# ---------------------------------------------------------------------------
# Drift monitoring + multiple testing: PSI between time slices, and
# Benjamini-Hochberg FDR over the per-class mean tests.
# ---------------------------------------------------------------------------

PSI_BINS = 10
PSI_SMOOTH = 0.5  # Laplace count added per bin so empty bins stay finite


@query(
    "q_psi",
    oracle=f"""
WITH mm AS (
    SELECT MIN(value) AS mn, MAX(value) AS mx,
        (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS split_us
    FROM events
), binned AS (
    SELECT LEAST(CAST(FLOOR((value - mn) / (mx - mn) * {PSI_BINS}) AS INTEGER),
                 {PSI_BINS - 1}) AS bin,
        CASE WHEN epoch_us(ts) < split_us THEN 1 ELSE 0 END AS in_a
    FROM events CROSS JOIN mm
), counts AS (
    SELECT bin, CAST(SUM(in_a) AS BIGINT) AS ca,
        CAST(SUM(1 - in_a) AS BIGINT) AS cb
    FROM binned GROUP BY bin
), dense AS (
    SELECT CAST(g.b AS INTEGER) AS bin, COALESCE(c.ca, 0) AS ca,
        COALESCE(c.cb, 0) AS cb
    FROM range(0, {PSI_BINS}) g(b) LEFT JOIN counts c ON c.bin = g.b
), terms AS (
    SELECT bin, ca, cb,
        (ca + {PSI_SMOOTH}) / (SUM(ca) OVER () + {PSI_SMOOTH} * {PSI_BINS})
            AS pa,
        (cb + {PSI_SMOOTH}) / (SUM(cb) OVER () + {PSI_SMOOTH} * {PSI_BINS})
            AS pb
    FROM dense
)
SELECT bin, ca AS n_first_half, cb AS n_second_half,
    ROUND((pa - pb) * LN(pa / pb), 6) AS psi_term,
    ROUND(SUM((pa - pb) * LN(pa / pb)) OVER (), 6) AS psi_total
FROM terms""",
)
def q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the ``value`` distribution between
    the first and second half of the observed time span (split at the
    midpoint of the microsecond epoch range — exact integer arithmetic
    in both engines) — THE standard drift monitor a scoring pipeline
    runs between snapshots (rule of thumb: <0.1 stable, >0.25 drifted).
    {PSI_BINS} equi-width bins over the global min-max, DENSIFIED so an
    empty bin contributes its Laplace-smoothed term (the q_benford
    lesson: absence must surface, not vanish).

    Scale: one conditional-agg pass (two counts per bin); windows run
    over the {PSI_BINS}-row bin table only."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.floor(
            (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2
        ).alias("split_us"),
    )
    binned = ev.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * PSI_BINS
            ).cast("int"),
            F.lit(PSI_BINS - 1),
        ).alias("bin"),
        F.when(F.unix_micros("ts") < F.col("split_us"), 1)
        .otherwise(0)
        .alias("in_a"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum("in_a").cast("bigint").alias("ca"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("cb"),
    )
    dense = (
        spark.range(0, PSI_BINS)
        .select(F.col("id").cast("int").alias("bin"))
        .join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w = Window.partitionBy()
    pa = (F.col("ca") + PSI_SMOOTH) / (
        F.sum("ca").over(w) + PSI_SMOOTH * PSI_BINS
    )
    pb = (F.col("cb") + PSI_SMOOTH) / (
        F.sum("cb").over(w) + PSI_SMOOTH * PSI_BINS
    )
    term = (pa - pb) * F.log(pa / pb)
    return dense.select(
        "bin",
        F.col("ca").alias("n_first_half"),
        F.col("cb").alias("n_second_half"),
        F.round(term, 6).alias("psi_term"),
        F.round(F.sum(term).over(w), 6).alias("psi_total"),
    )


BH_Q = 0.10  # FDR level

# Two-sided normal p-value via the Abramowitz & Stegun 7.1.26 erfc
# polynomial (|error| < 1.5e-7): p = erfc(|z| / sqrt(2)).  The SAME
# arithmetic expression text evaluates in both dialects so the doubles
# agree far below the 6 dp round.
_ERFC_SQL = (
    "((((( 1.061405429 * __T__ - 1.453152027) * __T__ + 1.421413741)"
    " * __T__ - 0.284496736) * __T__ + 0.254829592) * __T__)"
    " * EXP(-(__X__) * (__X__))"
)


def _erfc_of(x_sql: str) -> str:
    t = f"(1.0 / (1.0 + 0.3275911 * ({x_sql})))"
    return _ERFC_SQL.replace("__T__", t).replace("__X__", f"({x_sql})")


@query(
    "q_bh_fdr",
    oracle=f"""
WITH per_g AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        SUM(value) AS s1, SUM(value * value) AS s2
    FROM events GROUP BY event_type
), aug AS (
    SELECT event_type, n, s1, s2,
        SUM(n) OVER () AS nt, SUM(s1) OVER () AS st1, SUM(s2) OVER () AS st2
    FROM per_g
), z AS (
    SELECT event_type, n,
        ((s1 / n) - ((st1 - s1) / (nt - n)))
        / SQRT(((s2 - s1 * s1 / n) / (n - 1)) / n
               + (((st2 - s2) - (st1 - s1) * (st1 - s1) / (nt - n))
                  / (nt - n - 1)) / (nt - n)) AS z
    FROM aug
), p AS (
    SELECT event_type, n, z, {_erfc_of('ABS(z) / 1.4142135623730951')} AS p
    FROM z
), ranked AS (
    SELECT event_type, n, z, p,
        ROW_NUMBER() OVER (ORDER BY p, event_type) AS i,
        COUNT(*) OVER () AS m
    FROM p
)
SELECT event_type, n, ROUND(z, 6) AS z_stat, ROUND(p, 6) AS p_value,
    ROUND(LEAST(MIN(p * m / i) OVER (
        ORDER BY i DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ), 1.0), 6) AS p_adj,
    LEAST(MIN(p * m / i) OVER (
        ORDER BY i DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ), 1.0) <= {BH_Q} AS rejected
FROM ranked""",
)
def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction over the family of one-vs-rest
    mean tests (each event class's Welch z against all other events) —
    the multiple-testing guard every per-segment drift dashboard needs
    (5 segments at p<0.05 each is NOT 5 discoveries). Adjusted
    p_(i) = min_j>=i (p_(j) * m / j), rejected at q={BH_Q}. The normal
    p-value uses the A&S 7.1.26 erfc polynomial — identical expression
    text in both dialects, error < 1.5e-7, far below the 6 dp round.

    Scale: per-class sufficient statistics (n, SUM x, SUM x^2) in ONE
    partial-agg pass; the rest-of-corpus moments derive by subtracting
    from the window totals, so K tests cost one scan; the BH ranking
    windows run over the K-row test table."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_g = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("value").alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    w = Window.partitionBy()
    aug = per_g.select(
        "event_type",
        "n",
        "s1",
        "s2",
        F.sum("n").over(w).alias("nt"),
        F.sum("s1").over(w).alias("st1"),
        F.sum("s2").over(w).alias("st2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    nt, st1, st2 = F.col("nt"), F.col("st1"), F.col("st2")
    vg = (s2 - s1 * s1 / n) / (n - 1)
    vr = ((st2 - s2) - (st1 - s1) * (st1 - s1) / (nt - n)) / (nt - n - 1)
    z = ((s1 / n) - ((st1 - s1) / (nt - n))) / F.sqrt(vg / n + vr / (nt - n))
    zdf = aug.select("event_type", "n", z.alias("z"))
    p = zdf.select(
        "event_type",
        "n",
        "z",
        F.expr(_erfc_of("ABS(z) / 1.4142135623730951")).alias("p"),
    )
    ranked = p.select(
        "event_type",
        "n",
        "z",
        "p",
        F.row_number().over(Window.orderBy("p", "event_type")).alias("i"),
        F.count("*").over(w).alias("m"),
    )
    wmin = Window.orderBy(F.col("i").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    adj = F.least(
        F.min(F.col("p") * F.col("m") / F.col("i")).over(wmin), F.lit(1.0)
    )
    return ranked.select(
        "event_type",
        "n",
        F.round("z", 6).alias("z_stat"),
        F.round("p", 6).alias("p_value"),
        F.round(adj, 6).alias("p_adj"),
        (adj <= BH_Q).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# Trend statistics over the daily rollup: Mann-Kendall, Theil-Sen, and
# Kendall's tau-b from the contingency grid.  All pairwise work runs at
# ROLLUP scale (days / cells), never over the event stream.
# ---------------------------------------------------------------------------


@query(
    "q_mann_kendall",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, SUM(value) AS y FROM events GROUP BY 1
), pairs AS (
    SELECT CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
    FROM daily a JOIN daily b ON b.day > a.day
), t AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily
), ties AS (
    SELECT COALESCE(SUM(c * (c - 1.0) * (2 * c + 5)), 0) AS tt
    FROM (SELECT COUNT(*) AS c FROM daily GROUP BY y) g WHERE c > 1
), s AS (
    SELECT CAST(COALESCE(SUM(sgn), 0) AS BIGINT) AS ss FROM pairs
)
SELECT t.n AS n_days, s.ss AS s_stat,
    ROUND(CASE WHEN s.ss = 0 THEN 0.0
        ELSE (s.ss - (CASE WHEN s.ss > 0 THEN 1 ELSE -1 END))
            / SQRT((t.n * (t.n - 1.0) * (2 * t.n + 5) - ties.tt) / 18.0)
    END, 6) AS z_stat,
    CASE WHEN s.ss > 0 THEN 'increasing' WHEN s.ss < 0 THEN 'decreasing'
         ELSE 'none' END AS trend
FROM s CROSS JOIN t CROSS JOIN ties""",
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on the daily total-value
    series — "is volume drifting, without assuming linearity or normal
    noise?" S = sum over day pairs of sign(y_j - y_i), tie-corrected
    variance, continuity-corrected z.

    Scale: the corpus reduces to the |days| rollup in one partial-agg
    pass; the O(days^2) pair join runs at rollup scale (a DECADE is
    ~3.7k rows -> 6.7M pairs of two doubles — trivial), never over
    events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum("value").alias("y")
    )
    a = daily.select(F.col("day").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("day").alias("db"), F.col("y").alias("yb"))
    pairs = a.join(b, F.col("db") > F.col("da")).select(
        F.when(F.col("yb") > F.col("ya"), 1)
        .when(F.col("yb") < F.col("ya"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    s = pairs.agg(
        F.coalesce(F.sum("sgn"), F.lit(0)).cast("bigint").alias("ss")
    )
    t = daily.agg(F.count("*").cast("bigint").alias("n"))
    ties = (
        daily.groupBy("y")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("c") * (F.col("c") - 1.0) * (2 * F.col("c") + 5)),
                F.lit(0.0),
            ).alias("tt")
        )
    )
    j = s.crossJoin(F.broadcast(t)).crossJoin(F.broadcast(ties))
    ss, n, tt = F.col("ss"), F.col("n"), F.col("tt")
    sigma = F.sqrt((n * (n - 1.0) * (2 * n + 5) - tt) / 18.0)
    cc = F.when(ss > 0, 1).otherwise(-1)
    return j.select(
        n.alias("n_days"),
        ss.alias("s_stat"),
        F.round(
            F.when(ss == 0, 0.0).otherwise((ss - cc) / sigma), 6
        ).alias("z_stat"),
        F.when(ss > 0, "increasing")
        .when(ss < 0, "decreasing")
        .otherwise("none")
        .alias("trend"),
    )


@query(
    "q_theil_sen",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, SUM(value) AS y FROM events GROUP BY 1
), idx AS (
    SELECT CAST(datediff('day', MIN(day) OVER (), day) AS BIGINT) AS x, y
    FROM daily
), slopes AS (
    SELECT (b.y - a.y) / (b.x - a.x) AS slope
    FROM idx a JOIN idx b ON b.x > a.x
), ranked AS (
    SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
        COUNT(*) OVER () AS m
    FROM slopes
), med AS (
    SELECT AVG(slope) AS slope, CAST(MAX(m) AS BIGINT) AS n_pairs
    FROM ranked WHERE rn IN ((m + 1) // 2, (m + 2) // 2)
), resid AS (
    SELECT i.y - med.slope * i.x AS r0, med.slope, med.n_pairs
    FROM idx i CROSS JOIN med
), rranked AS (
    SELECT r0, slope, n_pairs, ROW_NUMBER() OVER (ORDER BY r0) AS rn,
        COUNT(*) OVER () AS k
    FROM resid
)
SELECT CAST(MAX(k) AS BIGINT) AS n_days, MAX(n_pairs) AS n_pairs,
    ROUND(MAX(slope), 6) AS slope_per_day,
    ROUND(AVG(r0), 6) AS intercept
FROM rranked WHERE rn IN ((k + 1) // 2, (k + 2) // 2)""",
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend line for the daily total-value series:
    slope = median of all pairwise slopes, intercept = median residual —
    the breakdown-resistant alternative to OLS (up to 29% outlier days
    cannot move it). Medians are taken as the mean of the middle one/two
    ORDERED rows (engine-identical; never percentile interpolation,
    which differs across engines).

    Scale: pairwise slopes exist only at daily-rollup scale (|days|^2 /
    2 pairs of two doubles); both median windows run over that bounded
    table. The corpus is scanned once."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum("value").alias("y")
    )
    w = Window.partitionBy()
    idx = daily.select(
        F.datediff("day", F.min("day").over(w)).cast("bigint").alias("x"),
        "y",
    )
    a = idx.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = idx.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = a.join(b, F.col("xb") > F.col("xa")).select(
        ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias(
            "slope"
        )
    )
    ranked = slopes.select(
        "slope",
        F.row_number().over(Window.orderBy("slope")).alias("rn"),
        F.count("*").over(w).alias("m"),
    )
    mid = (F.col("rn") == F.floor((F.col("m") + 1) / 2)) | (
        F.col("rn") == F.floor((F.col("m") + 2) / 2)
    )
    med = ranked.filter(mid).agg(
        F.avg("slope").alias("slope"),
        F.max("m").cast("bigint").alias("n_pairs"),
    )
    resid = idx.crossJoin(F.broadcast(med)).select(
        (F.col("y") - F.col("slope") * F.col("x")).alias("r0"),
        "slope",
        "n_pairs",
    )
    rranked = resid.select(
        "r0",
        "slope",
        "n_pairs",
        F.row_number().over(Window.orderBy("r0")).alias("rn"),
        F.count("*").over(w).alias("k"),
    )
    midr = (F.col("rn") == F.floor((F.col("k") + 1) / 2)) | (
        F.col("rn") == F.floor((F.col("k") + 2) / 2)
    )
    return rranked.filter(midr).agg(
        F.max("k").cast("bigint").alias("n_days"),
        F.max("n_pairs").alias("n_pairs"),
        F.round(F.max("slope"), 6).alias("slope_per_day"),
        F.round(F.avg("r0"), 6).alias("intercept"),
    )


@query(
    "q_kendall_tau",
    oracle=f"""
WITH rated AS (
    SELECT CASE WHEN n_chars < {KAPPA_CHAR_CUTS[0]} THEN 0
                WHEN n_chars < {KAPPA_CHAR_CUTS[1]} THEN 1 ELSE 2 END AS ra,
        CASE WHEN len(string_split(text, ' ')) < {KAPPA_WORD_CUTS[0]} THEN 0
             WHEN len(string_split(text, ' ')) < {KAPPA_WORD_CUTS[1]} THEN 1
             ELSE 2 END AS rb
    FROM documents
), cells AS (
    SELECT ra, rb, CAST(COUNT(*) AS BIGINT) AS c FROM rated GROUP BY 1, 2
), pairs AS (
    SELECT
        CAST(COALESCE(SUM(CASE WHEN c2.ra > c1.ra AND c2.rb > c1.rb
                         THEN c1.c * c2.c END), 0) AS BIGINT) AS conc,
        CAST(COALESCE(SUM(CASE WHEN c2.ra > c1.ra AND c2.rb < c1.rb
                         THEN c1.c * c2.c END), 0) AS BIGINT) AS disc
    FROM cells c1 CROSS JOIN cells c2
), m AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n,
        SUM(c) * (SUM(c) - 1) / 2.0 AS n0,
        (SELECT SUM(t * (t - 1) / 2.0)
         FROM (SELECT SUM(c) AS t FROM cells GROUP BY ra) ma) AS n1,
        (SELECT SUM(t * (t - 1) / 2.0)
         FROM (SELECT SUM(c) AS t FROM cells GROUP BY rb) mb) AS n2
    FROM cells
)
SELECT m.n, p.conc AS concordant, p.disc AS discordant,
    ROUND((p.conc - p.disc) / SQRT((m.n0 - m.n1) * (m.n0 - m.n2)), 6)
        AS tau_b
FROM pairs p CROSS JOIN m""",
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b rank correlation between the two ordinal document
    raters of q_cohens_kappa (char-length class vs word-length class) —
    the ordinal-association companion to Spearman, with the tie-adjusted
    denominator. Computed from the CONTINGENCY GRID: concordant /
    discordant pair mass is a sum of c1*c2 over ordered cell pairs, so
    the O(n^2) pair space never exists — only the (|A| x |B|)^2 cell
    pairs (here 81).

    Scale: one grouping pass to the cell grid; everything after runs on
    <=9 rows."""
    docs = load_table(spark, sf_dir, "documents")
    ra = (
        F.when(F.col("n_chars") < KAPPA_CHAR_CUTS[0], 0)
        .when(F.col("n_chars") < KAPPA_CHAR_CUTS[1], 1)
        .otherwise(2)
    )
    nw = F.size(F.split(F.col("text"), " "))
    rb = (
        F.when(nw < KAPPA_WORD_CUTS[0], 0)
        .when(nw < KAPPA_WORD_CUTS[1], 1)
        .otherwise(2)
    )
    cells = (
        docs.select(ra.alias("ra"), rb.alias("rb"))
        .groupBy("ra", "rb")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    c1 = cells.select(
        F.col("ra").alias("a1"), F.col("rb").alias("b1"), F.col("c").alias("n1")
    )
    c2 = cells.select(
        F.col("ra").alias("a2"), F.col("rb").alias("b2"), F.col("c").alias("n2")
    )
    prod = F.col("n1") * F.col("n2")
    pairs = c1.crossJoin(F.broadcast(c2)).agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("a2") > F.col("a1")) & (F.col("b2") > F.col("b1")),
                    prod,
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("conc"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("a2") > F.col("a1")) & (F.col("b2") < F.col("b1")),
                    prod,
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("disc"),
    )
    ma = cells.groupBy("ra").agg(F.sum("c").alias("t")).agg(
        F.sum(F.col("t") * (F.col("t") - 1) / 2.0).alias("n1m")
    )
    mb = cells.groupBy("rb").agg(F.sum("c").alias("t")).agg(
        F.sum(F.col("t") * (F.col("t") - 1) / 2.0).alias("n2m")
    )
    tot = cells.agg(
        F.sum("c").cast("bigint").alias("n"),
        (F.sum("c") * (F.sum("c") - 1) / 2.0).alias("n0"),
    )
    j = (
        pairs.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ma))
        .crossJoin(F.broadcast(mb))
    )
    return j.select(
        "n",
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.round(
            (F.col("conc") - F.col("disc"))
            / F.sqrt(
                (F.col("n0") - F.col("n1m")) * (F.col("n0") - F.col("n2m"))
            ),
            6,
        ).alias("tau_b"),
    )


@query(
    "q_kruskal_wallis",
    oracle="""
WITH rollup AS (
    SELECT value, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY value, event_type
), totals AS (
    SELECT value, SUM(cnt) AS c FROM rollup GROUP BY value
), ranks AS (
    SELECT value, c,
        SUM(c) OVER (ORDER BY value
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - c + (c + 1) / 2.0 AS avg_rank
    FROM totals
), per_group AS (
    SELECT r.event_type,
        SUM(r.cnt * k.avg_rank) AS rg, SUM(r.cnt) AS ng
    FROM rollup r JOIN ranks k ON r.value = k.value
    GROUP BY r.event_type
), s AS (
    SELECT CAST(SUM(ng) AS BIGINT) AS n,
        CAST(COUNT(*) AS INTEGER) AS n_groups,
        SUM(rg * rg / ng) AS srr
    FROM per_group
), t AS (SELECT SUM(POW(c, 3) - c) AS tie FROM ranks)
SELECT n, n_groups,
    ROUND(12.0 / (n * (n + 1.0)) * srr - 3 * (n + 1.0), 6) AS h_stat,
    ROUND((12.0 / (n * (n + 1.0)) * srr - 3 * (n + 1.0))
        / (1 - tie / (POW(n, 3) - n)), 6) AS h_corrected
FROM s CROSS JOIN t""",
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H — the k-group generalization of Mann-Whitney
    (q_mannwhitney_u): one rank test across ALL event types at once,
    with the standard tie correction. The k-sample nonparametric readout
    for "do any of these variants differ at all" before pairwise tests.

    Scale-correct formulation (same discipline as Mann-Whitney): the
    corpus reduces to a (value, group) rollup in ONE pass; average ranks
    derive from a cumulative sum over the ordered DISTINCT-value table
    (never a corpus-wide rank window); per-group rank sums aggregate
    from the rollup joined back to the rank table at distinct-value
    scale. Driver sees one row."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    rollup = ev.groupBy("value", "event_type").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    totals = rollup.groupBy("value").agg(F.sum("cnt").alias("c"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    c = F.col("c")
    ranks = totals.select(
        "value", "c", (F.sum(c).over(w) - c + (c + 1) / 2.0).alias("avg_rank")
    )
    per_group = (
        rollup.join(ranks.select("value", "avg_rank"), "value")
        .groupBy("event_type")
        .agg(
            F.sum(F.col("cnt") * F.col("avg_rank")).alias("rg"),
            F.sum("cnt").alias("ng"),
        )
    )
    s = per_group.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.count("*").cast("int").alias("n_groups"),
        F.sum(F.col("rg") * F.col("rg") / F.col("ng")).alias("srr"),
    )
    t = ranks.agg(F.sum(F.pow(c, 3) - c).alias("tie"))
    n = F.col("n")
    h = 12.0 / (n * (n + 1.0)) * F.col("srr") - 3 * (n + 1.0)
    return s.crossJoin(F.broadcast(t)).select(
        "n",
        "n_groups",
        F.round(h, 6).alias("h_stat"),
        F.round(h / (1 - F.col("tie") / (F.pow(n, 3) - n)), 6).alias(
            "h_corrected"
        ),
    )


@query(
    "q_levene_test",
    oracle="""
WITH med AS (
    SELECT event_type, median(value) AS m FROM events GROUP BY event_type
), dev AS (
    SELECT e.event_type, ABS(e.value - med.m) AS z
    FROM events e JOIN med ON e.event_type = med.event_type
), per_group AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
        SUM(z) AS sz, SUM(z * z) AS szz
    FROM dev GROUP BY event_type
), s AS (
    SELECT CAST(SUM(ng) AS BIGINT) AS n,
        CAST(COUNT(*) AS INTEGER) AS k,
        SUM(sz) AS sz_all,
        SUM(sz * sz / ng) AS sb,
        SUM(szz - sz * sz / ng) AS sw
    FROM per_group
)
SELECT n, k,
    ROUND((sb - sz_all * sz_all / n) / (k - 1.0)
        / (sw / (n - k * 1.0)), 6) AS f_stat
FROM s""",
)
def q_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (Levene with median centering) for equal
    variances across event types — the guard run before trusting a
    pooled-variance readout, robust to the heavy tails that break
    Bartlett's test. F = between-group / within-group mean square of the
    absolute deviations z = |x - median(group)|.

    Two passes by construction (medians, then deviation aggregates), the
    second fused into one conditional agg; the per-group medians
    broadcast back, so no corpus shuffle beyond the two groupBys. The
    between/within decomposition uses sufficient statistics only
    (n, sum z, sum z^2 per group) — never a second scan per group."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("m"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("m")).alias("z")
    )
    per_group = dev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("ng"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    s = per_group.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.count("*").cast("int").alias("k"),
        F.sum("sz").alias("sz_all"),
        F.sum(F.col("sz") * F.col("sz") / F.col("ng")).alias("sb"),
        F.sum(F.col("szz") - F.col("sz") * F.col("sz") / F.col("ng")).alias(
            "sw"
        ),
    )
    between = (F.col("sb") - F.col("sz_all") * F.col("sz_all") / F.col("n")) / (
        F.col("k") - 1.0
    )
    within = F.col("sw") / (F.col("n") - F.col("k") * 1.0)
    return s.select("n", "k", F.round(between / within, 6).alias("f_stat"))


@query(
    "q_effect_sizes",
    oracle="""
WITH assigned AS (
    SELECT CAST(user_id % 2 AS INTEGER) AS variant, value,
        CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS converted
    FROM events
), s AS (
    SELECT
        COUNT(CASE WHEN variant = 0 THEN 1 END) AS n0,
        COUNT(CASE WHEN variant = 1 THEN 1 END) AS n1,
        AVG(CASE WHEN variant = 0 THEN value END) AS mean0,
        AVG(CASE WHEN variant = 1 THEN value END) AS mean1,
        VAR_SAMP(CASE WHEN variant = 0 THEN value END) AS v0,
        VAR_SAMP(CASE WHEN variant = 1 THEN value END) AS v1,
        AVG(CASE WHEN variant = 0 THEN converted END) AS p0,
        AVG(CASE WHEN variant = 1 THEN converted END) AS p1
    FROM assigned
), eff AS (
    SELECT n0, n1, p0, p1,
        (mean1 - mean0) / SQRT(((n0 - 1) * v0 + (n1 - 1) * v1)
            / (n0 + n1 - 2.0)) AS d,
        (p0 * n0 + p1 * n1) / (n0 + n1) AS pp
    FROM s
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
    ROUND(d, 6) AS cohens_d,
    ROUND(d * (1 - 3.0 / (4.0 * (n0 + n1) - 9.0)), 6) AS hedges_g,
    ROUND(p0, 6) AS p0, ROUND(p1, 6) AS p1,
    ROUND((p1 - p0) / SQRT(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1)), 6)
        AS prop_z,
    ROUND(p1 / p0, 6) AS risk_ratio
FROM eff""",
)
def q_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes for the q_ab_test experiment readout:
    Cohen's d on the continuous metric (pooled SD), its small-sample
    Hedges' g correction, and — on the binary purchase outcome — the
    pooled two-proportion z statistic and risk ratio. Significance
    (q_ab_test's t) says WHETHER variants differ; these say BY HOW MUCH
    in comparable units, which is what a launch decision reads.

    ONE conditional-aggregate pass: every input to every effect size is
    a sufficient statistic with map-side partials; the driver sees a
    single row."""
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.select(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        "value",
        F.when(F.col("event_type") == "purchase", 1.0)
        .otherwise(0.0)
        .alias("converted"),
    )
    v0 = F.col("variant") == 0
    v1 = F.col("variant") == 1
    s = assigned.agg(
        F.count(F.when(v0, 1)).alias("n0"),
        F.count(F.when(v1, 1)).alias("n1"),
        F.avg(F.when(v0, F.col("value"))).alias("mean0"),
        F.avg(F.when(v1, F.col("value"))).alias("mean1"),
        F.var_samp(F.when(v0, F.col("value"))).alias("v0"),
        F.var_samp(F.when(v1, F.col("value"))).alias("v1"),
        F.avg(F.when(v0, F.col("converted"))).alias("p0"),
        F.avg(F.when(v1, F.col("converted"))).alias("p1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    d = (F.col("mean1") - F.col("mean0")) / F.sqrt(
        ((n0 - 1) * F.col("v0") + (n1 - 1) * F.col("v1")) / (n0 + n1 - 2.0)
    )
    pp = (F.col("p0") * n0 + F.col("p1") * n1) / (n0 + n1)
    return s.select(
        n0.cast("bigint").alias("n0"),
        n1.cast("bigint").alias("n1"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * (1 - 3.0 / (4.0 * (n0 + n1) - 9.0)), 6).alias("hedges_g"),
        F.round("p0", 6).alias("p0"),
        F.round("p1", 6).alias("p1"),
        F.round(
            (F.col("p1") - F.col("p0"))
            / F.sqrt(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1)),
            6,
        ).alias("prop_z"),
        F.round(F.col("p1") / F.col("p0"), 6).alias("risk_ratio"),
    )


# Two-sided alpha=0.05 and power=0.80 normal quantiles — fixed literals
# shared by both dialects (scipy.stats.norm.ppf(0.975) / .ppf(0.8)).
Z_ALPHA_2 = 1.959963984540054
Z_BETA = 0.8416212335729143


@query(
    "q_power_analysis",
    oracle=f"""
WITH assigned AS (
    SELECT event_type, CAST(user_id % 2 AS INTEGER) AS variant, value
    FROM events
), s AS (
    SELECT event_type,
        COUNT(CASE WHEN variant = 0 THEN 1 END) AS n0,
        COUNT(CASE WHEN variant = 1 THEN 1 END) AS n1,
        AVG(CASE WHEN variant = 0 THEN value END) AS mean0,
        VAR_SAMP(CASE WHEN variant = 0 THEN value END) AS v0,
        VAR_SAMP(CASE WHEN variant = 1 THEN value END) AS v1
    FROM assigned GROUP BY event_type
)
SELECT event_type, CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
    ROUND(({Z_ALPHA_2} + {Z_BETA}) * SQRT(v0 / n0 + v1 / n1), 6) AS mde_abs,
    ROUND(({Z_ALPHA_2} + {Z_BETA}) * SQRT(v0 / n0 + v1 / n1) / mean0, 6)
        AS mde_rel
FROM s""",
)
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis: the minimum detectable effect (MDE) at
    two-sided alpha=0.05 / power=0.80 for each event type's A/B split at
    its CURRENT sample sizes — the "is this experiment even big enough"
    readout run before q_ab_test is trusted. mde = (z_a/2 + z_b) *
    se(diff) with the observed per-variant variances; mde_rel divides by
    the control mean.

    ONE conditional-aggregate pass per the family convention: variances
    and counts are map-side sufficient statistics; output is one row per
    event type."""
    ev = load_table(spark, sf_dir, "events")
    v0 = F.col("variant") == 0
    v1 = F.col("variant") == 1
    assigned = ev.select(
        "event_type", (F.col("user_id") % 2).cast("int").alias("variant"), "value"
    )
    s = assigned.groupBy("event_type").agg(
        F.count(F.when(v0, 1)).alias("n0"),
        F.count(F.when(v1, 1)).alias("n1"),
        F.avg(F.when(v0, F.col("value"))).alias("mean0"),
        F.var_samp(F.when(v0, F.col("value"))).alias("v0"),
        F.var_samp(F.when(v1, F.col("value"))).alias("v1"),
    )
    mde = (Z_ALPHA_2 + Z_BETA) * F.sqrt(
        F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    )
    return s.select(
        "event_type",
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / F.col("mean0"), 6).alias("mde_rel"),
    )


@query(
    "q_mutual_information",
    oracle="""
WITH cells AS (
    SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS c FROM documents
    GROUP BY lang, source
), tot AS (SELECT SUM(c) AS n FROM cells),
probs AS (
    SELECT c / tot.n AS p,
        SUM(c) OVER (PARTITION BY lang) / tot.n AS px,
        SUM(c) OVER (PARTITION BY source) / tot.n AS py
    FROM cells CROSS JOIN tot
),
hx AS (
    SELECT -SUM(cl / tot.n * LN(cl / tot.n)) AS hx
    FROM (SELECT lang, SUM(c) AS cl FROM cells GROUP BY lang) m
    CROSS JOIN tot
),
hy AS (
    SELECT -SUM(cs / tot.n * LN(cs / tot.n)) AS hy
    FROM (SELECT source, SUM(c) AS cs FROM cells GROUP BY source) m
    CROSS JOIN tot
),
mi AS (SELECT SUM(p * LN(p / (px * py))) AS mi FROM probs)
SELECT ROUND(mi, 6) AS mi, ROUND(hx, 6) AS h_lang, ROUND(hy, 6) AS h_source,
    ROUND(mi / SQRT(hx * hy), 6) AS nmi
FROM mi CROSS JOIN hx CROSS JOIN hy""",
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between document language and source, with the
    marginal entropies and the normalized MI — the dependence readout
    that complements q_chi_squared (significance) with an
    information-theoretic effect size, and closes the information family
    next to q_js_divergence / q_token_entropy.

    Scale: one groupBy to the (lang x source) cell table; every margin
    and entropy is a window or re-aggregation over CELLS (bounded by the
    attribute domains, corpus-independent)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count("*").cast("double").alias("c")
    )
    tot = F.sum("c").over(Window.partitionBy())
    probs = cells.select(
        (F.col("c") / tot).alias("p"),
        (F.sum("c").over(Window.partitionBy("lang")) / tot).alias("px"),
        (F.sum("c").over(Window.partitionBy("source")) / tot).alias("py"),
    )
    mx = cells.groupBy("lang").agg(F.sum("c").alias("cl"))
    my = cells.groupBy("source").agg(F.sum("c").alias("cs"))
    hx = mx.crossJoin(F.broadcast(cells.agg(F.sum("c").alias("n")))).agg(
        (-F.sum((F.col("cl") / F.col("n")) * F.log(F.col("cl") / F.col("n"))))
        .alias("hx")
    )
    hy = my.crossJoin(F.broadcast(cells.agg(F.sum("c").alias("n")))).agg(
        (-F.sum((F.col("cs") / F.col("n")) * F.log(F.col("cs") / F.col("n"))))
        .alias("hy")
    )
    mi = probs.agg(
        F.sum(F.col("p") * F.log(F.col("p") / (F.col("px") * F.col("py"))))
        .alias("mi")
    )
    j = mi.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    return j.select(
        F.round("mi", 6).alias("mi"),
        F.round("hx", 6).alias("h_lang"),
        F.round("hy", 6).alias("h_source"),
        F.round(F.col("mi") / F.sqrt(F.col("hx") * F.col("hy")), 6).alias("nmi"),
    )


@query(
    "q_did",
    oracle="""
WITH anchor AS (
    SELECT epoch_us(MIN(ts))
        + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2 AS cut_us
    FROM events
),
assigned AS (
    SELECT CAST(user_id % 2 AS INTEGER) AS treated,
        CAST(epoch_us(ts) >= anchor.cut_us AS INTEGER) AS post,
        value
    FROM events CROSS JOIN anchor
), cells AS (
    SELECT treated, post,
        CAST(COUNT(*) AS BIGINT) AS n,
        AVG(value) AS mean,
        VAR_SAMP(value) AS v
    FROM assigned GROUP BY treated, post
), wide AS (
    SELECT
        MAX(CASE WHEN treated = 0 AND post = 0 THEN mean END) AS m00,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN mean END) AS m01,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN mean END) AS m10,
        MAX(CASE WHEN treated = 1 AND post = 1 THEN mean END) AS m11,
        SUM(v / n) AS se2,
        CAST(SUM(n) AS BIGINT) AS n
    FROM cells
)
SELECT n,
    ROUND(m00, 6) AS control_pre, ROUND(m01, 6) AS control_post,
    ROUND(m10, 6) AS treated_pre, ROUND(m11, 6) AS treated_post,
    ROUND((m11 - m10) - (m01 - m00), 6) AS did,
    ROUND(((m11 - m10) - (m01 - m00)) / SQRT(se2), 6) AS z_stat
FROM wide""",
)
def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the causal-effect readout when
    randomization is absent — (treated post - treated pre) minus
    (control post - control pre) cancels both the group baseline and the
    common time trend. Treated = user_id parity (the repo's standing
    variant hash), pre/post split at the corpus midpoint timestamp; SE
    from the four cell variances (independent-cells normal approx).
    Completes the experiment family: q_ab_test (randomized), q_cuped
    (variance reduction), q_effect_sizes (magnitude), q_power_analysis
    (design), q_did (observational).

    ONE pass to the 2x2 cell table (conditional aggregates, map-side
    partials; the midpoint anchor is a broadcast scalar), then scalar
    algebra on four rows."""
    ev = load_table(spark, sf_dir, "events")
    # integer epoch-microsecond midpoint: floor-div arithmetic is exact
    # and engine-identical (interval division is not)
    anchor = ev.agg(
        (
            F.unix_micros(F.min("ts"))
            + F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 2
            ).cast("long")
        ).alias("cut_us")
    )
    assigned = ev.crossJoin(F.broadcast(anchor)).select(
        (F.col("user_id") % 2).cast("int").alias("treated"),
        (F.unix_micros(F.col("ts")) >= F.col("cut_us")).cast("int").alias("post"),
        "value",
    )
    cells = assigned.groupBy("treated", "post").agg(
        F.count("*").cast("bigint").alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("v"),
    )

    def cell(t, p):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col("mean"))
        )

    wide = cells.agg(
        cell(0, 0).alias("m00"),
        cell(0, 1).alias("m01"),
        cell(1, 0).alias("m10"),
        cell(1, 1).alias("m11"),
        F.sum(F.col("v") / F.col("n")).alias("se2"),
        F.sum("n").cast("bigint").alias("n"),
    )
    did = (F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00"))
    return wide.select(
        "n",
        F.round("m00", 6).alias("control_pre"),
        F.round("m01", 6).alias("control_post"),
        F.round("m10", 6).alias("treated_pre"),
        F.round("m11", 6).alias("treated_post"),
        F.round(did, 6).alias("did"),
        F.round(did / F.sqrt(F.col("se2")), 6).alias("z_stat"),
    )


# --- one-way ANOVA (parametric k-group mean comparison) ----------------------


@query(
    "q_anova_oneway",
    oracle="""
WITH g AS (
    SELECT event_type,
        CAST(COUNT(*) AS BIGINT) AS n,
        SUM(value) AS s,
        SUM(value * value) AS ss
    FROM events GROUP BY event_type
), gm AS (
    SELECT SUM(s) / SUM(n) AS grand_mean FROM g
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
        SUM(n) AS n_total,
        MAX(grand_mean) AS grand_mean,
        SUM(n * POW(s / n - grand_mean, 2)) AS ssb,
        SUM(ss - s * s / n) AS ssw
    FROM g CROSS JOIN gm
)
SELECT CAST(k AS BIGINT) AS k, CAST(n_total AS BIGINT) AS n_total,
    ROUND(grand_mean, 6) AS grand_mean,
    ROUND(ssb / (k - 1), 6) AS ms_between,
    ROUND(ssw / (n_total - k), 6) AS ms_within,
    ROUND((ssb / (k - 1)) / (ssw / (n_total - k)), 6) AS f_stat,
    ROUND(ssb / (ssb + ssw), 6) AS eta_sq
FROM tot""",
)
def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across the event-type groups — the parametric
    complement of q_kruskal_wallis (rank-based) and the k-group
    generalization of q_ab_test. Sufficient statistics only: per-group
    (n, sum, sum-of-squares) partial-aggregate map-side in ONE pass; SSB
    and SSW derive algebraically (SSW_g = ss_g - s_g^2/n_g, exact in both
    dialects because it is the SAME subtraction on the SAME doubles), and
    the k-row group table reduces to one readout row. At 100 TB the
    corpus never shuffles — only k triples do."""
    g = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("ss"),
        )
    )
    import pyspark.sql.window as W

    w = W.Window.partitionBy()
    tot = g.select(
        "n",
        "s",
        "ss",
        (F.sum("s").over(w) / F.sum("n").over(w)).alias("gm"),
    ).agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.max("gm").alias("grand_mean"),
        F.sum(F.col("n") * F.pow(F.col("s") / F.col("n") - F.col("gm"), 2)).alias(
            "ssb"
        ),
        F.sum(F.col("ss") - F.col("s") * F.col("s") / F.col("n")).alias("ssw"),
    )
    msb = F.col("ssb") / (F.col("k") - 1)
    msw = F.col("ssw") / (F.col("n_total") - F.col("k"))
    return tot.select(
        "k",
        "n_total",
        F.round("grand_mean", 6).alias("grand_mean"),
        F.round(msb, 6).alias("ms_between"),
        F.round(msw, 6).alias("ms_within"),
        F.round(msb / msw, 6).alias("f_stat"),
        F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_sq"),
    )


# --- Jarque-Bera normality test ----------------------------------------------


@query(
    "q_jarque_bera",
    oracle="""
WITH mu AS (
    SELECT event_type, AVG(value) AS m FROM events GROUP BY event_type
), mom AS (
    SELECT e.event_type,
        CAST(COUNT(*) AS BIGINT) AS n,
        AVG(POW(value - m, 3)) / POW(STDDEV_POP(value), 3) AS g1,
        AVG(POW(value - m, 4)) / POW(VAR_POP(value), 2) - 3 AS g2
    FROM events e JOIN mu USING (event_type)
    GROUP BY e.event_type
)
SELECT event_type, n,
    ROUND(g1, 6) AS skew,
    ROUND(g2, 6) AS excess_kurtosis,
    ROUND(n / 6.0 * (g1 * g1 + g2 * g2 / 4.0), 6) AS jb_stat,
    CAST(n / 6.0 * (g1 * g1 + g2 * g2 / 4.0) > 5.991465 AS BOOLEAN)
        AS reject_normal_5pct
FROM mom""",
)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test per event type: JB = n/6*(g1^2 + g2^2/4)
    from the POPULATION skewness g1 and excess kurtosis g2 — exactly the
    moments Spark's single-pass skewness()/kurtosis() builtins produce
    (the oracle recomputes them via the q_stats_moments two-pass mean-join
    because DuckDB's builtins are bias-corrected sample statistics).
    Decision column against the chi-square(2) 5% critical value 5.991.
    One event_type exchange; a normality gate over 100 TB of feature
    columns is one scan."""
    mom = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.skewness("value").alias("g1"),
            F.kurtosis("value").alias("g2"),
        )
    )
    jb = F.col("n") / 6.0 * (
        F.col("g1") * F.col("g1") + F.col("g2") * F.col("g2") / 4.0
    )
    return mom.select(
        "event_type",
        "n",
        F.round("g1", 6).alias("skew"),
        F.round("g2", 6).alias("excess_kurtosis"),
        F.round(jb, 6).alias("jb_stat"),
        (jb > 5.991465).alias("reject_normal_5pct"),
    )


# --- Wilson score confidence interval ----------------------------------------

_WILSON_Z = 1.959964  # two-sided 95%


@query(
    "q_wilson_ci",
    oracle=f"""
WITH g AS (
    SELECT event_type,
        CAST(COUNT(*) AS BIGINT) AS n,
        AVG(CASE WHEN value > 100 THEN 1.0 ELSE 0.0 END) AS p
    FROM events GROUP BY event_type
)
SELECT event_type, n, ROUND(p, 6) AS p_hat,
    ROUND((p + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
           - {_WILSON_Z} * SQRT(p * (1 - p) / n
                 + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
          / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS ci_lo,
    ROUND((p + {_WILSON_Z} * {_WILSON_Z} / (2 * n)
           + {_WILSON_Z} * SQRT(p * (1 - p) / n
                 + {_WILSON_Z} * {_WILSON_Z} / (4.0 * n * n)))
          / (1 + {_WILSON_Z} * {_WILSON_Z} / n), 6) AS ci_hi
FROM g
ORDER BY event_type""",
)
def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% interval for a per-group proportion (share of
    high-value events, the conversion-rate readout shape). Unlike the
    Wald interval it never leaves [0,1] and stays calibrated at small n
    or extreme p — the right default for dashboard proportions. ONE
    conditional-aggregate pass to (n, p) per group; the interval is
    scalar algebra on the k-row rollup."""
    z = _WILSON_Z
    g = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.avg(F.when(F.col("value") > 100, 1.0).otherwise(0.0)).alias("p"),
        )
    )
    n, p = F.col("n"), F.col("p")
    center = p + z * z / (2 * n)
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    return g.select(
        "event_type",
        "n",
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("ci_lo"),
        F.round((center + half) / denom, 6).alias("ci_hi"),
    ).orderBy("event_type")


# --- Herfindahl-Hirschman concentration index --------------------------------


@query(
    "q_hhi_concentration",
    oracle="""
WITH cells AS (
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY lang, source
), shares AS (
    SELECT lang, c / SUM(c) OVER (PARTITION BY lang) AS share
    FROM cells
)
SELECT lang,
    CAST(COUNT(*) AS BIGINT) AS n_sources,
    ROUND(SUM(share * share) * 10000, 6) AS hhi,
    ROUND(1.0 / SUM(share * share), 6) AS effective_sources,
    ROUND(MAX(share), 6) AS top_share
FROM shares GROUP BY lang ORDER BY lang""",
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-concentration audit per language: Herfindahl-Hirschman index
    (sum of squared shares, x10000 in the antitrust convention), its
    inverse (the effective number of sources), and the top source's
    share. The training-data governance readout: a lang whose HHI
    approaches 10000 is a single-source monoculture no matter how many
    rows it has. Corpus reduces to (lang x source) cells in one
    partial-agg pass; shares are a window over the bounded cell table."""
    from pyspark.sql import Window

    cells = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    share = (F.col("c") / F.sum("c").over(Window.partitionBy("lang"))).alias(
        "share"
    )
    return (
        cells.select("lang", share)
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_sources"),
            F.round(F.sum(F.col("share") * F.col("share")) * 10000, 6).alias(
                "hhi"
            ),
            F.round(1.0 / F.sum(F.col("share") * F.col("share")), 6).alias(
                "effective_sources"
            ),
            F.round(F.max("share"), 6).alias("top_share"),
        )
        .orderBy("lang")
    )


# --- precision-recall AUC (average precision) --------------------------------


@query(
    "q_pr_auc",
    oracle="""
WITH per_tv AS (
    SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
), per_v AS (
    SELECT value, CAST(SUM(c) AS BIGINT) AS ct FROM per_tv GROUP BY value
), cum AS (
    SELECT value, ct,
        SUM(ct) OVER (ORDER BY value DESC) AS cum_n
    FROM per_v
), cls AS (
    SELECT t.event_type, t.value, t.c, cum.cum_n,
        SUM(t.c) OVER (PARTITION BY t.event_type ORDER BY t.value DESC)
            AS cum_pos,
        CAST(SUM(t.c) OVER (PARTITION BY t.event_type) AS BIGINT) AS n_pos
    FROM per_tv t JOIN cum ON cum.value = t.value
)
SELECT event_type, n_pos,
    ROUND(SUM(c * (cum_pos * 1.0 / cum_n)) / n_pos, 6) AS pr_auc
FROM cls GROUP BY event_type, n_pos ORDER BY event_type""",
)
def q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest precision-recall AUC (average precision) per event
    class, scored by ``value`` descending — the ROC AUC companion that
    stays honest under class imbalance (a 0.1% positive class can post
    0.99 ROC AUC while ranking garbage; AP cannot). Tie convention
    pinned for cross-engine equality: every positive in a tied score
    group takes the precision at the GROUP END (cum counts through the
    whole group), the standard step-interpolation on distinct scores.

    Same scale discipline as q_auc_eval: ONE (type, value) cell rollup,
    global cumulative counts over the DISTINCT-value table, per-class
    cumulative positives over cells — one scan, K rows out, never a
    corpus-wide rank window."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_tv = ev.groupBy("event_type", "value").agg(
        F.count("*").cast("bigint").alias("c")
    )
    per_v = per_tv.groupBy("value").agg(
        F.sum("c").cast("bigint").alias("ct")
    )
    w_desc = Window.orderBy(F.col("value").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_v.select("value", F.sum("ct").over(w_desc).alias("cum_n"))
    w_cls = Window.partitionBy("event_type").orderBy(
        F.col("value").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    w_tot = Window.partitionBy("event_type")
    cls = per_tv.join(cum, "value").select(
        "event_type",
        "c",
        "cum_n",
        F.sum("c").over(w_cls).alias("cum_pos"),
        F.sum("c").over(w_tot).cast("bigint").alias("n_pos"),
    )
    return (
        cls.groupBy("event_type", "n_pos")
        .agg(
            F.round(
                F.sum(F.col("c") * (F.col("cum_pos") * 1.0 / F.col("cum_n")))
                / F.col("n_pos"),
                6,
            ).alias("pr_auc")
        )
        .orderBy("event_type")
    )


# --- weighted quantiles -------------------------------------------------------

WQ_QUANTILES = (0.25, 0.5, 0.75)


@query(
    "q_weighted_quantile",
    oracle=f"""
WITH per_v AS (
    SELECT event_type, value, SUM(value) AS w
    FROM events WHERE value > 0 GROUP BY event_type, value
), cum AS (
    SELECT event_type, value,
        SUM(w) OVER (PARTITION BY event_type ORDER BY value) AS cw,
        SUM(w) OVER (PARTITION BY event_type) AS tw
    FROM per_v
), qs AS (
    SELECT q FROM UNNEST(ARRAY[{", ".join(str(q) for q in WQ_QUANTILES)}])
        AS t(q)
)
SELECT event_type, q,
    ROUND(MIN(value), 6) AS weighted_quantile
FROM cum CROSS JOIN qs
WHERE cw >= q * tw
GROUP BY event_type, q
ORDER BY event_type, q""",
)
def q_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-weighted quantiles per group (weight = the value itself here:
    'the revenue level below which a quarter of revenue sits' — the
    Lorenz-curve inverse; any non-negative weight column slots in). The
    weighted analogue of percentile_disc, which NO engine builtin
    provides consistently: the smallest value whose cumulative weight
    reaches q * total.

    q_mannwhitney_u discipline: the corpus reduces to the per-DISTINCT-
    value weight rollup in one partial-agg pass; cumulative weights are
    windows over that rollup; the quantile probe is a 3-row broadcast
    cross join + min-aggregation over the cell table."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    per_v = ev.groupBy("event_type", "value").agg(F.sum("value").alias("w"))
    w_cum = Window.partitionBy("event_type").orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_tot = Window.partitionBy("event_type")
    cum = per_v.select(
        "event_type",
        "value",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    qs = F.broadcast(
        ev.sparkSession.createDataFrame(
            [(q,) for q in WQ_QUANTILES], "q double"
        )
    )
    return (
        cum.crossJoin(qs)
        .filter(F.col("cw") >= F.col("q") * F.col("tw"))
        .groupBy("event_type", "q")
        .agg(F.round(F.min("value"), 6).alias("weighted_quantile"))
        .orderBy("event_type", "q")
    )


# --- delta-method ratio metric + sample-ratio-mismatch check ------------------


@query(
    "q_ratio_metric_delta",
    oracle="""
WITH per_user AS (
    SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
        SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS x,
        CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY user_id
), s AS (
    SELECT variant,
        CAST(COUNT(*) AS BIGINT) AS n,
        AVG(x) AS mx, AVG(y) AS my,
        VAR_SAMP(x) AS vx, VAR_SAMP(y) AS vy, COVAR_SAMP(x, y) AS cxy
    FROM per_user GROUP BY variant
)
SELECT variant, n,
    ROUND(mx / my, 6) AS ratio,
    ROUND((vx - 2 * (mx / my) * cxy + (mx / my) * (mx / my) * vy)
          / (my * my) / n, 6) AS ratio_var
FROM s ORDER BY variant""",
)
def q_ratio_metric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error for a RATIO metric (revenue per
    event), per experiment variant — the experimentation-platform
    staple: user-level ratios are biased and event-level t-tests are
    wrong (events within a user correlate), so the correct readout is
    mean(x)/mean(y) over the USER rollup with
    Var = (vx - 2r*cxy + r^2*vy) / my^2 / n. Completes the experiment
    family around q_ab_test (plain means) and q_cuped (variance
    reduction). One pass to per-user (x, y), one tiny variant rollup."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        ).alias("x"),
        F.count("*").cast("bigint").alias("y"),
    )
    s = per_user.groupBy("variant").agg(
        F.count("*").cast("bigint").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.covar_samp("x", "y").alias("cxy"),
    )
    r = F.col("mx") / F.col("my")
    return s.select(
        "variant",
        "n",
        F.round(r, 6).alias("ratio"),
        F.round(
            (F.col("vx") - 2 * r * F.col("cxy") + r * r * F.col("vy"))
            / (F.col("my") * F.col("my"))
            / F.col("n"),
            6,
        ).alias("ratio_var"),
    ).orderBy("variant")


@query(
    "q_srm_check",
    oracle="""
WITH per_variant AS (
    SELECT CAST(user_id % 2 AS INTEGER) AS variant,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
), tot AS (SELECT SUM(n_users) AS n FROM per_variant)
SELECT p.variant, p.n_users,
    ROUND(p.n_users / t.n, 6) AS share,
    ROUND(POW(p.n_users - t.n / 2.0, 2) / (t.n / 2.0), 6) AS chi2_term,
    CAST(SUM(POW(p.n_users - t.n / 2.0, 2) / (t.n / 2.0)) OVER ()
         > 3.841459 AS BOOLEAN) AS srm_flag
FROM per_variant p CROSS JOIN tot t
ORDER BY p.variant""",
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: chi-square goodness-of-fit of the
    observed variant split against the designed 50/50 (critical value
    3.841 = chi-square(1) at 5%). The first thing a trustworthy
    experiment platform checks — a flagged SRM invalidates every other
    readout. Distinct-user counts per variant (one exchange), then
    scalar algebra on two rows."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per_variant = (
        ev.select((F.col("user_id") % 2).cast("int").alias("variant"), "user_id")
        .groupBy("variant")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )
    tot = per_variant.agg(F.sum("n_users").alias("n"))
    chi2_term = F.pow(F.col("n_users") - F.col("n") / 2.0, 2) / (
        F.col("n") / 2.0
    )
    w_all = Window.partitionBy()
    return (
        per_variant.crossJoin(F.broadcast(tot))
        .select(
            "variant",
            "n_users",
            F.round(F.col("n_users") / F.col("n"), 6).alias("share"),
            F.round(chi2_term, 6).alias("chi2_term"),
            (F.sum(chi2_term).over(w_all) > 3.841459).alias("srm_flag"),
        )
        .orderBy("variant")
    )


CONF_ALPHA = 0.1  # split-conformal miscoverage target (90% intervals)


@query(
    "q_conformal_interval",
    oracle=f"""
WITH train AS (
    SELECT event_type, AVG(value) AS yhat
    FROM events WHERE event_id % 4 IN (0, 1) GROUP BY 1
),
cal AS (
    SELECT e.event_type, e.event_id, ABS(e.value - t.yhat) AS r
    FROM events e JOIN train t USING (event_type)
    WHERE e.event_id % 4 = 2
),
kth AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal,
        LEAST(CAST(CEIL((1 - {CONF_ALPHA}) * (COUNT(*) + 1)) AS BIGINT),
              COUNT(*)) AS k
    FROM cal GROUP BY 1
),
q AS (
    SELECT c.event_type, k.n_cal, c.r AS q_alpha
    FROM (
        SELECT event_type, r, ROW_NUMBER() OVER (
            PARTITION BY event_type ORDER BY r, event_id
        ) AS rn
        FROM cal
    ) c JOIN kth k ON k.event_type = c.event_type AND c.rn = k.k
)
SELECT q.event_type, q.n_cal, ROUND(q.q_alpha, 6) AS q_alpha,
    CAST(COUNT(*) AS BIGINT) AS n_test,
    ROUND(AVG(CASE WHEN ABS(e.value - t.yhat) <= q.q_alpha
        THEN 1.0 ELSE 0.0 END), 6) AS coverage
FROM events e
JOIN train t USING (event_type)
JOIN q ON q.event_type = e.event_type
WHERE e.event_id % 4 = 3
GROUP BY 1, 2, 3""",
)
def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Papadopoulos 2002 / Vovk):
    train a per-event-type mean predictor on folds 0-1, take the
    ceil((1-alpha)(n+1))-th smallest absolute residual on the
    calibration fold 2 as the interval half-width, and measure empirical
    coverage on the held-out fold 3 — the distribution-free uncertainty
    wrapper modern ML-ops puts around ANY point model, with its finite-
    sample >= 1-alpha coverage guarantee.

    Scale: the predictor and the fold split are one groupBy each; the
    calibration quantile is the EXACT order statistic (rank via one
    per-type window at calibration-fold scale, ties broken by
    event_id), and coverage is a conditional aggregate — no corpus-
    wide sort, no sampling. Folds key off event_id so the split is
    deterministic and reproducible in both engines."""
    ev = load_table(spark, sf_dir, "events")
    train = (
        ev.filter(F.col("event_id") % 4 < 2)
        .groupBy("event_type")
        .agg(F.avg("value").alias("yhat"))
    )
    cal = (
        ev.filter(F.col("event_id") % 4 == 2)
        .join(F.broadcast(train), "event_type")
        .select(
            "event_type",
            "event_id",
            F.abs(F.col("value") - F.col("yhat")).alias("r"),
        )
    )
    kth = cal.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_cal"),
        F.least(
            F.ceil((1 - CONF_ALPHA) * (F.count("*") + 1)).cast("bigint"),
            F.count("*"),
        ).alias("k"),
    )
    w = Window.partitionBy("event_type").orderBy("r", "event_id")
    q = (
        cal.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(kth), "event_type")
        .filter(F.col("rn") == F.col("k"))
        .select("event_type", "n_cal", F.col("r").alias("q_alpha"))
    )
    test = (
        ev.filter(F.col("event_id") % 4 == 3)
        .join(F.broadcast(train), "event_type")
        .join(F.broadcast(q), "event_type")
    )
    return test.groupBy(
        "event_type", "n_cal", F.round("q_alpha", 6).alias("q_alpha")
    ).agg(
        F.count("*").cast("bigint").alias("n_test"),
        F.round(
            F.avg(
                F.when(
                    F.abs(F.col("value") - F.col("yhat")) <= F.col("q_alpha"),
                    1.0,
                ).otherwise(0.0)
            ),
            6,
        ).alias("coverage"),
    )


# Studentized-range critical value q(0.05, k=5 groups, df=inf) / sqrt(2):
# the classic table constant, fixed because the fixture's residual df is
# in the thousands (the df=120 value is 3.92 and df=inf is 3.858 — we are
# far past 120).
TUKEY_Q_CRIT = 3.858


@query(
    "q_tukey_hsd",
    oracle=f"""
WITH g AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        SUM(value) AS s, SUM(value * value) AS ss
    FROM events GROUP BY 1
),
mse AS (
    SELECT SUM(ss - s * s / n) / (SUM(n) - COUNT(*)) AS mse FROM g
)
SELECT a.event_type AS group_a, b.event_type AS group_b,
    a.n AS n_a, b.n AS n_b,
    ROUND(a.s / a.n - b.s / b.n, 6) AS mean_diff,
    ROUND(ABS(a.s / a.n - b.s / b.n)
        / SQRT(mse.mse / 2 * (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat,
    CAST(ABS(a.s / a.n - b.s / b.n)
        / SQRT(mse.mse / 2 * (1.0 / a.n + 1.0 / b.n))
        > {TUKEY_Q_CRIT} AS INTEGER) AS significant
FROM g a JOIN g b ON a.event_type < b.event_type CROSS JOIN mse""",
)
def q_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's HSD post-hoc test: every pairwise comparison of the
    per-event-type value means after q_anova_oneway rejects — the
    studentized-range statistic q = |mean_i - mean_j| /
    sqrt(MSE/2 (1/n_i + 1/n_j)) against the alpha=0.05, k=5, df=inf
    critical value {TUKEY_Q_CRIT}. The family-wise-error-controlled
    answer to "WHICH groups differ", completing the ANOVA ->
    post-hoc workflow (q_bh_fdr covers the FDR alternative).

    Scale: one conditional-agg pass reduces the corpus to k rows of
    (n, sum, sum-of-squares); MSE and all k(k-1)/2 comparisons are
    arithmetic on that rollup."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    mse = g.agg(
        (
            F.sum(F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
            / (F.sum("n") - F.count("*"))
        ).alias("mse")
    )
    a = g.select(
        F.col("event_type").alias("group_a"),
        F.col("n").alias("n_a"),
        (F.col("s") / F.col("n")).alias("mean_a"),
    )
    b = g.select(
        F.col("event_type").alias("group_b"),
        F.col("n").alias("n_b"),
        (F.col("s") / F.col("n")).alias("mean_b"),
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b")).crossJoin(
        F.broadcast(mse)
    )
    diff = F.col("mean_a") - F.col("mean_b")
    se = F.sqrt(
        F.col("mse") / 2 * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    q = F.abs(diff) / se
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        F.round(diff, 6).alias("mean_diff"),
        F.round(q, 6).alias("q_stat"),
        (q > TUKEY_Q_CRIT).cast("int").alias("significant"),
    )


@query(
    "q_runs_test",
    oracle="""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, SUM(value) AS y FROM events GROUP BY 1
),
med AS (
    SELECT y AS med FROM (
        SELECT y, ROW_NUMBER() OVER (ORDER BY y, day) AS rn,
            COUNT(*) OVER () AS n
        FROM daily
    ) WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
),
signs AS (
    SELECT day, CASE WHEN y > med THEN 1 ELSE 0 END AS s
    FROM daily CROSS JOIN med WHERE y <> med
),
runs AS (
    SELECT s,
        CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
             OR LAG(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS new_run
    FROM signs
),
agg AS (
    SELECT CAST(SUM(s) AS BIGINT) AS n1,
        CAST(SUM(1 - s) AS BIGINT) AS n2,
        CAST(SUM(new_run) AS BIGINT) AS r
    FROM runs
)
SELECT n1 AS n_above, n2 AS n_below, r AS n_runs,
    ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
        / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
               / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 6) AS z
FROM agg""",
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the daily total-value
    series around its (lower) median: count maximal runs of above/below-
    median days and standardize against the run-count null distribution
    — too FEW runs exposes trend/autocorrelation, too many exposes
    oscillation; the nonparametric complement of q_autocorr and the
    classic residual-independence check after any fit in the
    forecasting family. Days exactly at the median drop (standard
    treatment); the median is the deterministic lower order statistic
    (rank ceil(n/2), ties broken by day) so both engines pick the
    identical pivot.

    Scale: the corpus reduces to the daily rollup in one pass; the
    sign/run windows run over ~tens of rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum("value").alias("y")
    )
    wmed = Window.orderBy("y", "day")
    med = (
        daily.select(
            "y",
            F.row_number().over(wmed).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("n"),
        )
        .filter(F.col("rn") == F.ceil(F.col("n") / 2.0).cast("bigint"))
        .select(F.col("y").alias("med"))
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("y") != F.col("med"))
        .select(
            "day", F.when(F.col("y") > F.col("med"), 1).otherwise(0).alias("s")
        )
    )
    wday = Window.orderBy("day")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(wday).isNull()
            | (F.lag("s").over(wday) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.sum("s").cast("bigint").alias("n1"),
        F.sum(1 - F.col("s")).cast("bigint").alias("n2"),
        F.sum("new_run").cast("bigint").alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return agg.select(
        n1.alias("n_above"),
        n2.alias("n_below"),
        r.alias("n_runs"),
        F.round((r - mu) / F.sqrt(var), 6).alias("z"),
    )


WOE_BINS = 10
WOE_SMOOTH = 0.5


@query(
    "q_woe_iv",
    oracle=f"""
WITH mm AS (
    SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx
    FROM lineitem
),
binned AS (
    SELECT LEAST(CAST(FLOOR((l_extendedprice - mn) / (mx - mn)
            * {WOE_BINS}) AS INTEGER), {WOE_BINS - 1}) AS bin,
        CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
    FROM lineitem CROSS JOIN mm
),
b AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(bad) AS BIGINT) AS n_bad,
        CAST(COUNT(*) - SUM(bad) AS BIGINT) AS n_good
    FROM binned GROUP BY bin
),
t AS (
    SELECT bin, n, n_bad, n_good,
        (n_good + {WOE_SMOOTH}) / SUM(n_good) OVER () AS pg,
        (n_bad + {WOE_SMOOTH}) / SUM(n_bad) OVER () AS pb
    FROM b
)
SELECT bin, n, n_bad,
    ROUND(LN(pg / pb), 6) AS woe,
    ROUND(SUM((pg - pb) * LN(pg / pb)) OVER (), 6) AS iv_total
FROM t""",
)
def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding + information value of the price
    feature against the returned-line target — the credit-scoring
    feature transform (and the supervised complement of
    q_target_encoding's m-estimate): per equi-width price bin,
    WOE = ln(P(bin|good) / P(bin|bad)) with +{WOE_SMOOTH} smoothing,
    and the corpus-level IV = sum (pg - pb) * WOE repeated per row
    (rule of thumb: IV < 0.02 useless, > 0.3 strong).

    Scale: one conditional-agg pass to the {WOE_BINS}-bin rollup
    (equi-width from a broadcast min/max, NOT a global-sort NTILE);
    the windows run over {WOE_BINS} rows."""
    li = load_table(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    binned = li.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * WOE_BINS
            ).cast("int"),
            F.lit(WOE_BINS - 1),
        ).alias("bin"),
        (F.col("l_returnflag") == "R").cast("int").alias("bad"),
    )
    b = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("bad").cast("bigint").alias("n_bad"),
        (F.count("*") - F.sum("bad")).cast("bigint").alias("n_good"),
    )
    w = Window.partitionBy()
    t = b.select(
        "bin",
        "n",
        "n_bad",
        ((F.col("n_good") + WOE_SMOOTH) / F.sum("n_good").over(w)).alias("pg"),
        ((F.col("n_bad") + WOE_SMOOTH) / F.sum("n_bad").over(w)).alias("pb"),
    )
    return t.select(
        "bin",
        "n",
        "n_bad",
        F.round(F.log(F.col("pg") / F.col("pb")), 6).alias("woe"),
        F.round(
            F.sum(
                (F.col("pg") - F.col("pb")) * F.log(F.col("pg") / F.col("pb"))
            ).over(w),
            6,
        ).alias("iv_total"),
    )


@query(
    "q_isotonic_calibration",
    oracle=f"""
WITH mm AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events),
scored AS (
    SELECT LEAST(CAST(FLOOR((value - mn) / (mx - mn) * {CAL_BINS}) AS INTEGER),
                 {CAL_BINS - 1}) AS bin,
        CASE WHEN event_type = '{AUC_POS}' THEN 1.0 ELSE 0.0 END AS y
    FROM events CROSS JOIN mm
),
b AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy
    FROM scored GROUP BY bin
),
ranges AS (
    SELECT j.bin AS j, k.bin AS k,
        SUM(m.sy) / SUM(m.n) AS avg_jk
    FROM b j
    JOIN b k ON j.bin <= k.bin
    JOIN b m ON m.bin BETWEEN j.bin AND k.bin
    GROUP BY 1, 2
),
minmax AS (
    SELECT x.bin, r.j, MIN(r.avg_jk) AS mn_over_k
    FROM b x
    JOIN ranges r ON r.j <= x.bin AND r.k >= x.bin
    GROUP BY 1, 2
),
iso AS (
    SELECT bin, MAX(mn_over_k) AS iso_prob FROM minmax GROUP BY 1
)
SELECT b.bin, b.n, ROUND(b.sy / b.n, 6) AS frac_pos,
    ROUND(iso.iso_prob, 6) AS iso_prob
FROM b JOIN iso USING (bin)""",
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of the
    q_calibration_bins reliability table, via the minimax
    characterization of isotonic regression: iso(b) = max over j <= b of
    min over k >= b of the COUNT-WEIGHTED mean positive rate on bins
    [j..k] — exactly the pool-adjacent-violators solution (proved
    equivalent in tests/test_mining.py against a numpy PAV), computed
    set-wise so no sequential pooling loop exists. The production
    calibration-map trainer (Zadrozny & Elkan 2002) for turning raw
    scores into probabilities.

    Scale: the corpus reduces to the {CAL_BINS}-bin (n, sum-y) rollup in
    one pass; the O(B^3) range/minimax joins run on B = {CAL_BINS} rows
    — constant work regardless of corpus size."""
    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    p = (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn"))
    scored = ev.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(p * CAL_BINS).cast("int"), F.lit(CAL_BINS - 1)
        ).alias("bin"),
        F.when(F.col("event_type") == AUC_POS, 1.0).otherwise(0.0).alias("y"),
    )
    b = scored.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"), F.sum("y").alias("sy")
    )
    j = b.select(F.col("bin").alias("j"))
    k = b.select(F.col("bin").alias("k"))
    m = b.select(F.col("bin").alias("mb"), "n", "sy")
    ranges = (
        j.join(k, F.col("j") <= F.col("k"))
        .join(m, (F.col("mb") >= F.col("j")) & (F.col("mb") <= F.col("k")))
        .groupBy("j", "k")
        .agg((F.sum("sy") / F.sum("n")).alias("avg_jk"))
    )
    x = b.select(F.col("bin"))
    minmax = (
        x.join(ranges, (F.col("j") <= F.col("bin")) & (F.col("k") >= F.col("bin")))
        .groupBy("bin", "j")
        .agg(F.min("avg_jk").alias("mn_over_k"))
    )
    iso = minmax.groupBy("bin").agg(F.max("mn_over_k").alias("iso_prob"))
    return b.join(iso, "bin").select(
        "bin",
        "n",
        F.round(F.col("sy") / F.col("n"), 6).alias("frac_pos"),
        F.round("iso_prob", 6).alias("iso_prob"),
    )


WASS_A, WASS_B = "view", "purchase"  # the two distributions compared


@query(
    "q_wasserstein_1d",
    oracle=f"""
WITH vals AS (
    SELECT value AS v,
        CASE WHEN event_type = '{WASS_A}' THEN 1 ELSE 0 END AS in_a
    FROM events WHERE event_type IN ('{WASS_A}', '{WASS_B}')
),
tot AS (
    SELECT SUM(in_a) AS na, SUM(1 - in_a) AS nb FROM vals
),
rollup AS (
    SELECT v, CAST(SUM(in_a) AS BIGINT) AS ca,
        CAST(SUM(1 - in_a) AS BIGINT) AS cb
    FROM vals GROUP BY v
),
ecdf AS (
    SELECT v,
        SUM(ca) OVER (ORDER BY v) * 1.0 / tot.na AS fa,
        SUM(cb) OVER (ORDER BY v) * 1.0 / tot.nb AS fb,
        LEAD(v) OVER (ORDER BY v) AS v_next
    FROM rollup CROSS JOIN tot
)
SELECT ROUND(SUM(ABS(fa - fb) * (v_next - v)), 6) AS w1_distance,
    ROUND(MAX(ABS(fa - fb)), 6) AS ks_stat,
    (SELECT CAST(na AS BIGINT) FROM tot) AS n_a,
    (SELECT CAST(nb AS BIGINT) FROM tot) AS n_b
FROM ecdf WHERE v_next IS NOT NULL""",
)
def q_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth mover's) distance between the {WASS_A}
    and {WASS_B} value distributions: W1 = integral of |F_a - F_b| over
    the value axis, computed exactly as the ECDF-difference sum over
    consecutive DISTINCT values — the metric that sees HOW FAR mass
    must move, where the KS statistic (emitted alongside, the same
    rollup) only sees the largest vertical gap and q_source_kl only
    bin-level ratios. The distribution-shift measure embedding/feature
    drift monitors actually want.

    Scale: the q_ks_test discipline — the corpus reduces to the
    distinct-value rollup in one pass, ECDFs are cumulative sums over
    that rollup, and the integral is a LEAD window at rollup scale."""
    ev = load_table(spark, sf_dir, "events")
    vals = ev.filter(F.col("event_type").isin(WASS_A, WASS_B)).select(
        F.col("value").alias("v"),
        (F.col("event_type") == WASS_A).cast("int").alias("in_a"),
    )
    tot = vals.agg(
        F.sum("in_a").alias("na"), F.sum(1 - F.col("in_a")).alias("nb")
    )
    rollup = vals.groupBy("v").agg(
        F.sum("in_a").cast("bigint").alias("ca"),
        F.sum(1 - F.col("in_a")).cast("bigint").alias("cb"),
    )
    wv = Window.orderBy("v")
    ecdf = rollup.crossJoin(F.broadcast(tot)).select(
        "v",
        (F.sum("ca").over(wv) / F.col("na")).alias("fa"),
        (F.sum("cb").over(wv) / F.col("nb")).alias("fb"),
        F.lead("v").over(wv).alias("v_next"),
        "na",
        "nb",
    )
    return (
        ecdf.filter(F.col("v_next").isNotNull())
        .agg(
            F.round(
                F.sum(
                    F.abs(F.col("fa") - F.col("fb"))
                    * (F.col("v_next") - F.col("v"))
                ),
                6,
            ).alias("w1_distance"),
            F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias(
                "ks_stat"
            ),
            F.max("na").cast("bigint").alias("n_a"),
            F.max("nb").cast("bigint").alias("n_b"),
        )
    )


@query(
    "q_competing_risks",
    oracle="""
WITH per_user AS (
    SELECT user_id, MIN(ts) AS t0,
        MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
        MIN(CASE WHEN event_type = 'error' THEN ts END) AS te,
        MAX(ts) AS tl
    FROM events GROUP BY user_id
),
spells AS (
    SELECT user_id,
        CASE WHEN tp IS NULL AND te IS NULL THEN 0
             WHEN te IS NULL OR (tp IS NOT NULL AND tp <= te) THEN 1
             ELSE 2 END AS cause,
        CAST(FLOOR((epoch_us(COALESCE(LEAST(tp, te), tp, te, tl))
                    - epoch_us(t0)) / 86400000000.0) AS BIGINT) AS duration
    FROM per_user
),
rollup AS (
    SELECT duration,
        CAST(SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        CAST(SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        CAST(SUM(CASE WHEN cause = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cens
    FROM spells GROUP BY duration
),
risk AS (
    SELECT duration, d1, d2, cens,
        SUM(d1 + d2 + cens) OVER ()
            - COALESCE(SUM(d1 + d2 + cens) OVER (
                ORDER BY duration
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS n_risk
    FROM rollup
),
surv AS (
    SELECT duration, d1, d2, cens, n_risk,
        COALESCE(EXP(SUM(LN(NULLIF(1 - (d1 + d2) * 1.0 / n_risk, 0))) OVER (
            ORDER BY duration
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), 1.0)
            AS s_minus
    FROM risk
)
SELECT duration, CAST(n_risk AS BIGINT) AS n_risk, d1, d2,
    ROUND(SUM(s_minus * d1 / n_risk) OVER (
        ORDER BY duration
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        AS cif_purchase,
    ROUND(SUM(s_minus * d2 / n_risk) OVER (
        ORDER BY duration
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        AS cif_error
FROM surv""",
)
def q_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Competing-risks cumulative incidence (Aalen-Johansen): for each
    user the FIRST of two competing terminal events — purchase vs error
    — measured in whole days from the user's first activity; CIF_k(t) =
    sum over s <= t of S(s-) * d_k(s)/n(s), where S(s-) is the overall
    event-free survival just before s. The right way to answer "what
    fraction will convert vs churn by day t" — 1 - KM per cause is
    BIASED when risks compete (it over-counts both), while the CIFs
    plus residual survival sum exactly to 1 (asserted in tests).
    Timestamp ties between the two causes resolve to purchase in both
    engines; users with neither event would be censored at last
    activity (none on this fixture, path still exercised).

    Scale: the q_kaplan_meier discipline — one user-grain pass, then
    every window runs over the per-duration life table."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "tp"
        ),
        F.min(F.when(F.col("event_type") == "error", F.col("ts"))).alias("te"),
        F.max("ts").alias("tl"),
    )
    cause = (
        F.when(F.col("tp").isNull() & F.col("te").isNull(), 0)
        .when(
            F.col("te").isNull()
            | (F.col("tp").isNotNull() & (F.col("tp") <= F.col("te"))),
            1,
        )
        .otherwise(2)
    )
    tend = F.coalesce(
        F.least("tp", "te"), F.col("tp"), F.col("te"), F.col("tl")
    )
    spells = per_user.select(
        cause.alias("cause"),
        F.floor(
            (F.unix_micros(tend) - F.unix_micros("t0")) / 86400000000.0
        )
        .cast("bigint")
        .alias("duration"),
    )
    rollup = spells.groupBy("duration").agg(
        F.sum((F.col("cause") == 1).cast("int")).cast("bigint").alias("d1"),
        F.sum((F.col("cause") == 2).cast("int")).cast("bigint").alias("d2"),
        F.sum((F.col("cause") == 0).cast("int")).cast("bigint").alias("cens"),
    )
    wall = Window.partitionBy()
    wprev = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wcum = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = F.col("d1") + F.col("d2") + F.col("cens")
    risk = rollup.select(
        "duration",
        "d1",
        "d2",
        (
            F.sum(tot).over(wall)
            - F.coalesce(F.sum(tot).over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    s_minus = F.coalesce(
        F.exp(
            F.sum(
                F.log(
                    F.nullif(
                        1 - (F.col("d1") + F.col("d2")) / F.col("n_risk"),
                        F.lit(0),
                    )
                )
            ).over(wprev)
        ),
        F.lit(1.0),
    )
    surv = risk.select("duration", "d1", "d2", "n_risk", s_minus.alias("s_minus"))
    return surv.select(
        "duration",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        "d1",
        "d2",
        F.round(
            F.sum(F.col("s_minus") * F.col("d1") / F.col("n_risk")).over(wcum),
            6,
        ).alias("cif_purchase"),
        F.round(
            F.sum(F.col("s_minus") * F.col("d2") / F.col("n_risk")).over(wcum),
            6,
        ).alias("cif_error"),
    )


SWEEP_BINS = 20


@query(
    "q_threshold_sweep",
    oracle=f"""
WITH mm AS (SELECT MIN(value) AS mn, MAX(value) AS mx FROM events),
scored AS (
    SELECT LEAST(CAST(FLOOR((value - mn) / (mx - mn) * {SWEEP_BINS})
            AS INTEGER), {SWEEP_BINS - 1}) AS bin,
        CASE WHEN event_type = '{AUC_POS}' THEN 1 ELSE 0 END AS y
    FROM events CROSS JOIN mm
),
b AS (
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
    FROM scored GROUP BY bin
),
cum AS (
    SELECT bin,
        SUM(n) OVER (ORDER BY bin DESC) AS n_ge,
        SUM(pos) OVER (ORDER BY bin DESC) AS pos_ge,
        SUM(pos) OVER () AS pos_tot
    FROM b
)
SELECT CAST(bin AS INTEGER) AS threshold_bin,
    ROUND(bin * 1.0 / {SWEEP_BINS}, 6) AS threshold,
    CAST(pos_ge AS BIGINT) AS tp, CAST(n_ge - pos_ge AS BIGINT) AS fp,
    ROUND(pos_ge * 1.0 / n_ge, 6) AS precision_at,
    ROUND(pos_ge * 1.0 / pos_tot, 6) AS recall_at,
    ROUND(2.0 * pos_ge / (n_ge + pos_tot), 6) AS f1
FROM cum""",
)
def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep for the min-max-normalized value score
    against the one-vs-rest '{AUC_POS}' label: for every candidate
    threshold (each of {SWEEP_BINS} equi-width score-bin edges),
    predicted-positive = score-bin >= threshold, with exact TP/FP,
    precision, recall, and F1 (2TP/(2TP+FP+FN), algebraically
    2*pos_ge/(n_ge + pos_total)) — the table a deployment picks its
    cut-off from, complementing q_pr_auc's single summary number and
    q_calibration_bins' probability view.

    Scale: one conditional-agg pass to the {SWEEP_BINS}-bin rollup;
    every operating point is a DESCENDING cumulative window over those
    bins — thresholds never rescan the corpus."""
    ev = load_table(spark, sf_dir, "events")
    mm = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    scored = ev.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * SWEEP_BINS
            ).cast("int"),
            F.lit(SWEEP_BINS - 1),
        ).alias("bin"),
        (F.col("event_type") == AUC_POS).cast("int").alias("y"),
    )
    b = scored.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    wdesc = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = b.select(
        "bin",
        F.sum("n").over(wdesc).alias("n_ge"),
        F.sum("pos").over(wdesc).alias("pos_ge"),
        F.sum("pos").over(wall).alias("pos_tot"),
    )
    return cum.select(
        F.col("bin").cast("int").alias("threshold_bin"),
        F.round(F.col("bin") / SWEEP_BINS, 6).alias("threshold"),
        F.col("pos_ge").cast("bigint").alias("tp"),
        (F.col("n_ge") - F.col("pos_ge")).cast("bigint").alias("fp"),
        F.round(F.col("pos_ge") / F.col("n_ge"), 6).alias("precision_at"),
        F.round(F.col("pos_ge") / F.col("pos_tot"), 6).alias("recall_at"),
        F.round(
            2.0 * F.col("pos_ge") / (F.col("n_ge") + F.col("pos_tot")), 6
        ).alias("f1"),
    )


MAP_K = 10


@query(
    "q_map_eval",
    oracle=f"""
WITH graded AS (
    SELECT source, doc_id, n_chars,
        CASE WHEN len(string_split(text, ' ')) >= {KAPPA_WORD_CUTS[1]}
            THEN 1 ELSE 0 END AS rel
    FROM documents
), ranked AS (
    SELECT source, rel,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)
            AS pos,
        SUM(rel) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rel,
        SUM(rel) OVER (PARTITION BY source) AS r_total
    FROM graded
)
SELECT source,
    CAST(MAX(r_total) AS BIGINT) AS n_relevant,
    ROUND(COALESCE(SUM(CASE WHEN pos <= {MAP_K} AND rel = 1
            THEN cum_rel * 1.0 / pos END)
        / NULLIF(LEAST(MAX(r_total), {MAP_K}), 0), 0.0), 6)
        AS avg_precision
FROM ranked GROUP BY source""",
)
def q_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average Precision @ {MAP_K} per query group (mean over groups =
    MAP, the binary-relevance retrieval readout next to q_ndcg_eval's
    graded one; same deterministic char-length ranker, relevance =
    long documents). AP = sum of precision-at-hit over the top {MAP_K}
    hits, normalized by min(R, {MAP_K}) so a group with fewer than
    {MAP_K} relevant docs can still reach 1.0.

    Scale: the running-hit count (cum_rel) and the rank both come from
    ONE window ordering per group, sharing q_ndcg_eval's single
    exchange on the query-group key; the AP reduction is a conditional
    aggregate — a billion-query eval shuffles (group, rel, score)
    triples once."""
    docs = load_table(spark, sf_dir, "documents")
    rel = F.when(
        F.size(F.split("text", " ")) >= KAPPA_WORD_CUTS[1], 1
    ).otherwise(0)
    graded = docs.select(
        "source", "doc_id", "n_chars", rel.alias("rel")
    )
    worder = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), "doc_id"
    )
    ranked = graded.select(
        "source",
        "rel",
        F.row_number().over(worder).alias("pos"),
        F.sum("rel")
        .over(worder.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_rel"),
        F.sum("rel")
        .over(Window.partitionBy("source"))
        .alias("r_total"),
    )
    ap = F.coalesce(
        F.sum(
            F.when(
                (F.col("pos") <= MAP_K) & (F.col("rel") == 1),
                F.col("cum_rel") * 1.0 / F.col("pos"),
            )
        )
        / F.nullif(
            F.least(F.max("r_total"), F.lit(MAP_K)).cast("double"),
            F.lit(0.0),
        ),
        F.lit(0.0),
    )
    return ranked.groupBy("source").agg(
        F.max("r_total").cast("bigint").alias("n_relevant"),
        F.round(ap, 6).alias("avg_precision"),
    )


# Deterministic user subsample for the small-sample exact tests: Fisher's
# exact test is the SMALL-COUNT complement of q_chi_squared — on the full
# corpus the hypergeometric tail underflows to 0/1 and the test says
# nothing chi-squared doesn't. A modulus keeps the sample deterministic
# and engine-identical.
FISHER_USER_MOD = 37
# Weekend from pure integer day arithmetic ((epoch_day + 4) % 7, 0 =
# Sunday) — engine date-part conventions differ (Spark dayofweek is
# 1-based Sunday, DuckDB 0-based), integer math is identical everywhere.
_WEEKEND_SQL = (
    "((CAST(FLOOR(epoch_us / 86400000000) AS BIGINT) + 4) % 7) IN (0, 6)"
)


@query(
    "q_fisher_exact",
    oracle=f"""
WITH ev AS MATERIALIZED (
    SELECT CAST(epoch_us(ts) AS BIGINT) AS epoch_us, event_type
    FROM events WHERE user_id % {FISHER_USER_MOD} = 0
), cells AS MATERIALIZED (
    SELECT
        CAST(SUM(CASE WHEN wk AND err THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN wk AND NOT err THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN NOT wk AND err THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN NOT wk AND NOT err THEN 1 ELSE 0 END) AS BIGINT)
            AS d,
        CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT {_WEEKEND_SQL} AS wk, event_type = 'error' AS err FROM ev
    )
), lf AS MATERIALIZED (
    -- range() args may not be subqueries in DuckDB: generate a fixed
    -- 1e6 grid (trivial) and keep i <= n via the scalar subquery
    SELECT i, SUM(LN(CASE WHEN i >= 2 THEN i ELSE 1 END)) OVER (
        ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lf
    FROM (
        SELECT CAST(r.range AS BIGINT) AS i
        FROM range(1000000) r
        WHERE r.range <= (SELECT n FROM cells)
    )
), terms AS MATERIALIZED (
    SELECT g.i AS k,
        lr1.lf + lr2.lf + lc1.lf + lc2.lf - ln_.lf
            - lk.lf - lak.lf - lck.lf - ldk.lf AS logp
    FROM cells cc
    JOIN lf g ON g.i >= GREATEST(0, cc.a + cc.b + cc.a + cc.c - cc.n)
             AND g.i <= LEAST(cc.a + cc.b, cc.a + cc.c)
    JOIN lf lr1 ON lr1.i = cc.a + cc.b
    JOIN lf lr2 ON lr2.i = cc.c + cc.d
    JOIN lf lc1 ON lc1.i = cc.a + cc.c
    JOIN lf lc2 ON lc2.i = cc.b + cc.d
    JOIN lf ln_ ON ln_.i = cc.n
    JOIN lf lk ON lk.i = g.i
    JOIN lf lak ON lak.i = cc.a + cc.b - g.i
    JOIN lf lck ON lck.i = cc.a + cc.c - g.i
    JOIN lf ldk ON ldk.i = cc.d - cc.a + g.i
)
SELECT cc.a, cc.b, cc.c, cc.d,
    ROUND(cc.a * cc.d * 1.0 / NULLIF(cc.b * cc.c, 0), 6) AS odds_ratio,
    ROUND((SELECT EXP(logp) FROM terms WHERE k = cc.a), 6) AS p_observed,
    ROUND((SELECT SUM(EXP(logp)) FROM terms
           WHERE logp <= (SELECT logp FROM terms WHERE k = cc.a) + 1e-7), 6)
        AS p_two_sided
FROM cells cc""",
)
def q_fisher_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher's EXACT test of independence on a 2x2 table (weekend x
    error-event over a deterministic small user subsample, user_id %
    {FISHER_USER_MOD} = 0) — the small-count complement of
    q_chi_squared, whose asymptotic p is unreliable exactly where
    Fisher is exact. Two-sided p sums every hypergeometric table whose
    point probability <= the observed one (R's convention, with the
    1e-7 slack for float ties); probabilities computed in LOG space
    from a log-factorial table built as ONE ascending running sum —
    the identical addition sequence in both engines, so the unrolled
    arithmetic hash-matches.

    Scale: the corpus reduces to FOUR integers in one conditional-agg
    pass; the log-factorial table and the k-grid are bounded by the
    SAMPLE size (the test is only meaningful at small n — at corpus n
    the tail underflows and q_chi_squared is the right tool), so every
    downstream join is driver-trivial and broadcast."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % FISHER_USER_MOD == 0
    )
    epoch_day = F.floor(F.unix_micros("ts") / 86400000000.0).cast("bigint")
    wk = ((epoch_day + 4) % 7).isin(0, 6)
    err = F.col("event_type") == "error"
    cells = ev.agg(
        F.sum(F.when(wk & err, 1).otherwise(0)).cast("bigint").alias("a"),
        F.sum(F.when(wk & ~err, 1).otherwise(0)).cast("bigint").alias("b"),
        F.sum(F.when(~wk & err, 1).otherwise(0)).cast("bigint").alias("c"),
        F.sum(F.when(~wk & ~err, 1).otherwise(0)).cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("n"),
    )
    a, b, c, d, n = cells.first()  # bounded scalar read (4 cells + n)
    r1, c1 = a + b, a + c
    lo, hi = max(0, r1 + c1 - n), min(r1, c1)
    lf = spark.range(0, n + 1).select(
        F.col("id").alias("i"),
        F.sum(
            F.when(F.col("id") >= 2, F.log(F.col("id").cast("double")))
            .otherwise(0.0)
        )
        .over(
            Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("lf"),
    )
    # the lf table is sample-bounded: collect it once and fold the nine
    # lookups per k into literals driver-side (the BPE-argmax precedent)
    lfm = {r.i: r.lf for r in lf.collect()}

    def logp(k: int) -> float:
        return (
            lfm[r1]
            + lfm[n - r1]
            + lfm[c1]
            + lfm[n - c1]
            - lfm[n]
            - lfm[k]
            - lfm[r1 - k]
            - lfm[c1 - k]
            - lfm[n - r1 - c1 + k]
        )

    import math

    lp_obs = logp(a)
    p_obs = math.exp(lp_obs)
    p_two = sum(
        math.exp(lp)
        for lp in (logp(k) for k in range(lo, hi + 1))
        if lp <= lp_obs + 1e-7
    )
    out = spark.createDataFrame(
        [(a, b, c, d)], "a bigint, b bigint, c bigint, d bigint"
    )
    odds = F.when(
        F.lit(b * c) != 0, F.lit(float(a * d)) / F.lit(float(b * c))
    )
    return out.select(
        "a",
        "b",
        "c",
        "d",
        F.round(odds, 6).alias("odds_ratio"),
        F.round(F.lit(p_obs), 6).alias("p_observed"),
        F.round(F.lit(p_two), 6).alias("p_two_sided"),
    )


# High-value errors only: with ~67 events/user the plain "any error in
# the half" indicator is 1 for every user in both halves and the
# discordant cells are empty. value >= 150 leaves real discordance at
# every fixture SF (probed: b=26/c=38 at sf0.01).
MCNEMAR_VALUE = 150.0


@query(
    "q_mcnemar",
    oracle=f"""
WITH bounds AS MATERIALIZED (
    SELECT (MIN(CAST(epoch_us(ts) AS BIGINT))
          + MAX(CAST(epoch_us(ts) AS BIGINT))) // 2 AS mid_us
    FROM events
), paired AS MATERIALIZED (
    SELECT user_id,
        MAX(CASE WHEN event_type = 'error' AND value >= {MCNEMAR_VALUE}
            AND CAST(epoch_us(ts) AS BIGINT) < mid_us THEN 1 ELSE 0 END) AS x,
        MAX(CASE WHEN event_type = 'error' AND value >= {MCNEMAR_VALUE}
            AND CAST(epoch_us(ts) AS BIGINT) >= mid_us THEN 1 ELSE 0 END) AS y
    FROM events CROSS JOIN bounds
    GROUP BY user_id
), cells AS MATERIALIZED (
    SELECT
        CAST(SUM(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
    FROM paired
), lf AS MATERIALIZED (
    SELECT i, SUM(LN(CASE WHEN i >= 2 THEN i ELSE 1 END)) OVER (
        ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lf
    FROM (
        SELECT CAST(r.range AS BIGINT) AS i
        FROM range(1000000) r
        WHERE r.range <= (SELECT b + c FROM cells)
    )
), exact AS MATERIALIZED (
    SELECT SUM(EXP(lm.lf - li.lf - lmi.lf - (cc.b + cc.c) * LN(2.0)))
        AS tail
    FROM cells cc
    JOIN lf g ON g.i <= LEAST(cc.b, cc.c)
    JOIN lf lm ON lm.i = cc.b + cc.c
    JOIN lf li ON li.i = g.i
    JOIN lf lmi ON lmi.i = cc.b + cc.c - g.i
)
SELECT cc.a, cc.b, cc.c, cc.d,
    ROUND((cc.b - cc.c) * (cc.b - cc.c) * 1.0
        / NULLIF(cc.b + cc.c, 0), 6) AS chi2,
    ROUND((ABS(cc.b - cc.c) - 1) * (ABS(cc.b - cc.c) - 1) * 1.0
        / NULLIF(cc.b + cc.c, 0), 6) AS chi2_corrected,
    ROUND(LEAST(1.0, 2.0 * (SELECT tail FROM exact)), 6) AS p_exact
FROM cells cc""",
)
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes: did each user's
    HIGH-VALUE-error incidence (value >= {MCNEMAR_VALUE}) change
    between the first and second half of the
    observation window (halves split at the integer-microsecond global
    midpoint — engine-identical, the q_did precedent)? Only the
    discordant pairs carry information: chi2 = (b-c)^2/(b+c), the
    continuity-corrected variant, and the EXACT two-sided binomial p
    (2 * P(X <= min(b,c)) at p=1/2, capped at 1) computed in log
    space from the same running-sum log-factorial table as
    q_fisher_exact — the right tool when discordant counts are small
    and the chi-square asymptotics fail.

    Scale: one user-grain conditional-agg pass (partial map-side) to
    four integers; the binomial tail is bounded by the DISCORDANT
    count, not the corpus."""
    import math

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    mn, mx = ev.agg(F.min(us), F.max(us)).first()
    mid = (mn + mx) // 2  # bounded scalar read (two timestamps)
    err = (F.col("event_type") == "error") & (
        F.col("value") >= MCNEMAR_VALUE
    )
    paired = ev.groupBy("user_id").agg(
        F.max(F.when(err & (us < mid), 1).otherwise(0)).alias("x"),
        F.max(F.when(err & (us >= mid), 1).otherwise(0)).alias("y"),
    )
    x1, y1 = F.col("x") == 1, F.col("y") == 1
    a, b, c, d = paired.agg(
        F.sum(F.when(x1 & y1, 1).otherwise(0)).cast("bigint"),
        F.sum(F.when(x1 & ~y1, 1).otherwise(0)).cast("bigint"),
        F.sum(F.when(~x1 & y1, 1).otherwise(0)).cast("bigint"),
        F.sum(F.when(~x1 & ~y1, 1).otherwise(0)).cast("bigint"),
    ).first()
    m = b + c
    lf = [0.0]
    for i in range(1, m + 1):
        lf.append(lf[-1] + math.log(i))
    tail = sum(
        math.exp(lf[m] - lf[i] - lf[m - i] - m * math.log(2.0))
        for i in range(0, min(b, c) + 1)
    )
    chi2 = (b - c) ** 2 / m if m else None
    chi2c = (abs(b - c) - 1) ** 2 / m if m else None
    out = spark.createDataFrame(
        [(a, b, c, d)], "a bigint, b bigint, c bigint, d bigint"
    )
    return out.select(
        "a",
        "b",
        "c",
        "d",
        F.round(F.lit(chi2), 6).alias("chi2"),
        F.round(F.lit(chi2c), 6).alias("chi2_corrected"),
        F.round(F.least(F.lit(1.0), F.lit(2.0 * tail)), 6).alias("p_exact"),
    )


COX_ROUNDS = 4


def _cox_oracle() -> str:
    """Unrolled {COX_ROUNDS}-round Newton ascent on the Breslow partial
    likelihood (1 covariate), MATERIALIZED CTE chain per round (the
    q_pagerank precedent: materialization is load-bearing — inlined,
    each round's reference to the previous beta re-evaluates the whole
    prefix and the oracle goes exponential)."""
    desc_cum = (
        "ORDER BY duration DESC ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW"
    )
    # _LIFE_TABLE_CTES ends "life AS ( ... )": keep the chain whole —
    # the unused rollup/life CTEs are pruned by the optimizer.
    parts = [_LIFE_TABLE_CTES.lstrip()]
    parts.append(
        """xcov AS MATERIALIZED (
    SELECT user_id,
        SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 1.0
            / COUNT(*) AS x
    FROM events GROUP BY user_id
)"""
    )
    parts.append(
        """cox_users AS MATERIALIZED (
    SELECT s.duration, s.observed, x.x
    FROM spells s JOIN xcov x USING (user_id)
)"""
    )
    parts.append("b0 AS MATERIALIZED (SELECT 0.0 AS b)")
    for r in range(COX_ROUNDS + 1):
        parts.append(
            f"""s{r} AS MATERIALIZED (
    SELECT duration,
        SUM(EXP((SELECT b FROM b{r}) * x)) AS s0,
        SUM(x * EXP((SELECT b FROM b{r}) * x)) AS s1,
        SUM(x * x * EXP((SELECT b FROM b{r}) * x)) AS s2,
        CAST(SUM(observed) AS BIGINT) AS d,
        SUM(CASE WHEN observed = 1 THEN x ELSE 0.0 END) AS sx
    FROM cox_users GROUP BY duration
)"""
        )
        parts.append(
            f"""c{r} AS MATERIALIZED (
    SELECT duration, d, sx,
        SUM(s0) OVER ({desc_cum}) AS rs0,
        SUM(s1) OVER ({desc_cum}) AS rs1,
        SUM(s2) OVER ({desc_cum}) AS rs2
    FROM s{r}
)"""
        )
        parts.append(
            f"""ui{r} AS MATERIALIZED (
    SELECT SUM(sx - d * rs1 / rs0) AS u,
        SUM(d * (rs2 / rs0 - (rs1 / rs0) * (rs1 / rs0))) AS i
    FROM c{r} WHERE d > 0
)"""
        )
        if r < COX_ROUNDS:
            parts.append(
                f"""b{r + 1} AS MATERIALIZED (
    SELECT (SELECT b FROM b{r})
         + (SELECT u FROM ui{r}) / (SELECT i FROM ui{r}) AS b
)"""
            )
    R = COX_ROUNDS
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST((SELECT COUNT(*) FROM cox_users) AS BIGINT) AS n_users,
    CAST((SELECT SUM(observed) FROM cox_users) AS BIGINT) AS n_events,
    ROUND((SELECT b FROM b{R}), 6) AS beta,
    ROUND(EXP((SELECT b FROM b{R})), 6) AS hazard_ratio,
    ROUND(1.0 / SQRT((SELECT i FROM ui{R})), 6) AS se,
    ROUND((SELECT b FROM b{R}) * SQRT((SELECT i FROM ui{R})), 6) AS z,
    ROUND(ABS((SELECT u FROM ui{R})), 6) AS final_score_abs"""
    )


@query("q_cox_regression", oracle=_cox_oracle())
def q_cox_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox proportional-hazards regression (Breslow ties) on the
    view->purchase conversion spell, one covariate: the user's
    error-event ratio. Completes the survival family — q_kaplan_meier /
    q_nelson_aalen DESCRIBE the hazard, Cox EXPLAINS it with a
    covariate effect (hazard ratio + Wald z). {COX_ROUNDS} fixed
    Newton rounds from beta=0 on the partial likelihood; se evaluated
    at the final beta, and the final |score| is emitted so convergence
    is part of the hash gate.

    Scale: per round, the user-grain frame reduces to a per-DURATION
    rollup of five sufficient statistics (one partial-agg exchange);
    the risk-set sums are descending cumulative windows over the
    distinct-duration table (days — bounded at any corpus size), and
    only two scalars (U, I) reach the driver per round — the
    q_logreg_newton discipline applied to censored survival data."""
    ev = load_table(spark, sf_dir, "events")
    xcov = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            )
            * 1.0
            / F.count("*")
        ).alias("x")
    )
    users = (
        _user_spells(spark, sf_dir)
        .join(xcov, "user_id")
        .select("duration", "observed", "x")
        .localCheckpoint()
    )
    wdesc = Window.orderBy(F.desc("duration")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    b = 0.0
    U = I = None
    for r in range(COX_ROUNDS + 1):
        e = F.exp(F.lit(b) * F.col("x"))
        s = users.groupBy("duration").agg(
            F.sum(e).alias("s0"),
            F.sum(F.col("x") * e).alias("s1"),
            F.sum(F.col("x") * F.col("x") * e).alias("s2"),
            F.sum("observed").cast("bigint").alias("d"),
            F.sum(
                F.when(F.col("observed") == 1, F.col("x")).otherwise(0.0)
            ).alias("sx"),
        )
        c = s.select(
            "duration",
            "d",
            "sx",
            F.sum("s0").over(wdesc).alias("rs0"),
            F.sum("s1").over(wdesc).alias("rs1"),
            F.sum("s2").over(wdesc).alias("rs2"),
        )
        U, I = (
            c.filter(F.col("d") > 0)
            .agg(
                F.sum(
                    F.col("sx") - F.col("d") * F.col("rs1") / F.col("rs0")
                ),
                F.sum(
                    F.col("d")
                    * (
                        F.col("rs2") / F.col("rs0")
                        - (F.col("rs1") / F.col("rs0"))
                        * (F.col("rs1") / F.col("rs0"))
                    )
                ),
            )
            .first()
        )
        if r < COX_ROUNDS:
            b += U / I
    n_users, n_events = users.agg(
        F.count("*").cast("bigint"), F.sum("observed").cast("bigint")
    ).first()
    import math

    out = spark.createDataFrame(
        [(n_users, n_events)], "n_users bigint, n_events bigint"
    )
    return out.select(
        "n_users",
        "n_events",
        F.round(F.lit(b), 6).alias("beta"),
        F.round(F.lit(math.exp(b)), 6).alias("hazard_ratio"),
        F.round(F.lit(1.0 / math.sqrt(I)), 6).alias("se"),
        F.round(F.lit(b * math.sqrt(I)), 6).alias("z"),
        F.round(F.lit(abs(U)), 6).alias("final_score_abs"),
    )


# Integer event-count split for the log-rank arms: an integer threshold
# cannot suffer cross-engine float-boundary flips the way a
# mean/median-of-double split could.
LOGRANK_EVENT_CUT = 60


@query(
    "q_logrank_test",
    oracle="WITH "
    + _LIFE_TABLE_CTES.lstrip().split("rollup AS (")[0].rstrip().rstrip(",")
    + f""",
grp AS MATERIALIZED (
    SELECT user_id,
        CASE WHEN COUNT(*) > {LOGRANK_EVENT_CUT} THEN 1 ELSE 0 END AS g
    FROM events GROUP BY user_id
), gs AS MATERIALIZED (
    SELECT s.duration, s.observed, g.g
    FROM spells s JOIN grp g USING (user_id)
), lt AS MATERIALIZED (
    SELECT duration,
        CAST(SUM(CASE WHEN g = 1 THEN observed ELSE 0 END) AS BIGINT) AS d1,
        CAST(SUM(observed) AS BIGINT) AS d,
        CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
        CAST(COUNT(*) AS BIGINT) AS r
    FROM gs GROUP BY duration
), risk AS MATERIALIZED (
    SELECT duration, d1, d,
        SUM(r1) OVER (ORDER BY duration DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1,
        SUM(r) OVER (ORDER BY duration DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
    FROM lt
)
SELECT
    CAST(SUM(d1) AS BIGINT) AS observed_1,
    ROUND(SUM(d * n1 * 1.0 / n), 6) AS expected_1,
    ROUND(SUM(CASE WHEN n > 1
        THEN d * (n1 * 1.0 / n) * (1 - n1 * 1.0 / n) * (n - d) / (n - 1)
        ELSE 0 END), 6) AS variance,
    ROUND(POW(SUM(d1) - SUM(d * n1 * 1.0 / n), 2)
        / NULLIF(SUM(CASE WHEN n > 1
            THEN d * (n1 * 1.0 / n) * (1 - n1 * 1.0 / n) * (n - d) / (n - 1)
            ELSE 0 END), 0), 6) AS chi2
FROM risk WHERE d > 0""",
)
def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test comparing the view->purchase survival
    curves of two user arms (high- vs low-activity: total events >
    {LOGRANK_EVENT_CUT} — an INTEGER split, immune to the float-boundary
    flips a mean-of-double split could suffer cross-engine). At each
    event time: observed arm-1 deaths vs the hypergeometric expectation
    d * n1/n and variance d (n1/n)(1-n1/n)(n-d)/(n-1); chi2 =
    (O-E)^2/V. The inference companion to q_kaplan_meier (which draws
    the curves this test compares) and q_cox_regression (whose score
    test at beta=0 this equals for a binary covariate).

    Scale: the corpus reduces to the per-duration two-arm life table
    (one partial-agg exchange); at-risk counts are descending cumsums
    over the distinct-duration table; the test statistic is one
    conditional aggregate — the Mann-Whitney rollup discipline applied
    to censored data."""
    ev = load_table(spark, sf_dir, "events")
    grp = ev.groupBy("user_id").agg(
        F.when(F.count("*") > LOGRANK_EVENT_CUT, 1).otherwise(0).alias("g")
    )
    gs = (
        _user_spells(spark, sf_dir)
        .join(grp, "user_id")
        .select("duration", "observed", "g")
    )
    lt = gs.groupBy("duration").agg(
        F.sum(F.when(F.col("g") == 1, F.col("observed")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum("observed").cast("bigint").alias("d"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("r1"),
        F.count("*").cast("bigint").alias("r"),
    )
    wdesc = Window.orderBy(F.desc("duration")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = lt.select(
        "duration",
        "d1",
        "d",
        F.sum("r1").over(wdesc).alias("n1"),
        F.sum("r").over(wdesc).alias("n"),
    ).filter(F.col("d") > 0)
    p1 = F.col("n1") * 1.0 / F.col("n")
    vterm = F.when(
        F.col("n") > 1,
        F.col("d") * p1 * (1 - p1) * (F.col("n") - F.col("d"))
        / (F.col("n") - 1),
    ).otherwise(0.0)
    return risk.agg(
        F.sum("d1").cast("bigint").alias("observed_1"),
        F.round(F.sum(F.col("d") * p1), 6).alias("expected_1"),
        F.round(F.sum(vterm), 6).alias("variance"),
        F.round(
            F.pow(F.sum("d1") - F.sum(F.col("d") * p1), F.lit(2.0))
            / F.nullif(F.sum(vterm), F.lit(0.0)),
            6,
        ).alias("chi2"),
    )


@query(
    "q_cmh_test",
    oracle=f"""
WITH tier AS MATERIALIZED (
    SELECT user_id,
        CASE WHEN COUNT(*) > {LOGRANK_EVENT_CUT} THEN 1 ELSE 0 END AS k
    FROM events GROUP BY user_id
), flagged AS MATERIALIZED (
    SELECT t.k,
        ((CAST(FLOOR(epoch_us(e.ts) / 86400000000) AS BIGINT) + 4) % 7)
            IN (0, 6) AS wk,
        e.event_type = 'error' AS err
    FROM events e JOIN tier t USING (user_id)
), strata AS MATERIALIZED (
    SELECT k,
        CAST(SUM(CASE WHEN wk AND err THEN 1 ELSE 0 END) AS DOUBLE) AS a,
        CAST(SUM(CASE WHEN wk AND NOT err THEN 1 ELSE 0 END) AS DOUBLE) AS b,
        CAST(SUM(CASE WHEN NOT wk AND err THEN 1 ELSE 0 END) AS DOUBLE) AS c,
        CAST(SUM(CASE WHEN NOT wk AND NOT err THEN 1 ELSE 0 END) AS DOUBLE)
            AS d,
        CAST(COUNT(*) AS DOUBLE) AS n
    FROM flagged GROUP BY k
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
    ROUND(POW(ABS(SUM(a - (a + b) * (a + c) / n)) - 0.5, 2)
        / SUM((a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))), 6)
        AS chi2_cmh,
    ROUND(SUM(a * d / n) / NULLIF(SUM(b * c / n), 0), 6) AS or_mh
FROM strata""",
)
def q_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test of the weekend x error association
    STRATIFIED by user-activity tier (the q_logrank_test integer split)
    — the confounder-adjusted complement of q_chi_squared /
    q_fisher_exact: a marginal association can be pure Simpson's
    paradox if activity drives both weekend presence and error rates;
    CMH pools the per-stratum evidence instead. Continuity-corrected
    chi2 = (|sum(a_k - E_k)| - 0.5)^2 / sum(V_k) with the
    hypergeometric E/V per stratum, plus the Mantel-Haenszel common
    odds ratio sum(a d/n)/sum(b c/n).

    Scale: one user-grain pass for the tier, one corpus pass to the
    2 x 2 x strata cell rollup (conditional aggregates, map-side
    partial), then arithmetic over |strata| rows."""
    ev = load_table(spark, sf_dir, "events")
    tier = ev.groupBy("user_id").agg(
        F.when(F.count("*") > LOGRANK_EVENT_CUT, 1).otherwise(0).alias("k")
    )
    epoch_day = F.floor(F.unix_micros("ts") / 86400000000.0).cast("bigint")
    wk = ((epoch_day + 4) % 7).isin(0, 6)
    err = F.col("event_type") == "error"
    strata = (
        ev.join(tier, "user_id")
        .groupBy("k")
        .agg(
            F.sum(F.when(wk & err, 1).otherwise(0))
            .cast("double")
            .alias("a"),
            F.sum(F.when(wk & ~err, 1).otherwise(0))
            .cast("double")
            .alias("b"),
            F.sum(F.when(~wk & err, 1).otherwise(0))
            .cast("double")
            .alias("c"),
            F.sum(F.when(~wk & ~err, 1).otherwise(0))
            .cast("double")
            .alias("d"),
            F.count("*").cast("double").alias("n"),
        )
    )
    a, b, c, d, n = (F.col(x) for x in "abcdn")
    e_k = (a + b) * (a + c) / n
    v_k = (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    return strata.agg(
        F.count("*").cast("bigint").alias("n_strata"),
        F.round(
            F.pow(F.abs(F.sum(a - e_k)) - 0.5, F.lit(2.0)) / F.sum(v_k), 6
        ).alias("chi2_cmh"),
        F.round(
            F.sum(a * d / n) / F.nullif(F.sum(b * c / n), F.lit(0.0)), 6
        ).alias("or_mh"),
    )
