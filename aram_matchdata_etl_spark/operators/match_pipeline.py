"""The flagship query: per-match player performance ranking.

Re-expresses the reference's extract→feature→label pipeline
(/root/reference/transformer/ranking/data_extractor.py:42-93 and
feature_factory.py:24-143) as ONE lazy DataFrame plan:

    parquet scan (filters pushed) → narrow feature expressions →
    window SUM (team deaths) → score expression → window RANK

The reference iterates Mongo documents in Python, building dicts row by
row; here every formula is a native column expression inside whole-stage
codegen, the per-team death aggregate is a window SUM instead of a
hand-rolled dict join-back (data_extractor.py:76-81 +
feature_factory.py:57-60), and the label rank is `RANK() OVER` matching
pandas ``rank(method='min', ascending=False)`` (feature_factory.py:139-143).

Scale: the only wide exchange is a single hash partition on
(match_id) — both windows (team-deaths and rank) share the match_id
prefix, so Spark reuses one Exchange for both sorts. At 100 TB match_id is
high-cardinality and uniform (10 rows per key), so there is no skew and
the plan parallelizes to any executor count.

Expression order is kept IDENTICAL between the DataFrame code and the
DuckDB oracle SQL so float results are bit-equal (no rounding needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.match_view import oracle_player_base_cte, player_base

# ---------------------------------------------------------------------------
# Shared oracle CTE fragments (DuckDB + ANSI; also valid Spark SQL).
# ---------------------------------------------------------------------------

_FILTERED_CTE = """
filtered AS (
    SELECT * FROM player_base
    WHERE game_mode = 'ARAM' AND game_duration >= 300
)"""

_FEAT_CTE = """
teamed AS (
    SELECT f.*, SUM(deaths) OVER (PARTITION BY match_id, team_id) AS team_deaths
    FROM filtered f
),
feat AS (
    SELECT
        match_id, puuid, champion, team_id, win,
        (kills + assists) / GREATEST(deaths, 1)                        AS kda,
        kills, deaths, assists,
        total_damage_to_champions / (game_duration / 60.0)             AS damage_per_min,
        total_damage_taken / (game_duration / 60.0)                    AS damage_taken_per_min,
        damage_self_mitigated / (game_duration / 60.0)                 AS damage_mitigated_per_min,
        COALESCE(team_damage_percentage, 0.0)                          AS total_damage_share,
        gold_earned / (game_duration / 60.0)                           AS gold_per_min,
        total_minions_killed / (game_duration / 60.0)                  AS cs_per_min,
        time_ccing_others                                              AS cc_time,
        total_heals_on_teammates + total_damage_shielded_on_teammates  AS heal_shield_given,
        COALESCE(kill_participation, 0.0)                              AS kill_participation,
        deaths / GREATEST(team_deaths, 1)                              AS death_share,
        longest_time_spent_living                                      AS longest_time_alive,
        items_purchased,
        COALESCE(skillshots_hit, 0)                                    AS skill_shots_hit,
        COALESCE(skillshots_dodged, 0)                                 AS skill_shots_dodged,
        game_duration / 60.0                                           AS game_duration_min,
        row_uid
    FROM teamed
),
eff AS (
    SELECT *,
        CASE WHEN gold_per_min > 0
             THEN (damage_per_min + damage_taken_per_min) / gold_per_min
             ELSE 0.0 END AS gold_efficiency
    FROM feat
),
scored AS (
    SELECT *,
        kda * 0.25
          + damage_per_min / 1000 * 0.20
          + kill_participation * 0.15
          + gold_per_min / 500 * 0.10
          + (1 - death_share) * 0.15
          + gold_efficiency * 0.15 AS base_score
    FROM eff
),
labeled AS (
    SELECT *,
        CASE WHEN win THEN base_score * 1.1 ELSE base_score END AS performance_score
    FROM scored
)"""

_FLAGSHIP_COLS = """
    match_id, puuid, champion, team_id, win, kda, kills, deaths, assists,
    damage_per_min, damage_taken_per_min, damage_mitigated_per_min,
    total_damage_share, gold_per_min, cs_per_min, cc_time, heal_shield_given,
    kill_participation, death_share, longest_time_alive, items_purchased,
    gold_efficiency, skill_shots_hit, skill_shots_dodged, game_duration_min,
    performance_score"""


def _oracle(body: str) -> str:
    return oracle_player_base_cte() + "," + _FILTERED_CTE + "," + _FEAT_CTE + body


# ---------------------------------------------------------------------------
# DataFrame-API implementation (the product code).
# ---------------------------------------------------------------------------


def filtered_players(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference scan predicates: gameMode == 'ARAM' AND gameDuration >= 300
    (data_extractor.py:52-55). Catalyst pushes both into the parquet scan of
    the underlying events columns where possible."""
    return player_base(spark, sf_dir).filter(
        (F.col("game_mode") == "ARAM") & (F.col("game_duration") >= 300)
    )


def player_features(df: DataFrame) -> DataFrame:
    """Silver player-feature rows — formulas from feature_factory.py:24-107.

    team_deaths is a window SUM over (match_id, team_id): same exchange as
    the later per-match rank window, so the whole pipeline costs ONE
    shuffle.
    """
    team_w = Window.partitionBy("match_id", "team_id")
    dur_min = F.col("game_duration") / F.lit(60.0)
    # ONE shuffle for the whole pipeline: hash-partitioning on match_id
    # co-locates every (match_id, team_id) group too (subset clustering),
    # so both this window and the downstream per-match rank window reuse
    # this single exchange instead of shuffling twice (verified by
    # tests/test_plans.py::test_flagship_single_exchange).
    df = df.repartition("match_id")
    df = df.withColumn("team_deaths", F.sum("deaths").over(team_w))
    df = df.select(
        "match_id",
        "puuid",
        "champion",
        "team_id",
        "win",
        ((F.col("kills") + F.col("assists")) / F.greatest(F.col("deaths"), F.lit(1))).alias("kda"),
        "kills",
        "deaths",
        "assists",
        (F.col("total_damage_to_champions") / dur_min).alias("damage_per_min"),
        (F.col("total_damage_taken") / dur_min).alias("damage_taken_per_min"),
        (F.col("damage_self_mitigated") / dur_min).alias("damage_mitigated_per_min"),
        F.coalesce(F.col("team_damage_percentage"), F.lit(0.0)).alias("total_damage_share"),
        (F.col("gold_earned") / dur_min).alias("gold_per_min"),
        (F.col("total_minions_killed") / dur_min).alias("cs_per_min"),
        F.col("time_ccing_others").alias("cc_time"),
        (F.col("total_heals_on_teammates") + F.col("total_damage_shielded_on_teammates")).alias(
            "heal_shield_given"
        ),
        F.coalesce(F.col("kill_participation"), F.lit(0.0)).alias("kill_participation"),
        (F.col("deaths") / F.greatest(F.col("team_deaths"), F.lit(1))).alias("death_share"),
        F.col("longest_time_spent_living").alias("longest_time_alive"),
        "items_purchased",
        F.coalesce(F.col("skillshots_hit"), F.lit(0)).alias("skill_shots_hit"),
        F.coalesce(F.col("skillshots_dodged"), F.lit(0)).alias("skill_shots_dodged"),
        dur_min.alias("game_duration_min"),
        "row_uid",
    )
    # gold_efficiency guard: feature_factory.py:96 — 0 when gpm == 0.
    return df.withColumn(
        "gold_efficiency",
        F.when(
            F.col("gold_per_min") > 0,
            (F.col("damage_per_min") + F.col("damage_taken_per_min")) / F.col("gold_per_min"),
        ).otherwise(F.lit(0.0)),
    )


def performance_scored(df: DataFrame) -> DataFrame:
    """Weighted label score — feature_factory.py:121-135, exact weights and
    term order; 1.1x multiplicative win boost."""
    base = (
        F.col("kda") * 0.25
        + F.col("damage_per_min") / 1000 * 0.20
        + F.col("kill_participation") * 0.15
        + F.col("gold_per_min") / 500 * 0.10
        + (F.lit(1) - F.col("death_share")) * 0.15
        + F.col("gold_efficiency") * 0.15
    )
    df = df.withColumn("base_score", base)
    return df.withColumn(
        "performance_score",
        F.when(F.col("win"), F.col("base_score") * 1.1).otherwise(F.col("base_score")),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scan → filter → features → score → per-match RANK (the full silver
    table, one row per (match_id, puuid))."""
    df = performance_scored(player_features(filtered_players(spark, sf_dir)))
    rank_w = Window.partitionBy("match_id").orderBy(F.desc("performance_score"))
    out_cols = [c.strip() for c in _FLAGSHIP_COLS.replace("\n", " ").split(",")]
    return df.withColumn("rank_in_match", F.rank().over(rank_w)).select(
        *out_cols, "rank_in_match"
    )


# ---------------------------------------------------------------------------
# Registry entries.
# ---------------------------------------------------------------------------


@query(
    "q_player_rank",
    oracle=_oracle(
        f"""
SELECT {_FLAGSHIP_COLS},
    CAST(RANK() OVER (PARTITION BY match_id ORDER BY performance_score DESC) AS INTEGER) AS rank_in_match
FROM labeled"""
    ),
)
def q_player_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full silver table — scan → filter → 23 feature
    expressions → windowed team-deaths → weighted score → per-match RANK,
    in one plan with a single exchange on match_id (module docstring)."""
    return flagship(spark, sf_dir)


@query(
    "q_window_rank",
    oracle=_oracle(
        """
SELECT match_id, puuid, performance_score,
    CAST(RANK() OVER (PARTITION BY match_id ORDER BY performance_score DESC) AS INTEGER)
        AS rank_in_match
FROM labeled"""
    ),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: RANK with tie pooling — pandas rank(method='min', ascending=False)
    (feature_factory.py:139-143)."""
    df = performance_scored(player_features(filtered_players(spark, sf_dir)))
    w = Window.partitionBy("match_id").orderBy(F.desc("performance_score"))
    return df.select(
        "match_id", "puuid", "performance_score", F.rank().over(w).alias("rank_in_match")
    )


@query(
    "q_window_row_number",
    oracle=_oracle(
        """
SELECT match_id, puuid, performance_score,
    CAST(ROW_NUMBER() OVER (
        PARTITION BY match_id ORDER BY performance_score DESC, puuid, row_uid
    ) AS INTEGER) AS pred_rank
FROM labeled"""
    ),
)
def q_window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: ordinal rank, ties broken positionally — the reference's
    argsort-of-argsort (modeling.py:202-212). Deterministic tie-break on
    (puuid, row_uid) replaces numpy's arbitrary order (SURVEY §7 risk)."""
    df = performance_scored(player_features(filtered_players(spark, sf_dir)))
    w = Window.partitionBy("match_id").orderBy(
        F.desc("performance_score"), F.col("puuid"), F.col("row_uid")
    )
    return df.select(
        "match_id", "puuid", "performance_score", F.row_number().over(w).alias("pred_rank")
    )


@query(
    "q_window_sum",
    oracle=oracle_player_base_cte()
    + ","
    + _FILTERED_CTE
    + """
SELECT match_id, team_id, puuid, deaths,
    CAST(SUM(deaths) OVER (PARTITION BY match_id, team_id) AS BIGINT) AS team_deaths
FROM filtered""",
)
def q_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: windowed sum (the join-back alternative, data_extractor.py:76-81)."""
    df = filtered_players(spark, sf_dir)
    w = Window.partitionBy("match_id", "team_id")
    return df.select(
        "match_id", "team_id", "puuid", "deaths", F.sum("deaths").over(w).alias("team_deaths")
    )


@query(
    "q_groupjoin_deathshare",
    oracle=oracle_player_base_cte()
    + ","
    + _FILTERED_CTE
    + """,
td AS (
    SELECT match_id, team_id, SUM(deaths) AS team_deaths
    FROM filtered GROUP BY match_id, team_id
)
SELECT f.match_id, f.puuid, f.team_id, f.deaths,
    f.deaths / GREATEST(td.team_deaths, 1) AS death_share
FROM filtered f JOIN td ON f.match_id = td.match_id AND f.team_id = td.team_id""",
)
def q_groupjoin_deathshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 expressed literally as aggregate + join-back (the reference's
    team_deaths dict probe, feature_factory.py:57-60). The window form
    (q_window_sum) is the shuffle-cheaper plan; this key demonstrates the
    explicit groupBy+join strategy."""
    df = filtered_players(spark, sf_dir)
    td = df.groupBy("match_id", "team_id").agg(F.sum("deaths").alias("team_deaths"))
    return (
        df.join(td, ["match_id", "team_id"])
        .select(
            "match_id",
            "puuid",
            "team_id",
            "deaths",
            (F.col("deaths") / F.greatest(F.col("team_deaths"), F.lit(1))).alias("death_share"),
        )
    )


@query(
    "q_champion_stats",
    oracle=_oracle(
        """
SELECT champion,
    COUNT(*) AS games,
    AVG(CASE WHEN win THEN 1.0 ELSE 0.0 END) AS win_rate,
    ROUND(AVG(performance_score), 4) AS avg_score,
    ROUND(AVG(kda), 4) AS avg_kda
FROM labeled GROUP BY champion"""
    ),
)
def q_champion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The domain's headline aggregate: per-champion games / win rate /
    average performance — the query an ARAM balance analyst runs over the
    silver table (the reference prints per-cohort variants of this,
    test_labeling.py:79-89)."""
    df = performance_scored(player_features(filtered_players(spark, sf_dir)))
    return df.groupBy("champion").agg(
        F.count("*").alias("games"),
        F.avg(F.when(F.col("win"), 1.0).otherwise(0.0)).alias("win_rate"),
        F.round(F.avg("performance_score"), 4).alias("avg_score"),
        F.round(F.avg("kda"), 4).alias("avg_kda"),
    )


@query(
    "q_derived_features",
    oracle=_oracle(
        """
SELECT match_id, puuid,
    (kills + assists * 0.5) / game_duration_min            AS aggression_index,
    longest_time_alive / (game_duration_min * 60)          AS survival_index,
    kill_participation * 0.4 + total_damage_share * 0.4
        + (1 - death_share) * 0.2                          AS team_contribution,
    damage_per_min
        / (CASE WHEN damage_taken_per_min = 0 THEN 1
                ELSE damage_taken_per_min END)             AS combat_efficiency
FROM labeled"""
    ),
)
def q_derived_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived gold-layer features — feature_factory.py:210-227 (aggression /
    survival / team-contribution / combat-efficiency indices)."""
    df = performance_scored(player_features(filtered_players(spark, sf_dir)))
    return df.select(
        "match_id",
        "puuid",
        ((F.col("kills") + F.col("assists") * 0.5) / F.col("game_duration_min")).alias(
            "aggression_index"
        ),
        (F.col("longest_time_alive") / (F.col("game_duration_min") * 60)).alias("survival_index"),
        (
            F.col("kill_participation") * 0.4
            + F.col("total_damage_share") * 0.4
            + (F.lit(1) - F.col("death_share")) * 0.2
        ).alias("team_contribution"),
        (
            F.col("damage_per_min")
            / F.when(F.col("damage_taken_per_min") == 0, F.lit(1)).otherwise(
                F.col("damage_taken_per_min")
            )
        ).alias("combat_efficiency"),
    )
