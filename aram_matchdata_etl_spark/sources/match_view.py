"""Deterministic match-shaped view over the ``events`` fixture.

The reference's analytics run over ARAM match documents: 10 participants
per match, two teams of five, one winning team, per-participant combat
counters, a nullable ``challenges`` struct
(/root/reference/transformer/ranking/data_extractor.py:52-91,
feature_factory.py:24-107). The driver fixtures don't ship a match table,
so — per FIXTURES.md §3 — we derive one deterministically from ``events``:
every event row becomes one participant row, 10 consecutive ``event_id``s
form one match.

The mapping is defined ONCE as ``PLAYER_BASE_SQL``, a dialect-neutral SQL
string executed verbatim by BOTH Spark SQL and the DuckDB oracle, so the
two engines cannot drift (identical integer/float expression order ⇒
bit-identical values, no rounding needed downstream).

Design notes mirroring FIXTURES.md §1/§4:
  - ~10% CLASSIC matches and some <300 s matches so both reference filters
    (gameMode == 'ARAM', gameDuration >= 300) visibly drop rows.
  - challenges.* fields are NULL on deterministic strides — exercises the
    reference's ``.get(..., 0)`` default path as ``coalesce``.
  - every 50th match has identical stats for all 10 players (two distinct
    performance scores, one per team) — pins RANK tie-pooling
    (feature_factory.py:139-143) vs ROW_NUMBER (modeling.py:202-212).
  - some ``gold_earned`` are 0 — exercises the ``gpm > 0`` guard
    (feature_factory.py:96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table

# Valid in BOTH Spark SQL and DuckDB. Only dialect-shared constructs:
# CAST/FLOOR/CONCAT/LPAD/CASE, BIGINT % arithmetic, '/' (always double for
# int operands in both engines). FLOOR is spelled explicitly because the
# engines disagree on CAST(double AS BIGINT) (Spark truncates, DuckDB
# rounds).
PLAYER_BASE_SQL = """
WITH base AS (
    SELECT
        CAST(FLOOR(event_id / 10) AS BIGINT) AS match_num,
        CAST(event_id % 10 AS INT)           AS slot,
        event_id,
        user_id,
        event_type,
        value
    FROM events
),
tb AS (
    -- every 50th match: per-match-constant keys => all-tied player stats
    SELECT
        base.*,
        CASE WHEN match_num % 50 = 0
             THEN CAST(match_num * 10 + 5 AS BIGINT)
             ELSE event_id END AS vkey,
        CASE WHEN match_num % 50 = 0 THEN 5.0 ELSE value END AS vval
    FROM base
)
SELECT
    CONCAT('M', LPAD(CAST(match_num AS STRING), 6, '0'))  AS match_id,
    match_num,
    event_id                                              AS row_uid,
    CONCAT('P', CAST(user_id AS STRING))                  AS puuid,
    CONCAT(event_type, '_', CAST(user_id % 6 AS STRING))  AS champion,
    CAST(CASE WHEN slot < 5 THEN 100 ELSE 200 END AS INT) AS team_id,
    (slot < 5) = (match_num % 2 = 0)                      AS win,
    CAST(vkey % 26 AS INT)                                AS kills,
    CAST((vkey * 7 + 3) % 16 AS INT)                      AS deaths,
    CAST((vkey * 13) % 41 AS INT)                         AS assists,
    CAST(FLOOR(1000 + vval * 5000) AS BIGINT)             AS total_damage_to_champions,
    CAST(FLOOR(800 + vval * 4000) AS BIGINT)              AS total_damage_taken,
    CAST(FLOOR(vval * 3000) AS BIGINT)                    AS damage_self_mitigated,
    CASE WHEN vkey % 97 = 0 THEN CAST(0 AS BIGINT)
         ELSE CAST(FLOOR(3000 + vval * 900) AS BIGINT) END AS gold_earned,
    CAST((vkey * 3) % 121 AS INT)                         AS total_minions_killed,
    CAST(vkey % 121 AS INT)                               AS time_ccing_others,
    CAST(FLOOR(vval * 800) AS BIGINT)                     AS total_heals_on_teammates,
    CAST(FLOOR(vval * 700) AS BIGINT)                     AS total_damage_shielded_on_teammates,
    CAST((vkey * 11) % 1200 AS INT)                       AS longest_time_spent_living,
    CAST(vkey % 41 AS INT)                                AS items_purchased,
    CASE WHEN vkey % 7 = 0 THEN NULL
         ELSE ((vkey * 17) % 101) / CAST(100 AS DOUBLE) END AS kill_participation,
    CASE WHEN vkey % 11 = 0 THEN NULL
         ELSE ((vkey * 19) % 101) / CAST(100 AS DOUBLE) END AS team_damage_percentage,
    CASE WHEN vkey % 13 = 0 THEN NULL
         ELSE CAST((vkey * 23) % 201 AS INT) END          AS skillshots_hit,
    CASE WHEN vkey % 17 = 0 THEN NULL
         ELSE CAST((vkey * 29) % 201 AS INT) END          AS skillshots_dodged,
    CAST(180 + (match_num * 37) % 2221 AS BIGINT)         AS game_duration,
    CASE WHEN match_num % 10 = 7 THEN 'CLASSIC' ELSE 'ARAM' END AS game_mode,
    CONCAT('15.', CAST(match_num % 20 AS STRING), '.1')   AS game_version
FROM tb
"""


def player_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (match, participant), reference-shaped columns.

    Runs ``PLAYER_BASE_SQL`` over the ``events`` parquet. All expressions
    are narrow (no shuffle); Catalyst fuses them into the scan stage under
    whole-stage codegen, and match-level predicates applied downstream
    still push into the parquet scan.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(PLAYER_BASE_SQL)


def oracle_player_base_cte(alias: str = "player_base") -> str:
    """The same view as a DuckDB CTE fragment: ``WITH <alias> AS (...)``."""
    return f"WITH {alias} AS ({PLAYER_BASE_SQL})"


def matches_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze match DOCUMENTS: the reference's nested Mongo shape
    (SURVEY §1.1 — {match_id, game_*, participants: array<struct x10>})
    rebuilt from the flat view via sort_array(collect_list(struct)).
    sort_array pins participant order (slot asc) because collect_list is
    arrival-ordered, hence nondeterministic under parallelism."""
    from pyspark.sql import functions as F

    pb = player_base(spark, sf_dir)
    participant = F.struct(
        (F.col("row_uid") % 10).cast("int").alias("slot"),
        "puuid",
        "champion",
        "team_id",
        "win",
        "kills",
        "deaths",
        "assists",
        "total_damage_to_champions",
        "gold_earned",
        "kill_participation",
    )
    return (
        pb.groupBy("match_id", "game_mode", "game_duration", "game_version")
        .agg(F.sort_array(F.collect_list(participant)).alias("participants"))
    )


def explode_matches(nested: DataFrame) -> DataFrame:
    """Inverse of matches_nested: the 10-participant fan-out (P5,
    data_extractor.py:84-91) over the true nested document shape."""
    from pyspark.sql import functions as F

    return nested.select(
        "match_id",
        "game_mode",
        "game_duration",
        "game_version",
        F.explode("participants").alias("p"),
    ).select(
        "match_id",
        "game_mode",
        "game_duration",
        "game_version",
        "p.slot",
        "p.puuid",
        "p.champion",
        "p.team_id",
        "p.win",
        "p.kills",
        "p.deaths",
        "p.assists",
        "p.total_damage_to_champions",
        "p.gold_earned",
        "p.kill_participation",
    )
