"""Deterministic stand-in for the reference's Riot REST source
(S3-S6, /root/reference/extractor/riot/match/api.py:7-122 and
extractor/riot/tasks.py:61-164).

The reference crawls a live REST API (100 match ids per user page, batches
of 200 concurrent detail+timeline fetches, <=2,000 ids per 2-minute beat).
For a reproducible engine we model the API as a pure function of its key:
``user_id -> [match ids]`` and ``match_id -> (detail, timeline)`` are
deterministic fakes. The Spark-side plumbing is the real thing:

  - fetches run NOT on the driver but inside ``mapInPandas`` (Arrow
    batches) — the per-partition concurrency slot the reference got from
    asyncio, and where a live httpx client would sit (one client per
    partition, rate limit = maxOffsetsPerTrigger / trigger interval);
  - responses are JSON strings parsed with ``from_json`` against the
    explicit bronze schema (SURVEY §1.3: schema-on-write, fail fast);
  - the detail+timeline merge (J1, tasks.py:119-143) is a full outer join.

At 100 TB scale the same topology holds: the id stream partitions across
executors, each partition fans out its own HTTP batch, and rate limiting
is trigger-level config, not code.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MATCHES_PER_USER = 10  # the reference pages 100; scaled to fixture size


def fake_match_ids(user_id: int, count: int = MATCHES_PER_USER) -> list[str]:
    """Deterministic `GET /matches/by-puuid/{puuid}/ids` (api.py:7-33)."""
    return [f"KR_{(user_id * 37 + i * 13) % 100000:07d}" for i in range(count)]


def fake_match_detail(match_id: str) -> dict[str, Any]:
    """Deterministic `GET /matches/{id}` (api.py:36-59): minimal document
    with the fields the transform layer consumes."""
    seq = int(match_id.split("_")[1])
    participants = [
        {
            "puuid": f"P{(seq * 10 + i * 7) % 997}",
            "teamId": 100 if i < 5 else 200,
            "kills": (seq + i) % 26,
            "deaths": (seq * 3 + i) % 16,
            "assists": (seq * 5 + i) % 41,
            "win": (i < 5) == (seq % 2 == 0),
        }
        for i in range(10)
    ]
    return {
        "metadata": {
            "matchId": match_id,
            "participants": [p["puuid"] for p in participants],
        },
        "info": {
            "gameMode": "ARAM" if seq % 10 != 7 else "CLASSIC",
            "gameDuration": 180 + (seq * 37) % 2221,
            "participants": participants,
        },
    }


def fake_match_timeline(match_id: str) -> dict[str, Any]:
    """Deterministic `GET /matches/{id}/timeline` (api.py:93-122)."""
    seq = int(match_id.split("_")[1])
    return {
        "metadata": {"matchId": match_id},
        "frames": [{"t": i * 60000, "events": (seq + i) % 7} for i in range(5)],
    }


DETAIL_SCHEMA = T.StructType(
    [
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("matchId", T.StringType()),
                    T.StructField("participants", T.ArrayType(T.StringType())),
                ]
            ),
        ),
        T.StructField(
            "info",
            T.StructType(
                [
                    T.StructField("gameMode", T.StringType()),
                    T.StructField("gameDuration", T.LongType()),
                    T.StructField(
                        "participants",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("puuid", T.StringType()),
                                    T.StructField("teamId", T.IntegerType()),
                                    T.StructField("kills", T.IntegerType()),
                                    T.StructField("deaths", T.IntegerType()),
                                    T.StructField("assists", T.IntegerType()),
                                    T.StructField("win", T.BooleanType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def fetch_match_ids(users: DataFrame) -> DataFrame:
    """S3: user ids -> match ids, fanned out per partition (the live
    variant would hold an HTTP client per partition here)."""

    def fan_out(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"user_id": int(u), "match_id": m}
                for u in pdf["user_id"]
                for m in fake_match_ids(int(u))
            ]
            yield pd.DataFrame(rows, columns=["user_id", "match_id"])

    return users.mapInPandas(fan_out, schema="user_id long, match_id string")


def fetch_details(match_ids: DataFrame) -> DataFrame:
    """S4+S5: match id -> (detail_json, timeline_json) as raw strings —
    the wire format; parsing happens downstream with from_json."""
    import json

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["match_id"].drop_duplicates()
            yield pd.DataFrame(
                {
                    "match_id": ids,
                    "detail_json": [json.dumps(fake_match_detail(m)) for m in ids],
                    "timeline_json": [json.dumps(fake_match_timeline(m)) for m in ids],
                }
            )

    return match_ids.mapInPandas(
        fetch, schema="match_id string, detail_json string, timeline_json string"
    )


def bronze_matches(spark: SparkSession, seed_users: list[int]) -> DataFrame:
    """EP2 end-to-end (batch form): seed users -> match ids -> dedup ->
    fetch -> parse -> ARAM filter -> merged bronze documents.
    Mirrors tasks.py:100-157; the streaming form is streaming/crawl.py."""
    users = spark.createDataFrame([(u,) for u in seed_users], "user_id long")
    ids = fetch_match_ids(users).select("match_id").dropDuplicates(["match_id"])
    raw = fetch_details(ids)
    parsed = raw.select(
        "match_id",
        F.from_json("detail_json", DETAIL_SCHEMA).alias("detail"),
        F.col("timeline_json").alias("timeline"),
    )
    return parsed.filter(F.col("detail.info.gameMode") == "ARAM").select(
        "match_id",
        F.col("detail.metadata.participants").alias("participant_puuids"),
        F.col("detail.info.gameDuration").alias("game_duration"),
        F.col("detail.info.participants").alias("participants"),
        "timeline",
    )
