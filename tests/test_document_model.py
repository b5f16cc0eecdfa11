"""Bronze nested-document model: build the Mongo-shaped match documents
from the flat view and explode them back — lossless round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_nested_roundtrip_is_lossless(spark):
    from aram_matchdata_etl_spark.sources.match_view import (
        explode_matches,
        matches_nested,
        player_base,
    )

    nested = matches_nested(spark, SF_SMOKE)
    # every match document carries exactly 10 participants, 5 per team
    sizes = nested.select(F.size("participants").alias("n")).filter(F.col("n") != 10)
    assert sizes.count() == 0

    flat = explode_matches(nested)
    pb = player_base(spark, SF_SMOKE)
    assert flat.count() == pb.count()
    cols = ["match_id", "puuid", "champion", "team_id", "kills", "deaths", "assists"]
    # multiset equality on the shared columns
    assert (
        flat.select(*cols).exceptAll(pb.select(*cols)).count() == 0
        and pb.select(*cols).exceptAll(flat.select(*cols)).count() == 0
    )


def test_participants_sorted_by_slot(spark):
    from aram_matchdata_etl_spark.sources.match_view import matches_nested

    nested = matches_nested(spark, SF_SMOKE)
    bad = nested.select(
        F.transform(F.col("participants"), lambda p: p["slot"]).alias("slots")
    ).filter(F.col("slots") != F.sequence(F.lit(0), F.lit(9)))
    assert bad.count() == 0
