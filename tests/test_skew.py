"""Skewed-key semantics: the salted two-stage aggregation must equal the
plain aggregation on a zipf-like key distribution (roadmap #7 — the
fixtures are uniform, so generate the skew)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _zipfish(spark, n=200_000):
    """key 0 owns ~75% of rows, a long tail owns the rest — generated
    deterministically from spark.range (no fixture mutation)."""
    df = spark.range(n)
    key = F.when(F.col("id") % 4 != 0, F.lit(0)).otherwise(
        F.pmod(F.hash("id"), F.lit(1000))
    )
    return df.select(
        key.alias("key"), (F.col("id") % 97).cast("double").alias("v")
    )


def test_salted_agg_equals_plain_on_skew(spark):
    df = _zipfish(spark).cache()
    plain = {
        r.key: (r.n, round(r.s, 4))
        for r in df.groupBy("key")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = (
        df.withColumn("salt", F.pmod(F.hash("v", "key"), F.lit(32)))
        .groupBy("key", "salt")
        .agg(F.count("*").alias("pn"), F.sum("v").alias("ps"))
        .groupBy("key")
        .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
    )
    got = {r.key: (r.n, round(r.s, 4)) for r in salted.collect()}
    df.unpersist()
    assert got == plain
    # the hot key really is hot (the test would be vacuous otherwise)
    hot_n = plain[0][0]
    assert hot_n > 0.7 * sum(n for n, _ in plain.values())
