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


def test_aqe_splits_skewed_join_partition(spark):
    """§4 evidence: AQE's OptimizeSkewedJoin splits the hot key's shuffle
    partition at runtime — the built-in mechanism that complements the
    manual salting patterns (q_join_salted) when skew is discovered, not
    known up front. Asserted on the adaptive final plan ('skew=true') and
    on result equality with the skew-oblivious plan."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")

        fact = _zipfish(spark, n=400_000)
        dim = spark.range(1000).select(
            F.col("id").alias("key"), (F.col("id") * 2.0).alias("w")
        )
        joined = fact.join(dim, "key").agg(
            F.count("*").alias("n"), F.round(F.sum(F.col("v") * F.col("w")), 4).alias("s")
        )
        row = joined.collect()[0]
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]

        # equality with the same join under default (no forced-skew) config
        for k, v in saved.items():
            conf.set(k, v)
        want = fact.join(dim, "key").agg(
            F.count("*").alias("n"), F.round(F.sum(F.col("v") * F.col("w")), 4).alias("s")
        ).collect()[0]
        assert (row.n, row.s) == (want.n, want.s)
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_chunked_zscore_equals_plain(spark):
    """The overlap-chunk z-score must be row-for-row identical to the
    plain per-user window — on the fixture AND on a hot-user shape whose
    timelines cross many chunk boundaries (the case the decomposition
    exists for)."""
    from aram_matchdata_etl_spark.operators.events_analytics import (
        anomaly_zscore,
        anomaly_zscore_chunked,
    )
    from aram_matchdata_etl_spark.sources.tables import load_table

    def as_map(df):
        return {
            r.event_id: (r.user_id, r.zscore, r.is_anomaly)
            for r in df.collect()
        }

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert as_map(anomaly_zscore_chunked(ev, chunk=32)) == as_map(
        anomaly_zscore(ev)
    )

    # hot user 0 owns half the rows -> 25 chunks at chunk=100
    n = 5000
    hot = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(1704067200 + F.col("id") * 60).alias("ts"),
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 37).alias(
            "user_id"
        ),
        ((F.col("id") * 31 % 1000) / 7.0).alias("value"),
    )
    assert as_map(anomaly_zscore_chunked(hot, chunk=100)) == as_map(
        anomaly_zscore(hot)
    )


def test_chunked_zscore_rejects_undersized_chunk(spark):
    import pytest as _pytest

    from aram_matchdata_etl_spark.operators.events_analytics import (
        anomaly_zscore_chunked,
    )

    ev = spark.range(1).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(0)).alias("ts"),
        F.lit(0).alias("user_id"),
        F.lit(0.0).alias("value"),
    )
    with _pytest.raises(ValueError):
        anomaly_zscore_chunked(ev, chunk=5)
