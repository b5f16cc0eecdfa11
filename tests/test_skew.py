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


def _synthetic_sig_sets(spark, n_unique: int, n_hot: int):
    """Per-doc 32-bit hash-set arrays: `n_unique` docs with distinct
    pseudo-random 12-hash sets, plus `n_hot` docs sharing ONE identical
    set (they collide in every band — the degenerate LSH bucket)."""
    uniq = spark.range(n_unique).selectExpr(
        "id AS doc_id",
        "transform(sequence(0, 11), i -> "
        "  cast(conv(substring(md5(concat(cast(id AS string), '_', "
        "  cast(i AS string))), 1, 8), 16, 10) AS bigint)) AS hs",
    )
    hot = spark.range(n_unique, n_unique + n_hot).selectExpr(
        "id AS doc_id",
        "transform(sequence(0, 11), i -> "
        "  cast(conv(substring(md5(concat('hot_', cast(i AS string))), "
        "  1, 8), 16, 10) AS bigint)) AS hs",
    )
    return uniq.unionAll(hot)


def test_lsh_bucket_cap_bounds_hot_bucket_pairs(spark):
    """The 100 TB hot-bucket defense: b near-identical docs put C(b, 2)
    candidate pairs in one (band, bucket). With bucket_cap=C the hot
    contribution drops to <= bands * C(C, 2) while pairs whose docs
    never share an oversized bucket are UNTOUCHED (exactness outside the
    capped bucket, the CF_CAP argument)."""
    from aram_matchdata_etl_spark.operators.dedup import (
        LSH_BANDS,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sets = _synthetic_sig_sets(spark, n_unique=300, n_hot=80)
    sig = minhash_signatures(sets).localCheckpoint()
    cap = 8

    plain = {
        (r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sig).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sig, bucket_cap=cap).collect()
    }
    hot_ids = set(range(300, 380))

    def is_hot(p):
        return p[0] in hot_ids and p[1] in hot_ids

    # the identical 80 docs produce all C(80,2)=3160 pairs uncapped
    assert sum(1 for p in plain if is_hot(p)) == 80 * 79 // 2
    # capped: bounded by bands * C(cap,2) (dedup across bands shrinks it)
    n_hot_capped = sum(1 for p in capped if is_hot(p))
    assert 0 < n_hot_capped <= LSH_BANDS * cap * (cap - 1) // 2
    # pairs not involving the hot set are preserved exactly
    assert {p for p in plain if not is_hot(p)} == {
        p for p in capped if not is_hot(p)
    }
    # default (cap=None) stays the exact, oracle-hashed candidate set
    assert capped <= plain


def test_lsh_bucket_cap_auto_probe(spark):
    """bucket_cap='auto' mirrors connected_components' escalation: a
    one-agg probe of max (band, bucket) membership engages the cap only
    on adversarial corpora. Benign shape → verdict 'not engaged' and the
    candidate set is BIT-IDENTICAL to the exact path (the oracled form);
    hot shape → engaged at AUTO_BUCKET_CAP with the same exactness-
    outside-oversized-buckets guarantee the manual-cap test proves."""
    from aram_matchdata_etl_spark.operators.dedup import (
        AUTO_BUCKET_CAP,
        LSH_TELEMETRY,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    # benign: no bucket anywhere near the threshold
    sig = minhash_signatures(
        _synthetic_sig_sets(spark, n_unique=200, n_hot=3)
    ).localCheckpoint()
    exact = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sig).collect()}
    auto = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sig, bucket_cap="auto", tag="benign").collect()
    }
    assert auto == exact
    t = LSH_TELEMETRY["benign"]
    assert t["cap_engaged"] is False and 3 <= t["max_bucket"] <= AUTO_BUCKET_CAP

    # adversarial: one bucket over the threshold → cap engages by itself
    n_hot = AUTO_BUCKET_CAP + 40
    sig_hot = minhash_signatures(
        _synthetic_sig_sets(spark, n_unique=100, n_hot=n_hot)
    ).localCheckpoint()
    auto_hot = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            sig_hot, bucket_cap="auto", tag="hot"
        ).collect()
    }
    manual_hot = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sig_hot, bucket_cap=AUTO_BUCKET_CAP).collect()
    }
    t = LSH_TELEMETRY["hot"]
    assert t["cap_engaged"] is True and t["max_bucket"] == n_hot
    # the auto path IS the manual-cap path once engaged
    assert auto_hot == manual_hot
    # and it actually bounded the hot blowup below C(n_hot, 2)
    hot_ids = set(range(100, 100 + n_hot))
    n_hot_pairs = sum(
        1 for p in auto_hot if p[0] in hot_ids and p[1] in hot_ids
    )
    assert n_hot_pairs < n_hot * (n_hot - 1) // 2


# --- semdedup hot-cell cap (r12: the LSH bucket-cap analogue) ---------------


def _synthetic_blob_emb(spark, n_spread: int, n_hot: int, d: int = 8):
    """(vec_id, vec, vnorm) frame: n_spread pseudo-random vectors (pair
    cosines scattered) + one blob of n_hot NEAR-identical vectors
    (all-ones plus ~1e-4 deterministic noise — pairwise cosine ~ 1.0,
    the planted semantic-duplicate shape real web embeddings produce).
    k-means puts the whole blob in ONE cell no matter what k is."""
    from aram_matchdata_etl_spark.operators.similarity import norm

    ids = spark.range(n_spread + n_hot, numPartitions=8)
    is_hot = F.col("id") >= n_spread

    def comp(j: int):
        hot = 1.0 + F.pmod(
            F.xxhash64(F.col("id") * 31 + F.lit(j)), F.lit(1000)
        ).cast("double") / 1e7
        spread = (
            F.pmod(F.xxhash64(F.col("id") * 97 + F.lit(j)), F.lit(2000))
            .cast("double")
            - 1000.0
        ) / 100.0
        return F.when(is_hot, hot).otherwise(spread)

    return ids.select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(j) for j in range(d)]).alias("vec"),
    ).withColumn("vnorm", norm(F.col("vec")))


def test_semdedup_cell_cap_bounds_hot_cell_pairs(spark):
    """A blob of b near-identical vectors puts C(b, 2) cosine pairs in
    one cell; with cell_cap=C the hot cell's pair stage keeps only its
    C md5-order-first members, every smaller cell is untouched, and
    capped-out members keep is_kept=TRUE (no evidence)."""
    from aram_matchdata_etl_spark.operators.similarity import semdedup_frame

    # cap chosen ABOVE the ~20-member spread cells (only the 50-member
    # blob cell is oversized) so the exactness-outside claim is testable
    n_spread, n_hot, k, cap = 80, 50, 4, 32
    emb = _synthetic_blob_emb(spark, n_spread, n_hot).localCheckpoint()
    plain = {
        r.vec_id: r
        for r in semdedup_frame(spark, "", k, emb=emb).collect()
    }
    capped = {
        r.vec_id: r
        for r in semdedup_frame(spark, "", k, emb=emb, cell_cap=cap).collect()
    }
    assert set(plain) == set(capped) == set(range(n_spread + n_hot))
    hot_ids = set(range(n_spread, n_spread + n_hot))
    # uncapped: the blob is one complete near-dup graph in one cell —
    # every member sees all the others, exactly one survivor
    hot_cell = {plain[v].cell for v in hot_ids}
    assert len(hot_cell) == 1
    # >= rather than ==: spread vectors sharing the blob's cell can add
    # extra near-dup edges on top of the complete blob graph
    assert all(plain[v].n_neardups >= n_hot - 1 for v in hot_ids)
    assert sum(1 for v in hot_ids if plain[v].is_kept) <= 1
    # capped: hot-cell degrees bounded by the cap; capped-out members
    # carry no evidence (0 neardups, kept)
    assert all(capped[v].n_neardups <= cap - 1 for v in hot_ids)
    assert sum(1 for v in hot_ids if capped[v].n_neardups > 0) <= cap
    assert sum(1 for v in hot_ids if capped[v].is_kept) >= 1
    # every vector OUTSIDE the oversized cell is bit-identical
    oversized = hot_cell.pop()
    for v, r in plain.items():
        if r.cell != oversized:
            assert tuple(r) == tuple(capped[v]), v


def test_semdedup_cell_cap_auto_probe(spark):
    """cell_cap='auto': one max-cell-size agg decides. Benign corpus →
    exact output, verdict not engaged; blob past SEMDEDUP_AUTO_CELL_CAP
    → cap engages at the threshold and equals the manual-cap output."""
    from aram_matchdata_etl_spark.operators.similarity import (
        SEMDEDUP_AUTO_CELL_CAP,
        SEMDEDUP_TELEMETRY,
        semdedup_frame,
    )

    k = 4
    benign = _synthetic_blob_emb(spark, 120, 8).localCheckpoint()
    exact = sorted(
        map(tuple, semdedup_frame(spark, "", k, emb=benign).collect())
    )
    auto = sorted(
        map(
            tuple,
            semdedup_frame(
                spark, "", k, emb=benign, cell_cap="auto", tag="sd_benign"
            ).collect(),
        )
    )
    assert auto == exact
    t = SEMDEDUP_TELEMETRY["sd_benign"]
    assert t["cap_engaged"] is False
    assert 8 <= t["max_cell"] <= SEMDEDUP_AUTO_CELL_CAP

    n_hot = SEMDEDUP_AUTO_CELL_CAP + 48
    hot = _synthetic_blob_emb(spark, 100, n_hot).localCheckpoint()
    auto_hot = sorted(
        map(
            tuple,
            semdedup_frame(
                spark, "", k, emb=hot, cell_cap="auto", tag="sd_hot"
            ).collect(),
        )
    )
    manual_hot = sorted(
        map(
            tuple,
            semdedup_frame(
                spark, "", k, emb=hot, cell_cap=SEMDEDUP_AUTO_CELL_CAP
            ).collect(),
        )
    )
    t = SEMDEDUP_TELEMETRY["sd_hot"]
    assert t["cap_engaged"] is True and t["max_cell"] >= n_hot
    assert auto_hot == manual_hot


def test_semdedup_scaled_auto_cap_stands_down_on_fixture(spark):
    """The PRODUCTION sizing key q_semdedup_scaled carries
    cell_cap='auto' (r13, VERDICT r12 item 4): on the balanced fixture
    the probe must STAND DOWN — cap_engaged False in
    SEMDEDUP_TELEMETRY['q_semdedup_scaled'] — and the output must be
    bit-identical to the uncapped frame under the same k at both probe
    SFs, so the registered entry exercises the probe every round while
    the skew microbench keeps the engaged path."""
    from .conftest import SF_ORACLE, SF_SMOKE

    from aram_matchdata_etl_spark.operators.similarity import (
        SEMDEDUP_AUTO_CELL_CAP,
        SEMDEDUP_TARGET_CELL,
        SEMDEDUP_TELEMETRY,
        embeddings_d,
        semdedup_frame,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    for sf in (SF_SMOKE, SF_ORACLE):
        got = sorted(map(tuple, qs["q_semdedup_scaled"](spark, sf).collect()))
        t = SEMDEDUP_TELEMETRY["q_semdedup_scaled"]
        assert t["cap_engaged"] is False
        assert 0 < t["max_cell"] <= SEMDEDUP_AUTO_CELL_CAP
        n = embeddings_d(spark, sf).count()
        k = max(2, -(-n // SEMDEDUP_TARGET_CELL))
        exact = sorted(map(tuple, semdedup_frame(spark, sf, k).collect()))
        assert got == exact, sf
