"""Slow scale-regression guards (round-2 evidence, SCALE.md): re-runs the
50k-doc / ~225k-edge connected-components measurement as an assertion so
the 65.7s -> 3.0s partition-mismatch fix can't silently regress.

Marked slow: ~1-2 min wall. The corpus is the sf0.01 documents table
replicated 100x in 10 salt groups — every token is suffixed with the salt
so cross-group Jaccard is exactly 0 (no mega-cliques), while the 10
identical copies within a group form size-10 cliques: 500 docs x 10 groups
x C(10,2) = 225k verified pairs, component diameter 1.
"""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from .conftest import SF_ORACLE


@pytest.mark.slow
def test_cc_wall_time_tracks_lsh_verify_at_50k_docs(spark):
    from aram_matchdata_etl_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        bigram_col,
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "text"
    )
    replicas = spark.range(100).select(
        F.col("id").alias("replica"), (F.col("id") / 10).cast("int").alias("salt")
    )
    corpus = (
        base.crossJoin(F.broadcast(replicas))
        .select(
            (F.col("doc_id") + F.col("replica") * 1_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda t: F.concat(t, F.lit("_g"), F.col("salt")),
                ),
                " ",
            ).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    n_docs = corpus.count()
    assert n_docs == 50_000

    # --- LSH stage: shingle sets -> signatures -> banded candidates ->
    # exact Jaccard verification (the scale path, timed end-to-end)
    t0 = time.perf_counter()
    toks = F.split(F.col("text"), " ")
    # md5-prefix-32 hash, same as shingle_hash_sets: minhash_signatures'
    # affine permutations assume hashes in [0, 2^32) — a full-range
    # xxhash64 input (the pre-r7 convention) breaks the min-wise property
    sets = (
        corpus.select("doc_id", F.explode(bigram_col(toks)).alias("shingle"))
        .groupBy("doc_id")
        .agg(
            F.collect_set(
                F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast(
                    "bigint"
                )
            ).alias("hs")
        )
        .persist()
    )
    candidates = lsh_candidate_pairs(minhash_signatures(sets))
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
    n_common = F.size(F.array_intersect(F.col("ha"), F.col("hb")))
    jac = n_common / (F.size("ha") + F.size("hb") - n_common)
    pairs = (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    n_pairs = pairs.count()
    t_lsh = time.perf_counter() - t0

    # 10 identical copies per (doc, salt-group) guarantee >= 45 pairs each;
    # intra-group near-dups between different base docs add more
    assert n_pairs >= 500 * 10 * 45, n_pairs

    # --- CC stage over the materialized pair relation
    t0 = time.perf_counter()
    clusters = connected_components(corpus.select("doc_id"), pairs)
    n_canonical = clusters.filter("is_canonical").count()
    t_cc = time.perf_counter() - t0

    # every size-10 clique collapses to one canonical: <= 500 x 10 clusters
    # for the replicated docs (near-dup merges within a group reduce further),
    # plus nothing else — total canonicals strictly below the doc count / 9
    assert n_canonical <= 500 * 10, n_canonical

    # THE regression guard: with the edge list NOT force-partitioned, the
    # per-round join reuses the session's shuffle parallelism and the loop
    # stays within a small multiple of the LSH stage (measured ~3s vs ~8s
    # at this scale; the partition-mismatch bug made CC alone 65.7s)
    assert t_cc < 4 * t_lsh, f"CC {t_cc:.1f}s vs LSH {t_lsh:.1f}s"

    sets.unpersist()


@pytest.mark.slow
def test_star_contraction_beats_min_label_on_deep_chain(spark):
    """VERDICT r3 item 8: on a chain-shaped pair graph (diameter >> star
    depth), one-hop min-label needs diameter rounds while large-star/
    small-star contracts in O(log n). A 16-node chain forces min-label
    through >10 rounds; star must land the identical labeling in <=5.
    'auto' must detect the deep graph at runtime and escalate."""
    from aram_matchdata_etl_spark.operators.dedup import (
        CC_TELEMETRY,
        connected_components,
    )

    n = 16
    # chain 0-1-2-...-15 plus a few singletons (16..19)
    pairs = (
        spark.range(n - 1)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    universe = spark.range(n + 4).select(F.col("id").alias("doc_id"))

    expected = [(i, 0, i == 0) for i in range(n)] + [
        (i, i, True) for i in range(n, n + 4)
    ]

    got_min = connected_components(
        universe, pairs, algorithm="min_label", tag="chain_min"
    )
    assert sorted(map(tuple, got_min.collect())) == expected
    rounds_min = CC_TELEMETRY["chain_min"]["rounds"]
    assert rounds_min > 10, rounds_min  # one hop per round on a 16-chain

    got_star = connected_components(universe, pairs, algorithm="star", tag="chain_star")
    assert sorted(map(tuple, got_star.collect())) == expected
    rounds_star = CC_TELEMETRY["chain_star"]["rounds"]
    assert rounds_star <= 5, rounds_star  # O(log n) contraction

    got_auto = connected_components(universe, pairs, algorithm="auto", tag="chain_auto")
    assert sorted(map(tuple, got_auto.collect())) == expected
    assert CC_TELEMETRY["chain_auto"]["escalated"] is True
    assert CC_TELEMETRY["chain_auto"]["algorithm"] == "star"


@pytest.mark.slow
def test_substring_apply_cheaper_than_detection_at_50k_docs(spark):
    """Pins the 'document bodies never shuffle' claim of the exact-substring
    pipeline: on a 50k-doc corpus the APPLY stage (covered-set broadcast +
    in-row positional filter) must cost less wall-clock than DETECTION
    (whose window-hash frequency shuffle is the irreducible wide stage).
    A regression to the naive explode-every-token anti-join makes apply
    re-shuffle the whole corpus twice and blow past detection."""
    from aram_matchdata_etl_spark.operators.training import SPAN_W

    base = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "text"
    )
    replicas = spark.range(100).select(
        F.col("id").alias("replica"), (F.col("id") / 10).cast("int").alias("salt")
    )
    corpus = (
        base.crossJoin(F.broadcast(replicas))
        .select(
            (F.col("doc_id") + F.col("replica") * 1_000_000).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda t: F.concat(t, F.lit("_g"), F.col("salt")),
                ),
                " ",
            ).alias("text"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    )
    assert corpus.count() == 50_000

    toks = F.split(F.col("text"), " ")
    starts = F.when(
        F.size(toks) >= SPAN_W, F.sequence(F.lit(0), F.size(toks) - SPAN_W)
    ).otherwise(F.expr("array()").cast("array<int>"))
    win_hashes = F.transform(
        starts, lambda i: F.md5(F.array_join(F.slice(toks, i + 1, SPAN_W), " "))
    )

    def _isolate():
        # same per-measurement isolation the bench harness uses: timing
        # runs inside the full suite inherit broadcast/checkpoint/GC debt
        # from hundreds of prior tests, which can flip a RELATIVE timing
        # assertion without any plan regression (bench forensics, SCALE.md)
        spark.catalog.clearCache()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

    # --- detection: window explode + corpus-wide frequency + flag-back
    _isolate()
    t0 = time.perf_counter()
    wins = corpus.select("doc_id", F.posexplode(win_hashes).alias("start", "h"))
    freq = wins.groupBy("h").agg(F.count("*").alias("c")).filter(F.col("c") >= 2)
    flagged = (
        wins.join(freq.select("h"), "h").select("doc_id", "start").localCheckpoint()
    )
    n_flagged = flagged.count()
    t_detect = time.perf_counter() - t0
    # every replicated doc repeats corpus-wide: detection must flag a lot
    assert n_flagged > 1_000_000, n_flagged

    # --- apply: covered-set aggregation + broadcast join + in-row filter
    _isolate()
    t0 = time.perf_counter()
    cov = (
        flagged.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (SPAN_W - 1))
            ).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("cov"))
    )
    kept_arr = F.filter(
        F.col("t"), lambda tok, i: ~F.array_contains(F.col("cov_safe"), i)
    )
    cleaned = (
        corpus.select("doc_id", toks.alias("t"))
        .join(cov, "doc_id", "left")
        .withColumn(
            "cov_safe",
            F.coalesce(F.col("cov"), F.expr("array()").cast("array<int>")),
        )
        .select(
            "doc_id",
            F.size("t").alias("n_tokens"),
            F.size(kept_arr).alias("n_kept"),
        )
    )
    def _run_apply():
        agg = cleaned.agg(
            F.count("*").alias("docs"),
            F.sum((F.col("n_kept") < F.col("n_tokens")).cast("int")).alias("touched"),
        ).collect()[0]
        return agg

    agg = _run_apply()
    t_apply = time.perf_counter() - t0
    assert agg["docs"] == 50_000
    assert agg["touched"] > 40_000, agg["touched"]  # replicas are all repeated

    if t_apply >= t_detect:
        # one retry after isolation: a load spike during the first apply
        # measurement is noise; a true regression (the naive anti-join
        # re-shuffling the corpus, >2x detection) reproduces
        _isolate()
        t0 = time.perf_counter()
        _run_apply()
        t_apply = time.perf_counter() - t0
    assert t_apply < t_detect, f"apply {t_apply:.1f}s vs detect {t_detect:.1f}s"
