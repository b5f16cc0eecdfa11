"""North-star operator invariants that the DuckDB oracle can't check:
LSH recall vs the exact operator, sketch error bounds, ANN recall,
multimodal plumbing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from .conftest import SF_ORACLE, SF_SMOKE


def _pairs(df, a="doc_a", b="doc_b"):
    return {(r[a], r[b]) for r in df.select(a, b).collect()}


def test_minhash_lsh_recall_vs_exact(spark):
    """LSH candidates (verified by exact Jaccard) vs the exact quadratic
    operator: precision is 1.0 by construction (candidates are re-verified)
    and recall must be high at the 0.5 threshold."""
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    exact = _pairs(qs["q_dedup_ngram_jaccard"](spark, SF_ORACLE))
    lsh = _pairs(qs["q_dedup_minhash_lsh"](spark, SF_ORACLE))
    assert lsh <= exact, "verified LSH pairs must be a subset of exact pairs"
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.6, f"LSH recall too low: {recall:.2f} ({len(lsh)}/{len(exact)})"


def test_simhash_close_pairs_have_similar_sets(spark):
    """SimHash pairs at small hamming distance should overlap heavily with
    exact near-dups — sanity, not a tight bound."""
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    sim = qs["q_dedup_simhash"](spark, SF_ORACLE)
    # schema and determinism: same result on re-run
    a = _pairs(sim)
    b = _pairs(qs["q_dedup_simhash"](spark, SF_ORACLE))
    assert a == b


def test_approx_distinct_error_bound(spark):
    """HLL sketch within its configured 1% relative error (x5 safety)."""
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    exact = {
        r.l_returnflag: (r.n_parts, r.n_supps)
        for r in qs["q_count_distinct"](spark, SF_ORACLE).collect()
    }
    approx = {
        r.l_returnflag: (r.n_parts_approx, r.n_supps_approx)
        for r in qs["q_approx_distinct"](spark, SF_ORACLE).collect()
    }
    for flag, (p, s) in exact.items():
        ap, as_ = approx[flag]
        assert abs(ap - p) / p < 0.05
        assert abs(as_ - s) / s < 0.05


def test_approx_quantile_error_bound(spark):
    """percentile_approx within tight relative error of the exact
    percentile at 10k accuracy."""
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    exact = {r.l_linestatus: (r.q50, r.q99) for r in qs["q_quantile"](spark, SF_ORACLE).collect()}
    approx = {
        r.l_linestatus: (r.p50_approx, r.p99_approx)
        for r in qs["q_quantile_approx"](spark, SF_ORACLE).collect()
    }
    for k, (e50, e99) in exact.items():
        a50, a99 = approx[k]
        assert abs(a50 - e50) / max(e50, 1) < 0.05
        assert abs(a99 - e99) / max(e99, 1) < 0.05


def test_ann_lsh_recall(spark):
    """Bucketed ANN: every hit it returns must be a true neighbor ranking
    (cosine computed exactly), and recall@10 vs brute force is reported ≥
    a loose floor (single 8-bit probe ⇒ recall is limited by design)."""
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    exact = {
        (r.query_id, r.vec_id)
        for r in qs["q_similarity_topk"](spark, SF_ORACLE).collect()
    }
    ann = {(r.query_id, r.vec_id) for r in qs["q_ann_lsh"](spark, SF_ORACLE).collect()}
    inter = len(ann & exact)
    assert inter / len(exact) >= 0.2, f"ANN recall@10 too low: {inter}/{len(exact)}"


def test_embedding_neardup_lsh_recall(spark):
    """LSH-prefiltered near-dup: subset of brute force (exact verify), with
    decent recall at the 0.8 cosine threshold (high-cosine pairs collide
    in at least one of the 4 tables with high probability)."""
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    exact = {
        (r.vec_a, r.vec_b) for r in qs["q_embedding_neardup"](spark, SF_ORACLE).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in qs["q_embedding_neardup_lsh"](spark, SF_ORACLE).collect()
    }
    assert lsh <= exact
    assert exact, "threshold selects nothing — operator is vacuous"
    recall = len(lsh) / len(exact)
    # fixture pairs sit barely above the 0.4 threshold (max cosine ~0.5),
    # where hyperplane collision probability is weakest: ~0.5 expected
    assert recall >= 0.35, f"neardup LSH recall: {recall:.2f} ({len(lsh)}/{len(exact)})"


def test_ann_ivf_recall(spark):
    """IVF probe (3 of 16 cells, 2-way multi-assignment) recall@10 vs
    brute force: measured 0.82 on the fixture (up from 0.60 at
    single-assignment); 0.7 is the regression floor."""
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    exact = {
        (r.query_id, r.vec_id)
        for r in qs["q_similarity_topk"](spark, SF_ORACLE).collect()
    }
    ivf = {(r.query_id, r.vec_id) for r in qs["q_ann_ivf"](spark, SF_ORACLE).collect()}
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.7, f"IVF recall@10 too low: {recall:.2f}"


@pytest.mark.slow
def test_ann_ivf_recall_monotone_in_assignment(spark):
    """Indexing each vector into more cells ⇒ recall can only grow
    (candidate sets nest in the assignment factor), and full probe stays
    exact regardless of duplication (candidates dedup before ranking)."""
    from aram_matchdata_etl_spark.operators.similarity import IVF_CLUSTERS, ann_ivf
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    exact = {
        (r.query_id, r.vec_id)
        for r in qs["q_similarity_topk"](spark, SF_ORACLE).collect()
    }
    recalls = []
    for assign in (1, 2):
        got = {
            (r.query_id, r.vec_id)
            for r in ann_ivf(spark, SF_ORACLE, probes=3, assign=assign).collect()
        }
        recalls.append(len(got & exact) / len(exact))
    assert recalls == sorted(recalls), recalls
    full = {
        (r.query_id, r.vec_id)
        for r in ann_ivf(spark, SF_ORACLE, probes=IVF_CLUSTERS, assign=2).collect()
    }
    assert full == exact  # full probe == brute force even with 2x index


@pytest.mark.slow
def test_ann_ivf_recall_monotone_in_probes(spark):
    """More probed cells ⇒ recall can only grow (candidate sets nest);
    probing ALL cells must equal brute force exactly."""
    from aram_matchdata_etl_spark.operators.similarity import IVF_CLUSTERS, ann_ivf
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    exact = {
        (r.query_id, r.vec_id)
        for r in qs["q_similarity_topk"](spark, SF_ORACLE).collect()
    }
    recalls = []
    for probes in (1, 3, IVF_CLUSTERS):
        got = {
            (r.query_id, r.vec_id)
            for r in ann_ivf(spark, SF_ORACLE, probes=probes).collect()
        }
        recalls.append(len(got & exact) / len(exact))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0, recalls  # full probe == brute force


def test_media_features_invariants(spark):
    """Multimodal plumbing: histogram is a distribution, byte length
    matches the catalog metadata, every media type flows through."""
    from aram_matchdata_etl_spark.registry import all_queries
    from aram_matchdata_etl_spark.sources.tables import load_table

    feats = all_queries()["q_media_features"](spark, SF_SMOKE)
    bad_hist = feats.filter(
        F.abs(F.col("h0") + F.col("h1") + F.col("h2") + F.col("h3") - 1.0) > 1e-9
    )
    assert bad_hist.count() == 0
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    joined = feats.join(docs, "doc_id").filter(F.col("n_bytes") != F.col("n_chars"))
    assert joined.count() == 0
    assert feats.select("media_type").distinct().count() == 3


def test_decode_stub_raises(spark):
    """Compressed codecs stay behind the documented NotImplementedError
    seam (no codec libs in this container)."""
    from aram_matchdata_etl_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
    # malformed DATA (too short for any magic) is ValueError, not the
    # unsupported-codec seam
    for junk in (b"", b"P"):
        with pytest.raises(ValueError):
            decode_image(junk)


def _ppm_bytes(img) -> bytes:
    import numpy as np

    h, w, _ = img.shape
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img
    ).tobytes()


def _bmp_bytes(img) -> bytes:
    """Minimal bottom-up 24-bit BMP writer (the encoder-side twin used
    only by this test)."""
    import struct

    import numpy as np

    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in img[::-1]:  # bottom-up
        raster += row[:, ::-1].tobytes()  # RGB -> BGR
        raster += b"\x00" * (stride - w * 3)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + dib + bytes(raster)


def test_decode_real_formats(spark):
    """The r9 stub disposition: PPM(P6) and 24-bit BMP decode for real,
    stdlib-only, and round-trip pixel-exact — both driver-side and
    through the executor-side mapInPandas plumbing (the path a real
    decode->featurize stage takes)."""
    import numpy as np
    import pandas as pd

    from aram_matchdata_etl_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(_ppm_bytes(img)), img)
    assert np.array_equal(decode_image(_bmp_bytes(img)), img)
    # odd width exercises BMP row padding; 1x1 is the degenerate case
    img2 = rng.integers(0, 256, size=(2, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(_bmp_bytes(img2)), img2)
    assert np.array_equal(
        decode_image(_ppm_bytes(img[:1, :1])), img[:1, :1]
    )

    payloads = [(0, _ppm_bytes(img)), (1, _bmp_bytes(img2))]
    media = spark.createDataFrame(payloads, "doc_id long, payload binary")

    def decode_dims(batches):
        for pdf in batches:
            dims = [decode_image(bytes(p)).shape for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "height": [d[0] for d in dims],
                    "width": [d[1] for d in dims],
                }
            )

    got = {
        (r.doc_id, r.height, r.width)
        for r in media.mapInPandas(
            decode_dims, "doc_id long, height int, width int"
        ).collect()
    }
    assert got == {(0, 5, 3), (1, 2, 5)}


def test_frame_sample_shape(spark):
    from aram_matchdata_etl_spark.operators.multimodal import (
        frame_sample,
        synthetic_media,
    )

    media = synthetic_media(spark, SF_SMOKE)
    frames = frame_sample(media)
    assert frames.columns == ["doc_id", "frame_no", "byte_offset"]
    # frame numbering starts at 0 and offsets are stride-aligned
    bad = frames.filter((F.col("byte_offset") % 64 != 0) | (F.col("frame_no") < 0))
    assert bad.count() == 0
    assert frames.count() > 0


def test_dedup_clusters_invariants(spark):
    """Cluster assignment is a true connected-components labeling: no
    near-dup edge straddles two clusters, cluster_id is the component's
    min doc_id, and exactly one canonical doc exists per cluster."""
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    clusters = qs["q_dedup_clusters"](spark, SF_ORACLE).cache()
    label = {r.doc_id: r.cluster_id for r in clusters.collect()}
    pairs = qs["q_dedup_ngram_jaccard"](spark, SF_ORACLE).collect()
    assert pairs, "fixture should contain near-dup pairs"
    for r in pairs:
        assert label[r.doc_a] == label[r.doc_b], (r.doc_a, r.doc_b)

    import collections

    members = collections.defaultdict(list)
    for doc, cl in label.items():
        members[cl].append(doc)
    for cl, docs in members.items():
        assert cl == min(docs), cl

    canon = clusters.filter("is_canonical").count()
    assert canon == len(members)
    clusters.unpersist()


@pytest.mark.slow
def test_connected_components_frees_superseded_checkpoints(spark):
    """Each propagation round localCheckpoint()s the labels; superseded
    rounds' blocks must actually leave the block manager (plain
    DataFrame.unpersist does NOT free checkpoint blocks — regression
    guard for the _free_checkpoint fix). Only the final round's labels
    checkpoint may remain per call."""
    from aram_matchdata_etl_spark.operators.dedup import connected_components

    jsc = spark.sparkContext._jsc.sc()
    docs = spark.range(200).withColumnRenamed("id", "doc_id")
    # a 15-link chain => ~16 propagation rounds => many checkpoints
    # (min-label propagation moves one hop per round; stay under the
    # 20-round convergence cap)
    pairs = spark.range(15).selectExpr("id as doc_a", "id + 1 as doc_b")

    before = jsc.getPersistentRDDs().size()
    result = connected_components(docs, pairs, algorithm="min_label")
    assert result.filter("cluster_id = 0").count() == 16
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1, (
        f"checkpoint blocks leaked: {before} -> {after} persistent RDDs"
    )

    # auto on this 15-chain escalates at round 8: the returned plan then
    # legitimately reads from TWO live checkpoints (the min-label labels
    # it seeds star with + star's fixed-point edge set) — anything above
    # that is a leak of a superseded round
    before = jsc.getPersistentRDDs().size()
    result = connected_components(docs, pairs, algorithm="auto")
    assert result.filter("cluster_id = 0").count() == 16
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 2, (
        f"checkpoint blocks leaked on escalation: {before} -> {after}"
    )


def test_dedup_clusters_lsh_consistent(spark):
    """The LSH-fed clustering obeys its own pair set and is never finer
    than it nor coarser than the exact clustering allows: every verified
    LSH pair shares a cluster, and since LSH pairs are a subset of exact
    pairs, the LSH labeling has at least as many clusters."""
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    lsh = qs["q_dedup_clusters_lsh"](spark, SF_ORACLE)
    label = {r.doc_id: r.cluster_id for r in lsh.collect()}
    for r in qs["q_dedup_minhash_lsh"](spark, SF_ORACLE).collect():
        assert label[r.doc_a] == label[r.doc_b]
    n_exact = qs["q_dedup_clusters"](spark, SF_ORACLE).filter("is_canonical").count()
    n_lsh = len(set(label.values()))
    assert n_lsh >= n_exact


def test_hll_rollup_error_bound(spark):
    """The unioned all-time sketch estimate must sit within HLL error of
    the exact distinct count, and EVERY per-day estimate within the
    published relative standard deviation (lgConfigK=12 default ->
    rsd ~ 1.04/sqrt(2^12) ~ 1.6%; asserted at 3x rsd ~ 4.9%, a >=99.7%
    band) — a broken sketch that still happens to land the grand total
    cannot pass (VERDICT r4 item 7)."""
    from aram_matchdata_etl_spark.registry import all_queries
    from aram_matchdata_etl_spark.sources.tables import load_table

    rows = all_queries()["q_hll_rollup"](spark, SF_ORACLE).collect()
    total = [r for r in rows if r.day is None]
    assert len(total) == 1
    ev = load_table(spark, SF_ORACLE, "events")
    exact_total = ev.select("user_id").distinct().count()
    rsd3 = 3 * 1.04 / (2**12) ** 0.5
    assert abs(total[0].distinct_users - exact_total) / exact_total < rsd3
    assert sum(r.n_events for r in rows if r.day is not None) == total[0].n_events
    exact_by_day = {
        r.day: r.exact
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    per_day = [r for r in rows if r.day is not None]
    assert len(per_day) == len(exact_by_day) > 1
    for r in per_day:
        exact = exact_by_day[r.day]
        assert abs(r.distinct_users - exact) / exact < rsd3, (r, exact)



def test_embedding_quantize_invariants(spark):
    """int8 range and the reconstruction bound |x - q*scale| <= scale/2
    (+ float32 ulp slack) — the property that makes the quantized form a
    drop-in for candidate generation."""
    from aram_matchdata_etl_spark.registry import all_queries

    q = all_queries()["q_embedding_quantize"](spark, SF_SMOKE)
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    )
    joined = q.join(emb, ["vec_id", "dim"])
    bad_range = joined.filter((F.col("qval") > 127) | (F.col("qval") < -127)).count()
    assert bad_range == 0
    err = F.abs(F.col("x").cast("double") - F.col("qval") * F.col("scale"))
    bad_err = joined.filter(err > F.col("scale") * 0.5 + 1e-6).count()
    assert bad_err == 0


def test_boilerplate_removal_invariants(spark):
    """Kept chunks are a subset of the original text in original order;
    a document's clean_text is a prefix-free subsequence of its chunks;
    and the pass is non-vacuous on the fixture (some chunk crosses docs)."""
    from aram_matchdata_etl_spark.registry import all_queries

    out = all_queries()["q_boilerplate_removal"](spark, SF_ORACLE)
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    j = out.join(docs, "doc_id")
    assert j.filter(F.col("n_chunks_kept") > F.col("n_chunks_total")).count() == 0
    # every kept doc's clean_text tokens appear in the source text
    leftover = j.filter(
        (F.col("clean_text") != "")
        & ~F.expr(
            "forall(split(clean_text, ' '), t -> array_contains(split(text, ' '), t))"
        )
    ).count()
    assert leftover == 0
    removed = j.filter(F.col("n_chunks_kept") < F.col("n_chunks_total")).count()
    assert removed > 0  # non-vacuous: fixture contains cross-doc chunks


def test_connected_components_ignores_phantom_endpoints(spark):
    """Pair endpoints outside the docs universe must not bridge components
    and must never surface as cluster ids — both algorithms, including the
    auto-escalation seeding path, agree on the contract."""
    from aram_matchdata_etl_spark.operators.dedup import connected_components

    docs = spark.createDataFrame([(0,), (1,)], "doc_id long")
    pairs = spark.createDataFrame([(0, 9), (1, 9)], "doc_a long, doc_b long")
    expected = [(0, 0, True), (1, 1, True)]
    for algo in ("min_label", "star", "auto"):
        got = sorted(
            map(tuple, connected_components(docs, pairs, algorithm=algo).collect())
        )
        assert got == expected, (algo, got)

    # phantom as the smaller endpoint: must not become a cluster_id
    docs2 = spark.createDataFrame([(5,), (6,)], "doc_id long")
    pairs2 = spark.createDataFrame([(5, 1), (5, 6)], "doc_a long, doc_b long")
    expected2 = [(5, 5, True), (6, 5, False)]
    for algo in ("min_label", "star"):
        got = sorted(
            map(tuple, connected_components(docs2, pairs2, algorithm=algo).collect())
        )
        assert got == expected2, (algo, got)


def test_countmin_bounds(spark):
    """Count-min guarantees: estimate >= exact ALWAYS, and overestimate
    bounded by eps*N (w.h.p.; eps = 2/width) — checked against the exact
    counts the operator carries alongside."""
    from aram_matchdata_etl_spark.operators.streaming_batch import CM_WIDTH
    from aram_matchdata_etl_spark.registry import all_queries

    rows = all_queries()["q_countmin_topk"](spark, SF_ORACLE).collect()
    assert len(rows) == 20
    n_tokens = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select(F.explode(F.split("text", " ")))
        .count()
    )
    # x3 slack: the eps*N bound is probabilistic (~94% per word at d=4);
    # the run is deterministic for a FIXED fixture+seeds, but regenerated
    # fixtures may legitimately push a word past the raw bound (same
    # reasoning as the HLL test's x5 margin)
    eps_bound = 3 * 2.0 / CM_WIDTH * n_tokens
    for r in rows:
        assert r.cm_estimate >= r.true_count, r
        assert r.cm_estimate <= r.true_count + eps_bound, (r, eps_bound)


def test_countmin_bounds_corpus_wide(spark):
    """CM guarantees over EVERY distinct word, not just the top-k
    (VERDICT r4 item 7): estimate >= true for ALL words (the deterministic
    lower-bound guarantee — one violation means the sketch is broken), and
    overestimate <= eps*N for ~all words (the probabilistic bound: expected
    violation rate (1/2)^d ~ 6%; asserted < 10%). All checks are Spark-side
    aggregations over the broadcast sketch — no per-word collect."""
    from aram_matchdata_etl_spark.operators.streaming_batch import (
        CM_WIDTH,
        countmin_estimates,
    )
    from aram_matchdata_etl_spark.sources.tables import load_table

    words = load_table(spark, SF_ORACLE, "documents").select(
        F.explode(F.split("text", " ")).alias("word")
    )
    truth = words.groupBy("word").agg(F.count("*").alias("true_count"))
    est = countmin_estimates(words, truth)
    n_tokens = words.count()
    eps_bound = 2.0 / CM_WIDTH * n_tokens
    stats = est.agg(
        F.count("*").alias("n"),
        F.sum((F.col("cm_estimate") < F.col("true_count")).cast("long")).alias(
            "under"
        ),
        F.sum(
            (F.col("cm_estimate") > F.col("true_count") + F.lit(eps_bound)).cast(
                "long"
            )
        ).alias("over"),
    ).first()
    assert stats.n == truth.count()
    assert stats.under == 0, f"{stats.under} words below true count"
    assert stats.over / stats.n < 0.10, f"{stats.over}/{stats.n} beyond eps*N"


def test_pq_codes_and_reconstruction(spark):
    """PQ invariants: every code word has PQ_M codes each in [0, PQ_K);
    reconstruction error is non-negative; and the PQ_K-codebook
    reconstructs strictly better on average than the degenerate 1-code
    codebook (whose centroids are the subspace means, so its mean error
    is exactly the summed per-dimension population variance) — a broken
    assignment or fit fails one of these."""
    from aram_matchdata_etl_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        embeddings_d,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    rows = all_queries()["q_embedding_pq"](spark, SF_ORACLE).collect()
    n_vecs = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").count()
    assert len(rows) == n_vecs
    for r in rows:
        codes = [int(c) for c in r.pq_code.split("|")]
        assert len(codes) == PQ_M
        assert all(0 <= c < PQ_K for c in codes), r
        assert r.recon_err >= 0
    mean_err = sum(r.recon_err for r in rows) / len(rows)

    emb = embeddings_d(spark, SF_ORACLE)
    mean_err_k1 = (
        emb.select(F.posexplode("vec").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.var_pop("x").alias("v"))
        .agg(F.sum("v"))
        .first()[0]
    )
    assert mean_err < 0.9 * mean_err_k1, (mean_err, mean_err_k1)


def test_pq_adc_recall_vs_exact(spark):
    """ADC-shortlist + exact-re-rank top-10 vs brute-force L2 top-10:
    measured 0.7 mean recall on the fixture (M=8, K=16, shortlist 50);
    asserted with slack (mean >= 0.5, per-query >= 0.2) so a regenerated
    fixture passes but a broken codebook/lookup (recall ~ rand = 0.02)
    cannot."""
    import numpy as np

    from aram_matchdata_etl_spark.registry import all_queries

    rows = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").collect()
    V = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    from collections import defaultdict

    got = defaultdict(set)
    for r in all_queries()["q_ann_pq"](spark, SF_ORACLE).collect():
        got[r.query_id].add(r.vec_id)
    recalls = []
    for q in range(5):
        qv = V[q]
        exact = {
            i for _, i in sorted(((np.sum((qv - V[i]) ** 2), i) for i in V if i != q))[:10]
        }
        recalls.append(len(exact & got[q]) / 10)
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    assert min(recalls) >= 0.2, recalls


def test_ann_graph_recall_vs_exact(spark):
    """Sharded kNN-graph + greedy beam search vs brute-force cosine
    top-10: on the fixture (4 shards of ~125 vectors, M=8, ef=24) the
    beam search recovers essentially the exact neighbors; asserted with
    slack (mean >= 0.7, per-query >= 0.4) so a broken graph build or a
    beam that never expands (recall ~ 0) cannot pass. Also pins the
    contract: no self-matches, ranks are 1..k, cosine descending."""
    import numpy as np
    from collections import defaultdict

    from aram_matchdata_etl_spark.registry import all_queries

    rows = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").collect()
    V = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    got = defaultdict(list)
    for r in all_queries()["q_ann_graph"](spark, SF_ORACLE).collect():
        assert r.vec_id != r.query_id
        got[r.query_id].append((r.rnk, r.vec_id, r.cosine))
    recalls = []
    for q in range(5):
        qv = V[q]
        qn = np.linalg.norm(qv)
        exact = {
            i
            for _, i in sorted(
                (
                    (-float(V[i] @ qv / (np.linalg.norm(V[i]) * qn)), i)
                    for i in V
                    if i != q
                )
            )[:10]
        }
        mine = sorted(got[q])
        assert [r for r, _, _ in mine] == list(range(1, len(mine) + 1))
        cosines = [c for _, _, c in mine]
        assert cosines == sorted(cosines, reverse=True)
        recalls.append(len(exact & {v for _, v, _ in mine}) / 10)
    assert sum(recalls) / len(recalls) >= 0.7, recalls
    assert min(recalls) >= 0.4, recalls


def test_ann_graph_numpy_differential(spark):
    """Exact third-implementation check for q_ann_graph (upgrading it
    from recall-floor-only): the layer-0 greedy beam search is fully
    deterministic GIVEN the shard assignment (stable argsort graph,
    (sim, node)-tuple beam ordering, min-vec_id entry point), so a
    driver-side pure-numpy pipeline — per-shard exact kNN graph, the
    same best-first beam, global merge, round-6 — must reproduce the
    operator's (query_id, vec_id, cosine, rnk) rows BIT-FOR-BIT. The
    shard column is the one Spark-engine-specific input (xxhash64), so
    it is read from a trivial projection; everything downstream of it is
    recomputed independently here."""
    import numpy as np
    from collections import defaultdict

    from aram_matchdata_etl_spark.operators.similarity import (
        GRAPH_EF,
        GRAPH_M,
        GRAPH_SHARDS,
        N_QUERIES,
        TOPK,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    shards_rows = emb.select(
        "vec_id",
        F.pmod(F.xxhash64("vec_id"), F.lit(GRAPH_SHARDS)).alias("shard"),
        "embedding",
    ).collect()
    by_shard: dict[int, list] = defaultdict(list)
    for r in shards_rows:
        by_shard[int(r.shard)].append(
            (int(r.vec_id), np.asarray(r.embedding, dtype=np.float64))
        )
    queries = sorted(
        (vid, v)
        for rows in by_shard.values()
        for vid, v in rows
        if vid < N_QUERIES
    )

    cand: dict[int, list[tuple[float, int]]] = defaultdict(list)
    for rows in by_shard.values():
        rows = sorted(rows, key=lambda t: t[0])
        ids = np.array([vid for vid, _ in rows])
        V = np.stack([v for _, v in rows])
        n = len(ids)
        norms = np.linalg.norm(V, axis=1)
        G = (V @ V.T) / np.outer(norms, norms)
        np.fill_diagonal(G, -np.inf)
        nbrs = np.argsort(-G, axis=1, kind="stable")[:, : min(GRAPH_M, n - 1)]
        for qid, qv in queries:
            sims = (V @ qv) / (norms * np.linalg.norm(qv))
            beam = [(float(sims[0]), 0)]
            seen = {0}
            grew = True
            while grew:
                grew = False
                for node in [nd for _, nd in beam]:
                    for nb in map(int, nbrs[node]):
                        if nb in seen:
                            continue
                        seen.add(nb)
                        s = float(sims[nb])
                        if len(beam) < GRAPH_EF or s > beam[0][0]:
                            beam.append((s, nb))
                            beam.sort()
                            if len(beam) > GRAPH_EF:
                                beam.pop(0)
                            grew = True
            for s, node in sorted(beam, key=lambda t: (-t[0], ids[t[1]]))[:TOPK]:
                if int(ids[node]) != qid:
                    cand[qid].append((s, int(ids[node])))

    expected = set()
    for qid, lst in cand.items():
        # global merge = the operator's window: cosine desc, vec_id asc
        for rnk, (s, vid) in enumerate(
            sorted(lst, key=lambda t: (-t[0], t[1]))[:TOPK], start=1
        ):
            expected.add((qid, vid, round(s, 6), rnk))

    got = {
        (r.query_id, r.vec_id, r.cosine, r.rnk)
        for r in all_queries()["q_ann_graph"](spark, SF_ORACLE).collect()
    }
    assert got == expected


def test_ivf_pq_oracle_margin_floor(spark):
    """The hash-oracled IVF/PQ family (q_ann_ivf, q_embedding_pq,
    q_ann_pq) matches DuckDB only while no FP argmin / rank tie sits
    within cross-engine accumulated error (sequential zip_with folds vs
    unordered SUM — ~d*eps ~ 1e-13 at these scales) and no ROUND(x, 6)
    input sits on a rounding boundary. This asserts every such margin on
    the oracle fixture is >> that error, so a future near-tie (new
    fixture, changed constants) fails HERE with a named margin instead
    of as an opaque driver hash mismatch (r8 advisory)."""
    import numpy as np

    from aram_matchdata_etl_spark.operators.similarity import (
        IVF_CLUSTERS,
        KMEANS_K,
        KMEANS_ROUNDS,
        N_QUERIES,
        PQ_K,
        PQ_M,
    )

    ARGMIN_MARGIN = 1e-9  # distance-squared units; error bound ~1e-13
    ROUND_MARGIN = 1e-10  # distance from a 0.5e-6 rounding boundary
    RANK_MARGIN = 1e-12  # adjacent-rank gap (0 = exact tie, id-broken)

    rows = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").collect()
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    X = np.array([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    d = X.shape[1]

    def lloyd_margin(P: np.ndarray, k: int, rounds: int) -> float:
        """Min (second_min - min) centroid-distance gap over every
        assignment pass of the deterministic fixed-round trainer,
        including the final assignment consumers run."""
        cents = {int(i): P[ids == i][0] for i in range(k)}
        worst = np.inf
        for r in range(rounds):
            C = np.stack([cents[c] for c in sorted(cents)])
            d2 = ((P[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            d2s = np.sort(d2, axis=1)
            worst = min(worst, float((d2s[:, 1] - d2s[:, 0]).min()))
            assign = np.array(
                [sorted(cents)[j] for j in d2.argmin(axis=1)]
            )
            if r < rounds - 1:
                cents = {
                    int(c): P[assign == c].mean(axis=0)
                    for c in np.unique(assign)
                }
        return worst

    assert lloyd_margin(X, KMEANS_K, KMEANS_ROUNDS) > ARGMIN_MARGIN
    assert lloyd_margin(X, IVF_CLUSTERS, KMEANS_ROUNDS) > ARGMIN_MARGIN
    sub = d // PQ_M
    for sm in range(PQ_M):
        m = lloyd_margin(X[:, sm * sub : (sm + 1) * sub], PQ_K, KMEANS_ROUNDS)
        assert m > ARGMIN_MARGIN, (sm, m)

    # round-6 boundary + rank margins on the cosine surface every ANN
    # top-k (ivf/lsh/graph/brute) draws its output values from
    norms = np.linalg.norm(X, axis=1)
    Q = X[ids < N_QUERIES]
    qn = norms[ids < N_QUERIES]
    cos = (Q @ X.T) / np.outer(qn, norms)  # N_QUERIES x n
    self_mask = ids[None, :] == ids[ids < N_QUERIES][:, None]
    vals = cos[~self_mask].reshape(cos.shape[0], -1)
    for qi in range(cos.shape[0]):
        # only values that can reach an output matter: every ANN key
        # emits top-10, so the top-30 slice covers them with headroom
        c = np.sort(vals[qi])[::-1][:30]
        frac = np.abs((c * 1e6) % 1.0 - 0.5) * 1e-6
        assert float(frac.min()) > ROUND_MARGIN, (qi, float(frac.min()))
        gaps = c[:-1] - c[1:]
        bad = gaps[(gaps != 0.0) & (gaps <= RANK_MARGIN)]
        assert bad.size == 0, (qi, bad)


def test_kmv_overlap_error_bounds(spark):
    """KMV estimates vs exact: the union-distinct estimator's relative
    error concentrates around 1/sqrt(k-1) (~6% at k=256); the Jaccard
    estimator is a k-sample proportion (binomial s.e. <= 0.5/sqrt(k)
    ~3%). Assert 3x-margin bounds per source pair, plus the estimator's
    exactness guarantee when the union sketch is not full."""
    from aram_matchdata_etl_spark.registry import all_queries

    got = {
        (r.s1, r.s2): r
        for r in all_queries()["q_kmv_overlap"](spark, SF_ORACLE).collect()
    }
    assert got, "no source pairs"

    from .oracle_utils import duckdb_df

    exact = duckdb_df(
        """
        WITH v AS (
            SELECT DISTINCT source, w.w AS w
            FROM documents, UNNEST(string_split(text, ' ')) AS w(w)
            WHERE w.w <> ''
        )
        SELECT a.source AS s1, b.source AS s2,
            COUNT(DISTINCT CASE WHEN a.w = b.w THEN a.w END) AS n_inter,
            0 AS dummy
        FROM v a JOIN v b ON a.source < b.source AND a.w = b.w
        GROUP BY 1, 2
        """,
        SF_ORACLE,
    )
    sizes = duckdb_df(
        """
        SELECT source, COUNT(DISTINCT w.w) AS n
        FROM documents, UNNEST(string_split(text, ' ')) AS w(w)
        WHERE w.w <> '' GROUP BY 1
        """,
        SF_ORACLE,
    ).set_index("source")["n"]
    inter = {(r.s1, r.s2): r.n_inter for r in exact.itertuples()}
    for (s1, s2), row in got.items():
        n_union = int(sizes[s1]) + int(sizes[s2]) - inter.get((s1, s2), 0)
        true_j = inter.get((s1, s2), 0) / n_union
        if row.k_eff < 256:
            # union sketch not full -> sketch IS the union: both exact
            assert row.union_distinct_est == n_union
            assert abs(row.jaccard_kmv - true_j) < 1e-6
        else:
            assert abs(row.union_distinct_est - n_union) / n_union < 3 / (255**0.5)
            assert abs(row.jaccard_kmv - true_j) < 3 * 0.5 / (256**0.5)


def test_shingle_cache_survives_clear_cache(spark):
    """Regression (BENCH_r07's 23.3x minhash scale ratio): an external
    spark.catalog.clearCache() — bench.py runs one before EVERY query
    for isolation — unregisters the memoized shingle-set persist from
    the CacheManager; the per-session memo then kept returning a frame
    that silently never cached again, so each later LSH query re-ran
    the full shingle build 3x (signatures + both verification sides).
    shingle_hash_sets must re-persist on cache hit."""
    from pyspark import StorageLevel

    from aram_matchdata_etl_spark.operators.dedup import shingle_hash_sets

    first = shingle_hash_sets(spark, SF_SMOKE)
    first.count()  # materialize the cache
    assert first.storageLevel != StorageLevel.NONE
    spark.catalog.clearCache()
    assert first.storageLevel == StorageLevel.NONE  # the failure mode
    again = shingle_hash_sets(spark, SF_SMOKE)
    assert again.storageLevel != StorageLevel.NONE, (
        "memoized shingle sets must re-persist after an external "
        "clearCache() — otherwise every downstream use re-runs the "
        "corpus-wide shingle build"
    )


def test_media_resize_kernel_and_roundtrip(spark):
    """q_media_resize's pieces, pinned independently of the oracle
    formula: (a) nn_resize is exact nearest-neighbor (matches direct
    integer-index fancy indexing, both down- and up-sampling); (b) the
    formula image survives encode -> decode pixel-exact; (c) the
    executor-side resize_images plumbing reports the same px_sum as a
    driver-side numpy rerun."""
    import numpy as np

    from aram_matchdata_etl_spark.operators.multimodal import (
        _pattern_ppm,
        decode_image,
        nn_resize,
        resize_images,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    down = nn_resize(img, 4, 3)
    assert down.shape == (3, 4, 3)
    rows = (np.arange(3, dtype=np.int64) * 9) // 3
    cols = (np.arange(4, dtype=np.int64) * 7) // 4
    assert np.array_equal(down, img[rows][:, cols])
    up = nn_resize(img, 14, 18)  # upsample repeats source pixels
    assert up.shape == (18, 14, 3)
    assert np.array_equal(up[::2][:, ::2], img)

    payload = _pattern_ppm(42, 7, 9)
    decoded = decode_image(payload)
    assert decoded.shape == (9, 7, 3)
    assert decoded[3, 2, 1] == (42 * 7 + 3 * 5 + 2 * 3 + 1) % 256

    media = spark.createDataFrame(
        [(42, bytearray(payload))], "doc_id long, payload binary"
    )
    row = resize_images(media, 8, 6).collect()[0]
    expect = int(nn_resize(decoded, 8, 6).astype(np.int64).sum())
    assert (row.in_w, row.in_h, row.out_w, row.out_h) == (7, 9, 8, 6)
    assert row.px_sum == expect


def test_semdedup_oracle_margin_floor(spark):
    """q_semdedup's hash oracle depends on three FP comparisons staying
    clear of cross-engine accumulated error (sequential zip_with folds
    vs unordered SUM, ~d*eps ~ 1e-13): the cell argmin (covered by the
    Lloyd margin above at KMEANS_K), the cosine >= SEMDEDUP_COSINE
    threshold, and the keep rule's centroid-distance comparison between
    near-dup partners. Assert the latter two on the oracle fixture so a
    future near-tie fails HERE with a named margin, not as an opaque
    driver hash mismatch (the r8 advisory discipline)."""
    import numpy as np

    from aram_matchdata_etl_spark.operators.similarity import (
        KMEANS_K,
        KMEANS_ROUNDS,
        SEMDEDUP_COSINE,
    )

    THRESH_MARGIN = 1e-9  # cosine distance from the eps boundary
    DIST_MARGIN = 1e-9  # |da - db| on same-cell near-dup pairs

    rows = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").collect()
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    X = np.array([np.asarray(r.embedding, dtype=np.float64) for r in rows])

    # rerun the deterministic trainer to the final assignment + distance
    cents = {int(i): X[ids == i][0] for i in range(KMEANS_K)}
    for r in range(KMEANS_ROUNDS):
        C = np.stack([cents[c] for c in sorted(cents)])
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.array([sorted(cents)[j] for j in d2.argmin(axis=1)])
        if r < KMEANS_ROUNDS - 1:
            cents = {
                int(c): X[assign == c].mean(axis=0)
                for c in np.unique(assign)
            }
    dist = d2.min(axis=1)

    norms = np.linalg.norm(X, axis=1)
    cos = (X @ X.T) / np.outer(norms, norms)
    same_cell = assign[:, None] == assign[None, :]
    off_diag = ids[:, None] != ids[None, :]
    cand = same_cell & off_diag
    # every same-cell cosine must sit clear of the threshold boundary
    gaps = np.abs(cos[cand] - SEMDEDUP_COSINE)
    assert float(gaps.min()) > THRESH_MARGIN, float(gaps.min())
    # every near-dup pair's keep comparison must be decided by distance
    # gaps far above cross-engine noise (exact ties would fall to the
    # vec_id break, which is integer-exact — only NEAR-ties are unsafe)
    nd = cand & (cos >= SEMDEDUP_COSINE)
    ia, ib = np.where(nd)
    dgaps = np.abs(dist[ia] - dist[ib])
    dgaps = dgaps[dgaps != 0.0]
    assert ia.size > 0  # non-vacuous: the fixture has near-dup pairs
    assert float(dgaps.min()) > DIST_MARGIN, float(dgaps.min())


def test_semdedup_join_argmin_matches_literal_path(spark):
    """The large-k assignment fallback (broadcast-frame join argmin,
    engaged past SEMDEDUP_LITERAL_ARGMIN_MAX) must produce the exact
    same SemDeDup output as the literal-folded argmin at a k where both
    can run — proving the switch is a physical-plan choice, not a
    semantics change. (cdist comes from a sequential in-row fold on one
    path and an unordered SUM on the other; the margin-floor test above
    guarantees no decision sits within that FP gap on the fixture.)"""
    from aram_matchdata_etl_spark.operators import similarity as sim

    lit_rows = sorted(
        map(tuple, sim.semdedup_frame(spark, SF_ORACLE, sim.KMEANS_K)
            .collect())
    )
    emb = sim.embeddings_d(spark, SF_ORACLE)
    cents = sim.lloyd_centroids(
        emb.select("vec_id", "vec"), sim.KMEANS_K, sim.KMEANS_ROUNDS
    )
    # drive the private join path directly at the same k
    joined = sim._assign_cells_via_join(emb, cents)
    lit_best = F.sort_array(
        F.array(*sim._centroid_dist_structs(cents))
    )[0]
    lit_cells = emb.select(
        "vec_id", lit_best["cid"].alias("cell"), lit_best["d"].alias("cdist")
    )
    a = joined.select("vec_id", "cell", "cdist").toPandas().sort_values("vec_id").reset_index(drop=True)
    b = lit_cells.toPandas().sort_values("vec_id").reset_index(drop=True)
    assert (a["cell"].to_numpy() == b["cell"].to_numpy()).all()
    # distances agree to FP-fold-vs-SUM noise, decisions exactly
    import numpy as np

    assert np.allclose(a["cdist"], b["cdist"], rtol=1e-9, atol=1e-9)
    assert lit_rows  # literal-path frame is non-empty (sanity)


def test_semdedup_pair_kernel_matches_join_form(spark):
    """The r13 numpy pair kernel (one exchange + per-cell GEMM) must be
    output-identical to the self-join pair stage it replaced — capped
    and uncapped — on the oracle fixture. The only FP divergence is
    dot-product summation order, and test_semdedup_oracle_margin_floor
    pins >= 1e-9 margins on both threshold comparisons, so any mismatch
    here is a semantics bug, not noise."""
    from aram_matchdata_etl_spark.operators import similarity as sim

    emb = sim.embeddings_d(spark, SF_ORACLE)
    cents = sim.lloyd_centroids(
        emb.select("vec_id", "vec"), sim.KMEANS_K, sim.KMEANS_ROUNDS
    )
    best = F.sort_array(F.array(*sim._centroid_dist_structs(cents)))[0]
    cells = emb.select(
        "vec_id", "vec", "vnorm",
        best["cid"].alias("cell"), best["d"].alias("cdist"),
    ).localCheckpoint()
    for cap in (None, 100):
        kern = sorted(map(tuple, sim._semdedup_from_cells(
            cells, cap, "t_kern", cells_checkpointed=True
        ).collect()))
        join = sorted(map(tuple, sim._semdedup_from_cells(
            cells, cap, "t_join", cells_checkpointed=True, pair_impl="join"
        ).collect()))
        assert kern == join, f"kernel/join divergence at cap={cap}"
        assert kern  # non-vacuous


def test_semdedup_zero_norm_and_cell_schema_invariant(spark):
    """ADVICE r13 pair: (a) two zero-norm vectors in a cell give
    cos = 0/0 — NaN in the numpy kernel (mask False, a no-match) but a
    hard ANSI DIVIDE_BY_ZERO error in the unguarded join form, so the
    join form carries a when-guard on the norm product and BOTH
    pair_impls must call the degenerate pair a NO-match; (b) `cell` is
    bigint on every branch (capped join-back included), so cap
    engagement or pair_impl can never flip a consumer's schema."""
    import math

    from aram_matchdata_etl_spark.operators import similarity as sim

    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),  # zero-norm pair: cos is NaN
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),  # true near-dup pair
        (3, [1.0, 1e-6, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        [(i, v, math.sqrt(sum(x * x for x in v))) for i, v in rows],
        "vec_id long, vec array<double>, vnorm double",
    )
    cells = emb.select(
        "vec_id", "vec", "vnorm",
        F.lit(0).alias("cell"), F.lit(0.0).alias("cdist"),
    ).localCheckpoint()
    for cap in (None, 3):
        kern = sim._semdedup_from_cells(
            cells, cap, "t_nan_k", cells_checkpointed=True
        )
        join = sim._semdedup_from_cells(
            cells, cap, "t_nan_j", cells_checkpointed=True, pair_impl="join"
        )
        assert dict(kern.dtypes)["cell"] == "bigint", cap
        assert dict(join.dtypes)["cell"] == "bigint", cap
        kr = sorted(map(tuple, kern.collect()))
        jr = sorted(map(tuple, join.collect()))
        assert kr == jr, f"kernel/join NaN divergence at cap={cap}"
        by_id = {r[0]: r for r in kr}
        # the NaN pair is a no-match: zero near-dups, both kept
        assert by_id[0][2] == 0 and by_id[0][3]
        assert by_id[1][2] == 0 and by_id[1][3]
        if cap is None:
            # the real near-dup pair still registers (non-vacuous)
            assert by_id[2][2] == 1 and by_id[3][2] == 1


def test_semdedup_joined_key_output_and_plan(spark):
    """q_semdedup_joined (the driver-gated join-argmin twin) must (a)
    produce EXACTLY q_semdedup's rows — they share one hash oracle, so
    any drift would be a driver red — and (b) actually TAKE the join
    path: its optimized plan carries the posexplode Generate node the
    assignment join introduces, which the literal-argmin plan never has
    (the guard against the force flag silently not engaging)."""
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    base = qs["q_semdedup"](spark, SF_ORACLE)
    twin = qs["q_semdedup_joined"](spark, SF_ORACLE)
    assert base.columns == twin.columns
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, twin.collect())
    )
    plan_twin = twin._jdf.queryExecution().optimizedPlan().toString()
    plan_base = base._jdf.queryExecution().optimizedPlan().toString()
    assert "posexplode" in plan_twin
    assert "posexplode" not in plan_base


def test_semdedup_scaled_key_invariants(spark):
    """q_semdedup_scaled (production cell sizing, rows-only by design):
    k = ceil(n / SEMDEDUP_TARGET_CELL) on the sf0.01 fixture is 2, so
    every vector lands in cell {0, 1}; output schema matches
    q_semdedup's; every vector appears exactly once; and the drop set
    is non-vacuous (the fixture's planted near-dup blob survives any
    cell partition — fewer cells can only merge blocks, never split a
    near-dup pair's cell... unless k-means separates them, which the
    assertion would catch)."""
    from aram_matchdata_etl_spark.operators.similarity import (
        SEMDEDUP_TARGET_CELL,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    rows = qs["q_semdedup_scaled"](spark, SF_ORACLE).collect()
    n = len(rows)
    assert n == 500 and len({r.vec_id for r in rows}) == n
    k = max(2, -(-n // SEMDEDUP_TARGET_CELL))
    assert {r.cell for r in rows} <= set(range(k))
    base = qs["q_semdedup"](spark, SF_ORACLE)
    assert [f.name for f in base.schema.fields] == [
        "vec_id", "cell", "n_neardups", "is_kept",
    ] == list(rows[0].asDict())
    dropped = sum(1 for r in rows if not r.is_kept)
    assert 0 < dropped < n


def test_semdedup_hier_degenerates_to_flat_at_k1_1(spark):
    """The hierarchical partitioner's correctness anchor: at k1=1 the
    coarse level is a single cell, the fine seeds are the k lowest
    vec_ids (= the flat trainer's seeds on contiguous fixtures), the
    fine update join degenerates to the flat update dataflow, and the
    (d, sub) tie-break is order-isomorphic to the flat (d, seed-vec_id)
    — so per-vector results must be IDENTICAL to semdedup_frame's and
    the cell partitions bijective (labels differ by construction)."""
    from aram_matchdata_etl_spark.operators.similarity import (
        KMEANS_K,
        _semdedup_from_cells,
        embeddings_d,
        hier_cells,
        semdedup_frame,
    )

    flat = {
        r.vec_id: r
        for r in semdedup_frame(spark, SF_ORACLE, KMEANS_K).collect()
    }
    emb = embeddings_d(spark, SF_ORACLE)
    cells = hier_cells(emb, KMEANS_K, k1=1)
    hier = {
        r.vec_id: r
        for r in _semdedup_from_cells(cells, None, "t_hier_k1").collect()
    }
    assert set(flat) == set(hier)
    for v in flat:
        assert (flat[v].n_neardups, flat[v].is_kept) == (
            hier[v].n_neardups, hier[v].is_kept,
        ), v
    label_pairs = {(flat[v].cell, hier[v].cell) for v in flat}
    assert (
        len({a for a, _ in label_pairs})
        == len(label_pairs)
        == len({b for _, b in label_pairs})
    ), "cell partition not bijective"


def test_semdedup_hier_key_invariants(spark):
    """q_semdedup_hier (production sizing + O(n*sqrt(k)) two-level
    assignment, rows-only by design): schema matches q_semdedup's,
    every vector appears exactly once, the drop set is non-vacuous,
    cell count is plausible for k = ceil(n/250), and the auto cell-cap
    probe rides the key and STANDS DOWN on the balanced fixture."""
    from aram_matchdata_etl_spark.operators.similarity import (
        SEMDEDUP_AUTO_CELL_CAP,
        SEMDEDUP_TARGET_CELL,
        SEMDEDUP_TELEMETRY,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    for sf in (SF_SMOKE, SF_ORACLE):
        df = qs["q_semdedup_hier"](spark, sf)
        rows = df.collect()
        n = len(rows)
        assert n == 500 and len({r.vec_id for r in rows}) == n
        assert [f.name for f in df.schema.fields] == [
            "vec_id", "cell", "n_neardups", "is_kept",
        ]
        k = max(2, -(-n // SEMDEDUP_TARGET_CELL))
        assert 1 <= len({r.cell for r in rows}) <= k
        dropped = sum(1 for r in rows if not r.is_kept)
        assert 0 < dropped < n
        t = SEMDEDUP_TELEMETRY["q_semdedup_hier"]
        assert t["cap_engaged"] is False
        assert 0 < t["max_cell"] <= SEMDEDUP_AUTO_CELL_CAP
