"""Physical-plan regression tests: the scale properties the engine
promises (pushdown, pruning, broadcast strategy, minimal exchanges) are
asserted against `.explain` output so a refactor can't silently lose them.
"""

from __future__ import annotations

import pytest

from .conftest import SF_ORACLE


def _plan(spark, name: str) -> str:
    from aram_matchdata_etl_spark.registry import all_queries

    df = all_queries()[name](spark, SF_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    """P2: the equality predicate must appear in the parquet scan's
    PushedFilters, not as a post-scan Filter only."""
    plan = _plan(spark, "q_filter_eq")
    assert "PushedFilters" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan.replace(" ", "").replace(
        "c_mktsegment#", "c_mktsegment,"
    ) or "c_mktsegment" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark):
    """P1: projection prunes the parquet ReadSchema to the 3 selected
    columns — no full-row scan for a 3-column query."""
    plan = _plan(spark, "q_project")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_orderdate" not in read_schema and "o_orderstatus" not in read_schema


def test_dim_joins_broadcast(spark):
    """Small dims must broadcast (hash join), never sort-merge."""
    plan = _plan(spark, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_flagship_single_exchange(spark):
    """The whole flagship pipeline (team window + rank window) runs on ONE
    hash exchange: partitioning by match_id satisfies both windows'
    clustering requirements."""
    plan = _plan(spark, "q_player_rank")
    assert plan.count("Exchange") == 1, plan


def test_topk_plans_take_ordered(spark):
    """O2: ORDER BY + LIMIT must plan TakeOrderedAndProject (per-partition
    heaps, O(k) memory), not a global sort."""
    plan = _plan(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan


def test_semi_join_stays_semi(spark):
    """J3: the EXISTS shape plans as a semi join (no row multiplication)."""
    plan = _plan(spark, "q_semi_join")
    assert "LeftSemi" in plan


def test_whole_stage_codegen_covers_flagship(spark):
    """The feature expressions must run inside whole-stage codegen, not
    interpreted projection. AQE only materializes codegen stages in the
    FINAL plan, so execute first."""
    from aram_matchdata_etl_spark.registry import all_queries

    df = all_queries()["q_player_rank"](spark, SF_ORACLE)
    df.collect()  # .write would spawn a separate QueryExecution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # codegen stages render as "*(n)" markers in the final plan
    assert "*(" in plan


@pytest.mark.slow
def test_no_cartesian_in_registry_except_intended(spark):
    """Guardrail: nothing plans an accidental CartesianProduct. The
    intended brute-force similarity scans use broadcast nested-loop (small
    side broadcast), which is fine; a CartesianProduct of two big sides is
    always a bug."""
    from aram_matchdata_etl_spark.registry import all_queries

    offenders = []
    for name, fn in sorted(all_queries().items()):
        df = fn(spark, SF_ORACLE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == [], offenders


def test_multijoin_pushdown_and_broadcast(spark):
    """TPC-H Q3 shape: every per-table predicate reaches its scan, and the
    filtered customer dim broadcasts instead of shuffling the fact."""
    plan = _plan(spark, "q_multijoin_pushdown")
    pushed = [seg.splitlines()[0] for seg in plan.split("PushedFilters:")[1:]]
    assert any("c_mktsegment" in s for s in pushed), pushed
    assert any("o_orderdate" in s for s in pushed), pushed
    assert any("l_shipdate" in s for s in pushed), pushed
    assert "BroadcastHashJoin" in plan


def test_multijoin_star_all_dims_broadcast(spark):
    """TPC-H Q5 shape: region/nation/customer chain must broadcast; the
    only sort-merge-eligible join is fact-to-fact (orders-lineitem)."""
    plan = _plan(spark, "q_multijoin_star")
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_interval_join_is_equi_not_bnlj(spark):
    """The binned interval join must plan as a hash/sort-merge equi-join
    on (user_id, bin) — never BroadcastNestedLoopJoin."""
    plan = _plan(spark, "q_interval_join_binned")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_single_exchange(spark):
    """Sharded packing: one exchange on shard serves the window; the
    explode and arithmetic stay narrow."""
    plan = _plan(spark, "q_pack_sequences")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_boilerplate_freq_join_broadcasts(spark):
    """Boilerplate removal: on the fixture, AQE must broadcast the
    (measured-small) boilerplate set — membership tests run in a hash
    join, never a sort-merge join — and the wide stages stay bounded by
    the chunk-frequency aggregation + removed-index groupBy. Invariants
    only (no exact exchange census: that count shifts across Spark
    minors/AQE planning without any semantic regression — ADVICE r4).
    The broadcast is asserted on the FINAL adaptive plan because the hint
    is gone by design: at web scale the set can outgrow a broadcast, and
    AQE decides from runtime sizes."""
    from aram_matchdata_etl_spark.registry import all_queries

    df = all_queries()["q_boilerplate_removal"](spark, SF_ORACLE)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_embedding_quantize_stays_narrow(spark):
    """Per-vector quantization is embarrassingly parallel: no hash
    exchange, no join — only the input-spread repartition."""
    plan = _plan(spark, "q_embedding_quantize")
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan


def test_pretrain_pipeline_stage_fusion(spark):
    """The composed dedup->lang->quality->budget pipeline must stay ONE
    fused plan: a single fingerprint hash exchange feeding the window,
    one final per-source aggregation exchange, no joins at all (scoring
    is per-row codegen on the window's output), no extra barriers."""
    plan = _plan(spark, "q_pretrain_pipeline")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_bigram_lm_no_cartesian_and_broadcast_vocab(spark):
    """Bigram LM scoring: V is a 1-row broadcast (nested-loop join on a
    single-row side is the broadcast scalar pattern, not a data cartesian)
    and the count-table joins are hash joins, never sort-merge on the
    fixture. r13: assert on the FINAL adaptive plan of an executed
    query — the r13 bgc localCheckpoint gives the count table
    LogicalRDD's pessimistic size estimate, so the INITIAL plan now
    conservatively picks sort-merge for the doc_id join-back (the
    correct choice at corpus scale, where both sides are doc-grain) and
    AQE demotes it to broadcast from the observed fixture size at
    runtime; AdaptiveSparkPlan.toString appends that initial plan after
    the final one, which the old whole-string match tripped over."""
    from aram_matchdata_etl_spark.registry import all_queries

    df = all_queries()["q_bigram_lm_score"](spark, SF_ORACLE)
    df.collect()  # the dataset's OWN QueryExecution must finalize
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    final = plan.split("Initial Plan")[0]
    assert "SortMergeJoin" not in final, final
    assert "BroadcastExchange" in final or "BroadcastHashJoin" in final, final


def test_pq_adc_codebooks_broadcast(spark):
    """PQ ADC search: the codebook-derived lookup table must broadcast
    (it is m*k-sized by construction); the corpus side must never
    sort-merge against it."""
    from aram_matchdata_etl_spark.registry import all_queries

    df = all_queries()["q_ann_pq"](spark, SF_ORACLE)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_bm25_postings_prune_and_broadcast(spark):
    """BM25: the query-term/df/stats sides are workload-sized and must all
    broadcast onto the tf table (the posting-list read); the corpus never
    sort-merges against them, and ranking partitions by query_id (no
    global single-partition window)."""
    from aram_matchdata_etl_spark.registry import all_queries

    df = all_queries()["q_bm25_topk"](spark, SF_ORACLE)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # qterms AND df_ both hash-broadcast onto tf (the 1-row stats frame
    # rides a broadcast nested-loop cross — the broadcast-scalar pattern,
    # whose SinglePartition exchange is the 1-row agg itself, not a data
    # funnel)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "hashpartitioning(query_id" in plan, plan


def test_dsir_weight_table_broadcasts(spark):
    """DSIR: the bucket-count log-ratio table is DSIR_BUCKETS rows BY
    CONSTRUCTION and must broadcast onto the exploded token stream; the
    corpus-side frame shuffles only for the per-doc aggregation."""
    from aram_matchdata_etl_spark.registry import all_queries

    df = all_queries()["q_dsir_weights"](spark, SF_ORACLE)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the token-stream x weight-table join keys on bkt and must be a
    # broadcast hash join — an SMJ there would shuffle the exploded
    # corpus a second time
    assert "SortMergeJoin [bkt" not in plan, plan
    assert "BroadcastHashJoin [bkt" in plan, plan
    # the final doc-level null-safety left join may legitimately
    # sort-merge: both sides are corpus-scale, so that IS the scale plan
    # (AQE broadcasts it at fixture size in the adaptive run).


def test_dsir_resample_plans_take_ordered(spark):
    """The Gumbel top-k draw must plan TakeOrderedAndProject (per-
    partition heaps, O(k) driver memory) — never a global sort or a
    single-partition window."""
    plan = _plan(spark, "q_dsir_resample")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange SinglePartition" not in plan.split("TakeOrderedAndProject")[0], plan


def test_collocations_take_ordered_no_cartesian(spark):
    """PMI top-k: bigram generation is in-row (no self-join), the final
    cutoff plans TakeOrderedAndProject, and the only cross join is the
    broadcast single-row totals frame."""
    plan = _plan(spark, "q_collocations")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_funnel_plan_single_user_exchange(spark):
    """Registry-level twin of the unit plan test: the funnel must keep
    exactly one user_id exchange and no joins."""
    plan = _plan(spark, "q_funnel")
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_web_curation_pipeline_single_exchange_no_join(spark):
    """The fused curation pipeline must stay one plan: narrow gates
    around ONE fingerprint exchange (the dedup window), zero joins,
    zero extra corpus scans."""
    plan = _plan(spark, "q_web_curation_pipeline")
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("FileScan parquet") == 1, plan


def test_scd2_single_exchange(spark):
    """All three SCD2 windows (dedup-lag, change filter, LEAD chaining)
    must share ONE user_id exchange."""
    plan = _plan(spark, "q_scd2_build")
    assert plan.count("Exchange") == 1, plan


def test_mannwhitney_windows_post_rollup(spark):
    """The rank window must run over the per-value ROLLUP, not the raw
    events: exactly one aggregate below the window, no raw-corpus sort
    (<= 2 exchanges: rollup shuffle + single-partition window of the
    distinct-value table)."""
    plan = _plan(spark, "q_mannwhitney_u")
    assert plan.count("Exchange") <= 2, plan
    assert "SortMergeJoin" not in plan


def test_link_predict_take_ordered_no_smj(spark):
    """Top-k link prediction: TakeOrderedAndProject cut, no sort-merge
    join (node-id joins broadcast or hash at fixture scale), and the
    edge set materialized once (checkpointed scan, not 5 re-derivations)."""
    plan = _plan(spark, "q_link_predict")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "Scan ExistingRDD" in plan  # the localCheckpoint reuse


def test_rank_fusion_take_ordered_single_exchange(spark):
    """RRF: two global rank windows share one exchange; the final cut is
    TakeOrderedAndProject."""
    plan = _plan(spark, "q_rank_fusion")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 1, plan


def test_kmv_pair_stage_broadcasts(spark):
    """KMV: the source-pair attach must broadcast (sketches are <= k rows
    by construction) — no sort-merge join anywhere."""
    plan = _plan(spark, "q_kmv_overlap")
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoop" in plan or "BroadcastHashJoin" in plan


def test_chunked_zscore_spreads_hot_user(spark):
    """The skew mitigation is only real if the expensive window runs on a
    (user_id, chunk) exchange: Catalyst legally satisfies that window's
    clustering with an upstream user_id-only exchange (subset
    partitioning), which would put every chunk of a hot user back into
    one task (r7 plan-audit finding, SCALE.md). Pin the explicit
    spreading exchange."""
    import re

    from aram_matchdata_etl_spark.operators.events_analytics import (
        anomaly_zscore_chunked,
    )
    from aram_matchdata_etl_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    plan = (
        anomaly_zscore_chunked(ev, chunk=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    parts = re.findall(r"hashpartitioning\(([^)]*?), \d+\)", plan)
    assert any(
        "user_id" in p and "chunk" in p for p in parts
    ), f"no (user_id, chunk) exchange in plan partitions: {parts}"


def test_ks_windows_post_rollup(spark):
    """KS: both ECDF cumulative windows run over the per-distinct-value
    rollup (one aggregate below them), never the raw events — same
    discipline as q_mannwhitney_u."""
    plan = _plan(spark, "q_ks_test")
    assert plan.count("Exchange") <= 2, plan
    assert "SortMergeJoin" not in plan


def test_autocorr_rollup_joins_broadcast(spark):
    """ACF: the lag self-join runs on the |days|-row rollup and must
    broadcast — a sort-merge join here would mean the join runs at
    event scale."""
    plan = _plan(spark, "q_autocorr")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_bootstrap_point_estimate_join_broadcasts(spark):
    """Poisson bootstrap: the replicate-means frame (groups x B rows)
    joins the point-estimate table (|groups| rows) — broadcast, never
    sort-merge; and the grid stays join-free (weights derive locally)."""
    plan = _plan(spark, "q_bootstrap_ci")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_setsim_all_joins_equi(spark):
    """Prefix-filtered set-sim join: candidate generation and verify are
    equi-joins on shingle/doc keys — no nested-loop fallback, no
    cartesian anywhere (the whole point vs all-pairs)."""
    plan = _plan(spark, "q_setsim_prefix_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_gini_single_scan_rollup_first(spark):
    """Gini: one pass over events to the per-(type, user) rollup; the
    rank windows run on the rollup only."""
    plan = _plan(spark, "q_gini")
    assert plan.count("Scan parquet") == 1, plan
    assert "SortMergeJoin" not in plan


def test_ohlc_single_exchange(spark):
    """q_ohlc's two ROW_NUMBER windows and the final groupBy all cluster
    by (event_type, day): ONE hash exchange total."""
    plan = _plan(spark, "q_ohlc")
    assert plan.count("Exchange") == 1, plan


def test_k_anonymity_single_corpus_shuffle(spark):
    """The generalization ladder must be ONE scan + one class-key shuffle
    (widths explode per row), never one aggregation pass per rung: the
    plan carries exactly one Generate (explode) and the scan appears
    once."""
    plan = _plan(spark, "q_k_anonymity")
    assert plan.count("Generate") == 1, plan
    assert plan.count("Scan parquet") == 1, plan


def test_skyline_no_cartesian_no_smj(spark):
    """The sort-cummax skyline must keep the dominance test at
    distinct-price scale: broadcast join back, no cartesian product, no
    sort-merge join of the corpus against itself."""
    plan = _plan(spark, "q_skyline")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_rfm_single_user_rollup(spark):
    """RFM reduces the corpus to ONE per-user rollup before any NTILE —
    exactly one user_id hash exchange (the anchor-date scalar adds a
    second scan, but never a second corpus shuffle)."""
    plan = _plan(spark, "q_rfm_segmentation")
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert plan.count("Scan parquet") == 2, plan  # anchor scalar + rollup


def test_kruskal_windows_post_rollup(spark):
    """Kruskal-Wallis's rank cumsum must run over the distinct-value
    rollup — the corpus-side plan is aggregates only (no Window before
    the first HashAggregate over events)."""
    plan = _plan(spark, "q_kruskal_wallis")
    scan_to_first_agg = plan.split("HashAggregate")[-1]
    assert "Window" not in scan_to_first_agg, plan


def test_streaks_windows_post_distinct_rollup(spark):
    """Gaps-and-islands runs its windows over the (user, day) DISTINCT
    rollup, partitioned by user_id — one user_id exchange family, no
    unpartitioned window anywhere."""
    plan = _plan(spark, "q_streaks")
    assert "hashpartitioning(user_id" in plan, plan
    # every Window must be user_id-partitioned (no global windows)
    for frag in plan.split("Window")[1:]:
        head = frag[:200]
        if "windowspecdefinition" in head:
            assert "user_id" in head, plan


def test_cdc_apply_single_exchange(spark):
    """CDC latest-wins: both windows (change count + recency rank) share
    ONE user_id exchange; never a state self-join."""
    plan = _plan(spark, "q_cdc_apply")
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan


def test_kmeans_assignment_shuffle_free(spark):
    """Lloyd assignment folds the k x d centroid matrix into the plan as
    literals: the FINAL assignment (the returned frame) is scan ->
    project -> sort, with no join and no aggregation exchange on the
    corpus side (the output sort is the only exchange)."""
    plan = _plan(spark, "q_kmeans_lloyd")
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 2, plan  # rangepartitioning for sort


def test_attribution_position_copartitions_on_user(spark):
    """The purchases x touches pairing is a user_id EQUI-join — broadcast
    when the purchase side is small (what AQE picks at fixture scale),
    shuffle-on-user_id at corpus scale; the range predicate must stay a
    post-join filter, never a nested-loop join condition."""
    plan = _plan(spark, "q_attribution_position")
    assert (
        "BroadcastHashJoin [user_id" in plan
        or "hashpartitioning(user_id" in plan
    ), plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_ann_ivf_no_vectors_through_shuffle(spark):
    """IVF (r8 rework): cell assignment/probing is an in-row sort_array
    argmin over centroid literals (no crossJoin + row_number exchange),
    candidate dedup happens AFTER scoring so only (query_id, vec_id,
    cosine) scalars cross the distinct exchange — never the 64-double
    vectors (the pre-r8 dropDuplicates dragged them through a
    first()-aggregate), and the probe side reaches the index via a
    broadcast join on cell."""
    plan = _plan(spark, "q_ann_ivf")
    assert "first(" not in plan, plan  # the vector-carrying dedup agg
    assert "BroadcastHashJoin [cell" in plan, plan
    assert "sort_array" in plan, plan  # in-row centroid ranking
    assert "CartesianProduct" not in plan, plan


def test_gopher_zipf_no_corpus_shuffle(spark):
    """q_repetition_gopher_zipf: corpus generation and all nine gram
    statistics are in-row expressions — the plan must carry NO hash or
    single-partition exchange (the only allowed exchange is
    spread_input's fixture-shape round robin, absent on well-partitioned
    production input)."""
    plan = _plan(spark, "q_repetition_gopher_zipf")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    # r12: the shipped plan is the Arrow kernel (race winner); the HOF
    # twin must keep the same zero-shuffle shape WITHOUT a Python stage
    assert "MapInPandas" in plan, plan
    plan_hof = _plan(spark, "q_repetition_gopher_zipf_hof")
    assert "MapInPandas" not in plan_hof, plan_hof
    assert "Exchange hashpartitioning" not in plan_hof, plan_hof
    assert "Exchange SinglePartition" not in plan_hof, plan_hof
    assert (
        "SortMergeJoin" not in plan_hof
        and "BroadcastHashJoin" not in plan_hof
    )


def test_hybrid_rrf_semantics_and_plan(spark):
    """Hybrid retrieval fusion: per query exactly HYBRID_TOPK fused rows
    with contiguous ranks ordered by (rrf desc, doc_id); every rrf_score
    is EXACTLY the integer-rank arithmetic round(1/(K+lex) + 1/(K+dense))
    with absent lists contributing 0; both single-list classes occur on
    the fixture (the fusion is not a rename of either ranker). Plan: all
    rank windows key on query_id (no global funnel), the ranker sides
    broadcast; the one SortMergeJoin is the full-outer fusion of two
    top-k-bounded lists (Spark cannot broadcast-hash a full outer), which
    is ~queries x 2k rows at any corpus size."""
    from aram_matchdata_etl_spark.operators.text import (
        HYBRID_QUERIES,
        HYBRID_TOPK,
        RRF_K,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    df = all_queries()["q_hybrid_rrf"](spark, SF_ORACLE)
    rows = df.collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == HYBRID_QUERIES
    for q, rs in by_q.items():
        assert sorted(r.fused_rank for r in rs) == list(
            range(1, HYBRID_TOPK + 1)
        )
        rs = sorted(rs, key=lambda r: r.fused_rank)
        for a, b in zip(rs, rs[1:]):
            ka = (-a.rrf_score, a.doc_id)
            kb = (-b.rrf_score, b.doc_id)
            assert ka < kb, (q, a, b)
    for r in rows:
        want = round(
            (1.0 / (RRF_K + r.lex_rank) if r.lex_rank is not None else 0.0)
            + (
                1.0 / (RRF_K + r.dense_rank)
                if r.dense_rank is not None
                else 0.0
            ),
            6,
        )
        assert abs(r.rrf_score - want) < 1e-12, r
        assert r.lex_rank is not None or r.dense_rank is not None
    assert any(r.lex_rank is None for r in rows)
    assert any(r.dense_rank is None for r in rows)

    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the collect() above finalized this df's own AQE execution, so
    # toString carries BOTH "== Final Plan ==" and "== Initial Plan =="
    # sections — count nodes in the final section only
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("SortMergeJoin") <= 1, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "hashpartitioning(query_id" in plan, plan
