"""q_corpus_prep — the end-to-end corpus-prep capstone (r12): every
stage must filter a real, distinct subset, the keep rule must equal an
independent rederivation from the constituent keys, and the packing
must demonstrably run over the SURVIVOR corpus (not a filter of the
all-corpus packing). Oracle parity itself rides test_oracle_parity.py
like every hash-oracled key."""

from __future__ import annotations

import pytest

from aram_matchdata_etl_spark.operators.pipelines import BOILER_SURVIVAL_MIN

from .conftest import SF_ORACLE


def _stage_maps(spark):
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    rep = {
        r.doc_id: r.passes_repetition
        for r in qs["q_repetition_signals"](spark, SF_ORACLE).collect()
    }
    ppl = {
        r.doc_id: r.keep
        for r in qs["q_perplexity_buckets"](spark, SF_ORACLE).collect()
    }
    boiler = {
        r.doc_id: (r.n_chunks_kept / r.n_chunks_total) >= BOILER_SURVIVAL_MIN
        for r in qs["q_boilerplate_removal"](spark, SF_ORACLE).collect()
    }
    nd = {
        r.doc_id: r.is_canonical
        for r in qs["q_dedup_clusters_lsh"](spark, SF_ORACLE).collect()
    }
    sem = {
        r.vec_id: r.is_kept
        for r in qs["q_semdedup"](spark, SF_ORACLE).collect()
    }
    return rep, ppl, boiler, nd, sem


def test_corpus_prep_keep_rule_and_stage_bindingness(spark):
    """Independent rederivation of the survivor set from the five
    constituent keys; every stage's fail set is non-empty, and four of
    the five are INDIVIDUALLY binding on the sf0.01 fixture (a doc that
    passes everything else fails exactly that stage) — near-dup
    non-canonicals happen to correlate fully with other failures at
    this SF (they are near-COPIES of docs sharing the same gate
    verdicts); that correlation is documented, not pinned (see the
    comment below)."""
    from aram_matchdata_etl_spark.registry import all_queries

    rep, ppl, boiler, nd, sem = _stage_maps(spark)
    docs = sorted(rep)
    assert len(docs) == 500

    fails = {
        "rep": {d for d in docs if not rep[d]},
        "ppl": {d for d in docs if not ppl[d]},
        "boiler": {d for d in docs if not boiler[d]},
        "nd": {d for d in docs if not nd[d]},
        "sem": {d for d in docs if not sem.get(d, True)},
    }
    for name, f in fails.items():
        assert f, f"stage {name} filters nothing — vacuous fixture"
    # the stages disagree pairwise (they measure different things)
    names = sorted(fails)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            assert fails[a] != fails[b], (a, b)

    survivors = {
        d
        for d in docs
        if rep[d] and ppl[d] and boiler[d] and nd[d] and sem.get(d, True)
    }
    assert 0 < len(survivors) < len(docs)

    def only_fails(stage: str, d) -> bool:
        return all(d in fails[s] if s == stage else d not in fails[s]
                   for s in fails)

    for stage in ("rep", "ppl", "boiler", "sem"):
        assert any(only_fails(stage, d) for d in docs), (
            f"stage {stage} never individually binding"
        )
    # nd (near-dup canonicals) is deliberately NOT held to either side
    # (ADVICE r12): on today's fixture its failures fully correlate with
    # other gates (non-canonicals are near-COPIES of docs sharing the
    # same gate verdicts), but a fixture or LSH-parameter change that
    # makes nd individually binding is strictly BETTER coverage, not a
    # regression — pinning never-binding made an improvement fail the
    # suite. The stage's own non-vacuousness + pairwise-disagreement
    # assertions above still cover it.

    got = all_queries()["q_corpus_prep"](spark, SF_ORACLE)
    packed_docs = {r.doc_id for r in got.select("doc_id").distinct().collect()}
    assert packed_docs == survivors


def test_corpus_prep_repacks_the_survivor_corpus(spark):
    """The capstone must PACK the survivor corpus, not filter the
    all-corpus packing: pack ids are running token sums per shard, so
    dropping any earlier doc shifts later assignments. Assert at least
    one surviving chunk carries a different (pack_id, pack_offset) than
    it does in q_pack_sequences over the full corpus — if this ever
    goes empty, the composition silently degenerated to a post-filter."""
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    cap = {
        (r.doc_id, r.chunk_id): (r.pack_id, r.pack_offset)
        for r in qs["q_corpus_prep"](spark, SF_ORACLE).collect()
    }
    full = {
        (r.doc_id, r.chunk_id): (r.pack_id, r.pack_offset)
        for r in qs["q_pack_sequences"](spark, SF_ORACLE).collect()
    }
    assert cap and set(cap) <= set(full)
    moved = [k for k, v in cap.items() if full[k] != v]
    assert moved, "survivor packing identical to all-corpus packing"


def test_corpus_prep_output_is_integer_exact(spark):
    """Driver-hash safety: every output column is integral (the same
    exact-integer contract as q_pack_sequences)."""
    from aram_matchdata_etl_spark.registry import all_queries

    df = all_queries()["q_corpus_prep"](spark, SF_ORACLE)
    assert [f.name for f in df.schema.fields] == [
        "shard", "doc_id", "chunk_id", "chunk_tokens", "pack_id",
        "pack_offset",
    ]
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert all(t in ("bigint", "int") for t in kinds.values()), kinds


@pytest.mark.slow
def test_corpus_prep_scaled_keep_rule_and_contract(spark):
    """q_corpus_prep_scaled (rows-only): independent rederivation of
    the survivor set with the semantic verdicts swapped to
    q_semdedup_hier's — the packed doc set must equal it exactly, and
    the output schema/integrality contract must match the hash-oracled
    capstone's. Every non-semantic stage is the same registered graph
    q_corpus_prep runs (corpus_prep_frame is byte-shared), so this plus
    the capstone's own driver hash covers the composition."""
    from aram_matchdata_etl_spark.registry import all_queries

    qs = all_queries()
    rep, ppl, boiler, nd, _ = _stage_maps(spark)
    sem = {
        r.vec_id: r.is_kept
        for r in qs["q_semdedup_hier"](spark, SF_ORACLE).collect()
    }
    survivors = {
        d
        for d in rep
        if rep[d] and ppl[d] and boiler[d] and nd[d] and sem.get(d, True)
    }
    assert 0 < len(survivors) < len(rep)

    got = qs["q_corpus_prep_scaled"](spark, SF_ORACLE)
    assert [f.name for f in got.schema.fields] == [
        "shard", "doc_id", "chunk_id", "chunk_tokens", "pack_id",
        "pack_offset",
    ]
    kinds = {f.name: f.dataType.simpleString() for f in got.schema.fields}
    assert all(t in ("bigint", "int") for t in kinds.values()), kinds
    assert {r.doc_id for r in got.collect()} == survivors
