"""End-to-end corpus-prep capstone (VERDICT r11 item 5): the full
pretraining-data pipeline a real user of this engine runs — quality
gates -> near-duplicate dedup -> semantic dedup -> sequence packing —
composed from the SHIPPED kernels under one hash oracle.

Construction discipline (the q_zipf_curation_pipeline pattern): the
Spark side CALLS the registered query functions (never re-implements a
stage), and the oracle composes the constituent oracle STRINGS verbatim
as subqueries — the capstone cannot drift from its stages, and the
composition is exactly where join-key and determinism bugs hide.

Corpus choice: the FIXTURE documents/embeddings tables, not the Zipf
corpus — deliberately. The Zipf generator keys every natural word on
(doc_id, pos), so it has NO cross-document near-duplicates by
construction and a MinHash stage over it would be vacuously empty; the
fixture corpus has planted near-dup clusters (exercised by the whole
q_dedup_* family), embeddings with a planted semantic-dup blob
(q_semdedup drops 20/500 at sf0.01), accidental cross-doc 10-token
chunks for the boilerplate gate, and enough df variance for the
perplexity terciles. Every stage of this capstone filters a non-trivial,
DIFFERENT subset (asserted per stage in tests/test_pipelines.py). The
Zipf-corpus quality stack remains q_zipf_curation_pipeline.

Reference parity note: the reference pipeline ends at per-key upsert
into Mongo (extractor/riot/db/mongodb.py:52-56) — it has no corpus
curation at all; this module is part of the LLM-pipeline surface the
brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

# survivors must keep at least this fraction of their chunks after
# boilerplate removal (the q_zipf_curation_pipeline floor)
BOILER_SURVIVAL_MIN = 0.5


def _corpus_prep_oracle() -> str:
    """Compose the five constituent oracles verbatim: repetition gate,
    perplexity gate, boilerplate survival, MinHash+LSH near-dup
    clusters (canonical-only), SemDeDup keep set — then pack the
    survivor set through the q_pack_sequences oracle parameterized onto
    the survivor join."""
    from .dedup import _clusters_lsh_oracle
    from .similarity import _semdedup_oracle
    from .text import _REPETITION_ORACLE, _boilerplate_sql
    from .training import _pack_oracle, _perplexity_buckets_oracle

    pack = _pack_oracle(
        "(SELECT d.doc_id, d.text FROM documents d"
        " JOIN survivors USING (doc_id)) sv"
    )
    return f"""WITH rep AS (
    SELECT doc_id, passes_repetition FROM ({_REPETITION_ORACLE}) r
), ppl AS (
    SELECT doc_id, keep AS ppl_keep FROM ({_perplexity_buckets_oracle()}) p
), boiler AS (
    SELECT doc_id, n_chunks_kept, n_chunks_total
    FROM ({_boilerplate_sql()}) b
), nd AS (
    SELECT doc_id, is_canonical FROM ({_clusters_lsh_oracle()}) c
), sem AS (
    SELECT vec_id, is_kept FROM ({_semdedup_oracle()}) s
), survivors AS (
    SELECT r.doc_id
    FROM rep r
    JOIN ppl USING (doc_id)
    JOIN boiler b USING (doc_id)
    JOIN nd USING (doc_id)
    LEFT JOIN sem ON sem.vec_id = r.doc_id
    WHERE r.passes_repetition AND ppl.ppl_keep
      AND b.n_chunks_kept * 1.0 / b.n_chunks_total >= {BOILER_SURVIVAL_MIN}
      AND nd.is_canonical
      AND COALESCE(sem.is_kept, TRUE)
)
SELECT pk.* FROM ({pack}
) pk"""


@query("q_corpus_prep", oracle=_corpus_prep_oracle())
def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining corpus-prep pipeline end-to-end, one declarative
    plan over the shipped stage graphs:

      1. quality gates — Gopher repetition flag (q_repetition_signals),
         CCNet per-lang perplexity keep (q_perplexity_buckets), and a
         boilerplate-survival floor (>= {floor} of the doc's chunks
         survive q_boilerplate_removal);
      2. near-dup dedup — keep each MinHash+LSH connected component's
         canonical doc (q_dedup_clusters_lsh.is_canonical; exact dups
         are Jaccard-1 members of the same component);
      3. semantic dedup — SemDeDup keep verdict (q_semdedup) joined on
         vec_id = doc_id; docs without an embedding pass (no semantic
         evidence against them);
      4. packing — the survivor set flows through q_pack_sequences'
         graph (pack_sequences_frame), emitting the training artifact:
         (shard, doc_id, chunk_id, chunk_tokens, pack_id, pack_offset).

    The output is deliberately the PACKED CHUNK frame, not a per-doc
    verdict: pack ids are running sums over the survivor order, so a
    single wrong gate verdict anywhere upstream shifts every later
    pack_id in that shard and the driver hash catches it — the
    composition itself is under test, not just the stages. Per-stage
    "why dropped" detail lives in the constituent keys.

    Scale shape: five doc-keyed branches (each with its own documented
    shuffle budget) joined on doc_id at DOC-LEVEL grain — gate columns
    and keep flags only; document bodies cross no gate join (the text
    column re-enters from the documents scan only for the survivor
    pack, and vectors never leave q_semdedup's cell stage). At fixture
    scale AQE broadcasts the survivor id set onto the documents scan;
    at warehouse scale every join here co-locates under doc_id
    bucketing (sources/warehouse.py::write_bucketed), the same posture
    as every doc-keyed composition in this repo.

    Production note: the semantic stage here is the REGISTERED
    q_semdedup (k=8, pinned for oracle determinism). The production
    swap is itself registered: q_corpus_prep_scaled runs the SAME
    pipeline body (corpus_prep_frame) with the semantic stage replaced
    by q_semdedup_hier (corpus-scaled k, hierarchical assignment,
    auto hot-cell cap) — at fixed k the within-cell pair space grows
    O(n^2/k), the measured blow-up SCALE.md "semdedup cell knob"
    documents and the knob removes."""
    from .similarity import q_semdedup

    sem = q_semdedup(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("is_kept").alias("sem_kept")
    )
    return corpus_prep_frame(spark, sf_dir, sem)


def corpus_prep_frame(
    spark: SparkSession, sf_dir: str, sem: DataFrame
) -> DataFrame:
    """The capstone pipeline body shared by q_corpus_prep and
    q_corpus_prep_scaled: gates + near-dup canonical joins, the keep
    rule, and the survivor repack. `sem` is any (doc_id, sem_kept)
    semantic-keep frame; it joins LEFT so docs without an embedding
    pass (no semantic evidence against them). Pure extraction of
    q_corpus_prep's body (r13) — plan byte-identical for the oracled
    key."""
    from .dedup import q_dedup_clusters_lsh
    from .text import q_boilerplate_removal, q_repetition_signals
    from .training import (
        pack_sequences_frame,
        q_perplexity_buckets,
    )

    rep = q_repetition_signals(spark, sf_dir).select(
        "doc_id", "passes_repetition"
    )
    ppl = q_perplexity_buckets(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("ppl_keep")
    )
    boiler = q_boilerplate_removal(spark, sf_dir).select(
        "doc_id", "n_chunks_kept", "n_chunks_total"
    )
    nd = q_dedup_clusters_lsh(spark, sf_dir).select("doc_id", "is_canonical")
    frac = F.col("n_chunks_kept") * 1.0 / F.col("n_chunks_total")
    keep = (
        F.col("passes_repetition")
        & F.col("ppl_keep")
        & (frac >= BOILER_SURVIVAL_MIN)
        & F.col("is_canonical")
        & F.coalesce(F.col("sem_kept"), F.lit(True))
    )
    survivors = (
        rep.join(ppl, "doc_id")
        .join(boiler, "doc_id")
        .join(nd, "doc_id")
        .join(sem, "doc_id", "left")
        .filter(keep)
        .select("doc_id")
    )
    docs = (
        load_table(spark, sf_dir, "documents")
        .join(survivors, "doc_id")
        .select("doc_id", "text")
    )
    return pack_sequences_frame(docs)


q_corpus_prep.__doc__ = q_corpus_prep.__doc__.format(floor=BOILER_SURVIVAL_MIN)


@query("q_corpus_prep_scaled")
def q_corpus_prep_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-prep capstone under the PRODUCTION semantic stage:
    the same pipeline body as q_corpus_prep (corpus_prep_frame — gates,
    near-dup canonicals, survivor repack, all byte-shared), with the
    semantic stage swapped from the fixed-k q_semdedup to the
    registered q_semdedup_hier — corpus-scaled k = ceil(n / 250),
    two-level O(n * sqrt(k)) hierarchical assignment, and the auto
    hot-cell cap probe. This makes q_corpus_prep's "a production run
    swaps that one call" docstring claim a registered, tier-measured
    key instead of a promise: the capstone's 10x tier wall is dominated
    by the fixed-k semdedup oracle graph's designed O(n^2/k) blow-up
    (SCALE.md "corpus-prep capstone measured": ~10-15x), and this key
    is the arm that shows the production policy removes it.

    Rows-only by design, inheriting both of q_semdedup_hier's reasons
    (data-dependent k; IVF-approximate cell boundaries). Correctness
    anchors: the keep rule is rederived independently from the five
    constituent keys and the packed doc set asserted equal
    (tests/test_pipelines.py::test_corpus_prep_scaled_keep_rule), the
    output schema/integrality contract is pinned identical to
    q_corpus_prep's, and every upstream stage except the semantic one
    is the SAME registered graph the hash-oracled capstone runs."""
    from .similarity import q_semdedup_hier

    sem = q_semdedup_hier(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("is_kept").alias("sem_kept")
    )
    return corpus_prep_frame(spark, sf_dir, sem)
