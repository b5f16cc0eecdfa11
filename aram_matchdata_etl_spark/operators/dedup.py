"""Deduplication operators over ``documents`` (north-star, BASELINE.json):
exact, n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup
(the last one in operators/similarity.py).

Scale design (the whole point of these operators at 100 TB):
  - exact dedup: group on a 128-bit fingerprint, never on the raw text —
    the shuffle moves 16-byte keys, not documents.
  - n-gram Jaccard is the EXACT answer but is quadratic in the worst case
    (shingle-join blowup on common shingles); it is the small-scale oracle.
  - MinHash+LSH is the scale path: k min-hashes per doc (one pass), band
    into buckets, only same-bucket pairs are candidates → the shuffle is
    O(docs × bands), candidate verification touches a tiny pair subset.
  - SimHash: one 32-bit signature per doc; near-dups collide on at least
    one 16-bit half (pigeonhole for hamming distance ≤ its guarantee), so
    candidate generation is two equi-joins.
"""

from __future__ import annotations

import weakref
from contextlib import contextmanager

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table, spread_input

JACCARD_THRESHOLD = 0.5

# Shared doc -> distinct word-bigram shingles (dialect-twin pair).
_SHINGLES_SQL = """
shingles AS (
    SELECT DISTINCT doc_id,
        CONCAT(t[i], ' ', t[i + 1]) AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d,
        UNNEST(generate_series(1, len(t) - 1)) AS g(i)
)"""


def bigram_col(toks):
    """Word-bigram array from a token array — zip of the array with its
    own tail. NOTE: the naive `sequence(1, size-1)` formulation is a trap:
    Spark's sequence(1, 0) yields a DESCENDING [1, 0] (not empty), so
    single-token documents crash on element_at — found by the hypothesis
    differential test. slice() degrades to an empty array instead."""
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-bigram shingles per document, built with native array
    functions (slice + zip_with + explode — all codegen, no UDF)."""
    # fixture files are single-row-group → 1 input partition; spread the
    # shingle fan-out across the cluster before the explode
    docs = spread_input(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    return (
        docs.select("doc_id", F.explode(bigram_col(toks)).alias("shingle"))
        .distinct()
    )


def exact_jaccard_pairs(sh: DataFrame, threshold: float) -> DataFrame:
    """Pairwise Jaccard over distinct shingle sets via shingle equi-join.
    Exact; quadratic on hot shingles — see module docstring.

    r13 (guide §2.3): each shingle row carries its document's set size
    into the self-join, so the per-pair sizes ride the aggregation key
    and the intersection counts need NO post-aggregation size joins —
    the old form re-joined the sizes frame twice against the full
    candidate-pair output (10.3M rows at sf0.1 for 256 survivors).
    Same integer arithmetic, bit-identical jaccard."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    swn = sh.join(sizes, "doc_id")
    a = swn.alias("a")
    b = swn.alias("b")
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count("*").alias("n_common"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "q_dedup_exact",
    oracle="""
WITH fp AS (
    SELECT doc_id, lang, source, n_chars, md5(text) AS fingerprint FROM documents
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
    FROM fp
)
SELECT doc_id, lang, source, n_chars, fingerprint FROM ranked WHERE rn = 1""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest-doc_id representative per content
    fingerprint. Hash-groupBy on md5(text) (16-byte shuffle key) — the
    100 TB-safe form of dropDuplicates(['text'])."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "fingerprint", F.md5(F.col("text"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars", "fingerprint")
    )


@query(
    "q_dedup_ngram_jaccard",
    oracle="WITH "
    + _SHINGLES_SQL.lstrip()
    + f""",
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM shingles a
    JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
    ROUND(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.doc_a = sa.doc_id
JOIN sizes sb ON inter.doc_b = sb.doc_id
WHERE n_common / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}""",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates by exact word-bigram Jaccard >= 0.5. Integer
    set arithmetic throughout → the jaccard double is bit-identical to the
    oracle's. This is the small-scale exact baseline; q_dedup_minhash_lsh
    is the sub-quadratic scale path."""
    return exact_jaccard_pairs(shingles(spark, sf_dir), JACCARD_THRESHOLD)


# Pair-generation CTE chain shared by the ngram-jaccard oracle and the
# cluster oracle (threshold substituted at use site).
_PAIRS_CTES = (
    _SHINGLES_SQL.lstrip()
    + f""",
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM shingles a
    JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pairs AS (
    SELECT doc_a, doc_b
    FROM inter
    JOIN sizes sa ON inter.doc_a = sa.doc_id
    JOIN sizes sb ON inter.doc_b = sb.doc_id
    WHERE n_common / (sa.n + sb.n - n_common) >= {JACCARD_THRESHOLD}
)"""
)


_CLUSTERS_ORACLE = (
    "WITH RECURSIVE "
    + _PAIRS_CTES
    + """,
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
),
reach(u, label) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u
)
SELECT u AS doc_id, MIN(label) AS cluster_id,
    (u = MIN(label)) AS is_canonical
FROM reach GROUP BY u"""
)


@query("q_dedup_clusters", oracle=_CLUSTERS_ORACLE)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph — the step that
    turns pairwise dedup output into an actionable corpus: every document
    gets a cluster_id (the component's min doc_id) and exactly one doc per
    cluster is flagged canonical (what you keep; the rest are the removal
    list). The reference stops at per-key upsert dedup
    (extractor/riot/db/mongodb.py:52-56); near-dup dedup at corpus scale
    needs transitive closure, since A~B and B~C must collapse to one
    cluster even when A~C misses the threshold.

    Algorithm: iterative min-label propagation. Each round every vertex
    takes min(own label, neighbors' labels); converges in O(component
    diameter) rounds — near-dup clusters are shallow (dozens of docs, not
    chains of millions), so a handful of rounds suffice. Each round is one
    shuffle of the edge list by dst plus a shuffle of labels by key;
    labels are localCheckpoint()ed per round so the plan does not grow
    with iterations (lineage truncation, not recomputation). At larger
    diameters swap in the large-star/small-star variant (alternating
    pointer-jumping, O(log n) rounds) — same loop shape.

    Pair input here is the exact bigram-Jaccard operator (SQL-expressible
    → full oracle); the 100 TB path feeds the identical loop from
    lsh_candidate_pairs + exact verification (same (doc_a, doc_b)
    schema). r13 A/B note (OPTIMIZATION_r13.md): swapping the pair
    stage for the lossless AllPairs prefix join measured 7x SLOWER on
    this fixture — its small bigram vocabulary leaves even the
    rarest-half prefixes hot (16.5M raw prefix matches vs the naive
    join's 10.3M aggregated candidates), so the naive direct-aggregation
    form is the right shape here and prefix filtering stays the
    rare-token-corpus tool (q_setsim_*)."""
    pairs = exact_jaccard_pairs(shingles(spark, sf_dir), JACCARD_THRESHOLD)
    return connected_components(
        load_table(spark, sf_dir, "documents"), pairs, tag="exact"
    )


def _free_checkpoint(df: DataFrame) -> None:
    """Release a localCheckpoint()ed DataFrame's block-manager blocks.

    ``DataFrame.unpersist()`` only clears cacheManager entries (persist/
    cache) — a local checkpoint's blocks belong to the underlying
    checkpointed RDD, reachable through the plan's LogicalRDD node. Only
    call this on SUPERSEDED checkpoints: a locally-checkpointed RDD cannot
    be recomputed after unpersist."""
    try:
        df._jdf.queryExecution().logical().rdd().unpersist(False)
    except Exception:  # pragma: no cover - internals moved; GC reclaims later
        pass


class _LoopCheckpoints:
    """Checkpoint bookkeeping for one iterative loop (see
    ``loop_checkpoints``). ``swap`` manages the ROLLING frame (each round's
    localCheckpoint superseding the previous); ``own`` registers loop-
    scoped SCRATCH frames (edge lists etc.) freed on every exit path."""

    def __init__(self) -> None:
        self.live: DataFrame | None = None
        self._scratch: list[DataFrame] = []

    def own(self, frame: DataFrame) -> DataFrame:
        self._scratch.append(frame)
        return frame

    def swap(self, new: DataFrame) -> DataFrame:
        """Adopt ``new`` as the live rolling checkpoint, freeing the
        superseded one. Safety requirement: ``new`` must no longer need
        the superseded frame's BLOCKS. Sufficient conditions (r10
        mechanism probe, tests/test_loop_checkpoints.py::
        test_shuffle_separated_free_is_safe): (a) an action has
        materialized ``new``, or (b) ``new`` is a lazy
        localCheckpoint(eager=False) whose lineage crosses an EXCHANGE
        from the old frame — AQE executes upstream shuffle stages at
        checkpoint-definition time, so the old frame's data already sits
        in shuffle outputs. A NARROW lazy dependent (no exchange) still
        reads the old blocks directly and dies with
        CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND after the free."""
        old, self.live = self.live, new
        if old is not None:
            _free_checkpoint(old)
        return new

    def release_live(self) -> None:
        """Demote the live frame to scratch (freed on exit): call when
        the loop's result was re-materialized into a NEW frame, so the
        final rolling checkpoint no longer escapes the ``with``."""
        if self.live is not None:
            self._scratch.append(self.live)
            self.live = None


@contextmanager
def loop_checkpoints():
    """Close the iterative-loop checkpoint-leak class (r9 ROADMAP item;
    12 rolling-checkpoint loops shared it): on an exception mid-round the
    live rolling frame AND the loop's scratch frames are freed; on normal
    exit only the scratch frames are (the live frame IS the loop's result
    — its blocks must outlive the ``with``, since a localCheckpoint
    cannot be recomputed once unpersisted).

        with loop_checkpoints() as lc:
            edges = lc.own(raw.localCheckpoint())
            state = lc.swap(init.localCheckpoint())
            for _ in range(rounds):
                new = step(state, edges).localCheckpoint(eager=False)
                stat = new.agg(...).first()   # materializes `new`
                state = lc.swap(new)
            return state.select(...)
    """
    lc = _LoopCheckpoints()
    try:
        yield lc
    except BaseException:
        if lc.live is not None:
            _free_checkpoint(lc.live)
        raise
    finally:
        for frame in lc._scratch:
            _free_checkpoint(frame)


# Telemetry from the most recent connected_components() run per tag
# (VERDICT r3 item 4): per-round changed-counts + partition counts, so a
# bench-to-bench regression decomposes into "extra convergence round" vs
# "partition/checkpoint pressure" without rerunning under instrumentation.
# bench.py folds this into its JSON output.
CC_TELEMETRY: dict[str, dict] = {}

# auto-escalation: min-label propagates one hop per round, so a component
# still changing after this many rounds has diameter > ESCALATE_ROUNDS —
# restart on the O(log n)-round star-contraction path. Near-dup clusters
# are shallow (converge in 2-4 rounds); escalation only fires on
# chain/mesh-shaped graphs where min-label is the wrong tool.
ESCALATE_ROUNDS = 8


def connected_components(
    docs: DataFrame,
    pairs: DataFrame,
    algorithm: str = "auto",
    tag: str = "default",
) -> DataFrame:
    """Connected components over a (doc_a, doc_b) pair relation; see
    q_dedup_clusters for the algorithm/scale discussion. Pair input is
    pluggable: exact Jaccard for the oracle-checked form, LSH-verified
    for the sub-quadratic scale form.

    algorithm:
      - 'min_label' — one-hop min-label propagation, O(diameter) rounds.
        Cheapest per round; right for the shallow components near-dup
        graphs produce.
      - 'star' — alternating large-star/small-star contraction (Kiveris
        et al., "Connected Components in MapReduce and Beyond", SoCC'14):
        O(log n) rounds regardless of diameter; each round shuffles the
        edge list twice. Right for deep (chain/mesh) graphs.
      - 'auto' (default) — min_label, escalating to star if still
        unconverged after ESCALATE_ROUNDS (a runtime diameter probe: one
        hop per round means an unconverged round-k graph has diameter>k).
        Escalation SEEDS star with the partially-contracted graph (pairs
        mapped through the round-k labels), so the min-label rounds are
        never wasted: shallow components are already collapsed and star
        only contracts the deep residue.

    Pair endpoints outside the docs universe never bridge components and
    never appear as cluster ids (both algorithms agree: such edges are
    ignored, matching min-label's natural semantics).
    """
    telemetry: dict = {"algorithm": None, "rounds": 0, "changed_per_round": []}
    CC_TELEMETRY[tag] = telemetry
    if algorithm not in ("auto", "min_label", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if algorithm in ("auto", "min_label"):
        max_rounds = ESCALATE_ROUNDS if algorithm == "auto" else 20
        result, labels = _cc_min_label(docs, pairs, max_rounds, telemetry)
        if result is not None:
            return result
        if algorithm == "min_label":  # pragma: no cover - cap >> diameter
            raise RuntimeError("label propagation did not converge in 20 rounds")
        telemetry["escalated"] = True
        # Contract pairs through the round-k labels: intra-cluster edges
        # vanish, endpoints become super-nodes (their current labels), and
        # phantom endpoints (no label row) drop out in the inner joins.
        # Star then runs on the much smaller residual graph; the final
        # labeling composes doc -> min-label -> star cluster. Correctness:
        # labels only ever decrease from self, so the global min doc of a
        # component keeps label==itself, survives contraction as a
        # super-node, and star returns it as the component min.
        la = labels.select(
            F.col("u").alias("doc_a"), F.col("label").alias("la")
        )
        lb = labels.select(
            F.col("u").alias("doc_b"), F.col("label").alias("lb")
        )
        contracted = (
            pairs.join(la, "doc_a")
            .join(lb, "doc_b")
            .select(F.col("la").alias("doc_a"), F.col("lb").alias("doc_b"))
            .filter(F.col("doc_a") != F.col("doc_b"))
            .distinct()
        )
        universe = labels.select(F.col("label").alias("doc_id")).distinct()
        star = _cc_star(universe, contracted, telemetry)
        return labels.join(
            star.select(F.col("doc_id").alias("label"), "cluster_id"), "label"
        ).select(
            F.col("u").alias("doc_id"),
            "cluster_id",
            (F.col("u") == F.col("cluster_id")).alias("is_canonical"),
        )
    # explicit star: restrict pairs to the docs universe so phantom
    # endpoints cannot bridge components (min-label drops such edges
    # naturally; star would otherwise contract through them) and cluster
    # ids always reference real docs
    ids_a = docs.select(F.col("doc_id").alias("doc_a"))
    ids_b = docs.select(F.col("doc_id").alias("doc_b"))
    pairs = pairs.join(ids_a, "doc_a", "left_semi").join(ids_b, "doc_b", "left_semi")
    return _cc_star(docs, pairs, telemetry)


def _cc_min_label(docs, pairs, max_rounds: int, telemetry: dict):
    """One-hop min-label propagation; returns (result, labels) — result is
    None if not converged within max_rounds (caller escalates using the
    partially-propagated labels)."""
    telemetry["algorithm"] = "min_label"
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    # edges are reused every round; singleton docs never enter the loop.
    # Deliberately NOT pre-partitioned to a fixed count: the per-round
    # join shuffles both sides at the session's shuffle parallelism, and
    # forcing a different fixed partitioning on one side makes Spark
    # re-shuffle the edge list EVERY round to reconcile the mismatch
    # (measured 20x slower at 250k edges). localCheckpoint only cuts the
    # lineage so round N's plan doesn't replay rounds 0..N-1.
    edges = edges.localCheckpoint()
    telemetry["edge_partitions"] = edges.rdd.getNumPartitions()

    # The label frame is deliberately NOT spread (VERDICT r4 item 4 asked;
    # measured and rejected): labels are the SMALL side of every per-round
    # join — AQE broadcasts them from runtime sizes, so their checkpoint
    # partitioning is not the loop's parallelism lever (edge_partitions
    # is, and the edge frame arrives shuffle-partitioned at session
    # parallelism). Forcing the fixture's tiny label frame to 32
    # partitions measured +0.3-0.7 s per q_dedup_clusters_lsh run (A/B,
    # SCALE.md r5) and was neutral on the exact path; at production scale
    # the docs universe is well-partitioned and a conditional spread
    # no-ops anyway. Telemetry still reports the count so the claim stays
    # auditable.
    with loop_checkpoints() as lc:
        lc.own(edges)
        labels = lc.swap(
            docs.select(
                F.col("doc_id").alias("u"), F.col("doc_id").alias("label")
            ).localCheckpoint()
        )
        telemetry["label_partitions"] = labels.rdd.getNumPartitions()

        converged = False
        for _ in range(max_rounds):
            # r13 (guide §2.4, same fusion as the PageRank round): the
            # old round ran groupBy(u) over the neighbor labels and then
            # a SECOND keyed op (labels left-join nbr) to merge — two
            # AQE stages where one suffices. Fused: each node's own
            # label rides the union as one more candidate row, so a
            # single groupBy(u) computes min(candidates) — exactly
            # least(label, min(nbr)) — and re-attaches the old label
            # (max over one non-null). Integer min: bit-exact, no FP
            # order concerns. A u absent from the docs universe
            # aggregates to a NULL own-label row and is filtered — the
            # old left join's semantics.
            edge_l = edges.join(labels.withColumnRenamed("u", "v"), "v").select(
                "u",
                F.col("label").alias("cand"),
                F.lit(None).cast(labels.schema["label"].dataType).alias("own"),
            )
            self_l = labels.select(
                "u", F.col("label").alias("cand"), F.col("label").alias("own")
            )
            # one job per round: checkpoint the merged labels, then count
            # changed rows off the checkpointed result (no recompute)
            merged = (
                edge_l.unionByName(self_l)
                .groupBy("u")
                .agg(
                    F.min("cand").alias("new_label"),
                    F.max("own").alias("label"),
                )
                .filter(F.col("label").isNotNull())
                .select("u", "label", "new_label")
                .localCheckpoint()
            )
            changed = merged.filter(F.col("new_label") != F.col("label")).count()
            telemetry["rounds"] += 1
            telemetry["changed_per_round"].append(changed)
            # the superseded round's checkpoint blocks are dead weight in
            # the block manager — lc.swap frees them eagerly instead of
            # waiting for GC (left pinned, they degrade UNRELATED queries
            # later in the session via memory pressure; observed in
            # bench). The final round's checkpoint stays: the returned
            # plan reads from it.
            lc.swap(merged)
            labels = merged.select("u", F.col("new_label").alias("label"))
            if changed == 0:
                converged = True
                break
        if not converged:
            # keep the final checkpoint alive: the caller seeds star from it
            return None, labels

        return (
            labels.select(
                F.col("u").alias("doc_id"),
                F.col("label").alias("cluster_id"),
                (F.col("u") == F.col("label")).alias("is_canonical"),
            ),
            labels,
        )


def _cc_star(docs, pairs, telemetry: dict) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    SoCC'14): maintains an undirected edge set; each round every node
    hooks its neighbors onto its neighborhood minimum, halving tree
    heights — O(log n) rounds on any topology. At convergence the edge
    set is a union of stars (node -> component min), which IS the label
    mapping. Same checkpoint-per-round lineage hygiene as min-label."""
    telemetry["algorithm"] = "star"
    telemetry.setdefault("star_changed_per_round", [])
    star_rounds = 0

    # canonical undirected edges, self-loops dropped
    edges = (
        pairs.select(
            F.least("doc_a", "doc_b").alias("lo"),
            F.greatest("doc_a", "doc_b").alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint()
    )
    telemetry["edge_partitions"] = edges.rdd.getNumPartitions()

    def neighborhood_min(sym: DataFrame) -> DataFrame:
        # m(u) = min(Γ(u) ∪ {u}); sym is the directed (u -> v) view
        return (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        )

    with loop_checkpoints() as lc:
        edges = lc.swap(edges)
        prev_sig: tuple | None = None
        for _ in range(30):
            # --- large-star: for v in Γ(u) with v > u: emit {v, m(u)} ---
            sym = edges.select("lo", "hi").selectExpr(
                "lo as u", "hi as v"
            ).unionByName(edges.selectExpr("hi as u", "lo as v"))
            m = neighborhood_min(sym)
            large = (
                sym.join(m, "u")
                .filter(F.col("v") > F.col("u"))
                .select(
                    F.least("v", "m").alias("lo"), F.greatest("v", "m").alias("hi")
                )
                .filter(F.col("lo") != F.col("hi"))
                .distinct()
            )
            # --- small-star: per node u over edges with v <= u:
            #     emit {v, m} for v in Γ≤(u) ∪ {u} -----------------------
            down = large.selectExpr("hi as u", "lo as v")  # v < u by construction
            m2 = neighborhood_min(down)  # = min neighbor (all < u) vs u
            small = (
                down.join(m2, "u")
                .select(
                    F.least("v", "m").alias("lo"), F.greatest("v", "m").alias("hi")
                )
                .unionByName(
                    m2.select(
                        F.least("u", "m").alias("lo"),
                        F.greatest("u", "m").alias("hi"),
                    )
                )
                .filter(F.col("lo") != F.col("hi"))
                .distinct()
                .localCheckpoint()
            )
            star_rounds += 1
            # convergence: the edge set is a fixed point. count +
            # endpoint-hash aggregate in ONE job over the fresh
            # checkpoint, compared to the previous round's pair (cheap vs
            # a symmetric-difference join). bit_xor (not sum): order-
            # insensitive set signature over distinct edges that cannot
            # overflow under ANSI arithmetic
            sig = small.agg(
                F.count("*").alias("n"),
                F.coalesce(F.expr("bit_xor(xxhash64(lo, hi))"), F.lit(0)).alias(
                    "h"
                ),
            ).collect()[0]
            cur_sig = (sig["n"], sig["h"])
            telemetry["star_changed_per_round"].append(cur_sig[0])
            if prev_sig == cur_sig:
                # Signature equality is one 2^-64 xxhash64 collision away
                # from a silent early stop on an ORACLE-CHECKED path
                # (unlike the MinHash paths, where a collision only
                # perturbs candidate generation). Confirm the fixed point
                # exactly: both edge sets are distinct() and same-count
                # (from the signature), so one anti-join count == 0 iff
                # they are equal — a single extra job at the final round
                # only. (ADVICE r4.)
                mismatch = edges.join(small, ["lo", "hi"], "left_anti").count()
                if mismatch == 0:
                    edges = lc.swap(small)
                    break
                telemetry["sig_collisions"] = (
                    telemetry.get("sig_collisions", 0) + 1
                )
            edges = lc.swap(small)
            prev_sig = cur_sig
        else:  # pragma: no cover - O(log n) rounds << 30
            raise RuntimeError("star contraction did not converge in 30 rounds")
        telemetry["rounds"] += star_rounds

        # fixed point = stars: hi -> lo IS (member -> component min)
        mapping = edges.selectExpr("hi as doc_id", "lo as cluster_id")
        return (
            docs.select("doc_id")
            .join(mapping, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias(
                    "cluster_id"
                ),
                (
                    F.coalesce(F.col("cluster_id"), F.col("doc_id"))
                    == F.col("doc_id")
                ).alias("is_canonical"),
            )
        )


@query("q_dedup_clusters_star", oracle=_CLUSTERS_ORACLE)
def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_clusters computed by the large-star/small-star contraction
    path instead of min-label propagation — the O(log n)-round algorithm
    for deep graphs, oracle-checked here against the same recursive-CTE
    closure so BOTH connected-components algorithms carry a driver-green
    correctness row (the chain-shaped topology where star wins is pinned
    separately in tests/test_scale_slow.py)."""
    pairs = exact_jaccard_pairs(shingles(spark, sf_dir), JACCARD_THRESHOLD)
    return connected_components(
        load_table(spark, sf_dir, "documents"), pairs, algorithm="star", tag="star"
    )


# --- MinHash + LSH (scale path; hash-oracled since r7 + recall asserts) ----

MINHASH_K = 32  # signatures per doc
LSH_BANDS = 8  # 8 bands x 4 rows
_MH_MOD = 2**32


def _mh_consts(k: int = MINHASH_K) -> list[tuple[int, int]]:
    """The k fixed affine permutations h_i(x) = (a_i*x + b_i) mod 2^32
    behind the MinHash signature: a_i is a 16-bit ODD multiplier (odd a
    over a power-of-two modulus => a true bijection of [0, 2^32), the
    min-wise family MinHash needs), b_i a 32-bit offset, both derived
    from md5 so the constants are reproducible anywhere. Products stay
    under 2^48 — exact in BIGINT arithmetic in BOTH engines, which is
    what makes the whole LSH pipeline hash-oracle-able (the r6 xxhash64
    family was engine-specific)."""
    import hashlib

    out = []
    for i in range(k):
        a = int(hashlib.md5(f"mh_a{i}".encode()).hexdigest()[:4], 16) | 1
        b = int(hashlib.md5(f"mh_b{i}".encode()).hexdigest()[:8], 16)
        out.append((a, b))
    return out

# Weak-keyed on the LIVE session object: entries vanish with the session
# (no id() recycling returning a DataFrame bound to a stopped session),
# and the persisted blocks die with that session's executors — nothing
# leaks across sessions in a multi-session process.
_SHINGLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def shingle_hash_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per doc: the distinct 32-bit shingle-hash set as an array
    (md5-hex-prefix bucket — the engine-portable hash every oracled
    family here uses; within-doc 32-bit collisions shift Jaccard by
    ~m^2/2^33 ~ 1e-5 at fixture doc lengths, identically in both
    engines). THE representation the whole MinHash pipeline runs on —
    the shingle relation collapses to per-doc state in a single shuffle,
    and every later step (signatures, verification) is narrow. Array
    size is bounded by document length, not corpus size, so per-row
    state stays small at any scale."""
    per_session = _SHINGLE_CACHE.setdefault(spark, {})
    sets = per_session.get(sf_dir)
    if sets is not None and sets.storageLevel == StorageLevel.NONE:
        # An external `spark.catalog.clearCache()` (bench.py runs one
        # before every query for isolation) UNREGISTERS the plan from the
        # CacheManager — the cached object survives here but silently
        # stops caching, so every downstream use (signatures + both
        # verification sides = 3x per LSH query) re-runs the full shingle
        # build. That was the whole of BENCH_r07's bogus 23.3x
        # q_dedup_minhash_lsh scale ratio (run-order dependent: whoever
        # touched the sets first ran cached, everyone later ran cold).
        # persist() re-registers; the next action re-materializes once.
        sets = sets.persist()
        per_session[sf_dir] = sets
    if sets is None:
        docs = spread_input(load_table(spark, sf_dir, "documents"))
        toks = F.split(F.col("text"), " ")
        h32 = (
            F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("bigint")
        )
        sets = (
            docs.select(
                "doc_id", F.explode(bigram_col(toks)).alias("shingle")
            )
            .groupBy("doc_id")
            .agg(F.collect_set(h32).alias("hs"))
            .persist()
        )
        per_session[sf_dir] = sets
    return sets


def minhash_signatures(sets: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k min-hashes per doc from the per-doc hash-set array:
    min((a_i*h + b_i) mod 2^32) re-hashes the set under k affine
    permutations (_mh_consts) — pure array lambdas, zero shuffle (the
    one shuffle already happened in shingle_hash_sets), and exact
    integer arithmetic DuckDB reproduces bit-for-bit.

    PRECONDITION: input hashes must lie in [0, 2^32) — the
    shingle_hash_sets md5-prefix domain. Full-range 64-bit hashes (the
    pre-r7 xxhash convention) silently break the min-wise property: the
    affine map is only a bijection of [0, 2^32), and h*a overflows
    BIGINT for large |h|."""
    def perm(a, b):
        # closure, not default args: pyspark reads the lambda's ARITY to
        # pick the higher-order-function form, so `lambda h, a=a, b=b`
        # binds as a 3-arg lambda and fails analysis
        return lambda h: (h * a + b) % _MH_MOD

    cols = [
        F.array_min(F.transform(F.col("hs"), perm(a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(_mh_consts(k))
    ]
    return sets.select("doc_id", *cols)


# "auto" bucket_cap: the probe enables capping only when some (band,
# bucket) exceeds this membership. C(256, 2) = 32,640 pairs is the
# per-bucket worst case under the cap — one comfortable task — while
# buckets this large on REAL corpora mean near-identical content that
# exact dedup (run first in the production pipeline) already collapsed,
# so recall loss is confined to pathological inputs. Telemetry mirrors
# CC_TELEMETRY so the probe's verdict is observable in tests/bench.
AUTO_BUCKET_CAP = 256
# Observability convenience for bench/tests ONLY: unsynchronized,
# last-writer-wins per tag — two callers sharing a tag (or the default)
# clobber each other's verdicts. Callers that need a reliable verdict
# pass ``telemetry_out`` and read their own dict.
LSH_TELEMETRY: dict = {}


def lsh_candidate_pairs(
    sig: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    bucket_cap: int | str | None = None,
    tag: str = "default",
    telemetry_out: dict | None = None,
) -> DataFrame:
    """Band the signature (bands x rows) and bucket-join: posexplode the
    band hashes so ONE equi-join on (band, bucket) produces all candidate
    pairs — instead of `bands` separate self-joins each re-running the
    signature lineage. The shuffle stays O(docs x bands) — never
    all-pairs.

    ``bucket_cap``: the 100 TB hot-bucket defense (same shape as the
    market-basket CF_CAP). A degenerate bucket — b near-identical docs
    landing in one (band, bucket) — contributes C(b, 2) candidate pairs;
    at b = 1M that is 5e11 rows out of ONE task, the quadratic cliff the
    r7 advice hypothesized for this family. With a cap, each bucket
    keeps only its `bucket_cap` md5-order-first members (deterministic,
    content-independent), bounding per-bucket work at C(cap, 2) while
    every smaller bucket is untouched. Recall inside an oversized
    bucket's survivor set is intact, and a truncated doc can still pair
    through any of its OTHER bands (multi-band redundancy) — and in
    practice an oversized bucket means near-identical content that
    q_dedup_exact (byte-hash dedup, run FIRST in the production
    pipeline) already collapsed. Default None = exact candidate set —
    the oracled form (q_dedup_minhash_lsh hashes bit-for-bit against
    DuckDB and must stay uncapped); measured: bench_telemetry
    `lsh_skew` microbench.

    ``bucket_cap="auto"``: runtime skew probe, the same escalation
    pattern as ``connected_components``' min-label→star — ONE cheap agg
    on the bucket frame (max (band, bucket) membership; group state is
    a single count, so the probe itself is skew-immune) decides whether
    the corpus is adversarial. Max membership <= AUTO_BUCKET_CAP: the
    exact, oracle-identical candidate set ships (zero behavior change,
    probe cost only). Above it: the cap engages at AUTO_BUCKET_CAP.
    Verdict recorded in LSH_TELEMETRY[tag] (probe max, engaged bool;
    last-writer-wins for shared tags) and, race-free, in the caller's
    ``telemetry_out`` dict when provided.
    This closes the 100 TB deployment gap where the caller had to KNOW
    the corpus was adversarial to pass a manual cap
    (tests/test_skew.py::test_lsh_bucket_cap_auto_probe)."""
    rows = k // bands
    # band bucket = md5 prefix of the '_'-joined row signature (BIGINT
    # digits -> identical strings in both engines)
    band_hashes = [
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "_", *[F.col(f"mh{i}") for i in range(b * rows, (b + 1) * rows)]
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        for b in range(bands)
    ]
    buckets = sig.select(
        "doc_id", F.posexplode(F.array(*band_hashes)).alias("band", "bucket")
    )
    if bucket_cap == "auto":
        # The probe action re-runs the bucket projection the pair join
        # will run again — NOT persisted: buckets is a narrow transform
        # of `sig`, which every caller already persists/checkpoints
        # (shingle-cache, bench localCheckpoint), and a persist here
        # would outlive the call (the returned frame keeps the blocks
        # pinned with no unpersist point).
        probe = buckets.groupBy("band", "bucket").count().agg(
            F.max("count").alias("mx")
        ).collect()
        max_bucket = int(probe[0]["mx"] or 0)
        engaged = max_bucket > AUTO_BUCKET_CAP
        verdict = {"max_bucket": max_bucket, "cap_engaged": engaged}
        LSH_TELEMETRY[tag] = verdict
        if telemetry_out is not None:
            telemetry_out.update(verdict)
        bucket_cap = AUTO_BUCKET_CAP if engaged else None
    if bucket_cap is not None:
        wb = Window.partitionBy("band", "bucket").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
        buckets = (
            buckets.withColumn("brn", F.row_number().over(wb))
            .filter(F.col("brn") <= bucket_cap)
            .drop("brn")
        )
    x = buckets.alias("x")
    y = buckets.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def _lsh_ctes(k: int = MINHASH_K, bands: int = LSH_BANDS) -> str:
    """DuckDB twin of the whole MinHash+LSH pipeline — shingle md5-32
    hash sets, the k affine-permutation minima, '_'-joined band buckets,
    the (band, bucket) candidate equi-join, and the exact-Jaccard
    verification — every step exact integer/md5 arithmetic, so the
    candidate SET and the verified pair set are bit-identical to the
    Spark operator's (the conversion that moved this family from
    rows-only to hash-oracled in r7). Ends with a `lsh_pairs` CTE."""
    rows = k // bands
    consts = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(_mh_consts(k)))
    return (
        _SHINGLES_SQL.lstrip()
        + f""",
hs AS (
    SELECT DISTINCT doc_id,
        ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS x
    FROM shingles
),
consts(i, a, b) AS (VALUES {consts}),
mh AS (
    SELECT h.doc_id, c.i, MIN((h.x * c.a + c.b) % {_MH_MOD}) AS mh
    FROM hs h CROSS JOIN consts c GROUP BY 1, 2
),
buckets AS (
    SELECT doc_id, band,
        ('0x' || substr(md5(
            string_agg(CAST(mh AS VARCHAR), '_' ORDER BY i)), 1, 8))::BIGINT
            AS bucket
    FROM (SELECT doc_id, i, mh, CAST(FLOOR(i / {rows}.0) AS INT) AS band FROM mh)
    GROUP BY doc_id, band
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM buckets x JOIN buckets y
      ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
),
hsizes AS (SELECT doc_id, COUNT(*) AS n FROM hs GROUP BY doc_id),
hinter AS (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS ni
    FROM cand c
    JOIN hs a ON a.doc_id = c.doc_a
    JOIN hs b ON b.doc_id = c.doc_b AND b.x = a.x
    GROUP BY 1, 2
),
lsh_pairs AS (
    SELECT i.doc_a, i.doc_b, i.ni * 1.0 / (sa.n + sb.n - i.ni) AS jaccard
    FROM hinter i
    JOIN hsizes sa ON sa.doc_id = i.doc_a
    JOIN hsizes sb ON sb.doc_id = i.doc_b
    WHERE i.ni * 1.0 / (sa.n + sb.n - i.ni) >= {JACCARD_THRESHOLD}
)"""
    )


@query(
    "q_dedup_minhash_lsh",
    oracle="WITH "
    + _lsh_ctes()
    + """
SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard FROM lsh_pairs""",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8 bands x 4) candidates, then EXACT Jaccard
    verification of only the candidate pairs. Same output schema as
    q_dedup_ngram_jaccard; recall vs the exact operator is asserted in
    tests, and since r7 the whole pipeline is HASH-ORACLED: shingle
    hashes are md5-prefix-32, the k permutations are exact affine maps
    mod 2^32, band buckets are md5 of the joined row signature — DuckDB
    reproduces the candidate set bit-for-bit (_lsh_ctes), closing the
    'engine-specific hash family' rows-only justification.

    Verification joins the candidate pairs to the per-doc hash-set arrays
    (two joins on single-row-per-doc state) and intersects the arrays
    in-row — the shingle-level join of the exact operator never happens
    here, so post-LSH work is O(candidate pairs x doc length), not a
    corpus-wide shuffle. Jaccard over the 32-bit hash sets equals Jaccard
    over the string sets barring ~m^2/2^33-scale collisions (identical in
    both engines)."""
    return minhash_lsh_pairs(spark, sf_dir)


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-doc hash sets feed signatures and both verification sides:
    # computed once per (session, sf_dir) and persisted — naively
    # persisting a fresh copy per call stacks caches until executor memory
    # GC-thrashes unrelated queries (observed in bench).
    sets = shingle_hash_sets(spark, sf_dir)
    candidates = lsh_candidate_pairs(minhash_signatures(sets))
    a = sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
    b = sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
    n_common = F.size(F.array_intersect(F.col("ha"), F.col("hb")))
    jac = n_common / (F.size("ha") + F.size("hb") - n_common)
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def _clusters_lsh_oracle() -> str:
    """Full q_dedup_clusters_lsh oracle (LSH pair set + recursive-CTE
    closure) as a reusable string — the q_corpus_prep capstone composes
    it verbatim as a subquery."""
    return (
        "WITH RECURSIVE "
        + _lsh_ctes()
        + """,
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
    UNION ALL
    SELECT doc_b, doc_a FROM lsh_pairs
),
reach(u, label) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u
)
SELECT u AS doc_id, MIN(label) AS cluster_id,
    (u = MIN(label)) AS is_canonical
FROM reach GROUP BY u"""
    )


@query("q_dedup_clusters_lsh", oracle=_clusters_lsh_oracle())
def q_dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full sub-quadratic dedup pipeline end-to-end: MinHash+LSH
    candidates → exact-Jaccard verification → connected components →
    canonical doc per cluster. Same output schema as q_dedup_clusters;
    that operator is the oracle-checked form over exact (quadratic) pair
    generation, this one is what actually runs at 100 TB — and since r7
    it carries its OWN full oracle: the recursive-CTE closure runs over
    the bit-identical LSH pair set (_lsh_ctes), so the end-to-end scale
    path is hash-verified, not just consistency-tested. Tests still
    assert the labeling never merges more than the exact labeling."""
    return connected_components(
        load_table(spark, sf_dir, "documents"),
        minhash_lsh_pairs(spark, sf_dir),
        tag="lsh",
    )


# --- SimHash (rows-only; pytest invariants) ---------------------------------

SIMHASH_BITS = 32


def simhash_signatures(sh: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash: sign of the per-bit vote sum over shingle hashes
    (md5-prefix-32 — engine-portable, so the signature and therefore the
    candidate pair set is bit-identical in DuckDB). One groupBy with
    `bits` conditional-sum aggregates — single pass, all codegen."""
    h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("bigint")
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    sig = sh.groupBy("doc_id").agg(*votes)
    bit_terms = [
        F.when(F.col(f"v{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        for i in range(bits)
    ]
    acc = bit_terms[0]
    for t in bit_terms[1:]:
        acc = acc + t
    return sig.select("doc_id", acc.alias("simhash"))


@query(
    "q_dedup_simhash",
    oracle=f"""
WITH {_SHINGLES_SQL.lstrip()},
sx AS (
    SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS x
    FROM shingles
),
votes AS (
    SELECT doc_id, i,
        SUM(CASE WHEN (x >> i) & 1 = 1 THEN 1 ELSE -1 END) AS v
    FROM sx CROSS JOIN range({SIMHASH_BITS}) r(i) GROUP BY 1, 2
),
sig AS (
    SELECT doc_id,
        SUM(CASE WHEN v > 0 THEN (1::BIGINT << i) ELSE 0 END) AS simhash
    FROM votes GROUP BY doc_id
),
halves AS (
    SELECT doc_id, simhash, 0 AS wh, simhash & 65535 AS half FROM sig
    UNION ALL
    SELECT doc_id, simhash, 1 AS wh, simhash >> 16 AS half FROM sig
),
cpairs AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
        x.simhash AS sa, y.simhash AS sb
    FROM halves x JOIN halves y
      ON x.wh = y.wh AND x.half = y.half AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cpairs WHERE bit_count(xor(sa, sb)) <= 6""",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: docs whose 32-bit signatures share at
    least one 16-bit half (pigeonhole ⇒ catches all pairs with hamming
    distance ≤ 1 and most small distances), reporting the exact hamming
    distance. Candidate join is two equi-joins on 16-bit keys — no
    all-pairs comparison. Hash-oracled since r7: the md5-prefix shingle
    hash makes every bit vote a deterministic GROUP BY in DuckDB, so the
    signature, candidate set and hamming distances all hash-match."""
    sig = simhash_signatures(shingles(spark, sf_dir))
    lo = (F.col("simhash").bitwiseAND(F.lit((1 << 16) - 1))).alias("half")
    hi = F.shiftright(F.col("simhash"), 16).alias("half")
    out: DataFrame | None = None
    for half in (lo, hi):
        banded = sig.select("doc_id", "simhash", half)
        x = banded.alias("x")
        y = banded.alias("y")
        pairs = x.join(
            y,
            (F.col("x.half") == F.col("y.half")) & (F.col("x.doc_id") < F.col("y.doc_id")),
        ).select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sim_a"),
            F.col("y.simhash").alias("sim_b"),
        )
        out = pairs if out is None else out.unionByName(pairs)
    assert out is not None
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        out.distinct()
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 6)
    )


# --- quality-aware canonical selection --------------------------------------

_KEEP_BEST_ORACLE: str


def _build_keep_best_oracle() -> str:
    from .text import QUALITY_EXPR_SQL

    return (
        "WITH RECURSIVE "
        + _PAIRS_CTES
        + f""",
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
),
reach(u, label) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u
),
clusters AS (
    SELECT u AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY u
),
scored AS (
    SELECT doc_id, ROUND({QUALITY_EXPR_SQL}, 6) AS quality_score
    FROM documents
)
SELECT c.doc_id, c.cluster_id, s.quality_score,
    (ROW_NUMBER() OVER (
        PARTITION BY c.cluster_id
        ORDER BY s.quality_score DESC, c.doc_id
    ) = 1) AS keep
FROM clusters c JOIN scored s USING (doc_id)"""
    )


@query("q_dedup_keep_best", oracle=_build_keep_best_oracle())
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: near-dup clusters (the same CC
    as q_dedup_clusters) where the kept document per cluster is the
    HIGHEST-QUALITY one, not the min-id one — the RefinedWeb/FineWeb
    retention policy (when near-dups differ, keep the best copy, e.g.
    the least-boilerplate mirror of a page). min-id canonicalization
    (q_dedup_clusters's is_canonical) is an arbitrary-but-stable pick;
    this is the pick a production corpus actually ships. Ties break on
    doc_id for determinism (scores rounded to 6 before ranking in both
    dialects).

    Scale shape: adds to the CC cost only a per-row quality expression
    (codegen, computed on the scan) and ONE window exchange keyed by
    cluster_id over the doc-level frame. Cluster-key skew is bounded by
    construction — near-dup clusters are document groups, not power-law
    join keys; a pathological mega-cluster (e.g. an empty-string class)
    would already have been split upstream by the pair threshold. Pair
    input here is the exact-Jaccard baseline so the whole composition
    stays oracle-checkable; the 100 TB path swaps in
    lsh_candidate_pairs, same downstream plan."""
    from pyspark.sql import Window

    from .text import quality_score_col

    docs = load_table(spark, sf_dir, "documents")
    pairs = exact_jaccard_pairs(shingles(spark, sf_dir), JACCARD_THRESHOLD)
    clusters = connected_components(docs, pairs, tag="keep_best").select(
        "doc_id", "cluster_id"
    )
    scored = docs.select(
        "doc_id",
        F.round(quality_score_col(F.split("text", " ")), 6).alias(
            "quality_score"
        ),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    return (
        clusters.join(scored, "doc_id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "quality_score", "keep")
    )


# --- incremental-ingest dedup -----------------------------------------------

# Deterministic batch split: ~20% of docs arrive as the "new batch", the
# rest are the already-ingested corpus (works at every SF).
_INGEST_MOD = 5

# Order-insensitive content fingerprint: md5 of the sorted distinct word
# set — catches shuffled/reflowed copies that byte-exact md5(text) misses
# (the "fuzzy-exact" tier between exact and MinHash dedup).
_BOW_FP_SQL = (
    "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"
)


def bow_fingerprint() -> "F.Column":
    return F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    )


@query(
    "q_dedup_incremental",
    oracle=f"""
WITH fp AS (
    SELECT doc_id, {_BOW_FP_SQL} AS fingerprint,
        doc_id % {_INGEST_MOD} = {_INGEST_MOD - 1} AS is_batch
    FROM documents
),
existing AS (SELECT DISTINCT fingerprint FROM fp WHERE NOT is_batch),
batch AS (
    SELECT doc_id, fingerprint,
        ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) > 1
            AS dup_within_batch
    FROM fp WHERE is_batch
)
SELECT b.doc_id, b.fingerprint,
    e.fingerprint IS NOT NULL AS dup_of_existing,
    b.dup_within_batch,
    (e.fingerprint IS NULL AND NOT b.dup_within_batch) AS accept
FROM batch b LEFT JOIN existing e USING (fingerprint)""",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: a NEW batch of documents is admitted
    against the ALREADY-INGESTED corpus — every batch doc is flagged
    dup-of-existing (fingerprint already in the corpus), dup-within-batch
    (an earlier batch doc claimed it), or accepted. This is the
    reference's dedup-queue admission semantic (RedisQueue rpush checks
    the membership set before enqueueing, extractor/riot/db/redis.py:48-64)
    lifted from crawl ids to content fingerprints at corpus scale — the
    shape every continuously-ingesting pipeline needs so yesterday's
    corpus never re-admits today's mirror.

    The fingerprint is order-insensitive (md5 of the sorted distinct
    word set): the fuzzy-exact tier between byte-exact md5 and MinHash —
    it catches shuffled/reflowed copies for free, and at this fixture it
    actually fires (54 collisions), so the flags are exercised positive.

    Scale shape: one narrow fingerprint expression on each scan; the
    membership check is a fingerprint-keyed equi-join (16-byte keys,
    never bodies) — at 100 TB the existing side is a bucketed
    fingerprint index co-located with ingest (the warehouse bucketing
    path), making admission shuffle-free; within-batch precedence is one
    window over the batch only."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        bow_fingerprint().alias("fingerprint"),
        (F.col("doc_id") % _INGEST_MOD == _INGEST_MOD - 1).alias("is_batch"),
    )
    existing = (
        docs.filter(~F.col("is_batch"))
        .select("fingerprint")
        .distinct()
        .withColumn("seen", F.lit(True))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    batch = (
        docs.filter(F.col("is_batch"))
        .withColumn("dup_within_batch", F.row_number().over(w) > 1)
        .select("doc_id", "fingerprint", "dup_within_batch")
    )
    return batch.join(existing, "fingerprint", "left").select(
        "doc_id",
        "fingerprint",
        F.coalesce(F.col("seen"), F.lit(False)).alias("dup_of_existing"),
        "dup_within_batch",
        (F.col("seen").isNull() & ~F.col("dup_within_batch")).alias("accept"),
    )


# ---------------------------------------------------------------------------
# Prefix-filtered set-similarity join (AllPairs / PPJoin family:
# Bayardo et al., WWW'07; Xiao et al., WWW'08). The EXACT-threshold
# scale path: where q_dedup_ngram_jaccard joins on EVERY shingle
# (quadratic blowup on hot shingles) and MinHash+LSH trades exactness
# for probability, prefix filtering keeps the answer exact while
# joining only on each document's rarest few shingles.
# ---------------------------------------------------------------------------

SETSIM_THRESHOLD = 0.4


@query(
    "q_setsim_prefix_join",
    oracle="WITH "
    + _SHINGLES_SQL.lstrip()
    + f""",
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM shingles a
    JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
    ROUND(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.doc_a = sa.doc_id
JOIN sizes sb ON inter.doc_b = sb.doc_id
WHERE n_common / (sa.n + sb.n - n_common) >= {SETSIM_THRESHOLD}""",
)
def q_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.4 pairs via PREFIX FILTERING — the classic
    exact-threshold set-similarity join (AllPairs, Bayardo WWW'07).

    Under any global total order on tokens, two sets with
    J(A,B) >= t MUST share a token within each one's first
    |x| - ceil(t*|x|) + 1 tokens (else the remaining suffixes are too
    short to reach the required overlap), so self-joining only those
    PREFIX tokens loses no true pair. Ordering tokens by ascending
    document frequency puts the RAREST shingles in the prefix, so the
    equi-join fans out on shingles that by construction occur in few
    documents — candidate count stays near-linear where the naive join
    (q_dedup_ngram_jaccard) is quadratic on hot shingles. A length
    filter (t*max(|A|,|B|) <= min(|A|,|B|), necessary for J >= t)
    prunes candidates before verification; the verify stage computes
    the exact intersection for surviving pairs only.

    The ORACLE is the plain exact all-shingle join: prefix filtering is
    provably lossless, so the result sets are identical — the driver's
    hash gate doubles as a completeness check of the filter.

    Scale shape (100 TB): one df-count shuffle (linear), one prefix
    self-join on rare tokens (near-linear candidates), one
    candidates-only verify join keyed on doc_id. No corpus-wide
    quadratic stage exists; skew on the join key is capped because a
    prefix token with document frequency d contributes at most d^2/2
    candidates and the prefix targets the SMALLEST d.

    r13: the shingle set is materialized once inside the timed query
    (the q_setsim_zipf discipline) — setsim_prefix_pairs reads its
    input relation three times and each reference re-ran the
    scan + explode + DISTINCT subtree."""
    return setsim_prefix_pairs(
        shingles(spark, sf_dir).localCheckpoint(), SETSIM_THRESHOLD
    )


def setsim_prefix_pairs(sh: DataFrame, threshold: float) -> DataFrame:
    """Prefix-filtered exact Jaccard >= threshold pairs over a
    (doc_id, shingle) distinct-set frame; result-identical to
    exact_jaccard_pairs (asserted by hypothesis differential AND the
    driver hash gate) with near-linear candidate generation."""
    from pyspark.sql import Window

    t = threshold
    # r13 (guide §2.4/§5): one doc-grain aggregation feeds BOTH the
    # per-doc sizes and the verify stage's shingle arrays (the old form
    # aggregated sh separately for each), and the two frames every
    # stage re-reads — the per-doc sets and the prefix projection (the
    # self-join consumes it twice) — are localCheckpointed so the
    # dfreq-join + window subtree runs once per invocation instead of
    # once per plan reference.
    sets = (
        sh.groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("sset"))
        .localCheckpoint()
    )
    sizes = sets.select("doc_id", F.size("sset").alias("n"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    # global total order (df, shingle); prefix = n - ceil(t*n) + 1
    pos_w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    prefix = (
        sh.join(dfreq, "shingle")
        .withColumn("pos", F.row_number().over(pos_w))
        .join(sizes, "doc_id")
        .filter(
            F.col("pos")
            <= F.col("n") - F.ceil(F.lit(t) * F.col("n")) + F.lit(1)
        )
        .select("doc_id", "shingle", "n")
        .localCheckpoint()
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # r13 (guide §2.3): the candidate pairs keep both prefix rows' set
    # sizes, so the sizes ride the verify aggregation's key and the old
    # post-aggregation sa/sb size joins disappear ((na, nb) is
    # functionally determined by (doc_a, doc_b) — the distinct's
    # cardinality is unchanged). Same integer arithmetic, bit-identical
    # jaccard.
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            F.least(F.col("a.n"), F.col("b.n"))
            >= F.lit(t) * F.greatest(F.col("a.n"), F.col("b.n"))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .distinct()
    )
    # r13 verify stage (guide §2.3): intersection sizes come from an
    # IN-ROW array_intersect over per-doc shingle arrays instead of the
    # old double shingle join — that join exploded every candidate pair
    # into |set| rows and re-shuffled the explosion on (doc_b, shingle)
    # (280M rows at sf0.1 where the corpus's hot shingles leave ~5.5M
    # candidates; 68s -> ~8s measured). Two |cand|-row joins attach the
    # arrays; size(array_intersect) over distinct sets is exactly the
    # old per-shingle-match count (every cand pair shares >= 1 prefix
    # token, so the old inner join never dropped a pair either), and
    # the jaccard arithmetic is unchanged.
    inter = (
        cand.join(
            sets.select(
                F.col("doc_id").alias("doc_a"), F.col("sset").alias("set_a")
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"), F.col("sset").alias("set_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "na",
            "nb",
            F.size(F.array_intersect("set_a", "set_b"))
            .cast("bigint")
            .alias("n_common"),
        )
    )
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.filter(jac >= t)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# Zipfian synthetic corpus for the benchable prefix-join twin: token ids
# drawn as floor(u^4 * V) (u = md5-uniform) give a stop-word-like head
# and a long rare tail; 8% of docs are planted near-dup PAIRS (adjacent
# ids share a base token stream, odd member perturbed at every 20th
# position -> true token-set Jaccard ~0.9 >= the 0.7 threshold).
SETSIM_ZIPF_LEN = 40  # token positions per doc
SETSIM_ZIPF_VOCAB_MULT = 6  # vocab = 6 x corpus docs: scales with sf
SETSIM_ZIPF_THRESHOLD = 0.7

_SETSIM_ZIPF_SQL = f"""
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
zgrid AS (
    SELECT d.doc_id, g.pos, nd.n,
        CASE WHEN d.doc_id < (2 * nd.n) // 25 THEN d.doc_id // 2
             ELSE d.doc_id END AS bkey
    FROM documents d
    CROSS JOIN nd
    CROSS JOIN UNNEST(generate_series(0, {SETSIM_ZIPF_LEN - 1})) AS g(pos)
),
ztok AS (
    SELECT doc_id,
        CASE WHEN doc_id < (2 * n) // 25 AND doc_id % 2 = 1
                  AND pos % 20 = 0
             THEN (wid + 7) % ({SETSIM_ZIPF_VOCAB_MULT} * n)
             ELSE wid END AS wid
    FROM (
        SELECT doc_id, pos, n,
            CAST(FLOOR(u * u * u * u * ({SETSIM_ZIPF_VOCAB_MULT} * n))
                AS BIGINT) AS wid
        FROM (
            SELECT doc_id, pos, n,
                ('0x' || substr(md5(CAST(bkey AS VARCHAR) || '_'
                    || CAST(pos AS VARCHAR)), 1, 8))::BIGINT
                / 4294967296.0 AS u
            FROM zgrid
        )
    )
),
zsets AS (SELECT DISTINCT doc_id, CAST(wid AS VARCHAR) AS shingle FROM ztok)
"""


def zipf_token_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the _SETSIM_ZIPF_SQL generator: a deterministic
    (doc_id, shingle) distinct-set frame over a Zipf-headed vocabulary,
    sized from the documents table so it scales with the fixture."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    nd = docs.agg(F.count("*").cast("bigint").alias("n"))
    pos = spark.range(SETSIM_ZIPF_LEN).select(F.col("id").alias("pos"))
    grid = docs.crossJoin(F.broadcast(pos)).crossJoin(F.broadcast(nd))
    dup_cut = F.expr("(2 * n) DIV 25")
    bkey = F.when(F.col("doc_id") < dup_cut, F.expr("doc_id DIV 2")).otherwise(
        F.col("doc_id")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "_", bkey.cast("string"), F.col("pos").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    vocab = F.lit(SETSIM_ZIPF_VOCAB_MULT) * F.col("n")
    wid = F.floor(u * u * u * u * vocab).cast("bigint")
    perturbed = (
        (F.col("doc_id") < dup_cut)
        & (F.col("doc_id") % 2 == 1)
        & (F.col("pos") % 20 == 0)
    )
    wid = F.when(perturbed, (wid + 7) % vocab).otherwise(wid)
    return grid.select(
        "doc_id", wid.cast("string").alias("shingle")
    ).distinct()


@query(
    "q_setsim_zipf",
    oracle="WITH "
    + _SETSIM_ZIPF_SQL.strip()
    + f""",
sizes AS (SELECT doc_id, COUNT(*) AS n FROM zsets GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM zsets a
    JOIN zsets b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
    ROUND(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.doc_a = sa.doc_id
JOIN sizes sb ON inter.doc_b = sb.doc_id
WHERE n_common / (sa.n + sb.n - n_common) >= {SETSIM_ZIPF_THRESHOLD}""",
)
def q_setsim_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_setsim_prefix_join on a corpus where prefix filtering can
    actually prune (r9 verdict item 8): the fixture documents' 31-word
    vocabulary has no rare tokens, so the exact twin degenerates to
    near-all-pairs and stays out of the headline; THIS key runs the
    identical prefix machinery (setsim_prefix_pairs) over a
    deterministic Zipf-headed synthetic corpus sized from the fixture
    (vocab and docs scale with sf, 8% planted near-dup pairs), making
    the scale path a measured headline number instead of an argued one.

    Hash-oracled: the generator is shared md5/integer arithmetic (the
    _lsh_ctes discipline) and the oracle verifies via the NAIVE
    all-token join — prefix filtering is provably lossless, so the hash
    gate doubles as a completeness proof on a corpus with real df
    variance (head tokens hot, tail tokens rare).

    Scale shape: identical to q_setsim_prefix_join — df rollup, rare-
    token prefix self-join (near-linear candidates), candidates-only
    verify. The generator itself is one crossJoin of the doc list with a
    broadcast 40-row position frame: no corpus-scale shuffle.

    r13 optimization: the generated token-set frame is materialized
    once (localCheckpoint inside the timed query) — setsim_prefix_pairs
    reads its input relation five times (sizes, dfreq, the prefix
    projection, and both verify-scan sides), and the un-shared plan
    re-ran the crossJoin + md5 generator + DISTINCT per reference (20
    parquet scans / 39 exchanges; guide §2.4). Deterministic generator,
    integer counts -> identical output; the fixture-corpus twin
    q_setsim_prefix_join (driver-gated, not benched) keeps its original
    plan."""
    return setsim_prefix_pairs(
        zipf_token_sets(spark, sf_dir).localCheckpoint(),
        SETSIM_ZIPF_THRESHOLD,
    )


@query(
    "q_ngram_novelty",
    oracle="WITH "
    + _SHINGLES_SQL.lstrip()
    + """,
df AS (
    SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM shingles
    GROUP BY shingle
)
SELECT s.doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_shingles,
    CAST(COUNT(CASE WHEN df.df = 1 THEN 1 END) AS BIGINT) AS n_unique,
    ROUND(COUNT(CASE WHEN df.df = 1 THEN 1 END) * 1.0 / COUNT(*), 6)
        AS novelty
FROM shingles s JOIN df ON s.shingle = df.shingle
GROUP BY s.doc_id""",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    word-bigram shingles that occur in NO other document (corpus
    document-frequency 1). The memorization/boilerplate exposure score a
    training-data pipeline reads next to the dedup verdicts: near-zero
    novelty means the doc is assembled from corpus-common n-grams
    (template/boilerplate or a near-dup that slipped the cluster
    threshold); it complements q_dedup_* (pairwise identity) with a
    corpus-frequency view that needs no pair generation at all.

    Scale: shingle document-frequency is ONE groupBy on the shingle key;
    the join back to the (doc, shingle) relation reuses that same hash
    partitioning, and the per-doc readout is a groupBy on doc_id — three
    shuffles of narrow rows, never pairwise work. (At 100 TB the shuffle
    key would be xxhash64(shingle) — 8 bytes instead of the string — at
    the cost of the oracle; the semantics are hash-free.)"""
    sh = shingles(spark, sf_dir)
    df = sh.groupBy("shingle").agg(F.count("*").cast("bigint").alias("df"))
    uniq = F.count(F.when(F.col("df") == 1, 1))
    return (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            uniq.cast("bigint").alias("n_unique"),
            F.round(uniq * 1.0 / F.count("*"), 6).alias("novelty"),
        )
    )


@query(
    "q_lsh_candidate_eval",
    oracle="WITH "
    + _lsh_ctes()
    + f""",
tinter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ni
    FROM hs a JOIN hs b ON b.x = a.x AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
truth AS (
    SELECT t.doc_a, t.doc_b
    FROM tinter t
    JOIN hsizes sa ON sa.doc_id = t.doc_a
    JOIN hsizes sb ON sb.doc_id = t.doc_b
    WHERE t.ni * 1.0 / (sa.n + sb.n - t.ni) >= {JACCARD_THRESHOLD}
),
m AS (
    SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM cand c
         JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
            AS n_true_candidates
)
SELECT n_truth, n_candidates, n_true_candidates,
    ROUND(n_true_candidates * 1.0 / n_truth, 6) AS recall,
    ROUND(n_true_candidates * 1.0 / n_candidates, 6) AS precision
FROM m""",
)
def q_lsh_candidate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding quality readout: recall and precision of the
    CANDIDATE set (pre-verification) against the exact hash-set Jaccard
    truth at the same threshold — the number a pipeline owner tunes
    bands x rows against (recall = how many true near-dups the buckets
    surface; precision = how much of the verify budget is wasted on
    false candidates). Complements the pytest recall assertions with a
    driver-hashed, user-runnable query; both engines derive truth AND
    candidates from the identical md5/affine pipeline (_lsh_ctes), so
    the four counters are bit-identical.

    Scale caveat, stated honestly: TRUTH needs the exact pair join —
    quadratic on hot shingle-hashes — so this is an OFFLINE evaluation
    run on a sample (exactly how production tunes LSH), not a step of
    the dedup path itself; the operator composes the same
    candidates-then-verify pieces the scale path uses."""
    sets = shingle_hash_sets(spark, sf_dir)
    cand = lsh_candidate_pairs(minhash_signatures(sets)).localCheckpoint(
        eager=False
    )
    hs = sets.select("doc_id", F.explode("hs").alias("x"))
    sizes = sets.select("doc_id", F.size("hs").alias("n"))
    a, b = hs.alias("a"), hs.alias("b")
    tinter = (
        a.join(
            b,
            (F.col("b.x") == F.col("a.x"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("ni"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni"))
    truth = (
        tinter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    n_truth = truth.agg(F.count("*").cast("bigint").alias("n_truth"))
    n_cand = cand.agg(F.count("*").cast("bigint").alias("n_candidates"))
    n_true_cand = cand.join(truth, ["doc_a", "doc_b"], "left_semi").agg(
        F.count("*").cast("bigint").alias("n_true_candidates")
    )
    j = (
        n_truth.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_true_cand))
    )
    return j.select(
        "n_truth",
        "n_candidates",
        "n_true_candidates",
        F.round(F.col("n_true_candidates") * 1.0 / F.col("n_truth"), 6).alias(
            "recall"
        ),
        F.round(
            F.col("n_true_candidates") * 1.0 / F.col("n_candidates"), 6
        ).alias("precision"),
    )


# --- containment dedup (subset/quote-expansion duplicates) -------------------

CONTAINMENT_THRESHOLD = 0.8


@query(
    "q_dedup_containment",
    oracle="WITH "
    + _SHINGLES_SQL.lstrip()
    + f""",
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM shingles a
    JOIN shingles b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a AS contained_doc, doc_b AS container_doc,
    ROUND(n_common / sa.n, 6) AS containment,
    CAST(sa.n AS BIGINT) AS n_shingles_contained,
    CAST(sb.n AS BIGINT) AS n_shingles_container
FROM inter
JOIN sizes sa ON inter.doc_a = sa.doc_id
JOIN sizes sb ON inter.doc_b = sb.doc_id
WHERE n_common / sa.n >= {CONTAINMENT_THRESHOLD} AND sa.n <= sb.n
ORDER BY contained_doc, container_doc""",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection by shingle containment
    |A∩B| / |A| >= 0.8 with |A| <= |B|: catches the quote-expansion /
    boilerplate-wrapper duplicates Jaccard structurally misses — a short
    article fully embedded in a longer aggregation page has Jaccard
    |A|/|B| (arbitrarily low) but containment ~1. The directed output
    names which doc is the contained one (the removal candidate) and
    which is its container.

    Exact small-scale baseline in the q_dedup_ngram_jaccard family: the
    shingle equi-join is quadratic on hot shingles, and the LSH banding /
    prefix-filter machinery (q_dedup_minhash_lsh, q_setsim_prefix_join)
    is the documented scale path — for containment the standard
    candidates-then-verify variant indexes only each doc's
    ceil((1-t)*|A|)+1 rarest shingles. Integer set arithmetic throughout,
    so the containment double is bit-identical cross-engine."""
    sh = shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    # n_common is symmetric: generate each unordered pair ONCE (a < b,
    # halving the hot-shingle join work vs the naive a <> b form — a
    # measured 2x at sf0.1) and emit both orientations afterwards
    canon = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
        # materialize: the union below reads this twice, and without the
        # checkpoint each branch would re-execute the whole shingle join
        .localCheckpoint()
    )
    inter = canon.unionByName(
        canon.select(
            F.col("doc_b").alias("doc_a"),
            F.col("doc_a").alias("doc_b"),
            "n_common",
        )
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            (F.col("n_common") / F.col("na") >= CONTAINMENT_THRESHOLD)
            & (F.col("na") <= F.col("nb"))
        )
        .select(
            F.col("doc_a").alias("contained_doc"),
            F.col("doc_b").alias("container_doc"),
            F.round(F.col("n_common") / F.col("na"), 6).alias("containment"),
            F.col("na").cast("bigint").alias("n_shingles_contained"),
            F.col("nb").cast("bigint").alias("n_shingles_container"),
        )
        .orderBy("contained_doc", "container_doc")
    )


def containment_prefix_pairs(sh: DataFrame, threshold: float) -> DataFrame:
    """Prefix-filtered exact containment >= threshold pairs, directed
    (contained, container): result-identical to the naive all-shingle
    join (the q_dedup_containment semantics) with near-linear candidate
    generation. Losslessness: if |A∩B| >= ceil(t*|A|), the overlap
    cannot fit inside A's last ceil(t*|A|)-1 shingles (global (df,
    shingle) order), so at least one of A's first
    |A| - ceil(t*|A|) + 1 rarest shingles is in B — indexing only that
    PREFIX of the probe side against the candidate side's full set
    loses nothing. Unlike the Jaccard prefix join, only the CONTAINED
    side is prefix-pruned (containment puts no upper bound on the
    container's size), and the size filter is n_b >= ceil(t*n_a)."""
    from pyspark.sql import Window

    t = threshold
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    pos_w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    prefix = (
        sh.join(dfreq, "shingle")
        .withColumn("pos", F.row_number().over(pos_w))
        .join(sizes, "doc_id")
        .filter(
            F.col("pos")
            <= F.col("n") - F.ceil(F.lit(t) * F.col("n")) + F.lit(1)
        )
        .select("doc_id", "shingle", "n")
    )
    b_full = sh.join(sizes, "doc_id").select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingle").alias("b_shingle"),
        F.col("n").alias("nb"),
    )
    cand = (
        prefix.alias("a")
        .join(
            b_full,
            (F.col("a.shingle") == F.col("b_shingle"))
            & (F.col("a.doc_id") != F.col("doc_b")),
        )
        .filter(
            (F.col("nb") >= F.ceil(F.lit(t) * F.col("a.n")))
            & (F.col("a.n") <= F.col("nb"))
        )
        .select(F.col("a.doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            (F.col("n_common") / F.col("na") >= t)
            & (F.col("na") <= F.col("nb"))
        )
        .select(
            F.col("doc_a").alias("contained_doc"),
            F.col("doc_b").alias("container_doc"),
            F.round(F.col("n_common") / F.col("na"), 6).alias("containment"),
            F.col("na").cast("bigint").alias("n_shingles_contained"),
            F.col("nb").cast("bigint").alias("n_shingles_container"),
        )
    )


@query(
    "q_dedup_containment_prefix",
    oracle="WITH "
    + _SHINGLES_SQL.lstrip()
    + f""",
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM shingles a
    JOIN shingles b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a AS contained_doc, doc_b AS container_doc,
    ROUND(n_common / sa.n, 6) AS containment,
    CAST(sa.n AS BIGINT) AS n_shingles_contained,
    CAST(sb.n AS BIGINT) AS n_shingles_container
FROM inter
JOIN sizes sa ON inter.doc_a = sa.doc_id
JOIN sizes sb ON inter.doc_b = sb.doc_id
WHERE n_common / sa.n >= {CONTAINMENT_THRESHOLD} AND sa.n <= sb.n
ORDER BY contained_doc, container_doc""",
)
def q_dedup_containment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE PATH for containment dedup promised by
    q_dedup_containment's docstring: prefix-filtered candidates (only
    each contained-side doc's rarest |A| - ceil(t|A|) + 1 shingles are
    indexed) + exact verify. The oracle is the NAIVE all-shingle SQL —
    the driver hash gate doubles as the losslessness proof, exactly the
    q_setsim_prefix_join contract. On a Zipf-vocabulary corpus the
    candidate work drops from quadratic-in-hot-shingle-df to the
    C(prefix_df, 2) of rare shingles; the fixture's 31-word vocabulary
    is the documented adversarial case (no rare shingles to prune)."""
    return containment_prefix_pairs(
        shingles(spark, sf_dir), CONTAINMENT_THRESHOLD
    ).orderBy("contained_doc", "container_doc")
