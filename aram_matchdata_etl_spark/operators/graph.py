"""Link-graph analytics: PageRank over a document link graph — the
corpus-curation signal web-scale training pipelines use for quality
weighting (a page's rank feeds sampling weights; see e.g. the
CommonCrawl curation literature). Complements the two connected-
components algorithms in `dedup.py`: CC answers "which docs are the
same", PageRank answers "which docs matter".

The fixture corpus has no hyperlinks, so ``link_graph`` synthesizes a
deterministic directed graph from doc_id hashes (every doc emits
OUT_LINKS edges to md5-bucket-derived targets — the engine-portable
hash shared with training.py::hash_bucket — kept only if the target
exists, so the graph has dangling nodes, asymmetric in/out degrees,
and hash-random hub structure). The PageRank kernel itself is
input-agnostic: point ``pagerank`` at any (src, dst) edge relation.

Scale notes (100 TB / billions of edges):
- Per iteration: one join (edges × ranks, both hash-partitioned on the
  join key at session parallelism) + one groupBy(dst) with map-side
  partial sums. Contribution rows are (dst, double) — 16 bytes —
  regardless of document size; bodies never enter the loop.
- Out-degrees are computed ONCE before the loop and folded into the
  edge relation (edge weight = 1/out_degree), so the loop never
  re-aggregates the edge list.
- localCheckpoint per round cuts lineage (round N's plan must not
  replay rounds 0..N-1); superseded checkpoints are freed eagerly —
  the exact hygiene the CC loop measured as necessary (dedup.py).
- The only driver-side values are two scalars per round: the dangling
  mass (needed by the PageRank recurrence itself) and the L1 delta for
  convergence — same cost class as CC's per-round changed-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table
from .dedup import _free_checkpoint, loop_checkpoints

OUT_LINKS = 3
DAMPING = 0.85
PR_ROUNDS = 15

PR_TELEMETRY: dict = {}


def link_graph(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic (src, dst) link relation: each doc emits
    OUT_LINKS candidate targets hashed from (doc_id, slot), kept if the
    target id exists in the corpus (left-semi — no row duplication) and
    is not a self-link. Modulo folds the hash into the observed id range
    without a driver-side max(): ids are joined back against the real
    universe, so out-of-range candidates simply drop out.

    The hash is the md5-hex-prefix bucket shared with the training
    split/sample family (training.py::hash_bucket) rather than xxhash64,
    specifically so a DuckDB oracle can reproduce the edge set
    bit-identically (see LINK_GRAPH_SQL) — the same move that made the
    DSIR bucket hash oracle-able."""
    cand = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.array(
                *[
                    F.conv(
                        F.substring(
                            F.md5(
                                (F.col("doc_id") * OUT_LINKS + F.lit(i)).cast("string")
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("bigint")
                    for i in range(OUT_LINKS)
                ]
            )
        ).alias("h"),
    )
    # fold the hash into the corpus id range without a driver-side max():
    # the corpus count arrives as a broadcast single-row frame, and the
    # semi-join against the real universe enforces existence even where
    # ids are not dense
    universe = docs.select(F.col("doc_id").alias("dst"))
    counts = docs.agg(F.count("*").alias("n"))
    edges = (
        cand.crossJoin(F.broadcast(counts))
        .select("src", F.pmod(F.col("h"), F.col("n")).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .join(F.broadcast(universe), "dst", "left_semi")
        .distinct()
    )
    return edges.select("src", "dst")


# DuckDB twin of link_graph: same md5-prefix hash, same modulo fold into the
# corpus id range, same existence semi-join and self-link filter — the edge
# set is bit-identical in both engines, which is what lets the triangle and
# k-core queries graduate from rows-only to hash-matched oracles.
LINK_GRAPH_SQL = f"""cnt AS (SELECT COUNT(*) AS n FROM documents),
cand AS (
    SELECT d.doc_id AS src,
        ('0x' || substr(md5(CAST(d.doc_id * {OUT_LINKS} + s.i AS VARCHAR)), 1, 8))::BIGINT
            % cnt.n AS dst
    FROM documents d CROSS JOIN cnt CROSS JOIN range({OUT_LINKS}) s(i)
),
edges AS (
    SELECT DISTINCT src, dst FROM cand
    WHERE src <> dst AND dst IN (SELECT doc_id FROM documents)
),
und AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges
)"""

def canonical_und(edges: DataFrame, checkpoint: bool = False) -> DataFrame:
    """Canonical undirected edge set (a < b, self-loops dropped, distinct)
    — the DataFrame twin of LINK_GRAPH_SQL's ``und`` CTE. Every consumer
    in this module MUST build through here so a change to the
    canonicalization cannot desync one operator from the shared oracle.
    ``checkpoint=True`` materializes it once for queries whose plan fans
    the edge set into several branches."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return und.localCheckpoint() if checkpoint else und


def sym_edges(und: DataFrame) -> DataFrame:
    """Symmetric closure of a canonical undirected edge set — the twin of
    the oracle ``sym`` CTEs (each undirected edge as both (a,b) and
    (b,a), so COUNT per first column IS the degree)."""
    return und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))




def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = PR_ROUNDS,
    damping: float = DAMPING,
    tol: float = 1e-9,
    tag: str = "default",
) -> DataFrame:
    """Power-iteration PageRank with proper dangling-mass redistribution:

        r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/deg(u) + dangling/N)

    ``nodes`` must have a ``doc_id`` column; ``edges`` (src, dst). Ranks
    sum to exactly 1 every round (dangling nodes donate their mass to the
    uniform term instead of leaking it). Stops early when the L1 delta
    falls under ``tol``.
    """
    telemetry: dict = {"rounds": 0, "l1_per_round": []}
    PR_TELEMETRY[tag] = telemetry
    n_nodes = nodes.count()  # one scalar, loop-invariant
    if n_nodes == 0:
        return nodes.select("doc_id", F.lit(0.0).alias("rank"))

    # materialize the edge derivation ONCE: deg, wedges and the dangling
    # flag below all consume the edge set, and link_graph's md5+distinct
    # pipeline re-evaluated per consumer measurably inflates setup (r7
    # forensics: 3.84 s -> ~3.3 s at sf0.1 from exactly this)
    edges = edges.localCheckpoint()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # weight folded into the edge ONCE: the loop joins, never re-counts
    wedges = edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    ).localCheckpoint()
    telemetry["edge_partitions"] = wedges.rdd.getNumPartitions()

    # dangling membership is a FIXED set — flag it once so the per-round
    # dangling mass folds into the same aggregation as the L1 delta
    # (2 jobs/round: checkpoint + one agg; a separate anti-join scan per
    # round measured ~+50% wall on fixed-overhead-dominated rounds)
    ranks = nodes.select(
        F.col("doc_id"),
        F.lit(1.0 / n_nodes).alias("rank"),
    ).join(
        deg.select(F.col("src").alias("doc_id"), F.lit(False).alias("dangling")),
        "doc_id",
        "left",
    ).select(
        "doc_id", "rank", F.coalesce("dangling", F.lit(True)).alias("dangling")
    ).localCheckpoint()
    dangling_mass = (
        ranks.agg(F.sum(F.when(F.col("dangling"), F.col("rank")))).first()[0] or 0.0
    )
    _free_checkpoint(edges)  # wedges + ranks are materialized; the raw
    # edge blocks are dead weight for the rest of the loop
    with loop_checkpoints() as lc:
        lc.own(wedges)
        ranks = lc.swap(ranks)
        for _ in range(rounds):
            base = (1.0 - damping) / n_nodes + damping * dangling_mass / n_nodes
            # r13 (guide §2.4, measured 107 jobs -> the round's fixed
            # overhead dominated sf0.1 wall): the old round ran TWO keyed
            # operations — groupBy(dst) for the contributions, then a
            # second join of ranks against that aggregate — each
            # materialized as its own AQE stage. Fused form: the edge
            # contributions and one zero-contribution self row per node
            # union into a SINGLE groupBy(doc_id), which computes the
            # contribution sum AND re-attaches (old_rank, dangling) in
            # one exchange (exactly one non-null old_rank per group). A
            # dst absent from `ranks` aggregates to a NULL old_rank row
            # and is filtered — the old left join's semantics. FP: the
            # contribution addends are identical with one extra +0.0
            # (all contributions are finite and non-negative, so
            # x + 0.0 == x bit-exactly); summation order was never
            # pinned — ROUND(9) absorbs it, as the oracle already
            # argues for the shuffle's own merge order.
            edge_c = wedges.join(ranks, wedges.src == ranks.doc_id).select(
                F.col("dst").alias("doc_id"),
                (F.col("rank") * F.col("w")).alias("c"),
                F.lit(None).cast("double").alias("old_rank"),
                F.lit(None).cast("boolean").alias("dangling"),
            )
            self_c = ranks.select(
                "doc_id",
                F.lit(0.0).alias("c"),
                F.col("rank").alias("old_rank"),
                "dangling",
            )
            merged = (
                edge_c.unionByName(self_c)
                .groupBy("doc_id")
                .agg(
                    F.sum("c").alias("contrib"),
                    F.max("old_rank").alias("old_rank"),
                    F.max("dangling").alias("dangling"),
                )
                .filter(F.col("old_rank").isNotNull())
                .select(
                    "doc_id",
                    "old_rank",
                    (F.lit(base) + F.lit(damping) * F.col("contrib")).alias(
                        "rank"
                    ),
                    "dangling",
                )
                # lazy checkpoint: the agg below materializes the blocks in
                # the SAME job (eager=True would spend a separate job per
                # round just to write them — measured ~2x total jobs)
                .localCheckpoint(eager=False)
            )
            l1, dangling_mass = merged.agg(
                F.sum(F.abs(F.col("rank") - F.col("old_rank"))),
                F.coalesce(
                    F.sum(F.when(F.col("dangling"), F.col("rank"))), F.lit(0.0)
                ),
            ).first()
            telemetry["rounds"] += 1
            telemetry["l1_per_round"].append(l1)
            lc.swap(merged)
            ranks = merged.select("doc_id", "rank", "dangling")
            # l1 == 0.0 is a BIT-EXACT fixed point: the round update is
            # a deterministic function of (ranks, dangling_mass), so
            # every remaining round would reproduce ranks unchanged —
            # skipping them cannot move any output (r13, guide §1.2
            # "don't compute things you throw away"; the hash-oracled
            # unrolled-CTE keys stay bit-identical by construction, and
            # their driver gates double as the proof). tol=0.0 callers
            # (the unrolled-oracle keys) still never exit on a merely
            # SMALL delta. q_textrank_keywords' near-complete word graph
            # reaches the exact fixed point after round 2 at every
            # fixture SF — 10 of its 12 rounds were identity re-runs.
            if l1 < tol or l1 == 0.0:
                break
        return ranks.select("doc_id", "rank")


def _pagerank_oracle_sql(rounds: int = PR_ROUNDS, d: float = DAMPING) -> str:
    """UNROLLED PageRank oracle: one plain CTE pair per power-iteration
    round (contrib aggregation, then the rank update with the previous
    round's dangling mass) — the loop the Spark operator runs, written
    out as `rounds` chained CTEs. No recursion needed, and every FP term
    mirrors the operator's recurrence exactly; ROUND(9) absorbs
    summation-order noise (per-node contrib sums are <= out-degree
    doubles, error ~1e-17 vs a 1e-9 grid). Valid because the operator's
    early-exit tolerance (1e-9) is never reached in `rounds` rounds at
    the oracle SF (measured l1 after 15 rounds at sf0.01: 1.8e-5)."""
    stages = []
    prev = "r0"
    for i in range(1, rounds + 1):
        stages.append(
            f"""c{i} AS MATERIALIZED (
    SELECT w.dst, SUM(w.w * p.rank) AS contrib
    FROM w JOIN {prev} p ON p.doc_id = w.src GROUP BY w.dst
), r{i} AS MATERIALIZED (
    SELECT n.doc_id, n.dangling,
        (1 - {d}) / cnt.n
        + {d} * ((SELECT SUM(CASE WHEN dangling THEN rank ELSE 0 END)
                  FROM {prev}) / cnt.n
                 + COALESCE(c.contrib, 0)) AS rank
    FROM {prev} n CROSS JOIN cnt LEFT JOIN c{i} c ON c.dst = n.doc_id
)"""
        )
        prev = f"r{i}"
    body = ",\n".join(stages)
    return f"""
WITH {LINK_GRAPH_SQL},
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
w AS MATERIALIZED (
    SELECT e.src, e.dst, 1.0 / d.deg AS w FROM edges e JOIN deg d USING (src)
),
r0 AS MATERIALIZED (
    SELECT doc_id, 1.0 / cnt.n AS rank,
        doc_id NOT IN (SELECT src FROM edges) AS dangling
    FROM documents CROSS JOIN cnt
),
{body}
SELECT doc_id, ROUND(rank, 9) AS rank FROM {prev}"""


@query("q_pagerank", oracle=_pagerank_oracle_sql())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the synthetic doc link graph. Oracled despite being
    iterative: the oracle unrolls the exact 15-round recurrence as
    chained SQL CTEs over the shared md5 edge set (_pagerank_oracle_sql),
    so the driver hash-checks the full float trajectory at ROUND(9). The
    numpy power-iteration differential in tests/test_graph.py (same
    edges, |diff| < 1e-9 per node) and the mass-conservation invariant
    (ranks sum to 1 every round) remain as independent checks."""
    docs = load_table(spark, sf_dir, "documents")
    # tol=0.0: the oracle unrolls EXACTLY PR_ROUNDS rounds, so the
    # operator must never early-exit — a smaller/denser future fixture
    # converging inside 15 rounds would otherwise silently desync the
    # hash gate (ADVICE r6). Convergence-tolerance behavior is covered
    # by pagerank()'s own tests.
    ranks = pagerank(docs, link_graph(docs), tag="q_pagerank", tol=0.0)
    return ranks.select("doc_id", F.round("rank", 9).alias("rank"))


@query(
    "q_triangle_count",
    oracle=f"""
WITH {LINK_GRAPH_SQL},
wedges AS (
    SELECT ab.a, ab.b, bc.b AS c FROM und ab JOIN und bc ON ab.b = bc.a
),
tri AS (
    SELECT 1 AS one FROM wedges w
    WHERE EXISTS (SELECT 1 FROM und u WHERE u.a = w.a AND u.b = w.c)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
    (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges
FROM tri""",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the (undirected) doc link graph — the classic
    clustering-coefficient / community-structure primitive. Oracled: the
    md5-bucket edge derivation is bit-identical in DuckDB (LINK_GRAPH_SQL),
    so the wedge-join + closing-semi-join result hash-matches; the
    pure-Python set-based differential in tests/test_graph.py stays as the
    independent third implementation.

    Plan (100 TB-shape): canonicalize edges a<b once; wedges come from
    ONE self-equi-join on the middle vertex (a<b<c ordering means each
    triangle is generated exactly once as its ordered wedge); the closing
    edge check is a LEFT SEMI join — no row multiplication past the
    wedge set. Cost is sum(deg^2) wedges; production graphs order
    endpoints by DEGREE instead of id so hub vertices sit on the wedge
    ends, not the middle (standard compact-forward optimization) — id
    ordering is kept here because the hash graph is degree-uniform."""
    docs = load_table(spark, sf_dir, "documents")
    e = link_graph(docs)
    # four consumers (both wedge sides, the closing join, the edge-count
    # agg): materialize the md5 edge derivation once
    und = canonical_und(e, checkpoint=True)
    ab = und.select(F.col("a"), F.col("b"))
    bc = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = ab.join(bc, "b").select("a", "b", "c")
    closing = und.select(F.col("a"), F.col("b").alias("c"))
    tris = wedges.join(closing, ["a", "c"], "left_semi")
    return tris.agg(
        F.count("*").alias("n_triangles"),
    ).crossJoin(und.agg(F.count("*").alias("n_edges")))


def pointer_jump_roots(
    nodes: DataFrame, parent_col: str = "parent", tag: str = "default"
) -> DataFrame:
    """Find each node's root and depth in a forest by pointer jumping
    (iterative doubling): each round replaces every node's known
    ancestor with that ancestor's ancestor and adds the distances —
    O(log depth) rounds instead of the O(depth) a one-step walk (or a
    recursive CTE) needs. ``nodes``: (doc_id, parent) with NULL parent
    at roots.

    Per round: ONE self-join of the (node, anc, d) frame keyed by anc
    (both sides hash-partitioned on the join key) + the same
    lazy-checkpoint/agg pattern as pagerank — 1 job per round. State is
    3 longs per node regardless of tree shape."""
    telemetry: dict = {"rounds": 0, "changed_per_round": []}
    PR_TELEMETRY[f"pj_{tag}"] = telemetry
    p = nodes.select(
        "doc_id",
        F.coalesce(F.col(parent_col), F.col("doc_id")).alias("anc"),
        F.when(F.col(parent_col).isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("d"),
    ).localCheckpoint()
    with loop_checkpoints() as lc:
        p = lc.swap(p)
        for _ in range(40):  # 2^40 depth bound; real exit is the changed-count
            anc2 = p.select(
                F.col("doc_id").alias("anc"),
                F.col("anc").alias("anc_anc"),
                F.col("d").alias("d2"),
            )
            jumped = (
                p.join(anc2, "anc")
                .select(
                    "doc_id",
                    F.col("anc_anc").alias("anc"),
                    (F.col("d") + F.col("d2")).alias("d"),
                    (F.col("anc") != F.col("anc_anc")).alias("moved"),
                )
                .localCheckpoint(eager=False)
            )
            changed = jumped.agg(F.sum(F.col("moved").cast("int"))).first()[0]
            telemetry["rounds"] += 1
            telemetry["changed_per_round"].append(int(changed or 0))
            lc.swap(jumped)
            p = jumped.select("doc_id", "anc", "d")
            if not changed:
                break
        return p.select(
            "doc_id", F.col("anc").alias("root_id"), F.col("d").alias("depth")
        )


@query(
    "q_hierarchy_flatten",
    oracle="""
WITH RECURSIVE walk AS (
    SELECT doc_id, doc_id AS cur, 0 AS depth FROM documents
    UNION ALL
    SELECT w.doc_id, w.cur // 2, w.depth + 1 FROM walk w WHERE w.cur >= 8
)
SELECT doc_id, cur AS root_id, CAST(depth AS INTEGER) AS depth
FROM walk WHERE cur < 8""",
)
def q_hierarchy_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy flattening (org chart / BOM / category-tree closure):
    every node's root and depth over a synthesized forest
    (parent(x) = x div 2 for x >= 8; ids 0-7 are roots). The oracle
    walks the chain with a RECURSIVE CTE — O(depth) sequential steps;
    the Spark side pointer-jumps in O(log depth) distributed rounds,
    which is the form that survives a billion-node hierarchy (a
    recursive-CTE translation would schedule depth-many dependent
    joins)."""
    docs = load_table(spark, sf_dir, "documents")
    nodes = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") >= 8, F.floor(F.col("doc_id") / 2).cast("long")
        ).alias("parent"),
    )
    out = pointer_jump_roots(nodes, tag="q_hierarchy_flatten")
    return out.select("doc_id", "root_id", F.col("depth").cast("int").alias("depth"))


KCORE_K = 4


def kcore(edges: DataFrame, k: int = KCORE_K, tag: str = "default") -> DataFrame:
    """k-core subgraph by iterative peeling: repeatedly drop nodes whose
    (undirected) degree falls below k until the graph stabilizes — the
    standard dense-community / spam-farm detector. Per round: one degree
    aggregation + two LEFT SEMI joins restricting the edge list to
    surviving endpoints, then the same lazy-checkpoint + single-action
    hygiene as the other iterative loops. Edge rows are two longs; node
    bodies never enter the loop. Round count is bounded by the peeling
    depth (<= max degeneracy ordering length, typically << nodes)."""
    telemetry: dict = {"rounds": 0, "edges_per_round": []}
    PR_TELEMETRY[f"kcore_{tag}"] = telemetry
    with loop_checkpoints() as lc:
        sym = lc.swap(sym_edges(canonical_und(edges)).localCheckpoint())
        n_prev = sym.count()
        telemetry["edges_per_round"].append(n_prev)
        while True:
            deg = sym.groupBy("a").agg(F.count("*").alias("deg"))
            keep = deg.filter(F.col("deg") >= k).select("a")
            # r13 (guide §2.4): both endpoint filters semi-join the SAME
            # keep frame keyed on the SAME column — swapping (a, b)
            # between the joins instead of renaming keep's column makes
            # the two broadcast subplans byte-identical, so ReuseExchange
            # builds keep once per round instead of twice (one fewer AQE
            # stage per peel round; output identical — set intersection
            # is symmetric)
            pruned = (
                sym.join(keep, "a", "left_semi")
                .select(F.col("b").alias("a"), F.col("a").alias("b"))
                .join(keep, "a", "left_semi")
                .select(F.col("b").alias("a"), F.col("a").alias("b"))
                .localCheckpoint(eager=False)
            )
            n_now = pruned.count()
            telemetry["rounds"] += 1
            telemetry["edges_per_round"].append(n_now)
            sym = lc.swap(pruned)
            if n_now == n_prev:
                break
            n_prev = n_now
        return sym.groupBy(F.col("a").alias("doc_id")).agg(
            F.count("*").alias("core_degree")
        )


# Peeling rounds the recursive-CTE oracle runs before reading the fixpoint;
# must exceed the peeling depth at the oracle SF (single digits at sf0.01 —
# the driver gate's scale) and costs only rows, not joins, once stable.
KCORE_ORACLE_ROUNDS = 60


@query(
    "q_kcore",
    oracle=f"""
WITH RECURSIVE {LINK_GRAPH_SQL},
sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
peel AS (
    SELECT a, b, 0 AS rnd FROM sym
    UNION ALL
    SELECT a, b, rnd + 1 FROM (
        SELECT p.a, p.b, p.rnd,
            COUNT(*) OVER (PARTITION BY p.a) AS da,
            COUNT(*) OVER (PARTITION BY p.b) AS db
        FROM peel p
    ) WHERE da >= {KCORE_K} AND db >= {KCORE_K} AND rnd < {KCORE_ORACLE_ROUNDS}
)
SELECT a AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM peel WHERE rnd = {KCORE_ORACLE_ROUNDS} GROUP BY a""",
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Members of the 4-core of the doc link graph with their within-core
    degree. Oracled via a recursive-CTE peeling twin: the working table
    carries the surviving symmetric edge set round over round (an edge
    survives iff both endpoints' degrees are >= k — in a symmetric
    relation COUNT OVER (PARTITION BY second-endpoint) IS that endpoint's
    degree, which keeps the recursive term to the single self-reference
    SQL allows), run past the fixpoint and read at the round cap. The
    pure-Python peeling differential in tests/test_graph.py plus the
    degree>=k invariant stay as independent checks."""
    docs = load_table(spark, sf_dir, "documents")
    out = kcore(link_graph(docs), tag="q_kcore")
    return out.select("doc_id", "core_degree")


@query(
    "q_clustering_coeff",
    oracle=f"""
WITH {LINK_GRAPH_SQL},
sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
deg AS (SELECT a AS v, COUNT(*) AS deg FROM sym GROUP BY a),
wedge AS (
    SELECT s1.a AS v, s1.b AS x, s2.b AS y
    FROM sym s1 JOIN sym s2 ON s1.a = s2.a AND s1.b < s2.b
),
tri AS (
    SELECT w.v, COUNT(*) AS t FROM wedge w
    JOIN und u ON u.a = LEAST(w.x, w.y) AND u.b = GREATEST(w.x, w.y)
    GROUP BY w.v
)
SELECT d.v AS doc_id, CAST(d.deg AS BIGINT) AS degree,
    CAST(COALESCE(tri.t, 0) AS BIGINT) AS n_triangles,
    ROUND(CASE WHEN d.deg >= 2
        THEN 2.0 * COALESCE(tri.t, 0) / (d.deg * (d.deg - 1.0))
        ELSE 0.0 END, 6) AS clustering_coeff
FROM deg d LEFT JOIN tri USING (v)""",
)
def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the undirected doc link
    graph — 2*T(v) / (deg(v) * (deg(v)-1)), the classic community-density
    node feature (and the per-node refinement of q_triangle_count's
    global number). Fully oracled through the shared md5 edge CTE.

    Plan (100 TB shape): degrees are one partial-agg groupBy of the
    symmetric edge list; wedges centered at v come from ONE self-equi-join
    of sym on the center (x < y generates each unordered neighbor pair
    once); closure joins und on the canonicalized pair key. All joins key
    on node ids (two-long rows) — document bodies never move. Cost is
    sum(deg^2) wedge rows, the same bound as triangle counting; hub
    mitigation at scale is neighbor-list truncation or degree-ordered
    wedge direction, both composable here."""
    docs = load_table(spark, sf_dir, "documents")
    e = link_graph(docs)
    # materialize the canonical edge set ONCE: it feeds the degree agg,
    # both wedge sides and the closure join — recomputing it per branch
    # would re-derive + re-distinct the corpus edge relation ~5x
    und = canonical_und(e, checkpoint=True)
    sym = sym_edges(und)
    deg = sym.groupBy(F.col("a").alias("v")).agg(F.count("*").alias("deg"))
    s1 = sym.select(F.col("a").alias("v"), F.col("b").alias("x"))
    s2 = sym.select(F.col("a").alias("v"), F.col("b").alias("y"))
    wedge = s1.join(s2, "v").filter(F.col("x") < F.col("y"))
    closing = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = (
        wedge.join(closing, ["x", "y"], "left_semi")
        .groupBy("v")
        .agg(F.count("*").alias("t"))
    )
    coeff = F.when(
        F.col("deg") >= 2,
        2.0 * F.coalesce(F.col("t"), F.lit(0)) / (F.col("deg") * (F.col("deg") - 1.0)),
    ).otherwise(F.lit(0.0))
    return deg.join(tri, "v", "left").select(
        F.col("v").alias("doc_id"),
        F.col("deg").alias("degree"),
        F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("n_triangles"),
        F.round(coeff, 6).alias("clustering_coeff"),
    )


ADAMIC_ADAR_TOPK = 100


@query(
    "q_link_predict",
    oracle=f"""
WITH {LINK_GRAPH_SQL},
sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
deg AS (SELECT a AS v, COUNT(*) AS deg FROM sym GROUP BY a),
pair AS (
    SELECT s1.b AS u, s2.b AS w, s1.a AS z
    FROM sym s1 JOIN sym s2 ON s1.a = s2.a AND s1.b < s2.b
),
scored AS (
    SELECT p.u AS a, p.w AS b,
        CAST(COUNT(*) AS BIGINT) AS common_neighbors,
        ROUND(SUM(1.0 / LN(d.deg)), 6) AS adamic_adar
    FROM pair p JOIN deg d ON d.v = p.z
    WHERE d.deg > 1
    GROUP BY p.u, p.w
),
nonedge AS (
    SELECT s.* FROM scored s
    WHERE NOT EXISTS (SELECT 1 FROM und u WHERE u.a = s.a AND u.b = s.b)
)
SELECT a, b, common_neighbors, adamic_adar FROM nonedge
ORDER BY adamic_adar DESC, common_neighbors DESC, a, b
LIMIT {ADAMIC_ADAR_TOPK}""",
)
def q_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the doc graph: top-{ADAMIC_ADAR_TOPK}
    non-adjacent pairs by Adamic-Adar score (sum over common neighbors z
    of 1/ln(deg(z)), the standard common-neighbor weighting that
    discounts hubs), with common-neighbor count as the secondary signal.
    Deterministic total order (score desc, count desc, pair id) makes the
    top-k oracle-exact.

    Plan: candidate pairs are generated ONLY through shared neighbors
    (the wedge join — never the quadratic non-edge space), scores
    aggregate per pair with map-side partials, known edges leave via one
    anti-join on the canonical pair key, and the top-k is
    TakeOrderedAndProject (no global sort materialization). The z with
    deg=1 contributes nothing (1/ln(1) undefined) and is filtered exactly
    as the oracle does."""
    docs = load_table(spark, sf_dir, "documents")
    e = link_graph(docs)
    # one materialization feeds wedge generation, degrees and the
    # known-edge anti-join (see q_clustering_coeff)
    und = canonical_und(e, checkpoint=True)
    sym = sym_edges(und)
    deg = sym.groupBy(F.col("a").alias("v")).agg(F.count("*").alias("deg"))
    s1 = sym.select(F.col("a").alias("z"), F.col("b").alias("u"))
    s2 = sym.select(F.col("a").alias("z"), F.col("b").alias("w"))
    pair = s1.join(s2, "z").filter(F.col("u") < F.col("w"))
    scored = (
        pair.join(deg.filter(F.col("deg") > 1), pair.z == F.col("v"))
        .groupBy(F.col("u").alias("a"), F.col("w").alias("b"))
        .agg(
            F.count("*").cast("bigint").alias("common_neighbors"),
            F.round(F.sum(1.0 / F.log(F.col("deg"))), 6).alias("adamic_adar"),
        )
    )
    nonedge = scored.join(und, ["a", "b"], "left_anti")
    return nonedge.orderBy(
        F.desc("adamic_adar"), F.desc("common_neighbors"), "a", "b"
    ).limit(ADAMIC_ADAR_TOPK)


HITS_ROUNDS = 15


def hits(nodes: DataFrame, edges: DataFrame, rounds: int = HITS_ROUNDS,
         tag: str = "default") -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999): authority(v) sums the
    hub scores of its in-neighbors, hub(u) sums the NEW authority scores
    of its out-neighbors, both L2-normalized per round — the second
    eigenvector pair of the link matrix beside PageRank's single
    stationary vector (hubs = curation pages, authorities = canonical
    sources; both are corpus-quality signals).

    Same per-round discipline as pagerank: two edge-keyed joins + two
    partial aggs, lazy localCheckpoint materialized by ONE norms
    aggregation per round (the only driver traffic — 4 scalars), eager
    free of the superseded checkpoint. Normalization is folded in as a
    column expression from the aggregated norms, costing no extra job;
    the convergence telemetry derives the L2 delta analytically from
    <new, old> (delta^2 = 2 - 2*cos) instead of a second pass."""
    telemetry: dict = {"rounds": 0, "auth_delta_per_round": []}
    PR_TELEMETRY[f"hits_{tag}"] = telemetry
    with loop_checkpoints() as lc:
        e = lc.own(edges.select("src", "dst").localCheckpoint())
        state = lc.swap(
            nodes.select(
                "doc_id", F.lit(1.0).alias("h"), F.lit(1.0).alias("a")
            ).localCheckpoint()
        )
        return _hits_rounds(e, state, rounds, telemetry, lc)


def _hits_rounds(e, state, rounds, telemetry, lc):
    for _ in range(rounds):
        a_new = (
            e.join(state.select(F.col("doc_id").alias("src"), "h"), "src")
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.sum("h").alias("a_raw"))
        )
        h_new = (
            e.join(a_new.select(F.col("doc_id").alias("dst"), "a_raw"), "dst")
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.sum("a_raw").alias("h_raw"))
        )
        merged = (
            state.select("doc_id", F.col("a").alias("old_a"))
            .join(a_new, "doc_id", "left")
            .join(h_new, "doc_id", "left")
            .select(
                "doc_id",
                "old_a",
                F.coalesce("a_raw", F.lit(0.0)).alias("a_raw"),
                F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
            )
            .localCheckpoint(eager=False)
        )
        sa2, sh2, sao = merged.agg(
            F.sum(F.col("a_raw") ** 2),
            F.sum(F.col("h_raw") ** 2),
            F.sum(F.col("a_raw") * F.col("old_a")),
        ).first()
        # empty-frame guard: SUM over zero rows is NULL -> None; fall
        # through to the `or 1.0` normalizer instead of None ** 0.5
        na = (sa2 or 0.0) ** 0.5 or 1.0
        nh = (sh2 or 0.0) ** 0.5 or 1.0
        sao = sao or 0.0
        telemetry["rounds"] += 1
        # ||a_norm - old_a||^2 = 2 - 2 <a_raw, old_a>/na (both unit-norm)
        telemetry["auth_delta_per_round"].append(
            max(0.0, 2.0 - 2.0 * sao / na) ** 0.5
        )
        lc.swap(merged)
        state = merged.select(
            "doc_id",
            (F.col("h_raw") / F.lit(nh)).alias("h"),
            (F.col("a_raw") / F.lit(na)).alias("a"),
        )
    return state.select(
        "doc_id", F.round("h", 9).alias("hub"), F.round("a", 9).alias("authority")
    )


def _hits_oracle_sql(rounds: int = HITS_ROUNDS) -> str:
    """UNROLLED HITS oracle (same trick as _pagerank_oracle_sql): one
    MATERIALIZED CTE triple per round — authority aggregation from the
    previous hubs, hub aggregation from the NEW authorities, then the
    L2-normalized state via scalar-subquery norms (empty-norm guarded to
    1, matching the operator's `or 1.0`)."""
    stages = []
    prev = "s0"
    for i in range(1, rounds + 1):
        stages.append(
            f"""ar{i} AS MATERIALIZED (
    SELECT e.dst AS doc_id, SUM(p.h) AS a_raw
    FROM edges e JOIN {prev} p ON p.doc_id = e.src GROUP BY e.dst
), hr{i} AS MATERIALIZED (
    SELECT e.src AS doc_id, SUM(a.a_raw) AS h_raw
    FROM edges e JOIN ar{i} a ON a.doc_id = e.dst GROUP BY e.src
), s{i} AS MATERIALIZED (
    SELECT d.doc_id,
        COALESCE(h.h_raw, 0)
            / COALESCE(NULLIF((SELECT SQRT(SUM(h_raw * h_raw)) FROM hr{i}), 0), 1)
            AS h,
        COALESCE(a.a_raw, 0)
            / COALESCE(NULLIF((SELECT SQRT(SUM(a_raw * a_raw)) FROM ar{i}), 0), 1)
            AS a
    FROM documents d LEFT JOIN ar{i} a USING (doc_id)
    LEFT JOIN hr{i} h USING (doc_id)
)"""
        )
        prev = f"s{i}"
    body = ",\n".join(stages)
    return f"""
WITH {LINK_GRAPH_SQL},
s0 AS (SELECT doc_id, 1.0 AS h, 1.0 AS a FROM documents),
{body}
SELECT doc_id, ROUND(h, 9) AS hub, ROUND(a, 9) AS authority FROM {prev}"""


@query("q_hits", oracle=_hits_oracle_sql())
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hub/authority scores over the doc link graph. Oracled despite
    being iterative, via the same unrolled-CTE trick as q_pagerank
    (_hits_oracle_sql hash-matches the full 15-round float trajectory at
    ROUND(9)); the numpy power-iteration differential in
    tests/test_graph.py (same edges, |diff| < 1e-6 per node) and the
    unit-L2-norm invariant remain as independent checks."""
    docs = load_table(spark, sf_dir, "documents")
    return hits(docs, link_graph(docs), tag="q_hits")


LPA_ROUNDS = 4


def _lpa_ctes(rounds: int = LPA_ROUNDS) -> tuple[str, str]:
    """The unrolled-LPA WITH-body (shared by the LPA oracle and the
    modularity oracle that composes it); returns (body, final_cte)."""
    stages = []
    prev = "l0"
    for i in range(1, rounds + 1):
        stages.append(
            f"""v{i} AS MATERIALIZED (
    SELECT s.a AS doc_id, p.community, COUNT(*) AS c
    FROM sym s JOIN {prev} p ON p.doc_id = s.b
    GROUP BY s.a, p.community
), l{i} AS MATERIALIZED (
    SELECT n.doc_id, COALESCE(w.community, n.community) AS community
    FROM {prev} n LEFT JOIN (
        SELECT doc_id, community FROM (
            SELECT doc_id, community,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY c DESC, community) AS rn
            FROM v{i}
        ) WHERE rn = 1
    ) w USING (doc_id)
)"""
        )
        prev = f"l{i}"
    body = ",\n".join(stages)
    return (
        f"""{LINK_GRAPH_SQL},
sym AS MATERIALIZED (
    SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
),
l0 AS (SELECT doc_id, doc_id AS community FROM documents),
{body}""",
        prev,
    )


def _lpa_oracle_sql(rounds: int = LPA_ROUNDS) -> str:
    body, last = _lpa_ctes(rounds)
    return f"""
WITH {body}
SELECT doc_id, community FROM {last}"""


@query("q_label_propagation", oracle=_lpa_oracle_sql())
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) over the undirected doc link graph: {LPA_ROUNDS} rounds of
    every node adopting its neighborhood's plurality label
    (deterministic min-label tie-break, isolated nodes keep their own) —
    the near-linear community primitive complementing CC (which needs
    actual connectivity) and k-core (which needs density). Oracled via
    the unrolled-CTE recurrence.

    Per round: ONE neighbor-label join (edge-keyed, two-long rows) + one
    (node, label) count agg + one plurality window partitioned by node —
    all sharing the node-id exchange; same lazy-checkpoint hygiene as
    the other iterative loops. Synchronous updates (not the
    asynchronous/random variant) are what make the result deterministic
    and therefore testable across engines."""
    docs = load_table(spark, sf_dir, "documents")
    return label_propagation(docs, link_graph(docs))


def label_propagation(
    docs: DataFrame, edges: DataFrame, rounds: int = LPA_ROUNDS
) -> DataFrame:
    """Synchronous LPA kernel (see q_label_propagation); reused by
    q_graph_modularity, which scores the partition it finds."""
    from pyspark.sql import Window

    und = canonical_und(edges)
    with loop_checkpoints() as lc:
        sym = lc.own(sym_edges(und).localCheckpoint())
        labels = lc.swap(
            docs.select(
                "doc_id", F.col("doc_id").alias("community")
            ).localCheckpoint()
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("c"), "community")
        for _ in range(rounds):
            votes = (
                sym.join(
                    labels.select(F.col("doc_id").alias("b"), "community"), "b"
                )
                .groupBy(F.col("a").alias("doc_id"), "community")
                .agg(F.count("*").alias("c"))
            )
            winner = (
                votes.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("doc_id", F.col("community").alias("new_community"))
            )
            labels = (
                labels.join(winner, "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce("new_community", "community").alias("community"),
                )
                .localCheckpoint(eager=False)
            )
            labels.count()  # materialize round (and cut lineage)
            lc.swap(labels)
        return labels.select("doc_id", "community")


_MOD_BODY, _MOD_LAST = _lpa_ctes()


@query(
    "q_graph_modularity",
    oracle=f"""
WITH {_MOD_BODY},
lab AS (SELECT doc_id, community FROM {_MOD_LAST}),
m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM und),
intra AS (
    SELECT la.community, CAST(COUNT(*) AS BIGINT) AS e
    FROM und
    JOIN lab la ON la.doc_id = und.a
    JOIN lab lb ON lb.doc_id = und.b AND lb.community = la.community
    GROUP BY la.community
),
deg AS (SELECT a AS doc_id, COUNT(*) AS d FROM sym GROUP BY a),
comm AS (
    SELECT l.community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        CAST(COALESCE(SUM(d.d), 0) AS BIGINT) AS degree_sum
    FROM lab l LEFT JOIN deg d USING (doc_id) GROUP BY l.community
)
SELECT c.community, c.n_nodes,
    COALESCE(i.e, 0) AS intra_edges, c.degree_sum,
    ROUND(COALESCE(i.e, 0) / m.m
        - POW(c.degree_sum / (2.0 * m.m), 2), 9) + 0.0 AS contribution
FROM comm c LEFT JOIN intra i USING (community) CROSS JOIN m""",
)
def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the LPA partition, per community:
    Q_c = e_c/m - (d_c/2m)^2 (intra-community edge share minus the
    configuration-model expectation); total Q = sum of contributions.
    The standard "did community detection find real structure" readout
    — scoring the exact partition q_label_propagation ships, so the two
    oracles compose: the unrolled-LPA CTE chain feeds the modularity
    aggregation in both dialects.

    Scale: beyond the LPA rounds themselves, one label join per edge
    endpoint (two-long rows), one degree agg, and community-level
    rollups — everything keyed on node id or community id, nothing at
    corpus width."""
    docs = load_table(spark, sf_dir, "documents")
    edges = link_graph(docs)
    und = canonical_und(edges, checkpoint=True)
    lab = label_propagation(docs, edges).localCheckpoint()
    m_df = und.agg(F.count("*").cast("double").alias("m"))
    la = lab.select(F.col("doc_id").alias("a"), F.col("community").alias("ca"))
    lb = lab.select(F.col("doc_id").alias("b"), F.col("community").alias("cb"))
    intra = (
        und.join(la, "a")
        .join(lb, "b")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count("*").cast("bigint").alias("e"))
    )
    deg = sym_edges(und).groupBy("a").agg(F.count("*").alias("d"))
    comm = (
        lab.join(deg, lab.doc_id == deg.a, "left")
        .groupBy("community")
        .agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            F.coalesce(F.sum("d"), F.lit(0)).cast("bigint").alias("degree_sum"),
        )
    )
    out = (
        comm.join(intra, "community", "left")
        .crossJoin(F.broadcast(m_df))
        .select(
            "community",
            "n_nodes",
            F.coalesce("e", F.lit(0)).alias("intra_edges"),
            "degree_sum",
            (
                F.round(
                    F.coalesce("e", F.lit(0)) / F.col("m")
                    - F.pow(F.col("degree_sum") / (2.0 * F.col("m")), 2),
                    9,
                )
                + 0.0
            ).alias("contribution"),
        )
    )
    return out


BFS_CAP = 64  # oracle depth cap; far above the hash graph's diameter


@query(
    "q_shortest_paths",
    oracle=f"""
WITH RECURSIVE {LINK_GRAPH_SQL},
sym AS MATERIALIZED (
    SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
),
src AS (SELECT MIN(doc_id) AS s FROM documents),
bfs(doc_id, d) AS (
    SELECT s AS doc_id, 0 AS d FROM src
    UNION
    SELECT sym.b AS doc_id, bfs.d + 1 AS d
    FROM bfs JOIN sym ON sym.a = bfs.doc_id
    WHERE bfs.d < {BFS_CAP}
)
SELECT doc_id, CAST(MIN(d) AS INTEGER) AS dist
FROM bfs GROUP BY doc_id""",
)
def q_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS shortest paths (hop distance from the
    lowest-id document) over the undirected doc link graph — the
    reachability/radius primitive behind influence analysis and graph
    sampling. Oracled: the recursive CTE uses UNION (not UNION ALL)
    recursion, whose working-table dedup caps each level at |nodes|
    rows — without it, walk multiplicity explodes exponentially; the
    depth guard bounds the (node, distance) pair space cycles generate.

    Spark side is frontier BFS: per round ONE edge-keyed join expands
    the frontier, an anti-join against the visited set keeps only newly
    reached nodes (so each node is expanded exactly once — total work is
    O(edges), not O(edges x diameter)), with the same lazy-checkpoint +
    telemetry discipline as the other iterative loops. Rounds =
    eccentricity of the source (~log n on hash-random graphs)."""
    docs = load_table(spark, sf_dir, "documents")
    telemetry: dict = {"rounds": 0, "frontier_per_round": []}
    PR_TELEMETRY["bfs_q_shortest_paths"] = telemetry
    e = link_graph(docs)
    und = canonical_und(e)
    # two rolling chains (visited accumulator + current frontier), each
    # under its own checkpoint tracker; sym is loop scratch
    with loop_checkpoints() as lcv, loop_checkpoints() as lcf:
        sym = lcv.own(sym_edges(und).localCheckpoint())
        source = docs.agg(F.min("doc_id").alias("doc_id"))
        visited = lcv.swap(
            source.select("doc_id", F.lit(0).alias("dist")).localCheckpoint()
        )
        frontier = visited
        d = 0
        while True:
            d += 1
            nxt = (
                sym.join(
                    frontier.select(F.col("doc_id").alias("a")), "a"
                )
                .select(F.col("b").alias("doc_id"))
                .distinct()
                .join(visited, "doc_id", "left_anti")
                .select("doc_id", F.lit(d).alias("dist"))
                .localCheckpoint(eager=False)
            )
            n = nxt.count()
            telemetry["rounds"] += 1
            telemetry["frontier_per_round"].append(n)
            if n == 0:
                lcf.own(nxt)  # empty final frontier: not part of the result
                break
            grown = visited.unionByName(nxt).localCheckpoint(eager=False)
            grown.count()  # materialize BEFORE freeing the superseded frame
            visited = lcv.swap(grown)
            frontier = lcf.swap(nxt)
        return visited.select("doc_id", F.col("dist").cast("int").alias("dist"))


PPR_SEED_SOURCE = "src0"


def _ppr_oracle_sql(rounds: int = PR_ROUNDS, d: float = DAMPING) -> str:
    """Unrolled personalized-PageRank oracle: same chassis as
    _pagerank_oracle_sql, but the teleport (and the dangling-mass
    redistribution) lands ONLY on the seed set — rank mass always flows
    back toward the seeds, which is what makes PPR a similarity measure
    rather than a global importance measure."""
    stages = []
    prev = "r0"
    for i in range(1, rounds + 1):
        stages.append(
            f"""c{i} AS MATERIALIZED (
    SELECT w.dst, SUM(w.w * p.rank) AS contrib
    FROM w JOIN {prev} p ON p.doc_id = w.src GROUP BY w.dst
), r{i} AS MATERIALIZED (
    SELECT n.doc_id, n.dangling, n.seed,
        CASE WHEN n.seed THEN
            ((1 - {d}) + {d} * (SELECT SUM(CASE WHEN dangling THEN rank
                                          ELSE 0 END) FROM {prev})) / scnt.s
        ELSE 0 END
        + {d} * COALESCE(c.contrib, 0) AS rank
    FROM {prev} n CROSS JOIN scnt LEFT JOIN c{i} c ON c.dst = n.doc_id
)"""
        )
        prev = f"r{i}"
    body = ",\n".join(stages)
    return f"""
WITH {LINK_GRAPH_SQL},
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
w AS MATERIALIZED (
    SELECT e.src, e.dst, 1.0 / d.deg AS w FROM edges e JOIN deg d USING (src)
),
scnt AS (SELECT COUNT(*) AS s FROM documents WHERE source = '{PPR_SEED_SOURCE}'),
r0 AS (
    SELECT doc_id,
        CASE WHEN source = '{PPR_SEED_SOURCE}' THEN 1.0 / scnt.s ELSE 0.0 END
            AS rank,
        doc_id NOT IN (SELECT src FROM edges) AS dangling,
        source = '{PPR_SEED_SOURCE}' AS seed
    FROM documents CROSS JOIN scnt
),
{body}
SELECT doc_id, ROUND(rank, 9) AS rank FROM {prev}"""


@query("q_pagerank_personalized", oracle=_ppr_oracle_sql())
def q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (random walk with restart) from the
    '{PPR_SEED_SOURCE}' documents: teleport and dangling mass return to
    the SEED set instead of the uniform vector, so rank measures
    proximity to the seeds — the similarity/recommendation primitive
    (and the trust-propagation scheme behind seed-based corpus quality
    weighting a la TrustRank). Oracled via the unrolled-CTE recurrence.

    Same per-round shape and hygiene as the global kernel: one
    edges x ranks join + one partial agg, lazy checkpoint materialized
    by the single dangling/L1 aggregation, eager free, telemetry."""
    docs = load_table(spark, sf_dir, "documents")
    edges = link_graph(docs)
    telemetry: dict = {"rounds": 0, "l1_per_round": []}
    PR_TELEMETRY["q_pagerank_personalized"] = telemetry
    d = DAMPING
    seeds = docs.select(
        "doc_id", (F.col("source") == PPR_SEED_SOURCE).alias("seed")
    )
    n_seeds = seeds.filter("seed").count()
    if n_seeds == 0:
        # no teleport targets: the walk has nowhere to restart — every
        # rank is 0, exactly what the oracle's never-taken CASE yields
        return docs.select("doc_id", F.round(F.lit(0.0), 9).alias("rank"))
    # one materialization of the md5 edge derivation for all consumers
    # (deg / wedges / the dangling flag) — same setup fix as pagerank()
    edges = edges.localCheckpoint()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    wedges = edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    ).localCheckpoint()
    ranks = (
        seeds.join(
            deg.select(F.col("src").alias("doc_id"), F.lit(False).alias("dangling")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.when(F.col("seed"), 1.0 / n_seeds).otherwise(0.0).alias("rank"),
            F.coalesce("dangling", F.lit(True)).alias("dangling"),
            "seed",
        )
        .localCheckpoint()
    )
    dangling_mass = (
        ranks.agg(F.sum(F.when(F.col("dangling"), F.col("rank")))).first()[0] or 0.0
    )
    _free_checkpoint(edges)
    with loop_checkpoints() as lc:
        lc.own(wedges)
        ranks = lc.swap(ranks)
        for _ in range(PR_ROUNDS):
            contribs = (
                wedges.join(ranks, wedges.src == ranks.doc_id)
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
            )
            base = F.when(
                F.col("seed"),
                ((1.0 - d) + d * dangling_mass) / n_seeds,
            ).otherwise(0.0)
            merged = (
                ranks.join(contribs, ranks.doc_id == contribs.dst, "left")
                .select(
                    "doc_id",
                    F.col("rank").alias("old_rank"),
                    (base + d * F.coalesce(F.col("contrib"), F.lit(0.0))).alias(
                        "rank"
                    ),
                    "dangling",
                    "seed",
                )
                .localCheckpoint(eager=False)
            )
            l1, dangling_mass = merged.agg(
                F.sum(F.abs(F.col("rank") - F.col("old_rank"))),
                F.coalesce(
                    F.sum(F.when(F.col("dangling"), F.col("rank"))), F.lit(0.0)
                ),
            ).first()
            telemetry["rounds"] += 1
            telemetry["l1_per_round"].append(l1)
            lc.swap(merged)
            ranks = merged.select("doc_id", "rank", "dangling", "seed")
        return ranks.select("doc_id", F.round("rank", 9).alias("rank"))


HILL_DMIN = 2  # power-law tail cutoff for the Hill estimator


@query(
    "q_degree_dist",
    oracle=f"""
WITH {LINK_GRAPH_SQL},
sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
deg AS (
    SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY a
), dist AS (
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg GROUP BY degree
), hill AS (
    SELECT COUNT(*) AS k, SUM(LN(degree / ({HILL_DMIN} - 0.5))) AS s
    FROM deg WHERE degree >= {HILL_DMIN}
)
SELECT degree, n_nodes,
    ROUND(SUM(n_nodes) OVER (ORDER BY degree DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        * 1.0 / SUM(n_nodes) OVER (), 6) AS ccdf,
    ROUND(1.0 + hill.k / hill.s, 6) AS hill_alpha
FROM dist CROSS JOIN hill""",
)
def q_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the undirected link graph with its CCDF and
    the Hill/Clauset MLE power-law exponent
    (alpha = 1 + k / sum ln(d_i / (d_min - 1/2)), tail at
    d_min = {HILL_DMIN}) — the first diagnostic run on any web graph:
    a heavy tail here is exactly what forecasts skewed shuffles in the
    PageRank/k-core family (the q_gini early-warning, graph edition).
    Isolated documents carry no edges and are absent by construction.

    Scale: degrees are one groupBy over the symmetric edge list; the
    distribution, CCDF window, and Hill sum all run at max-degree scale
    (hundreds of rows on a web graph), never over nodes or edges."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    und = canonical_und(link_graph(docs))
    deg = (
        sym_edges(und)
        .groupBy("a")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    dist = deg.groupBy("degree").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )
    hill = deg.filter(F.col("degree") >= HILL_DMIN).agg(
        F.count("*").alias("k"),
        F.sum(F.log(F.col("degree") / (HILL_DMIN - 0.5))).alias("s"),
    )
    wd = Window.orderBy(F.col("degree").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    return dist.crossJoin(F.broadcast(hill)).select(
        "degree",
        "n_nodes",
        F.round(
            F.sum("n_nodes").over(wd) * 1.0 / F.sum("n_nodes").over(wall), 6
        ).alias("ccdf"),
        F.round(1.0 + F.col("k") / F.col("s"), 6).alias("hill_alpha"),
    )


@query(
    "q_assortativity",
    oracle=f"""
WITH {LINK_GRAPH_SQL},
sym AS (SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und),
deg AS (
    SELECT a AS node, CAST(COUNT(*) AS DOUBLE) AS d FROM sym GROUP BY a
)
SELECT CAST(COUNT(*) / 2 AS BIGINT) AS n_edges,
    ROUND(corr(da.d, db.d), 6) AS assortativity
FROM sym
JOIN deg da ON sym.a = da.node
JOIN deg db ON sym.b = db.node""",
)
def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over every edge (both orientations, so the
    statistic is orientation-free). Negative r — hubs linking to leaves
    — is the disassortative shape real web graphs have, and it is the
    single-number forecast of how skewed the PageRank/k-core shuffles
    will be: the q_degree_dist readout compressed to one scalar.

    Scale: degrees are one groupBy over the symmetric edge list; the
    two degree joins hash-partition on node id (edge rows stay two
    longs + a double); corr is a single-pass sufficient-statistic
    aggregate. No corpus text ever enters."""
    docs = load_table(spark, sf_dir, "documents")
    sym = sym_edges(canonical_und(link_graph(docs), checkpoint=True))
    deg = sym.groupBy("a").agg(
        F.count("*").cast("double").alias("d")
    ).withColumnRenamed("a", "node")
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    joined = sym.join(da, "a").join(db, "b")
    return joined.agg(
        (F.count("*") / 2).cast("bigint").alias("n_edges"),
        F.round(F.corr("da", "db"), 6).alias("assortativity"),
    )


TEXTRANK_ROUNDS = 12


def _textrank_oracle_sql(rounds: int = TEXTRANK_ROUNDS, d: float = DAMPING) -> str:
    """Unrolled-PageRank oracle over the word co-occurrence graph — the
    _pagerank_oracle_sql pattern with the md5 link graph swapped for
    adjacent-word edges and word-string node ids."""
    stages = []
    prev = "r0"
    for i in range(1, rounds + 1):
        stages.append(
            f"""c{i} AS MATERIALIZED (
    SELECT w.dst, SUM(w.w * p.rank) AS contrib
    FROM w JOIN {prev} p ON p.word = w.src GROUP BY w.dst
), r{i} AS MATERIALIZED (
    SELECT n.word, n.dangling,
        (1 - {d}) / cnt.n
        + {d} * ((SELECT SUM(CASE WHEN dangling THEN rank ELSE 0 END)
                  FROM {prev}) / cnt.n
                 + COALESCE(c.contrib, 0)) AS rank
    FROM {prev} n CROSS JOIN cnt LEFT JOIN c{i} c ON c.dst = n.word
)"""
        )
        prev = f"r{i}"
    body = ",\n".join(stages)
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
adj AS (
    SELECT DISTINCT t[i] AS wa, t[i + 1] AS wb
    FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
    WHERE t[i] <> t[i + 1]
),
und AS (SELECT DISTINCT LEAST(wa, wb) AS a, GREATEST(wa, wb) AS b FROM adj),
edges AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und),
nodes AS (SELECT DISTINCT UNNEST(t) AS word FROM toks),
cnt AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
w AS MATERIALIZED (
    SELECT e.src, e.dst, 1.0 / d.deg AS w FROM edges e JOIN deg d USING (src)
),
r0 AS MATERIALIZED (
    SELECT word, 1.0 / cnt.n AS rank,
        word NOT IN (SELECT src FROM edges) AS dangling
    FROM nodes CROSS JOIN cnt
),
{body}
SELECT word, ROUND(rank, 9) AS rank FROM {prev}"""


@query("q_textrank_keywords", oracle=_textrank_oracle_sql())
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scoring (Mihalcea & Tarau 2004): PageRank over
    the word co-occurrence graph (undirected edges between ADJACENT
    distinct words, symmetrized) — the unsupervised keyword-importance
    score a curation pipeline reads next to TF-IDF: TF-IDF rewards
    rarity, TextRank rewards centrality in how the corpus actually
    composes words. Reuses the generic pagerank() kernel — the operator
    is input-agnostic, exactly as its docstring promises — and the
    unrolled-CTE oracle trick, so the full {TEXTRANK_ROUNDS}-round float
    trajectory is hash-checked.

    Scale: the co-occurrence edge build is the shingle pipeline's shape
    (explode adjacent pairs -> distinct), vocabulary-bounded output;
    the PageRank loop then runs at VOCABULARY scale (nodes = distinct
    words, edges = distinct adjacent pairs), independent of corpus row
    count — at 100 TB the word graph is millions of nodes, not
    trillions of rows."""
    from ..sources.tables import spread_input

    docs = spread_input(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    pair = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("wa"), b.alias("wb")),
    )
    adj = (
        docs.select(F.explode(pair).alias("p"))
        .select(F.col("p.wa").alias("wa"), F.col("p.wb").alias("wb"))
        .filter(F.col("wa") != F.col("wb"))
        .distinct()
    )
    und = adj.select(
        F.least("wa", "wb").alias("a"), F.greatest("wa", "wb").alias("b")
    ).distinct()
    edges = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    nodes = docs.select(F.explode(toks).alias("doc_id")).distinct()
    ranks = pagerank(
        nodes, edges, rounds=TEXTRANK_ROUNDS, tag="q_textrank", tol=0.0
    )
    return ranks.select(
        F.col("doc_id").alias("word"), F.round("rank", 9).alias("rank")
    )


@query(
    "q_reciprocity",
    oracle=f"""
WITH {LINK_GRAPH_SQL},
recip AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_recip
    FROM edges e JOIN edges r ON e.src = r.dst AND e.dst = r.src
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
    recip.n_recip,
    ROUND(recip.n_recip * 1.0
        / (SELECT COUNT(*) FROM edges), 6) AS reciprocity
FROM recip""",
)
def q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-graph reciprocity: the fraction of directed edges whose
    reverse edge also exists — the one-scalar readout separating
    mutual-link structure (citation/follower graphs differ hugely here)
    that calibrates whether the undirected canonicalization the rest of
    the graph family applies (canonical_und) discards meaningful
    direction.

    One self-join of the (src, dst) relation on the reversed key —
    two-long rows, hash-partitioned once; counts aggregate map-side."""
    docs = load_table(spark, sf_dir, "documents")
    edges = link_graph(docs).localCheckpoint()
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    total = edges.agg(F.count("*").cast("bigint").alias("n_edges"))
    recip = (
        edges.join(rev, ["src", "dst"], "left_semi")
        .agg(F.count("*").cast("bigint").alias("n_recip"))
    )
    return total.crossJoin(F.broadcast(recip)).select(
        "n_edges",
        "n_recip",
        F.round(F.col("n_recip") * 1.0 / F.col("n_edges"), 6).alias(
            "reciprocity"
        ),
    )


# --- sampled-source closeness / harmonic centrality --------------------------

CLOSENESS_SOURCES = 4  # deterministic sample: the lowest-id edge endpoints


@query(
    "q_closeness_sampled",
    oracle=f"""
WITH RECURSIVE {LINK_GRAPH_SQL},
sym AS MATERIALIZED (
    SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
),
srcs AS (
    SELECT s FROM (SELECT DISTINCT a AS s FROM sym) ORDER BY s
    LIMIT {CLOSENESS_SOURCES}
),
bfs(s, doc_id, d) AS (
    SELECT s, s AS doc_id, 0 AS d FROM srcs
    UNION
    SELECT bfs.s, sym.b AS doc_id, bfs.d + 1 AS d
    FROM bfs JOIN sym ON sym.a = bfs.doc_id
    WHERE bfs.d < {BFS_CAP}
),
dist AS (
    SELECT s, doc_id, MIN(d) AS d FROM bfs GROUP BY s, doc_id
)
SELECT doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_sources_reached,
    CAST(SUM(d) AS BIGINT) AS total_dist,
    ROUND(SUM(CASE WHEN d > 0 THEN 1.0 / d ELSE 0 END), 6) AS harmonic
FROM dist GROUP BY doc_id ORDER BY doc_id""",
)
def q_closeness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-source closeness/harmonic centrality: hop distances from a
    DETERMINISTIC source sample (the 4 lowest-id edge
    endpoints) to every reachable node, rolled up per node as total
    distance and harmonic sum (1/d handles unreachable pairs gracefully;
    with the sample as the full node set this IS exact harmonic
    centrality). The Eppstein–Wang estimator shape: closeness from k
    sampled sources converges at O(1/sqrt(k)), and the per-source cost is
    one BFS — the only centrality family affordable at 100 TB (exact
    betweenness/closeness are all-pairs).

    Spark side is MULTI-source frontier BFS: ONE loop runs all sources
    simultaneously over (source, node) pair states — the frontier join is
    edge-keyed exactly like q_shortest_paths, the visited anti-join is on
    the pair, so total work is O(k * edges) with k folded into the SAME
    round count (max eccentricity), not k sequential BFS runs. Oracled by
    carrying the source through the recursive CTE's UNION dedup."""
    docs = load_table(spark, sf_dir, "documents")
    telemetry: dict = {"rounds": 0, "frontier_per_round": []}
    PR_TELEMETRY["bfs_q_closeness_sampled"] = telemetry
    e = link_graph(docs)
    und = canonical_und(e)
    with loop_checkpoints() as lcv, loop_checkpoints() as lcf:
        sym = lcv.own(sym_edges(und).localCheckpoint())
        srcs = (
            sym.select(F.col("a").alias("s"))
            .distinct()
            .orderBy("s")
            .limit(CLOSENESS_SOURCES)
        )
        visited = lcv.swap(
            srcs.select(
                "s", F.col("s").alias("doc_id"), F.lit(0).alias("dist")
            ).localCheckpoint()
        )
        frontier = visited
        d = 0
        while True:
            d += 1
            nxt = (
                sym.join(
                    frontier.select("s", F.col("doc_id").alias("a")), "a"
                )
                .select("s", F.col("b").alias("doc_id"))
                .distinct()
                .join(visited, ["s", "doc_id"], "left_anti")
                .select("s", "doc_id", F.lit(d).alias("dist"))
                .localCheckpoint(eager=False)
            )
            n = nxt.count()
            telemetry["rounds"] += 1
            telemetry["frontier_per_round"].append(n)
            if n == 0:
                lcf.own(nxt)
                break
            grown = visited.unionByName(nxt).localCheckpoint(eager=False)
            grown.count()  # materialize BEFORE freeing the superseded frame
            visited = lcv.swap(grown)
            frontier = lcf.swap(nxt)
        out = (
            visited.groupBy("doc_id")
            .agg(
                F.count("*").cast("bigint").alias("n_sources_reached"),
                F.sum("dist").cast("bigint").alias("total_dist"),
                F.round(
                    F.sum(
                        F.when(F.col("dist") > 0, 1.0 / F.col("dist")).otherwise(
                            0.0
                        )
                    ),
                    6,
                ).alias("harmonic"),
            )
            .orderBy("doc_id")
        )
        # eager checkpoint: materialized HERE, so the visited chain and
        # sym can be freed on exit without touching the returned frame
        result = out.localCheckpoint()
        lcv.release_live()
        return result


EIG_ROUNDS = 10


def _eigen_oracle_sql(rounds: int = EIG_ROUNDS) -> str:
    stages = []
    prev = "ev0"
    for i in range(1, rounds + 1):
        stages.append(
            f"""ew{i} AS MATERIALIZED (
    SELECT s.a AS doc_id, SUM(v.v) AS w
    FROM sym s JOIN {prev} v ON v.doc_id = s.b GROUP BY s.a
), en{i} AS (SELECT SQRT(SUM(w * w)) AS nr FROM ew{i}),
ev{i} AS MATERIALIZED (
    SELECT d.doc_id, COALESCE(e.w, 0) / n.nr AS v
    FROM documents d
    LEFT JOIN ew{i} e ON e.doc_id = d.doc_id
    CROSS JOIN en{i} n
)"""
        )
        prev = f"ev{i}"
    return f"""
WITH {LINK_GRAPH_SQL},
sym AS MATERIALIZED (
    SELECT a, b FROM und UNION ALL SELECT b, a FROM und
),
ev0 AS MATERIALIZED (SELECT doc_id, 1.0 AS v FROM documents),
{",".join(stages)}
SELECT doc_id, ROUND(v, 9) AS centrality FROM {prev}"""


@query("q_eigen_centrality", oracle=_eigen_oracle_sql())
def q_eigen_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eigenvector centrality of the undirected link graph: {EIG_ROUNDS}
    L2-normalized power-iteration rounds from the all-ones vector —
    the undamped companion of q_pagerank (importance flows through
    degree-weighted neighbors with no teleport), and the graph twin of
    q_pca_power's matrix power iteration. Oracled by the unrolled
    MATERIALIZED-CTE chain over the shared md5 edge set; the only
    driver traffic is one norm scalar per round (the q_hits
    discipline), and isolated nodes stay exactly 0 in both engines.

    Scale: per round ONE neighbor-sum aggregation over (long, double)
    rows + a scalar readout; lazy localCheckpoint with eager-free keeps
    the lineage flat."""
    docs = load_table(spark, sf_dir, "documents")
    und = canonical_und(link_graph(docs), checkpoint=True)
    with loop_checkpoints() as lc:
        sym = lc.own(sym_edges(und).localCheckpoint())
        nodes = lc.own(docs.select("doc_id").localCheckpoint())
        v = lc.swap(
            nodes.select("doc_id", F.lit(1.0).alias("v")).localCheckpoint()
        )
        for _ in range(EIG_ROUNDS):
            w = (
                sym.join(v.select(F.col("doc_id").alias("b"), "v"), "b")
                .groupBy(F.col("a").alias("doc_id"))
                .agg(F.sum("v").alias("w"))
            )
            nr = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w")))).first()[0]
            v = (
                nodes.join(w, "doc_id", "left")
                .select(
                    "doc_id",
                    (F.coalesce("w", F.lit(0.0)) / F.lit(nr)).alias("v"),
                )
                .localCheckpoint(eager=False)
            )
            lc.swap(v)
        return v.select("doc_id", F.round("v", 9).alias("centrality"))


BTW_SOURCES = 4  # deterministic sample: the lowest-id edge endpoints
# Unrolled-oracle depth cap. The hash link graph's eccentricity from the
# source sample is 6 (sf0.001/sf0.01) to 7 (sf0.1); a pytest asserts the
# measured BFS depth stays <= BTW_DCAP - 2 at the oracle SF so a fixture
# change fails loudly instead of desyncing the hash gate (the q_kcore
# ORACLE_ROUNDS discipline).
BTW_DCAP = 10


def _betweenness_oracle_sql() -> str:
    """Sampled Brandes unrolled: level-synchronized BFS with path counts
    (lvl/vis CTE pair per depth — a recursive CTE cannot carry sigma:
    UNION dedup kills multiplicity and UNION ALL enumerates walks
    exponentially), then the dependency accumulation unrolled from the
    deepest level back. Every CTE MATERIALIZED (the q_pagerank
    precedent)."""
    parts = [
        f"""{LINK_GRAPH_SQL},
sym AS MATERIALIZED (
    SELECT a, b FROM und UNION ALL SELECT b AS a, a AS b FROM und
),
srcs AS MATERIALIZED (
    SELECT s FROM (SELECT DISTINCT a AS s FROM sym) ORDER BY s
    LIMIT {BTW_SOURCES}
),
lvl0 AS MATERIALIZED (
    SELECT s, s AS v, CAST(1 AS DOUBLE) AS sigma FROM srcs
),
vis0 AS MATERIALIZED (SELECT s, v, 0 AS d, sigma FROM lvl0)"""
    ]
    for d in range(1, BTW_DCAP + 1):
        parts.append(
            f"""lvl{d} AS MATERIALIZED (
    SELECT p.s, sym.b AS v, SUM(p.sigma) AS sigma
    FROM lvl{d - 1} p JOIN sym ON sym.a = p.v
    LEFT JOIN vis{d - 1} vv ON vv.s = p.s AND vv.v = sym.b
    WHERE vv.v IS NULL
    GROUP BY p.s, sym.b
)"""
        )
        parts.append(
            f"""vis{d} AS MATERIALIZED (
    SELECT s, v, d, sigma FROM vis{d - 1}
    UNION ALL
    SELECT s, v, {d} AS d, sigma FROM lvl{d}
)"""
        )
    D = BTW_DCAP
    parts.append(
        f"""dag AS MATERIALIZED (
    SELECT v1.s, v1.v AS v, v2.v AS w, v1.d AS dv,
        v1.sigma AS sig_v, v2.sigma AS sig_w
    FROM vis{D} v1
    JOIN sym ON sym.a = v1.v
    JOIN vis{D} v2 ON v2.s = v1.s AND v2.v = sym.b AND v2.d = v1.d + 1
)"""
    )
    parts.append(
        f"""del{D} AS MATERIALIZED (
    SELECT s, v, 0.0 AS delta FROM vis{D} WHERE d = {D}
)"""
    )
    for d in range(D - 1, 0, -1):
        parts.append(
            f"""del{d} AS MATERIALIZED (
    SELECT n.s, n.v,
        COALESCE(SUM(g.sig_v / g.sig_w * (1 + dw.delta)), 0.0) AS delta
    FROM (SELECT s, v FROM vis{D} WHERE d = {d}) n
    LEFT JOIN dag g ON g.s = n.s AND g.v = n.v AND g.dv = {d}
    LEFT JOIN del{d + 1} dw ON dw.s = g.s AND dw.v = g.w
    GROUP BY n.s, n.v
)"""
        )
    all_dels = " UNION ALL ".join(
        f"SELECT * FROM del{d}" for d in range(1, D + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT v AS doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_sources_reached,
    ROUND(SUM(delta), 6) AS dependency
FROM ({all_dels})
GROUP BY v ORDER BY doc_id"""
    )


@query("q_betweenness_sampled", oracle=_betweenness_oracle_sql())
def q_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-source betweenness (Brandes 2001, the {BTW_SOURCES}
    lowest-id sources — the same deterministic Eppstein-Wang-style
    sample as q_closeness_sampled): forward level-synchronized
    multi-source BFS carrying shortest-path COUNTS (sigma), then the
    backward dependency accumulation delta(v) = sum over DAG successors
    w of sigma_v/sigma_w * (1 + delta(w)), summed over sources. The
    reported `dependency` is the raw sampled dependency sum — the
    canonical estimator rescales by n/k, a corpus-independent constant
    that would only obscure the hash.

    Scale: the only affordable betweenness at 100 TB — exact Brandes is
    all-sources. Forward pass: one edge-keyed join + one (s, v) grouped
    sum per level (identical shape to q_closeness_sampled, sigma rides
    along). DAG: one self-join of the bounded (sources x nodes) dist
    table against the edge list. Backward: one join per LEVEL (max
    eccentricity rounds, not per node), all keyed on (s, node) pairs —
    no all-pairs object ever exists."""
    docs = load_table(spark, sf_dir, "documents")
    telemetry: dict = {"rounds": 0, "frontier_per_round": []}
    PR_TELEMETRY["btw_q_betweenness_sampled"] = telemetry
    e = link_graph(docs)
    und = canonical_und(e)
    with loop_checkpoints() as lcv, loop_checkpoints() as lcf:
        sym = lcv.own(sym_edges(und).localCheckpoint())
        srcs = (
            sym.select(F.col("a").alias("s"))
            .distinct()
            .orderBy("s")
            .limit(BTW_SOURCES)
        )
        visited = lcv.swap(
            srcs.select(
                "s",
                F.col("s").alias("v"),
                F.lit(0).alias("d"),
                F.lit(1.0).alias("sigma"),
            ).localCheckpoint()
        )
        frontier = visited.select("s", "v", "sigma")
        depth = 0
        while True:
            depth += 1
            nxt = (
                sym.join(frontier.withColumnRenamed("v", "a"), "a")
                .groupBy("s", F.col("b").alias("v"))
                .agg(F.sum("sigma").alias("sigma"))
                .join(visited.select("s", "v"), ["s", "v"], "left_anti")
                .select("s", "v", F.lit(depth).alias("d"), "sigma")
                .localCheckpoint(eager=False)
            )
            n = nxt.count()
            telemetry["rounds"] += 1
            telemetry["frontier_per_round"].append(n)
            if n == 0:
                lcf.own(nxt)
                break
            grown = visited.unionByName(nxt).localCheckpoint(eager=False)
            grown.count()  # materialize BEFORE freeing the superseded frame
            visited = lcv.swap(grown)
            frontier = lcf.swap(nxt).select("s", "v", "sigma")
        return _betweenness_backward(visited, sym, depth, lcv)


def _betweenness_backward(visited, sym, depth, lcv):
    """Backward dependency accumulation (the second half of
    q_betweenness_sampled, split out so the forward loop's checkpoint
    tracker scopes both passes)."""
    max_d = depth - 1  # bounded scalar: the last non-empty level
    v1 = visited.select(
        "s",
        F.col("v").alias("v"),
        F.col("d").alias("dv"),
        F.col("sigma").alias("sig_v"),
    )
    v2 = visited.select(
        F.col("s").alias("s2"),
        F.col("v").alias("w"),
        F.col("d").alias("dw"),
        F.col("sigma").alias("sig_w"),
    )
    dag = lcv.own(
        v1.join(sym.withColumnRenamed("a", "v"), "v")
        .join(
            v2,
            (F.col("s2") == F.col("s"))
            & (F.col("w") == F.col("b"))
            & (F.col("dw") == F.col("dv") + 1),
        )
        .select("s", "v", "w", "dv", "sig_v", "sig_w")
        .localCheckpoint()
    )
    delta_next = visited.filter(F.col("d") == max_d).select(
        "s", "v", F.lit(0.0).alias("delta")
    )
    deltas = [delta_next]
    for d in range(max_d - 1, 0, -1):
        contrib = (
            dag.filter(F.col("dv") == d)
            .join(
                delta_next.select(
                    "s", F.col("v").alias("w"), F.col("delta")
                ),
                ["s", "w"],
            )
            .groupBy("s", "v")
            .agg(
                F.sum(
                    F.col("sig_v")
                    / F.col("sig_w")
                    * (1 + F.col("delta"))
                ).alias("delta")
            )
        )
        delta_next = (
            visited.filter(F.col("d") == d)
            .select("s", "v")
            .join(contrib, ["s", "v"], "left")
            .select(
                "s",
                "v",
                F.coalesce(F.col("delta"), F.lit(0.0)).alias("delta"),
            )
            .localCheckpoint(eager=False)
        )
        lcv.own(delta_next)  # all levels feed the union below; freed on exit
        deltas.append(delta_next)
    from functools import reduce

    all_dels = reduce(lambda a, b: a.unionByName(b), deltas)
    out = (
        all_dels.groupBy(F.col("v").alias("doc_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_sources_reached"),
            F.round(F.sum("delta"), 6).alias("dependency"),
        )
        .orderBy("doc_id")
    )
    # eager checkpoint: materialized here, so every upstream frame (sym,
    # dag, the visited chain, all delta levels) frees on exit
    out = out.localCheckpoint()
    lcv.release_live()
    return out
