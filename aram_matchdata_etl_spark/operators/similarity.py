"""Similarity search over the ``embeddings`` table (north-star,
BASELINE.json): brute-force cosine top-k as the exact baseline, an
LSH-bucketed variant as the scale path, and embedding-cosine near-dup.

Vector math is native `zip_with` + `aggregate` (JVM-side fold, left to
right — deterministic and bit-identical to DuckDB's sequential loop once
both sides compute in double).

Scale design: brute force is a broadcast nested-loop join (queries
replicate, corpus streams — correct physical plan for few-queries x huge
corpus). The LSH variant buckets the corpus by random-hyperplane signature
so each query probes one bucket: candidate set shrinks by ~2^bits, the
standard recall/throughput trade; both variants share the exact re-rank.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table, spread_input

TOPK = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors
# fixture embeddings are near-orthogonal random vectors (max pairwise
# cosine ~0.5-0.6): 0.4 keeps the operator non-vacuous; real embedding
# spaces would use ~0.9+
NEARDUP_COSINE = 0.4


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def embeddings_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with double-precision vectors and precomputed norms.
    Precomputing the norm once per row halves the per-pair flops."""
    # single-row-group fixture → 1 input partition; repartition so the
    # O(n^2) cosine work downstream parallelizes across all cores
    emb = spread_input(load_table(spark, sf_dir, "embeddings"))
    return emb.select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("vec")
    ).withColumn("vnorm", norm(F.col("vec")))


_ORACLE_EMB_CTE = """
emb AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec,
        sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS vnorm
    FROM embeddings
)"""


@query(
    "q_similarity_topk",
    oracle="WITH "
    + _ORACLE_EMB_CTE.lstrip()
    + f"""
SELECT query_id, vec_id, cosine, rnk FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
        ROUND(list_dot_product(q.vec, c.vec) / (q.vnorm * c.vnorm), 6) AS cosine,
        CAST(ROW_NUMBER() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_dot_product(q.vec, c.vec) / (q.vnorm * c.vnorm) DESC, c.vec_id
        ) AS INTEGER) AS rnk
    FROM emb q, emb c
    WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
) t WHERE rnk <= {TOPK}""",
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: exact ANN baseline. Physical plan:
    broadcast the query set, stream the corpus once, per-partition top-k
    heap via the rank window (at true scale: aggregate per-partition
    top-k then merge, which TakeOrderedAndProject-style planning gives)."""
    emb = embeddings_d(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
    )
    pairs = F.broadcast(q).crossJoin(emb).filter(F.col("vec_id") != F.col("query_id"))
    cosine = dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("vnorm"))
    scored = pairs.select("query_id", "vec_id", cosine.alias("raw_cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("raw_cosine"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "vec_id", F.round("raw_cosine", 6).alias("cosine"), "rnk")
    )


@query(
    "q_embedding_neardup",
    oracle="WITH "
    + _ORACLE_EMB_CTE.lstrip()
    + f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    ROUND(list_dot_product(a.vec, b.vec) / (a.vnorm * b.vnorm), 6) AS cosine
FROM emb a, emb b
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.vec, b.vec) / (a.vnorm * b.vnorm) >= {NEARDUP_COSINE}""",
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= NEARDUP_COSINE),
    brute force. Exact answer at test scale; at 100 TB the LSH bucketing
    (q_embedding_neardup_lsh) prunes the pair space first."""
    emb = embeddings_d(spark, sf_dir)
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"), F.col("vnorm").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"), F.col("vnorm").alias("nb")
    )
    cosine = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("raw_cosine", cosine)
        .filter(F.col("raw_cosine") >= NEARDUP_COSINE)
        .select("vec_a", "vec_b", F.round("raw_cosine", 6).alias("cosine"))
    )


# --- LSH-bucketed ANN (scale path; rows-only + pytest recall asserts) -------

LSH_TABLES = 4  # independent hash tables (recall amplification)
LSH_BITS = 4  # bits per table (bucket granularity)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded, driver-side tiny)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec . plane_i). Planes are
    literal arrays — broadcast as part of the plan, no closure pickling."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        bits.append(F.when(dot(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    acc = bits[0]
    for b in bits[1:]:
        acc = acc + b
    return acc


def _sig_cte(dim: int = 64) -> str:
    """DuckDB twin of the multi-table hyperplane signature: the SAME
    seeded numpy planes embedded as DOUBLE[] literals (repr round-trips
    doubles exactly), bit i = sign(list_dot_product(vec, plane)). The
    already-green q_similarity_topk / q_dedup_clusters_semantic oracles
    established that DuckDB's list_dot_product matches the Spark fold at
    the comparator's tolerance; the sign test additionally only cares
    about ulp noise when |dot| ~ 1e-16, which the fixture never
    produces. Yields a `sig(vec_id, vec, vnorm, table_id, bucket)` CTE
    — making the LSH bucket assignment itself hash-oracle-able."""
    selects = []
    for t in range(LSH_TABLES):
        planes = _hyperplanes(dim, LSH_BITS, seed=42 + t)
        bits = " + ".join(
            f"CASE WHEN list_dot_product(vec, [{', '.join(repr(v) for v in p)}]"
            f"::DOUBLE[]) >= 0 THEN {1 << i} ELSE 0 END"
            for i, p in enumerate(planes)
        )
        selects.append(
            f"SELECT vec_id, vec, vnorm, {t} AS table_id, {bits} AS bucket FROM emb"
        )
    return "sig AS (\n" + "\nUNION ALL\n".join(selects) + "\n)"


@query(
    "q_embedding_neardup_lsh",
    oracle="WITH "
    + _ORACLE_EMB_CTE.lstrip()
    + ",\n"
    + _sig_cte()
    + f""",
cand AS (
    SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
    FROM sig x JOIN sig y
      ON x.table_id = y.table_id AND x.bucket = y.bucket
     AND x.vec_id < y.vec_id
)
SELECT c.vec_a, c.vec_b,
    ROUND(list_dot_product(a.vec, b.vec) / (a.vnorm * b.vnorm), 6) AS cosine
FROM cand c
JOIN emb a ON a.vec_id = c.vec_a
JOIN emb b ON b.vec_id = c.vec_b
WHERE list_dot_product(a.vec, b.vec) / (a.vnorm * b.vnorm)
      >= {NEARDUP_COSINE}""",
)
def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for embedding near-dup: multi-table hyperplane-LSH
    candidate generation (pairs sharing a bucket in ANY of 4 tables) +
    exact cosine verification of candidates only — the same
    candidates-then-verify shape as the MinHash dedup pipeline, replacing
    the brute-force O(n^2) cross join of q_embedding_neardup. Precision is
    1.0 by construction (exact verify); recall vs brute force asserted in
    tests. Output schema == q_embedding_neardup. Hash-oracled since r7:
    the seeded hyperplanes embed as exact DOUBLE[] literals in the DuckDB
    twin (_sig_cte), so bucket assignment, candidate set and verified
    cosines all reproduce."""
    emb = embeddings_d(spark, sf_dir)
    dim = 64
    table_sigs = [
        signature_col(F.col("vec"), _hyperplanes(dim, LSH_BITS, seed=42 + t))
        for t in range(LSH_TABLES)
    ]
    sig = emb.select(
        "vec_id",
        "vec",
        "vnorm",
        F.posexplode(F.array(*table_sigs)).alias("table_id", "bucket"),
    )
    x = sig.alias("x")
    y = sig.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.table_id") == F.col("y.table_id"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("x.vec").alias("va"),
            F.col("x.vnorm").alias("na"),
            F.col("y.vec_id").alias("vec_b"),
            F.col("y.vec").alias("vb"),
            F.col("y.vnorm").alias("nb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    cosine = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.withColumn("raw_cosine", cosine)
        .filter(F.col("raw_cosine") >= NEARDUP_COSINE)
        .select("vec_a", "vec_b", F.round("raw_cosine", 6).alias("cosine"))
    )


IVF_CLUSTERS = 16
IVF_PROBES = 3
# multi-assignment factor: each corpus vector is indexed into its 2
# nearest cells (FAISS-style IVF spill). Near-boundary vectors — the ones
# single-assignment IVF loses — appear in both adjacent cells, so a probe
# finds them from either side. Index size grows ~2x; probe cost grows with
# actual cell sizes, not with the assignment factor.
IVF_ASSIGN = 2

KMEANS_K = 8
KMEANS_ROUNDS = 3


def _lloyd_ctes(k: int, rounds: int) -> str:
    """Unrolled Lloyd iteration in long form (the q_pagerank
    MATERIALIZED-CTE trick applied to an iterative ML trainer),
    parameterized over k so q_kmeans_lloyd (k=8) and the IVF index
    trainer (k=16) share one generator: round r's assignment is an
    argmin via ROW_NUMBER over the per-(vec, centroid) summed squared
    distance, its centroid update a (cid, dim) AVG. Ends at a{rounds}
    (final assignment) with c{rounds-1} (final centroids) available."""
    parts = [
        """emb AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
        sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS vnorm
    FROM embeddings
), pts AS MATERIALIZED (
    SELECT vec_id, generate_subscripts(vec, 1) - 1 AS dim, unnest(vec) AS val
    FROM emb
), c0 AS MATERIALIZED (
    SELECT vec_id AS cid, dim, val FROM pts WHERE vec_id < """
        + str(k)
        + "\n)"
    ]
    for r in range(1, rounds + 1):
        parts.append(f""", a{r} AS MATERIALIZED (
    SELECT vec_id, cid FROM (
        SELECT p.vec_id, c.cid,
            ROW_NUMBER() OVER (
                PARTITION BY p.vec_id
                ORDER BY SUM((p.val - c.val) * (p.val - c.val)), c.cid
            ) AS rn
        FROM pts p JOIN c{r - 1} c ON p.dim = c.dim
        GROUP BY p.vec_id, c.cid
    ) WHERE rn = 1
)""")
        if r < rounds:
            parts.append(f""", c{r} AS MATERIALIZED (
    SELECT a.cid, p.dim, AVG(p.val) AS val
    FROM a{r} a JOIN pts p ON a.vec_id = p.vec_id
    GROUP BY a.cid, p.dim
)""")
    return "".join(parts)


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _ivf_oracle() -> str:
    """q_ann_ivf twin: the shared unrolled-Lloyd chain at k=16 trains the
    cell centroids (c{rounds-1}); multi-assignment and probe selection
    are ROW_NUMBER cutoffs over the same per-(vec, centroid) summed
    squared distance with (dist, cid) tie-breaks; candidates are the
    probe x index equi-join on cell; the exact cosine rerank mirrors
    q_ann_lsh's. Output is (int, int, round-6 double, int) — rank floats
    only decide orderings, exactly the q_kmeans_lloyd argument."""
    r = KMEANS_ROUNDS
    return (
        "WITH "
        + _lloyd_ctes(IVF_CLUSTERS, r)
        + f""", cdist AS MATERIALIZED (
    SELECT p.vec_id, c.cid,
        SUM((p.val - c.val) * (p.val - c.val)) AS d
    FROM pts p JOIN c{r - 1} c ON p.dim = c.dim
    GROUP BY p.vec_id, c.cid
), assigned AS MATERIALIZED (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM cdist
    ) WHERE rn <= {IVF_ASSIGN}
), probed AS MATERIALIZED (
    SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM cdist WHERE vec_id < {N_QUERIES}
    ) WHERE rn <= {IVF_PROBES}
), cand AS (
    SELECT DISTINCT p.query_id, a.vec_id
    FROM probed p JOIN assigned a ON a.cid = p.cid
    WHERE a.vec_id <> p.query_id
), scored AS (
    SELECT c.query_id, c.vec_id,
        list_dot_product(qe.vec, ve.vec) / (qe.vnorm * ve.vnorm) AS raw
    FROM cand c
    JOIN emb qe ON qe.vec_id = c.query_id
    JOIN emb ve ON ve.vec_id = c.vec_id
)
SELECT query_id, vec_id, ROUND(raw, 6) AS cosine, rnk FROM (
    SELECT query_id, vec_id, raw,
        CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY raw DESC, vec_id
        ) AS INTEGER) AS rnk
    FROM scored
) t WHERE rnk <= {TOPK}"""
    )


@query("q_ann_ivf", oracle=_ivf_oracle())
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF (inverted-file index): deterministic fixed-round Lloyd
    k-means (the q_kmeans_lloyd trainer at k=16) partitions the corpus
    into cells with 2-way multi-assignment; each query probes its 3
    nearest centroids and re-ranks exactly inside the probed cells —
    ~assign*probes/clusters of the brute-force comparisons. The other
    classic ANN family beside hyperplane LSH (q_ann_lsh); recall vs
    q_similarity_topk asserted in tests (monotone in BOTH probes and
    assignment factor). HASH-ORACLED since r8 (closing a rows-only key):
    swapping pyspark.ml KMeans (kmeans|| init, engine-private) for the
    shared deterministic Lloyd loop makes the whole index reproducible
    as unrolled CTEs (_ivf_oracle).
    Scale: centroids are literals folded into one codegen'd scan (no
    crossJoin+window shuffle — the pre-r8 form shuffled n x k rows just
    to rank cells); at 100 TB the corpus is written partitioned by cell
    so a probe reads only its cells' files (partition pruning)."""
    return ann_ivf(spark, sf_dir, probes=IVF_PROBES, assign=IVF_ASSIGN)


def ann_ivf(
    spark: SparkSession, sf_dir: str, probes: int, assign: int = 1
) -> DataFrame:
    """Parameterized IVF probe (see q_ann_ivf). `probes` = cells examined
    per query, `assign` = cells each corpus vector is indexed into; recall
    is monotone in both (candidate sets nest), and probing every cell is
    exact regardless of `assign`."""
    emb = embeddings_d(spark, sf_dir).select("vec_id", "vec", "vnorm")
    cents = lloyd_centroids(
        emb.select("vec_id", "vec"), IVF_CLUSTERS, KMEANS_ROUNDS
    )

    # in-row cell ranking: sort the (dist, cid) struct array and slice
    # the top-m cids — one codegen'd projection, no shuffle (the pre-r8
    # crossJoin + row_number ranked n x k rows through an exchange).
    # Both consumers slice the SAME ranked prefix so the k x d literal
    # expression compiles once (distinct per-consumer expressions would
    # each pay their own whole-stage-codegen JIT).
    nmax = max(assign, probes)
    ranked = F.transform(
        F.slice(
            F.sort_array(F.array(*_centroid_dist_structs(cents))), 1, nmax
        ),
        lambda s: s["cid"],
    )
    cells = emb.select("vec_id", "vec", "vnorm", ranked.alias("cells"))
    assigned = cells.select(
        "vec_id",
        "vec",
        "vnorm",
        F.explode(F.slice("cells", 1, assign)).alias("cell"),
    )
    probed = (
        cells.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("vnorm").alias("qnorm"),
            F.explode(F.slice("cells", 1, probes)).alias("cell"),
        )
    )
    cosine = dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("vnorm"))
    # score in the join projection, THEN dedup: a vector assigned to 2
    # probed cells must rank once, not twice (duplicates would occupy two
    # top-k slots), and the duplicate rows are bit-identical (same
    # deterministic expression on the same operands) so distinct() over
    # the 3 scalar columns collapses them — the pre-r8 dropDuplicates
    # BEFORE scoring dragged the full 64-double vectors through a
    # first()-aggregate exchange just to deduplicate ids (plan audit)
    scored = (
        F.broadcast(probed)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine.alias("raw_cosine"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("raw_cosine"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "vec_id", F.round("raw_cosine", 6).alias("cosine"), "rnk")
    )


@query(
    "q_ann_lsh",
    oracle="WITH "
    + _ORACLE_EMB_CTE.lstrip()
    + ",\n"
    + _sig_cte()
    + f""",
cand AS (
    SELECT DISTINCT q.vec_id AS query_id, s.vec_id
    FROM sig q JOIN sig s
      ON s.table_id = q.table_id AND s.bucket = q.bucket
     AND s.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERIES}
),
scored AS (
    SELECT c.query_id, c.vec_id,
        list_dot_product(qe.vec, ve.vec) / (qe.vnorm * ve.vnorm) AS raw
    FROM cand c
    JOIN emb qe ON qe.vec_id = c.query_id
    JOIN emb ve ON ve.vec_id = c.vec_id
)
SELECT query_id, vec_id, ROUND(raw, 6) AS cosine, rnk FROM (
    SELECT query_id, vec_id, raw,
        CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY raw DESC, vec_id
        ) AS INTEGER) AS rnk
    FROM scored
) t WHERE rnk <= {TOPK}""",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via multi-table random-hyperplane LSH: 4 independent 4-bit
    tables; a (query, candidate) pair is probed if they share a bucket in
    ANY table (posexplode over per-table buckets + equi-join), then exact
    cosine re-ranks the union. Multi-table is the classic recall
    amplification: per-table collision prob p^bits, overall
    1-(1-p^bits)^tables, at a fraction of brute-force comparisons.
    Recall vs q_similarity_topk asserted in tests; hash-oracled since r7
    via the exact plane-literal signature twin (_sig_cte)."""
    emb = embeddings_d(spark, sf_dir)
    dim = 64
    table_sigs = [
        signature_col(F.col("vec"), _hyperplanes(dim, LSH_BITS, seed=42 + t))
        for t in range(LSH_TABLES)
    ]
    sig = emb.select(
        "vec_id",
        "vec",
        "vnorm",
        F.posexplode(F.array(*table_sigs)).alias("table_id", "bucket"),
    )
    q = sig.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
        "table_id",
        "bucket",
    )
    cand = (
        F.broadcast(q)
        .join(sig, ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qvec", "qnorm", "vec_id", "vec", "vnorm")
        .dropDuplicates(["query_id", "vec_id"])
    )
    cosine = dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("vnorm"))
    scored = cand.select("query_id", "vec_id", cosine.alias("raw_cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("raw_cosine"), "vec_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "vec_id", F.round("raw_cosine", 6).alias("cosine"), "rnk")
    )


@query(
    "q_dedup_clusters_semantic",
    oracle="WITH RECURSIVE "
    + _ORACLE_EMB_CTE.lstrip()
    + f""",
pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM emb a, emb b
    WHERE a.vec_id < b.vec_id
      AND list_dot_product(a.vec, b.vec) / (a.vnorm * b.vnorm)
          >= {NEARDUP_COSINE}
),
edges AS (
    SELECT vec_a AS u, vec_b AS v FROM pairs
    UNION ALL
    SELECT vec_b, vec_a FROM pairs
),
reach(u, label) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u
)
SELECT u AS doc_id, MIN(label) AS cluster_id,
    (u = MIN(label)) AS is_canonical
FROM reach GROUP BY u""",
)
def q_dedup_clusters_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup end-to-end: embedding-cosine near-dup pairs ->
    connected components -> (cluster_id, canonical) per vector — the
    'semdedup' pipeline (near-duplicate meaning, not near-duplicate
    bytes; catches translations/paraphrases MinHash cannot). Reuses the
    identical min-label-propagation loop as the lexical form
    (operators/dedup.py:connected_components) — pair relations are
    pluggable by design. Pair input here is the exact cosine join (full
    DuckDB oracle incl. the recursive-CTE closure); the 100 TB path
    feeds the same loop from the hyperplane-LSH bucketed pairs
    (q_embedding_neardup_lsh), exactly as the lexical clusters swap
    exact Jaccard for MinHash-LSH."""
    from .dedup import connected_components

    emb = embeddings_d(spark, sf_dir)
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"),
        F.col("vnorm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"),
        F.col("vnorm").alias("nb"),
    )
    cosine = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(cosine >= NEARDUP_COSINE)
        .select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    )
    universe = emb.select(F.col("vec_id").alias("doc_id"))
    return connected_components(universe, pairs, tag="semantic")


@query(
    "q_embedding_centroids",
    oracle="WITH "
    + _ORACLE_EMB_CTE.lstrip()
    + """
SELECT label, CAST(dim AS INTEGER) AS dim,
    ROUND(AVG(val), 6) AS centroid_val,
    CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM (
    SELECT label,
        generate_subscripts(vec, 1) - 1 AS dim,
        unnest(vec) AS val
    FROM emb
)
GROUP BY label, dim""",
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids in long form (label, dim, mean) — the k-means /
    IVF-training primitive (operators/similarity.py:ivf builds its cells
    from exactly this aggregation) and the class-prototype diagnostic for
    embedding quality. posexplode + one (label, dim) hash aggregation
    with map-side partials: shuffle volume is n_labels x dim scalars, not
    vectors; at 100 TB this is THE way to average vectors (never
    collect(), never array-sum in the driver). Long form deliberately:
    re-assembling the array is one collect_list keyed by label if a
    consumer needs it, and long form is what both engines can hash-compare
    exactly."""
    emb = embeddings_d(spark, sf_dir)
    return (
        emb.select("label", F.posexplode("vec").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg(
            F.round(F.avg("val"), 6).alias("centroid_val"),
            F.count("*").cast("bigint").alias("n_vectors"),
        )
    )


# --- int8 embedding quantization (storage/bandwidth path for ANN) -----------


@query(
    "q_embedding_quantize",
    oracle="""
WITH base AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
        list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS amax
    FROM embeddings
),
scaled AS (
    SELECT vec_id, vec,
        CASE WHEN amax = 0 THEN 1.0 ELSE amax / 127.0 END AS scale
    FROM base
)
SELECT vec_id,
    CAST(i - 1 AS INTEGER) AS dim,
    CAST(floor(vec[i] / scale + 0.5) AS INTEGER) AS qval,
    ROUND(scale, 9) AS scale
FROM scaled, UNNEST(generate_series(1, len(vec))) AS g(i)""",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/bandwidth
    path every large ANN deployment runs before indexing: scale =
    max|x|/127, q = round(x/scale), 4x smaller vectors with ~equal
    recall after exact re-rank in float. Output is exploded to
    (vec_id, dim, qval) scalar rows.

    Determinism across engines: floats promote to double EXACTLY, the
    division is one IEEE double op, and rounding is the explicit
    floor(x+0.5) (round-half-toward-+inf) in BOTH engines — no reliance
    on either engine's round() tie-breaking. Zero vectors quantize to
    all-zero via the scale=1 guard instead of dividing by zero.

    Scale shape: embarrassingly parallel per row, all codegen; the
    explode is for the oracle's scalar hash — the production form keeps
    the array column (same expressions minus posexplode)."""
    emb = spread_input(load_table(spark, sf_dir, "embeddings"))
    return (
        emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        .withColumn("amax", F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))))
        .withColumn(
            "scale",
            F.when(F.col("amax") == 0, F.lit(1.0)).otherwise(
                F.col("amax") / F.lit(127.0)
            ),
        )
        .select(
            "vec_id",
            F.posexplode(
                F.transform(
                    F.col("v"),
                    lambda x: F.floor(x / F.col("scale") + 0.5).cast("int"),
                )
            ).alias("dim", "qval"),
            F.round(F.col("scale"), 9).alias("scale"),
        )
    )


# --- product quantization (the memory-bound ANN scale path) -----------------

PQ_M = 8  # subspaces
PQ_K = 16  # codes per subspace
PQ_SHORTLIST = 50  # ADC candidates per query before exact re-rank


def _pq_ctes(k: int = PQ_K, rounds: int = KMEANS_ROUNDS, sub: int = 8) -> str:
    """The m independent per-subspace Lloyd trainings expressed as ONE
    grouped chain (the 'product' in product quantization is literally a
    GROUP BY here): dims stay absolute, sm = dim // sub joins every
    aggregation's keys, so each round is one argmin ROW_NUMBER per
    (vec_id, sm) and one (cid, sm, dim) AVG — the _lloyd_ctes shape with
    a subspace column threaded through. Ends at a{rounds}(vec_id, sm,
    cid, d): the final per-subspace code assignment with its squared
    reconstruction error."""
    parts = [
        f"""emb AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), pts AS MATERIALIZED (
    SELECT vec_id, dim, dim // {sub} AS sm, val FROM (
        SELECT vec_id, generate_subscripts(vec, 1) - 1 AS dim,
            unnest(vec) AS val
        FROM emb
    )
), c0 AS MATERIALIZED (
    SELECT vec_id AS cid, sm, dim, val FROM pts WHERE vec_id < {k}
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f""", a{r} AS MATERIALIZED (
    SELECT vec_id, sm, cid, d FROM (
        SELECT p.vec_id, c.sm, c.cid,
            SUM((p.val - c.val) * (p.val - c.val)) AS d,
            ROW_NUMBER() OVER (
                PARTITION BY p.vec_id, c.sm
                ORDER BY SUM((p.val - c.val) * (p.val - c.val)), c.cid
            ) AS rn
        FROM pts p JOIN c{r - 1} c ON p.dim = c.dim
        GROUP BY p.vec_id, c.sm, c.cid
    ) WHERE rn = 1
)""")
        if r < rounds:
            parts.append(f""", c{r} AS MATERIALIZED (
    SELECT a.cid, a.sm, p.dim, AVG(p.val) AS val
    FROM a{r} a JOIN pts p ON a.vec_id = p.vec_id AND a.sm = p.sm
    GROUP BY a.cid, a.sm, p.dim
)""")
    return "".join(parts)


def _pq_lloyd_codebooks(
    base: DataFrame, m: int, sub: int, k: int, rounds: int
) -> dict[int, list[tuple[int, list[float]]]]:
    """All m subspace Lloyd trainings driven as ONE grouped loop — the
    Spark mirror of the oracle's _pq_ctes chain (and mathematically the
    m independent lloyd_centroids() runs, which is how the first r8 cut
    implemented it: that version paid m * rounds sequential driver
    actions ~ 24 jobs and ~20 s per PQ query; this one pays
    1 + (rounds-1) = 3). Per round: assignment is an in-row argmin
    selected by subspace (a CASE over m literal centroid sets — still
    zero shuffle), the update ONE (sm, cid, dim) AVG shuffle for all
    subspaces. Returns {sm: [(cid, centroid)]}; empty clusters drop per
    subspace, exactly as in the per-subspace loop."""
    spark = base.sparkSession
    seed_rows = base.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    cents: dict[int, list[tuple[int, list[float]]]] = {
        sm: [
            (
                int(r.vec_id),
                [float(x) for x in r.vec][sm * sub : (sm + 1) * sub],
            )
            for r in seed_rows
        ]
        for sm in range(m)
    }
    # Centroids enter as broadcast DATA, not plan literals: a
    # literal-folded argmin (the first r8 cut's 8-subspace CASE over 128
    # zip_with folds) recompiled ~10 s of codegen per round because each
    # round's literals are a new plan.
    #
    # r13 (the lloyd_centroids restructure applied per subspace, guide
    # §2.3/§2.4): the per-(vec, sm, cid) distance is computed IN-ROW —
    # the m*k codebook rows broadcast as (sm, cid, cvec) sub-arrays, a
    # broadcast nested-loop join fans each vector to its m*k candidates,
    # and a sequential zip_with fold over slice(vec, sm*sub+1, sub)
    # yields the squared distance. The old long-form dataflow ground
    # n*d*k join rows through a two-phase aggregation plus a re-key
    # exchange (~5 s of small-stage fixed cost per round at sf0.1 for
    # arithmetic a single core does in milliseconds); this form runs one
    # n*m-row argmin exchange (map-side min(struct) collapses the k
    # candidates per (vec, sm) before the shuffle). Same addends in the
    # same dim order (bit-identical FP), same (d, cid) tie-break. The
    # per-(sm, cid, dim) mean keeps the oracle's long-form AVG dataflow,
    # with pts derived lazily from the checkpointed vector frame.
    vecs = base.localCheckpoint()
    pts = vecs.select(
        "vec_id", F.posexplode("vec").alias("dim", "val")
    ).withColumn("sm", (F.col("dim") / sub).cast("int"))
    try:
        for _ in range(rounds - 1):
            carr = spark.createDataFrame(
                [
                    (sm, cid, vec)
                    for sm, lst in cents.items()
                    for cid, vec in lst
                ],
                "sm int, cid int, cvec array<double>",
            )
            sq = F.aggregate(
                F.zip_with(
                    F.slice("vec", F.col("sm") * sub + 1, sub),
                    "cvec",
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            assign = (
                vecs.join(F.broadcast(carr), how="cross")
                .select(
                    "vec_id",
                    "sm",
                    F.struct(sq.alias("d"), F.col("cid")).alias("dc"),
                )
                .groupBy("vec_id", "sm")
                .agg(F.min("dc").alias("dc"))
                .select("vec_id", "sm", F.col("dc")["cid"].alias("cid"))
            )
            rows = (
                assign.join(pts, ["vec_id", "sm"])
                .groupBy("sm", "cid", "dim")
                .agg(F.avg("val").alias("val"))
                .collect()
            )
            acc: dict[tuple[int, int], dict[int, float]] = {}
            for r in rows:
                acc.setdefault((int(r.sm), int(r.cid)), {})[
                    int(r.dim) - int(r.sm) * sub
                ] = float(r.val)
            cents = {
                sm: sorted(
                    (cid, [dims[i] for i in range(len(dims))])
                    for (s2, cid), dims in acc.items()
                    if s2 == sm
                )
                for sm in range(m)
            }
    finally:
        # finally: a failed mid-training collect must not leak the
        # checkpointed blocks for the session lifetime (r8 advisory)
        vecs.unpersist()
    return cents


def pq_train_encode(
    emb: DataFrame, dim: int, m: int = PQ_M, k: int = PQ_K
) -> tuple[DataFrame, DataFrame]:
    """Product quantization (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): split each D-dim vector into
    ``m`` contiguous subvectors, k-means each subspace independently
    (Spark ML KMeans — distributed fit, m small fits), and encode every
    vector as m code ids. Storage drops from D floats to m smallints
    (64x4 bytes -> 4 bytes here); search runs on lookup tables (see
    ann_pq_adc).

    Returns (codebooks, codes):
      codebooks — (sm, code, centroid array<double>): m*k rows, broadcast-
      sized BY CONSTRUCTION (independent of corpus size).
      codes — (vec_id, sm, code, sub_err): the encoded corpus in long
      form; sub_err is the squared L2 distance to the chosen centroid, so
      SUM(sub_err) per vec_id IS the total squared reconstruction error.

    Scale shape: training fits m independent fixed-round Lloyd loops over
    subvector projections (narrow per-row slices; since r8 the SAME
    deterministic trainer as q_kmeans_lloyd/q_ann_ivf — seeds are the k
    lowest vec_ids' subvectors — which is what makes the whole PQ family
    hash-oracle-able); encoding is a broadcast join of the corpus's
    m*n subvector rows against the m*k codebook with a min_by argmin —
    one aggregation keyed by (vec_id, sm), no crossJoin blowup beyond the
    fixed m*k factor, bodies never shuffle."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m

    base = emb.select("vec_id", "vec")
    cb_rows = [
        (sm, int(cid), cv)
        for sm, cents in _pq_lloyd_codebooks(
            base, m=m, sub=sub, k=k, rounds=KMEANS_ROUNDS
        ).items()
        for cid, cv in cents
    ]
    codebooks = emb.sparkSession.createDataFrame(
        cb_rows, "sm int, code int, centroid array<double>"
    )

    subvecs = base.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(sm).alias("sm"),
                        F.slice("vec", sm * sub + 1, sub).alias("subvec"),
                    )
                    for sm in range(m)
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.sm", "s.subvec")
    scored = subvecs.join(F.broadcast(codebooks), "sm").withColumn(
        "sqd", _sq_dist(F.col("subvec"), F.col("centroid"))
    )
    codes = scored.groupBy("vec_id", "sm").agg(
        F.min_by("code", F.struct("sqd", "code")).alias("code"),
        F.min("sqd").alias("sub_err"),
    )
    return codebooks, codes


@query(
    "q_embedding_pq",
    oracle="WITH "
    + _pq_ctes()
    + f"""
SELECT vec_id,
    string_agg(CAST(cid AS VARCHAR), '|' ORDER BY sm) AS pq_code,
    ROUND(SUM(d), 6) AS recon_err
FROM a{KMEANS_ROUNDS} GROUP BY vec_id""",
)
def q_embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encoded corpus: per vector, the m-code word (joined as a string
    so the driver canonicalizer can hash it) and the total squared
    reconstruction error. HASH-ORACLED since r8 (was rows-only 'k-means
    initialization is engine-specific'): the subspace trainers are now
    the shared deterministic fixed-round Lloyd loop, and the oracle runs
    all m of them as ONE grouped chain (_pq_ctes — sm = dim // sub joins
    every key, so 'product' quantization is literally a GROUP BY).
    Codes are integers; recon_err is round-6 over sums of squared
    distances to averaged centroids — the q_kmeans_silhouette rounding
    class. Invariant tests (code ranges, recon-err ordering vs the
    1-code codebook, ADC recall) stay in tests/test_northstar.py."""
    emb = embeddings_d(spark, sf_dir)
    _, codes = pq_train_encode(emb, dim=64)
    return (
        codes.groupBy("vec_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("sm", "code"))
                    ),
                    lambda s: s["code"].cast("string"),
                ),
                "|",
            ).alias("pq_code"),
            F.round(F.sum("sub_err"), 6).alias("recon_err"),
        )
        .select("vec_id", "pq_code", "recon_err")
    )


@query(
    "q_ann_pq",
    oracle="WITH "
    + _pq_ctes()
    + f""", qd AS MATERIALIZED (
    SELECT q.vec_id AS query_id, c.sm, c.cid AS code,
        SUM((q.val - c.val) * (q.val - c.val)) AS d
    FROM pts q JOIN c{KMEANS_ROUNDS - 1} c ON q.dim = c.dim
    WHERE q.vec_id < {N_QUERIES}
    GROUP BY 1, 2, 3
), adc AS (
    SELECT t.query_id, s.vec_id, SUM(t.d) AS adc_dist
    FROM a{KMEANS_ROUNDS} s
    JOIN qd t ON s.sm = t.sm AND s.cid = t.code
    WHERE s.vec_id <> t.query_id
    GROUP BY 1, 2
    HAVING COUNT(*) = {PQ_M}
), shortlist AS (
    SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
            ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY adc_dist, vec_id
            ) AS arnk
        FROM adc
    ) WHERE arnk <= {PQ_SHORTLIST}
), rr AS (
    SELECT s.query_id, s.vec_id, SUM((pq.val - pv.val) * (pq.val - pv.val)) AS l2
    FROM shortlist s
    JOIN pts pq ON pq.vec_id = s.query_id
    JOIN pts pv ON pv.vec_id = s.vec_id AND pv.dim = pq.dim
    GROUP BY 1, 2
)
SELECT query_id, vec_id, ROUND(l2, 6) AS l2_dist, rnk FROM (
    SELECT query_id, vec_id, l2,
        CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY l2, vec_id
        ) AS INTEGER) AS rnk
    FROM rr
) WHERE rnk <= {TOPK}""",
)
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k by PQ asymmetric distance computation (ADC, Jégou et al.
    2011): the query stays in float; its squared distance to each corpus
    vector is approximated as the SUM over subspaces of the query-to-
    centroid distance of that vector's code — a table lookup, never a
    float-vector read of the corpus.

    Production shape (and the shape here): ADC is the SHORTLIST stage —
    the compressed scan keeps the top PQ_SHORTLIST candidates per query,
    and only those (a few dozen vec_ids) join back to the float corpus
    for an exact L2 re-rank. The expensive representation is touched for
    O(queries x shortlist) rows, never the whole corpus.

    Scale shape: the per-query distance TABLE (n_queries x m x k rows) is
    tiny and broadcast; the corpus side joins it on (sm, code) — the
    corpus contributes only its code columns (m smallints/vector), so the
    scan is of the compressed representation, and the only wide stage is
    the (query_id, vec_id) partial-sum aggregation. Both top-k cuts are
    row_number windows. HASH-ORACLED since r8 via the grouped-Lloyd
    chain (_pq_ctes; see q_embedding_pq) — the full ADC + shortlist +
    exact-re-rank pipeline reproduces in DuckDB; recall vs exact L2
    stays asserted in tests/test_northstar.py."""
    emb = embeddings_d(spark, sf_dir)
    codebooks, codes = pq_train_encode(emb, dim=64)
    sub = 64 // PQ_M

    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    qsub = q.select(
        "query_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(sm).alias("sm"),
                        F.slice("qvec", sm * sub + 1, sub).alias("qsub"),
                    )
                    for sm in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("query_id", "s.sm", "s.qsub")
    # per-query lookup table: distance to EVERY codebook centroid
    dist_tab = qsub.join(F.broadcast(codebooks), "sm").select(
        "query_id", "sm", "code", _sq_dist(F.col("qsub"), F.col("centroid")).alias("d")
    )
    adc = (
        codes.join(F.broadcast(dist_tab), ["sm", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adc_dist"), F.count("*").alias("n_sub"))
        # a vector scores only if ALL m of its subspaces were looked up
        # (always true here; guards against a filtered codebook upstream)
        .filter(F.col("n_sub") == PQ_M)
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    shortlist = (
        adc.withColumn("arnk", F.row_number().over(w))
        .filter(F.col("arnk") <= PQ_SHORTLIST)
        .select("query_id", "vec_id")
    )
    # exact re-rank: fetch float vectors for the shortlist only
    cand = (
        F.broadcast(shortlist)
        .join(emb.select("vec_id", "vec"), "vec_id")
        .join(q, "query_id")
        .withColumn("l2_dist", _sq_dist(F.col("qvec"), F.col("vec")))
    )
    wr = Window.partitionBy("query_id").orderBy("l2_dist", "vec_id")
    return (
        cand.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "vec_id", F.round("l2_dist", 6).alias("l2_dist"), "rnk")
    )


# --- graph-based ANN: sharded kNN-graph + greedy beam search ----------------

GRAPH_SHARDS = 4  # independent per-shard graphs (the FAISS-sharding shape)
GRAPH_M = 8  # neighbors per node in the kNN graph
GRAPH_EF = 24  # beam width during search


def _shard_graph_search(
    queries: list[tuple[int, list[float]]],
    m: int,
    ef: int,
    topk: int,
):
    """Returns an applyInPandas function: build this shard's exact kNN
    graph (ONE vectorized gram-matrix per shard — the distributed
    stand-in for NN-descent / HNSW insertion, which are pointer-chasing
    and hostile to data-parallel engines), then answer every query with
    the HNSW-style greedy beam search (best-first over neighbor lists,
    visited set, beam of `ef`), entry at the shard's min vec_id."""
    import numpy as np
    import pandas as pd

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        V = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        n = len(ids)
        norms = np.linalg.norm(V, axis=1)
        # exact kNN graph, vectorized: cosine gram matrix, top-m per row
        G = (V @ V.T) / np.outer(norms, norms)
        np.fill_diagonal(G, -np.inf)
        k = min(m, n - 1)
        nbrs = np.argsort(-G, axis=1, kind="stable")[:, :k]
        out_q, out_v, out_c = [], [], []
        for qid, qvec in queries:
            q = np.asarray(qvec, dtype=np.float64)
            qn = np.linalg.norm(q)
            sims = (V @ q) / (norms * qn)  # memoized scorer
            visited = {0}
            # beam: (sim, node), kept sorted ascending; entry = min vec_id
            beam = [(float(sims[0]), 0)]
            improved = True
            while improved:
                improved = False
                frontier = [node for _, node in beam]
                for node in frontier:
                    for nb in nbrs[node]:
                        nb = int(nb)
                        if nb in visited:
                            continue
                        visited.add(nb)
                        s = float(sims[nb])
                        if len(beam) < ef or s > beam[0][0]:
                            beam.append((s, nb))
                            beam.sort()
                            if len(beam) > ef:
                                beam.pop(0)
                            improved = True
            best = sorted(beam, key=lambda t: (-t[0], ids[t[1]]))[:topk]
            for s, node in best:
                if ids[node] == qid:
                    continue
                out_q.append(qid)
                out_v.append(int(ids[node]))
                out_c.append(s)
        return pd.DataFrame(
            {"query_id": out_q, "vec_id": out_v, "raw_cosine": out_c}
        )

    return fn


@query("q_ann_graph")
def q_ann_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-based ANN (the HNSW family), in the shape that actually
    distributes: shard the corpus by hashed id, build an independent
    proximity graph PER SHARD, search every shard with HNSW's greedy
    beam search, and merge shard-local top-k into global top-k
    (how FAISS/Vespa/Milvus shard graph indexes in practice — a single
    cluster-wide navigable graph is pointer-chasing across executors and
    a poor fit for Spark's execution model, per ROADMAP item 3).

    Per shard the graph is the EXACT kNN graph from one vectorized gram
    matrix (Arrow-batched applyInPandas, numpy matmul — no per-row
    Python in the distance math); search is best-first beam over
    neighbor lists with a visited set (the HNSW layer-0 algorithm).
    Recall vs the exact baseline is asserted in tests, and beam-width
    monotonicity makes the ef knob honest.

    Scale: shard graph build is O((n/s)^2) flops but embarrassingly
    parallel and memory-local; at 100 TB the per-shard build swaps the
    gram matrix for NN-descent without changing the dataflow. Queries
    are workload-sized (driver list by construction, like the PQ
    codebooks); every shard sees every query; the merge is one window
    keyed by query_id over s*topk rows."""
    emb = embeddings_d(spark, sf_dir)
    queries = [
        (int(r.vec_id), [float(x) for x in r.vec])
        for r in emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "vec")
        .collect()
    ]
    sharded = emb.withColumn(
        "shard", F.pmod(F.xxhash64("vec_id"), F.lit(GRAPH_SHARDS))
    )
    local = sharded.groupBy("shard").applyInPandas(
        _shard_graph_search(queries, GRAPH_M, GRAPH_EF, TOPK),
        "query_id long, vec_id long, raw_cosine double",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("raw_cosine"), "vec_id")
    return (
        local.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK)
        .select(
            "query_id", "vec_id", F.round("raw_cosine", 6).alias("cosine"), "rnk"
        )
    )


EMB_OUTLIER_Z = 2.5


@query(
    "q_embedding_outliers",
    oracle="WITH "
    + _ORACLE_EMB_CTE.lstrip()
    + f""",
pts AS (
    SELECT vec_id, label,
        generate_subscripts(vec, 1) - 1 AS dim, unnest(vec) AS val
    FROM emb
), cent AS (
    SELECT label, dim, AVG(val) AS c FROM pts GROUP BY label, dim
), dist AS (
    SELECT p.vec_id, p.label,
        SUM((p.val - c.c) * (p.val - c.c)) AS d2
    FROM pts p JOIN cent c ON p.label = c.label AND p.dim = c.dim
    GROUP BY p.vec_id, p.label
), stats AS (
    SELECT label, AVG(d2) AS mu, STDDEV_SAMP(d2) AS sd FROM dist
    GROUP BY label
)
SELECT d.vec_id, d.label, ROUND(d.d2, 6) AS dist2,
    ROUND((d.d2 - s.mu) / s.sd, 6) AS z,
    (d.d2 - s.mu) / s.sd > {EMB_OUTLIER_Z} AS is_outlier
FROM dist d JOIN stats s ON d.label = s.label""",
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector embedding outlier score: squared distance to the OWN
    label's centroid, z-scored within the label, flagged past
    z > {EMB_OUTLIER_Z} — the mislabeled/corrupted-sample detector run
    before embeddings feed dedup or ANN (a vector far from its class
    prototype is a labeling error or an encoder failure). One-sided by
    design: unusually CLOSE to the centroid is not a defect.

    Scale: composes q_embedding_centroids' long-form aggregation (the
    100 TB-safe way to average vectors); per-vector distances are a
    (label, dim)-keyed join of the exploded points against the tiny
    centroid table (broadcast), re-aggregated per vec_id — scalars
    through every shuffle, never whole vectors."""
    emb = embeddings_d(spark, sf_dir)
    pts = emb.select("vec_id", "label", F.posexplode("vec").alias("dim", "val"))
    cent = pts.groupBy("label", "dim").agg(F.avg("val").alias("c"))
    dist = (
        pts.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("val") - F.col("c")) * (F.col("val") - F.col("c")))
            .alias("d2")
        )
    )
    stats = dist.groupBy("label").agg(
        F.avg("d2").alias("mu"), F.stddev_samp("d2").alias("sd")
    )
    z = (F.col("d2") - F.col("mu")) / F.col("sd")
    return dist.join(F.broadcast(stats), "label").select(
        "vec_id",
        "label",
        F.round("d2", 6).alias("dist2"),
        F.round(z, 6).alias("z"),
        (z > EMB_OUTLIER_Z).alias("is_outlier"),
    )


# --- Lloyd k-means, fixed-round, HASH-ORACLED --------------------------------
# (KMEANS_K / KMEANS_ROUNDS / _lloyd_ctes live beside the IVF constants
# above — the IVF oracle is built at decoration time before this section.)


def _kmeans_oracle() -> str:
    """q_kmeans_lloyd twin: the shared unrolled-Lloyd chain, final
    assignment projected. The final assignment is all-integer, so the
    driver hash is exact; the float distances only ever DECIDE an argmin
    (well-separated at every round on real embeddings), never surface in
    the output."""
    return (
        "WITH "
        + _lloyd_ctes(KMEANS_K, KMEANS_ROUNDS)
        + f"""
SELECT vec_id, CAST(cid AS BIGINT) AS cluster
FROM a{KMEANS_ROUNDS} ORDER BY vec_id"""
    )


@query("q_kmeans_lloyd", oracle=_kmeans_oracle())
def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means over the embedding corpus, k=8, THREE fixed rounds,
    deterministic seeding (the k lowest vec_ids) — the first iterative
    ML TRAINER under the exact driver hash gate (the prior frontier was
    iterative graph analytics: q_pagerank et al.). Fixed round count and
    (distance, cid) tie-breaking make both engines' assignments
    identical; the emitted (vec_id, cluster) frame is all-integer, so
    the value hash is exact, not tolerance-based.

    Scale shape per round: assignment is ONE scan with the kxd centroid
    matrix folded into the plan as literals (512 scalars — broadcast by
    construction; a k*d too big for literals would broadcast-join a
    centroid frame instead), distances via zip_with/aggregate inside
    codegen, argmin via array_min on (dist, cid) structs — no shuffle at
    all. The update is the q_embedding_centroids long-form aggregation:
    n x d SCALARS shuffle (never vectors), k x d rows return to the
    driver (bounded, the same convergence-read class as BPE's argmax).
    Total: 3 scans, 2 scalar-rollup shuffles, zero corpus-wide joins.
    k-means at 100 TB is exactly this loop with a sampled init."""
    return lloyd_assignments(spark, sf_dir)


def _centroid_dist_structs(centroids) -> list:
    """(squared-distance, cid) struct per centroid, distance as the
    dim-ordered zip_with fold against the centroid folded in as array
    literals — the codegen'd no-shuffle assignment kernel shared by
    q_kmeans_lloyd and the IVF index/probe ranking."""
    structs = []
    for cid, cv in centroids:
        lit_vec = F.array(*[F.lit(x) for x in cv])
        dist = F.aggregate(
            F.zip_with(F.col("vec"), lit_vec, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        structs.append(
            F.struct(dist.alias("d"), F.lit(cid).cast("long").alias("cid"))
        )
    return structs


def lloyd_centroids(
    emb: DataFrame, k: int, rounds: int, seed_by_rank: bool = False
) -> list[tuple[int, list[float]]]:
    """Deterministic fixed-round Lloyd trainer, factored so the IVF index
    (k=16) shares q_kmeans_lloyd's exact loop (k=8): seeds are the k
    lowest vec_ids, each of `rounds - 1` updates re-averages per (cid,
    dim) in long form, and the returned list is the final centroid set
    (the oracle's c{rounds-1} CTE). Driver traffic per update is k x d
    scalars — bounded regardless of corpus size.

    ``seed_by_rank`` seeds from the k RANK-lowest vec_ids instead of
    ``vec_id < k`` — identical on the contiguous-id fixtures every
    oracled key runs on (so those keys never pass it), required for
    frames whose ids are a strided sample (hier_cells' coarse trainer,
    where ids are multiples of the sampling stride)."""
    spark = emb.sparkSession
    if seed_by_rank:
        seeds = emb.orderBy("vec_id").limit(k).collect()
    else:
        seeds = emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    cents = [(int(r.vec_id), [float(x) for x in r.vec]) for r in seeds]

    # Update rounds broadcast the centroids as DATA, never as plan
    # literals: folding them in as literals recompiled a k x d zip_with
    # projection per round (~4 s of codegen each at k=16, measured on
    # q_ann_ivf). The FINAL argmin consumed by callers stays the
    # literal-folded in-row form (_centroid_dist_structs) — one compile,
    # zero shuffle, plan-pinned in tests/test_plans.py. A rejected r13
    # attempt pivoted the per-(vec, cid) distance sums into k columns —
    # O(n * d * k^2) conditional-sum branches that collapsed
    # q_semdedup_scaled's 10x tier point (61.5 s vs the 12.7 s band,
    # fresh-session-confirmed); the in-row argmin below is O(n * d * k).
    # An earlier per-dim-sums-from-the-vector-frame attempt that KEPT
    # the groupBy(vec_id) argmin and joined it back measured slower
    # (A/B in OPTIMIZATION_r13.md); the current form removes that join
    # and the argmin exchange together, which is where the win is.
    if not cents:
        return cents
    vecs = emb.select("vec_id", "vec").localCheckpoint()
    dim = len(cents[0][1])
    try:
        for _ in range(rounds - 1):
            # r13, third cut (guide §2.4; mirrors the hier trainer): the
            # k centroids broadcast as ONE row carrying the whole
            # (cid, cvec) list, so the argmin is an in-row
            # array_min(transform(...)) — same zip_with fold per
            # (vec, cid) pair (same addends, same dim order), same
            # (d, cid) lexicographic tie-break as min(struct(d, cid)) —
            # and the groupBy(vec_id) collapse plus the long-form
            # points join both disappear. The per-round update is ONE
            # map-side-combined exchange keyed by cid: per-dim sums +
            # count, divided driver-side — arithmetically the same
            # sum/count the old per-(cid, dim) AVG computed, with only
            # the unpinned partial-aggregation order moved (the
            # unrolled-Lloyd oracles compare the trajectory at ROUND
            # precision with >= 1e-9 argmin margins; re-proven at all
            # three SFs for every oracled consumer). Drop-empty
            # semantics unchanged: cents rebuilds from the update rows
            # only.
            carr = spark.createDataFrame(
                [([(cid, vec) for cid, vec in sorted(cents)],)],
                "cents array<struct<cid: int, cvec: array<double>>>",
            )
            sq = lambda cvec: F.aggregate(  # noqa: E731
                F.zip_with("vec", cvec, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            best = F.array_min(
                F.transform(
                    "cents",
                    lambda c: F.struct(
                        sq(c["cvec"]).alias("d"), c["cid"].alias("cid")
                    ),
                )
            )
            rows = (
                vecs.join(F.broadcast(carr), how="cross")
                .groupBy(best["cid"].alias("cid"))
                .agg(
                    F.count("*").alias("n"),
                    *[
                        F.sum(F.col("vec")[i]).alias(f"s{i}")
                        for i in range(dim)
                    ],
                )
                .collect()
            )
            cents = [
                (
                    int(r.cid),
                    [float(r[f"s{i}"]) / int(r.n) for i in range(dim)],
                )
                for r in sorted(rows, key=lambda r: int(r.cid))
            ]
    finally:
        # a failed mid-training collect must not leak the checkpointed
        # blocks for the session lifetime (r8 advisory)
        vecs.unpersist()
    return cents


def lloyd_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q_kmeans_lloyd kernel, reusable (q_kmeans_silhouette composes
    it): runs the fixed-round Lloyd loop and returns the final
    (vec_id, cluster) assignment frame."""
    emb = embeddings_d(spark, sf_dir).select("vec_id", "vec")
    cents = lloyd_centroids(emb, KMEANS_K, KMEANS_ROUNDS)
    return (
        emb.select(
            "vec_id",
            F.array_min(F.array(*_centroid_dist_structs(cents)))["cid"]
            .cast("bigint")
            .alias("cluster"),
        )
        .orderBy("vec_id")
    )


# --- k-NN label classification (holdout eval) --------------------------------

KNN_K = 10
KNN_HOLDOUT = 100  # vec_id < KNN_HOLDOUT are the test split


@query(
    "q_knn_classify",
    oracle="WITH "
    + _ORACLE_EMB_CTE.lstrip()
    + f""",
nb AS (
    SELECT query_id, label FROM (
        SELECT q.vec_id AS query_id, c.label,
            ROW_NUMBER() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_dot_product(q.vec, c.vec) / (q.vnorm * c.vnorm)
                    DESC, c.vec_id
            ) AS rnk
        FROM emb q, emb c
        WHERE q.vec_id < {KNN_HOLDOUT} AND c.vec_id >= {KNN_HOLDOUT}
    ) t WHERE rnk <= {KNN_K}
), votes AS (
    SELECT query_id, label, CAST(COUNT(*) AS BIGINT) AS n_votes
    FROM nb GROUP BY query_id, label
), pred AS (
    SELECT query_id, label AS predicted_label, n_votes,
        ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY n_votes DESC, label) AS pr
    FROM votes
)
SELECT p.query_id AS vec_id, e.label AS true_label,
    p.predicted_label, p.n_votes,
    (p.predicted_label = e.label) AS correct
FROM pred p JOIN emb e ON p.query_id = e.vec_id
WHERE p.pr = 1 ORDER BY vec_id""",
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label classification with a deterministic holdout: the first
    100 vectors are the test split, everything else the
    reference set; each query takes the plurality label of its 10
    nearest cosine neighbors (ties: larger vote count, then lower label).
    The standard embedding-quality probe — if k-NN accuracy over labels
    is low, no downstream classifier will rescue the encoder.

    Scale shape: identical to q_similarity_topk — broadcast the bounded
    query split, ONE corpus scan, per-query rank window; the vote count
    and argmax then run on q x k rows. The brute-force scan is the exact
    baseline; q_ann_ivf/q_ann_graph are the sub-linear scale paths for
    when the query side is the whole corpus."""
    emb = embeddings_d(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < KNN_HOLDOUT).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("vec").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
    )
    ref = emb.filter(F.col("vec_id") >= KNN_HOLDOUT)
    cosine = dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("vnorm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("raw_cosine"), "vec_id")
    nb = (
        F.broadcast(q)
        .crossJoin(ref)
        .select(
            "query_id",
            "true_label",
            F.col("label"),
            cosine.alias("raw_cosine"),
            "vec_id",
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
    )
    votes = nb.groupBy("query_id", "true_label", "label").agg(
        F.count("*").cast("bigint").alias("n_votes")
    )
    pr = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.col("label")
    )
    return (
        votes.withColumn("pr", F.row_number().over(pr))
        .filter(F.col("pr") == 1)
        .select(
            F.col("query_id").alias("vec_id"),
            "true_label",
            F.col("label").alias("predicted_label"),
            "n_votes",
            (F.col("label") == F.col("true_label")).alias("correct"),
        )
        .orderBy("vec_id")
    )


# --- Johnson-Lindenstrauss random projection ---------------------------------

RP_OUT_DIM = 16
RP_N_OUT = 200  # emit the projection of the first N vectors


@query(
    "q_random_projection",
    oracle="WITH "
    + _ORACLE_EMB_CTE.lstrip()
    + f""",
pts AS (
    SELECT vec_id, generate_subscripts(vec, 1) - 1 AS dim, unnest(vec) AS val
    FROM emb WHERE vec_id < {RP_N_OUT}
), proj AS (
    SELECT CAST(i // {RP_OUT_DIM} AS BIGINT) AS dim,
        CAST(i % {RP_OUT_DIM} AS INTEGER) AS j,
        CASE WHEN ('0x' || substr(md5('rp_' || CAST(i AS VARCHAR)), 1, 8))::BIGINT
                  % 2 = 0
             THEN 1.0 ELSE -1.0 END AS sgn
    FROM UNNEST(generate_series(0, 64 * {RP_OUT_DIM} - 1)) AS t(i)
)
SELECT p.vec_id, pr.j,
    ROUND(SUM(p.val * pr.sgn) / SQRT({RP_OUT_DIM}.0), 6) AS pval
FROM pts p JOIN proj pr USING (dim)
GROUP BY p.vec_id, pr.j
ORDER BY p.vec_id, pr.j""",
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 16 dims with a
    DETERMINISTIC Rademacher (+-1) matrix derived from the repo's
    portable md5 hash — the sketching step that makes downstream
    similarity work 4x cheaper while preserving pairwise distances to
    (1 +- eps) (JL lemma; +-1 entries per Achlioptas 2003, no Gaussians
    needed). The matrix is never materialized ANYWHERE persistent: both
    engines regenerate it from the hash, which is how a 100 TB pipeline
    avoids shipping projection state entirely.

    Long-form matmul: points explode to (vec, dim, val) scalars, the
    64 x 16 matrix (1024 rows) broadcast-joins on dim, one (vec, j)
    partial-agg — the q_embedding_centroids shuffle discipline: scalars
    move, vectors never."""
    emb = embeddings_d(spark, sf_dir).filter(F.col("vec_id") < RP_N_OUT)
    pts = emb.select("vec_id", F.posexplode("vec").alias("dim", "val"))
    idx = spark.range(64 * RP_OUT_DIM)
    sgn = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("rp_"), F.col("id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0,
        1.0,
    ).otherwise(-1.0)
    proj = idx.select(
        (F.col("id") / RP_OUT_DIM).cast("bigint").alias("dim"),
        (F.col("id") % RP_OUT_DIM).cast("int").alias("j"),
        sgn.alias("sgn"),
    )
    return (
        pts.join(F.broadcast(proj), "dim")
        .groupBy("vec_id", "j")
        .agg(
            F.round(
                F.sum(F.col("val") * F.col("sgn")) / float(RP_OUT_DIM) ** 0.5,
                6,
            ).alias("pval")
        )
        .orderBy("vec_id", "j")
    )


# --- simplified silhouette (centroid-based cluster quality) ------------------


def _silhouette_oracle() -> str:
    """Extends the unrolled Lloyd chain: final centroids from the final
    assignment, per-(vec, centroid) distances in long form, then the
    simplified silhouette s = (b - a) / max(a, b) rolled up per
    cluster."""
    base = _kmeans_oracle()
    # strip the final SELECT; keep the CTE chain through a{ROUNDS}
    chain = base[: base.rindex("\nSELECT vec_id")]
    r = KMEANS_ROUNDS
    return (
        chain
        + f""", cfin AS MATERIALIZED (
    SELECT a.cid, p.dim, AVG(p.val) AS val
    FROM a{r} a JOIN pts p ON a.vec_id = p.vec_id
    GROUP BY a.cid, p.dim
), dists AS MATERIALIZED (
    SELECT p.vec_id, c.cid,
        SUM((p.val - c.val) * (p.val - c.val)) AS d2
    FROM pts p JOIN cfin c ON p.dim = c.dim
    GROUP BY p.vec_id, c.cid
), sil AS (
    SELECT d.vec_id, a.cid,
        SQRT(MAX(CASE WHEN d.cid = a.cid THEN d.d2 END)) AS a_dist,
        SQRT(MIN(CASE WHEN d.cid <> a.cid THEN d.d2 END)) AS b_dist
    FROM dists d JOIN a{r} a ON d.vec_id = a.vec_id
    GROUP BY d.vec_id, a.cid
)
SELECT CAST(cid AS BIGINT) AS cluster,
    CAST(COUNT(*) AS BIGINT) AS n_vectors,
    ROUND(AVG((b_dist - a_dist) / GREATEST(a_dist, b_dist)), 6)
        AS mean_silhouette
FROM sil GROUP BY cid ORDER BY cluster"""
    )


@query("q_kmeans_silhouette", oracle=_silhouette_oracle())
def q_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per k-means cluster:
    a = distance to the OWN final centroid, b = distance to the nearest
    OTHER centroid, s = (b - a)/max(a, b) averaged per cluster — the
    cluster-quality readout that at 100 TB replaces the classic
    silhouette (whose pairwise a/b terms are O(n^2); the centroid form
    is the standard linear surrogate and ranks clusters identically in
    practice). Composes lloyd_assignments; everything after the loop is
    one long-form distance rollup against the k x d centroid table —
    scalars shuffle, k^2 never appears."""
    assigned = lloyd_assignments(spark, sf_dir).localCheckpoint()
    emb = embeddings_d(spark, sf_dir).select("vec_id", "vec")
    pts = emb.select("vec_id", F.posexplode("vec").alias("dim", "val"))
    cfin = (
        assigned.join(emb, "vec_id")
        .select(F.col("cluster").alias("cid"), F.posexplode("vec").alias("dim", "val"))
        .groupBy("cid", "dim")
        .agg(F.avg("val").alias("cval"))
    )
    dists = (
        pts.join(F.broadcast(cfin), "dim")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(
                (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
            ).alias("d2")
        )
    )
    sil = (
        dists.join(assigned, "vec_id")
        .groupBy("vec_id", "cluster")
        .agg(
            F.sqrt(
                F.max(F.when(F.col("cid") == F.col("cluster"), F.col("d2")))
            ).alias("a_dist"),
            F.sqrt(
                F.min(F.when(F.col("cid") != F.col("cluster"), F.col("d2")))
            ).alias("b_dist"),
        )
    )
    s = (F.col("b_dist") - F.col("a_dist")) / F.greatest(
        F.col("a_dist"), F.col("b_dist")
    )
    return (
        sil.groupBy(F.col("cluster"))
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.round(F.avg(s), 6).alias("mean_silhouette"),
        )
        .orderBy("cluster")
    )


# --- PCA via power iteration (covariance top component) ---------------------

PCA_ROUNDS = 8
PCA_DIM = 64


def _pca_oracle() -> str:
    v0 = 1.0 / PCA_DIM ** 0.5
    stages = []
    prev = "pv0"
    for k in range(1, PCA_ROUNDS + 1):
        stages.append(
            f"""mdv{k} AS (
    SELECT SUM(m.mu * v.vv) AS mdv
    FROM mu m JOIN {prev} v USING (dim)
), ps{k} AS MATERIALIZED (
    SELECT e.vec_id, SUM(e.val * v.vv) - ANY_VALUE(md.mdv) AS t
    FROM expl e JOIN {prev} v USING (dim) CROSS JOIN mdv{k} md
    GROUP BY e.vec_id
), ts{k} AS (SELECT SUM(t) AS ts FROM ps{k}),
pw{k} AS MATERIALIZED (
    SELECT e.dim,
        SUM(e.val * s.t) / nn.n - ANY_VALUE(m.mu) * ANY_VALUE(t2.ts) / nn.n
            AS w
    FROM expl e
    JOIN ps{k} s USING (vec_id)
    JOIN mu m ON m.dim = e.dim
    CROSS JOIN nn CROSS JOIN ts{k} t2
    GROUP BY e.dim, nn.n
), pn{k} AS (SELECT SQRT(SUM(w * w)) AS nr FROM pw{k}),
pv{k} AS MATERIALIZED (
    SELECT w.dim, w.w / n.nr AS vv FROM pw{k} w CROSS JOIN pn{k} n
)"""
        )
        prev = f"pv{k}"
    return f"""
WITH expl AS MATERIALIZED (
    SELECT vec_id,
        generate_subscripts(embedding, 1) - 1 AS dim,
        CAST(unnest(embedding) AS DOUBLE) AS val
    FROM embeddings
),
nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS DOUBLE) AS n FROM expl),
mu AS MATERIALIZED (SELECT dim, AVG(val) AS mu FROM expl GROUP BY dim),
pv0 AS (SELECT CAST(d.d AS INTEGER) AS dim, {v0!r} AS vv
        FROM range({PCA_DIM}) d(d)),
{",".join(stages)}
SELECT v.dim, ROUND(v.vv, 6) AS loading,
    ROUND(n.nr, 6) AS eigenvalue
FROM {prev} v CROSS JOIN pn{PCA_ROUNDS} n"""


@query("q_pca_power", oracle=_pca_oracle())
def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud by POWER ITERATION
    on the covariance operator — without ever materializing the 64x64
    covariance matrix: each round computes C v = X'(X v)/n - mu (mu'v)
    as two corpus passes over the exploded (vec_id, dim, val) rows (a
    projection keyed by vector, a weighted coordinate sum keyed by
    dim), so the same plan runs at ANY dimensionality where d^2 no
    longer fits anywhere. {PCA_ROUNDS} rounds from the uniform unit
    vector; the centering terms (mu'v and sum-of-projections) are kept
    EXPLICITLY rather than assumed zero so both engines execute the
    identical float recursion. The eigensolver joins the trainer zoo
    (argmin / Newton / boosting / CD / EM / ALS / power iteration) and
    is the dense-matrix twin of q_eigen_centrality.

    Fixture note: the synthetic embeddings are nearly isotropic
    (lambda1/lambda2 ~ 1.013 at sf0.01), so {PCA_ROUNDS} rounds verify
    the exact recursion and a spectrum-bracketed Rayleigh estimate, not
    full eigenvector convergence — on real data with a spectral gap the
    same operator converges geometrically.

    Scale: per round one groupBy(vec_id) + one groupBy(dim) with
    map-side partials; only the d-vector (64 doubles) and two scalars
    reach the driver per round; the exploded frame is checkpointed
    once."""
    emb = embeddings_d(spark, sf_dir)
    expl = emb.select(
        "vec_id", F.posexplode("vec").alias("dim", "val")
    ).localCheckpoint()
    n = expl.select("vec_id").distinct().count()
    mu_rows = (
        expl.groupBy("dim").agg(F.avg("val").alias("mu")).collect()
    )
    mu = {r.dim: r.mu for r in mu_rows}
    spark2 = emb.sparkSession
    v = [1.0 / PCA_DIM ** 0.5] * PCA_DIM
    nr = None
    for _ in range(PCA_ROUNDS):
        vdf = F.broadcast(
            spark2.createDataFrame(
                [(d, v[d]) for d in range(PCA_DIM)], "dim int, vv double"
            )
        )
        mdv = sum(mu[d] * v[d] for d in range(PCA_DIM))
        # r13 (guide §1.2/§2.4): the projection frame `s` feeds BOTH
        # per-round aggregations (the per-dim weighted sum and the
        # global t-sum), so it is lazily checkpointed — the old form
        # re-ran the join + groupBy subtree for each consumer — and the
        # two aggregations ship in ONE union-collect (the ts row rides
        # along as dim = -1), halving the driver round-trips per power
        # iteration: 16.9 s -> 10.9 s at sf0.1. Each aggregation's
        # addends and order are untouched, so the recursion's floats
        # (and the ROUND(6) oracle hash) are unchanged.
        s = (
            expl.join(vdf, "dim")
            .groupBy("vec_id")
            .agg((F.sum(F.col("val") * F.col("vv")) - F.lit(mdv)).alias("t"))
            .localCheckpoint(eager=False)
        )
        agg = (
            expl.join(s, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.col("val") * F.col("t")).alias("sw"))
            .unionByName(
                s.agg(
                    F.lit(-1).alias("dim"), F.sum("t").alias("sw")
                )
            )
            .collect()
        )
        ts = next(r.sw for r in agg if r.dim == -1)
        # round-local checkpoint blocks must not outlive the round
        # (the r8 leak advisory class)
        s.unpersist()
        w = {
            r.dim: r.sw / n - mu[r.dim] * ts / n
            for r in agg
            if r.dim >= 0
        }
        nr = sum(x * x for x in w.values()) ** 0.5
        v = [w.get(d, 0.0) / nr for d in range(PCA_DIM)]
    out = spark2.createDataFrame(
        [(d, v[d], nr) for d in range(PCA_DIM)],
        "dim int, loading double, eigenvalue double",
    )
    return out.select(
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round("eigenvalue", 6).alias("eigenvalue"),
    )


MMR_POOL = 20
MMR_K = 10
MMR_LAMBDA = 0.7


def _mmr_oracle() -> str:
    lam = MMR_LAMBDA
    parts = [
        _ORACLE_EMB_CTE.lstrip(),
        f"""qv AS MATERIALIZED (
    SELECT vec, vnorm FROM emb ORDER BY vec_id LIMIT 1
), pool AS MATERIALIZED (
    SELECT e.vec_id,
        list_dot_product(q.vec, e.vec) / (q.vnorm * e.vnorm) AS rel
    FROM emb e CROSS JOIN qv q
    WHERE e.vec_id > (SELECT MIN(vec_id) FROM emb)
    ORDER BY rel DESC, e.vec_id LIMIT {MMR_POOL}
), pairs AS MATERIALIZED (
    SELECT p1.vec_id AS a, p2.vec_id AS b,
        list_dot_product(e1.vec, e2.vec) / (e1.vnorm * e2.vnorm) AS cos
    FROM pool p1 JOIN emb e1 ON e1.vec_id = p1.vec_id
    JOIN pool p2 ON p2.vec_id <> p1.vec_id
    JOIN emb e2 ON e2.vec_id = p2.vec_id
)""",
        f"""s1 AS MATERIALIZED (
    SELECT vec_id, rel, {lam} * rel AS mmr_score
    FROM pool ORDER BY rel DESC, vec_id LIMIT 1
), sel1 AS MATERIALIZED (SELECT vec_id FROM s1)""",
    ]
    for i in range(2, MMR_K + 1):
        parts.append(
            f"""s{i} AS MATERIALIZED (
    SELECT t.vec_id, t.rel, {lam} * t.rel - {1 - lam} * t.ms AS mmr_score
    FROM (
        SELECT c.a AS vec_id, MAX(p.rel) AS rel, MAX(c.cos) AS ms
        FROM pairs c
        JOIN sel{i - 1} s ON c.b = s.vec_id
        JOIN pool p ON p.vec_id = c.a
        WHERE c.a NOT IN (SELECT vec_id FROM sel{i - 1})
        GROUP BY c.a
    ) t
    ORDER BY mmr_score DESC, t.vec_id LIMIT 1
), sel{i} AS MATERIALIZED (
    SELECT vec_id FROM sel{i - 1} UNION ALL SELECT vec_id FROM s{i}
)"""
        )
    branches = " UNION ALL ".join(
        f"SELECT {i} AS rnk, vec_id, ROUND(rel, 6) AS relevance,"
        f" ROUND(mmr_score, 6) AS mmr_score FROM s{i}"
        for i in range(1, MMR_K + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\nSELECT * FROM ({branches})"


@query("q_mmr_rerank", oracle=_mmr_oracle())
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein
    1998): greedily pick {MMR_K} results maximizing
    lambda*rel(d) - (1-lambda)*max_cos(d, selected) (lambda =
    {MMR_LAMBDA}) from the top-{MMR_POOL} relevance pool — the
    diversity-aware complement of q_similarity_topk, which happily
    returns {MMR_K} near-copies of the same document. Query = the
    lowest-id embedding; relevance and pairwise similarity both use the
    module's double-cast cosine (zip_with fold == list_dot_product,
    the proven hash-stable pair).

    Scale: relevance is the one corpus pass (broadcast query); the
    greedy runs on the BOUNDED pool (its {MMR_POOL}x{MMR_POOL} cosine
    matrix is computed in-engine and collected — constant size by
    construction). The oracle unrolls the {MMR_K} greedy picks as
    MATERIALIZED CTE steps."""
    emb = embeddings_d(spark, sf_dir).localCheckpoint()
    qrow = emb.orderBy("vec_id").limit(1)
    q = qrow.select(
        F.col("vec").alias("qvec"),
        F.col("vnorm").alias("qnorm"),
        F.col("vec_id").alias("qid"),
    )
    rel = dot(F.col("qvec"), F.col("vec")) / (F.col("qnorm") * F.col("vnorm"))
    pool = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("vec_id", rel.alias("rel"))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(MMR_POOL)
        .localCheckpoint()
    )
    p1 = pool.join(emb, "vec_id").select(
        F.col("vec_id").alias("a"), F.col("vec").alias("v1"),
        F.col("vnorm").alias("n1"),
    )
    p2 = pool.join(emb, "vec_id").select(
        F.col("vec_id").alias("b"), F.col("vec").alias("v2"),
        F.col("vnorm").alias("n2"),
    )
    cos = dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    pair_rows = (
        p1.crossJoin(p2)
        .filter(F.col("a") != F.col("b"))
        .select("a", "b", cos.alias("cos"))
        .collect()
    )  # bounded: MMR_POOL^2 scalars
    rels = {r.vec_id: r.rel for r in pool.collect()}
    cosm = {(r.a, r.b): r.cos for r in pair_rows}
    lam = MMR_LAMBDA
    selected: list[tuple[int, int, float, float]] = []
    chosen: list[int] = []
    remaining = set(rels)
    for rank in range(1, MMR_K + 1):
        if not remaining:
            break
        if not chosen:
            scored = [(lam * rels[v], v) for v in remaining]
        else:
            scored = [
                (
                    lam * rels[v]
                    - (1 - lam) * max(cosm[(v, s)] for s in chosen),
                    v,
                )
                for v in remaining
            ]
        best = max(scored, key=lambda t: (t[0], -t[1]))
        score, v = best
        chosen.append(v)
        remaining.discard(v)
        selected.append((rank, v, rels[v], score))
    out = spark.createDataFrame(
        selected, "rnk int, vec_id bigint, relevance double, mmr_score double"
    )
    return out.select(
        "rnk",
        "vec_id",
        F.round("relevance", 6).alias("relevance"),
        F.round("mmr_score", 6).alias("mmr_score"),
    )


# --- SemDeDup: semantic near-duplicate pruning --------------------------------
# (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
# through semantic deduplication"): k-means cells over the embedding
# space, exact pairwise cosine WITHIN each cell, and one canonical
# representative kept per semantic-duplicate neighborhood. Completes the
# LLM-curation dedup spectrum — exact (q_dedup_exact), fuzzy/MinHash
# (q_dedup_*_lsh), substring (q_substring_dedup_apply), URL
# (q_url_normalize) — with the embedding-space family (r10 verdict
# item 7), composed from the already-oracled kernels: the shared
# deterministic Lloyd trainer, the in-row argmin assignment, and the
# q_embedding_neardup cosine predicate.
SEMDEDUP_COSINE = NEARDUP_COSINE  # same non-vacuous fixture rationale


def _semdedup_oracle() -> str:
    """Unrolled-Lloyd CTE chain (shared generator) -> per-vector cell
    argmin WITH its centroid distance -> within-cell cosine pairs ->
    keep-rule rollup. The keep rule is the paper's, made deterministic:
    within a duplicate pair the vector FARTHER from its centroid is
    kept (SemDeDup keeps low centroid-similarity examples to preserve
    diversity); ties break to the lower vec_id. A vector is dropped iff
    ANY same-cell near-dup partner beats it — EXISTS semantics, pinned
    (the paper's sequential greedy depends on scan order; this form is
    order-free and hash-stable)."""
    r = KMEANS_ROUNDS
    return (
        "WITH "
        + _lloyd_ctes(KMEANS_K, r)
        + f""", cdist AS MATERIALIZED (
    SELECT p.vec_id, c.cid,
        SUM((p.val - c.val) * (p.val - c.val)) AS d
    FROM pts p JOIN c{r - 1} c ON p.dim = c.dim
    GROUP BY p.vec_id, c.cid
), cells AS MATERIALIZED (
    SELECT vec_id, cid, d FROM (
        SELECT vec_id, cid, d,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM cdist
    ) WHERE rn = 1
), pairs AS (
    SELECT a.vec_id AS va, b.vec_id AS vb, a.d AS da, b.d AS db
    FROM cells a
    JOIN cells b ON b.cid = a.cid AND b.vec_id <> a.vec_id
    JOIN emb ea ON ea.vec_id = a.vec_id
    JOIN emb eb ON eb.vec_id = b.vec_id
    WHERE list_dot_product(ea.vec, eb.vec) / (ea.vnorm * eb.vnorm)
        >= {SEMDEDUP_COSINE}
), agg AS (
    SELECT va AS vec_id,
        CAST(COUNT(*) AS BIGINT) AS n_neardups,
        CAST(COUNT(CASE WHEN db > da OR (db = da AND vb < va) THEN 1 END)
            AS BIGINT) AS n_beaten
    FROM pairs GROUP BY va
)
SELECT c.vec_id, CAST(c.cid AS BIGINT) AS cell,
    COALESCE(g.n_neardups, 0) AS n_neardups,
    (COALESCE(g.n_beaten, 0) = 0) AS is_kept
FROM cells c LEFT JOIN agg g ON g.vec_id = c.vec_id"""
    )


@query("q_semdedup", oracle=_semdedup_oracle())
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication: the deterministic fixed-round
    Lloyd trainer (q_kmeans_lloyd's loop, k={k}, {r} rounds) partitions
    the corpus into cells; exact cosine runs only WITHIN cells (the
    paper's trick — k-means replaces the quadratic corpus cross join
    with per-cell blocks); within each near-dup pair (cosine >=
    SEMDEDUP_COSINE) the vector farther from its centroid is kept and
    the closer one dropped (ties to the lower vec_id). Output per
    vector: its cell, its same-cell near-dup degree, and the keep
    verdict — all-integer/boolean, so the driver hash is exact (floats
    only decide the argmin and the keep comparisons; margins asserted
    in tests/test_northstar.py::test_semdedup_oracle_margin_floor).

    Scale: assignment is the zero-shuffle in-row argmin (centroids fold
    in as literals); the ONLY corpus-scale exchange is the hash
    partition on cell for the within-cell self-join — exactly how the
    paper runs at web scale, with k chosen so a cell fits an executor
    (k ~ n/50k; their 100M-doc run used k=11k). The keep-rule rollup
    reuses the pair shuffle's partitioning; the join back to the
    assignment frame is AQE-broadcast at fixture scale. EXISTS
    keep-semantics make the result independent of pair enumeration
    order — no sequential scan to distribute.

    The cell count is the MANDATORY scale knob: at fixed k the
    within-cell pair space grows O(n^2/k) — measured super-linear at
    the 10x tier (19.2-21.1x wall across runs) with the fixture k=8,
    and measured RESTORED by scaling k with the corpus: k=80 on the
    same 10x corpus runs 12.7s vs k=8's 97s, a 2.5x ratio (SCALE.md
    r11 "semdedup cell knob"). The registry key pins k={k} for oracle
    determinism; production calls semdedup_frame with
    k ~ n / target_cell_size."""
    return semdedup_frame(spark, sf_dir, KMEANS_K)


# Above this k x d product the centroid matrix stops folding into the
# plan as literals (expression-tree size, codegen JIT cost) and the
# assignment argmin switches to the broadcast-frame join — the same
# dataflow the Lloyd trainer's own update rounds use.
SEMDEDUP_LITERAL_ARGMIN_MAX = 50_000


def _assign_cells_via_join(
    emb: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Large-k cell assignment: long-form points join a BROADCAST
    centroid frame, per-(vec, cid) squared distance sums, min_by argmin
    with (d, cid) tie-break — the trainer's own update dataflow, used
    when k x d is too large to fold in as plan literals. Returns the
    same (vec_id, vec, vnorm, cell, cdist) frame as the literal path
    (identity asserted at small k in tests/test_northstar.py)."""
    spark = emb.sparkSession
    cbl = spark.createDataFrame(
        [(cid, d, v) for cid, vec in cents for d, v in enumerate(vec)],
        "cid long, dim int, cval double",
    )
    pts = emb.select("vec_id", F.posexplode("vec").alias("dim", "val"))
    assign = (
        pts.join(F.broadcast(cbl), "dim")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(
                (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
            ).alias("d")
        )
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.struct(F.col("cid").alias("cell"), F.col("d").alias("cdist")),
                F.struct("d", "cid"),
            ).alias("best")
        )
        .select("vec_id", "best.cell", "best.cdist")
    )
    return emb.join(assign, "vec_id").select(
        "vec_id", "vec", "vnorm", "cell", "cdist"
    )


# Hot-cell defense (the LSH AUTO_BUCKET_CAP analogue, r11 verdict
# optional item 6): k-means adapts cell sizes on natural corpora, but a
# planted near-duplicate BLOB — b near-identical vectors — lands in one
# cell no matter what k is, and the within-cell self-join then emits
# C(b, 2) pairs out of one task (b = 1M clones -> 5e11 pairs, the same
# quadratic cliff as a degenerate LSH bucket). Under the cap, each
# oversized cell keeps only its md5-order-first members for the PAIR
# stage (deterministic, content-independent); uncapped members keep
# is_kept = TRUE (no evidence against them). Recall loss is confined to
# oversized cells, and in production EXACT dedup runs first (byte-hash
# for text, quantized-vector hash for embeddings), which collapses the
# identical cores such blobs are made of. C(512, 2) = 130,816 pairs is
# the per-cell worst case under the cap — one comfortable task.
SEMDEDUP_AUTO_CELL_CAP = 512
# Observability for bench/tests ONLY (same contract as LSH_TELEMETRY):
# unsynchronized, last-writer-wins per tag.
SEMDEDUP_TELEMETRY: dict = {}


def semdedup_frame(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    rounds: int = KMEANS_ROUNDS,
    force_join_argmin: bool = False,
    emb: DataFrame | None = None,
    cell_cap: int | str | None = None,
    tag: str = "default",
) -> DataFrame:
    """Parameterized SemDeDup (see q_semdedup): `k` cells bound the
    within-cell pair space to ~n^2/k; scale k with the corpus to hold
    per-cell size (and thus total pair work per vector) constant. Past
    SEMDEDUP_LITERAL_ARGMIN_MAX the assignment argmin switches from
    plan-literal centroids to the broadcast-frame join automatically;
    ``force_join_argmin`` pins the join path regardless of k x d (the
    driver-gated twin q_semdedup_joined uses it so the 100 TB assignment
    dataflow gets a hash verdict every round, not just a local test).

    ``emb`` overrides the corpus (any (vec_id, vec, vnorm) frame — the
    skew microbench passes a synthetic blob corpus); default is the
    fixture embeddings table. ``cell_cap`` is the hot-cell defense (see
    SEMDEDUP_AUTO_CELL_CAP): None = exact, oracle-identical pair set
    (every registered key); an int caps each cell's pair-stage
    membership at that many md5-order-first members; "auto" runs one
    max-cell-size probe (a single count agg — skew-immune group state)
    and engages the cap at SEMDEDUP_AUTO_CELL_CAP only when some cell
    exceeds it, recording the verdict in SEMDEDUP_TELEMETRY[tag]."""
    if emb is None:
        emb = embeddings_d(spark, sf_dir)
    cents = lloyd_centroids(emb.select("vec_id", "vec"), k, rounds)
    dim = len(cents[0][1]) if cents else 0
    if force_join_argmin or k * dim > SEMDEDUP_LITERAL_ARGMIN_MAX:
        cells = _assign_cells_via_join(emb, cents)
        cells_cheap = False
    else:
        best = F.sort_array(F.array(*_centroid_dist_structs(cents)))[0]
        cells = emb.select(
            "vec_id",
            "vec",
            "vnorm",
            best["cid"].alias("cell"),
            best["d"].alias("cdist"),
        )
        # literal argmin = zero-exchange codegen over the scan: cheap to
        # recompute, so the auto probe must not pay a full-payload
        # localCheckpoint for it (r14, VERDICT r13 item 1)
        cells_cheap = True
    return _semdedup_from_cells(cells, cell_cap, tag, cells_cheap=cells_cheap)


_SEMDEDUP_PAIR_CHUNK = 4096  # kernel row-block: memory O(chunk * cell)


def _semdedup_cell_kernel(pdf):
    """Within-cell pair stage for ONE cell as a numpy kernel (r13,
    guide §4.2 — hand the whole block to BLAS instead of evaluating a
    zip_with fold per pair): the cosine matrix is one GEMM over the
    cell's vector block, the near-dup degree a row-sum of the
    thresholded mask, and the keep rule a row-any over the beaten mask.
    Exactly the self-join's semantics: directed pairs va != vb,
    cos >= SEMDEDUP_COSINE, beaten = (db > da) | (db == da & vb < va),
    kept = beaten-count 0. Output is all-integer/boolean; the only FP
    difference vs the join form is dot-product summation order
    (pairwise/SIMD vs sequential fold), and every registered fixture
    holds >= 1e-9 margins on both comparisons
    (test_semdedup_oracle_margin_floor), 6+ orders above that noise.
    Row blocks of _SEMDEDUP_PAIR_CHUNK bound memory at O(chunk * cell)
    so an adversarial giant cell degrades like the join (spill-shaped,
    not OOM); the hot-cell cap upstream remains the real defense."""
    import numpy as np
    import pandas as pd

    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])[order]
    norms = pdf["vnorm"].to_numpy(dtype=np.float64)[order]
    dist = pdf["cdist"].to_numpy(dtype=np.float64)[order]
    n = ids.shape[0]
    n_neardups = np.zeros(n, dtype=np.int64)
    beaten = np.zeros(n, dtype=bool)
    for lo in range(0, n, _SEMDEDUP_PAIR_CHUNK):
        hi = min(lo + _SEMDEDUP_PAIR_CHUNK, n)
        cos = (X[lo:hi] @ X.T) / np.outer(norms[lo:hi], norms)
        m = cos >= SEMDEDUP_COSINE
        m[:, lo:hi][np.eye(hi - lo, dtype=bool)] = False
        n_neardups[lo:hi] = m.sum(axis=1)
        beat = m & (
            (dist[None, :] > dist[lo:hi, None])
            | (
                (dist[None, :] == dist[lo:hi, None])
                & (ids[None, :] < ids[lo:hi, None])
            )
        )
        beaten[lo:hi] = beat.any(axis=1)
    return pd.DataFrame(
        {
            "vec_id": ids,
            "cell": pdf["cell"].to_numpy(dtype=np.int64)[order],
            "n_neardups": n_neardups,
            "is_kept": ~beaten,
        }
    )


def _semdedup_from_cells(
    cells: DataFrame,
    cell_cap: int | str | None,
    tag: str,
    cells_checkpointed: bool = False,
    pair_impl: str = "kernel",
    cells_cheap: bool = False,
) -> DataFrame:
    """The pair/keep stage shared by every semdedup cell partitioner
    (flat Lloyd in semdedup_frame, two-level hierarchical in
    hier_cells/q_semdedup_hier): within-cell cosine pairs, the
    closest-to-centroid keep rule, and the hot-cell cap/probe. Pure
    extraction of semdedup_frame's second half (r13) — behavior
    byte-identical for every pre-existing key. ``cells_checkpointed``
    lets a caller that already localCheckpointed the assignment
    (hier_cells does — it feeds its own final join) skip the auto
    branch's re-materialization: without it the full
    (vec_id, vec, vnorm, cell, cdist) frame would land in the block
    manager TWICE per run."""
    # `cell` is bigint on EVERY branch (ADVICE r13): the kernel's
    # applyInPandas schema already declares long, but the capped
    # join-back and the join form used to pass the input frame's
    # original type through — a registered query's schema could flip
    # with whether the auto cap engaged. The cast is a no-op on the
    # hier path (already bigint) and on fixture outputs (no registered
    # key engages the cap; the kernel branch shipped long all along).
    cells = cells.withColumn("cell", F.col("cell").cast("bigint"))
    if cell_cap == "auto":
        # materialize the assignment ONCE before probing (ADVICE r12)
        # when recomputing it is expensive: the probe is an eager
        # collect, and without this the full assignment pass — the
        # broadcast argmin JOIN at production k — would run twice, once
        # for the probe and again in the main query. The LITERAL-argmin
        # path (cells_cheap, r14 / VERDICT r13 item 1) skips the
        # checkpoint instead: its assignment is zero-exchange codegen
        # over the scan, and materializing the full (vec, vnorm)
        # payload just to count cells cost the 1x lane ~1.8 s in the
        # driver's r13 bench (5.36 s vs 3.59); the probe below prunes
        # to `cell` so the payload never leaves the scan stage.
        if not cells_checkpointed and not cells_cheap:
            cells = cells.localCheckpoint()
            cells_checkpointed = True
        probe = (
            cells.select("cell")
            .groupBy("cell")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()
        )
        max_cell = int(probe[0]["mx"] or 0)
        engaged = max_cell > SEMDEDUP_AUTO_CELL_CAP
        SEMDEDUP_TELEMETRY[tag] = {
            "max_cell": max_cell,
            "cap_engaged": engaged,
        }
        cell_cap = SEMDEDUP_AUTO_CELL_CAP if engaged else None
        if cell_cap is not None and not cells_checkpointed:
            # the cap path reads `cells` twice (window + kernel
            # join-back): keep the r13 single-materialization posture
            cells = cells.localCheckpoint()
            cells_checkpointed = True
    pair_cells = cells
    if cell_cap is not None:
        wc = Window.partitionBy("cell").orderBy(
            F.md5(F.col("vec_id").cast("string")), "vec_id"
        )
        pair_cells = (
            cells.withColumn("crn", F.row_number().over(wc))
            .filter(F.col("crn") <= cell_cap)
            .drop("crn")
        )
    if pair_impl == "kernel":
        # r13 primary path (guide §4.2): ONE exchange keyed by cell,
        # then the whole pair stage runs as a per-cell numpy kernel —
        # the join form shuffled the vector payload TWICE (both self-
        # join sides) and evaluated a d-wide zip_with fold per directed
        # pair (~n * cell_size HOF evaluations); the kernel moves each
        # vector once and hands the cell block to one GEMM. When no cap
        # filtered anything the kernel output already covers every
        # vector, so the join-back disappears too. The join form stays
        # selectable (pair_impl="join") and output-identity between the
        # two is asserted per run in tests/test_northstar.py.
        scored = pair_cells.select(
            "vec_id", "cell", "vec", "vnorm", "cdist"
        ).groupBy("cell").applyInPandas(
            _semdedup_cell_kernel,
            schema="vec_id long, cell long, n_neardups long, is_kept boolean",
        )
        if cell_cap is None:
            return scored
        return (
            cells.select("vec_id", "cell")
            .join(scored.select("vec_id", "n_neardups", "is_kept"),
                  "vec_id", "left")
            .select(
                "vec_id",
                "cell",
                F.coalesce(
                    F.col("n_neardups"), F.lit(0).cast("bigint")
                ).alias("n_neardups"),
                F.coalesce(F.col("is_kept"), F.lit(True)).alias("is_kept"),
            )
        )
    a = pair_cells.select(
        F.col("vec_id").alias("va"),
        "cell",
        F.col("vec").alias("vec_a"),
        F.col("vnorm").alias("norm_a"),
        F.col("cdist").alias("da"),
    )
    b = pair_cells.select(
        F.col("vec_id").alias("vb"),
        "cell",
        F.col("vec").alias("vec_b"),
        F.col("vnorm").alias("norm_b"),
        F.col("cdist").alias("db"),
    )
    # zero-norm guard (ADVICE r13): a zero-norm pair's cos is 0/0 —
    # NaN in numpy (mask False => no-match) but, under this session's
    # ANSI mode, a DIVIDE_BY_ZERO *error* here. The when-guard makes
    # the degenerate input a no-match in BOTH pair impls (NULL fails
    # the >= filter) while leaving every non-degenerate cosine the
    # bit-identical division it always was. Fixture embeddings have no
    # zero vectors (the >= 1e-9 margin-floor test implies
    # non-degenerate cosines), so no registered output moves.
    nrm = F.col("norm_a") * F.col("norm_b")
    cos = F.when(nrm > 0, dot(F.col("vec_a"), F.col("vec_b")) / nrm)
    pairs = (
        a.join(b, "cell")
        .filter(F.col("va") != F.col("vb"))
        .filter(cos >= SEMDEDUP_COSINE)
        .select("va", "vb", "da", "db")
    )
    beaten = (F.col("db") > F.col("da")) | (
        (F.col("db") == F.col("da")) & (F.col("vb") < F.col("va"))
    )
    agg = pairs.groupBy("va").agg(
        F.count("*").cast("bigint").alias("n_neardups"),
        F.count(F.when(beaten, 1)).cast("bigint").alias("n_beaten"),
    )
    return (
        cells.select("vec_id", "cell")
        .join(agg, cells["vec_id"] == agg["va"], "left")
        .select(
            "vec_id",
            "cell",
            F.coalesce(F.col("n_neardups"), F.lit(0).cast("bigint")).alias(
                "n_neardups"
            ),
            (F.coalesce(F.col("n_beaten"), F.lit(0).cast("bigint")) == 0).alias(
                "is_kept"
            ),
        )
    )


q_semdedup.__doc__ = q_semdedup.__doc__.format(k=KMEANS_K, r=KMEANS_ROUNDS)


@query("q_semdedup_joined", oracle=_semdedup_oracle())
def q_semdedup_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_semdedup with the assignment argmin FORCED through the
    broadcast-centroid-frame join (`_assign_cells_via_join`) — the
    dataflow the operator uses automatically past
    SEMDEDUP_LITERAL_ARGMIN_MAX, i.e. the path a 100 TB run with
    corpus-scaled k actually executes. Registered under the SAME hash
    oracle as q_semdedup: the two paths are output-identical by
    construction (tests/test_northstar.py pins the identity), so this
    key gives the join argmin a per-round DRIVER verdict instead of
    only a local test (r11 verdict residual 2 — previously a
    regression in the join path could never surface in a driver
    round). Plan difference is pinned in tests: this form carries the
    posexplode Generate + broadcast join; the literal path carries
    neither."""
    return semdedup_frame(spark, sf_dir, KMEANS_K, force_join_argmin=True)


# Production cell sizing: k ~ n / target keeps the within-cell pair space
# (and so total pair work per vector) constant as the corpus grows — the
# paper's own knob (k=11k for 100M docs ~ 9k/cell; 250 here keeps the
# fixture's per-cell pair stage comparable to q_semdedup's k=8 at sf0.1).
SEMDEDUP_TARGET_CELL = 250


@query("q_semdedup_scaled")
def q_semdedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the PRODUCTION cell sizing: k = ceil(n /
    SEMDEDUP_TARGET_CELL) computed from the corpus (one count job —
    bounded driver state, like the Lloyd centroid collect), so per-cell
    pair work stays constant as the corpus grows instead of the fixed-k
    O(n^2/k) blow-up measured in SCALE.md "semdedup cell knob" (k=8 at
    the 10x tier: 19.2x wall; k=80: 2.5x). This is the entry the bench
    scale tier measures — the tier's 10x corpus gets k=80
    automatically, so the shipped ratio tracks the knob the paper says
    to turn, not the fixture constant pinned for oracle determinism.

    Rows-only by design: k is data-dependent, and the oracle's
    unrolled-Lloyd CTE chain is generated for a FIXED k — the hash
    gates on this operator are q_semdedup (literal argmin, k=8) and
    q_semdedup_joined (join argmin, same oracle); this key adds the
    sizing policy on top, invariant-checked in tests/test_northstar.py
    (cells within range, schema identical to q_semdedup, non-vacuous
    drop set).

    r13 (VERDICT r12 item 4): the PRODUCTION entry also carries the
    hot-cell defense — cell_cap="auto" runs the single max-cell probe
    every round and stands down on the balanced fixture
    (SEMDEDUP_TELEMETRY["q_semdedup_scaled"].cap_engaged is False,
    asserted in tests/test_skew.py, output exact), so the probe the
    100 TB run depends on is exercised by the registered key, not only
    by the skew microbench where it engages."""
    emb = embeddings_d(spark, sf_dir)
    n = emb.count()
    k = max(2, -(-n // SEMDEDUP_TARGET_CELL))
    return semdedup_frame(
        spark, sf_dir, k, cell_cap="auto", tag="q_semdedup_scaled"
    )


# --- hierarchical (two-level) cells: the O(n * sqrt(k)) assignment path -----
# The r13 100x probe exposed the flat production path's hidden term:
# with the paper's sizing k = n/250, BOTH the Lloyd updates and the
# join argmin fan every point-dim row out to all k centroids —
# O(rounds * n * d * k) = O(rounds * n^2 * d / 250) — so
# q_semdedup_scaled's tier curve steepens (2.8x @ 10x, 9.8x @ 30x,
# 47.2x @ 100x: sub-linear vs 1x at every point, but the 30x->100x
# segment is locally super-linear). The standard fix is hierarchical
# (IVF-style) assignment: k1 = ceil(sqrt(k)) coarse centroids trained
# on a bounded strided sample and folded into codegen as literals
# (zero-shuffle coarse pass), then fine centroids trained ON THE FULL
# CORPUS but with each point restricted to its own coarse cell's
# k2 = ceil(k/k1) sub-centroids (the training join keys on
# (ccell, dim), so the fan-out is k2 = sqrt(k), not k). Total work
# O(rounds * n * d * sqrt(k)) — O(n^1.5) under k ~ n, vs the flat
# path's O(n^2). Approximation is exactly the IVF one: a vector is
# locked to its nearest coarse cell's sub-centroids; at k1 = 1 the
# construction DEGENERATES TO THE FLAT PATH bit-for-bit (same seeds,
# same update dataflow, same tie-breaks — asserted in
# tests/test_northstar.py), which is the correctness anchor for the
# rows-only key.
SEMDEDUP_HIER_COARSE_SAMPLE = 40  # coarse-training points per coarse centroid


def _lloyd_centroids_driver(
    pts_rows, k: int, rounds: int
) -> list[tuple[int, list[float]]]:
    """numpy mirror of lloyd_centroids for a BOUNDED collected sample
    (r13 optimization round): same seeding (the k rank-lowest vec_ids),
    same per-round update (assign by min (d, cid) — argmin over
    cid-sorted rows breaks ties to the lowest cid exactly like the
    struct ordering — then re-mean per centroid, dropping empty ones),
    same (cid, vec) return shape. Exists because hier_cells' coarse
    trainer input is bounded by construction (~k1 x
    SEMDEDUP_HIER_COARSE_SAMPLE rows), so the distributed trainer's
    per-round collect queries were pure fixed cost: one collect job
    replaces four driver round-trips. FP sums differ from the
    distributed AVG only in association order (~1e-15 relative, far
    under the asserted 1e-9 argmin margins); the coarse boundary is
    IVF-approximate by design (q_semdedup_hier is rows-only)."""
    import numpy as np

    pts_rows = sorted(pts_rows, key=lambda r: int(r.vec_id))
    if not pts_rows:
        return []
    X = np.array(
        [[float(x) for x in r.vec] for r in pts_rows], dtype=np.float64
    )
    ids = [int(r.vec_id) for r in pts_rows]
    cents = {ids[i]: X[i].copy() for i in range(min(k, len(ids)))}
    for _ in range(rounds - 1):
        cids = sorted(cents)
        C = np.stack([cents[c] for c in cids])
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        cents = {
            cids[j]: X[assign == j].mean(axis=0) for j in np.unique(assign)
        }
    return [
        (cid, [float(v) for v in vec]) for cid, vec in sorted(cents.items())
    ]


def hier_cells(
    emb: DataFrame,
    k: int,
    rounds: int = KMEANS_ROUNDS,
    k1: int | None = None,
    n: int | None = None,
) -> DataFrame:
    """Two-level cell assignment returning the same (vec_id, vec, vnorm,
    cell, cdist) frame as the flat partitioners. `cell` is the globally
    unique ccell * k2 + sub (labels differ from the flat path's; the
    PARTITION and per-vector distances are what downstream consumes).
    The returned frame is localCheckpointed (it feeds both the pair
    stage and the final join) and the long-form intermediates are
    unpersisted before return."""
    spark = emb.sparkSession
    base = emb.select("vec_id", "vec")
    if n is None:
        n = base.count()
    if k1 is None:
        k1 = max(1, int(math.isqrt(max(0, k - 1))) + 1)  # ceil(sqrt(k))
    k2 = max(1, -(-k // k1))

    # coarse centroids from a deterministic strided sample (every
    # stride-th vec_id): bounded trainer input, rank-based seeding
    # because the sampled ids are not contiguous. The sample is bounded
    # by construction (~k1 x SEMDEDUP_HIER_COARSE_SAMPLE rows), so the
    # trainer runs driver-side on the collected sample (r13: one
    # collect job instead of the distributed trainer's four driver
    # round-trips on trivially small data; _lloyd_centroids_driver
    # mirrors lloyd_centroids' seeding/update/tie-break exactly)
    want = max(k1 * SEMDEDUP_HIER_COARSE_SAMPLE, k1)
    stride = max(1, n // want)
    sample = base.filter(F.pmod(F.col("vec_id"), F.lit(stride)) == 0)
    ccents = _lloyd_centroids_driver(sample.collect(), k1, rounds)
    dim = len(ccents[0][1]) if ccents else 0
    if k1 * dim <= SEMDEDUP_LITERAL_ARGMIN_MAX:
        bestc = F.sort_array(F.array(*_centroid_dist_structs(ccents)))[0]
        coarse = emb.select(
            "vec_id", "vec", "vnorm", bestc["cid"].alias("ccell")
        )
    else:
        coarse = _assign_cells_via_join(emb, ccents).select(
            "vec_id", "vec", "vnorm", F.col("cell").alias("ccell")
        )
    coarse = coarse.localCheckpoint()

    # fine seeds: the k2 rank-lowest vec_ids per coarse cell (sub index
    # in seed vec_id order, so the (d, sub) tie-break below reproduces
    # the flat path's (d, seed-vec_id) ordering)
    w = Window.partitionBy("ccell").orderBy("vec_id")
    seed_rows = (
        coarse.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k2)
        .select("ccell", (F.col("rn") - 1).alias("sub"), "vec")
        .collect()
    )
    cents: dict[tuple[int, int], list[float]] = {
        (int(r.ccell), int(r.sub)): [float(x) for x in r.vec]
        for r in seed_rows
    }

    # r13 optimization, second cut (guide §2.3/§2.4): the sub-centroid
    # argmin is computed fully IN-ROW. The first r13 form broadcast the
    # sub-centroids as (ccell, sub, cvec) rows, fanned each vector to
    # its own coarse cell's <= k2 subs via the ccell equi-join, and
    # collapsed the fan-out with a groupBy(vec_id, ccell) min — one
    # exchange per argmin, plus a vec_id join to re-attach vectors for
    # the update sums (and a final vec_id join for the assignment).
    # But the fan-out/collapse pair is avoidable outright: broadcasting
    # ONE ROW PER COARSE CELL carrying the sub list as an
    # array<struct<sub, cvec>> turns the argmin into
    # array_min(transform(...)) over that array — same zip_with fold
    # per (vec, sub) pair (same addends, same dim order, bit-identical
    # FP), same (d, sub) lexicographic tie-break (array_min on
    # struct(d, sub) orders exactly like min(struct(d, sub))) — and the
    # row never leaves its scan partition: ZERO exchanges per argmin,
    # and the vector/vnorm columns stay in-row so neither the update
    # nor the final assignment needs a join-back. Per update round the
    # only exchange left is the (ccell, sub) partial-agg shuffle of the
    # per-dim sums. The pivoted-columns form stays rejected (O(n * d *
    # k2^2) conditional-sum branches — the flat trainer's tier
    # collapse). Drop-empty semantics unchanged: a coarse cell that
    # lost every sub has no row in the broadcast list, so its vectors
    # drop from the inner join exactly as before.
    def cblg() -> DataFrame:
        by_cc: dict[int, list[tuple[int, list[float]]]] = {}
        for (cc, s), vec in sorted(cents.items()):
            by_cc.setdefault(cc, []).append((s, vec))
        return spark.createDataFrame(
            [(cc, subs) for cc, subs in sorted(by_cc.items())],
            "ccell long, subs array<struct<sub: int, cvec: array<double>>>",
        )

    def with_best(cols: DataFrame) -> DataFrame:
        sq = lambda cvec: F.aggregate(  # noqa: E731
            F.zip_with("vec", cvec, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        best = F.array_min(
            F.transform(
                "subs",
                lambda s: F.struct(
                    sq(s["cvec"]).alias("d"), s["sub"].alias("sub")
                ),
            )
        )
        return cols.join(F.broadcast(cblg()), "ccell").withColumn(
            "best", best
        )

    for _ in range(rounds - 1):
        rows = (
            with_best(coarse.select("ccell", "vec"))
            .groupBy("ccell", F.col("best")["sub"].alias("sub"))
            .agg(
                F.count("*").alias("n"),
                *[F.sum(F.col("vec")[i]).alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        # a (ccell, sub) that won no points is DROPPED, mirroring the
        # flat trainer exactly (lloyd_centroids rebuilds cents from the
        # update rows only) — without the mirror, a stale hier centroid
        # would stay assignable in later rounds while the flat path's
        # vanishes, and the k1=1 degeneracy anchor would hold only on
        # corpora where no sub-centroid ever empties
        cents = {
            (int(r.ccell), int(r.sub)): [
                float(r[f"s{i}"]) / int(r.n) for i in range(dim)
            ]
            for r in rows
        }

    # the struct column is checkpointed WHOLE and its fields projected
    # after: projecting cell/cdist pre-checkpoint lets CollapseProject
    # inline `best` into both field accesses, re-evaluating the k2-way
    # argmin twice per vector (measured +2 s on the assignment pass)
    cells = (
        with_best(coarse)
        .select("vec_id", "vec", "vnorm", "ccell", "best")
        .localCheckpoint()
        .select(
            "vec_id",
            "vec",
            "vnorm",
            (F.col("ccell") * k2 + F.col("best")["sub"])
            .cast("bigint")
            .alias("cell"),
            F.col("best")["d"].alias("cdist"),
        )
    )
    coarse.unpersist()
    return cells


@query("q_semdedup_hier")
def q_semdedup_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup under the production sizing AND the O(n * sqrt(k))
    hierarchical assignment (see the block comment above hier_cells):
    k = ceil(n / 250) like q_semdedup_scaled, but cells come from the
    two-level coarse/fine partitioner, so at corpus-scaled k the
    assignment cost is O(n^1.5) instead of the flat path's O(n^2).
    Measured on the v3 tiers (SCALE.md "Round-13: hierarchical
    semdedup"): 100x wall 47.6 s vs the flat key's 221.9 s (4.7x), 30x
    22.8 vs 42.0 s; at 1x the two-level fixed cost (two extra trainer
    loops' driver round-trips on trivial data) makes it SLOWER (9.8 vs
    4.3 s) — the crossover lands before 30x, exactly the regime the
    key exists for.

    Rows-only by design (like q_semdedup_scaled: data-dependent k, and
    additionally IVF-approximate cell boundaries). Correctness anchors:
    at k1=1 the partitioner is bit-identical to the flat path
    (tests/test_northstar.py), schema/coverage/non-vacuousness
    invariants at both probe SFs, and the auto cell-cap probe rides it
    with the same stand-down telemetry contract."""
    emb = embeddings_d(spark, sf_dir)
    n = emb.count()
    k = max(2, -(-n // SEMDEDUP_TARGET_CELL))
    cells = hier_cells(emb, k, n=n)
    return _semdedup_from_cells(
        cells, "auto", "q_semdedup_hier", cells_checkpointed=True
    )
