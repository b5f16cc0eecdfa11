"""Entity resolution / record linkage: blocked fuzzy matching on edit
distance — the classic dedup-across-sources problem (link 'cold widget'
to 'bold widget' without comparing every pair). Same candidates-then-
verify discipline as the MinHash/LSH document dedup: a cheap blocking
key bounds the candidate set, the exact metric runs only inside blocks.

Scale notes (100 TB): the all-pairs comparison is O(n^2) and never
runs. Blocking on a stable attribute (here: the last name token; in
production: phonetic key, sorted-neighborhood window, or an LSH over
character shingles) turns it into a self-equi-join whose cost is
sum(block^2) — bounded by the largest block, which the pipeline should
monitor (a degenerate blocking key is the skew story; salt or split
oversized blocks). Distinct-value pre-projection collapses the input
from |rows| to |distinct names| before any pairing happens; the
verified pairs join back to full rows by name equality afterwards —
16-byte keys, never wide rows, through the quadratic stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

MAX_EDIT_DISTANCE = 3


def fuzzy_pairs(
    names: DataFrame,
    col: str = "name",
    block_col: str = "block",
    max_dist: int = MAX_EDIT_DISTANCE,
) -> DataFrame:
    """Candidate pairs by blocked Levenshtein: ``names`` must carry the
    value column and a blocking key. Output (name_a, name_b, dist) with
    name_a < name_b, dist <= max_dist, self-pairs excluded."""
    a = names.select(
        F.col(block_col).alias("block"), F.col(col).alias("name_a")
    )
    b = names.select(
        F.col(block_col).alias("block"), F.col(col).alias("name_b")
    )
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


@query(
    "q_fuzzy_match",
    oracle=f"""
WITH names AS (
    SELECT DISTINCT p_name AS name FROM part
), blocked AS (
    SELECT name, string_split(name, ' ')[-1] AS block FROM names
)
SELECT a.name AS name_a, b.name AS name_b,
    CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
FROM blocked a JOIN blocked b USING (block)
WHERE a.name < b.name AND levenshtein(a.name, b.name) <= {MAX_EDIT_DISTANCE}""",
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-match part names: distinct-project, block on the last token
    (the product noun), exact Levenshtein only within blocks. The
    distinct projection runs BEFORE pairing — the quadratic stage sees
    |vocabulary|, not |rows|."""
    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    blocked = names.withColumn(
        "block", F.element_at(F.split(F.col("name"), " "), -1)
    )
    return fuzzy_pairs(blocked)


# --- Fellegi-Sunter probabilistic linkage fit by EM -------------------------

FS_ROUNDS = 5
FS_INIT = (0.1, 0.8, 0.2)  # (p_match, m_i, u_i) starting values
FS_CLAMP = (0.001, 0.999)

_FS_PATTERNS_SQL = """
    SELECT CAST(levenshtein(a.name, b.name) <= 2 AS INTEGER) AS a1,
        CAST(levenshtein(a.name, b.name) <= 4 AS INTEGER) AS a2,
        CAST(LEN(string_split(a.name, ' ')[1])
            = LEN(string_split(b.name, ' ')[1]) AS INTEGER) AS a3,
        CAST(COUNT(*) AS BIGINT) AS c
    FROM blocked a JOIN blocked b USING (block)
    WHERE a.name < b.name
    GROUP BY 1, 2, 3
"""


def _fs_lik(pfx: str, which: str) -> str:
    """Pattern likelihood under the match (m) or unmatch (u) parameters
    of CTE `pfx`: prod_i theta_i^a_i (1-theta_i)^(1-a_i)."""
    terms = []
    for i in (1, 2, 3):
        t = f"{pfx}.{which}{i}"
        terms.append(f"(CASE WHEN a{i} = 1 THEN {t} ELSE 1 - {t} END)")
    return " * ".join(terms)


def _fs_oracle() -> str:
    lo, hi = FS_CLAMP
    p0, m0, u0 = FS_INIT
    parts = [
        """names AS (SELECT DISTINCT p_name AS name FROM part),
blocked AS (
    SELECT name, string_split(name, ' ')[-1] AS block FROM names
)""",
        f"patterns AS ({_FS_PATTERNS_SQL})",
        f"fs0 AS (SELECT {p0!r} AS p, {m0!r} AS m1, {m0!r} AS m2,"
        f" {m0!r} AS m3, {u0!r} AS u1, {u0!r} AS u2, {u0!r} AS u3)",
    ]
    prev = "fs0"
    for k in range(1, FS_ROUNDS + 1):
        parts.append(
            f"""g{k} AS (
    SELECT a1, a2, a3, c,
        {prev}.p * {_fs_lik(prev, 'm')}
        / ({prev}.p * {_fs_lik(prev, 'm')}
           + (1 - {prev}.p) * {_fs_lik(prev, 'u')}) AS g
    FROM patterns CROSS JOIN {prev})"""
        )
        mcols = []
        for i in (1, 2, 3):
            mcols.append(
                f"GREATEST(LEAST(SUM(g * c * a{i}) / SUM(g * c),"
                f" {hi!r}), {lo!r}) AS m{i}"
            )
            mcols.append(
                f"GREATEST(LEAST(SUM((1 - g) * c * a{i}) / SUM((1 - g) * c),"
                f" {hi!r}), {lo!r}) AS u{i}"
            )
        parts.append(
            f"""fs{k} AS (
    SELECT GREATEST(LEAST(SUM(g * c) / SUM(c), {hi!r}), {lo!r}) AS p,
        {", ".join(mcols)}
    FROM g{k})"""
        )
        prev = f"fs{k}"
    fin = f"g{FS_ROUNDS + 1}"
    parts.append(
        f"""{fin} AS (
    SELECT a1, a2, a3, c,
        {prev}.p * {_fs_lik(prev, 'm')}
        / ({prev}.p * {_fs_lik(prev, 'm')}
           + (1 - {prev}.p) * {_fs_lik(prev, 'u')}) AS g
    FROM patterns CROSS JOIN {prev})"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT param, ROUND(value, 6) AS value FROM (
    SELECT 'p_match' AS param, p AS value FROM {prev}
    UNION ALL SELECT 'm1', m1 FROM {prev}
    UNION ALL SELECT 'm2', m2 FROM {prev}
    UNION ALL SELECT 'm3', m3 FROM {prev}
    UNION ALL SELECT 'u1', u1 FROM {prev}
    UNION ALL SELECT 'u2', u2 FROM {prev}
    UNION ALL SELECT 'u3', u3 FROM {prev}
    UNION ALL SELECT 'g_' || CAST(a1 AS VARCHAR) || CAST(a2 AS VARCHAR)
        || CAST(a3 AS VARCHAR), g FROM {fin}
    UNION ALL SELECT 'n_' || CAST(a1 AS VARCHAR) || CAST(a2 AS VARCHAR)
        || CAST(a3 AS VARCHAR), CAST(c AS DOUBLE) FROM {fin}
)"""
    )


@query("q_linkage_em", oracle=_fs_oracle())
def q_linkage_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage fit by EM: within-
    block candidate pairs of part names compared on three binary
    agreement fields (edit distance <= 2, edit distance <= 4, equal
    first-token length — tiered string-similarity comparators), EM
    over the AGREEMENT-PATTERN ROLLUP — at most 2^3 rows
    regardless of corpus size, so after one rollup pass the entire EM
    is engine-mirrored scalar arithmetic (the q_elastic_net discipline
    applied to the classic ER model, Fellegi & Sunter 1969 / Winkler).
    Output: match prevalence, per-field m/u probabilities, and each
    pattern's posterior match probability + count (the decision table a
    production linker thresholds on).

    Scale: blocking bounds the pair stage (sum of block^2, monitored),
    the rollup is 8 rows, and {FS_ROUNDS} EM rounds never touch the
    corpus again."""
    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    blocked = names.withColumn(
        "block", F.element_at(F.split("name", " "), -1)
    )
    a = blocked.select("block", F.col("name").alias("name_a"))
    b = blocked.select("block", F.col("name").alias("name_b"))
    patterns = (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            (F.levenshtein("name_a", "name_b") <= 2).cast("int").alias("a1"),
            (F.levenshtein("name_a", "name_b") <= 4).cast("int").alias("a2"),
            (
                F.length(F.split("name_a", " ").getItem(0))
                == F.length(F.split("name_b", " ").getItem(0))
            )
            .cast("int")
            .alias("a3"),
        )
        .groupBy("a1", "a2", "a3")
        .agg(F.count("*").cast("bigint").alias("c"))
        .collect()
    )
    lo, hi = FS_CLAMP
    p, m0, u0 = FS_INIT
    m = {1: m0, 2: m0, 3: m0}
    u = {1: u0, 2: u0, 3: u0}

    def lik(row, theta):
        out = 1.0
        for i, ai in enumerate((row.a1, row.a2, row.a3), 1):
            out *= theta[i] if ai == 1 else (1 - theta[i])
        return out

    def clamp(x):
        return max(min(x, hi), lo)

    def posteriors():
        return {
            (r.a1, r.a2, r.a3): (
                r.c,
                p * lik(r, m) / (p * lik(r, m) + (1 - p) * lik(r, u)),
            )
            for r in patterns
        }

    for _ in range(FS_ROUNDS):
        gs = posteriors()
        tot = sum(c for c, _ in gs.values())
        sg = sum(c * g for c, g in gs.values())
        p = clamp(sg / tot)
        for i in (1, 2, 3):
            num_m = sum(
                c * g * key[i - 1] for key, (c, g) in gs.items()
            )
            num_u = sum(
                c * (1 - g) * key[i - 1] for key, (c, g) in gs.items()
            )
            den_u = sum(c * (1 - g) for c, g in gs.values())
            m[i] = clamp(num_m / sg)
            u[i] = clamp(num_u / den_u)
    gs = posteriors()
    rows = [
        ("p_match", p),
        ("m1", m[1]),
        ("m2", m[2]),
        ("m3", m[3]),
        ("u1", u[1]),
        ("u2", u[2]),
        ("u3", u[3]),
    ]
    for (a1, a2, a3), (c, g) in gs.items():
        rows.append((f"g_{a1}{a2}{a3}", g))
        rows.append((f"n_{a1}{a2}{a3}", float(c)))
    out = spark.createDataFrame(rows, "param string, value double")
    return out.select("param", F.round("value", 6).alias("value"))
