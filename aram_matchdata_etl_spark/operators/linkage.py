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
