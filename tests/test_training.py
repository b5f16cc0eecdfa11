"""Unit tests for the training-data prep operators that the sf fixtures
can't exercise (all fixture docs are >= 8 tokens, so the short-document
edge of the contamination scan is invisible to the oracle gate)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def tiny_docs_dir(spark, tmp_path):
    """A documents table with docs shorter than the 8-token n-gram window,
    one exactly at it, and an eval/train pair sharing a gram."""
    rows = [
        # eval doc (src0) with >= 8 tokens
        (0, "a b c d e f g h i j", "en", "src0", 19),
        # train doc sharing the 8-gram "a b c d e f g h"
        (1, "z a b c d e f g h", "en", "web", 17),
        # short train docs: 1 and 7 tokens -> must emit no grams, not crash
        (2, "tiny", "en", "web", 4),
        (3, "one two three four five six seven", "en", "web", 33),
        # exactly 8 tokens -> one gram, no overlap with eval
        (4, "p q r s t u v w", "en", "web", 15),
        # short EVAL doc too
        (5, "short eval", "en", "src1", 10),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path / "docs"
    df.coalesce(1).write.parquet(str(out / "documents.parquet"))
    return str(out)


def test_contamination_handles_short_docs(spark, tiny_docs_dir):
    """Docs with fewer than 8 tokens must contribute zero grams (sequence(1,0)
    would otherwise produce [1, 0] and slice(_, 0, 8) raises at runtime)."""
    from aram_matchdata_etl_spark.registry import all_queries

    out = all_queries()["q_contamination"](spark, tiny_docs_dir).collect()
    hits = {(r["train_doc"], r["eval_doc"]): r["shared_grams"] for r in out}
    assert hits == {(1, 0): 1}


def test_contamination_short_docs_match_duckdb_oracle(spark, tiny_docs_dir):
    """The same tiny fixture through the registered DuckDB oracle — the
    engines must agree on the short-doc edge, not just not-crash."""
    import duckdb

    from aram_matchdata_etl_spark.registry import all_oracles, all_queries

    spark_rows = {
        tuple(r)
        for r in all_queries()["q_contamination"](spark, tiny_docs_dir)
        .select("train_doc", "eval_doc", "shared_grams")
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{tiny_docs_dir}/documents.parquet/*.parquet'"
    )
    oracle_rows = {
        tuple(r)
        for r in con.execute(all_oracles()["q_contamination"]).fetchall()
    }
    assert spark_rows == oracle_rows


def test_dsir_weights_rank_target_domain_higher(spark):
    """DSIR semantics (Xie et al. 2023): documents FROM the target domain
    must, on average, get higher importance weights than the rest of the
    raw corpus — both in total and per token (the per-token form removes
    the doc-length confound). A broken sign, a swapped numerator, or a
    smoothing bug flips or collapses this separation."""
    from pyspark.sql import functions as F

    from aram_matchdata_etl_spark.operators.training import DSIR_TARGET_SOURCE
    from aram_matchdata_etl_spark.registry import all_queries

    from .conftest import SF_ORACLE

    w = all_queries()["q_dsir_weights"](spark, SF_ORACLE)
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "source"
    )
    rows = (
        w.join(docs, "doc_id")
        .groupBy((F.col("source") == DSIR_TARGET_SOURCE).alias("is_target"))
        .agg(
            F.avg("log_weight").alias("mean_lw"),
            F.avg(F.col("log_weight") / F.col("n_tokens")).alias("mean_lw_tok"),
        )
        .collect()
    )
    by = {r.is_target: r for r in rows}
    assert by[True].mean_lw > by[False].mean_lw
    assert by[True].mean_lw_tok > by[False].mean_lw_tok


def test_perplexity_buckets_terciles_balanced_per_lang(spark):
    """CCNet cut: within every language the head/middle/tail buckets must
    differ in size by at most 1 (NTILE semantics), and every scored doc
    keeps iff its bucket is not tail."""
    from pyspark.sql import functions as F

    from aram_matchdata_etl_spark.registry import all_queries

    from .conftest import SF_ORACLE

    df = all_queries()["q_perplexity_buckets"](spark, SF_ORACLE)
    sizes = (
        df.filter(F.col("bucket") != "unscored")
        .groupBy("lang", "bucket")
        .count()
        .groupBy("lang")
        .agg((F.max("count") - F.min("count")).alias("spread"))
        .collect()
    )
    assert sizes and all(r.spread <= 1 for r in sizes), sizes
    bad = df.filter(
        (F.col("bucket").isin("head", "middle")) != F.col("keep")
    ).count()
    assert bad == 0


def test_dsir_resample_biases_toward_high_weights(spark):
    """Gumbel top-k semantics: the resampled set must be biased toward
    high-importance docs (mean log_weight of the sample > corpus mean)
    but NOT identical to the deterministic top-k by weight — the noise
    term must actually perturb the draw, else it's just a head cut."""
    from pyspark.sql import functions as F

    from aram_matchdata_etl_spark.operators.training import DSIR_SAMPLE_K
    from aram_matchdata_etl_spark.registry import all_queries

    from .conftest import SF_ORACLE

    sample = all_queries()["q_dsir_resample"](spark, SF_ORACLE)
    weights = all_queries()["q_dsir_weights"](spark, SF_ORACLE).filter(
        F.col("log_weight").isNotNull()
    )
    assert sample.count() == DSIR_SAMPLE_K
    mean_sample = sample.agg(F.avg("log_weight")).first()[0]
    mean_all = weights.agg(F.avg("log_weight")).first()[0]
    assert mean_sample > mean_all
    top_by_weight = {
        r.doc_id
        for r in weights.orderBy(F.desc("log_weight"), "doc_id")
        .limit(DSIR_SAMPLE_K)
        .collect()
    }
    sampled = {r.doc_id for r in sample.collect()}
    overlap = len(sampled & top_by_weight)
    assert 0 < overlap < DSIR_SAMPLE_K, overlap


def test_perplexity_approx_agrees_with_exact_buckets(spark):
    """The skew-immune approx-cutoff filter must agree with the exact
    per-lang NTILE buckets on >= 90% of scored docs; disagreements are
    only ever one bucket apart (a doc sitting next to a cutoff), never
    head<->tail."""
    from pyspark.sql import functions as F

    from aram_matchdata_etl_spark.registry import all_queries

    from .conftest import SF_ORACLE

    exact = (
        all_queries()["q_perplexity_buckets"](spark, SF_ORACLE)
        .filter(F.col("bucket") != "unscored")
        .select("doc_id", F.col("bucket").alias("b_exact"))
    )
    approx = (
        all_queries()["q_perplexity_filter_approx"](spark, SF_ORACLE)
        .filter(F.col("bucket") != "unscored")
        .select("doc_id", F.col("bucket").alias("b_approx"))
    )
    j = exact.join(approx, "doc_id")
    n = j.count()
    assert n > 0
    agree = j.filter(F.col("b_exact") == F.col("b_approx")).count()
    assert agree / n >= 0.9, f"{agree}/{n}"
    rank = F.when(F.col("b_exact") == "head", 0).when(
        F.col("b_exact") == "middle", 1
    ).otherwise(2)
    rank_a = F.when(F.col("b_approx") == "head", 0).when(
        F.col("b_approx") == "middle", 1
    ).otherwise(2)
    assert j.filter(F.abs(rank - rank_a) > 1).count() == 0


def test_perplexity_zipf_pathology_and_spread(spark):
    """The Zipf twin's reason to exist: (a) real score SPREAD (the
    31-word fixture collapses scores toward tie-breaks; the Zipf corpus
    must not), and (b) the documented perplexity-gate pathology —
    templated/stuffed text is maximally predictable under a
    corpus-trained LM, so it outscores natural text COMPLETELY (every
    stuffed doc above every natural doc), which is why the gate is
    paired with the Gopher repetition filters."""
    from aram_matchdata_etl_spark.registry import all_queries

    from .conftest import SF_ORACLE

    rows = all_queries()["q_perplexity_zipf"](spark, SF_ORACLE).collect()
    by_lang = {}
    for r in rows:
        assert r.bucket in ("head", "middle", "tail", "unscored")
        if r.avg_logp is not None:
            by_lang.setdefault(r.lang, []).append(r.avg_logp)
    assert set(by_lang) == {"rep", "stuff", "nat"}
    # (a) non-degenerate spread within the natural class
    nat = by_lang["nat"]
    assert max(nat) - min(nat) > 0.1
    # (b) complete separation: predictability loves the stuffed template
    assert min(by_lang["stuff"]) > max(nat)
    # suffix-copy repetition is milder but still more predictable on avg
    assert sum(by_lang["rep"]) / len(by_lang["rep"]) > sum(nat) / len(nat)
    # terciles are balanced per language (NTILE contract)
    from collections import Counter

    c = Counter((r.lang, r.bucket) for r in rows if r.bucket != "unscored")
    for lang, n in (("nat", 300), ("rep", 150), ("stuff", 50)):
        sizes = sorted(c[(lang, b)] for b in ("head", "middle", "tail"))
        assert sum(sizes) == n and sizes[-1] - sizes[0] <= 1, (lang, sizes)


def test_perplexity_zipf_margin_floor():
    """q_perplexity_zipf's hash oracle hinges on NTILE over
    round(avg_logp, 6) with avg_logp computed by DIFFERENTLY-ORDERED
    float summations in Spark vs DuckDB (the r8 margin-floor discipline;
    ADVICE r11 flagged this key as the one Zipf gate without it). Two
    floors, asserted on the UNROUNDED per-doc averages:

    (a) every score sits > 1e-10 from the nearest 0.5e-6 rounding
        boundary, so both engines round it to the SAME 6-dp value even
        under ~n*eps cross-engine summation noise (~1e-13 here);
    (b) within each lang, adjacent unrounded scores are either exactly
        equal (the tie falls to the integer-exact doc_id break) or
        differ by > 1e-10, so the NTILE order cannot flip.

    sf0.01 only: the Zipf corpus is a pure function of doc_id and the
    sf0.001 fixture has the identical 500 doc_ids (same corpus); sf0.1
    is covered by the parity sweep + order probe per the ROADMAP
    checklist."""
    import math

    from aram_matchdata_etl_spark.operators.text import _gopher_zipf_words_sql
    from aram_matchdata_etl_spark.operators.training import (
        _ZIPF_LANG_SQL,
        _bigram_scored_ctes,
    )

    from .conftest import SF_ORACLE
    from .oracle_utils import duckdb_df

    rounded = "ROUND(AVG(LN((c_bg + 1.0) / (c_prefix + v))), 6)"
    raw_ctes = _bigram_scored_ctes("zd").replace(
        rounded, "AVG(LN((c_bg + 1.0) / (c_prefix + v)))"
    )
    assert rounded not in raw_ctes and "AVG(LN((c_bg" in raw_ctes
    sql = f"""WITH {_gopher_zipf_words_sql().strip()},
zd AS MATERIALIZED (
    SELECT doc_id, array_to_string(words, ' ') AS text,
        {_ZIPF_LANG_SQL} AS lang
    FROM zdocs
),
{raw_ctes}
SELECT d.doc_id, d.lang, s.avg_logp
FROM zd d JOIN scored s USING (doc_id)"""
    pdf = duckdb_df(sql, SF_ORACLE)
    assert len(pdf) == 500  # every 120-word doc scores

    BOUNDARY_MARGIN = 1e-10
    for x in pdf["avg_logp"]:
        scaled = x * 1e6
        dist = abs(scaled - math.floor(scaled) - 0.5) * 1e-6
        assert dist > BOUNDARY_MARGIN, (x, dist)

    GAP_MARGIN = 1e-10
    for _, grp in pdf.groupby("lang"):
        vals = sorted(grp["avg_logp"])
        for a, b in zip(vals, vals[1:]):
            gap = b - a
            assert gap == 0.0 or gap > GAP_MARGIN, (a, b, gap)
