"""Invariants of the bench's 10x scale-tier builder: replication must
preserve the workload's SHAPE, not just multiply bytes — key cardinality
scales with rows, FKs stay 1:1 per replica, and replicas are NOT
near-duplicates of each other (the first-attempt word permutation
violated that and inflated LSH candidates 45,000x; SCALE.md r7)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from .conftest import SF_SMOKE

K = 3


@pytest.fixture(scope="module")
def tier_dir(spark, tmp_path_factory):
    from bench import build_scale_tier_dir

    out = str(tmp_path_factory.mktemp("tier") / "sfx")
    build_scale_tier_dir(spark, SF_SMOKE, out, k=K)
    return out


def _t(spark, d, name):
    return spark.read.parquet(os.path.join(d, f"{name}.parquet"))


def test_row_counts_and_key_cardinality_scale(spark, tier_dir):
    for name, key in (
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        src = _t(spark, SF_SMOKE, name)
        rep = _t(spark, tier_dir, name)
        assert rep.count() == K * src.count(), name
        assert (
            rep.select(key).distinct().count()
            == K * src.select(key).distinct().count()
        ), name
    # dims stay single-copy
    for name in ("nation", "region"):
        assert _t(spark, tier_dir, name).count() == _t(spark, SF_SMOKE, name).count()


def test_foreign_keys_resolve_within_replica(spark, tier_dir):
    orders = _t(spark, tier_dir, "orders")
    cust = _t(spark, tier_dir, "customer")
    li = _t(spark, tier_dir, "lineitem")
    assert (
        orders.join(
            cust, orders.o_custkey == cust.c_custkey, "left_anti"
        ).count()
        == 0
    )
    assert (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti").count()
        == 0
    )
    # fan-out unchanged: lineitem rows per order key match the source shape
    src_max = (
        _t(spark, SF_SMOKE, "lineitem")
        .groupBy("l_orderkey").count().agg(F.max("count")).first()[0]
    )
    rep_max = li.groupBy("l_orderkey").count().agg(F.max("count")).first()[0]
    assert rep_max == src_max


def test_replica_vocabularies_disjoint(spark, tier_dir):
    """Cross-replica shingle/token overlap must be ZERO for r>0 — the
    property that keeps near-dup work linear in replica count."""
    docs = _t(spark, tier_dir, "documents")
    src_ndocs = _t(spark, SF_SMOKE, "documents").count()
    words = docs.select(
        F.floor(F.col("doc_id") / src_ndocs).alias("r"),
        F.explode(F.split("text", " ")).alias("w"),
    ).distinct()
    shared = (
        words.groupBy("w")
        .agg(F.countDistinct("r").alias("nr"))
        .filter(F.col("nr") > 1)
    )
    assert shared.count() == 0


def test_embedding_replicas_not_identical(spark, tier_dir):
    emb = _t(spark, tier_dir, "embeddings")
    n = emb.count()
    assert emb.select("embedding").distinct().count() == n or (
        # source may itself contain duplicate vectors; require only that
        # distinct count scaled by K vs the source's
        emb.select("embedding").distinct().count()
        == K * _t(spark, SF_SMOKE, "embeddings").select("embedding").distinct().count()
    )
