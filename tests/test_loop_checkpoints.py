"""loop_checkpoints (operators/dedup.py) closes the iterative-loop
checkpoint-leak class (r9 ROADMAP): 12 rolling-checkpoint loops
(pagerank/kcore/hierarchy/CC/HITS/LPA/BFS/eigen/betweenness) previously
leaked one round's localCheckpoint blocks if an exception escaped
mid-iteration. These tests pin the tracker's free discipline with a
recording stub, then exercise a real Spark loop through both exit paths.
"""

from __future__ import annotations

import pytest

from aram_matchdata_etl_spark.operators import dedup as dedup_mod
from aram_matchdata_etl_spark.operators.dedup import loop_checkpoints


@pytest.fixture
def freed(monkeypatch):
    calls: list = []
    monkeypatch.setattr(dedup_mod, "_free_checkpoint", calls.append)
    return calls


def test_normal_exit_frees_scratch_but_not_live(freed):
    with loop_checkpoints() as lc:
        lc.own("edges")
        lc.swap("round0")
        lc.swap("round1")  # supersedes round0
    # round0 freed at swap time; edges (scratch) freed at exit; round1
    # (the loop's result) must survive the with
    assert freed == ["round0", "edges"]


def test_exception_frees_live_and_scratch(freed):
    with pytest.raises(RuntimeError):
        with loop_checkpoints() as lc:
            lc.own("edges")
            lc.swap("round0")
            lc.swap("round1")
            raise RuntimeError("mid-round failure")
    assert set(freed) == {"round0", "round1", "edges"}


def test_release_live_demotes_result_to_scratch(freed):
    with loop_checkpoints() as lc:
        lc.swap("rolling")
        lc.release_live()  # caller re-materialized the result elsewhere
        assert lc.live is None
    assert freed == ["rolling"]


def test_shuffle_separated_free_is_safe(spark):
    """Pins the mechanism every rolling-checkpoint loop relies on (r10
    probe): freeing a materialized localCheckpoint while a LAZY
    checkpoint built across an EXCHANGE from it is still unmaterialized
    is safe, because AQE executes upstream shuffle stages at
    checkpoint-definition time — the old frame's data already lives in
    shuffle outputs. If a Spark upgrade stops eager exchange execution,
    every iterative loop would start dying with
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND; this test turns that into one
    obvious failure. (The converse — a NARROW lazy dependent — does
    read the old blocks directly and is NOT safe; the loops always
    interpose a join/groupBy, so that shape never occurs there.)"""
    from pyspark.sql import functions as F

    from aram_matchdata_etl_spark.operators.dedup import _free_checkpoint

    prev = (
        spark.range(2000)
        .select((F.col("id") % 97).alias("k"), F.col("id").alias("v"))
        .localCheckpoint()  # eager: materialized
    )
    # exchange between prev and new: groupBy shuffles, AQE runs the map
    # stage at definition time below
    new = (
        prev.groupBy("k")
        .agg(F.sum("v").alias("s"))
        .localCheckpoint(eager=False)  # lazy: tail not yet materialized
    )
    _free_checkpoint(prev)  # prev's blocks drop NOW
    total = new.agg(F.sum("s")).first()[0]  # must not need prev's blocks
    assert total == sum(range(2000))


def test_real_loop_survives_both_paths(spark):
    """End-to-end on real localCheckpoints: the result frame stays
    readable after a clean exit, and an exception mid-loop leaves the
    session healthy (frees ran, no dangling-read crash later)."""
    from pyspark.sql import functions as F

    with loop_checkpoints() as lc:
        base = lc.own(spark.range(100).localCheckpoint())
        state = lc.swap(base.select((F.col("id") * 2).alias("v")).localCheckpoint())
        for _ in range(3):
            new = state.select((F.col("v") + 1).alias("v")).localCheckpoint()
            state = lc.swap(new)
        result = state
    # live frame escaped intact; scratch was freed
    assert result.agg(F.sum("v")).first()[0] == sum(2 * i + 3 for i in range(100))

    with pytest.raises(ValueError):
        with loop_checkpoints() as lc:
            st = lc.swap(spark.range(10).localCheckpoint())
            st = lc.swap(st.select((F.col("id") + 1).alias("id")).localCheckpoint())
            raise ValueError("boom")
    # the session is still fully usable after the exception cleanup
    assert spark.range(5).count() == 5
