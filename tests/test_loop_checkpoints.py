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
