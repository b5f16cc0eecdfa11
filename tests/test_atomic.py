"""Versioned atomic commit (streaming/atomic.py): a crash at any point
leaves exactly one complete readable version, and commits never delete
the version they read from until the new one is fully swapped in."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from aram_matchdata_etl_spark.streaming.atomic import (
    POINTER,
    commit_version,
    current_version_path,
    read_current,
)


def test_read_before_first_commit_is_none(spark, tmp_path):
    assert read_current(spark, str(tmp_path / "nowhere")) is None


@pytest.mark.slow
def test_commit_then_read_roundtrip(spark, tmp_path):
    base = str(tmp_path / "tbl")
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    commit_version(df, base)
    got = read_current(spark, base)
    assert got.count() == 10
    assert {r.x for r in got.collect()} == {i * 2 for i in range(10)}


@pytest.mark.slow
def test_half_written_version_is_invisible_and_pruned(spark, tmp_path):
    """Simulate a crash AFTER writing a new version dir but BEFORE the
    pointer swap: readers still see the old version; the orphan dir is
    pruned by the next successful commit."""
    base = str(tmp_path / "tbl")
    commit_version(spark.range(5), base)
    good = current_version_path(base)

    orphan = os.path.join(base, "v-deadbeef0000")
    spark.range(999).write.parquet(orphan)  # crashed commit: no swap

    assert current_version_path(base) == good
    assert read_current(spark, base).count() == 5

    commit_version(spark.range(7), base)
    assert read_current(spark, base).count() == 7
    assert not os.path.isdir(orphan)
    assert not os.path.isdir(good)


def test_merge_plan_may_read_previous_version(spark, tmp_path):
    """The self-merge pattern the sinks use: the committed plan reads the
    current version while writing the next one."""
    base = str(tmp_path / "tbl")
    commit_version(spark.range(3).withColumn("v", F.lit(1)), base)
    for gen in (2, 3):
        prev = read_current(spark, base)
        merged = prev.unionByName(spark.range(3).withColumn("v", F.lit(gen)))
        commit_version(merged, base)
    final = read_current(spark, base)
    assert final.count() == 9
    assert {r.v for r in final.collect()} == {1, 2, 3}
    # exactly one version dir + pointer remains
    versions = [n for n in os.listdir(base) if n.startswith("v-")]
    assert len(versions) == 1
    assert os.path.isfile(os.path.join(base, POINTER))


def test_time_travel_retention(spark, tmp_path):
    """keep_versions retains snapshots for time travel; older ones are
    pruned; the pointer always names the newest."""
    from aram_matchdata_etl_spark.streaming.atomic import (
        commit_version,
        list_versions,
        read_current,
        read_version,
    )

    base = str(tmp_path / "tt")
    for i in range(3):
        df = spark.range(i + 1).withColumnRenamed("id", "x")
        commit_version(df, base, keep_versions=2)

    assert len(list_versions(base)) == 2
    assert read_current(spark, base).count() == 3
    assert read_version(spark, base, 0).count() == 3
    assert read_version(spark, base, 1).count() == 2
    assert read_version(spark, base, 2) is None  # pruned by retention


@pytest.mark.slow
def test_merge_upsert_dispatch_and_semantics(spark, tmp_path):
    """lakehouse.merge_upsert: in this image (no delta package) it must
    take the versioned-parquet fallback, with last-writer-wins semantics
    identical to the Delta MERGE body."""
    from aram_matchdata_etl_spark.streaming.lakehouse import (
        delta_available,
        merge_upsert,
    )
    from aram_matchdata_etl_spark.streaming.atomic import read_current

    base = str(tmp_path / "mu")
    b1 = spark.createDataFrame(
        [("m1", 1, "a"), ("m2", 1, "b")], "match_id string, ts int, payload string"
    )
    engine = merge_upsert(b1, base, ["match_id"], order_cols=("ts",))
    assert engine == ("delta" if delta_available(spark) else "versioned")
    # second batch updates m1 (newer ts) and inserts m3
    b2 = spark.createDataFrame(
        [("m1", 2, "a2"), ("m3", 1, "c")], "match_id string, ts int, payload string"
    )
    merge_upsert(b2, base, ["match_id"], order_cols=("ts",))
    got = {
        (r.match_id, r.ts, r.payload) for r in read_current(spark, base).collect()
    }
    assert got == {("m1", 2, "a2"), ("m2", 1, "b"), ("m3", 1, "c")}


def test_merge_upsert_intra_batch_dupes_and_stale_replay(spark, tmp_path):
    """A batch carrying several rows for one key keeps only the newest, and
    replaying an OLDER batch after a newer one landed is a no-op — the two
    idempotency properties the Delta MERGE body needs (source pre-dedup +
    gated whenMatchedUpdate) and the fallback must share."""
    from aram_matchdata_etl_spark.streaming.atomic import read_current
    from aram_matchdata_etl_spark.streaming.lakehouse import merge_upsert

    base = str(tmp_path / "mu2")
    dup_batch = spark.createDataFrame(
        [("m1", 1, "old"), ("m1", 3, "new"), ("m1", 2, "mid")],
        "match_id string, ts int, payload string",
    )
    merge_upsert(dup_batch, base, ["match_id"], order_cols=("ts",))
    assert [
        (r.match_id, r.ts, r.payload) for r in read_current(spark, base).collect()
    ] == [("m1", 3, "new")]

    stale = spark.createDataFrame(
        [("m1", 2, "stale-replay")], "match_id string, ts int, payload string"
    )
    merge_upsert(stale, base, ["match_id"], order_cols=("ts",))
    assert [
        (r.match_id, r.ts, r.payload) for r in read_current(spark, base).collect()
    ] == [("m1", 3, "new")]


def test_source_wins_condition_is_lexicographic():
    """The MERGE update gate must be the lexicographic 's at least as new as
    t' predicate over order_cols — checked by brute-force evaluation over
    all orderings of a two-column key."""
    import duckdb

    from aram_matchdata_etl_spark.streaming.lakehouse import source_wins_condition

    cond = source_wins_condition(("ts", "event_id"))
    con = duckdb.connect()
    for s_ts, s_ev, t_ts, t_ev in (
        (2, 0, 1, 9),  # s newer on ts -> wins
        (1, 9, 2, 0),  # s older on ts -> loses
        (1, 5, 1, 4),  # ts tie, s newer on event_id -> wins
        (1, 4, 1, 5),  # ts tie, s older on event_id -> loses
        (1, 4, 1, 4),  # identical -> wins (idempotent rewrite)
    ):
        expected = (s_ts, s_ev) >= (t_ts, t_ev)
        got = con.execute(
            f"SELECT {cond} FROM (SELECT ? AS ts, ? AS event_id) s, "
            "(SELECT ? AS ts, ? AS event_id) t",
            [s_ts, s_ev, t_ts, t_ev],
        ).fetchone()[0]
        assert got == expected, (s_ts, s_ev, t_ts, t_ev)


# NOTE (r10, closing the perpetual-skip item): the Delta MERGE body
# itself is environment-out-of-scope — delta-spark's package + jars are
# not in this image and installs are not permitted, so a
# pytest.importorskip placeholder sat here skipped every round. What IS
# testable without the jars is fully covered above and in
# test_merge_upsert_*: the dispatch takes the versioned-parquet fallback,
# the MERGE's whenMatchedUpdate gate (source_wins_condition) is
# truth-tabled through DuckDB, and the fallback shares the exact
# last-writer-wins / idempotent-replay semantics the Delta arm encodes.
# Where delta-spark exists, delta_available() flips merge_upsert to the
# transactional arm with no caller change (streaming/lakehouse.py).
