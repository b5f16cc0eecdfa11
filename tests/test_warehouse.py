"""Storage-layout scale properties: partition pruning and shuffle-free
bucketed joins, asserted against the physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_partition_pruning(spark, tmp_path):
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.sources.warehouse import write_partitioned

    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["o_orderpriority"])

    filtered = spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "o_orderpriority" in plan.split("PartitionFilters")[1][:200]
    # semantics unchanged
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert filtered.count() == want


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.sources.warehouse import read_table, write_bucketed

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    write_bucketed(orders.select("o_orderkey", "o_totalprice"), "orders_b", "o_orderkey")
    write_bucketed(li, "lineitem_b", "l_orderkey")

    # the fixture tables are broadcast-size, which would bypass bucketing;
    # disable broadcast to demonstrate the co-located sort-merge join the
    # layout buys at real scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = read_table(spark, "orders_b")
        b = read_table(spark, "lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        # same answer as the unbucketed join
        plain = orders.select("o_orderkey", "o_totalprice").join(
            li, F.col("o_orderkey") == F.col("l_orderkey")
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compaction_preserves_data_and_reduces_files(spark, tmp_path):
    import os

    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.sources.warehouse import compact

    path = str(tmp_path / "many_small")
    orders = load_table(spark, SF_SMOKE, "orders")
    orders.repartition(64).write.parquet(path)  # simulate sink accretion
    before_files = sum(f.endswith(".parquet") for f in os.listdir(path))
    before = orders.count()

    n = compact(spark, path, target_file_bytes=64 * 1024 * 1024)
    after_files = sum(f.endswith(".parquet") for f in os.listdir(path))
    after_df = spark.read.parquet(path)
    assert after_df.count() == before
    assert after_files == n < before_files
    # content identical, not just counts
    assert after_df.exceptAll(orders).count() == 0


def test_compaction_of_versioned_table_is_pointer_atomic(spark, tmp_path):
    """When the path is a streaming/atomic.py versioned table, compact()
    must go through commit_version (pointer swap) — the base dir keeps a
    resolvable _CURRENT pointer at every step and the live directory is
    never renamed."""
    import os

    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.sources.warehouse import compact
    from aram_matchdata_etl_spark.streaming.atomic import (
        POINTER,
        commit_version,
        current_version_path,
        read_current,
    )

    base = str(tmp_path / "versioned")
    orders = load_table(spark, SF_SMOKE, "orders")
    commit_version(orders.repartition(64), base)
    before = orders.count()
    v_before = current_version_path(base)

    n = compact(spark, base, target_file_bytes=64 * 1024 * 1024)
    assert os.path.isfile(os.path.join(base, POINTER))
    v_after = current_version_path(base)
    assert v_after != v_before  # fresh version dir, old one pruned
    got = read_current(spark, base)
    assert got.count() == before
    files = sum(f.endswith(".parquet") for f in os.listdir(v_after))
    assert files == n < 64


def test_compact_recovery_after_crash_between_renames(spark, tmp_path):
    """Plain-directory swap crash state: path gone, .old complete.
    recover_compact (invoked by compact() on entry) must restore the
    table before proceeding."""
    import os

    from aram_matchdata_etl_spark.sources.warehouse import compact, recover_compact

    path = str(tmp_path / "plain")
    spark.range(100).write.parquet(path)
    # simulate the crash window: first rename done, second never happened
    os.rename(path, path + ".old")
    os.makedirs(path + ".compacting")

    assert recover_compact(path) is True
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(path + ".compacting")

    # and compact() itself self-recovers when entered in the crash state
    os.rename(path, path + ".old")
    compact(spark, path, target_file_bytes=1 << 30)
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(path + ".old")
