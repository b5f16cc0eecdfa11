"""applyInPandasWithState: per-user crawl-budget counter semantics."""

from __future__ import annotations

import os

from aram_matchdata_etl_spark.operators.streaming_batch import (
    _force_mtime_order,
)

import pytest

from pyspark.sql import functions as F

from .conftest import SF_SMOKE

EVENTS_FILE = f"{SF_SMOKE}/events.parquet"


@pytest.fixture()
def events_dir(tmp_path):
    os.symlink(EVENTS_FILE, tmp_path / "events.parquet")
    return str(tmp_path)


def test_budget_tracker_counts_and_throttles(spark, events_dir):
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.streaming.crawl import events_stream, run_to_completion
    from aram_matchdata_etl_spark.streaming.stateful import track_budgets

    stream = events_stream(spark, events_dir, EVENTS_FILE)
    run_to_completion(
        track_budgets(stream, budget=5), query_name="budget_out", output_mode="append"
    )
    out = spark.table("budget_out")
    batch = load_table(spark, SF_SMOKE, "events")

    # one output row per input event
    assert out.count() == batch.count()
    # per user: seen_before is 0..n-1 (a strict counter)
    stats = (
        out.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.min("seen_before").alias("lo"),
            F.max("seen_before").alias("hi"),
            F.countDistinct("seen_before").alias("k"),
        )
        .agg(
            F.max(F.col("lo") != 0).alias("bad_lo"),
            F.max(F.col("hi") != F.col("n") - 1).alias("bad_hi"),
            F.max(F.col("k") != F.col("n")).alias("bad_k"),
        )
        .first()
    )
    assert not stats.bad_lo and not stats.bad_hi and not stats.bad_k
    # throttling: exactly the events past the budget are flagged
    flagged = out.filter("throttled != (seen_before >= 5)")
    assert flagged.count() == 0
    # each user contributes at most 5 unthrottled events
    over = (
        out.filter(~F.col("throttled"))
        .groupBy("user_id")
        .count()
        .filter(F.col("count") > 5)
    )
    assert over.count() == 0


def test_streaming_countmin_matches_batch_sketch(spark, tmp_path):
    """Stream==batch parity for the count-min sketch: the documents corpus
    split into 3 files (3 micro-batches under maxFilesPerTrigger=1, so
    state genuinely carries across triggers) must converge to CELL-EXACT
    equality with the batch countmin_sketch grid — sketches merge by
    addition, so trigger-at-a-time accumulation is the same operator."""
    from aram_matchdata_etl_spark.operators.streaming_batch import (
        CM_DEPTH,
        CM_WIDTH,
        countmin_sketch,
    )
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.streaming.crawl import run_to_completion
    from aram_matchdata_etl_spark.streaming.stateful import (
        CM_BLOCK_W,
        streaming_countmin,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path / "docs_stream")
    docs.repartition(3).write.parquet(src)

    words_stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(F.explode(F.split("text", " ")).alias("word"))
    )
    run_to_completion(
        streaming_countmin(words_stream), query_name="cm_out", output_mode="update"
    )
    out = spark.table("cm_out").toPandas()
    # keep each key's latest emission (version is monotone per key)
    latest = out.sort_values("version").groupby(["seed", "block"]).tail(1)

    stream_cells = {}
    for r in latest.itertuples(index=False):
        for i, c in enumerate(r.cells):
            if c:
                stream_cells[(r.seed, r.block * CM_BLOCK_W + i)] = int(c)

    words = docs.select(F.explode(F.split("text", " ")).alias("word"))
    batch_cells = {
        (r.seed, r.cell): r.c for r in countmin_sketch(words).collect()
    }
    assert stream_cells == batch_cells
    # structural sanity: every seed row present, total mass = d * n_tokens
    n_tokens = words.count()
    assert sum(stream_cells.values()) == CM_DEPTH * n_tokens
    assert {s for s, _ in stream_cells} == set(range(CM_DEPTH))
    assert all(0 <= c < CM_WIDTH for _, c in stream_cells)


def test_streaming_zscore_matches_batch(spark, tmp_path):
    """Stream==batch parity for the rolling z-score: events split into 3
    time-ordered files (3 micro-batches, so the per-user value tail
    genuinely carries across triggers) must reproduce the batch
    anomaly_zscore output — zscores within float-accumulation tolerance,
    anomaly flags identical."""
    import numpy as np

    from aram_matchdata_etl_spark.operators.events_analytics import anomaly_zscore
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.streaming.crawl import run_to_completion
    from aram_matchdata_etl_spark.streaming.stateful import streaming_zscore

    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "ev_stream")
    # time-sliced files: cross-trigger order preserves each user's event
    # order (file source processes files in discovery order)
    ev.filter(F.col("ts") < "2024-01-11").coalesce(1).write.parquet(src + "/f=0")
    ev.filter((F.col("ts") >= "2024-01-11") & (F.col("ts") < "2024-01-21")).coalesce(
        1
    ).write.parquet(src + "/f=1")
    ev.filter(F.col("ts") >= "2024-01-21").coalesce(1).write.parquet(src + "/f=2")
    # guarantee trigger order: FileStreamSource sorts by ms-granularity
    # mtime, and these two twins assume time-ordered delivery
    _force_mtime_order(src + "/f=0", src + "/f=1", src + "/f=2")

    stream = (
        spark.readStream.schema(spark.read.parquet(src + "/f=0").schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src + "/f=*")
    )
    run_to_completion(streaming_zscore(stream), query_name="zs_out", output_mode="append")
    got = spark.table("zs_out").toPandas().set_index("event_id").sort_index()
    want = anomaly_zscore(ev).toPandas().set_index("event_id").sort_index()

    assert len(got) == len(want)
    assert (got.is_anomaly == want.is_anomaly).all()
    g, w = got.zscore.to_numpy(), want.zscore.to_numpy()
    both_nan = np.isnan(g) & np.isnan(w)
    assert (both_nan == (np.isnan(g) | np.isnan(w))).all()
    assert np.nanmax(np.abs(np.where(both_nan, 0.0, g - w))) <= 2e-4


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """Stream==batch parity for the first-touch funnel: per-user stage
    anchors accumulated across 3 time-ordered micro-batches must
    aggregate to the same stage counts as the batch window cascade."""
    import numpy as np

    from aram_matchdata_etl_spark.operators.events_analytics import funnel
    from aram_matchdata_etl_spark.sources.tables import load_table
    from aram_matchdata_etl_spark.streaming.crawl import run_to_completion
    from aram_matchdata_etl_spark.streaming.stateful import streaming_funnel

    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "ev_funnel")
    ev.filter(F.col("ts") < "2024-01-11").coalesce(1).write.parquet(src + "/f=0")
    ev.filter((F.col("ts") >= "2024-01-11") & (F.col("ts") < "2024-01-21")).coalesce(
        1
    ).write.parquet(src + "/f=1")
    ev.filter(F.col("ts") >= "2024-01-21").coalesce(1).write.parquet(src + "/f=2")
    # guarantee trigger order: FileStreamSource sorts by ms-granularity
    # mtime, and these two twins assume time-ordered delivery
    _force_mtime_order(src + "/f=0", src + "/f=1", src + "/f=2")

    stream = (
        spark.readStream.schema(spark.read.parquet(src + "/f=0").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f=*")
    )
    run_to_completion(
        streaming_funnel(stream), query_name="funnel_out", output_mode="update"
    )
    out = spark.table("funnel_out").toPandas()
    # latest emission per user: anchors only ever fill in, so take the
    # row with the most non-NaN anchors (ties identical)
    out["filled"] = out[["t0", "t1", "t2"]].notna().sum(axis=1)
    latest = out.sort_values("filled").groupby("user_id").tail(1)

    stream_counts = [int(latest[c].notna().sum()) for c in ("t0", "t1", "t2")]
    want = {
        r["stage_no"]: r["n_users"] for r in funnel(ev).collect()
    }
    assert stream_counts == [want[1], want[2], want[3]]
    # anchors must be non-decreasing across stages where present
    anchored = latest.dropna(subset=["t2"])
    assert (anchored.t0 <= anchored.t1).all() and (anchored.t1 <= anchored.t2).all()
