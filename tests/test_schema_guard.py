"""Loader-level schema-drift guards (VERDICT r3 items 1/7): fixtures can
silently change dtype generation-to-generation (the round-3 TIMESTAMP_NTZ
incident) — the loader must fail loudly, not three operators downstream.
"""

from __future__ import annotations

import shutil

import pytest

from .conftest import SF_SMOKE


def test_events_ts_loads_as_ltz_timestamp(spark):
    """The NTZ regression, pinned: events.ts must come back as TimestampType
    (LTZ) — TIMESTAMP_NTZ breaks unix_micros() and drifts from the
    UTC-pinned oracle semantics."""
    from pyspark.sql import types as T

    from aram_matchdata_etl_spark.sources.tables import load_table

    df = load_table(spark, SF_SMOKE, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    # and unix_micros() — the round-3 analysis failure — must resolve
    from pyspark.sql import functions as F

    df.select(F.unix_micros("ts")).limit(1).collect()


def test_ntz_inference_conf_is_pinned(spark):
    from aram_matchdata_etl_spark.sources.tables import ensure_session_confs

    ensure_session_confs(spark)
    assert spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "false"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_dtype_perturbation_trips_loader(spark, tmp_path):
    """A deliberately perturbed fixture (documents.doc_id cast to string)
    must trip the loader's dtype assert."""
    from pyspark.sql import functions as F

    from aram_matchdata_etl_spark.sources.tables import load_table

    bad_dir = tmp_path / "sf_bad"
    bad_dir.mkdir()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    docs.withColumn("doc_id", F.col("doc_id").cast("string")).write.parquet(
        str(bad_dir / "documents.parquet")
    )
    with pytest.raises(TypeError, match="schema drift"):
        load_table(spark, str(bad_dir), "documents")


def test_unperturbed_fixtures_pass_guard(spark):
    from aram_matchdata_etl_spark.sources.tables import TABLES, load_table

    for name in TABLES:
        load_table(spark, SF_SMOKE, name)
