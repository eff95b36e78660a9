"""Staging source reader: lineage enrichment, schema merge across file
generations, validation gate (AvroReader semantics, SURVEY.md §2.1
S1/S2/S3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dvx.schema import CHANGELOG_SCHEMA
from dvx.sources import read_staging, validate_staging


@pytest.fixture()
def staged(spark, tmp_path):
    d = str(tmp_path / "staging")
    spark.createDataFrame(
        [(1, "I", "c1", 0, "user", "hello", None, "2024-01-01 00:00:00")],
        "seq long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts")).write.parquet(d)
    return d


def test_read_staging_lineage_columns(spark, staged):
    df = read_staging(spark, staged)
    assert "_source_file" in df.columns and "_load_timestamp" in df.columns
    row = df.first()
    assert row["_source_file"].endswith(".parquet")
    assert row["_load_timestamp"] is not None
    assert row["conv_id"] == "c1"


def test_schema_merge_null_fills_old_files(spark, tmp_path):
    """Files written before an additive evolution null-fill on read
    (loyalty_tier scenario)."""
    d = str(tmp_path / "gen")
    spark.createDataFrame([("a", 1)], "conv_id string, turn_idx int").write.parquet(d)
    spark.createDataFrame(
        [("b", 2, "m-1")], "conv_id string, turn_idx int, model string"
    ).write.mode("append").parquet(d)
    df = read_staging(spark, d)
    assert "model" in df.columns
    rows = {r["conv_id"]: r["model"] for r in df.collect()}
    assert rows == {"a": None, "b": "m-1"}


def test_validation_gate(spark, staged):
    df = read_staging(spark, staged)
    # canonical satisfied, no extras
    assert validate_staging(df.drop("_source_file", "_load_timestamp"), CHANGELOG_SCHEMA) == []
    # extras are returned (warn-and-continue)
    extras = validate_staging(df.withColumn("model", F.lit("x")), CHANGELOG_SCHEMA)
    assert extras == ["model"]
    # missing required fails fast
    with pytest.raises(ValueError, match="missing required"):
        validate_staging(df.drop("conv_id"), CHANGELOG_SCHEMA)


def test_avro_gated(spark, staged):
    """fmt=avro raises the documented error when the jar is absent (or
    reads fine when someone supplied it)."""
    try:
        read_staging(spark, staged, fmt="avro")
    except RuntimeError as e:
        assert "spark-avro" in str(e)


def test_unknown_format_rejected(spark, staged):
    with pytest.raises(ValueError, match="unsupported staging format"):
        read_staging(spark, staged, fmt="xml")
