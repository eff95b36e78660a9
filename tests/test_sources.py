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


def _avro_available(spark) -> bool:
    try:
        spark.read.format("avro").load("/nonexistent___dvx_avro_probe")
    except Exception as e:
        # jar present -> the probe fails with PATH_NOT_FOUND instead
        return "Failed to find data source" not in str(e)
    return True


def test_avro_roundtrip_when_jar_present(spark, tmp_path):
    """The REAL avro path (reference staging format, AvroReader.scala:
    159-187): write avro, read_staging it back with lineage enrichment.
    Skipped in environments without the spark-avro jar (this sandbox);
    run off-sandbox via the README recipe:
    `pyspark --packages org.apache.spark:spark-avro_2.13:<spark version>`.
    """
    if not _avro_available(spark):
        pytest.skip("spark-avro jar not on the classpath (README recipe)")
    d = str(tmp_path / "avro_stage")
    spark.createDataFrame(
        [(1, "I", "c1", 0, "hello")],
        "seq long, op string, conv_id string, turn_idx int, text string",
    ).write.format("avro").save(d)
    df = read_staging(spark, d, fmt="avro")
    row = df.first()
    assert row["conv_id"] == "c1" and row["_source_file"].endswith(".avro")
