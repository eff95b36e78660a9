"""Hash parity: pandas-UDF MD5 vs native F.md5 vs hashlib vs DuckDB.

Mirrors HashKeyGenerator semantics (SURVEY.md §2.8): NULL sentinel,
upper/trim normalization, '~' delimiter, lowercase 32-char hex.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from dvx.hashing import hash_expr, hash_expr_udf, hash_sql, normalized_concat


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("conv-1", 0, "user", "hello world", None),
        ("conv-1", 1, "assistant", "  padded  ", "search"),
        ("CONV-1", 0, "USER", "hello world", None),  # case-normalized dup of row 0
        ("conv-2", 7, None, "", "calc"),  # NULL role, empty text
        ("conv-3", 42, "tool", "unicode: héllo ✓", "exec"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


def test_native_vs_udf_bit_identical(df):
    out = df.select(
        hash_expr("conv_id", "turn_idx").alias("native"),
        hash_expr_udf("conv_id", "turn_idx").alias("udf"),
        hash_expr("role", "text", "tool").alias("native_diff"),
        hash_expr_udf("role", "text", "tool").alias("udf_diff"),
    ).collect()
    for r in out:
        assert r.native == r.udf
        assert r.native_diff == r.udf_diff
        assert len(r.native) == 32 and r.native == r.native.lower()


def test_matches_hashlib_reference(df):
    rows = df.select(
        normalized_concat("conv_id", "turn_idx").alias("norm"),
        hash_expr("conv_id", "turn_idx").alias("h"),
    ).collect()
    for r in rows:
        assert r.h == hashlib.md5(r.norm.encode("utf-8")).hexdigest()


def test_case_trim_normalization(df):
    keys = [r.h for r in df.select(hash_expr("conv_id", "turn_idx").alias("h")).collect()]
    assert keys[0] == keys[2]  # 'conv-1'/'user' == 'CONV-1'/'USER'


def test_null_vs_empty_distinct(spark):
    df2 = spark.createDataFrame([(None,), ("",)], "v string")
    a, b = [r.h for r in df2.select(hash_expr("v").alias("h")).collect()]
    assert a != b  # NULL hashes as sentinel, not as ''


def test_fused_key_udf_matches_individual_exprs(df):
    from dvx.hashing import turn_key_hashes

    got = df.select(
        turn_key_hashes("conv_id", "turn_idx").alias("k"),
        hash_expr("conv_id").alias("conv_ref"),
        hash_expr("conv_id", "turn_idx").alias("turn_ref"),
    ).collect()
    for r in got:
        assert r.k.conv_hash_key == r.conv_ref
        assert r.k.turn_hash_key == r.turn_ref
    # link hash equals md5 over the (normalized) parent hashes
    got2 = df.select(
        turn_key_hashes("conv_id", "turn_idx").alias("k")
    ).select(
        "k.link_hash_key",
        hash_expr(F.col("k.conv_hash_key"), F.col("k.turn_hash_key")).alias("ref"),
    ).collect()
    for r in got2:
        assert r.link_hash_key == r.ref


def test_duckdb_oracle_parity(df):
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    sql_h = hash_sql("conv_id", "turn_idx")
    duck = [r[0] for r in con.execute(f"select {sql_h} from t").fetchall()]
    spark_h = [r.h for r in df.select(hash_expr("conv_id", "turn_idx").alias("h")).collect()]
    assert duck == spark_h

    sql_d = hash_sql("role", "text", "tool")
    duck_d = [r[0] for r in con.execute(f"select {sql_d} from t").fetchall()]
    spark_d = [r.h for r in df.select(hash_expr("role", "text", "tool").alias("h")).collect()]
    assert duck_d == spark_d
