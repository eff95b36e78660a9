"""Gold layer conformance: SCD2 dimension merge invariants + dim_date
role-playing fact (SCDType2Handler.scala:65-337 intended semantics,
DimensionalModelETL.scala:556-583)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dvx.apply import apply_batch
from dvx.changelog import synthetic_changelog
from dvx.gold import (
    build_dim_conversation,
    build_fact_turn,
    conversation_attrs,
    live_turns_asof,
    scd2_merge_dim,
    validate_scd2,
)
from dvx.schema import Vault

ATTRS = ["n_turns", "last_role", "has_tool", "total_chars"]


@pytest.fixture(scope="module")
def vault(spark, tmp_path_factory):
    """Vault replayed in two event-time batches (so an SCD2 dim build
    between them sees real attribute drift)."""
    wh = tmp_path_factory.mktemp("gold_wh")
    changelog = synthetic_changelog(spark, n_convs=40, hot_convs=2, hot_turns=60).persist()
    v = Vault(spark, str(wh / "wh"), num_buckets=4)
    v.create_all_tables()
    cut = changelog.selectExpr("percentile(cast(ts AS DOUBLE), 0.5) AS c").first()["c"]
    cut_ts = F.lit(cut).cast("double").cast("timestamp")
    apply_batch(v, changelog.filter(F.col("ts") <= cut_ts), epoch_id=0)
    apply_batch(v, changelog.filter(F.col("ts") > cut_ts), epoch_id=1)
    mid = str(changelog.filter(F.col("ts") <= cut_ts).agg(F.max("ts")).first()[0])
    changelog.unpersist()
    return v, mid


def test_scd2_two_pass_versions_and_invariants(vault):
    v, mid = vault
    dim = build_dim_conversation(
        v, [(mid, "2030-01-01 00:00:00"), ("2999-01-01 00:00:00", "2030-06-01 00:00:00")]
    ).persist()

    # invariants (validateSCDType2 analog): all violation counts zero
    assert validate_scd2(dim, "conv_id") == {
        "multi_current": 0,
        "open_history": 0,
        "inverted_interval": 0,
        "chain_overlap": 0,
        "chain_gap": 0,
    }

    # changed conversations carry exactly 2 versions; version 2 matches the
    # final live attrs
    final = conversation_attrs(live_turns_asof(v, "2999-01-01 00:00:00"))
    cur = dim.filter("is_current = 1").select("conv_id", *ATTRS)
    assert cur.exceptAll(final).count() == 0
    assert final.exceptAll(cur).count() == 0
    # at least one conversation actually changed between the passes
    assert dim.filter("is_current = 0").count() > 0
    dim.unpersist()


def test_scd2_merge_is_noop_on_unchanged_source(spark):
    src = spark.createDataFrame(
        [("c1", 2, "user", "N", 10), ("c2", 1, "assistant", "Y", 5)],
        "conv_id string, n_turns long, last_role string, has_tool string, total_chars long",
    )
    d1 = scd2_merge_dim(None, src, "conv_id", ATTRS, "2030-01-01 00:00:00")
    d2 = scd2_merge_dim(d1, src, "conv_id", ATTRS, "2030-06-01 00:00:00")
    assert d2.count() == 2
    assert d2.filter("is_current = 0").count() == 0  # nothing end-dated
    assert validate_scd2(d2, "conv_id")["multi_current"] == 0


def test_scd2_merge_end_dates_disappeared_keys(spark):
    src1 = spark.createDataFrame(
        [("c1", 2, "user", "N", 10), ("c2", 1, "assistant", "Y", 5)],
        "conv_id string, n_turns long, last_role string, has_tool string, total_chars long",
    )
    src2 = src1.filter("conv_id = 'c1'")
    d1 = scd2_merge_dim(None, src1, "conv_id", ATTRS, "2030-01-01 00:00:00")
    d2 = scd2_merge_dim(d1, src2, "conv_id", ATTRS, "2030-06-01 00:00:00")
    gone = d2.filter("conv_id = 'c2'").collect()
    assert len(gone) == 1 and gone[0]["is_current"] == 0
    assert str(gone[0]["valid_to"]) == "2030-06-01 00:00:00"


def test_scd2_disappear_then_reappear_is_gap_not_violation(spark):
    """A key absent from one load (end-dated) that reappears later is a
    legitimate chain GAP under full-source semantics — validate_scd2 must
    not count it as a violation."""
    src1 = spark.createDataFrame(
        [("c1", 2, "user", "N", 10), ("c2", 1, "assistant", "Y", 5)],
        "conv_id string, n_turns long, last_role string, has_tool string, total_chars long",
    )
    src2 = src1.filter("conv_id = 'c1'")
    d1 = scd2_merge_dim(None, src1, "conv_id", ATTRS, "2030-01-01 00:00:00")
    d2 = scd2_merge_dim(d1, src2, "conv_id", ATTRS, "2030-06-01 00:00:00")
    d3 = scd2_merge_dim(d2, src1, "conv_id", ATTRS, "2030-12-01 00:00:00")
    rep = validate_scd2(d3, "conv_id")
    # c2: end-dated 06-01, re-inserted 12-01 -> one gap, zero defects
    assert rep["chain_gap"] == 1
    assert rep["multi_current"] == 0
    assert rep["open_history"] == 0
    assert rep["inverted_interval"] == 0
    assert rep["chain_overlap"] == 0


def test_fact_turn_role_playing_dates_resolve(vault):
    v, _ = vault
    fact = build_fact_turn(v).persist()
    assert fact.filter("valid_year IS NULL OR created_year IS NULL").count() == 0
    # the two roles genuinely differ for updated turns
    assert fact.filter("valid_date_key <> created_date_key").count() > 0
    # role attributes agree with key arithmetic
    bad = fact.filter(
        (F.col("valid_year") != (F.col("valid_date_key") / 10000).cast("int"))
        | (F.col("created_year") != (F.col("created_date_key") / 10000).cast("int"))
    ).count()
    assert bad == 0
    fact.unpersist()
