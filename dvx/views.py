"""Semantic view layer — the reference's SemanticModel analog
(SemanticModel.scala:107-555; SURVEY.md §3.3): logical views over the
vault that BI queries hit; Catalyst expands them and pushes predicates
into the lake scans.

Views are registered as Spark temp views from lake-table reads. At 10^10
scale the expensive ones (conversation_360) are served from the PIT/
bridge pre-joins instead of re-deriving (the reference's 5-20x PIT
rationale, BusinessVaultSchema.scala:365-396).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dvx.schema import Vault


def create_all_views(vault: Vault) -> list[str]:
    """CREATE OR REPLACE VIEW v_* over the vault tables."""
    spark = vault.spark

    sat = vault.sat_all()
    hub_t = vault.hub_turn.read()
    hub_c = vault.hub_conversation.read()

    current = (
        sat.filter(F.col("valid_to").isNull() & F.col("is_deleted").isNull())
        .join(hub_t.select("turn_hash_key", "conv_id", "turn_idx"), "turn_hash_key")
    )
    current.createOrReplaceTempView("v_current_turns")

    (
        current.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.countDistinct("role").alias("n_roles"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias("n_tool_turns"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .createOrReplaceTempView("v_conversation_summary")
    )

    (
        current.filter(F.col("tool").isNotNull())
        .groupBy("tool")
        .agg(
            F.count("*").alias("n_turns"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
        .createOrReplaceTempView("v_tool_usage")
    )

    (
        sat.groupBy("turn_hash_key")
        .agg(
            F.count("*").alias("n_versions"),
            F.date_format(F.min("valid_from"), "yyyy-MM-dd").alias("first_seen"),
            F.date_format(F.max("valid_from"), "yyyy-MM-dd").alias("last_changed"),
        )
        .join(hub_t.select("turn_hash_key", "conv_id", "turn_idx"), "turn_hash_key")
        .createOrReplaceTempView("v_turn_churn")
    )

    # conversation_360: the reference's headline PIT-rationale view
    # (BusinessVaultSchema.scala:365-396, SemanticModel.scala:138-218) —
    # served from the MATERIALIZED bridge table when it has been
    # refreshed (dvx.pit.refresh_bridge), so a BI hit pays one
    # pre-joined, conversation-colocated scan + one agg instead of the
    # 3-way join per query (the claimed 5-20× win). Falls back to the
    # derived bridge frame when the table was never refreshed; serving
    # freshness follows the refresh cadence, like the reference's.
    from dvx.lake import LakeTable

    bridge_tbl = vault.table("bridge_conversation_turn")
    materialized = LakeTable.exists(bridge_tbl.root) and bool(
        bridge_tbl.snapshot()["files"] or bridge_tbl.snapshot().get("deltas")
    )
    if materialized:
        bridge = bridge_tbl.read()
    else:
        from dvx.pit import build_bridge

        bridge = build_bridge(vault)

    (
        bridge
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.countDistinct("role").alias("n_roles"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias("n_tool_turns"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
            F.max_by("role", "turn_idx").alias("last_role"),
            F.max("turn_idx").alias("max_turn_idx"),
        )
        .createOrReplaceTempView("v_conversation_360")
    )

    # monthly activity trend (SemanticModel.scala:219-284 analog): current
    # state bucketed by valid_from calendar month
    (
        current.groupBy(
            F.year("valid_from").alias("year"), F.month("valid_from").alias("month")
        )
        .agg(
            F.count("*").alias("n_turns"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0)).alias("n_tool_turns"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
        )
        .createOrReplaceTempView("v_monthly_activity")
    )

    # top-k serving view WITH an ORDER BY (O3/O4: the reference's display
    # views carry sorts, SemanticModel.scala ORDER BY clauses)
    (
        current.filter(F.col("tool").isNotNull())
        .groupBy("tool")
        .agg(F.count("*").alias("n_turns"))
        .orderBy(F.col("n_turns").desc(), F.col("tool"))
        .limit(5)
        .createOrReplaceTempView("v_top_tools")
    )

    hub_c.createOrReplaceTempView("v_hub_conversation")
    return [
        "v_current_turns",
        "v_conversation_summary",
        "v_tool_usage",
        "v_turn_churn",
        "v_conversation_360",
        "v_monthly_activity",
        "v_top_tools",
        "v_hub_conversation",
    ]
