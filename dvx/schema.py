"""Canonical vault table schemas + idempotent creation.

Transcript-domain analog of the reference's RawVaultSchema /
BusinessVaultSchema DDL (RawVaultSchema.scala:41-467,
BusinessVaultSchema.scala:112-194):

- ``hub_conversation``      business-key registry for conversations
- ``hub_turn``              composite-key registry for turns (analog of
                            hub_transaction_item, RawVaultSchema.scala:192-210)
- ``link_conversation_turn`` conversation<->turn relationship
- ``sat_turn_text``         SCD2 satellite with hash-diff change detection
- ``pit_turn``              point-in-time snapshots (BusinessVaultSchema)
- ``load_metadata``         lineage/audit (RawVaultSchema.scala:443-467)

Vault tables are hash-bucketed on their merge key so CDC MERGEs prune to
touched buckets; pit_turn is value-partitioned by snapshot_date (the
reference partitions by load_date / snapshot_date). Timestamps are event-
derived, never wall clock, so replays byte-match (SURVEY.md §7.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from dvx.lake import LakeTable

RECORD_SOURCE = "transcripts.changelog"

# Changelog envelope (FIXTURES.md F2) — the engine's input contract.
CHANGELOG_SCHEMA = StructType(
    [
        StructField("seq", LongType(), False),
        StructField("op", StringType(), False),  # I / U / D
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

HUB_CONVERSATION = StructType(
    [
        StructField("conv_hash_key", StringType(), False),
        StructField("conv_id", StringType(), False),
        StructField("load_date", StringType(), False),  # derived from event ts
        StructField("record_source", StringType(), False),
    ]
)

HUB_TURN = StructType(
    [
        StructField("turn_hash_key", StringType(), False),
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("load_date", StringType(), False),
        StructField("record_source", StringType(), False),
    ]
)

LINK_CONVERSATION_TURN = StructType(
    [
        StructField("link_hash_key", StringType(), False),
        StructField("conv_hash_key", StringType(), False),
        StructField("turn_hash_key", StringType(), False),
        StructField("load_date", StringType(), False),
        StructField("record_source", StringType(), False),
    ]
)

# SCD2 satellite: exactly one valid_to IS NULL row per key; versions
# ordered by event ts (RawVaultSchema.scala:279-311, proper end-dating).
SAT_TURN_TEXT = StructType(
    [
        StructField("turn_hash_key", StringType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("hash_diff", StringType(), False),
        StructField("valid_from", TimestampType(), False),
        StructField("valid_to", TimestampType(), True),
        StructField("is_deleted", StringType(), True),  # 'Y' tombstone else NULL
        StructField("src_seq", LongType(), False),  # change seq (cross-batch LWW tie-break)
        StructField("load_date", StringType(), False),
        StructField("record_source", StringType(), False),
    ]
)

PIT_TURN = StructType(
    [
        StructField("turn_hash_key", StringType(), False),
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("snapshot_date", StringType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("valid_from", TimestampType(), True),
        StructField("valid_to", TimestampType(), True),
    ]
)

LOAD_METADATA = StructType(
    [
        StructField("load_id", LongType(), False),  # epoch id for streaming loads
        StructField("stream_id", StringType(), True),
        StructField("entity_name", StringType(), False),
        StructField("partition_id", IntegerType(), True),  # bucket / partition
        StructField("records_extracted", LongType(), True),
        StructField("records_loaded", LongType(), True),
        StructField("status", StringType(), False),  # IN_PROGRESS/COMPLETED/FAILED/SKIPPED
        StructField("load_start_ts", TimestampType(), True),
        StructField("load_end_ts", TimestampType(), True),
        StructField("error_message", StringType(), True),
    ]
)

TABLES = {
    "hub_conversation": dict(schema=HUB_CONVERSATION, bucket_cols=["conv_hash_key"]),
    "hub_turn": dict(schema=HUB_TURN, bucket_cols=["turn_hash_key"]),
    "link_conversation_turn": dict(schema=LINK_CONVERSATION_TURN, bucket_cols=["link_hash_key"]),
    # SCD2 satellite, split for merge-cost boundedness at 10^10 events:
    # - sat_turn_text       CURRENT rows only (exactly one per key, incl.
    #   tombstones) — the only satellite data COW merges ever rewrite, so
    #   per-batch write IO is O(touched keys), not O(all versions);
    # - sat_turn_text_hist  end-dated versions, append-only, never
    #   rewritten. Full history = union (Vault.sat_all()).
    "sat_turn_text": dict(schema=SAT_TURN_TEXT, bucket_cols=["turn_hash_key"]),
    "sat_turn_text_hist": dict(schema=SAT_TURN_TEXT, bucket_cols=["turn_hash_key"]),
    "pit_turn": dict(schema=PIT_TURN, partition_col="snapshot_date"),
    "load_metadata": dict(schema=LOAD_METADATA),
}


class Vault:
    """One warehouse directory holding all vault tables.

    ``num_buckets`` sizes the merge parallelism: local tests use 8-16;
    at 10^10 events use e.g. 4096 so each bucket holds ~2.5M keys.
    """

    def __init__(self, spark: SparkSession, warehouse: str, num_buckets: int = 16):
        self.spark = spark
        self.warehouse = warehouse
        self.num_buckets = num_buckets

    def path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def create_all_tables(self) -> None:
        """Idempotent CREATE-IF-NOT-EXISTS for the whole vault
        (RawVaultSchema.createAllTables pattern)."""
        for name, spec in TABLES.items():
            kwargs: dict = {}
            if "bucket_cols" in spec:
                kwargs["num_buckets"] = self.num_buckets
                kwargs["bucket_cols"] = spec["bucket_cols"]
            if "partition_col" in spec:
                kwargs["partition_col"] = spec["partition_col"]
            LakeTable.create(self.spark, self.path(name), spec["schema"], **kwargs)

    def table(self, name: str) -> LakeTable:
        return LakeTable(self.spark, self.path(name))

    def sat_all(self, buckets: list[int] | None = None):
        """Full satellite history: current ∪ archived versions."""
        cur = self.table("sat_turn_text").read(buckets=buckets)
        hist = self.table("sat_turn_text_hist").read(buckets=buckets)
        return cur.unionByName(hist)

    def __getattr__(self, name: str) -> LakeTable:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)
