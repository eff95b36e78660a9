"""Deterministic transcript changelog generation (FIXTURES.md F1/F2).

Two sources, both seed-deterministic and wall-clock-free (replays must
byte-match — SURVEY.md §7.3):

1. :func:`synthetic_changelog` — pure-Spark distributed generator
   (``spark.range`` + hash arithmetic; the analog of the reference's
   ``Random(42)`` JDBC seeder, TransactionalDataSeeder.scala:26-476, but
   expressed as column expressions so it scales to 10^10 rows with no
   driver loop). Zipf-ish hot conversations test skew handling.

2. :func:`changelog_from_testdata` — derives the changelog from the
   driver's parquet tables (orders x lineitem -> conv x turn, FIXTURES.md
   F5) via :data:`CHANGELOG_SQL`, a single SQL text valid in BOTH Spark
   SQL and DuckDB, so the driver's oracle sees the bit-identical stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dvx.schema import CHANGELOG_SCHEMA

EPOCH0 = "2024-01-01 00:00:00"

# One SQL text, two dialect-compatible engines (Spark SQL + DuckDB).
# Insert for every (order, lineitem) turn; updates on orderkey%7=0 odd
# turns; exact duplicate re-delivery (same seq) on orderkey%13=0;
# tombstone deletes on orderkey%101=0 turn 1.
CHANGELOG_SQL = """
WITH numbered AS (
  -- (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
  -- rn gives every source row a deterministic identity in both dialects
  -- (ties only between fully-identical rows, which are interchangeable)
  SELECT *, row_number() OVER (
    PARTITION BY l_orderkey, l_linenumber
    ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice,
             l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  ) AS rn
  FROM lineitem
),
base AS (
  SELECT
    o.o_orderkey * 10000 + l.l_linenumber * 100 + l.rn AS seq,
    concat('conv-', lpad(cast(o.o_orderkey AS STRING), 9, '0')) AS conv_id,
    cast(l.l_linenumber AS INT)                    AS turn_idx,
    CASE cast(l.l_linenumber % 4 AS INT)
      WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
      WHEN 2 THEN 'system' ELSE 'tool' END         AS role,
    concat_ws(' ', o.o_orderpriority, l.l_returnflag, l.l_linestatus,
              cast(l.l_partkey AS STRING), cast(l.l_suppkey AS STRING)) AS text,
    CASE WHEN l.l_partkey % 10 < 3
         THEN concat('tool-', cast(l.l_partkey % 5 AS STRING)) END AS tool,
    l.l_shipdate                                   AS ts,
    o.o_orderkey                                   AS okey
  FROM orders o JOIN numbered l ON o.o_orderkey = l.l_orderkey
),
inserts AS (
  SELECT seq, 'I' AS op, conv_id, turn_idx, role, text, tool, ts, okey FROM base
),
dups AS (
  SELECT * FROM inserts WHERE okey % 13 = 0
),
updates AS (
  SELECT 1000000000000 + seq AS seq, 'U' AS op, conv_id, turn_idx, role,
         concat(text, ' [edited]') AS text, 'editor' AS tool,
         ts + INTERVAL 1 DAY AS ts, okey
  FROM base WHERE okey % 7 = 0 AND turn_idx % 2 = 1
),
deletes AS (
  SELECT 2000000000000 + seq AS seq, 'D' AS op, conv_id, turn_idx,
         role, cast(NULL AS STRING) AS text, cast(NULL AS STRING) AS tool,
         ts + INTERVAL 2 DAY AS ts, okey
  FROM base WHERE okey % 101 = 0 AND turn_idx = 1
),
unioned AS (
  SELECT * FROM inserts
  UNION ALL SELECT * FROM dups
  UNION ALL SELECT * FROM updates
  UNION ALL SELECT * FROM deletes
)
SELECT seq, op, conv_id, turn_idx, role, text, tool, ts FROM unioned
"""


def changelog_from_testdata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog derived from the driver testdata (deterministic, F5)."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("lineitem")
    return spark.sql(CHANGELOG_SQL)


def synthetic_changelog(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    hot_convs: int = 3,
    hot_turns: int = 400,
    max_turns: int = 30,
    update_pct: int = 18,
    dup_pct: int = 2,
    delete_pct: int = 1,
    parallelism: int | None = None,
) -> DataFrame:
    """Distributed synthetic changelog.

    Every value is a pure function of (seed, conv, turn), so the output is
    identical at any parallelism level (the two-cluster-size bench runs on
    byte-identical input). ``hot_convs`` conversations get ``hot_turns``
    turns each — the skew fixture the salted merge must absorb.
    """
    h = lambda *cols: F.xxhash64(F.lit(seed), *cols)  # noqa: E731

    convs = spark.range(n_convs, numPartitions=parallelism).select(
        F.col("id").alias("conv"),
        F.when(F.col("id") < hot_convs, F.lit(hot_turns))
        .otherwise(F.pmod(h(F.col("id")), F.lit(max_turns)).cast("int") + 1)
        .alias("n_turns"),
    )
    turns = convs.select(
        "conv", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx")
    )

    base = turns.select(
        (F.col("conv") * 10000 + F.col("turn_idx")).alias("seq"),
        F.concat(F.lit("conv-"), F.lpad(F.col("conv").cast("string"), 6, "0")).alias(
            "conv_id"
        ),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
            (F.pmod(F.col("turn_idx"), F.lit(4)) + 1).cast("int"),
        ).alias("role"),
        F.concat(
            F.lit("turn "),
            F.col("turn_idx").cast("string"),
            F.lit(" of conversation "),
            F.col("conv").cast("string"),
            F.lit(" :: "),
            F.repeat(
                F.concat(F.lit("w"), F.pmod(h("conv", "turn_idx"), F.lit(97)).cast("string"), F.lit(" ")),
                (F.pmod(h("turn_idx", "conv"), F.lit(40)) + 2).cast("int"),
            ),
        ).alias("text"),
        F.when(
            F.pmod(h(F.lit("tool"), "conv", "turn_idx"), F.lit(10)) < 3,
            F.concat(F.lit("tool-"), F.pmod(h("conv"), F.lit(5)).cast("string")),
        ).alias("tool"),
        (
            F.to_timestamp(F.lit(EPOCH0))
            + F.make_interval(secs=F.col("conv") * 3600 + F.col("turn_idx") * 60)
        ).alias("ts"),
        F.col("conv"),
    )

    inserts = base.select(
        "seq", F.lit("I").alias("op"), "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    upd_sel = (F.pmod(h(F.lit("u"), "conv", "turn_idx"), F.lit(100)) < update_pct) | (
        (F.col("conv") < hot_convs)
        & (F.pmod(h(F.lit("uh"), "turn_idx"), F.lit(100)) < 60)
    )
    updates = base.filter(upd_sel).select(
        (F.lit(10**12) + F.col("seq")).alias("seq"),
        F.lit("U").alias("op"),
        "conv_id",
        "turn_idx",
        "role",
        F.concat("text", F.lit(" [edited]")).alias("text"),
        F.lit("editor").alias("tool"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts"),
    )
    dups = inserts.filter(F.pmod(h(F.lit("d"), "conv_id", "turn_idx"), F.lit(100)) < dup_pct)
    deletes = base.filter(
        F.pmod(h(F.lit("x"), "conv", "turn_idx"), F.lit(100)) < delete_pct
    ).select(
        (F.lit(2 * 10**12) + F.col("seq")).alias("seq"),
        F.lit("D").alias("op"),
        "conv_id",
        "turn_idx",
        "role",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.col("ts") + F.expr("INTERVAL 2 DAY")).alias("ts"),
    )
    out = inserts.unionByName(dups).unionByName(updates).unionByName(deletes)
    return out.select(
        *[F.col(f.name).cast(f.dataType) for f in CHANGELOG_SCHEMA.fields]
    )
