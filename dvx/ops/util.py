"""Shared helpers for the training-data operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_partitions(df: DataFrame) -> DataFrame:
    """Ensure at least ``defaultParallelism`` partitions before a
    compute-heavy per-row pipeline (shingling, regex batteries, LSH
    signature dot products).

    A small parquet input — one file under
    ``spark.sql.files.maxPartitionBytes`` — arrives as a SINGLE scan
    partition, which pins every downstream codegen expression to one
    core regardless of cluster size (guide §2.5 "input skew": one
    unsplittable input; measured: 5k docs -> 250k shingles computed on
    1 of 32 cores, 8 s where the cluster-wide cost is <1 s). The
    round-robin repartition costs one tiny shuffle of the raw rows.

    Scale-adaptive: a wide input (real corpus at cluster scale) is
    returned unchanged — this must never coalesce or add a shuffle to
    an already-parallel scan.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    n = df.rdd.getNumPartitions()
    return df.repartition(target) if n < target else df
