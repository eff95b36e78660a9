"""Micro-profile of prepare/satellite building blocks at one parallelism.

Usage: python bench/profile_micro.py <cpus> [n_convs]

Isolates: Arrow hash UDFs, window chain, persist, parquet spill write —
so the non-scaling component of apply_batch is attributable.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 100000

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dvx.changelog import synthetic_changelog
    from dvx.hashing import hash_expr_udf, turn_key_hashes
    from dvx.session import get_spark

    spark = get_spark(
        app_name="dvx-micro", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    scratch = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    tmp = tempfile.mkdtemp(prefix="dvx_micro_", dir=scratch)
    t: dict[str, float] = {}
    try:
        cl = synthetic_changelog(spark, n_convs=n_convs)
        cdir = os.path.join(tmp, "cl")
        cl.write.mode("overwrite").parquet(cdir)
        batch = spark.read.parquet(cdir)
        n = batch.count()
        n_part = max(cpus, 8)

        def timeit(name, fn):
            t0 = time.time()
            fn()
            t[name] = round(time.time() - t0, 2)

        rep = batch.repartition(n_part, "conv_id", "turn_idx")
        timeit("repartition_count", lambda: rep.count())

        hashed = (
            rep.withColumn("_keys", turn_key_hashes("conv_id", "turn_idx"))
            .select("*", "_keys.*").drop("_keys")
            .withColumn("is_deleted", F.when(F.col("op") == "D", F.lit("Y")).cast("string"))
            .withColumn("hash_diff", hash_expr_udf("role", "text", "tool", "is_deleted"))
        )
        timeit("hash_udfs", lambda: hashed.count())

        w = Window.partitionBy("conv_id", "turn_idx").orderBy("ts", "seq")
        chained = hashed.withColumn("_pd", F.lag("hash_diff").over(w)).filter(
            F.col("_pd").isNull() | (F.col("_pd") != F.col("hash_diff"))
        ).withColumn("_next_ts", F.lead("ts").over(w)).drop("_pd")
        timeit("hash_plus_window", lambda: chained.count())

        p = chained.persist()
        timeit("persist_count", lambda: p.count())
        timeit("read_from_cache", lambda: p.count())

        spill = os.path.join(tmp, "spill")
        timeit("spill_write", lambda: p.write.mode("overwrite").parquet(spill))
        timeit("spill_read_count", lambda: spark.read.parquet(spill).count())
        p.unpersist()

        timeit(
            "write_nocache",
            lambda: chained.write.mode("overwrite").parquet(os.path.join(tmp, "s2")),
        )

        print(json.dumps({"cpus": cpus, "events": n, "stages": t}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
