"""LSH recall harness beyond the contract fixtures (VERDICT r4 item 6).

The contract queries (`ann_lsh`, `near_dups_lsh`) are provably
recall-1.0 on the sf0.001/sf0.01 fixtures; this harness MEASURES recall
vs brute force on deterministic synthetic corpora big enough to stress
the banding math:

- ANN: 10^5 vectors (dim 64, same shape as the embeddings table),
  recall@10 of ``lsh_ann`` across a (planes, tables) grid against
  ``brute_force_topk`` ground truth.
- Near-dup pairs: 5,000 vectors with planted near-duplicates
  (cos >= 0.92 pairs), pair recall of the banded candidate generation
  at the product path's settings vs the all-pairs oracle.

Corpus is seed-pure (numpy PCG64 with fixed seeds — no wall clock), so
every run reproduces bit-identically. Prints one JSON line; fold the
table into BENCH.md.

Usage: python bench/recall_lsh.py [n_corpus] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(spark, n: int, dim: int = 64, seed: int = 7, planted_dups: int = 0,
                dup_sources=None, noise_scale: float = 0.08):
    """Deterministic unit-ish vectors; optionally plant near-duplicates
    (a copy + small noise) as the LAST ``planted_dups`` rows. By default
    sources are random rows; ``dup_sources`` (array of row ids, length
    ``planted_dups``) plants them against chosen rows — the ANN
    experiment plants ~k neighbors per query this way."""
    import pandas as pd

    rng = np.random.Generator(np.random.PCG64(seed))
    base = rng.normal(size=(n, dim))
    if planted_dups:
        src = (
            np.asarray(dup_sources)
            if dup_sources is not None
            else rng.integers(0, n - planted_dups, size=planted_dups)
        )
        noise = rng.normal(scale=noise_scale, size=(planted_dups, dim))
        base[n - planted_dups:] = base[src] + noise
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64),
         "embedding": [row.astype(float).tolist() for row in base]}
    )
    return spark.createDataFrame(pdf)


def main() -> None:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from dvx.ops.similarity import brute_force_topk, lsh_ann
    from dvx.session import get_spark

    spark = get_spark(app_name="dvx-recall", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))

    k = 10
    # Two ANN corpora:
    # - "planted": each query row gets k noisy copies (cos ~0.9+) — the
    #   operational regime (real embedding corpora are clustered; the
    #   point of ANN is finding the genuinely-close rows). The recall
    #   floor test pins THIS number.
    # - "uniform": pure gaussian — the adversarial case where the true
    #   top-10 sit at cos ~0.45 and hyperplane-LSH collision probability
    #   (1 - theta/pi)^planes per table is the theoretical ceiling;
    #   reported to document the degradation honestly, not pinned.
    step = (n_corpus - n_queries * k) // n_queries
    qids = np.arange(n_queries, dtype=np.int64) * step
    variants = {
        "planted": make_corpus(
            spark, n_corpus, planted_dups=n_queries * k,
            dup_sources=np.repeat(qids, k),
        ),
        "uniform": make_corpus(spark, n_corpus),
    }
    ann = {}
    for label, emb in variants.items():
        emb = emb.persist()
        emb.count()
        queries = emb.join(
            spark.createDataFrame([(int(i),) for i in qids], "vec_id long"),
            "vec_id", "left_semi",
        ).persist()
        truth = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, queries, k=k).collect()
        }
        grid = []
        for planes in (8, 12, 16):
            for tables in (2, 4, 8):
                got = {
                    (r.query_id, r.neighbor_id)
                    for r in lsh_ann(
                        emb, queries, k=k, num_planes=planes, num_tables=tables
                    ).collect()
                }
                grid.append(
                    {
                        "planes": planes,
                        "tables": tables,
                        "recall_at_10": round(len(got & truth) / len(truth), 4),
                    }
                )
                print(f"# ann[{label}] planes={planes} tables={tables} "
                      f"recall={grid[-1]['recall_at_10']}", file=sys.stderr)
        ann[label] = grid
        emb.unpersist()
        queries.unpersist()

    # ---- near-dup pair recall (planted dups, threshold 0.92) ----
    n_nd, n_planted = 5000, 500
    nd = make_corpus(spark, n_nd, seed=11, planted_dups=n_planted).persist()
    nd.count()
    from dvx.ops.similarity import cosine

    a, b = nd.alias("a"), nd.alias("b")
    thr = 0.92
    brute_pairs = {
        (r.ia, r.ib)
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cos", cosine(F.col("a.embedding"), F.col("b.embedding")))
        .filter(F.col("cos") >= thr)
        .select(F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib"))
        .collect()
    }
    nd_grid = []
    for planes, tables in ((8, 4), (8, 8), (12, 8), (16, 16)):
        from dvx.ops.dedup import near_dups_lsh

        got_pairs = {
            (r.id_a, r.id_b)
            for r in near_dups_lsh(
                nd, threshold=thr, num_planes=planes, num_tables=tables
            ).collect()
        }
        nd_grid.append(
            {
                "planes": planes,
                "tables": tables,
                "true_pairs": len(brute_pairs),
                "pair_recall": round(
                    len(got_pairs & brute_pairs) / max(1, len(brute_pairs)), 4
                ),
            }
        )
        print(f"# pairs planes={planes} tables={tables} "
              f"recall={nd_grid[-1]['pair_recall']}", file=sys.stderr)

    print(json.dumps({
        "ann": {"corpus": n_corpus, "queries": n_queries, "k": k, "grids": ann},
        "near_dup_pairs": {"corpus": n_nd, "planted": n_planted,
                           "threshold": thr, "grid": nd_grid},
    }))


if __name__ == "__main__":
    main()
