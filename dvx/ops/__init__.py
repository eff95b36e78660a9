"""Large-scale training-data pipeline operators (beyond the reference).

- ``dvx.ops.textstats``   language-ID, quality scoring, token counting,
                          document fingerprinting.
- ``dvx.ops.dedup``       exact, MinHash+LSH, SimHash, n-gram Jaccard,
                          embedding-cosine near-duplicate detection.
- ``dvx.ops.similarity``  brute-force + LSH-bucketed ANN over embeddings.
- ``dvx.ops.multimodal``  binary-column decode/feature plumbing (stubbed
                          codecs, real Spark schema/partitioning/UDFs).

All deterministic, all expressed with built-in column functions or
Arrow-vectorized pandas UDFs (never per-row Python), all with DuckDB
oracle equivalents where SQL can express the semantics.
"""
