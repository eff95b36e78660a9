"""dvx.lake — a minimal snapshot-based ACID table format over Parquet.

The reference stores its vault in Iceberg and leans on four Iceberg
capabilities (SURVEY.md §2.1, §2.9): atomic snapshot commits with a
metadata pointer, row-level MERGE, partition pruning, and snapshot
maintenance (time travel / rollback / expiry / compaction —
/root/reference/src/main/scala/bronze/utils/IcebergWriter.scala:34-39,
248-263, 295-376, 396-426). The Iceberg Spark runtime jar is not
available in this environment, so this module re-implements exactly that
contract in pure PySpark + a JSON transaction log:

Layout::

    <root>/_log/v0000000001.json      one manifest per snapshot
    <root>/data/c0000000002/_p=<k>/*.parquet   data files of commit 2

A snapshot manifest carries the table schema, a summary (including the
per-stream max committed epoch — the exactly-once handshake used by
dvx.stream), and the file map ``{partition_key: [relative file paths]}``
in one of two forms:

- a **checkpoint** manifest embeds the full map (``"files"``), written
  every ``_CHECKPOINT_EVERY`` commits and at create/rollback/evolution;
- a **delta** manifest records only the touched keys (``"files_set"`` /
  ``"files_drop"`` against its immediate predecessor), so commit
  metadata is O(touched partitions), not O(total files) — the same
  shape as Iceberg's per-snapshot manifest lists / Delta's JSON actions
  + periodic checkpoints. Readers resolve a delta by walking back to
  the nearest checkpoint (≤ ``_CHECKPOINT_EVERY`` hops, memoized in
  ``_SNAP_CACHE``; manifests are immutable so the cache is safe).

The *latest* snapshot is simply the max version in ``_log``; commits are
atomic via ``os.link`` (fails if the target version already exists →
optimistic-concurrency retry), mirroring Iceberg's atomic
metadata-pointer swap which is likewise driver-side.

Object-store note (what changes off POSIX): ``os.link`` atomicity maps
to a conditional PUT (S3 ``If-None-Match: *``, GCS ``ifGenerationMatch=
0``) or a commit mutex in a transactional KV (the Delta/S3 LogStore and
Iceberg catalog-pointer patterns); directory listings are already never
used for data (explicit file lists from the manifest), and ``_versions``
becomes a prefix listing of ``_log/`` — bounded by ``expire_snapshots``,
which also rewrites the oldest retained delta as a checkpoint so expired
bases can be dropped.

Scale design
------------
- Tables are hash-bucketed on their merge key (``bucket =
  pmod(xxhash64(key), B)``). A MERGE only reads + rewrites the buckets
  the source batch touches (copy-on-write), so merge cost is
  O(touched data), not O(table) — the same file-level pruning Iceberg's
  ``bucket(N, key)`` hidden partitioning gives the reference
  (RawVaultSchema.scala:124). At 10^10 rows you raise ``num_buckets``
  (e.g. 4096) so each bucket stays ~executor-memory sized.
- File pruning happens in *metadata* (the manifest), so a point lookup
  or a merge never lists directories or scans untouched buckets.
- Commits are metadata-only; carried-over buckets are never rewritten.
- Tables may combine a value partition WITH hash buckets (Iceberg's
  ``PARTITIONED BY (days(ts), bucket(N, key))`` composite): the manifest
  key is ``"<partition>|<bucket>"`` and reads/replacements prune on
  either half. This is what lets the incremental PIT maintain one
  snapshot-date partition with O(touched buckets) write IO instead of
  rewriting the whole date per micro-batch.
- Bucketed tables additionally support **merge-on-read upserts**
  (``upsert_delta`` — the Iceberg format-v2 row-level-delta analog):
  per-bucket delta files whose rows replace same-key base rows at read
  time, last-wins by commit version; ``compact_deltas`` folds them back.
  This turns per-batch upsert write IO from O(touched buckets) into
  O(changed rows), the lever that matters when every micro-batch touches
  every bucket (uniformly hashed keys at 10^10 rows).
- The physical partition value is duplicated into a regular data column
  before write, so explicit-file-list reads keep it without relying on
  directory-name inference.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_PHYS = "_p"  # physical layout column (dropped from data files by partitionBy)
BUCKET_COL = "_bucket"

#: a full ("checkpoint") manifest is written every N commits; the others
#: are deltas against their immediate predecessor
_CHECKPOINT_EVERY = 16

#: resolved-manifest memo, keyed (table_root, version). Manifests are
#: immutable once committed, so entries never go stale.
_SNAP_CACHE: dict[tuple[str, int], dict] = {}

__all__ = ["LakeTable", "BUCKET_COL", "CommitConflict"]


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic CC)."""


def _is_composite(m: dict) -> bool:
    """Composite layout: value partition + hash buckets (manifest keys
    are ``"<partition>|<bucket>"``)."""
    return m["num_buckets"] is not None and bool(m.get("partition_col"))


def _part_of(k: str) -> str:
    return k.split("|", 1)[0]


def _bucket_of(k: str, composite: bool) -> str:
    return k.split("|", 1)[1] if composite else k


def _log_dir(root: str) -> str:
    return os.path.join(root, "_log")


class LakeTable:
    """Handle to one lake table. Cheap to construct; all state is on disk."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ------------------------------------------------------------------ DDL

    @staticmethod
    def exists(root: str) -> bool:
        d = _log_dir(root)
        return os.path.isdir(d) and any(f.startswith("v") for f in os.listdir(d))

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: StructType,
        *,
        num_buckets: int | None = None,
        bucket_cols: list[str] | None = None,
        partition_col: str | None = None,
        properties: dict | None = None,
        if_not_exists: bool = True,
    ) -> "LakeTable":
        """Idempotent CREATE TABLE (reference: CREATE TABLE IF NOT EXISTS ...
        USING iceberg PARTITIONED BY (...), RawVaultSchema.scala:116-131)."""
        if cls.exists(root):
            if if_not_exists:
                return cls(spark, root)
            raise FileExistsError(root)
        if (num_buckets is None) != (bucket_cols is None):
            raise ValueError("num_buckets and bucket_cols go together")
        if (properties or {}).get("key_bloom") and (
            bucket_cols is None or len(bucket_cols) != 1
        ):
            raise ValueError("key_bloom requires exactly one bucket column")
        if (properties or {}).get("key_bloom") and partition_col:
            # composite "<partition>|<bucket>" manifest keys would defeat
            # the bloom scan's plain-bucket key arithmetic (dvx.apply
            # _bloom_scan int(k) / k.isdigit()), silently classifying
            # data-bearing buckets as empty — duplicate inserts
            raise ValueError(
                "key_bloom is not supported on composite "
                "(partition_col + bucketed) layouts"
            )
        os.makedirs(_log_dir(root), exist_ok=True)
        t = cls(spark, root)
        t._commit(
            expected_version=0,
            manifest={
                "operation": "create",
                "schema": json.loads(schema.json()),
                "num_buckets": num_buckets,
                "bucket_cols": bucket_cols,
                "partition_col": partition_col,
                "properties": properties or {},
                "files": {},
                "summary": {"epochs": {}},
            },
        )
        return t

    # ------------------------------------------------------------- snapshots

    def _versions(self) -> list[int]:
        d = _log_dir(self.root)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[1:-5]) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json")
        )

    def version(self) -> int:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no such lake table: {self.root}")
        return vs[-1]

    def _read_manifest(self, v: int) -> dict:
        with open(os.path.join(_log_dir(self.root), f"v{v:010d}.json")) as f:
            return json.load(f)

    def snapshot(self, version: int | None = None) -> dict:
        """Resolved manifest at ``version`` (latest if None) — Iceberg time
        travel ``VERSION AS OF`` analog (IcebergWriter.scala:248-250).
        Delta manifests are folded onto their base checkpoint; the result
        always carries the full ``files`` map."""
        v = self.version() if version is None else version
        key = (self.root, v)
        cached = _SNAP_CACHE.get(key)
        if cached is not None:
            return cached
        m = self._read_manifest(v)
        if "files" not in m:  # delta: fold onto predecessor
            base = self.snapshot(m["delta_base"])
            files = dict(base["files"])
            for k in m.get("files_drop", []):
                files.pop(k, None)
            files.update(m.get("files_set", {}))
            deltas = dict(base.get("deltas", {}))
            for k in m.get("deltas_drop", []):
                deltas.pop(k, None)
            deltas.update(m.get("deltas_set", {}))
            blooms = dict(base.get("blooms", {}))
            for k in m.get("blooms_drop", []):
                blooms.pop(k, None)
            blooms.update(m.get("blooms_set", {}))
            tombs = dict(base.get("tombstones", {}))
            for k in m.get("tombstones_drop", []):
                tombs.pop(k, None)
            tombs.update(m.get("tombstones_set", {}))
            m = {
                k: val for k, val in m.items()
                if k not in ("files_set", "files_drop", "deltas_set",
                             "deltas_drop", "blooms_set", "blooms_drop",
                             "tombstones_set", "tombstones_drop",
                             "delta_base")
            }
            m["files"] = files
            m["deltas"] = deltas
            m["blooms"] = blooms
            m["tombstones"] = tombs
        m.setdefault("deltas", {})
        m.setdefault("blooms", {})
        m.setdefault("tombstones", {})
        if len(_SNAP_CACHE) > 512:
            _SNAP_CACHE.clear()
        _SNAP_CACHE[key] = m
        return m

    def history(self) -> list[dict]:
        """All snapshot summaries, oldest first (``table.snapshots`` analog,
        IcebergWriter.scala:252-263)."""
        out = []
        for v in self._versions():
            m = self.snapshot(v)
            out.append(
                {
                    "version": v,
                    "operation": m["operation"],
                    "committed_at": m.get("committed_at"),
                    "summary": m.get("summary", {}),
                }
            )
        return out

    def schema(self, version: int | None = None) -> StructType:
        return StructType.fromJson(self.snapshot(version)["schema"])

    # --------------------------------------------------------------- commit

    def _commit(self, expected_version: int, manifest: dict) -> int:
        next_v = expected_version + 1
        manifest = dict(manifest)
        manifest["version"] = next_v
        manifest["committed_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        d = _log_dir(self.root)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
        final = os.path.join(d, f"v{next_v:010d}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # atomic, fails with EEXIST on conflict
        except FileExistsError as e:
            raise CommitConflict(f"version {next_v} already committed") from e
        finally:
            os.unlink(tmp)
        return next_v

    def _drop_attempt(self, commit_rel: str) -> None:
        """Remove a losing write attempt's data directory (its files are
        referenced by no manifest; the retry rewrites fresh ones)."""
        import shutil

        shutil.rmtree(os.path.join(self.root, commit_rel), ignore_errors=True)

    # ---------------------------------------------------------------- reads

    def read(
        self,
        version: int | None = None,
        *,
        buckets: list[int] | None = None,
        partitions: list[str] | None = None,
        columns: list[str] | None = None,
        keys: list[str] | None = None,
        key_filter: DataFrame | None = None,
    ) -> DataFrame:
        """Read the table at a snapshot, with manifest-level file pruning.

        ``buckets``/``partitions`` restrict to those partition keys without
        touching any other file (metadata pruning — no directory listing);
        on composite tables they match the bucket / partition HALF of the
        ``"<partition>|<bucket>"`` key. ``keys`` matches manifest keys
        verbatim (the maintenance surface).
        Schema is imposed explicitly so files written before an additive
        column evolution null-fill the new columns (AvroReader.scala:283-313
        schema-merge semantics).

        ``columns`` prunes the read schema to those columns (order
        preserved; bucket cols are always included on bucketed tables so
        the merge-on-read agg can key on them). This matters on the MOR
        path: the last-wins merge agg then runs over the pruned struct —
        a consumer that needs only the key/version columns never pays the
        merge over ``text``.

        ``key_filter`` (bucketed tables): a frame whose ``bucket_cols``
        columns name the keys the caller wants — rows for other keys are
        dropped by a semi-join BELOW the merge-on-read agg. Per-key
        last-wins semantics are preserved (filtering by key keeps every
        candidate row of a surviving key), but the agg — the expensive
        part, a hash aggregate over the buckets' full contents including
        wide columns — shrinks from O(touched buckets' rows) to O(kept
        keys' rows). This is what keeps the per-micro-batch satellite
        apply O(batch), not O(table): the batch's key set is a vanishing
        fraction of a grown table's buckets.

        Buckets carrying equality-delete TOMBSTONES
        (:meth:`delete_keys_insert`) resolve them at read time: a data
        row is dropped when its commit version is older than the newest
        tombstone covering its key. Only tombstone-carrying buckets pay
        the (narrow, hashed) resolution join;
        :meth:`compact_tombstones` folds them away.
        """
        m = self.snapshot(version)
        if key_filter is not None and not m["bucket_cols"]:
            raise ValueError("key_filter requires a bucketed table")
        schema = StructType.fromJson(m["schema"])
        if columns is not None:
            want = set(columns) | set(m["bucket_cols"] or [])
            schema = StructType([f for f in schema.fields if f.name in want])
        delta_map = m.get("deltas", {})
        tomb_map = m.get("tombstones", {})
        live = set(m["files"].keys()) | set(delta_map.keys())
        composite = _is_composite(m)
        if buckets is not None:
            want = {str(b) for b in buckets}
            live = {k for k in live if _bucket_of(k, composite) in want}
        if partitions is not None:
            want = set(map(str, partitions))
            live = {k for k in live if (_part_of(k) if composite else k) in want}
        if keys is not None:
            want = set(map(str, keys))
            live = {k for k in live if k in want}
        keys = live
        plain_keys = [
            k for k in keys if not delta_map.get(k) and not tomb_map.get(k)
        ]
        tomb_keys = sorted(
            k for k in keys if tomb_map.get(k) and not delta_map.get(k)
        )
        mor_keys = sorted(k for k in keys if delta_map.get(k))
        plain_files = [
            os.path.join(self.root, p)
            for k in plain_keys
            for p in m["files"].get(k, [])
        ]
        tomb_data_files = [
            os.path.join(self.root, p)
            for k in tomb_keys
            for p in m["files"].get(k, [])
        ]
        mor_files = [
            os.path.join(self.root, p)
            for k in mor_keys
            for p in [*m["files"].get(k, []), *delta_map[k]]
        ]
        if not plain_files and not tomb_data_files and not mor_files:
            return self.spark.createDataFrame([], schema)

        key_cols = m["bucket_cols"]

        def _keep(df: DataFrame) -> DataFrame:
            if key_filter is None:
                return df
            kf = key_filter.select(*key_cols).distinct()
            # shuffle_hash on the key side: hashing a narrow key set
            # never sort-merge-sorts the wide table rows, and AQE still
            # converts to broadcast at runtime when the key set is
            # actually small (a forced broadcast would make the driver
            # build an O(batch-keys) relation every micro-batch — a
            # fixed, non-scaling cost and an OOM hazard at big batches).
            return df.join(kf.hint("shuffle_hash"), key_cols, "left_semi")

        def _cv(df: DataFrame) -> DataFrame:
            # project the commit version out of the file path: it is
            # non-deterministic, so it must live in a Project directly
            # above its OWN scan — below any join/aggregate
            return df.withColumn(
                "_cv",
                F.regexp_extract(
                    F.input_file_name(), r"data/c(\d+)[-/]", 1
                ).cast("long"),
            )

        def _untomb(df: DataFrame, klist: list[str]) -> DataFrame:
            """Equality-delete resolution: drop rows whose key has a
            NEWER tombstone than the row's commit (rows written in the
            tombstone's own commit survive). ``df`` must carry _cv; the
            tombstone commit version is a stored column (_tcv), not a
            path derivation — two input_file_name sources in one plan
            are ambiguous."""
            from pyspark.sql.types import LongType, StructField

            tpaths = [
                os.path.join(self.root, p)
                for k in klist
                for p in tomb_map.get(k, [])
            ]
            tschema = StructType(
                [f for f in StructType.fromJson(m["schema"]).fields
                 if f.name in key_cols]
                + [StructField("_tcv", LongType())]
            )
            t = (
                self.spark.read.schema(tschema).parquet(*tpaths)
                .groupBy(*key_cols)
                .agg(F.max("_tcv").alias("_tcv"))
            )
            j = df.join(t.hint("shuffle_hash"), key_cols, "left")
            return j.filter(
                F.col("_tcv").isNull() | (F.col("_cv") >= F.col("_tcv"))
            ).drop("_tcv")

        parts: list[DataFrame] = []
        if plain_files:
            parts.append(_keep(self.spark.read.schema(schema).parquet(*plain_files)))
        if tomb_data_files:
            df = _keep(_cv(self.spark.read.schema(schema).parquet(*tomb_data_files)))
            parts.append(_untomb(df, tomb_keys).drop("_cv"))
        if mor_files:
            # merge-on-read (only the delta-carrying buckets pay it):
            # delta files hold last-wins upserts keyed on the bucket cols
            # (at most one row per key per delta commit — the
            # upsert_delta caller contract). The winning row per key is
            # the one from the highest commit, recovered from the file
            # path (data/c<version>/...). Ties (same commit) break on the
            # full row struct, so the merge is deterministic. This
            # per-key agg is the read-side price of O(new rows) write IO
            # per batch; compact_deltas() folds deltas back into the
            # base to bound the number of files it spans.
            raw = self.spark.read.schema(schema).parquet(*mor_files)
            cols = raw.columns
            df = _keep(_cv(raw))
            mor_tombed = [k for k in mor_keys if tomb_map.get(k)]
            if mor_tombed:
                df = _untomb(df, mor_tombed)
            ordered = F.struct(F.col("_cv"), *[F.col(c) for c in cols])
            merged = (
                df.groupBy(*[F.col(c) for c in key_cols])
                .agg(F.max(ordered).alias("_m"))
                .select(*[F.col(f"_m.{c}").alias(c) for c in cols])
            )
            parts.append(merged)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # --------------------------------------------------------------- writes

    def _bucket_expr(self, num_buckets: int, bucket_cols: list[str]):
        return F.pmod(F.xxhash64(*[F.col(c) for c in bucket_cols]), F.lit(num_buckets)).cast(
            "int"
        )

    def with_bucket(self, df: DataFrame) -> DataFrame:
        m = self.snapshot()
        if m["num_buckets"] is None:
            raise ValueError("table is not bucketed")
        if BUCKET_COL in df.columns:
            return df
        return df.withColumn(BUCKET_COL, self._bucket_expr(m["num_buckets"], m["bucket_cols"]))

    def _write_files(
        self, df: DataFrame, manifest: dict, next_v: int, salts: int = 1,
        wide: bool = False,
    ) -> dict[str, list[str]]:
        """Write df physically split by partition key; return
        ``({key: [relpaths]}, commit_rel)``.

        Files land in a commit dir UNIQUE PER ATTEMPT
        (``data/c<version>-<uuid>/``): two writers racing for the same
        version must not share a directory, or the loser's
        ``mode("overwrite")`` write would delete the winner's
        already-committed files before the loser's manifest commit even
        fails (found by test_concurrent_writers_occ). The losing
        attempt's directory is removed by the caller's CommitConflict
        retry; a crash in the window leaves an orphan dir that no
        manifest references (harmless, reclaimed by a vacuum).

        Write distribution (what Iceberg's bucket-partitioned write
        distribution does):

        - bucketed tables: cluster by bucket so each commit adds ONE file
          per touched bucket (read cost stays O(buckets), not O(commits x
          tasks)); 4x partition headroom so two bucket keys rarely hash to
          the same writer task and idle the rest. At scale num_buckets is
          sized so a bucket's rewrite (~100-500 MB) is one healthy task.
        - partition_col / unpartitioned tables with ``salts > 1``: a
          deterministic row-hash salt spreads each partition value over up
          to ``salts`` writer tasks. Without this, a commit touching one
          partition value (every PIT single-date overwrite, every
          unpartitioned full overwrite) funnels the entire dataset through
          ONE task — the round-1 pit_build anti-scaling (4.7s -> 30.4s
          with MORE cores). Callers pass salts=1 for small appends (one
          file) and salts=defaultParallelism for big overwrites.
        """
        commit_rel = os.path.join("data", f"c{next_v:010d}-{uuid.uuid4().hex[:8]}")
        commit_dir = os.path.join(self.root, commit_rel)
        if manifest["num_buckets"] is not None:
            if BUCKET_COL not in df.columns:
                df = df.withColumn(
                    BUCKET_COL, self._bucket_expr(manifest["num_buckets"], manifest["bucket_cols"])
                )
            phys = F.col(BUCKET_COL).cast("string")
            if manifest.get("partition_col"):
                # composite layout: "<partition>|<bucket>" ('|' is not in
                # Spark's partition-path escape set, so the directory name
                # round-trips verbatim)
                phys = F.concat(
                    F.col(manifest["partition_col"]).cast("string"), F.lit("|"), phys
                )
            df = df.withColumn(_PHYS, phys)
            if salts > 1:
                # spread each bucket over `salts` writer tasks: hash
                # collisions in the bucket->task assignment otherwise idle
                # writers while doubling others (measured 3.4s -> 2.2s for
                # a full-table rewrite at local[16]); costs `salts` files
                # per touched bucket per commit — compact() merges them
                wsalt = F.pmod(
                    F.xxhash64(*[F.col(c) for c in df.columns if c != _PHYS]),
                    F.lit(salts),
                )
                df = df.repartition(
                    4 * manifest["num_buckets"], F.col(_PHYS), wsalt.alias("_w_salt")
                )
            else:
                # wide (big rewrites): 4x partition headroom so two bucket
                # keys rarely hash to the same writer task and idle the
                # rest. Narrow (small appends — hubs/links/history/deltas,
                # several per micro-batch): exactly num_buckets partitions;
                # the 4x flood is mostly empty tasks whose scheduling cost
                # is pure per-batch overhead, and a hash collision on a
                # small write is harmless.
                factor = 4 if wide else 1
                df = df.repartition(factor * manifest["num_buckets"], F.col(_PHYS))
        else:
            if manifest["partition_col"]:
                df = df.withColumn(_PHYS, F.col(manifest["partition_col"]).cast("string"))
            else:
                df = df.withColumn(_PHYS, F.lit(""))
            n_write = max(2, self.spark.sparkContext.defaultParallelism)
            if salts > 1:
                salt = F.pmod(
                    F.xxhash64(*[F.col(c) for c in df.columns if c != _PHYS]),
                    F.lit(salts),
                )
                df = df.repartition(2 * n_write, F.col(_PHYS), salt.alias("_w_salt"))
            else:
                # non-salted (small appends — lineage rows, status rows):
                # hash-partitioning on _PHYS collapses each partition
                # value into ONE task regardless of the partition count,
                # so defaultParallelism partitions here are just
                # (defaultParallelism - #values) EMPTY tasks of pure
                # scheduling overhead per batch. Two suffice; large
                # rewrites come through the salted branch above.
                df = df.repartition(2, F.col(_PHYS))
        df.write.mode("overwrite").partitionBy(_PHYS).parquet(commit_dir)

        out: dict[str, list[str]] = {}
        for entry in sorted(os.listdir(commit_dir)):
            if not entry.startswith(f"{_PHYS}="):
                continue
            key = entry.split("=", 1)[1]
            pdir = os.path.join(commit_dir, entry)
            rels = [
                os.path.join(commit_rel, entry, fn)
                for fn in sorted(os.listdir(pdir))
                if fn.endswith(".parquet")
            ]
            if rels:
                out[key] = rels
        return out, commit_rel

    def _schema_aligned(self, df: DataFrame, manifest: dict) -> DataFrame:
        """Project df onto the table schema (order + types), erroring on
        missing required columns — the schema-validation gate
        (AvroReader.scala:212-261)."""
        schema = StructType.fromJson(manifest["schema"])
        missing = [f.name for f in schema.fields if f.name not in df.columns]
        if missing:
            raise ValueError(f"batch is missing required columns {missing}")
        keep_bucket = manifest["num_buckets"] is not None and BUCKET_COL in df.columns
        cols = [F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        if keep_bucket and BUCKET_COL not in [f.name for f in schema.fields]:
            cols.append(F.col(BUCKET_COL))
        return df.select(*cols)

    # --------------------------------------------------------- key blooms

    def bloom_enabled(self) -> bool:
        """True when this table maintains per-bucket key bloom segments
        (table property ``key_bloom``, set for hubs/links — append-only
        key tables whose insert is an existence proof)."""
        m = self.snapshot()
        return (
            bool(m.get("properties", {}).get("key_bloom"))
            and m["num_buckets"] is not None
            # composite layouts are rejected at create(); belt-and-braces
            # for pre-guard tables: their "<part>|<bucket>" keys would
            # break the bloom scan's plain-bucket arithmetic
            and not m.get("partition_col")
        )

    def bloom_paths(self, version: int | None = None) -> dict[int, list[str]]:
        """{bucket: [absolute segment paths]} for buckets with COMPLETE
        bloom coverage at a snapshot. A bucket absent here (invalidated
        or never bloomed) must be read the plain way."""
        m = self.snapshot(version)
        return {
            int(k): [os.path.join(self.root, p) for p in ps]
            for k, ps in m.get("blooms", {}).items()
        }

    def _segments_from_written(self, new_files: dict, m: dict) -> dict[str, bytes]:
        """Fallback bloom build for direct append() callers: read the
        just-written files' key column driver-side (pyarrow — the files
        are new-keys-only, so this is O(new keys)) and build one segment
        per manifest key. The hot path (dvx.apply) passes precomputed
        segments from its prune scan instead."""
        import pyarrow.parquet as pq

        from dvx import bloom

        key_col = m["bucket_cols"][0]
        # cap: the fallback reads key values driver-side — O(new keys)
        # driver memory and serial pyarrow reads on the commit path. A
        # big direct append (initial seed / backfill) skips the build for
        # oversized buckets (parquet footer row counts only — no data
        # read), leaving them uncovered = safe plain-read fallback.
        max_rows = int(os.environ.get("DVX_BLOOM_FALLBACK_MAX_ROWS", "2000000"))
        out = {}
        for k, ps in new_files.items():
            paths = [os.path.join(self.root, p) for p in ps]
            n_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
            if n_rows > max_rows:
                continue  # bucket stays uncovered; readers fall back
            vals: list = []
            for p in paths:
                vals.extend(pq.read_table(p, columns=[key_col]).column(0).to_pylist())
            out[k] = bloom.build(vals)
        return out

    def append(
        self,
        df: DataFrame,
        summary: dict | None = None,
        bloom_segments: dict[str, bytes] | None = None,
    ) -> int:
        """Append-only insert (Iceberg append sink, IcebergWriter.scala:86-121).

        Refuses to append a row whose key has a PENDING MOR delta: the
        appended base file would carry a HIGHER commit version than the
        delta, so the read-time last-wins merge would silently prefer it
        over the older ``upsert_delta`` row — an ordering surprise no
        caller should get implicitly. Fold first (:meth:`compact_deltas`
        with ``max_delta_files=1``) or use :meth:`upsert_delta`.
        Distinct-key appends alongside pending deltas are safe (the
        merge is per key) and allowed; the overlap check only costs a
        job when deltas are actually pending — never on the hub/link/
        history append hot path."""
        while True:
            v = self.version()
            m = self.snapshot(v)
            dpaths = [
                os.path.join(self.root, p)
                for ps in m.get("deltas", {}).values()
                for p in ps
            ]
            if dpaths:
                key_cols = m["bucket_cols"]
                kschema = StructType(
                    [f for f in StructType.fromJson(m["schema"]).fields
                     if f.name in key_cols]
                )
                dkeys = self.spark.read.schema(kschema).parquet(*dpaths)
                clash = (
                    df.select(*key_cols)
                    .join(dkeys, key_cols, "left_semi")
                    .limit(1)
                    .count()
                )
                if clash:
                    raise ValueError(
                        f"append() on {self.root}: a row's key has a pending "
                        "MOR delta file, and the appended base would win the "
                        "last-wins merge over it; run compact_deltas("
                        "max_delta_files=1) first or use upsert_delta()"
                    )
            new_files, commit_rel = self._write_files(
                self._schema_aligned(df, m), m, v + 1
            )
            bloom_add = None
            if (
                m.get("properties", {}).get("key_bloom")
                and m["num_buckets"] is not None
                and new_files
                # DVX_KEY_BLOOM=0 turns blooms off wholesale (A/B lever):
                # appending without segments drops the touched buckets'
                # coverage in _commit_next, so readers safely fall back
                and os.environ.get("DVX_KEY_BLOOM", "1") != "0"
            ):
                segs = bloom_segments or self._segments_from_written(new_files, m)
                bloom_add = {}
                for k in new_files:
                    if k in segs:
                        rel = os.path.join(commit_rel, f"_bloom_{k}.bin")
                        with open(os.path.join(self.root, rel), "wb") as bf:
                            bf.write(segs[k])
                        bloom_add[k] = rel
            files = {k: list(ps) for k, ps in m["files"].items()}
            for k, ps in new_files.items():
                files.setdefault(k, []).extend(ps)
            try:
                return self._commit_next(
                    m, v, "append", files, new_files, summary, bloom_add=bloom_add
                )
            except CommitConflict:
                self._drop_attempt(commit_rel)
                continue

    def append_rows(self, rows: list[dict], summary: dict | None = None) -> int:
        """Driver-side tiny append: write ``rows`` as ONE parquet file via
        pyarrow and commit — no Spark job at all.

        The lineage/status path appends O(touched buckets) ~100-byte rows
        per micro-batch; routing that through a Spark write costs a full
        job (plan + schedule + task launch — measured ~0.5 s/batch at 16
        cores, pure per-batch fixed floor). Metadata-sized appends are
        driver work, the same way Delta/Iceberg write commit-log actions
        driver-side. Restricted to unbucketed, unpartitioned tables
        (load_metadata); data tables keep the distributed path."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql import types as T

        _ARROW = {
            T.LongType: pa.int64(),
            T.IntegerType: pa.int32(),
            T.StringType: pa.string(),
            T.DoubleType: pa.float64(),
            T.BooleanType: pa.bool_(),
            T.DateType: pa.date32(),
            # session tz is UTC (dvx.session); naive datetimes here are
            # UTC by the metadata._now() contract
            T.TimestampType: pa.timestamp("us", tz="UTC"),
        }
        while True:
            v = self.version()
            m = self.snapshot(v)
            if m["num_buckets"] is not None or m["partition_col"]:
                raise ValueError(
                    "append_rows is the driver-side path for unbucketed, "
                    "unpartitioned metadata tables; use append()"
                )
            schema = StructType.fromJson(m["schema"])
            fields = []
            for f in schema.fields:
                at = _ARROW.get(type(f.dataType))
                if at is None:
                    raise TypeError(
                        f"append_rows: no arrow mapping for {f.dataType}"
                    )
                fields.append(pa.field(f.name, at, nullable=True))
            tbl = pa.Table.from_pydict(
                {f.name: [r.get(f.name) for r in rows] for f in schema.fields},
                schema=pa.schema(fields),
            )
            # same physical layout as the Spark writer (`_p=` hive dir with
            # the empty-value sentinel) so compaction and readers treat
            # both kinds of file identically
            key = "__HIVE_DEFAULT_PARTITION__"
            commit_rel = os.path.join("data", f"c{v + 1:010d}-{uuid.uuid4().hex[:8]}")
            pdir = os.path.join(self.root, commit_rel, f"{_PHYS}={key}")
            os.makedirs(pdir, exist_ok=True)
            rel = os.path.join(
                commit_rel, f"{_PHYS}={key}", f"part-00000-{uuid.uuid4().hex}.parquet"
            )
            pq.write_table(tbl, os.path.join(self.root, rel), compression="snappy")
            files = {k: list(ps) for k, ps in m["files"].items()}
            files.setdefault(key, []).append(rel)
            try:
                return self._commit_next(m, v, "append", files, {key: [rel]}, summary)
            except CommitConflict:
                self._drop_attempt(commit_rel)
                continue

    def overwrite_partitions(self, df: DataFrame, summary: dict | None = None) -> int:
        """Dynamic partition overwrite — replace only the partition values
        present in df (IcebergWriter.scala:209-231; used by bridge refresh
        and SCD1 dims)."""
        while True:
            v = self.version()
            m = self.snapshot(v)
            par = self.spark.sparkContext.defaultParallelism
            if _is_composite(m):
                # the (partition x bucket) key space already spreads the
                # write across ~num_buckets tasks per partition value;
                # full-parallelism salting here multiplied FILES per key
                # ~salts-fold (measured: full 7-date PIT build emitted
                # buckets x ~26 files/date at 32 cores — the round-4
                # pit_build 4.6 -> 7.8 s regression). Salt only up to the
                # headroom the buckets don't cover.
                salts = max(1, -(-par // m["num_buckets"]))
            else:
                salts = max(2, par)
            new_files, commit_rel = self._write_files(
                self._schema_aligned(df, m), m, v + 1, salts=salts, wide=True
            )
            deltas = None
            if not m["partition_col"] and m["num_buckets"] is None:
                # unpartitioned: full overwrite
                files = dict(new_files)
            elif _is_composite(m):
                # composite layout: replace every (partition, bucket) key of
                # the partition VALUES present in df — dynamic partition
                # overwrite semantics on the partition half of the key
                parts_touched = {_part_of(k) for k in new_files}
                files = {
                    k: ps for k, ps in m["files"].items()
                    if _part_of(k) not in parts_touched
                }
                files.update(new_files)
                deltas = {
                    k: ps for k, ps in m.get("deltas", {}).items()
                    if _part_of(k) not in parts_touched
                }
            else:
                files = {k: ps for k, ps in m["files"].items() if k not in new_files}
                files.update(new_files)
            try:
                return self._commit_next(
                    m, v, "overwrite_partitions", files, new_files, summary,
                    deltas=deltas,
                )
            except CommitConflict:
                self._drop_attempt(commit_rel)
                continue

    def upsert_delta(self, df: DataFrame, summary: dict | None = None) -> int:
        """Merge-on-read upsert for bucketed tables (Iceberg format-v2
        row-level-delta analog, RawVaultSchema.scala:123-128): append
        per-bucket DELTA files whose rows replace the bucket's current
        row for the same key at read time (last-wins by commit version).

        Caller contract: at most one row per bucket key in ``df``. Write
        IO is O(len(df)) — nothing existing is rewritten; readers pay a
        per-key merge over base + deltas for the touched buckets until
        :meth:`compact_deltas` folds them back into the base.
        """
        while True:
            v = self.version()
            m = self.snapshot(v)
            if m["num_buckets"] is None:
                raise ValueError("upsert_delta requires a bucketed table")
            new_files, commit_rel = self._write_files(
                self._schema_aligned(df, m), m, v + 1
            )
            deltas = {k: list(ps) for k, ps in m.get("deltas", {}).items()}
            for k, ps in new_files.items():
                deltas.setdefault(k, []).extend(ps)
            try:
                return self._commit_next(
                    m, v, "upsert_delta", dict(m["files"]), new_files, summary,
                    deltas=deltas,
                )
            except CommitConflict:
                self._drop_attempt(commit_rel)
                continue

    def delete_keys_insert(
        self, keys: DataFrame, rows: DataFrame, summary: dict | None = None
    ) -> int:
        """Equality-delete + append in ONE atomic commit (the Iceberg
        format-v2 equality-delete analog): every pre-existing row whose
        key appears in ``keys`` is dropped at read time (its commit
        version is older than this commit's tombstone), and ``rows``
        are appended as this commit's data files. Write IO is
        O(len(keys) + len(rows)) — no bucket is rewritten; readers pay a
        narrow hashed resolution join on the touched buckets until
        :meth:`compact_tombstones` folds them.

        This is the splice primitive for out-of-order SCD2 re-chains:
        the caller passes the re-chained keys and their full replacement
        version rows. Re-running the same splice converges — the newer
        tombstone also covers the previous run's inserted rows.

        Restricted to plain bucketed tables (no partition_col) without
        key blooms (tombstones would break bloom completeness).
        """
        while True:
            v = self.version()
            m = self.snapshot(v)
            if m["num_buckets"] is None or m.get("partition_col"):
                raise ValueError(
                    "delete_keys_insert requires a plain bucketed table"
                )
            if m.get("properties", {}).get("key_bloom"):
                raise ValueError(
                    "delete_keys_insert is not supported on key_bloom "
                    "tables (deletes break segment completeness)"
                )
            key_cols = m["bucket_cols"]
            new_files, commit_rel = self._write_files(
                self._schema_aligned(rows, m), m, v + 1
            )
            # tombstone key files: (key cols, _tcv = this commit) in a
            # sibling attempt dir; _tcv is a stored column so the read
            # side never needs a second input_file_name derivation
            kdf = keys.select(*key_cols).distinct().withColumn(
                "_tcv", F.lit(v + 1).cast("long")
            )
            tomb_files, tomb_rel = self._write_files(kdf, m, v + 1)
            files = {k: list(ps) for k, ps in m["files"].items()}
            for k, ps in new_files.items():
                files.setdefault(k, []).extend(ps)
            tombs = {k: list(ps) for k, ps in m.get("tombstones", {}).items()}
            for k, ps in tomb_files.items():
                tombs.setdefault(k, []).extend(ps)
            try:
                return self._commit_next(
                    m, v, "delete_insert", files, new_files, summary,
                    tombstones=tombs,
                )
            except CommitConflict:
                self._drop_attempt(commit_rel)
                self._drop_attempt(tomb_rel)
                continue

    def compact_tombstones(self) -> int:
        """Fold equality-delete tombstones: rewrite ONLY the buckets that
        carry them (the read resolves the deletes), clearing their
        tombstone lists so serving reads revert to plain scans with
        pushdown. Returns the number of buckets folded."""
        v = self.version()
        m = self.snapshot(v)
        fat = sorted(k for k, ps in m.get("tombstones", {}).items() if ps)
        if not fat:
            return 0
        self.replace_buckets(
            fat, self.read(v, keys=fat),
            summary={"compacted_tombstone_buckets": len(fat)},
        )
        return len(fat)

    def stage_write(self, df: DataFrame) -> dict:
        """Run ONLY the heavy data-file write job of an append /
        upsert_delta now; publish later with :meth:`commit_staged`.

        Lets a caller overlap two independent tables' write jobs on the
        executors while still COMMITTING in a required order (the
        satellite apply must publish history before current — the
        crash-replay invariant — but has no reason to serialize the two
        multi-second writes). The staged files are invisible until
        commit; a crash in between leaves an orphan attempt dir only.
        """
        v = self.version()
        m = self.snapshot(v)
        new_files, commit_rel = self._write_files(
            self._schema_aligned(df, m), m, v + 1
        )
        return {
            "base_version": v,
            "new_files": new_files,
            "commit_rel": commit_rel,
        }

    def commit_staged(self, staged: dict, op: str, summary: dict | None = None) -> int:
        """Publish a :meth:`stage_write` result as an ``append`` or
        ``upsert_delta`` commit. Raises :class:`CommitConflict` (after
        removing the attempt dir) if the table moved past the staged
        base version — the caller falls back to the regular write path.
        No silent retry here: the staged file paths embed the guessed
        commit version, which the MOR last-wins merge orders by, so
        re-targeting them at a different version would corrupt delta
        ordering."""
        v, new_files = staged["base_version"], staged["new_files"]
        try:
            m = self.snapshot(v)
            if self.version() != v:
                raise CommitConflict(f"table moved past staged version {v}")
            if op == "append":
                files = {k: list(ps) for k, ps in m["files"].items()}
                for k, ps in new_files.items():
                    files.setdefault(k, []).extend(ps)
                return self._commit_next(m, v, "append", files, new_files, summary)
            if op == "upsert_delta":
                deltas = {k: list(ps) for k, ps in m.get("deltas", {}).items()}
                for k, ps in new_files.items():
                    deltas.setdefault(k, []).extend(ps)
                return self._commit_next(
                    m, v, "upsert_delta", dict(m["files"]), new_files, summary,
                    deltas=deltas,
                )
            raise ValueError(f"unsupported staged op {op!r}")
        except CommitConflict:
            self._drop_attempt(staged["commit_rel"])
            raise

    def compact_deltas(self, max_delta_files: int = 8) -> int:
        """Fold delta files back into the base for every bucket whose
        delta count reached ``max_delta_files`` (rewrite_data_files
        analog for the MOR path). Bounds read-side merge width while
        keeping per-batch write IO O(new rows): with threshold T a
        bucket is rewritten once every T delta commits, so the amortized
        rewrite cost per commit is O(bucket/T). Returns the number of
        buckets folded."""
        v = self.version()
        m = self.snapshot(v)
        fat = sorted(
            k for k, ps in m.get("deltas", {}).items() if len(ps) >= max_delta_files
        )
        if not fat:
            return 0
        contents = self.read(v, keys=fat)  # merged view
        self.replace_buckets(
            fat, contents, summary={"compacted_delta_buckets": len(fat)}
        )
        return len(fat)

    def merge(self, source: DataFrame, merge_fn, summary: dict | None = None) -> int:
        """Copy-on-write MERGE on a bucketed table — the engine's single
        upsert primitive (replaces Iceberg ``MERGE INTO``, SURVEY.md §2.9).

        ``merge_fn(current, source) -> DataFrame`` receives the *current
        rows of only the touched buckets* and the bucketed source batch,
        and returns the full replacement contents for those buckets.
        Untouched buckets are carried over as pure metadata.
        """
        while True:
            v = self.version()
            m = self.snapshot(v)
            src = self.with_bucket(source).persist()
            try:
                touched = sorted(r[0] for r in src.select(BUCKET_COL).distinct().collect())
                if not touched:
                    return v  # empty batch: no-op, no new snapshot
                current = self.read(v, buckets=touched)
                current = current.withColumn(
                    BUCKET_COL, self._bucket_expr(m["num_buckets"], m["bucket_cols"])
                )
                merged = merge_fn(current, src)
                merged = self._schema_aligned(merged, m)
                new_files, commit_rel = self._write_files(merged, m, v + 1, wide=True)
                tset = {str(t) for t in touched}
                files = {
                    k: ps for k, ps in m["files"].items()
                    if _bucket_of(k, _is_composite(m)) not in tset
                }
                files.update(new_files)
                # replacement contents supersede any pending deltas and
                # equality-delete tombstones
                deltas = {
                    k: ps for k, ps in m.get("deltas", {}).items()
                    if _bucket_of(k, _is_composite(m)) not in tset
                }
                tombs = {
                    k: ps for k, ps in m.get("tombstones", {}).items()
                    if _bucket_of(k, _is_composite(m)) not in tset
                }
                try:
                    return self._commit_next(
                        m, v, "merge", files, new_files, summary,
                        deltas=deltas, tombstones=tombs,
                    )
                except CommitConflict:
                    self._drop_attempt(commit_rel)
                    continue
            finally:
                src.unpersist()

    def replace_buckets(
        self,
        touched: list[int],
        contents: DataFrame,
        summary: dict | None = None,
        salts: int = 1,
    ) -> int:
        """Low-level COW commit: replace the file sets of ``touched``
        keys with ``contents`` (which must be exactly those keys'
        new rows). merge() is this plus the read-modify step; callers
        that already computed the replacement (e.g. the satellite
        current/history split) use this directly. ``salts`` > 1 widens
        the writer stage for large rewrites (see _write_files).

        ``touched`` entries are bucket ids (ints) on plain bucketed
        tables, or full ``"<partition>|<bucket>"`` key strings on
        composite tables (the incremental-PIT path)."""
        while True:
            v = self.version()
            m = self.snapshot(v)
            merged = self._schema_aligned(self.with_bucket(contents), m)
            new_files, commit_rel = self._write_files(
                merged, m, v + 1, salts=salts, wide=True
            )
            tset = {str(t) for t in touched}
            files = {k: ps for k, ps in m["files"].items() if k not in tset}
            files.update(new_files)
            # replacement contents supersede any pending deltas and
            # equality-delete tombstones
            deltas = {
                k: ps for k, ps in m.get("deltas", {}).items() if k not in tset
            }
            tombs = {
                k: ps for k, ps in m.get("tombstones", {}).items()
                if k not in tset
            }
            try:
                return self._commit_next(
                    m, v, "merge", files, new_files, summary,
                    deltas=deltas, tombstones=tombs,
                )
            except CommitConflict:
                self._drop_attempt(commit_rel)
                continue

    def _commit_next(self, m, v, op, files, new_files, summary, deltas=None,
                     bloom_add=None, tombstones=None):
        if deltas is None:
            deltas = m.get("deltas", {})
        if tombstones is None:
            tombstones = m.get("tombstones", {})
        blooms = {k: list(ps) for k, ps in m.get("blooms", {}).items()}
        if m.get("properties", {}).get("key_bloom") and m["num_buckets"] is not None:
            if op == "append":
                # an appended key without a segment breaks the bucket's
                # completeness invariant — drop that bucket's blooms so
                # readers fall back to the plain existence read. A segment
                # may only ATTACH when coverage stays complete: the bucket
                # either already had complete coverage (k in blooms) or
                # holds no pre-existing rows at all (no files AND no
                # deltas). Without that guard, a bucket invalidated by a
                # merge/overwrite/unbloomed append would be "resurrected"
                # by the next bloomed append with a segment covering only
                # that batch — its older keys covered by no segment, so
                # redeliveries would probe hits=0 and insert duplicates.
                for k in new_files:
                    never_had_rows = (
                        k not in m["files"] and k not in m.get("deltas", {})
                    )
                    if (
                        bloom_add
                        and k in bloom_add
                        and (k in blooms or never_had_rows)
                    ):
                        blooms.setdefault(k, []).append(bloom_add[k])
                    else:
                        blooms.pop(k, None)
            elif op == "compact":
                pass  # pure rewrite of the same key set: blooms stay valid
            else:
                # merge/overwrite/upsert may introduce keys no segment
                # covers; false negatives are correctness bugs, so
                # invalidate the touched buckets (false positives = an
                # extra read = safe; missing blooms = plain read = safe)
                for k in new_files:
                    blooms.pop(k, None)
        s = dict(m.get("summary", {}))
        epochs = dict(s.get("epochs", {}))
        user = dict(summary or {})
        for sid, ep in (user.pop("epochs", None) or {}).items():
            epochs[sid] = max(int(ep), int(epochs.get(sid, -1)))
        s.update(user)
        s["epochs"] = epochs
        s["added_files"] = sum(len(p) for p in new_files.values())
        s["total_files"] = sum(len(p) for p in files.values())
        s["total_delta_files"] = sum(len(p) for p in deltas.values())
        if tombstones:
            s["total_tombstone_files"] = sum(len(p) for p in tombstones.values())
        manifest = {
            "operation": op,
            "schema": m["schema"],
            "num_buckets": m["num_buckets"],
            "bucket_cols": m["bucket_cols"],
            "partition_col": m["partition_col"],
            "properties": m.get("properties", {}),
            "summary": s,
        }
        if (v + 1) % _CHECKPOINT_EVERY == 0:
            manifest["files"] = files  # checkpoint: full map
            manifest["deltas"] = deltas
            manifest["blooms"] = blooms
            manifest["tombstones"] = tombstones
        else:
            old = m["files"]
            manifest["delta_base"] = v
            manifest["files_set"] = {
                k: ps for k, ps in files.items() if old.get(k) != ps
            }
            manifest["files_drop"] = [k for k in old if k not in files]
            old_d = m.get("deltas", {})
            manifest["deltas_set"] = {
                k: ps for k, ps in deltas.items() if old_d.get(k) != ps
            }
            manifest["deltas_drop"] = [k for k in old_d if k not in deltas]
            old_b = m.get("blooms", {})
            manifest["blooms_set"] = {
                k: ps for k, ps in blooms.items() if old_b.get(k) != ps
            }
            manifest["blooms_drop"] = [k for k in old_b if k not in blooms]
            old_t = m.get("tombstones", {})
            manifest["tombstones_set"] = {
                k: ps for k, ps in tombstones.items() if old_t.get(k) != ps
            }
            manifest["tombstones_drop"] = [
                k for k in old_t if k not in tombstones
            ]
        return self._commit(v, manifest)

    # ----------------------------------------------------- exactly-once API

    def last_epoch(self, stream_id: str) -> int:
        """Max epoch committed for a stream (-1 if none) — the snapshot-
        summary handshake dvx.stream uses to skip replayed micro-batches."""
        return int(self.snapshot().get("summary", {}).get("epochs", {}).get(stream_id, -1))

    # ------------------------------------------------------------ evolution

    def add_columns(self, new_fields: list) -> int:
        """Additive schema evolution without rewrite (Iceberg ADD COLUMN,
        RawVaultSchema.scala:17-27; loyalty_tier scenario). Old files
        null-fill on read via the explicit read schema."""
        while True:
            v = self.version()
            m = self.snapshot(v)
            schema = StructType.fromJson(m["schema"])
            names = {f.name for f in schema.fields}
            for f in new_fields:
                if f.name not in names:
                    schema = schema.add(f)
            manifest = dict(m)
            manifest["schema"] = json.loads(schema.json())
            manifest["operation"] = "add_columns"
            try:
                return self._commit(v, manifest)
            except CommitConflict:
                continue

    def files_added_since(self, version: int) -> list[str]:
        """Absolute paths of data files live in the CURRENT snapshot that
        were not live at ``version`` — the change-capture surface for
        downstream incremental refreshes (Iceberg's incremental-scan
        analog). Because upserts are MOR deltas, the added files hold
        exactly the rows written since (compaction commits widen this to
        whole rewritten buckets — a conservative over-approximation).
        Raises FileNotFoundError if ``version`` was expired."""
        cur, old = self.snapshot(), self.snapshot(version)

        def _all_paths(m: dict) -> set[str]:
            out: set[str] = set()
            for ps in m["files"].values():
                out.update(ps)
            for ps in m.get("deltas", {}).values():
                out.update(ps)
            return out

        return sorted(
            os.path.join(self.root, p) for p in _all_paths(cur) - _all_paths(old)
        )

    def publish_mirror(self, dest: str) -> int:
        """Materialize the CURRENT snapshot as a stable flat directory of
        hardlinks — the serving surface for catalog objects (persistent
        views / external tables) that address a plain parquet PATH and
        cannot consume the manifest's explicit file list. Re-publishing
        atomically retargets the directory to the new snapshot (links are
        O(files) metadata ops, no data copy; on an object store this
        becomes a manifest-driven copy or an Iceberg catalog pointer).

        Refuses while MOR deltas are pending: a plain directory read
        cannot express the last-wins merge — fold first
        (``compact_deltas(max_delta_files=1)``)."""
        m = self.snapshot()
        if any(m.get("deltas", {}).values()):
            raise ValueError(
                f"publish_mirror on {self.root}: pending MOR delta files; "
                "run compact_deltas(max_delta_files=1) first"
            )
        if any(m.get("tombstones", {}).values()):
            raise ValueError(
                f"publish_mirror on {self.root}: pending equality-delete "
                "tombstones; run compact_tombstones() first"
            )
        os.makedirs(dest, exist_ok=True)
        for fn in os.listdir(dest):
            if fn.endswith(".parquet"):
                os.unlink(os.path.join(dest, fn))
        n = 0
        for ps in m["files"].values():
            for p in ps:
                os.link(
                    os.path.join(self.root, p),
                    os.path.join(dest, p.replace(os.sep, "__")),
                )
                n += 1
        return n

    def file_stats(self, version: int | None = None) -> list[dict]:
        """Per-partition-key file statistics at a snapshot — the
        ``table.files`` metadata-table analog (IcebergWriter.scala:
        436-469): one row per partition key with file count and on-disk
        bytes. Driver-side metadata walk; no Spark job."""
        m = self.snapshot(version)
        delta_map = m.get("deltas", {})
        out = []

        def _size(paths: list[str]) -> int:
            size = 0
            for p in paths:
                try:
                    size += os.path.getsize(os.path.join(self.root, p))
                except OSError:
                    pass
            return size

        for k in sorted(set(m["files"]) | set(delta_map)):
            paths = m["files"].get(k, [])
            dpaths = delta_map.get(k, [])
            out.append(
                {
                    "partition": k,
                    "file_count": len(paths),
                    "bytes": _size(paths),
                    "delta_file_count": len(dpaths),
                    "delta_bytes": _size(dpaths),
                }
            )
        return out

    # ---------------------------------------------------------- maintenance

    def rollback(self, version: int) -> int:
        """CALL system.rollback_to_snapshot analog (IcebergWriter.scala:347-376):
        commit a NEW snapshot whose file map is the old one."""
        old = self.snapshot(version)
        cur_v = self.version()
        manifest = dict(old)
        manifest["operation"] = "rollback"
        manifest.setdefault("summary", {})["rolled_back_to"] = version
        return self._commit(cur_v, manifest)

    def expire_snapshots(self, retain_last: int = 10) -> int:
        """CALL system.expire_snapshots analog (IcebergWriter.scala:295-325):
        drop old manifests and delete data files no live snapshot references."""
        vs = self._versions()
        expire = vs[:-retain_last] if len(vs) > retain_last else []
        if not expire:
            return 0
        keep = vs[len(expire):]
        live: set[str] = set()
        for v in keep:
            snap = self.snapshot(v)
            for ps in snap["files"].values():
                live.update(ps)
            for ps in snap.get("deltas", {}).values():
                live.update(ps)
            for ps in snap.get("blooms", {}).values():
                live.update(ps)
            for ps in snap.get("tombstones", {}).values():
                live.update(ps)
        # the oldest retained manifest may be a delta whose base is about
        # to be expired: rewrite it as a checkpoint (resolved full map)
        # so the retained chain stays self-contained
        oldest = keep[0]
        if "files" not in self._read_manifest(oldest):
            full = dict(self.snapshot(oldest))
            d = _log_dir(self.root)
            tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.json")
            with open(tmp, "w") as f:
                json.dump(full, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, os.path.join(d, f"v{oldest:010d}.json"))
        removed = 0
        for v in expire:
            snap = self.snapshot(v)
            refs = (
                list(snap["files"].values())
                + list(snap.get("deltas", {}).values())
                + list(snap.get("blooms", {}).values())
                + list(snap.get("tombstones", {}).values())
            )
            for ps in refs:
                for p in ps:
                    if p not in live:
                        fp = os.path.join(self.root, p)
                        if os.path.exists(fp):
                            os.unlink(fp)
                            removed += 1
            os.unlink(os.path.join(_log_dir(self.root), f"v{v:010d}.json"))
        return removed

    def compact(self, max_files_per_key: int = 1) -> int:
        """rewrite_data_files analog (IcebergWriter.scala:396-426): rewrite
        partition keys whose file count exceeds the target. Metadata-only
        for already-compact keys."""
        while True:
            v = self.version()
            m = self.snapshot(v)
            delta_map = m.get("deltas", {})
            tomb_map = m.get("tombstones", {})
            fat = sorted(
                {k for k, ps in m["files"].items() if len(ps) > max_files_per_key}
                | {k for k, ps in delta_map.items() if ps}
                | {k for k, ps in tomb_map.items() if ps}
            )
            if not fat:
                return v
            if m["num_buckets"] is not None:
                df = self.read(v, keys=fat).repartition(max(1, len(fat)))
                df = df.withColumn(
                    BUCKET_COL, self._bucket_expr(m["num_buckets"], m["bucket_cols"])
                )
            else:
                df = self.read(v, partitions=fat).repartition(max(1, len(fat)))
            new_files, commit_rel = self._write_files(
                self._schema_aligned(df, m), m, v + 1, wide=True
            )
            files = {k: ps for k, ps in m["files"].items() if k not in fat}
            files.update(new_files)
            deltas = {k: ps for k, ps in delta_map.items() if k not in fat}
            tombs = {k: ps for k, ps in tomb_map.items() if k not in fat}
            try:
                return self._commit_next(
                    m, v, "compact", files, new_files, {"compacted": fat},
                    deltas=deltas, tombstones=tombs,
                )
            except CommitConflict:
                self._drop_attempt(commit_rel)
                continue
