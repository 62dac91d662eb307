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
  O(delta) bytes, never a rewrite of history.  Background compaction
  of old segments is an offline concern (same as any LSM); the
  manifest makes swapping compacted segments in atomic too.

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
        os.replace(tmp, self._manifest_path())

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
        # job — measured ~0.5 s per read of a 512-bucket segment)
        spark.conf.set(
            "spark.sql.sources.parallelPartitionDiscovery.threshold", "4096"
        )
        out = None
        for d in dirs:
            part = spark.read.parquet(d)
            out = part if out is None else out.unionByName(part)
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
