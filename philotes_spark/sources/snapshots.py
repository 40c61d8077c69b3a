"""Snapshot-versioned parquet tables: time travel + metadata tables +
snapshot expiry (SURVEY §2B B5/B6, §2A A7/A17).

The reference gets these from Iceberg through a REST catalog
(`internal/iceberg/catalog/rest.go:186-217` append commits;
`docs/query/sample-queries.sql:47-61` time travel + `$snapshots`/
`$history` metadata tables). On a cluster with Iceberg/Delta on the
classpath this whole module is replaced by `VERSION AS OF` — it exists so
the engine serves the same surface standalone:

  layout:  <path>/data/<uuid>.parquet           (immutable data files)
           <path>/_snapshots/v00000001.json      (manifest per version)

  commit:  write data files first, manifest last — the manifest IS the
           commit point (same ordering as the reference's upload-then-
           commit, writer.go:95-194). Commits carry the expected parent
           version; a concurrent writer that lost the race fails instead
           of silently forking history — stronger than the reference's
           empty-requirements commit (rest.go:200-203).

  read:    a snapshot is an explicit file list; `spark.read.parquet(*files)`
           scans exactly that version. File-level pruning/pushdown work
           unchanged (the scan is ordinary parquet).

Scale: manifests hold file paths + stats, not data; a 100 TB table is a
few thousand 128 MB files → manifest stays KB-MB. Expiry (A7) removes
manifests older than the retention and data files no live manifest
references.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"


class CommitConflict(RuntimeError):
    """Another writer committed the version this commit expected to create."""


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path
        self.snap_dir = os.path.join(path, _SNAP_DIR)
        self.data_dir = os.path.join(path, _DATA_DIR)

    # --- commit log --------------------------------------------------------

    def _manifests(self) -> list[str]:
        if not os.path.isdir(self.snap_dir):
            return []
        return sorted(
            f for f in os.listdir(self.snap_dir) if f.startswith("v") and f.endswith(".json")
        )

    def _load(self, manifest: str) -> dict:
        with open(os.path.join(self.snap_dir, manifest)) as fh:
            return json.load(fh)

    def current_version(self) -> int:
        ms = self._manifests()
        return int(ms[-1][1:9]) if ms else 0

    def commit(
        self,
        df: DataFrame,
        operation: str = "append",
        partition_by: list[str] | None = None,
        properties: dict[str, str] | None = None,
    ) -> int:
        """Write a new snapshot. ``append`` adds to the parent's file list;
        ``overwrite`` replaces it. ``partition_by`` writes hive-layout
        ``key=value`` directories (surfaced by :meth:`partitions`);
        ``properties`` merge into the table properties carried across
        versions (surfaced by :meth:`properties`). Returns the version."""
        if operation not in ("append", "overwrite"):
            raise ValueError(f"unknown operation {operation!r}")
        os.makedirs(self.snap_dir, exist_ok=True)
        parent = self.current_version()
        parent_manifest = self._load(f"v{parent:08d}.json") if parent else {}

        # A snapshot's file list must have ONE layout: appends inherit the
        # parent's partition spec (so their files land hive-partitioned
        # too); changing the spec requires an overwrite. Without this, a
        # mixed file list makes the partitioned read un-unionable.
        parent_spec = parent_manifest.get("partition_by") or []
        if operation == "append" and parent_manifest.get("files"):
            # symmetric: a partitioned append onto an unpartitioned parent
            # mixes layouts in one file list just as badly as the reverse
            if partition_by is None:
                partition_by = list(parent_spec)
            elif list(partition_by) != list(parent_spec):
                raise ValueError(
                    f"append partition spec {partition_by} conflicts with the "
                    f"table's spec {parent_spec}; use operation='overwrite' "
                    "to change the layout"
                )

        staged = os.path.join(self.data_dir, uuid.uuid4().hex)
        writer = df.write
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staged)
        new_files = [
            os.path.join(root, f)
            for root, _dirs, fs in os.walk(staged)
            for f in fs
            if f.endswith(".parquet")
        ]
        files = new_files if operation == "overwrite" else (
            parent_manifest.get("files", []) + new_files
        )
        props = dict(parent_manifest.get("properties", {}))
        props.update(properties or {})

        version = parent + 1
        manifest = {
            "version": version,
            "parent": parent,
            "timestamp_ms": int(time.time() * 1000),
            "operation": operation,
            "files": sorted(files),
            "added_files": len(new_files),
            "added_rows": df.count(),
            # append: resolved against the parent spec above; overwrite:
            # whatever this commit wrote (None ⇒ back to unpartitioned)
            "partition_by": list(partition_by) if partition_by else [],
            "properties": props,
        }
        target = os.path.join(self.snap_dir, f"v{version:08d}.json")
        tmp = target + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            # os.link is an atomic create: two racers that both computed the
            # same parent cannot both win — the loser gets EEXIST instead of
            # silently replacing the winner's manifest (optimistic
            # concurrency, A17; exists-check + rename had a TOCTOU window).
            os.link(tmp, target)
        except FileExistsError:
            raise CommitConflict(f"version {version} already committed") from None
        finally:
            os.remove(tmp)
        return version

    # --- reads (B5) ----------------------------------------------------------

    def _resolve(self, version: int | None = None, as_of_ms: int | None = None) -> dict:
        ms = self._manifests()
        if not ms:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        if version is not None:
            name = f"v{version:08d}.json"
            if name not in ms:
                raise ValueError(f"unknown version {version}; have 1..{len(ms)}")
            return self._load(name)
        if as_of_ms is not None:
            live = [self._load(m) for m in ms]
            older = [m for m in live if m["timestamp_ms"] <= as_of_ms]
            if not older:
                raise ValueError(f"no snapshot at or before {as_of_ms}")
            return older[-1]
        return self._load(ms[-1])

    def read(self, version: int | None = None, as_of_ms: int | None = None) -> DataFrame:
        """Latest snapshot by default; ``version=`` ≙ VERSION AS OF,
        ``as_of_ms=`` ≙ TIMESTAMP AS OF (sample-queries.sql:47-52)."""
        m = self._resolve(version, as_of_ms)
        if not m["files"]:
            raise ValueError(f"snapshot {m['version']} is empty")
        if m.get("partition_by"):
            # hive-layout files: give Spark the staged root as basePath so the
            # key=value path segments come back as partition columns
            by_root: dict[str, list[str]] = {}
            for f in m["files"]:
                rel = os.path.relpath(f, self.data_dir)
                root = os.path.join(self.data_dir, rel.split(os.sep)[0])
                by_root.setdefault(root, []).append(f)
            parts = [
                self.spark.read.option("basePath", root).parquet(*fs)
                for root, fs in sorted(by_root.items())
            ]
            # partition-column types are inferred independently per staged
            # root; if two appends infer differently (one all-numeric, one
            # not) the union would fail or silently widen — normalize to
            # string when the inferred types disagree
            for col in m["partition_by"]:
                types = {dict(p.dtypes)[col] for p in parts}
                if len(types) > 1:
                    parts = [
                        p.withColumn(col, p[col].cast("string")) for p in parts
                    ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out
        return self.spark.read.parquet(*m["files"])

    # --- metadata tables (B6) -------------------------------------------------

    def snapshots(self) -> DataFrame:
        """≙ `t$snapshots` (sample-queries.sql:55-61)."""
        rows = [
            (
                m["version"],
                m["parent"],
                m["timestamp_ms"],
                m["operation"],
                len(m["files"]),
                m["added_files"],
                m["added_rows"],
            )
            for m in (self._load(f) for f in self._manifests())
        ]
        return self.spark.createDataFrame(
            rows,
            "version int, parent int, timestamp_ms long, operation string, "
            "total_files int, added_files int, added_rows long",
        )

    def files(self, version: int | None = None) -> DataFrame:
        """≙ `t$files`: the data files of one snapshot, with sizes."""
        m = self._resolve(version)
        rows = [(f, os.path.getsize(f)) for f in m["files"]]
        return self.spark.createDataFrame(rows, "file_path string, size_bytes long")

    def partitions(self, version: int | None = None) -> DataFrame:
        """≙ `t$partitions` (sample-queries.sql:55-61): partition values with
        file counts/sizes, parsed from the hive-layout manifest paths."""
        m = self._resolve(version)
        agg: dict[str, tuple[int, int]] = {}
        for f in m["files"]:
            segs = [s for s in f.split(os.sep) if "=" in s and not s.endswith(".parquet")]
            key = "/".join(segs) or "<unpartitioned>"
            cnt, size = agg.get(key, (0, 0))
            agg[key] = (cnt + 1, size + os.path.getsize(f))
        rows = [(k, c, s) for k, (c, s) in sorted(agg.items())]
        return self.spark.createDataFrame(
            rows, "partition string, file_count int, size_bytes long"
        )

    def properties(self, version: int | None = None) -> DataFrame:
        """≙ `t$properties`: the table-property key/value pairs of a
        snapshot (sample-queries.sql:55-61)."""
        m = self._resolve(version)
        rows = sorted(m.get("properties", {}).items())
        return self.spark.createDataFrame(rows, "key string, value string")

    def metadata(self, version: int | None = None) -> DataFrame:
        """≙ `t$metadata`: one-row summary of a snapshot — version, file
        and byte totals, partition spec (sample-queries.sql:55-61)."""
        m = self._resolve(version)
        total_bytes = sum(os.path.getsize(f) for f in m["files"])
        row = (
            m["version"],
            m["timestamp_ms"],
            m["operation"],
            len(m["files"]),
            total_bytes,
            ",".join(m.get("partition_by") or []) or None,
            len(m.get("properties", {})),
        )
        return self.spark.createDataFrame(
            [row],
            "version int, timestamp_ms long, operation string, total_files int, "
            "total_bytes long, partition_spec string, n_properties int",
        )

    # --- maintenance (A7) -------------------------------------------------------

    def expire_snapshots(self, keep_last: int = 1, older_than_ms: int | None = None) -> int:
        """Drop manifests beyond the retention (but always keep the newest
        ``keep_last``), then delete data files no live manifest references
        (buffer retention cleanup analogue, buffer/postgres.go:218-234).
        Returns the number of data files deleted."""
        ms = self._manifests()
        keep = set(ms[-keep_last:]) if keep_last else set()
        for name in ms:
            if name in keep:
                continue
            m = self._load(name)
            if older_than_ms is None or m["timestamp_ms"] < older_than_ms:
                os.remove(os.path.join(self.snap_dir, name))
        live: set[str] = set()
        for name in self._manifests():
            live.update(self._load(name)["files"])
        deleted = 0
        for sub in os.listdir(self.data_dir) if os.path.isdir(self.data_dir) else []:
            subdir = os.path.join(self.data_dir, sub)
            for f in os.listdir(subdir):
                p = os.path.join(subdir, f)
                if f.endswith(".parquet") and p not in live:
                    os.remove(p)
                    deleted += 1
            if not any(x.endswith(".parquet") for x in os.listdir(subdir)):
                for leftover in os.listdir(subdir):
                    os.remove(os.path.join(subdir, leftover))
                os.rmdir(subdir)
        return deleted
