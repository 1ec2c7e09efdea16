"""Snapshot-manifest table: atomic commits + resume over plain Parquet.

This container has no Iceberg runtime jar, so we implement the minimal
subset of snapshot semantics the pipeline needs — atomic multi-file
commits, snapshot lineage, commit-level metadata — as a manifest-JSON
layer over Parquet. The commit protocol is the same shape Iceberg uses
(write data files invisibly, then atomically swap a manifest pointer);
in production you would swap this class for
`df.writeTo("catalog.db.pages_out").append()` — every call site goes
through this one module.

It is also the direct analog of the reference's atomic temp-file
rewrite + resume bookkeeping (reference: request_processor/
base_request_processor.py:609-651 — write to `.temp`, rename, then
skip completed ids on restart): data written without a manifest commit
is invisible and simply re-done on resume, giving exactly-once bucket
processing without coordination.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "_manifests")
        self.data_dir = os.path.join(root, "data")
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- manifest chain ----------------------------------------------------
    def _manifest_files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.manifest_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def current_snapshot_id(self) -> int:
        files = self._manifest_files()
        return int(files[-1][1:-5]) if files else 0

    def commits(self) -> list[dict[str, Any]]:
        """All committed entries, oldest first (full history, incl.
        commits later superseded by a compaction)."""
        out: list[dict[str, Any]] = []
        for f in self._manifest_files():
            with open(os.path.join(self.manifest_dir, f)) as fh:
                out.append(json.load(fh))
        return out

    def active_commits(self) -> list[dict[str, Any]]:
        """Commits that currently contribute data: full history minus
        any snapshot listed in a later commit's `replaces` (the
        Iceberg rewrite_data_files/overwrite lineage model — replaced
        data files stay on disk for time travel but are invisible to
        readers)."""
        all_ = self.commits()
        replaced: set[int] = set()
        for c in all_:
            replaced.update(int(s) for s in c.get("replaces", []))
        return [c for c in all_ if c["snapshot_id"] not in replaced]

    # -- write path ----------------------------------------------------------
    def stage_dir(self) -> str:
        """Directory for not-yet-committed data files (invisible to readers)."""
        return os.path.join(self.data_dir, uuid.uuid4().hex)

    def commit(
        self,
        data_path: str,
        meta: dict[str, Any],
        replaces: list[int] | None = None,
    ) -> int:
        """Atomically publish `data_path` with metadata. Returns snapshot id.

        `replaces` lists snapshot ids this commit supersedes (compaction /
        rewrite); replaced commits drop out of `active_commits()`.
        """
        sid = self.current_snapshot_id() + 1
        rel = os.path.relpath(data_path, self.root)
        payload = {"snapshot_id": sid, "data": rel, "meta": meta}
        if replaces:
            payload["replaces"] = sorted(int(s) for s in replaces)
        tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.rename(tmp, os.path.join(self.manifest_dir, f"v{sid:06d}.json"))
        return sid

    def append(self, df: DataFrame, meta: dict[str, Any], partition_by: list[str] | None = None) -> str:
        """Write df to a fresh staged dir, then commit it. Returns data dir."""
        path = self.stage_dir()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        self.commit(path, meta)
        return path

    # -- maintenance ---------------------------------------------------------
    def compact(
        self,
        spark: SparkSession,
        predicate=None,
        meta_merge=None,
        partition_by: list[str] | None = None,
    ) -> int | None:
        """Rewrite the data of all matching active commits into ONE
        commit (small-files compaction, the Iceberg
        `rewrite_data_files` analog). Incremental/resumed runs leave
        one directory of files per commit; at 10^12 rows that file
        count — not the byte volume — becomes the scan-planning and
        open()-per-file bottleneck, so periodic compaction is a
        first-class table operation.

        `meta_merge(metas) -> meta` combines the replaced commits'
        metadata (default: first commit's meta). Returns the new
        snapshot id, or None if fewer than two commits match.
        """
        victims = [
            c for c in self.active_commits()
            if predicate is None or predicate(c["meta"])
        ]
        if len(victims) < 2:
            return None
        df = spark.read.parquet(os.path.join(self.root, victims[0]["data"]))
        for c in victims[1:]:
            df = df.unionByName(
                spark.read.parquet(os.path.join(self.root, c["data"]))
            )
        path = self.stage_dir()
        w = df
        if partition_by:
            # one shuffle → one file per partition value in the rewrite
            w = df.repartition(*partition_by)
        writer = w.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        metas = [c["meta"] for c in victims]
        meta = meta_merge(metas) if meta_merge else dict(metas[0])
        return self.commit(
            path, meta, replaces=[c["snapshot_id"] for c in victims]
        )

    # -- read path -----------------------------------------------------------
    def data_paths(self, predicate=None) -> list[str]:
        return [
            os.path.join(self.root, c["data"])
            for c in self.active_commits()
            if predicate is None or predicate(c["meta"])
        ]

    def read(self, spark: SparkSession, predicate=None) -> DataFrame | None:
        paths = self.data_paths(predicate)
        if not paths:
            return None
        # each commit dir is its own partition-discovery root; union them
        # (Iceberg would resolve this through its own manifests)
        df = spark.read.parquet(paths[0])
        for p in paths[1:]:
            df = df.unionByName(spark.read.parquet(p))
        return df
