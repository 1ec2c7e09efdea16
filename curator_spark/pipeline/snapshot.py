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


def _merge_metas_default(metas: list[dict[str, Any]]) -> dict[str, Any]:
    """Default metadata merge for rewrites that replace SEVERAL
    commits (compact / merge_upsert without a caller meta_merge).
    Keeping only metas[0] (the pre-r4 behavior) silently dropped the
    other commits' bookkeeping, with two concrete corruptions:
    - resume: a later run() of the same fingerprint missed the dropped
      `buckets` and re-appended their rows (duplicates);
    - streaming exactly-once: a replayed micro-batch missed its
      (stream_lineage, stream_batch_id) key and re-appended.
    Unions `buckets` and `failed_rows`, and carries EVERY replaced
    commit's streaming key forward as `stream_batches` [[lineage, id]]
    (make_snapshot_batch_committer checks that list alongside the
    per-commit keys)."""
    meta = dict(metas[0])
    if len(metas) <= 1:
        return meta
    buckets: dict[str, Any] = {}
    failed = 0
    stream: set[tuple[str, int]] = set()
    for m in metas:
        buckets.update(m.get("buckets", {}))
        failed += m.get("failed_rows", 0)
        if "stream_lineage" in m:
            stream.add((m["stream_lineage"], int(m["stream_batch_id"])))
        for pair in m.get("stream_batches", []):
            stream.add((pair[0], int(pair[1])))
    if buckets or any("buckets" in m for m in metas):
        meta["buckets"] = buckets
    meta["failed_rows"] = failed
    if stream:
        meta["stream_batches"] = sorted([l, b] for l, b in stream)
        meta.pop("stream_lineage", None)
        meta.pop("stream_batch_id", None)
    return meta


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

    def active_commits(self, as_of: int | None = None) -> list[dict[str, Any]]:
        """Commits that currently contribute data: full history minus
        any snapshot listed in a later commit's `replaces` (the
        Iceberg rewrite_data_files/overwrite lineage model — replaced
        data files stay on disk for time travel but are invisible to
        readers).

        `as_of` reads the table AS OF that snapshot id (Iceberg
        `VERSION AS OF` time travel): only commits <= as_of exist, and
        only their `replaces` edges apply — a later compaction or
        delete does not hide data from a historical read.

        Expiry guard: a historical view is only served when it is
        REPRODUCIBLE. `as_of` is rejected if (a) as_of itself was
        expired, or (b) any expired snapshot e <= as_of is not covered
        by a retained `replaces` edge from a commit <= as_of — such an
        `e` was still active in the as_of view and its data is gone,
        so serving the remaining commits would be a silently-partial
        historical view (the failure ADVICE r1 flagged). Iceberg never
        hits this because expire_snapshots keeps files referenced by
        retained snapshots; our tombstone list makes the same case an
        explicit error instead. The check can over-reject along
        expired replace-chains (the covering edge itself expired) —
        erring toward an explicit error, never a wrong view."""
        all_ = self.commits()
        if as_of is not None:
            expired = self.expired_snapshot_ids()
            if as_of in expired:
                raise ValueError(
                    f"snapshot {as_of} has been expired "
                    "(expire_snapshots); cannot time travel to it"
                )
            covered: set[int] = set()
            for c in all_:
                if c["snapshot_id"] <= as_of:
                    covered.update(int(s) for s in c.get("replaces", []))
            lost = {e for e in expired if e <= as_of} - covered
            if lost:
                raise ValueError(
                    f"time travel to snapshot {as_of} is not "
                    f"reproducible: snapshots {sorted(lost)} were part "
                    "of that view but have been expired"
                )
            all_ = [c for c in all_ if c["snapshot_id"] <= as_of]
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
        op: str = "append",
    ) -> int:
        """Atomically publish `data_path` with metadata. Returns snapshot id.

        `replaces` lists snapshot ids this commit supersedes (compaction /
        rewrite); replaced commits drop out of `active_commits()`.
        `op` tags the snapshot's operation type (Iceberg snapshot
        `operation` field): append | replace | delete | overwrite —
        incremental readers dispatch on it.
        """
        rel = os.path.relpath(data_path, self.root)
        payload = {"data": rel, "meta": meta, "op": op}
        if replaces:
            payload["replaces"] = sorted(int(s) for s in replaces)
        return self._publish(payload)

    def _publish(self, payload: dict[str, Any]) -> int:
        """Claim the next snapshot id and publish its manifest with a
        CREATE-EXCLUSIVE link — a plain rename would silently clobber a
        concurrent writer's same-sid manifest (two writers both read
        current=N, both commit N+1; POSIX rename overwrites, losing the
        first commit's data into orphan-GC). os.link fails with EEXIST
        on collision, so the loser re-reads the current id and retries
        under the next one — both commits land."""
        tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
        try:
            for _ in range(1000):  # bound: concurrent-writer collisions
                sid = self.current_snapshot_id() + 1
                payload["snapshot_id"] = sid
                with open(tmp, "w") as fh:
                    json.dump(payload, fh)
                try:
                    os.link(
                        tmp, os.path.join(self.manifest_dir, f"v{sid:06d}.json")
                    )
                    return sid
                except FileExistsError:
                    continue
            raise RuntimeError("could not claim a snapshot id (1000 collisions)")
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

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
        df = None
        for c in victims:
            part = self._read_commit(spark, c)
            if part is not None:
                df = part if df is None else df.unionByName(
                    part, allowMissingColumns=True
                )
        if df is None:
            return None
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
        meta = meta_merge(metas) if meta_merge else _merge_metas_default(metas)
        return self.commit(
            path, meta, replaces=[c["snapshot_id"] for c in victims],
            op="replace",
        )

    def _classify_parts(
        self, c: dict[str, Any], partition_col: str, wanted: set[str] | None
    ) -> tuple[list[tuple[str, str]], list[dict[str, str]]]:
        """Split a commit's parts into (affected [(dir, basePath)...],
        untouched [manifest part refs...]) for a COW rewrite targeting
        the `wanted` partition-dir names (None = everything affected).

        A part whose own basename IS a `{partition_col}=v` directory —
        i.e. a partition carried forward BY REFERENCE from an earlier
        rewrite — is matched against `wanted` directly: it has no
        nested partition dirs, and classifying it "unpartitioned ⇒
        affected" (the pre-r4 behavior) silently re-read and rewrote
        every previously-carried partition on each subsequent
        delete/merge, degrading toward O(table) per operation."""
        affected: list[tuple[str, str]] = []
        untouched: list[dict[str, str]] = []

        def carry(path: str, base: str) -> None:
            untouched.append(
                {
                    "path": os.path.relpath(path, self.root),
                    "base": os.path.relpath(base, self.root),
                }
            )

        for path, base in self._parts(c):
            name = os.path.basename(os.path.normpath(path))
            if name.startswith(f"{partition_col}="):
                if wanted is None or name in wanted:
                    affected.append((path, base))
                else:
                    carry(path, base)
                continue
            subdirs = [
                d for d in sorted(os.listdir(path))
                if d.startswith(f"{partition_col}=")
                and os.path.isdir(os.path.join(path, d))
            ] if os.path.isdir(path) else []
            if wanted is None or not subdirs:
                # unpartitioned part (or no pruning info): all affected
                affected.append((path, base))
                continue
            for d in subdirs:
                full = os.path.join(path, d)
                if d in wanted:
                    affected.append((full, base))
                else:
                    carry(full, base)
        return affected, untouched

    @staticmethod
    def _read_dirs(spark: SparkSession, pairs: list[tuple[str, str]]):
        """Union the (dir, basePath) pairs grouped by basePath — one
        scan per base so partition-column discovery stays consistent."""
        df = None
        for base in sorted({b for _, b in pairs}):
            dirs = [p for p, b in pairs if b == base]
            part_df = spark.read.option("basePath", base).parquet(*dirs)
            df = part_df if df is None else df.unionByName(part_df)
        return df

    # -- row-level delete (copy-on-write) ------------------------------------
    def delete_where(
        self,
        spark: SparkSession,
        condition=None,
        partition_values: list | None = None,
        partition_col: str = "bucket_id",
        predicate=None,
        meta_note: str = "delete",
        anti_keys: DataFrame | None = None,
        key_col: str = "url",
    ) -> dict[str, Any]:
        """Row-level DELETE with partition-granularity copy-on-write —
        the Iceberg `DELETE FROM ... WHERE` analog (COW mode). Rows
        matching `condition` (a pyspark Column) are removed.

        `partition_values` prunes the rewrite: only
        `{partition_col}={v}` directories can contain matches (the
        caller derives them, e.g. url-hash buckets for a url delete
        list), so ONLY those directories are filtered and rewritten.
        Every untouched partition directory of an affected commit is
        carried into the replacing manifest BY REFERENCE (`parts`) —
        its parquet files are never read, rewritten, or moved. At
        10^12 rows, deleting k urls rewrites at most k bucket
        directories, not the table. Commits with no affected
        partition are left entirely alone (their manifest stays
        current). With `partition_values=None` affected commits are
        rewritten wholesale (unpartitioned fallback).

        With `anti_keys` (a DataFrame of keys to delete), the rewrite
        is a LEFT ANTI JOIN on `key_col` instead of a `condition`
        filter — the scale path for large delete lists, where an
        `isin` literal would bloat every rewrite plan (same rule as
        merge_upsert's key handling). Exactly one of `condition` /
        `anti_keys` must be given.

        Returns {"deleted_rows": n, "new_snapshots": [...],
        "rewritten_dirs": m}.
        """
        assert (condition is None) != (anti_keys is None), (
            "exactly one of condition / anti_keys"
        )
        deleted = 0
        new_snaps: list[int] = []
        rewritten = 0
        wanted = (
            None
            if partition_values is None
            else {f"{partition_col}={v}" for v in partition_values}
        )
        keys = (
            anti_keys.select(key_col).distinct() if anti_keys is not None
            else None
        )
        for c in self.active_commits():
            if predicate is not None and not predicate(c["meta"]):
                continue
            affected, untouched = self._classify_parts(c, partition_col, wanted)
            if not affected:
                continue  # commit untouched, manifest stays current
            # one read+filter+rewrite per affected basePath group
            stage = self.stage_dir()
            df = self._read_dirs(spark, affected)
            before = df.count()
            # SQL DELETE semantics: rows where the condition is NULL
            # are KEPT (a bare ~condition would drop them — e.g. a
            # NULL-url row in an affected bucket when deleting by url
            # list; ADVICE r1). The anti-join path keeps NULL-key rows
            # for free (NULL never equi-matches).
            from pyspark.sql import functions as F

            if keys is not None:
                kept = df.join(keys, key_col, "left_anti")
            else:
                kept = df.filter(~F.coalesce(condition, F.lit(False)))
            writer = kept.write.mode("overwrite")
            if wanted is not None:
                writer = writer.partitionBy(partition_col)
            writer.parquet(stage)
            has_files = any(
                f.endswith(".parquet")
                for _, _, fs in os.walk(stage) for f in fs
            )
            after = spark.read.parquet(stage).count() if has_files else 0
            deleted += before - after
            rewritten += len(affected)
            meta = dict(c["meta"])
            meta["delete"] = meta_note
            meta["deleted_rows"] = meta.get("deleted_rows", 0) + (before - after)
            stage_parts = (
                [{"path": os.path.relpath(stage, self.root),
                  "base": os.path.relpath(stage, self.root)}]
                if has_files else []
            )
            parts = stage_parts + untouched
            new_snaps.append(
                self.commit_parts(
                    parts, meta, replaces=[c["snapshot_id"]], op="delete"
                )
            )
        return {
            "deleted_rows": deleted,
            "new_snapshots": new_snaps,
            "rewritten_dirs": rewritten,
        }

    def merge_upsert(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key_col: str,
        partition_col: str = "bucket_id",
        predicate=None,
        meta_merge=None,
        meta_note: str = "merge",
    ) -> int:
        """Atomic MERGE (upsert by key) — the Iceberg `MERGE INTO ...
        WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT` analog
        in copy-on-write mode. `updates` must carry `partition_col`
        (the table's layout column); rows whose `key_col` already
        exists replace the old rows, new keys are inserted.

        ONE new snapshot replaces every affected commit atomically:
        its parts are (a) one stage dir holding [affected partitions'
        surviving rows (left-anti on the update keys) + all update
        rows] and (b) by-reference carries of every untouched
        partition directory. Partitions outside the updates' partition
        values are never read or rewritten; commits with no affected
        partition keep their manifest. The old-row filter is a
        LEFT ANTI JOIN on the (distinct) update keys — a broadcast
        join for CDC-sized batches, never a giant IN literal.

        `meta_merge(metas) -> meta` combines replaced commits'
        metadata (default: first commit's meta). Returns the new
        snapshot id.
        """
        parts_vals = [
            r[0] for r in updates.select(partition_col).distinct().collect()
        ]
        wanted = {f"{partition_col}={v}" for v in parts_vals}
        affected_sids: list[int] = []
        affected_dirs: list[tuple[str, str]] = []
        untouched: list[dict[str, str]] = []
        metas: list[dict[str, Any]] = []
        for c in self.active_commits():
            if predicate is not None and not predicate(c["meta"]):
                continue
            this_affected, this_untouched = self._classify_parts(
                c, partition_col, wanted
            )
            if this_affected:
                affected_dirs.extend(this_affected)
                affected_sids.append(c["snapshot_id"])
                untouched.extend(this_untouched)
                metas.append(c["meta"])

        old = self._read_dirs(spark, affected_dirs)
        keys = updates.select(key_col).distinct()
        merged = updates if old is None else (
            old.join(keys, key_col, "left_anti").unionByName(updates)
        )
        stage = self.stage_dir()
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(stage)

        if meta_merge and metas:
            meta = meta_merge(metas)
        elif metas:
            meta = _merge_metas_default(metas)
        else:
            meta = {}
        meta["merge"] = meta_note
        parts = [{"path": os.path.relpath(stage, self.root),
                  "base": os.path.relpath(stage, self.root)}] + untouched
        return self.commit_parts(
            parts, meta, replaces=affected_sids or None, op="overwrite"
        )

    def commit_parts(
        self,
        parts: list[dict[str, str]],
        meta: dict[str, Any],
        replaces: list[int] | None = None,
        op: str = "append",
    ) -> int:
        """Commit a multi-part snapshot (list of {path, base} refs,
        root-relative). Used by copy-on-write rewrites that carry
        untouched partition directories forward by reference."""
        payload: dict[str, Any] = {"parts": parts, "meta": meta, "op": op}
        if replaces:
            payload["replaces"] = sorted(int(s) for s in replaces)
        return self._publish(payload)

    # -- read path -----------------------------------------------------------
    def _parts(self, c: dict[str, Any]) -> list[tuple[str, str]]:
        """Resolve a commit to [(data_path, basePath)] absolute pairs."""
        if "parts" in c:
            return [
                (os.path.join(self.root, p["path"]),
                 os.path.join(self.root, p["base"]))
                for p in c["parts"]
            ]
        d = os.path.join(self.root, c["data"])
        return [(d, d)]

    def data_paths(self, predicate=None) -> list[str]:
        return [
            p
            for c in self.active_commits()
            if predicate is None or predicate(c["meta"])
            for p, _ in self._parts(c)
        ]

    def _read_commit(self, spark: SparkSession, c: dict[str, Any]) -> DataFrame | None:
        """DataFrame over one commit's parts (None for an all-deleted,
        zero-part commit)."""
        df = None
        for path, base in self._parts(c):
            part = spark.read.option("basePath", base).parquet(path)
            df = part if df is None else df.unionByName(
                part, allowMissingColumns=True
            )
        return df

    def read(
        self, spark: SparkSession, predicate=None, as_of: int | None = None
    ) -> DataFrame | None:
        """Union of all active commits (optionally meta-filtered).
        `as_of` time-travels to a historical snapshot id — replaced
        data dirs stay on disk precisely for this."""
        commits = [
            c for c in self.active_commits(as_of=as_of)
            if predicate is None or predicate(c["meta"])
        ]
        if not commits:
            return None
        # each commit dir is its own partition-discovery root; union them
        # (Iceberg would resolve this through its own manifests)
        df = None
        for c in commits:
            part = self._read_commit(spark, c)
            if part is not None:
                df = part if df is None else df.unionByName(
                    part, allowMissingColumns=True
                )
        return df

    # -- incremental read (changelog) -----------------------------------------
    @staticmethod
    def op_of(c: dict[str, Any]) -> str:
        """Snapshot operation type. Manifests written before `op`
        existed are inferred: a `replaces` edge meant compaction."""
        return c.get("op") or ("replace" if c.get("replaces") else "append")

    def _check_window(self, since: int, as_of: int) -> None:
        """Incremental/changelog windows must be built from snapshots
        that still exist. After compact+expire, an appended-then-
        compacted-then-expired snapshot would silently vanish from the
        window (ADVICE r1: read_incremental(since=0) returned None
        after all appends were compacted away; a compacted-then-expired
        delete disappeared from read_changelog). Iceberg raises
        'cannot find snapshot' here; so do we."""
        expired = self.expired_snapshot_ids()
        if since != 0 and since in expired:
            raise ValueError(
                f"cannot find snapshot {since} (expired); incremental "
                "reads must start from a retained snapshot"
            )
        lost = {e for e in expired if since < e <= as_of}
        if lost:
            raise ValueError(
                f"incremental window ({since}, {as_of}] crosses expired "
                f"snapshots {sorted(lost)}; their changes are no longer "
                "reconstructable — read a full snapshot instead"
            )

    def read_incremental(
        self,
        spark: SparkSession,
        since: int,
        as_of: int | None = None,
        predicate=None,
    ) -> DataFrame | None:
        """Rows APPENDED after snapshot `since` (exclusive) up to
        `as_of` (inclusive; default current) — the Iceberg incremental
        append scan (`from-snapshot-id` streaming read) analog. Lets a
        downstream consumer (dedup-index refresh, embedding indexer,
        export job) process only new data instead of re-scanning a
        10^12-row table.

        Semantics mirror Iceberg's IncrementalAppendScan exactly:
        `replace` snapshots (compaction — logical data unchanged) in
        the range are SKIPPED; a `delete`/`overwrite` snapshot in the
        range raises ValueError, because appended-rows-only is no
        longer a faithful changelog once rows were removed or
        rewritten. An append in the range later compacted away is
        still read from its original (retained) directory via time
        travel, so incremental consumers are unaffected by maintenance.
        """
        if as_of is None:
            as_of = self.current_snapshot_id()
        self._check_window(since, as_of)
        window = [
            c for c in self.commits() if since < c["snapshot_id"] <= as_of
        ]
        bad = [c for c in window if self.op_of(c) in ("delete", "overwrite")]
        if bad:
            raise ValueError(
                "incremental append scan crosses non-append snapshots "
                f"{[c['snapshot_id'] for c in bad]} "
                f"({[self.op_of(c) for c in bad]}); read a full snapshot "
                "instead or start after them"
            )
        appends = [
            c for c in window
            if self.op_of(c) == "append"
            and (predicate is None or predicate(c["meta"]))
        ]
        df = None
        for c in appends:
            part = self._read_commit(spark, c)
            if part is not None:
                df = part if df is None else df.unionByName(
                    part, allowMissingColumns=True
                )
        return df

    def read_changelog(
        self, spark: SparkSession, since: int, as_of: int | None = None
    ) -> DataFrame | None:
        """Row-level CDC between two snapshots — the Iceberg
        `create_changelog_view` analog: every row tagged
        `_change_type` insert|delete (an update = delete of the old
        row + insert of the new). Feeds downstream mirrors/indexes
        that must track removals, which `read_incremental` (appends
        only) cannot.

        Cost model: if the range contains only append/replace
        snapshots, this IS the incremental append scan (no diffing).
        Otherwise the two snapshot views' manifests are compared at
        partition-directory granularity — directories referenced by
        BOTH views (untouched partitions carried by reference across
        COW rewrites) cancel out and are never read; only rewritten
        directories are scanned, then multiset-diffed (exceptAll,
        one shuffle over the changed partitions, not the table).
        """
        from pyspark.sql import functions as F

        if as_of is None:
            as_of = self.current_snapshot_id()
        self._check_window(since, as_of)
        window_ops = {
            self.op_of(c) for c in self.commits()
            if since < c["snapshot_id"] <= as_of
        }
        if not (window_ops & {"delete", "overwrite"}):
            inc = self.read_incremental(spark, since, as_of)
            return (
                None if inc is None
                else inc.withColumn("_change_type", F.lit("insert"))
            )

        def leaf_parts(sid: int) -> set[tuple[str, str]]:
            """(dir, basePath) pairs of a snapshot view, expanded to
            partition subdirs so by-reference carries cancel."""
            out: set[tuple[str, str]] = set()
            for c in self.active_commits(as_of=sid):
                for path, base in self._parts(c):
                    subs = [
                        os.path.join(path, d)
                        for d in sorted(os.listdir(path))
                        if "=" in d and os.path.isdir(os.path.join(path, d))
                    ] if os.path.isdir(path) else []
                    if subs:
                        out.update((s, base) for s in subs)
                    else:
                        out.add((path, base))
            return out

        a = leaf_parts(since) if since > 0 else set()
        b = leaf_parts(as_of)

        def read_pairs(pairs: set[tuple[str, str]]) -> DataFrame | None:
            df = None
            for base in sorted({bb for _, bb in pairs}):
                dirs = sorted(p for p, bb in pairs if bb == base)
                part = spark.read.option("basePath", base).parquet(*dirs)
                df = part if df is None else df.unionByName(
                    part, allowMissingColumns=True
                )
            return df

        old = read_pairs(a - b)
        new = read_pairs(b - a)

        def align(x: DataFrame, y: DataFrame) -> DataFrame:
            ytypes = dict(y.dtypes)
            for m in set(y.columns) - set(x.columns):
                x = x.withColumn(m, F.lit(None).cast(ytypes[m]))
            return x.select(*sorted(set(x.columns) | set(y.columns)))

        out = None
        if new is not None:
            ins = new if old is None else align(new, old).exceptAll(
                align(old, new)
            )
            out = ins.withColumn("_change_type", F.lit("insert"))
        if old is not None:
            dels = old if new is None else align(old, new).exceptAll(
                align(new, old)
            )
            dels = dels.withColumn("_change_type", F.lit("delete"))
            out = dels if out is None else out.unionByName(dels)
        return out

    # -- snapshot expiry + orphan GC -------------------------------------------
    def expired_snapshot_ids(self) -> set[int]:
        p = os.path.join(self.manifest_dir, "_expired.json")
        if not os.path.exists(p):
            return set()
        with open(p) as fh:
            return set(json.load(fh))

    def expire_snapshots(
        self, retain_last: int = 1, orphan_grace_seconds: float = 86400.0
    ) -> dict[str, Any]:
        """Expire replaced (historical) snapshots and physically delete
        data directories no retained manifest references — the Iceberg
        `expire_snapshots` + `remove_orphan_files` analog. Time travel
        keeps every superseded directory on disk; without expiry a
        10^12-row table's storage grows with every compaction, delete,
        and merge, so bounded-retention expiry is a first-class
        maintenance operation.

        Retained: every ACTIVE commit (always, regardless of age) plus
        any snapshot within the trailing `retain_last` ids (the
        still-time-travelable window). Replaced snapshots outside that
        window lose their manifest; their data dirs are deleted unless
        a retained manifest still references them (copy-on-write
        carries parts by reference across commits, so reference
        counting — not age — decides physical deletion). GC runs at
        both whole-stage-dir and partition-subdir granularity.

        Orphan-GC safety (ADVICE r1): the resume model deliberately
        writes data dirs BEFORE their manifest commit, so an
        unreferenced directory may be a concurrent (or crashed,
        about-to-resume) writer's in-flight stage dir, not garbage.
        Directories that were referenced by a manifest expired IN THIS
        CALL are known historical data and deleted immediately; a
        never-referenced directory is deleted only when its mtime is
        older than `orphan_grace_seconds` (Iceberg's
        remove_orphan_files uses the same age-threshold rule).

        Returns {"expired": [...ids], "deleted_dirs": n}.
        """
        import shutil
        import time

        current = self.current_snapshot_id()
        active = {c["snapshot_id"] for c in self.active_commits()}
        cutoff = current - retain_last + 1
        all_commits = self.commits()
        expired = [
            c["snapshot_id"] for c in all_commits
            if c["snapshot_id"] not in active and c["snapshot_id"] < cutoff
        ]
        if not expired:
            return {"expired": [], "deleted_dirs": 0}
        # capture what the dying manifests referenced BEFORE removal:
        # those paths are known-historical, not in-flight stage dirs
        expired_refs = {
            os.path.normpath(p)
            for c in all_commits
            if c["snapshot_id"] in set(expired)
            for p, _ in self._parts(c)
        }
        for sid in expired:
            os.remove(os.path.join(self.manifest_dir, f"v{sid:06d}.json"))
        tomb = self.expired_snapshot_ids() | set(expired)
        tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(sorted(tomb), fh)
        os.rename(tmp, os.path.join(self.manifest_dir, "_expired.json"))

        # reference set: every path any remaining manifest points at
        refs = {
            os.path.normpath(p)
            for c in self.commits()
            for p, _ in self._parts(c)
        }

        def referenced(d: str) -> bool:
            d = os.path.normpath(d)
            return any(r == d or r.startswith(d + os.sep) for r in refs)

        def known_historical(d: str) -> bool:
            d = os.path.normpath(d)
            return any(
                r == d or r.startswith(d + os.sep) or d.startswith(r + os.sep)
                for r in expired_refs
            )

        now = time.time()

        def removable(d: str) -> bool:
            if known_historical(d):
                return True
            try:
                return (now - os.path.getmtime(d)) > orphan_grace_seconds
            except OSError:
                return False

        deleted = 0
        for top in sorted(os.listdir(self.data_dir)):
            top_path = os.path.join(self.data_dir, top)
            if not os.path.isdir(top_path):
                continue
            if top.endswith("_failed"):
                # quarantine dirs (run.py's failed-extraction spill) are
                # intentionally manifest-less — the run's error message
                # points users at them — so orphan GC must never treat
                # them as abandoned stage dirs.
                continue
            if not referenced(top_path):
                if removable(top_path):
                    shutil.rmtree(top_path)
                    deleted += 1
                continue
            if os.path.normpath(top_path) in refs:
                continue  # whole dir referenced; keep all subdirs
            for sub in sorted(os.listdir(top_path)):
                sub_path = os.path.join(top_path, sub)
                if (
                    os.path.isdir(sub_path)
                    and not referenced(sub_path)
                    and removable(sub_path)
                ):
                    shutil.rmtree(sub_path)
                    deleted += 1
        return {"expired": sorted(expired), "deleted_dirs": deleted}
