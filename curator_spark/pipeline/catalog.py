"""Catalog seam for the snapshot table (VERDICT r4 ask #9).

`SnapshotTable` (pipeline/snapshot.py) implements Iceberg-shaped
semantics — atomic staged commits, snapshot lineage + time travel,
COW delete/merge, incremental + changelog reads, snapshot expiry —
as a manifest-JSON layer over plain Parquet, because this sandbox has
no Iceberg/Delta runtime jar. This module extracts that capability
surface into an explicit interface so a production deployment slots a
real catalog in BY CONFIG and every call site (`QualityPipeline`, the
streaming committers, maintenance jobs) is format-agnostic:

    table = open_table(root_or_identifier, spark=spark)   # conf-driven

- ``CuratedTable``: the abstract surface. The method set is exactly
  what the call sites consume (grep-audited): staged two-phase append
  (stage_dir/commit), append, read(as_of)/read_incremental/
  read_changelog, delete_where/merge_upsert/compact/expire_snapshots,
  and the commit-lineage views (current_snapshot_id/active_commits)
  that resume and exactly-once streaming are built on.
- ``LocalSnapshotTable``: the sandbox implementation = SnapshotTable
  (re-exported; registered as a virtual subclass and signature-audited
  by tests/test_catalog_seam.py so drift between the seam and the
  store fails CI, which plain ABC registration would not).
- ``IcebergTable``: the production adapter, written against the
  PUBLIC Iceberg-Spark SQL surface only (writeTo + snapshot-property
  options, VERSION AS OF, DELETE/MERGE SQL, rewrite_data_files /
  expire_snapshots procedures, the .snapshots/.changes metadata
  tables). It cannot RUN here (no jar — construction degrades with a
  clear error), but the mapping is 1:1 and the interface conformance
  is tested.
"""

from __future__ import annotations

import abc
import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from curator_spark.pipeline.snapshot import SnapshotTable

FORMAT_CONF = "spark.curator.table.format"   # "local" (default) | "iceberg"
FORMAT_ENV = "CURATOR_TABLE_FORMAT"


class CuratedTable(abc.ABC):
    """Capability surface the pipeline requires of its output table."""

    # -- two-phase commit protocol (resume + exactly-once streaming) -----
    @abc.abstractmethod
    def stage_dir(self) -> str:
        """A path writers may fill WITHOUT readers seeing the data."""

    @abc.abstractmethod
    def commit(self, data_path: str, meta: dict[str, Any],
               replaces: list[int] | None = None, op: str = "append") -> int:
        """Atomically publish staged data + commit metadata."""

    @abc.abstractmethod
    def commit_parts(self, parts: list[dict[str, str]],
                     meta: dict[str, Any],
                     replaces: list[int] | None = None,
                     op: str = "append") -> int:
        """Publish a multi-part snapshot ({path, base} refs); with
        parts == [] this is a metadata-only commit (zero-row run
        slices still need their bucket bookkeeping committed)."""

    @abc.abstractmethod
    def append(self, df: DataFrame, meta: dict[str, Any],
               partition_by: list[str] | None = None) -> str:
        """stage + write + commit in one call."""

    # -- commit lineage (resume bookkeeping reads meta, never data) -------
    @abc.abstractmethod
    def current_snapshot_id(self) -> int: ...

    @abc.abstractmethod
    def active_commits(self, as_of: int | None = None) -> list[dict[str, Any]]:
        """[{snapshot_id, op, meta, ...}] for all live commits."""

    # -- read paths --------------------------------------------------------
    @abc.abstractmethod
    def read(self, spark: SparkSession, predicate=None,
             as_of: int | None = None) -> DataFrame | None: ...

    @abc.abstractmethod
    def read_incremental(self, spark: SparkSession, since: int,
                         as_of: int | None = None,
                         predicate=None) -> DataFrame | None: ...

    @abc.abstractmethod
    def read_changelog(self, spark: SparkSession, since: int,
                       as_of: int | None = None) -> DataFrame | None: ...

    # -- row-level mutation + maintenance ---------------------------------
    @abc.abstractmethod
    def delete_where(self, spark: SparkSession, **kwargs) -> dict[str, Any]: ...

    @abc.abstractmethod
    def merge_upsert(self, spark: SparkSession, updates: DataFrame,
                     key_col: str, **kwargs) -> int: ...

    @abc.abstractmethod
    def compact(self, spark: SparkSession, predicate=None, **kwargs): ...

    @abc.abstractmethod
    def expire_snapshots(self, retain_last: int = 1,
                         **kwargs) -> dict[str, Any]: ...


# The sandbox implementation. Virtual subclass (not inheritance) so
# snapshot.py stays import-light; tests/test_catalog_seam.py audits
# that every abstractmethod exists on it with a compatible signature.
LocalSnapshotTable = SnapshotTable
CuratedTable.register(SnapshotTable)


class IcebergTable(CuratedTable):
    """Adapter onto a real Iceberg catalog via the public Spark SQL
    surface. `identifier` is a fully-qualified ``catalog.db.table``;
    the catalog must be configured in the session
    (spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog).

    Commit metadata rides in snapshot summary properties
    (``snapshot-property.curator-meta`` write option), so resume and
    exactly-once streaming bookkeeping read the same meta dicts from
    the ``.snapshots`` metadata table that the local store reads from
    its manifests. NOT runnable in this sandbox (no Iceberg jar);
    every mapping below is the documented public API.
    """

    META_PROP = "curator-meta"

    def __init__(self, spark: SparkSession, identifier: str):
        self.spark = spark
        self.identifier = identifier
        self._catalog = identifier.split(".", 1)[0]
        try:  # fail construction early + clearly when the jar is absent
            spark.sql(f"SELECT 1 FROM {identifier}.snapshots LIMIT 0")
        except Exception as e:  # pragma: no cover - needs Iceberg runtime
            raise RuntimeError(
                f"Iceberg table {identifier!r} is not reachable — is the "
                f"iceberg-spark-runtime jar on the cluster and the "
                f"catalog configured? ({e})"
            ) from e

    # -- two-phase protocol: stage locally, publish via writeTo ----------
    def stage_dir(self) -> str:
        return os.path.join(
            self.spark.conf.get("spark.local.dir", "/tmp"),
            f"curator-stage-{uuid.uuid4().hex}",
        )

    def commit(self, data_path, meta, replaces=None, op="append") -> int:
        """op='overwrite' must REPLACE table contents (DedupIndex.
        rebuild's contract: stale keys may not survive). Dynamic
        partition overwrite would keep partitions absent from the new
        data, so it is an explicit DELETE FROM + append — two
        snapshots, preserving the table's partition spec; a reader in
        the brief empty window sees "no history", which for every
        consumer here (dedup marking, decontamination) means redo
        work, never lose data. The local store expresses replacement
        through `replaces` manifest edges instead — here Iceberg's own
        snapshot lineage records it, so `replaces` is intentionally
        unused."""
        df = self.spark.read.parquet(data_path)
        if op == "overwrite":
            self.spark.sql(f"DELETE FROM {self.identifier}")
        (df.writeTo(self.identifier)
           .option(f"snapshot-property.{self.META_PROP}", json.dumps(meta))
           .option("snapshot-property.curator-op", op)
           .append())
        return self.current_snapshot_id()

    def commit_parts(self, parts, meta, replaces=None, op="append") -> int:
        """parts == [] (the zero-row run-slice bookkeeping commit):
        append an empty slice of the table carrying the meta snapshot
        properties. Non-empty by-reference parts exist for the local
        store's COW protocol — Iceberg performs file-level rewrites
        internally (delete_where/merge_upsert/compact map to its SQL
        and procedures), so here the parts are materialized through a
        plain read+append."""
        if not parts:
            if op == "overwrite":
                # zero-part overwrite (e.g. DedupIndex.rebuild of an
                # emptied source): the replacement IS emptiness
                self.spark.sql(f"DELETE FROM {self.identifier}")
            (self.spark.table(self.identifier).limit(0)
                 .writeTo(self.identifier)
                 .option(f"snapshot-property.{self.META_PROP}",
                         json.dumps(meta))
                 .option("snapshot-property.curator-op", op)
                 .append())
            return self.current_snapshot_id()
        df = None
        for p in parts:
            part = self.spark.read.option("basePath", p["base"]).parquet(
                p["path"]
            )
            df = part if df is None else df.unionByName(
                part, allowMissingColumns=True
            )
        (df.writeTo(self.identifier)
           .option(f"snapshot-property.{self.META_PROP}", json.dumps(meta))
           .option("snapshot-property.curator-op", op)
           .append())
        return self.current_snapshot_id()

    def append(self, df, meta, partition_by=None) -> str:
        (df.writeTo(self.identifier)
           .option(f"snapshot-property.{self.META_PROP}", json.dumps(meta))
           .option("snapshot-property.curator-op", "append")
           .append())
        return self.identifier

    # -- lineage -----------------------------------------------------------
    def current_snapshot_id(self) -> int:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.identifier}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(row[0][0]) if row else 0

    def active_commits(self, as_of=None) -> list[dict[str, Any]]:
        """Chronological commit lineage from the `.snapshots` metadata
        table. `as_of` truncates AT that snapshot (inclusive) by
        POSITION in commit order — Iceberg snapshot ids are random
        64-bit values, so numeric comparison against them would pick
        an arbitrary subset of history."""
        q = (f"SELECT snapshot_id, parent_id, operation, summary "
             f"FROM {self.identifier}.snapshots ORDER BY committed_at")
        rows = self.spark.sql(q).collect()
        out = []
        for r in rows:
            summary = dict(r.summary or {})
            out.append({
                "snapshot_id": int(r.snapshot_id),
                "parent_id": (int(r.parent_id)
                              if r.parent_id is not None else None),
                "op": summary.get("curator-op", r.operation),
                "meta": json.loads(summary.get(self.META_PROP, "{}")),
            })
        if as_of is not None:
            ids = [c["snapshot_id"] for c in out]
            if as_of not in ids:
                raise ValueError(
                    f"snapshot {as_of} not in {self.identifier} history"
                )
            out = out[: ids.index(as_of) + 1]
        return out

    # -- reads ---------------------------------------------------------------
    def read(self, spark, predicate=None, as_of=None):
        if predicate is not None:
            # per-snapshot incremental unions mirror the local store's
            # meta-predicate read; plain reads never take this path.
            # The exclusive lower bound of each one-snapshot slice is
            # the snapshot's PARENT id from the .snapshots table —
            # Iceberg ids are random, sid-1 is not a snapshot.
            keep = [c for c in self.active_commits(as_of)
                    if predicate(c["meta"])]
            if not keep:
                return None
            parts = []
            for c in keep:
                if c["parent_id"] is None:
                    # root snapshot: its full content IS its append
                    parts.append(
                        spark.read.option("snapshot-id", c["snapshot_id"])
                        .table(self.identifier)
                    )
                else:
                    parts.append(
                        spark.read.format("iceberg")
                        .option("start-snapshot-id", c["parent_id"])
                        .option("end-snapshot-id", c["snapshot_id"])
                        .load(self.identifier)
                    )
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p, allowMissingColumns=True)
            return df
        r = spark.read
        if as_of is not None:
            r = r.option("snapshot-id", as_of)
        return r.table(self.identifier)

    def read_incremental(self, spark, since, as_of=None, predicate=None):
        r = (spark.read.format("iceberg")
             .option("start-snapshot-id", since))
        if as_of is not None:
            r = r.option("end-snapshot-id", as_of)
        return r.load(self.identifier)

    def read_changelog(self, spark, since, as_of=None):
        end = as_of if as_of is not None else self.current_snapshot_id()
        self.spark.sql(
            f"CALL {self._catalog}.system.create_changelog_view("
            f"table => '{self.identifier}', "
            f"options => map('start-snapshot-id','{since}',"
            f"'end-snapshot-id','{end}'), "
            f"changelog_view => 'curator_changes')"
        )
        return spark.table("curator_changes")

    # -- mutation + maintenance (COW is Iceberg-internal) -----------------
    def delete_where(self, spark, condition=None, partition_values=None,
                     partition_col="bucket_id", predicate=None,
                     meta_note="delete", anti_keys=None, key_col="url"):
        """Maps the local store's delete surface onto `DELETE FROM`:
        `anti_keys` (the delete-list DataFrame, e.g. GDPR urls) becomes
        an IN-subquery on a temp view; `partition_values` become an
        explicit partition-column conjunct (Iceberg additionally
        prunes on it); a string `condition` is used verbatim. A
        pyspark Column condition and meta-`predicate` scoping are
        local-store concepts — rejected with guidance rather than
        silently dropped (the silent **kwargs swallow produced
        `DELETE ... WHERE None`)."""
        if predicate is not None:
            raise ValueError(
                "meta-predicate delete scoping is a manifest-store "
                "concept; scope the Iceberg DELETE by a data column"
            )
        clauses = []
        if anti_keys is not None:
            view = f"curator_del_{uuid.uuid4().hex[:8]}"
            anti_keys.select(key_col).createOrReplaceTempView(view)
            clauses.append(
                f"{key_col} IN (SELECT {key_col} FROM {view})"
            )
        if condition is not None:
            if not isinstance(condition, str):
                raise ValueError(
                    "the Iceberg adapter needs the delete condition as "
                    "SQL text, not a pyspark Column"
                )
            clauses.append(f"({condition})")
        if partition_values:
            vals = ", ".join(repr(v) for v in partition_values)
            clauses.append(f"{partition_col} IN ({vals})")
        if not clauses:
            raise ValueError("refusing an unscoped DELETE (no condition)")
        spark.sql(
            f"DELETE FROM {self.identifier} WHERE "
            + " AND ".join(clauses)
        )
        return {"snapshot_id": self.current_snapshot_id(),
                "note": meta_note}

    def merge_upsert(self, spark, updates, key_col, **kwargs) -> int:
        updates.createOrReplaceTempView("curator_merge_src")
        cols = updates.columns
        sets = ", ".join(f"t.{c} = s.{c}" for c in cols)
        ins = ", ".join(cols)
        vals = ", ".join(f"s.{c}" for c in cols)
        spark.sql(
            f"MERGE INTO {self.identifier} t USING curator_merge_src s "
            f"ON t.{key_col} = s.{key_col} "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins}) VALUES ({vals})"
        )
        return self.current_snapshot_id()

    def compact(self, spark, predicate=None, where: str | None = None,
                **kwargs):
        """rewrite_data_files; `where` (SQL text) scopes the rewrite —
        the procedure's own `where` argument. The local store's
        meta-`predicate` scoping has no Iceberg analog (snapshot
        summaries don't partition data files), so it is rejected, not
        ignored — an unscoped whole-table rewrite is an expensive
        surprise."""
        if predicate is not None:
            raise ValueError(
                "meta-predicate compaction scoping is a manifest-store "
                "concept; use `where` (a data-column SQL filter) here"
            )
        args = f"table => '{self.identifier}'"
        if where:
            args += f", where => '{where}'"
        spark.sql(
            f"CALL {self._catalog}.system.rewrite_data_files({args})"
        )
        return self.current_snapshot_id()

    def expire_snapshots(self, retain_last=1, **kwargs):
        self.spark.sql(
            f"CALL {self._catalog}.system.expire_snapshots("
            f"table => '{self.identifier}', retain_last => {retain_last})"
        )
        return {"retained_last": retain_last}


def open_table(
    root_or_identifier: str,
    spark: SparkSession | None = None,
    fmt: str | None = None,
) -> CuratedTable:
    """Config-driven table constructor — THE seam.

    Format resolution: explicit `fmt` arg > session conf
    ``spark.curator.table.format`` (from `spark` or, when the caller
    has no session handle — QualityPipeline's constructor — the active
    session) > env ``CURATOR_TABLE_FORMAT`` > "local". For "local",
    `root_or_identifier` is a filesystem root; for "iceberg", a
    fully-qualified table identifier (requires a session).
    """
    if spark is None:
        spark = SparkSession.getActiveSession()
    if fmt is None and spark is not None:
        try:
            fmt = spark.conf.get(FORMAT_CONF, None)
        except Exception:
            fmt = None
    if fmt is None:
        fmt = os.environ.get(FORMAT_ENV, "local")
    if fmt == "local":
        return SnapshotTable(root_or_identifier)
    if fmt == "iceberg":
        if spark is None:
            raise ValueError("fmt='iceberg' requires a SparkSession")
        return IcebergTable(spark, root_or_identifier)
    raise ValueError(f"unknown table format {fmt!r} (local|iceberg)")
