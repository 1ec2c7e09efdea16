"""Snapshot-table maintenance semantics: incremental (changelog) read,
snapshot expiry + orphan-file GC, and schema evolution on read.

These are the Iceberg analogs a 10^12-row table needs beyond
append/compact/delete/merge: `read_incremental` mirrors Iceberg's
IncrementalAppendScan (skip `replace`, throw on `delete`/`overwrite`),
`expire_snapshots` mirrors `expire_snapshots` + `remove_orphan_files`
(reference-counted physical deletion, bounded time-travel window), and
ADD-COLUMN evolution resolves by name with nulls for old data files.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from curator_spark.pipeline.snapshot import SnapshotTable


def _mk(spark, lo: int, hi: int, n_buckets: int = 4):
    """Deterministic rows keyed by id, bucketed like the pipeline."""
    return (
        spark.range(lo, hi)
        .withColumn("bucket_id",
                    F.pmod(F.xxhash64("id"), F.lit(n_buckets)).cast("int"))
        .withColumn("val", (F.col("id") * 7).cast("long"))
    )


def _ids(df) -> set[int]:
    return {r["id"] for r in df.select("id").collect()}


def test_incremental_read_appends_only(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 50), {"batch": 1}, partition_by=["bucket_id"])
    s1 = t.current_snapshot_id()
    t.append(_mk(spark, 50, 80), {"batch": 2}, partition_by=["bucket_id"])
    t.append(_mk(spark, 80, 100), {"batch": 3}, partition_by=["bucket_id"])

    inc = t.read_incremental(spark, since=s1)
    assert _ids(inc) == set(range(50, 100))
    # empty window -> None
    assert t.read_incremental(spark, since=t.current_snapshot_id()) is None
    # bounded window: (s1, s1+1]
    inc2 = t.read_incremental(spark, since=s1, as_of=s1 + 1)
    assert _ids(inc2) == set(range(50, 80))


def test_incremental_read_skips_compaction_replace(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 50), {"batch": 1}, partition_by=["bucket_id"])
    s1 = t.current_snapshot_id()
    t.append(_mk(spark, 50, 80), {"batch": 2}, partition_by=["bucket_id"])
    t.append(_mk(spark, 80, 100), {"batch": 3}, partition_by=["bucket_id"])
    assert t.compact(spark, partition_by=["bucket_id"]) is not None

    # the replace snapshot is in range but logical data didn't change:
    # consumers still see exactly the appended rows, read from the
    # original (retained) directories
    inc = t.read_incremental(spark, since=s1)
    assert _ids(inc) == set(range(50, 100))


def test_incremental_read_raises_on_delete_in_range(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 50), {"batch": 1}, partition_by=["bucket_id"])
    s1 = t.current_snapshot_id()
    t.append(_mk(spark, 50, 80), {"batch": 2}, partition_by=["bucket_id"])
    t.delete_where(spark, F.col("id") < 10)
    with pytest.raises(ValueError, match="non-append"):
        t.read_incremental(spark, since=s1)
    # starting after the delete is fine again
    s_del = t.current_snapshot_id()
    t.append(_mk(spark, 100, 110), {"batch": 4}, partition_by=["bucket_id"])
    assert _ids(t.read_incremental(spark, since=s_del)) == set(range(100, 110))


def test_expire_snapshots_gc_and_time_travel_boundary(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 60), {"batch": 1}, partition_by=["bucket_id"])
    t.append(_mk(spark, 60, 90), {"batch": 2}, partition_by=["bucket_id"])
    sid_pre = t.current_snapshot_id()
    t.delete_where(
        spark, F.col("id").isin([0, 1, 2]),
        partition_values=sorted(
            {r["bucket_id"] for r in _mk(spark, 0, 3).collect()}
        ),
    )
    # history intact: time travel still sees deleted rows
    pre = t.read(spark, as_of=sid_pre)
    assert _ids(pre) == set(range(0, 90))
    def _n_parquet() -> int:
        return sum(
            1 for _, _, fs in os.walk(t.data_dir)
            for f in fs if f.endswith(".parquet")
        )

    n_files_before = _n_parquet()
    res = t.expire_snapshots(retain_last=1)
    assert res["expired"], "replaced snapshots should expire"
    # the victim buckets' pre-delete files are physically gone (GC is
    # subdir-granular: untouched buckets stay, carried by reference)
    assert res["deleted_dirs"] >= 1
    assert _n_parquet() < n_files_before

    # current view byte-for-byte unaffected
    cur = t.read(spark)
    assert _ids(cur) == set(range(3, 90))
    # expired snapshot no longer time-travelable — explicit error,
    # never a silently-wrong historical view
    with pytest.raises(ValueError, match="expired"):
        t.read(spark, as_of=sid_pre)
    # idempotent
    assert t.expire_snapshots(retain_last=1)["expired"] == []


def test_expire_keeps_dirs_carried_by_reference(spark, tmp_path):
    """COW delete carries untouched bucket dirs of the ORIGINAL commit
    by reference; expiring the original snapshot must not delete those
    dirs (reference counting, not age, decides physical deletion)."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 60), {"batch": 1}, partition_by=["bucket_id"])
    victims = [0, 1]
    vb = sorted({r["bucket_id"] for r in _mk(spark, 0, 2).collect()})
    t.delete_where(spark, F.col("id").isin(victims), partition_values=vb)
    t.expire_snapshots(retain_last=1)
    cur = t.read(spark)
    assert _ids(cur) == set(range(2, 60))


def test_changelog_append_only_is_inserts(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 40), {"b": 1}, partition_by=["bucket_id"])
    s1 = t.current_snapshot_id()
    t.append(_mk(spark, 40, 60), {"b": 2}, partition_by=["bucket_id"])
    cl = t.read_changelog(spark, since=s1)
    assert {r["_change_type"] for r in cl.select("_change_type").distinct().collect()} == {"insert"}
    assert _ids(cl) == set(range(40, 60))
    # compaction-only window -> no logical change
    t.compact(spark, partition_by=["bucket_id"])
    assert t.read_changelog(spark, since=t.current_snapshot_id() - 1) is None


def test_changelog_delete_emits_deletes(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 60), {"b": 1}, partition_by=["bucket_id"])
    s1 = t.current_snapshot_id()
    vb = sorted({r["bucket_id"] for r in _mk(spark, 0, 3).collect()})
    t.delete_where(spark, F.col("id") < 3, partition_values=vb)
    cl = t.read_changelog(spark, since=s1)
    rows = {(r["id"], r["_change_type"]) for r in cl.collect()}
    assert rows == {(0, "delete"), (1, "delete"), (2, "delete")}


def test_changelog_merge_is_delete_plus_insert(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 60), {"b": 1}, partition_by=["bucket_id"])
    s1 = t.current_snapshot_id()
    ups = _mk(spark, 5, 7).withColumn("val", F.lit(-1).cast("long"))
    new = _mk(spark, 100, 101)
    t.merge_upsert(spark, ups.unionByName(new), key_col="id")
    cl = t.read_changelog(spark, since=s1)
    rows = {(r["id"], r["val"], r["_change_type"]) for r in cl.collect()}
    assert (5, -1, "insert") in rows and (5, 35, "delete") in rows
    assert (6, -1, "insert") in rows and (6, 42, "delete") in rows
    assert (100, 700, "insert") in rows
    # untouched rows never appear in the delta
    assert not {r for r in rows if r[0] not in (5, 6, 100)}


def test_schema_evolution_add_column_on_read(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 30), {"batch": 1}, partition_by=["bucket_id"])
    evolved = _mk(spark, 30, 50).withColumn("quality", F.lit(0.5))
    t.append(evolved, {"batch": 2}, partition_by=["bucket_id"])

    df = t.read(spark)
    assert "quality" in df.columns
    assert df.count() == 50
    # old data files resolve the new column to null (Iceberg ADD COLUMN)
    assert df.filter(F.col("quality").isNull()).count() == 30
    assert df.filter(F.col("quality") == 0.5).count() == 20

    # compaction normalizes the layout under the merged schema
    assert t.compact(spark, partition_by=["bucket_id"]) is not None
    df2 = t.read(spark)
    assert df2.count() == 50 and "quality" in df2.columns
    assert df2.filter(F.col("quality").isNull()).count() == 30


# ---------------------------------------------------------------------------
# ADVICE r1 hardening: expiry must never yield a silently-partial view.
# ---------------------------------------------------------------------------

def test_time_travel_rejects_partial_historical_view(spark, tmp_path):
    """append s1, append s2, delete replacing only s1's rows, expire s1:
    as_of=s2 included s1's data (now gone) -> explicit error, never a
    partial view; as_of=current still works."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 40), {"b": 1}, partition_by=["bucket_id"])
    s1 = t.current_snapshot_id()
    t.append(_mk(spark, 40, 60), {"b": 2}, partition_by=["bucket_id"])
    s2 = t.current_snapshot_id()
    # rewrite ONLY s1's commit (meta-predicate pruning): s2 stays active
    t.delete_where(spark, F.col("id") < 40, predicate=lambda m: m.get("b") == 1)
    s3 = t.current_snapshot_id()
    t.expire_snapshots(retain_last=1)
    assert s1 in t.expired_snapshot_ids()
    with pytest.raises(ValueError, match="not reproducible"):
        t.read(spark, as_of=s2)
    assert _ids(t.read(spark, as_of=s3)) == set(range(40, 60))
    assert _ids(t.read(spark)) == set(range(40, 60))


def test_incremental_read_rejects_expired_window(spark, tmp_path):
    """appends 1,2 -> compact (3) -> expire 1,2: an incremental read
    whose window crosses the expired appends must raise (Iceberg:
    'cannot find snapshot'), not silently return None."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 30), {"b": 1}, partition_by=["bucket_id"])
    t.append(_mk(spark, 30, 50), {"b": 2}, partition_by=["bucket_id"])
    t.compact(spark, partition_by=["bucket_id"])
    t.expire_snapshots(retain_last=1)
    with pytest.raises(ValueError, match="expired"):
        t.read_incremental(spark, since=0)
    with pytest.raises(ValueError, match="expired"):
        t.read_changelog(spark, since=0)
    # a window starting after the expired snapshots still works
    assert t.read_incremental(spark, since=t.current_snapshot_id()) is None


def test_delete_where_keeps_null_condition_rows(spark, tmp_path):
    """SQL DELETE semantics: NULL-evaluating rows survive the delete."""
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(None, 0), ("http://a", 0), ("http://b", 0)], "url string, bucket_id int"
    )
    t.append(df, {"b": 1}, partition_by=["bucket_id"])
    res = t.delete_where(
        spark, F.col("url").isin(["http://a"]), partition_values=[0]
    )
    assert res["deleted_rows"] == 1
    left = {r["url"] for r in t.read(spark).collect()}
    assert left == {None, "http://b"}


def test_orphan_gc_spares_inflight_stage_dir(spark, tmp_path):
    """A staged-but-uncommitted write dir (the resume model writes data
    BEFORE the manifest commit) must survive orphan GC inside the grace
    window, and be collected once it ages out."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.append(_mk(spark, 0, 20), {"b": 1}, partition_by=["bucket_id"])
    t.append(_mk(spark, 20, 30), {"b": 2}, partition_by=["bucket_id"])
    t.compact(spark, partition_by=["bucket_id"])

    inflight = t.stage_dir()
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "wb") as fh:
        fh.write(b"stub")

    res = t.expire_snapshots(retain_last=1)
    assert res["expired"]  # the replaced appends expired...
    assert os.path.isdir(inflight)  # ...but the in-flight dir survived

    # age the dir past the grace window -> collected on the next run
    old = 0  # epoch
    os.utime(inflight, (old, old))
    t.append(_mk(spark, 30, 40), {"b": 3}, partition_by=["bucket_id"])
    t.append(_mk(spark, 40, 50), {"b": 4}, partition_by=["bucket_id"])
    t.compact(spark, partition_by=["bucket_id"])
    t.expire_snapshots(retain_last=1)
    assert not os.path.isdir(inflight)
