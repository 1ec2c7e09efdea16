"""Incremental dedup-index maintenance (`pipeline/dedup_index.py`):
the `read_incremental` consumer COVERAGE names — a persistent seen-set
table refreshed from append slices so new snapshots dedup against
history without re-scanning it (the reference re-reads every response
file per run, base_request_processor.py:609-651; this is the O(new)
restatement).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from curator_spark.pipeline.dedup_index import DedupIndex
from curator_spark.pipeline.snapshot import SnapshotTable


def _docs(spark, lo: int, hi: int, dup_of: list[int] | None = None):
    """Rows url_i/text_i for i in [lo,hi); plus redirect rows whose
    TEXT duplicates doc j (distinct url, same text) for j in dup_of."""
    base = spark.range(lo, hi).select(
        F.concat(F.lit("https://ex.com/p"), F.col("id")).alias("url"),
        F.concat(F.lit("body of page "), F.col("id")).alias("text"),
    )
    if dup_of:
        mirrors = spark.createDataFrame(
            [(f"https://mirror.net/m{j}", f"body of page {j}") for j in dup_of],
            "url string, text string",
        )
        base = base.unionByName(mirrors)
    return base


@pytest.fixture()
def tables(spark, tmp_path):
    src = SnapshotTable(str(tmp_path / "src"))
    idx = DedupIndex(str(tmp_path / "idx"), key_expr="text", n_buckets=8)
    return src, idx


def test_refresh_indexes_only_the_append_slice(spark, tables):
    src, idx = tables
    src.append(_docs(spark, 0, 100), {"b": 1})
    r1 = idx.refresh(spark, src)
    assert r1["status"] == "refreshed"
    assert r1["slice_keys"] == 100 and r1["new_keys"] == 100
    assert idx.indexed_through == src.current_snapshot_id()

    # Second batch: 30 genuinely new docs + 5 mirrors of history.
    src.append(_docs(spark, 100, 130, dup_of=[3, 7, 11, 13, 17]), {"b": 2})
    r2 = idx.refresh(spark, src)
    # Only the slice was processed (35 keys, not 135).
    assert r2["slice_keys"] == 35
    assert r2["new_keys"] == 30
    assert r2["dup_of_history"] == 5
    keys = idx.read_keys(spark)
    assert keys.count() == 130
    # Keys are unique (5 mirror texts were NOT re-indexed).
    assert keys.select("key").distinct().count() == 130


def test_refresh_is_idempotent_when_up_to_date(spark, tables):
    src, idx = tables
    src.append(_docs(spark, 0, 20), {"b": 1})
    idx.refresh(spark, src)
    before = idx.table.current_snapshot_id()
    r = idx.refresh(spark, src)
    assert r["status"] == "up_to_date"
    assert idx.table.current_snapshot_id() == before  # no empty commit churn


def test_dup_within_one_slice_keeps_min_doc_ref(spark, tables):
    src, idx = tables
    df = spark.createDataFrame(
        [("https://a/1", "same body"), ("https://a/0", "same body"),
         ("https://a/2", "other body")],
        "url string, text string",
    )
    src.append(df, {"b": 1})
    r = idx.refresh(spark, src)
    assert r["slice_keys"] == 2 and r["new_keys"] == 2
    rows = {x["doc_ref"] for x in idx.read_keys(spark).collect()}
    assert rows == {"https://a/0", "https://a/2"}  # deterministic min


def test_mark_history_dups_tags_without_mutating(spark, tables):
    src, idx = tables
    src.append(_docs(spark, 0, 50), {"b": 1})
    idx.refresh(spark, src)
    sid = idx.table.current_snapshot_id()

    batch = _docs(spark, 50, 55, dup_of=[1, 2])
    marked = idx.mark_history_dups(spark, batch)
    got = {r["url"]: (r["dup_of_history"], r["dup_canonical"])
           for r in marked.collect()}
    assert got["https://mirror.net/m1"] == (True, "https://ex.com/p1")
    assert got["https://mirror.net/m2"] == (True, "https://ex.com/p2")
    for i in range(50, 55):
        assert got[f"https://ex.com/p{i}"] == (False, None)
    assert idx.table.current_snapshot_id() == sid  # read-only


def test_source_delete_breaks_append_indexing_and_rebuild_recovers(
    spark, tables
):
    src, idx = tables
    src.append(_docs(spark, 0, 40), {"b": 1})
    idx.refresh(spark, src)
    src.append(_docs(spark, 40, 60), {"b": 2})
    src.delete_where(spark, condition=F.col("url") == "https://ex.com/p5")
    with pytest.raises(ValueError, match="non-append"):
        idx.refresh(spark, src)

    r = idx.rebuild(spark, src)
    assert r["status"] == "rebuilt"
    assert r["index_keys"] == 59  # 60 docs minus the deleted one
    assert idx.indexed_through == src.current_snapshot_id()
    # Post-rebuild, incremental refresh resumes normally.
    src.append(_docs(spark, 60, 70), {"b": 3})
    r2 = idx.refresh(spark, src)
    assert r2["status"] == "refreshed" and r2["new_keys"] == 10


def test_compaction_only_window_advances_watermark(spark, tables):
    src, idx = tables
    src.append(_docs(spark, 0, 10), {"b": 1})
    src.append(_docs(spark, 10, 20), {"b": 2})
    idx.refresh(spark, src)
    src.compact(spark)  # replace snapshot: logical data unchanged
    r = idx.refresh(spark, src)
    assert r["status"] == "advanced" and r["new_keys"] == 0
    assert idx.indexed_through == src.current_snapshot_id()
    # The watermark-only commit is zero-part: the index must stay
    # readable (an empty parquet dir would break schema discovery).
    assert idx.read_keys(spark).count() == 20


def test_all_dup_slice_commits_watermark_only(spark, tables):
    """A slice that is 100% already-indexed (n_new=0) must advance the
    watermark with a zero-part commit and leave the index readable."""
    src, idx = tables
    src.append(_docs(spark, 0, 15), {"b": 1})
    idx.refresh(spark, src)
    src.append(_docs(spark, 0, 15), {"b": 2})  # pure re-append
    r = idx.refresh(spark, src)
    assert r["status"] == "refreshed"
    assert r["new_keys"] == 0 and r["dup_of_history"] == 15
    assert idx.indexed_through == src.current_snapshot_id()
    assert idx.read_keys(spark).count() == 15
    # and refresh after it resumes normally
    src.append(_docs(spark, 15, 18), {"b": 3})
    assert idx.refresh(spark, src)["new_keys"] == 3


def test_index_layout_and_config_pinning(spark, tables, tmp_path):
    src, idx = tables
    src.append(_docs(spark, 0, 30), {"b": 1})
    idx.refresh(spark, src)

    # On-disk layout: bucket=N partition dirs (prunable, compactable).
    data_dirs = [d for c in idx.table.active_commits()
                 for d in [os.path.join(idx.table.root, c["data"])]]
    parts = {p for d in data_dirs for p in os.listdir(d)
             if p.startswith("bucket=")}
    assert parts, "index data not partitioned by bucket"

    # A conflicting n_buckets or key_expr on an existing index raises.
    root = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="n_buckets"):
        DedupIndex(root, key_expr="text", n_buckets=16)
    with pytest.raises(ValueError, match="key_expr"):
        DedupIndex(root, key_expr="url", n_buckets=8)
    # Matching config re-opens fine and sees the watermark.
    again = DedupIndex(root, key_expr="text", n_buckets=8)
    assert again.indexed_through == src.current_snapshot_id()


def test_duplicate_index_keys_never_inflate_marked_batches(spark, tables):
    """If concurrent refreshes ever register overlapping key sets, the
    index holds duplicate key rows — marking must stay one-row-per-
    batch-row (redundant storage, never row inflation)."""
    src, idx = tables
    src.append(_docs(spark, 0, 10), {"b": 1})
    idx.refresh(spark, src)
    # simulate the race: append the same key set again, bypassing the
    # anti-join (as a second concurrent refresh would have)
    dup_keys = idx.keys_of(_docs(spark, 0, 10))
    idx.table.append(dup_keys.repartition("bucket"),
                     idx._meta(new_keys=10), partition_by=["bucket"])
    assert idx.read_keys(spark).count() == 20  # corrupted: 10 keys twice

    batch = _docs(spark, 8, 12)  # 2 dup-of-history + 2 fresh
    marked = idx.mark_history_dups(spark, batch)
    assert marked.count() == 4  # NOT 6
    got = {r["url"]: r["dup_of_history"] for r in marked.collect()}
    assert got == {
        "https://ex.com/p8": True, "https://ex.com/p9": True,
        "https://ex.com/p10": False, "https://ex.com/p11": False,
    }
    # refresh against the corrupted index also stays sane: no re-add
    r = idx.refresh(spark, src)  # up-to-date window
    assert r["new_keys"] == 0


def test_randomized_op_sequence_matches_model(spark, tmp_path):
    """Model-based check: a seeded random interleaving of source
    appends (new + repeated texts), refreshes, source compactions, and
    read-only marks must keep the index equal to a pure-Python model
    (key set, uniqueness, watermark, membership answers)."""
    import hashlib
    import random

    rng = random.Random(20260820)
    src = SnapshotTable(str(tmp_path / "src"))
    idx = DedupIndex(str(tmp_path / "idx"), key_expr="text", n_buckets=4)

    def key(t: str) -> str:
        return hashlib.md5(t.encode()).hexdigest()

    all_texts: list[str] = []     # every text ever appended (source rows)
    indexed: set[str] = set()     # model: keys the index must hold
    next_id = 0

    def append_batch():
        nonlocal next_id
        rows = []
        for _ in range(rng.randint(1, 8)):
            if all_texts and rng.random() < 0.4:
                t = rng.choice(all_texts)      # repeat an old text
            else:
                t = f"text number {next_id}"
            rows.append((f"u{next_id}", t))
            all_texts.append(t)
            next_id += 1
        src.append(
            spark.createDataFrame(rows, "url string, text string"),
            {"n": len(rows)},
        )

    append_batch()
    for step in range(14):
        op = rng.choice(["append", "refresh", "compact", "mark", "reopen"])
        if op == "append":
            append_batch()
        elif op == "refresh":
            before = set(indexed)
            r = idx.refresh(spark, src)
            # model: refresh indexes every text appended so far
            indexed.update(key(t) for t in all_texts)
            assert r["new_keys"] == len(indexed) - len(before)
            assert idx.indexed_through == src.current_snapshot_id()
        elif op == "compact":
            src.compact(spark)
        elif op == "reopen":
            idx = DedupIndex(str(tmp_path / "idx"),
                             key_expr="text", n_buckets=4)
        else:  # mark a probe batch: half seen-by-model, half novel
            probe = [(f"p{step}-{i}", rng.choice(all_texts))
                     for i in range(2)] + [
                    (f"p{step}-new{i}", f"novel {step}-{i}")
                    for i in range(2)]
            marked = idx.mark_history_dups(
                spark,
                spark.createDataFrame(probe, "url string, text string"),
            )
            got = {r["url"]: r["dup_of_history"] for r in marked.collect()}
            for u, t in probe:
                assert got[u] == (key(t) in indexed), (step, u, t)
        # global invariants after every op
        keys_df = idx.read_keys(spark)
        got_keys = (set() if keys_df is None
                    else {r["key"] for r in keys_df.select("key").collect()})
        assert got_keys == indexed, f"step {step}: index != model"
        if keys_df is not None:
            assert keys_df.count() == len(got_keys)  # uniqueness

    # final full refresh drains everything
    idx.refresh(spark, src)
    indexed.update(key(t) for t in all_texts)
    assert {r["key"] for r in idx.read_keys(spark).collect()} == indexed


def test_shuffle_route_above_broadcast_cap_same_answers(spark, tmp_path):
    """broadcast_cap=3 forces the initial-build/backfill route (plain
    semi-join, no broadcast hint) through refresh AND marking — results
    must be identical to the broadcast route's."""
    src = SnapshotTable(str(tmp_path / "src"))
    small = DedupIndex(str(tmp_path / "i_shuffle"), key_expr="text",
                       n_buckets=4, broadcast_cap=3)
    big = DedupIndex(str(tmp_path / "i_bcast"), key_expr="text",
                     n_buckets=4)
    src.append(_docs(spark, 0, 30), {"b": 1})
    r_s, r_b = small.refresh(spark, src), big.refresh(spark, src)
    assert (r_s["new_keys"], r_s["dup_of_history"]) == (30, 0) == (
        r_b["new_keys"], r_b["dup_of_history"])
    src.append(_docs(spark, 30, 40, dup_of=[1, 2, 3]), {"b": 2})
    r_s, r_b = small.refresh(spark, src), big.refresh(spark, src)
    assert (r_s["new_keys"], r_s["dup_of_history"]) == (10, 3) == (
        r_b["new_keys"], r_b["dup_of_history"])

    batch = _docs(spark, 40, 44, dup_of=[5, 6])
    for idx in (small, big):
        got = {r["url"]: r["dup_of_history"]
               for r in idx.mark_history_dups(spark, batch).collect()}
        assert got["https://mirror.net/m5"] and got["https://mirror.net/m6"]
        assert sum(got.values()) == 2
    assert ({r["key"] for r in small.read_keys(spark).collect()}
            == {r["key"] for r in big.read_keys(spark).collect()})


def test_history_never_shuffles_on_broadcast_route(spark, tables):
    """Plan shape: the dup-detection join must broadcast the slice and
    stream the index — no Exchange on the index side."""
    src, idx = tables
    src.append(_docs(spark, 0, 200), {"b": 1})
    idx.refresh(spark, src)
    existing = idx.read_keys(spark)
    slice_keys = idx.keys_of(_docs(spark, 200, 210, dup_of=[0]))
    dup = idx._dup_keys(spark, slice_keys, 11)
    plan = dup._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert existing is not None


def test_allow_repin_defers_conflict_until_rebuild(spark, tables, tmp_path):
    """The config-conflict remedy (rebuild) must be REACHABLE: a
    conflicting reopen raises eagerly by default, but with
    allow_repin=True the object constructs, every membership op
    refuses until rebuild() re-pins, and afterwards the new config is
    the pinned one."""
    src, idx = tables
    src.append(_docs(spark, 0, 20), {"b": 1})
    idx.refresh(spark, src)
    root = str(tmp_path / "idx")

    # default: eager raise (unchanged contract)
    with pytest.raises(ValueError, match="key_expr"):
        DedupIndex(root, key_expr="url", n_buckets=8)

    rekeyed = DedupIndex(root, key_expr="url", n_buckets=8, allow_repin=True)
    batch = _docs(spark, 0, 5)
    with pytest.raises(ValueError, match="pending rebuild"):
        rekeyed.refresh(spark, src)
    with pytest.raises(ValueError, match="pending rebuild"):
        rekeyed.add_keys(spark, batch)
    with pytest.raises(ValueError, match="pending rebuild"):
        rekeyed.mark_history_dups(spark, batch)

    r = rekeyed.rebuild(spark, src)
    assert r["status"] == "rebuilt" and r["index_keys"] == 20
    # operations now run under the NEW config...
    marked = rekeyed.mark_history_dups(spark, _docs(spark, 0, 3))
    assert marked.where("dup_of_history").count() == 3  # url-keyed now
    # ...and a plain reopen with the new config passes the pin check
    again = DedupIndex(root, key_expr="url", n_buckets=8)
    assert again.indexed_through == src.current_snapshot_id()
    # while the OLD config now conflicts
    with pytest.raises(ValueError, match="key_expr"):
        DedupIndex(root, key_expr="text", n_buckets=8)


def test_dup_stats_count_distinct_keys_not_index_rows(spark, tables):
    """Duplicate key rows in the index (the documented concurrent-
    refresh degraded state) must not inflate dup_of_history stats: the
    stat counts distinct dup KEYS, so it can never exceed slice_keys."""
    src, idx = tables
    batch = _docs(spark, 0, 10)
    idx.add_keys(spark, batch)
    # simulate the race: a second writer re-registers the same keys
    # directly (bypassing the anti-join), duplicating every index row
    idx.table.append(
        idx.keys_of(batch).repartition("bucket"),
        {"index_n_buckets": 8, "index_key_expr": "text", "new_keys": 10},
        partition_by=["bucket"],
    )
    assert idx.read_keys(spark).count() == 20  # degraded: 2 rows/key

    r = idx.add_keys(spark, _docs(spark, 5, 15))
    assert r["slice_keys"] == 10
    assert r["dup_of_history"] == 5  # NOT 10 (2 index rows per dup key)
    assert r["new_keys"] == 5
    # and marking still returns one flag per input row
    m = idx.mark_history_dups(spark, _docs(spark, 0, 3))
    assert m.count() == 3 and m.where("dup_of_history").count() == 3


class _StubCommits:
    """Iceberg-shaped commit lineage: active_commits returns EVERY
    snapshot (the Iceberg adapter never filters replaces — Iceberg's
    own lineage records replacement)."""

    def __init__(self, commits):
        self.commits = commits

    def active_commits(self, as_of=None):
        return list(self.commits)


def test_has_keys_resets_at_rebuild_commits_iceberg_style():
    meta = {"index_n_buckets": 8, "index_key_expr": "text"}
    commits = [
        {"snapshot_id": 1, "meta": {**meta, "new_keys": 50}},
        {"snapshot_id": 2, "meta": {**meta, "rebuilt": True,
                                    "index_keys": 0}},
    ]
    idx = DedupIndex(_StubCommits(commits), key_expr="text", n_buckets=8)
    # pre-rebuild new_keys must NOT leak through the rebuild-to-empty
    assert idx.has_keys() is False
    commits.append({"snapshot_id": 3, "meta": {**meta, "new_keys": 7}})
    assert idx.has_keys() is True
    commits.append({"snapshot_id": 4, "meta": {**meta, "rebuilt": True,
                                               "index_keys": 3}})
    assert idx.has_keys() is True
    # foreign commits on a shared table are ignored
    commits.append({"snapshot_id": 5, "meta": {"new_keys": 99}})
    commits.append({"snapshot_id": 6, "meta": {**meta, "rebuilt": True,
                                               "index_keys": 0}})
    assert idx.has_keys() is False


def test_shuffle_route_ingest_does_not_force_broadcast(spark, tmp_path):
    """broadcast_cap=0 drives BOTH the dup-detection join and the
    join-back through the shuffle route; stats and stored keys must
    match the broadcast route exactly."""
    src = SnapshotTable(str(tmp_path / "src2"))
    src.append(_docs(spark, 0, 30), {"b": 1})
    bc = DedupIndex(str(tmp_path / "ib"), key_expr="text", n_buckets=8)
    sh = DedupIndex(str(tmp_path / "is"), key_expr="text", n_buckets=8,
                    broadcast_cap=0)
    r_b, r_s = bc.refresh(spark, src), sh.refresh(spark, src)
    assert r_b["new_keys"] == r_s["new_keys"] == 30

    batch = _docs(spark, 30, 40, dup_of=[1, 2, 3])
    r_b, r_s = bc.add_keys(spark, batch), sh.add_keys(spark, batch)
    assert (r_b["new_keys"], r_b["dup_of_history"]) == (10, 3) == (
        r_s["new_keys"], r_s["dup_of_history"])
    # above the cap the join-back must not carry a broadcast HINT —
    # a hint bypasses Spark's size limits, which is exactly the driver
    # OOM the route switch exists to avoid. AQE may still CHOOSE
    # broadcast at runtime from the actual (tiny, here) size: that is
    # correct behavior, so assert on the optimized logical plan's
    # hints, not the executed join's physical operator.
    slice_keys = sh.keys_of(_docs(spark, 0, 5)).persist()
    try:
        dup = sh._dup_keys(spark, slice_keys, slice_keys.count())
        dup_only = dup.select("key").distinct()
        anti = slice_keys.join(dup_only, "key", "left_anti")
        logical = anti._jdf.queryExecution().optimizedPlan().toString()
        assert "strategy=broadcast" not in logical
        # the under-cap route DOES hint (pinning the contrast)
        hinted = slice_keys.join(
            F.broadcast(dup_only), "key", "left_anti"
        )
        assert "strategy=broadcast" in (
            hinted._jdf.queryExecution().optimizedPlan().toString()
        )
    finally:
        slice_keys.unpersist()
