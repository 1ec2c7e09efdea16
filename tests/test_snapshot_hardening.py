"""Regression tests for the r4 snapshot/run hardening batch (review
findings): empty-stage commits, cached-path strictness, mixed-layout
deletes, carried-ref pruning on repeated COW ops, exclusive manifest
publish, merge meta union, quarantine GC survival, and content-change
cache invalidation."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from curator_spark.config import QualityConfig
from curator_spark.engine.synth import write_pages
from curator_spark.pipeline.fingerprint import run_fingerprint
from curator_spark.pipeline.run import QualityPipeline, with_bucket
from curator_spark.pipeline.snapshot import SnapshotTable


def _parquet_files(root: str) -> dict[str, float]:
    out = {}
    for d, _, fs in os.walk(root):
        for f in fs:
            if f.endswith(".parquet"):
                p = os.path.join(d, f)
                out[p] = os.path.getmtime(p)
    return out


def test_all_rows_failed_commits_and_reruns_strict(spark, cfg, tmp_path):
    """A run whose EVERY row fails extraction must not crash on the
    empty staged write; it commits the bucket bookkeeping (zero data
    parts), raises under require_all_rows, and a RERUN raises again
    instead of returning a masking cached success."""
    pages = str(tmp_path / "pages")
    spark.createDataFrame(
        [(f"u{i}", None, b"") for i in range(20)],
        "url string, warc_ts timestamp, html binary",
    ).write.parquet(pages)
    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    assert cfg.require_all_rows
    with pytest.raises(RuntimeError, match="failed extraction"):
        pipe.run(spark, pages)
    # buckets committed: a rerun hits the cached path — and still raises
    fp = run_fingerprint(pages, cfg)
    assert len(pipe.committed_buckets(fp)) == cfg.n_buckets
    with pytest.raises(RuntimeError, match="failed extraction"):
        pipe.run(spark, pages)
    # the lenient config variant reads the (empty) output fine
    lenient = QualityConfig(require_all_rows=False)
    pipe2 = QualityPipeline(str(tmp_path / "out2"), lenient)
    r = pipe2.run(spark, pages)
    assert r.failed_rows == 20
    out = pipe2.read_output(spark, r.fingerprint)
    assert out is None or out.count() == 0
    r2 = pipe2.run(spark, pages)
    assert r2.cached and r2.failed_rows == 20


def test_delete_urls_spans_mixed_bucket_layouts(spark, tmp_path):
    """Commits written under different n_buckets coexist (different
    fingerprints); delete_urls(fp=None) must hash the victims with
    EVERY layout's bucket count or the other layout's rows survive."""
    pages = str(tmp_path / "pages")
    write_pages(spark, pages, 300)
    cfg_a = QualityConfig(n_buckets=4)
    cfg_b = QualityConfig(n_buckets=16)
    out = str(tmp_path / "out")
    ra = QualityPipeline(out, cfg_a).run(spark, pages)
    rb = QualityPipeline(out, cfg_b).run(spark, pages)
    assert ra.fingerprint != rb.fingerprint

    pipe = QualityPipeline(out, cfg_b)  # current config: 16 buckets
    victims = [
        r["url"]
        for r in pipe.read_output(spark, rb.fingerprint).select("url").limit(3).collect()
    ]
    res = pipe.delete_urls(spark, victims)  # fp=None: all fingerprints
    assert res["deleted_rows"] == 6  # 3 urls x 2 layouts
    for fp in (ra.fingerprint, rb.fingerprint):
        left = pipe.read_output(spark, fp).where(
            F.col("url").isin(victims)
        )
        assert left.count() == 0, fp


def test_repeated_deletes_do_not_rewrite_carried_partitions(
    spark, pages_path, cfg, tmp_path
):
    """Second delete on different buckets must not re-read/rewrite the
    partitions carried by reference from the first delete."""
    out = str(tmp_path / "out")
    pipe = QualityPipeline(out, cfg)
    res = pipe.run(spark, pages_path)
    rows = pipe.read_output(spark, res.fingerprint).select("url", "bucket_id").collect()
    by_bucket: dict[int, list[str]] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket_id"], []).append(r["url"])
    b1, b2 = sorted(by_bucket)[:2]
    pipe.delete_urls(spark, by_bucket[b1][:1])
    files_before = _parquet_files(out)
    r2 = pipe.delete_urls(spark, by_bucket[b2][:1])
    # only bucket b2's dir rewritten; every pre-existing parquet file
    # (including the partitions carried from delete #1) untouched
    assert r2["rewritten_dirs"] == 1
    files_after = _parquet_files(out)
    for p, mt in files_before.items():
        if f"bucket_id={b2}" in p:
            continue  # b2's old file may be gone (rewritten)
        assert p in files_after and files_after[p] == mt, p
    # all rows still present minus the two victims
    n = pipe.read_output(spark, res.fingerprint).count()
    assert n == len(rows) - 2


def test_concurrent_commit_does_not_clobber(tmp_path):
    """Two writers claiming the same snapshot id must BOTH land."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    d1, d2 = t.stage_dir(), t.stage_dir()
    os.makedirs(d1), os.makedirs(d2)
    # simulate the race: writer A publishes v1 out-of-band after B read
    # current=0 — B's commit must slide to v2, not overwrite v1
    sid1 = t.commit(d1, {"who": "a"})
    # hand-craft a collision: pre-create the manifest B would claim
    v2 = os.path.join(t.manifest_dir, "v000002.json")
    with open(v2, "w") as fh:
        json.dump({"snapshot_id": 2, "data": os.path.relpath(d1, t.root),
                   "meta": {"who": "squatter"}, "op": "append"}, fh)
    sid2 = t.commit(d2, {"who": "b"})
    assert (sid1, sid2) == (1, 3)
    metas = [c["meta"]["who"] for c in t.active_commits()]
    assert sorted(metas) == ["a", "b", "squatter"]


def test_merge_upsert_unions_resume_buckets(spark, tmp_path):
    """Default merge meta must union the replaced commits' buckets so
    resume bookkeeping survives (else the next run re-appends them)."""
    pages = str(tmp_path / "pages")
    write_pages(spark, pages, 400)
    cfg = QualityConfig(n_buckets=4)
    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    pipe.run(spark, pages, max_buckets=2)
    res = pipe.run(spark, pages)  # commit #2: remaining buckets
    fp = res.fingerprint
    assert len(pipe.committed_buckets(fp)) == 4

    out = pipe.read_output(spark, fp)
    upd = out.limit(1).withColumn("lang_pred", F.lit("xx"))
    pipe.table.merge_upsert(spark, upd, key_col="url")
    # bookkeeping intact -> rerun is a no-op cache hit, no duplicates
    assert len(pipe.committed_buckets(fp)) == 4
    assert pipe.run(spark, pages).cached
    n = pipe.read_output(spark, fp).count()
    assert n == pipe.read_output(spark, fp).select("url").distinct().count()


def test_quarantine_dir_survives_orphan_gc(spark, cfg, tmp_path):
    """expire_snapshots orphan GC must never delete *_failed spills."""
    pages = str(tmp_path / "pages")
    good = [(f"https://ok{i}.example/x", None,
             b"<html><body><p>" + b"fine words here " * 20 + b"</p></body></html>")
            for i in range(30)]
    bad = [(f"https://bad{i}.example/x", None, b"") for i in range(3)]
    spark.createDataFrame(
        good + bad, "url string, warc_ts timestamp, html binary"
    ).write.parquet(pages)
    lenient = QualityConfig(require_all_rows=False)
    pipe = QualityPipeline(str(tmp_path / "out"), lenient)
    r = pipe.run(spark, pages)
    assert r.failed_rows == 3
    qdirs = [
        d for d in os.listdir(os.path.join(str(tmp_path / "out"), "data"))
        if d.endswith("_failed")
    ]
    assert len(qdirs) == 1
    qpath = os.path.join(str(tmp_path / "out"), "data", qdirs[0])
    # age the dir past the grace period, then GC
    old = time.time() - 10 * 86400
    os.utime(qpath, (old, old))
    pipe.table.expire_snapshots(retain_last=1, orphan_grace_seconds=1.0)
    assert os.path.isdir(qpath), "orphan GC deleted the quarantine spill"


def test_fingerprint_tracks_content_mtime(tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    f = p / "part-0.parquet"
    f.write_bytes(b"A" * 64)
    cfg = QualityConfig()
    fp1 = run_fingerprint(str(p), cfg)
    # same size, different content+mtime
    time.sleep(0.01)
    f.write_bytes(b"B" * 64)
    assert run_fingerprint(str(p), cfg) != fp1
