"""Row-level delete (GDPR/takedown) with partition-granularity
copy-on-write — SnapshotTable.delete_where / QualityPipeline.delete_urls.

The Iceberg `DELETE FROM ... WHERE` (COW) analog: deleting k urls must
rewrite ONLY the url-hash bucket directories that can contain them;
every other bucket's parquet files survive by reference, physically
untouched.  Resume bookkeeping (committed buckets per fingerprint)
must survive the manifest replacement, and compaction must still work
over multi-part commits.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from curator_spark.pipeline.run import QualityPipeline, with_bucket


def _parquet_files(root: str) -> dict[str, float]:
    """{abs_path: mtime} of every parquet file under root."""
    out = {}
    for d, _, fs in os.walk(root):
        for f in fs:
            if f.endswith(".parquet"):
                p = os.path.join(d, f)
                out[p] = os.path.getmtime(p)
    return out


def test_delete_urls_partition_cow(spark, pages_path, cfg, tmp_path):
    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    res = pipe.run(spark, pages_path)
    before = pipe.read_output(spark, res.fingerprint).toPandas()
    n0 = len(before)

    victims = sorted(before["url"])[:5]
    vb = {
        r["bucket_id"]
        for r in with_bucket(
            spark.createDataFrame([(u,) for u in victims], "url string"),
            cfg.n_buckets,
        ).collect()
    }
    files_before = _parquet_files(str(tmp_path / "out"))

    r = pipe.delete_urls(spark, victims)
    assert r["deleted_rows"] == 5
    assert r["rewritten_dirs"] == len(vb)  # only the victims' buckets

    after = pipe.read_output(spark, res.fingerprint).toPandas()
    assert len(after) == n0 - 5
    assert not set(victims) & set(after["url"])

    # untouched rows byte-identical (incl. scrubbed text), bucket col intact
    a = after.set_index("url").sort_index()
    b = before.set_index("url").sort_index().drop(index=victims)
    assert list(a.index) == list(b.index)
    assert a["scrubbed_text"].fillna("\x00").equals(b["scrubbed_text"].fillna("\x00"))
    assert (a["bucket_id"] == b["bucket_id"]).all()

    # copy-on-write: every parquet file of an UNAFFECTED bucket still
    # exists with its original mtime (never rewritten or moved)
    files_after = _parquet_files(str(tmp_path / "out"))
    for p, mt in files_before.items():
        bucket_dir = next(
            (seg for seg in p.split(os.sep) if seg.startswith("bucket_id=")), ""
        )
        if bucket_dir and int(bucket_dir.split("=")[1]) not in vb:
            assert p in files_after and files_after[p] == mt, p

    # resume bookkeeping survives the manifest replacement
    assert pipe.run(spark, pages_path).cached
    assert pipe.committed_buckets(res.fingerprint) == set(range(cfg.n_buckets))


def test_delete_then_second_delete_and_metrics(spark, pages_path, cfg, tmp_path):
    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    res = pipe.run(spark, pages_path)
    out = pipe.read_output(spark, res.fingerprint)
    urls = [r["url"] for r in out.select("url").limit(4).collect()]

    r1 = pipe.delete_urls(spark, urls[:2])
    r2 = pipe.delete_urls(spark, urls[2:])  # delete FROM a parts commit
    assert r1["deleted_rows"] == 2 and r2["deleted_rows"] == 2

    remaining = pipe.read_output(spark, res.fingerprint)
    assert remaining.count() == out.count() - 4
    assert remaining.filter(F.col("url").isin(urls)).count() == 0

    # lineage metrics still readable (processing log semantics)
    m = pipe.metrics(spark, res.fingerprint)
    assert m.count() == cfg.n_buckets


def test_time_travel_read_sees_pre_delete_rows(spark, pages_path, cfg, tmp_path):
    """Iceberg VERSION-AS-OF analog: replaced data dirs stay on disk,
    so reading as_of the pre-delete snapshot returns the deleted rows."""
    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    res = pipe.run(spark, pages_path)
    sid0 = res.snapshot_id
    out = pipe.read_output(spark, res.fingerprint)
    n0 = out.count()
    urls = [r["url"] for r in out.select("url").limit(3).collect()]
    pipe.delete_urls(spark, urls)

    now = pipe.table.read(spark)
    assert now.count() == n0 - 3
    historical = pipe.table.read(spark, as_of=sid0)
    assert historical.count() == n0
    assert historical.filter(F.col("url").isin(urls)).count() == 3


def test_merge_upsert_atomic_cow(spark, pages_path, cfg, tmp_path):
    """Iceberg MERGE INTO (COW) analog: one atomic snapshot updates
    matched keys and inserts new ones, rewriting only the touched
    bucket directories."""
    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    res = pipe.run(spark, pages_path)
    out = pipe.read_output(spark, res.fingerprint)
    n0 = out.count()
    victims = [r["url"] for r in out.select("url").limit(3).collect()]

    ups = out.filter(F.col("url").isin(victims)).withColumn(
        "scrubbed_text", F.lit("UPSERTED")
    )
    new = (
        out.limit(1)
        .withColumn("url", F.lit("https://merge.example/new"))
        .withColumn(
            "bucket_id",
            F.pmod(F.xxhash64("url"), F.lit(cfg.n_buckets)).cast("int"),
        )
    )
    updates = ups.unionByName(new)
    vb = {r["bucket_id"] for r in updates.select("bucket_id").collect()}
    files_before = _parquet_files(str(tmp_path / "out"))

    sid_before = pipe.table.current_snapshot_id()
    sid = pipe.table.merge_upsert(spark, updates, key_col="url")
    # exactly ONE new snapshot (atomic merge)
    assert sid == sid_before + 1 == pipe.table.current_snapshot_id()

    out2 = pipe.read_output(spark, res.fingerprint)
    assert out2.count() == n0 + 1
    assert out2.filter(F.col("url") == "https://merge.example/new").count() == 1
    got = {
        r["url"]: r["scrubbed_text"]
        for r in out2.filter(F.col("url").isin(victims)).collect()
    }
    assert set(got) == set(victims)
    assert all(v == "UPSERTED" for v in got.values())
    assert out2.select("url").distinct().count() == n0 + 1

    # copy-on-write: unaffected buckets' files physically untouched
    files_after = _parquet_files(str(tmp_path / "out"))
    for p, mt in files_before.items():
        bucket_dir = next(
            (seg for seg in p.split(os.sep) if seg.startswith("bucket_id=")), ""
        )
        if bucket_dir and int(bucket_dir.split("=")[1]) not in vb:
            assert p in files_after and files_after[p] == mt, p

    # resume bookkeeping survives (meta carried through the merge)
    assert pipe.run(spark, pages_path).cached


def test_compact_after_delete(spark, pages_path, cfg, tmp_path):
    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    r1 = pipe.run(spark, pages_path, max_buckets=7)
    r2 = pipe.run(spark, pages_path)
    fp = r2.fingerprint
    out = pipe.read_output(spark, fp)
    urls = [r["url"] for r in out.select("url").limit(3).collect()]
    assert pipe.delete_urls(spark, urls, fp=fp)["deleted_rows"] == 3

    n = out.count() - 3
    sid = pipe.compact(spark, fp)
    assert sid is not None
    compacted = pipe.read_output(spark, fp)
    assert compacted.count() == n
    assert compacted.filter(F.col("url").isin(urls)).count() == 0
    assert compacted.select("url").distinct().count() == n
