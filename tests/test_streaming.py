"""Structured Streaming pipeline tests.

Covers: (1) stream == batch for the stateless scoring plan,
(2) checkpointed incremental processing — new files only (the
reference's completed-id resume, base_request_processor.py:609-651,
restated as source offsets), (3) watermarked windowed agg consistency.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd

import pytest
from pyspark.sql import functions as F

from curator_spark.config import QualityConfig
from curator_spark.pipeline.run import quality_plan, with_bucket
from curator_spark.streaming.quality_stream import (
    run_available_now,
    run_keep_rate_available_now,
)


@pytest.fixture()
def stream_dirs(spark, pages_path, tmp_path):
    """Input dir seeded with half the page files; rest staged aside."""
    src_files = sorted(
        f for f in os.listdir(pages_path) if f.endswith(".parquet")
    )
    assert len(src_files) >= 2
    in_dir = str(tmp_path / "stream_in")
    os.makedirs(in_dir)
    half = len(src_files) // 2
    for f in src_files[:half]:
        shutil.copy(os.path.join(pages_path, f), in_dir)
    rest = [os.path.join(pages_path, f) for f in src_files[half:]]
    return in_dir, rest, str(tmp_path / "out"), str(tmp_path / "ckpt")


def test_stream_matches_batch_and_resumes(spark, pages_path, stream_dirs, cfg):
    in_dir, rest, out_dir, ckpt = stream_dirs

    run_available_now(spark, in_dir, out_dir, ckpt, cfg)
    first = spark.read.parquet(out_dir)
    n_first = first.count()
    assert 0 < n_first < 1200

    # second drain with NEW files only: checkpoint skips everything seen
    for f in rest:
        shutil.copy(f, in_dir)
    run_available_now(spark, in_dir, out_dir, ckpt, cfg)
    out = spark.read.parquet(out_dir)
    assert out.count() == 1200
    assert out.select("url").distinct().count() == 1200  # no reprocessing

    # stream result == batch result (stateless plan, same labels)
    batch = spark.read.parquet(pages_path)
    batch = with_bucket(batch, cfg.n_buckets).withColumn(
        "doc_text", F.col("text")
    )
    expect = (
        quality_plan(batch, cfg, text_col="doc_text")
        .select("url", "keep", "drop_reason", "scrubbed_text")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    got = (
        out.select("url", "keep", "drop_reason", "scrubbed_text")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (got["keep"] == expect["keep"]).all()
    assert (
        got["drop_reason"].fillna("") == expect["drop_reason"].fillna("")
    ).all()
    assert (
        got["scrubbed_text"].fillna("") == expect["scrubbed_text"].fillna("")
    ).all()


def test_stateful_dedup_across_batches(spark, pages_path, tmp_path):
    """applyInPandasWithState keyed state must suppress urls already
    emitted in earlier micro-batches AND earlier drains (checkpointed
    state survives query restarts)."""
    import glob

    from curator_spark.streaming.dedup_stream import run_dedup_available_now

    in_dir = str(tmp_path / "dd_in")
    os.makedirs(in_dir)
    out_dir = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")

    src = sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
    shutil.copy(src[0], os.path.join(in_dir, "a.parquet"))
    run_dedup_available_now(spark, in_dir, out_dir, ckpt)
    first = spark.read.parquet(out_dir)
    n_first = first.count()
    assert n_first == first.select("url").distinct().count() > 0

    # second drain: one duplicate file (same urls) + one new file
    shutil.copy(src[0], os.path.join(in_dir, "dup.parquet"))
    shutil.copy(src[1], os.path.join(in_dir, "b.parquet"))
    run_dedup_available_now(spark, in_dir, out_dir, ckpt)
    out = spark.read.parquet(out_dir)
    expect = (
        spark.read.parquet(src[0], src[1]).select("url").distinct().count()
    )
    assert out.count() == expect  # dup file contributed nothing
    assert out.select("url").distinct().count() == expect


def test_keep_rate_windows_match_batch(spark, pages_path, tmp_path, cfg):
    out_dir = str(tmp_path / "agg_out")
    ckpt = str(tmp_path / "agg_ckpt")
    run_keep_rate_available_now(spark, pages_path, out_dir, ckpt, cfg)
    got = spark.read.parquet(out_dir)
    # append mode only emits windows the final watermark passed; every
    # emitted window must match the batch ground truth exactly
    batch = spark.read.parquet(pages_path)
    batch = with_bucket(batch, cfg.n_buckets).withColumn(
        "doc_text", F.col("text")
    )
    expect = (
        quality_plan(batch, cfg, text_col="doc_text")
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), F.col("keep"))
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            "keep",
            F.col("n_docs").alias("expect_n"),
        )
    )
    joined = got.join(expect, ["window_start", "keep"], "left").toPandas()
    assert len(joined) > 0
    # rows landing in an already-emitted window are dropped as late
    # (the watermark doing its job on out-of-order input), so emitted
    # counts are bounded by — and mostly equal to — the batch truth
    assert (joined["n_docs"] <= joined["expect_n"]).all()
    assert (joined["n_docs"] == joined["expect_n"]).mean() > 0.5


def test_domain_session_windows(spark, tmp_path):
    """session_window must merge hits within the gap into one session
    per domain and finalize sessions past the watermark; a second
    availableNow drain with later data must emit ONLY newly-closed
    sessions (append mode)."""
    from datetime import datetime

    from curator_spark.streaming.quality_stream import (
        run_domain_sessions_available_now,
    )

    in_dir = str(tmp_path / "sess_in"); os.makedirs(in_dir)
    out_dir = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")

    def pages_df(rows):
        return spark.createDataFrame(
            [(u, datetime.fromisoformat(ts), None, "x", "en")
             for u, ts in rows],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )

    # domain a: two hits 10 min apart (one session of 2), then one hit
    # 3 h later (watermark passes -> first session closes)
    import glob

    def drop_file(df, name):
        stage = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        src = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(in_dir, name + ".parquet"))

    drop_file(pages_df([
        ("https://a.com/1", "2024-01-01T00:00:00"),
        ("https://a.com/2", "2024-01-01T00:10:00"),
        ("https://b.com/1", "2024-01-01T00:00:00"),
    ]), "f1")
    run_domain_sessions_available_now(spark, in_dir, out_dir, ckpt)

    drop_file(pages_df([
        ("https://a.com/3", "2024-01-01T03:00:00"),
        ("https://a.com/4", "2024-01-01T06:00:00"),
    ]), "f2")
    run_domain_sessions_available_now(spark, in_dir, out_dir, ckpt)

    out = spark.read.parquet(out_dir).toPandas()
    a = out[out["domain"] == "a.com"].sort_values("session_start")
    # first a.com session: both early hits merged, 40-min span
    assert list(a["n_pages"])[0] == 2
    assert a.iloc[0]["session_end"] - a.iloc[0]["session_start"] == pd.Timedelta(minutes=40)
    # the 03:00 hit is its own closed session after the 06:00 watermark advance
    assert len(a) >= 2 and list(a["n_pages"])[1] == 1


def test_snapshot_sink_exactly_once(spark, pages_path, tmp_path, cfg):
    """foreachBatch -> SnapshotTable with idempotent (lineage, batch_id)
    commits: incremental drains append exactly the new files' rows, and
    a replayed batch (crash between batch fn and checkpoint advance)
    commits nothing the second time."""
    from curator_spark.streaming.quality_stream import (
        make_snapshot_batch_committer,
        run_into_snapshot,
    )

    src_files = sorted(
        f for f in os.listdir(pages_path) if f.endswith(".parquet")
    )
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    half = len(src_files) // 2
    for f in src_files[:half]:
        shutil.copy(os.path.join(pages_path, f), in_dir)
    ckpt = str(tmp_path / "ckpt")

    table = run_into_snapshot(spark, in_dir, str(tmp_path / "tbl"), ckpt, cfg)
    n_first = table.read(spark).count()
    assert 0 < n_first < 1200

    # drain again with new files: only they are processed and committed
    for f in src_files[half:]:
        shutil.copy(os.path.join(pages_path, f), in_dir)
    table = run_into_snapshot(spark, in_dir, str(tmp_path / "tbl"), ckpt, cfg)
    out = table.read(spark)
    assert out.count() == 1200
    assert out.select("url").distinct().count() == 1200

    # simulate an at-least-once replay: re-invoke the batch fn with an
    # already-committed batch id — must be a no-op
    n_commits = len(table.active_commits())
    committed = table.active_commits()[-1]
    bid = committed["meta"]["stream_batch_id"]
    replay_df = spark.read.parquet(
        os.path.join(str(tmp_path / "tbl"), committed["data"])
    ).withColumn("warc_ts", F.current_timestamp())
    make_snapshot_batch_committer(table, ckpt)(replay_df, bid)
    assert len(table.active_commits()) == n_commits
    assert table.read(spark).count() == 1200


def test_stream_cross_run_dedup_via_index(spark, pages_path, tmp_path, cfg):
    """Index-backed CROSS-RUN dedup: a second drain with a FRESH
    checkpoint over overlapping input skips urls the first run
    registered (keep=false / dup_of_history, no scoring payload) and
    scores only the genuinely new files' urls — the capability neither
    the source checkpoint (per-run) nor keyed state (per-stream) has."""
    from curator_spark.pipeline.dedup_index import DedupIndex
    from curator_spark.streaming.quality_stream import run_into_snapshot

    src_files = sorted(
        f for f in os.listdir(pages_path) if f.endswith(".parquet")
    )
    half = len(src_files) // 2
    in1, in2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    os.makedirs(in1), os.makedirs(in2)
    for f in src_files[:half]:
        shutil.copy(os.path.join(pages_path, f), in1)
    for f in src_files:  # run 2 input CONTAINS run 1's files
        shutil.copy(os.path.join(pages_path, f), in2)

    idx = DedupIndex(str(tmp_path / "idx"), key_expr="url")
    t1 = run_into_snapshot(spark, in1, str(tmp_path / "t1"),
                           str(tmp_path / "ck1"), cfg, dedup_index=idx)
    first = t1.read(spark).toPandas()
    assert idx.read_keys(spark).count() == len(first)
    assert (first["drop_reason"] != "dup_of_history").all()  # empty index

    t2 = run_into_snapshot(spark, in2, str(tmp_path / "t2"),
                           str(tmp_path / "ck2"), cfg, dedup_index=idx)
    out2 = t2.read(spark).toPandas().set_index("url")
    assert len(out2) == 1200
    dup = out2[out2["drop_reason"] == "dup_of_history"]
    assert set(dup.index) == set(first["url"])
    assert not dup["keep"].any()
    assert dup["scrubbed_text"].isna().all()

    # fresh urls got REAL decisions, identical to the batch plan's
    fresh = out2[out2["drop_reason"] != "dup_of_history"]
    batch = (
        quality_plan(
            with_bucket(spark.read.parquet(pages_path), cfg.n_buckets)
            .withColumn("doc_text", F.col("text")),
            cfg, text_col="doc_text",
        )
        .select("url", "keep")
        .toPandas().set_index("url")
    )
    common = fresh.index.intersection(batch.index)
    assert len(common) == len(fresh)
    assert (fresh.loc[common, "keep"] == batch.loc[common, "keep"]).all()

    # run 2 registered only the fresh urls; index keys stay unique
    keys = idx.read_keys(spark)
    assert keys.count() == 1200
    assert keys.select("key").distinct().count() == 1200
