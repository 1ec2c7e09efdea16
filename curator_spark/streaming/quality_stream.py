"""Structured Streaming face of the quality-filter pipeline.

The reference is a batch system whose "streaming" is incremental file
append + resume bookkeeping (reference: base_online_request_processor
.py:609-631 — append one JSONL line per completed response; SURVEY
§2.9). Spark restates that capability properly: the SAME logical plan
(`quality_plan` — rules exprs + Arrow UDF stages + scrub, all
stateless maps) runs unchanged under `readStream`, and the streaming
engine's checkpoint (source offsets + file-sink transaction log)
replaces the reference's completed-id resume scan: a killed run
restarted with the same checkpoint processes each input file exactly
once.

Two entry points:
- `score_stream`: file-source stream of pages -> scored stream
  (stateless; any sink/trigger).
- `run_available_now`: drain everything currently in the input dir to
  a parquet sink and stop — incremental batch, the Spark-native analog
  of the reference's "process whatever request files exist" loop
  (base:requests_to_responses). Re-running after new files arrive
  processes ONLY the new files (checkpoint), i.e. row-level resume
  without any custom bookkeeping.
- `keep_rate_stream`: watermarked event-time windowed aggregation of
  keep/drop counts — late pages beyond the watermark are dropped
  deterministically.

Scale notes: stateless stages keep the stream shuffle-free end-to-end;
only `keep_rate_stream` shuffles (by window x decision), with
watermark-bounded state. maxFilesPerTrigger bounds per-batch memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from curator_spark.config import QualityConfig
from curator_spark.engine.schema import PAGES
from curator_spark.pipeline.run import OUT_COLS, quality_plan, with_bucket


def score_stream(
    spark: SparkSession,
    input_dir: str,
    cfg: QualityConfig | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    cfg = cfg or QualityConfig()
    reader = spark.readStream.schema(PAGES)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_dir)
    pages = with_bucket(pages, cfg.n_buckets)
    pages = pages.withColumn("doc_text", F.col("text"))
    scored = quality_plan(pages, cfg, text_col="doc_text")
    return scored.select("warc_ts", *OUT_COLS)


def run_available_now(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: QualityConfig | None = None,
) -> StreamingQuery:
    """Drain all currently-available input, then stop (incremental)."""
    scored = score_stream(spark, input_dir, cfg)
    q = (
        scored.drop("warc_ts")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def make_snapshot_batch_committer(table, lineage_id: str):
    """foreachBatch body committing each micro-batch to a SnapshotTable
    exactly once.

    Structured Streaming's foreachBatch is at-least-once: a crash
    between the batch function and the checkpoint advance replays the
    same (batch_id, data). Exactly-once therefore = idempotent commit
    keyed by (lineage_id, batch_id) — a replayed batch sees its key
    already committed and becomes a no-op (the same construction as
    the Delta/Iceberg `txnAppId`/`txnVersion` idempotent-write
    pattern). `lineage_id` must identify the checkpoint: batch ids
    restart at 0 under a fresh checkpoint, so keys from different
    lineages must not collide.
    """

    def commit_batch(df: DataFrame, batch_id: int) -> None:
        key = {"stream_lineage": lineage_id, "stream_batch_id": batch_id}
        for c in table.active_commits():
            m = c["meta"]
            if (
                m.get("stream_lineage") == lineage_id
                and m.get("stream_batch_id") == batch_id
            ):
                return  # replay after crash-before-checkpoint: drop it
        path = table.stage_dir()
        (
            df.drop("warc_ts")
            .write.mode("overwrite")
            .partitionBy("bucket_id")
            .parquet(path)
        )
        table.commit(path, key)

    return commit_batch


def run_into_snapshot(
    spark: SparkSession,
    input_dir: str,
    table_root: str,
    checkpoint_dir: str,
    cfg: QualityConfig | None = None,
    max_files_per_trigger: int | None = None,
):
    """Drain available input into a SnapshotTable with exactly-once
    batch commits (source checkpoint handles which files are consumed;
    the idempotent manifest commit handles replayed batches). Returns
    the SnapshotTable."""
    from curator_spark.pipeline.snapshot import SnapshotTable

    table = SnapshotTable(table_root)
    scored = score_stream(spark, input_dir, cfg, max_files_per_trigger)
    q = (
        scored.writeStream.foreachBatch(
            make_snapshot_batch_committer(table, checkpoint_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table


def keep_rate_stream(
    spark: SparkSession,
    input_dir: str,
    cfg: QualityConfig | None = None,
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Event-time keep/drop counts with late-data watermark.

    In append mode a window is emitted once the watermark passes its
    end; bound files-per-trigger (several micro-batches) so the
    watermark actually advances across a static backlog."""
    scored = score_stream(spark, input_dir, cfg, max_files_per_trigger)
    return (
        scored.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("keep"))
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "keep",
            "n_docs",
        )
    )


def run_keep_rate_available_now(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cfg: QualityConfig | None = None,
) -> StreamingQuery:
    agg = keep_rate_stream(spark, input_dir, cfg, max_files_per_trigger=1)
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def domain_session_stream(
    spark: SparkSession,
    input_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Dynamic session windows per domain over event time — the
    native stateful-streaming operator (session_window merges
    overlapping [ts, ts+gap) intervals as rows arrive; watermark
    bounds state and finalizes sessions for append-mode sinks).
    Batch `sessionize` (queries/relationalq.py) is the lag-based
    batch twin; this is what replaces it when pages arrive as a
    stream. One shuffle on (domain, merging session keys); state is
    per open session, evicted at the watermark."""
    pages = spark.readStream.schema(PAGES).parquet(input_dir)
    domain = F.regexp_extract("url", r"https?://([^/]+)/", 1)
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(
            F.session_window("warc_ts", gap),
            domain.alias("domain"),
        )
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "domain",
            "n_pages",
        )
    )


def run_domain_sessions_available_now(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> StreamingQuery:
    q = (
        domain_session_stream(spark, input_dir, gap, watermark)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
