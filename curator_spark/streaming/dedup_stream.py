"""Stateful cross-batch dedup stream: emit each url's document the
FIRST time it is seen across ALL micro-batches, using
`applyInPandasWithState` keyed state.

The stateless streaming plan (quality_stream.py) dedups nothing: a url
arriving again in a later file is scored again. This operator is the
streaming twin of batch `dedup_exact` — the reference's analog is the
completed-id resume set it rebuilds from response files on every run
(reference: base_request_processor.py:609-651); here the "completed
set" is real keyed streaming state, checkpointed with the query, so a
killed-and-restarted stream keeps its memory of what it has emitted.

Design for scale:
- group key = url-hash bucket (`pmod(xxhash64(url), n_state_buckets)`),
  NOT the raw url: state rows stay O(buckets), each holding that
  bucket's seen-hash set, and one shuffle partitions the stream by
  bucket. More buckets = more parallelism + smaller per-key state.
- the per-row hash (`md5(url)`) is computed NATIVELY before the
  stateful operator, so Python touches only fixed-width hashes, never
  url bytes; set membership inside the UDF is pandas `isin`
  (vectorized), no per-row Python loop.
- state value = one `array<string>` of seen hashes. At 10^12 docs the
  exact set becomes a RocksDB state store + Bloom-filter front; the
  operator shape (bucket key, hash column, set-membership emit) is
  unchanged — only the membership structure swaps.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from curator_spark.engine.schema import PAGES

OUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("url_hash", StringType()),
        StructField("text", StringType()),
    ]
)

STATE_SCHEMA = StructType([StructField("seen", ArrayType(StringType()))])

KEY_SCHEMA = StructType([StructField("state_bucket", LongType())])


def _dedup_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (seen_list,) = state.get if state.exists else ([],)
    seen: set[str] = set(seen_list)
    for pdf in pdfs:
        # batch-internal first-occurrence, then cross-batch state check
        firsts = pdf.drop_duplicates(subset=["url_hash"], keep="first")
        fresh = firsts[~firsts["url_hash"].isin(seen)]
        if len(fresh):
            seen.update(fresh["url_hash"])
            yield fresh[["url", "url_hash", "text"]]
    state.update((sorted(seen),))


def dedup_stream(
    spark: SparkSession,
    input_dir: str,
    n_state_buckets: int = 64,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(PAGES)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_dir)
    keyed = pages.select(
        "url",
        F.md5(F.col("url").cast("binary")).alias("url_hash"),
        "text",
        F.pmod(F.xxhash64("url"), F.lit(n_state_buckets)).alias("state_bucket"),
    )
    return keyed.groupBy("state_bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_available_now(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_state_buckets: int = 64,
) -> StreamingQuery:
    """Drain currently-available input through the stateful dedup and
    stop. Re-running with the same checkpoint restores the seen-set
    state, so duplicates of anything emitted in ANY earlier drain are
    suppressed."""
    dd = dedup_stream(spark, input_dir, n_state_buckets)
    q = (
        dd.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
