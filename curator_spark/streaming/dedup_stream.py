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

Bounded-state mode (`dedup_stream_bounded`): the exact per-bucket
seen-set grows O(total history) and is rewritten wholesale every
micro-batch — fine for bounded runs, unacceptable at web scale. The
bounded mode keeps state size CONSTANT per bucket after a warm-up:

- state value = (n_seen, seen?, bloom) where `bloom` is a fixed-width
  bit array. While `n_seen <= exact_cap` the exact hash array is kept
  alongside (zero false positives); once the cap is crossed the array
  is dropped and membership is answered by the Bloom filter alone, so
  every later state write is exactly `bloom_bytes + 8` bytes.
- Bloom positions are computed NATIVELY (`pmod(xxhash64(url_hash, i),
  m)` per hash slot i) before the stateful operator — Python never
  hashes; inside the UDF membership is one vectorized numpy gather
  (`bloom[pos >> 3] & bit`), insertion one `np.bitwise_or.at`.
- Error direction is one-sided and SAFE for dedup: a Bloom false
  positive drops a genuinely-new doc (treated as already seen); a
  duplicate is NEVER re-emitted. With m bits, k hashes and n inserted
  keys the FP rate is p ≈ (1 - e^{-kn/m})^k — the defaults (m = 2^23
  bits = 1 MiB/bucket, k = 5) give p ≈ 1.8% at n = 10^6 docs/bucket
  and p ≈ 0.1% at n = 3·10^5; size `bloom_bits ≈ 10–14 bits per
  expected doc per bucket` and scale `n_state_buckets` with the
  corpus. Where zero loss is required, `reconcile_bloom_drops` (below)
  recovers exactly the FP-dropped urls with one batch anti-join pass
  against the emitted output; the streaming operator itself stays
  constant-state.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from curator_spark.pipeline import fsutil
from curator_spark.pipeline.fsutil import is_local_path
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
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


# -- bounded-state mode ------------------------------------------------

BOUNDED_STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
        # exact hash array while n_seen <= exact_cap, then NULL forever
        StructField("seen", ArrayType(StringType())),
        StructField("bloom", BinaryType()),
    ]
)

DEFAULT_BLOOM_BITS = 1 << 23  # 1 MiB per bucket
DEFAULT_N_HASHES = 5
DEFAULT_EXACT_CAP = 100_000


def _bloom_hits(bloom: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Row-wise 'all k bits set' over a (rows, k) position matrix."""
    bits = bloom[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)
    return (bits != 0).all(axis=1)


def _bloom_set(bloom: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(bloom, flat >> 3, (1 << (flat & 7)).astype(np.uint8))


def make_bounded_dedup_fn(exact_cap: int, bloom_bits: int):
    """State fn factory (closure pickles to executors via cloudpickle).

    Rows must carry `bloom_pos: array<long>` — the k bloom positions,
    computed JVM-side so Python never touches url bytes.
    """
    n_bytes = (bloom_bits + 7) // 8

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_seen, seen_list, bloom_bytes = state.get
            bloom = np.frombuffer(bloom_bytes, dtype=np.uint8).copy()
            exact = seen_list is not None
            seen: set[str] = set(seen_list) if exact else set()
        else:
            n_seen, exact, seen = 0, True, set()
            bloom = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in pdfs:
            if not len(pdf):
                continue
            firsts = pdf.drop_duplicates(subset=["url_hash"], keep="first")
            pos = np.stack(firsts["bloom_pos"].to_numpy()).astype(np.int64)
            if exact:
                fresh_mask = ~firsts["url_hash"].isin(seen).to_numpy()
            else:
                fresh_mask = ~_bloom_hits(bloom, pos)
            fresh = firsts[fresh_mask]
            if len(fresh):
                n_seen += len(fresh)
                _bloom_set(bloom, pos[fresh_mask])
                if exact:
                    seen.update(fresh["url_hash"])
                    if n_seen > exact_cap:
                        # one-way transition: later writes are
                        # constant-size (bloom + counter only)
                        exact, seen = False, set()
                yield fresh[["url", "url_hash", "text"]]
        state.update((n_seen, sorted(seen) if exact else None, bloom.tobytes()))

    return fn


def dedup_stream_bounded(
    spark: SparkSession,
    input_dir: str,
    n_state_buckets: int = 64,
    exact_cap: int = DEFAULT_EXACT_CAP,
    bloom_bits: int = DEFAULT_BLOOM_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Cross-batch first-occurrence dedup with per-bucket state bounded
    at `bloom_bits/8 + O(exact_cap)` bytes (constant once past the
    cap). See the module docstring for the FP bound and sizing rule."""
    reader = spark.readStream.schema(PAGES)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(input_dir)
    keyed = pages.select(
        "url",
        F.md5(F.col("url").cast("binary")).alias("url_hash"),
        "text",
        F.pmod(F.xxhash64("url"), F.lit(n_state_buckets)).alias("state_bucket"),
        F.array(
            *[
                F.pmod(
                    F.xxhash64(F.col("url"), F.lit(i)), F.lit(bloom_bits)
                )
                for i in range(n_hashes)
            ]
        ).alias("bloom_pos"),
    )
    return keyed.groupBy("state_bucket").applyInPandasWithState(
        make_bounded_dedup_fn(exact_cap, bloom_bits),
        outputStructType=OUT_SCHEMA,
        stateStructType=BOUNDED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


STREAM_PIN_FILE = "curator_stream_config.json"


def _pin_stream_config(checkpoint_dir: str, cfg: dict[str, Any]) -> None:
    """Pin membership-critical stream parameters in the checkpoint dir.

    The keyed state these streams restore is only meaningful under the
    EXACT hash geometry that wrote it: a restart with different
    `bloom_bits`/`n_hashes` computes bloom positions in a different
    modulus than the restored bit arrays (previously-seen urls miss
    their own bits and are silently RE-EMITTED — or, bits raised, the
    position gather indexes past the smaller restored array and
    crashes); a different `n_state_buckets` re-keys urls into buckets
    whose state never saw them. Spark's state-store schema check cannot
    catch any of this (the schema is unchanged), so the parameters are
    pinned alongside the checkpoint on first start and a conflicting
    restart raises instead of corrupting the no-duplicates invariant.
    `exact_cap` is deliberately NOT pinned — the exact→bloom transition
    is one-way per bucket and stays correct under any later cap.

    The pin rides fsutil so a SHARED-storage checkpoint (the normal
    choice on a real cluster — the checkpoint must survive the driver
    host) pins next to the actual state: os.* against "s3://..." would
    write the pin to a junk LOCAL path, and a restart from another
    driver host would find no pin and silently re-pin whatever config
    it was given — exactly the corruption this function exists to
    refuse. Local (scheme-less) checkpoints keep plain-os behavior.
    """
    if is_local_path(checkpoint_dir):
        os.makedirs(checkpoint_dir, exist_ok=True)
    path = checkpoint_dir.rstrip("/") + "/" + STREAM_PIN_FILE
    try:
        text = fsutil.read_text(None, path)
        pinned = None if text is None else json.loads(text)
    except (OSError, ValueError) as e:
        # a corrupt/unreadable pin must refuse, not fall through to
        # re-pin: guessing here risks silent re-emission
        raise ValueError(
            f"unreadable stream-config pin {path!r} ({e}); if the "
            f"checkpoint's parameters are known to match, delete the pin "
            f"file to re-pin"
        ) from e
    if pinned is None:
        # atomic write-then-rename: no torn pin from a mid-write kill
        fsutil.write_text_atomic(None, path, json.dumps(cfg))
        return
    bad = {
        k: (pinned.get(k), v) for k, v in cfg.items() if pinned.get(k) != v
    }
    if bad:
        detail = ", ".join(
            f"{k}: pinned={p} got={g}" for k, (p, g) in sorted(bad.items())
        )
        raise ValueError(
            f"stream config conflicts with checkpoint at "
            f"{checkpoint_dir!r}: {detail} — restart with the pinned "
            f"values or start a fresh checkpoint"
        )


def run_dedup_bounded_available_now(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n_state_buckets: int = 64,
    exact_cap: int = DEFAULT_EXACT_CAP,
    bloom_bits: int = DEFAULT_BLOOM_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> StreamingQuery:
    _pin_stream_config(
        checkpoint_dir,
        {
            "mode": "bounded",
            "n_state_buckets": n_state_buckets,
            "bloom_bits": bloom_bits,
            "n_hashes": n_hashes,
        },
    )
    dd = dedup_stream_bounded(
        spark,
        input_dir,
        n_state_buckets,
        exact_cap=exact_cap,
        bloom_bits=bloom_bits,
        n_hashes=n_hashes,
    )
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


def reconcile_bloom_drops(
    spark: SparkSession, input_dir: str, emitted_dir: str
) -> DataFrame:
    """Batch pass that ZEROES the bounded stream's Bloom FP rate.

    The bounded operator's only error is one-sided: a Bloom false
    positive silently DROPS a genuinely-new url (module docstring).
    This pass recovers exactly those urls after (or between) drains:
    every url_hash present in the input but absent from the emitted
    output is, by construction, a Bloom casualty — a true duplicate's
    hash is always present in the output via its first occurrence.

    Returns one row per dropped url in the stream's OUT_SCHEMA, with a
    DETERMINISTIC representative occurrence (min by (warc_ts, text))
    — the stream lost the arrival-order first occurrence, and for
    dedup semantics any single occurrence is equally valid; the min
    makes the pick stable under retries and repartitioning.

    Plan shape at scale: one narrow projection of the input, one
    hash-keyed LEFT ANTI join against the emitted output (both sides
    shuffle once on url_hash), then a groupBy over ONLY the surviving
    rows — the survivor set is the FP set (~p x corpus, p the
    documented Bloom FP rate), so the second shuffle is tiny. Union
    the result with the emitted output to get exact first-occurrence
    dedup at a constant-state stream cost plus one batch pass.
    """
    pages = spark.read.schema(PAGES).parquet(input_dir)
    emitted = spark.read.parquet(emitted_dir).select("url_hash")
    cand = pages.select(
        # same hash the stream computes, so the anti-join keys align
        F.md5(F.col("url").cast("binary")).alias("url_hash"),
        "url",
        "warc_ts",
        "text",
    )
    dropped = cand.join(emitted, "url_hash", "left_anti")
    first = dropped.groupBy("url_hash").agg(
        F.min(F.struct("warc_ts", "text", "url")).alias("b")
    )
    return first.select(F.col("b.url").alias("url"), "url_hash", F.col("b.text").alias("text"))


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
    _pin_stream_config(
        checkpoint_dir,
        {"mode": "exact", "n_state_buckets": n_state_buckets},
    )
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
