"""Bounded-state streaming dedup (dedup_stream.dedup_stream_bounded).

Pins the three contracts of the Bloom-front mode:
1. state size PLATEAUS: once n_seen crosses exact_cap the exact hash
   array is dropped and every later state write is exactly
   bloom_bytes + counter — independent of total history;
2. duplicates are NEVER re-emitted, in exact mode or bloom mode;
3. the only error is one-sided: a Bloom false positive can drop a
   genuinely-new doc, never resurrect an old one (FP bound documented
   in the module docstring).
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from curator_spark.streaming.dedup_stream import (
    make_bounded_dedup_fn,
    reconcile_bloom_drops,
    run_dedup_bounded_available_now,
)

BLOOM_BITS = 4096
K = 4
CAP = 8


class FakeState:
    """Minimal GroupState stand-in for driving the state fn directly."""

    def __init__(self) -> None:
        self._v = None

    @property
    def exists(self) -> bool:
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v) -> None:
        self._v = v


def _positions(h: str) -> np.ndarray:
    # deterministic stand-in for the JVM-side pmod(xxhash64(url, i), m)
    return np.array(
        [
            int.from_bytes(
                hashlib.md5(f"{h}:{i}".encode()).digest()[:8], "big"
            )
            % BLOOM_BITS
            for i in range(K)
        ],
        dtype=np.int64,
    )


def _pdf(hashes: list[str]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "url": ["u://" + h for h in hashes],
            "url_hash": hashes,
            "text": ["t"] * len(hashes),
            "bloom_pos": [_positions(h) for h in hashes],
        }
    )


def _run(fn, state, hashes: list[str]) -> list[str]:
    out = list(fn((0,), iter([_pdf(hashes)]), state))
    return [h for pdf in out for h in pdf["url_hash"]]


def test_state_plateaus_and_never_reemits():
    fn = make_bounded_dedup_fn(CAP, BLOOM_BITS)
    state = FakeState()
    h = [f"h{i:04d}" for i in range(40)]

    # batch 1: 6 fresh, under the cap -> exact mode, all emitted
    assert _run(fn, state, h[:6]) == h[:6]
    n_seen, seen, bloom = state.get
    assert n_seen == 6 and sorted(seen) == h[:6]
    assert len(bloom) == BLOOM_BITS // 8

    # batch 2: 6 old + 6 new crosses the cap: exactly the new emitted
    # (still exact at check time), then the exact array is DROPPED
    assert _run(fn, state, h[:12]) == h[6:12]
    n_seen, seen, bloom = state.get
    assert n_seen == 12 and seen is None
    assert len(bloom) == BLOOM_BITS // 8

    # batch 3 (bloom mode): 12 old + 4 new -> no old hash re-emitted,
    # emitted subset of the new (FPs may drop, never resurrect)
    got3 = _run(fn, state, h[:16])
    assert set(got3) <= set(h[12:16])
    assert not set(got3) & set(h[:12])
    size3 = len(state.get[2])

    # batch 4: replay everything -> nothing emitted, state size flat
    assert _run(fn, state, h[:16]) == []
    n_seen4, seen4, bloom4 = state.get
    assert seen4 is None and len(bloom4) == size3 == BLOOM_BITS // 8

    # many more batches: state write size stays EXACTLY constant
    for lo in range(16, 40, 8):
        _run(fn, state, h[lo : lo + 8])
        assert state.get[1] is None
        assert len(state.get[2]) == BLOOM_BITS // 8


def test_in_batch_duplicates_emitted_once():
    fn = make_bounded_dedup_fn(CAP, BLOOM_BITS)
    state = FakeState()
    assert _run(fn, state, ["a", "b", "a", "c", "b"]) == ["a", "b", "c"]


def test_bounded_stream_end_to_end(spark, pages_path, tmp_path):
    """availableNow drains through the bounded operator: a duplicate
    file contributes nothing across restarts, and with a web-sized
    bloom the FP loss at this corpus size is ~0 (p < 1e-12/doc), so
    counts match the exact-dedup truth."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = sorted(glob.glob(os.path.join(pages_path, "*.parquet")))

    shutil.copy(src[0], os.path.join(in_dir, "a.parquet"))
    # exact_cap=25 with ~75 docs/bucket forces bloom mode in drain 1
    run_dedup_bounded_available_now(
        spark, in_dir, out_dir, ckpt,
        n_state_buckets=8, exact_cap=25, bloom_bits=1 << 20,
    )
    first = spark.read.parquet(out_dir)
    assert first.count() == first.select("url").distinct().count() > 0

    # drain 2 resumes from checkpointed (bloom-mode) state
    shutil.copy(src[0], os.path.join(in_dir, "dup.parquet"))
    shutil.copy(src[1], os.path.join(in_dir, "b.parquet"))
    run_dedup_bounded_available_now(
        spark, in_dir, out_dir, ckpt,
        n_state_buckets=8, exact_cap=25, bloom_bits=1 << 20,
    )
    out = spark.read.parquet(out_dir)
    expect = (
        spark.read.parquet(src[0], src[1]).select("url").distinct().count()
    )
    assert out.count() == expect
    assert out.select("url").distinct().count() == expect


def test_reconcile_zeroes_bloom_drops(spark, pages_path, tmp_path):
    """A deliberately-tiny bloom (64 bits for ~75 docs) saturates and
    FP-drops most post-cap urls; reconcile_bloom_drops must recover
    EXACTLY the dropped set, so emitted + reconciled == exact distinct
    urls with no overlap and a stable schema."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
    # drain 1 crosses exact_cap and saturates the 64-bit bloom; the
    # transition applies from the NEXT state-fn chunk, so the FP drops
    # land on drain 2's genuinely-new urls
    shutil.copy(src[0], os.path.join(in_dir, "a.parquet"))
    run_dedup_bounded_available_now(
        spark, in_dir, out_dir, ckpt,
        n_state_buckets=2, exact_cap=5, bloom_bits=64,
    )
    shutil.copy(src[1], os.path.join(in_dir, "b.parquet"))
    run_dedup_bounded_available_now(
        spark, in_dir, out_dir, ckpt,
        n_state_buckets=2, exact_cap=5, bloom_bits=64,
    )
    emitted = spark.read.parquet(out_dir)
    truth = spark.read.parquet(in_dir).select("url").distinct()
    n_truth = truth.count()
    # the saturated bloom must actually have dropped something, or the
    # reconcile path isn't exercised (p ~ 0.99 per post-cap doc here)
    assert emitted.count() < n_truth

    rec = reconcile_bloom_drops(spark, in_dir, out_dir)
    assert rec.columns == ["url", "url_hash", "text"]
    # exact complement: no overlap, union restores the full url set
    assert rec.join(emitted, "url_hash", "inner").count() == 0
    union = emitted.select("url").union(rec.select("url"))
    assert union.distinct().count() == union.count() == n_truth
    # deterministic representative: a second run picks identical rows
    rec2 = reconcile_bloom_drops(spark, in_dir, out_dir)
    assert rec.exceptAll(rec2).count() == 0
    assert rec2.exceptAll(rec).count() == 0


def test_stream_config_pin_unit(tmp_path):
    """Membership geometry is pinned with the checkpoint: same config
    re-pins silently, conflicting geometry raises naming the offending
    keys, and a torn pin file refuses rather than guessing."""
    from curator_spark.streaming.dedup_stream import (
        STREAM_PIN_FILE,
        _pin_stream_config,
    )

    ck = str(tmp_path / "ck")
    cfg = {"mode": "bounded", "n_state_buckets": 8,
           "bloom_bits": 1 << 20, "n_hashes": 5}
    _pin_stream_config(ck, cfg)            # first start writes the pin
    _pin_stream_config(ck, dict(cfg))      # identical restart: fine
    with pytest.raises(ValueError, match="bloom_bits"):
        _pin_stream_config(ck, {**cfg, "bloom_bits": 1 << 10})
    with pytest.raises(ValueError, match="n_state_buckets"):
        _pin_stream_config(ck, {**cfg, "n_state_buckets": 16})
    with open(os.path.join(ck, STREAM_PIN_FILE), "w") as fh:
        fh.write('{"torn')
    with pytest.raises(ValueError, match="unreadable"):
        _pin_stream_config(ck, cfg)


def test_bounded_restart_with_changed_geometry_refuses(
    spark, pages_path, tmp_path
):
    """A checkpointed bounded stream restarted with different bloom
    geometry would silently re-emit duplicates (positions computed in a
    different modulus than the restored bit arrays) — the run helper
    must refuse before the stream starts."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
    shutil.copy(src[0], os.path.join(in_dir, "a.parquet"))
    run_dedup_bounded_available_now(
        spark, in_dir, out_dir, ckpt,
        n_state_buckets=8, exact_cap=25, bloom_bits=1 << 20,
    )
    n1 = spark.read.parquet(out_dir).count()
    with pytest.raises(ValueError, match="bloom_bits"):
        run_dedup_bounded_available_now(
            spark, in_dir, out_dir, ckpt,
            n_state_buckets=8, exact_cap=25, bloom_bits=1 << 16,
        )
    # exact_cap is NOT membership geometry: changing it is safe and
    # must not refuse (the exact->bloom transition is one-way).
    run_dedup_bounded_available_now(
        spark, in_dir, out_dir, ckpt,
        n_state_buckets=8, exact_cap=50, bloom_bits=1 << 20,
    )
    assert spark.read.parquet(out_dir).count() == n1  # nothing re-emitted
