"""frame_hash fidelity regressions (batch-4 comparator fix)."""

from __future__ import annotations

import pandas as pd

from curator_spark.oracle.compare import frame_hash


def test_int64_low_bits_survive_mixed_dtype_frames():
    """iterrows upcast int64 to float64 in mixed frames, so 2**62+1
    and 2**62+2 hashed identically — a false PASS for 64-bit
    hash/id outputs. Column-wise canonicalization keeps exact ints."""
    a = pd.DataFrame({"h": [2**62 + 1], "s": [0.5]})
    b = pd.DataFrame({"h": [2**62 + 2], "s": [0.5]})
    assert frame_hash(a) != frame_hash(b)


def test_nullable_int_and_none_canonicalize_as_null():
    a = pd.DataFrame({"n": pd.array([1, None], dtype="Int64")})
    b = pd.DataFrame({"n": pd.array([1, None], dtype="Int64")})
    assert frame_hash(a) == frame_hash(b)
    c = pd.DataFrame({"n": pd.array([1, 2], dtype="Int64")})
    assert frame_hash(a) != frame_hash(c)


def test_row_order_and_column_order_insensitive():
    a = pd.DataFrame({"x": [1, 2], "y": ["u", "v"]})
    b = pd.DataFrame({"y": ["v", "u"], "x": [2, 1]})
    assert frame_hash(a) == frame_hash(b)
