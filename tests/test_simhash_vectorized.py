"""Bit-exactness of the batch-vectorized SimHash (VERDICT r2 ask #3).

The vectorized `_simhash_batch` (one md5 per batch-unique word,
numpy scatter-add votes) must reproduce the definitional per-row
implementation exactly: per row, per distinct word, md5-prefix 64-bit
feature hash, ±1 vote per bit, sign fold. The reference implementation
below is the definition, kept deliberately naive.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from curator_spark.queries.pipelineq import _simhash_batch

_WS = re.compile(r"[ \t\n\r\f\v]+")


def _simhash_row_reference(txt: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for w in set(_WS.split(txt)) - {""}:
        h = int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "big")
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    val = 0
    for b in range(64):
        if acc[b] > 0:
            val |= 1 << b
    # two's-complement fold into int64
    return val - (1 << 64) if val >= (1 << 63) else val


def test_simhash_known_batch():
    texts = pd.Series(
        [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox",
            "",
            None,
            "   ",  # whitespace-only -> zero words -> 0
            "solo",
            "répétition déjà vu déjà vu",
            "a b c d e f g h i j k l m n o p",
        ]
    )
    got = _simhash_batch(texts).to_numpy()
    want = np.array(
        [_simhash_row_reference(t or "") for t in texts], dtype=np.int64
    )
    assert (got == want).all()
    assert got[2] == 0 and got[3] == 0 and got[4] == 0


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("L", "N", "P", "Zs"),
                max_codepoint=0x2FFF,
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_simhash_matches_reference(texts):
    got = _simhash_batch(pd.Series(texts)).to_numpy()
    want = np.array([_simhash_row_reference(t) for t in texts], dtype=np.int64)
    assert (got == want).all()
