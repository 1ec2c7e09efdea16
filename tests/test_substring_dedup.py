"""ExactSubstr-style substring_dup_spans semantics, pinned on a
hand-built corpus (the synthetic testdata has no verbatim duplicates;
DuckDB parity at sf0.001/0.01 is covered by test_queries_oracle.py)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from curator_spark.queries.dedupq import (
    SUB_GRAM,
    SUB_STRIDE,
    q_substring_dup_spans,
)


@pytest.fixture()
def corpus_dir(tmp_path):
    base = "x" * 200                      # 200-char doc, all windows shared
    unique1 = "a b c " * 40               # distinct content
    unique2 = "d e f " * 40
    shared = "S" * (SUB_GRAM + SUB_STRIDE - 1)  # minimal guaranteed-recall run
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                base,                      # exact dup of doc 1
                base,
                unique1 + shared,          # shares only the trailing run
                shared + unique2,          # ... with doc 2
                "short",                   # < SUB_GRAM chars: no windows
            ],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": [0] * 5,
        }
    )
    docs["n_chars"] = docs["text"].str.len()
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_substring_dup_spans_semantics(spark, corpus_dir):
    out = (
        q_substring_dup_spans(spark, corpus_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # verbatim duplicates: every sampled window is shared
    assert out.loc[0, "dup_frac"] == 1.0
    assert out.loc[1, "dup_frac"] == 1.0
    # a duplicate run of exactly SUB_GRAM + SUB_STRIDE - 1 chars must be
    # detected (the guaranteed-recall bound) but not cover the doc
    for d in (2, 3):
        assert 0 < out.loc[d, "n_dup"] < out.loc[d, "n_windows"]
    # sub-window docs produce no rows (no sampled windows)
    assert 4 not in out.index
    # window arithmetic: floor((len - G)/S) + 1
    n = len("x" * 200)
    assert out.loc[0, "n_windows"] == (n - SUB_GRAM) // SUB_STRIDE + 1
