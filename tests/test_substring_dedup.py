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


def test_substring_dup_scrub_semantics(spark, corpus_dir):
    """Keep-one-copy removal: the min-doc_id keeper retains its bytes;
    every other doc loses the union of its flagged window spans."""
    from curator_spark.queries.dedupq import q_substring_dup_scrub

    src = pd.read_parquet(os.path.join(corpus_dir, "documents.parquet"))
    texts = dict(zip(src.doc_id, src.text))
    out = (
        q_substring_dup_scrub(spark, corpus_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 0 is the canonical keeper of the x-run: untouched
    assert out.loc[0, "scrubbed_text"] == texts[0]
    assert out.loc[0, "n_dup_windows"] == 0 and out.loc[0, "removed_chars"] == 0
    # doc 1 duplicates doc 0 verbatim: every window flagged, overlap
    # union covers the whole doc -> scrubbed to empty
    assert out.loc[1, "scrubbed_text"] == ""
    assert out.loc[1, "removed_chars"] == 200
    assert out.loc[1, "n_dup_windows"] == (200 - SUB_GRAM) // SUB_STRIDE + 1
    # doc 2 is keeper of the shared S-run: untouched
    assert out.loc[2, "scrubbed_text"] == texts[2]
    # doc 3 loses exactly the one grid-aligned shared window (chars 1..40)
    assert out.loc[3, "n_dup_windows"] == 1
    assert out.loc[3, "removed_chars"] == SUB_GRAM
    assert out.loc[3, "scrubbed_text"] == texts[3][SUB_GRAM:]
    # doc 4 is below the window width: no windows, untouched
    assert out.loc[4, "scrubbed_text"] == texts[4]


def test_substring_dup_scrub_overlap_union(spark, tmp_path):
    """Overlapping flagged windows merge into ONE span — removal is
    the union of covered chars, not a per-window cut."""
    from curator_spark.queries.dedupq import q_substring_dup_scrub

    # run long enough to contain two grid-aligned overlapping windows
    run = "R" * (SUB_GRAM + SUB_STRIDE)          # 60 chars
    head = "h " * 40                              # 80 chars, doc-unique
    tail = " t" * 40
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [run + tail, head + run],     # keeper 0; doc 1 flagged
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [0] * 2,
        }
    )
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"))
    out = (
        q_substring_dup_scrub(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "removed_chars"] == 0
    # doc 1: run occupies chars 81..140; grid starts at 81 and 101 both
    # lie fully inside it -> two overlapping windows, union = 81..140
    assert out.loc[1, "n_dup_windows"] == 2
    assert out.loc[1, "removed_chars"] == SUB_GRAM + SUB_STRIDE
    assert out.loc[1, "scrubbed_text"] == head


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_substring_dup_scrub_random_vs_pure_python(spark, tmp_path, seed):
    """Independent per-row restatement: a pure-Python window/keeper/
    union-removal implementation must byte-agree with the Spark fold
    on seeded random corpora built from a 3-char alphabet (forces
    cross-doc window collisions the fixture never produces)."""
    import random

    from curator_spark.queries.dedupq import q_substring_dup_scrub

    rng = random.Random(seed)
    texts = []
    for _ in range(30):
        n = rng.randint(0, 120)
        texts.append("".join(rng.choice("abc") for _ in range(n)))
    # splice verbatim runs between random docs so keeper routing and
    # overlap union actually trigger
    for _ in range(10):
        a, b = rng.randrange(len(texts)), rng.randrange(len(texts))
        if len(texts[a]) >= SUB_GRAM:
            start = rng.randrange(0, len(texts[a]) - SUB_GRAM + 1)
            run = texts[a][start : start + SUB_GRAM + rng.randint(0, 30)]
            pos = rng.randint(0, len(texts[b]))
            texts[b] = texts[b][:pos] + run + texts[b][pos:]

    docs = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = str(tmp_path)
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    # pure-Python restatement (no md5 needed: raw windows as keys)
    owners: dict[str, set[int]] = {}
    wins: dict[int, list[tuple[int, str]]] = {}
    for i, text in enumerate(texts):
        wins[i] = []
        if len(text) >= SUB_GRAM:
            n_w = (len(text) - SUB_GRAM) // SUB_STRIDE + 1
            for k in range(n_w):
                s0 = k * SUB_STRIDE
                w = text[s0 : s0 + SUB_GRAM]
                wins[i].append((s0, w))
                owners.setdefault(w, set()).add(i)
    expected = {}
    for i, text in enumerate(texts):
        cut = set()
        n_flagged = 0
        for s0, w in wins[i]:
            own = owners[w]
            if len(own) >= 2 and i != min(own):
                n_flagged += 1
                cut.update(range(s0, s0 + SUB_GRAM))
        kept = "".join(ch for j, ch in enumerate(text) if j not in cut)
        expected[i] = (n_flagged, len(text) - len(kept), kept)

    got = {
        r.doc_id: (r.n_dup_windows, r.removed_chars, r.scrubbed_text)
        for r in q_substring_dup_scrub(spark, d).collect()
    }
    assert got == expected
