"""Spark rule stats vs the pandas oracle on ADVERSARIAL whitespace —
pins the batch-4 fix that aligned the oracle to Java's ASCII \\s class
and space-only line trim. Python's Unicode-aware \\s (the old oracle)
tokenized NBSP/thin-space differently from the Catalyst expressions
and shifted every ratio stat on such input."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from curator_spark.functions import textstats as ts
from curator_spark.oracle.quality_oracle import _stats_row

# tokens drawn from word chars, ASCII whitespace, Unicode whitespace
# (NOT Java \s), symbols, and newlines
_atoms = st.sampled_from(
    ["the", "fox", "Word", "a1", "#", "$$", " ", " ", "　",
     " ", "\t", "\n", "\x0b", "\f", "\r", "..", "and"]
)
texts_strategy = st.lists(
    st.lists(_atoms, min_size=0, max_size=40).map("".join),
    min_size=1,
    max_size=24,
)


@pytest.fixture(scope="module")
def stats_fn(spark):
    def run(texts: list[str]) -> list[tuple]:
        df = spark.createDataFrame(
            pd.DataFrame({"text": texts})
        )
        s = ts.all_stats(F.col("text"))
        rows = df.select(
            s["word_count"].alias("wc"),
            s["mean_word_length"].alias("mwl"),
            s["symbol_ratio"].alias("symr"),
            s["repeated_line_fraction"].alias("rlf"),
            s["stopword_density"].alias("swd"),
        ).collect()
        return [
            (r["wc"], r["mwl"], r["symr"], r["rlf"], r["swd"]) for r in rows
        ]

    return run


@settings(max_examples=25, deadline=None)
@given(texts=texts_strategy)
def test_rule_stats_match_oracle_on_unicode_whitespace(stats_fn, texts):
    got = stats_fn(texts)
    want = [_stats_row(t) for t in texts]
    for g, w, t in zip(got, want, texts):
        for gv, wv in zip(g, w):
            assert abs(gv - wv) < 1e-12, (t.encode(), g, w)
