"""Native rule expressions vs the oracle's Python stats on edge cases."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from curator_spark.functions import textstats as ts
from curator_spark.oracle.quality_oracle import _stats_row

EDGE_TEXTS = [
    "the quick brown fox",
    "  leading and trailing   ",
    "one\ntwo\ntwo\ntwo\n",
    "a",
    "###$ %%% ^^^",
    "word " * 50,
    "line\n\n\nline\nother",
    "tab\tseparated\twords here",
]


def test_stats_match_oracle(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": EDGE_TEXTS}))
    stats = ts.all_stats(F.col("text"))
    rows = df.select(
        "text", *[c.alias(n) for n, c in stats.items()]
    ).collect()
    for r in rows:
        wc, mwl, symr, rlf, swd = _stats_row(r["text"])
        assert r["word_count"] == wc, r["text"]
        assert abs(r["mean_word_length"] - mwl) < 1e-12, r["text"]
        assert abs(r["symbol_ratio"] - symr) < 1e-12, r["text"]
        assert abs(r["repeated_line_fraction"] - rlf) < 1e-12, r["text"]
        assert abs(r["stopword_density"] - swd) < 1e-12, r["text"]


def test_extraction_native(spark):
    from curator_spark.stages.extract import with_extracted_text

    html = "<html><head><title>t</title></head><body><p>hello\nworld</p></body></html>"
    df = spark.createDataFrame([(html.encode(),)], "html binary")
    out = with_extracted_text(df).collect()[0]
    assert out["extracted_text"] == "hello\nworld"


def test_stopword_fast_equals_hof(spark, pages_path):
    """The codegen'd lookaround form must equal the HOF/oracle form on
    every synthetic profile."""
    from pyspark.sql import functions as F

    from curator_spark.functions import textstats as ts

    df = spark.read.parquet(pages_path).select(
        ts.stopword_density(F.col("text")).alias("hof"),
        ts.stopword_density_fast(F.col("text")).alias("fast"),
    )
    assert df.where(F.col("hof") != F.col("fast")).count() == 0


def test_null_text_fails_word_count_rule(spark, cfg):
    """NULL text must drop deterministically at the word_count rule:
    regexp_count(NULL) is NULL, so word_count coalesces it to -1 (the
    legacy size(split(NULL)) value) — without that, the NULL row's
    fail_rule_word_count would be NULL and the drop would shift to a
    later rule (ADVICE r3)."""
    from pyspark.sql import functions as F

    from curator_spark.stages.rules import with_rule_flags, with_rule_stats

    df = spark.createDataFrame(
        [("n", None), ("e", ""), ("ok", "the quick brown fox is here")],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in with_rule_flags(with_rule_stats(df), cfg).collect()
    }
    for k in ("n", "e"):
        row = out[k]
        assert row["fail_rule_word_count"] is True
        assert row["mean_word_length"] == 0.0
        assert row["stopword_density"] == 0.0
    assert out["n"]["word_count"] == -1
    assert out["e"]["word_count"] == 0
    assert out["ok"]["fail_rule_word_count"] in (True, False)  # non-null
