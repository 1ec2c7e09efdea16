"""Determinism of the synthetic generator (FIXTURES.md: any row is
reproducible independently of partitioning / row order)."""

from __future__ import annotations

from curator_spark.engine.synth import generate_pages, make_row


def test_row_is_pure_function_of_index():
    a = make_row(123)
    b = make_row(123)
    assert a == b
    assert make_row(124) != a


def test_partitioning_independence(spark):
    one = generate_pages(spark, 200).orderBy("url").collect()
    # different parallelism → same table
    many = (
        spark.range(0, 200, numPartitions=1)
        .mapInPandas(
            lambda it: (
                __import__("pandas").DataFrame(
                    [make_row(int(i)) for i in b["id"]]
                )[["url", "warc_ts", "html", "text", "lang"]]
                for b in it
            ),
            schema="url string, warc_ts timestamp, html binary, text string, lang string",
        )
        .orderBy("url")
        .collect()
    )
    assert [r["url"] for r in one] == [r["url"] for r in many]
    assert [r["text"] for r in one] == [r["text"] for r in many]


def test_profile_mix(spark):
    from collections import Counter

    rows = [make_row(i) for i in range(2000)]
    c = Counter(r["profile"] for r in rows)
    assert 0.64 < c["clean"] / 2000 < 0.76
    assert all(
        p in c
        for p in (
            "non_english",
            "gibberish",
            "symbols",
            "repeated",
            "long_words",
            "low_stopword",
            "pii",
        )
    )


def test_domain_skew():
    rows = [make_row(i) for i in range(2000)]
    mega = sum(1 for r in rows if ".example.com/" in r["url"])
    assert 0.4 < mega / 2000 < 0.6  # ~10 domains own ~50% of rows
