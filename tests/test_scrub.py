"""Scrub-core unit tests (PII + toxicity rewrite)."""

from __future__ import annotations

import pandas as pd

from curator_spark.functions.scrub_core import scrub_series


def test_email_scrub():
    out, counts = scrub_series(pd.Series(["mail me at bob.smith+x@ex-ample.co.uk now"]))
    assert out[0] == "mail me at <EMAIL> now"
    assert counts["emails"][0] == 1


def test_ssn_scrub():
    out, counts = scrub_series(pd.Series(["ssn 123-45-6789 end"]))
    assert out[0] == "ssn <ID> end"
    assert counts["ids"][0] == 1


def test_phone_scrub():
    out, counts = scrub_series(pd.Series(["call (415) 555-2671 or 415-555-2671 today"]))
    assert out[0] == "call <PHONE> or <PHONE> today"
    assert counts["phones"][0] == 2


def test_toxic_scrub_case_insensitive():
    out, counts = scrub_series(pd.Series(["you Idiot and MORON"]))
    assert out[0] == "you <TOX> and <TOX>"
    assert counts["toxic"][0] == 2


def test_email_not_double_counted_as_phone():
    out, counts = scrub_series(pd.Series(["a@b.com"]))
    assert out[0] == "<EMAIL>"
    assert counts["phones"][0] == 0


def test_null_and_clean_passthrough():
    out, counts = scrub_series(pd.Series([None, "perfectly clean text"]))
    assert out[0] == ""
    assert out[1] == "perfectly clean text"
    assert counts.sum().sum() == 0


def test_scrub_is_fixed_point_on_corpus():
    """Re-scrubbing scrubbed text changes nothing and counts nothing:
    the replacement tokens are outside every rule's match language, so
    one pass is enough (a second pass double-counting [EMAIL] tokens
    would corrupt downstream scrub metrics)."""
    import duckdb
    import pandas as pd

    from curator_spark.functions.scrub_core import scrub_series

    texts = pd.Series(
        [
            r[0]
            for r in duckdb.sql(
                "SELECT text FROM "
                "read_parquet('/root/testdata/sf0.01/documents.parquet')"
            ).fetchall()
        ]
    )
    once, _ = scrub_series(texts)
    twice, counts2 = scrub_series(once)
    assert (once == twice).all()
    assert int(counts2.to_numpy().sum()) == 0
