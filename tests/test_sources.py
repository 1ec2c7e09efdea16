"""Round-trip tests for the format-pluggable pages source/sink
(SURVEY §2.1 S5 JSONL parity): parquet -> jsonl/csv -> read must be
value-identical under the declared schema, binary html included for
JSONL (base64 carriage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curator_spark.sources import read_pages, write_pages_as


@pytest.fixture(scope="module")
def pages_df(spark, pages_path):
    return read_pages(spark, pages_path).orderBy("url").limit(500).cache()


def _hash(df, cols):
    row = (
        df.select(
            F.md5(
                F.concat_ws(
                    "\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("\x02")) for c in cols]
                )
            ).alias("h")
        )
        .agg(F.md5(F.concat_ws("", F.sort_array(F.collect_list("h")))).alias("H"))
        .first()
    )
    return row["H"]


def test_jsonl_roundtrip_identical(spark, pages_df, tmp_path):
    p = str(tmp_path / "pages_jsonl")
    write_pages_as(pages_df, p, "jsonl")
    back = read_pages(spark, p, "jsonl")
    assert back.schema == pages_df.schema
    cols = [f.name for f in pages_df.schema.fields]
    assert back.count() == pages_df.count()
    assert _hash(back, cols) == _hash(pages_df, cols)


def test_csv_roundtrip_identical_sans_binary(spark, pages_df, tmp_path):
    p = str(tmp_path / "pages_csv")
    write_pages_as(pages_df, p, "csv")
    back = read_pages(spark, p, "csv")
    cols = [f.name for f in pages_df.schema.fields if f.name != "html"]
    assert [f.name for f in back.schema.fields] == cols
    assert back.count() == pages_df.count()
    assert _hash(back, cols) == _hash(pages_df.drop("html"), cols)


def test_unknown_format_rejected(spark, pages_df, tmp_path):
    with pytest.raises(ValueError):
        read_pages(spark, str(tmp_path), "orc2")
    with pytest.raises(ValueError):
        write_pages_as(pages_df, str(tmp_path / "x"), "orc2")
