"""Snapshot-pinned table input (north rule: "reads and writes Iceberg
tables") — QualityPipeline.run(input_table=...).

The fingerprint for a table input is "table:<ident>@<snapshot_id>" and
the read time-travels to exactly that snapshot, so: a resumed run on
an unchanged table re-derives the same fingerprint and resumes; a
table grown by a new crawl is a NEW fingerprint (full reprocess) by
construction; and a mid-run append cannot tear the input (the
processed view is the pinned snapshot, not "current").
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curator_spark.pipeline.run import QualityPipeline
from curator_spark.pipeline.snapshot import SnapshotTable


@pytest.fixture()
def pages_table(spark, pages_path, tmp_path):
    tab = SnapshotTable(str(tmp_path / "pages_tab"))
    tab.append(spark.read.parquet(pages_path), {"crawl": "c0"})
    return tab


def test_table_input_end_to_end_and_resume(
    spark, pages_table, pages_path, cfg, tmp_path
):
    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    r1 = pipe.run(spark, input_table=pages_table, max_buckets=5)
    assert len(r1.buckets_processed) == 5 and not r1.cached
    # unchanged table: same fingerprint — the second run RESUMES
    r2 = pipe.run(spark, input_table=pages_table)
    assert r2.fingerprint == r1.fingerprint
    assert not set(r2.buckets_processed) & set(r1.buckets_processed)
    assert pipe.run(spark, input_table=pages_table).cached

    # output identical to the parquet-path run over the same rows
    out = pipe.read_output(spark, r1.fingerprint)
    ref_pipe = QualityPipeline(str(tmp_path / "out_ref"), cfg)
    ref = ref_pipe.run(spark, pages_path)
    ref_out = ref_pipe.read_output(spark, ref.fingerprint)
    assert out.count() == ref_out.count()
    joined = out.select("url", "keep", "scrubbed_text").join(
        ref_out.select(
            "url",
            F.col("keep").alias("k2"),
            F.col("scrubbed_text").alias("s2"),
        ),
        "url",
    )
    assert joined.count() == out.count()
    assert joined.filter(
        (F.col("keep") != F.col("k2"))
        | ~F.col("scrubbed_text").eqNullSafe(F.col("s2"))
    ).count() == 0


def test_table_growth_is_new_fingerprint(spark, pages_table, cfg, tmp_path):
    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    r1 = pipe.run(spark, input_table=pages_table)
    n1 = pipe.read_output(spark, r1.fingerprint).count()

    from curator_spark.engine.synth import generate_pages

    extra = generate_pages(spark, 80).withColumn(
        "url", F.concat(F.lit("https://c1.example/"), F.col("url"))
    )
    pages_table.append(extra, {"crawl": "c1"})

    r2 = pipe.run(spark, input_table=pages_table)
    assert r2.fingerprint != r1.fingerprint
    assert pipe.read_output(spark, r2.fingerprint).count() == n1 + 80
    # the old fingerprint's output is untouched history
    assert pipe.read_output(spark, r1.fingerprint).count() == n1


def test_exactly_one_input_required(spark, pages_table, cfg, tmp_path):
    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    with pytest.raises(ValueError, match="exactly one"):
        pipe.run(spark)
    with pytest.raises(ValueError, match="exactly one"):
        pipe.run(spark, "/x", input_table=pages_table)
    empty = SnapshotTable(str(tmp_path / "empty_tab"))
    with pytest.raises(ValueError, match="no data commits"):
        pipe.run(spark, input_table=empty)


def test_cli_table_input(spark, pages_table, tmp_path, capsys):
    import json

    from curator_spark import cli

    out = str(tmp_path / "out_cli")
    rc = cli.main([
        "--input", pages_table.root, "--input-format", "table",
        "--out", out, "--cores", "8",
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["docs_seen"] == 1200 and not res["cached"]
