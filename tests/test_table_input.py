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


def test_incremental_processes_only_appends(
    spark, pages_table, cfg, tmp_path
):
    """Bootstrap processes the whole table; after an append the next
    call pays for ONLY the new rows (the growing-crawl contract), and
    with nothing new it is a metadata-only no-op."""
    from curator_spark.engine.synth import generate_pages

    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    r1 = pipe.run_incremental(spark, pages_table)
    assert not r1.cached and r1.docs_seen == 1200

    # no new data: no-op, nothing reprocessed
    r2 = pipe.run_incremental(spark, pages_table)
    assert r2.cached

    extra = generate_pages(spark, 60).withColumn(
        "url", F.concat(F.lit("https://c1.example/"), F.col("url"))
    )
    pages_table.append(extra, {"crawl": "c1"})
    r3 = pipe.run_incremental(spark, pages_table)
    assert not r3.cached
    assert r3.docs_seen == 60  # ONLY the appended slice
    assert r3.fingerprint != r1.fingerprint

    # the output table accumulates both slices, rows never duplicated
    out = pipe.table.read(spark)
    assert out.count() == 1260
    assert out.select("url").distinct().count() == 1260


def test_incremental_killed_slice_resumes(spark, pages_table, cfg, tmp_path):
    """A slice killed mid-way (max_buckets) must RESUME — the
    watermark may only advance once every bucket of the slice is
    committed, else a crash would silently skip rows."""
    from curator_spark.engine.synth import generate_pages

    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    pipe.run_incremental(spark, pages_table)

    extra = generate_pages(spark, 80).withColumn(
        "url", F.concat(F.lit("https://c1.example/"), F.col("url"))
    )
    pages_table.append(extra, {"crawl": "c1"})

    part = pipe.run_incremental(spark, pages_table, max_buckets=5)
    assert len(part.buckets_processed) == 5

    # mid-slice, the lineage view shows the incomplete slice
    st = pipe.incremental_state(pages_table)
    assert len(st) == 2 and st[0]["complete"] and not st[1]["complete"]
    assert st[1]["fingerprint"] == part.fingerprint
    assert st[1]["buckets_done"] == 5

    # a FURTHER append lands while the slice is incomplete: the next
    # call must finish the pinned slice, not jump to a wider one
    extra2 = generate_pages(spark, 40).withColumn(
        "url", F.concat(F.lit("https://c2.example/"), F.col("url"))
    )
    pages_table.append(extra2, {"crawl": "c2"})

    rest = pipe.run_incremental(spark, pages_table)
    assert rest.fingerprint == part.fingerprint  # same slice resumed
    assert not set(rest.buckets_processed) & set(part.buckets_processed)

    # now the c2 slice
    r_c2 = pipe.run_incremental(spark, pages_table)
    assert not r_c2.cached and r_c2.docs_seen == 40
    assert pipe.table.read(spark).count() == 1200 + 80 + 40
    assert pipe.run_incremental(spark, pages_table).cached

    st = pipe.incremental_state(pages_table)
    assert [s["complete"] for s in st] == [True, True, True]
    assert st[1]["docs_seen"] == 80 and st[2]["docs_seen"] == 40
    # watermark chains: each slice starts where the previous ended
    assert st[1]["since"] == st[0]["to"] and st[2]["since"] == st[1]["to"]


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

    # incremental face (fresh output table: run() commits don't carry
    # the watermark, so incremental lineage starts from its own
    # bootstrap): first call processes everything, second is a
    # metadata-only no-op
    out2 = str(tmp_path / "out_cli_inc")
    for expect_cached in (False, True):
        rc = cli.main([
            "--input", pages_table.root, "--input-format", "table",
            "--incremental", "--out", out2, "--cores", "8",
        ])
        assert rc == 0
        res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res2["cached"] is expect_cached


def test_incremental_watermark_survives_output_compaction(
    spark, pages_table, cfg, tmp_path
):
    """Compacting an OLD slice's fingerprint re-appends its merged
    meta as the newest commit. Slice discovery must take the watermark
    from the furthest COMPLETE slice group — not from commit order —
    else the next append opens a window overlapping already-processed
    slices and duplicates their rows."""
    from curator_spark.engine.synth import generate_pages

    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    # slice A in two commits (so compaction has something to merge)
    r1 = pipe.run_incremental(spark, pages_table, max_buckets=5)
    pipe.run_incremental(spark, pages_table)

    extra = generate_pages(spark, 60).withColumn(
        "url", F.concat(F.lit("https://c1.example/"), F.col("url"))
    )
    pages_table.append(extra, {"crawl": "c1"})
    pipe.run_incremental(spark, pages_table)  # slice B complete

    # compact slice A: its meta becomes the NEWEST output commit
    assert pipe.compact(spark, r1.fingerprint) is not None
    assert pipe.run_incremental(spark, pages_table).cached  # still no-op

    extra2 = generate_pages(spark, 40).withColumn(
        "url", F.concat(F.lit("https://c2.example/"), F.col("url"))
    )
    pages_table.append(extra2, {"crawl": "c2"})
    r3 = pipe.run_incremental(spark, pages_table)
    assert r3.docs_seen == 40  # ONLY the c2 slice — B must not re-run
    out = pipe.table.read(spark)
    assert out.count() == 1300
    assert out.select("url").distinct().count() == 1300
    # lineage stays chained despite the compaction reordering commits
    st = pipe.incremental_state(pages_table)
    done = sorted((s["since"], s["to"]) for s in st if s["complete"])
    assert [a for a, _ in done[1:]] == [b for _, b in done[:-1]]


def test_cli_delete_urls_applies_after_incremental_noop(
    spark, pages_table, tmp_path, capsys
):
    """A no-op incremental run reports fingerprint '' — a GDPR
    --delete-urls on that invocation must still delete from the
    committed output (all fingerprints), not scope to the empty
    fingerprint and silently remove nothing."""
    import json

    from curator_spark import cli

    out = str(tmp_path / "out_del")
    args = [
        "--input", pages_table.root, "--input-format", "table",
        "--incremental", "--out", out, "--cores", "8",
    ]
    assert cli.main(args) == 0
    capsys.readouterr()

    victim = pages_table.read(spark).select("url").first().url
    f = tmp_path / "victims.txt"
    f.write_text(victim + "\n")
    assert cli.main(args + ["--delete-urls", str(f)]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["cached"] is True and res["fingerprint"] == ""
    assert res["deleted"]["deleted_rows"] == 1
    from curator_spark.pipeline.snapshot import SnapshotTable

    remaining = SnapshotTable(out).read(spark)
    assert remaining.where(F.col("url") == victim).count() == 0


def test_cli_incremental_state(spark, pages_table, tmp_path, capsys):
    """--incremental-state prints the slice lineage and exits without
    running (metadata-only, parseable JSON)."""
    import json

    from curator_spark import cli

    out = str(tmp_path / "out_state")
    base = [
        "--input", pages_table.root, "--input-format", "table",
        "--out", out, "--cores", "8",
    ]
    # before any incremental run: empty lineage
    assert cli.main(base + ["--incremental-state"]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == []

    assert cli.main(base + ["--incremental"]) == 0
    capsys.readouterr()
    assert cli.main(base + ["--incremental-state"]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(st) == 1 and st[0]["complete"] and st[0]["docs_seen"] == 1200


@pytest.mark.parametrize("seed", [3, 11])
def test_incremental_model_random_ops(spark, tmp_path, seed):
    """Model-based check of the watermark machinery: a random
    interleaving of append / full slice / partial slice / compaction
    must end (after draining) with every appended row in the output
    EXACTLY once and a cleanly chained complete-slice lineage."""
    import random

    from curator_spark.engine.synth import generate_pages

    rng = random.Random(seed)
    intab = SnapshotTable(str(tmp_path / f"in_{seed}"))
    pipe = QualityPipeline(str(tmp_path / f"out_{seed}"))
    total = 0
    n_appends = 0

    def append():
        nonlocal total, n_appends
        k = rng.choice([200, 400, 600])
        df = generate_pages(spark, k).withColumn(
            "url",
            F.concat(F.lit(f"https://c{n_appends}.example/"), F.col("url")),
        )
        intab.append(df, {"crawl": f"c{n_appends}"})
        total += k
        n_appends += 1

    append()  # non-empty bootstrap
    for _ in range(8):
        op = rng.choice(["append", "inc", "inc_partial", "compact"])
        if op == "append":
            append()
        elif op == "inc":
            pipe.run_incremental(spark, intab)
        elif op == "inc_partial":
            pipe.run_incremental(
                spark, intab, max_buckets=rng.randint(1, 8)
            )
        else:
            done = [
                s for s in pipe.incremental_state(intab) if s["complete"]
            ]
            if done:
                pipe.compact(spark, rng.choice(done)["fingerprint"])

    # drain: finish any partial slice and consume any pending appends
    for _ in range(16):
        if pipe.run_incremental(spark, intab).cached:
            break
    else:
        raise AssertionError("drain did not reach the cached no-op")

    out = pipe.table.read(spark)
    assert out.count() == total
    assert out.select("url").distinct().count() == total
    st = [s for s in pipe.incremental_state(intab) if s["complete"]]
    spans = sorted((s["since"], s["to"]) for s in st)
    assert spans[0][0] == 0
    assert all(a2 == b1 for (_, b1), (a2, _) in zip(spans, spans[1:]))
    assert spans[-1][1] == intab.current_snapshot_id()
