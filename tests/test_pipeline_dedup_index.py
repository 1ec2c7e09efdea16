"""QualityPipeline × DedupIndex integration: a re-crawl whose urls were
already processed skips extraction+scoring for them (keep=false,
drop_reason='dup_of_history') while fresh urls score exactly as an
index-free run — the cross-snapshot work-avoidance a 100 TB re-crawl
needs (the reference's analog is the completed-id resume set it
rebuilds per run from response files, base_request_processor.py:609-651,
which never survives across datasets)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from curator_spark.config import QualityConfig
from curator_spark.engine.synth import write_pages
from curator_spark.oracle.quality_oracle import run_oracle
from curator_spark.pipeline.dedup_index import DedupIndex
from curator_spark.pipeline.run import QualityPipeline


@pytest.fixture()
def crawls(spark, tmp_path):
    """crawl1 = pages[0:400); crawl2 = pages[0:600) (same seed, so the
    first 400 urls+bytes are identical re-crawled docs)."""
    c1, c2 = str(tmp_path / "crawl1"), str(tmp_path / "crawl2")
    write_pages(spark, c1, 400)
    write_pages(spark, c2, 600)
    return c1, c2


def test_recrawl_skips_history_and_scores_fresh_urls(spark, tmp_path, crawls):
    c1, c2 = crawls
    cfg = QualityConfig()
    idx = DedupIndex(str(tmp_path / "idx"), key_expr="url")

    p1 = QualityPipeline(str(tmp_path / "out1"), cfg,
                         dedup_index=idx, update_dedup_index=True)
    r1 = p1.run(spark, c1)
    assert r1.docs_seen >= 390  # tiny quarantine possible, never 400
    n_indexed = idx.read_keys(spark).count()
    assert n_indexed == r1.docs_seen  # quarantined urls NOT registered

    p2 = QualityPipeline(str(tmp_path / "out2"), cfg,
                         dedup_index=idx, update_dedup_index=True)
    r2 = p2.run(spark, c2)
    out = p2.read_output(spark, r2.fingerprint).toPandas().set_index("url")

    dup_rows = out[out["drop_reason"] == "dup_of_history"]
    assert len(dup_rows) == n_indexed  # every indexed url skipped
    assert not dup_rows["keep"].any()
    assert dup_rows["scrubbed_text"].isna().all()  # no scoring payload

    # Fresh urls match the index-free oracle decision + scrubbed bytes.
    pages = pd.read_parquet(c2)[["url", "text"]]
    golden = run_oracle(pages, cfg).set_index("url")
    fresh = out[out["drop_reason"] != "dup_of_history"]
    assert len(fresh) + len(dup_rows) == r2.docs_seen
    common = fresh.index.intersection(golden.index)
    assert (fresh.loc[common, "keep"] == golden.loc[common, "keep"]).all()
    kept = fresh[fresh["keep"]]
    assert (
        kept["scrubbed_text"] == golden.loc[kept.index, "scrubbed_text"]
    ).all()

    # dup_of_history lands in the lineage metrics like any drop rule.
    reasons = (
        p2.metrics(spark, r2.fingerprint)
        .select(F.explode(F.map_keys("dropped_by_rule")))
        .toPandas()
        .iloc[:, 0]
        .tolist()
    )
    assert "dup_of_history" in reasons

    # Idempotent registration: re-offering crawl2's urls added only the
    # fresh ones; index keys stay unique.
    keys = idx.read_keys(spark)
    assert keys.count() == keys.select("key").distinct().count()
    assert keys.count() == n_indexed + len(fresh)


def test_index_free_run_unchanged_and_cached_rerun(spark, tmp_path, crawls):
    c1, _ = crawls
    cfg = QualityConfig()
    idx = DedupIndex(str(tmp_path / "idx"), key_expr="url")
    with_idx = QualityPipeline(str(tmp_path / "a"), cfg,
                               dedup_index=idx, update_dedup_index=True)
    without = QualityPipeline(str(tmp_path / "b"), cfg)
    ra = with_idx.run(spark, c1)
    rb = without.run(spark, c1)
    a = with_idx.read_output(spark, ra.fingerprint).toPandas().set_index("url")
    b = without.read_output(spark, rb.fingerprint).toPandas().set_index("url")
    # Empty index at run start -> byte-identical decisions to no index.
    assert (a["keep"] == b.loc[a.index, "keep"]).all()
    n_keys = idx.read_keys(spark).count()
    # Cached rerun (same fingerprint, all buckets committed) must not
    # re-register keys or consult anything.
    r2 = with_idx.run(spark, c1)
    assert r2.cached
    assert idx.read_keys(spark).count() == n_keys


def test_incremental_slice_with_dedup_index(spark, tmp_path, crawls):
    """Composition: incremental table consumption × cross-run dedup.
    A re-crawl APPENDED to the input table is consumed as a slice, and
    its previously-seen urls skip extraction+scoring (dup_of_history)
    — together, a growing crawl pays only (new slice) ∩ (new urls)."""
    from curator_spark.pipeline.snapshot import SnapshotTable

    c1, c2 = crawls
    cfg = QualityConfig()
    idx = DedupIndex(str(tmp_path / "idx"), key_expr="url")
    tab = SnapshotTable(str(tmp_path / "pages_tab"))
    tab.append(spark.read.parquet(c1), {"crawl": "c1"})

    pipe = QualityPipeline(str(tmp_path / "out"), cfg,
                           dedup_index=idx, update_dedup_index=True)
    r1 = pipe.run_incremental(spark, tab)
    assert not r1.cached and r1.docs_seen >= 390

    # append the re-crawl: crawl2 = crawl1's 400 urls + 200 fresh
    tab.append(spark.read.parquet(c2), {"crawl": "c2"})
    r2 = pipe.run_incremental(spark, tab)
    assert not r2.cached
    assert r2.docs_seen >= 590  # the 600-row slice only, never 1000

    out = pipe.read_output(spark, r2.fingerprint)
    dup = out.filter(F.col("drop_reason") == "dup_of_history")
    # every crawl1 url that produced an output row in slice 1 is a
    # history dup in slice 2
    n_indexed_overlap = (
        out.join(
            pipe.read_output(spark, r1.fingerprint).select("url"), "url"
        ).count()
    )
    assert dup.count() == n_indexed_overlap >= 390
    # fresh urls really scored (not all dropped as dups)
    fresh_kept = out.filter(
        F.col("keep") & ~F.col("url").isin(
            [r["url"] for r in dup.select("url").collect()]
        )
    )
    assert fresh_kept.count() > 0
