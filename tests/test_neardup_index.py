"""NearDupIndex: cross-run MinHash-LSH candidate index — catches
re-crawled pages whose bytes changed (the case the exact index misses),
sharing DedupIndex's incremental lifecycle. Band semantics delegate to
queries/dedupq.py, so index and batch query agree by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curator_spark.pipeline.dedup_index import DedupIndex, NearDupIndex
from curator_spark.pipeline.snapshot import SnapshotTable

BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
        "green bottles hang quietly on the old stone wall near the "
        "harbor every single morning before the fishing boats depart")


def _rows(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


@pytest.fixture()
def seeded(spark, tmp_path):
    src = SnapshotTable(str(tmp_path / "src"))
    idx = NearDupIndex(str(tmp_path / "idx"), text_expr="text", n_buckets=8)
    src.append(
        _rows(spark, [
            ("https://h/1", BASE),
            ("https://h/2", "completely different content about spark "
                            "physical plans and shuffle exchanges in "
                            "catalyst with adaptive query execution"),
            ("https://h/short", "hi"),  # <2 words: no shingles, no keys
        ]),
        {"b": 1},
    )
    r = idx.refresh(spark, src)
    assert r["status"] == "refreshed"
    return src, idx


def test_changed_recrawl_is_candidate_novel_is_not(spark, seeded):
    _, idx = seeded
    batch = _rows(spark, [
        # one word changed: Jaccard ~0.94 on 2-gram shingles -> some
        # band must still collide (deterministic given the texts)
        ("https://b/near", BASE.replace("seventeen", "eighteen")),
        ("https://b/exact", BASE),
        ("https://b/new", "unrelated text about duckdb oracles and "
                          "value hash comparisons across engines with "
                          "sorted column order and stable formatting"),
        ("https://b/short", "yo"),
    ])
    m = idx.mark_candidates(spark, batch)
    got = {r["url"]: (r["near_dup_candidate"], r["near_dup_canonical"])
           for r in m.collect()}
    assert got["https://b/exact"] == (True, "https://h/1")
    assert got["https://b/near"][0] is True
    assert got["https://b/near"][1] == "https://h/1"
    assert got["https://b/new"][0] is False
    assert got["https://b/short"][0] is False  # no keys -> never flagged
    assert m.count() == 4  # multi-band hits collapse to one row per row


def test_incremental_refresh_and_bucket_growth(spark, seeded):
    src, idx = seeded
    n0 = idx.read_keys(spark).count()
    # re-appending an existing text adds NO new band buckets
    src.append(_rows(spark, [("https://h/1b", BASE)]), {"b": 2})
    r = idx.refresh(spark, src)
    assert r["new_keys"] == 0 and r["dup_of_history"] > 0
    assert idx.read_keys(spark).count() == n0
    # a genuinely new text adds at most LSH_BANDS buckets
    src.append(_rows(spark, [("https://h/3", "fresh words entirely "
                              "novel content appears here with many "
                              "unique shingles to band over")]), {"b": 3})
    r2 = idx.refresh(spark, src)
    from curator_spark.queries.dedupq import LSH_BANDS
    assert 0 < r2["new_keys"] <= LSH_BANDS
    # keys stay unique
    keys = idx.read_keys(spark)
    assert keys.count() == keys.select("key").distinct().count()


def test_config_pinning_rejects_different_tokenization(spark, seeded, tmp_path):
    with pytest.raises(ValueError, match="key_expr"):
        NearDupIndex(str(tmp_path / "idx"), text_expr="lower(text)",
                     n_buckets=8)
    with pytest.raises(ValueError, match="key_expr"):
        # an exact index cannot reopen a near-dup index either
        DedupIndex(str(tmp_path / "idx"), key_expr="text", n_buckets=8)
    again = NearDupIndex(str(tmp_path / "idx"), text_expr="text",
                         n_buckets=8)
    assert again.has_keys()


def test_semantics_match_batch_lsh_query(spark, seeded, tmp_path):
    """Index candidates == q_dedup_minhash_lsh pairs on the union
    corpus (restricted to history x batch pairs): the delegation to
    dedupq's banding really does give identical candidate semantics."""
    import os
    src, idx = seeded
    batch = _rows(spark, [
        ("https://b/near", BASE.replace("quick", "rapid")),
        ("https://b/new", "entirely separate subject matter nothing "
                          "shared with the seeded corpus at all here"),
    ])
    m = {r["url"]: r["near_dup_candidate"]
         for r in idx.mark_candidates(spark, batch).collect()}

    # batch-query ground truth over history+batch as one corpus
    hist = src.read(spark).select("url", "text")
    corpus = hist.unionByName(batch).withColumn(
        "doc_id", F.xxhash64("url")
    ).select("doc_id", "url", "text")
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    corpus.select("doc_id", "text").write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet"))
    from curator_spark.queries.dedupq import q_dedup_minhash_lsh
    pairs = q_dedup_minhash_lsh(spark, sf)
    ids = {r["url"]: r["doc_id"] for r in corpus.collect()}
    hist_ids = {v for k, v in ids.items() if k.startswith("https://h/")}
    cand_ids = set()
    for r in pairs.collect():
        if r["doc_a"] in hist_ids and r["doc_b"] not in hist_ids:
            cand_ids.add(r["doc_b"])
        if r["doc_b"] in hist_ids and r["doc_a"] not in hist_ids:
            cand_ids.add(r["doc_a"])
    for url in ("https://b/near", "https://b/new"):
        assert m[url] == (ids[url] in cand_ids), url


def test_confirm_candidates_verify_then_drop(spark, seeded):
    """Exact shingle-Jaccard confirm over flagged candidates: a
    lightly-edited re-crawl confirms at 0.5, a heavily-rewritten page
    that still band-collides is rejected by a high threshold, and
    non-candidates carry NULL jaccard / False confirmed."""
    src, idx = seeded
    heavy = " ".join(
        w if i % 3 == 0 else f"w{i}" for i, w in enumerate(BASE.split())
    )  # keeps ~1/3 of words: some shingles survive, jaccard low
    batch = _rows(spark, [
        ("https://b/near", BASE.replace("seventeen", "eighteen")),
        ("https://b/heavy", heavy),
        ("https://b/new", "wholly disjoint vocabulary in this row with "
                          "no overlap whatsoever against the corpus"),
    ])
    marked = idx.mark_candidates(spark, batch)
    history = src.read(spark).select("url", "text")
    out = idx.confirm_candidates(spark, marked, history, threshold=0.5)
    got = {r["url"]: (r["near_dup_candidate"], r["near_dup_jaccard"],
                      r["near_dup_confirmed"]) for r in out.collect()}

    cand, jac, ok = got["https://b/near"]
    assert cand and ok and jac is not None and jac >= 0.5
    assert got["https://b/new"] == (False, None, False)
    cand_h, jac_h, ok_h = got["https://b/heavy"]
    if cand_h:  # band collision possible; confirm must reject it
        assert jac_h is not None and jac_h < 0.5 and not ok_h
    else:
        assert jac_h is None and not ok_h
    assert out.count() == 3  # no row inflation through the confirm joins

    # confirmed set is monotone in threshold
    strict = idx.confirm_candidates(spark, marked, history, threshold=0.99)
    n_strict = strict.where("near_dup_confirmed").count()
    n_loose = out.where("near_dup_confirmed").count()
    assert n_strict <= n_loose


def test_confirm_with_duplicate_history_ids_no_inflation(spark, seeded):
    """History holding the same url across snapshots (re-appended rows)
    must not multiply candidate rows through the canonical-text join."""
    src, idx = seeded
    src.append(_rows(spark, [("https://h/1", BASE)]), {"b": 99})  # re-append
    batch = _rows(spark, [("https://b/near",
                           BASE.replace("seventeen", "eighteen"))])
    marked = idx.mark_candidates(spark, batch)
    history = src.read(spark).select("url", "text")
    assert history.where("url = 'https://h/1'").count() == 2
    out = idx.confirm_candidates(spark, marked, history, threshold=0.5)
    assert out.count() == 1
    row = out.collect()[0]
    assert row["near_dup_confirmed"] and row["near_dup_jaccard"] >= 0.5


def test_confirm_route_parity_without_broadcast_hints(
    spark, seeded, monkeypatch
):
    """Forcing every confirm join onto the un-hinted (shuffle) route —
    the candidate-heavy-batch path — must produce byte-identical
    verdicts to the broadcast route."""
    import curator_spark.pipeline.dedup_index as di

    src, idx = seeded
    batch = _rows(spark, [
        ("https://b/near", BASE.replace("seventeen", "eighteen")),
        ("https://b/new", "wholly disjoint vocabulary in this row with "
                          "no overlap whatsoever against the corpus"),
    ])
    marked = idx.mark_candidates(spark, batch)
    history = src.read(spark).select("url", "text")
    cols = ["url", "near_dup_candidate", "near_dup_jaccard",
            "near_dup_confirmed"]
    want = sorted(
        idx.confirm_candidates(spark, marked, history, 0.5)
        .select(*cols).collect()
    )

    monkeypatch.setattr(di, "CONFIRM_BROADCAST_CAP", 0)
    idx.broadcast_cap = 0
    marked0 = idx.mark_candidates(spark, batch)  # hint-free marking too
    got = sorted(
        idx.confirm_candidates(spark, marked0, history, 0.5)
        .select(*cols).collect()
    )
    assert got == want
    # and the shuffle route really is hint-free end to end
    plan = (
        idx.confirm_candidates(spark, marked0, history, 0.5)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "strategy=broadcast" not in plan
