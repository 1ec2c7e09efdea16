"""End-to-end pipeline vs independently stored golden labels.

Reference pattern: golden-hash comparison of final output columns
(reference: tests/integrations/test_all.py:24-25,58-61,100-126).
Gates from BASELINE.json: keep/drop F1 ≥ 0.99 and byte-identical
scrubbed text per url.
"""

from __future__ import annotations

import pandas as pd

from curator_spark.pipeline.run import QualityPipeline


def _run(spark, pages_path, cfg, tmp_path):
    pipe = QualityPipeline(str(tmp_path / "out"), cfg)
    res = pipe.run(spark, pages_path)
    out = pipe.read_output(spark, res.fingerprint).toPandas()
    return pipe, res, out.set_index("url").sort_index()


def test_end_to_end_matches_golden(spark, pages_path, golden, cfg, tmp_path):
    pipe, res, out = _run(spark, pages_path, cfg, tmp_path)
    g = golden.set_index("url").sort_index()
    assert len(out) == len(g)

    # F1 on keep/drop (exact agreement expected; gate is ≥ 0.99)
    tp = int((out["keep"] & g["keep"]).sum())
    fp = int((out["keep"] & ~g["keep"]).sum())
    fn = int((~out["keep"] & g["keep"]).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f1

    # drop reasons agree exactly
    assert (
        out["drop_reason"].fillna("-") == g["drop_reason"].fillna("-")
    ).all()

    # byte-identical scrubbed text per url for kept rows
    kept = out[out["keep"]]
    gk = g.loc[kept.index]
    assert (kept["scrubbed_text"] == gk["scrubbed_text"]).all()

    # scores bit-identical (shared vectorized core, segment-local sums)
    assert (out["lang_score"] == g["lang_score"]).all()
    assert (out["perplexity"] == g["perplexity"]).all()


def test_metrics_lineage_totals(spark, pages_path, golden, cfg, tmp_path):
    pipe, res, out = _run(spark, pages_path, cfg, tmp_path)
    m = pipe.metrics(spark, res.fingerprint).toPandas()
    assert m["docs_seen"].sum() == len(golden)
    assert m["docs_kept"].sum() == int(golden["keep"].sum())
    assert sorted(m["bucket_id"]) == list(range(cfg.n_buckets))
    # dropped-by-rule counters reconcile with golden reasons
    from collections import Counter

    want = Counter(golden["drop_reason"].dropna())
    got: Counter = Counter()
    for d in m["dropped_by_rule"]:
        for k, v in d.items():
            got[k] += v
    assert got == want


def test_scrub_counts_in_output(spark, pages_path, golden, cfg, tmp_path):
    pipe, res, out = _run(spark, pages_path, cfg, tmp_path)
    g = golden.set_index("url").sort_index()
    sc = pd.DataFrame(list(out["scrub_counts"]), index=out.index)
    assert (sc["emails"] == g["scrub_emails"]).all()
    assert (sc["ids"] == g["scrub_ids"]).all()
    assert (sc["phones"] == g["scrub_phones"]).all()
    assert (sc["toxic"] == g["scrub_toxic"]).all()
