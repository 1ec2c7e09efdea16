"""Data-mixing query invariants (mixq.py) — semantics pinned by
independent Python recomputation, beyond the generic DuckDB value-hash
parity in test_queries_oracle.py."""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

from curator_spark.queries.mixq import (
    DSIR_TARGET_SOURCES,
    QUOTA_PER_SOURCE,
    TEMP_BUDGET_FRAC,
    q_domain_quota,
    q_dsir_importance,
    q_temperature_rebalance,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"no testdata at {SF_DIR}"
)


def _docs() -> pd.DataFrame:
    return pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_domain_quota_exact_per_source(spark):
    """Every source ends at exactly min(Q, cnt) docs — i.e. the
    hash-rate prefilter's oversample never starves the exact-rank
    phase on this data — and no doc is duplicated."""
    out = q_domain_quota(spark, SF_DIR).toPandas()
    truth = _docs().groupby("source").size()
    got = out.groupby("source").size()
    for src, n in truth.items():
        assert got.get(src, 0) == min(QUOTA_PER_SOURCE, n), src
    assert out["doc_id"].is_unique


def test_dsir_importance_shape(spark):
    """Weights cover exactly the raw (non-target) split; the selected
    flag is exactly the deterministic top-frac rank over the emitted
    rounded weights (recomputed independently in pandas); weights are
    finite and non-constant."""
    from curator_spark.queries.mixq import DSIR_KEEP_FRAC

    out = q_dsir_importance(spark, SF_DIR).toPandas()
    d = _docs()
    raw_ids = set(d.loc[~d["source"].isin(DSIR_TARGET_SOURCES), "doc_id"])
    assert set(out["doc_id"]) == raw_ids
    assert out["dsir_logw"].map(math.isfinite).all()
    assert out["dsir_logw"].nunique() > 1
    n_keep = math.floor(DSIR_KEEP_FRAC * len(out))
    want = set(
        out.sort_values(
            ["dsir_logw", "doc_id"], ascending=[False, True]
        )["doc_id"].head(n_keep)
    )
    assert set(out.loc[out["selected"], "doc_id"]) == want
    assert out["selected"].sum() == n_keep


def test_ccnet_ppl_buckets_golden(spark):
    """Rows-only query: head/middle/tail assignment matches an
    independent pandas recomputation — shared float64 scoring core,
    numpy linear-interpolation percentile (the same formula as Spark's
    exact `percentile`), so buckets must agree exactly."""
    import numpy as np

    from curator_spark.config import DEFAULT_CONFIG as CFG
    from curator_spark.functions import vectorized as V
    from curator_spark.queries.pipelineq import q_ccnet_ppl_buckets

    out = q_ccnet_ppl_buckets(spark, SF_DIR).toPandas()
    d = _docs().sort_values("doc_id").reset_index(drop=True)
    tl = d["text"].fillna("").tolist()
    pred_idx, _ = V.langid_scores(tl, CFG.langs)
    langs_arr = np.array(CFG.langs, dtype=object)
    d["lang_pred"] = np.where(
        pred_idx >= 0, langs_arr[np.maximum(pred_idx, 0)], "und"
    )
    d["ppl"] = V.perplexities(tl)
    want = {}
    for lang, grp in d.groupby("lang_pred"):
        q1 = np.percentile(grp["ppl"], 100 / 3, method="linear")
        q2 = np.percentile(grp["ppl"], 200 / 3, method="linear")
        for _, r in grp.iterrows():
            want[r["doc_id"]] = (
                "head" if r["ppl"] <= q1
                else "middle" if r["ppl"] <= q2 else "tail"
            )
    got = dict(zip(out["doc_id"], out["ppl_bucket"]))
    assert got == want
    # every language splits into three non-empty buckets
    sizes = out.groupby(["lang_pred", "ppl_bucket"]).size().unstack(fill_value=0)
    assert (sizes > 0).all().all()


def test_temperature_rebalance_targets(spark):
    """Per-language kept counts equal the temperature formula computed
    independently in Python: target_l = min(floor(T * sqrt(c_l)/Z), c_l),
    T = floor(frac * N), Z = sum sqrt(c_m)."""
    out = q_temperature_rebalance(spark, SF_DIR).toPandas()
    c = _docs().groupby("lang").size()
    T = math.floor(TEMP_BUDGET_FRAC * int(c.sum()))
    z = sum(math.sqrt(int(v)) for v in c)
    got = out.groupby("lang").size()
    for lang, cl in c.items():
        want = min(math.floor(T * math.sqrt(int(cl)) / z), int(cl))
        assert got.get(lang, 0) == want, lang
    # flattening: the dominant language's share must shrink
    dom = c.idxmax()
    assert got[dom] / got.sum() < c[dom] / c.sum()
