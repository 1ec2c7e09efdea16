"""Hot-cluster defense for semdedup_prune (VERDICT r2 ask #8).

One cluster holding 50% of all vectors must NOT become a single
applyInPandas straggler task: with the block-pair decomposition the
mega-cluster splits into ~(m/B)^2/2 independent groups. This test
forces multi-block via SPARK_GRAFT_SEMDEDUP_BLOCK=32 (200-member hot
cluster -> 7 blocks -> 28 groups), checks the result against a naive
O(m^2) single-machine reference, and checks the decomposition is
value-preserving (block=32 result == degenerate single-block result,
which is exactly the r2 one-group-per-cluster behavior).
"""

from __future__ import annotations

import os

import numpy as np
import pytest


def _naive_semdedup(vec_ids, cluster_of, embs, csims, tau):
    """Exact reference: dropped iff some member of the same cluster
    with (csim desc, vec_id asc)-earlier rank has cosine >= tau."""
    keep = {}
    by_cluster: dict[int, list[int]] = {}
    for i, v in enumerate(vec_ids):
        by_cluster.setdefault(cluster_of[i], []).append(i)
    for members in by_cluster.values():
        members = sorted(members, key=lambda i: (-csims[i], vec_ids[i]))
        M = embs[members]
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        for r, i in enumerate(members):
            dropped = any(
                float(M[rr] @ M[r]) >= tau for rr in range(r)
            )
            keep[vec_ids[i]] = not dropped
    return keep


@pytest.fixture()
def hot_cluster_dir(spark, tmp_path):
    """Embeddings table: 400 vectors, cluster 0 holds 200 (50%).
    Each label group gets a strong bias axis so the query's
    reassignment keeps the groups (and the hot cluster) intact."""
    rng = np.random.default_rng(7)
    dim = 8
    mat = []
    for vid in range(400):
        label = 0 if vid < 200 else 1 + (vid % 4)
        base = rng.normal(scale=0.5, size=dim)
        base[label] += 4.0  # cluster bias axis
        if vid % 3 == 0 and vid >= 3:
            # plant a near-duplicate of an earlier SAME-LABEL member
            src = vid - 12 if (vid - 12) >= 0 and label != 0 else vid - 3
            if src >= 0 and (src < 200) == (label == 0):
                base = np.asarray(mat[src][2]) + rng.normal(
                    scale=1e-3, size=dim
                )
        mat.append((vid, label, [float(x) for x in base]))
    df = spark.createDataFrame(
        mat, "vec_id long, label long, embedding array<double>"
    )
    path = str(tmp_path / "embeddings.parquet")
    df.write.mode("overwrite").parquet(path)
    return str(tmp_path)


def test_hot_cluster_splits_and_matches_naive(
    spark, hot_cluster_dir, monkeypatch
):
    from curator_spark.queries.simq import SEMDEDUP_TAU, q_semdedup_prune

    monkeypatch.setenv("SPARK_GRAFT_SEMDEDUP_BLOCK", "32")
    out = q_semdedup_prune(spark, hot_cluster_dir).collect()
    assert len(out) == 400
    res = {r["vec_id"]: r for r in out}

    # the hot cluster stayed hot (the straggler scenario is real)
    from collections import Counter

    sizes = Counter(r["cluster"] for r in out)
    assert max(sizes.values()) >= 150

    # 1) naive O(m^2) reference agreement
    import pyarrow.parquet as pq

    tbl = (
        pq.read_table(os.path.join(hot_cluster_dir, "embeddings.parquet"))
        .to_pandas()
        .sort_values("vec_id")
    )
    embs = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    vec_ids = tbl["vec_id"].tolist()
    clusters = [res[v]["cluster"] for v in vec_ids]
    csims = [res[v]["centroid_sim"] for v in vec_ids]
    want = _naive_semdedup(vec_ids, clusters, embs, csims, SEMDEDUP_TAU)
    mismatches = {
        v: (res[v]["keep"], want[v])
        for v in want
        if res[v]["keep"] != want[v]
    }
    assert not mismatches, mismatches
    assert sum(1 for r in out if not r["keep"]) > 20  # planted dups caught

    # 2) decomposition is value-preserving: block=32 (28 groups for the
    # hot cluster) == degenerate single-block run (the r2 behavior)
    monkeypatch.setenv("SPARK_GRAFT_SEMDEDUP_BLOCK", str(1 << 20))
    single = {
        r["vec_id"]: r for r in q_semdedup_prune(spark, hot_cluster_dir).collect()
    }
    for v, r in res.items():
        s = single[v]
        assert (r["keep"], r["cluster"], r["centroid_sim"]) == (
            s["keep"], s["cluster"], s["centroid_sim"]
        ), v
