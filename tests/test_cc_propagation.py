"""min_label_propagate on multi-hop components (VERDICT r2 ask #4).

The propagation loop now runs over the edge vertex set only; these
fixtures pin (a) correctness on components whose diameter exceeds the
2-3 hops typical of near-dup cliques — a 7-vertex path needs 6 rounds
of min-label flow — and (b) that isolated vertices never enter the
loop (they are attached by the caller's final left join).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from curator_spark.queries.dedupq import min_label_propagate


def _edges(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return df.selectExpr("doc_a AS s", "doc_b AS d").unionAll(
        df.selectExpr("doc_b AS s", "doc_a AS d")
    )


def test_path_component_diameter_6(spark):
    # path 10-11-12-13-14-15-16 (diameter 6) + separate clique {3,4,5}
    pairs = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (15, 16),
             (3, 4), (4, 5), (3, 5)]
    labels = {
        r["doc_id"]: r["label"]
        for r in min_label_propagate(_edges(spark, pairs)).collect()
    }
    assert {labels[v] for v in range(10, 17)} == {10}
    assert {labels[v] for v in (3, 4, 5)} == {3}
    # vertex set only: no vertices beyond the edge endpoints
    assert set(labels) == set(range(10, 17)) | {3, 4, 5}


def test_two_components_merge_via_bridge(spark):
    # two cliques bridged by one edge -> single component, min label 1
    pairs = [(1, 2), (2, 3), (7, 8), (8, 9), (3, 7)]
    labels = min_label_propagate(_edges(spark, pairs))
    assert labels.select(F.count_distinct("label")).first()[0] == 1
    assert labels.agg(F.min("label"), F.max("label")).first() == (1, 1)


def test_clusters_route_parity_collect_vs_distributed(spark, monkeypatch):
    """The CC_COLLECT_CAP gate must be invisible in the labels: the
    driver-side union-find route and the distributed propagation
    route produce identical (doc_id, cluster_id) rows."""
    import pyspark.sql.functions as F

    import curator_spark.queries.dedupq as dq

    sf = "/root/testdata/sf0.001"
    a = dq.q_dedup_clusters(spark, sf)
    monkeypatch.setattr(dq, "CC_COLLECT_CAP", -1)  # force distributed
    b = dq.q_dedup_clusters(spark, sf)
    diff = (
        a.withColumnRenamed("cluster_id", "x")
        .join(b, "doc_id")
        .where(F.col("x") != F.col("cluster_id"))
        .count()
    )
    assert diff == 0
    assert a.count() == b.count()
