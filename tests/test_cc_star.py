"""star_contract_components — the high-diameter CC driver.

Pins (a) label equality with min_label_propagate (the fixpoint both
must compute: component min over the edge vertex set) across random
graphs, chains, and clique mixes, and (b) the reason the variant
exists: a long chain converges within a LOG-bounded round budget that
the diameter-bound propagation loop could never meet — the distributed
analog of pointer doubling (Kiveris et al., ACM SoCC 2014).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from curator_spark.queries.dedupq import (
    min_label_propagate,
    star_contract_components,
)


def _edges(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return df.selectExpr("doc_a AS s", "doc_b AS d").unionAll(
        df.selectExpr("doc_b AS s", "doc_a AS d")
    )


def _labels(df):
    return {r["doc_id"]: r["label"] for r in df.collect()}


def test_equality_with_propagation_on_random_graph(spark):
    rng = random.Random(20260819)
    verts = list(range(1, 81))
    pairs = sorted(
        {
            tuple(sorted(rng.sample(verts, 2)))
            for _ in range(90)
        }
    )
    e = _edges(spark, pairs)
    got = _labels(star_contract_components(e))
    want = _labels(min_label_propagate(e))
    assert got == want
    # vertex set only — no labels beyond the edge endpoints
    assert set(got) == {v for p in pairs for v in p}


def test_chain_converges_within_log_rounds(spark):
    # a 200-vertex path: diameter 199. The propagation loop would need
    # ~100 double-hop cycles; star contraction at least halves every
    # tree height per alternation, so 12 rounds (2^12 >> 200) MUST
    # reach the fixpoint — and the strict max_rounds cap proves the
    # fixpoint was reached by contraction, not by the fallback (which
    # would also be correct but defeats the measurement).
    n = 200
    pairs = [(i, i + 1) for i in range(1, n)]
    labels = _labels(
        star_contract_components(_edges(spark, pairs), max_rounds=12)
    )
    assert set(labels.values()) == {1}
    assert set(labels) == set(range(1, n + 1))


def test_clique_mix_and_bridge(spark):
    # two cliques bridged into one component + a separate pair
    pairs = [(10, 11), (11, 12), (10, 12), (30, 31), (31, 32), (30, 32),
             (12, 30), (700, 701)]
    e = _edges(spark, pairs)
    out = star_contract_components(e)
    labels = _labels(out)
    assert {labels[v] for v in (10, 11, 12, 30, 31, 32)} == {10}
    assert labels[700] == labels[701] == 700
    # exactly one label row per vertex (star fixpoint read-off is flat)
    assert out.count() == out.select("doc_id").distinct().count()


def test_empty_edges(spark):
    e = spark.createDataFrame([], "s long, d long")
    out = star_contract_components(e)
    assert out.columns == ["doc_id", "label"]
    assert out.count() == 0


def test_fallback_cap_still_exact(spark):
    # an absurd max_rounds=0 exhausts the loop immediately; the
    # propagation fallback must still produce the exact fixpoint
    pairs = [(1, 2), (2, 3), (3, 4), (9, 10)]
    got = _labels(
        star_contract_components(_edges(spark, pairs), max_rounds=0)
    )
    assert {got[v] for v in (1, 2, 3, 4)} == {1}
    assert got[9] == got[10] == 9


def test_fallback_exact_on_high_diameter_chain(spark):
    # review fix: the fallback used min_label_propagate's DEFAULT
    # 30-cycle cap, which silently truncates on a diameter > 60 chain
    # (the min label had only traveled 60 hops). It must now size the
    # propagation budget from the contracted graph's vertex count, so
    # max_rounds=0 + a 90-vertex chain still yields the exact fixpoint.
    n = 90
    pairs = [(i, i + 1) for i in range(1, n)]
    got = _labels(
        star_contract_components(_edges(spark, pairs), max_rounds=0)
    )
    assert set(got.values()) == {1}
    assert set(got) == set(range(1, n + 1))


def test_propagation_raises_instead_of_truncating(spark):
    # min_label_propagate must never return silently-wrong labels: a
    # cap smaller than the diameter now raises instead of truncating
    import pytest

    pairs = [(i, i + 1) for i in range(1, 20)]
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_propagate(_edges(spark, pairs), max_rounds=2)


def test_duplicate_and_self_edges_ignored(spark):
    # self-loops and duplicate pairs must not perturb the fixpoint
    pairs = [(5, 5), (5, 6), (6, 5), (5, 6), (6, 7)]
    got = _labels(star_contract_components(_edges(spark, pairs)))
    assert {got[v] for v in (5, 6, 7)} == {5}
    assert set(got) == {5, 6, 7}
