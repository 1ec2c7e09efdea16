"""corpus_profile_sketch — sketch estimates bounded by exact values.

The query has no DuckDB oracle (HLL/GK sketch outputs are
engine-specific), so this is its correctness gate: every estimate must
land inside the sketch's published error envelope around the exact
statistic, computed independently in pandas from the same parquet
bytes. Exact columns (n_docs, sum_chars) must match exactly.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pytest

from curator_spark.queries.advancedq import q_corpus_profile_sketch

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"no testdata at {SF_DIR}"
)


def test_sketches_inside_error_envelopes(spark):
    got = (
        q_corpus_profile_sketch(spark, SF_DIR)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs["h"] = docs["text"].map(
        lambda s: hashlib.md5(s.encode()).hexdigest() if s is not None else None
    )
    for source, g in docs.groupby("source"):
        row = got.loc[source]
        # exact aggregates are exact
        assert row["n_docs"] == len(g)
        assert row["sum_chars"] == g["n_chars"].sum()
        # HLL++ at rsd=0.02: allow 5 sigma (plus +/-1 for tiny groups)
        # approx_count_distinct skips NULLs, so the exact side must too
        exact_distinct = g["h"].nunique()
        tol = max(1.0, 5 * 0.02 * exact_distinct)
        assert abs(row["approx_distinct_texts"] - exact_distinct) <= tol
        # percentile_approx(acc=A) guarantees rank error <= n/A; at
        # n << A the estimate must be an exact order statistic inside
        # the +/-1-rank window around the target rank
        vals = g["n_chars"].sort_values().to_numpy()
        n = len(vals)
        for q, col in ((0.5, "p50_chars"), (0.99, "p99_chars")):
            lo = max(0, int(q * n) - 1)
            hi = min(n - 1, int(q * n) + 1)
            assert vals[lo] <= row[col] <= vals[hi], (source, col)


def test_one_pass_no_corpus_shuffle(spark):
    # the aggregate must be a partial_/final hash-agg pair over ONE
    # scan: exactly one Exchange (the n_sources sketch-buffer merge),
    # no sort, no join, no second scan of the parquet
    plan = (
        q_corpus_profile_sketch(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan and "Sort " not in plan
