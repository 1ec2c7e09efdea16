"""Registry queries vs DuckDB oracle — the driver's correctness gate,
run in-repo at sf0.001 so regressions surface before the round check.

Mirrors the reference's golden-output strategy (SURVEY §5.1): an
independent engine (DuckDB) computes the expected values from the same
parquet bytes; we compare row counts, column sets, and an
order-insensitive value hash.
"""

from __future__ import annotations

import os

import pytest

from curator_spark.oracle.compare import _oracle_for, compare_query
from curator_spark.queries import ALL_QUERIES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"no testdata at {SF_DIR}"
)


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(spark, name):
    # The driver's canonicalizer (pandas sort_values over all columns)
    # cannot hash array/map cells — any complex-typed output column in
    # a driver-measured query is an automatic red CORRECTNESS row, so
    # forbid them for the measured window.
    from pyspark.sql.types import ArrayType, MapType, StructType

    if name in QUERIES:
        schema = QUERIES[name](spark, SF_DIR).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        assert not bad, f"{name}: complex-typed output columns {bad}"

    r = compare_query(spark, name, SF_DIR)
    assert r.ok, f"{name}: {r.spark_rows}/{r.oracle_rows} {r.detail}"
    if _oracle_for(name, SF_DIR) is not None:
        assert r.values_match, f"{name}: value hash mismatch: {r.detail}"


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert set(E.oracle_sql()) <= set(E.queries())
