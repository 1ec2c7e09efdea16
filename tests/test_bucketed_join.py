"""Bucketed co-located join — evidence for the PLANS.md/SURVEY §7.1(6)
claim that pre-bucketing both sides of a recurring big-big join removes
the per-query shuffle entirely.

At 100 TB the fact table (pages/lineitem-scale) joins its companion
tables repeatedly; paying one bucketed write amortizes the exchange
across every later join. This test materializes two tables bucketed on
the join key with the SAME bucket count and asserts the join plans as a
SortMergeJoin with ZERO Exchange operators — the scan partitioning
itself satisfies the join's distribution requirement. A control run
over plain parquet shows the two exchanges come back.
"""

from __future__ import annotations

import pytest

N_BUCKETS = 8


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bjdb LOCATION '{wh}'")
    orders = spark.range(0, 10000).selectExpr(
        "id AS o_key", "id % 97 AS o_val"
    )
    items = spark.range(0, 30000).selectExpr(
        "id % 10000 AS i_key", "id AS i_val"
    )
    (orders.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_key").sortBy("o_key")
        .saveAsTable("bjdb.orders_b"))
    (items.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "i_key").sortBy("i_key")
        .saveAsTable("bjdb.items_b"))
    yield "bjdb.orders_b", "bjdb.items_b", wh
    spark.sql("DROP DATABASE IF EXISTS bjdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    tb_o, tb_i, wh = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(tb_o).join(
            spark.table(tb_i),
            spark.table(tb_o).o_key == spark.table(tb_i).i_key,
        )
        assert j.count() == 30000  # every item matches exactly one order
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed co-located join should not shuffle:\n" + plan
        )

        # control: the SAME files read as plain parquet (no bucket
        # metadata) must shuffle both sides
        o = spark.read.parquet(f"{wh}/orders_b")
        i = spark.read.parquet(f"{wh}/items_b")
        plain_plan = _plan(o.join(i, o.o_key == i.i_key))
        assert "Exchange" in plain_plan and "hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_pruning_on_key_filter(spark, bucketed_tables):
    """A point predicate on the bucket column scans only the matching
    bucket files (Spark's bucket pruning), the read-side win of the
    same layout. autoBucketedScan is disabled for the check: with no
    join/agg in the query Spark would otherwise drop the bucketed
    layout to regain split parallelism, which also forfeits pruning."""
    tb_o, _, _ = bucketed_tables
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        df = spark.table(tb_o).where("o_key = 4242")
        plan = _plan(df)
        assert "Bucketed: true" in plan
        assert "SelectedBucketsCount: 1 out of 8" in plan
        assert df.count() == 1
    finally:
        spark.conf.set(key, prev)
