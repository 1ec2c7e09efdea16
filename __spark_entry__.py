"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship quality-filter pipeline (langid +
perplexity + heuristic rules + PII/toxicity scrub + keep/drop
decision — BASELINE.json north_rule) over the sf0.001 `documents`
table. `queries()` exposes every implemented operator from
SURVEY.md §2 plus the training-data-pipeline families (dedup,
similarity search, text analysis); `oracle_sql()` carries the DuckDB
twin for each SQL-expressible query, built from the same Python
constants as the Spark programs so they cannot drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from curator_spark.queries import ALL_QUERIES, ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full quality pipeline on /root/testdata/sf0.001
    (full-payload variant — keeps the scrubbed text string; the
    driver-measured `quality_full_docs` twin re-emits the same
    pipeline as pinned hash-verified scalars)."""
    return ALL_QUERIES["quality_full_text"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # only the driver-measured queries' oracles; EXTRA_QUERIES keep
    # theirs for the in-repo pytest gate (tests/test_queries_oracle.py)
    return {n: sql for n, sql in ORACLES.items() if n in QUERIES}
