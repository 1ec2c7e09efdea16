"""Query registry — the __spark_entry__ contract surface.

Aggregates every implemented query (SURVEY.md §2 coverage + the
training-data-pipeline operator families) with, where SQL-expressible,
its DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from curator_spark.queries import (
    advancedq,
    dedupq,
    gopherq,
    mixq,
    pipelineq,
    relationalq,
    simq,
    textq,
    trainprepq,
)

_MODULES = (
    textq, gopherq, dedupq, simq, relationalq, advancedq, pipelineq,
    trainprepq, mixq,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name: {_name}")
        QUERIES[_name] = _fn
    ORACLES.update(_m.ORACLES)
