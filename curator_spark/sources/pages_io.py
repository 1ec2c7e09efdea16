"""Format-pluggable reader/writer for the pages input table.

The reference persists request/response rows as JSONL files and
rebuilds Arrow datasets from them on every run (reference:
request_processor/base_request_processor.py:380-454, the
`responses_*.jsonl` convention, SURVEY §2.1 S5); its hub path reads
parquet. Here both are explicit-schema `spark.read` variants of ONE
declared StructType (engine/schema.PAGES):

- parquet: the scale path (columnar, predicate pushdown, statistics);
- jsonl:   line-delimited JSON interchange. Schema is DECLARED, never
  inferred — at 10^12 rows, inference means a full extra pass and
  schema drift becomes silent corruption. `html` (binary) rides as
  base64 text in JSONL because JSON has no bytes type; the reader
  restores it, so parquet->jsonl->read round-trips value-identically.
- csv:     header + declared schema, for small interchange tables
  (binary column dropped: CSV has no sane bytes encoding).

Timestamps serialize as ISO-8601 UTC instants in both text formats
(session TZ is pinned UTC in engine/session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from curator_spark.engine.schema import PAGES

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def _jsonl_schema() -> T.StructType:
    """PAGES with binary html carried as base64 string."""
    return T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType() if f.name == "html" else f.dataType,
                f.nullable,
            )
            for f in PAGES.fields
        ]
    )


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a pages table in the declared schema, any supported format."""
    if fmt == "parquet":
        return spark.read.schema(PAGES).parquet(path)
    if fmt == "jsonl":
        df = spark.read.schema(_jsonl_schema()).option(
            "timestampFormat", _TS_FMT
        ).json(path)
        return df.withColumn("html", F.unbase64("html")).select(
            *[f.name for f in PAGES.fields]
        )
    if fmt == "csv":
        schema = T.StructType([f for f in PAGES.fields if f.name != "html"])
        return (
            spark.read.schema(schema)
            .option("header", "true")
            .option("timestampFormat", _TS_FMT)
            .option("multiLine", "true")
            .option("escape", '"')
            .csv(path)
        )
    raise ValueError(f"unsupported pages format: {fmt}")


def write_pages_as(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write a pages-shaped DataFrame in the requested format."""
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
        return
    if fmt == "jsonl":
        (
            df.withColumn("html", F.base64("html"))
            .write.mode("overwrite")
            .option("timestampFormat", _TS_FMT)
            .json(path)
        )
        return
    if fmt == "csv":
        (
            df.drop("html")
            .withColumn(
                "warc_ts", F.date_format("warc_ts", _TS_FMT)
            )
            .write.mode("overwrite")
            .option("header", "true")
            .option("escape", '"')
            .csv(path)
        )
        return
    raise ValueError(f"unsupported pages format: {fmt}")
