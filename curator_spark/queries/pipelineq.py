"""UDF-scored pipeline queries (rows-only correctness check).

These run the Arrow-vectorized model stages (langid, perplexity,
simhash) that have no faithful ANSI-SQL restatement — the driver
records a weaker rows-only check for them; full value-level
verification lives in tests/ against the shared-core Python oracle
(FIXTURES.md pattern; reference golden-hash tests
tests/integrations/test_all.py:24-25,58-61).

`quality_full_docs` is the flagship: the complete
langid + perplexity + heuristic-rules + scrub + decision pipeline
(north_rule) applied to the `documents` table.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from curator_spark.config import DEFAULT_CONFIG as CFG
from curator_spark.pipeline.run import quality_plan
from curator_spark.queries.common import spread, t
from curator_spark.stages.langid import with_langid
from curator_spark.stages.perplexity import with_perplexity


def q_langid_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    d = spread(d, spark)
    d = with_langid(d, CFG, "text")
    return d.select(
        "doc_id", "lang_pred", F.round("lang_score", 6).alias("lang_score")
    )


def q_perplexity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    d = spread(d, spark)
    d = with_perplexity(d, "text")
    return d.select("doc_id", F.round("perplexity", 6).alias("perplexity"))


def q_quality_full_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").withColumnRenamed("lang", "lang_claim")
    # single-file local input -> fan out so the Arrow UDF stages use all cores
    d = spread(d, spark)
    scored = quality_plan(d, CFG, text_col="text")
    return scored.select(
        "doc_id",
        "lang_pred",
        F.round("lang_score", 6).alias("lang_score"),
        F.round("perplexity", 6).alias("perplexity"),
        "keep",
        "drop_reason",
        "scrubbed_text",
    )


# ---------------------------------------------------------------------------
# simhash — 64-bit SimHash over word features, Arrow-vectorized.
# ---------------------------------------------------------------------------

def _simhash_batch(texts: pd.Series) -> pd.Series:
    import hashlib

    out = np.zeros(len(texts), dtype=np.int64)
    for i, txt in enumerate(texts.fillna("")):
        acc = np.zeros(64, dtype=np.int64)
        for w in set(txt.split()):
            h = np.uint64(
                int.from_bytes(hashlib.md5(w.encode("utf-8")).digest()[:8], "big")
            )
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        bitsign = (acc > 0).astype(np.uint64)
        val = 0
        for b in range(64):
            val |= int(bitsign[b]) << b
        out[i] = np.int64(np.uint64(val).astype(np.int64))
    return pd.Series(out)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("long")
    def simhash_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield _simhash_batch(texts)

    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", simhash_udf("text").alias("simhash"))


QUERIES = {
    "langid_docs": q_langid_docs,
    "perplexity_docs": q_perplexity_docs,
    "quality_full_docs": q_quality_full_docs,
    "dedup_simhash": q_dedup_simhash,
}

# no ORACLES — rows-only checks by design
ORACLES: dict[str, str] = {}
