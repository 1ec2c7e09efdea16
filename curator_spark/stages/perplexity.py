"""Perplexity stage: char-bigram LM scored in one numpy pass per batch.

Same worker-level model caching pattern as langid (the reference's
load-once offline scorer, vllm_offline_request_processor.py:41-53).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from curator_spark.functions import vectorized as V


def make_perplexity_udf():
    @pandas_udf("double")
    def perplexity_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        lm = V.get_bigram_lm()  # built once per worker, cached across batches
        for texts in it:
            yield pd.Series(V.perplexities(texts.fillna("").tolist(), lm))

    return perplexity_udf


def with_perplexity(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("perplexity", make_perplexity_udf()(F.col(text_col)))
