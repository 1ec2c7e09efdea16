"""Keep/drop decision — native CASE chain with fixed precedence.

First failing check wins (config.DROP_REASON_ORDER); the oracle applies
the identical order so labels agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from curator_spark.config import QualityConfig


def with_decision(df: DataFrame, cfg: QualityConfig) -> DataFrame:
    c = F.col
    fail_ppl = c("perplexity") > cfg.max_perplexity
    fail_lang = (c("lang_pred") != cfg.target_lang) | (
        c("lang_score") < cfg.langid_min_score
    )
    reason = (
        F.when(fail_ppl, F.lit("perplexity"))
        .when(fail_lang, F.lit("langid"))
        .when(c("fail_rule_word_count"), F.lit("rule:word_count"))
        .when(c("fail_rule_mean_word_length"), F.lit("rule:mean_word_length"))
        .when(c("fail_rule_symbol_ratio"), F.lit("rule:symbol_ratio"))
        .when(c("fail_rule_repeated_lines"), F.lit("rule:repeated_lines"))
        .when(c("fail_rule_stopword_density"), F.lit("rule:stopword_density"))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.withColumn("drop_reason", reason).withColumn(
        "keep", c("drop_reason").isNull()
    )
