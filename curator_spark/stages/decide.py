"""Keep/drop decision — native CASE chain with fixed precedence.

First failing check wins (config.DROP_REASON_ORDER); the oracle applies
the identical order so labels agree exactly.

Per-row parameter overrides (the reference's per-row
`generation_params` column, reference:
llm/prompt_formatter.py:118-127, merged row-over-run): if the input
carries a `row_params` map<string,string> column, these keys override
the run-level config FOR THAT ROW:

- ``max_perplexity``    (double)  per-row perplexity ceiling
- ``target_lang``       (string)  per-row accepted language
- ``langid_min_score``  (double)  per-row langid confidence floor
- ``force_keep``        ("true")  bypass every check for the row

Missing keys (or a missing column) fall back to the config — the
default path plans the identical expressions as before, so all oracle
parity is unaffected. Everything stays a native CASE chain: the
override is one `element_at(map, key)` + `coalesce` per knob, no UDF,
no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from curator_spark.config import QualityConfig


def _row_param(df: DataFrame, key: str, cast: str, default) -> Column:
    if "row_params" not in df.columns:
        return F.lit(default)
    # try_cast, not cast: under Spark 4's default ANSI mode a malformed
    # per-row override value ({"max_perplexity": "fast"}) would throw
    # CAST_INVALID_INPUT and abort the whole job; try_cast yields NULL
    # and the coalesce falls back to the run-level config, which is
    # the documented bad-override behavior.
    return F.coalesce(
        F.element_at(F.col("row_params"), key).try_cast(cast), F.lit(default)
    )


def with_decision(df: DataFrame, cfg: QualityConfig) -> DataFrame:
    c = F.col
    max_ppl = _row_param(df, "max_perplexity", "double", cfg.max_perplexity)
    target_lang = _row_param(df, "target_lang", "string", cfg.target_lang)
    min_score = _row_param(
        df, "langid_min_score", "double", cfg.langid_min_score
    )
    fail_ppl = c("perplexity") > max_ppl
    fail_lang = (c("lang_pred") != target_lang) | (
        c("lang_score") < min_score
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
    if "row_params" in df.columns:
        reason = F.when(
            _row_param(df, "force_keep", "boolean", False), F.lit(None).cast("string")
        ).otherwise(reason)
    return df.withColumn("drop_reason", reason).withColumn(
        "keep", c("drop_reason").isNull()
    )
