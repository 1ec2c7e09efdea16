"""Heuristic quality rules (Gopher/C4 style) as native column exprs.

Entirely JVM-side: split/size/filter/array_distinct/length arithmetic
inside whole-stage codegen. Each rule emits a boolean `fail_rule_*`
column; stats columns are kept for metrics and debugging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from curator_spark.config import QualityConfig
from curator_spark.functions import textstats as ts

STAT_COLS = (
    "word_count",
    "mean_word_length",
    "symbol_ratio",
    "repeated_line_fraction",
    "stopword_density",
)


def with_rule_stats(
    df: DataFrame, text_col: str = "text", fast: bool = True
) -> DataFrame:
    stats = ts.all_stats(F.col(text_col), fast=fast)
    for name, col in stats.items():
        df = df.withColumn(name, col)
    return df


def with_rule_flags(df: DataFrame, cfg: QualityConfig) -> DataFrame:
    """Adds fail_rule_* booleans; expects stat columns present."""
    c = F.col
    return (
        df.withColumn(
            "fail_rule_word_count",
            (c("word_count") < cfg.min_words) | (c("word_count") > cfg.max_words),
        )
        .withColumn(
            "fail_rule_mean_word_length",
            (c("mean_word_length") < cfg.min_mean_word_length)
            | (c("mean_word_length") > cfg.max_mean_word_length),
        )
        .withColumn(
            "fail_rule_symbol_ratio", c("symbol_ratio") > cfg.max_symbol_to_word_ratio
        )
        .withColumn(
            "fail_rule_repeated_lines",
            c("repeated_line_fraction") > cfg.max_repeated_line_fraction,
        )
        .withColumn(
            "fail_rule_stopword_density",
            c("stopword_density") < cfg.min_stopword_density,
        )
    )
