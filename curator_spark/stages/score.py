"""Fused model-scoring stage: langid + perplexity + scrub in ONE
Arrow round-trip.

Three chained pandas UDFs plan as three ArrowEvalPython nodes — three
JVM->Python->JVM serializations of the text column per batch. Since
all three scorers are pure functions of `text` sharing one worker-side
model cache, fusing them into a single UDF cuts the IPC volume 3x;
measured end-to-end docs/sec is the bench headline, so this is the hot
path. The per-stage UDFs (stages/langid.py etc.) remain for modular
use and A/B testing; both paths call the same compute cores
(functions/vectorized.py, functions/scrub_core.py) so results are
identical by construction.

Reference analog: the offline processor also scores everything a batch
needs in one call (vllm_offline_request_processor.py:167-201).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from curator_spark.config import QualityConfig
from curator_spark.functions import vectorized as V
from curator_spark.functions.scrub_core import scrub_series
from curator_spark.stages.langid import _resolve_tables

_RET = (
    "lang_pred string, lang_score double, perplexity double, "
    "scrubbed_text string, emails long, ids long, phones long, toxic long"
)


def make_score_udf(cfg: QualityConfig):
    langs = cfg.langs

    @pandas_udf(_RET)
    def score_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        # models built/loaded once per worker, reused across batches
        table, model_langs = _resolve_tables(langs)
        lm = V.get_bigram_lm()
        lang_arr = np.array(model_langs, dtype=object)
        for texts in it:
            t = texts.fillna("").tolist()
            pred_idx, conf, ppl = V.score_batch(t, model_langs, table, lm)
            pred = np.where(
                pred_idx >= 0, lang_arr[np.maximum(pred_idx, 0)], "und"
            )
            scrubbed, counts = scrub_series(texts)
            # Arrow return-path compression: rows the scrub did not
            # touch (all counts zero — replacements never reintroduce
            # a pattern, so zero counts <=> byte-identical text) come
            # back as NULL and are restored JVM-side by a coalesce
            # with the original column. Web corpora are mostly
            # PII-free, so this removes ~95% of the output text bytes
            # from the Python->JVM serialization (the end-to-end
            # pipeline's largest single cost after this change is the
            # input text serialization, which is irreducible).
            # NULL-text rows NULL-propagate scrubbed + counts (oracle
            # regexp semantics; the JVM coalesce restores the NULL) —
            # same rule as stages/scrub.py
            nulls = texts.isna().values
            unchanged = (counts.sum(axis=1).values == 0) & ~nulls
            out = pd.DataFrame(
                {
                    "lang_pred": pred,
                    "lang_score": conf,
                    "perplexity": ppl,
                    "scrubbed_text": scrubbed.mask(unchanged | nulls, None),
                }
            )
            for c in ("emails", "ids", "phones", "toxic"):
                out[c] = pd.array(
                    np.where(nulls, None, counts[c].values), dtype="Int64"
                )
            yield out

    return score_udf


def make_model_udf(cfg: QualityConfig):
    """Fused langid + perplexity only (no scrub) — for consumers that
    need both model scores but not the rewrite (e.g. CCNet buckets):
    one Arrow round-trip of the text instead of two chained UDFs.
    Same compute cores, so values are bit-identical to the per-stage
    UDFs."""
    langs = cfg.langs

    @pandas_udf("lang_pred string, lang_score double, perplexity double")
    def model_udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        table, model_langs = _resolve_tables(langs)
        lm = V.get_bigram_lm()
        lang_arr = np.array(model_langs, dtype=object)
        for texts in it:
            t = texts.fillna("").tolist()
            pred_idx, conf, ppl = V.score_batch(t, model_langs, table, lm)
            pred = np.where(
                pred_idx >= 0, lang_arr[np.maximum(pred_idx, 0)], "und"
            )
            yield pd.DataFrame(
                {"lang_pred": pred, "lang_score": conf, "perplexity": ppl}
            )

    return model_udf


def with_model_scores(
    df: DataFrame, cfg: QualityConfig, text_col: str = "text"
) -> DataFrame:
    """lang_pred / lang_score / perplexity from ONE fused Arrow pass."""
    df = df.withColumn("_m", make_model_udf(cfg)(F.col(text_col)))
    m = F.col("_m")
    return (
        df.withColumn("lang_pred", m["lang_pred"])
        .withColumn("lang_score", m["lang_score"])
        .withColumn("perplexity", m["perplexity"])
        .drop("_m")
    )


def with_scores(df: DataFrame, cfg: QualityConfig, text_col: str = "text") -> DataFrame:
    """All model-scored columns from one fused Arrow pass."""
    df = df.withColumn("_score", make_score_udf(cfg)(F.col(text_col)))
    s = F.col("_score")
    return (
        df.withColumn("lang_pred", s["lang_pred"])
        .withColumn("lang_score", s["lang_score"])
        .withColumn("perplexity", s["perplexity"])
        # NULL from the UDF means "scrub touched nothing" — restore
        # the original bytes without ever shipping them back from
        # Python (see the UDF body)
        .withColumn(
            "scrubbed_text", F.coalesce(s["scrubbed_text"], F.col(text_col))
        )
        .withColumn(
            "scrub_counts",
            F.struct(
                s["emails"].alias("emails"),
                s["ids"].alias("ids"),
                s["phones"].alias("phones"),
                s["toxic"].alias("toxic"),
            ),
        )
        .drop("_score")
    )
