"""Per-row parameter overrides (reference: per-row generation_params,
llm/prompt_formatter.py:118-127): a `row_params` map column overrides
run-level decision knobs for individual rows; absent keys/column fall
back to the config so default-path behavior is byte-identical."""

from __future__ import annotations

from curator_spark.config import QualityConfig
from curator_spark.pipeline.run import quality_plan

GOOD = (
    "The quick brown fox jumps over the lazy dog and then walks home "
    "with a friend to share some warm food by the fire in the evening."
)
GIBBERISH = "xqzv kjwq zzxkv qqj wvx " * 8


def _decisions(spark, rows, schema, cfg):
    df = spark.createDataFrame(rows, schema)
    return {
        r["url"]: (r["keep"], r["drop_reason"], r["lang_pred"])
        for r in quality_plan(df, cfg, text_col="text")
        .select("url", "keep", "drop_reason", "lang_pred")
        .collect()
    }


def test_row_params_override_each_knob(spark):
    cfg = QualityConfig()
    plain = _decisions(
        spark, [("g", GIBBERISH)], "url string, text string", cfg
    )
    assert plain["g"][:2] == (False, "perplexity")
    pred = plain["g"][2]  # whatever the model predicts for gibberish

    schema = "url string, text string, row_params map<string,string>"
    out = _decisions(
        spark,
        [
            ("keep_all", GIBBERISH, {"max_perplexity": "1e9",
                                     "langid_min_score": "0.0",
                                     "target_lang": pred}),
            ("ppl_only", GIBBERISH, {"max_perplexity": "1e9"}),
            ("forced", GIBBERISH, {"force_keep": "true"}),
            ("empty", GIBBERISH, {}),
            ("absent", GIBBERISH, None),
        ],
        schema,
        cfg,
    )
    # all three model knobs relaxed -> neither model check can fire;
    # only heuristic rules may still decide (gibberish has no
    # stopwords, so stopword_density is the expected survivor)
    assert out["keep_all"][1] not in ("perplexity", "langid")
    # only the ppl ceiling lifted -> the perplexity check cannot fire
    assert out["ppl_only"][1] != "perplexity"
    assert out["ppl_only"][0] is False  # later checks still apply
    # force_keep bypasses every check
    assert out["forced"][:2] == (True, None)
    # empty map and NULL map behave exactly like the config default
    assert out["empty"][:2] == (False, "perplexity")
    assert out["absent"][:2] == (False, "perplexity")


def test_row_params_column_absent_is_identical(spark):
    cfg = QualityConfig()
    plain = _decisions(
        spark, [("a", GOOD), ("b", GIBBERISH)], "url string, text string", cfg
    )
    nulled = _decisions(
        spark,
        [("a", GOOD, None), ("b", GIBBERISH, None)],
        "url string, text string, row_params map<string,string>",
        cfg,
    )
    assert plain == nulled


def test_malformed_row_param_falls_back_to_config(spark, cfg):
    """try_cast, not cast: under Spark 4's default ANSI mode a
    malformed per-row override must fall back to the run config, not
    abort the job with CAST_INVALID_INPUT."""
    from pyspark.sql import functions as F

    from curator_spark.stages.decide import _row_param

    df = spark.createDataFrame(
        [("a", {"max_perplexity": "fast"}), ("b", {"max_perplexity": "9.5"}),
         ("c", None)],
        "doc_id string, row_params map<string,string>",
    )
    out = {
        r["doc_id"]: r["v"]
        for r in df.select(
            "doc_id",
            _row_param(df, "max_perplexity", "double", 123.0).alias("v"),
        ).collect()
    }
    assert out == {"a": 123.0, "b": 9.5, "c": 123.0}
