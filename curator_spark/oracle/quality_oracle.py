"""Pure-pandas oracle for the quality pipeline (no Spark).

Computes golden labels + golden scrubbed bytes for a pages table,
mirroring the Spark stages' semantics exactly:
- rule stats re-implemented independently with Python `re` (same split
  semantics as the Catalyst expressions in functions/textstats.py),
- langid/perplexity via the shared vectorized core (same float64 path),
- scrub via the shared scrub_core (FIXTURES.md mandates one module).

This is the analog of the reference's recorded-cassette golden outputs
(reference: tests/integrations/test_all.py:58-61,100-126): tests write
the oracle's output ONCE to a fixture parquet and compare the Spark
pipeline against those stored bytes.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from curator_spark.config import QualityConfig
from curator_spark.functions import vectorized as V
from curator_spark.functions.scrub_core import scrub_series
from curator_spark.functions.textstats import SYMBOL_CLASS
from curator_spark.models.corpora import STOPWORDS

# JAVA \s, not Python \s: the Catalyst expressions this oracle mirrors
# use Java regex whitespace — exactly the 6 ASCII chars below. Python's
# \s is Unicode-aware (NBSP, thin space, ...), so re.compile(r"\s+")
# here would tokenize 'foo bar' differently from the engine and
# shift every ratio stat (and potentially the keep label) on non-ASCII
# whitespace. Likewise line filtering strips SPACES only, matching
# Spark's F.trim / DuckDB's trim — str.strip() would drop a '\t' line
# that both engines count.
_JAVA_WS = " \t\n\x0b\f\r"
_WS = re.compile(f"[{re.escape(_JAVA_WS)}]+")
_SYM = re.compile(SYMBOL_CLASS)
_STOPSET = set(STOPWORDS)


def _stats_row(text: str) -> tuple[int, float, float, float, float]:
    words = [w for w in _WS.split(text) if w != ""]
    wc = len(words)
    non_ws = len(_WS.sub("", text))
    mwl = (non_ws / wc) if wc else 0.0
    sym = len(text) - len(_SYM.sub("", text))
    sym_ratio = (sym / wc) if wc else 0.0
    lines = [l for l in text.split("\n") if l.strip(" ") != ""]
    rlf = ((len(lines) - len(set(lines))) / len(lines)) if lines else 0.0
    hits = sum(1 for w in words if w.lower() in _STOPSET)
    swd = (hits / wc) if wc else 0.0
    return wc, mwl, sym_ratio, rlf, swd


def run_oracle(pages: pd.DataFrame, cfg: QualityConfig) -> pd.DataFrame:
    texts = pages["text"].fillna("")
    tl = texts.tolist()

    pred_idx, conf = V.langid_scores(tl, cfg.langs)
    langs_arr = np.array(cfg.langs, dtype=object)
    lang_pred = np.where(pred_idx >= 0, langs_arr[np.maximum(pred_idx, 0)], "und")
    ppl = V.perplexities(tl)

    stats = np.array([_stats_row(t) for t in tl], dtype=np.float64)
    wc, mwl, symr, rlf, swd = stats.T

    reasons = np.full(len(tl), None, dtype=object)

    def set_reason(mask: np.ndarray, name: str) -> None:
        apply = mask & (reasons == None)  # noqa: E711 — elementwise None check
        reasons[apply] = name

    set_reason(ppl > cfg.max_perplexity, "perplexity")
    set_reason(
        (lang_pred != cfg.target_lang) | (conf < cfg.langid_min_score), "langid"
    )
    set_reason((wc < cfg.min_words) | (wc > cfg.max_words), "rule:word_count")
    set_reason(
        (mwl < cfg.min_mean_word_length) | (mwl > cfg.max_mean_word_length),
        "rule:mean_word_length",
    )
    set_reason(symr > cfg.max_symbol_to_word_ratio, "rule:symbol_ratio")
    set_reason(rlf > cfg.max_repeated_line_fraction, "rule:repeated_lines")
    set_reason(swd < cfg.min_stopword_density, "rule:stopword_density")

    keep = reasons == None  # noqa: E711
    scrubbed, counts = scrub_series(texts)

    return pd.DataFrame(
        {
            "url": pages["url"].values,
            "keep": keep.astype(bool),
            "drop_reason": reasons,
            "lang_pred": lang_pred,
            "lang_score": conf,
            "perplexity": ppl,
            "scrubbed_text": np.where(keep, scrubbed.values, None),
            "scrub_emails": counts["emails"].values,
            "scrub_ids": counts["ids"].values,
            "scrub_phones": counts["phones"].values,
            "scrub_toxic": counts["toxic"].values,
        }
    )
