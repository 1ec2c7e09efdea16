"""Student–teacher cascade for the model-based quality decision (the
DCLM / FineWeb-Edu classifier pattern: train a cheap classifier to
imitate an expensive scorer, spend the scorer only where the cheap
one is unsure).

At 10^12 documents the dominant pipeline cost is the fused Arrow
model stage (langid + perplexity, `stages/score.py`) — the heuristic
rules are free by comparison (native Catalyst expressions). The
cascade:

1. labels a DETERMINISTIC doc-hash sample with the real teacher,
2. fits a logistic-regression student on NATIVE features only
   (rule stats + per-language marker densities — columns the rules
   stage computes anyway; pyspark.ml LBFGS, distributed),
3. INLINES the fitted coefficients as column literals — inference is
   a native sigmoid expression inside whole-stage codegen, no ml UDF,
   no Python, no model object shipped to executors,
4. routes only the sample plus the student's uncertain probability
   band through the teacher, using the null-text trick (the Arrow UDF
   receives NULL for confident rows — cheap-on-empty, same property
   the dedup-index skip path relies on): ONE scan, ONE Arrow stage
   whose useful work is O(sample + band), never a second pass over
   the corpus.

Final verdict: teacher where routed, student elsewhere; the native
rule flags stay exact for every row. Teacher-vs-cascade agreement and
the routed fraction are the quality/cost dials (band wider -> more
teacher, higher fidelity).

Reference parity: beyond the reference — curator has no cascade; the
nearest analog is its online/batch processor split (cheap vs
expensive request paths chosen per run, reference:
src/bespokelabs/curator/request_processor/). This restates the
published classifier-filter pattern (DCLM, arXiv:2406.11794; FineWeb-
Edu, arXiv:2406.17557) Spark-first as a column-level cascade with the
teacher already in-plan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from curator_spark.config import QualityConfig
# single source for the marker lexicons (derived from models.corpora
# WORDS) — the langid_heuristic query and the student must agree
from curator_spark.queries.textq import MARKERS
from curator_spark.stages.rules import with_rule_flags, with_rule_stats
from curator_spark.stages.score import with_model_scores

# Native student features, in fixed order (training and the inlined
# inference expression must agree on it).
FEATURES = (
    "f_log_wc",
    "mean_word_length",
    "symbol_ratio",
    "repeated_line_fraction",
    "stopword_density",
) + tuple(f"f_marker_{lang}" for lang in sorted(MARKERS))

CASCADE_SAMPLE_MOD = 10   # 1/10 of docs teacher-labeled for training
CASCADE_BAND = (0.2, 0.8)  # student probs inside [lo, hi] go to teacher


def with_native_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rule stats (shared with the rules stage) plus per-language
    marker-word densities — all JVM-side column expressions."""
    df = with_rule_stats(df, text_col)
    wc = F.col("word_count")
    ws = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )
    df = df.withColumn(
        "f_log_wc", F.log1p(wc.cast("double"))
    )
    for lang in sorted(MARKERS):
        hits = F.size(F.filter(ws, lambda w: w.isin(*MARKERS[lang])))
        df = df.withColumn(
            f"f_marker_{lang}",
            F.when(wc > 0, hits / wc).otherwise(F.lit(0.0)),
        )
    return df


def teacher_model_ok(cfg: QualityConfig) -> Column:
    """The teacher's verdict on the MODEL checks only (the expensive
    half of the decision; rules stay native and exact everywhere)."""
    return ~(
        (F.col("perplexity") > cfg.max_perplexity)
        | (F.col("lang_pred") != cfg.target_lang)
        | (F.col("lang_score") < cfg.langid_min_score)
    )


def train_student(
    labeled: DataFrame, label_col: str = "model_ok"
) -> tuple[float, dict[str, float]]:
    """Fit the logistic student on `FEATURES` -> (intercept, weights).

    pyspark.ml LogisticRegression (distributed LBFGS, deterministic
    for a fixed input). Only the tiny coefficient vector leaves the
    JVM; the caller inlines it as literals."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    asm = VectorAssembler(
        inputCols=list(FEATURES), outputCol="features",
        handleInvalid="keep",
    )
    train = asm.transform(
        labeled.withColumn("label", F.col(label_col).cast("double"))
    )
    lr = LogisticRegression(maxIter=60, regParam=1e-3, tol=1e-8)
    m = lr.fit(train)
    coefs = m.coefficients.toArray()
    return float(m.intercept), {
        f: float(w) for f, w in zip(FEATURES, coefs)
    }


def student_prob_expr(intercept: float, weights: dict[str, float]) -> Column:
    """sigmoid(b0 + sum(w_i * x_i)) as a native column expression."""
    z = F.lit(float(intercept))
    for f, w in weights.items():
        if not math.isfinite(w):
            raise ValueError(f"non-finite student weight for {f}: {w}")
        z = z + F.lit(float(w)) * F.col(f).cast("double")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def cascade_quality(
    docs: DataFrame,
    cfg: QualityConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_mod: int = CASCADE_SAMPLE_MOD,
    band: tuple[float, float] = CASCADE_BAND,
) -> DataFrame:
    """The full cascade over a corpus: returns one row per doc with
    `student_p`, `route` ('sample'|'teacher'|'student'), `model_ok`,
    and the combined `keep` (model verdict AND native rule flags).

    Plan shape: one corpus scan; the training sample is a second,
    sample-sized teacher pass (materialized by the fit); at query
    time the Arrow stage sees NULL text for every confident row."""
    lo, hi = band
    # NULL text would null every feature (and with it the route and
    # verdict); a missing doc is an empty doc to the filter
    docs = docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    feats = with_native_features(docs, text_col)

    is_sample = F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0
    sample = feats.where(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0
    )
    labeled = with_model_scores(sample, cfg, text_col=text_col).withColumn(
        "model_ok", teacher_model_ok(cfg)
    )
    intercept, weights = train_student(labeled)

    p = student_prob_expr(intercept, weights)
    scored = feats.withColumn("student_p", p)
    # closed interval: a saturated sigmoid hits exactly 0.0/1.0 in
    # float, and band (0.0, 1.0) must mean "all teacher" (the
    # fidelity end stop), not "all but the saturated rows"
    in_band = (F.col("student_p") >= lo) & (F.col("student_p") <= hi)
    route = (
        F.when(is_sample, F.lit("sample"))
        .when(in_band, F.lit("teacher"))
        .otherwise(F.lit("student"))
    )
    scored = scored.withColumn("route", route)
    # null-text trick: the teacher UDF gets NULL for confident rows —
    # the batch scorer's fillna("") makes those entries near-free
    scored = scored.withColumn(
        "_t_text",
        F.when(F.col("route") != "student", F.col(text_col)),
    )
    scored = with_model_scores(scored, cfg, text_col="_t_text")
    model_ok = F.when(
        F.col("route") != "student", teacher_model_ok(cfg)
    ).otherwise(F.col("student_p") >= 0.5)
    scored = with_rule_flags(scored, cfg).withColumn("model_ok", model_ok)
    rule_ok = ~(
        F.col("fail_rule_word_count")
        | F.col("fail_rule_mean_word_length")
        | F.col("fail_rule_symbol_ratio")
        | F.col("fail_rule_repeated_lines")
        | F.col("fail_rule_stopword_density")
    )
    return scored.select(
        id_col,
        F.round("student_p", 6).alias("student_p"),
        "route",
        "model_ok",
        (F.col("model_ok") & rule_ok).alias("keep"),
    )
