"""Cross-engine fuzz for the dedup/shingle family over ADVERSARIAL
Unicode (VERDICT r4 ask #7): combining marks, NFC/NFD variants,
astral-plane codepoints, RTL scripts, zero-width chars, Unicode
whitespace, and ASCII VT, through every text-hashing dedup query vs
its DuckDB oracle.

The load-bearing assumption a web corpus attacks hardest: Spark
(java.util.regex + UTF8String), pyarrow's C split (simhash), and
DuckDB (RE2 + utf8proc) must tokenize, normalize, and md5 the SAME
bytes. This fuzz pins the fixes that make that true:

- word splits use the explicit Java class ``[ \\t\\n\\x0B\\f\\r]+`` on
  the oracle side (RE2's ``\\s`` EXCLUDES \\x0B vertical tab, Java's
  includes it — plain '\\s+' oracles silently diverge on VT);
- the shared TOKEN_RE uses ``\\x0B``, never ``\\v`` (Java reads ``\\v``
  as the vertical-WHITESPACE class incl. U+2028; RE2 reads it as VT);
- no normalization anywhere: NFC/NFD variants stay distinct bytes on
  both engines, so md5/minhash/simhash agree by construction.

Known + documented divergence kept OUT of the corpus: Java lower()
applies full case mappings (U+0130 'İ' → "i"+U+0307, final-sigma
Σ → ς) where DuckDB's utf8proc uses simple maps — affects
dedup_normalized/doc_fingerprint only on those two codepoints.
"""

from __future__ import annotations

import os
import random

import pandas as pd
import pytest

from curator_spark.oracle.compare import compare_query

SRC = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SRC), reason=f"no testdata at {SRC}"
)

# ---------------------------------------------------------------------------
# Adversarial atom pool.
# ---------------------------------------------------------------------------
WORDS = [
    "the", "data", "DATA", "fox",
    "école",            # NFC é
    "école",           # NFD e + combining acute — distinct bytes
    "á̂̃",   # combining-mark pileup
    "\U0001d54f",            # astral 𝕏 (surrogate pair in UTF-16)
    "\U0001f98a",            # 🦊
    "\U0001f469‍\U0001f469‍\U0001f467",  # ZWJ family emoji
    "数据",          # CJK
    "بيانات",  # Arabic (RTL)
    "a​b",              # ZWSP inside a token (not \s in any engine)
    "straße",           # ß — simple map, engines agree
    "ǅungla",           # ǅ titlecase — lower agrees (ǆ)
    "..", "##", "$5", "x",
]
# ASCII whitespace (Java \s == [ \t\n\x0B\f\r]) — VT is the killer.
ASCII_WS = [" ", "\t", "\n", "\x0b", "\f", "\r", "\r\n", "  "]
# Unicode whitespace: NON-split in both engines (ASCII-only \s), so
# these glue neighbors into one token identically on both sides.
UNI_WS = [" ", " ", "　", " ", ""]
SEPS = ASCII_WS + UNI_WS


def _mk_corpus(seed: int = 0xC0FFEE) -> pd.DataFrame:
    rng = random.Random(seed)
    texts: list[str] = []
    for _ in range(100):
        n = rng.randint(0, 14)
        parts = []
        for _ in range(n):
            parts.append(rng.choice(WORDS))
            parts.append(rng.choice(SEPS))
        texts.append("".join(parts))
    # exact dups + near-dups so pair-producing queries emit rows
    for i in range(0, 40, 2):
        texts.append(texts[i])
    for i in range(1, 40, 2):
        texts.append(texts[i] + " " + rng.choice(WORDS))
    rows = []
    for i, txt in enumerate(texts):
        rows.append(
            (i, txt, rng.choice(["en", "fr", "zh"]),
             rng.choice(["web", "news"]), len(txt))
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


@pytest.fixture(scope="module")
def fuzz_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("unifuzz")
    for f in os.listdir(SRC):
        if f != "documents.parquet":
            os.symlink(os.path.join(SRC, f), d / f)
    pdf = _mk_corpus()
    sdf = spark.createDataFrame(
        pdf,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    sdf.coalesce(1).write.mode("overwrite").parquet(str(d / "_docs_tmp"))
    part = [
        f for f in os.listdir(d / "_docs_tmp") if f.endswith(".parquet")
    ][0]
    os.rename(d / "_docs_tmp" / part, d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "dedup_exact",
        "dedup_normalized",
        "dedup_jaccard_pairs",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "doc_fingerprint",
        "token_stats",
        "substring_dup_spans",
        "substring_dup_scrub",
        "boilerplate_segments",
        "fineweb_filters",
    ],
)
def test_dedup_family_unicode_parity(spark, fuzz_sf_dir, name):
    r = compare_query(spark, name, fuzz_sf_dir)
    assert r.oracle_rows is not None, f"{name} lost its oracle"
    assert r.ok, (
        f"{name}: spark={r.spark_rows} oracle={r.oracle_rows} {r.detail}"
    )
    assert r.values_match, f"{name}: {r.detail}"


def test_casemap_divergence_boundary_still_holds(spark):
    """Sentinel for the DOCUMENTED lower() divergence that keeps
    U+0130 and final-sigma OUT of the fuzz corpus: Spark (Java full
    case maps) vs DuckDB (utf8proc simple maps). If an engine upgrade
    ever converges these, this test fails as a signal to ADD the two
    codepoints to WORDS and delete the exclusion note."""
    import duckdb

    from pyspark.sql import functions as F

    rows = spark.createDataFrame([("İ",), ("ΑΣ",)], "t string").select(
        F.lower("t").alias("l")
    ).collect()
    spark_lower = [r.l for r in rows]
    con = duckdb.connect()
    duck_lower = [
        con.execute("SELECT lower(?)", [t]).fetchone()[0]
        for t in ["İ", "ΑΣ"]
    ]
    assert spark_lower == ["i̇", "ας"]     # Java full maps
    assert duck_lower == ["i", "ασ"]       # utf8proc simple maps
    assert spark_lower != duck_lower


def test_fuzz_corpus_is_adversarial_and_productive(spark, fuzz_sf_dir):
    """Guard the fixture itself: the corpus really contains the attack
    chars, and the pair queries really emit rows (an empty result
    would green-light the parity assertions vacuously)."""
    docs = spark.read.parquet(os.path.join(fuzz_sf_dir, "documents.parquet"))
    blob = "".join(r.text for r in docs.select("text").collect())
    for ch in ["\x0b", " ", " ", "\U0001d54f", "́", "​"]:
        assert ch in blob, f"corpus lost attack char {ch!r}"
    from curator_spark.queries import ALL_QUERIES

    assert ALL_QUERIES["dedup_jaccard_pairs"](spark, fuzz_sf_dir).count() > 0
    assert ALL_QUERIES["dedup_minhash_lsh"](spark, fuzz_sf_dir).count() > 0
    exact = ALL_QUERIES["dedup_exact"](spark, fuzz_sf_dir)
    from pyspark.sql import functions as F

    assert exact.filter(F.col("dup_count") > 1).count() > 0
