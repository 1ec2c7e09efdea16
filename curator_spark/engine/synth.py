"""Deterministic synthetic Common-Crawl-style page generator.

Row-profile mix per FIXTURES.md §1. Every row is a pure function of its
global row index (per-row `random.Random(seed * P + i)`), so the table
is identical under any partitioning / parallelism — generated
DISTRIBUTED via mapInPandas over spark.range(n), never driver-side, so
it scales to bench sizes. ~1% of domains own ~50% of rows (deliberate
skew for salting/AQE tests).
"""

from __future__ import annotations

import random
from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd

from curator_spark.engine.schema import PAGES
from curator_spark.functions.scrub_core import TOXIC_WORDS
from curator_spark.models.corpora import STOPWORDS, WORDS

_SEED_STRIDE = 1_000_003
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

# Profile cut points (cumulative fractions, FIXTURES.md §1).
_PROFILES = (
    ("clean", 0.70),
    ("non_english", 0.78),
    ("gibberish", 0.84),
    ("symbols", 0.88),
    ("repeated", 0.92),
    ("long_words", 0.95),
    ("low_stopword", 0.98),
    ("pii", 1.00),
)

_EN = WORDS["en"]
_EN_CONTENT = [w for w in _EN if w not in set(STOPWORDS) and len(w) >= 4]
_MEGA_DOMAINS = [f"big{j}.example.com" for j in range(10)]
_TAIL_DOMAINS = [f"site{j:04d}.example.org" for j in range(990)]
_SYMS = "#$%^&*=<>|~{}[]\\/_"


def _english_sentence(rng: random.Random, n_words: int) -> str:
    out = []
    for k in range(n_words):
        if k % 4 == 1:
            out.append(rng.choice(STOPWORDS))
        else:
            out.append(rng.choice(_EN))
    return " ".join(out)


def _profile_for(x: float) -> str:
    for name, cut in _PROFILES:
        if x < cut:
            return name
    return _PROFILES[-1][0]


def make_row(i: int, seed: int = 42) -> dict:
    rng = random.Random(seed * _SEED_STRIDE + i)
    profile = _profile_for(rng.random())

    if rng.random() < 0.5:
        domain = rng.choice(_MEGA_DOMAINS)
    else:
        domain = rng.choice(_TAIL_DOMAINS)
    url = f"https://{domain}/p/{i}"
    ts = _EPOCH + timedelta(seconds=int(rng.random() * 365 * 86400))
    lang_claim = "en"

    if profile == "clean":
        text = _english_sentence(rng, rng.randint(40, 120))
    elif profile == "non_english":
        src = rng.choice(("de", "fr", "es", "it"))
        text = " ".join(rng.choice(WORDS[src]) for _ in range(rng.randint(40, 120)))
        lang_claim = rng.choice(("en", "en", "zz"))
    elif profile == "gibberish":
        letters = "abcdefghijklmnopqrstuvwxyz"
        text = " ".join(
            "".join(rng.choice(letters) for _ in range(rng.randint(3, 9)))
            for _ in range(rng.randint(40, 90))
        )
    elif profile == "symbols":
        base = _english_sentence(rng, rng.randint(40, 80)).split()
        for k in range(0, len(base), 3):
            base[k] = base[k] + "".join(rng.choice(_SYMS) for _ in range(3))
        text = " ".join(base)
    elif profile == "repeated":
        line = _english_sentence(rng, 8)
        uniq = [_english_sentence(rng, 8) for _ in range(3)]
        text = "\n".join([line] * 12 + uniq)
    elif profile == "long_words":
        text = " ".join(
            "".join(rng.choice(_EN_CONTENT) for _ in range(4))
            for _ in range(rng.randint(30, 60))
        )
    elif profile == "low_stopword":
        text = " ".join(rng.choice(_EN_CONTENT) for _ in range(rng.randint(40, 120)))
    else:  # pii — clean English, kept but scrubbed
        wordsn = rng.randint(40, 100)
        toks = _english_sentence(rng, wordsn).split()
        inserts = [
            f"contact{rng.randint(0, 999)}@mail{rng.randint(0, 99)}.com",
            f"{rng.randint(100, 999)}-{rng.randint(10, 99)}-{rng.randint(1000, 9999)}",
            f"({rng.randint(200, 989)}) {rng.randint(200, 999)}-{rng.randint(1000, 9999)}",
            rng.choice(TOXIC_WORDS),
        ]
        for ins in inserts[: rng.randint(2, 4)]:
            toks.insert(rng.randint(0, len(toks)), ins)
        text = " ".join(toks)

    html = (
        f"<html><head><title>doc {i}</title></head><body><p>{text}</p></body></html>"
    ).encode("utf-8")
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": text,
        "lang": lang_claim,
        "profile": profile,
    }


def generate_pages(spark, n_rows: int, seed: int = 42, with_profile: bool = False):
    """Distributed deterministic generation: mapInPandas over spark.range."""
    # StructType.add MUTATES in place — PAGES.add(...) would grow the
    # shared module-global schema for every later reader (and a second
    # call would add a duplicate field); build a fresh StructType.
    if with_profile:
        from pyspark.sql.types import StringType, StructField, StructType

        schema = StructType(
            list(PAGES.fields) + [StructField("profile", StringType())]
        )
    else:
        schema = PAGES
    cols = [f.name for f in schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [make_row(int(i), seed) for i in b["id"]]
            df = pd.DataFrame(rows)
            yield df[cols]

    n_parts = max(8, n_rows // 4096)
    return (
        spark.range(0, n_rows, numPartitions=n_parts)
        .mapInPandas(gen, schema=schema)
    )


def write_pages(spark, path: str, n_rows: int, seed: int = 42) -> None:
    generate_pages(spark, n_rows, seed).write.mode("overwrite").parquet(path)
