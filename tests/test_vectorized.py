"""Unit tests for the vectorized n-gram core."""

from __future__ import annotations

import numpy as np

from curator_spark.config import DEFAULT_CONFIG
from curator_spark.functions import vectorized as V

LANGS = DEFAULT_CONFIG.langs


def test_encode_roundtrip_offsets():
    codes, offsets = V.encode_texts(["abc", "", "a b"])
    assert list(offsets) == [0, 3, 3, 6]
    assert len(codes) == 6
    assert codes[3] == codes[0]  # 'a' == 'a'
    assert codes[4] == 1  # space


def test_case_folding_in_lookup():
    a, _ = V.encode_texts(["HELLO"])
    b, _ = V.encode_texts(["hello"])
    assert (a == b).all()


def test_langid_known_texts():
    texts = [
        "the quick brown fox jumps over the lazy dog and the cat",
        "der hund und die katze sind nicht mehr in diesem haus",
        "il faut toujours prendre le temps de vivre avec les autres",
        "el perro y el gato no pueden estar en la casa",
    ]
    pred, conf = V.langid_scores(texts, LANGS)
    assert [LANGS[i] for i in pred] == ["en", "de", "fr", "es"]
    assert (conf > 0.25).all()


def test_batch_composition_independence():
    """Per-row scores must be pure functions of the row (not the batch)."""
    t = "the quick brown fox jumps over the lazy dog"
    solo_pred, solo_conf = V.langid_scores([t], LANGS)
    mix_pred, mix_conf = V.langid_scores(["xyz", t, "der hund und die katze"], LANGS)
    assert solo_conf[0] == mix_conf[1]
    assert solo_pred[0] == mix_pred[1]
    assert V.perplexities([t])[0] == V.perplexities(["q", t, "z"])[1]


def test_perplexity_ordering():
    clean = "the people of the world want to live in a house with water and food"
    gibberish = "xqzjv kplmw zzyxw qjkvp wvzxq jjqzk xxzwv"
    p = V.perplexities([clean, gibberish])
    assert p[0] < p[1]


def test_empty_and_short_rows():
    pred, conf = V.langid_scores(["", "ab"], LANGS)
    assert list(pred) == [-1, -1]
    assert list(conf) == [0.0, 0.0]
    p = V.perplexities(["", "a"])
    assert p[0] == 1e9
    assert np.isfinite(p[1]) or p[1] == 1e9


def test_artifact_roundtrip(tmp_path):
    path = str(tmp_path / "model.npz")
    V.save_artifacts(path, LANGS)
    table, lm, langs = V.load_artifacts(path)
    assert langs == LANGS
    np.testing.assert_array_equal(table, V.get_langid_table(LANGS))
    np.testing.assert_array_equal(lm, V.get_bigram_lm())
