"""Multimodal plumbing tests: schema, batch shape, determinism,
null/error routing, strict codec-gap surfacing.

Reference analog: multimodal prompt unpack + size checks
(types/prompt.py:49-135, base_online:110-164); here the payloads are
the synthetic pages' `html` binary column.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from curator_spark.stages.multimodal import (
    fake_decode,
    with_media_features,
    with_media_meta,
)


@pytest.fixture(scope="module")
def pages(spark, pages_path):
    return spark.read.parquet(pages_path).limit(200)


def test_media_meta_native(pages):
    df = with_media_meta(pages, "html", kind="html", mime="text/html")
    row = df.select("media_meta").first()["media_meta"]
    assert row["kind"] == "html" and row["n_bytes"] > 0
    assert len(row["sha256"]) == 64
    # native exprs only — no BatchEvalPython / ArrowEvalPython in plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_media_features_schema_and_values(pages):
    df = with_media_features(pages, "html", kind="image")  # fake decoder
    out = df.select("url", "features.*").toPandas()
    assert set(out.columns) == {
        "url", "width", "height", "n_frames", "embedding", "error"
    }
    assert out["error"].isna().all()
    assert out["width"].between(64, 255).all()
    assert all(len(e) == 8 for e in out["embedding"])


def test_media_features_deterministic_under_partitioning(pages):
    a = (
        with_media_features(pages, "html", kind="image")
        .select("url", "features")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        with_media_features(pages.repartition(7), "html", kind="image")
        .select("url", "features")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (a["features"].astype(str) == b["features"].astype(str)).all()


def test_empty_payload_routed_to_error(spark):
    df = spark.createDataFrame(
        [("a", b"payload"), ("b", b""), ("c", None)], "id string, blob binary"
    )
    out = (
        with_media_features(df, "blob", kind="image")
        .select("id", "features.error")
        .toPandas()
        .set_index("id")["error"]
    )
    assert out["a"] is None or pd.isna(out["a"])
    assert out["b"] == "empty payload"
    assert out["c"] == "empty payload"


def test_strict_unregistered_kind_raises(spark, pages):
    df = with_media_features(pages.limit(5), "html", kind="video", strict=True)
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        df.collect()


def test_fake_decode_batch_shape():
    s = pd.Series([b"abc", b"def", None])
    out = fake_decode(s)
    assert list(out.columns) == ["width", "height", "n_frames", "embedding", "error"]
    assert len(out) == 3


def test_resize_spec_geometry(spark):
    from curator_spark.stages.multimodal import with_resize_spec

    df = spark.createDataFrame(
        [("a", 4000, 3000), ("b", 100, 50), ("c", 0, 10), ("d", None, None)],
        "id string, w int, h int",
    ).withColumn("features", F.struct(F.col("w").alias("width"),
                                      F.col("h").alias("height")))
    out = (
        with_resize_spec(df, 1024, 1024)
        .select("id", "resize.*")
        .toPandas()
        .set_index("id")
    )
    # a: landscape 4:3 fit in 1024 box -> 1024x768, downscale
    assert (out.loc["a", "out_w"], out.loc["a", "out_h"]) == (1024, 768)
    # b: already smaller than the box -> never upscaled
    assert (out.loc["b", "out_w"], out.loc["b", "out_h"]) == (100, 50)
    assert out.loc["b", "scale"] == 1.0
    # c/d: invalid dims -> null spec
    assert pd.isna(out.loc["c", "scale"]) and pd.isna(out.loc["d", "scale"])


def test_frame_sample_indices(spark):
    from curator_spark.stages.multimodal import with_frame_sample

    df = spark.createDataFrame(
        [("a", 100), ("b", 2), ("c", 1), ("d", 0), ("e", None)],
        "id string, nf int",
    ).withColumn("features", F.struct(F.col("nf").alias("n_frames")))
    out = (
        with_frame_sample(df, 4)
        .select("id", "frame_indices")
        .toPandas()
        .set_index("id")["frame_indices"]
    )
    assert list(out["a"]) == [0, 33, 66, 99]
    assert list(out["b"]) == [0, 1]        # dedup below k frames
    assert list(out["c"]) == [0]
    assert out["d"] is None or pd.isna(out["d"])
    assert out["e"] is None or pd.isna(out["e"])
