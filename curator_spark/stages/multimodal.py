"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's multimodal surface (reference: types/prompt.py:49-135 —
`Image`/`File` wrappers around bytes/b64/url, size checks at
base_online:110-164) restated for Spark: media are opaque `binary`
columns accompanied by a typed metadata struct; decode / feature
extraction runs as Arrow-batched `mapInPandas` so bytes never pass
through per-row Python.

The actual codec work (image decode, audio resample, video frame
sampling) needs libraries not present in this container, so the codec
layer is an explicit seam: `register_decoder(kind, fn)` plugs a real
decoder in; the built-in deterministic fake (`fake_decode`) keeps the
Spark-side plumbing — schema, batch shape, partitioning, null/error
routing — real and testable. `strict=True` surfaces
NotImplementedError for kinds without a registered decoder.

Scale notes: media bytes dominate row size, so the stage (a) never
shuffles binary columns (pure map), (b) relies on column pruning —
metadata-only consumers never scan the payload column, and (c) bounds
Arrow batch bytes via spark.sql.execution.arrow.maxRecordsPerBatch
(set in engine/session.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("kind", StringType()),       # image | audio | video | html
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("error", StringType()),
    ]
)

_FEATURE_DDL = (
    "width int, height int, n_frames int, embedding array<float>, error string"
)

# kind -> (bytes batch -> feature DataFrame) decoder registry
_DECODERS: dict[str, Callable[[pd.Series], pd.DataFrame]] = {}


def register_decoder(kind: str, fn: Callable[[pd.Series], pd.DataFrame]) -> None:
    _DECODERS[kind] = fn


def fake_decode(payloads: pd.Series, dim: int = 8) -> pd.DataFrame:
    """Deterministic stand-in decoder: derives pseudo-features from the
    payload hash so tests are stable under any partitioning."""
    ws, hs, fs, embs, errs = [], [], [], [], []
    for b in payloads:
        if b is None or len(b) == 0:
            ws.append(None), hs.append(None), fs.append(None)
            embs.append(None), errs.append("empty payload")
            continue
        dig = hashlib.sha256(bytes(b)).digest()
        ws.append(64 + dig[0] % 192)
        hs.append(64 + dig[1] % 192)
        fs.append(1 + dig[2] % 30)
        vec = (
            np.frombuffer(dig[: dim * 4], dtype=np.uint8)
            .reshape(dim, 4)
            .sum(axis=1)
            .astype(np.float32)
        )
        embs.append((vec / 255.0).tolist())
        errs.append(None)
    return pd.DataFrame(
        {"width": pd.array(ws, dtype="Int32"), "height": pd.array(hs, dtype="Int32"),
         "n_frames": pd.array(fs, dtype="Int32"), "embedding": embs, "error": errs}
    )


def with_media_meta(
    df: DataFrame, payload_col: str = "html", kind: str = "html",
    mime: str = "text/html",
) -> DataFrame:
    """Typed metadata struct — native expressions only (no Python)."""
    p = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(mime).alias("mime"),
            F.coalesce(F.octet_length(p), F.lit(0)).cast("long").alias("n_bytes"),
            F.sha2(F.coalesce(p, F.lit(b"")), 256).alias("sha256"),
        ),
    )


def with_media_features(
    df: DataFrame, payload_col: str, kind: str, strict: bool = False,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    Unknown `kind`: strict=True raises NotImplementedError inside the
    stage (clearly-marked codec gap); strict=False falls back to the
    deterministic fake so plumbing stays exercisable.
    """
    decoder = _DECODERS.get(kind)
    if decoder is None:
        if strict:
            def decoder(_b: pd.Series) -> pd.DataFrame:  # noqa: ANN001
                raise NotImplementedError(
                    f"no decoder registered for media kind {kind!r}; "
                    "real codecs (PIL/ffmpeg/...) are not in this container — "
                    "register one via register_decoder()"
                )
        else:
            decoder = fake_decode

    in_cols = df.columns
    out_ddl = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}"
                        for c in in_cols) + ", features struct<" + \
        "width: int, height: int, n_frames: int, " \
        "embedding: array<float>, error: string>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decoder(pdf[payload_col])
            out = pdf.copy()
            out["features"] = feats.to_dict("records")
            yield out

    return df.mapInPandas(run, schema=out_ddl)


def with_resize_spec(
    df: DataFrame, target_w: int, target_h: int,
    width_col: str = "features.width", height_col: str = "features.height",
) -> DataFrame:
    """Aspect-preserving resize geometry as NATIVE expressions.

    The codec-side resample is behind the decoder registry (not in this
    container); the geometry — fit-within (target_w, target_h) keeping
    aspect, never upscale — is arithmetic and belongs JVM-side so a
    100 TB pass can plan/filter on output dims without touching pixels.
    Emits `resize` struct: out_w, out_h, scale (double, <= 1.0).
    """
    w = F.col(width_col).cast("double")
    h = F.col(height_col).cast("double")
    scale = F.least(F.lit(target_w) / w, F.lit(target_h) / h, F.lit(1.0))
    valid = w.isNotNull() & h.isNotNull() & (w > 0) & (h > 0)
    return df.withColumn(
        "resize",
        F.when(
            valid,
            F.struct(
                F.round(w * scale).cast("int").alias("out_w"),
                F.round(h * scale).cast("int").alias("out_h"),
                scale.alias("scale"),
            ),
        ),
    )


def with_frame_sample(
    df: DataFrame, k: int, n_frames_col: str = "features.n_frames"
) -> DataFrame:
    """Deterministic uniform frame sampling for video payloads —
    native sequence/transform arithmetic, no Python and no RNG
    (seeded determinism rule F8): k indices evenly spaced over
    [0, n_frames-1], deduplicated when the clip is shorter than k.
    The frame EXTRACTION at those indices is codec work behind the
    decoder registry; the index plan is what the engine schedules
    and shuffles on, so it stays JVM-side.
    """
    n = F.col(n_frames_col).cast("long")
    step_den = max(k - 1, 1)  # k=1 -> single frame at index 0
    idx = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.when(
                n > 1, F.round(i * (n - 1) / F.lit(step_den)).cast("long")
            ).otherwise(F.lit(0)),
        )
    )
    return df.withColumn(
        "frame_indices",
        F.when(n.isNotNull() & (n > 0), idx),
    )
