"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (this environment ships no
image/audio codecs — see ``_require_codec``): real libraries slot into
the marked functions without touching the Spark plumbing, which IS real
and tested — schemas, batch iteration, partition-preserving transforms,
and a deterministic fake feature extractor used by the test-suite.

Design for 100 TB of media:
* binary payloads stay opaque to Spark (no JVM-side decode, no
  accidental row materialization in the driver);
* mapInPandas streams Arrow record batches through one Python worker per
  core — batch size bounded by spark.sql.execution.arrow.maxRecordsPerBatch
  so a partition of large blobs never loads at once;
* metadata (width/height/duration/codec) is columnar and prunable —
  filters on it push down to the scan without touching bytes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "decode_images",
    "extract_features",
    "sample_frames",
]

#: Canonical multimodal column bundle: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def _require_codec(name: str):
    """Gate for real decoders. STUB: the sandbox has no media libraries;
    production swaps this for `import PIL` / `import av` etc."""
    raise NotImplementedError(
        f"media codec '{name}' not available in this environment; "
        "the Spark plumbing is real — plug a decoder into this function"
    )


def media_table(
    spark,
    n_rows: int,
    *,
    seed: int = 42,
    num_partitions: int | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic fake media table (payload = hash-derived bytes) for
    exercising the plumbing at any scale — pure Catalyst.

    ``hash_fn="portable"`` derives kind/meta from top-60-bits-of-md5
    (the engine's standard cross-engine hash) instead of the faster
    JVM-only xxhash64, making every downstream number — pixel totals,
    frame counts, even the fake feature vectors (already md5-derived)
    — reproducible in ANSI SQL; this is what lets the media pipeline's
    driver oracle verify the full mapInPandas path value-for-value."""
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism
    df = spark.range(0, n_rows, 1, num_partitions)
    if hash_fn == "portable":
        u = lambda salt, mod: F.pmod(  # noqa: E731
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.lit("m"),
                            F.col("id").cast("string"),
                            F.lit(str(salt)),
                            F.lit(str(seed)),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(mod),
        )
    elif hash_fn == "xxhash64":
        u = lambda salt, mod: F.pmod(F.xxhash64("id", F.lit(seed), F.lit(salt)), F.lit(mod))  # noqa: E731
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'portable', got {hash_fn!r}")
    kind = (
        F.when(u(1, 10) < 6, "image").when(u(1, 10) < 9, "audio").otherwise("video")
    )
    payload = F.unhex(F.repeat(F.md5(F.concat(F.lit("m"), "id")), 4))  # 64 bytes
    meta = F.struct(
        (F.lit(32) + u(2, 1024)).cast("int").alias("width"),
        (F.lit(32) + u(3, 1024)).cast("int").alias("height"),
        (F.lit(1000) + u(4, 60_000)).cast("int").alias("duration_ms"),
        F.when(kind == "image", "png").when(kind == "audio", "opus").otherwise("h264").alias("codec"),
    )
    return df.select(
        F.format_string("media%09d", "id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


_DECODED_SCHEMA = (
    "media_id string, width int, height int, n_pixels bigint, ok boolean"
)


def decode_images(df: DataFrame, *, real_decode: bool = False) -> DataFrame:
    """Decode image payloads → (media_id, width, height, n_pixels, ok).

    ``real_decode=True`` routes to the stubbed codec gate
    (NotImplementedError here); the default deterministic fake trusts the
    metadata — the Spark-side contract (schema, batching, partitioning)
    is identical either way.

    The needed meta fields are projected to top-level columns BEFORE
    ``mapInPandas``, so the Arrow batch arrives fully columnar (a struct
    column materializes one Python dict per row inside the batch) and
    the parquet reader prunes the untouched meta fields.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                _require_codec("image")
            w = pdf["width"].astype("int32")
            h = pdf["height"].astype("int32")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w,
                    "height": h,
                    "n_pixels": (w.astype("int64") * h.astype("int64")),
                    "ok": pdf["payload"].notna() & (pdf["payload"].str.len() > 0),
                }
            )

    pruned = df.filter(F.col("kind") == "image").select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        "payload",
    )
    return pruned.mapInPandas(batches, _DECODED_SCHEMA)


_FEATURE_DIM = 16
_FEATURES_SCHEMA = f"media_id string, features array<float>"


def extract_features(df: DataFrame) -> DataFrame:
    """Deterministic fake feature extractor (hash-of-payload → R^16),
    batch-vectorized with numpy. A real model server / ONNX runtime slots
    into the same mapInPandas shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = np.stack(
                [
                    np.frombuffer(
                        (b or b"\x00" * 64)[:64].ljust(64, b"\x00"), dtype=np.uint8
                    )
                    for b in pdf["payload"]
                ]
            ).astype(np.float32)
            feats = raw.reshape(len(pdf), -1, 64 // _FEATURE_DIM).mean(axis=2) / 255.0
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": list(feats)}
            )

    return df.mapInPandas(batches, _FEATURES_SCHEMA)


def sample_frames(df: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp. Timestamps derive from metadata (pure Catalyst explode);
    actual frame decode is the stubbed codec's job downstream."""
    ts = F.sequence(
        F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms)
    )
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(ts).alias("frame_ts_ms"))
    )
