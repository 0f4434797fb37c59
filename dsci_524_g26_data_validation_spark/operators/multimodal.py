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
    "MAGIC_PREFIXES",
    "sniff_format_expr",
    "media_format_census",
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


# -- container-format sniffing -------------------------------------------------
#
# A corrupt upload pipeline, a mislabeled crawl, or an extension-renaming
# CDN leaves payloads whose BYTES disagree with the declared format — the
# decode stage then crashes (best case) or silently produces garbage
# features (worst case). Magic-byte sniffing is the classic first-bytes
# check (the `file(1)` / libmagic approach, also RFC 4288 §4.2 media-type
# sniffing): every major container announces itself in its first ~12
# bytes. Pure Catalyst — the payload column contributes only its first 16
# bytes to the expression, no UDF, no Python; at 100 TB the check rides
# the same scan as any other projection and the binary column is the only
# bytes read (parquet column pruning drops the rest).

#: (format, hex-prefix, offset) sniff table — offset is 0-based byte
#: position where the magic sequence must start. Ordered: first match
#: wins, so more specific containers (RIFF/WAVE vs RIFF/WEBP, MP4's
#: offset-4 'ftyp') are listed before generic fallbacks.
MAGIC_PREFIXES: tuple = (
    ("png", "89504E470D0A1A0A", 0),
    ("jpeg", "FFD8FF", 0),
    ("gif", "474946383761", 0),
    ("gif", "474946383961", 0),
    ("wav", "57415645", 8),     # RIFF....WAVE
    ("webp", "57454250", 8),    # RIFF....WEBP
    ("avi", "41564920", 8),     # RIFF....AVI␠
    ("mp4", "66747970", 4),     # ....ftyp (box size varies; offset fixed)
    ("ogg", "4F676753", 0),     # OggS (opus/vorbis/theora)
    ("flac", "664C6143", 0),    # fLaC
    ("mp3", "494433", 0),       # ID3v2 header
    ("mp3", "FFFB", 0),         # bare MPEG-1 layer-III sync
    ("mp3", "FFF3", 0),
    ("webm", "1A45DFA3", 0),    # EBML (webm/mkv)
    ("tiff", "49492A00", 0),
    ("tiff", "4D4D002A", 0),
    ("bmp", "424D", 0),
    ("pdf", "25504446", 0),     # %PDF
    ("gzip", "1F8B", 0),
    ("zip", "504B0304", 0),
)

#: How many leading payload bytes sniffing ever inspects.
_SNIFF_BYTES = 16


def sniff_format_expr(payload: "F.Column | str") -> "F.Column":
    """Container format sniffed from the payload's magic bytes.

    Returns the format name (``png``/``jpeg``/``mp4``/…), ``'empty'``
    for NULL or zero-length payloads, or ``'unknown'`` when no magic
    matches. The expression hexes only the first :data:`_SNIFF_BYTES`
    bytes — for a blob column this is the cheapest possible touch — and
    every comparison is a codegen ``startswith`` on that one hex string.
    First match in :data:`MAGIC_PREFIXES` wins.
    """
    col = F.col(payload) if isinstance(payload, str) else payload
    head = F.upper(F.hex(F.substring(col, 1, _SNIFF_BYTES)))
    expr = F.lit("unknown")
    for fmt, hexmagic, offset in reversed(MAGIC_PREFIXES):
        # byte offset k = hex-string position 2k+1 (1-based substring)
        probe = F.substring(head, 2 * offset + 1, len(hexmagic))
        expr = F.when(probe == hexmagic, F.lit(fmt)).otherwise(expr)
    return (
        F.when(col.isNull() | (F.length(col) == 0), F.lit("empty"))
        .otherwise(expr)
    )


def media_format_census(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    declared_col: str = "meta.codec",
    aliases: dict | None = None,
) -> DataFrame:
    """Declared-format vs sniffed-bytes census →
    ``(declared, sniffed, n_rows, mismatch)``.

    ``mismatch`` is true when the declared label, normalized through
    ``aliases`` (e.g. ``{"jpg": "jpeg", "jfif": "jpeg"}`` on top of the
    built-in ones), differs from the sniffed format — with ``empty`` and
    ``unknown`` sniffs always counted as mismatches for a non-empty
    declaration (an undeclarable payload is exactly what the census
    exists to surface). One scan reading only (declared, first-16-bytes);
    the aggregate is |declared|×|formats| rows, map-side combined.
    """
    amap = {"jpg": "jpeg", "jfif": "jpeg", "tif": "tiff", "mkv": "webm"}
    amap.update(aliases or {})
    declared = F.lower(F.coalesce(F.expr(declared_col), F.lit("")))
    for k, v in amap.items():
        declared = F.when(declared == k, F.lit(v)).otherwise(declared)
    sniffed = sniff_format_expr(F.col(payload_col))
    return (
        df.select(declared.alias("declared"), sniffed.alias("sniffed"))
        .groupBy("declared", "sniffed")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("mismatch", F.col("declared") != F.col("sniffed"))
    )


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
