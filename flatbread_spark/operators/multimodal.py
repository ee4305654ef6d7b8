"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``BinaryType`` payloads plus a typed metadata struct; decode
and feature extraction run as Arrow-batched ``mapInPandas`` stages so payload
bytes stream through executors in columnar batches and never concentrate on
the driver.

Two decode modes share one contract (FEAT_DIM=32 float features, same
schema, same batching):

- ``FLATBREAD_FAKE_DECODE=1`` (default here): deterministic fake features
  from the payload sha256 — exercises plumbing with arbitrary bytes.
- ``FLATBREAD_FAKE_DECODE=0``: REAL pure-stdlib codecs from
  ``functions/codecs.py`` — PPM/PGM/BMP images (struct/numpy) and PCM WAV
  audio (stdlib ``wave``). Formats beyond those raise
  ``NotImplementedError`` naming the format; swap in PIL/ffmpeg in prod
  for the rest.
"""
from __future__ import annotations

import hashlib
import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),   # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", LongType(), True),
                    StructField("source", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "asset_id bigint, modality string, n_bytes bigint, sha string, "
    "width int, height int, feat array<float>"
)


def _with_id_type(schema_str: str, assets: DataFrame) -> StructType:
    """Output schema with asset_id typed from the INPUT — ids are frequently
    strings (URL hashes, UUIDs) and nothing in the kernels needs an integer."""
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(schema_str)
    id_type = assets.schema["asset_id"].dataType
    return StructType(
        [
            StructField("asset_id", id_type, f.nullable) if f.name == "asset_id" else f
            for f in schema.fields
        ]
    )


def read_binary_assets(
    spark: SparkSession,
    path: str,
    modality: str = "image",
    sniff: bool | None = None,
) -> DataFrame:
    """Ingest raw media files as binary rows (``binaryFile`` source gives
    path/length/content with predicate pushdown on path/length).

    ``sniff=True`` classifies EACH file from its payload magic bytes with
    JVM-side substring comparisons (no Python in the scan) — the realistic
    shape for a mixed crawl directory: PNM/BMP/PNG → ``image`` with the
    matching mime, RIFF/WAVE → ``audio``, anything else ``unknown``
    (downstream decode keeps its loud-failure contract for those; mirrors
    ``functions.codecs.sniff_format``). The default (sniff unset) takes
    ``modality`` as the literal label for a homogeneous directory and
    skips the classification expressions. ``modality="sniff"`` remains
    accepted as a RESERVED value for back-compat (ADVICE r7: it was the
    only spelling, which made a directory literally named 'sniff'
    inexpressible — pass ``sniff=False`` to force the literal)."""
    raw = spark.read.format("binaryFile").load(path)
    if sniff is None:
        sniff = modality == "sniff"
    if sniff:
        p2 = F.substring("content", 1, 2)
        is_ppm = (p2 == F.lit(b"P6")) | (p2 == F.lit(b"P3"))
        is_pgm = (p2 == F.lit(b"P5")) | (p2 == F.lit(b"P2"))
        # ADVICE r7: P1/P4 sniff like their portable-anymap siblings
        is_pbm = (p2 == F.lit(b"P4")) | (p2 == F.lit(b"P1"))
        is_bmp = p2 == F.lit(b"BM")
        is_png = F.substring("content", 1, 8) == F.lit(
            b"\x89PNG\r\n\x1a\n"
        )
        is_wav = (F.substring("content", 1, 4) == F.lit(b"RIFF")) & (
            F.substring("content", 9, 4) == F.lit(b"WAVE")
        )
        is_jpeg = F.substring("content", 1, 3) == F.lit(b"\xff\xd8\xff")
        mime = (
            F.when(is_ppm, F.lit("image/x-portable-pixmap"))
            .when(is_pgm, F.lit("image/x-portable-graymap"))
            .when(is_pbm, F.lit("image/x-portable-bitmap"))
            .when(is_bmp, F.lit("image/bmp"))
            .when(is_png, F.lit("image/png"))
            .when(is_jpeg, F.lit("image/jpeg"))
            .when(is_wav, F.lit("audio/wav"))
        )
        modality_col = (
            F.when(
                is_ppm | is_pgm | is_pbm | is_bmp | is_png | is_jpeg,
                F.lit("image"),
            )
            .when(is_wav, F.lit("audio"))
            .otherwise(F.lit("unknown"))
        )
    else:
        mime = F.lit(None).cast("string")
        modality_col = F.lit(modality)
    return raw.select(
        F.xxhash64("path").alias("asset_id"),
        modality_col.alias("modality"),
        mime.alias("mime"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.col("path").alias("source"),
        ).alias("meta"),
    )


def _decode_batch(pdf_iter, fake_mode: bool | None = None) -> Iterator:
    """mapInPandas kernel: decode payload → fixed-size feature vector.

    fake_mode None reads FLATBREAD_FAKE_DECODE (default "1"). Fake:
    deterministic sha256-derived features. Real: stdlib codecs
    (PPM/PGM/BMP, PCM WAV) via ``functions.codecs``; unsupported formats
    raise NotImplementedError.
    """
    import numpy as np
    import pandas as pd

    fake = (
        os.environ.get("FLATBREAD_FAKE_DECODE", "1") == "1"
        if fake_mode is None
        else fake_mode
    )
    if not fake:
        from flatbread_spark.functions import codecs

    for pdf in pdf_iter:
        out = {
            "asset_id": pdf["asset_id"],
            "modality": pdf["modality"],
            "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
            "sha": pdf["payload"].map(
                lambda b: hashlib.sha256(b or b"").hexdigest()
            ),
        }
        widths, heights, feats = [], [], []
        if fake:
            for b in pdf["payload"]:
                h = hashlib.sha256(b or b"").digest()
                widths.append(int.from_bytes(h[0:2], "big") % 4096)
                heights.append(int.from_bytes(h[2:4], "big") % 4096)
                feats.append(
                    (np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0).tolist()
                )
        else:
            for b in pdf["payload"]:
                # NULL-payload contract (ADVICE r6): payloads are nullable
                # in ASSET_SCHEMA, and fake mode tolerates None — real
                # mode must not abort the whole Arrow batch on one bad
                # row. A NULL payload yields NULL width/height/features
                # (n_bytes 0 and the empty-bytes sha are already set
                # above), keeping the row observable for triage.
                if b is None:
                    widths.append(None)
                    heights.append(None)
                    feats.append(None)
                    continue
                fmt = codecs.sniff_format(b)
                if fmt in ("ppm", "pgm", "pbm", "bmp", "png", "jpeg"):
                    arr = codecs.decode_image(b)
                    widths.append(int(arr.shape[1]))
                    heights.append(int(arr.shape[0]))
                    feats.append(codecs.image_features(arr).tolist())
                elif fmt == "wav":
                    rate, _nch, dur_ms, samples = codecs.decode_wav(b)
                    widths.append(None)
                    heights.append(None)
                    feats.append(codecs.audio_features(rate, dur_ms, samples).tolist())
                else:
                    raise NotImplementedError(
                        f"payload format {fmt or 'unknown'} needs PIL/ffmpeg; "
                        "stdlib-decodable formats: PNM/BMP/PNG images, PCM WAV "
                        "audio (or set FLATBREAD_FAKE_DECODE=1)"
                    )
        out["width"] = pd.array(widths, dtype="Int32")
        out["height"] = pd.array(heights, dtype="Int32")
        out["feat"] = feats
        yield pd.DataFrame(out)


def synth_assets_from_documents(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    modality: str = "image",
) -> DataFrame:
    """Deterministic asset rows from a document table (utf-8 payloads) —
    exercises the binary-column contract where no real media exists."""
    return documents.select(
        F.col(id_col).alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(text_col, "utf-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.lit("synth").alias("source"),
        ).alias("meta"),
    )


def extract_features(assets: DataFrame, fake: bool | None = None) -> DataFrame:
    """Distributed decode/feature stage. Repartition first if payloads are
    skewed (one giant video per partition starves the others).

    ``fake`` overrides the FLATBREAD_FAKE_DECODE env default explicitly —
    the flag rides the serialized closure, so it works regardless of what
    environment the Python workers inherited."""

    def _kernel(it):
        return _decode_batch(it, fake_mode=fake)

    return assets.mapInPandas(_kernel, schema=_with_id_type(FEATURE_SCHEMA, assets))


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per desired frame
    timestamp (explode over the duration metadata) — the decode of each frame
    then rides the same ``extract_features`` stage. Demonstrates
    decode-fanout without shuffling payloads (payload carried by reference
    within the row)."""
    return assets.filter(F.col("modality") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
        "payload",
    )


RESIZED_SCHEMA = (
    "asset_id bigint, modality string, payload binary, "
    "width int, height int, n_bytes bigint"
)


def resize_images(
    assets: DataFrame, max_w: int = 256, max_h: int = 256,
    fake: bool | None = None,
) -> DataFrame:
    """Distributed image resize: Arrow-batched ``mapInPandas`` over the
    binary payload column — bytes stay on executors, output carries the new
    payload + dimensions. Same two modes as :func:`extract_features`:
    FAKE_DECODE=1 derives dims/payload from (sha256(payload), target box)
    with the aspect-box contract honored; FAKE_DECODE=0 really decodes
    PPM/PGM/BMP, nearest-neighbor fits into the box, and re-encodes as
    binary P6 PPM (other formats raise NotImplementedError)."""

    fake_arg = fake

    def _resize_batch(pdf_iter):
        import pandas as pd

        fake = (
            os.environ.get("FLATBREAD_FAKE_DECODE", "1") == "1"
            if fake_arg is None
            else fake_arg
        )
        if not fake:
            from flatbread_spark.functions import codecs
        for pdf in pdf_iter:
            payloads, widths, heights, sizes = [], [], [], []
            for b in pdf["payload"]:
                if fake:
                    h = hashlib.sha256(b or b"").digest()
                    # fake decoded dims (same derivation as _decode_batch) ...
                    w0 = int.from_bytes(h[0:2], "big") % 4096 or 1
                    h0 = int.from_bytes(h[2:4], "big") % 4096 or 1
                    # ... then a real aspect-preserving fit into the target box
                    scale = min(max_w / w0, max_h / h0, 1.0)
                    w1, h1 = max(1, int(w0 * scale)), max(1, int(h0 * scale))
                    new_payload = hashlib.sha256(
                        h + max_w.to_bytes(4, "big") + max_h.to_bytes(4, "big")
                    ).digest() * 4
                else:
                    arr = codecs.resize_nearest(codecs.decode_image(b), max_w, max_h)
                    h1, w1 = int(arr.shape[0]), int(arr.shape[1])
                    new_payload = codecs.encode_ppm(arr)
                payloads.append(new_payload)
                widths.append(w1)
                heights.append(h1)
                sizes.append(len(new_payload))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "payload": payloads,
                    "width": widths,
                    "height": heights,
                    "n_bytes": sizes,
                }
            )

    return assets.filter(F.col("modality") == "image").mapInPandas(
        _resize_batch, schema=_with_id_type(RESIZED_SCHEMA, assets)
    )
