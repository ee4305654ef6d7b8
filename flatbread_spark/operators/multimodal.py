"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``BinaryType`` payloads plus a typed metadata struct; decode
and feature extraction run as Arrow-batched ``mapInPandas`` stages so payload
bytes stream through executors in columnar batches and never concentrate on
the driver. The actual codecs (PIL/libsndfile/ffmpeg) are NOT installed in
this environment, so the decode kernel is stubbed behind
``FLATBREAD_FAKE_DECODE`` — a deterministic fake that derives "features" from
the payload hash — keeping the Spark-side contract (schema, batching,
partitioning) real and tested while the codec slot stays swappable.
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


def read_binary_assets(spark: SparkSession, path: str, modality: str = "image") -> DataFrame:
    """Ingest raw media files as binary rows (``binaryFile`` source gives
    path/length/content with predicate pushdown on path/length)."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.xxhash64("path").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.lit(None).cast("string").alias("mime"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.col("path").alias("source"),
        ).alias("meta"),
    )


def _decode_batch(pdf_iter) -> Iterator:
    """mapInPandas kernel: decode payload → fixed-size feature vector.

    Real codecs are unavailable in this container; with FLATBREAD_FAKE_DECODE
    (default "1" here) features derive deterministically from the payload
    sha256 — same shape, same batching, swap the body for PIL/ffmpeg in prod.
    """
    import numpy as np
    import pandas as pd

    fake = os.environ.get("FLATBREAD_FAKE_DECODE", "1") == "1"
    for pdf in pdf_iter:
        out = {
            "asset_id": pdf["asset_id"],
            "modality": pdf["modality"],
            "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
            "sha": pdf["payload"].map(
                lambda b: hashlib.sha256(b or b"").hexdigest()
            ),
        }
        if not fake:
            raise NotImplementedError(
                "real media decode requires PIL/libsndfile/ffmpeg; "
                "set FLATBREAD_FAKE_DECODE=1 or install codecs"
            )
        widths, heights, feats = [], [], []
        for b in pdf["payload"]:
            h = hashlib.sha256(b or b"").digest()
            widths.append(int.from_bytes(h[0:2], "big") % 4096)
            heights.append(int.from_bytes(h[2:4], "big") % 4096)
            feats.append(
                (np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0).tolist()
            )
        out["width"] = widths
        out["height"] = heights
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


def extract_features(assets: DataFrame) -> DataFrame:
    """Distributed decode/feature stage. Repartition first if payloads are
    skewed (one giant video per partition starves the others)."""
    return assets.mapInPandas(_decode_batch, schema=FEATURE_SCHEMA)


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
    assets: DataFrame, max_w: int = 256, max_h: int = 256
) -> DataFrame:
    """Distributed image resize: Arrow-batched ``mapInPandas`` over the
    binary payload column — bytes stay on executors, output carries the new
    payload + dimensions. The codec slot is the same swappable stub as
    :func:`extract_features` (no PIL in this container): the deterministic
    fake emits a payload whose bytes derive from (sha256(payload), target
    box) and dimensions that respect the aspect-box contract
    (w <= max_w, h <= max_h, deterministic per input), so schema, batch
    shape, and partitioning behavior are real and testable."""

    def _resize_batch(pdf_iter):
        import pandas as pd

        fake = os.environ.get("FLATBREAD_FAKE_DECODE", "1") == "1"
        if not fake:
            raise NotImplementedError(
                "real image resize requires PIL; set FLATBREAD_FAKE_DECODE=1 "
                "or install codecs"
            )
        for pdf in pdf_iter:
            payloads, widths, heights, sizes = [], [], [], []
            for b in pdf["payload"]:
                h = hashlib.sha256(b or b"").digest()
                # fake decoded dims (same derivation as _decode_batch) ...
                w0 = int.from_bytes(h[0:2], "big") % 4096 or 1
                h0 = int.from_bytes(h[2:4], "big") % 4096 or 1
                # ... then a real aspect-preserving fit into the target box
                scale = min(max_w / w0, max_h / h0, 1.0)
                w1, h1 = max(1, int(w0 * scale)), max(1, int(h0 * scale))
                fake_payload = hashlib.sha256(
                    h + max_w.to_bytes(4, "big") + max_h.to_bytes(4, "big")
                ).digest() * 4
                payloads.append(fake_payload)
                widths.append(w1)
                heights.append(h1)
                sizes.append(len(fake_payload))
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
        _resize_batch, schema=RESIZED_SCHEMA
    )
