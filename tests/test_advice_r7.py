"""Round-7 ADVICE + VERDICT regression pins.

One test per adjudicated finding:
- dedup_by_url NULL-quality rows must LOSE, not win (ADVICE r6: a NULL
  struct field sorts first in Spark's struct ordering, so the bare
  (-quality, id) min_by key crowned unscored rows);
- row_wise integral sum/min/max must be exact past 2^53 (ADVICE r6: the
  double accumulator lane silently rounded int64 rows);
- decode_bmp BI_BITFIELDS masks must be validated (ADVICE r6: non-identity
  masks used to decode with silently swapped channels);
- real-mode extract_features must tolerate NULL payloads (ADVICE r6:
  one NULL row aborted the whole Arrow batch);
- fps_select excludes chosen points by distance, not a growing isin
  literal (VERDICT r6 #4) — exact duplicates now terminate the scan.
"""
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ url dedup NULLs

def test_dedup_by_url_null_quality_loses(spark):
    from flatbread_spark.functions.urls import dedup_by_url

    rows = [
        ("http://a.example.com/x", "id-1", None),   # unscored, smallest id
        ("http://a.example.com/x", "id-5", 1.0),    # scored — must win
        ("http://a.example.com/x", "id-9", None),
        ("http://b.example.com/y", "id-3", None),   # all-NULL group: keep one
        ("http://b.example.com/y", "id-7", None),
    ]
    df = spark.createDataFrame(rows, "url string, doc_id string, quality double")
    got = {
        r["url_canonical"]: (r["doc_id"], r["quality"], r["n_dups"])
        for r in dedup_by_url(df, "url", "doc_id", "quality").collect()
    }
    winners = {k.split("//")[-1].split("/")[0].split(".")[0]: v for k, v in got.items()}
    assert winners["a"] == ("id-5", 1.0, 3)
    # group with no scored row still keeps exactly one (smallest id)
    assert winners["b"] == ("id-3", None, 2)


# -------------------------------------------------- integral row-sum precision

def test_row_wise_integral_exact_past_2_53(spark):
    from flatbread_spark.aggfuncs import row_wise

    big = 2**53 + 1          # not representable in double (rounds to 2^53)
    df = spark.createDataFrame([(big, 2, None)], "a bigint, b bigint, c bigint")
    cols = [F.col("a"), F.col("b"), F.col("c")]
    row = df.select(
        row_wise("sum", cols, integral=True).alias("s"),
        row_wise("min", cols, integral=True).alias("mn"),
        row_wise("max", cols, integral=True).alias("mx"),
    ).first()
    assert row["s"] == big + 2      # double lane would give 2^53 + 2
    assert row["mn"] == 2
    assert row["mx"] == big
    # all-null integral row: sum 0 (pandas skipna), min/max NULL
    nulls = spark.createDataFrame([(None, None)], "a bigint, b bigint")
    r2 = nulls.select(
        row_wise("sum", [F.col("a"), F.col("b")], integral=True).alias("s"),
        row_wise("min", [F.col("a"), F.col("b")], integral=True).alias("mn"),
    ).first()
    assert r2["s"] == 0 and r2["mn"] is None


# ------------------------------------------------------------ BMP BI_BITFIELDS

def _bitfields_bmp(w, h, masks, bpp=32):
    """32-bit top-down BI_BITFIELDS BMP: info header + 3 mask DWORDs."""
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    raster = b""
    for row in rgb:  # top-down: negative height below
        raster += b"".join(bytes([p[2], p[1], p[0], 0xFF]) for p in row)
    data_off = 54 + 12
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(raster), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, bpp, 3, len(raster), 2835, 2835, 0, 0
    )
    return rgb, hdr + info + struct.pack("<III", *masks) + raster


def test_bmp_bitfields_identity_masks_decode():
    from flatbread_spark.functions import codecs

    rgb, bmp = _bitfields_bmp(3, 2, (0x00FF0000, 0x0000FF00, 0x000000FF))
    assert np.array_equal(codecs.decode_bmp(bmp), rgb)


def test_bmp_bitfields_swapped_masks_rejected():
    from flatbread_spark.functions import codecs

    # RGBA-order masks (red in the low byte): decoding with the fixed BGR
    # swizzle would silently swap channels — must refuse instead.
    _, bmp = _bitfields_bmp(3, 2, (0x000000FF, 0x0000FF00, 0x00FF0000))
    with pytest.raises(NotImplementedError):
        codecs.decode_bmp(bmp)


# ---------------------------------------------------- NULL payload, real mode

def test_extract_features_real_mode_null_payload(spark):
    from flatbread_spark.functions import codecs
    from flatbread_spark.operators.multimodal import (
        ASSET_SCHEMA,
        extract_features,
    )

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    rows = [
        (0, "image", None, codecs.encode_ppm(arr), (None, None, None, "t")),
        (1, "image", None, None, (None, None, None, "t")),
    ]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = {r["asset_id"]: r for r in extract_features(assets, fake=False).collect()}
    assert out[0]["width"] == 5 and out[0]["height"] == 4
    assert out[1]["width"] is None and out[1]["height"] is None
    assert out[1]["feat"] is None and out[1]["n_bytes"] == 0


# ------------------------------------------------- fps distance-based exclusion

def test_fps_select_duplicates_terminate_early(spark):
    """Exact code duplicates have min-distance 0 to the chosen set and are
    never selected — the scan stops when only duplicates remain, instead
    of padding ranks with zero-diversity picks."""
    from flatbread_spark.operators.sampling import fps_select

    vecs = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),   # duplicate of 0
        (2, [0.0, 1.0]),
        (3, [0.0, 1.0]),   # duplicate of 2
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    out = fps_select(df, "vec_id", "embedding", k=4).collect()
    assert [(r["rank"], r["vec_id"]) for r in out] == [(0, 0), (1, 2)]
    assert all(r["min_dist"] > 0 for r in out if r["rank"] > 0)
