"""Real (FAKE_DECODE=0) multimodal decode path: pure-stdlib PPM/PGM/BMP +
WAV codecs, driven both standalone and through the Arrow ``mapInPandas``
kernels, alongside the deterministic fake mode (contract: same schema,
FEAT_DIM features either way).

Reference parity note: the reference has no media layer at all; this is the
beyond-reference multimodal surface (SURVEY §2 extension), previously the
one 'partial' slot because real codecs were env-stubbed.
"""
import io
import struct
import wave

import numpy as np
import pytest

from flatbread_spark.functions import codecs


def _ppm_bytes(w, h, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return arr, codecs.encode_ppm(arr)


def _bmp_bytes(w, h, seed=1):
    """Hand-rolled uncompressed 24-bit bottom-up BMP with row padding."""
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    stride = (w * 3 + 3) & ~3
    raster = b""
    for row in rgb[::-1]:
        r = b"".join(bytes([p[2], p[1], p[0]]) for p in row)
        raster += r + b"\x00" * (stride - len(r))
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return rgb, hdr + info + raster


def _wav_bytes(seconds=0.5, rate=8000, freq=440):
    t = np.arange(int(rate * seconds)) / rate
    sig = (np.sin(2 * np.pi * freq * t) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(sig.tobytes())
    return sig, buf.getvalue()


# ---------------------------------------------------------------- standalone

def test_ppm_roundtrip_and_ascii():
    arr, ppm = _ppm_bytes(9, 13, seed=7)
    assert codecs.sniff_format(ppm) == "ppm"
    assert np.array_equal(codecs.decode_ppm(ppm), arr)
    p3 = ("P3\n# c\n3 2\n255\n" + " ".join(map(str, arr[:2, :3].ravel()))).encode()
    assert np.array_equal(codecs.decode_ppm(p3), arr[:2, :3])
    # PGM replicates gray to RGB
    g = codecs.decode_ppm(b"P5\n4 3\n255\n" + bytes(range(12)))
    assert g.shape == (3, 4, 3) and (g[..., 0] == g[..., 2]).all()


def test_bmp_decode_matches_source_pixels():
    rgb, bmp = _bmp_bytes(3, 2)  # odd width forces row padding
    assert codecs.sniff_format(bmp) == "bmp"
    assert np.array_equal(codecs.decode_bmp(bmp), rgb)


def test_wav_decode_and_features():
    _, wav = _wav_bytes(seconds=1.0)
    rate, nch, dur, samples = codecs.decode_wav(wav)
    assert (rate, nch, dur) == (8000, 1, 1000)
    feat = codecs.audio_features(rate, dur, samples)
    assert feat.shape == (codecs.FEAT_DIM,)
    # 0.61-amplitude sine: rms ≈ amp/sqrt(2) ≈ 0.432
    assert 0.40 < feat[1] < 0.46
    # envelope blocks of a steady tone are flat
    env = feat[4:]
    assert env.std() < 0.02


def test_resize_nearest_contract():
    arr, _ = _ppm_bytes(60, 100)
    small = codecs.resize_nearest(arr, 16, 16)
    assert small.shape == (16, 9, 3)  # aspect: 60/100 * 16 = 9.6 → 9
    assert codecs.resize_nearest(small, 64, 64) is small  # never upscales
    # every output pixel exists in the source (nearest, no interpolation)
    assert small.dtype == np.uint8


def test_unknown_format_raises():
    # GIF stays out of the stdlib-decodable set (PNG joined in r8,
    # baseline JPEG in r9)
    with pytest.raises(NotImplementedError, match="PNM"):
        codecs.decode_image(b"GIF89a" + b"\x00" * 16)


# ---------------------------------------------------------------- via Spark

def _asset_rows(spark, payloads):
    from flatbread_spark.operators.multimodal import ASSET_SCHEMA

    rows = [
        (i, modality, None, payload, (None, None, None, "test"))
        for i, (modality, payload) in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_extract_features_real_mode(spark):
    from flatbread_spark.operators.multimodal import extract_features

    img, ppm = _ppm_bytes(40, 30, seed=3)
    rgb, bmp = _bmp_bytes(5, 4)
    _, wav = _wav_bytes(seconds=0.25)
    assets = _asset_rows(
        spark, [("image", ppm), ("image", bmp), ("audio", wav)]
    )
    out = {r.asset_id: r for r in extract_features(assets, fake=False).collect()}
    assert len(out) == 3
    assert (out[0].width, out[0].height) == (40, 30)
    assert (out[1].width, out[1].height) == (5, 4)
    assert out[2].width is None and out[2].height is None
    for r in out.values():
        assert len(r.feat) == codecs.FEAT_DIM
        assert r.n_bytes > 0 and len(r.sha) == 64
    # image features reproduce the numpy-side computation exactly
    expect = codecs.image_features(img)
    assert np.allclose(out[0].feat, expect, atol=1e-6)


def test_extract_features_real_mode_unknown_format_fails(spark):
    from flatbread_spark.operators.multimodal import extract_features

    assets = _asset_rows(spark, [("image", b"GIF89a fake gif payload")])
    with pytest.raises(Exception, match="NotImplementedError|PNM"):
        extract_features(assets, fake=False).collect()


def test_resize_images_real_mode_roundtrip(spark):
    """Real resize: decode → nearest fit → re-encode PPM; the output payload
    is itself decodable and matches the numpy-side resize byte-for-byte."""
    from flatbread_spark.operators.multimodal import resize_images

    img, ppm = _ppm_bytes(100, 60, seed=5)
    rgb, bmp = _bmp_bytes(6, 4)
    assets = _asset_rows(spark, [("image", ppm), ("image", bmp)])
    out = {r.asset_id: r for r in
           resize_images(assets, max_w=16, max_h=16, fake=False).collect()}
    r0 = out[0]
    assert (r0.width, r0.height) == (16, 9)  # 100×60 fit into 16-box
    back = codecs.decode_ppm(bytes(r0.payload))
    assert np.array_equal(back, codecs.resize_nearest(img, 16, 16))
    # small image passes through un-upscaled, re-encoded
    r1 = out[1]
    assert (r1.width, r1.height) == (6, 4)
    assert np.array_equal(codecs.decode_ppm(bytes(r1.payload)), rgb)


def test_fake_and_real_modes_share_schema(spark, documents):
    """Contract pin: both modes produce identical schemas so downstream
    consumers (ANN over feat, dedup over sha) never branch on mode."""
    from flatbread_spark.operators.multimodal import (
        extract_features, synth_assets_from_documents,
    )

    synth = synth_assets_from_documents(documents.limit(5))
    fake_df = extract_features(synth, fake=True)
    _, ppm = _ppm_bytes(8, 8)
    real_df = extract_features(_asset_rows(spark, [("image", ppm)]), fake=False)
    assert fake_df.schema == real_df.schema
    fr = fake_df.collect()
    assert all(len(r.feat) == codecs.FEAT_DIM for r in fr)


def test_string_asset_ids_flow_through(spark):
    """asset_id type is derived from the input, not hardcoded bigint —
    URL-hash/UUID corpora carry string ids (same id-type discipline as
    fps_select/dedup_by_url, ADVICE r5)."""
    from flatbread_spark.operators.multimodal import (
        extract_features, resize_images,
    )

    _, ppm = _ppm_bytes(12, 8, seed=7)
    assets = spark.createDataFrame(
        [("doc/a#1", "image", ppm)],
        "asset_id string, modality string, payload binary",
    )
    feats = extract_features(assets, fake=False)
    assert dict(feats.dtypes)["asset_id"] == "string"
    assert feats.collect()[0].asset_id == "doc/a#1"
    resized = resize_images(assets, 4, 4, fake=False)
    assert dict(resized.dtypes)["asset_id"] == "string"
    assert resized.collect()[0].asset_id == "doc/a#1"


def test_sniff_ingest_mixed_directory_real_decode(spark, tmp_path):
    """End-to-end raw-file ingest: a MIXED media directory through the
    binaryFile source with magic-byte sniffing (JVM-side classification,
    no caller-supplied modality), then the REAL stdlib decode path —
    the full crawl-directory → features pipeline with no parquet
    intermediary."""
    from flatbread_spark.operators.multimodal import (
        extract_features,
        read_binary_assets,
    )

    img, ppm = _ppm_bytes(16, 12, seed=9)
    _, wav = _wav_bytes(seconds=0.25)
    (tmp_path / "a.ppm").write_bytes(ppm)
    (tmp_path / "b.wav").write_bytes(wav)
    (tmp_path / "c.bin").write_bytes(b"\x00" * 64)  # unclassifiable

    assets = read_binary_assets(spark, str(tmp_path), modality="sniff")
    rows = {r["meta"]["source"].rsplit("/", 1)[-1]: r for r in assets.collect()}
    assert rows["a.ppm"]["modality"] == "image"
    assert rows["a.ppm"]["mime"] == "image/x-portable-pixmap"
    assert rows["b.wav"]["modality"] == "audio"
    assert rows["b.wav"]["mime"] == "audio/wav"
    assert rows["c.bin"]["modality"] == "unknown"
    assert rows["c.bin"]["mime"] is None

    decodable = assets.filter("modality <> 'unknown'")
    feats = {
        r["modality"]: r
        for r in extract_features(decodable, fake=False).collect()
    }
    assert (feats["image"]["width"], feats["image"]["height"]) == (16, 12)
    assert feats["audio"]["width"] is None
    assert len(feats["image"]["feat"]) == codecs.FEAT_DIM


# ---------------------------------------------------------------- PNG (r8)

def _png_filtered(arr, filters, nchan=3, depth=8, plte=None, ctype=None):
    """Independent PNG writer: forward-filter each scanline with the given
    per-row filter types using per-pixel integer math (the spec's equations,
    not the decoder's numpy), so the decoder's unfilter path is pinned
    against a second implementation."""
    import zlib as _zlib

    h, w = arr.shape[0], arr.shape[1]
    if ctype is None:
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nchan]
    nbytes = depth // 8
    bpp = nchan * nbytes
    rows = []
    raster = arr.reshape(h, w * nchan)
    if depth == 16:
        expanded = np.zeros((h, w * nchan * 2), dtype=np.uint8)
        expanded[:, 0::2] = (raster >> 8).astype(np.uint8)
        expanded[:, 1::2] = (raster & 0xFF).astype(np.uint8)
        raster = expanded
    else:
        raster = raster.astype(np.uint8)
    prev = [0] * (w * bpp)
    for y in range(h):
        raw = [int(v) for v in raster[y]]
        f = filters[y % len(filters)]
        out = []
        for x in range(len(raw)):
            a = raw[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((raw[x] - pred) % 256)
        rows.append(bytes([f]) + bytes(out))
        prev = raw

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", _zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    body = codecs.PNG_MAGIC + chunk(b"IHDR", ihdr)
    if plte is not None:
        body += chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    return body + chunk(b"IDAT", _zlib.compress(b"".join(rows))) + chunk(b"IEND", b"")


def test_png_encode_decode_roundtrip():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    png = codecs.encode_png(arr)
    assert codecs.sniff_format(png) == "png"
    assert np.array_equal(codecs.decode_png(png), arr)
    gray = codecs.encode_png(arr, gray=True)
    assert np.array_equal(codecs.decode_png(gray), np.repeat(arr[:, :, :1], 3, axis=2))


def test_png_all_five_filters_rgb():
    """Every filter type (None/Sub/Up/Average/Paeth) unfilters exactly,
    pinned against an independent per-pixel forward filter."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(10, 7, 3), dtype=np.int64)
    png = _png_filtered(arr, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(codecs.decode_png(png), arr.astype(np.uint8))


def test_png_gray_and_alpha_variants():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, size=(6, 8, 1), dtype=np.int64)
    png_gray = _png_filtered(g, filters=[4, 3, 1], nchan=1)
    assert np.array_equal(
        codecs.decode_png(png_gray), np.repeat(g, 3, axis=2).astype(np.uint8)
    )
    ga = rng.integers(0, 256, size=(6, 8, 2), dtype=np.int64)
    png_ga = _png_filtered(ga, filters=[2, 4], nchan=2)
    assert np.array_equal(
        codecs.decode_png(png_ga),
        np.repeat(ga[:, :, :1], 3, axis=2).astype(np.uint8),
    )
    rgba = rng.integers(0, 256, size=(5, 5, 4), dtype=np.int64)
    png_rgba = _png_filtered(rgba, filters=[1, 2, 3, 4], nchan=4)
    assert np.array_equal(
        codecs.decode_png(png_rgba), rgba[:, :, :3].astype(np.uint8)
    )


def test_png_palette_and_16bit():
    rng = np.random.default_rng(7)
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.int64)
    idx = rng.integers(0, 16, size=(7, 9, 1), dtype=np.int64)
    png_pal = _png_filtered(idx, filters=[0, 2], nchan=1, plte=plte, ctype=3)
    assert np.array_equal(
        codecs.decode_png(png_pal), plte[idx[:, :, 0]].astype(np.uint8)
    )
    # 16-bit RGB: decoder keeps the high byte (the reference downsample)
    deep = rng.integers(0, 65536, size=(4, 6, 3), dtype=np.int64)
    png16 = _png_filtered(deep, filters=[1, 4], nchan=3, depth=16)
    assert np.array_equal(
        codecs.decode_png(png16), (deep >> 8).astype(np.uint8)
    )


def test_png_unsupported_raises_by_name():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    png = bytearray(codecs.encode_png(arr))
    # flip the interlace byte inside IHDR (offset: 8 sig + 8 hdr + 12th byte)
    png[8 + 8 + 12] = 1
    with pytest.raises(NotImplementedError, match="Adam7"):
        codecs.decode_png(bytes(png))
    with pytest.raises(ValueError, match="not a PNG"):
        codecs.decode_png(b"\x00" * 32)


def test_pbm_p4_and_p1_decode():
    """P1/P4 portable bitmaps (ADVICE r7: previously sniffed as unknown):
    1 = black per the spec, packed MSB-first for P4, run-together digits
    legal for P1."""
    bits = np.array(
        [[1, 0, 1, 0, 1, 1, 0, 0, 1], [0, 1, 1, 1, 0, 0, 0, 1, 0]],
        dtype=np.uint8,
    )
    packed = np.packbits(bits, axis=1).tobytes()
    p4 = b"P4\n9 2\n" + packed
    assert codecs.sniff_format(p4) == "pbm"
    want = np.repeat(np.where(bits == 1, 0, 255)[:, :, None], 3, axis=2)
    assert np.array_equal(codecs.decode_ppm(p4), want)
    assert np.array_equal(codecs.decode_image(p4), want)
    p1 = b"P1\n# comment\n9 2\n101011001\n0 1 1 1 0 0 0 1 0\n"
    assert codecs.sniff_format(p1) == "pbm"
    assert np.array_equal(codecs.decode_ppm(p1), want)


def test_png_through_arrow_kernel_real_mode(spark):
    """PNG payloads ride the real-mode mapInPandas decode stage end-to-end:
    width/height from IHDR, FEAT_DIM features, exact thumbnail stats."""
    from flatbread_spark.operators.multimodal import extract_features

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    rows = [(1, "image", "image/png", bytearray(codecs.encode_png(arr)), None)]
    from flatbread_spark.operators.multimodal import ASSET_SCHEMA

    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = extract_features(assets, fake=False).collect()[0]
    assert (out["width"], out["height"]) == (16, 12)
    feat = np.array(out["feat"], dtype=np.float32)
    assert np.allclose(feat[:2], [16 / 4096.0, 12 / 4096.0])
    assert np.allclose(feat[2:5], arr.reshape(-1, 3).mean(axis=0) / 255.0, atol=1e-6)


def test_sniff_keyword_and_literal_directory(spark, tmp_path):
    """ADVICE r7: sniff=True is the spelled-out switch; modality literals
    (including one literally named 'sniff' via sniff=False) stay literal;
    PNG and PBM files classify with their own mimes."""
    from flatbread_spark.operators.multimodal import read_binary_assets

    rng = np.random.default_rng(17)
    arr = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    (tmp_path / "a.png").write_bytes(codecs.encode_png(arr))
    bits = np.packbits(np.ones((4, 4), dtype=np.uint8), axis=1).tobytes()
    (tmp_path / "b.pbm").write_bytes(b"P4\n4 4\n" + bits)

    sniffed = {
        r["meta"]["source"].rsplit("/", 1)[-1]: r
        for r in read_binary_assets(spark, str(tmp_path), sniff=True).collect()
    }
    assert sniffed["a.png"]["mime"] == "image/png"
    assert sniffed["b.pbm"]["mime"] == "image/x-portable-bitmap"
    assert {v["modality"] for v in sniffed.values()} == {"image"}

    literal = read_binary_assets(
        spark, str(tmp_path), modality="sniff", sniff=False
    ).collect()
    assert {r["modality"] for r in literal} == {"sniff"}
    assert {r["mime"] for r in literal} == {None}


def test_png_property_sweep_random_images_and_filters():
    """Randomized PNG decode sweep: every (dims, channels, depth, per-row
    filter sequence) drawn below must round-trip exactly through the
    independent per-pixel forward filter — pins the unfilter recurrences
    at the boundary shapes (w=1: no left neighbor anywhere; h=1: no up
    row; bpp > stride never occurs but x < bpp always does)."""
    rng = np.random.default_rng(2024)
    for _ in range(40):
        h = int(rng.integers(1, 12))
        w = int(rng.integers(1, 12))
        nchan = int(rng.choice([1, 2, 3, 4]))
        depth = int(rng.choice([8, 16]))
        filters = rng.integers(0, 5, size=h).tolist()
        hi = 256 if depth == 8 else 65536
        arr = rng.integers(0, hi, size=(h, w, nchan), dtype=np.int64)
        png = _png_filtered(arr, filters=filters, nchan=nchan, depth=depth)
        got = codecs.decode_png(png)
        px = (arr >> 8) if depth == 16 else arr
        if nchan in (1, 2):
            want = np.repeat(px[:, :, :1], 3, axis=2)
        else:
            want = px[:, :, :3]
        assert np.array_equal(got, want.astype(np.uint8)), (
            h, w, nchan, depth, filters,
        )


# ---------------------------------------------------------------- JPEG (r9)

def _handcrafted_jpeg(coeff_stream_bits, qtable=None, dims=(8, 8)):
    """Independent minimal JPEG writer for analytic decode pins: one gray
    8x8-block image, trivial one-entry Huffman tables (DC size-5 = '0',
    AC EOB = '0'), quant table all ones unless given — built byte-by-byte
    from the T.81 segment layouts, sharing NOTHING with encode_jpeg."""
    h, w = dims
    qt = bytes(qtable if qtable is not None else [1] * 64)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qt
    out += b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, h, w, 1
    ) + bytes([1, 0x11, 0])
    # DC table 0: one symbol (size 5) with code '0'
    out += b"\xff\xc4" + struct.pack(">H", 20) + bytes([0x00]) + bytes(
        [1] + [0] * 15
    ) + bytes([5])
    # AC table 0: one symbol (EOB) with code '0'
    out += b"\xff\xc4" + struct.pack(">H", 20) + bytes([0x10]) + bytes(
        [1] + [0] * 15
    ) + bytes([0x00])
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    # entropy bits, MSB-first, padded with 1s
    bits = coeff_stream_bits + "1" * ((8 - len(coeff_stream_bits) % 8) % 8)
    out += bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_dc_only_handcrafted_analytic():
    """DC-only block, quant 1: every pixel = round(dc/8) + 128 — checked
    against a file built by an independent writer, not encode_jpeg."""
    # DC diff 24 -> size 5, value bits 11000; stream: '0' 11000 '0'(EOB)
    j = _handcrafted_jpeg("0" + "11000" + "0")
    out = codecs.decode_jpeg(j)
    assert out.shape == (8, 8, 3)
    assert np.all(out == 131)  # 128 + 24/8


def test_jpeg_single_ac_coefficient_analytic():
    """One AC coefficient (zigzag k=1 -> natural (0,1)): pixel[i][j] =
    128 + c * (1/sqrt(8)) * (1/2)cos((2j+1)pi/16) — the IDCT basis written
    out longhand here, independent of the decoder's matrix."""
    # stream: DC size5 value 0? size must be 5 per our table -> encode DC
    # diff = 16 ('10000'), then AC: we have only EOB in the AC table, so
    # extend the handcrafted tables instead: reuse DC table trick by
    # writing the AC coefficient through a custom table.
    # AC table with two symbols: (run0,size5)=0x05 -> code '0',
    # EOB -> code '10'
    h, w = 8, 8
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, h, w, 1
    ) + bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">H", 20) + bytes([0x00]) + bytes(
        [1] + [0] * 15
    ) + bytes([5])
    out += b"\xff\xc4" + struct.pack(">H", 21) + bytes([0x10]) + bytes(
        [1, 1] + [0] * 14
    ) + bytes([0x05, 0x00])
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    # DC diff 16 ('0'+'10000'), AC k=1 coeff 20 ('0'+'10100'), EOB ('10')
    bits = "0" + "10000" + "0" + "10100" + "10"
    bits += "1" * ((8 - len(bits) % 8) % 8)
    out += bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out += b"\xff\xd9"
    dec = codecs.decode_jpeg(bytes(out))
    base = 128.0 + 16.0 / 8.0  # DC contribution
    jj = np.arange(8)
    ac = 20.0 * (1.0 / np.sqrt(8.0)) * 0.5 * np.cos((2 * jj + 1) * np.pi / 16)
    expect = np.clip(np.rint(base + ac), 0, 255).astype(np.uint8)
    assert np.array_equal(dec[:, :, 0], np.tile(expect, (8, 1)))


def test_jpeg_roundtrip_flat_exact_and_gradient_close():
    flat = np.full((8, 8, 3), 119, dtype=np.uint8)
    assert np.array_equal(
        codecs.decode_jpeg(codecs.encode_jpeg(flat, quality=100)), flat
    )
    h, w = 24, 17  # non-multiple-of-8 dims exercise the crop
    g = (np.arange(h)[:, None] * 5 + np.arange(w)[None, :] * 3) % 200 + 20
    arr = np.stack([g] * 3, axis=2).astype(np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(arr, quality=95))
    assert out.shape == arr.shape
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 3


def test_jpeg_color_and_420_subsampling():
    arr = np.zeros((16, 16, 3), np.uint8)
    arr[:8, :8] = [200, 30, 30]
    arr[:8, 8:] = [30, 200, 30]
    arr[8:, :8] = [30, 30, 200]
    arr[8:, 8:] = [220, 220, 40]
    out = codecs.decode_jpeg(codecs.encode_jpeg(arr, quality=95))
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 3
    out420 = codecs.decode_jpeg(
        codecs.encode_jpeg(arr, quality=95, subsample=True)
    )
    # block-constant colors survive 2x2 chroma averaging almost exactly
    assert np.abs(out420.astype(int) - arr.astype(int)).max() <= 10


def test_jpeg_restart_intervals_bit_identical():
    """DRI/RSTn only re-segment the entropy stream — the decoded pixels
    must equal the unsegmented encode EXACTLY."""
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
    plain = codecs.decode_jpeg(codecs.encode_jpeg(arr, quality=85))
    for ri in (1, 3, 5):
        seg = codecs.decode_jpeg(
            codecs.encode_jpeg(arr, quality=85, restart_interval=ri)
        )
        assert np.array_equal(seg, plain)


def test_jpeg_randomized_roundtrip_sweep():
    """Randomized dims/content/quality/subsampling, mirroring the r8 PNG
    sweep: decoded output within JPEG-lossy tolerance of the source
    (mean abs error bounded; exact shape; uint8)."""
    rng = np.random.default_rng(123)
    for trial in range(8):
        h = int(rng.integers(5, 49))
        w = int(rng.integers(5, 49))
        # genuinely smooth content (scaled double cumsum, no wraparound
        # edges — a % fold creates per-channel chroma cliffs that JPEG
        # legitimately rings on; the color-block test covers hard edges)
        smooth = rng.integers(0, 6, (h, w, 3)).cumsum(axis=0).cumsum(axis=1)
        smooth = smooth.astype(np.float64) / max(smooth.max(), 1)
        arr = (smooth * 200).astype(np.uint8) + 20
        q = int(rng.choice([70, 85, 95]))
        sub = bool(rng.integers(0, 2))
        out = codecs.decode_jpeg(
            codecs.encode_jpeg(arr, quality=q, subsample=sub)
        )
        assert out.shape == (h, w, 3) and out.dtype == np.uint8
        err = np.abs(out.astype(int) - arr.astype(int)).mean()
        assert err < 6.0, (trial, h, w, q, sub, err)


def test_jpeg_gray_single_component():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, (19, 23), dtype=np.uint8)
    out = codecs.decode_jpeg(codecs.encode_jpeg(arr, quality=92, gray=True))
    assert out.shape == (19, 23, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.abs(out[:, :, 0].astype(int) - arr.astype(int)).mean() < 8.0


def test_jpeg_16bit_dqt_precision():
    """pq=1 (16-bit) quant tables decode identically to the 8-bit segment
    carrying the same values — rewrite the encoder's DQT in 16-bit form."""
    arr = np.full((8, 8, 3), 77, dtype=np.uint8)
    j = bytearray(codecs.encode_jpeg(arr, quality=90, gray=True))
    i = bytes(j).find(b"\xff\xdb")
    assert i >= 0
    vals = bytes(j[i + 5 : i + 5 + 64])
    wide = b"".join(struct.pack(">H", v) for v in vals)
    newseg = b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 128, 0x10) + wide
    j2 = bytes(j[:i]) + newseg + bytes(j[i + 69 :])
    assert np.array_equal(codecs.decode_jpeg(j2), codecs.decode_jpeg(bytes(j)))


def test_jpeg_unsupported_variants_raise_by_name():
    arr = np.full((8, 8, 3), 50, dtype=np.uint8)
    good = codecs.encode_jpeg(arr, quality=90)
    i = good.find(b"\xff\xc0")
    # progressive: SOF0 -> SOF2
    prog = good[:i] + b"\xff\xc2" + good[i + 2 :]
    with pytest.raises(NotImplementedError, match="progressive"):
        codecs.decode_jpeg(prog)
    # arithmetic: SOF0 -> SOF9
    arith = good[:i] + b"\xff\xc9" + good[i + 2 :]
    with pytest.raises(NotImplementedError, match="arithmetic"):
        codecs.decode_jpeg(arith)
    # 12-bit precision: patch the SOF precision byte
    deep = bytearray(good)
    deep[i + 4] = 12
    with pytest.raises(NotImplementedError, match="precision 12"):
        codecs.decode_jpeg(bytes(deep))


def test_jpeg_sniff_dispatch_and_spark_ingest(spark, tmp_path):
    """JPEG joins the sniffed-ingest set: magic classifies as image/jpeg,
    the real decode path extracts dimensions + features through the Arrow
    kernel, and decode_image dispatches by magic."""
    from flatbread_spark.operators.multimodal import (
        extract_features,
        read_binary_assets,
    )

    rng = np.random.default_rng(21)
    arr = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    j = codecs.encode_jpeg(arr, quality=90)
    assert codecs.sniff_format(j) == "jpeg"
    assert codecs.decode_image(j).shape == (24, 32, 3)

    (tmp_path / "x.jpg").write_bytes(j)
    assets = read_binary_assets(spark, str(tmp_path), modality="sniff")
    row = assets.collect()[0]
    assert row["modality"] == "image"
    assert row["mime"] == "image/jpeg"
    feat = extract_features(assets, fake=False).collect()[0]
    assert (feat["width"], feat["height"]) == (32, 24)
    assert len(feat["feat"]) == codecs.FEAT_DIM
    expect = codecs.image_features(codecs.decode_jpeg(j))
    assert np.allclose(feat["feat"], expect, atol=1e-6)


def test_jpeg_422_subsampling_decode():
    """4:2:2 (2x1 Y sampling) exercises the decoder's asymmetric-factor
    upsample path, which 4:4:4 and 4:2:0 miss."""
    arr = np.zeros((16, 24, 3), np.uint8)
    arr[:, :12] = [180, 60, 60]
    arr[:, 12:] = [60, 60, 180]
    j = codecs.encode_jpeg(arr, quality=95, subsample="422")
    out = codecs.decode_jpeg(j)
    assert out.shape == arr.shape
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 10
    # smooth content at 422 stays close too
    g = np.linspace(30, 220, 24).astype(np.uint8)
    sm = np.stack([np.tile(g, (16, 1))] * 3, axis=2)
    out2 = codecs.decode_jpeg(codecs.encode_jpeg(sm, quality=95, subsample="422"))
    assert np.abs(out2.astype(int) - sm.astype(int)).mean() < 3.0
    with pytest.raises(ValueError, match="subsample"):
        codecs.encode_jpeg(arr, subsample="444x")


def test_jpeg_skips_appn_and_comment_segments():
    """Real-world files carry EXIF/XMP/comment baggage before SOF — the
    marker walk must skip arbitrary APPn/COM segments untouched."""
    arr = np.full((8, 8, 3), 90, dtype=np.uint8)
    j = codecs.encode_jpeg(arr, quality=100)
    exif = b"\xff\xe1" + struct.pack(">H", 2 + 300) + b"Exif\x00\x00" + bytes(
        range(256)
    ) + b"\x00" * 38
    com = b"\xff\xfe" + struct.pack(">H", 2 + 11) + b"a comment\x00\x00"
    patched = j[:2] + exif + com + j[2:]
    assert np.array_equal(codecs.decode_jpeg(patched), codecs.decode_jpeg(j))
    assert codecs.sniff_format(patched) == "jpeg"
