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
    # JPEG stays out of the stdlib-decodable set (PNG joined it in r8)
    with pytest.raises(NotImplementedError, match="PNM"):
        codecs.decode_image(b"\xff\xd8\xff\xe0\x00\x10JFIFrest-of-a-jpeg")


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

    assets = _asset_rows(spark, [("image", b"\xff\xd8\xff\xe0 fake jpeg")])
    with pytest.raises(Exception, match="NotImplementedError|PPM/PGM/BMP"):
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
