"""Pure-stdlib media codecs for the multimodal decode slot.

The container has no PIL/libsndfile/ffmpeg, so the multimodal kernels
(`operators/multimodal.py`) historically only ran with
``FLATBREAD_FAKE_DECODE=1``. This module gives ``FAKE_DECODE=0`` a real,
dependency-free path for one format per modality:

- images: PNM (``P1``–``P6``: bitmap/graymap/pixmap, ascii and binary),
  uncompressed 24/32-bit BMP, and non-interlaced PNG (gray/RGB/palette/
  alpha at 8- or 16-bit depth: stdlib ``zlib`` inflate + the five
  per-scanline unfilters), all into ``numpy`` ``(H, W, 3)`` uint8;
- audio: PCM WAV via the stdlib ``wave`` module (8/16/32-bit int frames).

Formats outside that set still raise ``NotImplementedError`` — the slot stays
honest about what it can decode — but the error now means "this payload's
format", not "any real decode at all".

Feature contract: both modalities emit exactly ``FEAT_DIM`` (32) float32
values so the real path is schema-compatible with the deterministic fake
(32 bytes of sha256 → 32 floats). Image layout:
``[w/4096, h/4096, mean_r, mean_g, mean_b, 3×3×3 RGB thumbnail]``;
audio layout: ``[log-duration, rms, zero-crossing rate, peak,
28-block RMS envelope]``. All math is vectorized numpy over the decoded
array — per-pixel Python loops would not survive real image sizes.

Everything here is row-local and driver-free: kernels call these per payload
inside Arrow batches; nothing shuffles, nothing collects.
"""
from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

FEAT_DIM = 32

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------- sniffing

def sniff_format(payload: bytes | None) -> str | None:
    """Identify a payload by magic bytes: 'ppm' | 'pgm' | 'pbm' | 'bmp' |
    'png' | 'wav' | None (unknown)."""
    if not payload or len(payload) < 2:
        return None
    if payload[:2] in (b"P6", b"P3"):
        return "ppm"
    if payload[:2] in (b"P5", b"P2"):
        return "pgm"
    # ADVICE r7: P1/P4 are the remaining portable-anymap magics — they must
    # sniff like their P2/P3/P5/P6 siblings, not fall through to unknown
    if payload[:2] in (b"P4", b"P1"):
        return "pbm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == PNG_MAGIC:
        return "png"
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------- PPM / PGM

def _pnm_header(payload: bytes):
    """Parse a PNM header (magic, dims, maxval), skipping ``#`` comments.
    Returns (magic, width, height, maxval, data_offset). PBM (P1/P4) has no
    maxval token — it reports maxval 1 and a 3-token header."""
    tokens: list[bytes] = []
    want = 3 if payload[:2] in (b"P1", b"P4") else 4
    i = 0
    n = len(payload)
    while len(tokens) < want and i < n:
        c = payload[i : i + 1]
        if c == b"#":  # comment to end of line
            while i < n and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < want:
        raise ValueError("truncated PNM header")
    magic = tokens[0].decode("ascii")
    width, height = int(tokens[1]), int(tokens[2])
    maxval = int(tokens[3]) if want == 4 else 1
    if width <= 0 or height <= 0 or not (0 < maxval < 65536):
        raise ValueError(f"bad PNM dims {width}x{height} maxval {maxval}")
    # binary formats: exactly ONE whitespace byte after the last header
    # token, then raster
    return magic, width, height, maxval, i + 1


def decode_ppm(payload: bytes) -> np.ndarray:
    """PNM → (H, W, 3) uint8. P6/P5 binary and P3/P2 ascii rasters; P4
    packed-bit and P1 ascii bitmaps (1 = black per the PBM spec); maxval
    ≤ 255 used as-is, wider maxvals scaled down. Gray replicates to RGB."""
    magic, w, h, maxval, off = _pnm_header(payload)
    if magic in ("P4", "P1"):
        if magic == "P4":
            stride = (w + 7) // 8  # each row starts on a byte boundary
            need = stride * h
            if len(payload) - off < need:
                raise ValueError("truncated P4 raster")
            packed = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
            bits = np.unpackbits(packed.reshape(h, stride), axis=1)[:, :w]
        else:
            # P1 digits may be run together ("0110") and interleaved with
            # comments — keep only the 0/1 bytes outside comment lines
            body = b"\n".join(
                line.split(b"#", 1)[0] for line in payload[off - 1 :].splitlines()
            )
            digits = np.frombuffer(body, dtype=np.uint8)
            digits = digits[(digits == 0x30) | (digits == 0x31)] - 0x30
            if digits.size < w * h:
                raise ValueError("truncated P1 raster")
            bits = digits[: w * h].reshape(h, w)
        arr = np.where(bits == 1, 0, 255).astype(np.uint8)  # 1 = black
        return np.repeat(arr[:, :, None], 3, axis=2)
    channels = 3 if magic in ("P6", "P3") else 1
    count = w * h * channels
    if magic in ("P6", "P5"):
        if maxval > 255:
            raw = np.frombuffer(payload, dtype=">u2", count=count, offset=off)
        else:
            raw = np.frombuffer(payload, dtype=np.uint8, count=count, offset=off)
    elif magic in ("P3", "P2"):
        raw = np.array(payload[off - 1 :].split()[:count], dtype=np.int64)
        if raw.size < count:
            raise ValueError("truncated ascii PNM raster")
    else:
        raise NotImplementedError(f"PNM magic {magic!r} not supported")
    if maxval != 255:
        raw = (raw.astype(np.float64) * 255.0 / maxval).round()
    arr = raw.astype(np.uint8).reshape(h, w, channels)
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary P6 PPM bytes."""
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


# ---------------------------------------------------------------- BMP

def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit bottom-up BMP → (H, W, 3) uint8 RGB.

    Handles the BITMAPINFOHEADER family (header size ≥ 40); rejects
    palettes, compression (BI_RLE*/BI_BITFIELDS beyond the identity masks)
    and other bit depths — those need a real imaging library.
    """
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression not in (0, 3) or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} not supported "
            "(only uncompressed 24/32-bit)"
        )
    if compression == 3:
        # BI_BITFIELDS: the R/G/B channel masks follow the info header
        # (offset 54 for both the 3-DWORD BITMAPINFOHEADER extension and
        # the V4/V5 bV4RedMask field). Only the identity BGRA layout is
        # decodable by the fixed `rows[:, :, 2::-1]` swizzle below —
        # anything else would silently swap channels (ADVICE r6).
        if bpp != 32 or len(payload) < 66:
            raise NotImplementedError(
                "BI_BITFIELDS BMP supported only at 32bpp with readable masks"
            )
        masks = struct.unpack_from("<III", payload, 54)
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise NotImplementedError(
                f"BI_BITFIELDS masks {tuple(hex(m) for m in masks)} are not "
                "the identity BGRA layout; needs a real imaging library"
            )
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dims {w}x{h_signed}")
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_off + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if h_signed > 0:  # bottom-up storage (the common case)
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, 2::-1])  # BGR(A) → RGB


# ---------------------------------------------------------------- PNG

def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk; stops at IEND. CRCs are not
    verified — a corrupt raster surfaces as a zlib/shape error anyway, and
    an ingest pipeline wants the decode attempt, not a checksum veto."""
    i = 8
    n = len(payload)
    while i + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        yield ctype, data
        if ctype == b"IEND":
            return
        i += 12 + length
    raise ValueError("PNG missing IEND")


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the per-scanline PNG filters → (h, stride) recon bytes.

    ``raw`` is the inflated stream reshaped to (h, 1 + stride): filter tag
    byte + filtered scanline. None/Up are whole-row vectorized; Sub is a
    per-byte-lane cumsum (mod-256 addition is associative, so cumsum % 256
    IS the sequential recurrence); Average/Paeth carry a true left
    dependency, so those rows walk x with all ``bpp`` lanes vectorized —
    row-local work inside an Arrow batch, never a driver loop."""
    ftypes = raw[:, 0]
    scan = raw[:, 1:].astype(np.int64)
    recon = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        row = scan[y]
        if f == 0:  # None
            cur = row
        elif f == 1:  # Sub
            pad = (-stride) % bpp
            lanes = np.concatenate([row, np.zeros(pad, dtype=np.int64)])
            lanes = lanes.reshape(-1, bpp)
            cur = (np.cumsum(lanes, axis=0) % 256).reshape(-1)[:stride]
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f in (3, 4):  # Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(0, stride, bpp):
                a = cur[x - bpp : x] if x >= bpp else np.zeros(bpp, dtype=np.int64)
                b = prev[x : x + bpp]
                seg = slice(x, min(x + bpp, stride))
                a = a[: seg.stop - seg.start]
                b = b[: seg.stop - seg.start]
                if f == 3:
                    cur[seg] = (row[seg] + (a + b) // 2) % 256
                else:
                    c = (
                        prev[x - bpp : x][: seg.stop - seg.start]
                        if x >= bpp
                        else np.zeros(seg.stop - seg.start, dtype=np.int64)
                    )
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    cur[seg] = (row[seg] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        recon[y] = cur
        prev = cur
    return recon.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Non-interlaced PNG → (H, W, 3) uint8 RGB.

    Supports color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA) at bit depth 8, plus 16-bit gray/RGB/alpha (high byte kept —
    the PNG 16→8 reference downsample). Alpha is dropped (features want
    color statistics, not compositing); palette indexes look up PLTE.
    Adam7 interlacing and sub-byte depths raise by name — honesty over a
    wrong raster."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_i, comp, filt, interlace = ihdr
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNG dims {w}x{h}")
    if comp != 0 or filt != 0:
        raise ValueError("bad PNG compression/filter method")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    nchan = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_i)
    if nchan is None:
        raise ValueError(f"bad PNG color type {ctype_i}")
    if depth not in (8, 16) or (ctype_i == 3 and depth != 8):
        raise NotImplementedError(
            f"PNG bit depth {depth} at color type {ctype_i} not supported "
            "(8-bit, and 16-bit for non-palette)"
        )
    nbytes = depth // 8
    bpp = nchan * nbytes
    stride = w * bpp
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("PNG raster size mismatch")
    recon = _png_unfilter(raw.reshape(h, 1 + stride), h, stride, bpp)
    px = recon.reshape(h, w, nchan, nbytes)[:, :, :, 0]  # 16-bit: high byte
    if ctype_i == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return np.ascontiguousarray(plte[px[:, :, 0]])
    if ctype_i in (0, 4):  # gray(+alpha) → replicate, drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])  # RGB(A) → drop alpha


def encode_png(arr: np.ndarray, gray: bool = False) -> bytes:
    """(H, W, 3) uint8 → minimal non-interlaced 8-bit PNG (filter 0 rows;
    ``gray=True`` writes color type 0 from channel 0). The write half of
    the ingest contract and the independent fixture for the decoder tests."""
    h, w = arr.shape[0], arr.shape[1]
    if gray:
        raster = np.ascontiguousarray(arr[:, :, 0])
        ctype = 0
    else:
        raster = np.ascontiguousarray(arr[:, :, :3], dtype=np.uint8)
        ctype = 2
    rows = raster.reshape(h, -1)
    scan = np.concatenate([np.zeros((h, 1), dtype=np.uint8), rows], axis=1)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- WAV

def decode_wav(payload: bytes):
    """PCM WAV → (sample_rate, n_channels, duration_ms, mono float32 in
    [-1, 1]). 8-bit unsigned and 16/32-bit signed little-endian frames."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        nframes = wf.getnframes()
        raw = wf.readframes(nframes)
    if width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {width} not supported")
    if nch > 1:
        samples = samples[: (len(samples) // nch) * nch].reshape(-1, nch).mean(axis=1)
    duration_ms = int(round(nframes * 1000.0 / rate)) if rate else 0
    return rate, nch, duration_ms, samples


# ---------------------------------------------------------------- features

def _thumbnail(arr: np.ndarray, grid: int = 3) -> np.ndarray:
    """(H, W, 3) → (grid, grid, 3) float32 block means (vectorized: pad-free
    per-block slicing via cumulative splits)."""
    h, w = arr.shape[0], arr.shape[1]
    ys = np.linspace(0, h, grid + 1, dtype=np.int64)
    xs = np.linspace(0, w, grid + 1, dtype=np.int64)
    out = np.empty((grid, grid, 3), dtype=np.float32)
    f = arr.astype(np.float32)
    for gy in range(grid):
        y0, y1 = ys[gy], max(ys[gy + 1], ys[gy] + 1)
        for gx in range(grid):
            x0, x1 = xs[gx], max(xs[gx + 1], xs[gx] + 1)
            out[gy, gx] = f[y0:y1, x0:x1].reshape(-1, 3).mean(axis=0)
    return out


def image_features(arr: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 → FEAT_DIM float32:
    [w/4096, h/4096, mean_r, mean_g, mean_b, 3×3 RGB thumbnail/255]."""
    h, w = arr.shape[0], arr.shape[1]
    means = arr.reshape(-1, 3).mean(axis=0) / 255.0
    thumb = (_thumbnail(arr, 3) / 255.0).ravel()
    return np.concatenate(
        [np.array([w / 4096.0, h / 4096.0], dtype=np.float32),
         means.astype(np.float32), thumb]
    ).astype(np.float32)


def audio_features(rate: int, duration_ms: int, samples: np.ndarray) -> np.ndarray:
    """Mono float samples → FEAT_DIM float32:
    [log10(1+dur_s), rms, zero-crossing rate, peak, 28-block RMS envelope]."""
    n = len(samples)
    if n == 0:
        return np.zeros(FEAT_DIM, dtype=np.float32)
    rms = float(np.sqrt(np.mean(samples * samples)))
    zcr = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1]))) if n > 1 else 0.0
    peak = float(np.max(np.abs(samples)))
    blocks = FEAT_DIM - 4
    edges = np.linspace(0, n, blocks + 1, dtype=np.int64)
    env = np.zeros(blocks, dtype=np.float32)
    sq = samples * samples
    csum = np.concatenate([[0.0], np.cumsum(sq)])
    for i in range(blocks):
        a, b = edges[i], max(edges[i + 1], edges[i] + 1)
        b = min(b, n)
        if b > a:
            env[i] = np.sqrt((csum[b] - csum[a]) / (b - a))
    head = np.array(
        [np.log10(1.0 + duration_ms / 1000.0), rms, zcr, peak], dtype=np.float32
    )
    return np.concatenate([head, env]).astype(np.float32)


# ---------------------------------------------------------------- top level

def decode_image(payload: bytes) -> np.ndarray:
    """Decode any supported image payload → (H, W, 3) uint8, else
    NotImplementedError naming the actual format."""
    fmt = sniff_format(payload)
    if fmt in ("ppm", "pgm", "pbm"):
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "png":
        return decode_png(payload)
    raise NotImplementedError(
        f"image format {fmt or 'unknown'} needs PIL; "
        "supported stdlib formats: PNM (P1-P6)/BMP/PNG"
    )


def resize_nearest(arr: np.ndarray, max_w: int, max_h: int) -> np.ndarray:
    """Aspect-preserving nearest-neighbor fit into (max_w, max_h); never
    upscales. Pure index-gather — no interpolation dependencies."""
    h, w = arr.shape[0], arr.shape[1]
    scale = min(max_w / w, max_h / h, 1.0)
    w1, h1 = max(1, int(w * scale)), max(1, int(h * scale))
    if (w1, h1) == (w, h):
        return arr
    yi = (np.arange(h1) * (h / h1)).astype(np.int64)
    xi = (np.arange(w1) * (w / w1)).astype(np.int64)
    return np.ascontiguousarray(arr[yi][:, xi])
