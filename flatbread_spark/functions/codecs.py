"""Pure-stdlib media codecs for the multimodal decode slot.

The container has no PIL/libsndfile/ffmpeg, so the multimodal kernels
(`operators/multimodal.py`) historically only ran with
``FLATBREAD_FAKE_DECODE=1``. This module gives ``FAKE_DECODE=0`` a real,
dependency-free path for one format per modality:

- images: PPM (``P6`` binary / ``P3`` ascii) and uncompressed 24/32-bit BMP,
  decoded with ``struct``/byte slicing into ``numpy`` ``(H, W, 3)`` uint8;
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

import numpy as np

FEAT_DIM = 32


# ---------------------------------------------------------------- sniffing

def sniff_format(payload: bytes | None) -> str | None:
    """Identify a payload by magic bytes: 'ppm' | 'pgm' | 'bmp' | 'wav' |
    None (unknown)."""
    if not payload or len(payload) < 12:
        return None
    if payload[:2] in (b"P6", b"P3"):
        return "ppm"
    if payload[:2] in (b"P5", b"P2"):
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------- PPM / PGM

def _pnm_header(payload: bytes):
    """Parse a PNM header (magic, dims, maxval), skipping ``#`` comments.
    Returns (magic, width, height, maxval, data_offset)."""
    tokens: list[bytes] = []
    i = 0
    n = len(payload)
    while len(tokens) < 4 and i < n:
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
    if len(tokens) < 4:
        raise ValueError("truncated PNM header")
    magic = tokens[0].decode("ascii")
    width, height, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if width <= 0 or height <= 0 or not (0 < maxval < 65536):
        raise ValueError(f"bad PNM dims {width}x{height} maxval {maxval}")
    # binary formats: exactly ONE whitespace byte after maxval, then raster
    return magic, width, height, maxval, i + 1


def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM/PGM → (H, W, 3) uint8. P6/P5 binary and P3/P2 ascii; maxval ≤ 255
    used as-is, wider maxvals scaled down. Grayscale replicates to RGB."""
    magic, w, h, maxval, off = _pnm_header(payload)
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
    if fmt in ("ppm", "pgm"):
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    raise NotImplementedError(
        f"image format {fmt or 'unknown'} needs PIL; "
        "supported stdlib formats: PPM/PGM/BMP"
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
