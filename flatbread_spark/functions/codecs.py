"""Pure-stdlib media codecs for the multimodal decode slot.

The container has no PIL/libsndfile/ffmpeg, so the multimodal kernels
(`operators/multimodal.py`) historically only ran with
``FLATBREAD_FAKE_DECODE=1``. This module gives ``FAKE_DECODE=0`` a real,
dependency-free path for one format per modality:

- images: PNM (``P1``–``P6``: bitmap/graymap/pixmap, ascii and binary),
  uncompressed 24/32-bit BMP, non-interlaced PNG (gray/RGB/palette/
  alpha at 8- or 16-bit depth: stdlib ``zlib`` inflate + the five
  per-scanline unfilters), and baseline sequential JPEG (SOF0/SOF1:
  Huffman decode + 8x8 IDCT + chroma upsample + JFIF color convert;
  progressive/arithmetic/12-bit/CMYK raise by name), all into ``numpy``
  ``(H, W, 3)`` uint8;
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
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
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


# ---------------------------------------------------------------- JPEG
#
# Baseline sequential JPEG (ITU-T T.81 / ISO 10918-1, the public spec):
# Huffman entropy decode -> dequantize -> 8x8 IDCT -> chroma upsample ->
# JFIF YCbCr->RGB. Handles SOF0/SOF1 frames, arbitrary DHT tables (canonical
# code reconstruction from the 16 length counts), 8- and 16-bit DQT
# precision, sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart
# intervals (DRI + RSTn), and 1- or 3-component scans. Raises BY NAME for
# progressive (SOF2), lossless/hierarchical (SOF3/5-7/11/13-15),
# arithmetic coding (SOF9/10 or a DAC marker), 12-bit precision, and
# 4-component (Adobe CMYK) images — honest boundaries, not stubs.
#
# Chroma upsampling contract: nearest (sample replication). libjpeg's
# default "fancy" triangular upsampling differs by at most a few code
# values on chroma edges — this decoder pins the simpler contract and the
# tests grade against it.
#
# The Huffman bit loop is per-symbol Python — the honest stdlib price; the
# block math (dequant/IDCT/upsample/color) is vectorized numpy over all
# blocks at once. Reference parity: the reference's ingest decodes media
# via system codec libraries; this slot re-expresses the same decode
# contract dependency-free (cf. reference media/decode fixtures).

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K base quantization tables (natural row order)
_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROM = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.int64,
)

# Annex K DC code-length counts (exercises multi-length canonical decode)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))


def _idct_matrix() -> np.ndarray:
    n = np.arange(8, dtype=np.float64)
    t = 0.5 * np.cos((2.0 * n[None, :] + 1.0) * n[:, None] * np.pi / 16.0)
    t[0, :] = 1.0 / np.sqrt(8.0)
    return t


_DCT_M = _idct_matrix()  # orthonormal DCT-II matrix: pixels = M.T @ C @ M


def _canonical_codes(bits, vals):
    """DHT (16 length counts + symbols) -> {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over a destuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy segment truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


_SOF_UNSUPPORTED = {
    0xC2: "progressive (SOF2)",
    0xC3: "lossless sequential (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic-coded sequential (SOF9)",
    0xCA: "arithmetic-coded progressive (SOF10)",
    0xCB: "arithmetic-coded lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _jpeg_segments(payload: bytes, start: int):
    """Split the post-SOS entropy stream into destuffed restart segments;
    returns (segments, end_pos). Stuffed 0xFF00 bytes become plain 0xFF;
    RSTn markers delimit segments; any other marker ends the scan."""
    segs, cur = [], bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # a real marker ends the entropy stream
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, 3) uint8 (grayscale replicated to 3
    channels). See the section comment for the supported surface; anything
    else raises NotImplementedError naming the actual variant."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    scan = None
    ri = 0
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            i += 1  # tolerate fill bytes
            continue
        m = payload[i + 1]
        if m in (0xFF, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2 if m != 0xFF else 1
            continue
        if m == 0xD9:  # EOI
            break
        length = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        seg = payload[i + 4 : i + 2 + length]
        if m in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG variant not supported: {_SOF_UNSUPPORTED[m]}"
            )
        if m == 0xCC:  # DAC
            raise NotImplementedError(
                "JPEG variant not supported: arithmetic coding (DAC)"
            )
        if m == 0xDB:  # DQT — possibly several tables per segment
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    vals = np.frombuffer(
                        seg[j : j + 128], dtype=">u2"
                    ).astype(np.int64)
                    j += 128
                else:
                    vals = np.frombuffer(
                        seg[j : j + 64], dtype=np.uint8
                    ).astype(np.int64)
                    j += 64
                qt[tq] = vals  # zigzag order, as stored
        elif m in (0xC0, 0xC1):  # SOF0/SOF1: Huffman sequential
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG sample precision {prec} not supported (8-bit only)"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG (CMYK/Adobe) not supported"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif m == 0xC4:  # DHT — possibly several tables per segment
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                (ac_tabs if tc else dc_tabs)[th] = _canonical_codes(bits, vals)
                j += 17 + nv
        elif m == 0xDD:  # DRI
            ri = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                sel[cs] = (tt >> 4, tt & 15)
            scan = sel
            i = i + 2 + length
            break
        i = i + 2 + length
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    segs, _ = _jpeg_segments(payload, i)
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError(
            f"JPEG sampling factors {hmax}x{vmax} > 2x2 not supported"
        )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # entropy-decode every block's 64 zigzag coefficients first (the
    # sequential Python part), then do ALL the math vectorized
    coeffs = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        for c in comps
    }
    preds = {c["id"]: 0 for c in comps}
    reader = _BitReader(segs[0])
    seg_idx = 0
    for m_i in range(mcux * mcuy):
        if ri and m_i and m_i % ri == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG restart segment missing")
            reader = _BitReader(segs[seg_idx])
            preds = {c["id"]: 0 for c in comps}
        my, mx = divmod(m_i, mcux)
        for c in comps:
            dct = dc_tabs[scan[c["id"]][0]]
            act = ac_tabs[scan[c["id"]][1]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, dtype=np.int64)
                    s = _huff_decode(reader, dct)
                    diff = _extend(reader.read_bits(s), s) if s else 0
                    preds[c["id"]] += diff
                    blk[0] = preds[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(reader, act)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        blk[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    coeffs[c["id"]][my * c["v"] + by, mx * c["h"] + bx] = blk

    planes = {}
    for c in comps:
        cz = coeffs[c["id"]]  # (by, bx, 64) zigzag ints
        deq = cz * qt[c["tq"]][None, None, :]
        nat = np.zeros_like(deq)
        nat[:, :, _ZIGZAG] = deq  # de-zigzag: stream i -> flat _ZIGZAG[i]
        blocks = nat.reshape(cz.shape[0], cz.shape[1], 8, 8)
        pix = np.einsum("ki,yxkl,lj->yxij", _DCT_M, blocks.astype(np.float64),
                        _DCT_M) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(
            cz.shape[0] * 8, cz.shape[1] * 8
        )
        # upsample to full MCU resolution, crop to the image
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes[c["id"]] = plane[:h, :w]

    if len(comps) == 1:
        g = np.clip(np.rint(planes[comps[0]["id"]]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = (planes[c["id"]] for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def pad(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _encode_tables(bits, vals):
    """(bits, vals) -> {symbol: (code, length)} for the bit writer."""
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


# AC symbol set: (run 0-15) << 4 | (size 1-10), plus EOB (0x00) and ZRL
# (0xF0) — 162 symbols, written as a fixed-8-bit canonical code. The DHT
# segment carries the table, so any valid prefix code decodes everywhere;
# fixed-length keeps this encoder honest about what it is (a test/fixture
# generator, not a compressor).
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0] * 16
_AC_BITS[7] = 94   # 8-bit codes: 0..93
_AC_BITS[8] = 68   # 9-bit codes: the rest (94+68 = 162; all-ones unused)


def _quality_tables(quality: int):
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QT_LUM, _QT_CHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    gray: bool = False,
    subsample: "bool | str" = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder for tests/fixtures: Annex-K quality-scaled
    quant tables, Annex-K DC Huffman tables + fixed-length canonical AC
    tables (self-describing via DHT), optional chroma subsampling
    (``True``/``"420"`` = 2x2, ``"422"`` = 2x1 horizontal) and restart
    intervals. Accepts (H, W, 3) uint8 (or any (H, W[, C]) — first
    channel used when ``gray``)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w = a.shape[0], a.shape[1]
    if gray or a.shape[2] == 1:
        comps_px = [a[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        tqs = [0]
    else:
        rf, gf, bf = (a[:, :, k].astype(np.float64) for k in range(3))
        yp = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = 128.0 - 0.168736 * rf - 0.331264 * gf + 0.5 * bf
        cr = 128.0 + 0.5 * rf - 0.418688 * gf - 0.081312 * bf
        mode = "420" if subsample is True else subsample
        if mode == "420":
            # pad to even, 2x2 box-average the chroma
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def pad2(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = pad2(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad2(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif mode == "422":
            # pad width to even, 2:1 horizontal chroma average
            pw = -(-w // 2) * 2
            def padw(p):
                return np.pad(p, ((0, 0), (0, pw - w)), mode="edge")
            cb = padw(cb).reshape(h, pw // 2, 2).mean(axis=2)
            cr = padw(cr).reshape(h, pw // 2, 2).mean(axis=2)
            samp = [(2, 1), (1, 1), (1, 1)]
        elif not mode:
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unknown subsample mode {subsample!r}")
        comps_px = [yp, cb, cr]
        tqs = [0, 1, 1]

    qts = _quality_tables(quality)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component quantized zigzag blocks, MCU-interleaved order
    comp_blocks = []
    for px, (sh, sv), tq in zip(comps_px, samp, tqs):
        bw, bh = mcux * sh, mcuy * sv  # block grid dims
        padded = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        ph, pw = px.shape
        padded[:ph, :pw] = px
        padded[ph:, :pw] = px[-1:, :]  # edge replicate
        padded[:, pw:] = padded[:, pw - 1 : pw]
        blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        coef = np.einsum("ik,yxkl,jl->yxij", _DCT_M, blocks, _DCT_M)
        qz = np.rint(
            coef.reshape(bh, bw, 64)[:, :, _ZIGZAG]
            / qts[tq][_ZIGZAG][None, None, :]  # both in zigzag stream order
        ).astype(np.int64)
        comp_blocks.append(qz)

    dc_enc = [
        _encode_tables(_DC_LUM_BITS, _DC_VALS),
        _encode_tables(_DC_CHROM_BITS, _DC_VALS),
    ]
    ac_enc = _encode_tables(_AC_BITS, _AC_SYMBOLS)

    def put_block(bw_, blk, pred, dct, act):
        diff = int(blk[0]) - pred
        size = abs(diff).bit_length()
        code, ln = dct[size]
        bw_.write(code, ln)
        if size:
            v = diff if diff >= 0 else diff + (1 << size) - 1
            bw_.write(v, size)
        run = 0
        last_nz = 0
        nz = np.nonzero(blk[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = act[0xF0]
                bw_.write(code, ln)
                run -= 16
            size = abs(v).bit_length()
            code, ln = act[(run << 4) | size]
            bw_.write(code, ln)
            vv = v if v >= 0 else v + (1 << size) - 1
            bw_.write(vv, size)
            run = 0
        if last_nz < 63:
            code, ln = act[0x00]
            bw_.write(code, ln)
        return int(blk[0])

    bw_ = _BitWriter()
    preds = [0] * len(comps_px)
    body = bytearray()
    rst = 0
    for m_i in range(mcux * mcuy):
        if restart_interval and m_i and m_i % restart_interval == 0:
            bw_.pad()
            body += bw_.out
            body += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw_ = _BitWriter()
            preds = [0] * len(comps_px)
        my, mx = divmod(m_i, mcux)
        for ci, ((sh, sv), qz) in enumerate(zip(samp, comp_blocks)):
            for by in range(sv):
                for bx in range(sh):
                    preds[ci] = put_block(
                        bw_, qz[my * sv + by, mx * sh + bx], preds[ci],
                        dc_enc[min(ci, 1)], ac_enc,
                    )
    bw_.pad()
    body += bw_.out

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)
    for tq, t in enumerate(qts[: max(tqs) + 1]):
        z = t[_ZIGZAG]  # natural order -> zigzag stream order
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(x) for x in z
        )
    ncomp = len(comps_px)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, ((sh, sv), tq) in enumerate(zip(samp, tqs)):
        sof += bytes([ci + 1, (sh << 4) | sv, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc_th, bits, vals in (
        ((0, 0), _DC_LUM_BITS, _DC_VALS),
        ((0, 1), _DC_CHROM_BITS, _DC_VALS),
        ((1, 0), _AC_BITS, _AC_SYMBOLS),
        ((1, 1), _AC_BITS, _AC_SYMBOLS),
    ):
        payload = bytes([(tc_th[0] << 4) | tc_th[1]]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += body
    out += b"\xff\xd9"
    return bytes(out)


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
    if fmt == "jpeg":
        return decode_jpeg(payload)
    raise NotImplementedError(
        f"image format {fmt or 'unknown'} needs PIL; "
        "supported stdlib formats: PNM (P1-P6)/BMP/PNG/baseline JPEG"
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
