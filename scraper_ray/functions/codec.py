"""In-repo image codecs and deterministic pixel/caption generation.

No PIL/cv2 in this environment, so the codecs are implemented from scratch on
stdlib ``zlib``/``struct`` + numpy (bit-deterministic across processes — pure
integer ops only):

- ``png``  — real PNG (8-bit RGB, zlib, scanline filter 0 on encode; decoder
  handles filters 0-4), lossless: decode must equal ground truth exactly.
- ``bmp``  — 24-bit uncompressed BMP (BGR, bottom-up, 4-byte row padding),
  lossless.
- ``lqi``  — "low-quality image": deterministic lossy codec (6-bit uniform
  quantization per channel + zlib). Max per-sample error ±2 ⇒ PSNR ≥ ~45 dB,
  satisfying the ≥40 dB archive invariant for lossy formats.

These feed the crawl archive's per-row invariant (BASELINE.json input_hint:
"decoded-pixel allclose (PSNR≥40dB for lossy) + caption equality"): the ground
truth pixels are regenerable from the image index alone, standing in for
"decode by the Rust reference" (the reference itself archives nothing — its
Archive impl is Void, worker/src/void.rs:7-11; image payloads are the graft
axis).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("png", "bmp", "lqi")

# ---------------------------------------------------------------------------
# PNG


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(tag + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(px: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) → PNG bytes, filter type 0 per scanline."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # bitdepth 8, colour 2 (RGB)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, colour, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or colour != 2 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    if not ftypes.any():  # all filter 0 — our own encoder's fast path
        out[:] = rows[:, 1:]
        return out.reshape(h, w, 3)
    bpp = 3
    for y in range(h):
        f = int(ftypes[y])
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth are sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                else:
                    cur[x] = (line[x] + _paeth(a, b, cc)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)


def bmp_encode(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    bgr = px[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return header + info + rows.tobytes()


def bmp_decode(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    size, w, h, planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    if bpp != 24:
        raise ValueError("unsupported BMP bpp")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    rows = np.frombuffer(
        data, dtype=np.uint8, count=(row_bytes + pad) * abs(h), offset=offset
    ).reshape(abs(h), row_bytes + pad)
    bgr = rows[:, :row_bytes].reshape(abs(h), w, 3)
    if h > 0:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


# ---------------------------------------------------------------------------
# LQI — deterministic lossy codec

_LQI_MAGIC = b"LQI1"


def lqi_encode(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    q = ((px.astype(np.uint32) * 63 + 127) // 255).astype(np.uint8)  # round(v*63/255)
    return _LQI_MAGIC + struct.pack("<II", w, h) + zlib.compress(q.tobytes(), 6)


def lqi_decode(data: bytes) -> np.ndarray:
    if data[:4] != _LQI_MAGIC:
        raise ValueError("not LQI")
    w, h = struct.unpack_from("<II", data, 4)
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    return ((q.astype(np.uint32) * 255 + 31) // 63).astype(np.uint8)  # round(q*255/63)


# ---------------------------------------------------------------------------
# dispatch + metrics

_ENCODERS = {"png": png_encode, "bmp": bmp_encode, "lqi": lqi_encode}
_DECODERS = {"png": png_decode, "bmp": bmp_decode, "lqi": lqi_decode}


def encode(px: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](px)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash(px: np.ndarray) -> int:
    """64-bit average-hash of the 8×8 block-mean of the grayscale image.

    Enables Hamming-distance near-dup over the archive (the ``phash:int64``
    input column). Signed int64 (two's complement view of the bit pattern).
    """
    gray = px.astype(np.uint32).sum(axis=2) // 3
    h, w = gray.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    ye = np.append(ys[1:], h)
    xe = np.append(xs[1:], w)
    small = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            small[i, j] = gray[ys[i] : ye[i], xs[j] : xe[j]].mean()
    bits = (small > small.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for k in range(64):
        val = (val << np.uint64(1)) | bits[k]
    return int(val.view(np.int64))


# ---------------------------------------------------------------------------
# deterministic ground-truth content (regenerable from the image index alone)

from .hashing import _splitmix_fin  # noqa: E402

_SIZES = (16, 24, 32, 48, 64, 96, 128)

_VOCAB = (
    "arrow batch block shard crawl frontier fetch parse link host queue token "
    "bucket robot page image pixel caption stream spill merge hash bloom cuckoo "
    "filtre ensō 데이터 поток 数据 zürich ångström naïve"
).split()


def image_index_seed(i: int) -> int:
    return _splitmix_fin((i * 0x9E3779B97F4A7C15 + 0x243F6A8885A308D3) & ((1 << 64) - 1))


def gen_pixels(i: int) -> np.ndarray:
    """Ground-truth RGB pixels for image index ``i``: gradients + seeded noise."""
    s = image_index_seed(i)
    h = _SIZES[s % len(_SIZES)]
    w = _SIZES[(s >> 8) % len(_SIZES)]
    rng = np.random.Generator(np.random.PCG64(s))
    yy, xx = np.mgrid[0:h, 0:w]
    # per-image random plane-wave gradients so images are structurally distinct
    # (distinct phash), plus seeded noise
    coef = rng.integers(-4, 5, size=(3, 2))
    off = rng.integers(0, 256, size=3)
    base = np.stack(
        [coef[c, 0] * xx + coef[c, 1] * yy + off[c] for c in range(3)], axis=2
    ).astype(np.int32) % 256
    noise = rng.integers(-24, 25, size=(h, w, 3), dtype=np.int32)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def gen_caption(i: int) -> str:
    s = image_index_seed(i ^ 0x5DEECE66D)
    rng = np.random.Generator(np.random.PCG64(s))
    n = int(rng.integers(5, 21))
    words = [_VOCAB[int(k)] for k in rng.integers(0, len(_VOCAB), size=n)]
    return f"caption {i}: " + " ".join(words)


def fmt_of(i: int) -> str:
    return FORMATS[i % len(FORMATS)]
