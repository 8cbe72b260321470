"""Codec round-trips and archive per-row invariants: lossless exact equality,
lossy PSNR ≥ 40 dB (BASELINE.json input_hint), phash/caption determinism."""

import numpy as np

from scraper_ray.functions import codec


def test_png_roundtrip_exact():
    for i in range(5):
        px = codec.gen_pixels(i)
        assert np.array_equal(codec.png_decode(codec.png_encode(px)), px)


def test_bmp_roundtrip_exact():
    for i in range(5):
        px = codec.gen_pixels(i * 7 + 1)
        assert np.array_equal(codec.bmp_decode(codec.bmp_encode(px)), px)


def test_lqi_psnr_at_least_40db():
    for i in range(8):
        px = codec.gen_pixels(i)
        out = codec.lqi_decode(codec.lqi_encode(px))
        assert codec.psnr(px, out) >= 40.0
        assert out.shape == px.shape


def test_encode_deterministic_across_calls():
    for fmt in codec.FORMATS:
        px = codec.gen_pixels(3)
        assert codec.encode(px, fmt) == codec.encode(px, fmt)


def test_gen_pixels_deterministic_and_distinct():
    a1, a2 = codec.gen_pixels(11), codec.gen_pixels(11)
    assert np.array_equal(a1, a2)
    hashes = {codec.phash(codec.gen_pixels(i)) for i in range(16)}
    assert len(hashes) >= 14  # phash distinct across images (allow rare collision)


def test_caption_deterministic():
    assert codec.gen_caption(5) == codec.gen_caption(5)
    assert codec.gen_caption(5) != codec.gen_caption(6)
    assert codec.gen_caption(7).startswith("caption 7: ")


def test_png_decode_filters_1_to_4():
    # our encoder emits filter 0 only; exercise the general unfilter paths by
    # re-encoding rows with each filter type manually
    import struct
    import zlib

    px = codec.gen_pixels(2)
    h, w, _ = px.shape
    stride = w * 3
    flat = px.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = y % 5
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            enc = line
        elif f == 1:
            a = np.concatenate([np.zeros(3, np.int32), line[:-3]])
            enc = (line - a) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            a = np.concatenate([np.zeros(3, np.int32), line[:-3]])
            enc = (line - (a + prev) // 2) % 256
        else:
            enc = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                aa = int(line[x - 3]) if x >= 3 else 0
                bb = int(prev[x])
                cc = int(prev[x - 3]) if x >= 3 else 0
                enc[x] = (int(line[x]) - codec._paeth(aa, bb, cc)) % 256
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        codec._PNG_SIG
        + codec._png_chunk(b"IHDR", ihdr)
        + codec._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codec._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(codec.png_decode(data), px)
