"""Deterministic fixture tables (seed 42, pure numpy/stdlib — no external data).

``images`` is the input table from BASELINE.json's input_hint — columns
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)`` — doubling as the synthetic web's content
store. Ground-truth pixels are regenerable from the image index alone
(functions/codec.py), which is what the per-row archive invariant compares
against.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..functions import codec

IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def image_id_of(i: int) -> str:
    return f"img-{i:08d}"


def index_of_image_id(image_id: str) -> int:
    return int(image_id.split("-")[1])


def build_images_table(n: int, captions: list[str] | None = None) -> pa.Table:
    """The images input table. ``captions`` overrides the generated captions
    (used by ``entry()`` to derive captions from the sf0.001 documents table
    so the flagship pipeline genuinely consumes the driver's testdata)."""
    ids, blobs, ws, hs, fmts, caps, phashes = [], [], [], [], [], [], []
    for i in range(n):
        px = codec.gen_pixels(i)
        fmt = codec.fmt_of(i)
        ids.append(image_id_of(i))
        blobs.append(codec.encode(px, fmt))
        hs.append(px.shape[0])
        ws.append(px.shape[1])
        fmts.append(fmt)
        if captions is not None:
            caps.append(captions[i % len(captions)])
        else:
            caps.append(codec.gen_caption(i))
        phashes.append(codec.phash(px))
    return pa.table(
        {
            "image_id": ids,
            "bytes": blobs,
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": fmts,
            "caption": caps,
            "phash": pa.array(phashes, pa.int64()),
        },
        schema=IMAGES_SCHEMA,
    )


def cached_images_table(n: int, cache_dir: str = "/tmp/scraper_ray_cache") -> pa.Table:
    """Build-once-per-size images table cached as a parquet file (bench reuse)."""
    import pyarrow.parquet as pq

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"images_n{n}.parquet")
    if os.path.exists(path):
        return pq.read_table(path)
    t = build_images_table(n)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return t


def seed_urls(n_hosts: int = 8) -> list[str]:
    """Seed list with reference-normalisation edge cases
    (`/root/reference/worker/src/task.rs:71-117`, `defaultnormaliser.rs:131-211`):
    uppercase scheme/host, explicit default port, %-triplets, unsorted query +
    fragment, and duplicates of already-normalised forms (deduped at seed)."""
    seeds = [f"http://h{k}.test/" for k in range(n_hosts)]
    seeds += [
        "HTTP://H0.TEST:80/",  # dup of h0 after normalisation
        "http://h1.test/foo%2a",
        "http://h2.test/a?b=2&a=1#frag",
        "http://h3.test/",  # exact duplicate
    ]
    return seeds


def build_images_with_reencodes(n: int,
                                captions: list[str] | None = None) -> pa.Table:
    """``build_images_table(n)`` plus one RE-ENCODED variant per base image
    (each blob decoded and re-encoded in the next format of the
    png→bmp→lqi cycle) — a deterministic corpus with PLANTED image
    near-duplicates: a lossless re-encode has identical pixels (phash
    hamming 0), the lossy 'lqi' re-encode has PSNR≥40 pixels (near-zero
    hamming). Variant ids are ``<base_id>-re``; the stored ``phash`` column
    is the variant's true decoded-pixel phash. Input corpus for the
    image-dedup query and its brute-force oracle."""
    import numpy as np

    base = build_images_table(n, captions=captions)
    nxt = {"png": "bmp", "bmp": "lqi", "lqi": "png"}
    ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
    for i in range(base.num_rows):
        fmt = base["fmt"][i].as_py()
        px = codec.decode(base["bytes"][i].as_py(), fmt)
        nf = nxt[fmt]
        blob = codec.encode(np.ascontiguousarray(px), nf)
        ids.append(base["image_id"][i].as_py() + "-re")
        blobs.append(blob)
        hs.append(px.shape[0])
        ws.append(px.shape[1])
        fmts.append(nf)
        caps.append(base["caption"][i].as_py())
        phs.append(codec.phash(codec.decode(blob, nf)))
    variants = pa.table(
        {"image_id": ids, "bytes": blobs,
         "w": pa.array(ws, pa.int32()), "h": pa.array(hs, pa.int32()),
         "fmt": fmts, "caption": caps,
         "phash": pa.array(phs, pa.int64())},
        schema=IMAGES_SCHEMA,
    )
    return pa.concat_tables([base, variants])
