"""Multimodal (image/audio/video) batch stages for ``map_batches``.

Media travel as opaque ``binary`` columns with typed metadata (the archive /
input-table schema: ``bytes, w, h, fmt``). Each stage is a callable class —
an actor pool member whose setup (codec dispatch tables, resampling kernels)
happens once in ``__init__`` — operating on zero-copy Arrow batches.

Codec support in this sandbox: ``png``/``bmp``/``lqi`` decode is REAL (in-repo
codecs, functions/codec.py). Formats needing external libraries (jpeg, webp,
audio, video frames) are stubbed behind ``NotImplementedError`` with the full
Ray-side plumbing (schema, batch shapes, actor signature) in place and tested,
as the environment has no PIL/cv2/ffmpeg.

Batch-size guidance at scale: these rows are wide (KB-MB of pixels); keep
``batch_size`` small (32-256) and rely on streaming backpressure + object
store spilling rather than large in-flight batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codec

_REAL_FORMATS = set(codec.FORMATS)
_STUB_FORMATS = {"jpeg", "jpg", "webp", "gif"}


def _decode_any(blob: bytes, fmt: str) -> np.ndarray:
    if fmt in _REAL_FORMATS:
        return codec.decode(blob, fmt)
    if fmt in _STUB_FORMATS:
        raise NotImplementedError(
            f"{fmt} decode requires an image library not present in this "
            "environment; plug a decoder into stages/multimodal._decode_any"
        )
    raise ValueError(f"unknown image format {fmt!r}")


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys][:, xs]


class DecodeImages:
    """bytes+fmt → decoded stats/pixels. ``emit_pixels=False`` (default)
    attaches per-image decode stats only — shipping raw pixel tensors through
    the object store is reserved for consumers that need them.

    ``compute_features=True`` fuses :class:`ImageFeatures`'s per-image
    features (phash / mean_rgb / contrast) into the same pass, so each blob
    is decoded ONCE — at media scale decode dominates the stage cost, and a
    separate features stage re-decoding every blob doubles it."""

    def __init__(self, emit_pixels: bool = False,
                 compute_features: bool = False):
        self.emit_pixels = emit_pixels
        self.compute_features = compute_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ok, mean_lum, decode_err = [], [], []
        pixels = []
        ph, means, stds = [], [], []
        for blob, fmt in zip(blobs, fmts):
            px = None
            if blob is None:
                ok.append(False)
                mean_lum.append(None)
                decode_err.append("null")
            else:
                try:
                    px = _decode_any(blob, fmt)
                    ok.append(True)
                    mean_lum.append(float(px.astype(np.float64).mean()))
                    decode_err.append("")
                except NotImplementedError:
                    px = None
                    ok.append(False)
                    mean_lum.append(None)
                    decode_err.append(f"stub:{fmt}")
                except Exception as e:  # corrupt blob → per-row error
                    px = None
                    ok.append(False)
                    mean_lum.append(None)
                    decode_err.append(f"error:{type(e).__name__}")
            pixels.append(px.tobytes() if (self.emit_pixels and px is not None)
                          else None)
            if self.compute_features:
                if px is None:
                    ph.append(None)
                    means.append(None)
                    stds.append(None)
                else:
                    ph.append(codec.phash(px))
                    means.append(float(px.mean()))
                    stds.append(float(px.astype(np.float64).mean(axis=2).std()))
        out = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        out = out.append_column("mean_luminance", pa.array(mean_lum, pa.float64()))
        out = out.append_column("decode_err", pa.array(decode_err, pa.string()))
        if self.emit_pixels:
            out = out.append_column("pixels_rgb8", pa.array(pixels, pa.binary()))
        if self.compute_features:
            out = out.append_column("phash_computed", pa.array(ph, pa.int64()))
            out = out.append_column("mean_rgb", pa.array(means, pa.float64()))
            out = out.append_column("contrast", pa.array(stds, pa.float64()))
        return out


class ResizeImages:
    """Decode → nearest-neighbour resize → re-encode (same fmt). Real for
    the in-repo codecs; preserves all metadata columns."""

    def __init__(self, out_h: int = 32, out_w: int = 32):
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        new_blobs, new_w, new_h = [], [], []
        for blob, fmt in zip(blobs, fmts):
            px = _decode_any(blob, fmt)
            small = resize_nearest(px, self.out_h, self.out_w)
            new_blobs.append(codec.encode(np.ascontiguousarray(small), fmt))
            new_h.append(self.out_h)
            new_w.append(self.out_w)
        out = batch.set_column(
            batch.schema.get_field_index("bytes"), "bytes",
            pa.array(new_blobs, pa.binary()),
        )
        out = out.set_column(out.schema.get_field_index("w"), "w",
                             pa.array(new_w, pa.int32()))
        out = out.set_column(out.schema.get_field_index("h"), "h",
                             pa.array(new_h, pa.int32()))
        return out


class ImageFeatures:
    """Per-image features for dedup/quality: phash (64-bit average hash),
    mean RGB, contrast (stddev of luminance).

    Prefer ``DecodeImages(compute_features=True)`` when a decode stage is
    already in the pipeline — it computes these in the same decode pass. As
    a standalone stage this consumes ``pixels_rgb8`` (from
    ``DecodeImages(emit_pixels=True)``) when present, decoding only as the
    fallback, so chaining the two stages never decodes a blob twice."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ph, means, stds = [], [], []
        if "pixels_rgb8" in batch.column_names:
            pix = batch["pixels_rgb8"].to_pylist()
            ws = batch["w"].to_pylist()
            hs = batch["h"].to_pylist()
            images = (
                None if buf is None else
                np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)
                for buf, w, h in zip(pix, ws, hs)
            )
        else:
            images = (
                _decode_any(blob, fmt)
                for blob, fmt in zip(batch["bytes"].to_pylist(),
                                     batch["fmt"].to_pylist())
            )
        for px in images:
            if px is None:
                ph.append(None)
                means.append(None)
                stds.append(None)
                continue
            ph.append(codec.phash(px))
            lum = px.astype(np.float64).mean(axis=2)
            means.append(float(px.mean()))
            stds.append(float(lum.std()))
        out = batch.append_column("phash_computed", pa.array(ph, pa.int64()))
        out = out.append_column("mean_rgb", pa.array(means, pa.float64()))
        out = out.append_column("contrast", pa.array(stds, pa.float64()))
        return out


def tile_embedding(px: np.ndarray, grid: int = 8) -> np.ndarray:
    """Deterministic image embedding for similarity search: grid×grid
    box-mean luminance tiles, mean-centered and L2-normalized (float64) —
    cosine over these is a brightness-offset-insensitive layout similarity.
    Stands in for a learned vision encoder (no model weights in this
    environment) with the same pipeline shape: decode → per-image vector →
    ANN. Requires min(h, w) ≥ grid."""
    lum = px.astype(np.float64).mean(axis=2)
    h, w = lum.shape
    if min(h, w) < grid:
        raise ValueError(f"image {h}x{w} smaller than tile grid {grid}")
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    cells = np.add.reduceat(
        np.add.reduceat(lum, ys[:-1], axis=0), xs[:-1], axis=1)
    counts = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    v = (cells / counts).ravel()
    v -= v.mean()
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class ImageTileEmbed:
    """Actor-pool stage: bytes+fmt → ``embedding`` (fixed grid²-dim
    list<double>) via one decode per blob. Emits only (image_id,
    embedding) — payload bytes never leave the actor (the no-double-
    transit rule), so the downstream ANN exchange moves ~0.5 KB/row
    regardless of image size."""

    def __init__(self, grid: int = 8):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, embs = [], []
        for image_id, blob, fmt in zip(batch["image_id"].to_pylist(),
                                       batch["bytes"].to_pylist(),
                                       batch["fmt"].to_pylist()):
            if blob is None:
                continue
            try:
                px = _decode_any(blob, fmt)
            except NotImplementedError:
                continue  # stub formats: no embedding (contract-tested)
            ids.append(image_id)
            embs.append(tile_embedding(px, self.grid))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "embedding": pa.array(embs, pa.list_(pa.float64())),
        })


class ImageStatsFused(DecodeImages):
    """Decode + features + narrow stats in ONE stage: the payload ``bytes``
    never re-enter the object store after decode (the CLAUDE.md no-double-
    transit rule) — only 4 narrow columns leave the actor."""

    def __init__(self):
        super().__init__(compute_features=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = super().__call__(batch)
        ok = pc.cast(t["decode_ok"], pa.int64())
        match = pc.cast(pc.equal(t["phash"], t["phash_computed"]), pa.int64())
        lum = pc.cast(pc.round(pc.multiply(t["mean_luminance"], 1000)),
                      pa.int64())
        return pa.table({"fmt": t["fmt"], "decoded": ok, "phash_match": match,
                         "lum_milli": lum})


def archive_image_features(out_dir: str, batch_size: int = 32,
                           concurrency: int = 2):
    """Compose the crawl archive with the multimodal stage: stream the
    archived pages' image payloads through the fused
    decode+features+stats pass and aggregate per format — the end-to-end
    crawl→curation hand-off.

    Reads only the needed columns from the archive fragments (bytes/fmt +
    identity/phash), keeps batches small (wide binary rows), and returns a
    per-format stats DataFrame: rows, decode successes, stored-vs-computed
    phash matches, mean luminance (milli-units, exact ints). An empty or
    absent archive yields an empty typed frame.
    """
    import os

    import pandas as pd
    from ray.data.aggregate import Count, Sum

    from ..sources import tableio

    empty = pd.DataFrame({
        "fmt": pd.Series([], dtype="object"),
        "n": pd.Series([], dtype="int64"),
        "n_decoded": pd.Series([], dtype="int64"),
        "n_phash_match": pd.Series([], dtype="int64"),
        "sum_lum_milli": pd.Series([], dtype="int64"),
    })
    base = os.path.join(out_dir, "archive")
    if not os.path.isdir(base):
        return empty
    parts = [os.path.join(base, d) for d in sorted(os.listdir(base))
             if d.startswith("round=")]
    if not parts:
        return empty
    datasets = [tableio.ray_dataset(p, columns=["url", "bytes", "fmt", "phash"])
                for p in parts]
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)
    stats = ds.map_batches(ImageStatsFused, batch_format="pyarrow",
                           batch_size=batch_size, concurrency=concurrency)
    out = (stats.groupby("fmt")
           .aggregate(Count(alias_name="n"),
                      Sum("decoded", alias_name="n_decoded"),
                      Sum("phash_match", alias_name="n_phash_match"),
                      Sum("lum_milli", alias_name="sum_lum_milli")))
    df = out.to_pandas()
    if len(df) == 0:
        return empty
    for c in ("n", "n_decoded", "n_phash_match", "sum_lum_milli"):
        df[c] = df[c].astype("int64")
    return df


class SampleVideoFrames:
    """STUB: frame sampling needs a video decoder (ffmpeg) absent here.
    The stage contract (binary column in, one row per sampled frame out) is
    what a real implementation plugs into."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video frame sampling requires ffmpeg, not present in this "
            "environment; the stage contract is: input (video_id:string, "
            "bytes:binary), output (video_id:string, frame_idx:int32, "
            "bytes:binary(fmt=png))"
        )
