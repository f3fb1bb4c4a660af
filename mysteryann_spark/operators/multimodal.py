"""Multimodal column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
pattern the reference's WebVid pipeline applies outside the engine
(prepare_for_clip_webvid.py:50-129: fetch tars -> per-frame CLIP embeddings
-> L2-normalize -> mean-pool -> re-normalize). The Spark-side plumbing
(schemas, Arrow batch shapes, partitioning) is real and tested, and
``real_decode=True`` now carries a REAL pure-numpy decoder for two honest
wire formats — binary PPM (P6) and uncompressed 24-bit BMP — so the decode
seam is exercised end-to-end on actual image bytes. Codec formats needing
external libraries (JPEG/PNG/H.264) remain out of scope for this container;
they would slot into ``decode_image``'s dispatch.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_md5", StringType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: text bytes as payload, metadata
    derived arithmetically. Stands in for a real binary ingest so every
    downstream op has a concrete input at all SFs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.concat(F.lit("fake/"), F.col("source")).alias("mime"),
        (F.lit(16) + F.col("n_chars") % 32).cast("int").alias("width"),
        (F.lit(16) + F.col("doc_id") % 16).cast("int").alias("height"),
        (F.lit(1) + F.col("doc_id") % 4).cast("int").alias("n_frames"),
    )


def _parse_ppm(data: bytes):
    """Binary PPM (P6) -> (h, w, 3) uint8 array. Pure numpy; handles
    comments and arbitrary whitespace in the header per the netpbm spec."""
    import numpy as np

    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 ints (width, height, maxval), '#' comments allowed
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def _parse_bmp(data: bytes):
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 RGB array. Handles the
    standard BITMAPINFOHEADER layout: bottom-up rows, 4-byte row padding,
    BGR channel order on the wire."""
    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    raster = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=pixel_off)
    rows = raster.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_image(data: bytes):
    """Dispatch decode on magic bytes: P6 PPM or 24-bit BMP -> (h, w, 3)
    uint8 RGB. The seam where external-codec formats would plug in."""
    if data[:2] == b"P6":
        return _parse_ppm(data)
    if data[:2] == b"BM":
        return _parse_bmp(data)
    raise ValueError(f"unsupported image magic {data[:2]!r}")


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6) bytes."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_bmp(arr) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP bytes."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    raster[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    body = raster.tobytes()
    info = (
        (40).to_bytes(4, "little") + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little") + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    header = b"BM" + (14 + 40 + len(body)).to_bytes(4, "little") + b"\0\0\0\0" + (
        14 + 40
    ).to_bytes(4, "little")
    return header + info + body


def synth_real_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic REAL image table: each doc becomes an actual encoded
    PPM (even ids) or BMP (odd ids) payload whose pixels are a pure
    function of (doc_id, n_chars) — real wire bytes for the real decoder,
    no external library, reproducible at any SF."""
    import numpy as np

    def _make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("media_id", "payload", "mime", "width", "height", "n_frames")}
            for did, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                did, n_chars = int(did), int(n_chars)
                w = 8 + (n_chars % 17)
                h = 8 + (did % 11)
                pix = (
                    (np.arange(h * w * 3, dtype=np.int64) * 31 + did * 131 + 7) % 256
                ).astype(np.uint8).reshape(h, w, 3)
                payload = encode_ppm(pix) if did % 2 == 0 else encode_bmp(pix)
                out["media_id"].append(did)
                out["payload"].append(payload)
                out["mime"].append("image/x-portable-pixmap" if did % 2 == 0 else "image/bmp")
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(1)
            yield pd.DataFrame(out)

    return docs.select("doc_id", "n_chars").mapInPandas(_make, MEDIA_SCHEMA)


def decode_frames(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Frame-sample each payload: one output row per (media, frame).

    ``real_decode=True`` runs the REAL pure-numpy image decoder
    (decode_image: P6 PPM / 24-bit BMP) on each payload and fingerprints
    the DECODED RGB pixel buffer — one frame per still image, n_bytes =
    decoded raster size. The fake path is deterministic (md5 of raw
    payload + frame index, one row per claimed frame) and exercises the
    same mapInPandas batch shape: binary column in, exploded typed rows
    out, one Arrow batch at a time.
    """
    if real_decode:

        def _real_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {c: [] for c in ("media_id", "frame_idx", "frame_md5", "n_bytes")}
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    pixels = decode_image(bytes(payload))
                    out["media_id"].append(mid)
                    out["frame_idx"].append(0)
                    out["frame_md5"].append(hashlib.md5(pixels.tobytes()).hexdigest())
                    out["n_bytes"].append(pixels.nbytes)
                yield pd.DataFrame(out)

        return media.select("media_id", "payload").mapInPandas(
            _real_decode_batch, _DECODE_SCHEMA
        )

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("media_id", "frame_idx", "frame_md5", "n_bytes")}
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                data = bytes(payload)
                for fi in range(int(n_frames)):
                    h = hashlib.md5(data + fi.to_bytes(4, "little")).hexdigest()
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["frame_md5"].append(h)
                    out["n_bytes"].append(len(data))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload", "n_frames").mapInPandas(
        _decode_batch, _DECODE_SCHEMA
    )


_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_pixels", LongType(), False),
        StructField("mean_r_micro", LongType(), False),
        StructField("mean_g_micro", LongType(), False),
        StructField("mean_b_micro", LongType(), False),
        StructField("grad_energy", LongType(), False),
    ]
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Feature-extract DECODED rasters: per-channel means and gradient
    energy (sum |flat[i+3] - flat[i]| over the row-major RGB buffer — a
    1-D Sobel-lite texture statistic). Runs the real PPM/BMP decoder on
    every payload; because the synthetic rasters follow the exact integer
    formula pix[i] = (i*31 + id*131 + 7) mod 256, a DuckDB oracle
    recomputes every output from generate_series without seeing a byte —
    so the decode + feature math is hash-verified end-to-end.

    Scale: pure Arrow-batched map, no shuffle; means are exact (integer
    sums < 2^53) and emitted as floor(mean * 1e6) micro-unit BIGINTs —
    floor of an identical IEEE double is tie-free across engines, unlike
    round()'s half-even (Python) vs half-away (DuckDB) split."""
    import numpy as np

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in _FEATURES_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_image(bytes(payload))
                flat = arr.reshape(-1).astype(np.int64)
                out["media_id"].append(mid)
                out["n_pixels"].append(arr.shape[0] * arr.shape[1])
                out["mean_r_micro"].append(int(np.floor(arr[:, :, 0].mean() * 1e6)))
                out["mean_g_micro"].append(int(np.floor(arr[:, :, 1].mean() * 1e6)))
                out["mean_b_micro"].append(int(np.floor(arr[:, :, 2].mean() * 1e6)))
                out["grad_energy"].append(int(np.abs(flat[3:] - flat[:-3]).sum()))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(_feat, _FEATURES_SCHEMA)


def resize_bilinear(arr, out_h: int, out_w: int):
    """(h, w, 3) uint8 -> (out_h, out_w, 3) uint8 bilinear resize with
    half-pixel centers (the align_corners=False convention used by ML
    preprocessing). Pure vectorized numpy — no loops over pixels."""
    import numpy as np

    h, w, _ = arr.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = arr[np.ix_(y0, x0)].astype(np.float64)
    b = arr[np.ix_(y0, x1)].astype(np.float64)
    c = arr[np.ix_(y1, x0)].astype(np.float64)
    d = arr[np.ix_(y1, x1)].astype(np.float64)
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("out_w", IntegerType(), False),
        StructField("out_h", IntegerType(), False),
        StructField("resized_md5", StringType(), False),
        StructField("resized_mean", DoubleType(), False),
    ]
)


def resize_images(media: DataFrame, out_h: int = 12, out_w: int = 12) -> DataFrame:
    """Decode -> bilinear-resize to a fixed shape -> fingerprint: the
    uniform-shape preprocessing step every vision pipeline runs before
    batching into a model. Not SQL-expressible (interpolation) —
    registered rows-only; interpolation invariants (constant images stay
    constant, identity resize is exact, means are preserved within
    rounding) are gated in tests."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in _RESIZE_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = resize_bilinear(decode_image(bytes(payload)), out_h, out_w)
                out["media_id"].append(mid)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["resized_md5"].append(hashlib.md5(arr.tobytes()).hexdigest())
                out["resized_mean"].append(round(float(arr.mean()), 6))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(_resize, _RESIZE_SCHEMA)


def mean_pool_embeddings(
    emb: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    normalize_rows: bool = True,
) -> DataFrame:
    """Group-wise clip4clip mean-pool (the WebVid per-video pooling,
    prepare_for_clip_webvid.py:88-101): L2-normalize EACH ROW first
    (zero-norm rows pass through, norm clamped to 1 — the reference's
    ``matrix_norm[matrix_norm == 0] = 1`` guard), mean the normalized
    rows, then L2-renormalize the pooled vector. Pure DataFrame algebra:
    per-row norm -> posexplode -> per-(group, pos) avg (map-side
    combined) -> renormalize. ``normalize_rows=False`` gives the raw
    variant (pool unnormalized rows, renormalize once) for callers whose
    inputs are already unit-norm. Returns (group, n, pooled
    ARRAY<DOUBLE>)."""
    xs = F.transform(vec_col, lambda x: x.cast("double"))
    if normalize_rows:
        rnorm_raw = F.sqrt(
            F.aggregate(F.transform(xs, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
        )
        rnorm = F.when(rnorm_raw == 0.0, F.lit(1.0)).otherwise(rnorm_raw)
        xs = F.transform(xs, lambda x: x / rnorm)
    means = (
        emb.select(group_col, F.posexplode(xs).alias("pos", "x"))
        .groupBy(group_col, "pos")
        .agg(F.avg("x").alias("m"))
    )
    pooled = (
        means.groupBy(group_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"),
        )
        .select(
            group_col,
            F.transform("pm", lambda s: s["m"]).alias("mean_vec"),
        )
    )
    norm = F.sqrt(
        F.aggregate(F.transform("mean_vec", lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )
    counts = emb.groupBy(group_col).agg(F.count("*").alias("n"))
    return (
        pooled.join(counts, group_col)
        .select(
            group_col,
            "n",
            F.transform("mean_vec", lambda x: x / norm).alias("pooled"),
        )
    )


_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_md5", StringType(), False),
    ]
)


def sample_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Strided frame sampling: keep every ``stride``-th frame of each
    payload (the cheap temporal downsample every video pipeline runs
    before the expensive decode/embed). Same Arrow batch shape as
    decode_frames — binary column in, typed frame rows out; the sampled
    frame's fingerprint is md5(payload + '#' + frame index), computable
    on the raw bytes without a decoder."""

    def _sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("media_id", "frame_idx", "frame_md5")}
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                data = bytes(payload)
                for fi in range(0, int(n_frames), stride):
                    h = hashlib.md5(data + b"#" + str(fi).encode()).hexdigest()
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["frame_md5"].append(h)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload", "n_frames").mapInPandas(
        _sample_batch, _SAMPLE_SCHEMA
    )
