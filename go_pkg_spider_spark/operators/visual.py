"""Multimodal image/video columns: opaque binary payload + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched operators over mapInPandas.

Decode is REAL for the self-contained formats in operators/imaging.py
(PGM/PPM, uncompressed BMP, Y4M video — written from the public specs,
the flac.py precedent): `_decode_image` / `_decode_video_frames` sniff
the payload's magic bytes and decode with pure numpy. For formats
beyond those (JPEG/PNG/MP4...), an import-gated library slot (PIL for
images, cv2 for video) takes over when present; absent both, the
payload is UNDECODABLE and the operator emits a typed ERROR ROW
(ok=false, err="no_codec:<fmt>") — it never fabricates features. The
DETERMINISTIC FAKE decode (seeded by the payload bytes) exists solely
for plumbing tests (schemas, UDF signatures, Arrow batch shapes,
partition-preserving plans) and must be requested explicitly with
`allow_fake=True`; production callers never see fake data marked ok.

Scale shape mirrors the audio stage: pixels/frames NEVER leave the
mapInPandas stage (a decoded 1080p frame is ~6 MB — 60x the payload);
only fixed-width feature rows cross downstream boundaries, so the
operator scales by input splits alone, zero shuffles.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import imaging

try:  # library slot for formats beyond imaging.py (absent in this sandbox)
    from PIL import Image as _pil_image  # type: ignore
except Exception:  # noqa: BLE001
    _pil_image = None

try:  # library slot for compressed video (absent in this sandbox)
    import cv2 as _cv2  # type: ignore
except Exception:  # noqa: BLE001
    _cv2 = None

IMAGE_META_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("err", StringType()),
        StructField("mean_intensity", DoubleType()),
        StructField("std_intensity", DoubleType()),
        StructField("edge_ratio", DoubleType()),
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
        StructField("thumb_mean", DoubleType()),
    ]
)

VIDEO_FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", LongType()),
        StructField("ok", BooleanType()),
        StructField("mean_intensity", DoubleType()),
        StructField("motion_proxy", DoubleType()),
    ]
)


def _fake_pixels(payload: bytes, width: int, height: int, salt: bytes = b"") -> np.ndarray:
    """DETERMINISTIC FAKE decode: grayscale pixels seeded by the payload
    digest — a pure function of (bytes, dims, salt), so tests can
    re-derive expectations. Replaced by the real decoder when a codec
    library is importable."""
    seed = int.from_bytes(hashlib.md5(payload + salt).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(height, width), dtype=np.uint8)
    return base


def _decode_image(
    payload: bytes, width: int, height: int, allow_fake: bool = False
) -> np.ndarray:
    """Grayscale pixels from the payload. Real decode for PGM/PPM/BMP
    (imaging.py, pure numpy from spec); PIL slot for other formats when
    importable. An unknown format with no codec library raises (the
    caller turns it into an ok=false error row) — unless allow_fake,
    the tests-only plumbing escape hatch."""
    fmt = imaging.sniff_format(payload)
    if fmt == "pgm":
        return imaging.decode_pgm(payload)
    if fmt == "ppm":
        return imaging.decode_ppm(payload)
    if fmt == "bmp":
        return imaging.decode_bmp(payload)
    if _pil_image is not None:  # pragma: no cover — lib absent here
        import io

        img = _pil_image.open(io.BytesIO(payload)).convert("L")
        return np.asarray(img, dtype=np.uint8)
    if allow_fake:  # tests-only: exercises batch plumbing without codecs
        return _fake_pixels(payload, width, height)
    raise ValueError(f"no_codec:{fmt or 'unknown'}")


def _decode_video_frames(
    payload: bytes,
    width: int,
    height: int,
    n_frames: int,
    frame_idxs: list[int],
    allow_fake: bool = False,
):
    """Yield (frame_idx, grayscale ndarray) for the requested frames.
    Real decode for Y4M (imaging.Y4MStream — O(1) frame seek); cv2 slot
    for compressed containers when importable. Unknown container with no
    codec raises unless allow_fake (tests-only plumbing escape hatch)."""
    if imaging.sniff_format(payload) == "y4m":
        stream = imaging.Y4MStream(payload)
        for idx in frame_idxs:
            if idx < stream.n_frames:
                yield idx, stream.luma(idx)
        return
    if _cv2 is not None:  # pragma: no cover — lib absent here
        import os
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
            f.write(payload)
            path = f.name
        try:
            cap = _cv2.VideoCapture(path)
            for idx in frame_idxs:
                cap.set(_cv2.CAP_PROP_POS_FRAMES, idx)
                ok, frame = cap.read()
                if ok:
                    yield idx, _cv2.cvtColor(frame, _cv2.COLOR_BGR2GRAY)
            cap.release()
        finally:
            os.unlink(path)
        return
    if allow_fake:  # tests-only: exercises batch plumbing without codecs
        for idx in frame_idxs:
            yield idx, _fake_pixels(payload, width, height, salt=str(idx).encode())
        return
    raise ValueError(f"no_codec:{imaging.sniff_format(payload) or 'unknown'}")


def _resize_mean_pool(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Real (non-stub) mean-pool resize — numpy only, no codec needed."""
    h, w = px.shape
    ys = (np.arange(out_h + 1) * h // out_h).astype(int)
    xs = (np.arange(out_w + 1) * w // out_w).astype(int)
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        rows = px[ys[i] : max(ys[i + 1], ys[i] + 1)]
        for j in range(out_w):
            out[i, j] = rows[:, xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    return out


def _pos_finite(x) -> bool:
    """Metadata guard: w/h/n_frames must be positive AND finite —
    x=inf passes a bare `> 0` check and then int(x) raises
    OverflowError, which is not the ValueError the kernels map to
    error rows (decoder fuzz, round 8)."""
    if x is None or pd.isna(x):
        return False
    try:
        xf = float(x)
    except (TypeError, ValueError):
        return False
    return math.isfinite(xf) and xf > 0


def _norm_err(exc: Exception) -> str:
    """Our parsers raise snake_case tokens; a ValueError bubbling up
    from numpy/int() carries prose — normalize so a library message
    never lands in the typed-error column (the decode.py posture)."""
    msg = str(exc)
    return msg if msg and " " not in msg else "decode_error"


def image_row(
    rid,
    payload,
    w,
    h,
    tw: int = 8,
    th: int = 8,
    allow_fake: bool = False,
) -> tuple:
    """One IMAGE_FEATURES_SCHEMA row for one image — the pure per-row
    kernel shared by the mapInPandas operator and the decoder fuzzer
    (tests/test_fuzz_visual.py), the audio features_for_clip pattern."""
    if payload is None or not _pos_finite(w) or not _pos_finite(h):
        return (rid, False, "bad_meta", 0.0, 0.0, 0.0, 0, 0, 0.0)
    try:
        px = _decode_image(
            bytes(payload), int(w), int(h), allow_fake=allow_fake
        ).astype(np.float64)
    except ValueError as exc:  # corrupt/undecodable -> error ROW
        return (rid, False, _norm_err(exc), 0.0, 0.0, 0.0, 0, 0, 0.0)
    gx = np.abs(np.diff(px, axis=1)).mean() if px.shape[1] > 1 else 0.0
    gy = np.abs(np.diff(px, axis=0)).mean() if px.shape[0] > 1 else 0.0
    tb = _resize_mean_pool(px, tw, th)
    return (
        rid,
        True,
        None,
        round(float(px.mean()), 6),
        round(float(px.std()), 6),
        round(float((gx + gy) / 510.0), 6),
        tw,
        th,
        round(float(tb.mean()), 6),
    )


def image_features(
    df: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "payload",
    width_col: str = "width",
    height_col: str = "height",
    thumb: tuple[int, int] = (8, 8),
    allow_fake: bool = False,
) -> DataFrame:
    """Decode -> intensity stats + edge ratio + mean-pooled thumbnail
    stats, one mapInPandas pass. Pixels stay inside the stage; the
    output is fixed-width scalars. Undecodable payloads become
    ok=false/err="no_codec:<fmt>" rows unless allow_fake (tests only)."""
    tw, th = thumb

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                image_row(
                    getattr(r, id_col),
                    getattr(r, bytes_col),
                    getattr(r, width_col),
                    getattr(r, height_col),
                    tw,
                    th,
                    allow_fake=allow_fake,
                )
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def video_frame_sample(
    df: DataFrame,
    id_col: str = "video_id",
    bytes_col: str = "payload",
    width_col: str = "width",
    height_col: str = "height",
    n_frames_col: str = "n_frames",
    fps_col: str = "fps",
    every_nth: int = 10,
    allow_fake: bool = False,
) -> DataFrame:
    """Frame sampling: every Nth frame decodes (REAL for Y4M payloads —
    imaging.Y4MStream luma planes with O(1) frame seeks; cv2 slot for
    other containers; undecodable -> ok=false row unless allow_fake,
    tests only) and emits per-frame
    intensity + a motion proxy (mean abs diff vs the previous SAMPLED
    frame). Output is one row per sampled frame — the row-explosion
    happens INSIDE the stage, so the operator's output is already the
    small projection and the full frame tensor never materializes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rows.extend(
                    video_rows(
                        getattr(r, id_col),
                        getattr(r, bytes_col),
                        getattr(r, width_col),
                        getattr(r, height_col),
                        getattr(r, n_frames_col),
                        getattr(r, fps_col),
                        every_nth,
                        allow_fake=allow_fake,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FRAME_FEATURES_SCHEMA.fields]
            )

    return df.mapInPandas(run, VIDEO_FRAME_FEATURES_SCHEMA)


# Plausible frame-rate band for the ROW metadata (the decode.SR_MIN/
# SR_MAX posture): fps passes pd-level `> 0` checks at 1e-300 yet
# int(idx*1000/fps) overflows (OverflowError is not the ValueError the
# kernel maps to error rows). 1e-3 (one frame per ~17 min, timelapse)
# to 1e6 brackets every real container. Found by the decoder fuzz.
MIN_FPS, MAX_FPS = 1e-3, 1e6

# Cap on SAMPLED frames per video: the sample-index list is built
# eagerly, so a row claiming n_frames=1e18 would allocate a
# 1e17-element list (MemoryError task failure) before the decoder ever
# sees a byte. 100k sampled rows per clip is already far beyond any
# sane per-video fan-out; the truncation is visible in the output
# (frame_idx stops early), not silent.
MAX_SAMPLED_FRAMES = 100_000


def video_rows(
    rid,
    payload,
    w,
    h,
    nf,
    fps,
    every_nth: int = 10,
    allow_fake: bool = False,
) -> list[tuple]:
    """VIDEO_FRAME_FEATURES_SCHEMA rows for one video — the pure
    per-row kernel shared by the mapInPandas operator and the decoder
    fuzzer (tests/test_fuzz_visual.py)."""
    if (
        payload is None
        or not _pos_finite(nf)
        or pd.isna(fps)
        or not (MIN_FPS <= fps <= MAX_FPS)
        or not _pos_finite(w)
        or not _pos_finite(h)
    ):
        return [(rid, -1, -1, False, 0.0, 0.0)]
    idxs = list(range(0, int(nf), every_nth)[:MAX_SAMPLED_FRAMES])
    prev = None
    rows: list[tuple] = []
    try:
        decoded = _decode_video_frames(
            bytes(payload), int(w), int(h), int(nf), idxs,
            allow_fake=allow_fake,
        )
        for idx, px in decoded:
            px = px.astype(np.float64)
            motion = (
                float(np.abs(px - prev).mean() / 255.0)
                if prev is not None
                else 0.0
            )
            rows.append(
                (
                    rid,
                    idx,
                    int(idx * 1000 / float(fps)),
                    True,
                    round(float(px.mean()), 6),
                    round(motion, 6),
                )
            )
            prev = px
    except ValueError:  # corrupt bitstream -> error ROW (after any
        rows.append((rid, -1, -1, False, 0.0, 0.0))  # frames that did decode)
    return rows
