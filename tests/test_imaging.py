"""Real image/video codecs (operators/imaging.py): encode->decode
roundtrips, spec edge cases (comments, padding, top-down BMP, 8-bit
palette, 4:2:0 chroma skip), typed errors on corrupt bitstreams, and
the Spark operators decoding REAL payloads end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from go_pkg_spider_spark.operators import imaging, visual


def _gradient(h, w, phase=0):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 7 + y * 13 + phase * 31) % 256).astype(np.uint8)


# --------------------------------------------------------------------- pnm


def test_pgm_roundtrip_exact():
    px = _gradient(17, 23)
    assert np.array_equal(imaging.decode_pgm(imaging.encode_pgm(px)), px)


def test_pgm_header_comment():
    px = _gradient(4, 5)
    raw = b"P5 # a comment\n5 4 255\n" + px.tobytes()
    assert np.array_equal(imaging.decode_pgm(raw), px)


def test_ppm_roundtrip_luma():
    rgb = np.stack([_gradient(6, 9, p) for p in range(3)], axis=-1)
    got = imaging.decode_ppm(imaging.encode_ppm(rgb))
    want = imaging.rgb_to_luma(rgb)
    assert np.array_equal(got, want)


def test_pnm_corrupt():
    with pytest.raises(ValueError, match="pnm_bad_magic"):
        imaging.decode_pgm(b"P6 1 1 255\nxxx")
    with pytest.raises(ValueError, match="pnm_truncated_raster"):
        imaging.decode_pgm(b"P5 10 10 255\nshort")
    with pytest.raises(ValueError, match="pnm_truncated_header"):
        imaging.decode_pgm(b"P5 10")


# --------------------------------------------------------------------- bmp


def test_bmp_roundtrip_gray():
    px = _gradient(11, 13)  # odd width exercises 4-byte row padding
    assert np.array_equal(imaging.decode_bmp(imaging.encode_bmp(px)), px)


def test_bmp_roundtrip_rgb_luma():
    rgb = np.stack([_gradient(5, 6, p) for p in range(3)], axis=-1)
    got = imaging.decode_bmp(imaging.encode_bmp(rgb))
    assert np.array_equal(got, imaging.rgb_to_luma(rgb))


def test_bmp_top_down():
    px = _gradient(4, 6)
    buf = bytearray(imaging.encode_bmp(px))
    # negative height flags top-down; the encoder wrote rows bottom-up,
    # so a top-down read of the SAME body yields the vertical flip
    buf[22:26] = (-4).to_bytes(4, "little", signed=True)
    assert np.array_equal(imaging.decode_bmp(bytes(buf)), px[::-1])


def test_bmp_8bit_palette():
    # 3x4 indexed image over a 4-entry BGRX palette
    pal = [(255, 0, 0, 0), (0, 255, 0, 0), (0, 0, 255, 0), (128, 128, 128, 0)]
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], dtype=np.uint8)
    h, w = idx.shape
    row_bytes = (w + 3) & ~3
    body = b"".join(
        idx[y].tobytes() + b"\x00" * (row_bytes - w) for y in range(h - 1, -1, -1)
    )
    pal_bytes = b"".join(bytes(e) for e in pal)
    pixel_off = 14 + 40 + len(pal_bytes)
    header = (
        b"BM"
        + (pixel_off + len(body)).to_bytes(4, "little")
        + b"\x00" * 4
        + pixel_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 8
        + len(pal).to_bytes(4, "little")
        + b"\x00" * 4
    )
    got = imaging.decode_bmp(header + pal_bytes + body)
    # palette entries are BGRX -> luma of (R,G,B)
    lut = np.array(
        [imaging.rgb_to_luma(np.array([[[e[2], e[1], e[0]]]], np.uint8))[0, 0] for e in pal]
    )
    assert np.array_equal(got, lut[idx])


def test_bmp_corrupt():
    with pytest.raises(ValueError, match="bmp_bad_magic"):
        imaging.decode_bmp(b"XX" + b"\x00" * 60)
    px = _gradient(4, 4)
    buf = bytearray(imaging.encode_bmp(px))
    buf[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(ValueError, match="bmp_compression_unsupported"):
        imaging.decode_bmp(bytes(buf))
    with pytest.raises(ValueError, match="bmp_truncated_raster"):
        imaging.decode_bmp(bytes(imaging.encode_bmp(px))[:-8])


# --------------------------------------------------------------------- y4m


def test_y4m_roundtrip_mono():
    frames = [_gradient(8, 12, p) for p in range(5)]
    buf = imaging.encode_y4m(frames, fps_num=30, fps_den=1, mono=True)
    s = imaging.Y4MStream(buf)
    assert (s.width, s.height, s.n_frames, s.fps) == (12, 8, 5, 30.0)
    for i, f in enumerate(frames):
        assert np.array_equal(s.luma(i), f)


def test_y4m_roundtrip_420():
    frames = [_gradient(6, 10, p) for p in range(3)]
    s = imaging.Y4MStream(imaging.encode_y4m(frames, mono=False))
    assert s.frame_bytes == 10 * 6 * 3 // 2
    for i, f in enumerate(frames):
        assert np.array_equal(s.luma(i), f)  # chroma skipped, luma exact


def test_y4m_corrupt():
    with pytest.raises(ValueError, match="y4m_bad_magic"):
        imaging.Y4MStream(b"AVI nope")
    good = imaging.encode_y4m([_gradient(4, 4)])
    with pytest.raises(ValueError, match="y4m_truncated_frame"):
        imaging.Y4MStream(good[:-3])
    with pytest.raises(ValueError, match="y4m_frame_oob"):
        imaging.Y4MStream(good).luma(1)


def test_sniff_format():
    assert imaging.sniff_format(imaging.encode_pgm(_gradient(2, 2))) == "pgm"
    assert imaging.sniff_format(imaging.encode_bmp(_gradient(2, 2))) == "bmp"
    assert imaging.sniff_format(imaging.encode_y4m([_gradient(2, 2)])) == "y4m"
    assert imaging.sniff_format(b"\x89PNG") is None


# ------------------------------------------------------------ spark e2e


def test_image_features_real_decode(spark):
    """image_features over REAL PGM/PPM/BMP payloads must reproduce
    driver-side numpy stats of the true pixels (not the fake)."""
    px = _gradient(16, 24)
    rgb = np.stack([_gradient(16, 24, p) for p in range(3)], axis=-1)
    rows = [
        ("pgm", bytearray(imaging.encode_pgm(px)), 24, 16),
        ("bmp", bytearray(imaging.encode_bmp(px)), 24, 16),
        ("ppm", bytearray(imaging.encode_ppm(rgb)), 24, 16),
        ("corrupt", bytearray(b"BM" + b"\x01" * 20), 24, 16),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, payload binary, width int, height int"
    )
    got = {r.image_id: r for r in visual.image_features(df).collect()}
    want_gray = round(float(px.astype(np.float64).mean()), 6)
    assert got["pgm"].ok and abs(got["pgm"].mean_intensity - want_gray) < 1e-9
    assert got["bmp"].ok and abs(got["bmp"].mean_intensity - want_gray) < 1e-9
    want_luma = round(float(imaging.rgb_to_luma(rgb).astype(np.float64).mean()), 6)
    assert got["ppm"].ok and abs(got["ppm"].mean_intensity - want_luma) < 1e-9
    assert not got["corrupt"].ok and got["corrupt"].err == "bmp_truncated_header"


def test_video_frame_sample_real_y4m(spark):
    """video_frame_sample over a REAL Y4M payload: per-frame intensity
    and motion proxy must match the encoded frames; metadata n_frames
    beyond the stream length is clamped by the decoder."""
    frames = [np.full((8, 8), 10 * p, dtype=np.uint8) for p in range(30)]
    payload = imaging.encode_y4m(frames, fps_num=10, fps_den=1)
    df = spark.createDataFrame(
        [("v", bytearray(payload), 8, 8, 40, 10.0)],
        "video_id string, payload binary, width int, height int,"
        " n_frames int, fps double",
    )
    out = sorted(
        visual.video_frame_sample(df, every_nth=10).collect(),
        key=lambda r: r.frame_idx,
    )
    # metadata says 40 frames -> idxs 0,10,20,30; stream has 30 -> 3 rows
    assert [r.frame_idx for r in out] == [0, 10, 20]
    assert [r.frame_ts_ms for r in out] == [0, 1000, 2000]
    assert [r.mean_intensity for r in out] == [0.0, 100.0, 200.0]
    # constant frames 100 apart: motion proxy = 100/255
    assert out[0].motion_proxy == 0.0
    assert abs(out[1].motion_proxy - round(100 / 255.0, 6)) < 1e-9
