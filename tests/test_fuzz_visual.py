"""Visual-decoder fuzz contracts (hypothesis) — the audio twin
(tests/test_fuzz_decode.py) applied to the image/video leg.

The mapInPandas kernels in operators/visual.py catch ONLY ValueError,
so the load-bearing invariant is narrower than audio's: the imaging.py
parsers must raise ValueError (typed token) and nothing else, and the
pure per-row kernels (image_row / video_rows) must never raise at all
— for byte soup, for structured mutations of valid containers, and for
hostile ROW METADATA (the width/height/n_frames/fps columns are
attacker-adjacent too: a row claiming n_frames=1e18 allocated a
1e17-element index list, and fps=1e-300 overflowed the timestamp int;
both found by this file and now guarded).
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from go_pkg_spider_spark.operators import imaging
from go_pkg_spider_spark.operators.visual import image_row, video_rows

_SETTINGS = dict(max_examples=250, deadline=None)


def _assert_parser_contract(fn, buf: bytes) -> None:
    try:
        out = fn(buf)
    except ValueError:
        return  # typed rejection is the contract
    if isinstance(out, np.ndarray):
        assert out.dtype == np.uint8 and out.ndim == 2
        assert out.shape[0] > 0 and out.shape[1] > 0
    else:  # Y4MStream
        assert out.width > 0 and out.height > 0
        assert math.isfinite(out.fps) and out.fps > 0
        for i in range(min(out.n_frames, 2)):
            assert out.luma(i).shape == (out.height, out.width)


@settings(**_SETTINGS)
@given(blob=st.binary(max_size=2048), which=st.sampled_from(["pgm", "ppm", "bmp", "y4m"]))
def test_parser_byte_soup_raises_only_valueerror(blob, which):
    fn = {
        "pgm": imaging.decode_pgm,
        "ppm": imaging.decode_ppm,
        "bmp": imaging.decode_bmp,
        "y4m": imaging.Y4MStream,
    }[which]
    _assert_parser_contract(fn, blob)


def _valid_pool() -> list[tuple[bytes, str]]:
    rng = np.random.default_rng(0xBEEF)
    gray = rng.integers(0, 256, size=(24, 31), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(16, 17, 3), dtype=np.uint8)
    frames = [
        rng.integers(0, 256, size=(12, 14), dtype=np.uint8) for _ in range(4)
    ]
    return [
        (imaging.encode_pgm(gray), "pgm"),
        (imaging.encode_ppm(rgb), "ppm"),
        (imaging.encode_bmp(gray), "bmp"),
        (imaging.encode_bmp(rgb), "bmp"),
        (imaging.encode_y4m(frames), "y4m"),
        (imaging.encode_y4m(frames, mono=False), "y4m"),
    ]


_POOL = _valid_pool()
_DECODERS = {
    "pgm": imaging.decode_pgm,
    "ppm": imaging.decode_ppm,
    "bmp": imaging.decode_bmp,
    "y4m": imaging.Y4MStream,
}


@settings(**_SETTINGS)
@given(data=st.data())
def test_mutated_valid_containers(data):
    blob, which = _POOL[data.draw(st.integers(0, len(_POOL) - 1))]
    b = bytearray(blob)
    kind = data.draw(st.sampled_from(["flip", "trunc", "stomp", "dup"]))
    if kind == "flip":
        i = data.draw(st.integers(0, len(b) - 1))
        b[i] ^= data.draw(st.integers(1, 255))
    elif kind == "trunc":
        b = b[: data.draw(st.integers(0, len(b)))]
    elif kind == "stomp":
        i = data.draw(st.integers(0, max(len(b) - 4, 0)))
        b[i : i + 4] = data.draw(
            st.sampled_from([b"\xff\xff\xff\xff", b"\x00\x00\x00\x00"])
        )
    else:
        i = data.draw(st.integers(0, len(b) - 1))
        j = data.draw(st.integers(i, len(b)))
        b = b[:j] + b[i:j] + b[j:]
    _assert_parser_contract(_DECODERS[which], bytes(b))


_META = st.none() | st.integers(-(2**62), 2**62) | st.floats(allow_nan=True)


@settings(**_SETTINGS)
@given(data=st.data())
def test_row_kernels_never_raise(data):
    """The production per-row kernels with fuzz payloads AND fuzz row
    metadata: always full schema rows, never an exception, err tokens
    snake_case, ok rows finite."""
    blob = data.draw(st.binary(max_size=1024)) if data.draw(st.booleans()) else (
        _POOL[data.draw(st.integers(0, len(_POOL) - 1))][0]
    )
    w, h = data.draw(_META), data.draw(_META)
    row = image_row("fuzz", blob, w, h)
    assert len(row) == 9
    if row[1]:  # ok
        assert all(math.isfinite(float(row[i])) for i in (3, 4, 5, 8))
    else:
        assert isinstance(row[2], str) and " " not in row[2]
    nf, fps = data.draw(_META), data.draw(_META)
    vrows = video_rows("fuzz", blob, w, h, nf, fps)
    for vr in vrows:
        assert len(vr) == 6
        if vr[3]:
            assert math.isfinite(float(vr[4])) and math.isfinite(float(vr[5]))
            assert isinstance(vr[2], int)


def test_crafted_metadata_regressions():
    """Directed rows for the fuzz-found metadata classes."""
    y4m = _POOL[4][0]
    # n_frames=1e18 pre-guard: a 1e17-element eager index list
    rows = video_rows("x", y4m, 14, 12, int(1e18), 25.0)
    assert all(len(r) == 6 for r in rows)
    # fps=1e-300 passes `> 0` but int(idx*1000/fps) overflows pre-guard
    rows = video_rows("x", y4m, 14, 12, 4, 1e-300)
    assert rows == [("x", -1, -1, False, 0.0, 0.0)]
    # zero-dim PNM: was an ok=true row with NaN features
    row = image_row("x", b"P5 0 0 255\n", 8, 8)
    assert row[1] is False and row[2] == "pnm_bad_dims"
    # zero-denominator frame rate: was ZeroDivisionError on .fps
    import pytest

    with pytest.raises(ValueError, match="y4m_bad_fps"):
        imaging.Y4MStream(b"YUV4MPEG2 W4 H4 F25:0 Cmono\n")
