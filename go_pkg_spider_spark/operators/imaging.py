"""Self-contained image/video bitstream codecs (pure numpy, written
from the public format specs — the flac.py precedent applied to the
visual leg, so the multimodal operators decode REAL bytes with no
codec library in the container).

Formats:
- PGM (P5) / PPM (P6): netpbm binary grayscale / RGB
  (netpbm.sourceforge.net/doc/pgm.html, /ppm.html). ASCII header
  `P5|P6 <w> <h> <maxval>` with #-comments, then raw samples.
- BMP: Windows bitmap, BITMAPINFOHEADER, uncompressed (BI_RGB) 8-bit
  paletted or 24-bit BGR, bottom-up or top-down rows padded to 4 bytes
  (en.wikipedia.org/wiki/BMP_file_format).
- Y4M: YUV4MPEG2 stream — `YUV4MPEG2 W.. H.. F..:.. [Cmono|C420...]\\n`
  then per frame `FRAME...\\n` + planar samples
  (wiki.multimedia.cx/index.php/YUV4MPEG2). The luma plane is the
  grayscale frame; 4:2:0 chroma is skipped over, mono has none.

All decoders return grayscale uint8 (RGB -> Rec.601 integer luma), all
encoders exist so tests/datagen can round-trip deterministically.
Corrupt input raises ValueError with a typed message; callers map it to
an error ROW (never a task failure).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# netpbm PGM (P5) / PPM (P6)
# --------------------------------------------------------------------------


def _pnm_header_tokens(buf: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse n whitespace-separated numeric tokens after the magic,
    honoring #-comments; returns (values, offset_past_single_ws)."""
    vals: list[int] = []
    i = 2  # past magic
    cur = b""
    while len(vals) < n_tokens:
        if i >= len(buf):
            raise ValueError("pnm_truncated_header")
        c = buf[i : i + 1]
        if c == b"#":
            while i < len(buf) and buf[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c in b" \t\r\n":
            if cur:
                vals.append(int(cur))
                cur = b""
        elif c.isdigit():
            cur += c
        else:
            raise ValueError("pnm_bad_header")
        i += 1
    # exactly ONE whitespace byte separates maxval from raster (spec)
    return vals, i


def decode_pgm(buf: bytes) -> np.ndarray:
    if buf[:2] != b"P5":
        raise ValueError("pnm_bad_magic")
    (w, h, maxval), off = _pnm_header_tokens(buf, 3)
    if not (0 < maxval < 256):
        raise ValueError("pnm_maxval_unsupported")
    if w <= 0 or h <= 0:
        # a zero-dim raster decodes to an EMPTY array whose feature
        # math yields NaN ok=true rows (decoder fuzz, round 8)
        raise ValueError("pnm_bad_dims")
    need = w * h
    raster = buf[off : off + need]
    if len(raster) < need:
        raise ValueError("pnm_truncated_raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w)


def decode_ppm(buf: bytes) -> np.ndarray:
    if buf[:2] != b"P6":
        raise ValueError("pnm_bad_magic")
    (w, h, maxval), off = _pnm_header_tokens(buf, 3)
    if not (0 < maxval < 256):
        raise ValueError("pnm_maxval_unsupported")
    if w <= 0 or h <= 0:
        raise ValueError("pnm_bad_dims")
    need = w * h * 3
    raster = buf[off : off + need]
    if len(raster) < need:
        raise ValueError("pnm_truncated_raster")
    rgb = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    return rgb_to_luma(rgb)


def encode_pgm(px: np.ndarray) -> bytes:
    h, w = px.shape
    return b"P5 %d %d 255\n" % (w, h) + px.astype(np.uint8).tobytes()


def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return b"P6 %d %d 255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def rgb_to_luma(rgb: np.ndarray) -> np.ndarray:
    """Rec.601 integer luma — deterministic across platforms."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


# --------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, BI_RGB uncompressed, 8-bit paletted or 24-bit)
# --------------------------------------------------------------------------


def decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ValueError("bmp_bad_magic")
    if len(buf) < 54:
        raise ValueError("bmp_truncated_header")
    pixel_off = int.from_bytes(buf[10:14], "little")
    hdr_size = int.from_bytes(buf[14:18], "little")
    if hdr_size < 40:
        raise ValueError("bmp_header_unsupported")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    compression = int.from_bytes(buf[30:34], "little")
    if compression != 0:
        raise ValueError("bmp_compression_unsupported")
    if w <= 0 or h == 0:
        raise ValueError("bmp_bad_dims")
    top_down = h < 0
    h_abs = abs(h)
    if bpp == 24:
        row_bytes = (w * 3 + 3) & ~3
        need = row_bytes * h_abs
        if len(buf) < pixel_off + need:
            raise ValueError("bmp_truncated_raster")
        raw = np.frombuffer(
            buf[pixel_off : pixel_off + need], dtype=np.uint8
        ).reshape(h_abs, row_bytes)
        bgr = raw[:, : w * 3].reshape(h_abs, w, 3)
        rgb = bgr[..., ::-1]
        px = rgb_to_luma(rgb)
    elif bpp == 8:
        n_colors = int.from_bytes(buf[46:50], "little") or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            buf[pal_off : pal_off + 4 * n_colors], dtype=np.uint8
        ).reshape(-1, 4)  # BGRX entries
        lut = rgb_to_luma(pal[:, [2, 1, 0]].reshape(-1, 1, 3)).reshape(-1)
        row_bytes = (w + 3) & ~3
        need = row_bytes * h_abs
        if len(buf) < pixel_off + need:
            raise ValueError("bmp_truncated_raster")
        raw = np.frombuffer(
            buf[pixel_off : pixel_off + need], dtype=np.uint8
        ).reshape(h_abs, row_bytes)[:, :w]
        if raw.max(initial=0) >= len(lut):
            raise ValueError("bmp_palette_index_oob")
        px = lut[raw]
    else:
        raise ValueError("bmp_bpp_unsupported")
    return px if top_down else px[::-1].copy()


def encode_bmp(px_or_rgb: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up BMP from (h,w) grayscale or (h,w,3) RGB."""
    a = px_or_rgb.astype(np.uint8)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    bgr = a[..., ::-1]
    body = b"".join(
        bgr[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + pixel_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + body


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2) video
# --------------------------------------------------------------------------


class Y4MStream:
    """Parsed YUV4MPEG2 stream: header params + frame offsets, luma-plane
    random access (frame i is O(1) — frames are fixed-size)."""

    def __init__(self, buf: bytes):
        if not buf.startswith(b"YUV4MPEG2"):
            raise ValueError("y4m_bad_magic")
        nl = buf.find(b"\n")
        if nl < 0:
            raise ValueError("y4m_truncated_header")
        self.width = self.height = 0
        self.fps_num, self.fps_den = 25, 1
        colorspace = "420"
        for tok in buf[9:nl].split(b" "):
            if not tok:
                continue
            tag, val = tok[:1], tok[1:].decode("ascii", "replace")
            if tag == b"W":
                self.width = int(val)
            elif tag == b"H":
                self.height = int(val)
            elif tag == b"F":
                num, den = val.split(":")
                self.fps_num, self.fps_den = int(num), int(den)
            elif tag == b"C":
                colorspace = val
        if self.width <= 0 or self.height <= 0:
            raise ValueError("y4m_bad_dims")
        if self.fps_den <= 0 or self.fps_num <= 0:
            # 'F25:0' parses but the fps property would divide by zero
            # (ZeroDivisionError is NOT the ValueError callers map to
            # error rows — decoder fuzz, round 8)
            raise ValueError("y4m_bad_fps")
        luma = self.width * self.height
        if colorspace.startswith("420"):
            self.frame_bytes = luma + luma // 2
        elif colorspace == "mono":
            self.frame_bytes = luma
        elif colorspace.startswith("444"):
            self.frame_bytes = luma * 3
        elif colorspace.startswith("422"):
            self.frame_bytes = luma * 2
        else:
            raise ValueError("y4m_colorspace_unsupported")
        self._buf = buf
        self._frame_offsets: list[int] = []
        pos = nl + 1
        while pos < len(buf):
            fnl = buf.find(b"\n", pos)
            if fnl < 0 or buf[pos : pos + 5] != b"FRAME":
                raise ValueError("y4m_bad_frame_marker")
            data = fnl + 1
            if data + self.frame_bytes > len(buf):
                raise ValueError("y4m_truncated_frame")
            self._frame_offsets.append(data)
            pos = data + self.frame_bytes

    @property
    def n_frames(self) -> int:
        return len(self._frame_offsets)

    @property
    def fps(self) -> float:
        return self.fps_num / self.fps_den

    def luma(self, idx: int) -> np.ndarray:
        if not 0 <= idx < self.n_frames:
            raise ValueError("y4m_frame_oob")
        off = self._frame_offsets[idx]
        n = self.width * self.height
        return np.frombuffer(self._buf[off : off + n], dtype=np.uint8).reshape(
            self.height, self.width
        )


def encode_y4m(
    frames: list[np.ndarray], fps_num: int = 25, fps_den: int = 1, mono: bool = True
) -> bytes:
    """Mono (or 4:2:0 with neutral chroma) Y4M from grayscale frames."""
    h, w = frames[0].shape
    cs = b"Cmono" if mono else b"C420jpeg"
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 %s\n" % (w, h, fps_num, fps_den, cs)]
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("y4m_frame_shape_mismatch")
        out.append(b"FRAME\n")
        out.append(f.astype(np.uint8).tobytes())
        if not mono:
            out.append(b"\x80" * (w * h // 2))
    return b"".join(out)


# --------------------------------------------------------------------------
# magic-byte sniffing shared by the visual operators
# --------------------------------------------------------------------------


def sniff_format(buf: bytes) -> str | None:
    if buf[:2] == b"P5":
        return "pgm"
    if buf[:2] == b"P6":
        return "ppm"
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:9] == b"YUV4MPEG2":
        return "y4m"
    return None
