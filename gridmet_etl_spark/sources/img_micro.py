"""Pure-python image decode for codec-less containers — the multimodal
sibling of shp_micro / nc_micro / proj_micro: REAL bytes of REAL public
formats instead of an injected fake.

Formats (both fully specified publicly and dependency-free to parse):

- netpbm binary: P5 (grayscale) and P6 (RGB), maxval ≤ 255 — the
  'portable pixmap' family (netpbm.sourceforge.net/doc/ppm.html);
- BMP: uncompressed (BI_RGB) 24-bit and 8-bit-palette Windows bitmaps
  (BITMAPINFOHEADER) — bottom-up or top-down, 4-byte row padding.

Output matches PIL's ``convert("L")`` convention: a float32 grayscale
array, RGB collapsed with the ITU-R 601-2 luma transform
L = (299·R + 587·G + 114·B) / 1000 (PIL truncates to int; we keep the
integer-truncated value so a PIL-equipped environment produces the
IDENTICAL array — pinned in tests against hand-computed pixels).

``operators/multimodal.py::decode_image`` tries PIL first, then this
module for its formats, and only then the documented gate — so the
Arrow-batched feature extractors run on real decoded pixels in this
container.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["sniff", "decode_to_gray"]


def sniff(payload: bytes) -> str | None:
    """'ppm' | 'pgm' | 'bmp' | None for unsupported."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    return None


def _pnm_header(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, maxval, data_offset) — whitespace/comment-tolerant
    per the netpbm spec (tokens separated by whitespace; '#' comments run
    to end of line; a single whitespace byte follows maxval)."""
    pos = 2
    vals: list[int] = []
    n = len(payload)
    while len(vals) < 3 and pos < n:
        c = payload[pos : pos + 1]
        if c == b"#":
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < n and not payload[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    return w, h, maxval, pos


def _decode_pnm(payload: bytes, rgb: bool) -> np.ndarray:
    w, h, maxval, off = _pnm_header(payload)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported by img_micro")
    ch = 3 if rgb else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=off)
    if rgb:
        px = arr.reshape(h, w, 3).astype(np.uint32)
        gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
        return gray.astype(np.float32)
    return arr.reshape(h, w).astype(np.float32)


def _decode_bmp(payload: bytes) -> np.ndarray:
    # BITMAPFILEHEADER: 2s magic, u32 size, u16 u16 reserved, u32 offset
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("pre-BITMAPINFOHEADER BMP not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (8, 24):
        raise ValueError(f"{bpp}-bit BMP not supported (8/24 only)")
    top_down = h_signed < 0
    h = abs(h_signed)
    row_bytes = (w * (bpp // 8) + 3) & ~3  # rows pad to 4 bytes
    rows = []
    for r in range(h):
        src_row = r if top_down else h - 1 - r
        off = data_off + src_row * row_bytes
        row = np.frombuffer(payload, dtype=np.uint8, count=w * (bpp // 8), offset=off)
        rows.append(row)
    raw = np.vstack(rows)
    if bpp == 8:
        # palette: 4 bytes/entry (B, G, R, 0) right after the info header
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal = np.frombuffer(
            payload, dtype=np.uint8, count=n_colors * 4, offset=14 + hdr_size
        ).reshape(n_colors, 4).astype(np.uint32)
        lum = (299 * pal[:, 2] + 587 * pal[:, 1] + 114 * pal[:, 0]) // 1000
        return lum[raw].astype(np.float32)
    px = raw.reshape(h, w, 3).astype(np.uint32)  # BGR order
    gray = (299 * px[:, :, 2] + 587 * px[:, :, 1] + 114 * px[:, :, 0]) // 1000
    return gray.astype(np.float32)


def decode_to_gray(payload: bytes) -> np.ndarray:
    """float32 grayscale array for a supported payload; raises ValueError
    with the format name for unsupported bytes (callers sniff first)."""
    kind = sniff(payload)
    if kind == "ppm":
        return _decode_pnm(payload, rgb=True)
    if kind == "pgm":
        return _decode_pnm(payload, rgb=False)
    if kind == "bmp":
        return _decode_bmp(payload)
    raise ValueError(
        f"unsupported image bytes (magic {payload[:2]!r}); img_micro handles "
        "netpbm P5/P6 and uncompressed 8/24-bit BMP"
    )
