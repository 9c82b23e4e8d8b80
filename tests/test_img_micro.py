"""Pure-python netpbm/BMP decode (sources/img_micro.py): spec-derived
byte literals (the nc_micro golden discipline — expected bytes and pixels
hand-computed from the public format specs, not from the decoder), plus
the decode_image integration path without PIL."""

import struct

import numpy as np
import pytest

from gridmet_etl_spark.sources.img_micro import decode_to_gray, sniff


def _ppm_2x2() -> bytes:
    # P6, 2x2, maxval 255: pixels (R,G,B) = red, green, blue, white
    return (
        b"P6\n# spec-derived test image\n2 2\n255\n"
        + bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    )


def test_ppm_luma_hand_computed():
    """ITU-R 601-2 integer luma: red→76 (299·255//1000), green→149,
    blue→29, white→255 — the same values PIL's convert('L') yields."""
    arr = decode_to_gray(_ppm_2x2())
    assert arr.dtype == np.float32 and arr.shape == (2, 2)
    assert arr.tolist() == [[76.0, 149.0], [29.0, 255.0]]


def test_pgm_passthrough_and_comments():
    raw = b"P5\n# comment line\n3 1\n255\n" + bytes([0, 128, 255])
    arr = decode_to_gray(raw)
    assert arr.tolist() == [[0.0, 128.0, 255.0]]
    assert sniff(raw) == "pgm"


def _bmp_24(w, h, bgr_rows, top_down=False) -> bytes:
    """Hand-assembled BITMAPINFOHEADER BMP from the public layout: 14-byte
    file header, 40-byte info header, 4-byte-padded BGR rows (bottom-up
    unless top_down)."""
    row_bytes = (w * 3 + 3) & ~3
    data = b""
    rows = bgr_rows if top_down else list(reversed(bgr_rows))
    for row in rows:
        flat = bytes(v for px in row for v in px)
        data += flat + b"\x00" * (row_bytes - len(flat))
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(data), 2835, 2835, 0, 0,
    )
    return hdr + info + data


def test_bmp_24bit_bottom_up_and_top_down():
    # 2x2: top row = red, green; bottom row = blue, white (BGR byte order)
    rows = [
        [(0, 0, 255), (0, 255, 0)],
        [(255, 0, 0), (255, 255, 255)],
    ]
    expected = [[76.0, 149.0], [29.0, 255.0]]
    assert decode_to_gray(_bmp_24(2, 2, rows)).tolist() == expected
    assert decode_to_gray(_bmp_24(2, 2, rows, top_down=True)).tolist() == expected


def test_bmp_rejects_compressed_and_unknown():
    bad = bytearray(_bmp_24(1, 1, [[(0, 0, 0)]]))
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compressed"):
        decode_to_gray(bytes(bad))
    with pytest.raises(ValueError, match="unsupported image bytes"):
        decode_to_gray(b"\x89PNG\r\n")


def test_decode_image_real_path_without_pil(monkeypatch):
    """operators.multimodal.decode_image reaches img_micro for real
    format bytes when PIL is absent — the gate only fires for formats
    neither backend knows."""
    import builtins

    from gridmet_etl_spark.operators.multimodal import decode_image

    real_import = builtins.__import__

    def no_pil(name, *a, **kw):
        if name == "PIL" or name.startswith("PIL."):
            raise ImportError("PIL disabled for test")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_pil)
    arr = decode_image(_ppm_2x2())
    assert arr.tolist() == [[76.0, 149.0], [29.0, 255.0]]
    with pytest.raises(NotImplementedError, match="netpbm/BMP"):
        decode_image(b"\x89PNG\r\nnotreal")


def test_image_features_over_real_ppm_payloads(spark):
    """End-to-end: a media table whose payloads are REAL P6/P5 bytes runs
    through the Arrow-batched feature extractor with fake=False — the
    distributed mapInPandas path decoding real format bytes (executors
    have no PIL either, so this exercises img_micro inside the kernel)."""
    import hashlib

    from gridmet_etl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
    )

    p6 = _ppm_2x2()
    p5 = b"P5\n1 2\n255\n" + bytes([10, 250])
    rows = [
        (1, "image", bytearray(p6), "image/x-portable-pixmap", 2, 2, None),
        (2, "image", bytearray(p5), "image/x-portable-graymap", 1, 2, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in extract_image_features(media, fake=False).collect()}
    # golden: decode locally with the same (spec-pinned) luma values
    assert got[1].mean_byte == float(np.float32(np.mean([76.0, 149.0, 29.0, 255.0])))
    assert got[2].mean_byte == 130.0  # (10 + 250) / 2
    for mid, payload in ((1, p6), (2, p5)):
        assert got[mid].n_bytes == len(payload)
        assert got[mid].sha256 == hashlib.sha256(payload).hexdigest()
