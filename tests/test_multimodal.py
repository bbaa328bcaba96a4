"""Multimodal decode/feature stage golden checks vs a numpy reference."""

from __future__ import annotations

import math

import numpy as np
import pytest

from loris_mri_spark import workload
from loris_mri_spark.catalog import load_table
from loris_mri_spark.operators.media import decode_media

workload.load_all()


def test_decode_features_golden(spark, sf_dir):
    feats = {
        r["doc_id"]: r
        for r in workload.QUERIES["mm_decode_features"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").limit(10).collect()
    for d in docs:
        b = d["text"].encode("utf-8")
        px = np.frombuffer(b, dtype=np.uint8)
        side = int(math.isqrt(len(px)))
        img = px[: side * side].reshape(side, side).astype("float64")
        r = feats[d["doc_id"]]
        assert r["side"] == side
        assert abs(r["mean_px"] - float(img.mean())) < 1e-9
        assert abs(r["std_px"] - float(img.std())) < 1e-6
        block = max(side // 4, 1)
        crop = img[: block * 4, : block * 4]
        thumb = crop.reshape(4, block, 4, block).mean(axis=(1, 3))
        assert abs(r["thumb_00"] - float(thumb[0, 0])) < 1e-9
        assert abs(r["thumb_33"] - float(thumb[3, 3])) < 1e-9


def test_decode_stub_boundary():
    # JPEG is native now: corrupt bytes classify as a decode error,
    # not a missing codec; the remaining seam (video) still raises
    # NotImplementedError until a decoder is injected.
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x00", "video/mp4")
    out = decode_media(b"\x01\x02", "image/raw")
    assert list(out) == [1, 2]


def test_wav_parser_rejects_and_parses():
    from pathlib import Path

    from loris_mri_spark.operators.media import parse_wav_bytes

    fx = Path(__file__).parent / "fixtures" / "audio"
    m = parse_wav_bytes((fx / "sub-01_audio.wav").read_bytes())
    assert (m["channels"], m["sample_rate"], m["n_frames"]) == (1, 16000, 1600)
    assert parse_wav_bytes(b"not riff data at all, clearly") is None
    # truncated data chunk: frames clamp to whole blocks, no raise
    raw = (fx / "sub-02_audio.wav").read_bytes()
    t = parse_wav_bytes(raw[:100])
    full = parse_wav_bytes(raw)
    assert t is not None and t["n_frames"] < full["n_frames"]


def _png_with_filters(img: np.ndarray, filters: list[int],
                      color_type: int = 0) -> bytes:
    """Spec-correct FORWARD filtering encoder (independent of the engine's
    stored-filter-0 sinks.png_preview): each scanline filtered per the
    PNG spec with the requested filter type, zlib-compressed. Decoding
    must recover the original image exactly for every filter type."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 6: 4}[color_type]
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h, w * channels).astype(np.int64)
    stride = w * channels

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(stride):
            v = int(flat[y, x])
            a = int(flat[y, x - channels]) if x >= channels else 0
            b = int(flat[y - 1, x]) if y else 0
            c = int(flat[y - 1, x - channels]) if (y and x >= channels) else 0
            if f == 0:
                out = v
            elif f == 1:
                out = v - a
            elif f == 2:
                out = v - b
            elif f == 3:
                out = v - (a + b) // 2
            else:
                out = v - paeth(a, b, c)
            raw.append(out & 0xFF)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_decode_all_filter_types():
    from loris_mri_spark.operators.media import decode_png_bytes

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(16, 13), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = decode_png_bytes(_png_with_filters(gray, filters))
        assert got is not None and np.array_equal(got, gray), filters
    rgb = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    got = decode_png_bytes(_png_with_filters(rgb, [0, 1, 2, 3, 4], color_type=2))
    assert got is not None and np.array_equal(got, rgb)
    rgba = rng.integers(0, 256, size=(5, 6, 4), dtype=np.uint8)
    got = decode_png_bytes(_png_with_filters(rgba, [4, 3, 2, 1], color_type=6))
    assert got is not None and np.array_equal(got, rgba)


def test_png_encode_decode_roundtrip():
    from loris_mri_spark.operators.media import decode_png_bytes
    from loris_mri_spark.sinks import png_preview

    rows = [[(r * 31 + c * 7) % 256 for c in range(8)] for r in range(8)]
    arr = decode_png_bytes(png_preview(rows))
    assert arr is not None
    assert arr.tolist() == rows


def test_png_decode_classifies_unsupported():
    from loris_mri_spark.operators.media import decode_png_bytes
    from loris_mri_spark.sinks import png_preview

    good = png_preview([[1, 2], [3, 4]])
    assert decode_png_bytes(b"notapng") is None
    assert decode_png_bytes(good[:20]) is None
    # 16-bit depth: flip the IHDR depth byte -> classify, not raise
    bad_depth = bytearray(good)
    bad_depth[24] = 16
    assert decode_png_bytes(bytes(bad_depth)) is None


def test_jpeg_420_subsampled_decodes_exactly():
    """4:2:0 (Y 2x2, chroma 1x1) MCUs: four luma blocks + one chroma pair
    per MCU, chroma upsampled 2x2 — the flat-block fixture makes every
    pixel exactly predictable from the MCU spec."""
    import os
    import sys

    import numpy as np

    from loris_mri_spark.operators.media import decode_jpeg_baseline

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    sys.path.insert(0, os.path.join(fixtures))
    import generate

    for inst in (1, 2):
        img = decode_jpeg_baseline(
            open(os.path.join(fixtures, "jpeg", f"sub420-{inst}.jpg"), "rb")
            .read()
        )
        assert img is not None and img.shape == (32, 32, 3)
        spec = generate.jpeg_420_mcu_values(inst, 2, 2)
        exp = np.zeros((32, 32, 3), dtype=np.uint8)
        for i, (y0, y1, y2, y3, cb, cr) in enumerate(spec):
            my, mx = divmod(i, 2)
            lut = [[y0, y1], [y2, y3]]
            for byy in range(2):
                for bxx in range(2):
                    exp[
                        my * 16 + byy * 8 : my * 16 + byy * 8 + 8,
                        mx * 16 + bxx * 8 : mx * 16 + bxx * 8 + 8,
                        0,
                    ] = lut[byy][bxx]
            exp[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16, 1] = cb
            exp[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16, 2] = cr
        assert (img == exp).all()
