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
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")
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
