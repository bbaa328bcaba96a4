"""Deterministic scale-up of the MEDIA fixtures for the multimodal
scale sweep (tools/bench_scale_media.py) — NOT an input to any
correctness query; the committed tests/fixtures stay the only
correctness input (their golden oracles pin exact per-file values).

The committed media fixtures are 2-6 files each — enough to pin decoder
bytes exactly, useless for a growth curve. This tool synthesizes
.scale/media/sfK/{jpeg,video,audio} tiers whose BYTE VOLUME (and file
count) grows Kx, using the same writers as tests/fixtures/generate.py,
so LORIS_MM_FIXTURES can point the REGISTERED mm_* queries at each tier
(workload/multimodal._media_dir) and the sweep measures the exact
registered plan on genuinely scaled input. Per the SCALE.md Finding-4
lesson (events was byte-identical per tier until r9 — every curve was a
flat lie), every file is seeded by its global index, so no two files at
any tier are byte-identical, and the tool prints per-tier byte totals
so the sweep can assert the input actually scaled.

Sizing: decode cost for the native T.81 path is ~16 ms per 256x192
grayscale frame (measured r10), so the 100x tier stays ~1-3 s of wall
work on local[32] per family — the exponent, not absolute time, is the
signal.

Usage: python tools/make_scale_media.py [K ...]   (default: 1 10 100)
Writes /root/repo/.scale/media/sfK/{jpeg,video,audio}/* (gitignored).
"""

from __future__ import annotations

import os
import struct
import sys
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO / "tests" / "fixtures"))

from generate import (  # noqa: E402  (fixture writers are the spec)
    write_avi_mjpeg,
    write_jpeg_gray_flat,
    write_jpeg_ycbcr_flat,
)

OUT_ROOT = _REPO / ".scale" / "media"

# 1x tier counts; tier K multiplies each by K. Dims chosen so the 100x
# tier is seconds, not minutes, on local[32] (module docstring).
BASE_JPEG_GRAY = 24   # 256x192 px each (bw=32, bh=24)
BASE_JPEG_COLOR = 24  # 128x96 px each (bw=16, bh=12)
BASE_VIDEO = 16       # 6 frames of 128x96 each
BASE_AUDIO = 16       # 100k stereo frames (~400 KB) each


def write_wav_vec(path: str, sample_rate: int, channels: int,
                  n_frames: int, freq_step: int) -> None:
    """Vectorized twin of generate.write_wav (same sample formula,
    numpy instead of a per-sample Python loop — the committed writer is
    fine for 6 fixture files, not for 1600 x 100k-frame scale files)."""
    t = np.repeat(np.arange(n_frames, dtype=np.int64), channels)
    c = np.tile(np.arange(channels, dtype=np.int64), n_frames)
    samples = ((t * freq_step + c * 7) % 2000 - 1000).astype("<i2")
    data = samples.tobytes()
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def _du(d: Path) -> int:
    return sum(p.stat().st_size for p in d.rglob("*") if p.is_file())


def make_tier(k: int) -> None:
    root = OUT_ROOT / f"sf{k}"
    for sub in ("jpeg", "video", "audio"):
        (root / sub).mkdir(parents=True, exist_ok=True)

    jdir = root / "jpeg"
    for i in range(BASE_JPEG_GRAY * k):
        write_jpeg_gray_flat(str(jdir / f"img-{i:05d}.jpg"), inst=i,
                             bw=32, bh=24)
    for i in range(BASE_JPEG_COLOR * k):
        write_jpeg_ycbcr_flat(str(jdir / f"color-{i:05d}.jpg"), inst=i,
                              bw=16, bh=12)

    vdir = root / "video"
    for i in range(BASE_VIDEO * k):
        write_avi_mjpeg(str(vdir / f"clip-{i:05d}.avi"), inst=i,
                        n_frames=6, bw=16, bh=12)

    adir = root / "audio"
    for i in range(BASE_AUDIO * k):
        write_wav_vec(str(adir / f"scale-{i:05d}_audio.wav"),
                      sample_rate=16000, channels=2, n_frames=100_000,
                      freq_step=3 + (i % 97))

    print(f"sf{k}: jpeg={_du(jdir)} B  video={_du(vdir)} B  "
          f"audio={_du(adir)} B", flush=True)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    for k in ks:
        make_tier(k)


if __name__ == "__main__":
    main()
