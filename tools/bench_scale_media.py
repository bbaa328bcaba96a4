"""Scale-sweep the MULTIMODAL/media decode family at 1x / 10x / 100x
binary volume (.scale/media/sfK — run `tools/make_scale_media.py`
first) and merge warm timings into BENCH_SF1.json under
`media_extension` (the r9 VERDICT's item 5: SCALE.md covered batch +
streaming + EAV; no mm_* query had a growth curve, and decode is the
byte-heaviest per-row work in the engine).

The sweep runs the REGISTERED queries — LORIS_MM_FIXTURES
(workload/multimodal._media_dir) points them at each tier without
changing their plan shape — so the rows certify the shipping plans:

- mm_decode_jpeg_baseline / mm_decode_jpeg_color: native T.81 decode
  (Huffman + dequant + IDCT) inside Arrow-batched mapInPandas — must be
  linear in input bytes; files are independent, so the only scale
  hazards are partition skew and per-task fixed cost.
- mm_video_mjpeg_frames: RIFF walk + per-frame JPEG decode — linear in
  total frames.
- mm_audio_wav_meta / mm_audio_features: RIFF chunk walk + vectorized
  numpy over int16 samples — linear in sample bytes.

Finding-4 lesson (an unscaled input makes every curve a flat lie): the
sweep STATS each tier's input bytes and records them next to the
timings; a tier whose bytes do not grow ~Kx fails loudly instead of
producing a flattering exponent.

Usage: python tools/bench_scale_media.py   (~2-5 min on local[32])
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

QUERIES = [
    "mm_decode_jpeg_baseline",
    "mm_decode_jpeg_color",
    "mm_video_mjpeg_frames",
    "mm_audio_wav_meta",
    "mm_audio_features",
]

TIERS = [
    ("1", str(Path(_REPO, ".scale", "media", "sf1")), 1),
    ("10", str(Path(_REPO, ".scale", "media", "sf10")), 10),
    ("100", str(Path(_REPO, ".scale", "media", "sf100")), 100),
]

SF_DIR = "/root/testdata/sf0.1"  # table arg; unused by the media scans


def _tier_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from loris_mri_spark.session import get_spark

    spark = get_spark(
        app_name="loris-mri-spark-bench-media-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loris_mri_spark import workload

    workload.load_all()
    only = set(sys.argv[1:])
    runners = {
        name: workload.QUERIES[name]
        for name in QUERIES
        if not only or name in only
    }

    results: dict[str, dict[str, float]] = {n: {} for n in runners}
    tier_bytes: dict[str, int] = {}
    for label, root, ratio in TIERS:
        if not os.path.isdir(root):
            print(f"missing {root}; run tools/make_scale_media.py first",
                  file=sys.stderr)
            sys.exit(2)
        tier_bytes[label] = _tier_bytes(root)
        os.environ["LORIS_MM_FIXTURES"] = root
        for name, fn in runners.items():
            try:
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite").save()
                cold = time.perf_counter() - t0
                t1 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite").save()
                warm = time.perf_counter() - t1
                results[name][label] = round(warm, 3)
                results[name][f"cold_{label}"] = round(cold, 3)
            except Exception as exc:  # noqa: BLE001
                print(f"media-bench: {name}@sf{label} failed: {exc!r}",
                      file=sys.stderr)
                results[name][label] = -1.0
            print(f"sf{label} (x{ratio}) {name}: "
                  f"{results[name].get(label)}s", flush=True)
    os.environ.pop("LORIS_MM_FIXTURES", None)

    # Finding-4 guard: the input must actually scale (~Kx bytes per tier)
    b1, b10, b100 = (tier_bytes.get(k, 0) for k in ("1", "10", "100"))
    input_scaled = (
        b1 > 0 and 8.0 < b10 / b1 < 12.0 and 8.0 < b100 / b10 < 12.0
    )
    if not input_scaled:
        print(f"media-bench: INPUT DID NOT SCALE: {tier_bytes}",
              file=sys.stderr)

    summary = {}
    for name, r in results.items():
        t1x, t10x, t100x = r.get("1", -1), r.get("10", -1), r.get("100", -1)
        if min(t1x, t10x, t100x) <= 0:
            summary[name] = {"status": "failed", **r}
            continue
        summary[name] = {
            "warm_sf1_sec": t1x,
            "warm_sf10_sec": t10x,
            "warm_sf100_sec": t100x,
            "ratio_10x_to_100x": round(t100x / t10x, 2),
            "exponent_10_to_100": round(
                math.log(t100x / t10x) / math.log(10), 3
            ),
            "super_linear": bool(t100x / t10x > 13.0),
        }
    out = {
        "data_ratios": [1, 10, 100],
        "input_bytes_per_tier": tier_bytes,
        "input_scaled": input_scaled,
        "queries": summary,
        "super_linear": sorted(
            n for n, s in summary.items() if s.get("super_linear")
        ),
    }
    path = Path(_REPO, "BENCH_SF1.json")
    doc = json.loads(path.read_text())
    prev = doc.get("media_extension", {})
    merged_queries = dict(prev.get("queries", {}))
    merged_queries.update(out["queries"])
    out["queries"] = merged_queries
    out["super_linear"] = sorted(
        n for n, s in merged_queries.items() if s.get("super_linear")
    )
    doc["media_extension"] = out
    path.write_text(json.dumps(doc, indent=1))
    print(json.dumps({"media_extension": out}))
    spark.stop()


if __name__ == "__main__":
    main()
