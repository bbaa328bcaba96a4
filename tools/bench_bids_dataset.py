"""Scale probe for pipeline_bids_dataset_import (r13): the unified
entry-point dispatcher composes both arm capstones, so its growth curve
rides the same cloned-subject tiers the arms use — both env overrides
(LORIS_BIDS_EEG_FIXTURES, LORIS_MRI_BIDS_FIXTURES) point the REGISTERED
query at the 10x/100x trees built by tools/bench_eeg_bids.py and
tools/bench_mri_bids.py (imported here, not reimplemented), so the
measured plan is the shipped plan. Expected shape: the composed cost
tracks the SUM of the arms (their per-file work is shuffle-free and
each join a broadcast dim) plus the metadata-only dispatch listing,
which is a file-listing distinct — rows, not bytes.

Usage: python tools/bench_bids_dataset.py   (~3-5 min on local[32])
Writes BENCH_SF1.json key `bids_dataset_probe`.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
_TOOLS = str(Path(_REPO, "tools"))
if _TOOLS not in sys.path:
    sys.path.insert(0, _TOOLS)

import bench_eeg_bids  # noqa: E402
import bench_mri_bids  # noqa: E402


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from loris_mri_spark.session import get_spark

    spark = get_spark(
        app_name="loris-mri-spark-bench-bids-dataset",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loris_mri_spark import workload

    workload.load_all()
    fn = workload.QUERIES["pipeline_bids_dataset_import"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run_tier(eeg_dir: "str | None", mri_dir: "str | None") -> dict:
        for var, val in (
            ("LORIS_BIDS_EEG_FIXTURES", eeg_dir),
            ("LORIS_MRI_BIDS_FIXTURES", mri_dir),
        ):
            if val is None:
                os.environ.pop(var, None)
            else:
                os.environ[var] = val
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        n_rows = 0
        for _ in range(3):
            t0 = time.perf_counter()
            n_rows = fn(spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
        return {
            "warm_median3_sec": round(statistics.median(times), 3),
            "n_rows": n_rows,
        }

    t_wall = time.perf_counter()
    probe: dict = {
        "input_scaled": True,
        "1x": run_tier(None, None),
        "10x": run_tier(
            bench_eeg_bids.build_tier(10), bench_mri_bids.build_tier(10)
        ),
        "100x": run_tier(
            bench_eeg_bids.build_tier(100),
            bench_mri_bids.build_tier(100),
        ),
    }
    os.environ.pop("LORIS_BIDS_EEG_FIXTURES", None)
    os.environ.pop("LORIS_MRI_BIDS_FIXTURES", None)
    probe["exp_10x_to_100x"] = round(
        math.log10(
            probe["100x"]["warm_median3_sec"]
            / probe["10x"]["warm_median3_sec"]
        ),
        3,
    )
    probe["wall_sec"] = round(time.perf_counter() - t_wall, 1)

    path = Path(_REPO, "BENCH_SF1.json")
    data = json.loads(path.read_text()) if path.exists() else {}
    data["bids_dataset_probe"] = probe
    path.write_text(json.dumps(data, indent=1))
    print(json.dumps(probe))
    spark.stop()


if __name__ == "__main__":
    main()
