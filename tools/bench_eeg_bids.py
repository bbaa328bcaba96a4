"""Scale probe for pipeline_eeg_bids_ingest (r12): the capstone is
fixture-bound (6 recordings), so its growth curve comes from cloned-
subject tiers — 10x (60 recordings) and 100x (600) — built by copying
the committed bids_eeg files under fresh subject ids, with
participants.tsv extended to match. The REGISTERED query runs unchanged
against each tier via the LORIS_BIDS_EEG_FIXTURES override (the
LORIS_MM_FIXTURES recipe), so the measured plan is the shipped plan.

Input scaling is real (input_scaled: true): every tier re-lists, re-
parses, re-hashes, and re-joins N times the files; the axis that grows
at production (recording COUNT — each file is independently small) is
exactly the axis cloned.

Usage: python tools/bench_eeg_bids.py   (~2-4 min on local[32])
Writes BENCH_SF1.json key `eeg_bids_probe`.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_SRC = Path(_REPO, "tests", "fixtures", "bids_eeg")


def build_tier(mult: int) -> str:
    """Clone the committed dataset mult times: clone k of source subject
    sub-0i becomes sub-<1000*k+i>, participants rows mirrored (the
    sub-04 analog stays absent so every tier keeps the same error-path
    mix as 1x)."""
    out = Path(_REPO, ".scale", f"bids_eeg_{mult}x")
    if out.exists():
        return str(out)
    tmp = Path(str(out) + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)

    with open(_SRC / "participants.tsv") as fh:
        plines = fh.read().splitlines()
    hdr, prows = plines[0], plines[1:]
    rows_by_sub = {r.split("\t", 1)[0]: r for r in prows}

    out_rows = [hdr]
    for k in range(mult):
        for i in range(1, 7):
            src_sub = f"sub-{i:02d}"
            new_sub = f"sub-{1000 * k + i}"
            srow = rows_by_sub.get(src_sub)
            if srow is not None:
                out_rows.append(new_sub + srow[len(src_sub):])
            src_dir = _SRC / src_sub / "eeg"
            dst_dir = tmp / new_sub / "eeg"
            dst_dir.mkdir(parents=True)
            for n in sorted(os.listdir(src_dir)):
                shutil.copyfile(
                    src_dir / n, dst_dir / n.replace(src_sub, new_sub)
                )
    (tmp / "participants.tsv").write_text("\n".join(out_rows) + "\n")
    shutil.copyfile(
        _SRC / "task-rest_events.json", tmp / "task-rest_events.json"
    )
    tmp.rename(out)
    return str(out)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from loris_mri_spark.session import get_spark

    spark = get_spark(
        app_name="loris-mri-spark-bench-eeg-bids",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loris_mri_spark import workload

    workload.load_all()
    fn = workload.QUERIES["pipeline_eeg_bids_ingest"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run_tier(label: str, fdir: "str | None") -> dict:
        if fdir is None:
            os.environ.pop("LORIS_BIDS_EEG_FIXTURES", None)
        else:
            os.environ["LORIS_BIDS_EEG_FIXTURES"] = fdir
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warms = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warms.append(time.perf_counter() - t0)
        n_files = (
            sum(len(fs) for _, _, fs in os.walk(fdir or str(_SRC))) - 2
        )
        return {
            "warm_median3_sec": round(statistics.median(warms), 3),
            "n_dataset_files": n_files,
        }

    t0 = time.time()
    probe = {
        "input_scaled": True,
        "1x": run_tier("1x", None),
        "10x": run_tier("10x", build_tier(10)),
        "100x": run_tier("100x", build_tier(100)),
    }
    os.environ.pop("LORIS_BIDS_EEG_FIXTURES", None)
    a, b = (
        probe["10x"]["warm_median3_sec"],
        probe["100x"]["warm_median3_sec"],
    )
    import math

    probe["exp_10x_to_100x"] = round(math.log10(max(b / a, 1e-9)), 3)
    probe["wall_sec"] = round(time.time() - t0, 1)

    path = Path(_REPO, "BENCH_SF1.json")
    data = json.loads(path.read_text()) if path.exists() else {}
    data["eeg_bids_probe"] = probe
    path.write_text(json.dumps(data, indent=1))
    print(json.dumps(probe, indent=1))


if __name__ == "__main__":
    main()
