"""Scale probe for pipeline_mri_bids_import (r13): the capstone is
fixture-bound (8 acquisitions), so its growth curve comes from cloned-
subject tiers — 10x (80) and 100x (800) — built by copying the
committed bids_mri files under fresh subject ids, with participants.tsv
and each scans.tsv rewritten to match. The REGISTERED query runs
unchanged against each tier via the LORIS_MRI_BIDS_FIXTURES override,
so the measured plan is the shipped plan.

Each clone's volumes get a clone-specific byte marker APPENDED after
the gzip stream (header parse unaffected; blake2b distinct), so the
duplicate-hash gate keeps the same per-clone semantics as 1x: within a
clone the sub-03 analog still duplicates the sub-01 analog, but clones
do not collapse into one global duplicate cluster — the inserted count
(and every downstream sidecar/scans/aux join) grows with the tier.

Usage: python tools/bench_mri_bids.py   (~2-4 min on local[32])
Writes BENCH_SF1.json key `mri_bids_probe`.
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

_SRC = Path(_REPO, "tests", "fixtures", "bids_mri")
_SUBS = ["sub-01", "sub-02", "sub-03", "sub-04", "sub-05"]


def build_tier(mult: int) -> str:
    out = Path(_REPO, ".scale", f"bids_mri_{mult}x")
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
        marker = f"#clone{k:05d}".encode()
        for src_sub in _SUBS:
            new_sub = f"sub-{1000 * k + int(src_sub[4:])}"
            srow = rows_by_sub.get(src_sub)
            if srow is not None:
                out_rows.append(new_sub + srow[len(src_sub):])
            src_dir = _SRC / src_sub
            if not src_dir.is_dir():
                continue
            for root, _, files in os.walk(src_dir):
                rel = os.path.relpath(root, src_dir)
                dst_dir = tmp / new_sub / (rel if rel != "." else "")
                dst_dir.mkdir(parents=True, exist_ok=True)
                for n in sorted(files):
                    dst = dst_dir / n.replace(src_sub, new_sub)
                    src = Path(root, n)
                    if n.endswith("_scans.tsv"):
                        dst.write_text(
                            src.read_text().replace(src_sub, new_sub)
                        )
                    elif ".nii" in n:
                        dst.write_bytes(src.read_bytes() + marker)
                    else:
                        shutil.copyfile(src, dst)
    (tmp / "participants.tsv").write_text("\n".join(out_rows) + "\n")
    tmp.rename(out)
    return str(out)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from loris_mri_spark.session import get_spark

    spark = get_spark(
        app_name="loris-mri-spark-bench-mri-bids",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loris_mri_spark import workload

    workload.load_all()
    fn = workload.QUERIES["pipeline_mri_bids_import"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run_tier(fdir: "str | None") -> dict:
        if fdir is None:
            os.environ.pop("LORIS_MRI_BIDS_FIXTURES", None)
        else:
            os.environ["LORIS_MRI_BIDS_FIXTURES"] = fdir
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warms = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warms.append(time.perf_counter() - t0)
        n_files = (
            sum(len(fs) for _, _, fs in os.walk(fdir or str(_SRC))) - 1
        )
        return {
            "warm_median3_sec": round(statistics.median(warms), 3),
            "n_dataset_files": n_files,
        }

    t0 = time.time()
    probe = {
        "input_scaled": True,
        "1x": run_tier(None),
        "10x": run_tier(build_tier(10)),
        "100x": run_tier(build_tier(100)),
    }
    os.environ.pop("LORIS_MRI_BIDS_FIXTURES", None)
    a, b = (
        probe["10x"]["warm_median3_sec"],
        probe["100x"]["warm_median3_sec"],
    )
    import math

    probe["exp_10x_to_100x"] = round(math.log10(max(b / a, 1e-9)), 3)
    probe["wall_sec"] = round(time.time() - t0, 1)

    path = Path(_REPO, "BENCH_SF1.json")
    data = json.loads(path.read_text()) if path.exists() else {}
    data["mri_bids_probe"] = probe
    path.write_text(json.dumps(data, indent=1))
    print(json.dumps(probe, indent=1))


if __name__ == "__main__":
    main()
