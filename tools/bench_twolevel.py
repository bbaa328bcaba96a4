"""Measure the two-level quantizer remedy for SemDeDup's raise-k
training cost (SCALE.md: single-level k ~ sqrt(n) assignment is
O(n^1.5), measured as `dedup_semdedup_sqrtk`'s 1.51 tail exponent).

Runs, in ONE session, SemDeDup at k ~ sqrt(n) with (a) the flat
`kmeans_cells_arrow` trainer and (b) `kmeans_cells_two_level`
(k_coarse = k_fine = ceil(sqrt(k)), O(n^1.25) total) at 1x / 10x / 30x
data (sf0.1, .scale/sf1, .scale/sf3 — run tools/make_scale_data.py
first), and merges warm timings into BENCH_SF1.json under
`two_level_remedy`.

Usage: python tools/bench_twolevel.py
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

SF_DIRS = [
    ("0.1", "/root/testdata/sf0.1", 1),
    ("1", str(Path(_REPO, ".scale", "sf1")), 10),
    ("3", str(Path(_REPO, ".scale", "sf3")), 30),
]


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from loris_mri_spark.session import get_spark

    spark = get_spark(
        app_name="loris-mri-spark-bench-twolevel",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loris_mri_spark.workload.vectors import dedup_semdedup

    def n_rows(sf_dir: str) -> int:
        import pyarrow.parquet as pq

        return pq.read_metadata(
            os.path.join(sf_dir, "embeddings.parquet")
        ).num_rows

    variants = {
        "sqrtk_flat": lambda s, d, k: dedup_semdedup(
            s, d, n_cells=k, use_arrow_trainer=True
        ),
        "sqrtk_two_level": lambda s, d, k: dedup_semdedup(
            s, d, n_cells=k, two_level=True
        ),
    }

    out: dict[str, dict] = {}
    for sf_label, sf_dir, ratio in SF_DIRS:
        if not os.path.isdir(sf_dir):
            print(f"missing {sf_dir}; run tools/make_scale_data.py first",
                  file=sys.stderr)
            sys.exit(2)
        k = int(math.sqrt(n_rows(sf_dir)))
        for vname, fn in variants.items():
            rec = out.setdefault(vname, {})
            fn(spark, sf_dir, k).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            fn(spark, sf_dir, k).write.format("noop").mode("overwrite").save()
            rec[f"warm_sf{sf_label}_sec"] = round(time.perf_counter() - t0, 3)
            rec[f"k_sf{sf_label}"] = k
            print(f"sf{sf_label} (x{ratio}, k={k}) {vname}: "
                  f"{rec[f'warm_sf{sf_label}_sec']}s", flush=True)

    for vname, rec in out.items():
        t1, t10, t30 = (rec["warm_sf0.1_sec"], rec["warm_sf1_sec"],
                        rec["warm_sf3_sec"])
        rec["ratio_30x_data"] = round(t30 / t1, 2)
        rec["exponent_1_to_30"] = round(math.log(t30 / t1) / math.log(30), 3)
        rec["exponent_10_to_30"] = round(math.log(t30 / t10) / math.log(3), 3)

    path = Path(_REPO, "BENCH_SF1.json")
    doc = json.loads(path.read_text())
    doc["two_level_remedy"] = out
    path.write_text(json.dumps(doc, indent=1))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
