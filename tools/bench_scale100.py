"""Extend the scale curve to 100x: run the scale-critical subset at
10x / 30x / 100x data (.scale/sf1, sf3, sf10 — run
`tools/make_scale_data.py 3 10 30 100` first) and merge warm timings
into BENCH_SF1.json under `sf10_extension`.

Two full decades (1x -> 100x lives in SCALE.md's main table + this) is
the strongest growth evidence a single host can produce; exponents are
fit on the 10x -> 100x decade where fixed overhead has amortized away.

SemDeDup runs in its production configuration only (k ~ sqrt(n),
Arrow trainer flat + two-level): the oracle-pinned fixed k=8 exists for
driver bit-parity and its per-cell n^2/k^2 matrices are exactly what
the cellstats guard + raise-k remedy exclude at corpus scale.

Usage: python tools/bench_scale100.py   (~45-70 min on local[32])
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

SF10_QUERIES = [
    "dedup_exact",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_winnow_pairs",
    "dedup_simhash",
    "ann_ivf_kmeans_topk",
    "ann_cosine_topk_exact",
    "text_bm25_topk",
    "text_quality_classifier",
    "corpus_global_shuffle",
    "pipeline_corpus_select",
    "pipeline_pretraining_data",
    "split_cluster_safe",
    "graph_triangle_count",
    "j9_transitive_closure",
]

SF_DIRS = [
    ("1", str(Path(_REPO, ".scale", "sf1")), 10),
    ("3", str(Path(_REPO, ".scale", "sf3")), 30),
    ("10", str(Path(_REPO, ".scale", "sf10")), 100),
]


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from loris_mri_spark.session import get_spark

    spark = get_spark(
        app_name="loris-mri-spark-bench-sf10",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loris_mri_spark import workload
    from loris_mri_spark.catalog import TESTDATA_TABLES, load_table
    from loris_mri_spark.workload.vectors import dedup_semdedup

    workload.load_all()

    def n_rows(sf_dir: str) -> int:
        import pyarrow.parquet as pq

        return pq.read_metadata(
            os.path.join(sf_dir, "embeddings.parquet")
        ).num_rows

    def sqrtk_flat(s, d):  # noqa: ANN001
        return dedup_semdedup(
            s, d, n_cells=int(math.sqrt(n_rows(d))), use_arrow_trainer=True
        )

    def sqrtk_two_level(s, d):  # noqa: ANN001
        return dedup_semdedup(
            s, d, n_cells=int(math.sqrt(n_rows(d))), two_level=True
        )

    runners = {name: workload.QUERIES[name] for name in SF10_QUERIES}
    runners["dedup_semdedup_sqrtk"] = sqrtk_flat
    runners["dedup_semdedup_twolevel"] = sqrtk_two_level

    results: dict[str, dict[str, float]] = {n: {} for n in runners}
    for sf_label, sf_dir, ratio in SF_DIRS:
        if not os.path.isdir(sf_dir):
            print(f"missing {sf_dir}; run tools/make_scale_data.py first",
                  file=sys.stderr)
            sys.exit(2)
        for t in TESTDATA_TABLES:
            if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
                load_table(spark, sf_dir, t).write.format("noop").mode(
                    "overwrite"
                ).save()
        for name, fn in runners.items():
            try:
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                cold = time.perf_counter() - t0
                t1 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                warm = time.perf_counter() - t1
                results[name][sf_label] = round(warm, 3)
                results[name][f"cold_{sf_label}"] = round(cold, 3)
            except Exception as exc:  # noqa: BLE001
                print(f"sf10-bench: {name}@sf{sf_label} failed: {exc!r}",
                      file=sys.stderr)
                results[name][sf_label] = -1.0
            print(f"sf{sf_label} (x{ratio}) {name}: "
                  f"{results[name].get(sf_label)}s", flush=True)

    summary = {}
    for name, r in results.items():
        t10, t30, t100 = r.get("1", -1), r.get("3", -1), r.get("10", -1)
        if min(t10, t30, t100) <= 0:
            summary[name] = {"status": "failed", **r}
            continue
        summary[name] = {
            "warm_sf1_sec": t10,
            "warm_sf3_sec": t30,
            "warm_sf10_sec": t100,
            "ratio_10x_to_100x": round(t100 / t10, 2),
            "exponent_10_to_100": round(
                math.log(t100 / t10) / math.log(10), 3
            ),
            "super_linear": bool(t100 / t10 > 13.0),
        }
    out = {
        "data_ratios": [10, 30, 100],
        "queries": summary,
        "super_linear": sorted(
            n for n, s in summary.items() if s.get("super_linear")
        ),
    }
    path = Path(_REPO, "BENCH_SF1.json")
    doc = json.loads(path.read_text())
    doc["sf10_extension"] = out
    path.write_text(json.dumps(doc, indent=1))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
