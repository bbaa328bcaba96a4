"""Scale probe for the production BPE tokenize path (r12 VERDICT item
6): text_bpe_tokenize_corpus at 10x/100x (.scale/sf1, .scale/sf10 from
tools/make_scale_data.py), warm median-of-3 — expected shape is
corpus-pass-dominated (two narrow scans + one broadcast join + map-side
combined per-doc agg; the single-task train+encode stage is bounded by
TYPE count, which grows Heaps-sublinearly in corpus size). At 100x the
conf-gated web-scale fallback (spark.loris.bpe.broadcastTypes=false +
auto-broadcast off -> shuffle join on `w`) is measured alongside, so
the documented noisy-crawl plan carries a number, not just a pin.

Usage: python tools/bench_bpe_tokenize.py   (~2-4 min on local[32])
Writes BENCH_SF1.json key `bpe_tokenize_probe`.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from loris_mri_spark.session import get_spark

    spark = get_spark(
        app_name="loris-mri-spark-bench-bpe-tokenize",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from loris_mri_spark import workload

    workload.load_all()
    fn = workload.QUERIES["text_bpe_tokenize_corpus"]

    def timed(sf_dir: str) -> "tuple[float, int]":
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        n_docs = 0
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(spark, sf_dir)
            n_docs = out.count()  # also materializes
            times.append(time.perf_counter() - t0)
        return round(statistics.median(times), 3), n_docs

    t_wall = time.perf_counter()
    probe: dict = {}
    for label, tier in (("1x", None), ("10x", "sf1"), ("100x", "sf10")):
        sf_dir = (
            "/root/testdata/sf0.1"
            if tier is None
            else str(Path(_REPO, ".scale", tier))
        )
        if not os.path.isdir(sf_dir):
            print(f"missing {sf_dir}", file=sys.stderr)
            sys.exit(2)
        med, n_docs = timed(sf_dir)
        probe[label] = {"warm_median3_sec": med, "n_docs": n_docs}
        print(f"{label}: {med}s over {n_docs} docs", flush=True)

    # growth exponent over the decade that matters
    import math

    probe["exp_10x_to_100x"] = round(
        math.log10(
            probe["100x"]["warm_median3_sec"]
            / probe["10x"]["warm_median3_sec"]
        ),
        3,
    )

    # the pinned web-scale fallback, measured at 100x: same query, hint
    # dropped, auto-broadcast off -> shuffle join on `w`
    auto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.loris.bpe.broadcastTypes", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        med, _ = timed(str(Path(_REPO, ".scale", "sf10")))
        probe["100x_shuffle_fallback"] = {"warm_median3_sec": med}
        print(f"100x fallback: {med}s", flush=True)
    finally:
        spark.conf.set("spark.loris.bpe.broadcastTypes", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", auto)

    probe["wall_sec"] = round(time.perf_counter() - t_wall, 1)

    path = Path(_REPO, "BENCH_SF1.json")
    data = json.loads(path.read_text()) if path.exists() else {}
    data["bpe_tokenize_probe"] = probe
    path.write_text(json.dumps(data, indent=1))
    print(json.dumps(probe))
    spark.stop()


if __name__ == "__main__":
    main()
