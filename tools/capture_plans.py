"""Capture .explain('formatted') for every declared query into a directory.

Usage: python tools/capture_plans.py <outdir> [name-substring ...]

Runs on the bench session shape (local[$SPARK_GRAFT_CPUS], shared cache on)
so the captured plans match what bench.py times. Writes <outdir>/<name>.txt
plus a summary TSV with Exchange / join-node / Python-eval counts per query.
"""
from __future__ import annotations

import os
import re
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    outdir = Path(sys.argv[1])
    filters = sys.argv[2:]
    outdir.mkdir(parents=True, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from loris_mri_spark.session import get_spark

    spark = get_spark(
        app_name="capture-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.loris.sharedCache", "true")

    from loris_mri_spark import workload

    workload.load_all()

    names = sorted(workload.QUERIES)
    if filters:
        names = [n for n in names if any(f in n for f in filters)]

    summary = []
    for i, name in enumerate(names):
        try:
            df = workload.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # streaming queries execute on build; skip
            plan = f"PLAN CAPTURE FAILED: {exc!r}"
        (outdir / f"{name}.txt").write_text(plan)
        counts = {
            "exchange": len(re.findall(r"\bExchange\b", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "shj": len(re.findall(r"ShuffledHashJoin", plan)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
            "cart": len(re.findall(r"CartesianProduct", plan)),
            "pyeval": len(re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas"
                r"|FlatMapGroupsInPandas|PythonMapInArrow", plan)),
            "sort": len(re.findall(r"\n.*\bSort\b", plan)),
        }
        summary.append((name, counts))
        print(f"[{i+1}/{len(names)}] {name} {counts}", flush=True)

    with open(outdir / "_summary.tsv", "w") as f:
        f.write("name\texchange\tsmj\tbhj\tshj\tbnlj\tcart\tpyeval\tsort\n")
        for name, c in summary:
            f.write(
                f"{name}\t{c['exchange']}\t{c['smj']}\t{c['bhj']}\t"
                f"{c['shj']}\t{c['bnlj']}\t{c['cart']}\t{c['pyeval']}\t"
                f"{c['sort']}\n"
            )
    spark.stop()


if __name__ == "__main__":
    main()
