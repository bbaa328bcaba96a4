"""Time individual queries with the noop sink in a fresh bench-shaped session.

Usage: python tools/time_query.py <name> [<name> ...] [--runs N]

Mirrors bench.py: local[$SPARK_GRAFT_CPUS], shuffle=2*cpus, shared cache,
warm tables, one cold pass then N warm passes; prints per-query
cold/warm-median/all-runs. For iterating on one optimization without paying
a full bench run.
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

import pandas as pd  # noqa: E402  (module-global: pandas-UDF type hints)

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    args = [
        a
        for a in sys.argv[1:]
        if not a.startswith("--") and not a.isdigit()
    ]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from loris_mri_spark.session import get_spark

    spark = get_spark(
        app_name="time-query",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * int(cpus),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "16g"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.loris.sharedCache", "true")

    from loris_mri_spark import workload

    workload.load_all()

    # Warm tables exactly like bench.py
    from loris_mri_spark.catalog import TESTDATA_TABLES, load_table

    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            load_table(spark, sf_dir, t).write.format("noop").mode(
                "overwrite"
            ).save()

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _noop(x: pd.Series) -> pd.Series:
        return x

    spark.range(10000).select(_noop(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    names = []
    for a in args:
        hits = [n for n in sorted(workload.QUERIES) if a in n]
        exact = [n for n in hits if n == a]
        names.extend(exact or hits)
    for name in names:
        fn = workload.QUERIES[name]
        spark.sparkContext.setJobDescription(f"{name}: cold")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = round(time.perf_counter() - t0, 3)
        warms = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name}: warm {r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warms.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: cold={cold} warm_median={statistics.median(warms)} "
            f"warms={warms}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
