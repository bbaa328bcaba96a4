"""Session-aging root-cause probe (r14, OPTIMIZATION_r14.md §A).

Reproduce the bench's aging dose (run the first N bench-order queries,
cold+warm, in a bench-shaped session), timing SENTINEL queries fresh and
aged, and dump JVM memory-pool / GC stats at both points. Variants via
AGING_VARIANT env:
  base      — exactly the bench session conf
  uioff     — + spark.ui.enabled=false
  codecache — + -XX:ReservedCodeCacheSize=512m
  retain    — + UI retention caps floored (keep UI, drop history)
"""
import json
import os
import statistics
import sys
import time

import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
VARIANT = os.environ.get("AGING_VARIANT", "base")
N_AGE = int(os.environ.get("AGING_N", "55"))

extra = {
    "spark.ui.showConsoleProgress": "false",
    "spark.driver.memory": "16g",
    "spark.cleaner.periodicGC.interval": "5min",
}
if VARIANT == "codecache":
    extra["spark.driver.extraJavaOptions"] = (
        "-XX:ReservedCodeCacheSize=512m"
    )
elif VARIANT == "retain":
    extra.update({
        "spark.ui.retainedJobs": "20",
        "spark.ui.retainedStages": "20",
        "spark.ui.retainedTasks": "100",
        "spark.sql.ui.retainedExecutions": "5",
        "spark.ui.retainedDeadExecutors": "0",
    })

from loris_mri_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name=f"aging-{VARIANT}", master="local[32]",
    shuffle_partitions=64, extra_conf=extra,
)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.loris.sharedCache", "true")

from loris_mri_spark import workload  # noqa: E402

workload.load_all()
from loris_mri_spark.catalog import TESTDATA_TABLES, load_table  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402
from pyspark.sql.types import LongType  # noqa: E402
import pandas as pd  # noqa: E402

for t in TESTDATA_TABLES:
    p = os.path.join(SF_DIR, f"{t}.parquet")
    if os.path.exists(p):
        load_table(spark, SF_DIR, t).write.format("noop").mode(
            "overwrite").save()


@pandas_udf(LongType())
def _noop(x: pd.Series) -> pd.Series:
    return x


spark.range(10000).select(_noop(F.col("id"))).write.format("noop").mode(
    "overwrite").save()


def jvm_stats():
    mf = spark._jvm.java.lang.management.ManagementFactory
    out = {}
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        out[b.getName()] = round(b.getUsage().getUsed() / 2**20, 1)
    git = mf.getGarbageCollectorMXBeans().iterator()
    while git.hasNext():
        g = git.next()
        out[f"GC:{g.getName()}"] = (
            g.getCollectionCount(), round(g.getCollectionTime() / 1000, 1))
    return out


def calib():
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr(
        "sum(id % 1000000) AS s").write.format("noop").mode(
        "overwrite").save()
    return round(time.perf_counter() - t0, 3)


SENTINELS = [
    "j9_transitive_closure", "text_quality_classifier",
    "s12b_versioned_time_travel", "t10_incremental_mv",
    "a6_conditional_counts",
]


def run_q(name):
    t0 = time.perf_counter()
    workload.QUERIES[name](spark, SF_DIR).write.format("noop").mode(
        "overwrite").save()
    return round(time.perf_counter() - t0, 3)


def probe_sentinels(tag):
    res = {}
    for s in SENTINELS:
        run_q(s)  # codegen warm
        res[s] = round(statistics.median(run_q(s) for _ in range(3)), 3)
    print(json.dumps({"tag": tag, "variant": VARIANT, "calib_hot": calib(),
                      "sent": res}), flush=True)
    return res


calib()  # JIT-hot the calib plan
fresh = probe_sentinels("fresh")
print(json.dumps({"jvm_fresh": jvm_stats()}), flush=True)

import gc
import random

names = sorted(workload.QUERIES)
random.Random(12).shuffle(names)
aged_n = 0
t_age0 = time.perf_counter()
for name in names:
    if name in SENTINELS:
        continue
    try:
        run_q(name)
        run_q(name)
    except Exception as e:
        print(f"skip {name}: {e!r}", file=sys.stderr)
    gc.collect()
    aged_n += 1
    if aged_n >= N_AGE:
        break
print(json.dumps({"age_dose_sec": round(time.perf_counter() - t_age0, 1),
                  "n_aged": aged_n}), flush=True)

aged = probe_sentinels("aged")
print(json.dumps({"jvm_aged": jvm_stats()}), flush=True)
print(json.dumps({"variant": VARIANT,
                  "ratios": {s: round(aged[s] / fresh[s], 2)
                             for s in SENTINELS}}), flush=True)
spark.stop()
