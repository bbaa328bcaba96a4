"""HLL profile estimates must land within the configured rsd of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from loris_mri_spark import workload
from loris_mri_spark.catalog import load_table

workload.load_all()


def test_approx_distinct_within_rsd(spark, sf_dir):
    approx = workload.QUERIES["profile_approx_distinct"](spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("o"),
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_suppkey").alias("s"),
    ).first()
    for a, e in [
        (approx["approx_orders"], exact["o"]),
        (approx["approx_parts"], exact["p"]),
        (approx["approx_supps"], exact["s"]),
    ]:
        assert abs(a - e) / e < 0.1, (a, e)
