"""HLL profile estimates must land within the configured rsd of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from loris_mri_spark import workload
from loris_mri_spark.catalog import load_table

workload.load_all()


def test_approx_distinct_within_rsd(spark, sf_dir):
    row = workload.QUERIES["profile_approx_distinct"](spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("o"),
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_suppkey").alias("s"),
    ).first()
    # The query self-judges the sketch against the exact counts it emits;
    # cross-check its exact counts independently here.
    assert (row["exact_orders"], row["exact_parts"], row["exact_supps"]) == (
        exact["o"], exact["p"], exact["s"],
    )
    assert row["orders_sketch_ok"] and row["parts_sketch_ok"]
    assert row["supps_sketch_ok"]
