"""The Observation API: production pipelines attach named metrics to a
plan and read them after the action — monitoring without a second scan.
Pins that observed metrics equal the equivalent aggregation."""

from __future__ import annotations


def test_observation_metrics_match_aggregation(spark, sf_dir):
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from loris_mri_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("li_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(14,2)")).alias("qty"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_disc"),
    )
    # one action drives both the pipeline AND the metrics
    n_out = observed.filter(F.col("l_quantity") > 25).count()

    direct = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(14,2)")).alias("qty"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_disc"),
    ).first()
    got = obs.get
    assert got["n_rows"] == direct["n_rows"]
    assert got["qty"] == direct["qty"]
    assert got["n_disc"] == direct["n_disc"]
    assert 0 < n_out < got["n_rows"]
