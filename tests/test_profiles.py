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


def test_distributed_quantiles_match_builtin(spark, sf_dir):
    """The sort-based distributed exact quantile must equal the builtin
    buffer-based percentile bit-for-bit (same interpolation definition,
    same doubles)."""
    from loris_mri_spark.operators.quantiles import exact_quantiles_distributed

    li = load_table(spark, sf_dir, "lineitem")
    got = {
        (r["g"], r["p"]): r["quantile"]
        for r in exact_quantiles_distributed(
            li, "l_returnflag", "l_quantity", [0.0, 0.25, 0.5, 0.99, 1.0],
            force_distributed=True,
        ).collect()
    }
    # The cost-based auto path (small groups -> builtin percentile) must
    # agree with the forced distributed path bit-for-bit.
    auto = {
        (r["g"], r["p"]): r["quantile"]
        for r in exact_quantiles_distributed(
            li, "l_returnflag", "l_quantity", [0.0, 0.25, 0.5, 0.99, 1.0]
        ).collect()
    }
    assert auto == got
    ref = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_quantity, array(0.0, 0.25, 0.5, 0.99, 1.0))"
        ).alias("qs")
    ).collect()
    checked = 0
    for r in ref:
        for p, want in zip([0.0, 0.25, 0.5, 0.99, 1.0], r["qs"]):
            assert abs(got[(r["l_returnflag"], p)] - want) < 1e-9
            checked += 1
    assert checked >= 15
