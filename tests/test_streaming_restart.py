"""T12's delta claim: the second drain of the checkpointed query must
process ONLY the newly landed rows — offsets and agg state both recover
from the checkpoint."""

from __future__ import annotations


def test_second_drain_reads_only_the_delta(spark, sf_dir):
    from pyspark.sql import functions as F

    from loris_mri_spark.catalog import load_table
    from loris_mri_spark.workload.streaming_ops import _t12_run

    final, n_run2 = _t12_run(spark, sf_dir)

    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts_ns div 1000").alias("ts_us")
    )
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    cut = lo + (hi - lo) * 9 // 10
    n_delta = ev.filter(F.col("ts_us") >= cut).count()
    n_total = ev.count()

    assert n_run2 == n_delta, (n_run2, n_delta)
    assert n_run2 < n_total / 2
    got = {r.event_type: r.n for r in final.collect()}
    exp = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp
