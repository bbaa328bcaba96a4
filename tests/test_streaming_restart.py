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


def test_t16_compaction_preserves_drained_pairs(spark, sf_dir):
    """t16_compact_stores folds the bid=N band/shingle deltas into one
    versioned snapshot; a drain with a MID-RUN compaction must produce
    exactly the pairs of the uncompacted drain, and the delta listing
    must actually shrink to zero at the compaction point."""
    import os

    from pyspark.sql import functions as F

    from loris_mri_spark.catalog import load_table
    from loris_mri_spark.streaming.incremental import scratch_dir
    from loris_mri_spark.workload.streaming_ops import (
        _t16_detect_batch,
        t16_compact_stores,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def drain(compact_after: "int | None") -> set:
        band = scratch_dir("t16test-bands")
        sh = scratch_dir("t16test-sh")
        sink = scratch_dir("t16test-pairs")
        for b in range(5):
            _t16_detect_batch(
                docs.filter(F.col("doc_id") % 5 == b), b, band, sh, sink
            )
            if compact_after == b:
                assert t16_compact_stores(spark, band) >= 0
                assert t16_compact_stores(spark, sh) >= 0
                for store in (band, sh):
                    assert not any(
                        d.startswith("bid=") for d in os.listdir(store)
                    )
        return {
            tuple(r)
            for r in spark.read.parquet(sink).drop("bid").collect()
        }

    base = drain(None)
    compacted = drain(2)
    assert base, "expected non-empty near-dup pairs"
    assert compacted == base
