"""Signal/hash family checks beyond the oracle parity suite."""

from __future__ import annotations

import hashlib

from loris_mri_spark import workload
from loris_mri_spark.catalog import load_table

workload.load_all()


def test_blake2b_matches_hashlib(spark, sf_dir):
    out = {
        r["doc_id"]: r["blake2b"]
        for r in workload.QUERIES["c5_blake2b_hash"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(out) == len(docs)
    for r in docs[:50]:
        expect = hashlib.blake2b(
            r["text"].encode("utf-8"), digest_size=32
        ).hexdigest()
        assert out[r["doc_id"]] == expect


def test_applyinpandas_resample_shape(spark, sf_dir):
    df = workload.QUERIES["c8_applyinpandas_group_resample"](spark, sf_dir)
    rows = df.collect()
    labels = {r["label"] for r in rows}
    # one row per (label, pos 0..63); resampled is constant within pool-4
    assert len(rows) == len(labels) * 64
    by_label = [r for r in rows if r["label"] == min(labels)]
    by_label.sort(key=lambda r: r["pos"])
    for k in range(0, 64, 4):
        vals = {by_label[k + i]["resampled"] for i in range(4)}
        assert len(vals) == 1
