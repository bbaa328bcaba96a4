"""Every registered query with an oracle must match DuckDB on the test
tables — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from loris_mri_spark import workload
from tests.oracle import assert_parity

workload.load_all()

_WITH_ORACLE = sorted(n for n in workload.QUERIES if n in workload.ORACLES)
_ROWS_ONLY = sorted(n for n in workload.QUERIES if n not in workload.ORACLES)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    df = workload.QUERIES[name](spark, sf_dir)
    assert_parity(df, workload.ORACLES[name], sf_dir, name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = workload.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_r14_correctness_window_layout():
    """The external driver hash-checks only the FIRST 50 registry entries.
    Pin the declared r14 window (the 12 r13-optimization-touched queries
    with changed, never-driver-checked trees leading + the R14_QUEUE
    first-check + the displaced R14_TOPUP_FIRST + this round's
    code-changed re-greens + oldest-green rotation) as exactly those
    50 — a late registration must not silently displace a promised
    query. Also pin the hygiene invariants the r7 ADVICE asked for: the
    window and the full priority order are duplicate-free, and every
    priority entry is registered. The window leads with the r13 VERDICT
    what's-wrong item 2 list — r13 VERDICT item 3."""
    first50 = list(workload.QUERIES)[:50]
    assert len(workload.R14_WINDOW) == 50
    assert first50 == workload.R14_WINDOW, [
        (a, b) for a, b in zip(first50, workload.R14_WINDOW) if a != b
    ]
    assert len(set(workload.R14_WINDOW)) == 50
    assert workload.R14_WINDOW[:13] == [
        "dedup_semdedup_twolevel",
        "ann_imi_topk",
        "ann_imi_recall",
        "ann_recall_at_k",
        "ann_sq8_recall",
        "ann_matryoshka_recall",
        "ann_mrr_ndcg",
        "dedup_ngram_jaccard_pairs",
        "j9_transitive_closure",
        "t8_incremental_store_dedup",
        "t11_late_data_drop",
        "pipeline_gdpr_erasure",
        *workload.R14_QUEUE,
    ]
    assert workload.R14_WINDOW[13:19] == workload.R14_TOPUP_FIRST
    assert workload.R14_WINDOW[19:21] == [
        "t16_stream_near_dedup",
        "pipeline_hrrt_insertion",
    ]
    assert len(workload.PRIORITY_ORDER) == len(set(workload.PRIORITY_ORDER))
    unregistered = [
        n for n in workload.PRIORITY_ORDER if n not in workload.QUERIES
    ]
    assert unregistered == []


def test_no_hugeint_oracle_output_columns(sf_dir):
    """DuckDB widens un-cast SUM(BIGINT) to HUGEINT (int128), which the
    external driver's strict value-hasher serializes differently from
    Spark's int64 even when every value is identical (the r5
    dedup_substring_spans red). Guard: no oracle may emit HUGEINT —
    final-output integer aggregates must CAST(... AS BIGINT)."""
    import duckdb

    from loris_mri_spark.catalog import TESTDATA_TABLES, table_path

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    offenders = []
    for name, sql in workload.ORACLES.items():
        rel = con.sql(sql)
        for c, t in zip(rel.columns, rel.types):
            if str(t) in ("HUGEINT", "UHUGEINT"):
                offenders.append((name, c))
    assert offenders == [], offenders


def test_entry_smoke(spark):
    import __spark_entry__ as se

    out = se.entry(spark)
    assert out.count() > 0


def test_registry_consistency():
    import __spark_entry__ as se

    qs, os_ = se.queries(), se.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0


def test_gdpr_roster_dedup_conf_identical_rows(spark, sf_dir):
    """spark.loris.gdpr.rosterDedup=true adds a distinct before the
    erasure roster broadcasts (bounding the driver-side collect to one
    row per distinct user at corpus scale, r13 ADVICE item 1); the
    anti-join tests key membership only, so the erased stores — and the
    query's output — must be bit-identical either way."""
    q = workload.QUERIES["pipeline_gdpr_erasure"]
    base = sorted(map(tuple, q(spark, sf_dir).collect()))
    spark.conf.set("spark.loris.gdpr.rosterDedup", "true")
    try:
        deduped = sorted(map(tuple, q(spark, sf_dir).collect()))
    finally:
        spark.conf.unset("spark.loris.gdpr.rosterDedup")
    assert base == deduped
    assert base
