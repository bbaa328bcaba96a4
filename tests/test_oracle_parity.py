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


def test_r13_correctness_window_layout():
    """The external driver hash-checks only the FIRST 50 registry entries.
    Pin the declared r13 window (the seven displaced R13_TOPUP_FIRST
    leading + the R13_QUEUE first-check + this round's new MRI-arm
    capstone + code-changed re-greens + oldest-green rotation) as
    exactly those 50 — a late registration must not silently displace a
    promised query. Also pin the hygiene invariants the r7 ADVICE asked
    for: the window and the full priority order are duplicate-free, and
    every priority entry is registered. The window leads with
    R13_TOPUP_FIRST then R13_QUEUE — the r12 VERDICT's item 1."""
    first50 = list(workload.QUERIES)[:50]
    assert len(workload.R13_WINDOW) == 50
    assert first50 == workload.R13_WINDOW, [
        (a, b) for a, b in zip(first50, workload.R13_WINDOW) if a != b
    ]
    assert len(set(workload.R13_WINDOW)) == 50
    assert workload.R13_WINDOW[:7] == workload.R13_TOPUP_FIRST
    assert workload.R13_WINDOW[7:8] == workload.R13_QUEUE
    assert workload.R13_WINDOW[8] == "pipeline_mri_bids_import"
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
