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


def test_entry_smoke(spark):
    import __spark_entry__ as se

    out = se.entry(spark)
    assert out.count() > 0


def test_registry_consistency():
    import __spark_entry__ as se

    qs, os_ = se.queries(), se.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0
