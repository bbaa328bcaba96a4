"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``    — every implemented operator from SURVEY.md §2 (and the
                   training-data-pipeline extensions), (spark, sf_dir) -> DF.
``oracle_sql()`` — matching DuckDB SQL per query (omitted only for
                   genuinely non-SQL-expressible operators).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's cwd.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from loris_mri_spark import workload  # noqa: E402

workload.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: protocol identification rollup at sf0.001 — the reference's
    single most important computation (MRI.pm:307-526) as one broadcast
    non-equi join + priority window over the scan table."""
    return workload.QUERIES["j7_scan_type_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(workload.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(workload.ORACLES)
