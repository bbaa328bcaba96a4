from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

# Parity runs at sf0.01 — the same scale the driver's correctness gate uses —
# so the local suite catches what the oracle catches (round-1 lesson).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    """A VANILLA SparkSession, deliberately not session.get_spark(): the
    driver harness builds its own un-tuned session, so the engine must work
    without any session-construction config (round-1 failed exactly here —
    the nanos-timestamp conf lived in get_spark and the driver never saw
    it). Engine-required confs must be set at read time by the engine."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("loris-mri-spark-tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
