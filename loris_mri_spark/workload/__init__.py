"""Declared query workload — the engine's public surface for the driver.

Each query is registered with:
  - a Spark implementation  (spark, sf_dir) -> DataFrame
  - an equivalent ANSI-SQL oracle string for DuckDB (or None for
    non-SQL-expressible operators -> the driver runs a rows-only check)

Every entry maps to one or more operators in SURVEY.md §2 (the key encodes
the operator id). Column names/aliases are identical between the Spark plan
and the oracle — the driver's comparator sorts columns by name before
hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a workload query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every workload module so registration side effects run."""
    from loris_mri_spark.workload import (  # noqa: F401
        dedup,
        ingest,
        multimodal,
        pipeline,
        plugin_ops,
        rules,
        relational,
        signals,
        sinkops,
        streaming_ops,
        text,
        vectors,
    )


__all__ = ["QUERIES", "ORACLES", "query", "load_all"]
