"""Schema-drift contract for the events catalog (round-3 postmortem).

The driver's testdata changed ``events.ts`` from parquet TIMESTAMP(NANOS)
to ``timestamp[us]`` between rounds and silently broke every ``ts_ns``
consumer. This test pins the catalog contract: whatever physical type the
parquet was written with — int64 nanos, µs with isAdjustedToUTC=false
(NTZ-inferred), or µs read as plain TIMESTAMP — both the batch path
(`catalog.load_table`) and the streaming path
(`streaming.incremental.stream_events`) must expose

    ts_ns : long       (exact stored value in nanoseconds)
    ts    : timestamp  (µs truncation, for windows / watermarks)

with identical values across eras. Removing the normalization shim in
`catalog.normalize_events` must turn this file red for at least one era.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from loris_mri_spark.catalog import load_table
from loris_mri_spark.streaming.incremental import run_to_memory, stream_events

# Exact µs instants (UTC wall clock as written by the generator).
_US = [1704067200000000, 1704067201500000, 1704153599999999]


def _write_events(path: str, ts_type: pa.DataType) -> None:
    if ts_type.unit == "ns":
        ts = pa.array([u * 1000 for u in _US], pa.int64()).cast(ts_type)
    else:
        ts = pa.array(_US, pa.int64()).cast(ts_type)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "event_type": pa.array(["a", "b", "a"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"], pa.string()),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # version="2.6": parquet's TIMESTAMP(NANOS) era — the 2.4 default would
    # silently coerce ns to µs and the legacy branch would never be hit.
    pq.write_table(tbl, path, version="2.6")


ERAS = {
    # round-1/2 era: TIMESTAMP(NANOS) — Spark reads as bigint via nanosAsLong
    "nanos": pa.timestamp("ns"),
    # round-3+ era: timestamp[us], isAdjustedToUTC=false → NTZ-inferrable
    "micros": pa.timestamp("us"),
    # µs adjusted to UTC → always plain TIMESTAMP for Spark
    "micros_utc": pa.timestamp("us", tz="UTC"),
}


@pytest.fixture(params=sorted(ERAS), scope="module")
def era_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"events-era-{request.param}")
    _write_events(str(d / "events.parquet"), ERAS[request.param])
    return str(d)


def test_load_table_contract(spark, era_dir):
    df = load_table(spark, era_dir, "events")
    dt = dict(df.dtypes)
    assert dt["ts_ns"] == "bigint"
    assert dt["ts"] == "timestamp"
    got = {r["event_id"]: r["ts_ns"] for r in df.collect()}
    assert got == {i + 1: u * 1000 for i, u in enumerate(_US)}


def test_stream_events_contract(spark, era_dir):
    sdf = stream_events(spark, era_dir, tag=f"contract-{os.path.basename(era_dir)}")
    dt = dict(sdf.dtypes)
    assert dt["ts_ns"] == "bigint"
    assert dt["ts"] == "timestamp"
    out = run_to_memory(
        sdf.select("event_id", "ts_ns", "ts"), "append", "contract"
    )
    got = {r["event_id"]: r["ts_ns"] for r in out.collect()}
    assert got == {i + 1: u * 1000 for i, u in enumerate(_US)}


def test_ts_ns_is_timezone_independent(spark, era_dir):
    """ts_ns must equal the raw stored micros x 1000 under ANY session
    timezone (the NTZ branch uses pure datetime arithmetic; the driver's
    DuckDB oracle compares against naive epoch_us)."""
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, era_dir, "events")
        got = {r["event_id"]: r["ts_ns"] for r in df.select("event_id", "ts_ns").collect()}
        assert got == {i + 1: u * 1000 for i, u in enumerate(_US)}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_corpus_tables_expected_columns(spark, sf_dir):
    """Drift tripwire for the corpus tables (the events postmortem's
    lesson applied forward): the text/dedup/vector workloads assume these
    column names and Spark types. A driver testdata refresh that changes
    them should fail HERE with a message naming the assumption, not
    deep inside a query plan."""
    want = {
        "documents": {
            "doc_id": "bigint",
            "text": "string",
            "n_chars": {"bigint", "int"},
        },
        "embeddings": {
            "vec_id": "bigint",
            "embedding": {"array<float>", "array<double>"},
            "label": {"int", "bigint"},
        },
    }
    for table, cols in want.items():
        df = load_table(spark, sf_dir, table)
        got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for col, typ in cols.items():
            assert col in got, f"{table}.{col} missing (testdata drift?)"
            allowed = typ if isinstance(typ, set) else {typ}
            assert got[col] in allowed, (
                f"{table}.{col} is {got[col]}, expected one of {allowed} — "
                "update the corpus workloads' assumptions if this is a "
                "deliberate testdata refresh"
            )
