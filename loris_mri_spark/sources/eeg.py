"""EEG raw reader (EDF) — SURVEY §2.1 S7.

Reference: MNE-based loaders produce per-channel float arrays + times
(`/root/reference/python/loris_ephys_chunker/src/loris_ephys_chunker/chunking.py:160-213`;
dispatch `python/lib/physio/chunking.py:29-41`). EDF (the most common raw
EEG interchange format) is a PUBLIC fixed-width-ASCII-header + int16-LE
format, so the engine parses it with stdlib only; CTF/EEGLAB readers plug
into the same source via an injected loader callback (they need MNE,
which this runtime does not ship).

Spark-first shape: binaryFile + mapInPandas, one output row per channel
carrying the channel's sample array — ready for the ephys chunk pyramid
(workload/signals.py) and A7 range aggregation.
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

EDF_CHANNEL_SCHEMA = (
    "path string, channel_idx int, label string, phys_dim string, "
    "n_records int, samples_per_record int, n_samples long, "
    "dig_min long, dig_max long, samples array<double>"
)


def parse_edf_bytes(content: bytes) -> list[dict[str, Any]]:
    """Parse an EDF byte stream into per-channel rows (header fields per
    the public EDF spec; samples decoded from int16 LE records)."""

    def ascii_at(off: int, n: int) -> str:
        return content[off : off + n].decode("ascii", "replace").strip()

    try:
        n_records = int(ascii_at(236, 8))
        ns = int(ascii_at(252, 4))
    except ValueError:
        return []
    base = 256
    labels = [ascii_at(base + 16 * c, 16) for c in range(ns)]
    off = base + ns * (16 + 80)
    phys_dims = [ascii_at(off + 8 * c, 8) for c in range(ns)]
    off = base + ns * (16 + 80 + 8 + 8 + 8 + 8 + 8 + 80)
    sprs = [int(ascii_at(off + 8 * c, 8)) for c in range(ns)]
    header_bytes = int(ascii_at(184, 8))

    record_len = sum(sprs)
    rows: list[dict[str, Any]] = []
    per_channel: list[list[int]] = [[] for _ in range(ns)]
    pos = header_bytes
    for _ in range(n_records):
        # A truncated final record (partial write, interrupted transfer) is
        # dropped rather than raising struct.error mid-scan.
        if pos + 2 * record_len > len(content):
            break
        for c in range(ns):
            cnt = sprs[c]
            vals = struct.unpack_from(f"<{cnt}h", content, pos)
            per_channel[c].extend(vals)
            pos += 2 * cnt
    for c in range(ns):
        s = per_channel[c]
        rows.append(
            {
                "channel_idx": c,
                "label": labels[c],
                "phys_dim": phys_dims[c],
                "n_records": n_records,
                "samples_per_record": sprs[c],
                "n_samples": len(s),
                "dig_min": min(s) if s else None,
                "dig_max": max(s) if s else None,
                "samples": [float(v) for v in s],
            }
        )
    return rows


def _parse_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [c.split(" ")[0] for c in EDF_CHANNEL_SCHEMA.split(", ")]
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            for r in parse_edf_bytes(bytes(content)):
                rows.append({"path": path, **r})
        yield pd.DataFrame(rows, columns=cols)


def read_edf_channels(spark: SparkSession, path_glob: str) -> DataFrame:
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.edf")
        .option("recursiveFileLookup", "true")
        .load(path_glob)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_partition, schema=EDF_CHANNEL_SCHEMA)
