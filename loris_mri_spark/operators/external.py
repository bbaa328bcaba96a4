"""External-binary operator — SURVEY §2.1 S16 / §2.10 X3.

Reference: shell out to `dcm2niix`, `noise_estimate`, `mnc2nii`,
`ctf-to-chunks` per file (`/root/reference/python/lib/
dcm2bids_imaging_pipeline_lib/dicom_archive_loader_pipeline.py:146-180`,
`uploadNeuroDB/NeuroDB/MRIProcessingUtility.pm:2166-2167`,
`python/lib/physio/chunking.py:48-57`).

Spark-first shape: `mapInPandas` + subprocess with TASK-LOCAL temp files —
each executor task materializes its rows' payloads into its own scratch
dir, invokes the tool, and maps (exit code, stdout, stderr) back onto the
row. Tool failures become per-row result columns (the caller routes them
to violation sinks), never job failures. At 1000 executors this is the
fan-out the reference approximates with one subprocess per file on one
host.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame


def run_external(
    df: DataFrame,
    cmd_template: Sequence[str],
    content_col: str,
    passthrough_cols: Sequence[str],
    timeout_sec: int = 60,
    suffix: str = ".bin",
) -> DataFrame:
    """Run ``cmd_template`` (with ``{input}`` replaced by a task-local temp
    file holding ``content_col``'s bytes) once per row. Returns the
    passthrough columns + (exit_code, stdout, stderr)."""
    passthrough_cols = list(passthrough_cols)
    in_schema = df.schema
    out_schema = (
        ", ".join(f"{c} {in_schema[c].dataType.simpleString()}" for c in passthrough_cols)
        + ", exit_code int, stdout string, stderr string"
    )
    cmd_list = list(cmd_template)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if row[content_col] is None:
                    # oversized-member inventory rows (sources/archive.py
                    # caps extraction) carry NULL content: classify, don't
                    # crash the task — same per-row failure contract as a
                    # tool error
                    rows.append(
                        {**{c: row[c] for c in passthrough_cols},
                         "exit_code": -2, "stdout": "",
                         "stderr": "content unavailable (oversized member)"}
                    )
                    continue
                fd, tmp = tempfile.mkstemp(suffix=suffix)
                try:
                    with os.fdopen(fd, "wb") as f:
                        f.write(bytes(row[content_col]))
                    cmd = [a.replace("{input}", tmp) for a in cmd_list]
                    try:
                        res = subprocess.run(
                            cmd, capture_output=True, timeout=timeout_sec
                        )
                        rc, out, err = (
                            res.returncode,
                            res.stdout.decode("utf-8", "replace"),
                            res.stderr.decode("utf-8", "replace"),
                        )
                    except (subprocess.TimeoutExpired, OSError) as exc:
                        rc, out, err = -1, "", repr(exc)
                finally:
                    os.unlink(tmp)
                rows.append(
                    {**{c: row[c] for c in passthrough_cols},
                     "exit_code": rc, "stdout": out, "stderr": err}
                )
            yield pd.DataFrame(
                rows,
                columns=passthrough_cols + ["exit_code", "stdout", "stderr"],
            )

    return df.mapInPandas(run, schema=out_schema)
