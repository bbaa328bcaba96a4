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


def run_external_batched(
    df: DataFrame,
    cmd_template: Sequence[str],
    content_col: str,
    passthrough_cols: Sequence[str],
    timeout_sec: int = 300,
    suffix: str = ".bin",
    batch_size: int = 512,
) -> DataFrame:
    """Batched external-binary operator: ONE subprocess per chunk of up to
    ``batch_size`` rows, for tools that accept many input files in a
    single invocation and emit one output line per file (md5sum-shaped:
    hashers, `file`, `stat`, exif extractors).

    The reference's loop is one process per file
    (`batch_run_pipeline_qc_face_script.pl:178-205`); per-row spawn is
    also what `run_external` does. At fleet scale the spawn dominates
    (fork+exec ~5-15 ms vs ~1 ms of work for small files), so this
    variant amortizes it across the Arrow batch — the same shape Arrow
    batching gives Python UDFs. Semantics preserved per row:
    ``{inputs}`` in ``cmd_template`` expands to the chunk's temp-file
    paths; each output line is matched back to its row by the temp path
    (last whitespace token); rows with no matched line classify as tool
    failures, rows with NULL content classify without exec — a bad row
    never kills the batch, let alone the task."""
    passthrough_cols = list(passthrough_cols)
    in_schema = df.schema
    out_schema = (
        ", ".join(f"{c} {in_schema[c].dataType.simpleString()}" for c in passthrough_cols)
        + ", exit_code int, stdout string, stderr string"
    )
    cmd_list = list(cmd_template)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import shutil

        for pdf in batches:
            rows = []
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                tdir = tempfile.mkdtemp(prefix="lx_batch_")
                tmp_of_row: dict[int, str] = {}
                try:
                    for i, (_, row) in enumerate(chunk.iterrows()):
                        if row[content_col] is None:
                            continue
                        tmp = os.path.join(tdir, f"in-{i:06d}{suffix}")
                        with open(tmp, "wb") as f:
                            f.write(bytes(row[content_col]))
                        tmp_of_row[i] = tmp
                    line_of_tmp: dict[str, str] = {}
                    rc, err = -1, ""
                    if tmp_of_row:
                        cmd: list[str] = []
                        for a in cmd_list:
                            if a == "{inputs}":
                                cmd.extend(tmp_of_row[i] for i in sorted(tmp_of_row))
                            else:
                                cmd.append(a)
                        try:
                            res = subprocess.run(
                                cmd, capture_output=True, timeout=timeout_sec
                            )
                            rc = res.returncode
                            err = res.stderr.decode("utf-8", "replace")
                            for line in res.stdout.decode(
                                "utf-8", "replace"
                            ).splitlines():
                                parts = line.split()
                                if parts:
                                    line_of_tmp[parts[-1]] = line
                        except (subprocess.TimeoutExpired, OSError) as exc:
                            rc, err = -1, repr(exc)
                    for i, (_, row) in enumerate(chunk.iterrows()):
                        base = {c: row[c] for c in passthrough_cols}
                        if i not in tmp_of_row:
                            rows.append(
                                {**base, "exit_code": -2, "stdout": "",
                                 "stderr": "content unavailable (oversized member)"}
                            )
                            continue
                        line = line_of_tmp.get(tmp_of_row[i])
                        if line is not None:
                            rows.append(
                                {**base, "exit_code": 0, "stdout": line,
                                 "stderr": ""}
                            )
                        else:  # tool produced no line for this input
                            rows.append(
                                {**base, "exit_code": rc if rc != 0 else 1,
                                 "stdout": "", "stderr": err}
                            )
                finally:
                    shutil.rmtree(tdir, ignore_errors=True)
            yield pd.DataFrame(
                rows,
                columns=passthrough_cols + ["exit_code", "stdout", "stderr"],
            )

    return df.mapInPandas(run, schema=out_schema)
