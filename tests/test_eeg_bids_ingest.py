"""pipeline_eeg_bids_ingest robustness: the schema-free events TSV parse
must survive ragged rows (the repo-wide classify-don't-fail norm) — a
row with missing trailing cells zips as null fields, a row with extra
cells truncates to the header, and a cell-less fragment without an
onset is classified out; none of them may kill the scan task."""

from __future__ import annotations

import hashlib
import os
import shutil


def test_chunked_blake2b_matches_whole_file(tmp_path):
    """The r13 streaming hash (8 MiB chunked reads) must produce the
    exact digest of a whole-file read — proven with a chunk size far
    smaller than the file, so the multi-block path actually runs."""
    import pandas as pd

    from loris_mri_spark.workload.pipeline import (
        _blake2b_stream_partition,
        _iter_file_chunks,
    )

    p = tmp_path / "rec.meg4"
    data = bytes(range(256)) * 1000  # 256 kB
    p.write_bytes(data)
    uri = "file:" + str(p)

    blocks = list(_iter_file_chunks(uri, chunk=1024))
    assert len(blocks) == 250  # 256000 B / 1024 — genuinely chunked
    assert b"".join(blocks) == data

    [out] = list(
        _blake2b_stream_partition(
            iter([pd.DataFrame({
                "fname": ["rec.meg4"], "sub": ["sub-01"],
                "ext": ["meg4"], "path": [uri],
            })])
        )
    )
    assert out["b2b"].iloc[0] == hashlib.blake2b(
        data, digest_size=32
    ).hexdigest()
    assert "path" not in out.columns


def test_ragged_events_rows_classified_not_fatal(
    spark, sf_dir, tmp_path, monkeypatch
):
    from loris_mri_spark.workload.pipeline import (
        _bids_eeg_dir,
        pipeline_eeg_bids_ingest,
    )

    src = _bids_eeg_dir()
    tree = tmp_path / "bids_eeg"
    shutil.copytree(src, tree)
    ev = tree / "sub-01" / "eeg" / "sub-01_task-rest_events.tsv"
    with open(ev, "a") as fh:
        # fewer cells than the header (onset/duration only)
        fh.write("9.0\t0.1\n")
        # more cells than the header (two stray extras)
        fh.write("9.5\t0.1\tgo\tn/a\timg9.png\tstray1\tstray2\n")
        # fragment with no usable onset column structure
        fh.write("\t\n")

    monkeypatch.setenv("LORIS_BIDS_EEG_FIXTURES", str(tree))
    rows = pipeline_eeg_bids_ingest(spark, sf_dir).collect()

    ents = {(r.kind, r.entity, r.name): r.value for r in rows}
    # the well-formed fixture rows are untouched
    assert ents[("event", "sub-01:0.5", "trial_type")] == "go"
    # fewer-cells row: kept, trial_type padded to null -> no
    # trial_type value row for it, but its duration row exists
    assert ents[("event", "sub-01:9.0", "duration")] == "0.1"
    assert ("event", "sub-01:9.0", "trial_type") not in ents
    # more-cells row: truncated to the header and kept
    assert ents[("event", "sub-01:9.5", "trial_type")] == "go"
    # the no-onset fragment produced nothing: '\t' splits to ['',''],
    # so its padded onset is '' (non-null!) — the usable-onset gate must
    # classify it out, not mint a spurious 'sub-01:' entity
    assert ("event", "sub-01:", "duration") not in ents
    assert not any(e == "sub-01:" for _, e, _ in ents)
    # file classifications unchanged by the ragged tail
    assert ents[("file", "sub-01_task-rest_eeg.edf", "status")] == "inserted"
    assert (
        ents[("file", "sub-04_task-rest_eeg.vhdr", "status")]
        == "candidate_not_found"
    )
