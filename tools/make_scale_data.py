"""Deterministic scale-up of the driver's sf0.1 testdata for the
one-off scale-growth bench (bench_scale.py) — NOT an input to any
correctness query; the driver's own parquet stays the only correctness
input (TESTDATA.md).

Each target scale K replicates every scaled table K times with
copy-decorrelating transforms, so volume grows Kx while the WITHIN-copy
statistical structure (duplicate rate, near-dup geometry, protocol-rule
hit rates) is preserved and CROSS-copy correlation is destroyed — i.e.
the corpus looks like Kx more independent data, not K identical shards:

- documents: doc_id offset per copy; every word of length >= 5 is
  Caesar-rotated by the copy index. All language-ID marker words and the
  quality gate's stopwords are <= 4 chars (workload/text._STOPLISTS), so
  language/quality gate survival, token counts and stop ratios are
  IDENTICAL per copy, while content shingles (which almost always span a
  long word) decorrelate — dedup pair work scales linearly instead of
  exploding quadratically on artificial cross-copy duplicates.
- embeddings: vec_id offset per copy; a copy-keyed sign-flip pattern on
  the dimensions (norm-preserving, cosine-decorrelating; copy 0 is the
  untouched original).
- lineitem / orders: orderkey' = orderkey * K + copy — key density and
  the under-5000-key seed slice stay populated at every scale.
- events: event_id' = event_id + copy*n, user_id' = user_id + copy*1500
  (each copy is a fresh user population, so per-user event density —
  and thus stateful-operator state PER KEY — stays constant while key
  cardinality and volume grow Kx: the realistic growth mode for the
  streaming family; ts is left untouched, so per-instant event density
  grows Kx and watermark state is genuinely Kx bigger). Added in r9 —
  events was previously a byte-identical copy, which made every
  streaming growth curve a flat lie (t6 measured 1.42 s at "10x" and
  1.22 s at "100x" on identical data before this fix caught it).
- all other tables: byte-identical copies of sf0.1 (constant dims stay
  broadcast-sized by design, like TPC-H's nation/region).

Usage: python tools/make_scale_data.py [K ...]   (default: 3 10)
Writes /root/repo/.scale/sfK/{table}.parquet (gitignored).
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
OUT_ROOT = Path(__file__).resolve().parents[1] / ".scale"

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()

COPY_TABLES = [
    "customer", "supplier", "part", "nation", "region",
]

# sf0.1 has 1500 distinct user_ids (0..1499); each copy gets a fresh
# disjoint user block so per-user density is scale-invariant.
EVENTS_USER_STRIDE = 1500


def _rot_sql(text_expr: str, k: int) -> str:
    """Substitution-cipher long words by a copy-keyed alphabet mapping
    (identity for k == 0).

    Copies 1..25 keep the original Caesar rotation by k (so every
    K <= 25 dataset is byte-identical to what this tool first produced
    and the recorded 3x/10x numbers stay comparable); copies >= 26 use
    a seeded GENERAL substitution permutation — Caesar has only 26
    keys, so at K > 26 it silently hands rotation-class copies
    identical text (copy 26 was byte-identical to copy 0!), i.e. the
    exact cross-copy duplicates this transform exists to destroy. A
    26!-key permutation makes every copy distinct at any K."""
    if k == 0:
        return text_expr
    src = LOWER + UPPER
    if k < 26:
        dst = LOWER[k:] + LOWER[:k] + UPPER[k:] + UPPER[:k]
    else:
        import random

        letters = list(LOWER)
        random.Random(k).shuffle(letters)
        low = "".join(letters)
        dst = low + low.upper()
    return (
        "list_aggregate(list_transform(string_split("
        f"{text_expr}, ' '), w -> CASE WHEN length(w) >= 5 THEN "
        f"translate(w, '{src}', '{dst}') ELSE w END), 'string_agg', ' ')"
    )


def scale_documents(con: duckdb.DuckDBPyConnection, k_total: int, out: Path) -> None:
    n = con.sql(f"SELECT COUNT(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    branches = [
        f"SELECT doc_id + {k * n} AS doc_id, {_rot_sql('text', k)} AS text,"
        f" lang, source, n_chars FROM '{SRC}/documents.parquet'"
        for k in range(k_total)
    ]
    con.sql(
        f"COPY ({' UNION ALL '.join(branches)}) TO '{out}/documents.parquet'"
        " (FORMAT PARQUET)"
    )


def scale_embeddings(k_total: int, out: Path) -> None:
    tb = pq.read_table(SRC / "embeddings.parquet")
    vec = np.array(tb.column("embedding").to_pylist(), dtype=np.float32)
    ids = np.array(tb.column("vec_id").to_pylist(), dtype=np.int64)
    labels = np.array(tb.column("label").to_pylist(), dtype=np.int32)
    n, dim = vec.shape
    parts = []
    for k in range(k_total):
        v = vec.copy()
        if k:
            # deterministic, copy-keyed sign flips: norm-preserving,
            # decorrelates cosine across copies. Seeded-rng mask (not a
            # small modular pattern — the previous (i + 3k) % 5 formula
            # had only 5 distinct flip classes, so copies k and k+5 were
            # IDENTICAL, quietly re-introducing the cross-copy exact
            # dups this transform exists to prevent).
            flip = np.random.default_rng(k).random(dim) < 0.5
            v[:, flip] *= -1.0
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + k * n, pa.int64()),
                    "embedding": pa.array(
                        [row.tolist() for row in v], pa.list_(pa.float32())
                    ),
                    "label": pa.array(labels, pa.int32()),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), out / "embeddings.parquet")


def scale_events(
    con: duckdb.DuckDBPyConnection, k_total: int, out: Path
) -> None:
    n = con.sql(f"SELECT COUNT(*) FROM '{SRC}/events.parquet'").fetchone()[0]
    branches = [
        f"SELECT event_id + {k * n} AS event_id, ts,"
        f" user_id + {k * EVENTS_USER_STRIDE} AS user_id,"
        f" event_type, value, props FROM '{SRC}/events.parquet'"
        for k in range(k_total)
    ]
    con.sql(
        f"COPY (SELECT * FROM ({' UNION ALL '.join(branches)})"
        " ORDER BY ts, event_id)"
        f" TO '{out}/events.parquet' (FORMAT PARQUET)"
    )


def scale_orders_lineitem(
    con: duckdb.DuckDBPyConnection, k_total: int, out: Path
) -> None:
    for table, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
            ).fetchall()
        ]
        proj = ", ".join(
            f"{c} * {k_total} + {{k}} AS {c}" if c == key else c for c in cols
        )
        branches = [
            f"SELECT {proj.format(k=k)} FROM '{SRC}/{table}.parquet'"
            for k in range(k_total)
        ]
        con.sql(
            f"COPY ({' UNION ALL '.join(branches)}) TO"
            f" '{out}/{table}.parquet' (FORMAT PARQUET)"
        )


def main() -> None:
    ks = [int(x) for x in (sys.argv[1:] or ["3", "10"])]
    con = duckdb.connect()
    for k_total in ks:
        sf = k_total / 10
        out = OUT_ROOT / (f"sf{sf:g}")
        out.mkdir(parents=True, exist_ok=True)
        scale_documents(con, k_total, out)
        scale_embeddings(k_total, out)
        scale_orders_lineitem(con, k_total, out)
        scale_events(con, k_total, out)
        for t in COPY_TABLES:
            shutil.copyfile(SRC / f"{t}.parquet", out / f"{t}.parquet")
        print(f"wrote {out} (x{k_total} of sf0.1)")


if __name__ == "__main__":
    main()
