"""MERGE (upsert) as a relational operator — the warehouse maintenance
primitive (`MERGE INTO target USING source ON key WHEN MATCHED ... WHEN NOT
MATCHED ...`) expressed as one full-outer join, since plain parquet has no
transactional MERGE.

Reference analogue: the get-or-create / update-existing flows
(`python/lib/database_lib/*.py` insert-or-update helpers,
`uploadNeuroDB/NeuroDB/DBI.pm` upsert idioms) — run row-at-a-time against
MySQL there, set-oriented here.

100 TB write path: compute the merged image with this operator, then land
it with dynamic partition overwrite (`sinks.overwrite_partitions`) so only
the partitions the source touches rewrite, or snapshot it immutably with
`catalog.write_versioned` — both already in the engine. The join itself
broadcasts the source when it is small (the common CDC case: a day's
changes vs years of history) and AQE handles a skewed key."""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    when_matched: Mapping[str, Column],
    when_not_matched: Mapping[str, Column],
    when_not_matched_by_source: Mapping[str, Column] | None = None,
    status_col: str | None = None,
) -> DataFrame:
    """Full-outer MERGE: rows in both get ``when_matched`` expressions,
    source-only rows get ``when_not_matched`` (insert image), target-only
    rows get ``when_not_matched_by_source`` (default: the target column of
    the same name if one exists, else NULL). Expressions see the joined
    row (target columns as `t.*`, source columns as `s.*`).

    The output carries EVERY target column: columns not named in any
    expression map pass through unchanged on matched/target-only rows and
    take the same-named source column (or NULL) on inserts — a MERGE
    never silently drops target columns. Columns named only in the maps
    (computed columns absent from the target) are appended.

    ``status_col``: optionally emit 'updated' / 'inserted' / 'unchanged'
    per row, the audit column a CDC pipeline logs."""
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}").eqNullSafe(F.col(f"s.{key}")), "full_outer")
    matched = F.col(f"t.{key}").isNotNull() & F.col(f"s.{key}").isNotNull()
    insert_only = F.col(f"t.{key}").isNull()
    by_source = when_not_matched_by_source or {}

    out_cols = [
        F.coalesce(F.col(f"t.{key}"), F.col(f"s.{key}")).alias(key)
    ]
    mapped = set(when_matched) | set(when_not_matched) | set(by_source)
    names = [c for c in target.columns if c != key] + sorted(
        n for n in mapped if n not in target.columns
    )
    for name in names:
        upd = when_matched.get(name)
        ins = when_not_matched.get(name)
        if ins is None and name in source.columns:
            ins = F.col(f"s.{name}")  # INSERT-image default: same-named col
        passthrough = by_source.get(
            name,
            F.col(f"t.{name}")
            if name in target.columns
            else F.lit(None),
        )
        expr = F.when(matched, upd if upd is not None else passthrough)
        expr = expr.when(
            insert_only, ins if ins is not None else F.lit(None)
        ).otherwise(passthrough)
        out_cols.append(expr.alias(name))
    if status_col:
        out_cols.append(
            F.when(matched, "updated")
            .when(insert_only, "inserted")
            .otherwise("unchanged")
            .alias(status_col)
        )
    return joined.select(*out_cols)
