"""Protocol identification — the reference's most important computation
(SURVEY §2.3 J7; `uploadNeuroDB/NeuroDB/MRI.pm:307-526`,
`python/lib/imaging.py:555-704`).

Semantics re-expressed Spark-first:

- Every scan row is matched against a small rule table where each rule has
  up to N simultaneous ``[min,max]`` range conditions (NULL bound = open),
  exact-or-NULL (wildcard) equality conditions, and optional regex
  conditions that short-circuit the ranges (`MRI.pm:481-484`).
- NULL three-valued logic follows ``in_range`` exactly
  (`imaging.py:1261-1299`): both bounds NULL = unrestricted; a bound set but
  the scan value NULL = no match.
- First-match priority: rules are ordered (`ORDER BY CenterID ASC,
  ScannerID DESC` in `MRI.pm:397`); the first matching rule wins.

Physical strategy: the rule table is O(10..1000) rows even in production,
so this is a **broadcast non-equi join** (a BroadcastNestedLoopJoin over
scans x rules with all conditions applied in the join predicate, i.e. one
pass over the scan table, no shuffle of the big side), followed by a
``row_number`` window partitioned by the scan key to pick the first match.
The window shuffles only (scan_key, rule_id, priority) -- project before the
window so the shuffle payload is minimal. At 100 TB of scans this plan reads
the scan table once and shuffles a few columns; the per-file Perl loop in the
reference becomes a single distributed pass.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from loris_mri_spark.functions.predicates import (
    in_range,
    regex_or_wildcard,
    wildcard_eq,
)


@dataclass(frozen=True)
class RangeSpec:
    """One [min,max] condition: scan column vs rule bound columns."""

    value_col: str
    min_col: str
    max_col: str


@dataclass(frozen=True)
class ExactSpec:
    """Exact-or-wildcard condition (NULL rule value matches anything)."""

    value_col: str
    rule_col: str


@dataclass(frozen=True)
class RegexSpec:
    """Case-insensitive regex-or-wildcard condition."""

    value_col: str
    pattern_col: str


def _match_condition(
    ranges: Sequence[RangeSpec],
    exacts: Sequence[ExactSpec],
    regexes: Sequence[RegexSpec],
) -> Column:
    cond = F.lit(True)
    for spec in exacts:
        cond = cond & wildcard_eq(F.col(f"r.{spec.rule_col}"), F.col(f"s.{spec.value_col}"))
    for spec in regexes:
        cond = cond & regex_or_wildcard(
            F.col(f"s.{spec.value_col}"), F.col(f"r.{spec.pattern_col}")
        )
    for spec in ranges:
        cond = cond & in_range(
            F.col(f"s.{spec.value_col}"),
            F.col(f"r.{spec.min_col}"),
            F.col(f"r.{spec.max_col}"),
        )
    return cond


def identify_protocol(
    scans: DataFrame,
    rules: DataFrame,
    scan_key: Sequence[str],
    ranges: Sequence[RangeSpec] = (),
    exacts: Sequence[ExactSpec] = (),
    regexes: Sequence[RegexSpec] = (),
    priority: Sequence[Column] | None = None,
    rule_output_cols: Sequence[str] = ("scan_type",),
    unmatched_label: str | None = "unidentified",
    label_col: str = "scan_type",
) -> DataFrame:
    """Match every scan against the rule table; first match (by ``priority``)
    wins; unmatched scans keep their row with ``label_col`` =
    ``unmatched_label`` (the caller routes those to the violation sink, as
    `imaging.py:235-301` does).

    Returns ``scans`` columns + ``rule_output_cols`` (+ ``rule_id`` if
    present in rules).
    """
    s = scans.alias("s")
    r = F.broadcast(rules).alias("r")
    cond = _match_condition(ranges, exacts, regexes)

    matched = s.join(r, cond, "inner")
    # Keep the window shuffle narrow: only scan key + rule outputs survive.
    out_cols = [F.col(f"s.{k}") for k in scan_key] + [
        F.col(f"r.{c}") for c in rule_output_cols
    ]
    order = list(priority) if priority is not None else [F.col("r.rule_id").asc()]
    w = Window.partitionBy(*[F.col(f"s.{k}") for k in scan_key]).orderBy(*order)
    first_match = (
        matched.select(*out_cols, F.row_number().over(w).alias("__rn"))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    joined = scans.join(first_match, on=list(scan_key), how="left")
    if unmatched_label is not None:
        joined = joined.withColumn(
            label_col, F.coalesce(F.col(label_col), F.lit(unmatched_label))
        )
    return joined
