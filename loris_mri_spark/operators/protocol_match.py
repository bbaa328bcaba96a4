"""Protocol identification — the reference's most important computation
(SURVEY §2.3 J7; `uploadNeuroDB/NeuroDB/MRI.pm:307-526`,
`python/lib/imaging.py:555-704`).

Semantics re-expressed Spark-first:

- Every scan row is matched against a small rule table where each rule has
  up to N simultaneous ``[min,max]`` range conditions (NULL bound = open),
  exact-or-NULL (wildcard) equality conditions, and optional regex
  conditions (`MRI.pm:481-484`).
- NULL three-valued logic follows ``in_range`` exactly
  (`imaging.py:1261-1299`): both bounds NULL = unrestricted; a bound set but
  the scan value NULL = no match.
- First-match priority: rules are ordered (`ORDER BY CenterID ASC,
  ScannerID DESC` in `MRI.pm:397`); the first matching rule wins, evaluated
  INDEPENDENTLY PER SCAN ROW (the reference matches one file at a time).

Physical strategy (``identify_protocol``, the default): the rule table is
O(10..1000) rows even in production — small enough to inline as an
``array<struct>`` literal in the plan itself. Matching is then
``filter(rules, r -> cond(r, row))`` + ``array_min`` over a
priority-encoded struct: **zero shuffle, zero extra scan, one codegen'd
pass over the scan table**. At 100 TB this is embarrassingly parallel —
each task matches its partition's rows with no exchange at all. (Round-1
used a broadcast join + window + re-join, which scanned the big table twice
and shuffled it once; that form is kept below as
``identify_protocol_windowed`` for rule tables too large to inline.)
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


@dataclass(frozen=True)
class PrioritySpec:
    """One priority key for first-match ordering. ``ascending=False`` is
    supported for numeric columns only (encoded as negation so the match
    list can be reduced with ``array_min``)."""

    col: str
    ascending: bool = True


def _rule_condition(
    rule: Column,
    ranges: Sequence[RangeSpec],
    exacts: Sequence[ExactSpec],
    regexes: Sequence[RegexSpec],
) -> Column:
    """Match condition between one rule struct and the current scan row."""
    cond = F.lit(True)
    for spec in exacts:
        cond = cond & wildcard_eq(rule[spec.rule_col], F.col(spec.value_col))
    for spec in regexes:
        cond = cond & regex_or_wildcard(F.col(spec.value_col), rule[spec.pattern_col])
    for spec in ranges:
        cond = cond & in_range(
            F.col(spec.value_col), rule[spec.min_col], rule[spec.max_col]
        )
    return cond


def identify_protocol(
    scans: DataFrame,
    rules: DataFrame,
    ranges: Sequence[RangeSpec] = (),
    exacts: Sequence[ExactSpec] = (),
    regexes: Sequence[RegexSpec] = (),
    priority: Sequence[PrioritySpec] = (PrioritySpec("rule_id"),),
    rule_output_cols: Sequence[str] = ("scan_type",),
    unmatched_label: str | None = "unidentified",
    label_col: str = "scan_type",
) -> DataFrame:
    """Match every scan row against the rule table; the first matching rule
    (by ``priority``) wins; unmatched rows keep their row with ``label_col``
    = ``unmatched_label`` (the caller routes those to the violation sink, as
    `imaging.py:235-301` does).

    The rule table is collected to the driver and inlined as a literal
    ``array<struct>`` — the same small-side contract as a broadcast join,
    made explicit. Matching + first-match selection run entirely inside
    whole-stage codegen with NO shuffle and ONE scan of ``scans``.

    Returns all ``scans`` columns + ``rule_output_cols``.
    """
    rule_rows = rules.collect()  # small-side contract: O(10..1000) rules
    schema = rules.schema
    rules_arr = F.array(
        *[
            F.struct(
                *[
                    F.lit(row[f.name]).cast(f.dataType).alias(f.name)
                    for f in schema.fields
                ]
            )
            for row in rule_rows
        ]
    )

    def sort_key(rule: Column) -> Column:
        keys = []
        for i, p in enumerate(priority):
            k = rule[p.col] if p.ascending else -rule[p.col]
            keys.append(k.alias(f"__k{i}"))
        payload = [rule[c].alias(c) for c in rule_output_cols]
        return F.struct(*keys, *payload)

    matched = F.filter(rules_arr, lambda r: _rule_condition(r, ranges, exacts, regexes))
    best = F.array_min(F.transform(matched, sort_key))

    out = scans.withColumn("__match", best).select(
        *scans.columns,
        *[F.col("__match")[c].alias(c) for c in rule_output_cols],
    )
    if unmatched_label is not None:
        out = out.withColumn(
            label_col, F.coalesce(F.col(label_col), F.lit(unmatched_label))
        )
    return out


def _match_condition_joined(
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


def identify_protocol_windowed(
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
    """Broadcast-join + window variant, for rule tables too large to inline
    as a plan literal (rare — mri_protocol is O(100) rows in production).

    Semantics differ from ``identify_protocol`` when ``scan_key`` is not
    unique: first-match is selected PER KEY (all rows sharing a key get the
    key's winning rule), not per physical row. Costs one shuffle on
    ``scan_key`` plus a second scan of ``scans`` for the re-join — prefer
    the inline form whenever the rule table fits on the driver.
    """
    s = scans.alias("s")
    r = F.broadcast(rules).alias("r")
    cond = _match_condition_joined(ranges, exacts, regexes)

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
