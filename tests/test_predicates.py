"""Exhaustive-grid semantics tests for the rule-predicate expressions —
the three-valued logic SURVEY §7.3 flags as easiest to get subtly wrong.
Every (value, lo, hi) combination over {NULL, -1, 0, 1, 2} is compared
against an independent Python model in ONE Spark job."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from loris_mri_spark.functions.predicates import in_range, wildcard_eq
from loris_mri_spark.operators.asof_join import asof_join

VALS = [None, -1.0, 0.0, 1.0, 2.0]


def _py_in_range(v, lo, hi):
    # Engine contract: NULL is the only wildcard (zero is a real bound —
    # the documented divergence from the reference's truthiness check).
    if lo is None and hi is None:
        return True
    if v is None:
        return False
    if lo is not None and v < lo:
        return False
    if hi is not None and v > hi:
        return False
    return True


def test_in_range_grid(spark):
    rows = list(itertools.product(VALS, VALS, VALS))
    schema = StructType(
        [
            StructField("v", DoubleType()),
            StructField("lo", DoubleType()),
            StructField("hi", DoubleType()),
        ]
    )
    df = spark.createDataFrame(rows, schema=schema)
    got = df.select(
        "v", "lo", "hi",
        F.coalesce(in_range("v", "lo", "hi"), F.lit(False)).alias("r"),
    ).collect()
    for r in got:
        assert r["r"] == _py_in_range(r["v"], r["lo"], r["hi"]), (
            r["v"], r["lo"], r["hi"], r["r"],
        )


def test_wildcard_eq_grid(spark):
    rows = list(itertools.product(VALS, VALS))
    schema = StructType(
        [StructField("rule", DoubleType()), StructField("val", DoubleType())]
    )
    df = spark.createDataFrame(rows, schema=schema)
    got = df.select(
        "rule", "val",
        F.coalesce(wildcard_eq("rule", "val"), F.lit(False)).alias("r"),
    ).collect()
    for r in got:
        expect = r["rule"] is None or (r["val"] is not None and r["rule"] == r["val"])
        assert r["r"] == expect, (r["rule"], r["val"], r["r"])


def test_asof_join_vs_bruteforce(spark):
    """asof_join (union + last ignorenulls) vs an independent brute-force
    model on seeded data with ties and duplicate timestamps."""
    import random

    rng = random.Random(42)
    left = [(k, rng.randint(0, 20)) for k in range(60) for _ in range(2)]
    right = [(rng.randint(0, 59), rng.randint(0, 20), rng.randint(0, 999))
             for _ in range(150)]

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], ["lid", "k", "t"]
    )
    rdf = spark.createDataFrame(right, ["k", "t", "payload"])

    out = {
        r["lid"]: r["asof_payload"]
        for r in asof_join(
            ldf, rdf, on=("k",), left_ts="t", right_ts="t",
            value_cols=("payload",), tie_break="payload",
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, p) for (rk, rt, p) in right if rk == k and rt <= t]
        expect = max(cands, key=lambda x: (x[0], x[1]))[1] if cands else None
        assert out[i] == expect, (i, k, t, out[i], expect)
