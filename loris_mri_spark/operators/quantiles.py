"""Distributed EXACT quantiles — the scale path for per-group percentile
profiling (SURVEY §2.4 profiling extension).

Spark's builtin ``percentile`` (and any SQL engine's exact quantile)
buffers every value of a group inside ONE aggregation buffer — O(|group|)
memory on a single task, which is the binding constraint when a group has
billions of rows at 100 TB. This operator is COST-BASED: a metadata-sized
per-group count decides whether the builtin is safe (every group under
the buffer threshold — one scan, one shuffle) or the distributed path
must run. The distributed path computes the same exact
linear-interpolated quantiles with NO per-group buffer and NO
materialization of the data:

1. per-group bucket bounds from one ``percentile_approx`` pass, collected
   ONCE. Bucketing each row is then a PURE DETERMINISTIC function of
   (group, value) — an unrolled sum of ``v >= bound_i`` comparisons over
   the broadcast bounds, whole-stage-codegen friendly — so every pass
   over the data buckets rows identically and no checkpoint / cache is
   needed to pin a sampled partitioning. (The round-4 design eagerly
   localCheckpoint-ed a range-sorted copy to freeze
   ``repartitionByRange``'s per-execution sampling: a full extra copy on
   non-reliable executor-local storage at 100 TB, and measurable block
   churn at sf0.1.)
2. count rows per (group, bucket) — a tiny distributed aggregate whose
   result is O(#groups x #buckets). It is collected, and bucket start
   offsets / group totals / per-probe target ranks are computed
   driver-side over that metadata-sized table (the same driver-size
   class as the probe list itself);
3. one more scan ranks rows within each (group, bucket) cell
   (``row_number`` — WindowExec's per-cell buffer is disk-backed and
   bounded by the bucket size, which this operator controls) and a
   broadcast join keeps only the wanted local indices. Entirely
   JVM-side: no Python workers, no Arrow transfer, whole-stage codegen
   end to end;
4. interpolate lo + frac * (hi - lo) — the quantile_cont definition —
   as a DataFrame join, not driver-side arithmetic.

Bucket-approximation quality affects only LOAD BALANCE, never
correctness: ranks are exact counts within exact bucket boundaries.
Rows with equal (group, value) are indistinguishable here (the operator
projects exactly those two columns), so any tie order across
recomputations yields identical picked values.

Wall-clock cost: three scans of a two-column projection (bounds, counts,
pick) + one hash shuffle for the pick sort. Driver traffic is
O(#groups x (#buckets + #probes)) — independent of data size. The
reference has no distributed-percentile analogue (its QA profiling runs
in SQL on MySQL); this is the engine-native replacement.
"""

from __future__ import annotations

import math
from collections import defaultdict
from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles_distributed(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: Sequence[float],
    n_buckets: int = 32,
    group_buffer_threshold: int = 8_000_000,
    force_distributed: bool = False,
    _debug_plans: "dict | None" = None,
) -> DataFrame:
    """Exact linear-interpolated quantiles of ``value_col`` per
    ``group_col``: returns (group, p, quantile). Null values are excluded
    (the builtin ``percentile`` contract).

    Cost-based operator selection: the ONLY reason to avoid the builtin
    ``percentile`` is its O(|group|) single-task aggregation buffer, so
    the operator first runs a per-group count (metadata-sized result). If
    every group fits ``group_buffer_threshold`` values (default 8M ~
    64 MB of doubles per buffer), the builtin runs — one shuffle, one
    scan, identical interpolation. Groups above the threshold take the
    bucketed distributed path. ``force_distributed`` pins the scale path
    (tests pin its bit-equality against the builtin)."""
    spark = df.sparkSession
    data = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("double").alias("v"),
        )
        .filter(F.col("v").isNotNull())
    )
    g_type = data.schema["g"].dataType.simpleString()
    plist = [float(p) for p in probs]

    if not force_distributed:
        totals_rows = data.groupBy("g").agg(F.count("*").alias("n")).collect()
        if totals_rows and all(
            r["n"] <= group_buffer_threshold for r in totals_rows
        ):
            arr = ", ".join(repr(p) for p in plist)
            probs_arr = F.array(*[F.lit(p) for p in plist])
            return (
                data.groupBy("g")
                .agg(F.expr(f"percentile(v, array({arr}))").alias("qs"))
                .select(
                    "g",
                    F.posexplode("qs").alias("i", "quantile"),
                )
                .select(
                    "g",
                    F.element_at(probs_arr, F.col("i") + 1).alias("p"),
                    "quantile",
                )
            )

    # Stage 0: per-group bucket bounds. Collected ONCE and re-broadcast so
    # the bucket function is frozen: percentile_approx's sketch-merge
    # order is not guaranteed deterministic across executions, and the
    # counts pass and the pick pass MUST bucket rows identically.
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds_rows = data.groupBy("g").agg(
        F.percentile_approx("v", qs, 1000).alias("bounds")
    ).collect()
    bounds_df = spark.createDataFrame(
        [(r["g"], [float(x) for x in r["bounds"]]) for r in bounds_rows],
        f"b_g {g_type}, bounds array<double>",
    )
    # bkt = number of bounds <= v: monotone in v, an unrolled sum of
    # comparisons (stays inside whole-stage codegen; the equivalent
    # `aggregate()` fold runs an interpreted lambda per element and
    # measured ~3x slower). The coalesce is NOT defensive nulling — it
    # makes the expression provably NON-NULLABLE, which matters
    # enormously downstream: joining on a nullable computed key makes
    # the optimizer push an isnotnull(<whole 31-term expression>) filter
    # below the projection, duplicating the expression into the bounds
    # join's CONDITION, blowing the generated method past the codegen
    # limit and dropping the entire stage to interpreted execution
    # (measured at 100x/60M rows: the pick pass cost 100 s nullable vs
    # 7 s with this coalesce).
    bkt_expr = F.coalesce(
        reduce(
            lambda a, b: a + b,
            [
                (F.col("v") >= F.col("bounds")[i]).cast("int")
                for i in range(n_buckets - 1)
            ],
        ),
        F.lit(0),
    )
    bucketed = (
        data.join(F.broadcast(bounds_df), data["g"] == bounds_df["b_g"])
        .select("g", "v", bkt_expr.alias("bkt"))
    )

    # Pass 1 (distributed): per-(group, bucket) counts. The aggregate
    # result is metadata-sized — collect it and derive bucket start
    # offsets, group totals, per-probe interpolation params and the
    # needed (bucket, local index) -> global rank table driver-side.
    cells = bucketed.groupBy("g", "bkt").agg(F.count("*").alias("c")).collect()
    per_g: dict = defaultdict(list)
    for r in cells:
        per_g[r["g"]].append((r["bkt"], r["c"]))

    params_recs = []  # (g, p, lo, hi, frac)
    need_recs = []  # (g, bkt, local_idx, rank)
    for g, lst in per_g.items():
        lst.sort()
        n = sum(c for _, c in lst)
        ranks = set()
        for p in probs:
            # Same IEEE ops Catalyst would emit: double*long, floor, sub.
            pos = float(p) * (n - 1)
            lo = math.floor(pos)
            hi = min(lo + 1, n - 1)
            params_recs.append((g, float(p), lo, hi, pos - lo))
            ranks.add(lo)
            ranks.add(hi)
        start = 0
        for bkt, c in lst:
            for rk in ranks:
                if start <= rk < start + c:
                    need_recs.append((g, bkt, rk - start, rk))
            start += c

    params = spark.createDataFrame(
        params_recs, f"g {g_type}, p double, lo long, hi long, frac double"
    )
    needed_df = spark.createDataFrame(
        need_recs, f"n_g {g_type}, n_bkt int, n_idx long, n_rank long"
    )

    # Pick pass, entirely JVM-side: FIRST restrict the scan to the cells
    # that actually contain a wanted rank — at most 2 x #probes cells
    # per group out of #buckets, so the window exchange carries
    # ~#needed/#buckets of the data (measured at 100x / 60M rows x 2
    # probes: 114 s -> the filtered pick below; dropping whole cells
    # cannot change any surviving row's rn because the window partitions
    # BY cell) — then rank within each needed cell (WindowExec's
    # per-cell buffer is disk-backed and bounded by the bucket size
    # n_g/#buckets, which this operator controls — never by group
    # size), and a broadcast join keeps only the wanted local indices.
    # local index + bucket start == global rank.
    needed_cells = needed_df.select(
        F.col("n_g").alias("c_g"), F.col("n_bkt").alias("c_bkt")
    ).distinct()
    w_cell = Window.partitionBy("g", "bkt").orderBy("v")
    picked_schema = f"g {g_type}, rank long, v double"
    picked_scan = (
        bucketed.join(
            F.broadcast(needed_cells),
            on=[
                F.col("g") == F.col("c_g"),
                F.col("bkt") == F.col("c_bkt"),
            ],
            how="leftsemi",
        )
        .withColumn("rn", F.row_number().over(w_cell))
        .join(
            F.broadcast(needed_df),
            on=[
                F.col("g") == F.col("n_g"),
                F.col("bkt") == F.col("n_bkt"),
                F.col("rn") == F.col("n_idx") + 1,
            ],
        )
        .select("g", F.col("n_rank").alias("rank"), "v")
    )
    # picked is O(#groups x #probes x 2) rows. Pin it as a literal so the
    # lo- and hi-side joins below don't each re-run the pick scan (the
    # data itself is deliberately never cached/checkpointed).
    if _debug_plans is not None:
        # test hook: the pick scan is where the nullable-key codegen
        # hazard lives (see bkt_expr comment) — expose its plan so
        # tests/test_plans.py can pin non-duplication
        _debug_plans["picked_scan"] = picked_scan
    picked = spark.createDataFrame(picked_scan.collect(), picked_schema)

    # Interpolate as a join: params x picked(lo) x picked(hi). picked is
    # #groups x #probes rows — broadcast both probes.
    v_lo = picked.select(
        F.col("g").alias("g_lo"), F.col("rank").alias("r_lo"), F.col("v").alias("v_lo")
    )
    v_hi = picked.select(
        F.col("g").alias("g_hi"), F.col("rank").alias("r_hi"), F.col("v").alias("v_hi")
    )
    return (
        params.join(
            F.broadcast(v_lo),
            on=[params["g"] == v_lo["g_lo"], params["lo"] == v_lo["r_lo"]],
        )
        .join(
            F.broadcast(v_hi),
            on=[params["g"] == v_hi["g_hi"], params["hi"] == v_hi["r_hi"]],
        )
        .select(
            "g",
            "p",
            (F.col("v_lo") + F.col("frac") * (F.col("v_hi") - F.col("v_lo"))).alias(
                "quantile"
            ),
        )
    )
