"""Distributed EXACT quantiles — the scale path for per-group percentile
profiling (SURVEY §2.4 profiling extension).

Spark's builtin ``percentile`` (and any SQL engine's exact quantile)
buffers every value of a group inside ONE aggregation buffer — O(|group|)
memory on a single task, which is the binding constraint when a group has
billions of rows at 100 TB. This operator computes the same exact
linear-interpolated quantiles with NO per-group buffer:

1. range-repartition the (group, value) pairs and sort within partitions
   — a distributed sort, every partition bounded by
   ``spark.sql.files.maxPartitionBytes``-style sizing, never by group
   size;
2. count rows per (partition, group) — a tiny aggregate that STAYS
   distributed: block start offsets are a prefix sum over partition id
   (``sum(c) over (partition by g order by pid)``), group totals a plain
   rollup. Nothing of size O(#partitions x #groups) ever reaches the
   driver;
3. locate each target global rank's (partition, local index) by joining
   the per-group target ranks (floor/ceil of p*(n-1) per probe) against
   the offset blocks — the ONLY collected/broadcast artifact is this
   needed-ranks table, O(#groups x #probes), independent of partition
   count;
4. one more scan emits only the rows sitting at those local indices;
5. interpolate lo + frac * (hi - lo) — the quantile_cont definition —
   as a DataFrame join, not driver-side arithmetic.

Wall-clock cost: one shuffle (the range sort) + one tiny agg + one scan.
The reference has no distributed-percentile analogue (its QA profiling
runs in SQL on MySQL); this is the engine-native replacement.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles_distributed(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: Sequence[float],
    num_partitions: int = 64,
) -> DataFrame:
    """Exact linear-interpolated quantiles of ``value_col`` per
    ``group_col``: returns (group, p, quantile). Null values are excluded
    (the builtin ``percentile`` contract)."""
    spark = df.sparkSession
    data = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).cast("double").alias("v"),
        )
        .filter(F.col("v").isNotNull())
        .repartitionByRange(num_partitions, "g", "v")
        .sortWithinPartitions("g", "v")
        # Materialize ONE execution: the offsets pass and the pick pass
        # must see the SAME partitioning, and range partitioning samples
        # its bounds per execution — two recomputations can split rows
        # differently and silently shift every rank.
        .localCheckpoint(eager=True)
    )
    g_type = data.schema["g"].dataType.simpleString()

    # Pass 1 (distributed): per-(partition, group) counts -> block start
    # offsets via prefix sum over pid, group totals via rollup. Partitions
    # are range-ordered, so pid order == value order within a group.
    counts = data.groupBy(F.spark_partition_id().alias("pid"), "g").agg(
        F.count("*").alias("c")
    )
    w_prefix = (
        Window.partitionBy("g")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Renamed columns: offsets and the params/target_ranks branch share
    # lineage through `counts`, and a same-name join between them trips
    # Spark's ambiguous-self-join detection.
    offsets = counts.withColumn(
        "start", F.coalesce(F.sum("c").over(w_prefix), F.lit(0))
    ).select(
        F.col("pid").alias("o_pid"),
        F.col("g").alias("o_g"),
        F.col("c").alias("o_c"),
        "start",
    )
    totals = counts.groupBy("g").agg(F.sum("c").alias("n"))

    # Per-(group, probe) interpolation params; per-group target ranks are
    # the distinct floor/ceil positions. Both are metadata-sized
    # (#groups x #probes).
    probs_df = spark.createDataFrame([(float(p),) for p in probs], "p double")
    params = (
        totals.join(F.broadcast(probs_df))
        .withColumn("pos", F.col("p") * (F.col("n") - 1))
        .withColumn("lo", F.floor("pos"))
        .withColumn("hi", F.least(F.col("lo") + 1, F.col("n") - 1))
        .withColumn("frac", F.col("pos") - F.col("lo"))
        .select("g", "p", "lo", "hi", "frac")
    )
    target_ranks = params.select(
        "g", F.explode(F.array("lo", "hi")).alias("rank")
    ).distinct()

    # Locate each target rank's block: rank in [start, start + c). A
    # broadcast equi-join on g with the range condition as a residual
    # filter — both sides metadata-sized.
    needed = (
        F.broadcast(target_ranks)
        .join(
            offsets,
            on=[
                F.col("g") == F.col("o_g"),
                F.col("rank") >= F.col("start"),
                F.col("rank") < F.col("start") + F.col("o_c"),
            ],
        )
        .select(
            F.col("o_pid").alias("pid"),
            "g",
            (F.col("rank") - F.col("start")).alias("local_idx"),
            "rank",
        )
    )
    # The ONLY driver materialization: O(#groups x #probes x 2) rows,
    # independent of #partitions — safe to broadcast at any scale the
    # probe list itself is sane at.
    need_map: dict = {}
    for r in needed.collect():
        need_map.setdefault((r["pid"], r["g"]), {})[r["local_idx"]] = r["rank"]
    b_need = spark.sparkContext.broadcast(need_map)

    def pick(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Emit only the rows whose local index within (partition, group)
        is wanted. Runs on the range-sorted data, so local order == global
        order and the emitted global rank comes from the needed-ranks map."""
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        nmap = b_need.value
        local_idx: dict = {}
        for pdf in pdfs:
            out_g, out_r, out_v = [], [], []
            for g, v in zip(pdf["g"], pdf["v"]):
                i = local_idx.get(g, 0)
                local_idx[g] = i + 1
                want = nmap.get((pid, g))
                if want is not None and i in want:
                    out_g.append(g)
                    out_r.append(want[i])
                    out_v.append(v)
            yield pd.DataFrame({"g": out_g, "rank": out_r, "v": out_v})

    picked = data.mapInPandas(pick, schema=f"g {g_type}, rank long, v double")

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
