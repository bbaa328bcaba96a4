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
2. count rows per (partition, group) — a tiny aggregate (#partitions x
   #groups rows) collected to the driver to build global offsets (this is
   metadata, not data: for 10k partitions x 1k groups it is 10M small
   rows at most, and typically far less);
3. broadcast the target global ranks (floor/ceil of p*(n-1) per group and
   probe) and make ONE more pass that emits only the ~2 x #groups x
   #probes rows sitting at those ranks;
4. interpolate: lo + frac * (hi - lo) — the quantile_cont definition.

Wall-clock cost: one shuffle (the range sort) + one tiny agg + one scan.
The reference has no distributed-percentile analogue (its QA profiling
runs in SQL on MySQL); this is the engine-native replacement.
"""

from __future__ import annotations

import bisect
from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
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

    # Pass 1: per-(partition, group) counts -> global offsets. The count
    # table is metadata-sized; collect is deliberate and bounded.
    counts = (
        data.groupBy(F.spark_partition_id().alias("pid"), "g")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    totals: dict = {}
    per_pid: dict = {}
    for r in counts:
        totals[r["g"]] = totals.get(r["g"], 0) + r["c"]
        per_pid.setdefault(r["g"], []).append((r["pid"], r["c"]))
    # start offset of each (group, pid) block in the group's global order
    # (partitions are range-ordered, so pid order == value order).
    starts: dict = {}
    for g, lst in per_pid.items():
        off = 0
        for pid, c in sorted(lst):
            starts[(g, pid)] = off
            off += c

    # Target global ranks per group: floor/ceil of p*(n-1), 0-based.
    targets: dict = {}  # g -> sorted list of needed ranks
    params: dict = {}  # g -> [(p, lo_rank, hi_rank, frac)]
    for g, n in totals.items():
        plist = []
        need = set()
        for p in probs:
            pos = p * (n - 1)
            lo = int(pos)
            hi = min(lo + 1, n - 1)
            plist.append((p, lo, hi, pos - lo))
            need.add(lo)
            need.add(hi)
        targets[g] = sorted(need)
        params[g] = plist

    b_targets = spark.sparkContext.broadcast((targets, starts))

    def pick(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Emit only the rows whose global rank within their group is a
        target rank. Runs on the range-sorted data, so local order ==
        global order and a row's global rank = block start + local index."""
        tmap, smap = b_targets.value
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        local_idx: dict = {}
        for pdf in pdfs:
            out_g, out_r, out_v = [], [], []
            for g, v in zip(pdf["g"], pdf["v"]):
                i = local_idx.get(g, 0)
                local_idx[g] = i + 1
                rank = smap.get((g, pid), 0) + i
                want = tmap.get(g)
                if want:
                    j = bisect.bisect_left(want, rank)
                    if j < len(want) and want[j] == rank:
                        out_g.append(g)
                        out_r.append(rank)
                        out_v.append(v)
            yield pd.DataFrame({"g": out_g, "rank": out_r, "v": out_v})

    picked = {
        (r["g"], r["rank"]): r["v"]
        for r in data.mapInPandas(pick, schema=f"g {g_type}, rank long, v double")
        .collect()
    }

    rows = []
    for g, plist in params.items():
        for p, lo, hi, frac in plist:
            vlo = picked[(g, lo)]
            vhi = picked[(g, hi)]
            # quantile_cont interpolation: lo + frac * (hi - lo)
            rows.append((g, float(p), vlo + frac * (vhi - vlo)))
    return spark.createDataFrame(
        rows, schema=f"g {g_type}, p double, quantile double"
    )
