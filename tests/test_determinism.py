"""Partition-count invariance: a plan that is correct on a 32-thread
local session must produce the IDENTICAL result multiset at any shuffle
partitioning — the property that makes results reproducible when the
same job runs on a 1000-executor cluster. Exercises the queries whose
plans are most exposed to partition-dependent nondeterminism (sorted
LIMITs, banded self-joins, salted two-phase aggs, range-bucketed
quantile picks, permutation sharding)."""

from __future__ import annotations

import pytest

from loris_mri_spark import workload
from tests.oracle import canonical

workload.load_all()

_SENSITIVE = [
    "o1_topk_lineitems",
    "dedup_minhash_lsh_pairs",
    "profile_percentiles_distributed",
    "dedup_substring_spans",
    "corpus_global_shuffle",
    "a8_salted_skew_rollup",
    "er_fuzzy_name_pairs",
    "j12_salted_skew_join",
    "dedup_substring_hotspans",
    "j13_band_join_bucketed",
    "t5d_dynamic_session_window",
    "split_cluster_safe",
    # r6: pointer-doubling provenance roots (self-joins + saturation
    # check) and the session-collapsed deface planner (conditional
    # collect_list must sort before joining)
    "pipeline_processed_registration",
    "pipeline_deface_batch",
    # r6 late additions: windowed sequential-walk closed form (toggle
    # parity must not depend on partitioning), its spec-apply join
    # composition, and the run-number ranking in the BIDS manifest
    "s19_split_merged_series",
    "s19b_apply_header_spec",
    "pipeline_minc_to_bids",
    "s19c_mint_sub_series_numbers",
    # r7 late additions: the cell-local grouped-map (k-means assignment
    # and per-cell union-find must not depend on how the corpus is
    # partitioned) and the GROUPED_AGG UDAF (whole-group value vector
    # arrives as one pandas Series regardless of upstream splits)
    "dedup_semdedup",
    "x5_grouped_agg_trimmed_mean",
]


@pytest.mark.parametrize("name", _SENSITIVE)
def test_partition_count_invariance(spark, sf_dir, name):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = canonical(workload.QUERIES[name](spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = canonical(workload.QUERIES[name](spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name}: result depends on shuffle partition count"
