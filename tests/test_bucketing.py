"""Bucketed co-located join: the storage-layout answer to the biggest
shuffle at 100 TB. Both sides bucketed+sorted on the join key -> the
sort-merge join runs with NO Exchange on either side."""

from __future__ import annotations

from pyspark.sql import functions as F

from loris_mri_spark.catalog import load_table, write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    write_bucketed(o, "b_orders", "o_custkey", 8)
    write_bucketed(c, "b_customer", "c_custkey", 8)
    # disable auto-broadcast: at test scale everything broadcasts, which
    # hides the co-location property this test pins (at 100 TB neither
    # side of a fact-fact join broadcasts).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bc = spark.table("b_orders"), spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey).groupBy("c_custkey").agg(
            F.count("*").alias("n"), F.sum("o_totalprice").alias("s")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: the join itself introduces no exchange (the only
        # exchange allowed is the final aggregation's, and even that is
        # avoided because bucketing co-partitions the agg key too).
        assert "SortMergeJoin" in plan
        join_part = plan.split("SortMergeJoin")[0]
        assert "Exchange" not in join_part, join_part
        # correctness: same result as the plain shuffle join
        plain = o.join(c, o.o_custkey == c.c_custkey).count()
        assert joined.count() > 0
        assert plain == bo.join(bc, bo.o_custkey == bc.c_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
