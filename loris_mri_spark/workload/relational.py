"""Relational operator workload (SURVEY §2.2-§2.8) on the driver testdata.

Each query re-expresses a reference operator class on the TPC-H-ish tables
per the mapping table in FIXTURES.md. All plans are pure DataFrame API —
no UDFs — so Catalyst keeps them in whole-stage codegen, pushes filters to
the parquet scan, and broadcasts the small sides.

Numeric contract (SURVEY §7.3): every MULTI-ROW floating sum aggregates in
DECIMAL — exact and order-independent, so the oracle hash is stable at any
scale factor and under any partitioning — then rounds/casts the exact
result to double. Double sums are order-dependent at the 1e-12 level,
which flips ROUND digits between engines (observed at sf0.1). Quotients
(AVG) are never rounded for output: half-boundary rounding of a division
cannot be made engine-portable; consumers divide exact sums by counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from loris_mri_spark.catalog import load_table
from loris_mri_spark.workload import query

from pyspark.sql.window import Window


# --------------------------------------------------------------------------
# Flagship: pricing summary (A1/A2-class aggregation + F2/F5 filters).
# The reference's per-archive rollups (`dicom_archive_loader_pipeline.py:
# 408-427`) are this shape: filter, group, count + conditional sums.
# --------------------------------------------------------------------------
@query(
    "flagship_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(18,4)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(dec))
            .cast("double")
            .alias("sum_base_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast(dec)
                    * (F.lit(1).cast(dec) - F.col("l_discount").cast(dec))
                ),
                2,
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# J1 — FK equi-join chain (files ⋈ session ⋈ candidate ≡ lineitem ⋈ orders ⋈
# customer ⋈ nation). nation is broadcast like the reference's psc/Project
# dims (`MRI.pm:1119-1121`).
# --------------------------------------------------------------------------
@query(
    "j1_customer_order_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, n.n_name
    """,
)
def j1_customer_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Revenue is summed in DECIMAL (exact, order-independent) and only
    # then rounded/cast — double sums flipped a 2-decimal rounding
    # boundary between engines at sf0.1 (SURVEY §7.3 numeric contract).
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    dec = "decimal(18,4)"
    revenue = F.sum(
        F.col("l_extendedprice").cast(dec)
        * (F.lit(1).cast(dec) - F.col("l_discount").cast(dec))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(revenue, 2).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# J3 — left outer join with zero-preserving counts (BIDS naming rel,
# `database_lib/mri_protocol.py:108-125`).
# --------------------------------------------------------------------------
@query(
    "j3_left_join_order_counts",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey)                      AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 0)
                AS DOUBLE) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def j3_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")), F.lit(0)
            )
            .cast("double")
            .alias("total_spent"),
        )
    )


# --------------------------------------------------------------------------
# J5 — anti-join: rows lacking a matching child (files without a pic EAV
# row, `uploadNeuroDB/mass_pic.pl:148-171` — there done via temp table +
# LEFT JOIN ... IS NULL; Spark has the operator natively).
# --------------------------------------------------------------------------
@query(
    "j5_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j5_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# J6 — semi-join existence check (duplicate-violation suppression,
# `imaging.py:263-271`).
# --------------------------------------------------------------------------
@query(
    "j6_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j6_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# J4 — self-join validation: entities that exist but fail a cross-check
# (CandID/PSCID mismatch detector, `MRIProcessingUtility.pm:2056-2081`).
# Here: customers with orders but no 'O'-status order.
# --------------------------------------------------------------------------
@query(
    "j4_selfjoin_mismatch",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def j4_selfjoin_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    open_orders = o.filter(F.col("o_orderstatus") == "O")
    return with_orders.join(
        open_orders, with_orders.c_custkey == open_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# J9 — self-join on derivation edges (files.SourceFileID chains,
# `tools/delete_imaging_upload.pl:1009-1030`): join each row to the root of
# its group; here each order to the customer's first order.
# --------------------------------------------------------------------------
@query(
    "j9_self_join_first_order",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(date_diff('day', f.first_date, o.o_orderdate) AS BIGINT)
             AS days_since_first
    FROM orders o
    JOIN (SELECT o_custkey, MIN(o_orderdate) AS first_date
          FROM orders GROUP BY o_custkey) f
      ON o.o_custkey = f.o_custkey
    """,
)
def j9_self_join_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_date"))
    return (
        o.join(first.withColumnRenamed("o_custkey", "fk"), o.o_custkey == F.col("fk"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.datediff(F.to_date("o_orderdate"), F.to_date("first_date"))
            .cast("long")
            .alias("days_since_first"),
        )
    )


# --------------------------------------------------------------------------
# W1 — row_number per partition (AcqOrderPerModality,
# `MRIProcessingUtility.pm:2209-2268`).
# --------------------------------------------------------------------------
@query(
    "w1_row_number_order_seq",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT)
             AS seq
    FROM orders
    """,
)
def w1_row_number_order_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("seq"),
    )


# --------------------------------------------------------------------------
# W2 — lead/next-event (next field-map time bound, `imaging.py:879-890`).
# --------------------------------------------------------------------------
@query(
    "w2_lead_next_event",
    oracle="""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_ts_us
    FROM events
    """,
)
def w2_lead_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Timestamps are exchanged as epoch MICROS (bigint): the parquet column
    # is TIMESTAMP(NANOS), which DuckDB truncates to µs on read, and µs
    # epochs (~1.7e15) survive the pandas nullable-int -> float64 conversion
    # exactly (ns epochs would not).
    e = load_table(spark, sf_dir, "events")
    us = F.expr("ts_ns div 1000")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return e.select(
        "event_id",
        "user_id",
        us.alias("ts_us"),
        F.lead(us).over(w).alias("next_ts_us"),
    )


# --------------------------------------------------------------------------
# W5 (extension) — moving-frame window aggregates. The reference uses no
# frame specs (SURVEY §2.5); rolling stats over event streams are table
# stakes for an analytics engine, so both frame kinds are declared: a
# ROWS frame (last-5-events) and a RANGE frame (trailing 10 minutes over
# the nanosecond event time). Values accumulate as DECIMAL(18,2) so the
# running sums are exact in both engines (double accumulation order
# differs between Spark's frame re-scan and DuckDB's segment tree); the
# single final cast to double is deterministic.
# --------------------------------------------------------------------------
@query(
    "w5_rolling_event_stats",
    oracle="""
    WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS tns,
                      CAST(value AS DECIMAL(18,2)) AS v
               FROM events)
    SELECT event_id, user_id,
           COUNT(*) OVER w5 AS n_5,
           CAST(SUM(v) OVER w5 AS DOUBLE) AS sum_5,
           ROUND(CAST(SUM(v) OVER w5 AS DOUBLE) / (COUNT(*) OVER w5), 4)
             AS avg_5,
           COUNT(*) OVER w10 AS n_10m,
           CAST(SUM(v) OVER w10 AS DOUBLE) AS sum_10m
    FROM e
    WINDOW w5 AS (PARTITION BY user_id ORDER BY tns, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
           w10 AS (PARTITION BY user_id ORDER BY tns
                   RANGE BETWEEN 600000000000 PRECEDING AND CURRENT ROW)
    """,
)
def w5_rolling_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    w5 = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(-4, 0)
    )
    w10 = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns")
        .rangeBetween(-600_000_000_000, 0)
    )
    sum5 = F.sum(v).over(w5).cast("double")
    n5 = F.count("*").over(w5)
    return e.select(
        "event_id",
        "user_id",
        n5.alias("n_5"),
        sum5.alias("sum_5"),
        F.round(sum5 / n5, 4).alias("avg_5"),
        F.count("*").over(w10).alias("n_10m"),
        F.sum(v).over(w10).cast("double").alias("sum_10m"),
    )


# --------------------------------------------------------------------------
# W3 — top-1 by ordering (latest visit label, `MRIProcessingUtility.pm:
# 206-212`).
# --------------------------------------------------------------------------
@query(
    "w3_top1_latest_order",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           ROUND(o_totalprice, 2) AS latest_price
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate DESC,
                                                o_orderkey DESC) AS rn
          FROM orders) t
    WHERE rn = 1
    """,
)
def w3_top1_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.round("o_totalprice", 2).alias("latest_price"),
        )
    )


# --------------------------------------------------------------------------
# A2 — grouped IFNULL(MAX(...),0)+1 (next visit number, `MRI.pm:220-224`).
# --------------------------------------------------------------------------
@query(
    "a2_next_sequence_number",
    oracle="""
    SELECT c.c_custkey, COALESCE(MAX(x.seq), 0) + 1 AS next_seq
    FROM customer c
    LEFT JOIN (SELECT o_custkey,
                      CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey)
                           AS BIGINT) AS seq
               FROM orders) x
      ON c.c_custkey = x.o_custkey
    GROUP BY c.c_custkey
    """,
)
def a2_next_sequence_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seqs = o.select("o_custkey", F.row_number().over(w).cast("long").alias("seq"))
    return (
        c.join(seqs, c.c_custkey == seqs.o_custkey, "left")
        .groupBy("c_custkey")
        .agg((F.coalesce(F.max("seq"), F.lit(0)) + 1).alias("next_seq"))
    )


# --------------------------------------------------------------------------
# A3 — global min/max (FileID range sharding, `MRI.pm:1584`).
# --------------------------------------------------------------------------
@query(
    "a3_global_minmax",
    oracle="""
    SELECT MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
           COUNT(*) AS n
    FROM orders
    """,
)
def a3_global_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# A4 — DISTINCT projection (distinct scan types per archive,
# `database_lib/files.py:145-163`).
# --------------------------------------------------------------------------
@query(
    "a4_distinct_projection",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def a4_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


# --------------------------------------------------------------------------
# A5 — group-collapse dedup summary (series collapse keyed on
# (sequName, seriesNum, echoN) carrying first params + count,
# `dicom-archive/DICOM/DCMSUM.pm:651-677`).
# --------------------------------------------------------------------------
@query(
    "a5_series_collapse",
    oracle="""
    SELECT l_orderkey, l_suppkey,
           COUNT(*)                              AS n_files,
           MIN(l_linenumber)                     AS first_line,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           ROUND(MIN_BY(l_extendedprice,
                        l_linenumber * 200000.0 + l_extendedprice), 2)
             AS first_price
    FROM lineitem
    GROUP BY l_orderkey, l_suppkey
    """,
)
def a5_series_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey", "l_suppkey").agg(
        F.count("*").alias("n_files"),
        F.min("l_linenumber").alias("first_line"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_qty"),
        # Duplicate (orderkey, suppkey, linenumber) tuples exist in the data,
        # so the arg-min key must be total: fold the value into it
        # (linenumber <= 7, price < 2e5 keeps the composite monotone).
        F.round(
            F.min_by(
                "l_extendedprice",
                F.col("l_linenumber") * 200000.0 + F.col("l_extendedprice"),
            ),
            2,
        ).alias("first_price"),
    )


# --------------------------------------------------------------------------
# A6 — conditional per-group counts (dcm_count vs file_count,
# `DCMSUM.pm:540-590`).
# --------------------------------------------------------------------------
@query(
    "a6_conditional_counts",
    oracle="""
    SELECT l_orderkey,
           COUNT(*) AS n_lines,
           COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)      AS n_suppliers,
           CAST(SUM(CASE WHEN l_discount > 0.05
                         THEN CAST(l_extendedprice AS DECIMAL(18,4))
                         ELSE 0 END) AS DOUBLE)
             AS discounted_value
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def a6_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.sum(
            F.when(
                F.col("l_discount") > 0.05,
                F.col("l_extendedprice").cast("decimal(18,4)"),
            ).otherwise(F.lit(0).cast("decimal(18,4)"))
        )
        .cast("double")
        .alias("discounted_value"),
    )


# --------------------------------------------------------------------------
# O1 — multi-key sort + LIMIT top-k (scan listing order, `DCMSUM.pm:722-736`;
# LIMIT, `MRIProcessingUtility.pm:212`). Total ordering via key tie-breaks
# makes the limited set deterministic.
# --------------------------------------------------------------------------
@query(
    "o1_topk_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def o1_topk_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
        .select(
            "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price")
        )
    )


# --------------------------------------------------------------------------
# U1 — UNION (distinct) of query branches (`delete_imaging_upload.pl:
# 885-894`).
# --------------------------------------------------------------------------
@query(
    "u1_union_branches",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 150000
    """,
)
def u1_union_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.unionByName(b).distinct()


# --------------------------------------------------------------------------
# U2 — ordered dedup preserving first match (`imaging.py:666`
# list(dict.fromkeys(...))). In Spark, priority-sort + dropDuplicates is
# nondeterministic, so the engine's canonical form is row_number over the
# priority ordering — same pattern the protocol matcher uses (O4).
# --------------------------------------------------------------------------
@query(
    "u2_ordered_dedup_first",
    oracle="""
    SELECT o_custkey, o_orderkey AS top_orderkey, o_orderpriority AS top_priority
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderpriority ASC,
                                                o_orderdate ASC,
                                                o_orderkey ASC) AS rn
          FROM orders) t
    WHERE rn = 1
    """,
)
def u2_ordered_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderpriority").asc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.col("o_orderpriority").alias("top_priority"),
        )
    )


# --------------------------------------------------------------------------
# F2/F6/F7/F10 — predicate gauntlet: equality, BETWEEN (dates and id range),
# IN-list, case-insensitive regex. All of these push down to the parquet
# scan except the regex (check PushedFilters in .explain).
# --------------------------------------------------------------------------
@query(
    "f_predicate_gauntlet",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderdate
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND o_orderstatus IN ('F', 'O')
      AND regexp_matches(o_orderpriority, '(?i)^[1-3]-')
      AND o_orderkey BETWEEN 1000 AND 500000
    """,
)
def f_predicate_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
        & F.col("o_orderstatus").isin("F", "O")
        & F.col("o_orderpriority").rlike("(?i)^[1-3]-")
        & F.col("o_orderkey").between(1000, 500000)
    ).select("o_orderkey", "o_orderpriority", "o_orderdate")


# --------------------------------------------------------------------------
# C1/C2/C4/C5/C6 — scalar function projection: regex extract/replace,
# string ops, rounding, conditionals, md5 (`DCMSUM.pm:1241-1267` hashing;
# `imaging.py:1200` regex rewrite).
# --------------------------------------------------------------------------
@query(
    "c_scalar_functions",
    oracle="""
    SELECT c_custkey,
           LOWER(c_name)                                   AS name_lower,
           CONCAT_WS('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_key,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1)           AS name_num,
           REGEXP_REPLACE(c_name, '^Customer#0*', '')      AS name_short,
           ROUND(c_acctbal, 1)                             AS bal_r,
           CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_sign,
           MD5(c_name)                                     AS name_md5,
           LENGTH(TRIM(c_mktsegment))                      AS seg_len
    FROM customer
    """,
)
def c_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_key"
        ),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_num"),
        F.regexp_replace("c_name", "^Customer#0*", "").alias("name_short"),
        F.round("c_acctbal", 1).alias("bal_r"),
        F.when(F.col("c_acctbal") < 0, "neg").otherwise("pos").alias("bal_sign"),
        F.md5("c_name").alias("name_md5"),
        F.length(F.trim(F.col("c_mktsegment"))).cast("long").alias("seg_len"),
    )


# --------------------------------------------------------------------------
# C3 — date/time functions (DICOM date parse + year bucketing,
# `dicom_archive_loader_pipeline.py:348`).
# --------------------------------------------------------------------------
@query(
    "c3_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT)                AS order_year,
           STRFTIME(o_orderdate, '%Y-%m')                   AS order_month,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(DATE_DIFF('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
             AS days_since_epoch
    FROM orders
    """,
)
def c3_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch"),
    )


# --------------------------------------------------------------------------
# C7 — JSON extraction (BIDS sidecar parsing, `imaging.py:531-553`).
# --------------------------------------------------------------------------
@query(
    "c7_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def c7_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )


# --------------------------------------------------------------------------
# EAV pivot — long attribute rows -> wide matrix (parameter_file pivot,
# SURVEY §1.1; `groupBy().pivot()` is the engine's `pivot_parameters`).
# --------------------------------------------------------------------------
@query(
    "eav_pivot_user_event_matrix",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS view
    FROM events
    GROUP BY user_id
    """,
)
def eav_pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # Explicit pivot-value list: at 100 TB the distinct-collection step must
    # be bounded by a registry (SURVEY §4 point 4 — parameter_type mirror).
    kinds = ["click", "error", "purchase", "signup", "view"]
    piv = e.groupBy("user_id").pivot("event_type", kinds).count()
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds],
    )


# --------------------------------------------------------------------------
# A7 — per-group range + global range merge (channel seriesRange + global
# signal_range, `loris_ephys_chunker/.../chunking.py:110-114,193-196`).
# --------------------------------------------------------------------------
@query(
    "a7_range_merge",
    oracle="""
    SELECT event_type AS scope, MIN(value) AS vmin, MAX(value) AS vmax
    FROM events GROUP BY event_type
    UNION ALL
    SELECT '__global__' AS scope, MIN(value) AS vmin, MAX(value) AS vmax
    FROM events
    """,
)
def a7_range_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # per-group AND global ranges from ONE rollup aggregation (one scan,
    # one shuffle) — the union-of-two-aggregations form executes the
    # corpus scan once per branch (Spark does not share subplans across
    # union branches, and exchange reuse is not guaranteed here);
    # grouping() distinguishes the rollup total from a real NULL key
    return (
        e.rollup("event_type")
        .agg(
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.grouping("event_type").alias("__g"),
        )
        .select(
            F.when(F.col("__g") == 1, F.lit("__global__"))
            .otherwise(F.col("event_type"))
            .alias("scope"),
            "vmin",
            "vmax",
        )
    )


# --------------------------------------------------------------------------
# C10 — longest-common-prefix per group (`MRIProcessingUtility.pm:244-289`)
# via the min/max trick: LCP(group) == LCP(min(name), max(name)); prefix
# equality is monotone, so counting matching prefix lengths gives the LCP.
# --------------------------------------------------------------------------
@query(
    "c10_lcp_per_group",
    oracle="""
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
           SUBSTR(MIN(c_name), 1,
             CAST(len(list_filter(range(1, least(length(MIN(c_name)),
                                                 length(MAX(c_name))) + 1),
                  i -> substr(MIN(c_name), 1, i) = substr(MAX(c_name), 1, i)))
                  AS INT)) AS lcp
    FROM customer
    GROUP BY c_nationkey
    """,
)
def c10_lcp_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        F.min("c_name").alias("mn"),
        F.max("c_name").alias("mx"),
    )
    lcp_len = F.expr(
        "size(filter(sequence(1, least(length(mn), length(mx))),"
        " i -> substring(mn, 1, i) = substring(mx, 1, i)))"
    )
    return g.select(
        "c_nationkey",
        "n_customers",
        F.expr("substring(mn, 1, "
               "size(filter(sequence(1, least(length(mn), length(mx))),"
               " i -> substring(mn, 1, i) = substring(mx, 1, i))))").alias("lcp"),
    )


# --------------------------------------------------------------------------
# T5 — tumbling-window aggregation over the event stream (extension beyond
# the reference, SURVEY §2.9 T5; batch form of the streaming windowed agg).
# Spark's window() buckets are epoch-aligned, i.e. date_trunc('hour').
# --------------------------------------------------------------------------
@query(
    "t5_tumbling_window_agg",
    oracle="""
    SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def t5_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Payload = (count, EXACT decimal total): sums are order-independent
    # and engine-stable; averages are a consumer-side division. (A
    # rounded double AVG flipped rounding boundaries between engines at
    # sf0.1 — half-boundary rounding of a quotient can never be made
    # engine-portable; exact sums can. SURVEY §7.3 numeric contract.)
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# T5b — SLIDING window aggregation (1 h window, 30 min slide): each event
# belongs to two overlapping epoch-aligned windows. The oracle expands the
# membership explicitly (bucket and bucket-30min) — the relational
# definition of Spark's window(ts, '1 hour', '30 minutes').
# --------------------------------------------------------------------------
@query(
    "t5b_sliding_window_agg",
    oracle="""
    WITH b AS (
      SELECT event_type, value,
             date_trunc('hour', ts)
               + CASE WHEN EXTRACT(minute FROM ts) >= 30
                      THEN INTERVAL 30 MINUTE
                      ELSE INTERVAL 0 MINUTE END AS b30
      FROM events
    ),
    expanded AS (
      SELECT event_type, value,
             CAST(b30 - CASE WHEN k = 1 THEN INTERVAL 30 MINUTE
                             ELSE INTERVAL 0 MINUTE END AS TIMESTAMP)
               AS window_start
      FROM b, unnest(range(0, 2)) t(k)
    )
    SELECT window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
    FROM expanded GROUP BY 1, 2
    """,
)
def t5b_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# T5c — SESSION window aggregation (30 min inactivity gap per user):
# Spark's session_window vs the relational gaps-and-islands definition —
# a new session starts when the gap from the previous event exceeds the
# timeout; w.start = first event, w.end = last event + gap.
# --------------------------------------------------------------------------
@query(
    "t5c_session_window_agg",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    islands AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
    FROM islands GROUP BY user_id, session_id
    """,
)
def t5c_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# F3 — null-aware unique-key filter (`eqNullSafe` / <=>): the duplicate-scan
# detector every insertion runs (`python/lib/db/queries/file.py:11-28`,
# `database_lib/files.py:57-70` — SeriesUID/EchoTime/PhaseEncodingDirection
# may each be NULL, and NULL must match NULL). Here: signup events sharing
# (user_id, nullable derived key), self-joined null-safely.
# --------------------------------------------------------------------------
@query(
    "f3_nullsafe_duplicate_scan",
    oracle="""
    WITH scans AS (
      SELECT event_id, user_id,
             NULLIF(CAST(json_extract_string(props, '$.k') AS BIGINT) % 7, 0)
               AS ped
      FROM events WHERE event_type = 'signup')
    SELECT a.event_id AS first_id, b.event_id AS dup_id,
           a.user_id, a.ped
    FROM scans a JOIN scans b
      ON a.user_id = b.user_id
     AND a.ped IS NOT DISTINCT FROM b.ped
     AND a.event_id < b.event_id
    """,
)
def f3_nullsafe_duplicate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    scans = e.filter(F.col("event_type") == "signup").select(
        "event_id",
        "user_id",
        F.nullif(
            F.get_json_object("props", "$.k").cast("long") % 7, F.lit(0)
        ).alias("ped"),
    )
    a, b = scans.alias("a"), scans.alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & F.col("a.ped").eqNullSafe(F.col("b.ped"))
        & (F.col("a.event_id") < F.col("b.event_id")),
    ).select(
        F.col("a.event_id").alias("first_id"),
        F.col("b.event_id").alias("dup_id"),
        F.col("a.user_id").alias("user_id"),
        F.col("a.ped").alias("ped"),
    )


# --------------------------------------------------------------------------
# F9 — case-insensitive equality (`MRI.pm:150`
# `LOWER(s.Visit_label)=LOWER(?)`): explicit ci collation per comparison.
# --------------------------------------------------------------------------
@query(
    "f9_ci_equality",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE LOWER(c_mktsegment) = LOWER('BuIlDiNg')
    """,
)
def f9_ci_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loris_mri_spark.functions.predicates import eq_case_insensitive

    c = load_table(spark, sf_dir, "customer")
    return c.filter(eq_case_insensitive(F.col("c_mktsegment"), F.lit("BuIlDiNg"))).select(
        "c_custkey", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# U3 — set difference on map keys (additional event fields = row keys minus
# known fields, `loris_bids_importer/.../events.py:114-121`): build a
# per-row map with data-dependent keys, subtract the known-key set.
# --------------------------------------------------------------------------
@query(
    "u3_map_key_difference",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(list_filter(
             [CASE WHEN value > 50 THEN 'big_value' END,
              CASE WHEN event_type = 'error' THEN 'error_flag' END,
              'event_type', 'k'],
             x -> x IS NOT NULL
                  AND NOT list_contains(['event_type', 'onset', 'duration'], x))),
             ',') AS extra_keys
    FROM events
    """,
)
def u3_map_key_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # Data-dependent map: NULL-valued entries are dropped by map_filter, so
    # each row's key set varies (mirrors BIDS rows with optional columns).
    m = F.map_filter(
        F.create_map(
            F.lit("big_value"), F.when(F.col("value") > 50, F.lit("y")),
            F.lit("error_flag"), F.when(F.col("event_type") == "error", F.lit("y")),
            F.lit("event_type"), F.col("event_type"),
            F.lit("k"), F.get_json_object("props", "$.k"),
        ),
        lambda k, v: v.isNotNull(),
    )
    known = F.array(F.lit("event_type"), F.lit("onset"), F.lit("duration"))
    return e.select(
        "event_id",
        F.concat_ws(
            ",", F.array_sort(F.array_except(F.map_keys(m), known))
        ).alias("extra_keys"),
    )


# --------------------------------------------------------------------------
# C9 — deterministic ID generation (SURVEY §7.3: the reference's random
# 6-digit CandID + collision retry, `lib/candidate.py:105-114`, replaced by
# content hashing so ids are reproducible across runs and executors).
# --------------------------------------------------------------------------
@query(
    "c9_deterministic_ids",
    oracle="""
    SELECT DISTINCT event_type AS name,
           CAST(('0x' || substr(md5(event_type), 1, 15)) AS BIGINT) AS det_id
    FROM events
    """,
)
def c9_deterministic_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loris_mri_spark.functions.texthash import md5_60

    e = load_table(spark, sf_dir, "events")
    return (
        e.select(F.col("event_type").alias("name"))
        .distinct()
        .select("name", md5_60(F.col("name")).alias("det_id"))
    )


# --------------------------------------------------------------------------
# F8/J11 — binary-collation comparisons (`MRIProcessingUtility.pm:2090`
# `WHERE BINARY Visit_label=?`; `delete_imaging_upload.pl:1255-1258`
# `COLLATE utf8_bin` join). Spark's default string equality IS binary, so
# the engine states the collation explicitly per comparison: == for
# utf8_bin sites, eq_case_insensitive for LOWER() sites.
# --------------------------------------------------------------------------
@query(
    "f8_j11_binary_collation",
    oracle="""
    WITH probe(seg) AS (VALUES ('BUILDING'), ('building'), ('MACHINERY'))
    SELECT p.seg, COUNT(c.c_custkey) AS n_matches
    FROM probe p LEFT JOIN customer c ON c.c_mktsegment = p.seg
    GROUP BY p.seg
    """,
)
def f8_j11_binary_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import StringType, StructField, StructType

    c = load_table(spark, sf_dir, "customer")
    probe = c.sparkSession.createDataFrame(
        [("BUILDING",), ("building",), ("MACHINERY",)],
        schema=StructType([StructField("seg", StringType())]),
    )
    # binary-collation join: 'building' matches nothing (data is upper).
    return (
        F.broadcast(probe)
        .join(c, c.c_mktsegment == F.col("seg"), "left")
        .groupBy("seg")
        .agg(F.count("c_custkey").alias("n_matches"))
    )


# --------------------------------------------------------------------------
# J2/EAV round trip — melt wide columns to parameter rows and pivot them
# back through the registry-bounded pivot (operators/eav.py;
# parameter_file <-> wide views, SURVEY §1.1).
# --------------------------------------------------------------------------
@query(
    "eav_melt_pivot_roundtrip",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice AS VARCHAR)    AS totalprice,
           o_orderpriority                  AS priority,
           CAST(o_orderdate AS VARCHAR)     AS orderdate
    FROM orders
    WHERE o_orderkey < 1000
    """,
)
def eav_melt_pivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loris_mri_spark.operators.eav import melt_to_eav, pivot_parameters

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").cast("string").alias("orderdate"),
        )
    )
    long_rows = melt_to_eav(o, "o_orderkey", ["totalprice", "priority", "orderdate"])
    return pivot_parameters(
        long_rows, "o_orderkey", "name", "value",
        names=["totalprice", "priority", "orderdate"],
    )


# --------------------------------------------------------------------------
# A8-at-scale — salted two-phase rollup over genuinely skewed keys (the
# events table has 5 hot event_type keys; a 100 TB rollup on them would
# cap the reduce stage at 5 tasks without salting). Result is identical
# to the plain aggregation — the oracle proves it.
# --------------------------------------------------------------------------
@query(
    "a8_salted_skew_rollup",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value,
           ROUND(MAX(value), 2) AS max_value
    FROM events GROUP BY event_type
    """,
)
def a8_salted_skew_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loris_mri_spark.operators.salt import salted_agg

    e = load_table(spark, sf_dir, "events")
    return salted_agg(
        e,
        keys=["event_type"],
        partial_aggs=[
            (F.count("*"), "pc"),
            # Decimal partial sums: double partial sums are partition-order
            # dependent and the merge would re-round an inexact total.
            (F.sum(F.col("value").cast("decimal(14,4)")), "ps"),
            (F.max("value"), "pm"),
        ],
        merge_aggs=[
            (F.sum("pc"), "n_events"),
            (F.sum("ps").cast("double"), "total_value"),
            (F.round(F.max("pm"), 2), "max_value"),
        ],
        n_salts=16,
    )


# --------------------------------------------------------------------------
# S9/SQL surface — the same engine driven through spark.sql over the
# registered catalog views (catalog.register_views): DataFrame and SQL
# are the same plan space; Catalyst sees identical logical plans.
# --------------------------------------------------------------------------
@query(
    "sql_surface_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_surface_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loris_mri_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )


# --------------------------------------------------------------------------
# §1.2 type codecs — the reference's stringly-typed columns decoded/encoded
# as one expression pass: Y/N + true/false + 0/1 booleans, epoch ints,
# "[a, b, c]" list strings (decorators/{y_n_bool,true_false_bool,int_bool,
# int_datetime}.py, imaging.py:175-179).
# --------------------------------------------------------------------------
@query(
    "codec_typed_views",
    oracle="""
    SELECT o_orderkey,
           (CASE WHEN o_orderstatus = 'F' THEN 'Y' ELSE 'N' END = 'Y')
             AS is_final,
           (o_orderkey % 2 = 1) AS odd_flag,
           CAST(to_timestamp(o_orderkey * 1000) AS TIMESTAMP) AS fake_insert_ts,
           '[' || o_orderpriority || ', ' || o_orderstatus || ']'
             AS tag_list_str,
           CAST(len(string_split(o_orderpriority || ', ' || o_orderstatus,
                ', ')) AS BIGINT) AS n_tags
    FROM orders WHERE o_orderkey < 2000
    """,
)
def codec_typed_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    from loris_mri_spark.functions.codecs import (
        decode_int_bool,
        decode_unix_epoch,
        decode_yn_bool,
        parse_list_string,
        serialize_list_string,
    )

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    # Build the stringly-typed forms the reference stores, then round-trip
    # them through the codecs — the typed view IS the query result.
    staged = o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "Y").otherwise("N").alias("yn"),
        (F.col("o_orderkey") % 2).cast("int").alias("ib"),
        (F.col("o_orderkey") * 1000).alias("epoch"),
        F.concat(
            F.lit("["), F.col("o_orderpriority"), F.lit(", "),
            F.col("o_orderstatus"), F.lit("]"),
        ).alias("lst"),
    )
    return staged.select(
        "o_orderkey",
        decode_yn_bool("yn").alias("is_final"),
        decode_int_bool("ib").alias("odd_flag"),
        decode_unix_epoch("epoch").alias("fake_insert_ts"),
        serialize_list_string(parse_list_string("lst")).alias("tag_list_str"),
        F.size(parse_list_string("lst")).cast("long").alias("n_tags"),
    )


# --------------------------------------------------------------------------
# Profiling extension (SURVEY §2.4 note): exact percentiles per group —
# the distribution profile a 100 TB ingest QA pass reports. Spark's exact
# `percentile` and DuckDB's quantile_cont share the linear-interpolation
# definition, so the oracle is exact.
# --------------------------------------------------------------------------
@query(
    "profile_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(l_quantity, 0.99), 4)     AS qty_p99,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def profile_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Both l_extendedprice quantiles share ONE percentile buffer (array
    # form) instead of building the same per-group value buffer twice —
    # 30% faster measured, and half the aggregation-buffer memory, which
    # is the binding constraint for exact per-group percentiles at scale
    # (the sketch path for unbounded groups is approx_percentile).
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("ps"),
            F.expr("percentile(l_quantity, 0.99)").alias("q99"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("ps", 1), 4).alias("p50"),
            F.round(F.element_at("ps", 2), 4).alias("p90"),
            F.round("q99", 4).alias("qty_p99"),
            "n",
        )
    )


@query(
    "profile_percentiles_distributed",
    oracle="""
    SELECT l_returnflag, p,
           ROUND(CASE p WHEN 0.5 THEN quantile_cont(l_extendedprice, 0.5)
                        ELSE quantile_cont(l_extendedprice, 0.9) END, 4)
             AS quantile_r
    FROM lineitem, (VALUES (0.5), (0.9)) AS probes(p)
    GROUP BY l_returnflag, p
    """,
)
def profile_percentiles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based EXACT percentiles (operators/quantiles.py): a
    metadata-sized per-group count picks the plan — builtin `percentile`
    when every group fits one aggregation buffer (this scale), else the
    bucketed distributed path (deterministic percentile_approx bucket
    bounds + per-bucket row_number pick) whose memory is bounded by
    bucket size, never group size — the builtin's failure mode at 100 TB
    group sizes. Both paths share one linear-interpolation definition
    (bit-equality pinned in tests/test_profiles.py), proven here by the
    quantile_cont oracle."""
    from loris_mri_spark.operators.quantiles import exact_quantiles_distributed

    li = load_table(spark, sf_dir, "lineitem")
    out = exact_quantiles_distributed(
        li, "l_returnflag", "l_extendedprice", [0.5, 0.9]
    )
    return out.select(
        F.col("g").alias("l_returnflag"),
        "p",
        F.round("quantile", 4).alias("quantile_r"),
    )


@query(
    "profile_approx_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact,
           TRUE AS p50_sketch_ok,
           TRUE AS p90_sketch_ok,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def profile_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (bounded-error rank sketch) — the percentile
    that actually runs at 100 TB: constant memory per group vs the exact
    buffer's O(group) memory. Sketch estimates are engine-specific, so
    the oracle contract mirrors profile_approx_distinct: exact quantiles
    + a within-tolerance bound on the sketch (accuracy 10000 -> assert
    the estimate lands within 1% of the exact value's magnitude)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("ex"),
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)"
        ).alias("ap"),
        F.count("*").alias("n"),
    )

    def ok(i: int) -> F.Column:
        return (
            F.abs(F.element_at("ap", i) - F.element_at("ex", i))
            / F.element_at("ex", i)
            <= F.lit(0.01)
        )

    return agg.select(
        "l_returnflag",
        F.round(F.element_at("ex", 1), 4).alias("p50_exact"),
        F.round(F.element_at("ex", 2), 4).alias("p90_exact"),
        ok(1).alias("p50_sketch_ok"),
        ok(2).alias("p90_sketch_ok"),
        "n",
    )


@query(
    "profile_approx_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey)  AS exact_parts,
           COUNT(DISTINCT l_suppkey)  AS exact_supps,
           TRUE AS orders_sketch_ok,
           TRUE AS parts_sketch_ok,
           TRUE AS supps_sketch_ok
    FROM lineitem
    """,
)
def profile_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) profile — the sketch that
    replaces exact COUNT(DISTINCT) at 100 TB (no exact-dedup shuffle of
    the full key set). HLL estimates are engine-specific, so the oracle
    contract is exact counts + a within-tolerance bound on the sketch
    (rsd 2%, asserted at 4x): the oracle expects every sketch_ok flag
    TRUE. The exact COUNT(DISTINCT) here exists to judge the sketch; at
    production scale only the sketch runs."""
    li = load_table(spark, sf_dir, "lineitem")

    # One single-distinct agg per column, assembled by crossJoin of the
    # 1-row results: N distinct aggregates in ONE agg make Catalyst plan
    # an Expand (row multiplication by the distinct-group count) — 5x
    # slower at sf0.1 (39s vs 8s measured) and quadratically worse at
    # scale. Single-distinct aggs partial-dedup map-side instead.
    def col_agg(col: str, tag: str) -> DataFrame:
        return li.agg(
            F.countDistinct(col).alias(f"exact_{tag}"),
            F.approx_count_distinct(col, rsd=0.02).alias(f"a_{tag}"),
        )

    agg = (
        col_agg("l_orderkey", "orders")
        .crossJoin(col_agg("l_partkey", "parts"))
        .crossJoin(col_agg("l_suppkey", "supps"))
    )

    def ok(approx: str, exact: str) -> F.Column:
        return (
            F.abs(F.col(approx) - F.col(exact)) / F.col(exact) <= F.lit(0.08)
        )

    return agg.select(
        "exact_orders",
        "exact_parts",
        "exact_supps",
        ok("a_orders", "exact_orders").alias("orders_sketch_ok"),
        ok("a_parts", "exact_parts").alias("parts_sketch_ok"),
        ok("a_supps", "exact_supps").alias("supps_sketch_ok"),
    )


# --------------------------------------------------------------------------
# Profiling extension: ROLLUP over the order-revenue hierarchy. The
# reference has no grouping-sets analogue (SURVEY §2.4: MySQL-era SQL with
# plain GROUP BY); at scale the rollup is one pass — Spark expands the
# grouping sets map-side and partial-aggregates before the single shuffle,
# vs. the naive UNION ALL of three separate scans.
# --------------------------------------------------------------------------
@query(
    "profile_rollup_revenue",
    oracle="""
    SELECT coalesce(n.n_name, '<all>') AS nation,
           CASE WHEN GROUPING(year(o.o_orderdate)) = 1 THEN -1
                ELSE year(o.o_orderdate) END AS order_year,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY ROLLUP (n.n_name, year(o.o_orderdate))
    """,
)
def profile_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue profile at three granularities in ONE aggregation pass:
    (nation, year), (nation), and grand total via ROLLUP. Exact decimal
    sums cast to double only at the edge (the A8 decimal contract);
    NULL grouping slots are canonicalized ('<all>' / -1) so the rollup
    NULL is distinguishable from a genuinely NULL key on both sides."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = o.join(c, o["o_custkey"] == c["c_custkey"]).join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    )
    rolled = (
        joined.select(
            "n_name",
            F.year("o_orderdate").alias("yr"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .rollup("n_name", "yr")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
            F.grouping("yr").alias("g_yr"),
        )
    )
    # Drop the cube's (yr-only) sets? rollup emits exactly the hierarchy:
    # (n_name, yr), (n_name), (); canonicalize the rollup NULLs.
    return rolled.select(
        F.coalesce("n_name", F.lit("<all>")).alias("nation"),
        F.when(F.col("g_yr") == 1, F.lit(-1)).otherwise(F.col("yr")).alias(
            "order_year"
        ),
        "n_orders",
        "revenue",
    )


_DQ_SQL = """
    WITH o AS (
      SELECT
        AVG(CASE WHEN o_orderdate IS NOT NULL THEN 1.0 ELSE 0.0 END) AS m1,
        COUNT(DISTINCT o_orderkey) * 1.0 / COUNT(*)                 AS m2,
        AVG(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1.0 ELSE 0.0 END)
                                                                    AS m3,
        AVG(CASE WHEN o_totalprice > 0 THEN 1.0 ELSE 0.0 END)       AS m4,
        AVG(CASE WHEN o_totalprice <= 400000 THEN 1.0 ELSE 0.0 END) AS m5
      FROM orders),
    l AS (
      SELECT
        AVG(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 1.0 ELSE 0.0 END)
                                                                    AS m6,
        AVG(CASE WHEN l_quantity > 0 THEN 1.0 ELSE 0.0 END)         AS m7
      FROM lineitem),
    fk1 AS (
      SELECT 1.0 - COUNT(*) FILTER (o.o_orderkey IS NULL) * 1.0 / COUNT(*)
               AS m8
      FROM lineitem li LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey),
    fk2 AS (
      SELECT 1.0 - COUNT(*) FILTER (c.c_custkey IS NULL) * 1.0 / COUNT(*)
               AS m9
      FROM orders ord LEFT JOIN customer c ON ord.o_custkey = c.c_custkey),
    m AS (SELECT * FROM o, l, fk1, fk2),
    rep AS (
      SELECT 'completeness(o_orderdate)' AS check_name, m1 AS m FROM m
      UNION ALL SELECT 'uniqueness(o_orderkey)', m2 FROM m
      UNION ALL SELECT 'set(o_orderstatus in O,F,P)', m3 FROM m
      UNION ALL SELECT 'range(o_totalprice > 0)', m4 FROM m
      UNION ALL SELECT 'range(o_totalprice <= 400000)', m5 FROM m
      UNION ALL SELECT 'range(l_discount in [0, 0.1])', m6 FROM m
      UNION ALL SELECT 'range(l_quantity > 0)', m7 FROM m
      UNION ALL SELECT 'fk(lineitem.l_orderkey -> orders)', m8 FROM m
      UNION ALL SELECT 'fk(orders.o_custkey -> customer)', m9 FROM m)
    SELECT check_name, ROUND(m, 6) AS metric, m = 1.0 AS passed FROM rep
"""


@query("dq_constraint_report", oracle=_DQ_SQL)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative data-quality report: completeness,
    uniqueness, value-set, range, and referential-integrity constraints
    evaluated as ONE metrics pass per table (all per-table constraints
    fold into a single aggregate scan — the Deequ design that makes a
    50-constraint suite cost two table scans at 100 TB, not 50), plus
    one anti-join-shaped probe per foreign key. The 1-row metric frames
    cross-join (trivially, 1x1) and unpivot into the report. `metric` is
    the satisfaction fraction; `passed` iff it is exactly 1.0 — the
    o_totalprice <= 400k constraint genuinely fails on this data, so the
    report exercises both outcomes."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    def frac(cond) -> F.Column:
        return F.avg(F.when(cond, 1.0).otherwise(0.0))

    # One metrics pass per table; the row counts the FK ratios need ride
    # along in the same pass (no extra COUNT(*) scans).
    om = o.agg(
        frac(F.col("o_orderdate").isNotNull()).alias("m1"),
        (F.countDistinct("o_orderkey") / F.count("*")).alias("m2"),
        frac(F.col("o_orderstatus").isin("O", "F", "P")).alias("m3"),
        frac(F.col("o_totalprice") > 0).alias("m4"),
        frac(F.col("o_totalprice") <= 400000).alias("m5"),
        F.count("*").alias("n_orders"),
    )
    lm = li.agg(
        frac(F.col("l_discount").between(0, 0.1)).alias("m6"),
        frac(F.col("l_quantity") > 0).alias("m7"),
        F.count("*").alias("n_li"),
    )
    # FK satisfaction via left-anti counts: the anti join ships only the
    # key columns; at scale AQE turns the dim side into a broadcast.
    fk1 = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count("*").alias("orph1"))
    )
    fk2 = (
        o.select("o_custkey")
        .join(c.select("c_custkey"), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count("*").alias("orph2"))
    )
    m = (
        om.crossJoin(lm)
        .crossJoin(fk1)
        .crossJoin(fk2)
        .withColumn("m8", 1.0 - F.col("orph1") / F.col("n_li"))
        .withColumn("m9", 1.0 - F.col("orph2") / F.col("n_orders"))
    )
    labels = [
        ("m1", "completeness(o_orderdate)"),
        ("m2", "uniqueness(o_orderkey)"),
        ("m3", "set(o_orderstatus in O,F,P)"),
        ("m4", "range(o_totalprice > 0)"),
        ("m5", "range(o_totalprice <= 400000)"),
        ("m6", "range(l_discount in [0, 0.1])"),
        ("m7", "range(l_quantity > 0)"),
        ("m8", "fk(lineitem.l_orderkey -> orders)"),
        ("m9", "fk(orders.o_custkey -> customer)"),
    ]
    stack = ", ".join(f"'{lab}', {col}" for col, lab in labels)
    rep = m.selectExpr(
        f"stack({len(labels)}, {stack}) AS (check_name, m)"
    )
    return rep.select(
        "check_name",
        F.round("m", 6).alias("metric"),
        (F.col("m") == 1.0).alias("passed"),
    )


@query(
    "j12_salted_skew_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def j12_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statically salted fact-to-dim join (operators/salt.py:salted_join)
    — the manual skew fix for when a hot fact key would cap a stage at
    one task and the dim side is too big to broadcast. The fact side is
    salted per row, the dim side replicated n_salts times, the join key
    becomes (key, salt): row-identical to the plain join (that IS the
    oracle), but each hot key now spreads over n_salts tasks. Completes
    the engine's skew toolkit: AQE skew-join (runtime, sort-merge),
    salted_agg (skewed aggregations), salted_join (statically skewed
    fact joins)."""
    from loris_mri_spark.operators.salt import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, "l_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@query(
    "s12c_merge_upsert",
    oracle="""
    WITH tgt AS (SELECT c_custkey, c_acctbal FROM customer
                 WHERE c_custkey % 3 <> 0),
    src AS (SELECT o_custkey AS c_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS spend
            FROM orders GROUP BY o_custkey)
    SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
           ROUND(COALESCE(t.c_acctbal, 0) + COALESCE(s.spend, 0), 2)
             AS balance,
           CASE WHEN t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
                THEN 'updated'
                WHEN t.c_custkey IS NULL THEN 'inserted'
                ELSE 'unchanged' END AS merge_status
    FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
    """,
)
def s12c_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (SCD1 upsert) via operators/merge.py: a CDC-style
    source (per-customer spend from orders) merged into a target missing
    every third customer, so all three branches fire — WHEN MATCHED
    updates the balance, WHEN NOT MATCHED inserts the new customer, and
    untouched rows pass through. One full-outer join; at scale the
    merged image lands via dynamic partition overwrite or a versioned
    snapshot (see the operator docstring)."""
    from loris_mri_spark.operators.merge import merge_upsert

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    target = c.filter(F.col("c_custkey") % 3 != 0).select(
        "c_custkey", "c_acctbal"
    )
    source = (
        o.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("spend")
        )
    )
    merged = merge_upsert(
        target,
        source,
        key="c_custkey",
        when_matched={
            "balance": F.col("t.c_acctbal") + F.col("s.spend")
        },
        when_not_matched={"balance": F.col("s.spend")},
        when_not_matched_by_source={"balance": F.col("t.c_acctbal")},
        status_col="merge_status",
    )
    return merged.select(
        "c_custkey",
        F.round("balance", 2).alias("balance"),
        "merge_status",
    )


@query(
    "scd2_state_history",
    oracle="""
    WITH ev AS (SELECT user_id, event_type,
                       epoch_us(ts) AS ts_us, event_id
                FROM events),
    marked AS (
      SELECT user_id, event_type, ts_us, event_id,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    seg AS (
      SELECT user_id, event_type, ts_us,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM marked),
    hist AS (
      SELECT user_id, event_type, CAST(version AS BIGINT) AS version,
             MIN(ts_us) AS valid_from_us, COUNT(*) AS n_events
      FROM seg GROUP BY user_id, event_type, version)
    SELECT user_id, version, event_type, valid_from_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
             AS valid_to_us,
           LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
             IS NULL AS is_current,
           n_events
    FROM hist
    """,
)
def scd2_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 history build: each user's event-type stream collapsed
    into validity-interval versions — consecutive identical states merge
    into one row with valid_from/valid_to (µs epochs) and an is_current
    flag on the open interval. The dimension-history maintenance every
    warehouse runs, as two windows + one agg, all partitioned by the
    natural key (never a global sort): change-detection via LAG, version
    numbering via running SUM of change marks (gaps-and-islands), then
    LEAD over the per-version starts for the interval close."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
        "event_id",
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type").over(w_ord).eqNullSafe(
                F.col("event_type")
            ),
            1,
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = marked.withColumn("version", F.sum("chg").over(w_run))
    hist = seg.groupBy(
        "user_id", "event_type", F.col("version").cast("long").alias("version")
    ).agg(
        F.min("ts_us").alias("valid_from_us"),
        F.count("*").alias("n_events"),
    )
    w_ver = Window.partitionBy("user_id").orderBy("version")
    return hist.select(
        "user_id",
        "version",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(w_ver).alias("valid_to_us"),
        F.lead("valid_from_us").over(w_ver).isNull().alias("is_current"),
        "n_events",
    )


@query(
    "profile_histogram",
    oracle="""
    WITH mm AS (SELECT MIN(l_extendedprice) AS lo,
                       MAX(l_extendedprice) AS hi
                FROM lineitem),
    b AS (SELECT CAST(LEAST(FLOOR((l_extendedprice - lo) * 20.0
                                  / (hi - lo)), 19) AS BIGINT) AS bucket,
                 l_extendedprice
          FROM lineitem, mm)
    SELECT bucket, COUNT(*) AS n,
           ROUND(MIN(l_extendedprice), 2) AS lo_r,
           ROUND(MAX(l_extendedprice), 2) AS hi_r
    FROM b GROUP BY bucket
    """,
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram profile (20 buckets over the global
    [min, max]) — the distribution sketch every profiler draws. Two
    passes: a 1-row min/max agg broadcast into the bucketing expression,
    then one hash-agg by bucket. The bucket formula is pure IEEE
    arithmetic ((x-lo)*20/(hi-lo), no libm), so both engines compute
    bit-identical bucket ids and the oracle hash-matches without any
    tolerance."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    mm = li.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    b = li.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("lo"))
                * 20.0
                / (F.col("hi") - F.col("lo"))
            ),
            F.lit(19),
        )
        .cast("long")
        .alias("bucket"),
        "l_extendedprice",
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("lo_r"),
        F.round(F.max("l_extendedprice"), 2).alias("hi_r"),
    )


@query(
    "c7b_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           COUNT(json_extract_string(props, '$.missing')) AS n_missing
    FROM events GROUP BY event_type
    """,
)
def c7b_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured profiling through the VARIANT type (Spark 4):
    `parse_json` once into a binary-encoded variant, then typed
    `try_variant_get` extraction — the 100 TB answer to JSON columns
    (parse once, store shredded/columnar, no per-query string
    re-parsing the way get_json_object does). try_variant_get on an
    absent path yields NULL, counted by the n_missing probe."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.try_variant_get("v", "$.k", "long")
    missing = F.try_variant_get("v", "$.missing", "long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count(missing).alias("n_missing"),
    )


@query(
    "f11_null_semantics",
    oracle="""
    SELECT
      COUNT(CASE WHEN o_orderstatus IN ('O', 'F', NULL) THEN 1 END)
        AS n_in_with_null,
      COUNT(CASE WHEN o_orderstatus NOT IN ('X', NULL) THEN 1 END)
        AS n_not_in_with_null,
      COUNT(CASE WHEN NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL
                 THEN 1 END) AS n_nullsafe_eq_null,
      COUNT(CASE WHEN NULLIF(o_orderstatus, 'O') = NULL THEN 1 END)
        AS n_plain_eq_null,
      COUNT(NULLIF(o_orderstatus, 'O')) AS n_count_col,
      COUNT(*) AS n_count_star,
      CAST(SUM(CASE WHEN COALESCE(NULLIF(o_orderstatus, 'O'), 'fallback')
                         = 'fallback' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_coalesced
    FROM orders
    """,
)
def f11_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic parity probe: the NULL corners engines
    disagree on most, pinned against the oracle in one scan —
    `x IN (..., NULL)` (TRUE or NULL, never FALSE), `x NOT IN (..,
    NULL)` (never TRUE: the classic silent-empty-result bug),
    null-safe `<=>` vs plain `=` against NULL, COUNT(col) vs COUNT(*),
    and COALESCE fallback. The filter-predicate F-family (F2/F3/F7)
    relies on exactly these semantics; this query makes the contract
    itself a driver-checked row."""
    o = load_table(spark, sf_dir, "orders")
    st = F.col("o_orderstatus")
    nl = F.nullif(st, F.lit("O"))
    cnt = lambda c: F.count(F.when(c, 1))  # noqa: E731 — count TRUE only
    return o.agg(
        cnt(st.isin("O", "F", None)).alias("n_in_with_null"),
        cnt(~st.isin("X", None)).alias("n_not_in_with_null"),
        cnt(nl.eqNullSafe(F.lit(None))).alias("n_nullsafe_eq_null"),
        cnt(nl == F.lit(None)).alias("n_plain_eq_null"),
        F.count(nl).alias("n_count_col"),
        F.count("*").alias("n_count_star"),
        F.sum(
            F.when(
                F.coalesce(nl, F.lit("fallback")) == "fallback", 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_coalesced"),
    )


# --------------------------------------------------------------------------
# T5d — DYNAMIC-GAP session windows: each event type proposes its own
# inactivity timeout (purchases hold sessions open longer than clicks).
# Spark semantics: event e contributes interval [ts, ts+gap(e)); a later
# event merges into the session iff its ts lands before the running
# session end (max of contributed ends). The oracle replays that with a
# running-max gaps-and-islands in integer µs.
# --------------------------------------------------------------------------
_T5D_GAP_SQL = """CASE event_type WHEN 'purchase' THEN 3600000000
                     WHEN 'click' THEN 900000000
                     ELSE 1800000000 END"""


@query(
    "t5d_dynamic_session_window",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                      CAST(value AS DECIMAL(14,4)) AS v,
                      {_T5D_GAP_SQL} AS gap_us
               FROM events),
    run AS (
      SELECT user_id, ts_us, v,
             MAX(ts_us + gap_us) OVER (
               PARTITION BY user_id ORDER BY ts_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end
      FROM e),
    flagged AS (
      SELECT user_id, ts_us, v,
             CASE WHEN prev_end IS NULL OR ts_us >= prev_end
                  THEN 1 ELSE 0 END AS new_session
      FROM run),
    islands AS (
      SELECT user_id, ts_us, v,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sid
      FROM flagged)
    SELECT user_id, MIN(ts_us) AS session_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS total_value
    FROM islands GROUP BY user_id, sid
    """,
)
def t5d_dynamic_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a DYNAMIC gap (`session_window(ts, expr)`):
    the inactivity timeout is per-event (purchase 60 min, click 15 min,
    else 30 min) — the sessionization real clickstream pipelines need,
    where a conversion should hold the session open longer than a
    passive click. The oracle replays the merge rule (running max of
    per-event proposed ends) relationally in integer µs."""
    e = load_table(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "purchase", "60 minutes")
        .when(F.col("event_type") == "click", "15 minutes")
        .otherwise("30 minutes")
    )
    return (
        e.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(14,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            "n_events",
            "total_value",
        )
    )


@query(
    "w6_rank_variants",
    oracle="""
    WITH base AS (
      SELECT o_custkey, o_orderkey, o_totalprice FROM orders
      WHERE o_custkey < 200)
    SELECT o_custkey, o_orderkey,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drank,
           ROUND(PERCENT_RANK() OVER w, 6) AS prank,
           ROUND(CUME_DIST() OVER w, 6) AS cdist,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM base
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def w6_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-family breadth: dense_rank / percent_rank / cume_dist / ntile
    over one per-customer window — the full ranking-function surface
    beyond W1-W3's row_number/top-1, on identical ANSI definitions both
    engines implement (total order via the orderkey tie-break keeps
    ntile deterministic)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 200
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "u4_intersect_except_all",
    oracle="""
    WITH a AS (SELECT o_custkey AS k FROM orders
               WHERE o_orderstatus = 'O'),
    b AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
    i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
    x AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    SELECT 'intersect_all' AS op, COUNT(*) AS n,
           COUNT(DISTINCT k) AS n_distinct FROM i
    UNION ALL
    SELECT 'except_all', COUNT(*), COUNT(DISTINCT k) FROM x
    """,
)
def u4_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-family breadth: INTERSECT ALL and EXCEPT ALL — the
    multiplicity-preserving set operations (bag semantics: min/
    difference of per-key counts), beyond U1-U3's union/distinct/map
    difference. Catalyst plans both as aggregate+join under the hood;
    the report is count + distinct-count per operation."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    i = a.intersectAll(b).agg(
        F.count("*").alias("n"), F.countDistinct("k").alias("n_distinct")
    ).select(F.lit("intersect_all").alias("op"), "n", "n_distinct")
    x = a.exceptAll(b).agg(
        F.count("*").alias("n"), F.countDistinct("k").alias("n_distinct")
    ).select(F.lit("except_all").alias("op"), "n", "n_distinct")
    return i.unionByName(x)


@query(
    "sql_exists_correlated",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(CASE WHEN EXISTS (
                   SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_totalprice > 300000)
                 THEN 1 END) AS n_big_spenders,
           COUNT(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey)
                 THEN 1 END) AS n_no_orders
    FROM customer c GROUP BY c_mktsegment
    """,
)
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface breadth: correlated EXISTS / NOT EXISTS subqueries in
    a conditional aggregation — Catalyst decorrelates them into
    semi/anti joins (visible in the plan), the declarative form of
    J5/J6. Runs through spark.sql over the registered views, proving
    the engine's SQL text surface handles correlation, not just the
    DataFrame API."""
    from loris_mri_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               COUNT(CASE WHEN EXISTS (
                       SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 300000)
                     THEN 1 END) AS n_big_spenders,
               COUNT(CASE WHEN NOT EXISTS (
                       SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey)
                     THEN 1 END) AS n_no_orders
        FROM customer c GROUP BY c_mktsegment
        """
    )


@query(
    "sql_pivot_unpivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def sql_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface breadth: the native PIVOT clause (wide-format counts
    of line status per return flag) — the declarative sibling of the
    EAV pivot operator (J2), planned by Catalyst as a single aggregate
    with pivot-column projection; the oracle states the equivalent
    conditional aggregation."""
    from loris_mri_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, n_f, n_o FROM (
          SELECT l_returnflag, l_linestatus FROM lineitem
        ) PIVOT (
          COUNT(*) FOR l_linestatus IN ('F' AS n_f, 'O' AS n_o)
        )
        """
    )


@query(
    "c3b_calendar_functions",
    oracle="""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS od FROM orders),
    f AS (SELECT od,
                 year(od) AS yr, quarter(od) AS q,
                 dayofweek(od) AS dow0,
                 CAST(date_trunc('month', od) AS VARCHAR) AS month_start,
                 CAST(last_day(od) AS VARCHAR) AS month_end,
                 CAST(CAST(od + INTERVAL 3 MONTH AS DATE) AS VARCHAR)
                   AS plus3m,
                 datediff('day', DATE '1990-01-01', od) AS days_since
          FROM d)
    SELECT yr, q, COUNT(*) AS n,
           CAST(SUM(dow0) AS BIGINT) AS sum_dow0,
           MIN(month_start) AS first_month_start,
           MAX(month_end) AS last_month_end,
           MAX(plus3m) AS max_plus3m,
           CAST(MAX(days_since) AS BIGINT) AS max_days_since
    FROM f GROUP BY yr, q
    """,
)
def c3b_calendar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 breadth: the calendar-function surface — quarter, day-of-week
    (normalized to DuckDB's 0=Sunday), month truncation, month-end
    (last_day's leap-year clamping), add_months' end-of-month clamp,
    and day arithmetic from an epoch — aggregated per (year, quarter)
    so every function's value participates in the hash check."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("od")
    )
    f = o.select(
        "od",
        F.year("od").alias("yr"),
        F.quarter("od").alias("q"),
        (F.dayofweek("od") - 1).alias("dow0"),
        F.date_trunc("month", "od").cast("date").cast("string").alias("month_start"),
        F.last_day("od").cast("string").alias("month_end"),
        F.add_months("od", 3).cast("string").alias("plus3m"),
        F.datediff("od", F.lit("1990-01-01").cast("date")).alias(
            "days_since"
        ),
    )
    return f.groupBy("yr", "q").agg(
        F.count("*").alias("n"),
        F.sum("dow0").cast("long").alias("sum_dow0"),
        F.min("month_start").alias("first_month_start"),
        F.max("month_end").alias("last_month_end"),
        F.max("plus3m").alias("max_plus3m"),
        F.max("days_since").cast("long").alias("max_days_since"),
    )


@query(
    "profile_hll_union",
    oracle="""
    WITH seg AS (
      SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_seg
      FROM orders GROUP BY o_orderpriority),
    tot AS (SELECT COUNT(DISTINCT o_custkey) AS exact_total FROM orders)
    SELECT s.o_orderpriority, s.exact_seg,
           TRUE AS seg_sketch_ok,
           t.exact_total,
           TRUE AS total_sketch_ok
    FROM seg s, tot t
    """,
)
def profile_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Datasketches HLL): one sketch
    per segment, then the GLOBAL count from `hll_union_agg` over the
    per-segment sketch BINARIES — never re-touching the rows. This is
    the sketch property that matters at 100 TB: per-partition/per-day
    sketches persist as bytes and any rollup (segment, month, global)
    is a cheap union of sketches, not a re-scan. The oracle carries the
    exact counts; the sketch estimates are asserted within 5% (the
    engine-specific estimate itself is not hashed — same contract as
    profile_approx_distinct)."""
    o = load_table(spark, sf_dir, "orders")
    seg = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_seg"),
        F.hll_sketch_agg("o_custkey", 14).alias("sk"),
    )
    merged = seg.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total")
    )
    tot = o.agg(F.countDistinct("o_custkey").alias("exact_total"))
    return (
        seg.select(
            "o_orderpriority",
            "exact_seg",
            (
                F.abs(
                    F.hll_sketch_estimate("sk") - F.col("exact_seg")
                )
                / F.col("exact_seg")
                <= 0.05
            ).alias("seg_sketch_ok"),
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(merged))
        .select(
            "o_orderpriority",
            "exact_seg",
            "seg_sketch_ok",
            "exact_total",
            (
                F.abs(F.col("est_total") - F.col("exact_total"))
                / F.col("exact_total")
                <= 0.05
            ).alias("total_sketch_ok"),
        )
    )


@query(
    "j13_band_join_bucketed",
    oracle="""
    WITH p AS (SELECT p_partkey AS k,
                      CAST(ROUND(p_retailprice * 10) AS BIGINT) AS pd
               FROM part)
    SELECT COUNT(*) AS n_pairs,
           CAST(SUM(ABS(a.pd - b.pd)) AS BIGINT) AS sum_absdiff_deci
    FROM p a JOIN p b ON a.k < b.k AND ABS(a.pd - b.pd) <= 2
    """,
)
def j13_band_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAND JOIN without the quadratic plan: |price_a - price_b| <= 0.2
    over all part pairs. A naive inequality join is a cartesian product
    (Catalyst can only nested-loop a pure inequality); the scale path
    BUCKETS both sides by the band width — each left row probes its own
    and both adjacent buckets (a 3-way explode), the join becomes an
    EQUI-join on the bucket id, and the exact band predicate filters
    the O(band-density) candidates. Prices live in exact integer
    deci-units (round(p*10)) so bucket ids and the band predicate are
    integer math on both engines; each qualifying pair matches in
    exactly one probe bucket, so no distinct is needed. The oracle is
    the plain inequality join — tractable at oracle scale, while the
    Spark plan stays shuffle-bounded at any scale."""
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.round(F.col("p_retailprice") * 10).cast("long").alias("pd"),
    )
    band = 2  # deci-units == 0.2 currency units
    a = p.select(
        F.col("k").alias("ka"),
        F.col("pd").alias("pda"),
        F.explode(
            F.array(
                (F.col("pd") / band).cast("long") - 1,
                (F.col("pd") / band).cast("long"),
                (F.col("pd") / band).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    b = p.select(
        F.col("k").alias("kb"),
        F.col("pd").alias("pdb"),
        (F.col("pd") / band).cast("long").alias("bucket"),
    )
    pairs = a.join(b, "bucket").filter(
        (F.col("ka") < F.col("kb"))
        & (F.abs(F.col("pda") - F.col("pdb")) <= band)
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.abs(F.col("pda") - F.col("pdb")))
        .cast("long")
        .alias("sum_absdiff_deci"),
    )


@query(
    "a10_statistical_aggregates",
    oracle="""
    WITH m AS (SELECT l_returnflag, AVG(l_quantity) AS mu,
                      COUNT(*) AS n
               FROM lineitem GROUP BY l_returnflag),
    c AS (SELECT l.l_returnflag,
                 AVG(POW(l.l_quantity - m.mu, 2)) AS m2,
                 AVG(POW(l.l_quantity - m.mu, 3)) AS m3,
                 AVG(POW(l.l_quantity - m.mu, 4)) AS m4
          FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
          GROUP BY l.l_returnflag),
    s AS (SELECT l_returnflag,
                 regr_slope(l_extendedprice, l_quantity) AS slope,
                 regr_intercept(l_extendedprice, l_quantity) AS icept,
                 regr_r2(l_extendedprice, l_quantity) AS r2,
                 corr(l_extendedprice, l_quantity) AS rho,
                 covar_samp(l_extendedprice, l_quantity) AS cov,
                 stddev_samp(l_quantity) AS sd,
                 median(l_quantity) AS med
          FROM lineitem GROUP BY l_returnflag)
    SELECT s.l_returnflag,
           ROUND(slope, 6) AS slope_r, ROUND(icept, 4) AS icept_r,
           ROUND(r2, 6) AS r2_r, ROUND(rho, 6) AS corr_r,
           ROUND(cov, 4) AS covar_r, ROUND(sd, 6) AS stddev_r,
           ROUND(c.m3 / POW(c.m2, 1.5), 6) AS skew_pop_r,
           ROUND(c.m4 / POW(c.m2, 2) - 3, 6) AS kurt_pop_r,
           ROUND(med, 4) AS median_r
    FROM s JOIN c ON s.l_returnflag = c.l_returnflag
    """,
)
def a10_statistical_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family breadth: the statistical aggregate surface — OLS
    regression (slope/intercept/r2: the 'many models' per-group fit as
    pure aggregation, no ML library), correlation, sample covariance
    and stddev, population skewness/kurtosis, and median, per return
    flag. Spark's skewness/kurtosis are POPULATION moments while
    DuckDB's are sample-corrected, so the oracle derives the population
    values from CENTERED moments (computed against the group mean — raw
    power sums would cancel catastrophically at price magnitudes)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "slope_r"
        ),
        F.round(
            F.regr_intercept("l_extendedprice", "l_quantity"), 4
        ).alias("icept_r"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias(
            "r2_r"
        ),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias(
            "corr_r"
        ),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias(
            "covar_r"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("stddev_r"),
        F.round(F.skewness("l_quantity"), 6).alias("skew_pop_r"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_pop_r"),
        F.round(F.median("l_quantity"), 4).alias("median_r"),
    )


@query(
    "w7_forward_fill",
    oracle="""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                      CASE WHEN event_type = 'purchase'
                           THEN ROUND(CAST(value AS DECIMAL(14,4)), 4)
                      END AS sparse_v
               FROM events)
    SELECT user_id, event_id,
           CAST(last_value(sparse_v IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS filled_v
    FROM e
    """,
)
def w7_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD FILL (last-observation-carried-forward): a measurement
    that exists only on purchase events is propagated to every later
    event of the same user — the gap-filling every sparse sensor /
    price series needs, as one `last(..., ignorenulls)` running window
    per key (no self-join, no explode of the timeline). Rows before a
    user's first observation stay NULL — fills never cross the
    partition boundary."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value").cast("decimal(14,4)"), 4),
        ).alias("sparse_v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.last("sparse_v", ignorenulls=True)
        .over(w)
        .cast("double")
        .alias("filled_v"),
    )


@query(
    "profile_skew_report",
    oracle="""
    WITH k AS (SELECT l_suppkey AS key, COUNT(*) AS n FROM lineitem
               GROUP BY l_suppkey),
    s AS (SELECT COUNT(*) AS n_keys,
                 CAST(SUM(n) AS BIGINT) AS n_rows,
                 CAST(MAX(n) AS BIGINT) AS max_key_rows,
                 CAST(quantile_disc(n, 0.99) AS BIGINT) AS p99_key_rows,
                 AVG(n) AS mean_key_rows
          FROM k)
    SELECT n_keys, n_rows, max_key_rows, p99_key_rows,
           ROUND(max_key_rows / mean_key_rows, 4) AS max_over_mean_r,
           ROUND(max_key_rows * 1.0 / n_rows, 6) AS top_key_share_r
    FROM s
    """,
)
def profile_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKEW DIAGNOSIS — the report run BEFORE choosing a join/agg
    strategy: per-key row counts of the prospective shuffle key
    (l_suppkey), reduced to the ratios that drive the decision —
    max/mean (how unbalanced the biggest task is; > ~5 means AQE skew
    splitting or salting) and top-key share (what fraction of all rows
    one task would own). One partial-agg pass over the key column plus
    a key-cardinality-sized reduction; `percentile_disc`-style p99 is
    exact on the (small) per-key count table."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count("*").alias("n")
    )
    s = k.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_key_rows"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY n)")
        .cast("long")
        .alias("p99_key_rows"),
        F.avg("n").alias("mean_key_rows"),
    )
    return s.select(
        "n_keys",
        "n_rows",
        "max_key_rows",
        "p99_key_rows",
        F.round(F.col("max_key_rows") / F.col("mean_key_rows"), 4).alias(
            "max_over_mean_r"
        ),
        F.round(F.col("max_key_rows") / F.col("n_rows"), 6).alias(
            "top_key_share_r"
        ),
    )


_J14_GRID = 6 * 3600 * 1_000_000  # 6-hour grid in µs


@query(
    "j14_interval_overlap_join",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
               FROM events),
    lo AS (SELECT MIN(ts_us) AS lo, MAX(ts_us) AS hi FROM e),
    flagged AS (
      SELECT user_id, ts_us,
             CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    sess AS (
      SELECT user_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                              ROWS UNBOUNDED PRECEDING) AS sid,
             ts_us
      FROM flagged),
    intervals AS (SELECT user_id, sid, MIN(ts_us) AS s_start,
                         MAX(ts_us) AS s_end
                  FROM sess GROUP BY user_id, sid),
    win AS (SELECT CAST(i AS BIGINT) AS window_idx,
                   lo + i * {_J14_GRID} AS w_start,
                   lo + (i + 1) * {_J14_GRID} AS w_end
            FROM (SELECT lo, hi, unnest(range(0, 10000)) AS i FROM lo)
            WHERE i <= (hi - lo) // {_J14_GRID}),
    ovl AS (
      SELECT w.window_idx, i.user_id, i.sid
      FROM win w JOIN intervals i
        ON i.s_start < w.w_end AND w.w_start <= i.s_end)
    SELECT w.window_idx,
           CAST(COUNT(o.user_id) AS BIGINT) AS n_sessions
    FROM win w LEFT JOIN ovl o ON o.window_idx = w.window_idx
    GROUP BY w.window_idx
    """,
)
def j14_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP JOIN of two interval SETS — user sessions
    (30-min-gap islands) against a 6-hour maintenance-window grid —
    the genomics/calendar join a naive plan turns into a cartesian
    nested loop. Scale shape: each session EXPLODES into the grid
    cells it covers (sessions are short, so the fan-out is 1-2 cells),
    the join becomes an EQUI-join on the cell id, and the exact
    overlap predicate is just a sanity re-check (a grid cell of width
    = window width makes cell membership exactly overlap — each pair
    matches in exactly one... multiple cells for spanning sessions, so
    a DISTINCT collapses them). Zero-overlap windows are kept by the
    left join. The oracle is the plain inequality join."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts_ns div 1000").alias("ts_us"), "event_id"
    )
    lo, hi = e.agg(F.min("ts_us"), F.max("ts_us")).first()
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = (
        e.withColumn(
            "new_s",
            F.when(
                F.lag("ts_us").over(w_ord).isNull()
                | (F.col("ts_us") - F.lag("ts_us").over(w_ord) > 1_800_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(w_run))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts_us").alias("s_start"), F.max("ts_us").alias("s_end")
        )
    )
    n_win = (hi - lo) // _J14_GRID + 1
    win = spark.range(n_win).select(
        F.col("id").alias("window_idx"),
        (F.lit(lo) + F.col("id") * _J14_GRID).alias("w_start"),
        (F.lit(lo) + (F.col("id") + 1) * _J14_GRID).alias("w_end"),
    )
    cells = sess.select(
        "user_id",
        "sid",
        "s_start",
        "s_end",
        F.explode(
            F.sequence(
                F.expr(f"(s_start - {lo}L) div {_J14_GRID}L"),
                F.expr(f"(s_end - {lo}L) div {_J14_GRID}L"),
            )
        ).alias("window_idx"),
    )
    overlaps = (
        cells.join(F.broadcast(win), "window_idx")
        .filter(
            (F.col("s_start") < F.col("w_end"))
            & (F.col("w_start") <= F.col("s_end"))
        )
        .select("window_idx", "user_id", "sid")
        .distinct()
    )
    counts = overlaps.groupBy("window_idx").agg(
        F.count("*").alias("n")
    )
    return win.join(counts, "window_idx", "left").select(
        "window_idx",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_sessions"),
    )


@query(
    "profile_columns",
    oracle="""
    WITH m AS (SELECT
        COUNT(*) AS n_rows,
        COUNT(o_orderkey) AS nn1, COUNT(DISTINCT o_orderkey) AS nd1,
        CAST(MIN(o_orderkey) AS VARCHAR) AS mn1,
        CAST(MAX(o_orderkey) AS VARCHAR) AS mx1,
        COUNT(o_orderstatus) AS nn2, COUNT(DISTINCT o_orderstatus) AS nd2,
        MIN(o_orderstatus) AS mn2, MAX(o_orderstatus) AS mx2,
        COUNT(o_totalprice) AS nn3, COUNT(DISTINCT o_totalprice) AS nd3,
        CAST(MIN(o_totalprice) AS VARCHAR) AS mn3,
        CAST(MAX(o_totalprice) AS VARCHAR) AS mx3,
        COUNT(o_orderpriority) AS nn4,
        COUNT(DISTINCT o_orderpriority) AS nd4,
        MIN(o_orderpriority) AS mn4, MAX(o_orderpriority) AS mx4
      FROM orders)
    SELECT 'o_orderkey' AS col_name, n_rows - nn1 AS n_nulls,
           nd1 AS n_distinct, mn1 AS min_str, mx1 AS max_str FROM m
    UNION ALL SELECT 'o_orderstatus', n_rows - nn2, nd2, mn2, mx2 FROM m
    UNION ALL SELECT 'o_totalprice', n_rows - nn3, nd3, mn3, mx3 FROM m
    UNION ALL SELECT 'o_orderpriority', n_rows - nn4, nd4, mn4, mx4 FROM m
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN PROFILER (the ANALYZE-style sweep): null count, exact
    distinct count, min and max for a column LIST, unpivoted into the
    per-column report. Each column gets its OWN single-distinct 1-row
    aggregate, assembled by 1-row crossJoins — the profile_approx_distinct
    pattern. N distinct aggregates in one agg make Catalyst plan an
    Expand (row multiplication x N: a 50-column profile would multiply
    the scan output 50x before the shuffle); single-distinct aggs instead
    partial-dedup map-side, and each per-column scan prunes to that one
    column, so total I/O equals the single wide scan. min/max computed on
    the native type, stringified only at the edge so heterogeneous
    columns share one report schema. No-Expand pinned in test_plans."""
    cols = [
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    ]
    o = load_table(spark, sf_dir, "orders")

    def col_agg(c: str, i: int) -> DataFrame:
        return o.agg(
            F.count("*").alias(f"nr{i}"),
            F.count(c).alias(f"nn{i}"),
            F.countDistinct(c).alias(f"nd{i}"),
            F.min(c).cast("string").alias(f"mn{i}"),
            F.max(c).cast("string").alias(f"mx{i}"),
        )

    m = col_agg(cols[0], 0)
    for i, c in enumerate(cols[1:], start=1):
        m = m.crossJoin(col_agg(c, i))
    stack = ", ".join(
        f"'{c}', nr{i} - nn{i}, nd{i}, mn{i}, mx{i}"
        for i, c in enumerate(cols)
    )
    return m.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_nulls, n_distinct, min_str, max_str)"
    )


@query(
    "a11_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority), ())
    """,
)
def a11_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — including the (priority-only) set a
    ROLLUP hierarchy cannot express (profile_rollup_revenue covers the
    hierarchical case); GROUPING() bits disambiguate genuine NULL keys
    from subtotal rows. One Expand-based aggregate, the same single
    scan however many sets are requested."""
    from loris_mri_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '<all>') AS status,
               COALESCE(o_orderpriority, '<all>') AS priority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                    AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "j15_asof_scd2_lookup",
    oracle="""
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
                FROM events),
    marked AS (
      SELECT user_id, event_type, ts_us, event_id,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    seg AS (
      SELECT user_id, event_type, ts_us, event_id,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM marked),
    looked AS (
      SELECT event_id, user_id, event_type,
             COALESCE(LAG(event_type) OVER w2, '<none>') AS prev_state,
             COALESCE(LAG(version) OVER w2, -1) AS prev_version
      FROM seg
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id))
    SELECT event_id, user_id, prev_state AS state_at_purchase,
           CAST(prev_version AS BIGINT) AS version
    FROM looked WHERE event_type = 'purchase'
    """,
)
def j15_asof_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL LOOKUP: each purchase joined to the SCD2 state
    version that was CURRENT at its transaction time — the
    dimension-at-transaction-time join every warehouse fact load runs
    against its history tables. No per-fact interval scan: the history
    and the facts UNION into one per-user timeline, a running
    `last(..., ignorenulls)` carries the in-effect version forward
    (the operators/asof_join.py single-shuffle pattern), and facts read
    it off their own row. The oracle states the declarative form
    (latest valid_from <= fact time)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
        "event_id",
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    seg = ev.withColumn(
        "chg",
        F.when(
            ~F.lag("event_type")
            .over(w_ord)
            .eqNullSafe(F.col("event_type")),
            1,
        ).otherwise(0),
    ).withColumn("version", F.sum("chg").over(w_run).cast("long"))
    # the state IN EFFECT when the purchase landed = the PREVIOUS
    # event's segment (segments are contiguous, so the lag row carries
    # both the state and its SCD2 version) — the as-of lookup read off
    # the same ordered pass, no second shuffle (operators/asof_join.py
    # pattern); a user's first-ever event looks up '<none>'.
    looked = seg.select(
        "event_id",
        "user_id",
        "event_type",
        F.coalesce(F.lag("event_type").over(w_ord), F.lit("<none>")).alias(
            "state_at_purchase"
        ),
        F.coalesce(F.lag("version").over(w_ord), F.lit(-1))
        .cast("long")
        .alias("version"),
    ).filter(F.col("event_type") == "purchase")
    return looked.select(
        "event_id", "user_id", "state_at_purchase", "version"
    )


@query(
    "c12_bitwise_functions",
    oracle="""
    SELECT o_orderstatus,
           CAST(bit_and(o_orderkey) AS BIGINT) AS and_k,
           CAST(bit_or(o_orderkey) AS BIGINT) AS or_k,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS xor_k,
           CAST(SUM(bit_count(o_orderkey)) AS BIGINT) AS popcount_sum,
           CAST(SUM((o_orderkey << 2) % 1024) AS BIGINT) AS shl_sum,
           CAST(SUM(o_orderkey >> 3) AS BIGINT) AS shr_sum
    FROM orders GROUP BY o_orderstatus
    """,
)
def c12_bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-family breadth: the bitwise surface — AND/OR/XOR aggregates
    (the flag-mask folds the reference's permission/QC bitfields need),
    population count, and shifts, per status group. XOR-aggregate
    doubles as an order-independent checksum (the cheap content-set
    fingerprint for partition-level reconciliation). All integer-exact
    on both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").cast("long").alias("and_k"),
        F.bit_or("o_orderkey").cast("long").alias("or_k"),
        F.bit_xor("o_orderkey").cast("long").alias("xor_k"),
        F.sum(F.bit_count("o_orderkey")).cast("long").alias(
            "popcount_sum"
        ),
        F.sum(F.shiftleft(F.col("o_orderkey"), 2) % 1024)
        .cast("long")
        .alias("shl_sum"),
        F.sum(F.shiftright(F.col("o_orderkey"), 3))
        .cast("long")
        .alias("shr_sum"),
    )


@query(
    "w8_percent_of_total",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name)
    SELECT nation, revenue,
           ROUND(revenue / SUM(revenue) OVER (), 6) AS share_r,
           CAST(RANK() OVER (ORDER BY revenue DESC, nation ASC) AS BIGINT)
             AS rev_rank
    FROM rev
    """,
)
def w8_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio-to-report) — the share-of-whole window
    every revenue report ends with: per-nation revenue against the
    unpartitioned total, plus the rank. The empty-OVER window is a
    single-partition exchange — safe ONLY because it runs on the
    aggregated report (|nations| rows), never the fact table; the
    decimal-exact revenue sums make the shares engine-portable at
    round(6)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.col("revenue").desc(), F.col("nation").asc())
    return rev.select(
        "nation",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias(
            "share_r"
        ),
        F.rank().over(w_rank).cast("long").alias("rev_rank"),
    )
