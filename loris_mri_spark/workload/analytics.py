"""Clickstream analytics workload — funnel conversion and cohort
retention, the two canonical event-sequence queries every product
analytics engine must answer (the reference's closest analogue is the
violations/QC reporting over candidate event sequences,
`python/lib/database_lib/*`; these generalize it to ordered behavioral
funnels).

Both are pure window/aggregation plans partitioned by user — no joins
that grow with the event count, no collects; at 100 TB the per-user
partitions are what shuffle, and the outputs are report-sized."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from loris_mri_spark.catalog import load_table
from loris_mri_spark.workload import query

_DAY_US = 86_400_000_000


@query(
    "funnel_conversion",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
               FROM events),
    s1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
           WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(ts_us) AS t2
           FROM e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts_us > s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(ts_us) AS t3
           FROM e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
           GROUP BY e.user_id),
    u AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM e)
    SELECT n_users,
           (SELECT COUNT(*) FROM s1) AS n_step1_view,
           (SELECT COUNT(*) FROM s2) AS n_step2_click,
           (SELECT COUNT(*) FROM s3) AS n_step3_purchase,
           ROUND((SELECT COUNT(*) FROM s3) * 1.0
                 / (SELECT COUNT(*) FROM s1), 4) AS conversion_r
    FROM u
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): a user converts a
    step only with an event STRICTLY AFTER their previous step's first
    completion — the order-sensitive definition (a purchase before the
    first view does not count). One pass: per-user conditional-min
    cascade computed with three window functions over the same
    user-partitioned sort, then a single global rollup. No self-joins:
    the cascade lives in expressions, so the event table is scanned
    once however many steps the funnel has."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("ts_us")
    )
    w = Window.partitionBy("user_id")
    t1 = F.min(
        F.when(F.col("event_type") == "view", F.col("ts_us"))
    ).over(w)
    with_t1 = e.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_us") > F.col("t1")),
            F.col("ts_us"),
        )
    ).over(w)
    with_t2 = with_t1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts_us") > F.col("t2")),
            F.col("ts_us"),
        )
    ).over(w)
    per_user = (
        with_t2.withColumn("t3", t3)
        .groupBy("user_id")
        .agg(
            F.max("t1").alias("t1"),
            F.max("t2").alias("t2"),
            F.max("t3").alias("t3"),
        )
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t1").alias("n_step1_view"),
        F.count("t2").alias("n_step2_click"),
        F.count("t3").alias("n_step3_purchase"),
        F.round(F.count("t3") / F.count("t1"), 4).alias("conversion_r"),
    )


@query(
    "cohort_retention",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_us(ts) // {_DAY_US} AS day
               FROM events),
    first_seen AS (SELECT user_id, MIN(day) AS cohort_day FROM e
                   GROUP BY user_id),
    activity AS (SELECT DISTINCT e.user_id, f.cohort_day,
                        CAST((e.day - f.cohort_day) // 7 AS BIGINT)
                          AS week_offset
                 FROM e JOIN first_seen f ON e.user_id = f.user_id),
    cohorts AS (SELECT cohort_day, COUNT(DISTINCT user_id) AS cohort_size
                FROM first_seen GROUP BY cohort_day)
    SELECT a.cohort_day, a.week_offset,
           COUNT(*) AS n_active,
           ROUND(COUNT(*) * 1.0 / c.cohort_size, 4) AS retention_r
    FROM activity a JOIN cohorts c ON a.cohort_day = c.cohort_day
    GROUP BY a.cohort_day, a.week_offset, c.cohort_size
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day (epoch-day
    integer), activity bucketed into week offsets from their cohort
    day, retention = active users / cohort size. The cohort assignment
    is one groupBy(user), broadcast back onto the (distinct) activity
    days; everything shuffles by user or by the report-sized cohort
    key — never by raw event."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"(ts_ns div 1000) div {_DAY_US}").alias("day"),
    )
    first_seen = e.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    activity = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.expr("(day - cohort_day) div 7").alias("week_offset"),
        )
        .distinct()
    )
    cohorts = first_seen.groupBy("cohort_day").agg(
        F.countDistinct("user_id").alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_day", "week_offset")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(cohorts), "cohort_day")
        .select(
            "cohort_day",
            "week_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias(
                "retention_r"
            ),
        )
    )


@query(
    "funnel_sessionized",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
               FROM events),
    flagged AS (
      SELECT user_id, event_type, ts_us, event_id,
             CASE WHEN lag(ts_us) OVER w IS NULL
                       OR ts_us - lag(ts_us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
    sess AS (
      SELECT user_id, event_type, ts_us, event_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    t1 AS (SELECT user_id, sid, MIN(ts_us) AS t1 FROM sess
           WHERE event_type = 'view' GROUP BY user_id, sid),
    t2 AS (SELECT s.user_id, s.sid, MIN(s.ts_us) AS t2
           FROM sess s JOIN t1 ON t1.user_id = s.user_id AND t1.sid = s.sid
           WHERE s.event_type = 'click' AND s.ts_us > t1.t1
           GROUP BY s.user_id, s.sid),
    t3 AS (SELECT s.user_id, s.sid, MIN(s.ts_us) AS t3
           FROM sess s JOIN t2 ON t2.user_id = s.user_id AND t2.sid = s.sid
           WHERE s.event_type = 'purchase' AND s.ts_us > t2.t2
           GROUP BY s.user_id, s.sid),
    n AS (SELECT COUNT(DISTINCT (user_id, sid)) AS n_sessions FROM sess)
    SELECT n_sessions,
           (SELECT COUNT(*) FROM t1) AS n_reached_view,
           (SELECT COUNT(*) FROM t2) AS n_reached_click,
           (SELECT COUNT(*) FROM t3) AS n_converted,
           ROUND((SELECT COUNT(*) FROM t3) * 1.0
                 / (SELECT COUNT(*) FROM t1), 4) AS session_conversion_r
    FROM n
    """,
)
def funnel_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAME-SESSION funnel: view -> click -> purchase completed WITHIN
    one 30-minute-gap session — the product metric that distinguishes
    'converted eventually' (funnel_conversion) from 'converted in the
    visit'. Sessionization (gaps-and-islands per user) and the ordered
    conditional-min cascade both run in windows partitioned by
    (user, session); no join ever carries more than the per-key stream.
    """
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
        "event_id",
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    sess = e.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w_ord).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w_ord) > 1_800_000_000),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("new_s").over(w_run))

    w_s = Window.partitionBy("user_id", "sid")
    t1 = F.min(
        F.when(F.col("event_type") == "view", F.col("ts_us"))
    ).over(w_s)
    s1 = sess.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_us") > F.col("t1")),
            F.col("ts_us"),
        )
    ).over(w_s)
    s2 = s1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts_us") > F.col("t2")),
            F.col("ts_us"),
        )
    ).over(w_s)
    per_session = (
        s2.withColumn("t3", t3)
        .groupBy("user_id", "sid")
        .agg(
            F.max("t1").alias("t1"),
            F.max("t2").alias("t2"),
            F.max("t3").alias("t3"),
        )
    )
    return per_session.agg(
        F.count("*").alias("n_sessions"),
        F.count("t1").alias("n_reached_view"),
        F.count("t2").alias("n_reached_click"),
        F.count("t3").alias("n_converted"),
        F.round(F.count("t3") / F.count("t1"), 4).alias(
            "session_conversion_r"
        ),
    )


@query(
    "anomaly_daily_zscore",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             COUNT(*) AS n
      FROM events GROUP BY event_type, day),
    stats AS (
      SELECT event_type, AVG(n) AS mu, stddev_samp(n) AS sd
      FROM daily GROUP BY event_type)
    SELECT d.event_type, d.day, d.n,
           ROUND((d.n - s.mu) / s.sd, 4) AS z_r,
           ABS((d.n - s.mu) / s.sd) > 2.0 AS is_anomaly
    FROM daily d JOIN stats s ON s.event_type = d.event_type
    """,
)
def anomaly_daily_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOLUME ANOMALY detection — the monitoring query every ingest
    pipeline runs on itself: daily event counts per type scored as
    z-scores against that type's own mean/stddev, |z| > 2 flagged. Two
    aggregations (day roll-up, then per-type moments broadcast back);
    at scale the daily table is report-sized so the join is a
    broadcast. The same shape serves row-count drift between pipeline
    runs (the DQ report's temporal complement)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"(ts_ns div 1000) div {_DAY_US}").alias("day"),
    )
    daily = e.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sd")
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "n",
        F.round(z, 4).alias("z_r"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )
