"""Relational operator suite (SURVEY.md §2.4 R1-R18) over the TPC-H-ish
synthetic tables, each with a DuckDB-oracle SQL twin.

Every query aliases computed columns identically in Spark and SQL so the
driver's order-insensitive value-hash compare lines up.  Float aggregates
are rounded (4 dp) on both sides to absorb summation-order noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["QUERIES", "ORACLES"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# R1 dedup_mentions — Report.add equality-dedupe (mwcp/report.py:786-791)
# --------------------------------------------------------------------------

def q_dedup_mentions(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_partkey", "l_returnflag").dropDuplicates(
        ["l_orderkey", "l_partkey", "l_returnflag"]
    )


SQL_DEDUP_MENTIONS = """
SELECT DISTINCT l_orderkey, l_partkey, l_returnflag FROM lineitem
"""


# --------------------------------------------------------------------------
# R2 dedup_iter — nested-element flatten + cross-set dedupe
# (mwcp/report.py:925-975): two projections unioned then deduped
# --------------------------------------------------------------------------

def q_dedup_iter(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    top = ev.select(F.col("user_id").alias("k"), F.col("event_type").alias("v"))
    nested = ev.select(F.col("user_id").alias("k"),
                       F.upper("event_type").alias("v"))
    return top.unionByName(nested).dropDuplicates(["k", "v"])


SQL_DEDUP_ITER = """
SELECT DISTINCT k, v FROM (
  SELECT user_id AS k, event_type AS v FROM events
  UNION ALL
  SELECT user_id AS k, upper(event_type) AS v FROM events
)
"""


# --------------------------------------------------------------------------
# R3 groupby_report — per-source metadata grouping (mwcp/report.py:163,554-561)
# --------------------------------------------------------------------------

def q_groupby_report(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_total"),
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
    )


SQL_GROUPBY_REPORT = """
SELECT o_custkey,
       count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS sum_total,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
FROM orders GROUP BY o_custkey
"""


# --------------------------------------------------------------------------
# R4 groupby_type_tables — per-type tables (mwcp/report_writers.py:237-255)
# --------------------------------------------------------------------------

def q_groupby_type_tables(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


SQL_GROUPBY_TYPE_TABLES = """
SELECT event_type, count(*) AS n, round(avg(value), 4) AS avg_value
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# R5 entity_canonicalize — keep richest serialization per id
# (mwcp/stix/report_writer.py:142-150): arg-max by (length, value)
# --------------------------------------------------------------------------

def q_entity_canonicalize(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    best = F.max(F.struct(F.length("p_name").alias("l"), F.col("p_name").alias("v")))
    return part.groupBy("p_brand").agg(
        best.getField("v").alias("canonical_name"),
        F.count(F.lit(1)).alias("n_parts"),
    )


SQL_ENTITY_CANONICALIZE = """
SELECT p_brand, canonical_name, n_parts FROM (
  SELECT p_brand, p_name AS canonical_name,
         count(*) OVER (PARTITION BY p_brand) AS n_parts,
         row_number() OVER (
           PARTITION BY p_brand ORDER BY length(p_name) DESC, p_name DESC
         ) AS rn
  FROM part
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# R6 note_consolidate — merge identical content, union refs
# (mwcp/stix/report_writer.py:107-132)
# --------------------------------------------------------------------------

def q_note_consolidate(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.array_join(
            F.array_sort(F.array_distinct(F.collect_list(F.col("user_id").cast("string")))),
            ",",
        ).alias("refs")
    )


SQL_NOTE_CONSOLIDATE = """
SELECT event_type,
       string_agg(DISTINCT CAST(user_id AS VARCHAR), ','
                  ORDER BY CAST(user_id AS VARCHAR)) AS refs
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# R7 file_tree — parent/child traversal as joins (mwcp/file_object.py:229-249)
# --------------------------------------------------------------------------

def q_file_tree(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


SQL_FILE_TREE = """
SELECT n_name, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# R8 parsed_files_antijoin — already-parsed skip (mwcp/dispatcher.py:285-294)
# --------------------------------------------------------------------------

def q_parsed_files_antijoin(spark, sf_dir):
    # "Already parsed" = customers with at least one finished ('F') order;
    # the anti-join keeps the not-yet-parsed remainder.  Keyed on the
    # finished subset so the result is non-empty at every SF (71 rows at
    # sf0.01) — an anti-join that always returns 0 rows proves nothing.
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F")
    return cust.join(
        finished, cust.c_custkey == finished.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


SQL_PARSED_FILES_ANTIJOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


# --------------------------------------------------------------------------
# R9 kb_join — broadcast hash join of samples x small knowledge table
# (mwcp/report.py:155-157)
# --------------------------------------------------------------------------

def q_kb_join(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("sum_acctbal"),
        )
    )


SQL_KB_JOIN = """
SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 4) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# R10 rule_route — ordered first-match ranking window
# (mwcp/dispatcher.py:297-312)
# --------------------------------------------------------------------------

def q_rule_route(spark, sf_dir):
    # r7 (guide §2.4): first-match per order is a lexicographic-min
    # aggregate, not a window — min(struct(linenumber, partkey)) gets
    # map-side partial aggregation and no per-partition sort, where
    # row_number() paid exchange + full sort of every lineitem row.
    # Identical rows: struct min is field-wise lexicographic, the same
    # total order the window used, and ties project identical values.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.min(F.struct("l_linenumber", "l_partkey")).alias("_first"))
        .select(
            "l_orderkey",
            F.col("_first.l_partkey").alias("l_partkey"),
            F.col("_first.l_linenumber").alias("l_linenumber"),
        )
    )


SQL_RULE_ROUTE = """
SELECT l_orderkey, l_partkey, l_linenumber FROM (
  SELECT l_orderkey, l_partkey, l_linenumber,
         row_number() OVER (
           PARTITION BY l_orderkey ORDER BY l_linenumber ASC, l_partkey ASC
         ) AS rn
  FROM lineitem
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# R11 greedy_route — greedy mode keeps every matching rule
# (mwcp/dispatcher.py:97-99,311-312)
# --------------------------------------------------------------------------

def q_greedy_route(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part.filter(F.col("p_size") >= 40)),
                li.l_partkey == F.col("p_partkey"))
        .select("l_orderkey", "l_partkey", "p_size")
    )


SQL_GREEDY_ROUTE = """
SELECT l_orderkey, l_partkey, p_size
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size >= 40
"""


# --------------------------------------------------------------------------
# R12 legacy_pivot — per-type value pivot (mwcp/report.py:271-509)
# (conditional aggregation, not DataFrame.pivot, so the SQL twin is exact)
# --------------------------------------------------------------------------

def q_legacy_pivot(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_f"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_o"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_p"),
    )


SQL_LEGACY_PIVOT = """
SELECT o_custkey,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders GROUP BY o_custkey
"""


# --------------------------------------------------------------------------
# R13 stats_topk — top-k + central stats (mwcp/cli.py:510-595)
# --------------------------------------------------------------------------

def q_stats_topk(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(10)
        .select("c_custkey", F.round("c_acctbal", 4).alias("acctbal"))
    )


SQL_STATS_TOPK = """
SELECT c_custkey, round(c_acctbal, 4) AS acctbal
FROM customer ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10
"""


def q_stats_percentile(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_STATS_PERCENTILE = """
SELECT l_returnflag,
       round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 4) AS median_price,
       round(avg(l_extendedprice), 4) AS avg_price,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# R14 union_reports — multi-input concat (mwcp/cli.py:410-456)
# --------------------------------------------------------------------------

def q_union_reports(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    early = orders.filter(F.col("o_totalprice") < 1000).select(
        "o_orderkey", F.lit("low").alias("bucket_name"))
    late = orders.filter(F.col("o_totalprice") >= 1000).select(
        "o_orderkey", F.lit("high").alias("bucket_name"))
    return early.unionByName(late).groupBy("bucket_name").agg(
        F.count(F.lit(1)).alias("n"))


SQL_UNION_REPORTS = """
SELECT bucket_name, count(*) AS n FROM (
  SELECT o_orderkey, 'low' AS bucket_name FROM orders WHERE o_totalprice < 1000
  UNION ALL
  SELECT o_orderkey, 'high' AS bucket_name FROM orders WHERE o_totalprice >= 1000
) GROUP BY bucket_name
"""


# --------------------------------------------------------------------------
# R15 split_strings_report — complementary filters (mwcp/report.py:528-533)
# --------------------------------------------------------------------------

def q_split_strings_report(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    strings = ev.filter(F.col("event_type") == "click")
    rest = ev.filter(F.col("event_type") != "click")
    return (
        strings.select(F.lit("strings").alias("report"), "event_id")
        .unionByName(rest.select(F.lit("main").alias("report"), "event_id"))
        .groupBy("report")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_SPLIT_STRINGS_REPORT = """
SELECT report, count(*) AS n FROM (
  SELECT 'strings' AS report, event_id FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT 'main' AS report, event_id FROM events WHERE event_type <> 'click'
) GROUP BY report
"""


# --------------------------------------------------------------------------
# R17 skew_salt — salted two-phase aggregation == plain GROUP BY
# --------------------------------------------------------------------------

def q_skew_salt(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "salt", F.pmod(F.crc32(F.col("l_orderkey").cast("string")), F.lit(16))
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.sum("l_quantity").alias("q"), F.count(F.lit(1)).alias("c")
    )
    return partial.groupBy("l_returnflag").agg(
        F.round(F.sum("q"), 4).alias("sum_qty"),
        F.sum("c").alias("n"),
    )


SQL_SKEW_SALT = """
SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# R18 repartition_controls — explicit repartition before a wide stage
# (result-identical to the plain aggregate; validates plan controls)
# --------------------------------------------------------------------------

def q_repartition_controls(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.repartition(8, "l_returnflag", "l_linestatus")
        .sortWithinPartitions("l_returnflag", "l_linestatus")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


SQL_REPARTITION_CONTROLS = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 4) AS sum_price, count(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# time-window rollup over the events table (the metrics-stage shape; the
# streaming path reuses the same expression against readStream)
# --------------------------------------------------------------------------

def q_events_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00")
    return ev.groupBy(hour.alias("hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


SQL_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_events_windowed(spark, sf_dir):
    """The streaming watermarked window operator
    (streaming/stateful.py::windowed_event_counts) run in its batch mode —
    the identical Column expression serves readStream (pinned equal by
    tests/test_streaming.py); tumbling window(ts, 1h) start == the hour
    truncation, so the batch oracle is SQL-expressible."""
    from kgmwcp.streaming.stateful import windowed_event_counts

    ev = _t(spark, sf_dir, "events")
    out = windowed_event_counts(ev)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:00").alias("window_start"),
        "event_type", "n_events", "sum_value",
    )


SQL_EVENTS_WINDOWED = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS window_start,
       event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2
"""


# -- gap-based sessionization -------------------------------------------------
# The canonical event-stream operator Spark expresses with one ordered
# window pass: a session break is a >30-min gap between a user's
# consecutive events; session_seq is the running sum of breaks.  Gap
# arithmetic is exact int64 microseconds (unix_micros/epoch_us) — double
# epoch-seconds would round-trip differently across engines at the
# boundary.  Scale shape: one hash-exchange on user_id + an in-partition
# sort; the per-session rollup reuses the same partitioning (no second
# exchange for the groupBy beyond AQE coalescing).

_SESSION_GAP_US = 1800 * 1_000_000  # 30 min


def q_events_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0)
    sess = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


SQL_EVENTS_SESSIONIZE = f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), s AS (
  SELECT user_id, ts, value,
         CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > {_SESSION_GAP_US}
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq
  FROM g
)
SELECT user_id, session_seq, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       round(sum(value), 4) AS total_value
FROM s GROUP BY user_id, session_seq
"""


# -- ordered funnel conversion ------------------------------------------------
# signup → click → purchase, each step strictly after the previous one —
# the staged-aggregation expression of MATCH_RECOGNIZE-style sequence
# analytics: min-ts per stage, each stage's candidate events filtered by
# the previous stage's timestamp via a user_id join.  Three shuffles all
# on user_id (AQE reuses/coalesces the exchange); per-stage frames only
# ever SHRINK, so the joins get cheaper down the funnel.

def q_events_funnel(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    stages = (
        s1.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit("1_signup").alias("stage"), "n_users")
        .unionByName(
            s2.agg(F.count(F.lit(1)).alias("n_users"))
            .select(F.lit("2_click").alias("stage"), "n_users"))
        .unionByName(
            s3.agg(F.count(F.lit(1)).alias("n_users"))
            .select(F.lit("3_purchase").alias("stage"), "n_users"))
    )
    top = F.max(
        F.when(F.col("stage") == "1_signup", F.col("n_users"))
    ).over(Window.partitionBy())
    return stages.select(
        "stage", "n_users",
        F.round(F.col("n_users") / top, 4).alias("conv_rate"),
    )


SQL_EVENTS_FUNNEL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id
), st AS (
  SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
  UNION ALL SELECT '2_click', count(*) FROM s2
  UNION ALL SELECT '3_purchase', count(*) FROM s3
)
SELECT stage, n_users,
       round(n_users::DOUBLE
             / max(CASE WHEN stage = '1_signup' THEN n_users END) OVER (), 4)
         AS conv_rate
FROM st
"""


# -- cohort retention ---------------------------------------------------------
# Users cohorted by the ISO week of their first event; retention =
# fraction of the cohort active at each whole-week offset.  Both engines
# truncate weeks to ISO Monday, and the offset is integer day-diff // 7
# (never timestamp subtraction — DST/precision-proof).  Two groupBys on
# user_id (first-seen reuses the exchange) + one on the tiny
# (cohort, offset) key space.

def q_events_retention(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    cohort = F.date_format(F.date_trunc("week", "first_ts"), "yyyy-MM-dd")
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            cohort.alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("ts"), F.to_date("first_ts")) / 7
            ).alias("week_offset"),
        )
    )
    cs = first.groupBy(cohort.alias("cohort_week")).agg(
        F.count(F.lit(1)).alias("cohort_size"))
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(cs, "cohort_week")
        .select(
            "cohort_week", "week_offset", "n_active", "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 4)
            .alias("retention"),
        )
    )


SQL_EVENTS_RETENTION = """
WITH first AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
),
act AS (
  SELECT e.user_id,
         strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
         date_diff('day', f.first_ts::DATE, e.ts::DATE) // 7 AS week_offset
  FROM events e JOIN first f USING (user_id)
),
cs AS (
  SELECT strftime(date_trunc('week', first_ts), '%Y-%m-%d') AS cohort_week,
         count(*) AS cohort_size
  FROM first GROUP BY 1
)
SELECT a.cohort_week, week_offset,
       count(DISTINCT user_id) AS n_active, cohort_size,
       round(count(DISTINCT user_id)::DOUBLE / cohort_size, 4) AS retention
FROM act a JOIN cs ON a.cohort_week = cs.cohort_week
GROUP BY a.cohort_week, week_offset, cohort_size
"""


# -- volume anomaly detection -------------------------------------------------
# The monitoring query over the metrics stage's hourly rollup: per
# event_type, each hour's count is z-scored against that type's own
# hourly distribution (population stddev); |z| >= 2 flags the hour.
# Two small aggregates (hourly rollup, per-type moments) + a broadcast
# join back — the stats side is one row per type, so the join never
# shuffles the rollup.  z is rounded to 4 dp (stddev is the one
# reduction here whose fp summation order differs across engines; the
# difference is ~1e-12 relative, far below the rounding granularity).

def q_events_anomaly_zscore(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00")
    hourly = ev.groupBy(hour.alias("hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"),
        F.stddev_pop("n").alias("sigma"),
    )
    z = F.when(
        F.col("sigma") > 0, (F.col("n") - F.col("mu")) / F.col("sigma")
    ).otherwise(F.lit(0.0))
    # the flag derives from the ROUNDED z: a boundary value within fp
    # noise of 2.0 must not flip the boolean across engines
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .withColumn("zscore", F.round(z, 4))
        .select(
            "event_type",
            "hour",
            "n",
            "zscore",
            (F.abs(F.col("zscore")) >= 2.0).alias("is_anomaly"),
        )
    )


SQL_EVENTS_ANOMALY_ZSCORE = """
WITH hourly AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, avg(n) AS mu, stddev_pop(n) AS sigma
  FROM hourly GROUP BY event_type
)
SELECT event_type, hour, n, zscore, abs(zscore) >= 2.0 AS is_anomaly
FROM (
  SELECT h.event_type, hour, n,
         round(CASE WHEN sigma > 0 THEN (n - mu) / sigma ELSE 0.0 END, 4)
           AS zscore
  FROM hourly h JOIN stats s ON h.event_type = s.event_type
)
"""


# -- TPC-H Q1 / Q3 (cent-exact money) -----------------------------------------
# The two standard-benchmark shapes, stated directly so a reader can see
# the engine runs them: Q1's wide aggregate and Q3's join→top-k.  Money
# is computed in EXACT integer cents (CAST(round(x*100) AS BIGINT)) so
# every sum is order-independent and bit-identical across engines — the
# naive sum(double) diverges in the last ulps once accumulated error
# (~N·eps·S) exceeds the 4 dp rounding step, which at sf0.1 it does.
# The cent grid loses sub-cent precision on the 3-factor charge product
# (by design: the fixed-point money pattern); rounding to cents is a
# single deterministic IEEE op chain on identical inputs.

def _cents(col):
    return F.round(col * 100).cast("long")


def _ts(s: str):
    """Timestamp literal (every TPC-H date filter uses this form)."""
    return F.lit(s).cast("timestamp")


def _disc():
    """The discounted-price expression shared by most TPC-H revenues."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= _ts("1998-09-02"))
    disc = _disc()
    charge = disc * (1 + F.col("l_tax"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(_cents(F.col("l_extendedprice"))).alias("base_c"),
        F.sum(_cents(disc)).alias("disc_c"),
        F.sum(_cents(charge)).alias("charge_c"),
        F.sum(_cents(F.col("l_discount"))).alias("disc_pct_c"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag", "l_linestatus", "sum_qty",
        F.round(F.col("base_c") / 100.0, 2).alias("sum_base_price"),
        F.round(F.col("disc_c") / 100.0, 2).alias("sum_disc_price"),
        F.round(F.col("charge_c") / 100.0, 2).alias("sum_charge"),
        F.round(F.col("sum_qty") / F.col("count_order"), 4).alias("avg_qty"),
        F.round(F.col("base_c") / 100.0 / F.col("count_order"), 4)
        .alias("avg_price"),
        F.round(F.col("disc_pct_c") / 100.0 / F.col("count_order"), 4)
        .alias("avg_disc"),
        "count_order",
    )


SQL_TPCH_Q1 = """
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
         sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS base_c,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS disc_c,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
                  AS BIGINT)) AS charge_c,
         sum(CAST(round(l_discount * 100) AS BIGINT)) AS disc_pct_c,
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, CAST(sum_qty AS BIGINT) AS sum_qty,
       round(base_c / 100.0, 2) AS sum_base_price,
       round(disc_c / 100.0, 2) AS sum_disc_price,
       round(charge_c / 100.0, 2) AS sum_charge,
       round(sum_qty / CAST(count_order AS DOUBLE), 4) AS avg_qty,
       round(base_c / 100.0 / count_order, 4) AS avg_price,
       round(disc_pct_c / 100.0 / count_order, 4) AS avg_disc,
       count_order
FROM agg
"""


def q_tpch_q3(spark, sf_dir):
    cutoff = _ts("1998-03-15")
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    disc = _disc()
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    agg = joined.groupBy(
        "l_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    ).agg(F.sum(_cents(disc)).alias("revenue_c"))
    return (
        agg.orderBy(F.col("revenue_c").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("revenue_c") / 100.0, 2).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


SQL_TPCH_Q3 = """
WITH agg AS (
  SELECT l_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         o_orderpriority,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS revenue_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-03-15'
    AND l_shipdate > TIMESTAMP '1998-03-15'
  GROUP BY 1, 2, 3
)
SELECT l_orderkey, round(revenue_c / 100.0, 2) AS revenue,
       o_orderdate, o_orderpriority
FROM agg
ORDER BY revenue_c DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q_tpch_q5(spark, sf_dir):
    """Q5 local-supplier volume: the multi-dimension join chain.  Plan
    shape at 100 TB: supplier⋈nation⋈region collapse into ONE broadcast
    dim (region filter applied before the broadcast — thousands of rows,
    never the fact table); customer is too big to broadcast at scale, so
    orders⋈customer shuffles on custkey and lineitem⋈orders on orderkey —
    exactly two fact shuffles plus a low-cardinality nation aggregate.
    The c_nationkey = s_nationkey "local supplier" predicate rides the
    broadcast join condition.  Money in exact cents like Q1/Q3 (cent
    sums are order-independent; naive double sums diverge past 4 dp)."""
    cutlo = _ts("1996-01-01")
    cuthi = _ts("1997-01-01")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutlo) & (F.col("o_orderdate") < cuthi))
    li = _t(spark, sf_dir, "lineitem")
    sup_dim = (
        supplier
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust_orders = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "c_nationkey")
    disc = _disc()
    joined = (
        li.join(cust_orders, li.l_orderkey == cust_orders.o_orderkey)
        .join(
            F.broadcast(sup_dim),
            (li.l_suppkey == sup_dim.s_suppkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    agg = joined.groupBy("n_name").agg(F.sum(_cents(disc)).alias("revenue_c"))
    return agg.orderBy(F.col("revenue_c").desc(), "n_name").select(
        "n_name", F.round(F.col("revenue_c") / 100.0, 2).alias("revenue"))


SQL_TPCH_Q5 = """
WITH agg AS (
  SELECT n_name,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS revenue_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY n_name
)
SELECT n_name, round(revenue_c / 100.0, 2) AS revenue
FROM agg ORDER BY revenue_c DESC, n_name
"""


def q_tpch_q6(spark, sf_dir):
    """Q6 forecast-revenue: the pure scan→filter→sum shape whose entire
    predicate set pushes down to the parquet scan (asserted in
    test_plans) — one row out, zero joins, money in exact cents."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = _cents(F.col("l_extendedprice") * F.col("l_discount"))
    return li.agg(
        F.round(F.sum(rev) / 100.0, 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_TPCH_Q6 = """
SELECT round(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
             / 100.0, 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_tpch_q4(spark, sf_dir):
    """Q4 order-priority checking, adapted to the driver schema (the
    synthetic lineitem has no l_commitdate/l_receiptdate): orders in one
    quarter having at least one RETURNED line (l_returnflag='R').  The
    shape that matters is the EXISTS: Spark plans it as a LEFT SEMI join
    orders→lineitem on orderkey — no row multiplication, map-side
    distinct on the probe side, then a 5-group count.  At 100 TB both
    sides shuffle on orderkey once; the quarter filter pushes to the
    orders scan so the semi-join's build side is already pruned."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01")))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    sel = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
    return (
        sel.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_tpch_q7(spark, sf_dir):
    """Q7 volume shipping between a nation pair.  Scale shape: the
    nation-pair filter is applied to the supplier and customer DIMS
    before they touch the fact table (two tiny broadcast dims), so the
    lineitem scan joins against only in-pair suppliers/customers; the
    cross-pair exclusion (supp≠cust nation) is a cheap post-join filter
    on broadcast-resident columns.  orders⋈lineitem is the one fact
    shuffle; customer rides broadcast here and would shuffle at 100 TB
    (AQE decides from the runtime size — see tpch_q3's note)."""
    n1, n2 = "NATION_1", "NATION_2"
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(n1, n2))
    supplier = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    customer = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation.select(
            F.col("n_nationkey").alias("cn_nationkey"),
            F.col("n_name").alias("cust_nation"))),
              F.col("c_nationkey") == F.col("cn_nationkey"))
        .select("c_custkey", "cust_nation")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01")))
    orders = _t(spark, sf_dir, "orders")
    disc = _disc()
    joined = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    agg = joined.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").alias("l_year"),
    ).agg(F.sum(_cents(disc)).alias("revenue_c"))
    return agg.orderBy("supp_nation", "cust_nation", "l_year").select(
        "supp_nation", "cust_nation", "l_year",
        F.round(F.col("revenue_c") / 100.0, 2).alias("revenue"))


SQL_TPCH_Q7 = """
WITH agg AS (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS revenue_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE sn.n_name IN ('NATION_1', 'NATION_2')
    AND cn.n_name IN ('NATION_1', 'NATION_2')
    AND sn.n_name <> cn.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2, 3
)
SELECT supp_nation, cust_nation, l_year,
       round(revenue_c / 100.0, 2) AS revenue
FROM agg ORDER BY supp_nation, cust_nation, l_year
"""


def q_tpch_q9(spark, sf_dir):
    """Q9 product-type profit, adapted (no partsupp table in the driver
    schema, so profit = discounted revenue rather than revenue −
    supplycost; the join/agg SHAPE is Q9's).  Part is filtered by the
    name predicate before broadcasting — at 100 TB the filtered part dim
    is the classic candidate for AQE's runtime broadcast decision; the
    supplier→nation collapse is one tiny dim.  Group key (nation, year)
    is low-cardinality → map-side partial agg does almost all the
    work."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")).select("p_partkey")
    nation = _t(spark, sf_dir, "nation")
    sup_dim = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    li = _t(spark, sf_dir, "lineitem")
    disc = _disc()
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup_dim), li.l_suppkey == sup_dim.s_suppkey)
    )
    agg = joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("l_shipdate").alias("o_year"),
    ).agg(F.sum(_cents(disc)).alias("profit_c"))
    return agg.orderBy("nation", F.col("o_year").desc()).select(
        "nation", "o_year",
        F.round(F.col("profit_c") / 100.0, 2).alias("sum_profit"))


SQL_TPCH_Q9 = """
WITH agg AS (
  SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS profit_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
  GROUP BY 1, 2
)
SELECT nation, o_year, round(profit_c / 100.0, 2) AS sum_profit
FROM agg ORDER BY nation, o_year DESC
"""


def q_tpch_q10(spark, sf_dir):
    """Q10 returned-item reporting: top-20 customers by revenue lost to
    returns in one quarter.  customer⋈orders shuffles on custkey (at
    100 TB customer is fact-sized — never broadcast); nation rides
    broadcast; the top-20 is a TakeOrderedAndProject (per-partition
    heap + driver merge of 20-row heads), never a full sort."""
    cutlo = _ts("1996-01-01")
    cuthi = _ts("1996-04-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutlo) & (F.col("o_orderdate") < cuthi))
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    disc = _disc()
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation),
              customer.c_nationkey == nation.n_nationkey)
    )
    agg = joined.groupBy(
        "c_custkey", "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"), "n_name",
    ).agg(F.sum(_cents(disc)).alias("revenue_c"))
    return (
        agg.orderBy(F.col("revenue_c").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name",
                F.round(F.col("revenue_c") / 100.0, 2).alias("revenue"),
                "c_acctbal", "n_name")
    )


SQL_TPCH_Q10 = """
WITH agg AS (
  SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS revenue_c
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY 1, 2, 3, 4
)
SELECT c_custkey, c_name, round(revenue_c / 100.0, 2) AS revenue,
       c_acctbal, n_name
FROM agg ORDER BY revenue_c DESC, c_custkey LIMIT 20
"""


def q_tpch_q14(spark, sf_dir):
    """Q14 promotion effect: one month of lineitem against the part dim,
    promo share of revenue.  Both the promo and total sums are exact
    cent integers, so the final ratio is a division of two exact BIGINTs
    — order-independent on both engines.  Part broadcasts (it is the
    smaller-by-orders-of-magnitude side even at 100 TB after column
    pruning to (partkey, type))."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01")))
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_c = _cents(_disc())
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", disc_c).otherwise(F.lit(0)))
        .alias("promo_c"),
        F.sum(disc_c).alias("total_c"),
    )
    return agg.select(
        F.round(100.0 * F.col("promo_c") / F.col("total_c"), 4)
        .alias("promo_revenue_pct"),
        F.round(F.col("total_c") / 100.0, 2).alias("total_revenue"),
    )


SQL_TPCH_Q14 = """
WITH agg AS (
  SELECT sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT) ELSE 0 END) AS promo_c,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS total_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
    AND l_shipdate < TIMESTAMP '1996-10-01'
)
SELECT round(100.0 * promo_c / total_c, 4) AS promo_revenue_pct,
       round(total_c / 100.0, 2) AS total_revenue
FROM agg
"""


def q_tpch_q18(spark, sf_dir):
    """Q18 large-volume customers: orders whose total quantity exceeds a
    threshold, with customer detail, top-100 by order value.  Shape: the
    HAVING aggregate runs FIRST on lineitem alone (map-side partial sums
    on orderkey, then the filter throws away ~99% of orders before any
    join) — the order that keeps the expensive joins small at 100 TB.
    l_quantity values are integral, so the long cast keeps the HAVING
    sum exact."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    joined = (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
    )
    return (
        joined.orderBy(F.col("o_totalprice").desc(), "l_orderkey")
        .limit(100)
        .select(
            "c_name", "c_custkey", "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


SQL_TPCH_Q18 = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 250
)
SELECT c_name, c_custkey, l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, sum_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY orders.o_totalprice DESC, l_orderkey LIMIT 100
"""


def q_events_asof_join(spark, sf_dir):
    """As-of join: each purchase matched to the same user's most recent
    view at-or-before the purchase timestamp.  Spark has no ASOF JOIN
    operator; a range self-join explodes to |views|·|purchases| per
    user, so the scale shape is the union-tag + running-window trick:
    union both sides, ONE shuffle on user_id, and carry the latest view
    forward with last(..., ignorenulls) over (ts, tag) — views sort
    before same-timestamp purchases, giving the v_ts ≤ p_ts tie rule.
    Duplicate views at the same (user, ts) are resolved to the max
    event_id WITHOUT a dedupe aggregate: the window orders by (ts, tag,
    view_id), so among same-timestamp views the max id is carried —
    the whole op is exactly ONE exchange (asserted in test_plans); the
    DuckDB twin uses its native ASOF LEFT JOIN on an explicitly deduped
    view table (same collapse).  Gap is computed in exact microseconds
    (unix_micros/epoch_us) — no float time math."""
    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts", "value")
    tagged = views.select(
        "user_id", "ts", F.lit(0).alias("tag"),
        F.col("event_id").alias("view_id"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.lit(None).cast("double").alias("value"),
    ).unionByName(purchases.select(
        "user_id", "ts", F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("view_id"), "purchase_id", "value",
    ))
    w = Window.partitionBy("user_id").orderBy("ts", "tag", "view_id")
    carried = tagged.select(
        "user_id", "ts", "tag", "purchase_id", "value",
        F.last("view_id", ignorenulls=True).over(w).alias("view_id"),
        F.last(F.when(F.col("tag") == 0, F.col("ts")),
               ignorenulls=True).over(w).alias("view_ts"),
    )
    out = carried.filter(F.col("tag") == 1)
    return out.select(
        "purchase_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("p_ts"),
        "view_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("view_ts"),
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.col("view_ts").cast("timestamp")))
        .alias("gap_us"),
        "value",
    )


SQL_EVENTS_ASOF_JOIN = """
WITH views AS (
  SELECT user_id, ts, max(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
),
purchases AS (
  SELECT event_id AS purchase_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS p_ts,
       v.view_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us,
       p.value
FROM purchases p
ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def q_tpch_q8(spark, sf_dir):
    """Q8 national market share, adapted to the driver schema: among
    'PROMO'-type parts bought by customers in region 'ASIA', the share
    of revenue supplied from NATION_2, by order year.  Scale shape: all
    three dims are FILTERED before broadcast (part by type, customer by
    region membership, supplier tagged with its nation name), so the
    only fact-fact shuffle is lineitem⋈orders on orderkey.  Both the
    nation-share and total sums are exact cent BIGINTs, so the final
    ratio is one deterministic division — order-independent on both
    engines."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO").select("p_partkey")
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(
            nation.join(F.broadcast(region),
                        nation.n_regionkey == region.r_regionkey)
            .select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation.select(
            F.col("n_nationkey").alias("sn_key"),
            F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01")))
    disc_c = _cents(_disc())
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
    )
    agg = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_2", disc_c)
              .otherwise(F.lit(0))).alias("nation_c"),
        F.sum(disc_c).alias("total_c"),
    )
    return agg.orderBy("o_year").select(
        "o_year",
        F.round(F.col("nation_c") / F.col("total_c"), 4).alias("mkt_share"))


SQL_TPCH_Q8 = """
WITH agg AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         sum(CASE WHEN sn.n_name = 'NATION_2'
             THEN CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT) ELSE 0 END) AS nation_c,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS total_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
    AND EXISTS (SELECT 1 FROM customer
                JOIN nation cn ON c_nationkey = cn.n_nationkey
                JOIN region ON cn.n_regionkey = r_regionkey
                WHERE c_custkey = o_custkey AND r_name = 'ASIA')
  GROUP BY 1
)
SELECT o_year, round(nation_c * 1.0 / total_c, 4) AS mkt_share
FROM agg ORDER BY o_year
"""


def q_tpch_q13(spark, sf_dir):
    """Q13 customer order-count distribution (adapted: the exclusion
    pattern runs on o_orderpriority — the synthetic orders have no
    comment column).  Shape: customer LEFT OUTER orders so zero-order
    customers keep a 0 bucket, then a second, tiny aggregation over the
    per-customer counts.  At 100 TB the custkey join is the one real
    shuffle; the distribution agg groups on at most a few hundred
    distinct counts → map-side partials collapse it."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("1")
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q15(spark, sf_dir):
    """Q15 top supplier(s) by quarterly revenue.  The max-revenue scalar
    is an aggregate-of-aggregate: per-supplier revenue (one shuffle on
    suppkey), then the 1-row global max rides a broadcast nested-loop
    against the per-supplier table — the standard scalar-subquery plan;
    no driver collect, no second pass over lineitem (revenue0 feeds both
    sides of the comparison from one shuffle via plan reuse).  Revenue
    is exact cents so 'equal to max' is bit-exact on both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01")))
    disc_c = _cents(_disc())
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(disc_c).alias("total_revenue_c"))
    top = revenue0.agg(F.max("total_revenue_c").alias("max_c"))
    supplier = _t(spark, sf_dir, "supplier")
    return (
        revenue0.join(F.broadcast(top),
                      F.col("total_revenue_c") == F.col("max_c"))
        .join(supplier, F.col("supplier_no") == supplier.s_suppkey)
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name",
                F.round(F.col("total_revenue_c") / 100.0, 2)
                .alias("total_revenue"))
    )


SQL_TPCH_Q15 = """
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
           AS total_revenue_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, round(total_revenue_c / 100.0, 2) AS total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM revenue0)
ORDER BY s_suppkey
"""


def q_tpch_q17(spark, sf_dir):
    """Q17 small-quantity-order revenue: lines of one brand whose
    quantity is below 20% of that part's average.  The correlated scalar
    subquery plans as a per-part aggregate joined back — ONE pass
    building (sum, count) per partkey, then the threshold test.  The
    0.2·avg comparison is kept in INTEGER math (5·qty·cnt < sum_qty;
    l_quantity is integral) so the filter is bit-exact on both engines —
    a float avg would be summation-order-dependent exactly at boundary
    rows.  Part is filtered to one brand before broadcasting."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(part), li.l_partkey == part.p_partkey) \
        .select("l_partkey", F.col("l_quantity").cast("long").alias("qty"),
                "l_extendedprice")
    stats = branded.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"))
    small = branded.join(stats, branded.l_partkey == stats.pk).filter(
        F.col("qty") * F.col("cnt") * 5 < F.col("sum_qty"))
    agg = small.agg(F.sum(_cents(F.col("l_extendedprice"))).alias("ext_c"))
    return agg.select(
        F.round(F.col("ext_c") / 100.0 / 7.0, 4).alias("avg_yearly"))


SQL_TPCH_Q17 = """
WITH branded AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
),
stats AS (
  SELECT l_partkey AS pk, sum(qty) AS sum_qty, count(*) AS cnt
  FROM branded GROUP BY 1
)
SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0,
             4) AS avg_yearly
FROM branded JOIN stats ON l_partkey = pk
WHERE qty * cnt * 5 < sum_qty
"""


def q_tpch_q19(spark, sf_dir):
    """Q19 discounted revenue under three disjunctive brand/size/
    quantity clauses.  The join stays a pure partkey equijoin with the
    disjunction applied as a post-join filter over broadcast-resident
    part columns — pushing OR-of-ANDs into the join condition would
    force a nested-loop; this shape keeps the hash join and lets the
    per-clause size/quantity bounds prune early."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") != "R")
    qty = F.col("l_quantity")
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50)
           & qty.between(20, 30))
    )
    joined = li.join(F.broadcast(part),
                     li.l_partkey == part.p_partkey).filter(clause)
    disc_c = _cents(_disc())
    return joined.agg(
        F.round(F.sum(disc_c) / 100.0, 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"))


SQL_TPCH_Q19 = """
SELECT round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) / 100.0, 2) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_returnflag <> 'R' AND (
      (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
       AND l_quantity BETWEEN 20 AND 30))
"""


def q_tpch_q2(spark, sf_dir):
    """Q2 minimum-cost supplier, adapted: the driver schema has no
    partsupp, so the part↔supplier relation is the DISTINCT
    (l_partkey, l_suppkey) projection of lineitem and the cost proxy is
    s_acctbal (lowest-balance supplier wins).  The correlated min
    subquery plans as a per-part min + equijoin back (one shuffle over
    the pair table); region/nation/supplier collapse into one broadcast
    dim; the final top-20 is a TakeOrderedAndProject."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(
            nation.join(F.broadcast(region),
                        nation.n_regionkey == region.r_regionkey)
            .select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name",
                F.round("s_acctbal", 2).alias("s_acctbal"))
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_brand")
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
    )
    cand = (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), ps.l_suppkey == sup.s_suppkey)
    )
    best = cand.groupBy(F.col("p_partkey").alias("pk")).agg(
        F.min("s_acctbal").alias("min_bal"))
    return (
        cand.join(best, (cand.p_partkey == best.pk)
                  & (cand.s_acctbal == best.min_bal))
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
    )


SQL_TPCH_Q2 = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
sup AS (
  SELECT s_suppkey, s_name, n_name, round(s_acctbal, 2) AS s_acctbal
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, n_name, s_acctbal
  FROM ps
  JOIN part ON l_partkey = p_partkey
  JOIN sup ON l_suppkey = s_suppkey
  WHERE p_size = 15 AND p_type = 'STANDARD'
),
best AS (SELECT p_partkey AS pk, min(s_acctbal) AS min_bal
         FROM cand GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM cand JOIN best ON p_partkey = pk AND s_acctbal = min_bal
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""


def q_tpch_q16(spark, sf_dir):
    """Q16 supplier-count by part attributes, adapted (partsupp :=
    distinct lineitem pairs; the complaints exclusion keys on
    s_acctbal < 0 — no comment column).  Shape: the exclusion is a
    broadcast ANTI join BEFORE the count-distinct shuffle; the group key
    (brand, type, size) is low-cardinality so the distinct-count
    aggregate collapses map-side."""
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey").distinct()
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0).select("s_suppkey")
    kept = (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
    )
    return (
        kept.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


SQL_TPCH_Q16 = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM ps JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_tpch_q20(spark, sf_dir):
    """Q20 excess-stock suppliers, adapted: suppliers who shipped more
    than 100 units of 'red' parts in 1996 (the availqty comparison has
    no partsupp to read).  Shape: the heavy aggregate (per-supplier
    quantity over the filtered fact) runs FIRST, the HAVING filter
    shrinks it to a handful of keys, and supplier joins via LEFT SEMI —
    the same agg-before-join order as q18.  Quantity sums are integral
    longs — exact."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01")))
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("red_qty"))
        .filter(F.col("red_qty") > 100)
    )
    supplier = _t(spark, sf_dir, "supplier")
    return (
        supplier.join(heavy, supplier.s_suppkey == heavy.l_suppkey)
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name", "red_qty")
    )


SQL_TPCH_Q20 = """
WITH heavy AS (
  SELECT l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS red_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > 100
)
SELECT s_suppkey, s_name, red_qty
FROM supplier JOIN heavy ON s_suppkey = l_suppkey
ORDER BY s_suppkey
"""


def q_tpch_q22(spark, sf_dir):
    """Q22 global-sales-opportunity, adapted: 'country code' is
    c_nationkey (no phone column).  Customers in a nation set with
    above-average positive balance and no RECENT orders (every
    synthetic customer has some order, so the dormancy test keys on the
    last half-year — same anti-join shape, nonzero selectivity).  The
    shape that
    matters: the average is an aggregate-of-scalars broadcast back (no
    collect), the no-orders test is a LEFT ANTI join on custkey, and —
    determinism — the above-average comparison is INTEGER math:
    bal_cents·count > sum_cents, because a float avg's summation order
    flips boundary customers between engines (the q17 lesson)."""
    nations = (1, 2, 3, 11, 12, 13, 21)
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(*nations)
    ).select("c_custkey", "c_nationkey",
             _cents(F.col("c_acctbal")).alias("bal_c"))
    pos = cust.filter(F.col("bal_c") > 0)
    avg_t = pos.agg(F.sum("bal_c").alias("sum_c"),
                    F.count(F.lit(1)).alias("n_pos"))
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-07-01")
    ).select("o_custkey")
    rich = (
        cust.crossJoin(F.broadcast(avg_t))
        .filter(F.col("bal_c") * F.col("n_pos") > F.col("sum_c"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    )
    return (
        rich.groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.round(F.sum("bal_c") / 100.0, 2).alias("totacctbal"))
        .orderBy("cntrycode")
    )


SQL_TPCH_Q22 = """
WITH cust AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer WHERE c_nationkey IN (1, 2, 3, 11, 12, 13, 21)
),
avg_t AS (
  SELECT sum(bal_c) AS sum_c, count(*) AS n_pos
  FROM cust WHERE bal_c > 0
)
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       round(sum(bal_c) / 100.0, 2) AS totacctbal
FROM cust, avg_t
WHERE bal_c * n_pos > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY 1 ORDER BY 1
"""


def q_events_path_trigrams(spark, sf_dir):
    """Behavioral path mining: the most common 3-step event-type
    transitions across user journeys (the funnel-discovery primitive —
    funnels assert a known path, this finds the paths worth asserting).
    Shape: ONE shuffle (user_id for the ordering window), trigram
    formation via two leads — no self-joins — then a low-cardinality
    count (|types|³ keys) that collapses map-side.  Tie-break (n DESC,
    trigram) totalizes the top-20."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "user_id", "ts", "event_id", "event_type",
            F.lead("event_type", 1).over(w).alias("t1"),
            F.lead("event_type", 2).over(w).alias("t2"),
        )
        .filter(F.col("t2").isNotNull())
        .select(F.concat_ws(">", "event_type", "t1", "t2").alias("trigram"))
    )
    return (
        tri.groupBy("trigram").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "trigram")
        .limit(20)
    )


SQL_EVENTS_PATH_TRIGRAMS = """
WITH seq AS (
  SELECT event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || t1 || '>' || t2 AS trigram, count(*) AS n
FROM seq WHERE t2 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20
"""


def q_events_rfm(spark, sf_dir):
    """RFM segmentation (recency/frequency/monetary) over purchase
    events — the classic user-value rollup.  Recency is exact integer
    days vs the corpus max timestamp (a broadcast 1-row scalar, no
    collect); monetary is cent-exact; the quartile assignment uses
    ntile(4) over a TOTAL order (metric + user_id tie-break) so bucket
    edges are deterministic on both engines.  One shuffle (user_id
    agg); the ntile windows are unpartitioned but run over the already-
    tiny per-user rollup, not the fact table."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase")
    per_user = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(_cents(F.col("value"))).alias("monetary_c"),
    )
    maxts = ev.agg(F.max("ts").alias("corpus_max"))
    base = per_user.crossJoin(F.broadcast(maxts)).select(
        "user_id",
        # parquet yields TIMESTAMP_NTZ; unix_micros wants TIMESTAMP
        ((F.unix_micros(F.col("corpus_max").cast("timestamp"))
          - F.unix_micros(F.col("last_ts").cast("timestamp")))
         / F.lit(86_400_000_000)).cast("long").alias("recency_days"),
        "frequency",
        F.round(F.col("monetary_c") / 100.0, 2).alias("monetary"),
        "monetary_c",
    )
    w_r = Window.orderBy("recency_days", "user_id")
    w_f = Window.orderBy(F.col("frequency").desc(), "user_id")
    w_m = Window.orderBy(F.col("monetary_c").desc(), "user_id")
    return base.select(
        "user_id", "recency_days", "frequency", "monetary",
        F.ntile(4).over(w_r).alias("r_quartile"),
        F.ntile(4).over(w_f).alias("f_quartile"),
        F.ntile(4).over(w_m).alias("m_quartile"),
    )


SQL_EVENTS_RFM = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
per_user AS (
  SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
         sum(CAST(round(value * 100) AS BIGINT)) AS monetary_c
  FROM p GROUP BY 1
),
base AS (
  SELECT user_id,
         -- // (floor division): DuckDB's CAST(x AS BIGINT) rounds to
         -- nearest while Spark's long cast truncates — a 0.9-day gap
         -- must be 0 days on both engines
         (epoch_us((SELECT max(ts) FROM p)) - epoch_us(last_ts))
           // 86400000000 AS recency_days,
         frequency,
         round(monetary_c / 100.0, 2) AS monetary,
         monetary_c
  FROM per_user
)
SELECT user_id, recency_days, frequency, monetary,
       ntile(4) OVER (ORDER BY recency_days, user_id) AS r_quartile,
       ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_quartile,
       ntile(4) OVER (ORDER BY monetary_c DESC, user_id) AS m_quartile
FROM base
"""


QUERIES = {
    "events_hourly": q_events_hourly,
    "events_path_trigrams": q_events_path_trigrams,
    "events_rfm": q_events_rfm,
    "events_sessionize": q_events_sessionize,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "events_anomaly_zscore": q_events_anomaly_zscore,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q4": q_tpch_q4,
    "tpch_q7": q_tpch_q7,
    "tpch_q9": q_tpch_q9,
    "tpch_q10": q_tpch_q10,
    "tpch_q14": q_tpch_q14,
    "tpch_q18": q_tpch_q18,
    "tpch_q8": q_tpch_q8,
    "tpch_q13": q_tpch_q13,
    "tpch_q15": q_tpch_q15,
    "tpch_q17": q_tpch_q17,
    "tpch_q19": q_tpch_q19,
    "tpch_q2": q_tpch_q2,
    "tpch_q16": q_tpch_q16,
    "tpch_q20": q_tpch_q20,
    "tpch_q22": q_tpch_q22,
    "events_asof_join": q_events_asof_join,
    "events_windowed": q_events_windowed,
    "dedup_mentions": q_dedup_mentions,
    "dedup_iter": q_dedup_iter,
    "groupby_report": q_groupby_report,
    "groupby_type_tables": q_groupby_type_tables,
    "entity_canonicalize": q_entity_canonicalize,
    "note_consolidate": q_note_consolidate,
    "file_tree": q_file_tree,
    "parsed_files_antijoin": q_parsed_files_antijoin,
    "kb_join": q_kb_join,
    "rule_route": q_rule_route,
    "greedy_route": q_greedy_route,
    "legacy_pivot": q_legacy_pivot,
    "stats_topk": q_stats_topk,
    "stats_percentile": q_stats_percentile,
    "union_reports": q_union_reports,
    "split_strings_report": q_split_strings_report,
    "skew_salt": q_skew_salt,
    "repartition_controls": q_repartition_controls,
}

ORACLES = {
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_path_trigrams": SQL_EVENTS_PATH_TRIGRAMS,
    "events_rfm": SQL_EVENTS_RFM,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "events_funnel": SQL_EVENTS_FUNNEL,
    "events_retention": SQL_EVENTS_RETENTION,
    "events_anomaly_zscore": SQL_EVENTS_ANOMALY_ZSCORE,
    "tpch_q1": SQL_TPCH_Q1,
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q5": SQL_TPCH_Q5,
    "tpch_q6": SQL_TPCH_Q6,
    "tpch_q4": SQL_TPCH_Q4,
    "tpch_q7": SQL_TPCH_Q7,
    "tpch_q9": SQL_TPCH_Q9,
    "tpch_q10": SQL_TPCH_Q10,
    "tpch_q14": SQL_TPCH_Q14,
    "tpch_q18": SQL_TPCH_Q18,
    "tpch_q8": SQL_TPCH_Q8,
    "tpch_q13": SQL_TPCH_Q13,
    "tpch_q15": SQL_TPCH_Q15,
    "tpch_q17": SQL_TPCH_Q17,
    "tpch_q19": SQL_TPCH_Q19,
    "tpch_q2": SQL_TPCH_Q2,
    "tpch_q16": SQL_TPCH_Q16,
    "tpch_q20": SQL_TPCH_Q20,
    "tpch_q22": SQL_TPCH_Q22,
    "events_asof_join": SQL_EVENTS_ASOF_JOIN,
    "events_windowed": SQL_EVENTS_WINDOWED,
    "dedup_mentions": SQL_DEDUP_MENTIONS,
    "dedup_iter": SQL_DEDUP_ITER,
    "groupby_report": SQL_GROUPBY_REPORT,
    "groupby_type_tables": SQL_GROUPBY_TYPE_TABLES,
    "entity_canonicalize": SQL_ENTITY_CANONICALIZE,
    "note_consolidate": SQL_NOTE_CONSOLIDATE,
    "file_tree": SQL_FILE_TREE,
    "parsed_files_antijoin": SQL_PARSED_FILES_ANTIJOIN,
    "kb_join": SQL_KB_JOIN,
    "rule_route": SQL_RULE_ROUTE,
    "greedy_route": SQL_GREEDY_ROUTE,
    "legacy_pivot": SQL_LEGACY_PIVOT,
    "stats_topk": SQL_STATS_TOPK,
    "stats_percentile": SQL_STATS_PERCENTILE,
    "union_reports": SQL_UNION_REPORTS,
    "split_strings_report": SQL_SPLIT_STRINGS_REPORT,
    "skew_salt": SQL_SKEW_SALT,
    "repartition_controls": SQL_REPARTITION_CONTROLS,
}
