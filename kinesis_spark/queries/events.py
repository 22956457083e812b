"""Event-stream analytics in batch form (SURVEY.md §2B streaming row):
tumbling/sliding windows, sessionization (gaps-and-islands), daily JSON
rollups. The same transforms run on ``readStream`` DataFrames — windowing
and sessionization here are expressed with watermark-compatible column ops
(see tests/test_streaming_analytics.py for the streaming drive).

Window buckets are computed with field-based (naive) datetime math —
``date_trunc`` + minute arithmetic — identical in any session timezone,
rather than ``F.window()`` whose epoch alignment renders differently
across timezones.

Scale: every query groups on (bucket, type) or (user, session) — partial
aggregation + single shuffle; sessionization shuffles once on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_spark.io import load_table
from kinesis_spark.queries import register


def _dec_value():
    return F.col("value").cast("decimal(18,6)")


def _bucket(col: str = "ts", minutes: int = 5):
    # N-minute tumbling bucket, field-based: trunc to hour + N-min floor
    # (ONE definition — e2 uses 5-minute, e3 10-minute buckets)
    return F.expr(
        f"date_trunc('hour', {col}) + make_dt_interval(0, 0, "
        f"(minute({col}) div {minutes}) * {minutes}, 0)"
    )


def _bucket5(col: str = "ts"):
    return _bucket(col, 5)


@register(
    "e1_daily_type_rollup",
    oracle="""
SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k
FROM events
GROUP BY 1, 2
""",
    tags=("events", "aggregate", "json"),
)
def e1_daily_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts + exact value sums per event type, with a
    JSON property extracted JVM-side (get_json_object)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec_value()).cast("double").alias("total_value"),
            F.sum(F.get_json_object("props", "$.k").cast("bigint"))
            .cast("bigint")
            .alias("total_k"),
        )
    )


@register(
    "e2_tumbling_window_counts",
    oracle="""
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP))
         + to_minutes((minute(CAST(ts AS TIMESTAMP))//5)*5) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
WHERE ts < TIMESTAMP '2024-01-03'
GROUP BY 1, 2
""",
    tags=("events", "window-tumbling"),
)
def e2_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling windows (streaming shape: groupBy(window(ts)))."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-03").cast("timestamp")
    )
    return (
        e.groupBy(_bucket5().alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec_value()).cast("double").alias("total_value"),
        )
    )


@register(
    "e3_sliding_window_counts",
    oracle="""
WITH b AS (
  SELECT event_type, value,
         date_trunc('hour', CAST(ts AS TIMESTAMP))
           + to_minutes((minute(CAST(ts AS TIMESTAMP))//10)*10) AS b0
  FROM events
  WHERE ts < TIMESTAMP '2024-01-02'
)
SELECT window_start, event_type, COUNT(*) AS n_events
FROM (
  SELECT event_type, value, unnest([b0, b0 - INTERVAL 10 MINUTE]) AS window_start
  FROM b
)
GROUP BY 1, 2
""",
    tags=("events", "window-sliding"),
)
def e3_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-minute windows sliding every 10: each event lands in 2 windows
    (explode of the 2 candidate starts — how Spark's window() works
    physically, but timezone-stable)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-02").cast("timestamp")
    )
    b0 = _bucket("ts", 10)
    return (
        e.select(
            "event_type",
            F.explode(
                F.array(b0, b0 - F.expr("INTERVAL 10 MINUTES"))
            ).alias("window_start"),
        )
        .groupBy("window_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "e4_sessionization",
    oracle="""
WITH flagged AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w)
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_s
FROM sessions
GROUP BY user_id, session_seq
""",
    tags=("events", "session"),
)
def e4_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap (gaps-and-islands).

    Batch analog of session_window(ts, '30 minutes'); one shuffle on
    user_id, sessions assembled with two window passes + a groupBy on the
    same key (no extra shuffle — same partitioning reused).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    prev_ts = F.lag("ts").over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            prev_ts.isNull()
            | (F.unix_micros("ts") - F.unix_micros(prev_ts) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn(
        "session_seq", F.sum("new_session").over(wcum).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        # integer `div` (not `/`): float division + cast could land a hair
        # under an exact integer quotient
        F.expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000").alias(
            "duration_s"
        ),
    )


@register(
    "e5_user_activity_profile",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       MIN(CAST(ts AS TIMESTAMP)) AS first_seen,
       MAX(CAST(ts AS TIMESTAMP)) AS last_seen,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
""",
    tags=("events", "aggregate"),
)
def e5_user_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity profile: event/type counts, first/last seen,
    error count, total value — one partial-aggregated pass."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
        F.sum(_dec_value()).cast("double").alias("total_value"),
    )


@register(
    "e6_funnel_analysis",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
)
SELECT v.user_id, CAST(v.view_ts AS TIMESTAMP) AS view_ts,
       CAST(c.click_ts AS TIMESTAMP) AS click_ts,
       CAST(p.purchase_ts AS TIMESTAMP) AS purchase_ts,
       CAST(1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT
            AS BIGINT) AS funnel_depth
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
""",
    tags=("events", "funnel", "sequence"),
)
def e6_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence funnel: first view → first subsequent click →
    first subsequent purchase, per user — in ONE events scan and ONE
    user_id shuffle (plan-asserted). The three stage timestamps chain
    as windows over the same user partitioning (no extra exchange per
    stage — each is min-of-a-conditional, O(1) window state), and the
    final per-user collapse rides the same partitioning. The former
    stage-join form (filter → aggregate → join per stage) re-scanned
    events SIX times through the plan's branches (r7 plan audit).

    Null semantics kept from the join form: a NULL user_id survives the
    view aggregate but can never advance (the stage equi-joins dropped
    it), so the later-stage windows gate on ``user_id IS NOT NULL``;
    and a user whose only view rows carry a NULL ts still emits a
    depth-1 row with a NULL view_ts (MIN over nulls), so membership is
    gated on HAVING a view event, not on view_ts being non-null."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts")
    )
    wu = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "has_view",
            F.max((F.col("event_type") == "view").cast("int")).over(wu),
        )
        .withColumn(
            "view_ts",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu),
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    F.col("user_id").isNotNull()
                    & (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("view_ts")),
                    F.col("ts"),
                )
            ).over(wu),
        )
        .withColumn(
            "purchase_ts",
            F.min(
                F.when(
                    F.col("user_id").isNotNull()
                    & (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("click_ts")),
                    F.col("ts"),
                )
            ).over(wu),
        )
    )
    depth = (
        F.lit(1)
        + F.when(F.col("click_ts").isNotNull(), 1).otherwise(0)
        + F.when(F.col("purchase_ts").isNotNull(), 1).otherwise(0)
    ).cast("bigint")
    return (
        staged.filter(F.col("has_view") == 1)
        .groupBy("user_id")
        .agg(
            F.max("view_ts").alias("view_ts"),
            F.max("click_ts").alias("click_ts"),
            F.max("purchase_ts").alias("purchase_ts"),
        )
        .select(
            "user_id", "view_ts", "click_ts", "purchase_ts",
            depth.alias("funnel_depth"),
        )
    )


@register(
    "e7_cohort_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         DATE_DIFF('week', f.cohort_week, DATE_TRUNC('week', e.ts)) AS week_n
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
)
SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
       CAST(week_n AS BIGINT) AS week_n,
       COUNT(*) AS n_active
FROM activity
GROUP BY cohort_week, week_n
""",
    tags=("events", "cohort", "retention"),
)
def e7_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen week, counted in
    each subsequent week they were active. first_seen is a user-keyed
    aggregate — one row per user, i.e. corpus-order at 100 TB, so it
    must NOT be hint-broadcast; the join shuffles on user_id (AQE will
    still broadcast it at runtime when it genuinely fits) and the
    distinct + count shuffle only (user, cohort, week_n) triples."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).cast("bigint").alias("week_n"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_n").agg(
        F.count(F.lit(1)).alias("n_active")
    )


@register(
    "e8_gap_filled_hourly",
    oracle="""
WITH bounds AS (
  SELECT DATE_TRUNC('hour', MIN(ts)) AS t0, DATE_TRUNC('hour', MAX(ts)) AS t1
  FROM events
),
spine AS (
  SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour_start
  FROM bounds
),
hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS hour_start, COUNT(*) AS n
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT CAST(s.hour_start AS TIMESTAMP) AS hour_start,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_purchases,
       (h.n IS NULL) AS was_gap
FROM spine s LEFT JOIN hourly h ON s.hour_start = h.hour_start
""",
    tags=("events", "timeseries", "gapfill"),
)
def e8_gap_filled_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series: a generated complete hour spine
    (sequence between min and max hour) left-joined with the sparse
    hourly counts, empty hours backfilled with 0 and flagged. The spine
    generates from two scalars — no driver loop; at 100 TB the spine is
    still only |hours| rows and broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    hourly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(hourly, "hour_start", "left").select(
        "hour_start",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_purchases"),
        F.col("n").isNull().alias("was_gap"),
    )


@register(
    "e9_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
    tags=("events", "sequence", "markov"),
)
def e9_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts (the Markov-chain view of user
    behavior): lag over the per-user time-ordered stream, then a
    25-cell aggregation. The window partitions by user — no global
    sort; the transition count matrix is |types|² rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


@register(
    "e10_session_window_builtin",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess_no
  FROM marked
)
SELECT user_id,
       CAST(MIN(ts) AS TIMESTAMP) AS sess_start,
       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS sess_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, sess_no
""",
    tags=("events", "session", "window"),
)
def e10_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in ``session_window`` in BATCH mode, cross-validated against
    an independent lag-based sessionization in SQL (Spark's session end
    = last event + gap; the oracle reproduces that contract). One
    merging-window aggregation instead of e4's two window passes — the
    preferred form whenever gap semantics are what's wanted."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
        )
    )


@register(
    "e11_interarrival_stats",
    oracle="""
WITH deltas AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER
              (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_gaps,
       MIN(gap_us) AS min_gap_us,
       MAX(gap_us) AS max_gap_us,
       CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
       CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS mean_gap_us
FROM deltas
WHERE gap_us IS NOT NULL
GROUP BY user_id
""",
    tags=("events", "interarrival", "timeseries"),
)
def e11_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time statistics per user: lag over the per-user
    time-ordered stream, gaps in exact epoch MICROseconds (whole-second
    epochs truncate sub-second precision differently across engines;
    micros are the native exact unit). The mean is one double division
    of exact ints — the load signature of a user, input to rate
    modeling and anomaly thresholds."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    ).cast("bigint")
    deltas = ev.select("user_id", gap.alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    return deltas.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum("gap_us").cast("bigint").alias("total_gap_us"),
        (F.sum("gap_us").cast("double") / F.count(F.lit(1))).alias("mean_gap_us"),
    )


@register(
    "e12_value_anomalies",
    oracle="""
WITH stats AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         CAST(SUM(CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(SUM(CAST("value" AS DECIMAL(18,6))
                  * CAST("value" AS DECIMAL(18,6))) AS DOUBLE) AS s2
  FROM events
  GROUP BY user_id
),
scored AS (
  SELECT e.user_id, st.n_events,
         s1 / n_events AS mean_v,
         sqrt(GREATEST(s2 / n_events - (s1 / n_events) * (s1 / n_events),
                       0.0)) AS std_v,
         e."value"
  FROM events e JOIN stats st ON st.user_id = e.user_id
)
SELECT user_id, n_events,
       CAST(SUM(CASE WHEN abs("value" - mean_v) > 2.0 * std_v
                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM scored
GROUP BY user_id, n_events
""",
    tags=("events", "anomaly", "window", "aggregate"),
)
def e12_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 2-sigma outlier counts — the population mean/std come
    from EXACT decimal sums (double summation order differs between
    engines; decimal sums are associative, then one double division), so
    the z-score comparison sees identical bits on both engines. Spark
    side: windows over user_id instead of an aggregate self-join (one
    events scan); the anomaly flag then re-aggregates per user."""
    e = load_table(spark, sf_dir, "events")
    v = _dec_value()
    w = Window.partitionBy("user_id")
    scored = e.select(
        "user_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n_events"),
        F.sum(v).over(w).cast("double").alias("s1"),
        F.sum(v * v).over(w).cast("double").alias("s2"),
    ).select(
        "user_id",
        "value",
        "n_events",
        (F.col("s1") / F.col("n_events")).alias("mean_v"),
        F.sqrt(
            F.greatest(
                F.col("s2") / F.col("n_events")
                - (F.col("s1") / F.col("n_events"))
                * (F.col("s1") / F.col("n_events")),
                F.lit(0.0),
            )
        ).alias("std_v"),
    )
    return scored.groupBy("user_id", "n_events").agg(
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("mean_v")) > 2.0 * F.col("std_v"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_anomalies")
    )


@register(
    "e13_rolling_weekly_active",
    oracle="""
WITH daily AS (
  SELECT DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM daily),
contrib AS (
  SELECT d.day + CAST(o.off AS INTEGER) AS report_day, d.user_id
  FROM daily d, (SELECT unnest(range(7)) AS off) o
)
SELECT CAST(c.report_day AS TIMESTAMP) AS report_day,
       COUNT(DISTINCT c.user_id) AS weekly_active
FROM contrib c JOIN days ON days.day = c.report_day
GROUP BY c.report_day
""",
    tags=("events", "rolling", "distinct"),
)
def e13_rolling_weekly_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct active users per observed day. COUNT(DISTINCT)
    over a sliding RANGE frame has no direct window form, so each (day,
    user) activity row is replicated FORWARD into the 7 report days it can
    contribute to, then distinct-counted per report day — the standard
    scalable rewrite (shuffle keys are (day, user) pairs, never per-event).

    Scale shape: the expensive dedup happens FIRST (events → distinct
    (day, user), one shuffle that collapses arbitrarily many events per
    user-day to one row); the 7x explode applies to the collapsed rows
    only. Report days are semi-joined to observed days via a broadcast.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    days = daily.select("day").distinct()
    contrib = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
        "user_id",
    ).select(F.date_add("day", F.col("off")).alias("report_day"), "user_id")
    return (
        contrib.join(
            F.broadcast(days), contrib.report_day == days.day, "left_semi"
        )
        .groupBy("report_day")
        .agg(F.count_distinct("user_id").alias("weekly_active"))
        .select(
            F.col("report_day").cast("timestamp").alias("report_day"),
            "weekly_active",
        )
    )


@register(
    "e14_typed_props_rollup",
    oracle="""
WITH typed AS (
  SELECT event_type,
         -- integers ONLY, mirroring Spark's from_json('k BIGINT')
         -- strictness: a JSON string "12" or a double 1.5 is NULL on
         -- the Spark side, so the oracle must not coerce them either
         -- (CAST of json_extract_string would parse '12' and ERROR on
         -- '1.5' — an accidental contract, not an aligned one)
         CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
              END AS k
  FROM events
)
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(MAX(k) AS BIGINT) AS k_max
FROM typed
GROUP BY event_type
""",
    tags=("events", "json", "struct"),
)
def e14_typed_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read for the JSON props column: ``from_json`` with a
    declared StructType (the typed lattice path, vs sc5's per-path
    ``get_json_object``), then an integer rollup on the nested field.
    One parse per row regardless of how many fields are read — at scale
    this beats N ``get_json_object`` calls, which each re-parse.
    """
    e = load_table(spark, sf_dir, "events")
    typed = e.select(
        "event_type", F.from_json("props", "k BIGINT").alias("p")
    ).select("event_type", F.col("p.k").alias("k"))
    return typed.groupBy("event_type").agg(
        F.count("k").cast("bigint").alias("n_with_k"),
        F.sum("k").cast("bigint").alias("k_sum"),
        F.min("k").cast("bigint").alias("k_min"),
        F.max("k").cast("bigint").alias("k_max"),
    )


@register(
    "e15_scd2_state_history",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
changes AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type,
       ts AS valid_from,
       LEAD(ts) OVER w2 AS valid_to,
       LEAD(ts) OVER w2 IS NULL AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    tags=("events", "scd2", "cdc"),
)
def e15_scd2_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 state history: compress each user's event stream to
    its state CHANGES (event_type != previous), then close each state
    row with the next change's timestamp — the standard
    (valid_from, valid_to, is_current] interval build that CDC feeds
    into warehouse dimensions.

    Scale shape: both windows partition by user_id with the same
    (ts, event_id) order, so the whole query is ONE hash shuffle on
    user_id and the sort is reused across the lag, the filter, and the
    lead — no joins, no second pass over events. event_id is the
    deterministic tie-break for equal timestamps (the repo-wide rule).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "e16_touch_attribution",
    oracle="""
WITH t0 AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, event_id
  FROM events WHERE event_type IN ('click', 'view')
),
t AS (
  SELECT user_id, ts, event_type, event_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id) AS rn
    FROM t0
  ) WHERE rn = 1
),
p AS (
  SELECT event_id AS pid, user_id, CAST(ts AS TIMESTAMP) AS pts,
         CAST(value AS DECIMAL(18,6)) AS val
  FROM events WHERE event_type = 'purchase'
),
cand AS (
  SELECT p.pid, p.val, t.ts, t.event_type
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.ts BETWEEN p.pts - INTERVAL 1 DAY AND p.pts
),
firsts AS (
  SELECT pid, val, event_type FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ts) AS rn FROM cand
  ) WHERE rn = 1
),
lasts AS (
  SELECT pid, val, event_type FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ts DESC) AS rn FROM cand
  ) WHERE rn = 1
),
att AS (
  SELECT event_type AS touch_type, 'first' AS role, val FROM firsts
  UNION ALL
  SELECT event_type AS touch_type, 'last' AS role, val FROM lasts
)
SELECT touch_type, role,
       COUNT(*) AS n_purchases,
       CAST(SUM(val * CAST(0.5 AS DECIMAL(2,1))) AS DOUBLE) AS attributed_value
FROM att
GROUP BY touch_type, role
""",
    tags=("events", "attribution", "window"),
)
def e16_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (first/last-touch) revenue attribution: each
    purchase splits its value 50/50 between the EARLIEST and the LATEST
    click/view in the trailing 24 h (a single touch is both roles and so
    receives the full value — no special case, two half-rows merge in
    the aggregate). Reported per (touch_type, role).

    Scale shape — no purchase×touch pairwise join: purchases and
    (per-(user, ts) collapsed) touches union into one relation, ONE
    shuffle on user_id, and both roles come from RANGE frames over exact
    event-time microseconds — ``[ts-24h, ts]`` — so the frame itself
    enforces the lookback window in integer arithmetic (no fp boundary). first/last(ignorenulls) skip the
    purchase rows' null touch structs; the collapse makes equal-ts
    ordering irrelevant (one touch per (user, ts) — the j7/j8
    tie-discipline). Value math is exact DECIMAL, halved by an exact
    DECIMAL(2,1) 0.5.
    """
    e = load_table(spark, sf_dir, "events")
    wt = Window.partitionBy("user_id", "ts").orderBy("event_id")
    touches = (
        e.filter(F.col("event_type").isin("click", "view"))
        .withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.struct(
                F.col("ts").alias("tts"),
                F.col("event_id").alias("tid"),
                F.col("event_type").alias("ttype"),
            ).alias("touch"),
            F.lit(None).cast("long").alias("pid"),
            F.lit(None).cast("decimal(18,6)").alias("val"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("struct<tts:timestamp,tid:long,ttype:string>").alias("touch"),
        F.col("event_id").alias("pid"),
        F.col("value").cast("decimal(18,6)").alias("val"),
    )
    u = touches.unionByName(purchases).withColumn("tsu", F.unix_micros("ts"))
    frame = (
        Window.partitionBy("user_id")
        .orderBy("tsu")
        .rangeBetween(-86_400_000_000, 0)
    )
    scored = u.select(
        "pid",
        "val",
        F.first("touch", ignorenulls=True).over(frame).alias("first_t"),
        F.last("touch", ignorenulls=True).over(frame).alias("last_t"),
    ).filter(F.col("pid").isNotNull() & F.col("first_t").isNotNull())
    att = scored.select(
        "val",
        F.explode(
            F.array(
                F.struct(
                    F.col("first_t.ttype").alias("touch_type"),
                    F.lit("first").alias("role"),
                ),
                F.struct(
                    F.col("last_t.ttype").alias("touch_type"),
                    F.lit("last").alias("role"),
                ),
            )
        ).alias("r"),
    )
    return att.groupBy(
        F.col("r.touch_type").alias("touch_type"), F.col("r.role").alias("role")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("val") * F.lit("0.5").cast("decimal(2,1)"))
        .cast("double")
        .alias("attributed_value"),
    )


@register(
    "e17_abandoned_checkout",
    oracle="""
WITH e0 AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
  FROM events
),
v AS (
  SELECT user_id, ts, event_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id) AS rn
    FROM e0 WHERE event_type = 'view'
  ) WHERE rn = 1
),
c AS (SELECT event_id, user_id, ts FROM e0 WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM e0 WHERE event_type = 'purchase'),
err AS (SELECT event_id, user_id, ts FROM e0 WHERE event_type = 'error'),
pair AS (
  SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
         v.event_id AS view_id, v.ts AS view_ts
  FROM c JOIN v ON c.user_id = v.user_id
   AND v.ts >= c.ts - INTERVAL 30 MINUTE AND v.ts < c.ts
  QUALIFY ROW_NUMBER() OVER (PARTITION BY c.event_id
                             ORDER BY v.ts DESC) = 1
),
flags AS (
  SELECT pr.*,
    EXISTS (SELECT 1 FROM p WHERE p.user_id = pr.user_id
             AND p.ts > pr.click_ts
             AND p.ts <= pr.click_ts + INTERVAL 1 HOUR) AS has_purchase,
    (SELECT COUNT(*) FROM err
      WHERE err.user_id = pr.user_id
        AND (err.ts, err.event_id) > (pr.view_ts, pr.view_id)
        AND (err.ts, err.event_id) < (pr.click_ts, pr.click_id)
    ) AS errors_between
  FROM pair pr
)
SELECT user_id, click_id, view_id,
       CAST(errors_between AS BIGINT) AS errors_between,
       has_purchase,
       (NOT has_purchase AND errors_between = 0) AS abandoned
FROM flags
""",
    tags=("events", "pattern", "window"),
)
def e17_abandoned_checkout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (the MATCH_RECOGNIZE Spark doesn't
    have): for every click, find the pattern

        view (≤30 min before) → click [no error between] →
        NO purchase within 1 h after

    and emit (user, click, matched view, errors_between, has_purchase,
    abandoned) — the abandoned-checkout / rage-path primitive.

    Expressed entirely with composable window machinery — no
    event×event pairwise join:
    - one union-free pass over events per user, ordered by exact
      microseconds; views collapse per (user, ts) first (the e16/j7 tie
      discipline);
    - the matched view is ``last(view_struct)`` over RANGE
      ``[-30 min, -1 µs]`` — the frame bounds ARE the pattern's time
      window, in integer micros;
    - "no error between" is a CUMULATIVE error counter (ROWS frame over
      (ts, event_id) order) carried INSIDE the view struct: errors
      between = counter at click − counter at matched view. Negation
      over a sequence becomes a subtraction — no anti-join;
    - "no purchase within 1 h" is ``first(marker)`` over RANGE
      ``[+1 µs, +1 h]``.

    Scale: one shuffle on user_id, three frames over the same sort
    order, output rows = clicks with a qualifying view. The oracle
    replays the pattern relationally (correlated EXISTS + row-value
    comparisons) — same semantics, different plan family.
    """
    e = load_table(spark, sf_dir, "events").withColumn(
        "tsu", F.unix_micros("ts")
    )
    wt = Window.partitionBy("user_id", "ts").orderBy("event_id")
    is_view = F.col("event_type") == "view"
    # collapse views per (user, ts) — ranked among VIEWS ONLY (a mixed
    # (user, ts) partition would hand a co-timed non-view rn=1 and drop
    # the view; the oracle ranks within its views CTE the same way)
    views = (
        e.filter(is_view)
        .withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    e = views.unionByName(e.filter(~is_view))
    order = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    cum_err = F.sum(
        F.when(F.col("event_type") == "error", 1).otherwise(0)
    ).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    e = e.withColumn("cum_err", cum_err)

    vframe = (
        Window.partitionBy("user_id")
        .orderBy("tsu")
        .rangeBetween(-30 * 60 * 1_000_000, -1)
    )
    pframe = (
        Window.partitionBy("user_id")
        .orderBy("tsu")
        .rangeBetween(1, 3600 * 1_000_000)
    )
    view_struct = F.when(
        F.col("event_type") == "view",
        F.struct(
            F.col("tsu").alias("vtsu"),
            F.col("event_id").alias("vid"),
            F.col("cum_err").alias("vcum"),
        ),
    )
    purchase_marker = F.when(F.col("event_type") == "purchase", F.lit(1))
    scored = e.select(
        "user_id",
        "event_id",
        "event_type",
        "cum_err",
        F.last(view_struct, ignorenulls=True).over(vframe).alias("v"),
        F.first(purchase_marker, ignorenulls=True).over(pframe).alias("p"),
    )
    clicks = scored.filter(
        (F.col("event_type") == "click") & F.col("v").isNotNull()
    )
    errors_between = (F.col("cum_err") - F.col("v.vcum")).cast("bigint")
    has_purchase = F.col("p").isNotNull()
    return clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("v.vid").alias("view_id"),
        errors_between.alias("errors_between"),
        has_purchase.alias("has_purchase"),
        (~has_purchase & (errors_between == 0)).alias("abandoned"),
    )


@register(
    "e18_sequence_patterns",
    oracle="""
WITH flagged AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         substr(event_type, 1, 1) AS sym,
         CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w)
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id, sym,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
seqs AS (
  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
         string_agg(sym, '' ORDER BY ts, event_id) AS seq_str
  FROM sessions GROUP BY user_id, session_seq
)
SELECT user_id, session_seq, seq_str,
       CAST(length(seq_str) AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(seq_str, 'v[^p]*p')) AS BIGINT)
         AS n_conversions,
       regexp_matches(seq_str, 'v[^pe]*p') AS has_clean_conv,
       CAST(len(regexp_extract_all(seq_str, 'e+')) AS BIGINT) AS n_error_runs
FROM seqs
""",
    tags=("events", "session", "pattern", "cep"),
)
def e18_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over sessionized event streams — the
    MATCH_RECOGNIZE / complex-event-processing face Spark SQL lacks
    natively, expressed as the scalable idiom: reduce each session to an
    ordered one-char-per-event symbol string, then run ordinary regexes
    over it. Patterns: ``v[^p]*p`` counts non-overlapping
    view-to-purchase conversions (greedy leftmost tokenization — Java
    and RE2 agree, no alternation/lookaround where they differ);
    ``v[^pe]*p`` flags a conversion untouched by errors; ``e+`` counts
    error bursts. Symbols are first letters of the five event types
    (v/c/p/s/e — distinct by construction).

    Plan shape: e4's gap sessionization (one shuffle on user_id, both
    window passes and the groupBy reuse that partitioning); the symbol
    string is assembled by sorting each session's (ts, event_id, sym)
    structs — session-bounded arrays, never a corpus-wide sort — and
    every regex is a row-local JVM op on a string whose length is the
    session's event count. At 100 TB: one equi-shuffle plus map work;
    pattern changes are free (no new shuffle), which is why the
    symbol-string reduction is the standard CEP-at-rest encoding.

    Determinism: (ts, event_id) is a total order; struct sort and
    string_agg ORDER BY produce identical strings; counts are ints and
    the flag is exact.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    prev_ts = F.lag("ts").over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("sym"),
        F.when(
            prev_ts.isNull()
            | (F.unix_micros("ts") - F.unix_micros(prev_ts) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn(
        "session_seq", F.sum("new_session").over(wcum).cast("bigint")
    )
    seq_str = F.concat_ws(
        "",
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "sym"))),
            lambda x: x["sym"],
        ),
    )
    seqs = sessions.groupBy("user_id", "session_seq").agg(seq_str.alias("seq_str"))
    return seqs.select(
        "user_id",
        "session_seq",
        "seq_str",
        F.length("seq_str").cast("bigint").alias("n_events"),
        F.regexp_count("seq_str", F.lit(r"v[^p]*p")).cast("bigint").alias(
            "n_conversions"
        ),
        F.col("seq_str").rlike(r"v[^pe]*p").alias("has_clean_conv"),
        F.regexp_count("seq_str", F.lit("e+")).cast("bigint").alias("n_error_runs"),
    )
