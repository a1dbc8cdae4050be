"""Event-stream suite queries (SURVEY §2.14 R1-R6) over ``events``
(event_id, ts, user_id, event_type, value, props-JSON).

Each query is the *batch* face of a streaming operator in
``streaming/events.py`` — tests assert the streaming run produces the
same rows; the driver oracle checks the batch face against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastpyvectordb_spark.streaming.events import (
    props_int,
    replay_last_n,
    sessionize,
    subscription_filter,
    windowed_counts,
)
from fastpyvectordb_spark.suite import register
from fastpyvectordb_spark.tables import load_table


@register(
    "events_window_hourly",
    """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def events_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6: tumbling 1-hour window counts + exact-cents value sums."""
    ev = load_table(spark, sf_dir, "events")
    return windowed_counts(ev, window="1 hour").orderBy(
        "window_start", "event_type"
    )


@register(
    "events_subscription_filter",
    r"""
SELECT event_id, event_type, user_id,
       CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k
FROM events
WHERE event_type IN ('click', 'purchase')
  AND CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) >= 80
ORDER BY event_id
""",
)
def events_subscription_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: subscription matching — type set + metadata predicate over
    the JSON props (ref realtime.py:91-118)."""
    ev = load_table(spark, sf_dir, "events")
    k = props_int("props", "k")
    sub = subscription_filter(
        ev, event_types=["click", "purchase"], props_predicate=k >= 80
    )
    return sub.select(
        "event_id", "event_type", "user_id", k.alias("k")
    ).orderBy("event_id")


@register(
    "events_replay_last10",
    """
SELECT event_id, event_type, user_id
FROM (
  SELECT event_id, event_type, user_id,
         row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn <= 10
ORDER BY event_type, event_id
""",
)
def events_replay_last10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: ring-buffer replay — latest 10 per event type."""
    ev = load_table(spark, sf_dir, "events")
    return replay_last_n(ev, n=10, per="event_type").select(
        "event_id", "event_type", "user_id"
    ).orderBy("event_type", "event_id")


@register(
    "events_sessionize",
    """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sid AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) AS TIMESTAMP) AS session_end
FROM sid
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization by 30-min inactivity gap (streaming twin:
    session_window state op)."""
    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, gap_minutes=30).orderBy("user_id", "session_id")


# ---------------------------------------------------------------------------
# Retention cohorts: users grouped by first-activity week, counted in
# every subsequent week they return — the classic product-analytics
# triangle. Two keyed aggregations + one co-partitioned join on
# user_id (first-seen is a grouped agg on the same key the join uses,
# so at 100 TB it is a single shuffle lineage, no broadcast needed).
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         date_trunc('week', e.ts) AS event_week
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
)
SELECT CAST(cohort_week AS DATE) AS cohort_week,
       CAST(date_diff('day', cohort_week, event_week) // 7 AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM activity
GROUP BY cohort_week, event_week
ORDER BY cohort_week, week_offset
"""


@register("events_retention_cohorts", _RETENTION_ORACLE)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).alias("event_week"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "event_week")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            (F.datediff("event_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
            "n_users",
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Sequential conversion funnel: signup → first view AFTER signup →
# first click AFTER that view → first purchase AFTER that click.
# Strict temporal ordering per user (not mere set membership): each
# stage is a conditional min over events later than the previous
# stage's timestamp — all equi-joins on user_id, one shuffle key.
# ---------------------------------------------------------------------------

_SEQ_FUNNEL_ORACLE = """
WITH s AS (
  SELECT user_id, min(ts) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
v AS (
  SELECT e.user_id, min(e.ts) AS t1 FROM events e
  JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'view' AND e.ts > s.t0 GROUP BY e.user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
       CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase
"""


@register("events_conversion_funnel", _SEQ_FUNNEL_ORACLE)
def events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_after(prev: DataFrame, etype: str, prev_t: str, out_t: str):
        return (
            ev.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    v = first_after(s, "view", "t0", "t1")
    c = first_after(v, "click", "t1", "t2")
    p = first_after(c, "purchase", "t2", "t3")
    counts = [
        df.agg(F.count(F.lit(1)).alias(name))
        for df, name in ((s, "n_signup"), (v, "n_view"), (c, "n_click"), (p, "n_purchase"))
    ]
    out = counts[0]
    for nxt in counts[1:]:
        out = out.crossJoin(nxt)
    return out


# ---------------------------------------------------------------------------
# OHLC downsampling: per-hour open/high/low/close over the value
# stream — the time-series rollup shape (open/close are picked by a
# rank window with an explicit (ts, event_id) tie-break so both
# engines choose identical rows; money stays integer cents).
# ---------------------------------------------------------------------------

_OHLC_ORACLE = """
WITH w AS (
  SELECT date_trunc('hour', ts) AS hour_start,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT hour_start,
       CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
       CAST(max(cents) AS BIGINT) AS high_cents,
       CAST(min(cents) AS BIGINT) AS low_cents,
       CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM w GROUP BY hour_start ORDER BY hour_start
"""


@register("events_ohlc_hourly", _OHLC_ORACLE)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour_start"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("hour_start").orderBy("ts", "event_id")
    wd = Window.partitionBy("hour_start").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("hour_start")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("cents"))).alias(
                "open_cents"
            ),
            F.max("cents").alias("high_cents"),
            F.min("cents").alias("low_cents"),
            F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).alias(
                "close_cents"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("hour_start")
    )


# ---------------------------------------------------------------------------
# Event-transition bigrams: LAG over per-user time order — the Markov
# transition counts behind "what do users do next" analyses.
# ---------------------------------------------------------------------------

_BIGRAM_ORACLE = """
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n
FROM o WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY n DESC, prev_type, next_type
LIMIT 15
"""


@register("events_transition_bigrams", _BIGRAM_ORACLE)
def events_transition_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "prev_type", "next_type")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Per-user outlier counts: 2.5σ rule with INTEGER-EXACT variance
# arithmetic — (n·x − s)²·4·(n−1) > 25·n·(n·ssq − s²) over cents, so
# both engines compare identical quantities (no stddev_samp drift;
# the one double cast happens on exact integers with pinned parens).
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH c AS (
  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
stats AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         CAST(sum(cents * cents) AS BIGINT) AS ssq
  FROM c GROUP BY user_id
)
SELECT c.user_id,
       stats.n AS n_events,
       CAST(count(*) FILTER (WHERE
         (CAST(stats.n * c.cents - stats.s AS DOUBLE)
          * CAST(stats.n * c.cents - stats.s AS DOUBLE))
         * CAST(4 * (stats.n - 1) AS DOUBLE)
         > CAST(25 * stats.n AS DOUBLE)
           * CAST(stats.n * stats.ssq - stats.s * stats.s AS DOUBLE)
       ) AS BIGINT) AS n_outliers
FROM c JOIN stats ON c.user_id = stats.user_id
WHERE stats.n > 1
GROUP BY c.user_id, stats.n
ORDER BY c.user_id
"""


@register("events_user_outlier_counts", _ZSCORE_ORACLE)
def events_user_outlier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ssq"),
    )
    j = ev.join(stats, "user_id").filter(F.col("n") > 1)
    dev = (F.col("n") * F.col("cents") - F.col("s")).cast("double")
    lhs = dev * dev * (4 * (F.col("n") - 1)).cast("double")
    rhs = (25 * F.col("n")).cast("double") * (
        F.col("n") * F.col("ssq") - F.col("s") * F.col("s")
    ).cast("double")
    return (
        j.groupBy("user_id", F.col("n").alias("n_events"))
        .agg(F.sum((lhs > rhs).cast("long")).alias("n_outliers"))
        .orderBy("user_id")
    )
