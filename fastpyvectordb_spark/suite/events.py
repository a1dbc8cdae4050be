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
