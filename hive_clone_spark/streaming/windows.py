"""Event-time window operators over `events` (M4).

The registered queries run the window operators in BATCH mode (same
operators Structured Streaming uses — `F.window`, `F.session_window` —
so plans are identical modulo the streaming sink) and are DuckDB-
oracle-checked. The true streaming path (readStream → watermark →
windowed agg → sink) lives in `streams.py` and is exercised by the
streaming tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_clone_spark.catalog import table
from hive_clone_spark.registry import register

_FMT = "yyyy-MM-dd HH:mm:ss"


# ---------------------------------------------------------------------------
# tumbling window (1h): F.window — start/end are epoch-aligned
# ---------------------------------------------------------------------------
@register(
    "q23_tumbling_window",
    oracle="""
    SELECT
      strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
)
def q23_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("window.start", _FMT).alias("window_start"),
            F.date_format("window.end", _FMT).alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# sliding window (1h window, 30m slide): every event lands in 2 windows;
# the oracle reproduces the start set by epoch arithmetic
# ---------------------------------------------------------------------------
@register(
    "q24_sliding_window",
    oracle="""
    WITH offsets(off) AS (VALUES (0), (1)),
    slid AS (
      -- integer microseconds: epoch(ts)::BIGINT would ROUND, not floor
      SELECT to_timestamp((epoch_us(ts) // 1800000000) * 1800 - off * 1800)
               AT TIME ZONE 'UTC' AS w_start,
             value
      FROM events, offsets)
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(w_start + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM slid
    GROUP BY 1, 2
    ORDER BY window_start
    """,
)
def q24_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format("window.start", _FMT).alias("window_start"),
            F.date_format("window.end", _FMT).alias("window_end"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# session window (5m gap) per user: F.session_window merges events whose
# gap to the previous is < 5m; session end = last event + gap. Oracle:
# gaps-and-islands with lag.
# ---------------------------------------------------------------------------
@register(
    "q25_session_window",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts,
        CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 300000000
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
        SUM(new_session) OVER (
          PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM seq)
    SELECT user_id,
      strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      strftime(MAX(ts) + INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
      COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def q25_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "5 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", _FMT).alias("session_start"),
            F.date_format("session_window.end", _FMT).alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
