"""Event-time window queries over ``events`` (SURVEY.md §2.9 charter
extension — the reference streams purely by arrival order with no
timestamps; the engine adds event-time semantics).

These run the *batch* form of the windowed aggregations (identical
``F.window`` semantics to the streaming form — Structured Streaming
executes the same logical plan incrementally); the live streaming
pipelines with watermarks live in ``bigdata_kafka_2_spark/streaming/``
and are exercised by the streaming tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.plans import register

_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "q60_tumbling_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    description="Tumbling 1-day event-time window aggregation "
    "(F.window == time_bucket; both align to the epoch in "
    "UTC). Streaming twin in streaming/windows.py.",
    tags=("streaming", "window", "date"),
)
def q60_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q61_sliding_window",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '30 minutes', ts)
                      - k.o * INTERVAL '30 minutes',
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events, (VALUES (0), (1)) k(o)
    GROUP BY 1
    """,
    description="Sliding window (1 h size, 30 min slide): every event "
    "falls in exactly 2 windows. Oracle enumerates the window "
    "offsets explicitly.",
    tags=("streaming", "window", "date"),
)
def q61_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q62_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ),
    sessioned AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM ordered
    )
    SELECT user_id, session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sessioned
    GROUP BY user_id, session_id
    """,
    description="Sessionization (30 min inactivity gap) via lag + "
    "cumulative session counter — the batch equivalent of "
    "streaming session_window; one shuffle on user_id.",
    tags=("streaming", "window"),
)
def q62_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    # Microsecond-exact gap comparison so sub-second gaps round-trip
    # identically to the oracle's interval arithmetic.
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessioned = e.withColumn("session_id", F.sum(new_session).over(wrun))
    return sessioned.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), _FMT).alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
