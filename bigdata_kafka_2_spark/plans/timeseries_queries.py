"""Time-series analytics queries over ``events`` (charter extension:
gap-filling resample + ordered funnel — the event-analytics staples
beyond the window/sessionization family)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.plans import register


@register(
    "q89_resample_ffill",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS d,
             sum(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('day', min(ts)) AS lo,
             date_trunc('day', max(ts)) AS hi
      FROM events
    ),
    grid AS (
      SELECT u.user_id, g.d
      FROM (SELECT DISTINCT user_id FROM events) u,
           bounds,
           UNNEST(generate_series(bounds.lo, bounds.hi,
                                  INTERVAL '1 day')) AS g(d)
    )
    SELECT g.user_id,
           strftime(g.d, '%Y-%m-%d') AS day,
           CAST(daily.v AS DOUBLE) AS day_value,
           CAST(last_value(daily.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS filled_value
    FROM grid g
      LEFT JOIN daily ON daily.user_id = g.user_id AND daily.d = g.d
    """,
    description="Gap-filling daily resample with forward fill "
    "(operators/timeseries.resample_ffill): one row per (user, day) "
    "over the table's full range — exact-DECIMAL day sums (NULL on "
    "gap days) plus last-observed-day carried forward. The grid is "
    "users × day-sequence (bounds a 1-row broadcast, the sequence "
    "exploded row-locally); the observed-sum join and the fill "
    "window share the user key. The time-series normalization step "
    "the window family doesn't cover (dashboards, training-feature "
    "alignment).",
    tags=("window", "aggregate"),
)
def q89_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import resample_ffill

    e = read_table(spark, sf_dir, "events")
    return resample_ffill(e)


@register(
    "q99_funnel_counts",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t
        AND e.ts <= s1.t + INTERVAL '12 hours'
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t
        AND e.ts <= s2.t + INTERVAL '12 hours'
      GROUP BY 1
    )
    SELECT 1 AS step_idx, 'view' AS step,
           (SELECT count(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM s3)
    """,
    description="Ordered conversion funnel "
    "(operators/timeseries.funnel_counts): users whose first 'view' "
    "is followed by a 'click' within 12 hours and then a 'purchase' "
    "within 12 hours of that click — greedy earliest-anchor "
    "semantics (deterministic, the standard product-analytics "
    "funnel; horizon chosen non-vacuous on the driver events: "
    "150→37→7 at sf0.01). One filtered min-aggregate per step joined "
    "to the previous frontier on the user key — k narrow user-keyed "
    "shuffles, no explode, no self cross join.",
    tags=("aggregate", "join"),
)
def q99_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import funnel_counts

    e = read_table(spark, sf_dir, "events")
    return funnel_counts(
        e, ["view", "click", "purchase"], within="12 hours"
    )


@register(
    "q116_markov_transitions",
    oracle="""
    WITH nxt AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ),
    cnt AS (
      SELECT from_type, to_type,
             CAST(count(*) AS BIGINT) AS n_transitions
      FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (
      SELECT from_type, sum(n_transitions) AS t FROM cnt GROUP BY 1
    )
    SELECT c.from_type, c.to_type, c.n_transitions,
           round(c.n_transitions * 1.0 / t.t, 6) AS prob
    FROM cnt c JOIN tot t USING (from_type)
    """,
    description="First-order Markov transition matrix over per-user "
    "event streams (operators/timeseries.markov_transitions): "
    "consecutive event-type pairs per user — ordered by (ts, "
    "event_id) for deterministic ties — counted and row-normalized "
    "into transition probabilities. The sequence-analytics "
    "complement to the funnel (q99 checks ONE prescribed path; this "
    "measures every observed path — next-event prediction, journey "
    "clustering, anomalous-flow detection). One user-keyed lead "
    "window + one map-side-combinable (from, to) aggregate; the "
    "normalization join touches k x k rows, never the event table.",
    tags=("window", "aggregate"),
)
def q116_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        markov_transitions,
    )

    e = read_table(spark, sf_dir, "events")
    return markov_transitions(e)


@register(
    "q119_session_stats",
    oracle="""
    WITH lagged AS (
      SELECT user_id, event_id, ts, event_type,
             lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(sum(CASE WHEN prev IS NULL
                             OR ts > prev + INTERVAL 24 HOUR
                           THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS session_seq
      FROM lagged
    )
    SELECT user_id, session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           min(ts) AS started, max(ts) AS ended,
           (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0
             AS duration_sec
    FROM sess GROUP BY user_id, session_seq
    """,
    description="Batch gap-based sessionization + per-session summary "
    "(operators/timeseries.sessionize/session_stats, 24-hour gap): "
    "each user's event stream cut into sessions wherever the "
    "inter-event gap exceeds the threshold, then one summary row per "
    "session (event count, distinct types, span, exact-microsecond "
    "duration). The batch complement to the streaming session window "
    "(q64): labels HISTORICAL data so sessions can join back to "
    "events, feed funnels, or bound training sequences. One "
    "user-keyed window carries both the lag and the running "
    "new-session sum (one shuffle, one sort); the follow-up "
    "groupBy(user, session_seq) aggregates within the same key "
    "prefix with map-side partials.",
    tags=("window", "aggregate"),
)
def q119_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import session_stats

    e = read_table(spark, sf_dir, "events")
    return session_stats(e, gap="24 hours")


def _ewma_literals(alpha: float = 0.3, m: int = 16):
    """The Python-precomputed weight ladder + cumulative 6-dp integer
    denominators, shared VERBATIM between the Spark plan and the SQL
    oracle (repr() round-trips doubles exactly in both engines)."""
    w = [alpha * (1.0 - alpha) ** j for j in range(m)]
    cum6, acc = [], 0.0
    for x in w:
        acc += round(x, 6)
        cum6.append(int(round(acc * 1_000_000)))
    return w, cum6


_EWMA_W, _EWMA_CUM6 = _ewma_literals()


@register(
    "q133_ewma",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ),
    contrib AS (
      SELECT user_id, rn,
             CAST(round(value * ([{', '.join(repr(x) for x in _EWMA_W)}])[rn], 6)
                  AS DECIMAL(28,6)) AS c
      FROM ranked WHERE rn <= 16
    ),
    agg AS (
      SELECT user_id,
             CAST(count(*) AS INT) AS n_used,
             CAST(sum(c) * 1000000 AS BIGINT) AS s6
      FROM contrib GROUP BY user_id
    )
    SELECT user_id, n_used,
           (CASE WHEN s6 < 0 THEN -1 ELSE 1 END)
             * ((abs(s6) * 10000 * 2 + d6) // (d6 * 2)) / 10000.0 AS ewma
    FROM (
      SELECT *, ([{', '.join(str(c) for c in _EWMA_CUM6)}])[n_used] AS d6
      FROM agg
    )
    """,
    description="Per-user truncated EWMA of the last 16 event values "
    "(operators/timeseries.ewma_latest, alpha=0.3): the recency-"
    "weighted activity feature where a plain mean over-weights "
    "history. The geometric ladder makes truncation exact to "
    "(1-alpha)^16 of the mass, and a FIXED window means the weights "
    "are Python-precomputed literals shared verbatim with the oracle "
    "(no engine pow in the plan — the q121 discount-ladder rule); "
    "rows beyond 16 are dropped BEFORE any arithmetic so per-key "
    "cost is the window, not history. Contributions 6-dp exact "
    "DECIMALs; final ratio rounds half-away-from-zero in integer "
    "arithmetic (the q117 tie rule). Partial ladders renormalize "
    "keys with fewer than 16 rows.",
    tags=("window", "aggregate", "profile"),
)
def q133_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import ewma_latest

    e = read_table(spark, sf_dir, "events")
    return ewma_latest(
        e, "value", "user_id", ["ts", "event_id"], alpha=0.3, m=16
    )


@register(
    "q155_sequence_patterns",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(length(seq) AS INT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'v[^p]*p')) AS INT)
             AS n_matches
    FROM seqs
    """,
    description="Per-user event-sequence pattern matching "
    "(operators/timeseries.sequence_pattern_counts, the "
    "MATCH_RECOGNIZE shape): each user's time-ordered events encode "
    "one letter each (c/e/p/s/v) and 'v[^p]*p' counts "
    "view→…→purchase conversions with no purchase in between — "
    "leftmost non-overlapping, the shared semantics of Java "
    "Matcher.find and RE2 regexp_extract_all, so Spark and DuckDB "
    "agree. ONE groupBy aggregation: array_sort over collected "
    "(ts, id, letter) structs then a row-local concat + "
    "regexp_count — no table-wide window, no explode; per-key state "
    "bounded by that user's event count (chunk via sessionize for "
    "pathological keys).",
    tags=("timeseries", "text"),
)
def q155_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        sequence_pattern_counts,
    )

    e = read_table(spark, sf_dir, "events")
    out = sequence_pattern_counts(
        e, "user_id", "ts", "event_type", "v[^p]*p",
        tiebreak_col="event_id",
    )
    return out.select(
        "user_id",
        F.col("seq_len").cast("int").alias("seq_len"),
        F.col("n_matches").cast("int").alias("n_matches"),
    )


@register(
    "q159_interval_islands",
    oracle="""
    WITH iv AS (
      SELECT user_id, ts AS s, ts + INTERVAL 5 MINUTE AS e FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
                  OR s > max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM flagged
    )
    SELECT user_id,
           strftime(min(s), '%Y-%m-%d %H:%M:%S') AS island_start,
           strftime(max(e), '%Y-%m-%d %H:%M:%S') AS island_end,
           CAST(count(*) AS BIGINT) AS n_merged
    FROM islands GROUP BY user_id, island
    """,
    description="Gaps-and-islands interval coalescing "
    "(operators/timeseries.coalesce_intervals): each event opens a "
    "5-minute activity window; overlapping-or-touching windows per "
    "user merge into maximal disjoint islands (coverage windows, "
    "session stitching, blackout merging — the interval-union "
    "primitive). Two per-key windows (running max of end detects "
    "island starts, running sum of flags assigns ids) + one groupBy "
    "— state bounded per key, no global sort, end-exclusive touch "
    "semantics.",
    tags=("timeseries", "window"),
)
def q159_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        coalesce_intervals,
    )

    e = read_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    out = coalesce_intervals(iv, "user_id", "s", "e")
    return out.select(
        "user_id",
        F.date_format("island_start", "yyyy-MM-dd HH:mm:ss").alias(
            "island_start"
        ),
        F.date_format("island_end", "yyyy-MM-dd HH:mm:ss").alias(
            "island_end"
        ),
        "n_merged",
    )


@register(
    "q160_trailing_window",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_in_window,
           CAST(sum(CAST(round(value, 4) AS DECIMAL(18,4))) OVER w
                AS DOUBLE) AS sum_window
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW
    )
    """,
    description="Time-RANGE trailing window "
    "(operators/timeseries.trailing_window_sum): per event, the "
    "count and exact-DECIMAL value sum of the user's events in the "
    "trailing 6 hours — the irregular-spacing moving window the "
    "ROW-frame family (q94) can't express (rolling exposure, rate "
    "limiting, trailing spend). The frame ranges over "
    "unix_micros(ts) — an exact integer axis, so boundaries and "
    "tied-timestamp peers are bit-identical across engines. One "
    "user-keyed shuffle, per-key sorted state, no global sort.",
    tags=("window", "timeseries"),
)
def q160_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        trailing_window_sum,
    )

    e = read_table(spark, sf_dir, "events")
    return trailing_window_sum(
        e, "user_id", "ts", "value", window_sec=21600,
        id_cols=("event_id",),
    )


@register(
    "q162_cohort_retention",
    oracle="""
    WITH ev AS (
      SELECT user_id AS k, date_trunc('day', ts) AS p FROM events
    ),
    first AS (SELECT k, min(p) AS cohort FROM ev GROUP BY k)
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
           CAST(date_diff('day', f.cohort, e.p) AS INT) AS offset,
           CAST(count(DISTINCT e.k) AS BIGINT) AS n_active
    FROM ev e JOIN first f USING (k)
    GROUP BY 1, 2
    """,
    description="Cohort retention triangle "
    "(operators/timeseries.cohort_retention): users bucketed by "
    "first-event day; n_active = distinct cohort users active N days "
    "later (offset 0 = cohort size; the ratio is the retention "
    "curve). One per-user min aggregate + one equi-join back + one "
    "distinct-count — two key shuffles, no window, no event-table "
    "self-join; output is periods², independent of event volume.",
    tags=("timeseries", "aggregate"),
)
def q162_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import cohort_retention

    e = read_table(spark, sf_dir, "events")
    out = cohort_retention(e, "user_id", "ts", grain="day")
    return out.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
        F.col("offset").cast("int").alias("offset"),
        "n_active",
    )


@register(
    "q165_last_touch_attribution",
    oracle="""
    WITH conv AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT c.user_id, c.event_id AS conversion_id,
           c.ts AS conversion_ts,
           CASE WHEN b.ts IS NOT NULL
                     AND epoch_us(c.ts) - epoch_us(b.ts)
                         <= CAST(43200 AS BIGINT) * 1000000
                THEN b.event_id END AS touch_id,
           CASE WHEN b.ts IS NOT NULL
                     AND epoch_us(c.ts) - epoch_us(b.ts)
                         <= CAST(43200 AS BIGINT) * 1000000
                THEN (epoch_us(c.ts) - epoch_us(b.ts)) / 1000000.0
           END AS sec_since_touch
    FROM conv c LEFT JOIN LATERAL (
      SELECT event_id, ts FROM t
      WHERE t.user_id = c.user_id
        AND (t.ts < c.ts
             OR (t.ts = c.ts AND t.event_id < c.event_id))
      ORDER BY ts DESC, event_id DESC LIMIT 1
    ) b ON true
    """,
    description="Last-touch attribution "
    "(operators/timeseries.last_touch_attribution): every purchase "
    "credited to the same user's most recent preceding view within "
    "12 hours, NULL when none — the event-level complement to q99's "
    "cohort funnel. ONE per-key time-ordered window carries "
    "last(touch_struct, ignorenulls) so each conversion sees its "
    "latest touch with NO self-join of the event table (the oracle "
    "transcribes the naive correlated LATERAL the window replaces); "
    "horizon check row-local; ties at equal timestamps ordered by "
    "event id.",
    tags=("timeseries", "window"),
)
def q165_last_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        last_touch_attribution,
    )

    e = read_table(spark, sf_dir, "events")
    return last_touch_attribution(
        e, "user_id", "ts", "event_type",
        conversion="purchase", touch="view", horizon_sec=43200,
    )


@register(
    "q168_rolling_active_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS d
      FROM events
    ),
    days AS (
      SELECT unnest(generate_series((SELECT min(d) FROM ud),
                                    (SELECT max(d) FROM ud),
                                    INTERVAL 1 DAY)) AS d
    ),
    wau AS (
      SELECT d2.d AS day, count(DISTINCT ud.u) AS wau
      FROM days d2 JOIN ud
        ON ud.d <= d2.d AND ud.d > d2.d - INTERVAL 7 DAY
      GROUP BY 1
    ),
    dau AS (SELECT d AS day, count(DISTINCT u) AS dau FROM ud GROUP BY 1)
    SELECT strftime(wau.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(dau.dau, 0) AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau
    FROM wau LEFT JOIN dau USING (day)
    """,
    description="Exact rolling active users "
    "(operators/timeseries.rolling_active_users): per day, DAU and "
    "the 7-day rolling DISTINCT actives — rolling distinct does not "
    "decompose into daily sums, the classic WAU trap. Linear "
    "construction: dedup to (user, day), each row row-locally "
    "COVERS the 7 days it keeps the user active (sequence + "
    "explode, x7 bounded volume), one distinct-count per covered "
    "day — no day-by-day inequality self-join over events (the "
    "oracle transcribes exactly that naive interval join and "
    "hash-matches). Day range clipped to the observed max so both "
    "constructions agree at the boundary.",
    tags=("timeseries", "aggregate"),
)
def q168_rolling_active_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        rolling_active_users,
    )

    e = read_table(spark, sf_dir, "events")
    out = rolling_active_users(e, "user_id", "ts", window_days=7)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "dau", "wau"
    )


@register(
    "q191_linear_attribution",
    oracle="""
    WITH conv AS (
      SELECT user_id AS u, event_id AS cid, ts AS cts FROM events
      WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id AS u, event_id AS tid, ts AS tts FROM events
      WHERE event_type = 'view'
    ),
    joined AS (
      SELECT c.cid, t.tts,
             count(*) OVER (PARTITION BY c.cid) AS n
      FROM conv c JOIN touch t ON c.u = t.u
      WHERE (t.tts < c.cts OR (t.tts = c.cts AND t.tid < c.cid))
        AND epoch_us(c.cts) - epoch_us(t.tts)
            <= CAST(43200 AS BIGINT) * 1000000
    )
    SELECT strftime(date_trunc('day', tts), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(CAST(round(1.0 / n, 6) AS DECIMAL(28,6)))
                AS DOUBLE) AS credit
    FROM joined GROUP BY 1
    """,
    description="Multi-touch linear attribution "
    "(operators/timeseries.linear_attribution): every purchase's "
    "credit splits evenly across the same user's views in the "
    "preceding 12 hours — the fractional-credit complement to "
    "q165's last-touch, aggregated to credit per touch day. Each "
    "touch's 1/n share is rounded to 6 dp and summed as an exact "
    "DECIMAL (order-independent day sums); one user-keyed equi-join "
    "bounded by the horizon predicate, one conversion-keyed window, "
    "one day aggregate.",
    tags=("timeseries", "window", "aggregate"),
)
def q191_linear_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        linear_attribution,
    )

    e = read_table(spark, sf_dir, "events")
    out = linear_attribution(
        e, "user_id", "ts", "event_type",
        conversion="purchase", touch="view", horizon_sec=43200,
    )
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_touches",
        "credit",
    )


@register(
    "q197_position_attribution",
    oracle="""
    WITH conv AS (
      SELECT user_id AS u, event_id AS cid, ts AS cts FROM events
      WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id AS u, event_id AS tid, ts AS tts FROM events
      WHERE event_type = 'view'
    ),
    joined AS (
      SELECT c.cid, t.tts,
             count(*) OVER (PARTITION BY c.cid) AS n,
             row_number() OVER (
               PARTITION BY c.cid ORDER BY t.tts ASC, t.tid ASC
             ) AS rn
      FROM conv c JOIN touch t ON c.u = t.u
      WHERE (t.tts < c.cts OR (t.tts = c.cts AND t.tid < c.cid))
        AND epoch_us(c.cts) - epoch_us(t.tts)
            <= CAST(43200 AS BIGINT) * 1000000
    )
    SELECT strftime(date_trunc('day', tts), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(CAST(round(
             CASE WHEN n = 1 THEN 1.0
                  WHEN n = 2 THEN 0.5
                  WHEN rn = 1 OR rn = n THEN 0.4
                  ELSE (1.0 - 2 * 0.4) / (n - 2) END, 6)
             AS DECIMAL(28,6))) AS DOUBLE) AS credit
    FROM joined GROUP BY 1
    """,
    description="POSITION-BASED (U-shaped) multi-touch attribution "
    "(operators/timeseries.position_attribution): first and last "
    "qualifying views each take 40% of every purchase's credit, "
    "middle views split the rest evenly (single touch keeps 100%, "
    "two touches 50/50) — the introduction-plus-closer view next to "
    "q191's uniform split and q165's winner-take-all, over the same "
    "12-hour horizon. Touch order is (ts, event_id), the same total "
    "order that qualifies ties, so credit assignment is "
    "deterministic under timestamp collisions; credits rounded to "
    "6 dp and DECIMAL-summed per day. Plan: the shared "
    "qualifying-touch join + count/row_number over ONE conversion-"
    "keyed window partition (one shuffle), one day aggregate.",
    tags=("timeseries", "window", "aggregate"),
)
def q197_position_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        position_attribution,
    )

    e = read_table(spark, sf_dir, "events")
    out = position_attribution(
        e, "user_id", "ts", "event_type",
        conversion="purchase", touch="view", horizon_sec=43200,
        endpoint_weight=0.4,
    )
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_touches",
        "credit",
    )


@register(
    "q200_session_concurrency",
    oracle="""
    WITH lagged AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             CAST(sum(CASE WHEN prev IS NULL
                             OR ts > prev + INTERVAL 24 HOUR
                           THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS session_seq
      FROM lagged
    ),
    spans AS (
      SELECT user_id, session_seq,
             min(ts) AS started, max(ts) AS ended
      FROM sess GROUP BY 1, 2
    ),
    hrs AS (
      SELECT unnest(generate_series(
        date_trunc('hour', started), date_trunc('hour', ended),
        INTERVAL 1 HOUR
      )) AS h
      FROM spans
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(count(*) AS BIGINT) AS n_active
    FROM hrs GROUP BY 1
    """,
    description="Hourly session-concurrency profile (operators/"
    "timeseries.session_concurrency, 24-hour gap matching q119): per "
    "hour bucket, how many gap-based sessions were active — the "
    "capacity/load view a serving tier is sized by, and the signal a "
    "bot incident spikes long before per-user counters trip. An "
    "interval-STABBING count, never a pairwise interval join: "
    "q119's one user-keyed sessionize window + same-key span "
    "aggregate, then a row-local sequence explode onto hour buckets "
    "(output = total session-hours) and one map-side-combined hour "
    "aggregate.",
    tags=("timeseries", "window", "aggregate"),
)
def q200_session_concurrency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        session_concurrency,
    )

    e = read_table(spark, sf_dir, "events")
    out = session_concurrency(e, gap="24 hours")
    return out.select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "n_active",
    )


@register(
    "q204_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    pre AS (
      SELECT d, c,
             sum(c) OVER (ORDER BY d) AS p,
             row_number() OVER (ORDER BY d) AS i
      FROM daily
    ),
    tot AS (SELECT count(*) AS n, sum(c) AS t FROM daily)
    SELECT CAST(n AS BIGINT) AS n_periods,
           strftime(d, '%Y-%m-%d') AS day,
           round(CAST(abs(n * p - i * t) AS DOUBLE) / (n * 100.0), 4)
             AS max_cusum
    FROM pre, tot
    ORDER BY abs(n * p - i * t) DESC, d ASC LIMIT 1
    """,
    description="CUSUM changepoint over the daily order-revenue "
    "series (operators/timeseries.cusum_changepoint): the day "
    "maximizing |sum of deviations from the series mean| — the "
    "level-shift detector completing the drift family (PSI/KL "
    "compare snapshots you chose, KS compares two samples; CUSUM "
    "finds WHERE the level changed). All-integer: per-row exact "
    "cents, n*S_i = n*P_i - i*T so the mean is never divided out, "
    "DECIMAL(38,0)/HUGEINT cross-products, one division rounded at "
    "the end; earliest-day tie-break. Two passes of the range-"
    "bucketed global_prefix_sum (values + row index — never a "
    "single-partition window at scale; the oracle transcribes the "
    "naive global window it equals), one broadcast total, one "
    "TakeOrdered(1).",
    tags=("timeseries", "profile", "aggregate"),
)
def q204_cusum_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        cusum_changepoint,
    )

    o = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(cents).alias("c")
    )
    out = cusum_changepoint(daily, "d", "c", unit_scale=100)
    return out.select(
        "n_periods",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "max_cusum",
    )


@register(
    "q209_seasonal_anomalies",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS c
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT dayofweek(d) AS w, round(avg(c), 4) AS b
      FROM daily GROUP BY 1
    ),
    resid AS (
      SELECT d, c, c - b AS residual
      FROM daily JOIN base ON dayofweek(d) = w
    ),
    med AS (SELECT quantile_cont(residual, 0.5) AS m FROM resid),
    mad AS (
      SELECT quantile_cont(abs(residual - m), 0.5) AS s
      FROM resid, med
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(c AS BIGINT) AS cents,
           residual,
           round(0.6745 * (residual - m) / s, 4) AS mod_z
    FROM resid, med, mad
    WHERE s <> 0
      AND abs(round(0.6745 * (residual - m) / s, 4)) > 3.5
    """,
    description="Seasonality-adjusted anomaly detection over daily "
    "order revenue (operators/timeseries.seasonal_anomalies): "
    "subtract the day-of-week baseline (exact cents, 4-dp average), "
    "then flag residuals by the robust modified z-score (q111's "
    "median/MAD machinery, Iglewicz-Hoaglin 3.5) — a raw threshold "
    "fires every weekend; the seasonal-residual MAD flags the "
    "Tuesday that looks like a Sunday, the monitoring view CUSUM "
    "(level shifts, q204) doesn't cover. One 7-row weekday "
    "broadcast, two exact-percentile passes (q23 parity).",
    tags=("timeseries", "profile", "quality"),
)
def q209_seasonal_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        seasonal_anomalies,
    )

    o = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(cents).alias("c")
    )
    out = seasonal_anomalies(daily, "d", "c", threshold=3.5)
    return out.filter(F.col("is_outlier")).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("c").alias("cents"),
        "residual",
        "mod_z",
    )


@register(
    "q218_retention_curve",
    oracle="""
    WITH ev AS (
      SELECT user_id AS k, date_trunc('week', ts) AS p FROM events
    ),
    first AS (SELECT k, min(p) AS cohort FROM ev GROUP BY k),
    base AS (
      SELECT f.cohort,
             CAST(date_diff('day', f.cohort, e.p) AS INT) AS d_off,
             CAST(count(DISTINCT e.k) AS BIGINT) AS n_active
      FROM ev e JOIN first f USING (k)
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT cohort, n_active AS n_cohort FROM base WHERE d_off = 0
    )
    SELECT strftime(b.cohort, '%Y-%m-%d') AS cohort_week,
           b.d_off // 7 AS week_offset, s.n_cohort, b.n_active,
           round(CAST(b.n_active AS DOUBLE) / s.n_cohort, 4)
             AS retention
    FROM base b JOIN sizes s USING (cohort)
    """,
    description="Weekly retention CURVE over the events stream "
    "(operators/timeseries.cohort_retention, grain='week', "
    "rates=True — the rate extension of q162's daily retention "
    "triangle): users cohorted by first-event ISO week, one cell "
    "per (cohort week, weeks since) with cohort size and retention "
    "rate — the decay profile a plain per-week activity count "
    "hides (growth masks churn exactly as long as acquisition "
    "outruns it). Cohort size is the cell's own offset-0 row "
    "(every user is active in their first period by construction) "
    "broadcast back onto the periods-squared triangle — the event "
    "table shuffles only on the user key, twice, same as q162.",
    tags=("timeseries", "aggregate"),
)
def q218_retention_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        cohort_retention,
    )

    e = read_table(spark, sf_dir, "events")
    out = cohort_retention(e, "user_id", "ts", grain="week", rates=True)
    return out.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        F.floor(F.col("offset") / 7).cast("int").alias("week_offset"),
        "n_cohort",
        "n_active",
        "retention",
    )


@register(
    "q221_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS x,
             CAST(count(*) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT a.x AS i, b.x AS j,
             (b.v - a.v) * 1.0 / (b.x - a.x) AS s
      FROM daily a JOIN daily b ON b.x > a.x
    ),
    m AS (SELECT count(*) AS m FROM pairs),
    ranked AS (
      SELECT s, row_number() OVER (ORDER BY s, i, j) AS rn FROM pairs
    ),
    slope AS (SELECT s FROM ranked, m WHERE rn = (m + 1) // 2),
    resid AS (
      SELECT d.x, d.v - s.s * d.x AS b FROM daily d, slope s
    ),
    k AS (SELECT count(*) AS k FROM resid),
    rranked AS (
      SELECT b, row_number() OVER (ORDER BY b, x) AS rn FROM resid
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_periods,
           round((SELECT s FROM slope), 6) AS slope,
           round((SELECT b FROM rranked, k WHERE rn = (k + 1) // 2), 6)
             AS intercept
    """,
    description="Theil-Sen robust trend over daily event counts "
    "(operators/timeseries.theil_sen_trend): the MEDIAN of all "
    "pairwise slopes plus the median residual intercept — the "
    "robust member of the trend/drift family (an OLS line moves "
    "with a single corrupted day; Theil-Sen tolerates ~29% "
    "outliers), fitting through spiky activity before a monitor "
    "alerts on direction. x is exact epoch days (gaps stay honest). "
    "Every pairwise slope divides integer-derived values "
    "identically on both engines and the median is an exact rank "
    "selection under the total order (slope, i, j) — both engines "
    "pick the same element, rounded only on output. The pair frame "
    "is periods-squared (bounded by the already-aggregated series, "
    "never event volume); rank selection rides the range-bucketed "
    "global_row_number, counts and the 1-row slope broadcast.",
    tags=("timeseries", "profile", "aggregate"),
)
def q221_theil_sen_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import (
        theil_sen_trend,
    )

    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("x")
    ).agg(F.count(F.lit(1)).alias("v"))
    return theil_sen_trend(daily, "x", "v")


@register(
    "q224_kaplan_meier",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    firsts AS (
      SELECT o_custkey,
             min(CASE WHEN rn = 1 THEN d END) AS d1,
             min(CASE WHEN rn = 2 THEN d END) AS d2
      FROM ranked GROUP BY 1
    ),
    mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS md FROM orders),
    subj AS (
      SELECT CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
                  ELSE date_diff('day', d1, md) END AS t,
             CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS e
      FROM firsts, mx
    ),
    g AS (
      SELECT t, CAST(sum(e) AS BIGINT) AS d,
             CAST(sum(1 - e) AS BIGINT) AS c
      FROM subj GROUP BY t
    ),
    cum AS (
      SELECT t, d, c,
             coalesce(sum(d + c) OVER (
               ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS rm
      FROM g
    ),
    tot AS (SELECT count(*) AS N FROM subj),
    ev AS (
      SELECT t, (N - rm) AS n_risk, d AS n_events, c AS n_censored,
             CASE WHEN (N - rm) > d THEN
               CAST(round(ln(CAST((N - rm) - d AS DOUBLE)
                             / CAST(N - rm AS DOUBLE)), 6)
                    AS DECIMAL(28,6)) END AS term
      FROM cum, tot WHERE d > 0
    ),
    cl AS (
      SELECT t, n_risk, n_events, n_censored, term,
             CAST(sum(term) OVER (ORDER BY t) AS DECIMAL(38,6)) AS ls
      FROM ev
    )
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk, n_events, n_censored,
           CAST(CASE WHEN term IS NULL THEN NULL ELSE ls END
                AS DOUBLE) AS log_survival,
           CASE WHEN term IS NULL THEN 0.0
                ELSE round(exp(CAST(ls AS DOUBLE)), 6) END AS survival
    FROM cl
    """,
    description="Kaplan-Meier survival curve for time-to-repeat-"
    "purchase (operators/timeseries.kaplan_meier): duration = days "
    "from a customer's first order to their second; customers who "
    "never reorder are RIGHT-CENSORED at the corpus's last order "
    "date — the estimator that uses them correctly, where q162/q218's "
    "cohort triangles must drop incompletely-observed subjects "
    "(Kaplan & Meier 1958). One keyed window ranks each customer's "
    "orders; the curve itself runs on the distinct-duration frame "
    "(bounded by the day range, never customer count): risk sets and "
    "the cumulative log-survival both ride the range-bucketed "
    "global_prefix_sum — no single-partition window, which is what "
    "the oracle's naive OVER (ORDER BY t) transcribes. Step factors "
    "enter as round(ln((n-d)/n), 6) summed in exact DECIMAL(38,6), "
    "so log_survival is order-independent and engine-identical; the "
    "terminal all-die row pins survival to 0 without touching ln(0).",
    tags=("timeseries", "profile", "aggregate"),
)
def q224_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from bigdata_kafka_2_spark.operators.timeseries import kaplan_meier

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    firsts = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
    )
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("md"))
    subjects = firsts.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff("d2", "d1")
        )
        .otherwise(F.datediff("md", "d1"))
        .alias("duration"),
        F.when(F.col("d2").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("event"),
    )
    return kaplan_meier(subjects)


@register(
    "q227_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS x,
             CAST(count(*) AS DECIMAL(38,0)) AS v
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
             sum(v) AS s, sum(v * v) AS sxx
      FROM daily
    ),
    lags AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS k),
    pairs AS (
      SELECT l.k, a.v AS vh, b.v AS vt
      FROM daily a JOIN lags l ON true
        JOIN daily b ON b.x = a.x + l.k
    ),
    per AS (
      SELECT k, CAST(count(*) AS DECIMAL(38,0)) AS nk,
             sum(vh * vt) AS sxy, sum(vh) AS sh, sum(vt) AS st
      FROM pairs GROUP BY k
    )
    SELECT CAST(k AS INTEGER) AS lag, CAST(nk AS BIGINT) AS n_pairs,
           round((CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * CAST(sxy AS DOUBLE)
                  - CAST(n AS DOUBLE) * CAST(s AS DOUBLE)
                    * (CAST(sh AS DOUBLE) + CAST(st AS DOUBLE))
                  + CAST(nk AS DOUBLE) * CAST(s AS DOUBLE)
                    * CAST(s AS DOUBLE))
                 / (CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))),
                 6) AS acf
    FROM per, tot
    """,
    description="Sample autocorrelation of daily event counts at lags "
    "1-7 (operators/timeseries.autocorrelation): the period-detection "
    "primitive that JUSTIFIES q209's assumed weekly seasonality and "
    "flags q204-style level shifts as slowly-decaying lags. The "
    "series is the already-aggregated daily frame (bounded by the "
    "day range, never event volume); lag pairing is one equi-join of "
    "the series against itself exploded by 7 offsets; every sum "
    "(Σxy, Σx, Σx²) accumulates as exact DECIMAL, and both engines "
    "combine those identical integers through the same left-"
    "associated double expression — one rounded division per lag.",
    tags=("timeseries", "aggregate"),
)
def q227_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import autocorrelation

    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("x")
    ).agg(F.count(F.lit(1)).alias("v"))
    return autocorrelation(daily, "x", "v", max_lag=7)


@register(
    "q233_ols_trend_by_group",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS x,
             CAST(count(*) AS DECIMAL(38,0)) AS y
      FROM events GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS DECIMAL(38,0)) AS n,
             sum(CAST(x AS DECIMAL(38,0))) AS sx,
             sum(y) AS sy,
             sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
               AS sxx,
             sum(y * y) AS syy,
             sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy
      FROM daily GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_periods,
           round(CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                           > 0
             THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END, 6)
             AS slope,
           round(CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                           > 0
             THEN (CAST(sy AS DOUBLE)
                   - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END, 6)
             AS intercept,
           round(CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                           > 0
                       AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                           > 0
             THEN ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                  / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             END, 6) AS r2
    FROM agg
    """,
    description="Per-event-type OLS trend of daily activity "
    "(operators/timeseries.ols_trend): closed-form slope/intercept/"
    "r² per group from ONE map-side-combined aggregate of exact "
    "DECIMAL sums — the classical companion to q221's Theil-Sen "
    "(robust, but its pair frame makes per-group fits expensive); a "
    "monitor reports both and alarms on disagreement. The closed "
    "forms cast identical integers to double and evaluate the same "
    "left-associated expression on both engines; degenerate groups "
    "(constant x or y) return NULL rather than a fabricated fit. "
    "No window, no join — scan speed at any scale.",
    tags=("timeseries", "aggregate"),
)
def q233_ols_trend_by_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import ols_trend

    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return ols_trend(daily, ["event_type"], "x", "y")


@register(
    "q237_watermark_lateness",
    oracle="""
    WITH arr AS (
      SELECT event_id, epoch_us(ts) AS us FROM events
    ),
    pm AS (
      SELECT event_id, us,
             max(us) OVER (
               ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS hw
      FROM arr
    ),
    late AS (
      SELECT greatest(0, coalesce(hw - us, 0)) AS l FROM pm
    ),
    b AS (
      SELECT CASE WHEN l = 0 THEN 'on-time'
                  WHEN l <= 60000000 THEN '<=1m'
                  WHEN l <= 300000000 THEN '<=5m'
                  WHEN l <= 3600000000 THEN '<=1h'
                  ELSE '>1h' END AS bucket,
             l
      FROM late
    ),
    tot AS (SELECT count(*) AS n FROM b)
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(count(*) AS DOUBLE) / CAST(max(tot.n) AS DOUBLE),
                 6) AS pct,
           round(CAST(max(l) AS DOUBLE) / 1000000.0, 3) AS max_late_s
    FROM b, tot GROUP BY bucket
    """,
    description="Watermark-tuning lateness profile (operators/"
    "relational.global_prefix_max): per event, how far its event "
    "time lags the high-water mark of everything that ARRIVED "
    "before it (arrival order = event_id, the ingest sequence), "
    "bucketed into the delays a withWatermark() designer would "
    "choose between — the empirical answer to 'what watermark drops "
    "how much', measured BEFORE committing a streaming job to one "
    "(q63/q65's watermarks assume a delay; this measures it). The "
    "running max is the range-bucketed global_prefix_max — "
    "per-bucket window maxima + a ≤64-row driver running max, never "
    "a single-partition window (the oracle transcribes exactly that "
    "naive global window); lateness stays exact integer "
    "microseconds until the display rounding.",
    tags=("timeseries", "streaming", "profile"),
)
def q237_watermark_lateness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.relational import (
        global_prefix_max,
    )

    e = read_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us")
    )
    pm = global_prefix_max(e, ["event_id"], "us", out_col="hw")
    late = pm.select(
        F.greatest(
            F.lit(0).cast("long"),
            F.coalesce(F.col("hw") - F.col("us"), F.lit(0).cast("long")),
        ).alias("l")
    )
    bucket = (
        F.when(F.col("l") == 0, F.lit("on-time"))
        .when(F.col("l") <= 60_000_000, F.lit("<=1m"))
        .when(F.col("l") <= 300_000_000, F.lit("<=5m"))
        .when(F.col("l") <= 3_600_000_000, F.lit("<=1h"))
        .otherwise(F.lit(">1h"))
    )
    tot = late.agg(F.count(F.lit(1)).alias("__n"))
    return (
        late.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("l").alias("__ml"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_events",
            F.round(
                F.col("n_events").cast("double")
                / F.col("__n").cast("double"),
                6,
            ).alias("pct"),
            F.round(F.col("__ml").cast("double") / 1_000_000.0, 3).alias(
                "max_late_s"
            ),
        )
    )


@register(
    "q255_nelson_aalen",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    firsts AS (
      SELECT o_custkey,
             min(CASE WHEN rn = 1 THEN d END) AS d1,
             min(CASE WHEN rn = 2 THEN d END) AS d2
      FROM ranked GROUP BY 1
    ),
    mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS md FROM orders),
    subj AS (
      SELECT CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
                  ELSE date_diff('day', d1, md) END AS t,
             CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS e
      FROM firsts, mx
    ),
    g AS (
      SELECT t, CAST(sum(e) AS BIGINT) AS d,
             CAST(sum(1 - e) AS BIGINT) AS c
      FROM subj GROUP BY t
    ),
    cum AS (
      SELECT t, d, c,
             coalesce(sum(d + c) OVER (
               ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS rm
      FROM g
    ),
    tot AS (SELECT count(*) AS N FROM subj),
    ev AS (
      SELECT t, (N - rm) AS n_risk, d AS n_events,
             CAST(round(CAST(d AS DOUBLE) / CAST(N - rm AS DOUBLE), 9)
                  AS DECIMAL(38,9)) AS h,
             CAST(round(CAST(d AS DOUBLE)
                        / (CAST(N - rm AS DOUBLE)
                           * CAST(N - rm AS DOUBLE)), 12)
                  AS DECIMAL(38,12)) AS v
      FROM cum, tot WHERE d > 0
    ),
    cl AS (
      SELECT t, n_risk, n_events,
             sum(h) OVER (ORDER BY t) AS H,
             sum(v) OVER (ORDER BY t) AS V
      FROM ev
    )
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk, n_events,
           CAST(round(CAST(H AS DECIMAL(38,9)), 6) AS DOUBLE)
             AS cum_hazard,
           floor(sqrt(CAST(V AS DOUBLE)) * 1000000.0 + 0.5)
             / 1000000.0 AS se_hazard,
           floor(exp(-CAST(H AS DOUBLE)) * 1000000.0 + 0.5)
             / 1000000.0 AS survival_fh
    FROM cl
    """,
    description="Nelson-Aalen cumulative hazard (operators/"
    "timeseries.nelson_aalen; Nelson 1972, Aalen 1978) over "
    "time-to-repeat-purchase with right censoring at the observation "
    "edge - q224's additive sibling: KM multiplies survival factors, "
    "NA sums hazard increments d/n (the quantity hazard-ratio "
    "thinking and q256's log-rank live in), with the exp(-H) "
    "Fleming-Harrington survival and the sqrt(sum d/n^2) SE. Same "
    "machinery: distinct-duration collapse, risk sets and both "
    "cumulatives on the range-bucketed global_prefix_sum (9/12-dp "
    "terms in exact DECIMAL, never a single-partition window).",
    tags=("timeseries", "aggregate", "window"),
)
def q255_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from bigdata_kafka_2_spark.operators.timeseries import nelson_aalen

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    firsts = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
    )
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("md"))
    subj = firsts.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff("d2", "d1")
        )
        .otherwise(F.datediff("md", "d1"))
        .alias("duration"),
        F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("event"),
    )
    return nelson_aalen(subj, "duration", "event")


@register(
    "q256_logrank_test",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    firsts AS (
      SELECT o_custkey,
             min(CASE WHEN rn = 1 THEN d END) AS d1,
             min(CASE WHEN rn = 2 THEN d END) AS d2
      FROM ranked GROUP BY 1
    ),
    mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS md FROM orders),
    subj AS (
      SELECT CASE WHEN d2 IS NOT NULL THEN date_diff('day', f.d1, f.d2)
                  ELSE date_diff('day', f.d1, md) END AS t,
             CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS e,
             CASE WHEN c.c_mktsegment = 'BUILDING'
                  THEN 1 ELSE 0 END AS g1
      FROM firsts f
        JOIN customer c ON c.c_custkey = f.o_custkey, mx
    ),
    cells AS (
      SELECT t, CAST(sum(e) AS BIGINT) AS d,
             CAST(sum(e * g1) AS BIGINT) AS d1,
             count(*) AS rem, sum(g1) AS rem1
      FROM subj GROUP BY t
    ),
    cum AS (
      SELECT t, d, d1,
             coalesce(sum(rem) OVER (
               ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS rm,
             coalesce(sum(rem1) OVER (
               ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS rm1
      FROM cells
    ),
    tot AS (
      SELECT count(*) AS N, sum(g1) AS N1 FROM subj
    ),
    terms AS (
      SELECT d1,
             CAST(round(CAST(d AS DOUBLE)
                        * (CAST(N1 - rm1 AS DOUBLE)
                           / CAST(N - rm AS DOUBLE)), 9)
                  AS DECIMAL(38,9)) AS eterm,
             CAST(CASE WHEN N - rm > 1 THEN
               round(CAST(d AS DOUBLE)
                     * (CAST(N1 - rm1 AS DOUBLE)
                        / CAST(N - rm AS DOUBLE))
                     * (1.0 - CAST(N1 - rm1 AS DOUBLE)
                              / CAST(N - rm AS DOUBLE))
                     * (CAST(N - rm AS DOUBLE) - CAST(d AS DOUBLE))
                     / (CAST(N - rm AS DOUBLE) - 1.0), 12) END
                  AS DECIMAL(38,12)) AS vterm
      FROM cum, tot WHERE d > 0
    ),
    agg AS (
      SELECT (SELECT N FROM tot) AS N, (SELECT N1 FROM tot) AS N1,
             CAST(sum(d1) AS BIGINT) AS O1,
             sum(eterm) AS E1, sum(vterm) AS V
      FROM terms
    )
    SELECT CAST(N AS BIGINT) AS n, CAST(N1 AS BIGINT) AS n_group,
           O1 AS observed,
           round(CAST(E1 AS DOUBLE), 6) AS expected,
           round(CAST(V AS DOUBLE), 6) AS variance,
           round((CAST(O1 AS DOUBLE) - CAST(E1 AS DOUBLE))
                 * (CAST(O1 AS DOUBLE) - CAST(E1 AS DOUBLE))
                 / CAST(V AS DOUBLE), 6) AS chi2
    FROM agg
    """,
    description="Two-sample log-rank test (operators/timeseries."
    "logrank_test; Mantel 1966): does BUILDING-segment customers' "
    "time-to-repeat-purchase differ from the rest, with right "
    "censoring handled correctly - the survival member of the "
    "two-sample family (q192 KS and q225 Mann-Whitney compare full "
    "distributions; a mean-of-durations test is simply WRONG under "
    "censoring). Hypergeometric O/E/V sums over distinct event "
    "times: per-group removal counts, risk sets from TWO range-"
    "bucketed prefix sums, 9/12-dp terms in exact DECIMAL, the "
    "single-subject risk-set variance guard.",
    tags=("timeseries", "aggregate", "join"),
)
def q256_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from bigdata_kafka_2_spark.operators.timeseries import logrank_test

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    firsts = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
    )
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("md"))
    subj = (
        firsts.join(c, firsts.o_custkey == c.c_custkey)
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("d2").isNotNull(), F.datediff("d2", "d1")
            )
            .otherwise(F.datediff("md", "d1"))
            .alias("duration"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("event"),
            (F.col("c_mktsegment") == "BUILDING").alias("grp"),
        )
    )
    return logrank_test(subj, "grp", "duration", "event")


@register(
    "q262_competing_risks_cif",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             o_orderpriority AS pri,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    firsts AS (
      SELECT o_custkey,
             min(CASE WHEN rn = 1 THEN d END) AS d1,
             min(CASE WHEN rn = 2 THEN d END) AS d2,
             min(CASE WHEN rn = 1 THEN pri END) AS p1,
             min(CASE WHEN rn = 2 THEN pri END) AS p2
      FROM ranked GROUP BY 1
    ),
    mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS md FROM orders),
    subj AS (
      SELECT CASE WHEN d2 IS NOT NULL THEN date_diff('day', d1, d2)
                  ELSE date_diff('day', d1, md) END AS t,
             CASE WHEN d2 IS NULL THEN 0
                  WHEN p2 = p1 THEN 1 ELSE 2 END AS e
      FROM firsts, mx
    ),
    g AS (
      SELECT t,
             CAST(sum(CASE WHEN e = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS d1,
             CAST(sum(CASE WHEN e = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS d2,
             count(*) AS rem
      FROM subj GROUP BY t
    ),
    cum AS (
      SELECT t, d1, d2,
             coalesce(sum(rem) OVER (
               ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS rm
      FROM g
    ),
    tot AS (SELECT count(*) AS N FROM subj),
    ev AS (
      SELECT t, d1, d2, (N - rm) AS n_risk,
             CASE WHEN (N - rm) > d1 + d2 THEN
               CAST(round(ln(CAST((N - rm) - (d1 + d2) AS DOUBLE)
                             / CAST(N - rm AS DOUBLE)), 6)
                    AS DECIMAL(28,6)) END AS lf
      FROM cum, tot WHERE d1 + d2 > 0
    ),
    pre AS (
      SELECT t, d1, d2, n_risk,
             coalesce(sum(lf) OVER (
               ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS DECIMAL(38,6))) AS ls_before
      FROM ev
    ),
    inc AS (
      SELECT t, d1, d2, n_risk,
             (2000 * CAST(round(round(exp(CAST(ls_before AS DOUBLE)),
                                      6) * 1000000.0, 0) AS BIGINT)
                   * d1 + n_risk) // (2 * n_risk) AS u1,
             (2000 * CAST(round(round(exp(CAST(ls_before AS DOUBLE)),
                                      6) * 1000000.0, 0) AS BIGINT)
                   * d2 + n_risk) // (2 * n_risk) AS u2
      FROM pre
    )
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d1, d2,
           CAST((sum(u1) OVER (ORDER BY t) + 500) // 1000 AS DOUBLE)
             / 1000000.0 AS cif_1,
           CAST((sum(u2) OVER (ORDER BY t) + 500) // 1000 AS DOUBLE)
             / 1000000.0 AS cif_2
    FROM inc
    """,
    description="Aalen-Johansen cumulative incidence under competing "
    "risks (operators/timeseries.competing_risks_cif; Aalen & "
    "Johansen 1978): time to repeat purchase split by CAUSE - repeat "
    "at the same priority (cause 1) vs a different priority (cause "
    "2), censored at the observation edge. The estimator 1-KM gets "
    "WRONG under competing risks (treating cause-2 as censoring "
    "overstates cause-1 incidence, the Gooley et al. 1999 pitfall - "
    "takedown-vs-dedup document loss, cancel-vs-upgrade churn). "
    "CIF_k(t) = sum S(s-) d_k/n with the all-cause KM survival "
    "riding an EXCLUSIVE range-bucketed prefix (exactly S(s-)), "
    "9-dp increments in exact DECIMAL, exp/ln evaluated engine-side "
    "on identical 6-dp inputs (the q224 parity rule).",
    tags=("timeseries", "aggregate", "window"),
)
def q262_competing_risks_cif(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from bigdata_kafka_2_spark.operators.timeseries import (
        competing_risks_cif,
    )

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderpriority").alias("pri"),
        F.row_number().over(w).alias("rn"),
    )
    firsts = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
        F.min(F.when(F.col("rn") == 1, F.col("pri"))).alias("p1"),
        F.min(F.when(F.col("rn") == 2, F.col("pri"))).alias("p2"),
    )
    mx = o.agg(F.max(F.to_date("o_orderdate")).alias("md"))
    subj = firsts.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff("d2", "d1")
        )
        .otherwise(F.datediff("md", "d1"))
        .alias("duration"),
        F.when(F.col("d2").isNull(), 0)
        .when(F.col("p2") == F.col("p1"), 1)
        .otherwise(2)
        .alias("event"),
    )
    return competing_risks_cif(subj, "duration", "event")


def _q295_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.operators.mathfn import chi2_sf_sql

    p_expr = chi2_sf_sql("qv", "kv")
    return f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS x,
             CAST(count(*) AS DECIMAL(38,0)) AS v
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
             sum(v) AS s, sum(v * v) AS sxx
      FROM daily
    ),
    lags AS (SELECT unnest([1, 2, 3, 4, 5]) AS k),
    pairs AS (
      SELECT l.k, a.v AS vh, b.v AS vt
      FROM daily a JOIN lags l ON true
        JOIN daily b ON b.x = a.x + l.k
    ),
    per AS (
      SELECT k, CAST(count(*) AS DECIMAL(38,0)) AS nk,
             sum(vh * vt) AS sxy, sum(vh) AS sh, sum(vt) AS st
      FROM pairs GROUP BY k
    ),
    acf_t AS (
      SELECT CAST(k AS INTEGER) AS lag,
           round((CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * CAST(sxy AS DOUBLE)
                  - CAST(n AS DOUBLE) * CAST(s AS DOUBLE)
                    * (CAST(sh AS DOUBLE) + CAST(st AS DOUBLE))
                  + CAST(nk AS DOUBLE) * CAST(s AS DOUBLE)
                    * CAST(s AS DOUBLE))
                 / (CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))),
                 6) AS acf,
           CAST(n AS BIGINT) AS nser
      FROM per, tot
    ),
    agg AS (
      SELECT max(nser) AS n, count(*) AS k,
        sum(CAST(round(acf * acf / (CAST(nser AS DOUBLE) - lag), 9)
                 AS DECIMAL(38,9))) AS t,
        min(acf) AS anull
      FROM acf_t
    ),
    c1 AS (
      SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
          * CAST(t AS DOUBLE) AS qv,
        CAST(k AS INT) AS kv,
        (anull IS NOT NULL) AS ok
      FROM agg
    )
    SELECT n, k,
      round(CASE WHEN ok THEN qv END, 6) AS q_stat,
      round(CASE WHEN ok THEN {p_expr} END, 9) AS p_value
    FROM c1
    """


@register(
    "q295_ljung_box",
    oracle=_q295_oracle,
    description="Ljung-Box portmanteau whiteness test at K=5 "
    "(operators/timeseries.ljung_box; Ljung & Box 1978) over the "
    "daily event-count series - Q = n(n+2) sum acf_j^2/(n-j), df=K, "
    "the 'is this series white noise' gate a residual or metric "
    "stream passes before i.i.d.-based readouts apply (the time-"
    "axis sibling of q265's SRM gate), built DIRECTLY on q227's "
    "exact-integer ACF primitive (same regular-series contract, "
    "same per-lag ratio - the portmanteau TEST is the new content, "
    "not a second ACF); df=5 exercises the odd branch of the shared "
    "chi-square survival; the K-row Q terms round 9 dp into "
    "DECIMAL(38,9) so the bounded sum is order-independent.",
    tags=("timeseries", "aggregate", "join"),
)
def q295_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import ljung_box

    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.datediff(
            F.to_date("ts"), F.lit("1970-01-01").cast("date")
        ).alias("x")
    ).agg(F.count(F.lit(1)).alias("v"))
    return ljung_box(daily, "x", "v", max_lag=5)


def _q296_oracle(sf_dir: str | None = None) -> str:
    import math

    from bigdata_kafka_2_spark.operators.mathfn import erfc_sql

    p_expr = erfc_sql(f"abs(zv) / {math.sqrt(2.0)!r}")
    return f"""
    WITH base AS (
      SELECT ts, event_id, CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL
    ),
    med AS (SELECT quantile_cont(v, 0.5) AS m FROM base),
    signed AS (
      SELECT ts, event_id, (v > m) AS up
      FROM base, med WHERE v <> m
    ),
    ranked AS (
      SELECT up, row_number() OVER (ORDER BY ts, event_id) AS rn
      FROM signed
    ),
    bounds AS (
      SELECT sum(CASE WHEN a.up <> b.up THEN 1 ELSE 0 END) AS sw
      FROM ranked a JOIN ranked b ON b.rn = a.rn + 1
    ),
    counts AS (
      SELECT count(*) AS n,
        sum(CASE WHEN up THEN 1 ELSE 0 END) AS n1,
        sum(CASE WHEN NOT up THEN 1 ELSE 0 END) AS n2
      FROM ranked
    ),
    c1 AS (
      SELECT CAST(n AS BIGINT) AS n, CAST(n1 AS BIGINT) AS n1,
        CAST(n2 AS BIGINT) AS n2, CAST(sw + 1 AS BIGINT) AS runs,
        CAST(n AS DOUBLE) AS nd, CAST(n1 AS DOUBLE) AS n1d,
        CAST(n2 AS DOUBLE) AS n2d, CAST(sw + 1 AS DOUBLE) AS rd
      FROM counts, bounds
    ),
    c2 AS (
      SELECT *, 2.0 * n1d * n2d / nd + 1.0 AS mur,
        2.0 * n1d * n2d * (2.0 * n1d * n2d - nd)
          / (nd * nd * (nd - 1.0)) AS varr
      FROM c1
    ),
    c3 AS (
      SELECT *, (rd - mur) / sqrt(varr) AS zv,
        (n1 > 0 AND n2 > 0 AND varr > 0) AS ok
      FROM c2
    )
    SELECT n, n1 AS n_above, n2 AS n_below, runs,
      round(CASE WHEN ok THEN zv END, 6) AS z,
      round(CASE WHEN ok THEN {p_expr} END, 9) AS p_value
    FROM c3
    """


@register(
    "q296_runs_test",
    oracle=_q296_oracle,
    description="Wald-Wolfowitz runs test around the median "
    "(operators/timeseries.runs_test; Wald & Wolfowitz 1940) of the "
    "event value stream - do above/below-median signs clump (trend, "
    "regime persistence) or alternate (over-correction), the "
    "distribution-free companion of the q227/q295 autocorrelation "
    "diagnostics. Exact interpolated median (the q23 parity), run "
    "boundaries from ONE equi-join on the shifted rank key, exact "
    "integer counts, one double z and the shared erfc survival at "
    "the end.",
    tags=("timeseries", "aggregate", "join"),
)
def q296_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.timeseries import runs_test

    e = read_table(spark, sf_dir, "events")
    return runs_test(e, "ts", "event_id", "value")
