"""Q73 — time-series gap filling: dense hour spine + LOCF + linear
interpolation (the TimescaleDB `time_bucket_gapfill`/`locf`/
`interpolate` workload, re-expressed as Catalyst windows).

Hourly `SUM(value)` per event_type over `events` is sparse (not every
(type, hour) has events). The query densifies it:

- spine: every hour from the global min to max bucket × every
  event_type — built in-plan via `sequence(min, max, INTERVAL 1 HOUR)`
  + explode on a 1-row aggregate (no driver round-trip, no collect);
- `locf`: last observed value at or before the hour
  (`last(value) IGNORE NULLS` over an unbounded-preceding frame);
- `lin`: linear interpolation between the surrounding observations
  (the IGNORE-NULLS first/last window pair gives both anchors; edges
  where either anchor is missing fall back to LOCF/NULL semantics).

Determinism: anchor values are exact decimal sums cast to double; the
interpolation weights are integer epoch-hour differences. The final
4-dp quantization is an EXPLICIT `floor(x*1e4 + 0.5)/1e4` on BOTH
engines: Spark's `round(double)` goes through the shortest-decimal
repr while DuckDB rounds the binary value, and interpolated doubles
land on .00005 boundaries often enough to diverge by one ulp — the
shared floor expression is bit-identical by construction.

Scale: one shuffle for the hourly aggregate, one window partition by
event_type ordered by hour — the spine is |types| x |hours|, tiny
relative to the event corpus; the aggregate combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import load_table

_Q73_ORACLE = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (
  SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly
),
spine AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM hourly) t
  CROSS JOIN (
    SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
  ) g
),
dense AS (
  SELECT s.event_type, s.h, hourly.v
  FROM spine s LEFT JOIN hourly USING (event_type, h)
),
anchored AS (
  SELECT event_type, h, v,
    last_value(v IGNORE NULLS) OVER w_prev AS prev_v,
    last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER w_prev AS prev_h,
    first_value(v IGNORE NULLS) OVER w_next AS next_v,
    first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER w_next AS next_h
  FROM dense
  WINDOW
    w_prev AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       epoch_ms(h) AS hour_ms,
       CAST(v IS NOT NULL AS INT) AS observed,
       FLOOR(prev_v * 10000 + 0.5) / 10000 AS locf,
       FLOOR((CASE
         WHEN v IS NOT NULL THEN v
         WHEN prev_v IS NULL OR next_v IS NULL THEN prev_v
         ELSE prev_v + (next_v - prev_v)
              * (CAST(epoch(h) - epoch(prev_h) AS DOUBLE)
                 / CAST(epoch(next_h) - epoch(prev_h) AS DOUBLE))
       END) * 10000 + 0.5) / 10000 AS filled
FROM anchored
ORDER BY event_type, hour_ms
"""


@query("q73_gapfill_interpolate", oracle=_Q73_ORACLE)
def q73_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))

    bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    hours = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    spine = hourly.select("event_type").distinct().crossJoin(F.broadcast(hours))
    dense = spine.join(hourly, ["event_type", "h"], "left")

    w_prev = (
        W.partitionBy("event_type").orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("event_type").orderBy("h")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    anchored = dense.select(
        "event_type",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(obs_h, ignorenulls=True).over(w_prev).alias("prev_h"),
        F.first("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(obs_h, ignorenulls=True).over(w_next).alias("next_h"),
    )
    frac = (
        (F.unix_timestamp("h") - F.unix_timestamp("prev_h")).cast("double")
        / (F.unix_timestamp("next_h") - F.unix_timestamp("prev_h")).cast("double")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("prev_v").isNull() | F.col("next_v").isNull(), F.col("prev_v")
        )
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    q4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return anchored.select(
        "event_type",
        F.unix_millis(F.col("h").cast("timestamp")).alias("hour_ms"),
        F.col("v").isNotNull().cast("int").alias("observed"),
        q4(F.col("prev_v")).alias("locf"),
        q4(filled).alias("filled"),
    ).orderBy("event_type", "hour_ms")


# ---------------------------------------------------------------------------
# Q74 — cohort retention (weekly cohorts x week offset)
# ---------------------------------------------------------------------------
# The standard product-analytics retention matrix: users are cohorted by
# the week of their first event; each later active week increments the
# (cohort, offset) cell. Distinct-user counting per cell, retention as
# the share of the cohort still active. Two shuffles total: the per-user
# min (map-side combining) and the cell distinct-count; the cohort-size
# join is cohort-cardinality (broadcast at scale).

_Q74_ORACLE = """
WITH firstw AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_w FROM events
  GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_w,
         CAST(date_diff('day', f.cohort_w, date_trunc('week', e.ts)) // 7 AS INT)
           AS week_offset
  FROM events e JOIN firstw f ON e.user_id = f.user_id
),
cells AS (
  SELECT cohort_w, week_offset, COUNT(*) AS n_users
  FROM activity GROUP BY cohort_w, week_offset
),
sizes AS (
  SELECT cohort_w, COUNT(*) AS cohort_size FROM firstw GROUP BY cohort_w
)
SELECT epoch_ms(c.cohort_w) AS cohort_ms, c.week_offset, c.n_users,
       s.cohort_size,
       FLOOR(c.n_users / CAST(s.cohort_size AS DOUBLE) * 10000 + 0.5) / 10000
         AS retention
FROM cells c JOIN sizes s ON c.cohort_w = s.cohort_w
ORDER BY cohort_ms, week_offset
"""


@query("q74_cohort_retention", oracle=_Q74_ORACLE)
def q74_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firstw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_w")
    )
    activity = (
        ev.join(firstw, "user_id")
        .select(
            "user_id",
            "cohort_w",
            (
                F.datediff(F.date_trunc("week", "ts"), F.col("cohort_w"))
                .cast("int") / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    cells = activity.groupBy("cohort_w", "week_offset").agg(
        F.count("*").alias("n_users")
    )
    sizes = firstw.groupBy("cohort_w").agg(F.count("*").alias("cohort_size"))
    return (
        cells.join(F.broadcast(sizes), "cohort_w")
        .select(
            F.unix_millis(F.col("cohort_w").cast("timestamp")).alias("cohort_ms"),
            "week_offset",
            "n_users",
            "cohort_size",
            # Shared floor quantization, not round(): see module header —
            # Spark round(double) and DuckDB ROUND disagree by 1 ulp on
            # .00005 boundaries (q73 lesson).
            (
                F.floor(
                    F.col("n_users") / F.col("cohort_size").cast("double")
                    * 10000 + F.lit(0.5)
                ) / 10000
            ).alias("retention"),
        )
        .orderBy("cohort_ms", "week_offset")
    )


# ---------------------------------------------------------------------------
# Q75 — session path analysis (top event-type sequences)
# ---------------------------------------------------------------------------
# Sequence-mining-lite over q10's sessions: each (user, session) yields
# its ordered path of event types (first PATH_LEN steps, '>'-joined);
# the query ranks the most common paths. The per-session collect is
# bounded by the path prefix; the rank is a TakeOrderedAndProject.
# Order inside a session is fully determined by (ts, event_id) — the
# same tie-break q10 pins.

PATH_LEN = 5
PATH_TOPK = 20

_Q75_ORACLE = f"""
WITH s AS (
  SELECT event_id, user_id, ts, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM (
    SELECT event_id, user_id, ts, event_type,
           CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                     > 1800000 THEN 1
                WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                ELSE 0 END AS is_new
    FROM events
  )
),
paths AS (
  SELECT user_id, session_id,
         array_to_string(
           list_transform(
             (array_agg({{'t': ts, 'e': event_id, 'v': event_type}}
                        ORDER BY ts, event_id))[1:{PATH_LEN}],
             x -> x.v),
           '>') AS path
  FROM s GROUP BY user_id, session_id
)
SELECT path, COUNT(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOPK}
"""


@query("q75_session_paths", oracle=_Q75_ORACLE)
def q75_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    order_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(W.unboundedPreceding, W.currentRow)
    lag_ms = F.unix_millis(F.lag("ts").over(order_w))
    is_new = (
        F.when(lag_ms.isNull(), 1)
        .when(F.unix_millis("ts") - lag_ms > 30 * 60 * 1000, 1)
        .otherwise(0)
    )
    sessions = ev.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(run_w)
    )
    paths = (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.array_join(
                F.transform(
                    F.slice("evs", 1, PATH_LEN), lambda x: x["event_type"]
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOPK)
    )


# ---------------------------------------------------------------------------
# Q76 — event-type Markov transition matrix
# ---------------------------------------------------------------------------
# First-order Markov chain estimation over per-user event sequences
# ((ts, event_id)-ordered, the q10/q75 tie-break): transition counts via
# LEAD, row-normalized probabilities. The estimation workload behind
# next-event prediction and anomaly scoring; integer counts + one
# rounded division keep it exactly reproducible.

_Q76_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
trans AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
),
totals AS (
  SELECT from_type, SUM(n) AS tot FROM trans GROUP BY from_type
)
SELECT t.from_type, t.to_type, t.n,
       FLOOR(t.n / CAST(s.tot AS DOUBLE) * 10000 + 0.5) / 10000 AS p
FROM trans t JOIN totals s ON t.from_type = s.from_type
ORDER BY t.from_type, t.to_type
"""


@query("q76_markov_transitions", oracle=_Q76_ORACLE)
def q76_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").alias("n"))
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        trans.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            # Shared floor quantization (q73 lesson), not round().
            (
                F.floor(
                    F.col("n") / F.col("tot").cast("double") * 10000
                    + F.lit(0.5)
                ) / 10000
            ).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )
