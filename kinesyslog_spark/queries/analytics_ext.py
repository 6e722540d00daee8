"""Round-3 analytics extensions — q87 (deterministic weighted sampling),
q88 (DAU/MAU stickiness — distinct-over-sliding-window).

q87 — weighted sample via PRIORITY SAMPLING (Duffield-Lund-Thorup
shape): each doc gets priority = h / w where h is a deterministic
integer hash (md5 of doc_id) and w its weight (token count + 1); the K
smallest priorities form a without-replacement sample with inclusion
probability increasing in w. Deliberately NO pow()/ln(): classic A-Res
keys u^(1/w) need transcendental functions whose last-ulp results vary
between libm implementations (Java Math.pow vs DuckDB's C pow) — the
cross-engine hash contract forbids that. h and w are exact integers and
h/w is a single correctly-rounded IEEE division, bit-identical on both
engines (SURVEY §2b determinism rules, same argument as q44's md5
uniform).

q88 — DAU/MAU stickiness: per active day, distinct daily users over
distinct trailing-30-day users. The Spark plan uses the scale-safe
explode formulation (each (user, day) activity row contributes itself
to the 30 window days it supports → distinct → count), which is one
bounded 30x row expansion + two hash aggregates — no per-day self-join
of the corpus. The ORACLE uses the direct BETWEEN-join + COUNT
DISTINCT formulation: two different algorithms, hash-identical result.

Scale notes: q87 is map-only + a global top-K (TakeOrdered); q88's
expansion is exactly 30x the per-user-day activity table (already
deduped, far smaller than raw events), shuffled once on the window
day with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.text import TOKEN_RE, md5_int60
from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relational import _t
from kinesyslog_spark.tables import hot_tokens

# ---------------------------------------------------------------------------
# Q87 — deterministic weighted sample (priority sampling)
# ---------------------------------------------------------------------------

SAMPLE_K = 50
_H_MOD = 1_000_000_000  # h stays an exact integer-valued double


_Q87_ORACLE = f"""
    WITH scored AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '{TOKEN_RE}')) + 1 AS w,
             CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
               % {_H_MOD} + 1 AS h
      FROM documents
    )
    SELECT doc_id, CAST(w AS BIGINT) AS w,
           FLOOR(h / CAST(w AS DOUBLE) * 10000 + 0.5) / 10000 AS priority
    FROM scored
    ORDER BY h / CAST(w AS DOUBLE), doc_id
    LIMIT {SAMPLE_K}
    """


@query("q87_weighted_sample", oracle=_Q87_ORACLE)
def q87_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = hot_tokens(spark, sf_dir).select(
        "doc_id",
        (F.size("toks") + 1).cast("long").alias("w"),
        (md5_int60(F.col("doc_id").cast("string")) % _H_MOD + 1).alias("h"),
    )
    prio = F.col("h") / F.col("w").cast("double")
    return (
        scored.select(
            "doc_id",
            "w",
            (F.floor(prio * 10000 + F.lit(0.5)) / 10000).alias("priority"),
            prio.alias("_p"),
        )
        .orderBy("_p", "doc_id")
        .limit(SAMPLE_K)
        .drop("_p")
    )


# ---------------------------------------------------------------------------
# Q88 — DAU/MAU stickiness (distinct over a 30-day sliding window)
# ---------------------------------------------------------------------------

MAU_DAYS = 30


_Q88_ORACLE = f"""
    WITH ud AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ), dau AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ), mau AS (
      SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
      FROM (SELECT DISTINCT day FROM ud) d
      JOIN ud u ON u.day <= d.day
               AND u.day >= d.day - INTERVAL {MAU_DAYS - 1} DAY
      GROUP BY d.day
    )
    SELECT epoch_ms(d.day) AS day_ms, dau, mau,
           FLOOR(dau / CAST(mau AS DOUBLE) * 10000 + 0.5) / 10000 AS stickiness
    FROM dau d JOIN mau m ON d.day = m.day
    ORDER BY day_ms
    """


@query("q88_dau_mau", oracle=_Q88_ORACLE)
def q88_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    # explode formulation: an activity on day D supports windows ending
    # on D .. D+29; count distinct users per window day, keep only days
    # that actually have activity (inner join with dau).
    windows = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr(f"INTERVAL {MAU_DAYS - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    ).distinct()
    mau = windows.groupBy("day").agg(F.count(F.lit(1)).alias("mau"))
    return (
        dau.join(mau, "day")
        .select(
            F.unix_millis(F.col("day").cast("timestamp")).alias("day_ms"),
            "dau",
            "mau",
            (
                F.floor(F.col("dau") / F.col("mau").cast("double") * 10000 + F.lit(0.5))
                / 10000
            ).alias("stickiness"),
        )
        .orderBy("day_ms")
    )
