r"""Relay-pipeline queries Q19, Q24, Q25 (SURVEY.md §2b).

The driver testdata has no raw-syslog or chunked-GELF tables, so these
queries synthesize their fixtures deterministically from `events` /
`documents` inside the query itself — identically in Spark and in the
DuckDB oracle — then run the pipeline operators over them:

- Q19: chunk reassembly as a relational op (mirrors F6, gelf.py:11-50):
  split every document into 40-char chunks, then reassemble via
  sort_array(collect_list(...)) and prove the round trip with an md5.
- Q24: the full P2-P8 parse pipeline (message.py) over synthesized syslog
  lines of all four header shapes (RFC5424 / RFC3164 / prio-only / bare).
- Q25: G1 grouping + envelope summary over Q24's events (sink.py:141-209),
  hashed deterministically instead of JSON-byte comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.functions.syslog import parse_syslog, parse_syslog_sql
from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import hot_table, load_table

CHUNK = 40


# ---------------------------------------------------------------------------
# Q19 — chunk reassembly (batch form of F6: groupBy(id) + sort_array)
# ---------------------------------------------------------------------------

@query(
    "q19_chunk_reassembly",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id,
             unnest(range(CAST(ceil(length(text) / {CHUNK}.0) AS BIGINT))) AS seq,
             text
      FROM documents
    ), sliced AS (
      SELECT doc_id, seq, substr(text, CAST(seq * {CHUNK} + 1 AS INTEGER), {CHUNK}) AS payload
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           md5(string_agg(payload, '' ORDER BY seq)) AS payload_md5
    FROM sliced
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q19_chunk_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = hot_table(spark, sf_dir, "documents")
    sliced = (
        docs.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.ceil(F.length("text") / CHUNK).cast("long") - 1)
            ).alias("seq"),
            "text",
        )
        .select(
            "doc_id",
            "seq",
            F.expr(f"substring(text, CAST(seq * {CHUNK} + 1 AS INT), {CHUNK})").alias("payload"),
        )
    )
    # F6's batch twin: order-insensitive collect + sort by seq + join
    # (gelf.py:31-46 emits when all chunks arrive; here every group is
    # complete so the completeness filter is count == max(seq)+1 == count).
    return (
        sliced.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("seq", "payload"))),
                        lambda x: x["payload"],
                    ),
                    "",
                )
            ).alias("payload_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Synthesized syslog lines (shared by Q24/Q25). Four header shapes keyed by
# event_id % 4 — exercising every branch of the P2 two-tier regex and the
# P6 rewrite path.
# ---------------------------------------------------------------------------

_SYNTH_SQL = """
    SELECT
      event_id AS seq,
      concat('10.0.0.', CAST(user_id AS VARCHAR)) AS source,
      CAST(CASE WHEN event_id % 2 = 0 THEN 514 ELSE 6514 END AS INTEGER) AS dest,
      ts + INTERVAL 2 SECOND AS recv_ts,
      CASE CAST(event_id % 4 AS INTEGER)
        WHEN 0 THEN concat(
          '<', CAST(event_id % 190 + 1 AS VARCHAR), '>1 ',
          strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), '+00:00',
          ' host-', CAST(user_id AS VARCHAR), ' app - - - ',
          'evt=', CAST(event_id AS VARCHAR), ' type=', event_type)
        WHEN 1 THEN concat(
          '<', CAST(event_id % 190 + 1 AS VARCHAR), '>',
          strftime(ts, '%b %d %H:%M:%S'),
          ' host-', CAST(user_id AS VARCHAR), ' ',
          'evt=', CAST(event_id AS VARCHAR), ' type=', event_type)
        WHEN 2 THEN concat('<13>evt=', CAST(event_id AS VARCHAR), ' type=', event_type)
        ELSE concat('evt=', CAST(event_id AS VARCHAR), ' type=', event_type)
      END AS raw
    FROM events
"""


def _synth_syslog(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    body = F.concat(
        F.lit("evt="), F.col("event_id").cast("string"),
        F.lit(" type="), F.col("event_type"),
    )
    prio = (F.col("event_id") % 190 + 1).cast("string")
    iso = F.concat(
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), F.lit("+00:00")
    )
    r3164 = F.date_format("ts", "MMM dd HH:mm:ss")
    host = F.concat(F.lit("host-"), F.col("user_id").cast("string"))
    kind = (F.col("event_id") % 4).cast("int")
    raw = (
        F.when(kind == 0, F.concat(F.lit("<"), prio, F.lit(">1 "), iso, F.lit(" "), host, F.lit(" app - - - "), body))
        .when(kind == 1, F.concat(F.lit("<"), prio, F.lit(">"), r3164, F.lit(" "), host, F.lit(" "), body))
        .when(kind == 2, F.concat(F.lit("<13>"), body))
        .otherwise(body)
    )
    return ev.select(
        F.col("event_id").alias("seq"),
        F.concat(F.lit("10.0.0."), F.col("user_id").cast("string")).alias("source"),
        F.when(F.col("event_id") % 2 == 0, 514).otherwise(6514).cast("int").alias("dest"),
        (F.col("ts") + F.expr("INTERVAL 2 SECONDS")).alias("recv_ts"),
        raw.alias("raw"),
    )


# ---------------------------------------------------------------------------
# Q24 — end-to-end parse pipeline (P2-P8) over the synthesized lines
# ---------------------------------------------------------------------------

@query(
    "q24_relay_parse",
    oracle=f"""
    WITH syslog_lines AS ({_SYNTH_SQL}),
    parsed AS ({parse_syslog_sql("syslog_lines")})
    SELECT id, seq, source, dest, prio, hostname, ts_ms, message
    FROM parsed
    ORDER BY seq
    """,
)
def q24_relay_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _synth_syslog(spark, sf_dir)
    return parse_syslog(lines).select(
        "id", "seq", "source", "dest", "prio", "hostname", "ts_ms", "message"
    ).orderBy("seq")


# ---------------------------------------------------------------------------
# Q25 — grouped record envelopes (G1/G4 relational twin: the reference keys
# events by (source-IP, dest-port), sink.py:145, and derives
# logGroup '<prefix>/<format>/<port>' + logStream '<source>', sink.py:162,204)
# ---------------------------------------------------------------------------

@query(
    "q25_relay_envelopes",
    oracle=f"""
    WITH syslog_lines AS ({_SYNTH_SQL}),
    parsed AS ({parse_syslog_sql("syslog_lines")})
    SELECT
      concat('kinesyslog/syslog/', CAST(dest AS VARCHAR)) AS log_group,
      source AS log_stream,
      COUNT(*) AS n_events,
      MIN(ts_ms) AS first_ts_ms,
      MAX(ts_ms) AS last_ts_ms,
      CAST(SUM(length(message)) AS BIGINT) AS total_chars,
      md5(string_agg(id, ',' ORDER BY id)) AS ids_md5
    FROM parsed
    GROUP BY 1, 2
    ORDER BY log_group, log_stream
    """,
)
def q25_relay_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = parse_syslog(_synth_syslog(spark, sf_dir))
    return (
        events.groupBy(
            F.concat(F.lit("kinesyslog/syslog/"), F.col("dest").cast("string")).alias("log_group"),
            F.col("source").alias("log_stream"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_ms").alias("first_ts_ms"),
            F.max("ts_ms").alias("last_ts_ms"),
            F.sum(F.length("message")).cast("long").alias("total_chars"),
            F.md5(F.array_join(F.sort_array(F.collect_list("id")), ",")).alias("ids_md5"),
        )
        .orderBy("log_group", "log_stream")
    )
