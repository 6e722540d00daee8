r"""Q39 — GELF v1.1 document parsing (reference P5 + F4 'json' branch).

Semantics (message.py:81-88): `ujson.loads(message).get('timestamp',
recv_ts)` — a numeric epoch-seconds `timestamp` field becomes the event
time; a missing field OR invalid JSON falls back to receive time.

Fixture: GELF JSON documents synthesized from `events` by identical
string concatenation in both engines (no JSON serializer involved, so
key order/whitespace can't drift): every 5th document omits `timestamp`,
every 7th is truncated to invalid JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import load_table

_DOC_SQL = """
    SELECT event_id AS seq,
           ts + INTERVAL 2 SECOND AS recv_ts,
           CASE WHEN event_id % 7 = 0 THEN substring(doc, 1, 10) ELSE doc END AS raw
    FROM (
      SELECT event_id, ts,
        concat(
          '{"version":"1.1","host":"host-', CAST(user_id AS VARCHAR),
          '","short_message":"', event_type, ' event ', CAST(event_id AS VARCHAR), '"',
          CASE WHEN event_id % 5 = 0 THEN ''
               ELSE concat(',"timestamp":', CAST(epoch_ms(ts) // 1000 AS VARCHAR)) END,
          ',"level":', CAST(event_id % 8 AS VARCHAR), '}') AS doc
      FROM events
    )
"""

_Q39_ORACLE = f"""
WITH gelf AS ({_DOC_SQL}),
checked AS (
  -- DuckDB json_extract_* raises on malformed JSON; Spark's
  -- get_json_object fails soft. Normalize with a validity guard.
  SELECT seq, recv_ts,
         CASE WHEN json_valid(raw) THEN raw ELSE NULL END AS raw
  FROM gelf
)
SELECT seq,
  json_extract_string(raw, '$.host') AS host,
  json_extract_string(raw, '$.short_message') AS short_message,
  CAST(json_extract_string(raw, '$.level') AS INTEGER) AS level,
  CAST(coalesce(
    CAST(json_extract_string(raw, '$.timestamp') AS BIGINT) * 1000,
    epoch_ms(recv_ts)) AS BIGINT) AS ts_ms
FROM checked
ORDER BY seq
"""


@query("q39_gelf_parse", oracle=_Q39_ORACLE)
def q39_gelf_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"version":"1.1","host":"host-'), F.col("user_id").cast("string"),
        F.lit('","short_message":"'), F.col("event_type"),
        F.lit(" event "), F.col("event_id").cast("string"), F.lit('"'),
        F.when(F.col("event_id") % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit(',"timestamp":'), F.unix_timestamp("ts").cast("string"))
        ),
        F.lit(',"level":'), (F.col("event_id") % 8).cast("string"), F.lit("}"),
    )
    gelf = ev.select(
        F.col("event_id").alias("seq"),
        (F.col("ts") + F.expr("INTERVAL 2 SECONDS")).alias("recv_ts"),
        F.when(F.col("event_id") % 7 == 0, F.substring(doc, 1, 10)).otherwise(doc).alias("raw"),
    )
    # P5: get_json_object fails soft (NULL) on invalid JSON -> recv_ts.
    return gelf.select(
        "seq",
        F.get_json_object("raw", "$.host").alias("host"),
        F.get_json_object("raw", "$.short_message").alias("short_message"),
        F.get_json_object("raw", "$.level").cast("int").alias("level"),
        F.coalesce(
            F.get_json_object("raw", "$.timestamp").cast("long") * 1000,
            F.unix_millis("recv_ts"),
        ).alias("ts_ms"),
    ).orderBy("seq")
