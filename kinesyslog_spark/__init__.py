"""kinesyslog_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of brandond/kinesyslog, rebuilt Spark-first.

The reference (/root/reference) is a syslog/GELF -> Kinesis Firehose relay:
an unbounded byte-stream source, framing/reassembly, per-message parsing,
keyed batching, and an at-least-once spool sink. Here that pipeline is
re-expressed as Catalyst column expressions (parsing), stateful structured
streaming (reassembly), and foreachBatch sinks (record building/spooling) —
plus a full relational query layer and LLM-data-pipeline operators
(dedup, similarity search, text analysis) designed for 100 TB scale.

Layout:
  session.py    — SparkSession factory (UTC, Arrow, AQE)
  tables.py     — parquet table loaders for the driver testdata
  functions/    — pure column-expression libraries (syslog, gelf, text, similarity)
  operators/    — composite operators (framing, dedup, ann, records, asof)
  sources/      — spool reader/writer, file-replay sources
  streaming/    — structured-streaming jobs (windows, stateful reassembly, relay)
  queries/      — the declared query inventory (SURVEY.md §2b) + oracle SQL
"""

__version__ = "0.1.0"
