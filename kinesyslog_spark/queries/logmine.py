"""Q137 — log template mining over the parsed relay stream.

The Drain/LogMine-style operator a syslog pipeline runs right after
parse: collapse each message to its TEMPLATE by masking the variable
fields (digit runs → '#'), then aggregate per template — message
count, distinct sources, priority spread, and a deterministic example.
Templates are what alerting dedupes on and what anomaly detection
baselines per-template rates against; the reference relay
(kinesyslog/message.py) parses and forwards these exact messages but
has no mining step — this is the analytics the Spark engine adds on
top of P2-P6's parse.

Masking is a single regexp_replace on an already-JVM-parsed column —
map-side, then one hash-aggregate shuffle on the template key.
Template keys are low-cardinality by construction (that is the point
of mining), so the aggregate output is tiny; a skewed hot template is
just a hot group in a map-side-combined agg — no join, no risk.
`[0-9]+` behaves identically in Java regex and RE2, so the oracle
replays the masking bit-for-bit.

Reference parity: north-star extension over the reference's message
path (kinesyslog/message.py parse; no template analytics there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.functions.syslog import parse_syslog, parse_syslog_sql
from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.relay import _SYNTH_SQL, _synth_syslog

_MASK = "'[0-9]+', '#'"

_Q137_ORACLE = f"""
WITH syslog_lines AS ({_SYNTH_SQL}),
parsed AS ({parse_syslog_sql("syslog_lines")}),
masked AS (
  SELECT regexp_replace(message, {_MASK}, 'g') AS template,
         source, prio, message
  FROM parsed
)
SELECT template,
       CAST(COUNT(*) AS BIGINT) AS n_msgs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(MIN(prio) AS BIGINT) AS min_prio,
       CAST(MAX(prio) AS BIGINT) AS max_prio,
       MIN(message) AS example
FROM masked
GROUP BY template
ORDER BY n_msgs DESC, template
"""


@query("q137_log_templates", oracle=_Q137_ORACLE)
def q137_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _synth_syslog(spark, sf_dir)
    parsed = parse_syslog(lines)
    masked = parsed.select(
        F.regexp_replace("message", "[0-9]+", "#").alias("template"),
        "source", "prio", "message",
    )
    # A string MIN in the aggregate buffer would demote the whole agg
    # to SortAggregate; keep the main agg numeric-only (hash) and pick
    # the example via a rank<=1 window (WindowGroupLimit: per-partition
    # top-1 before the exchange), joined back on the tiny template key.
    from pyspark.sql.window import Window

    agg = masked.groupBy("template").agg(
        F.count("*").alias("n_msgs"),
        F.count_distinct("source").alias("n_sources"),
        F.min("prio").cast("long").alias("min_prio"),
        F.max("prio").cast("long").alias("max_prio"),
    )
    w = Window.partitionBy("template").orderBy("message")
    example = (
        masked.select("template", "message")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("template", F.col("message").alias("example"))
    )
    return (
        agg.join(example, "template")
        .orderBy(F.col("n_msgs").desc(), "template")
    )
