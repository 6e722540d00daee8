"""SparkSession factory.

Configured for determinism (UTC session timezone — reference stamps event
times as epoch millis, message.py:60) and for scale-minded defaults:
AQE on (runtime re-planning, skew-join splitting), Arrow on (every pandas
UDF crosses via Arrow batches, replacing the reference's shared-memory ring
buffer IPC, ringbuffer.py:88-306), shuffle partitions sized to cores for
local mode (a real cluster deployment would size to 2-3x total cores or
rely on AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "kinesyslog_spark", cpus: str | int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the session.

    Settings chosen for the 100 TB posture:
    - AQE enabled: coalesces small shuffle partitions, splits skewed ones,
      converts sort-merge joins to broadcast at runtime when a side turns
      out small.
    - Arrow enabled with a large batch size: the few pandas UDFs we use
      (gzip record packing, minhash) amortize per-batch overhead.
    - parquet timestamps read as TIMESTAMP_LTZ with session UTC so epoch
      extraction matches a DuckDB oracle reading the same files.
    """
    cpus = str(cpus or DEFAULT_CPUS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Default 10 MB is conservative for modern executor memory; 64 MB
        # lets AQE convert mid-size dimension/intermediate sides (e.g. a
        # persisted shingle table at bench scale) to broadcast at runtime.
        # Adaptive: a genuinely large side is still shuffled.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # read parquet isAdjustedToUTC=false timestamps as TimestampType
        # (session tz = UTC) rather than NTZ, so unix_millis() works
        # uniformly and matches DuckDB's naive-as-UTC interpretation.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # events.parquet stores TIMESTAMP(NANOS) which parquet-mr can't map
        # to a Spark type; read as epoch-nanos long and convert in tables.py.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
