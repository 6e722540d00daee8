"""UDAF (grouped-agg pandas) + UDTF surface tests (SURVEY §2b)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_gmean_udaf(spark):
    from kinesyslog_spark.functions.udf_surface import gmean_udaf

    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 5.0)], "k string, x double"
    )
    got = {
        r["k"]: r["g"]
        for r in df.groupBy("k").agg(gmean_udaf("x").alias("g")).collect()
    }
    assert math.isclose(got["a"], 4.0, rel_tol=1e-9)  # sqrt(2*8)
    assert math.isclose(got["b"], 5.0, rel_tol=1e-9)


def test_frame_lines_udtf(spark):
    from kinesyslog_spark.functions.udf_surface import FrameLines

    spark.udtf.register("frame_lines", FrameLines)
    df = spark.createDataFrame(
        [(0, "one\ntwo\x00three\r"), (1, "\n\nonly")], "conn long, raw string"
    )
    df.createOrReplaceTempView("raw_streams")
    rows = spark.sql(
        "SELECT conn, f.msg_seq, f.message "
        "FROM raw_streams, LATERAL frame_lines(raw) AS f ORDER BY conn, f.msg_seq"
    ).collect()
    got = [(r["conn"], r["msg_seq"], r["message"]) for r in rows]
    assert got == [(0, 0, "one"), (0, 1, "two"), (0, 2, "three"), (1, 0, "only")]


def test_frame_lines_udtf_truncates(spark):
    from kinesyslog_spark.constants import MAX_MESSAGE_LENGTH
    from kinesyslog_spark.functions.udf_surface import FrameLines

    spark.udtf.register("frame_lines_t", FrameLines)
    long = "x" * (MAX_MESSAGE_LENGTH + 100)
    df = spark.createDataFrame([(long,)], "raw string")
    df.createOrReplaceTempView("raw_long")
    (row,) = spark.sql(
        "SELECT f.message FROM raw_long, LATERAL frame_lines_t(raw) AS f"
    ).collect()
    assert len(row["message"]) == MAX_MESSAGE_LENGTH
