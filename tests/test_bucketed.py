"""Bucketed tables: the fact-fact join and bucket-key aggregation read
co-located buckets and run with ZERO shuffle exchanges, and results match
the unbucketed plan exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesyslog_spark.plans.checks import PlanFacts, formatted_plan
from kinesyslog_spark.sinks.bucketed import write_bucketed
from kinesyslog_spark.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = write_bucketed(
        load_table(spark, sf_dir, "orders"), "tb_orders", ["o_orderkey"], 4,
        path=str(base / "orders"),
    )
    lineitem = write_bucketed(
        load_table(spark, sf_dir, "lineitem"), "tb_lineitem", ["l_orderkey"], 4,
        path=str(base / "lineitem"),
    )
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS tb_orders")
    spark.sql("DROP TABLE IF EXISTS tb_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _joined(orders, lineitem):
    return (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )


def test_bucketed_join_has_no_exchange(spark, bucketed, no_broadcast):
    orders, lineitem = bucketed
    facts = PlanFacts(formatted_plan(_joined(orders, lineitem)))
    assert facts.exchange_count == 0, facts.text
    assert facts.shuffle_join_count >= 1  # still a co-located SMJ/SHJ


def test_unbucketed_twin_does_shuffle(spark, sf_dir, no_broadcast):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    facts = PlanFacts(formatted_plan(_joined(orders, lineitem)))
    assert facts.exchange_count >= 2  # both sides shuffle on orderkey


def test_bucketed_results_match_unbucketed(spark, sf_dir, bucketed):
    orders, lineitem = bucketed
    got = {(r["o_orderkey"], float(r["qty"])) for r in _joined(orders, lineitem).collect()}
    want = {
        (r["o_orderkey"], float(r["qty"]))
        for r in _joined(
            load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_bucket_key_aggregation_has_no_exchange(spark, bucketed):
    orders, _ = bucketed
    agg = orders.groupBy("o_orderkey").agg(F.count("*").alias("n"))
    facts = PlanFacts(formatted_plan(agg))
    assert facts.exchange_count == 0, facts.text
