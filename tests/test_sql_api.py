"""SQL-API parity: the engine's second query surface.

Every query is primarily a DataFrame plan, but the engine also exposes
plain SQL via `register_views` + `spark.sql`. The oracle strings for the
ANSI-portable subset of the inventory run VERBATIM on both DuckDB and
Spark SQL — pinned here by comparing `spark.sql(oracle)` against the
DataFrame implementation row-for-row. (The remaining oracles use DuckDB
dialect — epoch_ms, list_*, string_split — and are exercised only
through the DuckDB side of the correctness gate.)
"""

from __future__ import annotations

import pytest

from kinesyslog_spark.queries import ORACLE, QUERIES
from kinesyslog_spark.tables import register_views

ANSI_PORTABLE = [
    "q01_scan_filter",
    "q02_pricing_summary",
    "q04_customers_per_region",
    "q05_customers_with_orders",
    "q06_customers_without_orders",
    "q07_customer_order_counts",
    "q08_top2_orders_per_customer",
    "q09_running_revenue",
    "q11_top_parts",
    "q12_set_ops",
    "q13_rollup_revenue",
    "q14_distinct_parts_per_flag",
    "q48_cube_revenue",
]


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark


@pytest.mark.parametrize("name", ANSI_PORTABLE)
def test_sql_api_matches_dataframe_plan(views, sf_dir, name):
    spark = views
    via_sql = {tuple(map(str, r)) for r in spark.sql(ORACLE[name]).collect()}
    via_df = {tuple(map(str, r)) for r in QUERIES[name](spark, sf_dir).collect()}
    assert via_sql == via_df, f"{name}: SQL surface diverged from DataFrame plan"
