"""local_frame: LocalTableScan planning + value parity vs createDataFrame."""

import math

import pytest

from kinesyslog_spark.operators.localframe import local_frame


@pytest.fixture(scope="module")
def spark():
    from kinesyslog_spark.session import get_spark

    return get_spark("test-localframe")


def test_plans_as_local_table_scan(spark):
    df = local_frame(spark, [(0.5, 1)], "p double, k long")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_value_parity_with_createdataframe(spark):
    rows = [
        (0.1 + 0.2, 7, "it's a \\ test\nline", True),
        (float("nan"), None, None, False),
        (-0.0, -(2**62), "", None),
        (float("inf"), 0, "ünïcode🙂", True),
    ]
    schema = "x double, k long, s string, b boolean"
    got = local_frame(spark, rows, schema).collect()
    ref = spark.createDataFrame(rows, schema).collect()
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        for c in ("k", "s", "b"):
            assert g[c] == r[c]
        if r["x"] is not None and math.isnan(r["x"]):
            assert math.isnan(g["x"])
        else:
            # bit-exact doubles (incl. signed zero)
            assert math.copysign(1.0, g["x"]) == math.copysign(1.0, r["x"])
            assert g["x"] == r["x"]
    assert [f.dataType for f in local_frame(spark, rows, schema).schema] == [
        f.dataType for f in spark.createDataFrame(rows, schema).schema
    ]


def test_fallback_paths(spark):
    # empty input, oversized input markers, and nested types fall back
    df = local_frame(spark, [], "x double")
    assert df.count() == 0
    from decimal import Decimal

    df2 = local_frame(spark, [(Decimal("1.50"),)], "x decimal(4,2)")
    assert str(df2.schema["x"].dataType) == "DecimalType(4,2)"


def test_numpy_scalars_bind(spark):
    np = pytest.importorskip("numpy")
    df = local_frame(
        spark, [(np.int64(5), np.float64(2.5))], "k long, x double"
    )
    row = df.collect()[0]
    assert row["k"] == 5 and row["x"] == 2.5
