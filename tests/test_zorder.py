"""Z-order layout (operators/zorder.py): Morton-key unit checks + the
pruning-effect property the layout exists for — a selective filter on
EITHER z column touches a small fraction of the files, where a
single-column sort layout reads every file for the other column."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesyslog_spark.operators.zorder import (
    interleave_bits,
    quantize,
    with_z_value,
    write_zordered,
)


def _morton2(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_reference_bit_math(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 1), (12345, 54321)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y", interleave_bits([F.col("x"), F.col("y")]).alias("z")
    ).collect()
    for r in out:
        assert r["z"] == _morton2(r["x"], r["y"]), (r["x"], r["y"])


def test_interleave_validation():
    with pytest.raises(ValueError):
        interleave_bits([])
    with pytest.raises(ValueError):
        interleave_bits([F.lit(1)] * 2, bits=32)  # 64 > 62


def test_quantize_bounds(spark):
    df = spark.range(0, 101).select(F.col("id").alias("v"))
    q = df.select(quantize(F.col("v"), 0, 100, bits=4).alias("q")).collect()
    vals = {r["q"] for r in q}
    assert min(vals) == 0 and max(vals) == 15
    # constant column maps to 0, not a division error
    c = df.select(quantize(F.lit(7), 7, 7, bits=4).alias("q")).head()
    assert c["q"] == 0


def test_z_value_locality(spark):
    # Neighboring points in (x, y) get nearby z keys: the curve's whole
    # point. Check that the z-range of a small xy-tile is much tighter
    # than the global z-range.
    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long")
    zdf = with_z_value(df, ["x", "y"], bits=6)
    full = zdf.agg(F.max("_z") - F.min("_z")).head()[0]
    tile = (
        zdf.filter((F.col("x") < 8) & (F.col("y") < 8))
        .agg(F.max("_z") - F.min("_z")).head()[0]
    )
    assert tile <= full / 16


def _files_read(spark, path, predicate):
    return (
        spark.read.parquet(path)
        .filter(predicate)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


def test_zorder_prunes_both_columns(spark, tmp_path):
    # 64x64 uniform grid, 16 files. Z-layout: a 1/8-range filter on x OR
    # y maps to a contiguous band of the curve -> few files. Linear
    # layout (sort by x only): the same y filter hits EVERY file.
    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long")
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(df, ["x", "y"], zpath, n_files=16, bits=6)
    (
        df.repartitionByRange(16, "x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(lpath)
    )
    n_total = 16
    x_pred = F.col("x") < 8
    y_pred = F.col("y") < 8
    assert _files_read(spark, zpath, x_pred) <= n_total / 2
    assert _files_read(spark, zpath, y_pred) <= n_total / 2
    # the linear layout prunes x but reads everything for y
    assert _files_read(spark, lpath, x_pred) <= n_total / 4
    assert _files_read(spark, lpath, y_pred) >= n_total * 3 // 4
    # same rows survive in both layouts
    assert (
        spark.read.parquet(zpath).filter(y_pred).count()
        == spark.read.parquet(lpath).filter(y_pred).count()
        == 64 * 8
    )


def test_zorder_cli_roundtrip(spark, tmp_path, capsys):
    from kinesyslog_spark.cli import main

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    (
        spark.createDataFrame(
            [(x, y) for x in range(32) for y in range(32)], "x long, y long"
        ).write.parquet(src)
    )
    rc = main(["zorder", src, dst, "--cols", "x,y", "--files", "4", "--bits", "5"])
    assert rc == 0
    assert "z-ordered" in capsys.readouterr().out
    out = spark.read.parquet(dst)
    assert out.count() == 32 * 32 and set(out.columns) == {"x", "y"}
