"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and values
(order-insensitive, exact after the ROUND(,4) determinism rules).

Usage:
    python tools/check_oracle.py [--vanilla] [sf_dir] [query_name ...]

--vanilla runs on a DEFAULT-CONFIG SparkSession (what the correctness driver
uses) instead of the tuned engine session, so builder-session configs can
never mask a driver-side failure (round-1 lesson: 9 red rows from exactly
that).
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

from kinesyslog_spark.queries import ORACLE, QUERIES  # noqa: E402
from kinesyslog_spark.session import get_spark  # noqa: E402
from kinesyslog_spark.tables import TABLE_NAMES  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _arrow_type_ok(spark_type: str, at) -> bool:
    """Is the DuckDB arrow output type hash-compatible with the Spark type?

    The driver exports both sides via Arrow before value-hashing, so a DuckDB
    HUGEINT (decimal128(38,0)) next to a Spark BIGINT hash-mismatches even when
    every value is equal (round-2 q10 lesson). This reproduces that gate.
    """
    import pyarrow as pa

    t = pa.types
    if spark_type in ("bigint", "int", "smallint", "tinyint"):
        return t.is_integer(at)
    if spark_type in ("double", "float"):
        return t.is_floating(at)
    if spark_type == "string":
        return t.is_string(at) or t.is_large_string(at)
    if spark_type == "timestamp":
        return t.is_timestamp(at)
    if spark_type == "date":
        return t.is_date(at)
    if spark_type == "boolean":
        return t.is_boolean(at)
    if spark_type.startswith("decimal"):
        return str(at).replace("decimal128", "decimal").replace(" ", "") == spark_type.replace(" ", "")
    if spark_type.startswith("array"):
        return t.is_list(at) or t.is_large_list(at)
    if spark_type == "binary":
        return t.is_binary(at) or t.is_large_binary(at)
    return True


def type_problems(sdf, arrow_schema) -> list[str]:
    stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out = []
    for field in arrow_schema:
        st = stypes.get(field.name)
        if st is not None and not _arrow_type_ok(st, field.type):
            out.append(f"type[{field.name}] spark={st} duck_arrow={field.type}")
    return out


def norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return f"{type(v).__name__}:{v}"


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def check(name: str, spark, con, sf_dir: str) -> tuple[bool, str]:
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if name not in ORACLE:
        return True, f"rows-only ({len(srows)} rows, no oracle)"
    ores = con.execute(ORACLE[name])
    ocols = [d[0] for d in ores.description]
    otable = ores.fetch_arrow_table()
    # Values are still compared via fetchall (python-native, tolerant of
    # HUGEINT→int); the arrow schema check above is what mirrors the driver.
    orows = con.execute(ORACLE[name]).fetchall()
    problems = type_problems(sdf, otable.schema)
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
    if not problems:
        s_n, o_n = norm_rows(scols, srows), norm_rows(ocols, orows)
        if s_n != o_n:
            diffs = [
                (a, b) for a, b in zip(s_n, o_n) if a != b
            ][:3]
            problems.append(f"{sum(a != b for a, b in zip(s_n, o_n))} value diffs, first: {diffs}")
    if problems:
        return False, "; ".join(problems)
    return True, f"OK ({len(srows)} rows)"


def vanilla_spark():
    """The driver's session: master + UTC tz only, NO engine configs."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check-vanilla")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def main():
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    args = [a for a in args if a != "--vanilla"]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.001"
    names = [a for a in args if not a.startswith("/")] or list(QUERIES)
    spark = vanilla_spark() if vanilla else get_spark("oracle-check")
    con = duck_con(sf_dir)
    failed = []
    for name in names:
        try:
            ok, msg = check(name, spark, con, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {str(e)[:500]}"
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: {msg}", flush=True)
        if not ok:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
