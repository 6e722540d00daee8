"""Driver-literal DataFrames as LocalRelations (OPTIMIZATION_r12).

``spark.createDataFrame(list_of_tuples)`` plans as ``Scan ExistingRDD``
via applySchemaToPythonRDD: the rows are pickled into an RDD that
parallelizes into defaultParallelism slices, so EVERY action over the
frame schedules a full-width (32-task here) stage per scan plus
full-width exchanges around any join against it — measured 1.5-7 s per
action for a SIX-ROW join on this box, pure scheduling overhead. The
same rows expressed as a parameterized ``VALUES`` query plan as
``LocalTableScan``: no RDD, no scan stage, one-partition exchanges that
AQE folds away, and a broadcast-eligible build side. Parameter binding
keeps values EXACT — doubles bind as typed literals (no string
round-trip), arbitrary strings/NULL/NaN need no escaping.

Use for the small driver-computed frames every query family builds
(probability spines, collected histogram/pick rows, per-table report
rows, BPE merge tables). NOT for corpus-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Growth guard: VALUES text + bound-parameter count scale with rows; a
# frame past this is not "driver-literal" any more — keep the RDD path.
MAX_VALUES_ROWS = 8192

_TYPE_ALIASES = {
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INT",
    "integer": "INT",
    "short": "SMALLINT",
    "smallint": "SMALLINT",
    "byte": "TINYINT",
    "tinyint": "TINYINT",
    "string": "STRING",
    "double": "DOUBLE",
    "float": "FLOAT",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
    "binary": "BINARY",
}


def local_frame(
    spark: SparkSession, rows: list[tuple], schema: str
) -> DataFrame:
    """A DataFrame of literal ``rows`` with the simple DDL ``schema``
    ("name type, ..."), planned as a LocalTableScan.

    Falls back to ``spark.createDataFrame`` for empty input, very large
    input (> MAX_VALUES_ROWS), or schemas with parameterized/nested
    types (decimal(p,s), array<...>, struct<...>), which the VALUES
    rendering does not model."""
    if (
        not rows
        or len(rows) > MAX_VALUES_ROWS
        or "(" in schema
        or "<" in schema
    ):
        return spark.createDataFrame(rows, schema)
    names: list[str] = []
    types: list[str] = []
    for field in schema.split(","):
        parts = field.split()
        if len(parts) != 2 or parts[1].lower() not in _TYPE_ALIASES:
            return spark.createDataFrame(rows, schema)
        names.append(parts[0])
        types.append(_TYPE_ALIASES[parts[1].lower()])
    ncols = len(names)
    sel = ", ".join(
        f"CAST(c{i} AS {t}) AS {n}" for i, (n, t) in enumerate(zip(names, types))
    )
    # NAMED parameters only: positional '?' markers inside an inline
    # table bind OUT OF TEXT ORDER in Spark 4 (observed: a 2x3 VALUES
    # bound its 6 args permuted across cells), silently scrambling
    # values when the column types happen to coerce. Named markers bind
    # by name and cannot be reordered.
    cols = ", ".join(f"c{i}" for i in range(ncols))
    row_sqls = []
    args: dict[str, object] = {}
    for ri, r in enumerate(rows):
        if len(r) != ncols:
            raise ValueError(
                f"row arity {len(r)} != schema arity {ncols}: {r!r}"
            )
        markers = []
        for ci, v in enumerate(r):
            key = f"v{ri}_{ci}"
            markers.append(f":{key}")
            # bind plain Python scalars: numpy ints/floats leak out of
            # collected/Arrow rows and do not bind as SQL parameters
            # (numpy float64 subclasses float — check .item() FIRST)
            if v is not None and type(v).__module__ == "numpy":
                args[key] = v.item()
            else:
                args[key] = v
        row_sqls.append("(" + ", ".join(markers) + ")")
    text = (
        f"SELECT {sel} FROM (VALUES "
        + ", ".join(row_sqls)
        + f") AS t({cols})"
    )
    return spark.sql(text, args=args)
