"""Q166 — top principal component of the embedding corpus by POWER
ITERATION (spectral embedding analytics).

The eigenvector problem every embedding pipeline eventually meets
(PCA whitening, spectral outlier detection, ABTT/"all-but-the-top"
post-processing strips exactly this component). The covariance matrix
is NEVER materialized: each iteration uses the identity

    C v = (1/n) * sum_x (x - mu) ((x - mu) . v)

so one pass computes the per-row scalar s = (x - mu) . v and
accumulates s * (x_j - mu_j) into D decimal sums — a single
map-side-combined aggregate per iteration with O(D) driver traffic
(the q161/MLlib GD posture; D = 64 here). PI_ITERS fixed iterations
from the deterministic start v0 = 1/8 (unit norm at D = 64).

Determinism contract: dot products and norms are written as explicit
64-term left-associated expressions on BOTH engines (never list_sum —
DuckDB may sum lists pairwise), cross-row sums are exact
DECIMAL(30,12) additions, the mean and each normalized eigenvector
component are re-quantized (1e-9) per round, and sqrt/divide are
correctly-rounded IEEE ops — so Spark and DuckDB walk bit-identical
vector trajectories, no transcendental in sight.

Output: corpus size, top eigenvalue (via ||C v|| of the final
iteration), total variance, explained-variance ratio, and the first 8
eigenvector components (the whole vector is driver-held; 8 keep the
result row readable).

Reference parity: none (embedding-analytics family next to ANN/PQ;
composes with q77 k-means and q136 label centroids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.ann import EMB_DIM
from kinesyslog_spark.queries.mlops import _floor_q, _q6
from kinesyslog_spark.tables import hot_table

PI_ITERS = 4
_V0 = 0.125  # 1/8: unit norm at D=64, exactly representable


def _q166_oracle() -> str:
    mu_sums = ",\n      ".join(
        f"SUM(CAST(emb[{j + 1}] AS DECIMAL(30,12))) AS s{j}"
        for j in range(EMB_DIM)
    )
    mu_cols = ",\n      ".join(
        f"FLOOR(CAST(ms.s{j} AS DOUBLE) / ms.n * 1000000000 + 0.5) "
        f"/ 1000000000 AS m{j}"
        for j in range(EMB_DIM)
    )
    v0 = ", ".join(f"CAST({_V0} AS DOUBLE) AS v{j}" for j in range(EMB_DIM))

    def iter_cte(k: int) -> str:
        prev = f"v{k}"
        sv = " + ".join(
            f"(e.emb[{j + 1}] - mu.m{j}) * {prev}.v{j}"
            for j in range(EMB_DIM)
        )
        gs = ",\n        ".join(
            f"SUM(CAST(r.s * (r.emb[{j + 1}] - mu.m{j}) AS DECIMAL(30,12)))"
            f" AS g{j}"
            for j in range(EMB_DIM)
        )
        un = ",\n        ".join(
            f"CAST(g.g{j} AS DOUBLE) / g.n AS u{j}"
            for j in range(EMB_DIM)
        )
        norm = " + ".join(f"u.u{j} * u.u{j}" for j in range(EMB_DIM))
        vn = ",\n        ".join(
            f"FLOOR(u.u{j} / sqrt({norm}) * 1000000000 + 0.5) "
            f"/ 1000000000 AS v{j}"
            for j in range(EMB_DIM)
        )
        return f"""
rows{k} AS (
  SELECT e.emb, ({sv}) AS s FROM data e CROSS JOIN {prev} CROSS JOIN mu
),
g{k} AS (
  SELECT {gs},
        CAST(COUNT(*) AS BIGINT) AS n
  FROM rows{k} r CROSS JOIN mu
),
u{k} AS (
  SELECT {un}, g.n AS n FROM g{k} g
),
v{k + 1} AS (
  SELECT {vn}, u.n AS n FROM u{k} u
)"""

    chain = ",".join(iter_cte(k) for k in range(PI_ITERS))
    last_u = f"u{PI_ITERS - 1}"
    eig = " + ".join(f"u.u{j} * u.u{j}" for j in range(EMB_DIM))
    tv = " + ".join(
        f"CAST(t.t{j} AS DOUBLE)" for j in range(EMB_DIM)
    )
    tv_sums = ",\n      ".join(
        f"SUM(CAST((e.emb[{j + 1}] - mu.m{j}) * (e.emb[{j + 1}] - mu.m{j})"
        f" AS DECIMAL(30,12))) AS t{j}"
        for j in range(EMB_DIM)
    )
    vout = ", ".join(
        f"FLOOR(v.v{j} * 1000000 + 0.5) / 1000000 AS v{j}" for j in range(8)
    )
    return f"""
WITH data AS MATERIALIZED (
  SELECT embedding::DOUBLE[] AS emb FROM embeddings
),
ms AS (
  SELECT {mu_sums},
      CAST(COUNT(*) AS BIGINT) AS n
  FROM data
),
mu AS MATERIALIZED (
  SELECT {mu_cols},
      ms.n AS n
  FROM ms
),
v0 AS (SELECT {v0}),
{chain},
tvar AS (
  SELECT {tv_sums}
  FROM data e CROSS JOIN mu
),
fin AS (
  SELECT CAST(mu.n AS BIGINT) AS n,
         FLOOR(sqrt({eig}) * 1000000 + 0.5) / 1000000 AS eigval,
         FLOOR(({tv}) / mu.n * 1000000 + 0.5) / 1000000 AS total_var
  FROM {last_u} u CROSS JOIN tvar t CROSS JOIN mu
)
SELECT f.n, f.eigval, f.total_var,
       FLOOR(f.eigval / f.total_var * 1000000 + 0.5) / 1000000 AS evr,
       {vout}
FROM fin f CROSS JOIN v{PI_ITERS} v
"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hot_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("emb")
    )


def _dot_lit(vec: list[float], mu: list[float]) -> Column:
    """(x - mu) . v as an explicit left-associated 64-term expression."""
    e = (F.col("emb")[0] - F.lit(mu[0])) * F.lit(vec[0])
    for j in range(1, EMB_DIM):
        e = e + (F.col("emb")[j] - F.lit(mu[j])) * F.lit(vec[j])
    return e


@query("q166_power_iteration_pc", oracle=_q166_oracle())
def q166_power_iteration_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    data = _emb(spark, sf_dir).persist(StorageLevel.MEMORY_ONLY)
    ms = data.agg(
        *[
            F.sum(F.col("emb")[j].cast("decimal(30,12)")).alias(f"s{j}")
            for j in range(EMB_DIM)
        ],
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n = ms["n"]
    mu = [_floor_q(float(ms[f"s{j}"]) / n, 9) for j in range(EMB_DIM)]
    v = [_V0] * EMB_DIM
    u = None
    for _ in range(PI_ITERS):
        rows = data.select("emb", _dot_lit(v, mu).alias("s"))
        g = rows.agg(
            *[
                F.sum(
                    (F.col("s") * (F.col("emb")[j] - F.lit(mu[j])))
                    .cast("decimal(30,12)")
                ).alias(f"g{j}")
                for j in range(EMB_DIM)
            ]
        ).collect()[0]
        u = [float(g[f"g{j}"]) / n for j in range(EMB_DIM)]
        norm = u[0] * u[0]
        for j in range(1, EMB_DIM):
            norm = norm + u[j] * u[j]
        import math

        nr = math.sqrt(norm)
        v = [_floor_q(u[j] / nr, 9) for j in range(EMB_DIM)]
    eig2 = u[0] * u[0]
    for j in range(1, EMB_DIM):
        eig2 = eig2 + u[j] * u[j]
    import math

    eigval = _floor_q(math.sqrt(eig2), 6)
    t = data.agg(
        *[
            F.sum(
                ((F.col("emb")[j] - F.lit(mu[j]))
                 * (F.col("emb")[j] - F.lit(mu[j])))
                .cast("decimal(30,12)")
            ).alias(f"t{j}")
            for j in range(EMB_DIM)
        ]
    ).collect()[0]
    tv = float(t["t0"])
    tvs = [float(t[f"t{j}"]) for j in range(EMB_DIM)]
    tvd = tvs[0]
    for j in range(1, EMB_DIM):
        tvd = tvd + tvs[j]
    total_var = _floor_q(tvd / n, 6)
    return spark.createDataFrame(
        [(
            int(n), eigval, total_var,
            _floor_q(eigval / total_var, 6),
            *[_floor_q(v[j], 6) for j in range(8)],
        )],
        "n long, eigval double, total_var double, evr double, "
        + ", ".join(f"v{j} double" for j in range(8)),
    )
