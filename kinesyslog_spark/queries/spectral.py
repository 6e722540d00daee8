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

Convergence-tolerance early stop: MEASURED AND REFUTED (round 10, the
q174 pattern). An early stop is exactly output-preserving only at a
quantized-v fixpoint (v_k == v_{k-1} at 1e-9 makes every later round
recompute identical values, so the fixed-round oracle still matches) —
but on this corpus the spectrum is near-degenerate (synthetic
embeddings have no dominant direction) and the probe measured the max
component delta still ~2e-2 after EIGHT rounds at sf0.1 AND sf1: the
fixpoint never arrives, so any dynamic round count below PI_ITERS
changes the output and breaks the exact-spectrum pin. Cost decomposes
as rounds x one O(N*D) corpus pass (measured 1.4 s/round at sf0.1,
3.7 s at sf1, ~25 s at sf10) — the wall scales with rounds x corpus
and the rounds dial is semantic, not free (SCALING_R10.md).

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

from kinesyslog_spark.operators.localframe import local_frame
from kinesyslog_spark.queries import query
from kinesyslog_spark.queries.ann import EMB_DIM
from kinesyslog_spark.queries.mlops import _floor_q
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
    # total variance from the SAME pass's second moments:
    # tv = sum_j (S2_j/n - mu_j^2), left-associated (the Spark driver
    # replicates this exact association).
    q_sums = ",\n      ".join(
        f"SUM(CAST(emb[{j + 1}] * emb[{j + 1}] AS DECIMAL(30,12))) AS q{j}"
        for j in range(EMB_DIM)
    )
    tv = " + ".join(
        f"(CAST(ms.q{j} AS DOUBLE) / ms.n - mu.m{j} * mu.m{j})"
        for j in range(EMB_DIM)
    )
    vout = ", ".join(
        f"FLOOR(v.v{j} * 1000000 + 0.5) / 1000000 AS v{j}" for j in range(8)
    )
    return f"""
WITH data AS MATERIALIZED (
  SELECT embedding::DOUBLE[] AS emb FROM embeddings
),
ms AS MATERIALIZED (
  SELECT {mu_sums},
      {q_sums},
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
fin AS (
  SELECT CAST(mu.n AS BIGINT) AS n,
         FLOOR(sqrt({eig}) * 1000000 + 0.5) / 1000000 AS eigval,
         FLOOR(({tv}) * 1000000 + 0.5) / 1000000 AS total_var
  FROM {last_u} u CROSS JOIN ms CROSS JOIN mu
)
SELECT f.n, f.eigval, f.total_var,
       FLOOR(f.eigval / f.total_var * 1000000 + 0.5) / 1000000 AS evr,
       {vout}
FROM fin f CROSS JOIN v{PI_ITERS} v
"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(emb double[]) — read from the session-wide hot_vectors artifact
    (its `emb` is the same float→double element cast, so values are
    identical), instead of a private cast+persist per call: the old
    per-call `data.persist()` leaked one corpus-sized block set per
    q166 invocation and re-paid the interpreted cast pass the vector
    family had already done."""
    from kinesyslog_spark.tables import hot_vectors

    return hot_vectors(spark, sf_dir).select("emb")


def _dot_lit(vec: list[float], mu: list[float]) -> Column:
    """(x - mu) . v as an explicit left-associated 64-term expression.
    (Reference form; the hot loop uses _dot_arrays — identical values.)"""
    e = (F.col("emb")[0] - F.lit(mu[0])) * F.lit(vec[0])
    for j in range(1, EMB_DIM):
        e = e + (F.col("emb")[j] - F.lit(mu[j])) * F.lit(vec[j])
    return e


def _dot_arrays(vec: list[float], mu: list[float]) -> Column:
    """(x - mu) . v with the round parameters as ARRAY literals +
    zip_with/aggregate HOFs. Bit-identical to _dot_lit: aggregate
    folds left-associated over the same per-dimension IEEE ops in the
    same order (0.0 + t0 == t0 for doubles away from -0.0, and the
    final 1e-9 floor-quantization absorbs the signed zero).

    Why this form: _dot_lit inlines 64 PRIMITIVE literals into the
    generated Java source, so every power-iteration round (new v, new
    mu) compiles a fresh whole-stage method — measured 1.5 s/round at
    sf0.1 on a CACHED 2k-row input, i.e. the rounds were paying
    javac, not compute. Array literals constant-fold into one
    reference-array object, the source is round-invariant, and the
    codegen cache hits from round 2 on. (The earlier broadcast
    parameter-FRAME + element_at-chain variant measured worse — the
    chain still codegen'd per round and added a join; see the module
    note. This one keeps zero joins and stabilizes the source.)"""
    mu_a = F.array(*[F.lit(float(x)) for x in mu])
    v_a = F.array(*[F.lit(float(x)) for x in vec])
    prods = F.zip_with(
        F.zip_with(F.col("emb"), mu_a, lambda x, m: x - m),
        v_a,
        lambda c, w: c * w,
    )
    return F.aggregate(prods, F.lit(0.0), lambda a, b: a + b)


@query("q166_power_iteration_pc", oracle=_q166_oracle())
def q166_power_iteration_pc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # All corpus aggregates run NARROW (posexplode -> groupBy dimension
    # -> decimal sums): a 64-wide decimal aggregate generates a huge
    # codegen method (measured 2-4 s of compile per pass at sf0.1);
    # the narrow shape is one tiny hash aggregate over D groups with
    # map-side combine, and decimal sums are grouping-shape-free, so
    # the oracle's wide form produces the identical values.
    import math

    data = _emb(spark, sf_dir)  # cache-backed via hot_vectors
    n = data.count()
    ms = (
        data.select(F.posexplode("emb").alias("j", "x"))
        .groupBy("j")
        .agg(
            F.sum(F.col("x").cast("decimal(30,12)")).alias("s1"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(30,12)"))
            .alias("s2"),
        )
        .collect()
    )
    s1 = [0.0] * EMB_DIM
    s2 = [0.0] * EMB_DIM
    for r in ms:
        s1[r.j], s2[r.j] = float(r.s1), float(r.s2)
    mu = [_floor_q(s1[j] / n, 9) for j in range(EMB_DIM)]
    v = [_V0] * EMB_DIM
    u = [0.0] * EMB_DIM
    for _ in range(PI_ITERS):
        mu_arr = F.array(*[F.lit(x) for x in mu])
        rows = data.select(
            _dot_arrays(v, mu).alias("s"),
            F.posexplode("emb").alias("j", "x"),
        )
        g = (
            rows.select(
                "j",
                (
                    F.col("s")
                    * (F.col("x") - F.element_at(mu_arr, F.col("j") + 1))
                ).cast("decimal(30,12)").alias("t"),
            )
            .groupBy("j")
            .agg(F.sum("t").alias("g"))
            .collect()
        )
        for r in g:
            u[r.j] = float(r.g) / n
        norm = u[0] * u[0]
        for j in range(1, EMB_DIM):
            norm = norm + u[j] * u[j]
        nr = math.sqrt(norm)
        v = [_floor_q(u[j] / nr, 9) for j in range(EMB_DIM)]
    eig2 = u[0] * u[0]
    for j in range(1, EMB_DIM):
        eig2 = eig2 + u[j] * u[j]
    eigval = _floor_q(math.sqrt(eig2), 6)
    tvd = s2[0] / n - mu[0] * mu[0]
    for j in range(1, EMB_DIM):
        tvd = tvd + (s2[j] / n - mu[j] * mu[j])
    total_var = _floor_q(tvd, 6)
    return local_frame(
        spark,
        [(
            int(n), eigval, total_var,
            _floor_q(eigval / total_var, 6),
            *[_floor_q(v[j], 6) for j in range(8)],
        )],
        "n long, eigval double, total_var double, evr double, "
        + ", ".join(f"v{j} double" for j in range(8)),
    )
