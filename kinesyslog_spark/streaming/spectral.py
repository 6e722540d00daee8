"""W32 — continuous spectral monitor (streaming q166).

Embedding vectors arrive continuously (an ingestion feed, an encoder
shadow deployment) and the corpus' top principal component / explained
variance must be readable after every epoch. The mergeable state is the
MOMENT SET — count, first moments sum x_i, second moments sum x_i*x_j —
(1 + D + D*D) decimal rows that SUM-merge exactly across shards and
epochs; the covariance C = M2/n - mu*mu^T is reconstructed from the
merged state on the driver (D=64: a 4 KB matrix) and the top component
is extracted there by power iteration run to convergence — per-epoch
driver work is O(D^2), independent of stream volume.

This is the streaming complement of q166's data-pass power iteration:
the batch query never materializes C because at 100 TB the DATA passes
dominate; the monitor never re-reads data because the MOMENTS are a
sufficient statistic — the classic batch/streaming duality for second-
order analytics.

Per-batch work: two posexplodes + one (i, j) hash aggregate (D^2 groups,
map-side combined). Exact decimal sums make the fold shuffle-order- and
merge-order-proof; state is bounded at 1 + D + D^2 rows forever.

State/exactly-once: the W27/W29/W31 epoch-snapshot pattern — SUM-merged
state means retried epochs merge into the snapshot strictly BEFORE
their id, and pruning keeps that predecessor.

Parity (tests/test_streaming_spectral.py): after N epochs the state
must equal the batch moment set of everything ingested EXACTLY
(decimal equality), and the reported eigval must match numpy's exact
top eigenvalue of the ingested corpus within power-iteration tolerance.

Reference parity: none; §2c extension (q166's streaming twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesyslog_spark.streaming.epoch_state import (
    latest_state_epoch,
    prune_state_epochs,
)

MOM_SCHEMA = "i int, j int, s decimal(30,12)"
# row kinds: (i>=0, j>=0) second moment; (i>=0, j=-1) first moment;
# (-1, -1) count.
PI_ROUNDS = 64  # driver-side power iteration on the D x D matrix


def batch_moments(batch: DataFrame, emb_col: str = "emb") -> DataFrame:
    """(i, j, s) moment rows for one batch of vectors."""
    d1 = batch.select(
        F.col(emb_col).alias("_e"), F.posexplode(emb_col).alias("i", "xi")
    )
    sec = (
        d1.select("i", "xi", F.posexplode("_e").alias("j", "xj"))
        .groupBy("i", "j")
        .agg(
            F.sum((F.col("xi") * F.col("xj")).cast("decimal(30,12)"))
            .alias("s")
        )
    )
    fst = d1.groupBy("i").agg(
        F.sum(F.col("xi").cast("decimal(30,12)")).alias("s")
    ).select("i", F.lit(-1).alias("j"), "s")
    cnt = batch.agg(
        F.count(F.lit(1)).cast("decimal(30,12)").alias("s")
    ).select(F.lit(-1).alias("i"), F.lit(-1).alias("j"), "s")
    return sec.select("i", "j", "s").unionByName(fst).unionByName(cnt)


def merge_moments(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("i", "j")
        .agg(F.sum("s").cast("decimal(30,12)").alias("s"))
    )


def eigen_from_moments(rows) -> dict:
    """Driver-side: top eigenpair of C = M2/n - mu mu^T from collected
    moment rows, by power iteration to PI_ROUNDS (pure Python, O(D^2)
    per round)."""
    import math

    sec: dict[tuple[int, int], float] = {}
    fst: dict[int, float] = {}
    n = 0.0
    for r in rows:
        if r.i == -1:
            n = float(r.s)
        elif r.j == -1:
            fst[r.i] = float(r.s)
        else:
            sec[(r.i, r.j)] = float(r.s)
    d = max(fst) + 1 if fst else 0
    if not d or n <= 0:
        return {"n": int(n), "dim": 0, "eigval": 0.0, "evr": 0.0, "v": []}
    mu = [fst[i] / n for i in range(d)]
    C = [
        [sec[(i, j)] / n - mu[i] * mu[j] for j in range(d)]
        for i in range(d)
    ]
    v = [1.0 / math.sqrt(d)] * d
    u = v
    for _ in range(PI_ROUNDS):
        u = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        nr = math.sqrt(sum(x * x for x in u))
        if nr == 0:
            break
        v = [x / nr for x in u]
    eigval = math.sqrt(sum(x * x for x in u))
    tvar = sum(C[i][i] for i in range(d))
    return {
        "n": int(n),
        "dim": d,
        "eigval": eigval,
        "evr": eigval / tvar if tvar else 0.0,
        "v": v,
    }


def make_fold(out_dir: str, state_dir: str, emb_col: str = "emb"):
    """foreachBatch body, exposed for direct retry-contract tests."""

    def fold(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        new = batch_moments(batch, emb_col)
        latest = latest_state_epoch(spark, state_dir, before=int(epoch_id))
        if latest is not None:
            cum = merge_moments(
                spark.read.parquet(f"{state_dir}/epoch={latest}"), new
            )
        else:
            cum = new
        rows = cum.collect()  # 1 + D + D^2 rows — driver-size by design
        snap = spark.createDataFrame(rows, MOM_SCHEMA)
        snap.coalesce(1).write.mode("overwrite").parquet(
            f"{state_dir}/epoch={epoch_id}"
        )
        prune_state_epochs(
            spark, state_dir,
            keep=latest if latest is not None else int(epoch_id),
        )
        e = eigen_from_moments(rows)
        head = e["v"][:8] + [0.0] * (8 - min(8, len(e["v"])))
        spark.createDataFrame(
            [(
                int(epoch_id), e["n"], e["dim"],
                float(e["eigval"]), float(e["evr"]),
                *[float(x) for x in head],
            )],
            "epoch long, n long, dim int, eigval double, evr double, "
            + ", ".join(f"v{j} double" for j in range(8)),
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/epoch_id={epoch_id}"
        )

    return fold


def streaming_spectral(
    vectors: DataFrame, out_dir: str, state_dir: str, checkpoint_dir: str,
    emb_col: str = "emb", trigger: str = "1 second",
) -> StreamingQuery:
    """Continuously fold vectors into the moment state; the running top
    principal component lands under out_dir/epoch_id=N."""
    return (
        vectors.writeStream.foreachBatch(
            make_fold(out_dir, state_dir, emb_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger)
        .start()
    )
