"""W32: continuous spectral monitor (streaming/spectral.py) — exact
moment-state parity with the batch moment set, eigenpair accuracy vs
numpy on the ingested corpus, and the SUM-merge predecessor retry
contract."""

from __future__ import annotations

import math
import random

from kinesyslog_spark.streaming.spectral import (
    batch_moments,
    eigen_from_moments,
    make_fold,
)

_D = 6


def _vecs(seed: int, n: int) -> list[list[float]]:
    rnd = random.Random(seed)
    out = []
    for _ in range(n):
        # anisotropic: dimension 0 dominates -> clear top component
        base = rnd.gauss(0, 3.0)
        out.append(
            [base] + [rnd.gauss(0, 0.5) for _ in range(_D - 1)]
        )
    return out


def _df(spark, vecs):
    return spark.createDataFrame(
        [(v,) for v in vecs], "emb array<double>"
    )


def _state(spark, state_dir, epoch):
    return {
        (r.i, r.j): r.s
        for r in spark.read.parquet(
            f"{state_dir}/epoch={epoch}"
        ).collect()
    }


def test_fold_state_equals_batch_moments(spark, tmp_path):
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    fold = make_fold(out, state)
    b1, b2 = _vecs(1, 40), _vecs(2, 30)
    fold(_df(spark, b1), 0)
    fold(_df(spark, b2), 1)
    got = _state(spark, state, 1)
    expect = {
        (r.i, r.j): r.s
        for r in batch_moments(_df(spark, b1 + b2)).collect()
    }
    assert got == expect  # decimal-exact merge
    # report sanity
    rep = spark.read.parquet(f"{out}/epoch_id=1").collect()[0]
    assert (rep.n, rep.dim) == (70, _D)


def test_eigen_matches_numpy(spark, tmp_path):
    import numpy as np

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    fold = make_fold(out, state)
    b1, b2 = _vecs(3, 60), _vecs(4, 60)
    fold(_df(spark, b1), 0)
    fold(_df(spark, b2), 1)
    rep = spark.read.parquet(f"{out}/epoch_id=1").collect()[0]
    X = np.array(b1 + b2)
    Xc = X - X.mean(axis=0)
    C = Xc.T @ Xc / len(X)
    w, V = np.linalg.eigh(C)
    assert abs(rep.eigval - w[-1]) < 1e-6 * max(1.0, w[-1])
    # eigenvector match up to sign
    got = np.array([getattr(rep, f"v{j}") for j in range(_D)])
    top = V[:, -1]
    assert min(
        np.linalg.norm(got - top), np.linalg.norm(got + top)
    ) < 1e-4
    assert 0.5 < rep.evr <= 1.0  # dim-0 dominance


def test_fold_retry_reads_predecessor(spark, tmp_path):
    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    fold = make_fold(out, state)
    b1, b2 = _vecs(5, 25), _vecs(6, 25)
    fold(_df(spark, b1), 0)
    fold(_df(spark, b2), 1)
    before = _state(spark, state, 1)
    rep_before = tuple(
        spark.read.parquet(f"{out}/epoch_id=1").collect()[0]
    )
    fold(_df(spark, b2), 1)  # simulated foreachBatch retry
    assert _state(spark, state, 1) == before
    assert tuple(
        spark.read.parquet(f"{out}/epoch_id=1").collect()[0]
    ) == rep_before


def test_eigen_from_moments_empty_and_single():
    assert eigen_from_moments([])["n"] == 0
    # single repeated vector -> zero variance, zero eigval

    class R:
        def __init__(self, i, j, s):
            self.i, self.j, self.s = i, j, s

    rows = [R(-1, -1, 2), R(0, -1, 4), R(1, -1, 0),
            R(0, 0, 8), R(0, 1, 0), R(1, 0, 0), R(1, 1, 0)]
    e = eigen_from_moments(rows)
    assert e["n"] == 2 and e["dim"] == 2
    assert abs(e["eigval"]) < 1e-12
