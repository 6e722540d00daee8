"""W33: continuous projection-hash image near-dup (streaming/projdup.py)
— frozen-artifact hash family, W20's bucket machinery. The replay is
refereed by the BATCH q175 result: with artifacts trained on the same
corpus the frozen transform reproduces the batch hashes exactly, so
the streaming pair set must equal q175's (ordered by arrival)."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F


def test_frozen_artifacts_reproduce_batch_hashes(spark, sf_dir):
    """Self-reference training: ranks/medians from the frozen artifact
    path must equal the batch q175 transform on the same corpus, so
    the stateless stage's signatures match the batch hash family."""
    import numpy as np

    from kinesyslog_spark.queries.imagehash import hot_dct_coeffs, _proj_matrix
    from kinesyslog_spark.streaming.projdup import (
        frozen_projection_artifacts,
    )

    art = frozen_projection_artifacts(spark, sf_dir)
    pdf = hot_dct_coeffs(spark, sf_dir).toPandas()
    C = np.stack(pdf["cv"].to_numpy()).astype(np.int64)
    n = art["n_ref"]
    assert n == len(C)
    # searchsorted min-rank == the batch histogram min-rank for every
    # in-reference value
    i = 7  # spot-check one coefficient fully
    col = C[:, i]
    order = np.sort(col)
    rk = np.searchsorted(order, col, side="left") + 1
    assert (np.searchsorted(art["sorted_cols"][i], col, side="left") + 1
            == rk).all()
    # medians reproduce the batch lower-median convention
    proj = (2 * np.stack([
        np.searchsorted(art["sorted_cols"][j], C[:, j], side="left") + 1
        for j in range(256)
    ], axis=1) - (n + 1)) @ _proj_matrix().T
    k = (n + 1) // 2
    assert (np.sort(proj, axis=0)[k - 1] == art["medians"]).all()


@pytest.mark.slow
def test_streaming_projdup_replay(spark, tmp_path, sf_dir):
    """Two-epoch replay over real rendered payloads: the streaming pair
    set must equal batch q175's pair set, each pair oriented by arrival
    (earlier epoch first; same batch -> smaller img_id is dup_of)."""
    from kinesyslog_spark.queries import QUERIES
    from kinesyslog_spark.queries.imagehash import render_png_batches
    from kinesyslog_spark.streaming.projdup import (
        frozen_projection_artifacts,
        streaming_projdup,
    )
    from kinesyslog_spark.tables import load_table

    art = frozen_projection_artifacts(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = docs.mapInPandas(
        render_png_batches, schema="doc_id long, payload binary"
    ).withColumnRenamed("doc_id", "img_id")

    in_dir = str(tmp_path / "imgs")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    for e in range(2):
        payloads.filter(F.pmod("img_id", F.lit(2)) == e).coalesce(1).write \
            .mode("append").parquet(in_dir)
        src = spark.readStream.schema("img_id long, payload binary").parquet(
            in_dir
        )
        q = (
            # cap lifted so the referee comparison is exact (the default
            # FIFO cap is a documented recall trade, not under test here)
            streaming_projdup(src, art, max_bucket_state=100000)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()

    got = {
        (r["img_id"], r["dup_of"], r["hamming"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = QUERIES["q175_image_projhash_neardup"](spark, sf_dir).collect()
    assert batch, "corpus must contain projection-hash near-dups"

    def arrival(doc: int) -> tuple[int, int]:
        return (doc % 2, doc)  # (epoch, within-batch img_id order)

    want = set()
    for r in batch:  # doc_a < doc_b, hamming <= HAM_T
        a, b, h = r["doc_a"], r["doc_b"], r["hamming"]
        late, early = (a, b) if arrival(a) > arrival(b) else (b, a)
        want.add((late, early, h))
    assert got == want


def test_quantized_artifacts_bounded_and_pair_parity(spark, sf_dir):
    """The quantized rank-table artifact (the corpus-scale form the
    module docstring promises) must be (a) fixed-size — 256 x bins
    int64, independent of reference-corpus size, vs ~2 KB/doc for the
    exact matrix — and (b) produce the SAME near-dup pair set as the
    exact family at the blocking threshold (measured: identical pair
    keys at sf0.001 and sf0.01; per-pair hamming may drift by <= 2 bits
    because the two are distinct-but-both-valid frozen families)."""
    import numpy as np
    import pandas as pd

    from kinesyslog_spark.queries.imagehash import render_png_batches
    from kinesyslog_spark.streaming.imagedup import HAM_T
    from kinesyslog_spark.streaming.projdup import (
        frozen_projection_artifacts,
        proj_banded_batches,
        quantized_projection_artifacts,
    )
    from kinesyslog_spark.tables import load_table

    exact = frozen_projection_artifacts(spark, sf_dir)
    quant = quantized_projection_artifacts(spark, sf_dir)
    assert quant["boundaries"].shape == (256, quant["bins"])
    assert quant["boundaries"].nbytes <= 256 * 256 * 8  # 512 KB ceiling
    # the exact matrix grows ~2 KB/doc; quantized must not grow at all
    assert quant["boundaries"].nbytes <= exact["sorted_cols"].nbytes

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pdf = (
        docs.mapInPandas(render_png_batches, schema="doc_id long, payload binary")
        .toPandas()
        .rename(columns={"doc_id": "img_id"})
    )

    def pairs(art):
        out = pd.concat(list(proj_banded_batches(art)(iter([pdf]))))
        one = out.drop_duplicates("img_id")
        ids = one.img_id.to_numpy()
        M = np.stack([
            np.array([int(x) for x in s.split("|")], dtype=np.uint64)
            .view(np.uint8)
            for s in one.sig
        ])
        B = np.unpackbits(M, axis=1)
        got = {}
        for i in range(len(ids)):
            d = (B[i] != B).sum(axis=1)
            for j in np.nonzero(d <= HAM_T)[0]:
                if ids[i] < ids[j]:
                    got[(int(ids[i]), int(ids[j]))] = int(d[j])
        return got

    pe, pq = pairs(exact), pairs(quant)
    assert pe, "corpus must contain projection-hash near-dups"
    assert set(pe) == set(pq), "pair-key sets must match"
    assert all(abs(pe[k] - pq[k]) <= 2 for k in pe)


def test_streaming_projdup_broadcasts_artifacts(spark, sf_dir):
    """streaming_projdup must ship the artifact dict via sc.broadcast
    (fetched once per executor), not a pickled task closure — at the
    exact form's 100 MB / 50k-doc size a per-task closure is a large
    recurring cost. Pinned by checking the stage accepts a broadcast
    handle and dereferences it."""
    import pandas as pd

    from kinesyslog_spark.queries.imagehash import render_png_batches
    from kinesyslog_spark.streaming.projdup import (
        proj_banded_batches,
        quantized_projection_artifacts,
    )
    from kinesyslog_spark.tables import load_table

    art = quantized_projection_artifacts(spark, sf_dir)
    bc = spark.sparkContext.broadcast(art)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(20)
    pdf = (
        docs.mapInPandas(render_png_batches, schema="doc_id long, payload binary")
        .toPandas()
        .rename(columns={"doc_id": "img_id"})
    )
    via_bc = pd.concat(list(proj_banded_batches(bc)(iter([pdf]))))
    via_dict = pd.concat(list(proj_banded_batches(art)(iter([pdf]))))
    assert via_bc.equals(via_dict)
    # and the distributed path accepts the plain dict by broadcasting it
    banded = (
        spark.createDataFrame(pdf)
        .mapInPandas(proj_banded_batches(bc), schema="img_id long, sig string, block_idx int, block_val long")
    )
    assert banded.count() == 8 * pdf.shape[0]
