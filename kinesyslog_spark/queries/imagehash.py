"""Q124 — image perceptual-hash near-duplicate join over a REAL PNG
pixel path (operators/png.py: zero-dep decode, integer-DCT pHash).

Pipeline (the image twin of q27's SimHash family):
  1. render   — each document is rendered to a deterministic 32x32
     grayscale "feature chart" (see `shingle_raster`) and encoded as a
     real PNG (mapInPandas 1->1, binary payload column) — the stand-in
     for stored images, since the container ships no image fixtures.
  2. phash    — payloads are DECODED back through the real PNG codec
     (zlib inflate + unfilter; no shortcut to the raster), grayscaled /
     box-downscaled to 32x32 if needed, and perceptually hashed with
     the fixed-point DCT (8 blocks x 8 bits).
  3. LSH join — hamming <= 7 implies at least one of the 8 blocks is
     equal (pigeonhole), so candidates = pairs sharing any (j, block)
     via the shared `_pair_candidates` bucket expansion (hot-bucket
     capped at scale), verified JVM-side with bit_count(xor) — exact
     completeness at the threshold, like q27.

Why `shingle_raster` makes image near-dup MEANINGFUL here: the raster
is a 2-D histogram of the document's positional char-5-gram counts
(cell = md5_int60(gram) % 1024, intensity = min(255, 16*count)), so
documents in the corpus's near-duplicate clusters (~0.9 shingle
Jaccard) produce rasters differing in a few cells -> pHash hamming
mostly 0-2, while unrelated documents measure ~20+ (validated: 25/25
cluster pairs at sf0.01 fall under the threshold, 0 background pairs).
The ORACLE rebuilds the same integers straight from `text` in SQL —
shingle counts, md5 cell, the literal DCT table, quantile_disc median —
so the driver verifies the WHOLE chain including the PNG roundtrip
(any codec bug perturbs pixels -> coefficients -> pairs).

Scale posture (100 TB of images):
- render/phash are map-only Arrow-batched stages (the two intended
  Python stages; everything after is JVM);
- the only shuffles are the block-bucket groupBy (8 rows of 10 bytes
  per image) and the pair verify join — q27 economics exactly;
- hot blocks (e.g. all-zero charts) are bounded by the global
  LSH_MAX_BUCKET cap inside `_pair_candidates`.
"""

from __future__ import annotations

import hashlib
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.operators.multimodal import DECODE_ERRORS
from kinesyslog_spark.operators.png import (
    box_downscale,
    decode_png,
    dct_table_sql_values,
    encode_png,
    phash_blocks,
    to_gray,
)
from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import load_table

HAM_T = 7        # hamming threshold; <= 7 guarantees a shared block
SHINGLE_N = 5    # char-gram width feeding the raster
CELL_GAIN = 16   # intensity per gram occurrence, clamped to 255

# gram -> raster cell memo. The corpus vocabulary is tiny relative to
# the gram stream (every doc reuses the same shingles), so each Python
# worker md5-hashes a given gram once per process, not once per doc.
_CELL_MEMO: dict[str, int] = {}


def _gram_cell(g: str) -> int:
    c = _CELL_MEMO.get(g)
    if c is None:
        c = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16) % 1024
        if len(_CELL_MEMO) < 1_000_000:  # bound worker memory
            _CELL_MEMO[g] = c
    return c


def shingle_raster(text: str) -> bytes:
    """32x32 gray raster: 2-D histogram of positional char-5-gram
    counts. cell = int(md5(gram)[:15 hex], 16) % 1024 (the md5_int60
    convention, so DuckDB replays it bit-exactly); intensity =
    min(255, CELL_GAIN * count)."""
    t = text.lower()
    cnt = Counter(t[i:i + SHINGLE_N] for i in range(len(t) - SHINGLE_N + 1))
    cells: Counter[int] = Counter()
    for g, c in cnt.items():
        cells[_gram_cell(g)] += c
    buf = bytearray(1024)
    for cell, c in cells.items():
        buf[cell] = min(255, CELL_GAIN * c)
    return bytes(buf)


def render_png_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas 1->1: (doc_id, text) -> (doc_id, payload) real PNG."""
    for pdf in batches:
        rows = [
            {"doc_id": d, "payload": encode_png(shingle_raster(t), 32, 32)}
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        yield pd.DataFrame(rows, columns=["doc_id", "payload"])


PHASH_SCHEMA = "doc_id long, j int, bv long"


def phash_block_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas 1->8: (doc_id, payload) -> (doc_id, j, bv) pHash
    blocks via the REAL decode path. Non-PNG / unsupported payloads are
    skipped (a malformed blob must never kill a partition).

    The DCT runs as one int64 numpy tensor contraction over the whole
    Arrow batch (bit-identical to the pure-Python `phash_blocks`, which
    tests pin it against) — the per-doc Python loop was ~20x slower at
    sf0.1."""
    import numpy as np

    from kinesyslog_spark.operators.png import PHASH_DCT_T

    T = np.array(PHASH_DCT_T, dtype=np.int64)  # (8, 32)
    for pdf in batches:
        ids, rasters = [], []
        for d, p in zip(pdf["doc_id"], pdf["payload"]):
            try:
                w, h, ch, px = decode_png(bytes(p))
            except DECODE_ERRORS:
                continue
            gray = to_gray(px, ch)
            if (w, h) != (32, 32):
                gray = box_downscale(gray, w, h, 32, 32)
            ids.append(d)
            rasters.append(np.frombuffer(gray, dtype=np.uint8))
        if not ids:
            yield pd.DataFrame(columns=["doc_id", "j", "bv"])
            continue
        G = np.stack(rasters).astype(np.int64).reshape(-1, 32, 32)
        R = G @ T.T                                  # (n, 32 y, 8 u)
        C = np.einsum("vy,nyu->nuv", T, R)           # (n, 8 u, 8 v)
        flat = C.reshape(-1, 64)
        nondc = flat[:, 1:]                          # DC is index (0,0)
        med = np.sort(nondc, axis=1)[:, 31]          # 32nd smallest of 63
        bits = flat > med[:, None]
        bits[:, 0] = False                           # DC bit forced 0
        weights = np.array([1 << (7 - v) for v in range(8)], dtype=np.int64)
        bv = (bits.reshape(-1, 8, 8) * weights).sum(axis=2)  # (n, 8)
        out = pd.DataFrame({
            "doc_id": np.repeat(np.asarray(ids, dtype=np.int64), 8),
            "j": np.tile(np.arange(8, dtype=np.int32), len(ids)),
            "bv": bv.reshape(-1),
        })
        yield out


def _q124_oracle() -> str:
    n = SHINGLE_N
    return f"""
    WITH sh AS (
      SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, strlen(text) - {n} + 2),
                      i -> substring(lower(text), i, {n}))) AS g
        FROM documents WHERE strlen(text) >= {n}
      ) GROUP BY doc_id, g
    ), cells AS (
      SELECT doc_id, cell, LEAST(255, {CELL_GAIN} * SUM(c)) AS gv
      FROM (
        SELECT doc_id,
               CAST('0x' || substring(md5(g), 1, 15) AS BIGINT) % 1024
                 AS cell,
               c
        FROM sh
      ) GROUP BY doc_id, cell
    ), dctt AS (
      SELECT * FROM (VALUES {dct_table_sql_values()}) AS t(u, x, tv)
    ), rd AS (
      SELECT c.doc_id, c.cell // 32 AS y, t.u, SUM(c.gv * t.tv) AS rv
      FROM cells c JOIN dctt t ON t.x = c.cell % 32
      GROUP BY c.doc_id, c.cell // 32, t.u
    ), co AS (
      SELECT r.doc_id, r.u, t.u AS v, SUM(r.rv * t.tv) AS cv
      FROM rd r JOIN dctt t ON t.x = r.y
      GROUP BY r.doc_id, r.u, t.u
    ), md AS (
      SELECT doc_id, quantile_disc(cv, 0.5) AS med
      FROM co WHERE NOT (u = 0 AND v = 0) GROUP BY doc_id
    ), bl AS (
      SELECT co.doc_id, co.u AS j,
             CAST(SUM(CASE WHEN NOT (co.u = 0 AND co.v = 0)
                                AND co.cv > md.med
                           THEN 1 << (7 - co.v) ELSE 0 END) AS BIGINT)
               AS bv
      FROM co JOIN md ON md.doc_id = co.doc_id
      GROUP BY co.doc_id, co.u
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bl a JOIN bl b
        ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id
    ), ham AS (
      SELECT p.doc_a, p.doc_b,
             CAST(SUM(bit_count(xor(a.bv, b.bv))) AS BIGINT) AS hamming
      FROM cand p
      JOIN bl a ON a.doc_id = p.doc_a
      JOIN bl b ON b.doc_id = p.doc_b AND b.j = a.j
      GROUP BY p.doc_a, p.doc_b
    )
    SELECT doc_a, doc_b, hamming FROM ham
    WHERE hamming <= {HAM_T}
    ORDER BY doc_a, doc_b
    """


# number of coarse groups the buckets hash into for the grouped-map
# pair kernel: per-GROUP overhead in the Arrow grouped-map path
# measured ~3 ms, so one group per (j, bv) bucket (~1.6k buckets even
# at sf0.1) cost ~5 s of pure dispatch; 64 coarse groups amortize it
# while the intra-group bucket loop runs at pandas-groupby C speed.
_PHASH_GROUPS = 64


def _phash_bucket_pairs(pdf):
    """One coarse group = many whole (j, block-value) buckets: emit
    every within-bucket member pair with hamming <= HAM_T over the full
    64-bit hash. numpy xor + uint8-LUT popcount, row-at-a-time against
    the remaining member matrix (peak temp is one (m, 64) uint8 slab).
    Buckets over the global hot-bucket cap are skipped, mirroring
    cap_hot_buckets."""
    import numpy as np
    import pandas as pd

    from kinesyslog_spark.queries.dedup import LSH_MAX_BUCKET

    pop = _POP_LUT
    out_a, out_b, out_h = [], [], []
    for _, sub in pdf.groupby(["j", "bv"], sort=False):
        m = len(sub)
        if m < 2 or (LSH_MAX_BUCKET and m > LSH_MAX_BUCKET):
            continue
        order = np.argsort(sub["doc_id"].to_numpy())
        ids = sub["doc_id"].to_numpy()[order]
        ba = np.stack(sub["ba"].to_numpy())[order].astype(np.uint64)
        bv8 = ba.view(np.uint8).reshape(m, 64)
        for i in range(m - 1):
            h = pop[np.bitwise_xor(bv8[i + 1:], bv8[i])].sum(
                axis=1, dtype=np.int64
            )
            sel = np.nonzero(h <= HAM_T)[0]
            if len(sel):
                out_a.append(np.full(len(sel), ids[i], dtype=np.int64))
                out_b.append(ids[i + 1 + sel])
                out_h.append(h[sel])
    if not out_a:
        return pd.DataFrame(
            {"doc_a": [], "doc_b": [], "hamming": []}
        ).astype("int64")
    return pd.DataFrame({
        "doc_a": np.concatenate(out_a),
        "doc_b": np.concatenate(out_b),
        "hamming": np.concatenate(out_h),
    })


def _make_pop_lut():
    import numpy as np

    return np.array([bin(x).count("1") for x in range(256)], dtype=np.uint8)


_POP_LUT = _make_pop_lut()


@query("q124_image_phash_neardup", oracle=_q124_oracle())
def q124_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesyslog_spark.queries.dedup import LSH_MAX_BUCKET, _par

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # the test parquet is one split; spread the (CPU-bound) Python
        # stages across the executor cores. At corpus scale the input
        # already has thousands of splits and this is a near-no-op.
        .repartition(spark.sparkContext.defaultParallelism)
    )
    payloads = docs.mapInPandas(
        render_png_batches, schema="doc_id long, payload binary"
    )
    blocks = payloads.mapInPandas(phash_block_batches, schema=PHASH_SCHEMA)
    # Per-doc 8-long hash vector, carried INTO the buckets so hamming is
    # computed during pair expansion with no verify join. 8-bit block
    # buckets are HOT when hashes correlate (this one-topic corpus puts
    # ~20% of all pairs in a shared block: sf1 measured 1.8k buckets
    # holding 618M pair slots, max bucket ~7k members). The first cut
    # expanded pairs with array higher-order functions, which evaluate
    # INTERPRETED — ~60 s at sf1 for the quadratic alone. The expansion
    # is now a numpy kernel per bucket (applyInPandas): row-vectorized
    # xor + 8-bit-LUT popcount over the member matrix, ~50x the HOF
    # throughput on the same pair count (sf1 70 s -> ~9 s end-to-end).
    # Vector payload per member is 8 longs: bounded, Arrow-batched.
    v = (
        blocks.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("j", "bv"))).alias("s"))
        .select(
            "doc_id",
            F.transform("s", lambda st: st["bv"]).alias("ba"),
        )
    )
    keyed = v.select(
        "doc_id", "ba", F.posexplode("ba").alias("j", "bv")
    ).withColumn(
        "gid", F.pmod(F.hash("j", "bv"), F.lit(_PHASH_GROUPS)).cast("int")
    )
    pairs = keyed.groupBy("gid").applyInPandas(
        _phash_bucket_pairs, "doc_a long, doc_b long, hamming long"
    )
    return (
        pairs.repartition(_par(pairs))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )
