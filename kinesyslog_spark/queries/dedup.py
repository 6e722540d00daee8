r"""Near-duplicate detection over `documents` (north-star dedup family).

Three independent candidate-generation strategies, each verified with an
exact measure — the standard shape of dedup at 100 TB, where the all-pairs
cross product is impossible and the shuffle key must be a *bucket*:

- q26 MinHash + LSH banding   (shuffle key = band bucket)
- q27 SimHash + block LSH     (shuffle key = 8-bit fingerprint block;
                               hamming<=7 over 64 bits guarantees a shared
                               block, so blocking loses no candidates)
- q28 char-n-gram Jaccard     (shuffle key = length band — near-dups have
                               near-equal length, a standard prefix filter;
                               dups here cross the lang column, so lang is
                               deliberately NOT a blocking key)

Each emits (doc_a, doc_b, measure) pairs, doc_a < doc_b, fully ordered.
Exact dedup (hash-groupBy) is q20 in queries/llm.py.

Scale notes:
- Candidate pairs are generated per-bucket, so the worst case is the
  largest bucket, not N². At 100 TB: raise bands/rows (q26), widen the
  block count (q27), narrow length bands (q28), and salt/cap hot buckets
  (boilerplate documents) before the self-join.
- Verification joins back to the per-doc shingle arrays by doc_id — two
  hash joins on the (small) candidate set, never a re-shuffle of the
  corpus.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesyslog_spark.env import env_budget, env_int
from kinesyslog_spark.operators.text import (
    HEX_HIGH,
    TOKEN_RE,
    char_grams,
    fp_halves,
    hamming_from_halves,
    jaccard,
    lsh_band_keys,
    minhash_df,
    simhash_df,
    word_shingles,
)
from kinesyslog_spark.queries import query
from kinesyslog_spark.tables import hot_table, hot_tokens, persist_now

MINHASH_K = 12
LSH_BANDS = 4
LSH_ROWS = 3
JACCARD_THR = 0.5
SIMHASH_BITS = 64
HAMMING_THR = 4
# Pigeonhole blocking at EXACTLY the declared threshold: hamming <= 4
# pairs share an identical block iff there are THR+1 = 5 blocks, so 5
# blocks of 13/13/13/13/12 bits give the same guaranteed (non-
# probabilistic) recall as the former 8x8-bit scheme — with 2^12-2^13
# keys per block instead of 2^8. Chance buckets are ~32x smaller, and
# since candidate pairs grow with (N/keys)^2 per block, the blocking
# quadratic's constant drops ~45x (the 8x8 scheme was N^2/64 on a
# corpus whose fingerprints fill the 8-bit key space). Results are
# byte-identical: blocking only ever ADDS false candidates, and both
# schemes cover every true pair at the threshold.
SIMHASH_BLOCKS = 5


def _simhash_block_bounds() -> list[tuple[int, int]]:
    """(1-based offset, width) of each fingerprint block — bits spread
    as evenly as 64/5 allows."""
    base, rem = divmod(SIMHASH_BITS, SIMHASH_BLOCKS)
    out, off = [], 1
    for b in range(SIMHASH_BLOCKS):
        w = base + (1 if b < rem else 0)
        out.append((off, w))
        off += w
    return out
NGRAM_N = 5
LEN_BAND = 25
# q28/q117 blocking: 8 tables x 3-row bands — the (b, r) that LSH
# theory tunes to the jaccard 0.5 threshold ((1/b)^(1/r) = 0.5).
# 2-row bands collided chance pairs at j^2, which is CONSTANT per doc
# pair, so candidates grew Theta(N^2): the round-7 sf1 probe measured
# q117's decade ratio at 41x (165 s). At j^3 the chance rate drops
# 30-80x (typical cross-doc 5-gram jaccard is 1-5%) while every real
# dup family survives: the corpus' kept pairs all sit at j >= 0.8,
# where 1-(1-j^3)^8 >= 0.997; at the j=0.5 threshold recall is 0.66
# (vs 0.76 before) — a documented trade on a band no real pair
# occupies. Same asymptotics caveat as all fixed-(b,r) LSH: rows must
# grow ~log N to keep chance candidates subquadratic forever; the
# hot-bucket cap below bounds the damage per bucket either way.
#
# ROWS IS THE SCALE DIAL (SCALING_R9 decomposition): at fixed rows the
# per-pair chance collision rate is constant, so chance candidates are
# Theta(N^2) — measured sf1 -> sf10: verified pairs grew 10.2x (linear,
# planted-dup-bound) while REJECTED chance candidates grew 100x
# (39.5k -> 3.95M, 99.3% of the verify work at 500k docs), refuting the
# round-8 "output-bound" attribution. The fix is the documented
# rows ~ log N schedule, operational via SPARK_GRAFT_NGRAM_ROWS:
# rows=4 measured at sf10 cuts rejected 21.7x (3.95M -> 182k) and
# slots 12.6x while keeping 99.1% of verified output (26,699 ->
# 26,450; the lost pairs sit at the j=0.5 band edge where the rows=4
# collision curve is 0.40 — the standard LSH trade, now measured).
# Default stays 3 (exactly right through ~10^5 docs and what the
# pinned recall-floor tests certify); deployments at the 10^6-doc
# decade set 4. Both engines read this constant at oracle-registration
# time, so the dial keeps Spark and DuckDB in lockstep (verified:
# rows=4 oracle-green at sf0.01).
NGRAM_BANDS = 8
NGRAM_ROWS = env_int("SPARK_GRAFT_NGRAM_ROWS", 3)


def auto_ngram_rows(n_docs: int) -> int:
    """The rows ~ log10(N) schedule as a callable, for the engine-API
    path (callers OUTSIDE the registry that run ngram-style blocking on
    their own corpora and can derive the dial from the materialized
    signature count at call time — the same shape as graph.py's
    _pr_broadcast_cap deriving the broadcast cap from executor memory).
    The REGISTERED q28 deliberately keeps the constant NGRAM_ROWS: both
    engines read the dial at oracle-registration time, so a data-
    dependent value would break the Spark/DuckDB lockstep.

    3 rows through 10^5 docs (the regime the pinned recall-floor tests
    certify), then +1 per decade: 10^6 -> 4 (the measured sf10 setting:
    21.7x chance-candidate cut keeping 99.1% of output, SCALING_R9),
    10^7 -> 5, ... Chance-candidate mass stays ~subquadratic because the
    per-pair collision probability falls geometrically in rows while
    true pairs at jaccard >= 0.8 survive (1-(1-j^r)^8 stays >= 0.94
    through rows=6)."""
    import math

    if n_docs <= 100_000:
        return 3
    return 3 + (math.ceil(math.log10(n_docs)) - 5)
# Blocking shingles are LONGER than the verify shingles: the verify
# measure stays char-5-gram jaccard (the declared q28 semantic), but
# 5-grams are template-saturated on this corpus — random same-length
# doc pairs measure MEDIAN 5-gram jaccard 0.20, so even 3-row bands
# collide 6% of chance pairs and candidates grow quadratically (the
# sf1 probe: 9.6M candidates). 9-gram jaccard separates: chance pairs
# drop to median 0.03 (band collision 7e-4, an 87x cut) while every
# real kept pair measures >= 0.83 (band collision >= 0.999). Docs
# shorter than 9 chars leave the candidate universe (corpus min is 44).
NGRAM_BLOCK_N = 9
# Hot-bucket cap for all LSH self-joins (q26-q29, q38). A bucket of B
# members emits B^2 candidate pairs, so a single boilerplate bucket can
# dominate the job at corpus scale. The default is far above anything a
# test-SF corpus produces (oracle parity is unaffected) but bounds the
# worst bucket to ~10^8 pairs at 100 TB; tune per-corpus via env.
LSH_MAX_BUCKET: int | None = env_budget("SPARK_GRAFT_LSH_MAX_BUCKET", 10_000)
# Slot-budget fail-fast for the band-bucket expansion family (q26/q28
# and the q96/q117/q122/q163 compositions; q27's codegen self-join gets
# the same check) — the PHASH_MAX_SLOTS pattern from
# queries/imagehash.py applied to the last quadratic-capable pair
# expansion that lacked one (round-9 verdict). The expansion's emitted
# pair count is EXACTLY Σ C(n,2) over bucket occupancies (n = distinct
# members per bucket key), known from one cheap aggregate over the
# already-persisted signature frame before the expansion launches;
# cap-excluded buckets are subtracted, mirroring the size filter inside
# _pair_candidates. The hot-bucket cap bounds the worst BUCKET, not the
# total: q28's sf10 decomposition (SCALING_R9) measured chance
# candidates Θ(N²) at fixed rows with every bucket under the cap, so
# without this budget nothing stops a 10^7-doc corpus from launching
# the saturated join. Set to 0 to disable (unset keeps the default;
# malformed values fall back). The default (= PHASH_MAX_SLOTS') admits
# every family member at the certified sf1 decade (worst: q27 at 126.8M
# slots, which runs in ~13 s) and rejects the measured sf10 saturation
# (q27: 2.41B admitted + 10.4B already cap-excluded, 101x per decade —
# the guard trips in the ~27 s estimate pass instead; SCALING_R10.md).
LSH_MAX_SLOTS: int | None = env_budget(
    "SPARK_GRAFT_LSH_MAX_SLOTS", 500_000_000
)


_SIG_CACHE: dict[tuple[int, str], tuple[DataFrame, DataFrame]] = {}


def hot_shingle_sigs(spark, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Session-memoized (shingles, minhash signatures) over `documents` —
    the shared artifact of the whole MinHash family (q26 self-dedup, q96
    incremental dedup; a dedup service keeps exactly these materialized).
    Returns (sh: (doc_id, sh), sigs: (doc_id, mh0..mhK-1)), both
    persisted; released by `tables.release_hot`."""
    key = (id(spark), sf_dir.rstrip("/"))
    got = _SIG_CACHE.get(key)
    if got is None:
        from kinesyslog_spark.tables import HOT_LEVEL

        sh = (
            hot_tokens(spark, sf_dir)
            .filter(F.size("toks") >= 3)
            .select("doc_id", word_shingles(F.col("toks"), 3).alias("sh"))
            .persist(HOT_LEVEL)
        )
        sigs = minhash_df(sh, ["doc_id"], "sh", MINHASH_K).persist(HOT_LEVEL)
        sigs.count()
        got = (sh, sigs)
        _SIG_CACHE[key] = got
    return got


def _par(df: DataFrame) -> int:
    return df.sparkSession.sparkContext.defaultParallelism


def cap_hot_buckets(keyed: DataFrame, key_cols: list[str],
                    max_bucket: int | None,
                    id_col: str = "doc_id") -> DataFrame:
    """Drop buckets with more than `max_bucket` members before a bucket
    self-join.

    The standard skew guard for LSH candidate generation: a bucket of B
    members costs B^2 pairs, so one boilerplate bucket (empty documents,
    a template header) can dominate the whole job. Members of a dropped
    bucket can still pair through their *other* bands/blocks — recall
    degrades only for docs whose every band is hot, which at the default
    cap means near-identical boilerplate that exact dedup (q20) already
    collapses. The aggregation is a cheap count per bucket key +
    broadcast-sized anti-join.

    Bucket size is COUNT(DISTINCT id_col) — the same definition
    lsh_slot_estimate and _pair_candidates' in-aggregate size filter
    use, so the budget's admitted/excluded split always mirrors what
    this cap actually drops (a caller with duplicate (id, key) rows
    would otherwise see the two guards disagree)."""
    if not max_bucket:
        return keyed
    hot = (
        keyed.groupBy(*key_cols)
        .agg(F.countDistinct(id_col).alias("_n"))
        .filter(F.col("_n") > max_bucket)
        .select(*key_cols)
    )
    return keyed.join(F.broadcast(hot), on=key_cols, how="left_anti")


def lsh_slot_estimate(keyed: DataFrame, key_cols: list[str],
                      max_bucket: int | None,
                      side=None) -> tuple[int, int]:
    """(admitted, cap_excluded) pair-slot counts for a band-bucket
    expansion over `keyed` — the exact arithmetic behind
    _lsh_slot_budget_check, exposed for the scale probes
    (tools/probe_lsh_slots.py). One aggregate; see the check's
    docstring for the bucket-kind arithmetic."""
    g = keyed.groupBy(*key_cols)
    if side is None:
        counts = g.agg(F.countDistinct("doc_id").alias("n"))
        slots = (F.col("n") * (F.col("n") - 1) / 2).cast("double")
        total = F.col("n")
    else:
        counts = g.agg(
            F.countDistinct(F.when(side, F.col("doc_id"))).alias("n1"),
            F.countDistinct(F.when(~side, F.col("doc_id"))).alias("n0"),
        )
        slots = (F.col("n1") * F.col("n0")).cast("double")
        total = F.col("n1") + F.col("n0")
    skipped = (total > F.lit(max_bucket)) if max_bucket else F.lit(False)
    row = counts.agg(
        F.sum(F.when(~skipped, slots).otherwise(F.lit(0.0))).alias("adm"),
        F.sum(F.when(skipped, slots).otherwise(F.lit(0.0))).alias("cap"),
    ).collect()[0]
    return int(row["adm"] or 0), int(row["cap"] or 0)


# Session memo for the slot estimates: the estimate is a pure function
# of (corpus, blocking scheme, cap), and the signature frames it reads
# are themselves session-memoized — re-running the aggregate on every
# query call measured ~1 s at sf0.1 (a 12% headline hit on q26).
# Keyed by (spark id, BLOCKING FAMILY, caller-supplied corpus key, cap,
# rows dial) — family, not caller name, so q26/q163 (identical minhash
# bands frame) share one estimate per corpus. Cleared by
# tables.release_hot alongside the DataFrame memos.
_SLOT_EST_CACHE: dict[tuple, tuple[int, int]] = {}


def _lsh_slot_budget_check(name: str, keyed: DataFrame, key_cols: list[str],
                           max_bucket: int | None, side=None,
                           cache_key=None, family: str | None = None) -> None:
    """Fail fast if a band-bucket expansion would emit more candidate
    pair slots than LSH_MAX_SLOTS.

    `keyed` is the exploded (doc_id, *key_cols) bucket frame BEFORE the
    hot-bucket cap. The estimate mirrors the expansion bit-for-bit:
    per bucket of n distinct members, the self-join family
    (_pair_candidates / q27's codegen join) emits C(n, 2) ordered pairs
    pre-distinct; with `side` given (q96's asymmetric new-vs-old probe)
    a bucket with n1 new and n0 old members emits n1*n0. Buckets the
    hot-bucket cap excludes (total membership > max_bucket) are
    subtracted — so the admitted number IS the expansion's emitted pair
    count, not an upper bound. One aggregate over the (persisted)
    signature frame; only distinct bucket keys cross the wire thanks to
    partial aggregation."""
    if not LSH_MAX_SLOTS:
        return
    from kinesyslog_spark.queries.resolution import CandidateBudgetExceeded

    memo = (
        (id(keyed.sparkSession), family or name, cache_key, max_bucket,
         NGRAM_ROWS)
        if cache_key is not None else None
    )
    got = _SLOT_EST_CACHE.get(memo) if memo else None
    if got is None:
        got = lsh_slot_estimate(keyed, key_cols, max_bucket, side=side)
        if memo:
            _SLOT_EST_CACHE[memo] = got
    adm, cap = got
    if adm > LSH_MAX_SLOTS:
        raise CandidateBudgetExceeded(
            f"{name} band-bucket expansion would emit ~{adm:,} candidate "
            f"pair slots (budget {LSH_MAX_SLOTS:,}; a further "
            f"~{cap:,} already excluded by the hot-bucket "
            "cap). Fixed-(bands, rows) LSH collides chance pairs at a "
            "constant per-pair rate, so slots grow Θ(N²) in corpus size "
            "(SCALING_R9/R10) — at this scale raise the blocking "
            "selectivity (SPARK_GRAFT_NGRAM_ROWS for the n-gram family: "
            "rows ~ log N keeps chance candidates subquadratic, rows=4 "
            "measured a 21.7x cut at 500k docs keeping 99.1% of output; "
            "more/wider blocks for SimHash), use the recall-bounded "
            "streaming twin (W9 continuous near-dup dedups within a "
            "horizon at O(new) cost), lower SPARK_GRAFT_LSH_MAX_BUCKET, "
            "or raise SPARK_GRAFT_LSH_MAX_SLOTS."
        )


_USE_GLOBAL_CAP = object()  # sentinel: resolve LSH_MAX_BUCKET at call time


def _pair_candidates(keyed: DataFrame, key_cols: list[str],
                     max_bucket=_USE_GLOBAL_CAP,
                     name: str = "LSH",
                     budget_cache_key=None,
                     budget_family: str | None = None) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing every key column.

    One groupBy per bucket key collects the member set, applies the
    hot-bucket cap as a size filter *inside the same aggregate* (no
    separate count + anti-join pass), and expands each bucket's sorted
    member array into its ordered pairs with array expressions — a
    single shuffle where the former self-join formulation needed a
    count, an anti-join, two explicit repartitions and a join.

    The quadratic expansion still runs one task per bucket (hash
    partitioning on the bucket key), so the skew bound is unchanged: the
    worst bucket costs |bucket|^2 pairs, which is exactly what the cap
    limits. The explicit repartition before the expansion keeps the
    bytes-small bucket table wide under AQE (the expansion is
    compute-heavy, output-quadratic)."""
    if max_bucket is _USE_GLOBAL_CAP:
        max_bucket = LSH_MAX_BUCKET
    _lsh_slot_budget_check(name, keyed, key_cols, max_bucket,
                           cache_key=budget_cache_key,
                           family=budget_family)
    members = (
        keyed.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_set("doc_id")).alias("_ms"))
        .filter(F.size("_ms") >= 2)
    )
    if max_bucket:
        members = members.filter(F.size("_ms") <= max_bucket)
    ms = F.col("_ms")
    pairs = F.flatten(
        F.transform(
            ms,
            lambda a, i: F.transform(
                F.slice(ms, i + F.lit(2), F.size(ms)),
                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
            ),
        )
    )
    return (
        members.repartition(_par(keyed))
        .select(F.explode(pairs).alias("_p"))
        .select("_p.doc_a", "_p.doc_b")
        .distinct()
    )


def _verify_jaccard(cand: DataFrame, sh: DataFrame, thr: float) -> DataFrame:
    """Join shingle arrays back by doc_id and keep exact Jaccard >= thr.

    cand is explicitly repartitioned for the same reason as above: a few
    MB of candidate pairs coalesce to one AQE partition, but each row
    costs an array_intersect over the two shingle sets — the verify must
    run wide. The shingle sides broadcast (runtime-sized by AQE)."""
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cand.repartition(_par(cand))
        .join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jaccard"))
        .filter(F.col("jaccard") >= thr)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Q26 — MinHash + LSH banding (word 3-gram shingles)
# ---------------------------------------------------------------------------

def _mh_expr(i: int, src: str = "sh") -> str:
    """DuckDB twin of minhash_df's two-hash scheme (operators/text.py)."""
    h1 = "CAST('0x' || substring(md5(s), 1, 10) AS BIGINT)"
    h2 = "CAST('0x' || substring(md5(s), 11, 10) AS BIGINT)"
    return (
        f"list_min(list_transform({src}, s -> ({h1} + {i} * {h2}) % {1 << 40}))"
    )


def minhash_vpairs_cte() -> str:
    """CTE chain ending in `vpairs(doc_a, doc_b, jaccard)` — the
    VERIFIED MinHash near-dup pairs. Shared by the q26 oracle and any
    oracle that composes near-dup pairs (q163's split-leakage audit)."""
    sig = ",\n      ".join(_mh_expr(i) for i in range(MINHASH_K))
    bands = ", ".join(str(b) for b in range(LSH_BANDS))
    return f"""tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks FROM documents
    ), docs AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
             i -> array_to_string(toks[i:i+2], ' '))) AS sh
      FROM tk WHERE len(toks) >= 3
    ), sigs AS (
      SELECT doc_id, [{sig}] AS sig FROM docs
    ), bands AS (
      SELECT doc_id, b.band_idx,
             md5(sig[{LSH_ROWS}*b.band_idx + 1]::VARCHAR || ',' || sig[{LSH_ROWS}*b.band_idx + 2]::VARCHAR
                 || ',' || sig[{LSH_ROWS}*b.band_idx + 3]::VARCHAR) AS band_key
      FROM sigs CROSS JOIN (SELECT unnest([{bands}]) AS band_idx) b
    ), cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id
    ), vpairs AS (
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT doc_a, doc_b,
          ROUND(len(list_intersect(a.sh, b.sh)) /
            CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 4) AS jaccard
        FROM cand JOIN docs a ON a.doc_id = cand.doc_a JOIN docs b ON b.doc_id = cand.doc_b
      ) WHERE jaccard >= {JACCARD_THR}
    )"""


def _minhash_oracle() -> str:
    return f"""
    WITH {minhash_vpairs_cte()}
    SELECT doc_a, doc_b, jaccard FROM vpairs
    ORDER BY doc_a, doc_b
    """


@query("q26_minhash_lsh", oracle=_minhash_oracle())
def q26_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shingles + signatures come from the session-memoized family cache
    # (hot_shingle_sigs): the shingling (interpreted, HOF-heavy) and the
    # explode+MIN signature aggregation run once per session and are
    # shared with q96's incremental dedup.
    sh, sigs = hot_shingle_sigs(spark, sf_dir)
    bands = sigs.select(
        "doc_id",
        F.explode(
            lsh_band_keys([f"mh{i}" for i in range(MINHASH_K)], LSH_BANDS, LSH_ROWS)
        ).alias("bd"),
    ).select("doc_id", "bd.band_idx", "bd.band_key")
    cand = _pair_candidates(bands, ["band_idx", "band_key"],
                            name="q26_minhash_lsh",
                            budget_cache_key=sf_dir.rstrip("/"),
                            budget_family="minhash_bands")
    return _verify_jaccard(cand, sh, JACCARD_THR)


# ---------------------------------------------------------------------------
# Q27 — SimHash fingerprint + block LSH, Hamming-distance verify
# ---------------------------------------------------------------------------

def _simhash_oracle() -> str:
    high = ", ".join(f"'{h}'" for h in HEX_HIGH)
    bit = (
        "CASE WHEN list_sum(list_transform(hl, h -> CASE WHEN substring(h, {j}, 1)"
        f" IN ({high}) THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END"
    )
    fp = " || ".join(bit.format(j=j) for j in range(1, SIMHASH_BITS + 1))
    blocks = ", ".join(str(b) for b in range(SIMHASH_BLOCKS))
    ham = " + ".join(
        f"(CASE WHEN substring(fa, {j}, 1) <> substring(fb, {j}, 1) THEN 1 ELSE 0 END)"
        for j in range(1, SIMHASH_BITS + 1)
    )
    return f"""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks FROM documents
    ), hs AS (
      SELECT doc_id, list_transform(toks, t -> sha256(t)) AS hl FROM tk WHERE len(toks) >= 1
    ), fps AS (
      SELECT doc_id, ({fp}) AS fp FROM hs
    ), blocks AS (
      SELECT doc_id, fp, b.block_idx,
             CASE b.block_idx {" ".join(
                 f"WHEN {i} THEN substring(fp, {off}, {w})"
                 for i, (off, w) in enumerate(_simhash_block_bounds())
             )} END AS block_val
      FROM fps CROSS JOIN (SELECT unnest([{blocks}]) AS block_idx) b
    ), cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.fp AS fa, y.fp AS fb
      FROM blocks x JOIN blocks y
        ON x.block_idx = y.block_idx AND x.block_val = y.block_val AND x.doc_id < y.doc_id
    )
    SELECT doc_a, doc_b, hamming FROM (
      SELECT doc_a, doc_b, ({ham}) AS hamming FROM cand
    ) WHERE hamming <= {HAMMING_THR}
    ORDER BY doc_a, doc_b
    """


@query("q27_simhash_pairs", oracle=_simhash_oracle())
def q27_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = hot_tokens(spark, sf_dir).filter(F.size("toks") >= 1)
    # Fingerprints via explode + 64 SUM aggregates (whole-stage codegen,
    # map-side combine); persisted because both sides of the block
    # self-join read them. Each fingerprint is also carried as two 32-bit
    # ints so the pair filter is xor+popcount, not 64 string compares.
    hi, lo = fp_halves(F.col("fp"))
    fps = persist_now(
        simhash_df(toks, ["doc_id"], "toks")
        .select("doc_id", "fp", hi.alias("hi"), lo.alias("lo"))
    )
    blocks = fps.select(
        "doc_id",
        "hi",
        "lo",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("block_idx"),
                    F.substring("fp", off, w).alias("block_val"),
                )
                for b, (off, w) in enumerate(_simhash_block_bounds())
            ])
        ).alias("bk"),
    ).select("doc_id", "hi", "lo", "bk.block_idx", "bk.block_val")
    # NOTE: q27 keeps the codegen'd self-JOIN formulation (not the
    # grouped-array expansion _pair_candidates uses): 8-bit block values
    # are LOW-entropy keys, so buckets here hold hundreds of members and
    # the quadratic expansion must run in whole-stage codegen — the
    # interpreted array expansion measured 3x slower on exactly this
    # shape. _pair_candidates stays right for q26's md5 band keys, where
    # buckets are near-singletons. Hamming is evaluated and thresholded
    # BEFORE the distinct so candidate fingerprints are never shuffled.
    try:
        _lsh_slot_budget_check(
            "q27_simhash_pairs", blocks,
            ["block_idx", "block_val"], LSH_MAX_BUCKET,
            cache_key=sf_dir.rstrip("/"),
        )
    except Exception:
        fps.unpersist()  # abort path must not leak the persisted frame
        raise
    blocks = cap_hot_buckets(blocks, ["block_idx", "block_val"], LSH_MAX_BUCKET)
    n_par = _par(fps)
    x = blocks.select("block_idx", "block_val", F.col("doc_id").alias("doc_a"), F.col("hi").alias("hi_a"), F.col("lo").alias("lo_a")).repartition(n_par, "block_idx", "block_val")
    y = blocks.select("block_idx", "block_val", F.col("doc_id").alias("doc_b"), F.col("hi").alias("hi_b"), F.col("lo").alias("lo_b")).repartition(n_par, "block_idx", "block_val")
    return (
        x.join(y, on=["block_idx", "block_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            hamming_from_halves(
                F.col("hi_a"), F.col("lo_a"), F.col("hi_b"), F.col("lo_b")
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_THR)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Q28 — character-n-gram Jaccard with (lang, length-band) blocking
# ---------------------------------------------------------------------------
# Length banding is a principled prefix filter: Jaccard >= t implies
# |len_a - len_b| is bounded, so near-dup pairs land in the same or
# adjacent band (each doc is emitted into both), and distant-length pairs
# are never even candidates.

def _ngram_block_ctes() -> str:
    """WITH-body through `cand` — q28's char-5-gram band blocking,
    shared with q117's edit-distance verify (same candidate space,
    different similarity measure)."""
    bands = ", ".join(str(b) for b in range(NGRAM_BANDS))
    return f"""
    docs AS (
      SELECT doc_id, lang, length(text) AS n,
             list_distinct(list_transform(range(1, length(text) - {NGRAM_N - 2}),
                 i -> text[i:i+{NGRAM_N - 1}])) AS sh,
             list_distinct(list_transform(range(1, length(text) - {NGRAM_BLOCK_N - 2}),
                 i -> text[i:i+{NGRAM_BLOCK_N - 1}])) AS sh_b
      FROM documents WHERE length(text) >= {NGRAM_BLOCK_N}
    ), keyed AS (
      SELECT doc_id, n, sh,
             [{", ".join(_mh_expr(i, "sh_b") for i in range(NGRAM_BANDS * NGRAM_ROWS))}] AS sig
      FROM docs
    ), blocked AS (
      SELECT doc_id, n, t.t,
             md5({" || ',' || ".join(
                 f"sig[{NGRAM_ROWS}*t.t + {r + 1}]::VARCHAR"
                 for r in range(NGRAM_ROWS)
             )}) AS bk,
             n // {LEN_BAND} + o.off AS bucket
      FROM keyed
      CROSS JOIN (SELECT unnest([0, 1]) AS off) o
      CROSS JOIN (SELECT unnest([{bands}]) AS t) t
    ), cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM blocked x JOIN blocked y
        ON x.t = y.t AND x.bk = y.bk AND x.bucket = y.bucket AND x.doc_id < y.doc_id
      WHERE abs(x.n - y.n) <= {LEN_BAND}
    )"""


def _ngram_oracle() -> str:
    return f"""
    WITH {_ngram_block_ctes()}
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT doc_a, doc_b,
        ROUND(len(list_intersect(a.sh, b.sh)) /
          CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE), 4) AS jaccard
      FROM cand JOIN docs a ON a.doc_id = cand.doc_a JOIN docs b ON b.doc_id = cand.doc_b
    ) WHERE jaccard >= {JACCARD_THR}
    ORDER BY doc_a, doc_b
    """


def ngram_candidates(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """q28's blocking as a reusable stage: returns (cand, base) where
    cand = distinct (doc_a < doc_b) candidate pairs and base = persisted
    (doc_id, n, sh). Shared with q117's edit-distance verify.

    Blocking = length band (prefix filter) AND an NGRAM_ROWS-row
    MinHash band agreeing in one of NGRAM_BANDS tables — (8, 3), the
    LSH tuning for the jaccard 0.5 threshold; see the constants' note
    for the chance-candidate math and the measured sf1 blowup that
    retired the earlier 2-row scheme. The 24 minhash coordinates cost
    the same explode+md5 pass as 2 did (two-hash scheme: extra
    coordinates are extra MIN aggregates, not extra hashes). Pair
    expansion is the grouped single-shuffle form (high-entropy-key
    rule: md5 band keys make near-singleton buckets). The
    |na - nb| <= LEN_BAND refinement rides the caller's verify join
    — blocking already bounds it below 2 bands, and the n column is on
    the same persisted row as the shingles."""
    docs = hot_table(spark, sf_dir, "documents").filter(
        F.length("text") >= NGRAM_BLOCK_N
    )
    # Persisted: feeds both verify-join sides (5-gram shingles — the
    # declared similarity measure).
    base = persist_now(
        docs.select(
            "doc_id",
            F.length("text").alias("n"),
            char_grams(F.col("text"), NGRAM_N).alias("sh"),
        )
    )
    # Blocking signatures run over the LONGER 9-gram shingles (see the
    # NGRAM_BLOCK_N note): same minhash machinery, different gram size.
    keyed = persist_now(
        minhash_df(
            docs.select(
                "doc_id",
                F.length("text").alias("n"),
                char_grams(F.col("text"), NGRAM_BLOCK_N).alias("sh_b"),
            ),
            ["doc_id", "n"],
            "sh_b",
            NGRAM_BANDS * NGRAM_ROWS,
        )
    )
    blocked = (
        keyed.select(
            "doc_id", "n",
            F.explode(
                lsh_band_keys(
                    [f"mh{i}" for i in range(NGRAM_BANDS * NGRAM_ROWS)],
                    NGRAM_BANDS, NGRAM_ROWS,
                )
            ).alias("bd"),
            ((F.col("n") / LEN_BAND).cast("int")).alias("b0"),
        )
        .select(
            "doc_id", "n",
            F.col("bd.band_idx").alias("t"),
            F.col("bd.band_key").alias("bk"),
            F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("bucket"),
        )
    )
    try:
        cand = _pair_candidates(blocked, ["t", "bk", "bucket"],
                                name="q28_ngram_jaccard",
                                budget_cache_key=sf_dir.rstrip("/"),
                                budget_family="ngram_bands")
    except Exception:
        # abort path must not leak the persisted frames
        base.unpersist()
        keyed.unpersist()
        raise
    return cand, base


@query("q28_ngram_jaccard", oracle=_ngram_oracle())
def q28_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    cand, base = ngram_candidates(spark, sf_dir)
    a = base.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("na"),
        F.col("sh").alias("sh_a"),
    )
    b = base.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"),
        F.col("sh").alias("sh_b"),
    )
    return (
        cand.repartition(_par(cand))
        .join(a, "doc_a").join(b, "doc_b")
        .filter(F.abs(F.col("na") - F.col("nb")) <= LEN_BAND)
        .select(
            "doc_a", "doc_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THR)
        .orderBy("doc_a", "doc_b")
    )
