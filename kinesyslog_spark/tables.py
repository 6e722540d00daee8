"""Loaders for the driver-generated testdata tables (TESTDATA.md).

All reads are plain `spark.read.parquet` so Catalyst gets predicate
pushdown + column pruning for free; callers should select/filter on the
returned DataFrame rather than materializing it.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

# Hot-layer artifacts are session-bounded and recomputable from their
# (also cached) parents, so they persist MEMORY_ONLY: the default
# MEMORY_AND_DISK level pays a compressed-columnar conversion measured
# at ~2x the underlying compute on string/array-heavy frames (shingle
# arrays, token arrays, double vectors), purely to make the blocks
# disk-spillable — capacity these bounded artifacts never need. On a
# cluster, eviction falls back to recompute-from-parquet, which beats
# spilling cache for artifacts this small (HOT_TABLE_MAX_BYTES-bounded).
HOT_LEVEL = StorageLevel.MEMORY_ONLY

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region,
# nation are fixed-size in TPC-H; supplier/part grow but stay broadcastable
# into the multi-GB range — revisit per deployment).
BROADCAST_TABLES = ("region", "nation")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Session-robustness: the caller's session (e.g. the correctness
    # driver's) may carry NO engine configs, so normalize types at load
    # instead of relying on session-build settings.
    #
    # 1. TIMESTAMP(NANOS) parquet (older testdata generations) throws
    #    PARQUET_TYPE_ILLEGAL on a default session; nanosAsLong is
    #    runtime-settable and the bigint is converted below.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # older Spark without the conf: the read either works or fails loudly
    df = spark.read.parquet(table_path(sf_dir, name))
    from pyspark.sql import functions as F

    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read via spark.sql.legacy.parquet.nanosAsLong:
        # convert epoch-nanos -> TimestampType (µs), truncating like DuckDB.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # 2. isAdjustedToUTC=false timestamps read as TIMESTAMP_NTZ under the
    #    default inferTimestampNTZ, which unix_millis/time arithmetic
    #    reject. All engine sessions run tz=UTC, so the NTZ->LTZ cast is
    #    exact; it is a metadata-only projection (no data pass).
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition before per-row-heavy compute — GATED on
    the input actually being under-split.

    Small local test files arrive as ONE input split, which serializes
    expensive per-row work (higher-order array functions run interpreted,
    outside whole-stage codegen) onto a single core; the one-time shuffle
    of the raw column is repaid ~32x by parallel evaluation. On a real
    cluster a 100 TB scan already has thousands of natural splits, where
    an unconditional round-robin would be a full-corpus shuffle — so the
    repartition fires ONLY when the current split count is below half the
    target parallelism. Callers apply it in front of array/shingle/hash
    pipelines, never plain Catalyst expressions.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        # Plan-only inspection (no job): how many splits would this scan
        # produce as-is?
        cur = df.rdd.getNumPartitions()
    except Exception:
        cur = 0
    if cur * 2 >= n:
        # Already well-split (any at-scale scan lands here): adding a
        # round-robin shuffle could only hurt.
        return df
    return df.repartition(n)


# hot_table persists whole tables; bound it so "persist the corpus" can
# never happen at scale — above this the plain (non-cached) load wins.
HOT_TABLE_MAX_BYTES = 4 << 30  # 4 GiB per table, comfortably in local RAM


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the optimized plan (scan file size
    for a plain parquet read). -1 when unavailable."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return -1


_HOT_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def hot_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """A spread + persisted table, memoized per (session, sf_dir, table).

    The text/vector operator family all start from the same small corpus
    table; without memoization every query re-reads the (single-row-group,
    hence single-task) parquet and re-shuffles it. One session-lifetime
    cache makes the scan cost once-per-session — the local analog of a
    hot table in cluster cache. Safe because testdata is immutable.

    BOUNDED: tables whose Catalyst size estimate exceeds
    HOT_TABLE_MAX_BYTES are returned as plain loads (no spread, no
    persist) — "persist the corpus" is a scale-killer at 100 TB, and
    re-scanning parquet beats evicting executor storage memory."""
    key = (id(spark), sf_dir.rstrip("/"), name)
    df = _HOT_CACHE.get(key)
    if df is None:
        df = load_table(spark, sf_dir, name)
        size = _plan_size_bytes(df)
        if size < 0 or size > HOT_TABLE_MAX_BYTES:
            return df  # too big (or unknown): never cache, never memoize
        df = spread(df).persist(HOT_LEVEL)
        df.count()
        _HOT_CACHE[key] = df
    return df


def hot_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized `(doc_id, toks)` over `documents` — the canonical
    tokenizer output (operators.text.tokens) persisted once per session.

    The whole text-operator family (MinHash shingling, SimHash, language
    ID, token stats) starts by tokenizing the same corpus; the regexp
    extraction is the most expensive per-row step they share. At cluster
    scale this is the "tokenize once, reuse everywhere" stage every
    training-data pipeline runs; locally it removes a repeated
    interpreted-regex pass per query. Unfiltered (empty token arrays
    kept) so every consumer can apply its own size() predicate."""
    key = (id(spark), sf_dir.rstrip("/"), "__tokens__")
    df = _HOT_CACHE.get(key)
    if df is None:
        from pyspark.sql import functions as F

        from kinesyslog_spark.operators.text import tokens

        docs = hot_table(spark, sf_dir, "documents")
        df = docs.select("doc_id", tokens(F.col("text")).alias("toks")).persist(HOT_LEVEL)
        df.count()
        _HOT_CACHE[key] = df
    return df


def hot_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized `(doc_id, token, tf)` unigram postings over the
    canonical token stream — the inverted-index projection every
    retrieval/statistics pipeline materializes once.

    Seven-plus consumers (BM25 q68, entropy q69, unigram-LM q55, the
    heavy-hitter verify q79, the frequency-spectrum/Zipf family
    q129/q131, DSIR's per-doc-term counts) each re-ran the SAME
    explode + first-level count aggregate over hot_tokens per query;
    at 100 TB that is a full token-stream shuffle per query where one
    suffices. The per-(doc, token) count is the finest grain they all
    start from, so every downstream aggregate (global counts, document
    frequency, doc length) derives exactly: COUNT over instances ==
    SUM(tf), COUNT(DISTINCT doc_id) per token == COUNT(*) per token."""
    key = (id(spark), sf_dir.rstrip("/"), "__postings__")
    df = _HOT_CACHE.get(key)
    if df is None:
        from pyspark.sql import functions as F

        df = (
            hot_tokens(spark, sf_dir)
            .select("doc_id", F.explode("toks").alias("token"))
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("tf"))
            .persist(HOT_LEVEL)
        )
        df.count()
        _HOT_CACHE[key] = df
    return df


def hot_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized `(token, cnt)` corpus-wide unigram counts —
    the vocabulary table (Heaps' law: orders of magnitude below the
    corpus), derived from hot_postings by one map-side-combinable
    aggregate instead of a fresh token-stream pass per consumer."""
    key = (id(spark), sf_dir.rstrip("/"), "__vocab__")
    df = _HOT_CACHE.get(key)
    if df is None:
        from pyspark.sql import functions as F

        df = (
            hot_postings(spark, sf_dir)
            .groupBy("token")
            .agg(F.sum("tf").alias("cnt"))
            .persist(HOT_LEVEL)
        )
        df.count()
        _HOT_CACHE[key] = df
    return df


def hot_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized `(vec_id, label, emb double[], nrm)` over
    `embeddings` — the float→double cast (an interpreted higher-order
    transform) and the L2 norm computed ONCE per session.

    Every vector-family query (brute-force cosine, sign-LSH, IVF,
    quantization) starts from exactly these columns; at cluster scale
    this is the materialized vector-store projection an ANN system keeps
    hot, locally it removes a repeated per-row array pass per query."""
    key = (id(spark), sf_dir.rstrip("/"), "__vectors__")
    df = _HOT_CACHE.get(key)
    if df is None:
        from pyspark.sql import functions as F

        emb = F.transform("embedding", lambda x: x.cast("double"))
        df = (
            hot_table(spark, sf_dir, "embeddings")
            .select(
                "vec_id",
                "label",
                emb.alias("emb"),
                F.sqrt(
                    F.aggregate(
                        F.transform(emb, lambda x: x * x),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                ).alias("nrm"),
            )
            .persist(HOT_LEVEL)
        )
        df.count()
        _HOT_CACHE[key] = df
    return df


def release_hot(spark: SparkSession, sf_dir: str | None = None) -> int:
    """Unpersist (and forget) the session-memoized hot tables — all of
    them, or only one sf_dir's.

    Long-lived sessions that sweep many datasets accumulate persisted
    blocks (hot tables, tokens, vectors, IVF centroids) that the block
    manager then scans/evicts around; a 60-query run measured a 4x
    slowdown on an iterative query purely from that pressure. Call this
    when a dataset's query family is done. Next access rebuilds."""
    from kinesyslog_spark.queries.ann import _IVF_CACHE
    from kinesyslog_spark.queries.cluster import _CLUSTER_CACHE
    from kinesyslog_spark.queries.dedup import (
        _MH_PAIR_CACHE,
        _NGRAM_CACHE,
        _SHINGLE_CACHE,
        _SIG_CACHE,
        _SIMHASH_CACHE,
    )
    from kinesyslog_spark.queries.imagehash import _PHASH_CACHE
    from kinesyslog_spark.queries.imageresolve import (
        _IMG_COMP_CACHE,
        _IMG_PAIR_CACHE,
    )
    from kinesyslog_spark.queries.govern import _REFINE_CACHE
    from kinesyslog_spark.queries.graph import _PR_CACHE, _PR_CACHE_N
    from kinesyslog_spark.queries.graph_ext import _TRI_CACHE, _TRI_CACHE_N
    from kinesyslog_spark.queries.resolution import _RANK_CACHE
    from kinesyslog_spark.queries.simresolve import (
        _SIM_COMP_CACHE,
        _SIM_PAIR_CACHE,
    )
    from kinesyslog_spark.queries.semantic import _CENTROID_CACHE, _KMEANS_CACHE

    for key in list(_CENTROID_CACHE):  # plain lists, no unpersist needed
        if key[0] == id(spark) and (sf_dir is None or key[1] == sf_dir.rstrip("/")):
            _CENTROID_CACHE.pop(key)
    from kinesyslog_spark.queries.dedup import _SLOT_EST_CACHE

    # plain (adm, cap) ints, but keyed on id(spark) — CPython can reuse
    # the id after the old session is GC'd, so stale entries must go
    # with the session like every other memo. Corpus key is key[2]
    # (key = (spark_id, family, corpus_key, cap, rows)); the ngram
    # family folds its rows dial into the corpus key as a
    # (sf_dir, rows) TUPLE, so match either shape.
    def _corpus_match(ck, sf: str) -> bool:
        if isinstance(ck, tuple):
            return bool(ck) and ck[0] == sf
        return ck == sf

    for key in list(_SLOT_EST_CACHE):
        if key[0] == id(spark) and (
            sf_dir is None or _corpus_match(key[2], sf_dir.rstrip("/"))
        ):
            _SLOT_EST_CACHE.pop(key)
    # Scalar side-tables of the graph memos (node/edge counts) go with
    # their DataFrame entries — same key shape (spark_id, sf_dir, ...).
    for meta in (_PR_CACHE_N, _TRI_CACHE_N):
        for key in list(meta):
            if key[0] == id(spark) and (
                sf_dir is None or key[1] == sf_dir.rstrip("/")
            ):
                meta.pop(key)
    n = 0
    for cache in (_HOT_CACHE, _IVF_CACHE, _KMEANS_CACHE, _SIG_CACHE,
                  _SIMHASH_CACHE, _CLUSTER_CACHE, _PHASH_CACHE,
                  _IMG_PAIR_CACHE, _SIM_PAIR_CACHE, _MH_PAIR_CACHE,
                  _NGRAM_CACHE, _RANK_CACHE, _IMG_COMP_CACHE,
                  _SIM_COMP_CACHE, _REFINE_CACHE, _PR_CACHE, _TRI_CACHE,
                  _SHINGLE_CACHE):
        for key in list(cache):
            if key[0] != id(spark):
                continue
            if sf_dir is not None and key[1] != sf_dir.rstrip("/"):
                continue
            entry = cache.pop(key)
            dfs = entry if isinstance(entry, tuple) else (entry,)
            for df in dfs:
                try:
                    df.unpersist()
                    n += 1
                except Exception:
                    pass
    return n


def persist_now(df: DataFrame) -> DataFrame:
    """Persist AND materialize (cheap count action) an intermediate that
    multiple plan subtrees will read.

    Lazy persist is not enough when a self-join or broadcast build
    duplicates the producing subtree: the broadcast-exchange jobs and the
    main stages race, each recomputing the expensive pipeline before the
    cache is populated (measured 5-10x first-run slowdowns). Materializing
    once up front costs one tiny job and makes every consumer a cache
    read. Use only for intermediates that are small relative to the
    corpus (signatures, candidate pairs, profiles)."""
    df = df.persist()
    df.count()
    return df


def persist_counted(df: DataFrame) -> tuple[DataFrame, int]:
    """persist_now variant that returns the materializing count.

    For callers whose plan branches on the intermediate's size (e.g.
    q140's conditional adjacency broadcast): the count that populates
    the cache IS the size signal, so exposing it avoids paying a second
    full scan of the cached partitions just to re-derive it."""
    df = df.persist()
    n = df.count()
    return df, n


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL API paths)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
