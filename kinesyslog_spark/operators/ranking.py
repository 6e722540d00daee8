"""Scale-safe global ordering primitives (distributed ROW_NUMBER / NTILE).

Spark executes an unpartitioned window (``Window.orderBy(...)`` with no
``partitionBy``) as a SINGLE-partition WindowExec: every row of the input
moves to one task (the runtime even warns "No Partition Defined for Window
operation! Moving all data to a single partition"). That is fine for a
16-row aggregate and fatal for a 100 TB fact table. These helpers provide
the same semantics with a distributed plan:

``with_global_rank(df, order_cols)``
    Distributed ``ROW_NUMBER() OVER (ORDER BY order_cols)``:

    1. ONE driver-side sampling pass (``takeSample`` over the
       column-pruned order keys, driver-bounded at <= 128k tuples) picks
       P-1 LITERAL boundary tuples — a manual range partitioner.
    2. ``__gr_pid`` = number of boundaries strictly below the row's key
       (a single JVM-side ``aggregate`` over the literal boundary array;
       lexicographic struct comparison). Because the boundaries are
       literals, pid is a PURE FUNCTION of the row: any subtree may
       recompute the scan and still agree. (The first cut of this module
       used repartitionByRange + spark_partition_id and relied on
       exchange reuse for the offset/rank subtrees to see the same
       sampled boundaries — Spark did NOT reuse the exchange, so each
       subtree re-sampled its own boundaries: a latent wrong-ranks bug
       at any scale where the sample is partial. Literal boundaries
       remove the consistency requirement instead of pinning it.)
    3. local rank: ``row_number()`` windowed BY ``__gr_pid`` — P distinct
       keys, one balanced range-bucket per task, never a single task.
    4. exclusive prefix offsets: a P-row count aggregate joined to itself
       (broadcast non-equi), never an unpartitioned window — so plan
       tests can assert zero unpartitioned window nodes wholesale.
    5. broadcast the P-row offset table back: ``rank = offset + local``.

``with_ntile(df, order_cols, n)``
    SQL ``NTILE(n) OVER (ORDER BY order_cols)`` by closed-form bucket
    arithmetic over the global rank — exactly SQL's tie semantics: with
    ``total`` rows, the first ``total % n`` buckets get ``total/n + 1``
    rows, the rest ``total/n``.

Balance caveat: rows whose FULL key tuple collides go to one bucket (SQL
ROW_NUMBER makes their relative order arbitrary, but a mega-tie is a hot
bucket) — pass a high-cardinality tie-break column (e.g. the row id) as
the last order col, exactly as you would for a deterministic ORDER BY.
NULL order keys sort into bucket 0, matching ASC NULLS FIRST.

Reference parity: no reference analog (kinesyslog is a single-process
engine where global order is free); this module exists because the
Spark-first plan must not collapse to one task at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SAMPLE_SEED = 8675309
_MAX_SAMPLE = 131072


def _boundary_tuples(
    df: DataFrame, order_cols: list[str], num_partitions: int
) -> list[tuple]:
    """P-1 boundary key tuples from a bounded driver-side sample
    (column-pruned scan; <= _MAX_SAMPLE rows ever reach the driver).

    The sample is drawn JVM-side as a partial top-N on a seeded rand()
    key (TakeOrderedAndProject: per-partition top-N, tiny driver merge)
    — NEVER via ``df.rdd.takeSample``, which deserializes every row
    through the Python serializer (measured ~7x the whole query's cost
    on a 600k-row rank at sf0.1)."""
    if num_partitions <= 1:
        return []
    target = min(max(num_partitions * 64, 1024), _MAX_SAMPLE)
    sample = (
        df.select(*order_cols)
        .orderBy(F.rand(_SAMPLE_SEED))
        .limit(target)
        .collect()
    )
    # Null keys compare NULLS FIRST into bucket 0; keep boundaries non-null
    # so the lexicographic Python sort below is well-defined.
    keys = sorted(
        tuple(r) for r in sample if all(v is not None for v in r)
    )
    if not keys:
        return []
    bounds: list[tuple] = []
    seen: set[tuple] = set()
    for i in range(1, num_partitions):
        t = keys[min(len(keys) - 1, (i * len(keys)) // num_partitions)]
        if t not in seen:
            seen.add(t)
            bounds.append(t)
    return bounds


def _pid_expr(
    df: DataFrame, order_cols: list[str], bounds: list[tuple]
) -> Column:
    """Bucket id = #boundaries strictly below the row's key — a FLAT sum
    of per-boundary lexicographic comparisons built from plain column
    ops, so the whole expression stays inside whole-stage codegen. (The
    first cut used F.aggregate over a literal struct array: higher-order
    functions evaluate INTERPRETED per element — 31 interpreted struct
    compares per row made the rank ~4x slower than the data pass it
    wraps.) Pure function of the row: recomputation-safe."""
    if not bounds:
        return F.lit(0)
    types = [f.dataType for f in df.select(*order_cols).schema.fields]

    def gt_bound(b: tuple) -> Column:
        cond = F.lit(False)
        eq = F.lit(True)
        for c, v, t in zip(order_cols, b, types):
            col, lit = F.col(c), F.lit(v).cast(t)
            cond = cond | (eq & (col > lit))
            eq = eq & (col == lit)
        return cond

    pid = F.lit(0)
    for b in bounds:
        pid = pid + F.when(gt_bound(b), 1).otherwise(0)
    return pid


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "grank",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + a 1-based ``rank_col`` = ROW_NUMBER() over the global order of
    ``order_cols`` (string column names), computed without any
    single-partition WindowExec. Ties on the full key tuple receive
    arbitrary relative order, same as SQL ROW_NUMBER."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
    bounds = _boundary_tuples(df, order_cols, num_partitions)
    local = df.withColumn(
        "__gr_pid", _pid_expr(df, order_cols, bounds).cast("int")
    ).withColumn(
        "__gr_lrank",
        F.row_number().over(
            Window.partitionBy("__gr_pid").orderBy(*order_cols)
        ),
    )
    pc = local.groupBy("__gr_pid").agg(
        F.count(F.lit(1)).alias("__gr_cnt")
    )
    prev = pc.select(
        F.col("__gr_pid").alias("__gr_pid2"),
        F.col("__gr_cnt").alias("__gr_cnt2"),
    )
    offs = (
        pc.join(
            F.broadcast(prev), F.col("__gr_pid2") < F.col("__gr_pid"), "left"
        )
        .groupBy("__gr_pid")
        .agg(F.coalesce(F.sum("__gr_cnt2"), F.lit(0)).alias("__gr_off"))
    )
    return (
        local.join(F.broadcast(offs), "__gr_pid")
        .withColumn(
            rank_col, (F.col("__gr_off") + F.col("__gr_lrank")).cast("long")
        )
        .drop("__gr_pid", "__gr_lrank", "__gr_off")
    )


def total_count_frame(ranked_or_df: DataFrame, rank_col: str) -> DataFrame:
    """1-row frame with the total row count, derived from the max rank."""
    return ranked_or_df.agg(F.max(rank_col).cast("long").alias("__gr_total"))


def ntile_from_rank(
    rank: Column, total: Column, n: int, out_type: str = "long"
) -> Column:
    """SQL NTILE(n) bucket for a 1-based global ``rank`` given ``total``
    rows — pure integer arithmetic, no window."""
    base = F.floor(total / n).cast("long")
    rem = (total % n).cast("long")
    cut = rem * (base + 1)
    bucket = F.when(
        rank <= cut, F.floor((rank - 1) / (base + 1)) + 1
    ).otherwise(
        rem + F.floor((rank - cut - 1) / F.greatest(base, F.lit(1))) + 1
    )
    return bucket.cast(out_type)


def with_ntile(
    df: DataFrame,
    order_cols: list[str],
    n: int,
    ntile_col: str = "ntile",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + ``ntile_col`` = NTILE(n) OVER (ORDER BY order_cols), scale-safe.

    The total row count rides a 1-row broadcast."""
    ranked = with_global_rank(
        df, order_cols, rank_col="__gr_rank", num_partitions=num_partitions
    )
    tot = total_count_frame(ranked, "__gr_rank")
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(
            ntile_col,
            ntile_from_rank(F.col("__gr_rank"), F.col("__gr_total"), n),
        )
        .drop("__gr_rank", "__gr_total")
    )


_HIST_BUCKETS = 4096
_FINAL_CAP = 65536  # <= this many candidate rows: sort them driver-side


def exact_rank_values(
    df: DataFrame,
    col: str,
    ranks: list[int],
    buckets: int = _HIST_BUCKETS,
    final_cap: int = _FINAL_CAP,
    bounds: tuple[float, float] | None = None,
    total: int | None = None,
) -> list[float]:
    """EXACT values at the given 1-based ascending global ranks of a
    numeric ``col`` — with NO full-column shuffle and NO sort of the
    data: iterative histogram selection.

    Each round runs ONE map-side-combined aggregate (per-bucket count +
    min + max; at most ``buckets`` rows ever shuffle or reach the
    driver), the driver locates the bucket span containing the target
    ranks by cumulative count, and the search narrows to that span.
    Rows are re-selected by the SAME floor-bucket expression that
    counted them (composed as a conjunction across rounds), never by
    re-derived float ranges — so pass-to-pass bookkeeping is exact even
    at bucket edges. When the span holds <= ``final_cap`` rows, one
    bounded collect sorts them driver-side and picks the values; when a
    span's min == max every remaining row is that value.

    This is the scale path for exact medians/quantiles: with_global_rank
    range-shuffles and sorts the ENTIRE column to read back two rows,
    while this needs log_B(n) cheap aggregates over an (ideally
    persisted) input — at 100 TB that is a handful of scans with tiny
    bucket-count shuffles instead of a full-corpus exchange per
    statistic. Typical depth: 1 min/max pass + 1-2 histogram passes +
    1 bounded collect.

    ``col`` must be numeric and non-null (filter/cast first; ranks are
    over the non-null ascending order). Far-apart ranks are resolved as
    independent per-bucket subproblems, so each refinement is
    guaranteed to shrink its region (a shared span covering all buckets
    would never narrow — the first cut looped on ranks {1, n}).

    Job batching (OPTIMIZATION_r12, guide §1.2/§2.6): all live regions
    of a depth level run as ONE Spark job per kind — one combined
    (region, bucket) aggregate for the regions still being narrowed and
    one combined bounded collect for the regions small enough to sort
    driver-side — instead of one job per region. A parent bucket's
    count IS its subregion's row count, so subregions skip the "how big
    am I" re-aggregate entirely. With k target ranks the driver holds
    at most k·final_cap candidate values at once (k is a handful:
    quantile probes, median pairs)."""
    targets = sorted(int(r) for r in ranks)
    x = F.col(col)
    base = df.filter(x.isNotNull())
    if bounds is None:
        row = base.agg(F.min(x).alias("lo"), F.max(x).alias("hi")).collect()[0]
        if row["lo"] is None:
            raise ValueError("exact_rank_values on an empty/all-null column")
        bounds = (float(row["lo"]), float(row["hi"]))
    out: dict[int, float] = {}
    # work regions: (pred, rows_ranked_below_region, vlo, vhi, targets,
    # row_count_or_None). The root's count is unknown (None) unless the
    # first histogram pass discovers it; every subregion inherits its
    # parent bucket's exact count.
    work: list[tuple] = [
        (F.lit(True), 0, bounds[0], bounds[1], targets, total)
    ]
    while work:
        narrow: list[tuple] = []   # regions that need a histogram pass
        small: list[tuple] = []    # regions ready for the bounded collect
        for reg in work:
            pred, below, vlo, vhi, tg, cnt = reg
            width = (vhi - vlo) / buckets
            # vlo == vhi: every row in the region is that value. width
            # not > 0: denormal underflow — the region spans < buckets
            # distinct representable doubles; vlo is exact-or-adjacent
            # (pathological, documented).
            if vlo == vhi or not (width > 0.0):
                out.update({t: vlo for t in tg})
            elif cnt is not None and cnt <= final_cap:
                small.append(reg)
            else:
                narrow.append(reg)
        work = []
        if small:
            # ONE collect for every small region: tag rows with their
            # region index, sort per region driver-side.
            pred_any = small[0][0]
            rid = F.when(small[0][0], 0)
            for i, reg in enumerate(small[1:], start=1):
                pred_any = pred_any | reg[0]
                rid = rid.when(reg[0], i)
            rows = (
                base.filter(pred_any)
                .select(rid.alias("_r"), x.alias("_x"))
                .collect()
            )
            byreg: dict[int, list[float]] = {i: [] for i in range(len(small))}
            for r in rows:
                byreg[r["_r"]].append(r["_x"])
            for i, (pred, below, vlo, vhi, tg, cnt) in enumerate(small):
                vs = sorted(byreg[i])
                out.update({t: float(vs[t - below - 1]) for t in tg})
        if not narrow:
            continue
        # ONE (region, bucket) aggregate for every region being narrowed.
        bexprs = []
        for pred, below, vlo, vhi, tg, cnt in narrow:
            width = (vhi - vlo) / buckets
            bexprs.append(
                F.least(
                    F.lit(buckets - 1),
                    F.floor((x - F.lit(vlo)) / F.lit(width)),
                ).cast("int")
            )
        pred_any = narrow[0][0]
        rid = F.when(narrow[0][0], 0)
        bsel = F.when(narrow[0][0], bexprs[0])
        for i, reg in enumerate(narrow[1:], start=1):
            pred_any = pred_any | reg[0]
            rid = rid.when(reg[0], i)
            bsel = bsel.when(reg[0], bexprs[i])
        hist = (
            base.filter(pred_any)
            .groupBy(rid.alias("_r"), bsel.alias("_b"))
            .agg(
                F.count(F.lit(1)).alias("_c"),
                F.min(x).alias("_lo"),
                F.max(x).alias("_hi"),
            )
            .collect()
        )
        per_region: dict[int, dict[int, tuple]] = {
            i: {} for i in range(len(narrow))
        }
        for r in hist:
            per_region[r["_r"]][r["_b"]] = (
                r["_c"], float(r["_lo"]), float(r["_hi"])
            )
        for i, (pred, below, vlo, vhi, tg, cnt) in enumerate(narrow):
            stats = per_region[i]
            total = sum(c for c, _, _ in stats.values())
            if total <= final_cap:
                # The region turned out small (count was unknown);
                # queue its bounded collect for the next round.
                work.append((pred, below, vlo, vhi, tg, total))
                continue
            # route each target to its bucket; one subproblem per hit
            # bucket, carrying the bucket's exact count.
            run = below
            unrouted = list(tg)
            bexpr = bexprs[i]
            for bi in sorted(stats):
                c, blo, bhi = stats[bi]
                hit = [t for t in unrouted if run < t <= run + c]
                if hit:
                    unrouted = [t for t in unrouted if t not in hit]
                    work.append(
                        (pred & (bexpr == bi), run, blo, bhi, hit, c)
                    )
                run += c
            if unrouted:
                raise IndexError(f"ranks {unrouted} outside 1..{run}")
    return [out[t] for t in targets]


def exact_median(df: DataFrame, col: str) -> tuple[float, int]:
    """Exact median of numeric ``col`` (average of the two middle values,
    SQL-style) via exact_rank_values; returns (median, n). Count and
    min/max ride ONE aggregate — which doubles as the materializing
    action when ``df`` was just persisted."""
    x = F.col(col)
    row = (
        df.filter(x.isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(x).alias("lo"),
            F.max(x).alias("hi"),
        )
        .collect()[0]
    )
    n = int(row["n"])
    if n == 0:
        raise ValueError("exact_median on an empty/all-null column")
    lo, hi = (n + 1) // 2, (n + 2) // 2
    a, b = exact_rank_values(
        df, col, [lo, hi],
        bounds=(float(row["lo"]), float(row["hi"])), total=n,
    )
    return (a + b) / 2.0, n


def _strictly_ahead(order: list[tuple[str, str]], left_prefix: str = ""):
    """Column predicate: row `b` (columns prefixed ``__b_``) sorts
    STRICTLY ahead of row `a` under the (col, 'asc'|'desc') spec —
    lexicographic, mixed directions, any comparable types."""
    cond = F.lit(False)
    eq = F.lit(True)
    for col, direction in order:
        a, b = F.col(col), F.col(f"__b_{col}")
        cmp = (b > a) if direction == "desc" else (b < a)
        cond = cond | (eq & cmp)
        eq = eq & (b == a)
    return cond


def small_frame_rank(
    df: DataFrame, order: list[tuple[str, str]], rank_col: str = "rn"
) -> DataFrame:
    """ROW_NUMBER over a SMALL frame without any window node:
    rank = 1 + #rows strictly ahead, via a broadcast non-equi self-join
    (O(n^2) comparisons). Use ONLY when n is bounded by a constant —
    top-k lists, spectra, week spines — where a single-partition
    WindowExec would be semantically fine but muddies the engine-wide
    'zero unpartitioned windows' plan invariant. Requires the order to
    be TOTAL (unique key tuple) and df rows to be distinct."""
    b = F.broadcast(
        df.select(
            *[F.col(c).alias(f"__b_{c}") for c, _ in order]
        )
    )
    joined = df.join(b, _strictly_ahead(order), "left")
    first_b = f"__b_{order[0][0]}"
    return (
        joined.groupBy(*df.columns)
        .agg((F.count(F.col(first_b)) + 1).cast("int").alias(rank_col))
    )
