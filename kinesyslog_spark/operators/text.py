"""Text shingling / hashing expression factories (dedup + fingerprinting).

Cross-engine determinism: every hash is `md5(<ascii prefix> || shingle)`
compared as a lowercase hex *string* — Spark `F.md5` and DuckDB `md5` both
emit lowercase hex over UTF-8 bytes, so MinHash signatures, SimHash bits
and winnowing fingerprints hash-match the DuckDB oracle with no
integer-endianness games.

Scale notes (100 TB posture):
- All factories return per-row array expressions: embarrassingly parallel,
  no shuffle, fully inside whole-stage codegen.
- MinHash-LSH candidate generation shuffles on the *band bucket* key only
  (b small buckets per doc), never the cross product; exact-Jaccard
  verification joins back by doc_id. Hot buckets (boilerplate docs) can be
  salted or capped upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"
HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")
SIMHASH_BITS = 64


def tokens(text: Column) -> Column:
    """Lowercased word tokens (the engine's canonical tokenizer).

    Implemented as split-on-complement + drop-empties, which produces
    the IDENTICAL token stream to `regexp_extract_all(lower, '[a-z0-9]+')`
    (the form the DuckDB oracles keep) but measured ~4x faster at sf0.1:
    split's regex walks each char once while extract_all re-anchors a
    find() per token."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != ""
    )


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams; caller must filter size(toks) >= n first
    (Spark `sequence(1, k)` with k < 1 would count *down*)."""
    parts = lambda i: [F.element_at(toks, i + j) for j in range(n)]  # noqa: E731
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", *parts(i)),
        )
    )


def char_grams(text: Column, n: int, distinct: bool = True) -> Column:
    """Character n-grams (positional unless distinct=True); caller must
    filter length(text) >= n."""
    grams = F.transform(
        F.sequence(F.lit(1), F.length(text) - (n - 1)),
        lambda i: F.substring(text, i, n),
    )
    return F.array_distinct(grams) if distinct else grams


def minhash_signature(shingles: Column, k: int = 12) -> list[Column]:
    """K MinHash values: min over shingles of md5('<i>:' || shingle).
    Lexicographic min over hex strings is a valid uniform min-hash.

    NOTE: higher-order functions run *interpreted* (outside whole-stage
    codegen); for corpus-scale signatures prefer minhash_df, which hashes
    in an exploded codegen pipeline with map-side partial MIN aggregation.

    The per-coordinate lambda MUST take exactly one argument: PySpark
    passes (element, index) to a TWO-argument transform lambda, so the
    old `lambda s, i=i:` form had its salt silently replaced by the
    index Column — the f-string then embedded the Column's plan-local
    variable name ("Column<'y_4'>:") as the salt. Still a valid
    (consistent-within-one-plan) hash family, which is why same-run
    dedup and the replay tests never caught it, but the family CHANGED
    on every plan build: signatures persisted in streaming state
    stopped matching after any query restart (found by the round-9
    coarse-layout parity test, which compares two independently built
    plans)."""

    def coord(i: int) -> Column:
        return F.array_min(
            F.transform(
                shingles, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s))
            )
        ).alias(f"mh{i}")

    return [coord(i) for i in range(k)]


def md5_int60(col: Column, prefix: str = "") -> Column:
    """First 15 hex digits of md5 as a 60-bit non-negative long.
    DuckDB twin: CAST('0x' || substring(md5(prefix || s), 1, 15) AS BIGINT)."""
    s = F.concat(F.lit(prefix), col) if prefix else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


MINHASH_MOD = 1 << 40  # 40-bit hash space for derived minhash functions


def minhash_df(df: DataFrame, id_cols: list[str], sh_col: str, k: int = 12) -> DataFrame:
    """MinHash signatures as a DataFrame op: explode shingles, hash each
    shingle ONCE, then K MIN aggregates over derived hash functions.

    The K functions come from the two-hash scheme (Kirsch-Mitzenmacher):
    h_i(s) = (h1(s) + i*h2(s)) mod 2^40, with h1/h2 = two 40-bit slices
    of one md5. One md5 per exploded row instead of K — at corpus scale
    the md5 over the shingle string is the dominant per-row cost, and
    K-universal independence is not required for MinHash accuracy.

    The hash is an *integer*, not the hex string: MIN over a fixed-width
    long keeps the aggregation in HashAggregate with map-side partial
    combine, whereas a string MIN buffer forces SortAggregate — a full
    sort of the exploded shingle stream (measured ~5x slower). The sum
    h1 + (k-1)*h2 stays < 2^44, far from 64-bit overflow, and both
    engines compute it in exact integer arithmetic (oracle twin:
    (CAST('0x'||substring(md5(s),1,10) AS BIGINT) + i *
     CAST('0x'||substring(md5(s),11,10) AS BIGINT)) % 2^40)."""
    ex = df.select(*id_cols, F.explode(sh_col).alias("_s"))
    hashed = ex.select(
        *id_cols,
        F.conv(F.substring(F.md5("_s"), 1, 10), 16, 10).cast("long").alias("_h1"),
        F.conv(F.substring(F.md5("_s"), 11, 10), 16, 10).cast("long").alias("_h2"),
    )
    aggs = [
        F.min(
            (F.col("_h1") + F.lit(i) * F.col("_h2")) % F.lit(MINHASH_MOD)
        ).alias(f"mh{i}")
        for i in range(k)
    ]
    return hashed.groupBy(*id_cols).agg(*aggs)


def lsh_band_keys(sig_cols: list[Column | str], bands: int, rows: int) -> Column:
    """array<struct<band_idx, band_key>> — md5 over each band's row slice
    (values joined with ',' so adjacent numbers can't alias)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in sig_cols]
    entries = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(",", *[c.cast("string") for c in cols[b * rows:(b + 1) * rows]])
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return F.array(*entries)


def simhash_fingerprint(toks: Column, bits: int = SIMHASH_BITS) -> Column:
    """`bits`-char '0'/'1' SimHash string over the token *multiset*.

    Bit j of a token = high bit of hex digit j of sha256(token) (i.e.
    digit in [8-f]); fingerprint bit j = sign of the +1/-1 sum across
    tokens. One pass over the token array: per-token bit vectors are
    zip_with-summed into an int accumulator array.
    """
    high = F.array(*[F.lit(h) for h in HEX_HIGH])
    per_token_bits = lambda h: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.lit(bits)),
        lambda j: F.when(F.array_contains(high, F.substring(h, j, 1)), 1).otherwise(-1),
    )
    scores = F.aggregate(
        F.transform(toks, lambda t: F.sha2(t, 256)),
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, per_token_bits(h), lambda a, b: a + b),
    )
    return F.concat_ws(
        "", F.transform(scores, lambda s: F.when(s > 0, "1").otherwise("0"))
    )


def simhash_df(df: DataFrame, id_cols: list[str], toks_col: str) -> DataFrame:
    """SimHash as a DataFrame op: explode tokens, one sha256 per token,
    64 SUM(+-1) aggregates (codegen + map-side partial aggregation), then
    assemble the '0'/'1' fingerprint string. ~10x the interpreted
    simhash_fingerprint path on wide corpora; identical output."""
    tok = df.select(*id_cols, F.explode(toks_col).alias("_t")).select(
        *id_cols, F.sha2(F.col("_t"), 256).alias("_h")
    )
    aggs = [
        F.sum(
            F.when(F.substring("_h", j, 1).isin(*HEX_HIGH), 1).otherwise(-1)
        ).alias(f"_s{j}")
        for j in range(1, SIMHASH_BITS + 1)
    ]
    sums = tok.groupBy(*id_cols).agg(*aggs)
    fp = F.concat(
        *[
            F.when(F.col(f"_s{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for j in range(1, SIMHASH_BITS + 1)
        ]
    )
    return sums.select(*id_cols, fp.alias("fp"))


def fp_halves(fp: Column) -> tuple[Column, Column]:
    """A 64-char '0'/'1' fingerprint as two 32-bit ints (for XOR-popcount
    hamming). 32-bit halves always fit a signed long after base-2 conv."""
    hi = F.conv(F.substring(fp, 1, 32), 2, 10).cast("long")
    lo = F.conv(F.substring(fp, 33, 32), 2, 10).cast("long")
    return hi, lo


def hamming_from_halves(hi_a: Column, lo_a: Column, hi_b: Column, lo_b: Column) -> Column:
    """Hamming via bit_count(xor) on the int halves — three codegen ops
    per pair vs. 64 string comparisons."""
    return (
        F.bit_count(hi_a.bitwiseXOR(hi_b)) + F.bit_count(lo_a.bitwiseXOR(lo_b))
    ).cast("int")


def hamming_distance(fp_a: Column, fp_b: Column, bits: int = SIMHASH_BITS) -> Column:
    """Hamming distance between two equal-length '0'/'1' strings.
    (Reference form; the hot path uses hamming_from_halves.)"""
    terms = [
        (F.substring(fp_a, j, 1) != F.substring(fp_b, j, 1)).cast("int")
        for j in range(1, bits + 1)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def jaccard(sh_a: Column, sh_b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    return inter / (F.size(sh_a) + F.size(sh_b) - inter).cast("double")


def winnow_fingerprints(text: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing (Schleimer et al. 2003, MOSS): hash the positional char
    k-grams, slide a w-window, keep each window's min hash, distinct.
    Caller must filter length(text) >= k + w - 1."""
    hs = F.transform(char_grams(text, k, distinct=False), lambda g: F.md5(g))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(hs) - (w - 1)),
            lambda i: F.array_min(F.slice(hs, i, w)),
        )
    )
