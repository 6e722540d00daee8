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

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"
HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")
SIMHASH_BITS = 64


def tokens(text: Column) -> Column:
    """Lowercased word tokens (the engine's canonical tokenizer)."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


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
    Lexicographic min over hex strings is a valid uniform min-hash."""
    return [
        F.array_min(
            F.transform(shingles, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"mh{i}")
        for i in range(k)
    ]


def lsh_band_keys(sig_cols: list[Column | str], bands: int, rows: int) -> Column:
    """array<struct<band_idx, band_key>> — md5 over each band's row slice."""
    assert len(sig_cols) == bands * rows if not isinstance(sig_cols[0], str) else True
    cols = [F.col(c) if isinstance(c, str) else c for c in sig_cols]
    entries = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(F.concat(*cols[b * rows:(b + 1) * rows])).alias("band_key"),
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


def hamming_distance(fp_a: Column, fp_b: Column, bits: int = SIMHASH_BITS) -> Column:
    """Hamming distance between two equal-length '0'/'1' strings."""
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
