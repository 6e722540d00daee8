"""Offline (numpy) probe for q27's SimHash blocking redesign.

Round-10 verdict: the 5x13-bit pigeonhole over raw sign bits sits ~150x
the uniform occupancy floor (SimHash sign bits are corpus-correlated:
common tokens push the per-bit +-1 sums the same way in every document,
so random doc pairs agree on far more than 32/64 bits). This probe
measures, engine-identically but outside Spark (hashlib + numpy, minutes
at sf1):

  1. per-bit sign agreement for random pairs (the bias to kill),
  2. the centered alternative (bit = per-bit sum > corpus lower median,
     the q175 rank-centering playbook applied to text),
  3. the TRUE-pair (sign-ham64 <= 4) hamming distribution in each
     candidate blocking space (what recall a pigeonhole guarantee needs),
  4. exact admitted-slot counts (sum C(n,2) over buckets) per scheme.

Usage: python tools/probe_simhash_blocking.py /root/testdata/sf0.1 [sf1 ...]
"""

from __future__ import annotations

import hashlib
import re
import sys

import numpy as np
import pyarrow.parquet as pq

TOKEN_RE = re.compile(r"[a-z0-9]+")
HAMMING_THR = 4


def doc_sums(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """((n_docs, 256) int32 per-bit +-1 sums over the token MULTISET,
    (n_docs,) token counts); bit (4j+k) = bit (3-k) of hex nibble j of
    sha256(token) — so columns 0,4,8,... (k=0, the nibble high bit) are
    EXACTLY the engine's 64 fingerprint dimensions (simhash_df)."""
    tok_id: dict[str, int] = {}
    vecs: list[np.ndarray] = []
    doc_toks: list[np.ndarray] = []
    for t in texts:
        ids = []
        for tok in TOKEN_RE.findall(t.lower()):
            i = tok_id.get(tok)
            if i is None:
                i = len(vecs)
                tok_id[tok] = i
                dig = hashlib.sha256(tok.encode()).digest()
                bits = np.unpackbits(np.frombuffer(dig, dtype=np.uint8))
                vecs.append(bits.astype(np.int8) * 2 - 1)
            ids.append(i)
        doc_toks.append(np.asarray(ids, dtype=np.int64))
    vm = np.stack(vecs).astype(np.int32)
    out = np.zeros((len(texts), 256), dtype=np.int32)
    ntok = np.zeros(len(texts), dtype=np.int64)
    for i, ids in enumerate(doc_toks):
        if len(ids):
            out[i] = vm[ids].sum(axis=0)
            ntok[i] = len(ids)
    return out, ntok


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """(n, k) bool -> (n, ceil(k/64)) uint64 for fast XOR-popcount."""
    n, k = bits.shape
    pad = (-k) % 8
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((n, pad), dtype=bool)], axis=1
        )
    by = np.packbits(bits, axis=1)
    w = by.shape[1]
    padw = (-w) % 8
    if padw:
        by = np.concatenate(
            [by, np.zeros((n, padw), dtype=np.uint8)], axis=1
        )
    return by.reshape(n, -1, 8).copy().view(np.uint64).reshape(n, -1)


def all_pairs_ham(packed: np.ndarray, thr: int) -> np.ndarray:
    """(m, 2) indices of pairs with hamming <= thr (chunked)."""
    n = packed.shape[0]
    out = []
    chunk = max(1, 2 * 10**8 // max(1, n * packed.shape[1]))
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        x = packed[s:e, None, :] ^ packed[None, :, :]
        h = popcount64(x).sum(axis=2)
        ii, jj = np.nonzero(h <= thr)
        keep = (ii + s) < jj
        out.append(np.stack([ii[keep] + s, jj[keep]], axis=1))
    return np.concatenate(out) if out else np.zeros((0, 2), dtype=int)


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    return _POP8[x.view(np.uint8)].reshape(*x.shape, 8).sum(
        axis=-1, dtype=np.int32
    )


def pair_ham(bits: np.ndarray, pairs: np.ndarray) -> np.ndarray:
    p = pack_bits(bits)
    x = p[pairs[:, 0]] ^ p[pairs[:, 1]]
    return popcount64(x).sum(axis=1)


def lower_median(s: np.ndarray) -> np.ndarray:
    """quantile_disc(0.5): value at ascending rank ceil(n/2), per column
    (the q175 tie semantics both engines implement)."""
    n = s.shape[0]
    k = (n + 1) // 2
    return np.sort(s, axis=0)[k - 1]


def block_slots(bits: np.ndarray, widths: list[int],
                max_bucket: int | None = 10_000) -> tuple[int, int]:
    """(admitted, cap_excluded) sum C(n,2) for exact-match blocking with
    consecutive blocks of the given widths."""
    adm = cap = 0
    off = 0
    n = bits.shape[0]
    for w in widths:
        blk = bits[:, off:off + w]
        off += w
        keys = pack_bits(blk)[:, 0]
        _, counts = np.unique(keys, return_counts=True)
        slots = counts.astype(np.int64) * (counts - 1) // 2
        if max_bucket:
            hot = counts > max_bucket
            cap += int(slots[hot].sum())
            adm += int(slots[~hot].sum())
        else:
            adm += int(slots.sum())
        del keys
    assert off == bits.shape[1] or off <= bits.shape[1]
    return adm, cap


def block_recall(bits: np.ndarray, widths: list[int],
                 pairs: np.ndarray,
                 max_bucket: int | None = 10_000) -> tuple[float, float]:
    """(recall, recall_ignoring_cap): fraction of `pairs` sharing >= 1
    admitted (non-hot) block / >= 1 block at all."""
    if len(pairs) == 0:
        return 1.0, 1.0
    hit = np.zeros(len(pairs), dtype=bool)
    hit_nocap = np.zeros(len(pairs), dtype=bool)
    off = 0
    for w in widths:
        blk = bits[:, off:off + w]
        off += w
        keys = pack_bits(blk)[:, 0]
        same = keys[pairs[:, 0]] == keys[pairs[:, 1]]
        hit_nocap |= same
        if max_bucket:
            _, inv, counts = np.unique(
                keys, return_inverse=True, return_counts=True
            )
            ok = counts[inv[pairs[:, 0]]] <= max_bucket
            hit |= same & ok
        else:
            hit |= same
    return float(hit.mean()), float(hit_nocap.mean())


def spread(widths_total: int, blocks: int) -> list[int]:
    base, rem = divmod(widths_total, blocks)
    return [base + (1 if b < rem else 0) for b in range(blocks)]


def snake_blocks(bits: np.ndarray, n_blocks: int) -> list[np.ndarray]:
    """Bias-balanced block assignment: rank bits by per-bit corpus
    P(majority) descending (ties by bit index), deal in serpentine
    order so every block gets an equal mix of biased and balanced bits.
    AM-GM: the sum over combos of per-combo collision products is
    minimized when block-level entropies are equal. Pure rank
    arithmetic — reproducible in SQL with one window function."""
    p1 = bits.mean(axis=0)
    pmaj = np.maximum(p1, 1 - p1)
    order = np.lexsort((np.arange(bits.shape[1]), -pmaj))
    blocks: list[list[int]] = [[] for _ in range(n_blocks)]
    for r, j in enumerate(order):
        idx = r % (2 * n_blocks)
        b = idx if idx < n_blocks else 2 * n_blocks - 1 - idx
        blocks[b].append(j)
    return [np.asarray(b) for b in blocks]


def combo_cols_from_blocks(blocks: list[np.ndarray],
                           k: int) -> list[np.ndarray]:
    from itertools import combinations

    return [np.concatenate([blocks[b] for b in c])
            for c in combinations(range(len(blocks)), k)]


def combo_cols(widths: list[int], k: int) -> list[np.ndarray]:
    """Column-index arrays for every k-block combination (generalized
    pigeonhole: <=4 errors over B blocks leave >= B-4 clean, so keying
    every (B-4)-combo of blocks preserves EXACT recall at ham<=4 while
    each key is k blocks wide)."""
    from itertools import combinations

    offs = np.cumsum([0] + widths)
    blocks = [np.arange(offs[b], offs[b + 1]) for b in range(len(widths))]
    return [np.concatenate([blocks[b] for b in c])
            for c in combinations(range(len(widths)), k)]


def combo_slots_recall(bits: np.ndarray, widths_or_blocks, k: int,
                       pairs: np.ndarray,
                       max_bucket: int | None = 10_000):
    if widths_or_blocks and isinstance(widths_or_blocks[0], np.ndarray):
        cols_list = combo_cols_from_blocks(widths_or_blocks, k)
    else:
        cols_list = combo_cols(widths_or_blocks, k)
    adm = cap = 0
    hit = np.zeros(len(pairs), dtype=bool) if len(pairs) else None
    for cols in cols_list:
        blk = np.ascontiguousarray(bits[:, cols])
        keys = pack_bits(blk)[:, 0]
        _, inv, counts = np.unique(keys, return_inverse=True,
                                   return_counts=True)
        slots = counts.astype(np.int64) * (counts - 1) // 2
        if max_bucket:
            hot = counts > max_bucket
            cap += int(slots[hot].sum())
            adm += int(slots[~hot].sum())
        else:
            adm += int(slots.sum())
        if hit is not None and len(pairs):
            same = keys[pairs[:, 0]] == keys[pairs[:, 1]]
            if max_bucket:
                same &= counts[inv[pairs[:, 0]]] <= max_bucket
            hit |= same
    rec = float(hit.mean()) if hit is not None else float("nan")
    return adm, cap, rec


def main() -> None:
    for sf_dir in sys.argv[1:]:
        t = pq.read_table(sf_dir + "/documents.parquet",
                          columns=["doc_id", "text"])
        texts = t.column("text").to_pylist()
        n = len(texts)
        print(f"\n=== {sf_dir} ({n} docs) ===")
        s, ntok = doc_sums(texts)
        sign64 = s[:, ::4] > 0            # engine fingerprint bits
        med = lower_median(s)
        cent = s > med                     # 256 centered bits
        cent64 = cent[:, ::4]
        # length-NORMALIZED centering: s_j/n_toks is the per-doc mean,
        # invariant to doc length, so near-dups of unequal length stay
        # close in this space (raw sums scale with length — the recall
        # killer the first probe run measured).
        norm = s.astype(np.float64) / np.maximum(ntok, 1)[:, None]
        nmed = lower_median(norm)
        ncent = norm > nmed
        ncent64 = ncent[:, ::4]
        # sign over ALL 256 sha256 bits: scale-invariant like the 64-bit
        # engine fingerprint (threshold at 0), so true pairs stay stable,
        # but 4x the independent dimensions to block on.
        sign256 = s > 0

        # per-bit stats
        frac1 = sign64.mean(axis=0)
        agree = (frac1**2 + (1 - frac1) ** 2)
        print(f"sign64 bit P(1): min {frac1.min():.3f} med "
              f"{np.median(frac1):.3f} max {frac1.max():.3f}; "
              f"mean random-pair per-bit agreement {agree.mean():.4f}")
        fc = cent.mean(axis=0)
        print(f"cent256 bit P(1): min {fc.min():.3f} med "
              f"{np.median(fc):.3f} max {fc.max():.3f}")

        # true pairs (engine semantics) — cap the quadratic at 5k docs
        # (recall of the combo schemes is structural: pigeonhole)
        if n <= 5_000:
            pairs = all_pairs_ham(pack_bits(sign64), HAMMING_THR)
            print(f"true sign-ham<=4 pairs: {len(pairs)}")
            if len(pairs):
                dl = np.abs(ntok[pairs[:, 0]] - ntok[pairs[:, 1]])
                rel = dl / np.maximum(
                    np.minimum(ntok[pairs[:, 0]], ntok[pairs[:, 1]]), 1)
                print(f"  true-pair |dtoks|: med {np.median(dl):.0f} "
                      f"max {dl.max()}; rel med {np.median(rel):.3f} "
                      f"max {rel.max():.3f}")
            for name, bits in [("cent64", cent64), ("cent256", cent),
                               ("ncent64", ncent64), ("ncent256", ncent),
                               ("sign256", sign256)]:
                h = pair_ham(bits, pairs) if len(pairs) else np.array([])
                if len(h):
                    q = np.percentile(h, [50, 90, 99, 100])
                    print(f"  true-pair ham in {name}: med {q[0]:.0f} "
                          f"p90 {q[1]:.0f} p99 {q[2]:.0f} max {q[3]:.0f}")
        else:
            pairs = np.zeros((0, 2), dtype=int)
            print("true pairs: skipped (quadratic)")

        floor64 = sum(n * (n - 1) / 2 / 2**w for w in spread(64, 5))
        schemes = [("sign64 5x13 (current)", sign64, spread(64, 5))]
        if n <= 5_000:  # dead-end families kept for the record
            schemes += [
                ("cent64 5x13", cent64, spread(64, 5)),
                ("cent64 8x8", cent64, spread(64, 8)),
                ("cent256 16x16", cent, spread(256, 16)),
                ("ncent64 5x13", ncent64, spread(64, 5)),
                ("ncent64 8x8", ncent64, spread(64, 8)),
                ("ncent256 16x16", ncent, spread(256, 16)),
                ("sign256 16x16", sign256, spread(256, 16)),
                ("sign256 12x21", sign256[:, :252], spread(252, 12)),
            ]
        for name, bits, widths in schemes:
            adm, cap = block_slots(bits, widths)
            fl = sum(n * (n - 1) / 2 / 2**w for w in widths)
            line = (f"{name:24s} adm {adm:>14,} cap {cap:>14,} "
                    f"(x{(adm + cap) / max(fl, 1):,.1f} floor)")
            if len(pairs):
                r, rn = block_recall(bits, widths, pairs)
                line += f" recall {r:.4f} (nocap {rn:.4f})"
            print(line)
        print(f"(5x13 uniform floor at this n: {floor64:,.0f})")
        from math import comb
        for bl, k in [(6, 2), (7, 3), (8, 4), (9, 5), (10, 6)]:
            w = spread(64, bl)
            adm, cap, rec = combo_slots_recall(sign64, w, k, pairs)
            print(f"sign64 {bl}-block C({bl},{k})={comb(bl, k)} combos "
                  f"adm {adm:>14,} cap {cap:>14,} recall {rec:.4f}")

        # distinct-fingerprint variant: identical fps collapse to one
        # representative before blocking (ham-0 pairs come from the fp
        # GROUP, the blocking quadratic runs on distinct fps only; a
        # found group pair expands to m_a*m_b doc pairs — output-bound).
        packed = pack_bits(sign64)
        ufp, m = np.unique(packed, axis=0, return_counts=True)
        ubits = np.unpackbits(
            ufp.view(np.uint8), axis=1
        ).astype(bool)[:, :64]
        ham0 = int((m.astype(np.int64) * (m - 1) // 2).sum())
        print(f"distinct fps: {len(ufp):,} of {n:,}; ham-0 pairs "
              f"(direct, not slots): {ham0:,}")
        nop = np.zeros((0, 2), dtype=int)
        adm, cap = block_slots(ubits, spread(64, 5))
        print(f"  distinct-fp 5x13 (current blocks): adm {adm:>14,} "
              f"cap {cap:>14,}")
        for bl, k in [(7, 3), (8, 4), (9, 5), (10, 6)]:
            w = spread(64, bl)
            adm, cap, _ = combo_slots_recall(ubits, w, k, nop)
            print(f"  distinct-fp {bl}-block C({bl},{k}): "
                  f"adm {adm:>14,} cap {cap:>14,}")

        # bias-balanced (snake) block assignment + cap sensitivity
        for bl, k in [(8, 4), (9, 5), (10, 6), (11, 7)]:
            sb = snake_blocks(sign64, bl)
            adm, cap, rec = combo_slots_recall(sign64, sb, k, pairs)
            rtxt = f" recall {rec:.4f}" if len(pairs) else ""
            print(f"snake {bl}-block C({bl},{k}): adm {adm:>14,} "
                  f"cap {cap:>14,}{rtxt}")
        for mb in (2_000, 1_000):
            sb = snake_blocks(sign64, 10)
            adm, cap, rec = combo_slots_recall(sign64, sb, 6, pairs,
                                               max_bucket=mb)
            rtxt = f" recall {rec:.4f}" if len(pairs) else ""
            print(f"snake 10-block C(10,6) cap={mb}: adm {adm:>14,} "
                  f"cap {cap:>14,}{rtxt}")
        # snake + distinct-fp (the two levers stacked)
        for bl, k in [(10, 6), (11, 7)]:
            sb = snake_blocks(sign64, bl)  # stats from full corpus
            adm, cap, _ = combo_slots_recall(ubits, sb, k, nop)
            print(f"snake+distinct-fp {bl}-block C({bl},{k}): "
                  f"adm {adm:>14,} cap {cap:>14,}")


if __name__ == "__main__":
    main()
