"""Round-10 verdict #3 — the bucket-manifest / base-compaction layouts
for the history-store twins (W12 SCD2, W28 changelog view, W30 chunk
store): per-epoch parity with the unpartitioned fold after EVERY
epoch, dirty-bucket-only writes, replay idempotence, and W30's base
compaction preserving the store across the consolidation boundary."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from kinesyslog_spark.streaming import bucketstore as bs

B = 8  # small bucket count so tests exercise multi-bucket + pruning


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts_ms long, ord long, tier string"
    )


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_w12_bucketed_parity_and_dirty_writes(spark, tmp_path):
    from kinesyslog_spark.streaming.cdc import (
        apply_epoch,
        apply_epoch_bucketed,
        read_scd2,
        read_scd2_bucketed,
        scd2_apply_batch,
    )

    plain = str(tmp_path / "plain")
    buck = str(tmp_path / "buck")
    # three epochs: epoch 0 seeds many keys, epochs 1-2 touch few keys
    epochs = [
        [(u, 1000 + u, u, "lo") for u in range(40)],
        [(3, 5000, 100, "hi"), (3, 6000, 101, "hi"), (7, 5500, 102, "hi")],
        [(3, 9000, 200, "lo"), (11, 9500, 201, "hi")],
    ]
    for e, rows in enumerate(epochs):
        ch = _ev(spark, rows)
        apply_epoch(spark, plain, e, ch)
        assert apply_epoch_bucketed(spark, buck, e, ch, n_buckets=B)
        want = _canon(read_scd2(spark, plain).collect())
        got = _canon(read_scd2_bucketed(spark, buck).collect())
        assert got == want, f"bucketed table diverged after epoch {e}"
    # dirty-bucket writes: the last epoch touched 2 keys -> its snapshot
    # holds at most 2 bucket dirs, NOT the whole table
    snap2 = os.path.join(buck, f"snap-{2:020d}")
    dirs = [d for d in os.listdir(snap2) if d.startswith("bucket=")]
    assert 1 <= len(dirs) <= 2
    # replay idempotence: manifest is the marker
    before = _canon(read_scd2_bucketed(spark, buck).collect())
    assert apply_epoch_bucketed(
        spark, buck, 2, _ev(spark, epochs[2]), n_buckets=B
    ) is False
    assert _canon(read_scd2_bucketed(spark, buck).collect()) == before
    # final table also equals the one-shot batch fold of everything
    allrows = [r for e in epochs for r in e]
    want = _canon(scd2_apply_batch(None, _ev(spark, allrows)).collect())
    assert before == want


def test_w28_bucketed_parity_changelog_and_retry(spark, tmp_path):
    from kinesyslog_spark.streaming.changelog import (
        apply_changelog,
        make_fold,
        make_fold_bucketed,
        read_view_bucketed,
    )

    def events(rows):
        return spark.createDataFrame(rows, "event_type string, value long")

    pout, pstate = str(tmp_path / "po"), str(tmp_path / "ps")
    bout, bstate = str(tmp_path / "bo"), str(tmp_path / "bs")
    plain = make_fold(pout, pstate, "event_type", "value")
    buck = make_fold_bucketed(bout, bstate, "event_type", "value",
                              n_buckets=B)
    epochs = [
        [(f"k{i}", i) for i in range(20)],
        [("k3", 10), ("k3", 20), ("k7", 5)],
        [("k3", 1), ("knew", 9)],
    ]
    for e, rows in enumerate(epochs):
        plain(events(rows), e)
        buck(events(rows), e)
        want = _canon(
            spark.read.parquet(f"{pstate}/epoch={e}").collect()
        )
        got = _canon(read_view_bucketed(spark, bstate).collect())
        assert got == want, f"bucketed view diverged after epoch {e}"
        lw = _canon(spark.read.parquet(f"{pout}/epoch_id={e}").collect())
        lg = _canon(spark.read.parquet(f"{bout}/epoch_id={e}").collect())
        assert lg == lw, f"changelog diverged at epoch {e}"
    # replaying the last epoch must change nothing (SUM-merge would
    # double-apply without the manifest marker)
    before = _canon(read_view_bucketed(spark, bstate).collect())
    buck(events(epochs[2]), 2)
    assert _canon(read_view_bucketed(spark, bstate).collect()) == before
    # the defining changelog contract still reconstructs the view
    log = spark.read.parquet(f"{bout}/epoch_id=0", f"{bout}/epoch_id=1",
                             f"{bout}/epoch_id=2")
    rec = _canon(apply_changelog(log).collect())
    view = _canon(
        read_view_bucketed(spark, bstate).select("key", "cnt", "total")
        .collect()
    )
    assert rec == view


@pytest.mark.slow
def test_w30_bucketed_compaction_preserves_store(spark, tmp_path):
    from kinesyslog_spark.streaming.chunkstore import (
        batch_chunk_occurrences,
        make_fold_bucketed,
        read_store,
    )

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    state, out = str(tmp_path / "st"), str(tmp_path / "out")
    fold = make_fold_bucketed(state, out, n_buckets=B, compact_every=3)
    all_rows = []
    for e in range(8):
        rows = [
            (100 * e + i,
             f"epoch {e} doc {i} " + "common shared tail text " * 3)
            for i in range(3)
        ]
        all_rows += rows
        fold(docs(rows), e)
        got = {
            (r.chash, r.nbytes)
            for r in read_store(spark, state).collect()
        }
        want = {
            (r.chash, r.nbytes)
            for r in batch_chunk_occurrences(docs(all_rows)).collect()
        }
        assert got == want, f"store diverged after epoch {e}"
    # compaction actually ran: a base dir exists and old epoch dirs
    # are gone (<= compact_every epoch dirs remain)
    bases = [d for d in os.listdir(state) if d.startswith("base=")]
    epochs_left = [d for d in os.listdir(state) if d.startswith("epoch=")]
    assert bases, "no base dir — compaction never triggered"
    assert len(epochs_left) <= 3 + 1
    # replaying the newest epoch admits nothing new (store unchanged)
    n_before = read_store(spark, state).count()
    fold(docs(all_rows[-3:]), 7)
    assert read_store(spark, state).count() == n_before
    # every epoch dir and base is bucket-partitioned
    for d in bases + epochs_left:
        subs = os.listdir(os.path.join(state, d))
        assert any(s.startswith("bucket=") for s in subs), d


def test_bucketstore_vacuum_keeps_referenced_snapshots(spark, tmp_path):
    """Only snapshots referenced by the newest SNAPSHOT_RETENTION
    manifests survive; the current table stays readable throughout."""
    from kinesyslog_spark.streaming.cdc import (
        apply_epoch_bucketed,
        read_scd2_bucketed,
    )

    table = str(tmp_path / "t")
    for e in range(bs.SNAPSHOT_RETENTION + 4):
        rows = [(e % 3, 1000 * (e + 1), e, "hi" if e % 2 else "lo")]
        apply_epoch_bucketed(spark, table, e, _ev(spark, rows), n_buckets=B)
        assert read_scd2_bucketed(spark, table).count() > 0
    manifests = [
        d for d in os.listdir(table) if d.startswith("manifest-")
    ]
    assert len(manifests) <= bs.SNAPSHOT_RETENTION
    # epoch 0's snapshot was remapped away and must be vacuumed
    # (same single key bucket rewritten every 3rd epoch)
    assert f"snap-{0:020d}" not in os.listdir(table)

@pytest.mark.slow
def test_w30_compaction_crash_replay_converges(spark, tmp_path):
    """ADVICE r11 (chunkstore.py): a crash AFTER the base=<E-1> _SUCCESS
    publish but BEFORE the compacted epoch dirs are removed must not
    wedge the replayed epoch — the retry used to read base=<E-1> and
    write mode('overwrite') to the same path (Spark refuses), and the
    stale sub-floor epoch dirs retriggered compaction forever. The fix
    skips the re-compaction and finishes the interrupted cleanup."""
    import shutil

    from kinesyslog_spark.streaming.chunkstore import (
        batch_chunk_occurrences,
        make_fold_bucketed,
        read_store,
    )

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    state, out = str(tmp_path / "st"), str(tmp_path / "out")
    fold = make_fold_bucketed(state, out, n_buckets=B, compact_every=3)
    all_rows = []
    for e in range(3):
        rows = [(100 * e + i, f"ep {e} doc {i} " + "shared tail " * 4)
                for i in range(3)]
        all_rows += rows
        fold(docs(rows), e)
    # snapshot the pre-compaction epoch dirs, then run epoch 3 (which
    # compacts epochs 0-2 into base=2 and removes them)
    pre = str(tmp_path / "pre")
    shutil.copytree(state, pre)
    rows3 = [(300 + i, f"ep 3 doc {i} " + "shared tail " * 4)
             for i in range(3)]
    all_rows += rows3
    fold(docs(rows3), 3)
    assert any(d.startswith("base=") for d in os.listdir(state))
    # simulate the crash: restore the already-compacted epoch dirs so
    # the on-disk state is {base=2 (_SUCCESS), epoch=0..3}
    for d in os.listdir(pre):
        if d.startswith("epoch=") and d not in os.listdir(state):
            shutil.copytree(os.path.join(pre, d), os.path.join(state, d))
    assert len([d for d in os.listdir(state) if d.startswith("epoch=")]) == 4
    # foreachBatch replays epoch 3 — must neither raise nor duplicate
    fold(docs(rows3), 3)
    got = {(r.chash, r.nbytes) for r in read_store(spark, state).collect()}
    want = {(r.chash, r.nbytes)
            for r in batch_chunk_occurrences(docs(all_rows)).collect()}
    assert got == want, "store diverged after crash-replay"
    # the interrupted cleanup converged: sub-floor epoch dirs are gone
    left = sorted(int(d.split("=")[1]) for d in os.listdir(state)
                  if d.startswith("epoch="))
    assert left == [3], left
    # and the next epoch folds normally without retriggering compaction
    rows4 = [(400, "ep 4 doc " + "shared tail " * 4)]
    all_rows += rows4
    fold(docs(rows4), 4)
    got = {(r.chash, r.nbytes) for r in read_store(spark, state).collect()}
    want = {(r.chash, r.nbytes)
            for r in batch_chunk_occurrences(docs(all_rows)).collect()}
    assert got == want


def test_bucketstore_dirty_empty_bucket_is_explicit_empty(spark, tmp_path):
    """ADVICE r11 (bucketstore.py): a dirty bucket whose fold output is
    EMPTY must be remapped (to an explicit empty marker), not left on
    its old mapping — otherwise deleted rows resurrect."""
    table = str(tmp_path / "t")
    os.makedirs(table)
    schema = "key long, val string"
    base = spark.createDataFrame(
        [(k, f"v{k}") for k in range(8)], schema
    ).withColumn("bucket", bs.bucket_col(F.col("key"), B))
    by_bucket = {}
    for r in base.collect():
        by_bucket.setdefault(r.bucket, []).append(r.key)
    b_kill, b_keep = sorted(by_bucket)[:2]
    dirty0 = sorted(by_bucket)
    bs.write_dirty_snapshot(base, table, 0, B)
    bs.publish_epoch(table, 0, dirty0, B)
    assert bs.read_buckets(spark, table, schema).count() == 8
    # epoch 1: bucket b_kill is dirty and its fold output is empty
    empty = spark.createDataFrame([], schema + ", bucket int")
    bs.write_dirty_snapshot(empty, table, 1, B)
    bs.publish_epoch(table, 1, [b_kill], B)
    got = {r.key for r in bs.read_buckets(spark, table, schema).collect()}
    want = {k for b, ks in by_bucket.items() if b != b_kill for k in ks}
    assert got == want, "emptied dirty bucket resurrected its old rows"
    assert bs.read_buckets(
        spark, table, schema, buckets=[b_kill]
    ).count() == 0
    assert bs.read_buckets(
        spark, table, schema, buckets=[b_keep]
    ).count() == len(by_bucket[b_keep])
