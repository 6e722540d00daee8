"""Bucket-manifest snapshot store — the compaction lever for the
history-store streaming twins (round-10 verdict #3).

W12 (SCD2) and W28 (materialized view) fold each micro-batch into an
accumulated table. Their unpartitioned layouts rewrite the WHOLE table
every epoch even though a fold touches only the batch's keys — O(store)
per epoch, O(E * store) total, and for W12 the store itself grows with
epochs (closed SCD2 runs accumulate), making the total quadratic.

The lever: partition the store into B hash buckets of the key and keep
a MANIFEST mapping bucket -> the snapshot that last wrote it. Per
epoch:

  dirty  = distinct key-buckets of the batch (known BEFORE the fold)
  read   = only the dirty buckets' current parquet (manifest lookup)
  fold   = unchanged logic, restricted to dirty buckets' rows
  write  = snap-<epoch>/bucket=K for dirty buckets only
  publish= manifest-<epoch>.json = previous manifest + dirty remaps,
           pointed to by the K1 atomic temp+rename _CURRENT pointer

Per-epoch cost is then O(size of dirty buckets) ~ O(batch keys *
store / B / keys-per-bucket) — independent of accumulated history
length once B is sized to the key domain (at 1000 executors B is
thousands; the fold's shuffle key is already the store key, so bucket
pruning composes with ordinary partitioning).

Exactly-once/retry: the manifest file for an epoch is the idempotence
marker (a replayed epoch sees manifest-<epoch>.json and skips);
a crash between snapshot write and manifest publish re-runs the fold,
which overwrites the same snapshot dir. Vacuum deletes snapshots no
longer referenced by the last SNAPSHOT_RETENTION manifests.

Parity contract (pinned in tests/test_streaming_compaction.py): the
manifest read of all buckets is row-identical to the unpartitioned
fold's table after every epoch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32
SNAPSHOT_RETENTION = 3

_POINTER = "_CURRENT"


def bucket_col(key, n_buckets: int):
    """Deterministic bucket of a key column (Murmur3, fixed seed 42 in
    Spark — stable across sessions and plans)."""
    return F.pmod(F.hash(key), F.lit(n_buckets)).cast("int")


def _pointer_path(table_dir: str) -> str:
    return os.path.join(table_dir, _POINTER)


def current_manifest(table_dir: str) -> dict | None:
    """{'epoch': int, 'buckets': {bucket(str): snap_name}} or None."""
    try:
        with open(_pointer_path(table_dir)) as fh:
            name = fh.read().strip()
    except FileNotFoundError:
        return None
    if not name:
        return None
    with open(os.path.join(table_dir, name)) as fh:
        return json.load(fh)


def manifest_path_for(table_dir: str, epoch_id: int) -> str:
    return os.path.join(table_dir, f"manifest-{int(epoch_id):020d}.json")


def has_epoch(table_dir: str, epoch_id: int) -> bool:
    """Replay detection: the epoch's manifest is the applied marker."""
    return os.path.exists(manifest_path_for(table_dir, epoch_id))


def read_buckets(
    spark: SparkSession,
    table_dir: str,
    schema: str,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Current content of the given buckets (all buckets when None).
    Rows carry their `bucket` partition column plus `schema` columns."""
    man = current_manifest(table_dir)
    paths = []
    if man:
        for b, snap in man["buckets"].items():
            if buckets is not None and int(b) not in buckets:
                continue
            p = os.path.join(table_dir, snap, f"bucket={b}")
            # a dirty bucket whose fold output was EMPTY is remapped to
            # the epoch's snapshot without a bucket=K dir there — that
            # mapping means "currently empty", not "missing"
            if os.path.isdir(p):
                paths.append(p)
    if not paths:
        return spark.createDataFrame([], schema + ", bucket int")
    # leaf dirs are read directly (no partition discovery); the bucket
    # id is recovered from the file path
    return (
        spark.read.schema(schema)
        .parquet(*paths)
        .withColumn(
            "bucket",
            F.regexp_extract(F.input_file_name(), r"bucket=(\d+)", 1)
            .cast("int"),
        )
    )


def publish_epoch(
    table_dir: str,
    epoch_id: int,
    dirty: list[int],
    n_buckets: int,
) -> None:
    """Write manifest-<epoch> = previous manifest with the dirty
    buckets remapped to this epoch's snapshot, publish the pointer
    atomically, vacuum unreferenced snapshots.

    `dirty` MUST be the DECLARED dirty set (the batch's key buckets),
    not the snapshot dir's listing: a dirty bucket whose fold output is
    empty writes no bucket=K dir, and remapping only written buckets
    would leave its OLD mapping live — resurrecting rows the fold just
    deleted. Remapping it to a snapshot without that dir is the
    explicit empty marker (read_buckets skips missing dirs)."""
    man = current_manifest(table_dir) or {"epoch": -1, "buckets": {}}
    snap = f"snap-{int(epoch_id):020d}"
    buckets = dict(man["buckets"])
    for b in dirty:
        buckets[str(int(b))] = snap
    new_man = {
        "epoch": int(epoch_id),
        "n_buckets": int(n_buckets),
        "buckets": buckets,
    }
    mpath = manifest_path_for(table_dir, epoch_id)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(new_man, fh)
    os.replace(tmp, mpath)
    ptmp = _pointer_path(table_dir) + ".tmp"
    with open(ptmp, "w") as fh:
        fh.write(os.path.basename(mpath))
    os.replace(ptmp, _pointer_path(table_dir))
    _vacuum(table_dir)


def _vacuum(table_dir: str, keep: int = SNAPSHOT_RETENTION) -> int:
    """Remove snapshot dirs referenced by none of the newest `keep`
    manifests (older manifests are removed with them)."""
    import shutil

    manifests = sorted(
        d for d in os.listdir(table_dir)
        if d.startswith("manifest-") and d.endswith(".json")
    )
    live_manifests = manifests[-keep:] if keep else manifests
    live_snaps: set[str] = set()
    for m in live_manifests:
        try:
            with open(os.path.join(table_dir, m)) as fh:
                live_snaps.update(json.load(fh)["buckets"].values())
        except (OSError, ValueError):
            live_snaps.add("*keep-everything*")
            return 0
    n = 0
    for d in os.listdir(table_dir):
        full = os.path.join(table_dir, d)
        if d.startswith("snap-") and os.path.isdir(full) and d not in live_snaps:
            # never touch a snapshot newer than the newest manifest's —
            # it is a concurrent writer's in-flight epoch
            if live_manifests and d > "snap-" + live_manifests[-1][9:29]:
                continue
            shutil.rmtree(full, ignore_errors=True)
            n += 1
    for m in manifests[:-keep] if keep else []:
        try:
            os.remove(os.path.join(table_dir, m))
        except OSError:
            pass
        n += 1
    return n


def write_dirty_snapshot(
    df: DataFrame,
    table_dir: str,
    epoch_id: int,
    n_buckets: int,
    dirty: list[int] | None = None,
) -> list[int]:
    """Write `df` (which must already carry a `bucket` column and
    contain ONLY dirty buckets' rows) under snap-<epoch>/bucket=K.
    Returns the dirty bucket list (distinct buckets present).

    Pass the declared `dirty` list when known (the folds always know
    it — they collected it to prune the read): the frame is then
    repartitioned to ONE partition per dirty bucket before the
    dynamic-partition write. Without it, every shuffle-partition task
    writes a sliver into every dirty bucket dir — at 32 partitions x
    20 buckets that is ~640 tiny files plus per-file commit overhead,
    which the round-11 probe measured as the bucketed layout's entire
    wall-time deficit vs the plain fold (2.73 vs 1.36 s/epoch at 200k
    keys; with the repartition the bucketed fold is ~1.2 s/epoch —
    at-or-below plain — while keeping the 6-12x byte cut)."""
    snap_dir = os.path.join(table_dir, f"snap-{int(epoch_id):020d}")
    if dirty is not None:
        df = df.repartition(max(len(dirty), 1), "bucket")
    df.write.mode("overwrite").partitionBy("bucket").parquet(snap_dir)
    return [
        int(d.split("=", 1)[1])
        for d in os.listdir(snap_dir)
        if d.startswith("bucket=")
    ]
