"""Epoch-versioned snapshot state shared by the foreachBatch streaming
units (hll, quality, calibration, changelog, chunkstore, model_monitor,
spectral).

Contract (pinned by `tests/test_epoch_state.py`):

- A snapshot is COMPLETE iff ``state_dir/epoch=N/_SUCCESS`` exists —
  parquet's own commit marker, so a crash mid-write leaves the previous
  complete snapshot readable and the torn directory invisible.
- ``latest_state_epoch(...)`` resolves the newest complete snapshot;
  with ``before=E`` it resolves the newest one STRICTLY below E — the
  predecessor-retry rule: a retried epoch must re-merge into its
  predecessor's state, never into its own partial attempt. (MAX-merge
  consumers like HLL are retry-idempotent either way; SUM-merge
  consumers like streaming/quality.py are NOT, which is why the rule
  lives here and not per-module.)
- ``prune_state_epochs(...)`` is best-effort: a failed delete only
  leaves extra history, which latest-wins reads ignore.

All paths go through the Hadoop FileSystem API, so ``state_dir`` may
live on HDFS/object storage — matching the checkpointed-stream posture,
not just the driver's local disk.

Reference parity: none (the reference has no stateful streaming store;
its closest analogue is the spool's atomic temp+link, `spool.py:25-36`,
whose crash-safety posture this mirrors at epoch granularity).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

__all__ = [
    "list_state_epochs",
    "latest_state_epoch",
    "prune_state_epochs",
    "state_fs",
]


def state_fs(spark: SparkSession, state_dir: str):
    """(Hadoop FileSystem, Path) for a state directory — local, HDFS,
    or object store, decided by the path's scheme."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(state_dir)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def list_state_epochs(spark: SparkSession, state_dir: str) -> list[int]:
    """Epoch numbers of COMPLETE (_SUCCESS-marked) snapshots under
    state_dir, ascending."""
    fs, jpath = state_fs(spark, state_dir)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("epoch=")):
            continue
        try:
            n = int(name.split("=", 1)[1])
        except ValueError:
            continue
        jvm = spark._jvm
        if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")):
            out.append(n)
    return sorted(out)


def latest_state_epoch(
    spark: SparkSession, state_dir: str, before: int | None = None
) -> int | None:
    """Latest complete snapshot epoch; with ``before``, the latest one
    STRICTLY below it (the predecessor-retry rule — see module doc)."""
    epochs = list_state_epochs(spark, state_dir)
    if before is not None:
        epochs = [e for e in epochs if e < before]
    return epochs[-1] if epochs else None


def prune_state_epochs(spark: SparkSession, state_dir: str, keep: int) -> None:
    """Best-effort drop of snapshots with epoch < keep — a failed delete
    only leaves extra history (latest-wins read ignores it)."""
    fs, _ = state_fs(spark, state_dir)
    jvm = spark._jvm
    for n in list_state_epochs(spark, state_dir):
        if n < keep:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{state_dir}/epoch={n}"), True
            )
