"""Contract test for streaming/epoch_state.py — the epoch-versioned
snapshot store shared by six streaming units (round-6 verdict #3: the
machinery used to live as hll.py privates; this pins the extracted
public contract in one place)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kinesyslog_spark.streaming.epoch_state import (
    latest_state_epoch,
    list_state_epochs,
    prune_state_epochs,
)


def _write_epoch(spark, state, n, rows=3):
    spark.range(rows).select(
        F.col("id").alias("j"), F.lit(n).alias("m_j")
    ).coalesce(1).write.mode("overwrite").parquet(f"{state}/epoch={n}")


def test_missing_dir_and_empty_dir(spark, tmp_path):
    state = str(tmp_path / "none")
    assert list_state_epochs(spark, state) == []
    assert latest_state_epoch(spark, state) is None
    os.makedirs(state)
    assert list_state_epochs(spark, state) == []


def test_incomplete_snapshot_is_invisible(spark, tmp_path):
    # a directory without _SUCCESS (torn write / crash mid-commit) must
    # never be resolved — readers stay on the previous complete epoch
    state = str(tmp_path / "state")
    _write_epoch(spark, state, 0)
    _write_epoch(spark, state, 1)
    os.remove(f"{state}/epoch=1/_SUCCESS")
    assert list_state_epochs(spark, state) == [0]
    assert latest_state_epoch(spark, state) == 0
    # junk entries (files, non-numeric epochs) are skipped, not fatal
    open(f"{state}/epoch=zz", "w").close()
    os.makedirs(f"{state}/epoch=abc")
    assert list_state_epochs(spark, state) == [0]


def test_predecessor_retry_rule(spark, tmp_path):
    # a retried epoch E must merge into the latest epoch STRICTLY
    # below E — its own partial attempt (already on disk as epoch=E)
    # must not be its merge base, or SUM-merge consumers double-count
    state = str(tmp_path / "state")
    for n in (3, 5, 7):
        _write_epoch(spark, state, n)
    assert latest_state_epoch(spark, state) == 7
    assert latest_state_epoch(spark, state, before=7) == 5
    assert latest_state_epoch(spark, state, before=5) == 3
    assert latest_state_epoch(spark, state, before=3) is None
    # before= an epoch that was never written: still the strict floor
    assert latest_state_epoch(spark, state, before=6) == 5


def test_prune_keeps_from_keep_onward(spark, tmp_path):
    state = str(tmp_path / "state")
    for n in range(4):
        _write_epoch(spark, state, n)
    prune_state_epochs(spark, state, keep=2)
    assert list_state_epochs(spark, state) == [2, 3]
    assert not os.path.isdir(f"{state}/epoch=0")
    assert not os.path.isdir(f"{state}/epoch=1")
    # pruning an empty/missing dir is a no-op, not an error
    prune_state_epochs(spark, str(tmp_path / "none"), keep=10)


def test_no_cross_module_private_imports():
    # the round-6 hygiene claim itself: no streaming module reaches
    # into another module's underscore names
    import glob
    import re

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "kinesyslog_spark",
        "streaming",
    )
    pat = re.compile(
        r"from kinesyslog_spark\.streaming\.\w+ import[^\n]*\b_[a-z]"
    )
    offenders = []
    for f in glob.glob(f"{pkg}/*.py"):
        src = open(f).read()
        # multiline import blocks: normalize parens to one line
        flat = re.sub(
            r"\(([^)]*)\)", lambda m: m.group(1).replace("\n", " "), src
        )
        if pat.search(flat):
            offenders.append(os.path.basename(f))
    assert offenders == []
