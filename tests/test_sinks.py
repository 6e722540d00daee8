"""Record envelope build → gzip/split → atomic spool → read-back round
trip (G1-G5, K1, E3), plus upload batch packing (K2)."""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import functions as F

from kinesyslog_spark.constants import MAX_BATCH_COUNT, MAX_RECORD_SIZE
from kinesyslog_spark.sinks.records import (
    _split_serialize,
    build_envelopes,
    iter_record_parts,
    pack_upload_batches,
    read_spool,
    spool_batch,
    spool_write,
)


def _events(spark, n=50):
    return spark.range(n).select(
        F.format_string("id-%04d", F.col("id")).alias("id"),
        (F.lit(1700000000000) + F.col("id") * 1000).alias("ts_ms"),
        F.format_string("msg %d", F.col("id")).alias("message"),
        F.concat(F.lit("10.0.0."), (F.col("id") % 3).cast("string")).alias("source"),
        F.when(F.col("id") % 2 == 0, 514).otherwise(6514).alias("dest"),
    )


def test_envelope_shape(spark):
    env = build_envelopes(_events(spark)).collect()
    assert len(env) == 6  # 3 sources x 2 ports
    row = next(r for r in env if r["logStream"] == "10.0.0.0" and r["logGroup"].endswith("/514"))
    assert row["messageType"] == "DATA_MESSAGE"
    assert row["subscriptionFilters"] == [row["logGroup"]]
    evs = row["logEvents"]
    # ordered by timestamp within the record
    assert [e["timestamp"] for e in evs] == sorted(e["timestamp"] for e in evs)
    assert evs[0]["id"].startswith("id-")


def test_split_oversize_record():
    rec = {
        "owner": "0", "logGroup": "g", "logStream": "s",
        "subscriptionFilters": ["g"], "messageType": "DATA_MESSAGE",
        # incompressible-ish payload to force a split
        "logEvents": [
            {"id": str(i), "timestamp": i, "message": os.urandom(1024).hex()}
            for i in range(2000)
        ],
    }
    parts = _split_serialize(rec)
    assert len(parts) >= 2
    assert all(len(p) <= MAX_RECORD_SIZE for p in parts)
    # no event lost or duplicated across the split
    ids = [
        e["id"]
        for p in parts
        for e in json.loads(gzip.decompress(p))["logEvents"]
    ]
    assert ids == [str(i) for i in range(2000)]


def test_dump_cli_filters(spark, tmp_path, capsys):
    """E3 reader CLI: U1 group-prefix, U2 min-length, U3 explode+trim."""
    from kinesyslog_spark.cli import main
    from kinesyslog_spark.sinks.records import spool_batch

    spool_dir = str(tmp_path / "spool")
    spool_batch(_events(spark, n=6), spool_dir)
    rc = main(["dump", spool_dir, "--group", "kinesyslog/syslog/514",
               "--min-length", "6", "--show-source"])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    # port 514 = even ids 0,2,4; "msg 0".."msg 4" are 5 chars -> all pass
    # min-length 6? no: "msg 0" is 5 chars, filtered out entirely
    assert lines == []
    rc = main(["dump", spool_dir, "--group", "kinesyslog/syslog/514",
               "--min-length", "5", "--show-source"])
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert [ln.split("\t")[1] for ln in lines] == ["msg 0", "msg 2", "msg 4"]
    assert all(ln.split("\t")[0].startswith("10.0.0.") for ln in lines)


def test_spool_write_atomic(tmp_path):
    path = spool_write(b"payload", str(tmp_path))
    assert os.path.basename(path).startswith("firehose_event-")
    assert not [n for n in os.listdir(tmp_path) if n.startswith("_temp")]
    assert open(path, "rb").read() == b"payload"


def test_multi_member_gzip_roundtrip():
    rec = {"owner": "0", "logGroup": "g", "logStream": "s",
           "subscriptionFilters": ["g"], "messageType": "DATA_MESSAGE",
           "logEvents": [{"id": "1", "timestamp": 1, "message": "m"}]}
    blob = gzip.compress(json.dumps(rec).encode()) * 3  # concatenated members
    parts = list(iter_record_parts(blob))
    assert len(parts) == 3 and all(p == rec for p in parts)


def test_spool_batch_roundtrip(spark, tmp_path):
    spool_dir = str(tmp_path / "spool")
    events = _events(spark)
    n = spool_batch(events, spool_dir)
    assert n == 6
    back = read_spool(spark, spool_dir)
    flat = back.select(F.explode("logEvents").alias("e")).select(
        F.col("e.id").alias("id"), F.col("e.timestamp").alias("ts_ms"),
        F.col("e.message").alias("message"),
    )
    orig = {(r["id"], r["ts_ms"], r["message"]) for r in events.collect()}
    got = {(r["id"], r["ts_ms"], r["message"]) for r in flat.collect()}
    assert got == orig


def test_pack_upload_batches():
    sizes = [(f"f{i}", 1) for i in range(MAX_BATCH_COUNT + 10)]
    batches = pack_upload_batches(sizes)
    assert [len(b) for b in batches] == [MAX_BATCH_COUNT, 10]
    big = [("a", 3 * 1024 * 1024), ("b", 3 * 1024 * 1024), ("c", 10)]
    assert pack_upload_batches(big) == [["a"], ["b", "c"]]


def test_spool_batch_count_ignores_preexisting_files(spark, tmp_path):
    """The return value counts records WRITTEN THIS BATCH (via an
    accumulator), not whatever os.listdir sees — pre-existing and
    prior-batch spool files must not inflate it."""
    spool_dir = str(tmp_path / "spool2")
    events = _events(spark)
    assert spool_batch(events, spool_dir) == 6
    # second batch into the same dir: still 6, not 12
    assert spool_batch(events, spool_dir) == 6
