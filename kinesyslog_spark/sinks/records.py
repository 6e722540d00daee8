r"""Record envelope build + spool sink + read-back (reference G1-G5, K1, E3).

Pipeline (sink.py:141-217 re-expressed Spark-first):

1. `build_envelopes`  — groupBy (source, dest) + collect_list(struct) →
   the CloudWatch-Logs-subscription-shaped Record (sink.py:194-209,
   README.md:96-132). Pure DataFrame ops; the shuffle key is the
   reference's own grouping key.
2. `serialize_records` — grouped-map pandas: to JSON + gzip level 9
   (sink.py:211-217); records whose compressed size exceeds 1000 KB are
   split into ⌈size/max⌉ even event-slices and re-compressed
   (sink.py:167-183 — including its 'naively hopes' even-split policy).
3. `write_spool` — K1 atomic publish: write temp file, hard-link to the
   final name, unlink temp (spool.py:25-36); readers never observe a
   partial record.
4. `read_spool` / `iter_record_parts` — E3-compatible read-back: a spool
   file may hold *concatenated* gzip members; decode with a zlib
   decompressobj loop over `unused_data` (utils/kinesis-s3-dump.py:52-97).

The Firehose uploader itself (K2-K4, boto3) is an independent process by
design (keeps Spark jobs cloud-free); `pack_upload_batches` implements
its greedy ≤500-record / ≤4 MiB packing for tests.
"""

from __future__ import annotations

import gzip
import json
import os
import tempfile
import uuid
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesyslog_spark.constants import (
    MAX_BATCH_COUNT,
    MAX_BATCH_SIZE,
    MAX_RECORD_SIZE,
    SPOOL_PREFIX,
    SPOOL_TEMP_PREFIX,
)

ENVELOPE_SCHEMA = (
    "owner string, logGroup string, logStream string, "
    "subscriptionFilters array<string>, messageType string, "
    "logEvents array<struct<id: string, timestamp: long, message: string>>"
)

SERIALIZED_SCHEMA = "logGroup string, logStream string, part int, payload binary"


def build_envelopes(
    events: DataFrame,
    owner: str = "000000000000",
    group_prefix: str = "kinesyslog",
    fmt: str = "syslog",
) -> DataFrame:
    """G1 + G4 envelope assembly from parsed events
    (id, ts_ms, message, source, dest).

    logGroup = '<prefix>/<format>/<port>' (sink.py:162), logStream =
    source IP (sink.py:204-205), subscriptionFilters defaults to
    [logGroup] (sink.py:199-200). Events are ordered by event time then
    id within the record."""
    return (
        events.groupBy("source", "dest")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts_ms").alias("timestamp"), F.col("id"), F.col("message")))
            ).alias("evs")
        )
        .select(
            F.lit(owner).alias("owner"),
            F.concat(
                F.lit(f"{group_prefix}/{fmt}/"), F.col("dest").cast("string")
            ).alias("logGroup"),
            F.col("source").alias("logStream"),
            F.array(
                F.concat(F.lit(f"{group_prefix}/{fmt}/"), F.col("dest").cast("string"))
            ).alias("subscriptionFilters"),
            F.lit("DATA_MESSAGE").alias("messageType"),
            F.transform(
                "evs",
                lambda e: F.struct(
                    e["id"].alias("id"),
                    e["timestamp"].alias("timestamp"),
                    e["message"].alias("message"),
                ),
            ).alias("logEvents"),
        )
    )


def _compress(record: dict) -> bytes:
    # escape_forward_slashes=False parity: json.dumps never escapes '/'.
    return gzip.compress(
        json.dumps(record, separators=(",", ":")).encode("utf-8"), compresslevel=9
    )


def _split_serialize(record: dict) -> list[bytes]:
    """G4: gzip; if compressed > MAX_RECORD_SIZE split logEvents into
    ⌈size/max⌉ even slices along message boundaries and re-compress each
    (sink.py:167-183). Like the reference, slices are 'naively hoped' to
    fit; a still-oversize slice recurses."""
    blob = _compress(record)
    if len(blob) <= MAX_RECORD_SIZE:
        return [blob]
    events = record["logEvents"]
    n_parts = -(-len(blob) // MAX_RECORD_SIZE)
    per = -(-len(events) // n_parts)
    out: list[bytes] = []
    for i in range(0, len(events), per):
        part = dict(record, logEvents=events[i:i + per])
        if len(part["logEvents"]) == len(events):  # cannot split further
            out.append(_compress(part))
        else:
            out.extend(_split_serialize(part))
    return out


def serialize_records(envelopes: DataFrame) -> DataFrame:
    """Envelope rows -> one or more gzip'd JSON payloads each (G4/G5)."""

    def ser(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rec in pdf.to_dict("records"):
            rec["subscriptionFilters"] = list(rec["subscriptionFilters"])
            rec["logEvents"] = [dict(e) for e in rec["logEvents"]]
            for part, blob in enumerate(_split_serialize(rec)):
                rows.append(
                    {
                        "logGroup": rec["logGroup"],
                        "logStream": rec["logStream"],
                        "part": part,
                        "payload": blob,
                    }
                )
        return pd.DataFrame(rows, columns=["logGroup", "logStream", "part", "payload"])

    return envelopes.groupBy("logGroup", "logStream").applyInPandas(
        ser, schema=SERIALIZED_SCHEMA
    )


# ---------------------------------------------------------------------------
# K1 — atomic spool publish (temp + hard link + unlink)
# ---------------------------------------------------------------------------

def spool_write(payload: bytes, spool_dir: str) -> str:
    """Write one record payload atomically (spool.py:25-36)."""
    os.makedirs(spool_dir, exist_ok=True)
    name = f"{SPOOL_PREFIX}{uuid.uuid4().hex}"
    with tempfile.NamedTemporaryFile(
        dir=spool_dir, prefix=SPOOL_TEMP_PREFIX, delete=False
    ) as tmp:
        tmp.write(payload)
        tmp.flush()
        os.fsync(tmp.fileno())
    final = os.path.join(spool_dir, name)
    os.link(tmp.name, final)
    os.unlink(tmp.name)
    return final


def spool_batch(events: DataFrame, spool_dir: str, **envelope_kw) -> int:
    """foreachBatch body: parsed events -> envelopes -> gzip records ->
    atomic spool files. Returns the number of records written.

    The serialize/spool work runs on executors via foreachPartition —
    the driver never holds record payloads."""
    ser = serialize_records(build_envelopes(events, **envelope_kw))

    # Count via accumulator, not a driver-side listdir: executors write to
    # machine-local spool dirs on a real cluster (the driver can't see
    # them), and listdir would also count pre-existing/prior-batch files.
    # foreachPartition is an action, so accumulator updates are applied
    # exactly once per successful task.
    acc = events.sparkSession.sparkContext.accumulator(0)

    def write_partition(rows) -> None:
        n = 0
        for row in rows:
            spool_write(bytes(row["payload"]), spool_dir)
            n += 1
        acc.add(n)

    ser.foreachPartition(write_partition)
    return acc.value


# ---------------------------------------------------------------------------
# E3 — read-back (multi-member gzip decode, kinesis-s3-dump.py:52-97)
# ---------------------------------------------------------------------------

def iter_record_parts(blob: bytes) -> Iterator[dict]:
    """Decode possibly-concatenated gzip members into Record dicts."""
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(32 + 15)  # gzip wrapper
        data = d.decompress(blob[pos:])
        yield json.loads(data.decode("utf-8"))
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def read_spool(spark, spool_dir: str) -> DataFrame:
    """Spool files -> envelope DataFrame (the engine's own output format
    round-trips through its reader).

    Object-store path (reference S5, utils/kinesis-s3-dump.py:41-49):
    this same code reads Firehose output from S3 unchanged — pass
    `s3a://bucket/prefix` as `spool_dir` on a cluster with hadoop-aws on
    the classpath (credentials via instance profile or
    `spark.hadoop.fs.s3a.*` confs). binaryFile splits per object, so a
    multi-TB prefix fans out one task per record blob; the
    multi-member-gzip decode (`iter_record_parts`) handles Firehose's
    concatenated-record objects exactly like the reference's
    `unused_data` loop. Untestable in this container (no S3 endpoint) —
    exercised against local files, which go through the identical
    Hadoop FileSystem API."""
    raw = spark.read.format("binaryFile").load(
        os.path.join(spool_dir, f"{SPOOL_PREFIX}*")
    )

    def decode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for content in pdf["content"]:
                for rec in iter_record_parts(bytes(content)):
                    rows.append(
                        {
                            "owner": rec["owner"],
                            "logGroup": rec["logGroup"],
                            "logStream": rec["logStream"],
                            "subscriptionFilters": rec["subscriptionFilters"],
                            "messageType": rec["messageType"],
                            "logEvents": rec["logEvents"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "owner", "logGroup", "logStream",
                    "subscriptionFilters", "messageType", "logEvents",
                ],
            )

    return raw.select("content").mapInPandas(decode, schema=ENVELOPE_SCHEMA)


def s3_read_spool(
    spark,
    bucket: str,
    prefix: str,
    client_factory=None,
    list_page_size: int | None = None,
) -> DataFrame:
    """S5's object-store path through an S3 API client instead of the
    Hadoop filesystem: list keys on the driver, fetch + decode on the
    executors.

    `client_factory` is a zero-arg callable returning a boto3-style
    client (`list_objects_v2` with ContinuationToken pagination,
    `get_object(...)["Body"].read()`); it defaults to
    `boto3.client("s3")` (import-gated — boto3 is absent in this
    container, so tests inject a fake). The factory, not a client, is
    what ships to executors: each Python worker builds its own
    connection, the standard pattern for non-picklable clients. The
    listing is driver-side but O(keys) METADATA only — the blobs
    themselves are fetched in parallel by `mapInPandas` over the
    key table, one task per key batch.

    Reference parity: utils/kinesis-s3-dump.py:41-49 (bucket listing +
    per-object multi-member gzip decode); same decode loop as
    `read_spool` (`iter_record_parts`).
    """
    if client_factory is None:
        def client_factory():  # pragma: no cover - needs boto3
            import boto3

            return boto3.client("s3")

    client = client_factory()
    keys: list[str] = []
    token = None
    while True:
        kw = {"Bucket": bucket, "Prefix": prefix}
        if list_page_size is not None:
            kw["MaxKeys"] = list_page_size
        if token:
            kw["ContinuationToken"] = token
        resp = client.list_objects_v2(**kw)
        keys.extend(o["Key"] for o in resp.get("Contents", []))
        if not resp.get("IsTruncated"):
            break
        token = resp.get("NextContinuationToken")

    par = max(1, min(len(keys), spark.sparkContext.defaultParallelism))
    kdf = spark.createDataFrame([(k,) for k in keys], "key string").repartition(par)

    def fetch(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = client_factory()  # one client per Python worker
        cols = [
            "owner", "logGroup", "logStream",
            "subscriptionFilters", "messageType", "logEvents",
        ]
        for pdf in pdfs:
            rows = []
            for k in pdf["key"]:
                blob = c.get_object(Bucket=bucket, Key=k)["Body"].read()
                for rec in iter_record_parts(blob):
                    rows.append({col: rec[col] for col in cols})
            yield pd.DataFrame(rows, columns=cols)

    return kdf.mapInPandas(fetch, schema=ENVELOPE_SCHEMA)


# ---------------------------------------------------------------------------
# K2 — greedy upload batch packing (spool.py:157-178), for the uploader
# ---------------------------------------------------------------------------

def pack_upload_batches(sizes: list[tuple[str, int]]) -> list[list[str]]:
    """Greedy ≤MAX_BATCH_COUNT / ≤MAX_BATCH_SIZE packing of spool files
    (name, size) into put_record_batch calls."""
    batches: list[list[str]] = []
    cur: list[str] = []
    cur_size = 0
    for name, size in sizes:
        if cur and (len(cur) >= MAX_BATCH_COUNT or cur_size + size > MAX_BATCH_SIZE):
            batches.append(cur)
            cur, cur_size = [], 0
        cur.append(name)
        cur_size += size
    if cur:
        batches.append(cur)
    return batches
