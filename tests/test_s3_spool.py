"""S5 object-store path: `s3_read_spool` against an injected
boto3-style fake (paginated listing + get_object), exercising the
S3-shaped code — listing, pagination, per-key executor fetch,
multi-member gzip decode — without boto3 or a network."""

from __future__ import annotations

import io

from kinesyslog_spark.sinks.records import _compress, s3_read_spool


def make_fake_s3_factory(objects: dict[str, bytes]):
    """Factory over a minimal boto3-s3 lookalike (in-memory dict).

    The class is defined LOCALLY so cloudpickle serializes it by VALUE —
    a module-level test class would pickle by reference and Spark's
    Python workers can't import the pytest module."""

    class FakeS3Client:
        def __init__(self, objs):
            self.objects = dict(objs)

        def list_objects_v2(self, Bucket, Prefix, MaxKeys=1000,
                            ContinuationToken=None):
            keys = sorted(k for k in self.objects if k.startswith(Prefix))
            start = int(ContinuationToken) if ContinuationToken else 0
            page = keys[start:start + MaxKeys]
            out = {
                "Contents": [{"Key": k} for k in page],
                "IsTruncated": start + MaxKeys < len(keys),
            }
            if out["IsTruncated"]:
                out["NextContinuationToken"] = str(start + MaxKeys)
            return out

        def get_object(self, Bucket, Key):
            return {"Body": io.BytesIO(self.objects[Key])}

    return lambda: FakeS3Client(objects)


def _record(group: str, n_events: int) -> dict:
    return {
        "owner": "000000000000",
        "logGroup": group,
        "logStream": "stream",
        "subscriptionFilters": ["all"],
        "messageType": "DATA_MESSAGE",
        "logEvents": [
            {"id": f"{group}-{i}", "timestamp": 1700000000000 + i,
             "message": f"m{i}"}
            for i in range(n_events)
        ],
    }


def test_s3_read_spool_with_fake_client(spark):
    # 5 objects so a page size of 2 forces 3 list pages; one object is
    # two CONCATENATED gzip members (the Firehose concatenation case)
    objects = {
        f"spool/records-{i}.gz": _compress(_record(f"g{i}", 3))
        for i in range(4)
    }
    objects["spool/records-4.gz"] = (
        _compress(_record("g4", 2)) + _compress(_record("g4b", 1))
    )
    objects["other/ignored.gz"] = _compress(_record("nope", 1))

    factory = make_fake_s3_factory(objects)
    df = s3_read_spool(
        spark, "bkt", "spool/", client_factory=factory, list_page_size=2
    )
    rows = df.collect()
    groups = sorted(r.logGroup for r in rows)
    assert groups == ["g0", "g1", "g2", "g3", "g4", "g4b"]
    by_group = {r.logGroup: r for r in rows}
    assert len(by_group["g0"].logEvents) == 3
    assert len(by_group["g4b"].logEvents) == 1  # second gzip member
    ev = by_group["g1"].logEvents[0]
    assert (ev.id, ev.timestamp, ev.message) == (
        "g1-0", 1700000000000, "m0"
    )
    # prefix filter respected: the "other/" key never fetched
    assert "nope" not in {r.logGroup for r in rows}


def test_s3_read_spool_empty_prefix(spark):
    factory = make_fake_s3_factory({})
    df = s3_read_spool(spark, "bkt", "spool/", client_factory=factory)
    assert df.count() == 0
    assert df.columns == [
        "owner", "logGroup", "logStream",
        "subscriptionFilters", "messageType", "logEvents",
    ]
