"""K2/K3/K4 uploader semantics against a fake Firehose client."""

from __future__ import annotations

import os
import time

import pytest

from kinesyslog_spark.sinks.records import spool_write
from kinesyslog_spark.sinks.uploader import SpoolUploader


class FakeFirehose:
    def __init__(self, fail_every: int = 0, status: str = "ACTIVE",
                 fail_call: bool = False):
        self.fail_every = fail_every
        self.status = status
        self.fail_call = fail_call
        self.received: list[bytes] = []
        self._n = 0

    def describe_delivery_stream(self, DeliveryStreamName):  # noqa: N803
        return {"DeliveryStreamDescription": {"DeliveryStreamStatus": self.status}}

    def put_record_batch(self, DeliveryStreamName, Records):  # noqa: N803
        if self.fail_call:
            raise ConnectionError("simulated endpoint failure")
        responses = []
        for rec in Records:
            self._n += 1
            if self.fail_every and self._n % self.fail_every == 0:
                responses.append({"ErrorCode": "ServiceUnavailableException"})
            else:
                self.received.append(rec["Data"])
                responses.append({"RecordId": f"r{self._n}"})
        return {"RequestResponses": responses}


def _spool(tmp_path, n):
    d = str(tmp_path / "spool")
    for i in range(n):
        spool_write(f"record-{i}".encode(), d)
    return d


def test_validate_stream_rejects_inactive(tmp_path):
    up = SpoolUploader(_spool(tmp_path, 0), "s", FakeFirehose(status="CREATING"))
    with pytest.raises(RuntimeError, match="not ACTIVE"):
        up.validate_stream()


def test_upload_all_acked(tmp_path):
    d = _spool(tmp_path, 7)
    client = FakeFirehose()
    up = SpoolUploader(d, "s", client)
    up.validate_stream()
    up.run_cycle(force=True)
    assert up.stats.uploaded == 7 and up.stats.failed == 0
    assert sorted(client.received) == sorted(f"record-{i}".encode() for i in range(7))
    assert not [n for n in os.listdir(d) if n.startswith("firehose_event-")]


def test_partial_failure_keeps_files_for_retry(tmp_path):
    d = _spool(tmp_path, 6)
    up = SpoolUploader(d, "s", FakeFirehose(fail_every=3))
    up.run_cycle(force=True)
    assert up.stats.uploaded == 4 and up.stats.failed == 2
    left = [n for n in os.listdir(d) if n.startswith("firehose_event-")]
    assert len(left) == 2  # nacked records stay spooled (at-least-once)
    # next cycle retries them successfully
    up.client.fail_every = 0
    up.run_cycle(force=True)
    assert up.stats.uploaded == 6
    assert not [n for n in os.listdir(d) if n.startswith("firehose_event-")]


def test_whole_call_failure_leaves_everything(tmp_path):
    d = _spool(tmp_path, 3)
    up = SpoolUploader(d, "s", FakeFirehose(fail_call=True))
    up.run_cycle(force=True)
    assert up.stats.uploaded == 0 and len(up.stats.errors) == 1
    assert len([n for n in os.listdir(d) if n.startswith("firehose_event-")]) == 3


def test_should_upload_age_and_count(tmp_path):
    d = _spool(tmp_path, 2)
    up = SpoolUploader(d, "s", FakeFirehose())
    assert not up.should_upload(now=time.time())
    assert up.should_upload(now=time.time() + 61)  # age >= FLUSH_TIME
