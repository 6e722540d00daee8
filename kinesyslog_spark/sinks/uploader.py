r"""Firehose spool uploader (reference K2-K4, spool.py:104-214).

An independent process against the spool directory — by design NOT a
Spark job (keeps the engine cloud-free for tests and lets delivery retry
outlive any Spark restart). Semantics mirrored from the reference:

- every cycle (TIMER_INTERVAL): upload if spooled files >= MAX_BATCH_COUNT
  or the oldest is >= FLUSH_TIME old (spool.py:141-153);
- greedy packing <=500 records / <=4 MiB per put_record_batch
  (spool.py:157-178, via sinks.records.pack_upload_batches);
- per-record ack: a RecordId in the response unlinks the spool file;
  a failed record stays and retries next cycle; a failed call leaves the
  whole batch for retry (spool.py:193-210) — at-least-once, per-record;
- startup validation: delivery stream must be ACTIVE (K4, spool.py:96-101).

boto3 is not installed in this container, so the client is injected:
production passes `boto3.client('firehose')`; tests pass a fake with the
same `put_record_batch` / `describe_delivery_stream` shape.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from kinesyslog_spark.constants import (
    FLUSH_TIME,
    MAX_BATCH_COUNT,
    SPOOL_PREFIX,
)
from kinesyslog_spark.sinks.records import pack_upload_batches


@dataclass
class UploadStats:
    uploaded: int = 0
    failed: int = 0
    calls: int = 0
    cycles: int = 0
    errors: list[str] = field(default_factory=list)


class SpoolUploader:
    def __init__(self, spool_dir: str, stream_name: str, client) -> None:
        self.spool_dir = spool_dir
        self.stream_name = stream_name
        self.client = client
        self.stats = UploadStats()

    def validate_stream(self) -> None:
        """K4: refuse to start against a non-ACTIVE delivery stream."""
        desc = self.client.describe_delivery_stream(DeliveryStreamName=self.stream_name)
        status = desc["DeliveryStreamDescription"]["DeliveryStreamStatus"]
        if status != "ACTIVE":
            raise RuntimeError(
                f"delivery stream {self.stream_name!r} is {status}, not ACTIVE"
            )

    def _spooled(self) -> list[tuple[str, int, float]]:
        out = []
        for name in sorted(os.listdir(self.spool_dir)):
            if not name.startswith(SPOOL_PREFIX):
                continue
            path = os.path.join(self.spool_dir, name)
            st = os.stat(path)
            out.append((path, st.st_size, st.st_mtime))
        return out

    def should_upload(self, now: float | None = None) -> bool:
        """spool.py:141-153: count >= 500 OR oldest age >= 60 s."""
        files = self._spooled()
        if not files:
            return False
        if len(files) >= MAX_BATCH_COUNT:
            return True
        now = time.time() if now is None else now
        return now - min(m for _, _, m in files) >= FLUSH_TIME

    def run_cycle(self, force: bool = False) -> UploadStats:
        """One timer tick: pack + upload + per-record ack (K2/K3)."""
        self.stats.cycles += 1
        if not force and not self.should_upload():
            return self.stats
        files = self._spooled()
        for batch in pack_upload_batches([(p, s) for p, s, _ in files]):
            payloads = []
            paths = []
            for path in batch:
                try:
                    with open(path, "rb") as f:
                        payloads.append({"Data": f.read()})
                    paths.append(path)
                except FileNotFoundError:
                    continue
            if not paths:
                continue
            try:
                resp = self.client.put_record_batch(
                    DeliveryStreamName=self.stream_name, Records=payloads
                )
            except Exception as e:  # noqa: BLE001 — whole call failed: retry next cycle
                self.stats.errors.append(str(e))
                return self.stats
            self.stats.calls += 1
            for path, rec in zip(paths, resp["RequestResponses"]):
                if rec.get("RecordId"):
                    os.unlink(path)  # acked -> done (spool.py:199-205)
                    self.stats.uploaded += 1
                else:
                    self.stats.failed += 1  # stays spooled; retried next cycle
        return self.stats
