r"""Observability (reference O1-O4, prometheus.py/stats.py re-scoped).

The reference ships counters/gauges/histograms over a cross-process
msgpack side channel (O3, spool.py:48-94). Spark centralizes metrics at
the driver, so the engine exposes:

- `observe_messages` (O2): attaches the per-batch `observe()` metrics the
  reference increments per (port, source) — message count + byte count —
  evaluated inside the existing job, zero extra passes.
- `RelayMetricsListener` (O1): a StreamingQueryListener that accumulates
  the observed metrics and per-batch progress (rows/sec) into a
  driver-side registry dict shaped like the reference's metric names
  (constant.py:43-52).
- `render_prometheus` (O4): text-format exposition of the registry; the
  HTTP wrapper is one `http.server` away and deliberately not started
  here (tests read the text directly).
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "kinesyslog_metrics"

# Metric names mirror the reference registry (constant.py:43-52).
MESSAGE_COUNT = "message_count_total"
MESSAGE_BYTES = "message_bytes_total"
BATCH_ROWS = "batch_records"


def observe_messages(df: DataFrame, raw: str = "raw") -> DataFrame:
    """O2: count + byte-size observation over the message stream.
    Works on batch and streaming DataFrames alike."""
    return df.observe(
        OBSERVATION_NAME,
        F.count(F.lit(1)).alias(MESSAGE_COUNT),
        F.sum(F.octet_length(raw)).alias(MESSAGE_BYTES),
    )


class RelayMetricsListener(StreamingQueryListener):
    """O1: accumulate observed metrics + progress into a registry."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.registry: dict[str, float] = {
            MESSAGE_COUNT: 0.0,
            MESSAGE_BYTES: 0.0,
            BATCH_ROWS: 0.0,
            "batches_total": 0.0,
        }

    # StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        p = event.progress
        observed = p.observedMetrics.get(OBSERVATION_NAME)
        with self._lock:
            self.registry["batches_total"] += 1
            self.registry[BATCH_ROWS] += p.numInputRows
            if observed is not None:
                self.registry[MESSAGE_COUNT] += observed[MESSAGE_COUNT] or 0
                self.registry[MESSAGE_BYTES] += observed[MESSAGE_BYTES] or 0

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        pass

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            return dict(self.registry)


def render_prometheus(registry: dict[str, float],
                      prefix: str = "kinesyslog_spark_") -> str:
    """O4: Prometheus text exposition format."""
    lines = []
    for name, value in sorted(registry.items()):
        lines.append(f"# TYPE {prefix}{name} counter")
        lines.append(f"{prefix}{name} {value}")
    return "\n".join(lines) + "\n"
