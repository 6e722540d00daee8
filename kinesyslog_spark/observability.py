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
- `render_prometheus` (O4): text-format exposition of the registry.
- `MetricsServer` (O4): a threaded stdlib HTTP server exposing the
  registry at `/metrics` plus `/` and `/robots.txt`, counting requests
  per (method, path) like the reference's prometheus middleware
  (prometheus.py:45-77, STAT_HTTP_REQS).
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable

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
        # Label-bearing names ("name{...}") share one TYPE line per family.
        bare = name.split("{", 1)[0]
        type_line = f"# TYPE {prefix}{bare} counter"
        if type_line not in lines:
            lines.append(type_line)
        if "{" in name:
            family, labels = name.split("{", 1)
            lines.append(f"{prefix}{family}{{{labels} {value}")
        else:
            lines.append(f"{prefix}{name} {value}")
    return "\n".join(lines) + "\n"


HTTP_REQS = "http_requests_total"

_ROBOTS = b"User-agent: *\nDisallow: /\n"
_INDEX = (b"<html><body><a href='/metrics'>metrics</a></body></html>\n")


class MetricsServer:
    """O4: serve the metrics registry over HTTP (reference
    prometheus.py:45-77 — aiohttp Service with `/metrics`, `/`,
    `/robots.txt` and a request-counting middleware).

    stdlib ThreadingHTTPServer: metrics exposition is a low-rate scrape
    path, so per-request threads are fine and no third-party dependency
    is needed. `snapshot` is any callable returning the current registry
    dict (e.g. `RelayMetricsListener.snapshot`); request counts are
    folded in at render time under (method, path) labels like the
    reference middleware.
    """

    def __init__(self, snapshot: Callable[[], dict[str, float]],
                 host: str = "127.0.0.1", port: int = 0,
                 prefix: str = "kinesyslog_spark_") -> None:
        self._snapshot = snapshot
        self._prefix = prefix
        self._lock = threading.Lock()
        self._requests: dict[str, float] = {}
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a: Any) -> None:  # silence stderr
                pass

            def do_GET(self) -> None:  # noqa: N802
                server._count(self.command, self.path)
                if self.path == "/metrics":
                    body = server.render().encode()
                    ctype = "text/plain; version=0.0.4"
                elif self.path == "/robots.txt":
                    body, ctype = _ROBOTS, "text/plain"
                elif self.path == "/":
                    body, ctype = _INDEX, "text/html"
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    def _count(self, method: str, path: str) -> None:
        # Unknown paths collapse to one label value so a scanner can't
        # blow up registry cardinality.
        if path not in ("/metrics", "/", "/robots.txt"):
            path = "<other>"
        key = f'{HTTP_REQS}{{method="{method}",path="{path}"}}'
        with self._lock:
            self._requests[key] = self._requests.get(key, 0.0) + 1

    def render(self) -> str:
        registry = dict(self._snapshot())
        with self._lock:
            registry.update(self._requests)
        return render_prometheus(registry, self._prefix)

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "MetricsServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)
