r"""`kinesyslog-spark` command line — the reference's `kinesyslog listen`
entry point (E1, init.py:30-257) re-expressed over the Spark engine.

    python -m kinesyslog_spark.cli listen \
        --udp-port 5514 --tcp-port 5514 --spool-dir /var/spool/kinesyslog

wires together:
  1. the asyncio ingest bridge (sources/bridge.py: UDP/TCP[/TLS/PROXY]
     listeners -> JSON-line files),
  2. the Structured Streaming relay (streaming/relay.py: parse -> record
     envelopes -> atomic gzip spool),
  3. optionally the Firehose uploader cycle (sinks/uploader.py) when
     --delivery-stream is given and boto3 is importable.

`--duration N` runs for N seconds then shuts down cleanly (for smoke
tests / demos); the default runs until SIGINT like the reference daemon.
"""

from __future__ import annotations

import argparse
import asyncio
import os
import signal
import sys
import tempfile
import threading
import time


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="kinesyslog-spark")
    sub = p.add_subparsers(dest="command", required=True)
    ls = sub.add_parser("listen", help="run the UDP/TCP syslog -> record-spool relay")
    ls.add_argument("--udp-port", type=int, default=0, help="0 = ephemeral")
    ls.add_argument("--tcp-port", type=int, default=0)
    ls.add_argument("--host", default="127.0.0.1")
    ls.add_argument("--spool-dir", default=None, help="record output spool")
    ls.add_argument("--work-dir", default=None, help="bridge lines + checkpoint")
    ls.add_argument("--trigger-seconds", type=int, default=10)
    ls.add_argument("--proxy-protocol", action="store_true")
    ls.add_argument("--gelf", action="store_true",
                    help="listen for GELF instead of Syslog (reference "
                         "--gelf): UDP accepts plain/zlib/gzip/chunked "
                         "documents; logGroup becomes <prefix>/gelf/<port>")
    ls.add_argument("--tls-cert", default=None)
    ls.add_argument("--tls-key", default=None)
    ls.add_argument("--tls-port", type=int, default=None)
    ls.add_argument("--delivery-stream", default=None,
                    help="Firehose stream name (needs boto3)")
    ls.add_argument("--group-prefix", default="kinesyslog")
    ls.add_argument("--prometheus-port", type=int, default=None,
                    help="serve /metrics on this port (0 = ephemeral); "
                         "reference --stats-port")
    ls.add_argument("--duration", type=int, default=0,
                    help="seconds to run; 0 = until SIGINT")
    ls.add_argument("--cpus", default=None)

    inst = sub.add_parser(
        "install",
        help="write a systemd unit for the listen daemon (reference E2, init.py:283-367)",
    )
    inst.add_argument("--unit-dir", default="/etc/systemd/system")
    inst.add_argument("--listen-args", default="",
                    help="extra arguments appended to the listen command")

    dmp = sub.add_parser(
        "dump",
        help="read spooled records back to stdout (reference "
        "utils/kinesis-s3-dump.py parity: U1 group-prefix filter, "
        "U2 min-length filter, U3 explode+trim projection)",
    )
    dmp.add_argument("spool_dir", help="spool directory (or s3a://bucket/prefix on a cluster)")
    dmp.add_argument("--group", default=None,
                     help="only records whose logGroup starts with this prefix (U1)")
    dmp.add_argument("--min-length", type=int, default=0,
                     help="only messages at least this long (U2)")
    dmp.add_argument("--show-source", action="store_true",
                     help="prefix each line with logStream (source IP)")
    bk = sub.add_parser(
        "bucketize",
        help="write bucketed copies of the hot tables (shuffle-free joins)",
    )
    bk.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    bk.add_argument("--base-path", required=True,
                    help="output root (local dir or object-store URI)")
    bk.add_argument("--buckets", type=int, default=32,
                    help="size so one bucket of the largest table is a few hundred MB")
    bk.add_argument("--tables", default="",
                    help="comma-separated subset; default = all hot tables")
    bk.add_argument("--cpus", default=None)

    cp = sub.add_parser(
        "compact",
        help="merge small files in a partitioned parquet table "
             "(micro-batch writes fragment; see sinks/partitioned.py)",
    )
    cp.add_argument("path", help="partitioned table root")
    cp.add_argument("--partition-cols", required=True,
                    help="comma-separated partition columns")
    cp.add_argument("--target-mb", type=int, default=128)
    cp.add_argument("--min-files", type=int, default=2)
    cp.add_argument("--cpus", default=None)

    pl = sub.add_parser(
        "pipeline",
        help="materialize the composed LLM training-data pipeline "
             "(q71 filter -> q40 dedup -> q84 curriculum shards) as a "
             "shard-partitioned parquet artifact",
    )
    pl.add_argument("out_dir", help="output table root")
    pl.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    pl.add_argument("--shards", type=int, default=16)
    pl.add_argument("--cpus", default=None)

    zo = sub.add_parser(
        "zorder",
        help="rewrite a parquet table laid out along the Morton curve of "
             "the given columns (multi-column min/max file pruning; see "
             "operators/zorder.py)",
    )
    zo.add_argument("in_path", help="input parquet path")
    zo.add_argument("out_path", help="output parquet path")
    zo.add_argument("--cols", required=True,
                    help="comma-separated numeric columns (1-4)")
    zo.add_argument("--files", type=int, default=32,
                    help="output file count (size so each is ~100-500 MB)")
    zo.add_argument("--bits", type=int, default=16)
    zo.add_argument("--cpus", default=None)

    cr = sub.add_parser(
        "corpus-report",
        help="materialize the corpus-curation report (repetition, "
             "overlap, spectrum, divergence, zipf, dispersion, "
             "fertility, sketches) as parquet tables + JSON summary",
    )
    cr.add_argument("out_dir", help="report artifact root")
    cr.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    cr.add_argument("--cpus", default=None)

    pr = sub.add_parser(
        "privacy-report",
        help="materialize the privacy/compliance report (PII scrub "
             "audit + k-anonymity risk classes) as parquet tables + "
             "JSON summary",
    )
    pr.add_argument("out_dir", help="report artifact root")
    pr.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    pr.add_argument("--cpus", default=None)

    qr = sub.add_parser(
        "quality-report",
        help="materialize the data-quality report (q145 constraint "
             "audit + q146 grouped-cardinality merge proof) as parquet "
             "tables + JSON summary",
    )
    qr.add_argument("out_dir", help="report artifact root")
    qr.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    qr.add_argument("--cpus", default=None)

    tr = sub.add_parser(
        "training-report",
        help="materialize the training-data readiness report (split "
             "leakage + cluster fix, CDC dedup stats, classifier/"
             "calibration/AUC, embedding spectrum) as parquet tables "
             "+ JSON summary",
    )
    tr.add_argument("out_dir", help="report artifact root")
    tr.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    tr.add_argument("--cpus", default=None)

    pg = sub.add_parser(
        "purge",
        help="delete keys from a partitioned parquet table, rewriting "
             "only the partitions that contain them (right-to-erasure; "
             "see operators/purge.py)",
    )
    pg.add_argument("path", help="partitioned parquet table root")
    pg.add_argument("--key-col", required=True, help="column holding the keys")
    pg.add_argument("--keys", required=True,
                    help="comma-separated key values (ints auto-detected)")
    pg.add_argument("--part-cols", required=True,
                    help="comma-separated partition columns of the layout")
    pg.add_argument("--cpus", default=None)

    ex = sub.add_parser(
        "explain",
        help="print the formatted physical plan (and executed-plan node "
             "counts) for a registered query",
    )
    ex.add_argument("query", help="registered query name, e.g. q03_shipping_priority")
    ex.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ex.add_argument("--cpus", default=None)
    return p


def listen(args) -> int:
    from kinesyslog_spark.session import get_spark
    from kinesyslog_spark.sources.bridge import make_ssl_context, run_bridge
    from kinesyslog_spark.streaming.relay import start_relay

    work = args.work_dir or tempfile.mkdtemp(prefix="kinesyslog-spark-")
    lines_dir = os.path.join(work, "lines")
    ckpt_dir = os.path.join(work, "checkpoint")
    spool_dir = args.spool_dir or os.path.join(work, "spool")
    os.makedirs(lines_dir, exist_ok=True)

    ssl_ctx = None
    if args.tls_cert and args.tls_key:
        ssl_ctx = make_ssl_context(args.tls_cert, args.tls_key)

    loop = asyncio.new_event_loop()
    ready = asyncio.Event()
    stop = asyncio.Event()

    def bridge_runner():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(
            run_bridge(
                lines_dir,
                udp_port=args.udp_port,
                tcp_port=args.tcp_port,
                host=args.host,
                ready=ready,
                stop=stop,
                proxy_protocol=args.proxy_protocol,
                tls_port=args.tls_port,
                ssl_context=ssl_ctx,
                gelf=args.gelf,
            )
        )

    bridge = threading.Thread(target=bridge_runner, daemon=True)
    bridge.start()
    deadline = time.time() + 15
    while not ready.is_set() and time.time() < deadline:
        time.sleep(0.05)
    if not ready.is_set():
        print("bridge failed to start", file=sys.stderr)
        return 1
    bound = run_bridge.bound
    print(f"listening: udp={bound[0]} tcp={bound[1]}"
          + (f" tls={bound[2]}" if len(bound) > 2 else ""), flush=True)
    print(f"spool: {spool_dir}", flush=True)

    spark = get_spark("kinesyslog-spark-listen", cpus=args.cpus)

    metrics_srv = None
    listener = None
    if args.prometheus_port is not None:
        # O1+O4: accumulate stream progress into the registry and serve
        # it over HTTP (reference prometheus.py StatsServer).
        from kinesyslog_spark.observability import (
            MetricsServer,
            RelayMetricsListener,
        )

        listener = RelayMetricsListener()
        spark.streams.addListener(listener)
        metrics_srv = MetricsServer(
            listener.snapshot, host=args.host, port=args.prometheus_port
        ).start()
        print(f"metrics: http://{args.host}:{metrics_srv.port}/metrics",
              flush=True)

    if args.gelf:
        from kinesyslog_spark.streaming.gelf_relay import start_gelf_relay

        query = start_gelf_relay(
            spark, lines_dir, spool_dir, ckpt_dir,
            trigger_seconds=args.trigger_seconds,
            group_prefix=args.group_prefix,
        )
    else:
        query = start_relay(
            spark, lines_dir, spool_dir, ckpt_dir,
            trigger_seconds=args.trigger_seconds,
            group_prefix=args.group_prefix,
        )

    uploader = None
    if args.delivery_stream:
        try:
            import boto3  # noqa: F401 — optional, not in the test container

            from kinesyslog_spark.sinks.uploader import SpoolUploader

            uploader = SpoolUploader(
                spool_dir, args.delivery_stream, boto3.client("firehose")
            )
            uploader.validate_stream()
        except ImportError:
            print("boto3 not installed; records stay in the spool", file=sys.stderr)

    halted = threading.Event()
    signal.signal(signal.SIGINT, lambda *_: halted.set())
    signal.signal(signal.SIGTERM, lambda *_: halted.set())
    end = time.time() + args.duration if args.duration else None
    try:
        while not halted.is_set() and (end is None or time.time() < end):
            time.sleep(1)
            if uploader is not None:
                uploader.run_cycle()
    finally:
        # Orderly shutdown: stop listeners, drain the final micro-batch
        # (the reference's SIGTERM flush, init.py:251-266).
        loop.call_soon_threadsafe(stop.set)
        bridge.join(timeout=10)
        query.processAllAvailable()
        query.stop()
        if metrics_srv is not None:
            metrics_srv.stop()
        if listener is not None:
            spark.streams.removeListener(listener)
        spark.stop()
    n = len([f for f in os.listdir(spool_dir)]) if os.path.isdir(spool_dir) else 0
    print(f"shutdown: {n} records spooled", flush=True)
    return 0


_UNIT_TEMPLATE = """\
[Unit]
Description=kinesyslog-spark syslog/GELF relay
After=network.target

[Service]
Type=simple
ExecStart={python} -m kinesyslog_spark.cli listen {listen_args}
Restart=on-failure
# Environment overrides (mirror the reference's envvar surface):
# Environment=SPARK_GRAFT_CPUS=32
# Environment=SPARK_GRAFT_DRIVER_MEM=8g

[Install]
WantedBy=multi-user.target
"""


def install(args) -> int:
    """E2: write the systemd unit (template parity with init.py:283-367's
    generated unit + envvar override file)."""
    os.makedirs(args.unit_dir, exist_ok=True)
    path = os.path.join(args.unit_dir, "kinesyslog-spark.service")
    with open(path, "w", encoding="utf-8") as f:
        f.write(_UNIT_TEMPLATE.format(python=sys.executable,
                                      listen_args=args.listen_args))
    print(f"wrote {path}", flush=True)
    print("enable with: systemctl daemon-reload && systemctl enable --now kinesyslog-spark")
    return 0


def dump(args) -> int:
    """E3 read-back path (reference utils/kinesis-s3-dump.py:28-105):
    spool -> records -> events -> trimmed messages on stdout. The three
    offline query ops are plain DataFrame expressions over read_spool:
    U1 = startswith filter on logGroup (kinesis-s3-dump.py:45-46),
    U2 = length(message) >= N (kinesis-s3-dump.py:33,104),
    U3 = explode(logEvents) + trim (kinesis-s3-dump.py:100-105)."""
    from pyspark.sql import functions as F

    from kinesyslog_spark.session import get_spark
    from kinesyslog_spark.sinks.records import read_spool

    spark = get_spark("kinesyslog-dump")
    df = read_spool(spark, args.spool_dir)
    if args.group:
        df = df.filter(F.col("logGroup").startswith(args.group))
    ev = (
        df.select("logStream", F.explode("logEvents").alias("e"))
        .select("logStream", F.trim(F.col("e.message")).alias("message"),
                F.col("e.timestamp").alias("ts"))
    )
    if args.min_length:
        ev = ev.filter(F.length("message") >= args.min_length)
    for row in ev.orderBy("ts").toLocalIterator():
        prefix = f"{row['logStream']}\t" if args.show_source else ""
        print(f"{prefix}{row['message']}")
    return 0


def bucketize_cmd(args) -> int:
    from kinesyslog_spark.session import get_spark
    from kinesyslog_spark.sinks.bucketed import DEFAULT_SPECS, bucketize

    spark = get_spark("bucketize", cpus=args.cpus)
    specs = DEFAULT_SPECS
    if args.tables:
        names = [t.strip() for t in args.tables.split(",") if t.strip()]
        specs = {n: DEFAULT_SPECS[n] for n in names}
    out = bucketize(spark, args.sf_dir, args.buckets, tables=specs,
                    base_path=args.base_path)
    for name, df in out.items():
        print(f"b_{name}: {df.count()} rows, {args.buckets} buckets "
              f"on {specs[name]}", flush=True)
    return 0


def compact_cmd(args) -> int:
    from kinesyslog_spark.session import get_spark
    from kinesyslog_spark.sinks.partitioned import compact_partitioned

    spark = get_spark("kinesyslog-spark-compact", cpus=args.cpus)
    n = compact_partitioned(
        spark,
        args.path,
        [c for c in args.partition_cols.split(",") if c],
        target_file_bytes=args.target_mb << 20,
        min_files=args.min_files,
    )
    print(f"compacted {n} partitions", flush=True)
    return 0


def zorder_cmd(args) -> int:
    from kinesyslog_spark.operators.zorder import write_zordered
    from kinesyslog_spark.session import get_spark

    spark = get_spark("kinesyslog-spark-zorder", cpus=args.cpus)
    cols = [c for c in args.cols.split(",") if c]
    df = spark.read.parquet(args.in_path)
    write_zordered(df, cols, args.out_path, n_files=args.files, bits=args.bits)
    print(f"z-ordered {args.in_path} -> {args.out_path} "
          f"on {cols} in {args.files} files", flush=True)
    return 0


def pipeline_cmd(args) -> int:
    import json

    from kinesyslog_spark.pipeline import run_pipeline
    from kinesyslog_spark.session import get_spark

    spark = get_spark("kinesyslog-spark-pipeline", cpus=args.cpus)
    stats = run_pipeline(spark, args.sf_dir, args.out_dir, n_shards=args.shards)
    print(json.dumps(stats), flush=True)
    return 0


def corpus_report_cmd(args) -> int:
    import json

    from kinesyslog_spark.report import corpus_report
    from kinesyslog_spark.session import get_spark

    spark = get_spark("kinesyslog-spark-report", cpus=args.cpus)
    print(json.dumps(corpus_report(spark, args.sf_dir, args.out_dir)), flush=True)
    return 0


def explain_cmd(args) -> int:
    from kinesyslog_spark.plans.checks import executed_facts, formatted_plan
    from kinesyslog_spark.queries import QUERIES
    from kinesyslog_spark.session import get_spark

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; registered: "
              f"{', '.join(sorted(QUERIES))}", file=sys.stderr)
        return 2
    spark = get_spark("kinesyslog-spark-explain", cpus=args.cpus)
    df = QUERIES[args.query](spark, args.sf_dir)
    print(formatted_plan(df))
    ef = executed_facts(df)
    print(f"# executed-plan: {ef.exchange_count} shuffle exchange(s), "
          f"{ef.broadcast_any_count} broadcast join(s), "
          f"{ef.python_eval_count} python-eval node(s), "
          f"{ef.sort_aggregate_count} sort-aggregate(s)", flush=True)
    return 0


def privacy_report_cmd(args) -> int:
    import json

    from kinesyslog_spark.report import privacy_report
    from kinesyslog_spark.session import get_spark

    spark = get_spark("kinesyslog-spark-privacy", cpus=args.cpus)
    print(json.dumps(privacy_report(spark, args.sf_dir, args.out_dir)), flush=True)
    return 0


def quality_report_cmd(args) -> int:
    import json

    from kinesyslog_spark.report import quality_report
    from kinesyslog_spark.session import get_spark

    spark = get_spark("kinesyslog-spark-quality", cpus=args.cpus)
    print(json.dumps(quality_report(spark, args.sf_dir, args.out_dir)), flush=True)
    return 0


def training_report_cmd(args) -> int:
    import json

    from kinesyslog_spark.report import training_report
    from kinesyslog_spark.session import get_spark

    spark = get_spark("kinesyslog-spark-training", cpus=args.cpus)
    print(json.dumps(training_report(spark, args.sf_dir, args.out_dir)), flush=True)
    return 0


def purge_cmd(args) -> int:
    import json

    from kinesyslog_spark.operators.purge import purge_keys
    from kinesyslog_spark.session import get_spark

    spark = get_spark("kinesyslog-spark-purge", cpus=args.cpus)
    raw = [k for k in args.keys.split(",") if k]
    keys = [int(k) if k.lstrip("-").isdigit() else k for k in raw]
    stats = purge_keys(
        spark, args.path, args.key_col, keys,
        [c for c in args.part_cols.split(",") if c],
    )
    print(json.dumps(stats), flush=True)
    return 0


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    if args.command == "listen":
        return listen(args)
    if args.command == "install":
        return install(args)
    if args.command == "bucketize":
        return bucketize_cmd(args)
    if args.command == "dump":
        return dump(args)
    if args.command == "compact":
        return compact_cmd(args)
    if args.command == "pipeline":
        return pipeline_cmd(args)
    if args.command == "zorder":
        return zorder_cmd(args)
    if args.command == "corpus-report":
        return corpus_report_cmd(args)
    if args.command == "privacy-report":
        return privacy_report_cmd(args)
    if args.command == "quality-report":
        return quality_report_cmd(args)
    if args.command == "training-report":
        return training_report_cmd(args)
    if args.command == "purge":
        return purge_cmd(args)
    if args.command == "explain":
        return explain_cmd(args)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
