"""Capacity/framing constants matching the reference's engineered limits
(/root/reference/kinesyslog/constant.py; values documented in BASELINE.md).
"""

MAX_MESSAGE_LENGTH = 6144          # constant.py:5 — truncate beyond (F3)
MAX_MESSAGE_BUFFER = 48 * 6144     # constant.py:6 — per-connection RX cap
TERMINATORS = (b"\n", b"\x00", b"\r")  # constant.py:8 — RFC6587 §3.4.2 (F1)

FLUSH_SIZE = 4 * 1024 * 1024       # constant.py:14 — sink buffer bytes (G2)
FLUSH_TIME = 60                    # constant.py:13 — sink buffer age s (G3)
TIMER_INTERVAL = 10                # constant.py:16 — flush check cadence s
MAX_RECORD_SIZE = 1000 * 1024      # constant.py:15 — gzip'd record cap (G4)
MAX_BATCH_COUNT = 500              # constant.py:17 — records per upload (K2)
MAX_BATCH_SIZE = 4 * 1024 * 1024   # constant.py:18 — bytes per upload (K2)

GELF_MAGIC_ZLIB = b"\x78"          # constant.py:9  (F4 dispatch)
GELF_MAGIC_GZIP = b"\x1f\x8b"      # constant.py:10
GELF_MAGIC_CHUNK = b"\x1e\x0f"     # constant.py:11
GELF_MAX_CHUNKS = 128              # gelf.py:20

SPOOL_PREFIX = "firehose_event-"        # constant.py:19-20 (K1)
SPOOL_TEMP_PREFIX = "_temp_firehose_event-"
