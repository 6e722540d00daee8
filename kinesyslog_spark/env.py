"""Guarded environment-variable parsing for the engine's scale dials.

Every budget/dial constant (``SPARK_GRAFT_*``) is read at module import
time; a bare ``int()`` there means an empty or malformed value (e.g.
``SPARK_GRAFT_GEMM_MAX_PAIRS=""`` exported by a wrapper script) raises
ValueError and breaks package import for every consumer. These helpers
fall back to the documented default and log a warning instead — a typo
in an ops dial must degrade to the default behavior, not take the
engine down.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("kinesyslog_spark.env")


def env_int(name: str, default: int) -> int:
    """``int(os.environ[name])`` with empty/malformed values treated as
    unset (warned, falls back to ``default``)."""
    raw = os.environ.get(name)
    if raw is None or not raw.strip():
        return default
    try:
        return int(raw)
    except ValueError:
        log.warning(
            "ignoring malformed %s=%r (using default %d)", name, raw, default
        )
        return default


def env_budget(name: str, default: int) -> int | None:
    """A budget dial: ``env_int`` where 0 (or negative) means the budget
    is DISABLED (returns None). Unset keeps the default budget enabled —
    set the variable to 0 explicitly to disable."""
    v = env_int(name, default)
    return v if v > 0 else None
