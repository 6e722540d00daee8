"""Guarded env-dial parsing (kinesyslog_spark/env.py): malformed or
empty SPARK_GRAFT_* values must fall back to the default instead of
raising at package import (they are all parsed at module import time)."""

from __future__ import annotations

from kinesyslog_spark.env import env_budget, env_int


def test_env_int_fallbacks(monkeypatch):
    monkeypatch.delenv("X_DIAL", raising=False)
    assert env_int("X_DIAL", 7) == 7
    monkeypatch.setenv("X_DIAL", "")
    assert env_int("X_DIAL", 7) == 7
    monkeypatch.setenv("X_DIAL", "  ")
    assert env_int("X_DIAL", 7) == 7
    monkeypatch.setenv("X_DIAL", "nonsense")
    assert env_int("X_DIAL", 7) == 7
    monkeypatch.setenv("X_DIAL", "42")
    assert env_int("X_DIAL", 7) == 42
    monkeypatch.setenv("X_DIAL", "-3")
    assert env_int("X_DIAL", 7) == -3


def test_env_budget_zero_disables(monkeypatch):
    monkeypatch.delenv("X_BUDGET", raising=False)
    assert env_budget("X_BUDGET", 100) == 100      # unset -> default ON
    monkeypatch.setenv("X_BUDGET", "0")
    assert env_budget("X_BUDGET", 100) is None     # explicit 0 -> disabled
    monkeypatch.setenv("X_BUDGET", "-5")
    assert env_budget("X_BUDGET", 100) is None
    monkeypatch.setenv("X_BUDGET", "25")
    assert env_budget("X_BUDGET", 100) == 25
    monkeypatch.setenv("X_BUDGET", "garbage")
    assert env_budget("X_BUDGET", 100) == 100      # malformed -> default ON
