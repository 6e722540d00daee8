"""Declared query inventory (SURVEY.md §2b) + DuckDB oracle SQL.

Every operator the engine claims is registered here twice:
  QUERIES[name]  -> Callable[(SparkSession, sf_dir), DataFrame]  (Spark plan)
  ORACLE[name]   -> ANSI SQL string DuckDB runs on the same parquet views

Determinism contract (SURVEY §2b): UTC session, no rand/current-time, every
double output ROUND(x, 4), timestamps output as epoch millis, result sets
carry a unique ordering key, and computed columns are aliased identically
on both sides (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query implementation and (optionally) its oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Import for registration side effects (order defines display order).
from kinesyslog_spark.queries import relational  # noqa: E402,F401
from kinesyslog_spark.queries import strings_json  # noqa: E402,F401
from kinesyslog_spark.queries import relay  # noqa: E402,F401
from kinesyslog_spark.queries import llm  # noqa: E402,F401
from kinesyslog_spark.queries import dedup  # noqa: E402,F401
from kinesyslog_spark.queries import ann  # noqa: E402,F401
from kinesyslog_spark.queries import textan  # noqa: E402,F401
from kinesyslog_spark.queries import multimodal  # noqa: E402,F401
from kinesyslog_spark.queries import framing  # noqa: E402,F401
from kinesyslog_spark.queries import gelf  # noqa: E402,F401
from kinesyslog_spark.queries import cluster  # noqa: E402,F401
from kinesyslog_spark.queries import scrub  # noqa: E402,F401
from kinesyslog_spark.queries import decontam  # noqa: E402,F401
from kinesyslog_spark.queries import sampling  # noqa: E402,F401
from kinesyslog_spark.queries import relational_ext  # noqa: E402,F401
from kinesyslog_spark.queries import pipeline_ext  # noqa: E402,F401
from kinesyslog_spark.queries import pivot  # noqa: E402,F401
from kinesyslog_spark.queries import funnel  # noqa: E402,F401
from kinesyslog_spark.queries import retrieval  # noqa: E402,F401
from kinesyslog_spark.queries import verdict  # noqa: E402,F401
from kinesyslog_spark.queries import graph  # noqa: E402,F401
from kinesyslog_spark.queries import timeseries  # noqa: E402,F401
from kinesyslog_spark.queries import pipeline_ops  # noqa: E402,F401
from kinesyslog_spark.queries import semantic  # noqa: E402,F401
from kinesyslog_spark.queries import tokenizer  # noqa: E402,F401
from kinesyslog_spark.queries import analytics_ext  # noqa: E402,F401
from kinesyslog_spark.queries import fusion  # noqa: E402,F401
from kinesyslog_spark.queries import corpus_ext  # noqa: E402,F401
from kinesyslog_spark.queries import relational_more  # noqa: E402,F401
from kinesyslog_spark.queries import dsir  # noqa: E402,F401
from kinesyslog_spark.queries import pq  # noqa: E402,F401
from kinesyslog_spark.queries import resolution  # noqa: E402,F401
from kinesyslog_spark.queries import decontam_sem  # noqa: E402,F401
from kinesyslog_spark.queries import bloom  # noqa: E402,F401
from kinesyslog_spark.queries import stats_ext  # noqa: E402,F401
from kinesyslog_spark.queries import substring  # noqa: E402,F401
from kinesyslog_spark.queries import imagehash  # noqa: E402,F401
from kinesyslog_spark.queries import audio  # noqa: E402,F401
from kinesyslog_spark.queries import curation  # noqa: E402,F401
from kinesyslog_spark.queries import estimators  # noqa: E402,F401
from kinesyslog_spark.queries import logmine  # noqa: E402,F401
from kinesyslog_spark.queries import privacy  # noqa: E402,F401
from kinesyslog_spark.queries import graph_ext  # noqa: E402,F401
from kinesyslog_spark.queries import scenecut  # noqa: E402,F401
from kinesyslog_spark.queries import relational_final  # noqa: E402,F401
from kinesyslog_spark.queries import ivfpq  # noqa: E402,F401
from kinesyslog_spark.queries import quality_audit  # noqa: E402,F401
from kinesyslog_spark.queries import mmr  # noqa: E402,F401
from kinesyslog_spark.queries import contrastive  # noqa: E402,F401
from kinesyslog_spark.queries import relational_tpch2  # noqa: E402,F401
from kinesyslog_spark.queries import textqual  # noqa: E402,F401
from kinesyslog_spark.queries import aqp  # noqa: E402,F401
from kinesyslog_spark.queries import ml  # noqa: E402,F401
from kinesyslog_spark.queries import profiler  # noqa: E402,F401
from kinesyslog_spark.queries import mlops  # noqa: E402,F401
from kinesyslog_spark.queries import chunking  # noqa: E402,F401
from kinesyslog_spark.queries import splits  # noqa: E402,F401
from kinesyslog_spark.queries import spectral  # noqa: E402,F401
from kinesyslog_spark.queries import overlap  # noqa: E402,F401
from kinesyslog_spark.queries import forensics  # noqa: E402,F401
from kinesyslog_spark.queries import evalsplit  # noqa: E402,F401
from kinesyslog_spark.queries import versioning  # noqa: E402,F401
from kinesyslog_spark.queries import robust  # noqa: E402,F401
from kinesyslog_spark.queries import lshaudit  # noqa: E402,F401
from kinesyslog_spark.queries import dedupsweep  # noqa: E402,F401
from kinesyslog_spark.queries import imageresolve  # noqa: E402,F401
from kinesyslog_spark.queries import provenance  # noqa: E402,F401
from kinesyslog_spark.queries import embsweep  # noqa: E402,F401
from kinesyslog_spark.queries import simaudit  # noqa: E402,F401
from kinesyslog_spark.queries import simresolve  # noqa: E402,F401
from kinesyslog_spark.queries import govern  # noqa: E402,F401
