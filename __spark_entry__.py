"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``logspark`` package:
- logspark.queries  — Spark callables, one per SURVEY.md §2 operator
                      (+ training-data ops: dedup, similarity, text
                      analysis, multimodal)
- logspark.oracles  — the matching DuckDB SQL
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logspark.oracles import ORACLES  # noqa: E402
from logspark.queries import QUERIES, q_pipeline_sink_counts  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full parse→route→aggregate pipeline (JVM-native grok,
    tag routing, per-sink (conv_id, hour-bucket) counts) on sf0.001."""
    return q_pipeline_sink_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
