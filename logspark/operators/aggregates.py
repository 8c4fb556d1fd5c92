"""Per-sink aggregates (SURVEY.md §2.4 row A1).

BASELINE.json: "per-sink groupBy aggregates over conv_id and time buckets
of ts" with counts identical to the reference. Spark's hash aggregate does
partial (map-side) + final aggregation automatically, so the shuffle moves
only (sink, conv_id, bucket, partial_count) rows — tiny relative to parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_counts(routed: DataFrame, bucket: str = "hour") -> DataFrame:
    """(sink, conv_id, time-bucket) → count. `bucket` is any date_trunc unit."""
    return (
        routed.groupBy(
            "sink",
            "conv_id",
            F.date_trunc(bucket, F.col("ts")).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sink_totals(routed: DataFrame) -> DataFrame:
    return routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n"))
