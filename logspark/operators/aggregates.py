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


def sessionize(
    df: DataFrame,
    gap_minutes: int = 30,
    key: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Gap-based sessionization: split each conversation into sessions
    wherever consecutive turns are more than `gap_minutes` apart. Returns
    one row per (key, session_idx) with n_turns / session_start /
    session_end. The batch form of a session window (streaming would use
    `F.session_window(ts, gap)`); expressed as lag + running sum so one
    conv_id shuffle does everything — and a conv_id-bucketed layout
    (sources.write_bucketed) makes even that shuffle free."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(ts_col, order_col)
    gap_s = gap_minutes * 60
    # NTZ timestamps refuse a direct long cast; the session tz is UTC, so
    # the timestamp hop is value-preserving (epoch seconds, floored)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    new_sess = epoch - F.lag(epoch).over(w) > gap_s
    sess = F.sum(F.coalesce(new_sess.cast("long"), F.lit(0))).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("session_idx", sess)
        .groupBy(key, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )
