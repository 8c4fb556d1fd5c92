"""Structured-Streaming execution of the batch pipeline.

go-logagent runs forever, tailing inputs (SURVEY.md §3.1 entry 2). The
Spark-native continuous form is a file-source stream over the transcripts
directory with the identical batch DAG applied per micro-batch:

    readStream (file source, maxFilesPerTrigger)
      → foreachBatch(batch_df -> filter chain → enrich → route → writes)

Design points:
- the batch functions are reused UNCHANGED — `foreachBatch` hands us a
  plain DataFrame, so grok/patch/enrich/router need no streaming variants;
- the checkpointLocation tracks which input files each micro-batch covered
  (Spark's file-source log — the streaming analogue of our batch manifest);
- **replay idempotency**: foreachBatch is only at-least-once — after a
  mid-batch failure Spark re-runs the SAME batch_id. Writes are therefore
  keyed by batch_id and use dynamic-partition OVERWRITE: a replayed batch
  replaces its own partition instead of appending duplicates. Exactly the
  per-run overwrite-directory idempotency of the batch path (manifest.py),
  in streaming form;
- event-time windowed aggregates with late data would use
  `withWatermark("ts", ...)` + `window(ts, ...)` *inside* the streaming DAG
  instead of foreachBatch; the reference has no late-data semantics
  (SURVEY.md §2.10), so per-batch counts match its behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from logspark.config import PipelineConfig
from logspark.operators.aggregates import sink_counts
from logspark.operators.enrich import apply_enrich_chain
from logspark.operators.filters import apply_filter_chain
from logspark.operators.router import route

TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def make_batch_processor(
    cfg: PipelineConfig,
    sink_root: str,
    dims: dict[str, DataFrame] | None = None,
):
    """The foreachBatch function: batch DAG + batch_id-idempotent writes.
    Exposed so tests can replay a batch_id and assert no double counts."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        parsed = apply_filter_chain(batch_df, cfg.filter)
        if cfg.enrich:
            parsed = apply_enrich_chain(parsed, cfg.enrich, dims or {})
        routed = route(parsed, cfg.output).withColumn("batch_id", F.lit(batch_id))
        routed.persist()
        try:
            # dynamic-partition overwrite keyed on batch_id: a replayed
            # micro-batch (at-least-once foreachBatch) replaces its own
            # batch_id=<id>/ partitions — no double counts after recovery
            (
                routed.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id", "sink")
                .parquet(f"{sink_root}/routed")
            )
            (
                sink_counts(routed, bucket=cfg.aggregate.get("bucket", "hour"))
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(f"{sink_root}/sink_counts")
            )
        finally:
            routed.unpersist()

    return process_batch


def stream_pipeline(
    spark: SparkSession,
    cfg: PipelineConfig,
    input_dir: str | None,
    sink_root: str,
    checkpoint_dir: str,
    dims: dict[str, DataFrame] | None = None,
    max_files_per_trigger: int = 8,
    available_now: bool = True,
    source: DataFrame | None = None,
):
    """Returns the started StreamingQuery. With available_now=True the query
    drains everything currently available and stops — the testable mode;
    False tails forever like the reference agent. `source` accepts any
    streaming DataFrame in the transcripts shape (see streaming.sources for
    the socket/rate push-input builders); default is the file source over
    `input_dir` — the tailed-directory case."""
    if source is not None:
        src = source
    else:
        src = (
            spark.readStream.schema(TRANSCRIPTS_DDL)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir)
        )

    writer = src.writeStream.foreachBatch(
        make_batch_processor(cfg, sink_root, dims)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
