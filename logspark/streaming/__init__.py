"""Streaming-mode wrapper (SURVEY.md §2.10).

The reference is a continuous agent; our v1 recast is batch (pinned by
BASELINE.json). This module is the documented continuous path: the SAME
filter-chain / enrich / router functions applied per micro-batch via
``foreachBatch`` — zero operator code is streaming-specific.
"""

from logspark.streaming.foreach import make_batch_processor, stream_pipeline
from logspark.streaming.sources import lines_to_transcripts, stream_source
from logspark.streaming.stateful import (
    streaming_embedding_near_dups,
    streaming_exact_dedup,
    streaming_near_dup_candidates,
    streaming_sessionize,
    streaming_sink_counts,
)

__all__ = [
    "lines_to_transcripts",
    "make_batch_processor",
    "stream_pipeline",
    "stream_source",
    "streaming_embedding_near_dups",
    "streaming_exact_dedup",
    "streaming_near_dup_candidates",
    "streaming_sessionize",
    "streaming_sink_counts",
]
