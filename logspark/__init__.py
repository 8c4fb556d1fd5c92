"""logspark — a PySpark-native log/telemetry parse → enrich → route → aggregate engine.

A brand-new implementation (NOT a port) of the query/data-processing
capabilities of `tuhuayuan/go-logagent` (reference at /root/reference —
empty at build time; semantics pinned by /root/repo/BASELINE.json and
SURVEY.md), re-expressed as a batch PySpark DataFrame DAG:

- grok / patch filters  → vectorized pandas/Arrow UDFs over the `text` column
- codec / enrich        → broadcast hash joins keyed on `tool` and `role`
- multi-output fan-out  → conditional routing (tag predicates → sinks column
                          → explode → one partitioned write)
- per-sink aggregates   → groupBy (sink, conv_id, time-bucket) counts
- resume / lineage      → processed-input manifest (Iceberg-snapshot seam)

Layout (SURVEY.md §7):
    logspark.grok        pure-Python grok pattern compiler (no Spark)
    logspark.config      3-section pipeline config (input/filter/output)
    logspark.datagen     deterministic transcripts synthesizer (seed=42)
    logspark.session     SparkSession builder with tuned defaults
    logspark.operators   filter chain, enrich, router, aggregates, skew,
                         dedup, similarity, text analysis, multimodal
    logspark.sources     table IO seam (parquet now, Iceberg in prod), manifest
    logspark.functions   %{field} template compiler, predicate compiler
    logspark.plans       config → DataFrame-DAG pipeline compiler, metrics
    logspark.streaming   foreachBatch wrapper reusing the batch filter chain
"""

__version__ = "0.1.0"
