"""DataFrame-transform operators: the filter chain, enrich joins, the
fan-out router, per-sink aggregates, skew handling, and the training-data
pipeline extensions (dedup, similarity, text analysis, multimodal)."""
