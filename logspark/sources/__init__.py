"""Table IO seam (parquet now, Iceberg as the documented production path)
and the resume/lineage manifest."""
