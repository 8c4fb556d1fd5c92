"""Pipeline compiler: config → DataFrame DAG → executed run with metrics."""
