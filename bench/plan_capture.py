#!/usr/bin/env python
"""Capture `.explain(\"formatted\")` for bench queries into plans/<tag>/.

Usage:
    python -m bench.plan_capture <tag> [query ...]
        # writes plans/<tag>/<query>.txt for every (or the named) bench query

The optimization-round deliverable wants plans/r06/<query>_before.txt and
_after.txt — pass e.g. `r06_before` / `r06_after` as the tag and rename, or
use tags `r06` with suffix via PLAN_SUFFIX env (_before/_after appended to
the file name)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_bench_module():
    """bench/ the package shadows bench.py the module — load it by path."""
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location("bench_main", os.path.join(repo, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    bench_mod = _load_bench_module()
    HEADLINE, _extra_bench_queries = bench_mod.HEADLINE, bench_mod._extra_bench_queries
    from logspark.queries import QUERIES
    from logspark.session import get_spark

    tag = sys.argv[1]
    suffix = os.environ.get("PLAN_SUFFIX", "")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = _extra_bench_queries()
    names = sys.argv[2:] or (HEADLINE + sorted(extra))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="logspark-plan-capture")
    for name in names:
        q = QUERIES[name] if name in QUERIES else extra[name]
        df = q(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(out_dir, f"{name}{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
