#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds — bench.py is frozen for
measurement (the driver times the round with its round-start copy), so the
best-of-k per-query protocol (VERDICT r5 Next #1: protocol parity with the
scaling pairs, making single-run co-tenant drift attributable) lives here.

Usage:
    python bench_extra.py [query ...]            # all bench queries or a subset
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_BENCH_REPEATS=2 \
        python bench_extra.py embed_near_dups training_corpus

Prints one JSON line: {"queries": {name: best_sec}, "queries_samples":
{name: [raw...]}, "value": sum_of_best, "sf": ...}. Same noop-sink
methodology as bench.py time_queries (warm once untimed, then k timed runs,
best-of-k reported).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from bench.plan_capture import _load_bench_module

    bench_mod = _load_bench_module()
    HEADLINE, _extra_bench_queries = bench_mod.HEADLINE, bench_mod._extra_bench_queries
    from logspark.queries import QUERIES
    from logspark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    extra = _extra_bench_queries()
    names = sys.argv[1:] or (HEADLINE + sorted(extra))

    spark = get_spark(app_name="logspark-bench-extra")
    samples: dict[str, list[float]] = {}
    for name in names:
        q = QUERIES[name] if name in QUERIES else extra[name]
        spark.sparkContext.setJobDescription(f"warm: {name}")
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"bench[{i}]: {name}")
            t0 = time.time()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        samples[name] = runs
    spark.stop()

    m = re.search(r"sf([0-9.]+)", sf_dir)
    best = {n: min(rs) for n, rs in samples.items()}
    print(
        json.dumps(
            {
                "metric": "per-query best-of-%d noop wall-clock" % repeats,
                "value": round(sum(best.values()), 3),
                "unit": "sec",
                "queries": best,
                "queries_samples": samples,
                "sf": float(m.group(1)) if m else None,
            }
        )
    )


if __name__ == "__main__":
    main()
