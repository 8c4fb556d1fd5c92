#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Two parts:
1. per-query wall-clock for the headline operators at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
2. the north-rule scaling evidence: the full parse→route pipeline over a
   deterministically synthesized transcripts table at local[8] and
   local[32] (each in a fresh JVM subprocess), reporting turns/sec at both
   and efficiency = (tput_32 / tput_8) / 4 — target ≥ 0.8 (BASELINE.md)

Skip the (slower) scaling part with SPARK_GRAFT_SKIP_SCALING=1.
Scaling input size: $SPARK_GRAFT_BENCH_TURNS (default 48,000,000 — sized so
the local[8] run takes well over 60 s and fixed startup/commit costs are
amortized, per the BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pipeline_sink_counts",
    "pipeline_routed_rows",
    "grok_typed_capture",
    "json_codec",
    "patch_template",
    "enrich_geo",
    "router_fanout",
    "sink_counts_hourly",
    "window_bucket_agg",
    "dedup_exact",
    "minhash_signatures",
    "lsh_candidates",
    "simhash",
    "token_stats",
    "quality_scores",
    "embed_cosine_topk",
    "embed_ann_lsh",
]


def time_queries(sf_dir: str) -> dict[str, float]:
    from logspark.queries import QUERIES
    from logspark.session import get_spark

    spark = get_spark(app_name="logspark-bench")
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = QUERIES[name]
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm plan/workers
        t0 = time.time()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    spark.stop()
    return timings


def run_scaling(n_turns: int) -> dict:
    results = {}
    for cores in (8, 32):
        # taskset pins the WHOLE process tree (JVM + Python workers) to a
        # true `cores`-wide budget — exactly how a cluster executor with
        # `cores` slots behaves. Without it, local[8]'s Python workers
        # overflow onto spare cores and inflate the small-N baseline.
        cmd = [
            "taskset", "-c", f"0-{cores - 1}",
            sys.executable, "-m", "bench.runner",
            "--cores", str(cores), "--n-turns", str(n_turns),
        ]
        env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
        m = re.search(r"BENCH_RESULT (\{.*\})", proc.stdout)
        if not m:
            raise RuntimeError(f"bench.runner --cores {cores} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
        results[cores] = json.loads(m.group(1))
    eff = (results[32]["turns_per_sec"] / results[8]["turns_per_sec"]) / 4
    return {
        "turns": results[8]["rows"],
        "local8_sec": results[8]["seconds"],
        "local8_turns_per_sec": results[8]["turns_per_sec"],
        "local32_sec": results[32]["seconds"],
        "local32_turns_per_sec": results[32]["turns_per_sec"],
        "scaling_efficiency_8_to_32": round(eff, 3),
    }


def update_baseline_md(scaling: dict) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(
            "# BENCH/BASELINE.md — measured scaling evidence (north rule)\n\n"
            "Protocol (see /root/repo/BASELINE.md): identical parse→route job —\n"
            "scan → grok pandas UDF → json codec → patch → 2 broadcast enrich\n"
            "joins → explode router → partitioned routed write + per-sink\n"
            "(conv_id, hour) counts — over the same deterministically synthesized\n"
            f"transcripts table ({scaling['turns']:,} turns, 128 parquet files),\n"
            "at two parallelism levels in fresh JVMs (sandbox stand-in for N vs\n"
            "4N executors).\n\n"
            "| run | master | wall-clock (s) | turns/sec |\n"
            "|---|---|---|---|\n"
            f"| 1 | local[8] | {scaling['local8_sec']} | {scaling['local8_turns_per_sec']:,} |\n"
            f"| 2 | local[32] | {scaling['local32_sec']} | {scaling['local32_turns_per_sec']:,} |\n\n"
            f"**Scaling efficiency (8→32 cores) = (tput32/tput8)/4 = "
            f"{scaling['scaling_efficiency_8_to_32']}** (target ≥ 0.8)\n\n"
            "Reproduce:\n\n"
            "```bash\n"
            "cd /root/repo\n"
            "python -m bench.runner --cores 8   # prints BENCH_RESULT {...}\n"
            "python -m bench.runner --cores 32\n"
            "# equivalent cluster form:\n"
            "# spark-submit --py-files logspark.zip --master <N-executor cluster>  bench/runner.py ...\n"
            "```\n"
        )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(re.search(r"sf([0-9.]+)", sf_dir).group(1)) if re.search(r"sf([0-9.]+)", sf_dir) else None

    timings = time_queries(sf_dir)
    result = {
        "metric": "headline query wall-clock + parse-route scaling",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        n_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "48000000"))
        scaling = run_scaling(n_turns)
        result["scaling"] = scaling
        update_baseline_md(scaling)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
