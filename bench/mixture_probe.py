"""Mixture-sampling scale probe: does the two-phase prefix sum actually
spread the per-source running sum across tasks at realistic size?

Synthesizes N documents over 3 sources (deterministic hash-derived token
counts, no RNG) and runs `textops.mixture_sample` with budgets that cut
roughly mid-source, then reports:

- wall-clock for the two-phase form (range buckets → partial sums →
  broadcast offsets → per-(bucket, source) window)
- wall-clock for the NAIVE one-window-partition-per-source form on the
  same input (the r3 shape this replaced) — the number that degrades as
  sources grow, since each source's whole ledger serializes through one
  reducer
- per-source distinct bucket counts (>1 everywhere == no whole-source
  window partition, the scale claim)

Run:  taskset -c 0-31 python -m bench.mixture_probe [n_docs]
Prints one PROBE_RESULT json line; numbers live in BENCH/NOTES.md.
"""

from __future__ import annotations

import json
import sys
import time


def synth_docs(spark, n_docs: int):
    """Deterministic corpus: doc i in source src{i%3}, text = h(i)-many
    repeated tokens (5-40 tokens/doc)."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    n_tok = (F.pmod(F.hash(F.col("doc_id") * 31), F.lit(36)) + 5).cast("int")
    return base.select(
        "doc_id",
        F.concat(F.lit("src"), F.pmod(F.col("doc_id"), F.lit(3))).alias("source"),
        F.concat_ws(" ", F.transform(F.sequence(F.lit(1), n_tok), lambda j: F.lit("w"))).alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from logspark.operators import textops
    from logspark.queries import ensure_workers
    from logspark.session import get_spark

    spark = get_spark(app_name="mixture-probe")
    ensure_workers(spark)

    docs = synth_docs(spark, n_docs).repartition(64).localCheckpoint(eager=True)
    # ~22.5 avg tokens/doc, n/3 docs per source → budget ≈ half the source
    per_src_budget = int(n_docs / 3 * 22.5 / 2)
    budgets = {f"src{i}": per_src_budget for i in range(3)}
    t: dict[str, float] = {}

    t0 = time.time()
    out = textops.mixture_sample(docs, budgets, num_buckets=32)
    n_two_phase = out.count()
    t["two_phase_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    budget = F.lit(None).cast("long")
    for src, b in sorted(budgets.items()):
        budget = F.when(F.col("source") == src, F.lit(b)).otherwise(budget)
    naive = (
        docs.withColumn("n_tokens", F.size(F.split("text", " ")).cast("long"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
    )
    n_naive = naive.count()
    t["naive_single_window_s"] = round(time.time() - t0, 2)

    # the scale claim: every source's ledger spans many buckets
    base = (
        docs.filter(F.col("source").isin(list(budgets)))
        .select("doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
        .repartitionByRange(32, F.col("source"), F.col("doc_id"))
        .withColumn("_bkt", F.spark_partition_id())
    )
    buckets_per_source = {
        r["source"]: r["nb"]
        for r in base.groupBy("source").agg(F.countDistinct("_bkt").alias("nb")).collect()
    }

    result = {
        "probe": "mixture_sample",
        "n_docs": n_docs,
        "budget_per_source": per_src_budget,
        "rows_selected": n_two_phase,
        "rows_match_naive": n_two_phase == n_naive,
        "buckets_per_source": buckets_per_source,
        "no_whole_source_partition": all(v > 1 for v in buckets_per_source.values()),
        **t,
    }
    print("PROBE_RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
