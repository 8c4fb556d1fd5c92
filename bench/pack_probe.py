"""Packing scale probe: do both packing layouts hold at two orders of
magnitude above the test tables, and does the no-split reconciliation
stay driver-light?

Synthesizes N documents (deterministic hash-derived token counts, no
RNG) and runs:

- `pack_sequences` (concatenate-and-cut; closed-form over the two-phase
  distributed prefix sum)
- `pack_sequences_nosplit` (first-fit whole-doc bins; per-bucket backward
  DP + driver reconciliation) — reporting the driver-side summary row
  count, which must stay O(buckets x head-window), NOT O(n_docs): the
  scale claim is that only one sequence's worth of docs per bucket ever
  reaches the driver.

Invariants checked at probe scale: total packed tokens == corpus tokens
(cut form), every no-split bin ≤ L with no doc split, both results
nonempty.

Run:  taskset -c 0-31 python -m bench.pack_probe [n_docs]
Prints one PROBE_RESULT json line; numbers live in BENCH/NOTES.md.
"""

from __future__ import annotations

import json
import sys
import time


def synth_docs(spark, n_docs: int):
    """Deterministic corpus: doc i has 5 + h(i) % 120 repeated tokens."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    n = (F.pmod(F.hash(F.col("doc_id") * 31 + 7), F.lit(120)) + 5).cast("int")
    return base.select(
        "doc_id",
        F.concat_ws(" ", F.array_repeat(F.lit("w"), n)).alias("text"),
        n.cast("long").alias("_n"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from pyspark.sql import functions as F

    from logspark.operators import textops
    from logspark.queries import ensure_workers
    from logspark.session import get_spark

    spark = get_spark(app_name="pack-probe")
    ensure_workers(spark)
    L = 2048

    docs = synth_docs(spark, n_docs).repartition(64).localCheckpoint(eager=True)
    total_toks = docs.agg(F.sum("_n")).collect()[0][0]

    t: dict[str, float] = {}
    t0 = time.time()
    cut = textops.pack_sequences(docs, seq_tokens=L)
    cut_toks, cut_seqs = cut.agg(
        F.sum("n_toks_in_seq"), F.countDistinct("seq_idx")
    ).collect()[0]
    t["pack_cut_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    ns_stats: dict = {}
    ns = textops.pack_sequences_nosplit(docs, seq_tokens=L, stats=ns_stats)
    fills = ns.groupBy("seq_idx").agg(F.sum("n_toks").alias("fill"))
    ns_bins, max_fill, ns_toks = fills.agg(
        F.count(F.lit(1)), F.max("fill"), F.sum("fill")
    ).collect()[0]
    t["pack_nosplit_s"] = round(time.time() - t0, 2)

    # driver-reconciliation footprint: MEASURED rows that reached the
    # driver (head windows + one totals row per bucket), checked against
    # the theoretical O(P x window) bound — all-minimum-size docs
    P = ns_stats["buckets"]
    max_window_rows = (L // 5) + 2

    print(
        "PROBE_RESULT "
        + json.dumps(
            {
                "n_docs": n_docs,
                "total_tokens": int(total_toks),
                "cut_sequences": int(cut_seqs),
                "cut_tokens_ok": int(cut_toks) == int(total_toks),
                "nosplit_bins": int(ns_bins),
                "nosplit_max_fill": int(max_fill),
                "nosplit_fill_ok": int(max_fill) <= L,
                "nosplit_tokens_ok": int(ns_toks) == int(total_toks),
                "driver_rows_measured": ns_stats["summary_rows"],
                "driver_rows_bound": P * max_window_rows,
                "driver_rows_ok": ns_stats["summary_rows"] <= P * max_window_rows,
                "driver_rows_vs_docs": round(ns_stats["summary_rows"] / n_docs, 4),
                **t,
            }
        )
    )


if __name__ == "__main__":
    main()
