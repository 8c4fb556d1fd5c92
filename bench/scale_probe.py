"""Dedup-chain scale probe: does the 100 TB shape hold two orders of
magnitude above the test tables?

Synthesizes N documents (~50 tokens each, deterministic hash-derived
vocab — no RNG, rerunnable bit-for-bit) with 1% planted near-duplicates
(copy of the previous doc + one extra token → Jaccard ≈ 0.96), then runs
the ENTIRE production chain and times each stage:

    minhash_signatures (zero-shuffle Arrow kernel)
      → lsh_candidates (banded self-join, capped buckets)
      → ngram_jaccard verify (candidates-driven)
      → connected_components → dedup_apply (broadcast anti-join)

Run:  taskset -c 0-31 python -m bench.scale_probe [n_docs]
Prints one PROBE_RESULT json line; numbers live in BENCH/NOTES.md.
"""

from __future__ import annotations

import json
import sys
import time


def synth_docs(spark, n_docs: int):
    """Deterministic corpus: doc i's tokens are h(i, j) over a 5000-word
    vocab; docs with i % 100 == 1 near-duplicate doc i-1 (same 50 tokens
    plus one extra) — so true clusters are known pairs (i-1, i)."""
    from pyspark.sql import functions as F

    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_dup = F.col("doc_id") % 100 == 1
    seed = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(49)),
        lambda j: F.concat(F.lit("w"), F.pmod(F.hash(seed * 53 + j), F.lit(5000))),
    )
    toks = F.when(is_dup, F.concat(toks, F.array(F.concat(F.lit("x"), F.col("doc_id"))))).otherwise(toks)
    return base.select("doc_id", F.concat_ws(" ", toks).alias("text"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    from logspark.operators import dedup
    from logspark.queries import ensure_workers
    from logspark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    ensure_workers(spark)

    docs = synth_docs(spark, n_docs).repartition(64).localCheckpoint(eager=True)
    t: dict[str, float] = {}

    t0 = time.time()
    sigs = dedup.minhash_signatures(docs, n_hashes=16).localCheckpoint(eager=True)
    t["signatures_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    cand = dedup.lsh_candidates(sigs, n_hashes=16, bands=4, max_bucket=50)
    cand = cand.localCheckpoint(eager=True)
    n_cand = cand.count()
    t["lsh_candidates_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    pairs = dedup.ngram_jaccard(docs, threshold=0.5, candidates=cand).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    t["jaccard_verify_s"] = round(time.time() - t0, 2)

    # dedup_apply times whatever path the size gate picks (at ~5k verified
    # pairs from 500k docs that is the driver union-find — realistic: pairs
    # are rare); the DISTRIBUTED loop is then timed explicitly, since the
    # 100 TB evidence is about that shape
    t0 = time.time()
    surviving = dedup.dedup_apply(docs, pairs)
    n_surv = surviving.count()
    t["cc_apply_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    cc_stats: dict = {}
    dedup.connected_components(pairs, stats=cc_stats, driver_threshold=0).count()
    t["cc_distributed_s"] = round(time.time() - t0, 2)

    expected_dropped = sum(1 for i in range(n_docs) if i % 100 == 1)
    # MinHash recall is probabilistic: a Jaccard≈0.96 pair misses one
    # 4-row band w.p. 1-0.96^4 ≈ 0.147, all 4 bands w.p. 0.147^4 ≈ 4.7e-4
    # → ~2.3 expected misses at 5000 planted pairs. Tolerate 5x that.
    miss_budget = max(3, int(0.0047 * expected_dropped) + 3)
    print(
        "PROBE_RESULT "
        + json.dumps(
            {
                "n_docs": n_docs,
                "candidates": n_cand,
                "verified_pairs": n_pairs,
                "survivors": n_surv,
                "dropped": n_docs - n_surv,
                "expected_dropped": expected_dropped,
                "recall_ok": expected_dropped - (n_docs - n_surv) <= miss_budget
                and (n_docs - n_surv) <= expected_dropped,
                "missed_pairs": expected_dropped - (n_docs - n_surv),
                "cc_rounds_distributed": cc_stats.get("rounds"),
                **t,
                "total_s": round(sum(t.values()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
