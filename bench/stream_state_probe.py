"""Streaming near-dup STATE-GROWTH probe (VERDICT r5 #8): per-bucket
state is bounded by max_bucket, but bucket COUNT grows with the corpus —
measure state-store rows/bytes at probe scale so the sizing rule next to
`streaming_near_dup_candidates` is a number, not a guess.

Synthesizes N docs (same deterministic corpus as scale_probe), writes
them as `n_files` parquet files, streams them through
`streaming_near_dup_candidates` with `maxFilesPerTrigger=1` (so state
accumulates across real micro-batches, exercising the cross-batch path),
and reports the state store's own metrics from the final progress event:

    state_rows   = number of (band, key) buckets held
    state_bytes  = store memory used
    bytes_per_doc, ids_per_doc (= bands, by construction)

Run:  SPARK_GRAFT_DRIVER_MEM=24g python -m bench.stream_state_probe [n_docs] [n_files]
Prints one PROBE_RESULT json line; numbers live in BENCH/NOTES.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from bench.scale_probe import synth_docs
    from logspark.queries import ensure_workers
    from logspark.session import get_spark
    from logspark.streaming.stateful import streaming_near_dup_candidates

    spark = get_spark(app_name="stream-state-probe")
    ensure_workers(spark)
    root = tempfile.mkdtemp(prefix="ssprobe_")
    t0 = time.time()
    synth_docs(spark, n_docs).repartition(n_files).write.mode("overwrite").parquet(
        f"{root}/in"
    )
    t_gen = round(time.time() - t0, 2)

    stream = spark.readStream.schema("doc_id bigint, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{root}/in")
    cands = streaming_near_dup_candidates(stream, max_bucket=50)
    t0 = time.time()
    q = (
        cands.writeStream.format("noop")
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    t_stream = round(time.time() - t0, 2)

    # the last progress event with state metrics carries the final store size
    ops = [p for p in (q.recentProgress or []) if p.get("stateOperators")]
    st = ops[-1]["stateOperators"][0] if ops else {}
    rows = int(st.get("numRowsTotal", -1))
    mem = int(st.get("memoryUsedBytes", -1))
    print(
        "PROBE_RESULT "
        + json.dumps(
            {
                "n_docs": n_docs,
                "n_files": n_files,
                "gen_s": t_gen,
                "stream_s": t_stream,
                "n_batches": len([p for p in (q.recentProgress or []) if p.get("numInputRows")]),
                "state_rows": rows,
                "state_bytes": mem,
                "state_rows_per_doc": round(rows / n_docs, 4) if rows > 0 else None,
                "state_bytes_per_doc": round(mem / n_docs, 2) if mem > 0 else None,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
