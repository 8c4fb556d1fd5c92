"""Continuous-ingestion dedup agent: the watch() pattern applied to
near-duplicate detection (SURVEY.md §3.1 agent mode x the training-data
dedup family).

Each tick:

  1. manifest-pending input files (same resume seam as the parse→route
     pipeline: crash mid-tick → same run_id → idempotent overwrite);
  2. `incremental_near_dup_pairs` — MinHash signatures for the NEW batch
     only, banding against the `SignatureStore` (store ∪ new), Jaccard
     verify reading texts only for candidate-touched docs;
  3. verified pairs written under runs/<run_id>/pairs, then the manifest
     commit marks the files processed (write-then-commit, like run()).

Union-of-ticks == one-shot whole-corpus pairs (the incremental
guarantee, max_bucket=None), so a corpus ingested file-by-file over
days yields exactly the pair set a from-scratch batch job would — the
operational shape of continuous training-data ingestion.

Single-writer: each tick holds the sink_root's WriterLock (flock), so a
concurrent ad-hoc tick cannot race the manifest commit.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from logspark.operators.dedup import SignatureStore, incremental_near_dup_pairs
from logspark.plans.pipeline import WriterLock
from logspark.sources import manifest as mf
from logspark.sources.tableio import ParquetIO


def dedup_tick(
    spark: SparkSession,
    io: ParquetIO,
    table: str,
    sink_root: str,
    threshold: float = 0.5,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> dict:
    """One agent tick. Returns {run_id, new_files, n_pairs} (run_id None
    when nothing is pending). Safe to call from a watch()-style loop."""
    with WriterLock(sink_root):
        all_files = io.input_files(spark, table)
        manifest = mf.load_manifest(sink_root)
        pending = mf.pending_files(all_files, manifest)
        if not pending:
            return {"run_id": None, "new_files": [], "n_pairs": 0}
        rid = "d-" + hashlib.md5("\n".join(sorted(pending)).encode()).hexdigest()[:12]
        store = SignatureStore(os.path.join(sink_root, "sigstore"))

        # Crash replay is keyed PER FILE, not on the pending-set hash
        # (ADVICE r4 medium): a tick that died between the store commit and
        # the manifest commit leaves its files in store.committed_files()
        # but not in the manifest. If a NEW file arrived before the retry,
        # the pending set (and rid) changed — but the per-file key still
        # routes the already-ingested files through replay (band against
        # the store, never re-append), so the store can never accumulate
        # duplicate signature rows.
        ingested = store.committed_files()
        already = sorted(f for f in pending if f in ingested)
        fresh = sorted(f for f in pending if f not in ingested)
        # Secondary replay signal (ADVICE r5 medium): a LEGACY-format run
        # (appended before per-file provenance existed) that crashed
        # between store commit and manifest commit leaves its files out of
        # committed_files(); with an unchanged pending set the derived rid
        # equals the committed run id, and re-appending under it would
        # raise 'already committed' on every tick — wedging the loop.
        # rid membership in committed_runs() proves this exact pending set
        # was already ingested, so route it all through replay.
        if fresh and rid in store.committed_runs():
            already, fresh = sorted(pending), []

        # Verify-stage texts: only files that can hold candidate-touched
        # docs — the pending set plus every store-member file. Files that
        # land in the table concurrently (after the listing above) are
        # never scanned; io.read(table) at action time would be. Legacy
        # stores without per-run file provenance fall back to the
        # manifest's processed set.
        needed = set(pending) | ingested
        if not store.files_complete():
            needed |= manifest.processed_files
        corpus = io.read_files(spark, table, sorted(needed & set(all_files) | set(pending)))

        parts = []
        if already:
            parts.append(
                incremental_near_dup_pairs(
                    store,
                    io.read_files(spark, table, already),
                    corpus,
                    run_id=None,
                    threshold=threshold,
                    n_hashes=n_hashes,
                    bands=bands,
                    k=k,
                    replay=True,
                )
            )
        if fresh:
            parts.append(
                incremental_near_dup_pairs(
                    store,
                    io.read_files(spark, table, fresh),
                    corpus,
                    run_id=rid,
                    threshold=threshold,
                    n_hashes=n_hashes,
                    bands=bands,
                    k=k,
                    input_files=fresh,
                )
            )
        pairs = parts[0]
        for p in parts[1:]:
            pairs = pairs.unionByName(p).dropDuplicates(["a", "b"])
        out = os.path.join(sink_root, "runs", rid, "pairs")
        pairs.write.mode("overwrite").parquet(out)
        n_pairs = spark.read.parquet(out).count()
        # Observability for the legacy crash window (ADVICE r5 low): when
        # store provenance is incomplete, signatures may belong to files
        # in neither the pending set nor the manifest — their candidate
        # pairs are silently dropped by the text semi-join. Count them so
        # the loss is visible in the tick result (legacy stores only; the
        # count is one anti-join over id-only projections).
        n_orphan = 0
        if not store.files_complete():
            sigs_all = store.load(spark)
            if sigs_all is not None:
                n_orphan = (
                    sigs_all.select("doc_id")
                    .distinct()
                    .join(corpus.select("doc_id").distinct(), "doc_id", "left_anti")
                    .count()
                )
        mf.commit_run(sink_root, mf.RunRecord(run_id=rid, input_files=pending))
        return {
            "run_id": rid,
            "new_files": pending,
            "n_pairs": n_pairs,
            "replayed_files": already,
            "corpus_files": sorted(corpus.inputFiles()),
            "n_orphan_sig_docs": n_orphan,
        }


def _pin_centroids(spark, sink_root: str, centroids, first_batch_fn, n_cells: int):
    """Centroids must be FIXED for the store's lifetime (a drifting
    assignment splits cells across time), so the FIRST tick persists them
    under the sink root and every later tick — any process, any restart —
    reads the pinned copy back. Re-training means a new store generation.

    The pin is write-then-RENAME: Spark's parquet write is not atomic (it
    creates the destination dir before committing files), so gating on
    the final directory's existence over a direct write would wedge — or
    silently half-pin — after a crash mid-write. Writing to a temp dir
    and renaming makes 'centroids dir exists' mean 'fully committed',
    the same discipline as the store index. `first_batch_fn` is a thunk
    so the seed scan is only built on the first tick."""
    path = os.path.join(sink_root, "centroids")
    if not os.path.isdir(path):
        from logspark.operators.similarity import head_centroids

        c = head_centroids(first_batch_fn(), n_cells) if centroids is None else centroids
        tmp = path + ".tmp"
        c.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, path)
    return spark.read.parquet(path)


def embed_dedup_tick(
    spark: SparkSession,
    io: ParquetIO,
    table: str,
    sink_root: str,
    centroids=None,
    n_cells: int = 6,
    threshold: float = 0.95,
    nprobe: int = 2,
) -> dict:
    """One EMBEDDING dedup agent tick — the vector sibling of
    `dedup_tick`: manifest-pending files → `incremental_ivf_near_dups`
    against the cell-partitioned vector store → pairs under
    runs/<rid>/pairs → manifest commit, all under the writer lock, with
    the same PER-FILE crash replay key (store provenance, not run-set
    hashes). Unlike the MinHash tick there is NO corpus re-read at all:
    the store carries the vectors, and its scan is pruned to the new
    batch's cells. Union-of-ticks == one-shot `ivf_near_dups` on the
    pinned centroids (the incremental guarantee, max_bucket=None)."""
    from logspark.operators.similarity import incremental_ivf_near_dups

    with WriterLock(sink_root):
        all_files = io.input_files(spark, table)
        manifest = mf.load_manifest(sink_root)
        pending = mf.pending_files(all_files, manifest)
        if not pending:
            return {"run_id": None, "new_files": [], "n_pairs": 0}
        rid = "e-" + hashlib.md5("\n".join(sorted(pending)).encode()).hexdigest()[:12]
        store = SignatureStore(os.path.join(sink_root, "vstore"))
        ingested = store.committed_files()
        already = sorted(f for f in pending if f in ingested)
        fresh = sorted(f for f in pending if f not in ingested)
        cents = _pin_centroids(
            spark,
            sink_root,
            centroids,
            lambda: io.read_files(spark, table, pending),
            n_cells,
        )
        parts = []
        if already:
            parts.append(
                incremental_ivf_near_dups(
                    store,
                    io.read_files(spark, table, already),
                    cents,
                    run_id=None,
                    threshold=threshold,
                    nprobe=nprobe,
                    replay=True,
                )
            )
        if fresh:
            parts.append(
                incremental_ivf_near_dups(
                    store,
                    io.read_files(spark, table, fresh),
                    cents,
                    run_id=rid,
                    threshold=threshold,
                    nprobe=nprobe,
                    input_files=fresh,
                )
            )
        pairs = parts[0]
        for p in parts[1:]:
            pairs = pairs.unionByName(p).dropDuplicates(["a", "b"])
        out = os.path.join(sink_root, "runs", rid, "pairs")
        pairs.write.mode("overwrite").parquet(out)
        n_pairs = spark.read.parquet(out).count()
        mf.commit_run(sink_root, mf.RunRecord(run_id=rid, input_files=pending))
        return {
            "run_id": rid,
            "new_files": pending,
            "n_pairs": n_pairs,
            "replayed_files": already,
        }


def watch_dedup(
    spark: SparkSession,
    io: ParquetIO,
    table: str,
    sink_root: str,
    interval_s: float = 30.0,
    max_iterations: int | None = None,
    compact_every: int | None = 64,
    **tick_kwargs,
) -> list[dict]:
    """Continuous agent loop around `dedup_tick` — the dedup analogue of
    plans.pipeline.watch: poll for new input files every `interval_s`,
    ingest + pair + commit per tick. `max_iterations` bounds the loop for
    tests; None tails forever like the reference agent.

    `compact_every`: once the SignatureStore accumulates that many run
    directories, fold them into one (`SignatureStore.compact` — the
    small-files defense; a year of hourly ticks is ~10k directories whose
    listings start to dominate every load). Compaction preserves the
    per-file ingestion provenance the crash-replay key depends on, and
    runs under the same WriterLock as ticks so it cannot race a commit.
    None disables."""
    import time

    results: list[dict] = []
    i = 0
    while max_iterations is None or i < max_iterations:
        results.append(dedup_tick(spark, io, table, sink_root, **tick_kwargs))
        store = SignatureStore(os.path.join(sink_root, "sigstore"))
        if compact_every is not None and len(store.committed_runs()) >= compact_every:
            with WriterLock(sink_root):
                store.compact(spark)
        i += 1
        if max_iterations is None or i < max_iterations:
            time.sleep(interval_s)
    return results


def watch_embed_dedup(
    spark: SparkSession,
    io: ParquetIO,
    table: str,
    sink_root: str,
    interval_s: float = 30.0,
    max_iterations: int | None = None,
    compact_every: int | None = 64,
    **tick_kwargs,
) -> list[dict]:
    """Continuous loop around `embed_dedup_tick` — same contract as
    `watch_dedup`, over the cell-partitioned vector store. Compaction
    preserves the partitioned layout (store index carries partition_by)
    and the per-file provenance, both under the writer lock."""
    import time

    results: list[dict] = []
    i = 0
    while max_iterations is None or i < max_iterations:
        results.append(embed_dedup_tick(spark, io, table, sink_root, **tick_kwargs))
        store = SignatureStore(os.path.join(sink_root, "vstore"))
        if compact_every is not None and len(store.committed_runs()) >= compact_every:
            with WriterLock(sink_root):
                store.compact(spark)
        i += 1
        if max_iterations is None or i < max_iterations:
            time.sleep(interval_s)
    return results


def all_pairs(spark: SparkSession, sink_root: str) -> DataFrame:
    """The union of every committed tick's verified pairs — by the
    incremental guarantee, equal to the one-shot whole-corpus pair set."""
    m = mf.load_manifest(sink_root)
    paths = [
        os.path.join(sink_root, "runs", r.run_id, "pairs")
        for r in m.runs
        if os.path.isdir(os.path.join(sink_root, "runs", r.run_id, "pairs"))
    ]
    if not paths:
        return spark.createDataFrame([], "a bigint, b bigint, jaccard double")
    return spark.read.parquet(*paths).dropDuplicates(["a", "b"])
