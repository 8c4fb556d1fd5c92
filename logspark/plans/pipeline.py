"""Config → DataFrame-DAG compiler + executed runs (SURVEY.md §3.2).

    PipelineConfig
      → build(): scan → filter chain → enrich joins → router
                 (ALL narrow — one stage, no shuffle before the sinks)
      → run():   one partitioned sink write + one per-sink-counts aggregate,
                 observation + accumulator metrics, resume manifest commit.

Scale notes (the 100 TB story):
- Everything before the write/agg is a single narrow stage: parquet/Iceberg
  scan → Arrow-batched grok UDF → native patch/json/template exprs →
  broadcast enrich joins → sinks-array + explode. No wide dependency, so
  throughput scales with executor count (the ≥0.8 N→4N criterion).
- The routed write uses write.partitionBy("sink") — dynamic partition write,
  no shuffle inserted. The counts aggregate is the only shuffle and moves
  pre-aggregated (sink, conv_id, bucket) partials.
- Incremental runs read only manifest-pending input files (Iceberg:
  start-snapshot-id); sink writes land under runs/<run_id>/ so a crashed run
  re-executes idempotently (overwrite same path) before the manifest commit.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from logspark.config import PipelineConfig
from logspark.operators.aggregates import sink_counts
from logspark.operators.enrich import apply_enrich_chain
from logspark.operators.filters import GROK_FAILURE_TAG, apply_filter_chain, ensure_tags
from logspark.operators.router import route
from logspark.sources import manifest as mf
from logspark.sources.tableio import ParquetIO


@dataclass
class BuiltPipeline:
    parsed: DataFrame  # after filter chain + enrich (pre-router, all events)
    routed: DataFrame  # one row per (event, sink)
    counts: DataFrame  # (sink, conv_id, bucket, n)
    observation: Observation | None = None


@dataclass
class RunResult:
    run_id: str
    sink_rows: dict[str, int] = dc_field(default_factory=dict)
    metrics: dict[str, float] = dc_field(default_factory=dict)
    input_files: list[str] = dc_field(default_factory=list)


def load_inputs(
    spark: SparkSession,
    cfg: PipelineConfig,
    io: ParquetIO | None,
    df: DataFrame | None,
    input_files: list[str] | None = None,
) -> DataFrame:
    frames: list[DataFrame] = []
    for inp in cfg.input:
        t = inp["type"]
        if t == "memory":
            if df is None:
                raise ValueError("memory input requires a DataFrame argument")
            frames.append(df)
        elif t == "table":
            if io is None:
                raise ValueError("table input requires a TableIO")
            if input_files is not None:
                frames.append(io.read_files(spark, inp["table"], input_files))
            else:
                frames.append(io.read(spark, inp["table"]))
        else:
            raise ValueError(f"unknown input type {t!r}")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def build(
    spark: SparkSession,
    cfg: PipelineConfig,
    df: DataFrame | None = None,
    io: ParquetIO | None = None,
    dims: dict[str, DataFrame] | None = None,
    observe: bool = True,
    input_files: list[str] | None = None,
) -> BuiltPipeline:
    src = load_inputs(spark, cfg, io, df, input_files)
    src = ensure_tags(src)

    parsed = apply_filter_chain(src, cfg.filter)
    if cfg.enrich:
        parsed = apply_enrich_chain(parsed, cfg.enrich, dims or {})

    obs = None
    if observe:
        obs = Observation("parse")
        parsed = parsed.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(
                F.array_contains(F.col("tags"), GROK_FAILURE_TAG).cast("long")
            ).alias("parse_failures"),
        )

    routed = route(parsed, cfg.output)
    counts = sink_counts(routed, bucket=cfg.aggregate.get("bucket", "hour"))
    return BuiltPipeline(parsed=parsed, routed=routed, counts=counts, observation=obs)


class WriterLock:
    """Single-writer lock over a sink_root.

    The orphan-run GC in `run()` deletes every runs/<id> directory absent
    from the manifest — correct for crashed-run debris, but a CONCURRENT
    in-flight run over the same sink_root (watch agent + ad-hoc run, or two
    watchers) has not committed yet and would be reaped mid-write: silent
    data loss (ADVICE r2). logspark therefore enforces one writer per
    sink_root: `run()` acquires this lock for the write+GC+commit span and
    REFUSES (clear error, no deletion) if another live process holds it.

    Mechanics (ADVICE r3 hardening): the lock IS an `fcntl.flock` held on a
    persistently-open fd — not the file's existence. The kernel releases a
    flock when its holder dies, so a crashed writer's lock vanishes with it
    (no steal step, hence no observe-then-unlink race where two stealers
    both enter the GC-critical section, and no window where a reader sees
    an empty just-created file and unlinks a LIVE writer's lock). The pid
    written into the file is diagnostic only — it names the holder in the
    refusal error. The file itself is never unlinked: unlink+flock has the
    classic race (a waiter flocks an unlinked inode while a third process
    creates a fresh file → two writers), and a leftover 16-byte file is
    free. Multi-node note: flock over NFS/shared-fs semantics vary; a
    cluster deployment swaps this seam for a lease in the metastore/catalog
    (Iceberg commits give this for free)."""

    # path → holding instance in THIS process (re-entrant acquire: nested
    # run() under a watch() tick must not deadlock on its own flock)
    _held: dict[str, "WriterLock"] = {}

    def __init__(self, sink_root: str):
        os.makedirs(sink_root, exist_ok=True)
        self.path = os.path.join(sink_root, ".writer.lock")
        # re-entrancy keys on the RESOLVED path: './out' vs 'out' vs a
        # symlinked spelling must all map to one held entry, else a nested
        # acquire flocks a second fd on the same inode and refuses against
        # its own process
        self._key = os.path.realpath(self.path)
        self.acquired = False
        self._fd: int | None = None
        self._depth = 0
        self._outer: "WriterLock | None" = None

    def __enter__(self) -> "WriterLock":
        import fcntl

        outer = WriterLock._held.get(self._key)
        if outer is not None:
            outer._depth += 1
            self._outer = outer
            return self
        fd = os.open(self.path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            try:
                holder = int((os.read(fd, 64) or b"0").decode().strip() or "0")
            except (OSError, ValueError):
                holder = 0
            os.close(fd)
            raise RuntimeError(
                f"sink_root {os.path.dirname(self.path)!r} is locked by "
                f"live writer pid {holder}; logspark enforces a single "
                "writer per sink_root (concurrent runs would race the "
                "orphan-run GC)"
            ) from None
        os.ftruncate(fd, 0)
        os.write(fd, str(os.getpid()).encode())
        self._fd = fd
        self._depth = 1
        self.acquired = True
        WriterLock._held[self._key] = self
        return self

    def __exit__(self, *exc) -> None:
        import fcntl

        if self._outer is not None:
            self._outer._depth -= 1
            self._outer = None
            return
        if self.acquired:
            self._depth -= 1
            if self._depth <= 0:
                WriterLock._held.pop(self._key, None)
                assert self._fd is not None
                fcntl.flock(self._fd, fcntl.LOCK_UN)
                os.close(self._fd)
                self._fd = None
                self.acquired = False


def watch(
    spark: SparkSession,
    config_path: str,
    io: ParquetIO,
    sink_root: str,
    dims: dict[str, DataFrame] | None = None,
    interval_s: float = 30.0,
    max_iterations: int | None = None,
) -> list[RunResult]:
    """Continuous batch-agent mode — the Spark-native analogue of the
    reference's long-running agent with etcd-backed config reload
    (SURVEY.md §3.1 entry 3): every iteration RE-LOADS the config file
    (edits take effect on the next tick, no restart), runs one incremental
    batch over manifest-pending input files, and sleeps. Each iteration's
    run_id is derived from the pending file set, so a crash mid-iteration
    retries under the SAME id (idempotent overwrite) instead of orphaning
    a directory. `max_iterations` bounds the loop for tests; None tails
    forever like the reference agent."""
    import hashlib
    import time

    results: list[RunResult] = []
    i = 0
    while max_iterations is None or i < max_iterations:
        cfg = PipelineConfig.load(config_path)  # hot reload, every tick
        tables = [c["table"] for c in cfg.input if c["type"] == "table"]
        if not tables:
            # a hot-reloaded config without a table input must not kill the
            # long-running agent with a bare StopIteration (ADVICE r2); the
            # tick is skipped with a diagnosable warning and the NEXT reload
            # picks up the fixed config — reference agents survive bad
            # config pushes the same way
            import logging

            logging.getLogger(__name__).warning(
                "watch(): config %r has no input section of type 'table'; "
                "skipping this tick (fix the config — the next tick reloads it)",
                config_path,
            )
            i += 1
            if max_iterations is None or i < max_iterations:
                time.sleep(interval_s)
            continue
        table = tables[0]
        pending = mf.pending_files(io.input_files(spark, table), mf.load_manifest(sink_root))
        if pending:
            rid = "w-" + hashlib.md5("\n".join(sorted(pending)).encode()).hexdigest()[:12]
            results.append(run(spark, cfg, io, sink_root, run_id=rid, dims=dims))
        i += 1
        if max_iterations is None or i < max_iterations:
            time.sleep(interval_s)
    return results


def run(
    spark: SparkSession,
    cfg: PipelineConfig,
    io: ParquetIO,
    sink_root: str,
    run_id: str = "r0",
    dims: dict[str, DataFrame] | None = None,
    incremental: bool = True,
) -> RunResult:
    """Execute: resume-aware read → routed write (partitioned by sink) →
    counts write → manifest commit with lineage + metrics.

    Holds the sink_root WriterLock for the whole manifest-read → GC →
    write → commit span: the orphan-run GC is only safe when no other
    writer is in flight (single-writer invariant, see WriterLock)."""
    with WriterLock(sink_root):
        return _run_locked(spark, cfg, io, sink_root, run_id, dims, incremental)


def _run_locked(
    spark: SparkSession,
    cfg: PipelineConfig,
    io: ParquetIO,
    sink_root: str,
    run_id: str,
    dims: dict[str, DataFrame] | None,
    incremental: bool,
) -> RunResult:
    table = next(i["table"] for i in cfg.input if i["type"] == "table")
    all_files = io.input_files(spark, table)
    m = mf.load_manifest(sink_root)
    files = mf.pending_files(all_files, m) if incremental else all_files
    result = RunResult(run_id=run_id, input_files=files)
    if not files:
        return result  # nothing new — resume with no work

    # A run_id already committed with a DIFFERENT input set must not be
    # silently replaced: commit_run would drop the old record's input_files
    # from the manifest and the overwrite would clobber its sink data.
    prior = next((r for r in m.runs if r.run_id == run_id), None)
    if prior is not None and set(prior.input_files) != set(files):
        raise ValueError(
            f"run_id {run_id!r} already committed over a different input set; "
            "choose a fresh run_id (crashed-run retries reuse the SAME id)"
        )
    # GC orphan run directories: a crash after the routed write but before
    # manifest commit leaves runs/<id>/ with no manifest record; a retry
    # under a NEW run_id would otherwise leave those rows double-counted on
    # any recursive read of runs/.
    runs_dir = os.path.join(sink_root, "runs")
    committed = {r.run_id for r in m.runs}
    if os.path.isdir(runs_dir):
        import shutil

        for d in os.listdir(runs_dir):
            if d not in committed and d != run_id:
                shutil.rmtree(os.path.join(runs_dir, d), ignore_errors=True)

    bp = build(spark, cfg, io=io, dims=dims, input_files=files)

    routed_path = os.path.join(sink_root, "runs", run_id, "routed")
    routed_out = bp.routed
    # File-count control. The shuffle-free dynamic-partition write produces
    # tasks x sinks files — at 100 TB (~800k input splits, 3-5 sinks) that
    # is millions of files per run, a metastore/list killer. With
    # write.files_per_sink = k, one extra shuffle repartitions on
    # (sink, hash(conv_id) % k) → ~k files per sink, each sized
    # bytes_per_sink / k (pick k so files land near the 128-512 MB sweet
    # spot). Default off: the narrow plan wins while file counts are sane.
    fps = cfg.write.get("files_per_sink")
    if fps:
        routed_out = routed_out.repartition(
            int(fps) * max(len(cfg.output), 1),
            "sink",
            F.pmod(F.hash("conv_id"), F.lit(int(fps))),
        )
    routed_out.write.mode("overwrite").partitionBy("sink").parquet(routed_path)
    # Counts come from the WRITTEN sink, not a recomputation: the parse→route
    # stage runs exactly once, and the (sink, conv_id, ts)-only re-read is a
    # column-pruned parquet scan — tiny next to the parse cost. This also
    # makes the counts describe what physically landed in each sink.
    counts_path = os.path.join(sink_root, "runs", run_id, "sink_counts")
    written = spark.read.parquet(routed_path)
    sink_counts(written, bucket=cfg.aggregate.get("bucket", "hour")).write.mode(
        "overwrite"
    ).parquet(counts_path)

    per_sink = {
        r["sink"]: r["n"]
        for r in spark.read.parquet(counts_path).groupBy("sink").agg(F.sum("n").alias("n")).collect()
    }
    result.sink_rows = {k: int(v) for k, v in per_sink.items()}
    if bp.observation is not None:
        result.metrics.update({k: float(v) for k, v in bp.observation.get.items()})

    mf.commit_run(
        sink_root,
        mf.RunRecord(
            run_id=run_id,
            input_files=files,
            sink_counts=result.sink_rows,
            metrics=result.metrics,
            partition_lineage={
                s: os.path.join(routed_path, f"sink={s}") for s in result.sink_rows
            },
        ),
    )
    return result
