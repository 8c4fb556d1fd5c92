"""Resume checkpoints + per-partition lineage (SURVEY.md §2.1 S1, §4 resume).

The reference tracks file read offsets (sincedb) so a restarted agent
continues where it stopped. Batch-Spark equivalent (north_star: "progress
checkpoints per Iceberg snapshot allow resumable restarts with per-partition
lineage"):

- each successful run appends a RunRecord: which input files (or Iceberg
  snapshot id) it consumed, per-sink row counts, and parse/route metrics —
  that is the lineage from every sink partition back to its input set;
- a restarted run reads `pending_files` = inputs not covered by any prior
  run, so re-running is incremental AND idempotent (an input file is
  processed exactly once; sink writes go to a per-run subdirectory so a
  crashed run that never committed its manifest leaves no double counts —
  re-run overwrites the same run_id directory).

The manifest itself is a JSON file written atomically (tmp + rename).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field
from dataclasses import fields as dataclass_fields


@dataclass
class RunRecord:
    run_id: str
    input_files: list[str] = field(default_factory=list)
    snapshot_id: int | None = None  # Iceberg path
    sink_counts: dict[str, int] = field(default_factory=dict)
    metrics: dict[str, float] = field(default_factory=dict)
    # per-partition lineage: physical sink partition dir → produced by this
    # run from exactly `input_files` (sink=X dirs under runs/<run_id>/routed)
    partition_lineage: dict[str, str] = field(default_factory=dict)


@dataclass
class Manifest:
    runs: list[RunRecord] = field(default_factory=list)

    @property
    def processed_files(self) -> set[str]:
        out: set[str] = set()
        for r in self.runs:
            out.update(r.input_files)
        return out

    @property
    def last_snapshot_id(self) -> int | None:
        for r in reversed(self.runs):
            if r.snapshot_id is not None:
                return r.snapshot_id
        return None


def manifest_path(sink_root: str) -> str:
    return os.path.join(sink_root, "_manifest", "processed.json")


def load_manifest(sink_root: str) -> Manifest:
    p = manifest_path(sink_root)
    if not os.path.exists(p):
        return Manifest()
    with open(p) as f:
        raw = json.load(f)
    # forward-compat: a manifest written by a newer version with extra keys
    # must not turn every subsequent run into a TypeError resume outage
    known = {f.name for f in dataclass_fields(RunRecord)}
    return Manifest(
        runs=[RunRecord(**{k: v for k, v in r.items() if k in known}) for r in raw.get("runs", [])]
    )


def save_manifest(sink_root: str, m: Manifest) -> None:
    p = manifest_path(sink_root)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"runs": [asdict(r) for r in m.runs]}, f, indent=1)
    os.replace(tmp, p)  # atomic on POSIX


def pending_files(all_files: list[str], m: Manifest) -> list[str]:
    done = m.processed_files
    return [f for f in all_files if f not in done]


def commit_run(sink_root: str, record: RunRecord) -> Manifest:
    """Append-and-save; called only AFTER all sink writes succeeded, so a
    crash before this point simply re-processes the same pending files into
    the same run_id directories (overwrite → idempotent)."""
    m = load_manifest(sink_root)
    m.runs = [r for r in m.runs if r.run_id != record.run_id] + [record]
    save_manifest(sink_root, m)
    return m
