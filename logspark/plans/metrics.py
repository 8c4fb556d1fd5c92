"""Parse/route metrics: accumulators + observable metrics (SURVEY.md §2.4 A2).

north_star: "parse/route metrics emitted via accumulators". Two channels:

- **Accumulators** — incremented inside the grok pandas UDF per Arrow batch
  (rows seen / rows matched); visible on the driver after any action, even
  mid-job. The per-plugin processed/failed counters of the reference agent.
- **Observation** (`df.observe`) — exact per-query metrics collected with
  the action that consumed the frame, with no second pass over the data.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any


@dataclass
class ParseAccumulators:
    rows: Any  # pyspark Accumulator[int]
    matched: Any

    def as_dict(self) -> dict[str, int]:
        return {"rows": self.rows.value, "matched": self.matched.value}


_REGISTRY: dict[str, ParseAccumulators] = {}


def parse_accumulators(sc, name: str = "grok") -> ParseAccumulators:
    """Create (or fetch this session's) named accumulator pair."""
    if name not in _REGISTRY:
        _REGISTRY[name] = ParseAccumulators(rows=sc.accumulator(0), matched=sc.accumulator(0))
    return _REGISTRY[name]


def reset(name: str | None = None) -> None:
    if name is None:
        _REGISTRY.clear()
    else:
        _REGISTRY.pop(name, None)
