"""Enrichment: broadcast hash-join lookups (SURVEY.md §2.3).

The reference decorates events via in-process map lookups; BASELINE.json
pins the Spark shape: "the codec/enrich stage becomes broadcast hash-join
lookups keyed on tool and role". Left-outer so events with unknown keys
pass through with nulls (the deliberately-missing `tool_x` path).

At 100 TB the fact side never shuffles here: the dim is broadcast to every
executor and the join stays inside the same narrow stage as the parse UDF.
A dim that outgrows the broadcast threshold falls back to a plain join and
AQE picks SMJ/shuffled-hash with skew splitting (cfg `broadcast: false`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    broadcast: bool = True,
    how: str = "left",
) -> DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    right = F.broadcast(dim) if broadcast else dim
    return df.join(right, on=keys, how=how)


def apply_enrich_chain(df: DataFrame, enrich_cfgs: list[dict], dims: dict[str, DataFrame]) -> DataFrame:
    """enrich cfg: {"dim": name, "key": "tool", "broadcast": true, "how": "left"}"""
    for cfg in enrich_cfgs:
        name = cfg["dim"]
        if name not in dims:
            raise ValueError(f"unknown enrich dim {name!r}; known: {sorted(dims)}")
        df = enrich(
            df,
            dims[name],
            key=cfg["key"],
            broadcast=cfg.get("broadcast", True),
            how=cfg.get("how", "left"),
        )
    return df
