"""Explicit skew handling: hot-key detection + salted two-phase aggregation.

north_rule: "partitioning / shuffle / skew handled explicitly … salt hot
conversations to defuse skew before shuffle". A Zipf-ish transcript corpus
has conversations owning millions of turns; a plain groupBy(conv_id) sends
each hot conversation to ONE reducer. The salted form:

    phase 1: groupBy(keys..., salt = pmod(hash(turn_idx), k)) → partial counts
    phase 2: groupBy(keys...) → sum(partial)

spreads each hot key over k reducers; phase 2 moves only k rows per key.
For counts Spark's own partial aggregation usually suffices — this operator
exists for the cases where it doesn't (high-cardinality accumulators,
collect-type aggs) and as the explicit-skew evidence the rule asks for.

`hot_keys` gives the detection side: a cheap sampled count to find keys
above a row-share threshold (drives a targeted salt: only hot keys pay the
two-phase cost — see `salted_sink_counts(only_hot=True)`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(
    df: DataFrame,
    key: str = "conv_id",
    threshold: float = 0.001,
    sample_fraction: float | None = 0.05,
) -> list[str]:
    """Keys whose (sampled) row share exceeds `threshold` — ONE Spark job.

    The total rides the same job as an `observe` metric on the groupBy
    input (no separate count() scan — r2 ran two jobs). The candidate set
    is bounded structurally: at most floor(1/threshold) keys can each hold
    more than a `threshold` share, so orderBy+limit (TakeOrderedAndProject:
    per-partition top-k, merged on the driver — no global sort shuffle)
    collects at most that many rows regardless of key cardinality; the
    share filter then applies driver-side with the observed total."""
    from pyspark.sql import Observation

    sampled = df.sample(sample_fraction, seed=42) if sample_fraction else df
    obs = Observation()
    sampled = sampled.observe(obs, F.count(F.lit(1)).alias("total"))
    cap = int(1.0 / threshold) + 1
    top = (
        sampled.groupBy(key)
        .count()
        .orderBy(F.col("count").desc(), F.col(key))
        .limit(cap)
        .collect()
    )
    total = int(obs.get["total"])
    if total == 0:
        return []
    return [r[0] for r in top if r["count"] > total * threshold]


def salted_counts(
    df: DataFrame,
    keys: list[str],
    salt_src: str = "turn_idx",
    n_salts: int = 32,
    only_hot: list[str] | None = None,
) -> DataFrame:
    """Two-phase count over `keys`, salted on hash(salt_src) % n_salts.

    With `only_hot`, cold keys take salt 0 (single partial row — no fan-out
    cost) while hot keys spread over n_salts reducers.
    """
    salt = F.pmod(F.hash(F.col(salt_src)), F.lit(n_salts))
    if only_hot is not None:
        salt = F.when(F.col(keys[-1] if "conv_id" not in keys else "conv_id").isin(only_hot), salt).otherwise(F.lit(0))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("n"))


def salted_sink_counts(
    routed: DataFrame,
    bucket: str = "hour",
    n_salts: int = 32,
    only_hot: list[str] | None = None,
) -> DataFrame:
    """Skew-hardened variant of aggregates.sink_counts — identical output."""
    routed = routed.withColumn("bucket", F.date_trunc(bucket, F.col("ts")))
    return salted_counts(
        routed, ["sink", "conv_id", "bucket"], n_salts=n_salts, only_hot=only_hot
    )
