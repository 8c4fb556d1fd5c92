"""Physical-plan regression tests — the scale properties that make the
100 TB story true, asserted against `.explain` output so a future change
that silently degrades the plan fails CI:

1. ONE ArrowEvalPython node per grok filter (InferFiltersFromGenerate once
   cloned the UDF below the router's explode — 2x Python cost, see
   logspark/session.py ENGINE_CONF and BENCH/NOTES.md fix 2).
2. Enrich joins are BroadcastHashJoin — the fact side never shuffles.
3. Filter pushdown reaches the parquet scan (PushedFilters) and column
   pruning reaches ReadSchema for a projecting query.
4. The pre-sink pipeline plan contains no Exchange (single narrow stage);
   the counts aggregate has partial aggregation below its single Exchange.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from logspark.config import canonical_config
from logspark.operators.filters import apply_filter_chain
from logspark.operators.router import route
from logspark.operators.aggregates import sink_counts
from logspark.operators.enrich import apply_enrich_chain
from logspark.queries import FLAGSHIP_FILTERS, FLAGSHIP_SINKS


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_single_python_eval_through_router(transcripts):
    """The explode router must not duplicate the grok pandas UDF (pandas
    engine forced — the fallback path for non-JVM-expressible patterns)."""
    parsed = apply_filter_chain(
        transcripts, [{**FLAGSHIP_FILTERS[0], "accumulators": False, "engine": "pandas"}]
    )
    routed = route(parsed, FLAGSHIP_SINKS)
    plan = _plan(routed.select("sink", "conv_id"))
    assert plan.count("ArrowEvalPython") == 1, plan


def test_native_grok_has_zero_python(transcripts):
    """JVM-expressible grok configs (the common case: every canonical and
    flagship pattern) must compile to pure Column expressions — no Arrow
    boundary, no Python workers, anywhere in the routed plan."""
    parsed = apply_filter_chain(
        transcripts, [{**FLAGSHIP_FILTERS[0], "accumulators": False}]
    )
    routed = route(parsed, FLAGSHIP_SINKS)
    plan = _plan(routed.select("sink", "conv_id"))
    assert "ArrowEvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_native_grok_whole_canonical_pipeline_python_free(transcripts, dims):
    """The full canonical pipeline (grok + json + patch + enrich + route)
    is JVM-only end-to-end under engine=auto."""
    cfg = canonical_config()
    parsed = apply_filter_chain(transcripts, cfg.filter)
    parsed = apply_enrich_chain(parsed, cfg.enrich, dims)
    routed = route(parsed, cfg.output)
    plan = _plan(routed)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_grok_engine_fallback_and_force(transcripts):
    """Optional capture groups are not JVM-expressible: auto falls back to
    the pandas UDF; engine='native' refuses loudly."""
    opt = {"type": "grok", "source": "text", "match": [r"c%{INT:a:int}(?: %{INT:b:int})?"], "accumulators": False}
    parsed = apply_filter_chain(transcripts, [opt])
    assert _plan(parsed).count("ArrowEvalPython") == 1
    with pytest.raises(ValueError, match="not JVM-expressible"):
        apply_filter_chain(transcripts, [{**opt, "engine": "native"}])


def test_enrich_is_broadcast_hash_join(transcripts, dims):
    cfg = [{"dim": "tool_catalog", "key": "tool"}, {"dim": "role_map", "key": "role"}]
    out = apply_enrich_chain(transcripts, cfg, dims)
    plan = _plan(out)
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan


def test_no_shuffle_before_sink_write(transcripts, dims):
    """scan → grok → patch/json → enrich → route is ONE narrow stage."""
    cfg = canonical_config()
    filters = [
        {**f, "accumulators": False} if f.get("type") == "grok" else f
        for f in cfg.filter
    ]
    parsed = apply_filter_chain(transcripts, filters)
    parsed = apply_enrich_chain(parsed, cfg.enrich, dims)
    routed = route(parsed, cfg.output)
    plan = _plan(routed)
    # BroadcastExchange (dim shipping) is allowed; shuffle exchanges are not
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Exchange RoundRobinPartitioning" not in plan, plan


def test_counts_aggregate_is_partial_final(transcripts, dims):
    """The only shuffle: partial aggregation below one Exchange."""
    cfg = canonical_config()
    filters = [
        {**f, "accumulators": False} if f.get("type") == "grok" else f
        for f in cfg.filter
    ]
    parsed = apply_filter_chain(transcripts, filters)
    routed = route(parsed, cfg.output)
    plan = _plan(sink_counts(routed))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # partial (map-side) aggregate below the exchange
    assert re.search(r"HashAggregate.*partial_count", plan) or "partial" in plan, plan


def test_bucketed_layout_removes_shuffles(spark, transcripts):
    """north_rule 'bucket by conv_id': over a conv_id-bucketed table, both
    the per-conversation aggregate and a self-join on conv_id plan WITHOUT
    a shuffle Exchange — the storage layout pays the shuffle once at
    ingest. (Iceberg: bucket(n, conv_id) transform, same effect.)"""
    import shutil

    from logspark.sources.tableio import write_bucketed

    spark.sql("DROP TABLE IF EXISTS t_bucketed")
    # a previous session's warehouse dir survives the in-memory catalog;
    # saveAsTable refuses to create over a stale location
    shutil.rmtree("spark-warehouse/t_bucketed", ignore_errors=True)
    write_bucketed(transcripts, "t_bucketed", buckets=8)
    t = spark.table("t_bucketed")

    agg = t.groupBy("conv_id").count()
    plan = _plan(agg)
    assert "Exchange hashpartitioning" not in plan, plan

    joined = t.alias("a").join(spark.table("t_bucketed").alias("b"), "conv_id")
    jplan = _plan(joined.select("conv_id"))
    assert "Exchange hashpartitioning" not in jplan, jplan


def test_pushdown_and_pruning_reach_scan(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.concat(F.lit("m"), F.col("id")).alias("msg"),
        F.lit("pad").alias("unused"),
    ).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("k") == 3).select("id", "msg")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "k" in plan.split("PushedFilters")[1][:80], plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "unused" not in read_schema, read_schema
