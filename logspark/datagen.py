"""Deterministic transcripts synthesizer (FIXTURES.md §A1/§A2, seed=42).

Every row is a pure function of its global turn id, so the same table can be
generated:
- on the driver (``synth_transcripts``) for unit/golden tests, and
- distributed (``write_transcripts_spark`` via ``spark.range(n).mapInPandas``)
  for bench-scale inputs,
with bit-identical content regardless of partitioning or parallelism
(SURVEY.md §7 determinism watch-list item).

Skew: conversation sizes are Zipf(s≈1.2)-distributed (seeded numpy), so a
small fraction of ``conv_id``s own a large share of turns — this exercises
the hot-key salting path (SURVEY.md §4 skew row).

Text template mix per FIXTURES.md §A1:
    40% tool-log line   (grok target)
    20% apache-like line
    30% free text       (grok-failure path → _grokparsefailure → raw sink)
    10% json line       (json-codec path)
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd

SEED = 42
AVG_TURNS = 20  # mean conversation length used to size the conv pool
EPOCH_2024 = pd.Timestamp("2024-01-01").value // 10**9  # unix seconds

TOOLS = np.array(["search", "code_exec", "browser", "calculator", "tool_x"], dtype=object)
LEVELS = np.array(["INFO", "WARN", "ERROR", "DEBUG"], dtype=object)
STATUSES = np.array(["ok", "err"], dtype=object)
VERBS = np.array(["GET", "POST", "PUT"], dtype=object)
PATHS = np.array(["index.html", "api/v1/items", "static/app.js", "health", "search"], dtype=object)
WORDS = np.array(
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu".split(),
    dtype=object,
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the per-row deterministic RNG."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _h(ids: np.ndarray, stream: int) -> np.ndarray:
    """Independent hash stream `stream` over global ids."""
    return _splitmix64(ids.astype(np.uint64) * np.uint64(2654435761) + np.uint64(stream * 0x9E37 + SEED))


@lru_cache(maxsize=8)
def _conv_layout(n_turns: int) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, sizes): turn-id ranges per conversation.

    Recomputed identically on every worker from the seed (O(n_conv),
    cached per process).
    """
    rng = np.random.default_rng(SEED)
    n_conv_guess = max(1, int(n_turns / AVG_TURNS * 2))
    # skew mixture per FIXTURES.md §A1: ~99% small convs (4..24 turns),
    # ~1% hot convs (400..800 turns) owning ~30% of all turns
    sizes = rng.integers(4, 25, size=n_conv_guess)
    hot = rng.random(n_conv_guess) < 0.01
    sizes[hot] = rng.integers(400, 800, size=int(hot.sum()))
    cum = np.cumsum(sizes)
    k = int(np.searchsorted(cum, n_turns)) + 1
    sizes = sizes[:k].copy()
    total = int(sizes.sum())
    if total > n_turns:
        sizes[-1] -= total - n_turns
    elif total < n_turns:  # pool exhausted (shouldn't happen with 2x guess)
        sizes[-1] += n_turns - total
    offsets = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    return offsets.astype(np.int64), sizes.astype(np.int64)


def synth_transcripts(ids: np.ndarray, n_turns: int) -> pd.DataFrame:
    """Rows for the given global turn ids of an n_turns-sized table."""
    ids = np.asarray(ids, dtype=np.int64)
    offsets, _sizes = _conv_layout(n_turns)
    conv = np.searchsorted(offsets, ids, side="right") - 1
    turn_idx = (ids - offsets[conv]).astype(np.int32)

    conv_id = pd.Series(conv).map(lambda c: f"c{c:08d}").to_numpy()
    role = np.array(["user", "assistant", "tool"])[turn_idx % 3]

    # tool column: only tool rows carry a tool; 2% unknown `tool_x`
    tsel = _h(ids, 1) % np.uint64(50)
    tool_val = np.where(tsel == 0, "tool_x", TOOLS[(tsel % np.uint64(4)).astype(np.int64)])
    tool = np.where(role == "tool", tool_val, None)

    # ts: conv start + 300s per turn + <300s jitter → strictly monotone per conv
    conv_start = EPOCH_2024 + (conv.astype(np.int64) * 9973) % (30 * 86400)
    ts_sec = conv_start + turn_idx.astype(np.int64) * 300 + (_h(ids, 2) % np.uint64(299)).astype(np.int64)
    ts = pd.to_datetime(ts_sec, unit="s")

    text = _synth_text(ids, ts_sec, tool_val)
    return pd.DataFrame(
        {
            "conv_id": pd.Series(conv_id, dtype="object"),
            "turn_idx": pd.Series(turn_idx, dtype="int32"),
            "role": pd.Series(role, dtype="object"),
            "text": pd.Series(text, dtype="object"),
            "tool": pd.Series(tool, dtype="object"),
            "ts": ts,
        }
    )


def _synth_text(ids: np.ndarray, ts_sec: np.ndarray, tool_val: np.ndarray) -> np.ndarray:
    choice = _h(ids, 3) % np.uint64(10)  # 0-3 tool log, 4-5 apache, 6-8 free, 9 json
    n = len(ids)
    out = np.empty(n, dtype=object)

    w = lambda stream: WORDS[(_h(ids, stream) % np.uint64(len(WORDS))).astype(np.int64)]
    num = lambda stream, mod: (_h(ids, stream) % np.uint64(mod)).astype(np.int64)

    iso = pd.Series(pd.to_datetime(ts_sec, unit="s")).dt.strftime("%Y-%m-%dT%H:%M:%SZ").to_numpy()
    level = LEVELS[num(4, 4)]
    lat = num(5, 5000)
    status = STATUSES[(num(6, 10) >= 8).astype(np.int64)]  # ~80% ok / 20% err
    m = choice <= np.uint64(3)
    if m.any():
        out[m] = (
            "[" + iso[m] + "] " + level[m] + " tool=" + tool_val[m]
            + " latency_ms=" + lat[m].astype(str).astype(object) + " status=" + status[m]
            + ' msg="' + w(7)[m] + " " + w(8)[m] + '"'
        )

    m = (choice == np.uint64(4)) | (choice == np.uint64(5))
    if m.any():
        ip = (
            "10." + num(9, 256)[m].astype(str).astype(object) + "." + num(10, 256)[m].astype(str).astype(object)
            + "." + num(11, 254)[m].astype(str).astype(object)
        )
        httpdate = (
            pd.Series(pd.to_datetime(ts_sec[m], unit="s"))
            .dt.strftime("%d/%b/%Y:%H:%M:%S +0000")
            .to_numpy()
        )
        out[m] = (
            ip + " - - [" + httpdate + '] "' + VERBS[num(12, 3)][m] + " /"
            + PATHS[num(13, 5)][m] + ' HTTP/1.1" '
            + np.array(["200", "404", "500", "301"])[num(14, 4)][m]
            + " " + num(15, 100000)[m].astype(str).astype(object)
        )

    m = (choice >= np.uint64(6)) & (choice <= np.uint64(8))
    if m.any():
        out[m] = (
            w(16)[m] + " " + w(17)[m] + " " + w(18)[m] + " " + w(19)[m] + " " + w(20)[m]
        )

    m = choice == np.uint64(9)
    if m.any():
        out[m] = (
            '{"event": "' + w(21)[m] + '", "k": ' + num(22, 1000)[m].astype(str).astype(object) + "}"
        )
    return out


# ---------------------------------------------------------------------------
# Enrich dimension tables (FIXTURES.md §A2)
# ---------------------------------------------------------------------------

def tool_catalog_pdf() -> pd.DataFrame:
    """Known tools only — `tool_x` deliberately missing (left-join null path)."""
    return pd.DataFrame(
        {
            "tool": ["search", "code_exec", "browser", "calculator"],
            "tool_category": ["retrieval", "compute", "retrieval", "compute"],
            "cost_class": ["low", "high", "medium", "low"],
        }
    )


def role_map_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "role": ["user", "assistant", "tool"],
            "role_kind": ["human", "model", "system"],
            "is_human": [True, False, False],
        }
    )


# ---------------------------------------------------------------------------
# Spark-side generation (distributed, deterministic)
# ---------------------------------------------------------------------------

TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def transcripts_df(spark, n_turns: int, parallelism: int | None = None):
    """Distributed deterministic generation: spark.range → mapInPandas."""
    parts = parallelism or max(32, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield synth_transcripts(pdf["id"].to_numpy(), n_turns)

    return (
        spark.range(0, n_turns, numPartitions=parts)
        .mapInPandas(gen, schema=TRANSCRIPTS_DDL)
    )


def write_transcripts(spark, path: str, n_turns: int, parallelism: int | None = None) -> None:
    transcripts_df(spark, n_turns, parallelism).write.mode("overwrite").parquet(path)
