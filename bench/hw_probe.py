"""Hardware scaling ceiling probe — no Spark involved.

Runs the pure-Python grok hot loop (the pipeline's dominant per-row cost)
in N independent processes via multiprocessing and reports rows/sec. With
zero coordination, zero shuffle, and zero JVM, any sub-linear scaling
measured here is the MACHINE (shared memory bandwidth / LLC, all-core
frequency scaling, hypervisor steal), not the engine.

Measured on the 32-core sandbox VM (see BENCH/BASELINE.md):

    procs  per-core rows/s   efficiency vs 4 procs
    4      ~166k             1.00
    8      ~147k             0.89
    16     ~136k             0.82
    32     ~98k              0.59

i.e. the box itself scales 4->16 at ~0.82 and 8->32 at ~0.66. The job's
scaling efficiency should be read against this ceiling: an engine at the
ceiling adds no scaling penalty of its own. On a real multi-node cluster
each executor owns its memory bus, so this ceiling does not apply; the
engine-side property that transfers is "no serial stages, no shuffle
bottleneck" — which is what the ratio job-efficiency/probe-ceiling shows.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

PATTERNS = [
    r"\[%{TIMESTAMP_ISO8601:log_ts}\] %{LOGLEVEL:level} tool=%{WORD:tool_name}"
    r" latency_ms=%{NONNEGINT:latency_ms:int} status=%{WORD:status} %{GREEDYDATA:msg}",
    r"%{IPORHOST:clientip} - - \[%{HTTPDATE:http_ts}\] \"%{WORD:verb}"
    r" %{URIPATHPARAM:request} HTTP/%{NUMBER:httpversion}\""
    r" %{NONNEGINT:response:int} %{NONNEGINT:bytes:int}",
]


def _worker(n_rows: int) -> float:
    import random

    import pandas as pd

    from logspark.grok import compile_grok

    cg = compile_grok(PATTERNS)
    rng = random.Random(os.getpid())
    texts = []
    for i in range(n_rows):
        r = rng.random()
        if r < 0.4:
            texts.append(
                f"[2024-01-15T06:13:42Z] WARN tool=search latency_ms={i} status=ok msg {i}"
            )
        elif r < 0.6:
            texts.append(
                f'10.215.98.236 - - [15/Jan/2024:06:48:37 +0000] "PUT /api/v1/items HTTP/1.1" 301 {i}'
            )
        else:
            texts.append(f"free text turn number {i} with some words " * 3)
    s = pd.Series(texts)
    t0 = time.time()
    cg.extract_pandas(s)
    return time.time() - t0


def probe(n_procs: int, rows_per_proc: int = 400_000) -> float:
    """Total rows/sec across `n_procs` independent grok processes."""
    with mp.Pool(n_procs) as pool:
        t0 = time.time()
        pool.map(_worker, [rows_per_proc] * n_procs)
        wall = time.time() - t0
    return n_procs * rows_per_proc / wall


def main() -> None:
    levels = [int(x) for x in (sys.argv[1:] or ["4", "16"])]
    out = {}
    for n in levels:
        tput = probe(n)
        out[str(n)] = round(tput, 1)
    if len(levels) == 2 and levels[1] == 4 * levels[0]:
        out["ceiling_efficiency"] = round(out[str(levels[1])] / out[str(levels[0])] / 4, 3)
    print("HW_PROBE " + json.dumps(out))


if __name__ == "__main__":
    main()
