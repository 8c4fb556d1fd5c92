"""Deduplication operators for training-data pipelines.

Four families, all DataFrame-native (the only Python is plan construction):

- **exact**        hash-groupBy on normalized text → keep min-id doc
- **MinHash+LSH**  shingle → n minhashes → band → bucket-join candidates
- **SimHash**      60-bit fingerprint (textops.with_simhash) → band on bit
                   chunks → hamming-verify candidates
- **n-gram Jaccard** exact Jaccard over shingle sets for candidate pairs

Scale design (100 TB story):
- Exact dedup is ONE shuffle on a 16-byte md5 — the minimum possible.
- MinHash signatures come from a single explode + groupBy where ALL n
  minhashes are computed as n aggregate expressions in one pass (one
  shuffle keyed by doc, partial aggregation map-side). LSH banding then
  self-joins on (band_idx, band_key) — candidates only, never all pairs.
- The portable md5-based hash (textops.portable_hash60) keeps every step
  reproducible in DuckDB for the correctness oracle.
- Verification (exact Jaccard) runs only on LSH candidates: |candidates| is
  O(near-dups), not O(n^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from logspark.operators.textops import portable_hash60

MERSENNE_P = 2147483647  # 2^31 - 1; (p-1)^2 < 2^62 so a*h+b stays in int64

# Cross-batch shingle/gram md5 memos (r6, ADVICE r5-style cache hoist):
# Python workers are reused and this module is imported on executors, so a
# module-level memo amortizes md5 work across batches AND tasks instead of
# rebuilding per Arrow batch. Shingles repeat heavily across near-dup docs
# (that is the premise of the whole pipeline); the cap bounds worst-case
# memory (~100 B/entry → ~100 MB ceiling per worker before a reset).
# Separate dicts because minhash stores the MOD-P value and winnowing the
# raw 60-bit value.
_MINHASH_MEMO: dict[str, int] = {}
_WINNOW_MEMO: dict[str, int] = {}
_MEMO_MAX = 1 << 20


def cap_buckets(
    banded: DataFrame, max_bucket: int | None, keys: tuple[str, ...] = ("band", "key")
) -> DataFrame:
    """Oversized-bucket defense for banded self-joins (the classic LSH
    scale-killer): one degenerate band key — boilerplate docs, empty-ish
    texts sharing a signature band — makes a single bucket contribute
    O(bucket²) pairs and pins one reducer. Buckets larger than `max_bucket`
    are dropped entirely (their members are by construction *low-information*
    near-identical cliques; a capped system logs and handles them with exact
    dedup instead). The windowed count shuffles on the same (band, key) the
    self-join needs, so no extra exchange shape is introduced."""
    if max_bucket is None:
        return banded
    w = Window.partitionBy(*keys)
    return (
        banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("_bsz") <= max_bucket)
        .drop("_bsz")
    )


def dropped_buckets(
    banded: DataFrame, max_bucket: int, keys: tuple[str, ...] = ("band", "key")
) -> DataFrame:
    """No silent caps: the report of what cap_buckets WILL drop —
    (keys..., bucket_size, n_docs_affected rows) for every over-cap
    bucket. Run it next to any capped join when you need the audit trail
    ('what did the cap cost?'); it shares the capped join's (band, key)
    shuffle shape, so at scale it is one extra aggregate, not a new plan
    family. Members of dropped buckets are near-identical cliques that
    exact dedup handles — this report is how you prove that claim on
    your own corpus instead of trusting it."""
    return (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket)
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups by normalized-text md5; returns (fingerprint, keeper, n_dups).
    keeper = min id — deterministic under any partitioning."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return (
        df.withColumn("fingerprint", F.md5(norm))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """Distinct word k-gram shingles per document: (id, shingle).

    k-grams via transform over index sequence — no UDF; array_distinct
    before explode keeps the exploded row count minimal."""
    toks = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    grams = F.when(F.size(toks) >= k, grams).otherwise(F.array())
    return df.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))


def _minhash_coeffs(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod p — derived from
    a fixed LCG so Spark and the SQL oracle can enumerate the same values."""
    coeffs = []
    state = seed
    for _ in range(n_hashes):
        state = (state * 1103515245 + 12345) % MERSENNE_P
        a = state or 1
        state = (state * 1103515245 + 12345) % MERSENNE_P
        b = state
        coeffs.append((a, b))
    return coeffs


def _make_minhash_kernel(coeffs: list[tuple[int, int]], k: int):
    """Arrow batch of text → one column per minhash (null if < k tokens).

    The whole shingle→hash→min pipeline runs here, Arrow-batched:
    - k-gram shingling + dedup in plain Python (split/join — C-speed),
      with a per-batch md5 memo (shingles repeat heavily across docs);
    - every (a*h + b) mod p affine map applied to the batch's flattened
      hash vector at once in numpy, segment-min per doc via
      np.minimum.reduceat. a, b, h < 2^31 so a*h + b < 2^62 — exact int64.

    Doing shingling/md5 JVM-side was measured SLOWER: element-wise lambdas
    (transform / aggregate) are interpreted, not codegen'd, and the md5 →
    substring → conv chain per shingle costs ~6 µs interpreted vs ~1 µs
    here (BENCH/NOTES.md fix 7)."""
    _task_memo: dict[str, int] = {}  # fallback when logspark isn't importable

    def kernel(s):
        import hashlib
        import numpy as np
        import pandas as pd

        # resolve the memo through the worker's own module import when the
        # package is importable there (ensure_workers shipped the zip, or
        # the worker inherited the repo cwd): the nested kernel is pickled
        # by value, so a plain global reference would ship a per-task
        # copy. Fall back to the closure dict — per-task, still amortized
        # across every Arrow batch of the task — so the kernel never
        # DEPENDS on worker-side importability (r6 review).
        try:
            from logspark.operators import dedup as _m

            memo = _m._MINHASH_MEMO
        except ImportError:
            memo = _task_memo
        n = len(s)
        if len(memo) > _MEMO_MAX:
            memo.clear()

        def h60(sh: str) -> int:
            v = memo.get(sh)
            if v is None:
                v = int(hashlib.md5(sh.encode()).hexdigest()[:15], 16) % MERSENNE_P
                memo[sh] = v
            return v

        flat: list[int] = []
        lengths = np.zeros(n, dtype=np.int64)
        for j, text in enumerate(s):
            if text is None:
                continue
            toks = text.split(" ")
            if len(toks) < k:
                continue
            grams = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
            lengths[j] = len(grams)
            flat.extend(h60(g) for g in grams)

        nonempty = lengths > 0
        cols = {}
        if not flat:
            for i in range(len(coeffs)):
                cols[f"mh_{i}"] = pd.Series([pd.NA] * n, dtype="Int64")
            return pd.DataFrame(cols)
        fv = np.asarray(flat, dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(lengths)))[:-1][nonempty]
        for i, (a, b) in enumerate(coeffs):
            mins = np.minimum.reduceat((fv * a + b) % MERSENNE_P, starts)
            col = np.zeros(n, dtype=np.int64)
            col[nonempty] = mins
            out = pd.Series(col, dtype="Int64")
            out[~nonempty] = pd.NA
            cols[f"mh_{i}"] = out
        return pd.DataFrame(cols)

    return kernel


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """(id, mh_0 … mh_{n-1}) — ZERO shuffle.

    A doc's shingles all live in its own row, so signatures are a narrow
    map: one Arrow-batched kernel per batch of texts (see
    _make_minhash_kernel). The previous explode+groupBy form shuffled every
    (doc, shingle) pair — at 100 TB that shuffle dwarfs the hashing. Docs
    with < k words have no shingles and are dropped (matching the explode
    form and the DuckDB oracle)."""
    from pyspark.sql.pandas.functions import PandasUDFType

    coeffs = _minhash_coeffs(n_hashes)
    schema = ", ".join(f"mh_{i} bigint" for i in range(n_hashes))
    # asNondeterministic (r6, guide §4.4): the < k-token filter below
    # references the UDF column, and the optimizer's filter pushdown
    # otherwise DUPLICATES the kernel — the r5 plan carried two
    # ArrowEvalPython nodes (every doc shingled+hashed twice, and every
    # consumer of sigs inherited both). The kernel is pure; the marker
    # only forbids Catalyst from re-evaluating/reordering it.
    udf = F.pandas_udf(
        _make_minhash_kernel(coeffs, k), schema, PandasUDFType.SCALAR
    ).asNondeterministic()
    out = df.select(F.col(id_col), udf(F.col(text_col)).alias("_mh")).filter(
        F.col("_mh").getField("mh_0").isNotNull()
    )
    for i in range(n_hashes):
        out = out.withColumn(f"mh_{i}", F.col("_mh").getField(f"mh_{i}"))
    return out.drop("_mh")


def band_signatures(
    sigs: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Signature rows → (id, band, key): the LSH banding projection,
    shared by whole-corpus (`lsh_candidates`) and incremental
    (`incremental_near_dup_pairs`) candidate generation."""
    rows_per_band = n_hashes // bands
    band_entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.concat_ws("_", *[F.col(f"mh_{i * rows_per_band + j}") for j in range(rows_per_band)]).alias("key"),
            )
            for i in range(bands)
        ]
    )
    return sigs.select(F.col(id_col), F.explode(band_entries).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    max_bucket: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Band the signature, bucket-join: pairs (a, b), a < b, that agree on
    at least one full band. Never materializes the n^2 pair space.
    `max_bucket` drops degenerate buckets before the self-join — at 100 TB
    this MUST be set (see cap_buckets); unset preserves exact recall for
    small corpora and the uncapped oracle.

    `materialize` note (r6, measured): the self-join's broadcast build
    side re-plans the whole signature lineage, so the MinHash kernel
    appears TWICE in the plan. Materializing the banded set once
    (localCheckpoint) to fix that was tried and REJECTED by an
    interleaved best-of-3 A/B at 500k docs: 4.04 s (recompute, default)
    vs 6.16 s (materialize) — serializing n_docs x bands rows and
    re-exchanging them costs more than re-running the narrow Arrow
    kernel, at every scale measured (sf0.1 and 500k). Recomputing
    narrow per-row work beats moving materialized bytes (guide §1.2);
    the flag stays as the escape hatch for callers whose upstream is
    genuinely expensive and non-columnar."""
    banded = band_signatures(sigs, id_col, n_hashes, bands)
    banded = cap_buckets(banded, max_bucket)
    if materialize:
        banded = banded.localCheckpoint(eager=True)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(right, ["band", "key"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )
    return pairs


def ngram_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct k-gram sets: (a, b, jaccard).

    Without `candidates`, pairs = docs sharing ≥1 shingle (exact but
    quadratic in bucket size); with LSH `candidates` (a,b) it verifies only
    those — the scale path."""
    if candidates is not None:
        # Materialize the candidate pair list ONCE (r6): it is referenced
        # three times below (both sides of the id-set union + the
        # intersection join), and its lineage is the full signature →
        # banding → self-join chain; ReusedExchange only dedups identical
        # exchange subtrees, not the post-exchange work, and the three
        # consumers sit above different projections. The pair list is
        # O(near-dups) rows — tiny — so the checkpoint is cheap at any
        # corpus size.
        candidates = candidates.localCheckpoint(eager=True)
        # Shingle ONLY candidate-touched docs: per-doc shingles are
        # independent, so pruning the corpus to the (small) candidate id
        # set first is semantics-free and removes the whole-corpus explode
        # from the verify stage — measured 57.8 s → 3.9 s at the 500k-doc
        # scale probe (bench/scale_probe.py). AQE turns the semi-join into a broadcast at runtime
        # from the actual candidate size (no static-stats guess needed).
        cand_ids = (
            candidates.select(F.col("a").alias(id_col))
            .union(candidates.select(F.col("b").alias(id_col)))
            .distinct()
        )
        df = df.join(cand_ids, id_col, "leftsemi")
    sh = shingles(df, id_col, text_col, k)
    if candidates is not None:
        # the pruned shingle set is O(candidate-touched docs x shingles/doc)
        # — materialize it once (r6): it feeds `sizes` and both sides of
        # the intersection join, and each reference otherwise re-runs the
        # corpus semi-join scan + the shingling explode
        sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        # Candidates-driven intersection: attach each pair's a-side
        # shingles, keep those the b-side shares. Cost is
        # O(|candidates| x shingles/doc) — the quadratic shared-shingle
        # pair space is never built (semi-joining it AFTER the self-join
        # would still pay the full O(bucket²) shuffle first).
        inter = (
            candidates.join(sh.select(F.col(id_col).alias("a"), "shingle"), "a")
            .join(sh.select(F.col(id_col).alias("b"), "shingle"), ["b", "shingle"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        l, r = sh.alias("l"), sh.alias("r")
        inter = (
            l.join(r, "shingle")
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .groupBy(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    out = (
        inter.join(sizes.withColumnRenamed(id_col, "a").withColumnRenamed("sz", "sz_a"), "a")
        .join(sizes.withColumnRenamed(id_col, "b").withColumnRenamed("sz", "sz_b"), "b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .select("a", "b", "jaccard")
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    MOSS algorithm): hash every k-gram, slide a window of w consecutive
    hashes, keep each window's MINIMUM → a deterministic ~2/(w+1)-density
    fingerprint set that guarantees any shared substring of length ≥ w+k-1
    yields a shared fingerprint. Output: distinct (id, fingerprint).

    Spark shape: ZERO shuffle. A document's k-grams all live in its own
    row, so the whole pipeline — k-grams, hashes, per-window minima,
    per-doc dedup — is one narrow Arrow-batched numpy kernel followed by
    an explode. Two rejected alternatives, both measured at sf0.1:
    a windowed aggregate shuffles every k-gram hash on doc_id (the
    100 TB killer), and native array lambdas (transform/array_min/slice)
    are interpreted per element — 103 s vs ~2 s for this kernel (same
    lesson as the minhash kernel, BENCH/NOTES.md fix 7). The portable
    md5-derived hash keeps the DuckDB oracle value-identical."""
    from pyspark.sql.pandas.functions import PandasUDFType

    udf = F.pandas_udf(_make_winnow_kernel(k, w), "array<bigint>", PandasUDFType.SCALAR)
    return df.select(
        F.col(id_col), F.explode(udf(F.col(text_col))).alias("fingerprint")
    )


def _make_winnow_kernel(k: int, w: int):
    """Arrow batch of text → array of winnowing fingerprints per doc:
    memoized md5 k-gram hashes (grams repeat across docs), sliding-window
    minima via one strided numpy view per doc, np.unique for the per-doc
    dedup. No per-row Python beyond the gram join."""
    _task_memo: dict[str, int] = {}  # fallback when logspark isn't importable

    def kernel(s):
        import hashlib

        import numpy as np
        import pandas as pd

        try:  # per-worker shared memo; closure fallback (see minhash kernel)
            from logspark.operators import dedup as _m

            memo = _m._WINNOW_MEMO
        except ImportError:
            memo = _task_memo
        if len(memo) > _MEMO_MAX:
            memo.clear()

        def h60(g: str) -> int:
            v = memo.get(g)
            if v is None:
                v = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                memo[g] = v
            return v

        out = []
        for text in s:
            if text is None:
                out.append([])
                continue
            toks = text.split(" ")
            m = len(toks) - (k - 1)
            if m < w:
                out.append([])
                continue
            hh = np.fromiter(
                (h60(" ".join(toks[i : i + k])) for i in range(m)),
                dtype=np.int64,
                count=m,
            )
            mins = np.lib.stride_tricks.sliding_window_view(hh, w).min(axis=1)
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    return kernel


def simhash_verified(
    df_with_simhash: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """The SimHash family's verify step: band candidates → exact Hamming
    distance over the full 60-bit fingerprints → keep pairs ≤ max_hamming.
    (Banding guarantees recall for distance ≤ n_bands-1; the verify kills
    the false positives banding lets through.) One narrow projection after
    the banded join — bit_count(xor) is a single JVM intrinsic per pair.

    r6: the (id, simhash) projection is materialized ONCE and feeds the
    banding AND both verify joins — the r5 plan re-ran the simhash kernel
    per consumer (the two hash-attach joins are narrow on their build
    side, so ReusedExchange never fired for them)."""
    h = df_with_simhash.select(F.col(id_col), "simhash").localCheckpoint(eager=True)
    cand = simhash_bands(h, id_col, n_bands, max_bucket)
    out = (
        cand.join(h.select(F.col(id_col).alias("a"), F.col("simhash").alias("_ha")), "a")
        .join(h.select(F.col(id_col).alias("b"), F.col("simhash").alias("_hb")), "b")
        .withColumn("hamming", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
    return out


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
    stats: dict | None = None,
    checkpoint_dir: str | None = None,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Connected components over an undirected pair list → (node, component),
    component = MIN node id reachable from the node. Deterministic (all
    reductions are mins), DataFrame-native, no GraphFrames dependency.

    Algorithm: alternating **neighbor-min propagation** (label ← min over
    own + neighbors' labels) and **pointer doubling** (label ← label's
    label), the standard MapReduce/Pregel CC shape: doubling halves the
    remaining pointer-chain depth each round, so convergence is
    O(log diameter) rounds, not O(diameter). Each round is two shuffles on
    keys the planner hashes (node / label); `localCheckpoint` truncates the
    iterative plan's lineage so round N's DAG does not replay rounds 1..N-1.
    Convergence detection is free: labels only ever DECREASE, so the global
    label sum is strictly monotone and equality between rounds == fixpoint.

    100 TB shape: near-dup graphs are overwhelmingly tiny cliques/paths
    (clusters of boilerplate variants), so real corpora converge in 2-4
    rounds; the doubling step guards the adversarial long-chain case.

    Fault tolerance: the default `localCheckpoint` stores blocks on
    executors ONLY — on a real cluster an executor loss mid-loop kills the
    truncated lineage and the job. Pass `checkpoint_dir` (HDFS/object
    store path) to switch every checkpoint in the loop to RELIABLE
    `checkpoint()` — replicated, survives executor loss — at the cost of
    a write per round. Local mode keeps the executor-local default.
    Caveats the CALLER owns with `checkpoint_dir`: (a) it calls
    `setCheckpointDir`, which is SparkContext-global — coordinate with
    other jobs sharing the context; (b) the per-round rdd-* files are not
    auto-deleted (they back the returned DataFrame's lineage) — delete
    the directory after the job's results are written, or set
    `spark.cleaner.referenceTracking.cleanCheckpoints=true` to let the
    ContextCleaner reap them on GC.

    Size-adaptive strategy: verified near-dup pair sets are usually TINY
    relative to the corpus (pairs are the exception, not the rule), and
    the iterative loop costs ~6 Spark jobs per round regardless of size.
    When the materialized edge list is ≤ `driver_threshold` rows (default
    100k ≈ 1.6 MB of longs — squarely a small-result driver read), the
    components are computed with a driver-side union-find (identical
    min-label semantics, equivalence-tested against the distributed loop)
    in ONE collect instead of O(log diameter) shuffle rounds. Measured at
    sf0.1 (477 clustered docs): dedup_clusters 4.25 → 3.85 s — modest,
    because the signature→LSH→verify chain dominates there; the payoff
    grows with round count (long chains) and disappears into the
    threshold guard at scale. Pass driver_threshold=0 to force the
    distributed loop; above the threshold the loop runs regardless."""
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    # Materialize the edge list ONCE: `pairs` usually carries an expensive
    # lineage (minhash → LSH → Jaccard verify), and every CC round joins
    # edges — without this checkpoint each round would re-execute the whole
    # upstream pipeline (measured 9.6 s → 2.5 s for dedup_clusters at sf0.1).
    edges = _ckpt(
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    n_edges = edges.count()  # on the checkpointed blocks — no recompute
    # driver_threshold > 0 guard: threshold=0 is the documented "force the
    # distributed loop" escape hatch and must hold even for an EMPTY edge
    # list (probes/tests read stats['strategy'] to know which path ran)
    if driver_threshold > 0 and n_edges <= driver_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        edge_rows = edges.collect()
        nodes = set()
        for r in edge_rows:
            s, d = r["src"], r["dst"]
            nodes.add(s)
            nodes.add(d)
            ra, rb = find(s), find(d)
            if ra != rb:
                # min id becomes the root → root IS the component label
                parent[max(ra, rb)] = min(ra, rb)
        if stats is not None:
            stats["rounds"] = 0
            stats["converged"] = True
            stats["strategy"] = "driver-union-find"
        from pyspark.sql.types import StructField, StructType

        id_type = edges.schema["src"].dataType
        schema = StructType(
            [StructField("node", id_type), StructField("component", id_type)]
        )
        out = [(n, find(n)) for n in sorted(nodes)]
        return pairs.sparkSession.createDataFrame(out, schema)
    if stats is not None:
        stats["strategy"] = "distributed"
    labels = _ckpt(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    prev_sum = None
    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        nbr = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("_nbl"))
            .withColumnRenamed("src", "node")
        )
        prop = labels.join(nbr, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("_nbl"), F.col("label"))).alias("label"),
        )
        # pointer doubling: label ← label's current label (labels are always
        # node ids, so the parent lookup always resolves; coalesce is belt)
        parent = prop.selectExpr("node AS _pn", "label AS _pl")
        doubled = (
            prop.join(parent, F.col("label") == F.col("_pn"), "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("_pl"), F.col("label"))).alias("label"),
            )
        )
        labels = _ckpt(doubled)
        row = labels.agg(F.sum("label").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
        if row["n"] == 0 or row["s"] == prev_sum:
            converged = True
            break
        prev_sum = row["s"]
    if not converged:
        # non-converged labels would silently mis-cluster (ADVICE r3):
        # dedup_apply would then drop/keep docs on wrong component ids.
        import warnings

        warnings.warn(
            f"connected_components: no fixpoint after max_iter={max_iter} "
            "rounds; labels may be non-minimal — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    if stats is not None:
        # observability hook: rounds-to-fixpoint (tests pin the O(log
        # diameter) claim with it; includes the final no-change round)
        stats["rounds"] = rounds
        stats["converged"] = converged
    return labels.select("node", F.col("label").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, cluster_id) for every doc in ≥1 verified near-dup pair;
    cluster_id = min doc_id of the doc's connected component — the keeper.
    Docs in no pair are singletons and are not listed (they trivially keep
    themselves). `checkpoint_dir` switches the CC loop to reliable
    checkpoints (see connected_components) — set it on a real cluster."""
    cc = connected_components(pairs, a_col, b_col, checkpoint_dir=checkpoint_dir)
    return cc.select(F.col("node").alias(id_col), F.col("component").alias("cluster_id"))


def dedup_stats(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """One-row dedup audit — the number every dedup run should publish
    before anyone trains on its output: corpus size, clustered docs,
    cluster count, docs dropped (clustered - clusters), duplicate rate,
    and the largest cluster (a skew/near-dup-storm canary: one viral
    boilerplate string can chain thousands of docs into one component).
    Two tiny aggregates over the (doc, cluster) table + one corpus count
    — all map-side partials, no extra pass over texts."""
    per = clusters.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("sz"))
    agg = per.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.coalesce(F.sum("sz"), F.lit(0)).alias("n_clustered_docs"),
        F.coalesce(F.max("sz"), F.lit(0)).alias("max_cluster_size"),
    )
    total = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return total.crossJoin(agg).select(
        "n_docs",
        "n_clustered_docs",
        "n_clusters",
        (F.col("n_clustered_docs") - F.col("n_clusters")).alias("n_dropped"),
        F.round(
            (F.col("n_clustered_docs") - F.col("n_clusters"))
            / F.greatest(F.col("n_docs"), F.lit(1)),
            6,
        ).alias("dup_rate"),
        "max_cluster_size",
    )


def dedup_apply(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    broadcast_drop: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The deduplicated corpus: every near-dup cluster keeps exactly its
    min-id member; all other cluster members are dropped; unclustered docs
    pass through. This is the step that turns verified PAIRS into a
    DECISION — which rows to keep (VERDICT r2 gap #2).

    Shape: the drop list is |cluster members| - |clusters| rows — id-only,
    a small fraction of the corpus — and is broadcast EXPLICITLY: the
    statistics-blind static plan otherwise picks a SortMergeJoin that
    shuffles+sorts the whole corpus to drop <1% of it (plan-tested).
    `broadcast_drop=False` for the degenerate mostly-duplicates corpus
    where the drop list rivals the corpus."""
    clusters = dedup_clusters(pairs, id_col, checkpoint_dir=checkpoint_dir)
    drop = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    if broadcast_drop:
        drop = F.broadcast(drop)
    return df.join(drop, id_col, "left_anti")


def winnow_candidates(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_bucket: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Candidate pairs from winnowing fingerprints: (a, b, n_shared) for
    docs sharing ≥ `min_shared` fingerprints — the MOSS match step, with
    the winnowing guarantee that any shared run of ≥ w+k-1 tokens surfaces
    at least one shared fingerprint. Input: `winnow_fingerprints` output.

    Scale shape mirrors LSH banding: self-join keyed on the fingerprint
    (never all-pairs), `max_bucket` drops degenerate fingerprints (the
    boilerplate-ubiquitous hash that would pin one reducer), and the
    pair aggregation is one groupBy with map-side partials."""
    fps = cap_buckets(fps, max_bucket, keys=("fingerprint",))
    if materialize:
        # REJECTED as the default (r6, measured): one-kernel-pass via
        # localCheckpoint of the capped fingerprint set lost the
        # interleaved A/B at 500k docs 10.16 s vs 4.95 s (recompute) —
        # the fingerprint set is ~17 rows/doc, and serializing +
        # re-exchanging it costs far more than the second narrow kernel
        # pass the broadcast build side plans. See lsh_candidates.
        fps = fps.localCheckpoint(eager=True)
    l, r = fps.alias("l"), fps.alias("r")
    return (
        l.join(r, "fingerprint")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .groupBy(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def simhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 4,
    max_bucket: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Candidate pairs whose 60-bit simhash agrees on ≥1 of n_bands 15-bit
    chunks (Hamming distance ≤ n_bands-1 guaranteed found). Input must carry
    a `simhash` column (textops.with_simhash).

    Band keys are extracted with INTEGER bit ops (shiftrightunsigned + AND):
    long/long division in Spark promotes to double, and 60-bit simhashes
    exceed double's 53-bit mantissa, so a float-division chunk silently
    corrupts low-band keys and loses the Hamming recall guarantee."""
    width = 60 // n_bands
    chunk = lambda i: F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(2**width - 1)
    entries = F.array(*[F.struct(F.lit(i).alias("band"), chunk(i).alias("key")) for i in range(n_bands)])
    banded = df.select(F.col(id_col), F.explode(entries).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    banded = cap_buckets(banded, max_bucket)
    if materialize:
        # rejected-as-default self-join materialization — see
        # lsh_candidates' docstring for the measured A/B
        banded = banded.localCheckpoint(eager=True)
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(r, ["band", "key"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# cross-run incremental dedup (VERDICT r2 missing #3): dedup a NEW batch
# against the already-ingested corpus without recomputing its signatures
# ---------------------------------------------------------------------------


class SignatureStore:
    """Persistent MinHash signature store for incremental dedup.

    Layout mirrors the pipeline's resume manifest (sources/manifest.py):
    signatures land under ``root/runs/<run_id>/`` as parquet and a JSON
    index is committed atomically (tmp + rename) AFTER the write, so a
    crash mid-append leaves an orphan directory that is simply ignored
    (never read, overwritten on retry under the same run_id). At 100 TB
    the store is ~n_hashes x 8 bytes per doc — 3 orders of magnitude
    smaller than the corpus — and reads are partition-pruned per run.
    """

    def __init__(self, root: str):
        import os

        self.root = root
        os.makedirs(root, exist_ok=True)

    def _index_path(self) -> str:
        import os

        return os.path.join(self.root, "index.json")

    def _read_index(self) -> dict:
        import json
        import os

        p = self._index_path()
        if not os.path.exists(p):
            return {"runs": [], "files": {}}
        with open(p) as f:
            idx = json.load(f)
        idx.setdefault("files", {})
        return idx

    def _write_index(self, idx: dict) -> None:
        import json
        import os
        import tempfile

        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(idx, f)
        os.replace(tmp, self._index_path())

    def committed_runs(self) -> list[str]:
        return self._read_index()["runs"]

    def committed_files(self) -> set[str]:
        """Every INPUT file whose docs' signatures are committed, across
        all runs. This is the crash-replay key for the dedup agent: a tick
        that died between the store commit and the manifest commit leaves
        its files here but not in the manifest, and the retry must not
        re-append them even if the pending set has since changed (ADVICE
        r4 medium — run-set hashes are not a stable replay key)."""
        files: set[str] = set()
        for fs in self._read_index()["files"].values():
            files.update(fs)
        return files

    def files_complete(self) -> bool:
        """True when every committed run recorded its input files — i.e.
        committed_files() is a complete provenance map and callers may
        prune corpus scans to it. Legacy runs appended without
        `input_files` make it False — and compaction PRESERVES that
        incompleteness (`legacy_incomplete` marker): folding runs must
        not fabricate provenance the legacy runs never had, or the
        verify-scan fallback in dedup_tick would silently drop the
        legacy files' texts."""
        idx = self._read_index()
        if idx.get("legacy_incomplete"):
            return False
        return all(r in idx["files"] for r in idx["runs"])

    def append(
        self,
        sigs: DataFrame,
        run_id: str,
        input_files: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> None:
        """Write-then-commit: parquet first, index rename second.
        `input_files` records which source files this run's signatures came
        from (feeds `committed_files()` for per-file crash replay).
        `partition_by` lays the run out partitioned (e.g. by IVF cell, so
        loads filtered on the partition key prune whole directories)."""
        import os

        if not run_id:
            raise ValueError("append requires a run_id")
        idx0 = self._read_index()
        if run_id in idx0["runs"]:
            raise ValueError(f"signature run {run_id!r} already committed")
        # partition_by is a store-global layout key (ADVICE r5 low): mixing
        # a partitioned append into a store with non-partitioned runs (or
        # changing the columns) breaks load_runs_union's unionByName and
        # makes compaction partition over rows lacking the column.
        if idx0["runs"] and list(partition_by or []) != list(idx0.get("partition_by") or []):
            raise ValueError(
                f"partition_by {partition_by!r} does not match the store's "
                f"existing layout {idx0.get('partition_by')!r}"
            )
        path = os.path.join(self.root, "runs", run_id)
        w = sigs.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        idx = self._read_index()
        idx["runs"] = idx["runs"] + [run_id]
        if input_files:
            idx["files"][run_id] = sorted(input_files)
        if partition_by:
            idx["partition_by"] = list(partition_by)
        self._write_index(idx)

    def load(self, spark) -> DataFrame | None:
        """All committed signatures, or None when the store is empty."""
        import os

        runs = self.committed_runs()
        if not runs:
            return None
        return spark.read.parquet(
            *[os.path.join(self.root, "runs", r) for r in runs]
        )

    def load_runs_union(self, spark) -> DataFrame | None:
        """Per-run scans unioned by name — the load for PARTITIONED runs:
        multi-path partition discovery chokes on the non-k=v run-dir
        segment between the common root and the cell=N directories, while
        one scan per run keeps its own partition column AND its own
        partition pruning (a cell filter above the union prunes
        directories in every branch)."""
        import functools
        import os

        runs = self.committed_runs()
        if not runs:
            return None
        dfs = [spark.read.parquet(os.path.join(self.root, "runs", r)) for r in runs]
        return functools.reduce(lambda a, b: a.unionByName(b), dfs)

    def compact(self, spark) -> None:
        """Fold every committed run into ONE compacted run — the
        small-files defense for long-lived stores (each incremental batch
        adds a run dir; a year of hourly batches is ~10k directories and
        their file listings start to dominate load()).

        Crash-safe by the same write-then-commit discipline as append():
        the compacted parquet lands under a DETERMINISTIC id derived from
        the run list (a crashed compact retries into the same directory),
        the index swap is one atomic rename, and run dirs no longer in
        the index are reaped only after the swap (a crash in between
        leaves unreferenced dirs that the next compact sweeps)."""
        import hashlib
        import os
        import shutil

        runs = self.committed_runs()
        if len(runs) > 1:
            cid = "compact-" + hashlib.md5("\n".join(runs).encode()).hexdigest()[:12]
            part = self._read_index().get("partition_by")
            # per-run union, NOT the multi-path self.load(): partitioned
            # run dirs make spark.read.parquet(run1, run2, ...) throw
            # CONFLICTING_DIRECTORY_STRUCTURES (the run-dir segment sits
            # between the common root and the cell=N directories)
            w = self.load_runs_union(spark).write.mode("overwrite")
            if part:
                w = w.partitionBy(*part)
            w.parquet(os.path.join(self.root, "runs", cid))
            # fold the per-run file provenance into the compacted run so
            # committed_files() survives compaction — but keep the
            # incompleteness marker if any folded run predates provenance
            complete_before = self.files_complete()
            all_files = sorted(self.committed_files())
            idx = {"runs": [cid], "files": {cid: all_files} if all_files else {}}
            if part:
                idx["partition_by"] = part
            if not complete_before:
                idx["legacy_incomplete"] = True
            self._write_index(idx)
        # sweep anything the index no longer references
        live = set(self.committed_runs())
        runs_dir = os.path.join(self.root, "runs")
        if os.path.isdir(runs_dir):
            for d in os.listdir(runs_dir):
                if d not in live:
                    shutil.rmtree(os.path.join(runs_dir, d), ignore_errors=True)


def incremental_near_dup_pairs(
    store: SignatureStore,
    new_docs: DataFrame,
    corpus: DataFrame,
    run_id: str | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = None,
    replay: bool = False,
    input_files: list[str] | None = None,
) -> DataFrame:
    """Verified near-dup pairs INVOLVING the new batch: new-vs-new plus
    new-vs-already-ingested, then append the new signatures to the store.

    Guarantee (for `max_bucket=None`, the gated configuration): unioning
    each run's pairs over a sequence of incremental runs yields EXACTLY
    the full-corpus pair set (every pair {x, y} is emitted by the run that
    ingests its later member), so incremental ingestion and a one-shot
    whole-corpus run produce the same surviving set under dedup_apply —
    property-tested and under the DuckDB gate. With `max_bucket` SET the
    equivalence does NOT hold exactly: the cap is evaluated per run on the
    partial (old ∪ new) banded set, so a bucket under the cap in an early
    run emits pairs that the one-shot run (where the bucket exceeds the
    cap) would drop, and vice versa — capped incremental runs can diverge
    from the one-shot capped run in either direction (ADVICE r3).

    Scale shape per run (N = corpus so far, B = new batch, B << N):
    - signatures computed for B only (the store holds the rest);
    - banding is a narrow projection of both sides; the candidate join is
      band(new) ⋈ band(all) — the all side streams, the new side is the
      small build side;
    - `max_bucket` caps buckets by their CURRENT (old ∪ new) size — the
      same defense as the whole-corpus path, evaluated per run;
    - Jaccard verification re-reads texts ONLY for candidate-touched docs
      (semi-join prune on the corpus), O(|candidates| · shingles/doc).
    """
    # materialize the new batch's signatures ONCE (r6): they feed the
    # (old ∪ new) banded side, the new-ids semi-join AND the store append
    # — each consumer otherwise re-runs the MinHash kernel over the batch
    new_sigs = minhash_signatures(new_docs, id_col, text_col, n_hashes, k).localCheckpoint(
        eager=True
    )
    old_sigs = store.load(new_docs.sparkSession)

    if replay:
        # crash replay AFTER the store commit: these docs' signatures are
        # already in old_sigs — band against the store alone and skip the
        # append; the pair set is identical to the original attempt's
        # (signatures are deterministic). run_id=None means "the caller
        # established from committed_files() that every new_docs source
        # file is already ingested" (the per-file replay key, ADVICE r4).
        if old_sigs is None or (
            run_id is not None and run_id not in store.committed_runs()
        ):
            raise ValueError(
                f"replay=True but run {run_id!r} is not committed in the store"
            )
        all_sigs = old_sigs
    else:
        all_sigs = new_sigs if old_sigs is None else old_sigs.unionByName(new_sigs)
    all_b = cap_buckets(band_signatures(all_sigs, id_col, n_hashes, bands), max_bucket)
    new_ids = new_sigs.select(id_col)
    new_b = all_b.join(new_ids, id_col, "leftsemi")

    l, r = new_b.alias("l"), all_b.alias("r")
    pairs = (
        l.join(r, ["band", "key"])
        .filter(F.col(f"l.{id_col}") != F.col(f"r.{id_col}"))
        .select(
            F.least(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias("a"),
            F.greatest(F.col(f"l.{id_col}"), F.col(f"r.{id_col}")).alias("b"),
        )
        .distinct()
        # materialize the tiny candidate list once (r6): it feeds the
        # touched-docs semi-join (two union branches) and the verify —
        # without this each consumer re-runs the store-scan + banding join
        .localCheckpoint(eager=True)
    )

    touched = corpus.join(
        pairs.select(F.col("a").alias(id_col))
        .union(pairs.select(F.col("b").alias(id_col)))
        .distinct(),
        id_col,
        "leftsemi",
    )
    verified = ngram_jaccard(
        touched, id_col, text_col, k, threshold=threshold, candidates=pairs
    )
    if not replay:
        store.append(new_sigs, run_id, input_files=input_files)
    return verified
