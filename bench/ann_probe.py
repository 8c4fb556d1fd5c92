"""IVF ANN scale probe: the similarity path two orders of magnitude above
the sf tables.

Deterministic corpus (hash-derived vectors, no RNG): n vectors, dim 64.
Measures the two assignment forms at their intended operating points:

- `ivf_assign` (declarative broadcast join + max_by): the ORACLE-exact
  form. Its dot products are Catalyst higher-order functions — interpreted
  per element, so it is the right tool at small k (oracle parity, plan
  shape), not the 100 TB kernel.
- `ivf_assign_vectorized` (Arrow + numpy matmul): the PRODUCTION kernel —
  zero shuffle, one BLAS matmul per batch; timed at k=64 and k=256 over
  the full corpus, plus agreement vs the declarative form on a slice.
- `train_ivf_centroids`: one Lloyd round at k=64 (broadcast assign +
  64 avg aggregates).

Run:  taskset -c 0-31 python -m bench.ann_probe [n_vectors]
Prints one PROBE_RESULT json line; numbers live in BENCH/NOTES.md.
"""

from __future__ import annotations

import json
import sys
import time


def synth_vectors(spark, n: int, dim: int = 64):
    from pyspark.sql import functions as F

    v = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(F.hash(F.col("vec_id") * 97 + j), F.lit(2001)) - 1000)
        / F.lit(1000.0),
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), v.alias("embedding"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    from pyspark.sql import functions as F

    from logspark.operators import similarity
    from logspark.queries import ensure_workers
    from logspark.session import get_spark

    spark = get_spark(app_name="ann-probe")
    ensure_workers(spark)
    emb = synth_vectors(spark, n).repartition(64).localCheckpoint(eager=True)
    out: dict = {"n_vectors": n, "dim": 64}

    for k in (64, 256):
        cents = similarity.head_centroids(emb, k).localCheckpoint(eager=True)
        t0 = time.time()
        assigned = similarity.ivf_assign_vectorized(emb, cents)
        counts = assigned.groupBy("cell").count()
        n_cells = counts.count()
        out[f"vectorized_assign_k{k}_s"] = round(time.time() - t0, 2)
        out[f"nonempty_cells_k{k}"] = n_cells
        if k == 64:
            row = counts.agg(F.max("count").alias("mx"), F.min("count").alias("mn")).collect()[0]
            out["cell_balance_max_over_min_k64"] = round(row["mx"] / max(row["mn"], 1), 1)

    # declarative (oracle-exact) form at its operating point: small k
    slice_df = emb.filter(F.col("vec_id") < 20_000).localCheckpoint(eager=True)
    cents16 = similarity.head_centroids(slice_df, 16).localCheckpoint(eager=True)
    t0 = time.time()
    a = similarity.ivf_assign(slice_df, cents16)
    a_rows = {r["vec_id"]: r["cell"] for r in a.collect()}
    out["declarative_assign_20k_k16_s"] = round(time.time() - t0, 2)
    b_rows = {
        r["vec_id"]: r["cell"]
        for r in similarity.ivf_assign_vectorized(slice_df, cents16).collect()
    }
    agree = sum(1 for i, c in a_rows.items() if b_rows[i] == c)
    out["declarative_vs_vectorized_agreement"] = round(agree / len(a_rows), 6)

    t0 = time.time()
    similarity.train_ivf_centroids(emb, 64, n_iter=1).count()
    out["kmeans_one_round_k64_s"] = round(time.time() - t0, 2)

    print("PROBE_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
