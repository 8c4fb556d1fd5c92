"""Similarity search over embedding columns (array<float>).

Two paths:
- **Brute-force cosine top-k** — exact baseline: broadcast the query
  vector(s), dot products via native `zip_with`/`aggregate` (JVM, codegen),
  one narrow pass + a top-k sort. Right answer for small k / few queries.
- **LSH-bucketed ANN** — scale path: sign-bit sketches over a shared set of
  anchor vectors bucket the corpus; search touches only the query's bucket.
  Anchors are ROWS OF THE TABLE ITSELF (deterministic, engine-agnostic), so
  the DuckDB oracle can reproduce bucketing exactly — no RNG to sync.

At 100 TB: the corpus side stays partitioned; queries/anchors are broadcast;
bucketing adds one narrow projection and turns the scan into a semi-join
prune (bucket id is a groupable/bucketable key for storage layout too).
An IVF variant would k-means the anchors first — same plumbing, better
recall/bucket balance; sign-LSH keeps the oracle exactly reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of the row `query_id` (excluded itself).
    The query vector joins in as a 1-row broadcast cross join — the corpus
    never shuffles. Deterministic tie-break on (sim desc, id asc)."""
    q = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec")
    )
    dv = F.col(vec_col).cast("array<double>")
    qv = F.col("qvec").cast("array<double>")
    scored = (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(_dot(dv, qv) / (_norm(dv) * _norm(qv)), 6).alias("sim"),
        )
    )
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def signbit_bucket(
    df: DataFrame,
    anchors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    anchor_id_col: str = "vec_id",
) -> DataFrame:
    """Adds `bucket`: the sign-bit sketch of the vector against each anchor
    (bit i = 1 iff dot(vec, anchor_i) > 0), as a compact bigint."""
    a = anchors.select(
        F.col(anchor_id_col).alias("_aid"), F.col(vec_col).cast("array<double>").alias("_avec")
    )
    rows = a.orderBy("_aid").collect()  # few anchors — driver-side is fine
    dv = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, r in enumerate(rows):
        avec = F.array(*[F.lit(float(x)) for x in r["_avec"]])
        bit = F.when(_dot(dv, avec) > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return df.withColumn("bucket", bucket)


def ann_topk(
    df: DataFrame,
    query_id: int,
    n_anchors: int = 6,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate top-k: exact cosine, but only within the
    query's sign-bit bucket. Anchors = the n lowest-id rows of the corpus."""
    anchors = df.orderBy(id_col).limit(n_anchors)
    bucketed = signbit_bucket(df, anchors, id_col, vec_col)
    qb = bucketed.filter(F.col(id_col) == query_id).select(
        F.col("bucket").alias("qbucket"), F.col(vec_col).alias("qvec")
    )
    dv = F.col(vec_col).cast("array<double>")
    qv = F.col("qvec").cast("array<double>")
    scored = (
        bucketed.crossJoin(F.broadcast(qb))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col(id_col) != query_id))
        .select(id_col, F.round(_dot(dv, qv) / (_norm(dv) * _norm(qv)), 6).alias("sim"))
    )
    return scored.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def ivf_topk(
    df: DataFrame,
    query_id: int,
    n_anchors: int = 6,
    nprobe: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: every vector is assigned to its NEAREST centroid
    (argmax cosine, deterministic lowest-index tie-break); search scans only
    the query's `nprobe` nearest cells. Centroids are the n lowest-id rows
    of the corpus — deterministic and engine-agnostic, so the DuckDB oracle
    reproduces cell assignment exactly (a production deployment would
    k-means them; assignment/probe plumbing is identical).

    vs sign-bit LSH (ann_topk): cells partition the corpus (each vector in
    exactly ONE cell — storage can be bucketed/clustered by cell id), and
    recall/cost tune smoothly via nprobe instead of 2^bits bucketing."""
    anchors = df.orderBy(id_col).limit(n_anchors)
    a = anchors.select(
        F.col(id_col).alias("_aid"), F.col(vec_col).cast("array<double>").alias("_avec")
    )
    rows = a.orderBy("_aid").collect()  # few anchors — driver-side is fine
    dv = F.col(vec_col).cast("array<double>")

    def cos_to(avec_row):
        avec = F.array(*[F.lit(float(x)) for x in avec_row])
        return _dot(dv, avec) / (_norm(dv) * _norm(avec))

    # deterministic argmax: strictly-greater chain, first anchor wins ties
    cell = F.lit(0)
    best = cos_to(rows[0]["_avec"])
    for i in range(1, len(rows)):
        s = cos_to(rows[i]["_avec"])
        cond = s > best
        cell = F.when(cond, F.lit(i)).otherwise(cell)
        best = F.when(cond, s).otherwise(best)
    assigned = df.withColumn("cell", cell)

    qrow = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).cast("array<double>").alias("qv")
    ).collect()[0]["qv"]
    import math

    qn = math.sqrt(sum(x * x for x in qrow))
    scored_cells = sorted(
        (
            (
                -sum(x * y for x, y in zip(r["_avec"], qrow))
                / (math.sqrt(sum(x * x for x in r["_avec"])) * qn),
                i,
            )
            for i, r in enumerate(rows)
        ),
    )
    probe_cells = [i for _, i in scored_cells[:nprobe]]

    qv = F.array(*[F.lit(float(x)) for x in qrow])
    return (
        assigned.filter(F.col("cell").isin(probe_cells) & (F.col(id_col) != query_id))
        .select(id_col, F.round(_dot(dv, qv) / (_norm(dv) * _norm(qv)), 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    n_anchors: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a, b, sim ≥ threshold) via
    bucket self-join — the ANN analogue of LSH dedup. `max_bucket` drops
    degenerate sign-bit buckets before the quadratic self-join (see
    dedup.cap_buckets) — mandatory at scale, optional for exact recall on
    small corpora."""
    from logspark.operators.dedup import cap_buckets

    anchors = df.orderBy(id_col).limit(n_anchors)
    b = signbit_bucket(df, anchors, id_col, vec_col)
    b = cap_buckets(b, max_bucket, keys=("bucket",))
    l = b.select(F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va"), "bucket")
    r = b.select(F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb"), "bucket")
    return (
        l.join(r, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 6
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
