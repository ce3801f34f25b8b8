"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (broadcast the query side —
it is small by definition), and a seeded random-hyperplane LSH variant as
the 100TB scale path (bucket join instead of full scan).  Dot products use
built-in higher-order functions (zip_with + aggregate) — JVM-side, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(
    data: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    queries is broadcast (small side); the scan over data is a single pass
    with no shuffle until the per-query top-k window.  Output:
    (query_id, rank, neighbor_id, cosine).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
    )
    d = data.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__dv"))
    pairs = q.crossJoin(d)
    if not include_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_col(F.col("__qv"), F.col("__dv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42):
    """Deterministic random hyperplanes (seeded numpy, no wall clock)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype("float32")


def lsh_bucket_col(vec: Column, planes) -> Column:
    """Sign-bit bucket id from dot products with fixed hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (dot_col(vec, plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def ivf_cosine_topk(
    data: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    include_self: bool = False,
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantize to centroid lists,
    probe the query's ``n_probe`` nearest lists only.

    Centroids are a deterministic coarse codebook: the ``n_lists``
    lowest-id vectors (seed vectors; a k-means refinement slots in here
    without changing the plumbing).  Assignment = argmax cosine to a
    centroid — computed JVM-side against broadcast centroid literals, so
    both the build and the probe are single narrow passes; the probe join
    touches ~n_probe/n_lists of the corpus instead of all of it.
    Same output schema as cosine_topk.
    """
    cents = [
        (int(r[0]), list(r[1]))
        for r in data.select(id_col, vec_col).orderBy(id_col).limit(n_lists).collect()
    ]

    def best_lists(vec: Column, n: int) -> Column:
        scored = F.array(
            *[
                F.struct(
                    cosine_col(vec, F.array(*[F.lit(float(x)) for x in c])).alias("s"),
                    F.lit(i).alias("list_id"),
                )
                for i, (_, c) in enumerate(cents)
            ]
        )
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
        return F.transform(top, lambda s: s["list_id"])

    d = data.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__dv"),
        best_lists(F.col(vec_col), 1).getItem(0).alias("__list"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.explode(best_lists(F.col(vec_col), n_probe)).alias("__list"),
        )
    )
    pairs = q.join(d, on="__list")
    if not include_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_col(F.col("__qv"), F.col("__dv")).alias("cosine"),
    ).groupBy("query_id", "neighbor_id").agg(F.first("cosine").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def embedding_near_dup_pairs(
    data: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    materialize: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family, brief item).

    Candidates share a hyperplane-LSH bucket (near-identical vectors almost
    surely do; exact duplicates always do), then the exact cosine filter
    applies.  Self-join happens bucket-locally — never a cross join.
    Output: (id_a, id_b, cosine), id_a < id_b.  ``materialize`` computes
    the n_planes dot-product bucket projection once instead of once per
    self-join side (localCheckpoint; GC-freed).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    b = lsh_bucket_col(F.col(vec_col), planes)
    tagged = data.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), b.alias("__bucket")
    )
    if materialize:
        tagged = tagged.localCheckpoint(eager=False)
    a = tagged.alias("a")
    c = tagged.alias("b")
    pairs = (
        a.join(c, on="__bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_col(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
    return pairs


def lsh_cosine_topk(
    data: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    include_self: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    At 100TB the full scan per query is off the table; this probes one
    bucket (recall tunes via n_planes; multi-probe = union over neighboring
    buckets).  Same output schema as cosine_topk.
    """
    planes = _hyperplanes(dim, n_planes, seed)
    d = data.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__dv"),
        lsh_bucket_col(F.col(vec_col), planes).alias("__bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            lsh_bucket_col(F.col(vec_col), planes).alias("__bucket"),
        )
    )
    pairs = q.join(d, on="__bucket")
    if not include_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_col(F.col("__qv"), F.col("__dv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
