"""Similarity search over embedding columns (BASELINE.json north star).

Brute-force cosine top-k is the exact baseline (a crossJoin restricted
to the query set — at scale the query side is small/broadcast, so this
is a map-only pass over the corpus, no shuffle of the corpus itself).
The scale path is LSH bucketing (random hyperplanes) or IVF (coarse
k-means cells): candidates come from an equi-join on bucket/cell id,
cutting the scanned fraction; both are expressed as DataFrame plans.

Dot products use F.aggregate over zip_with — JVM-side, no UDF. The
embedding column is cast to double before arithmetic so results are
deterministic and comparable with DuckDB's list_cosine_similarity.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def topk_bruteforce(queries: DataFrame, corpus: DataFrame, k: int, *,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query with a deterministic tie-break.

    Output: (query_id, neighbor_id, cos_sim, rank).
    """
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      cosine(F.col("qv"), F.col("cv")).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42
                       ) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (driver-side,
    config-sized)."""
    rng = random.Random(seed)
    planes = []
    for _ in range(n_planes):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from random hyperplanes (bigint)."""
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + F.shiftleft(bit.cast("bigint"), i)
    return bucket


def topk_lsh(queries: DataFrame, corpus: DataFrame, k: int, *,
             n_planes: int = 8, seed: int = 42, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             multiprobe: bool = True) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets.

    Candidates = corpus vectors in the query's bucket (plus, with
    ``multiprobe``, all buckets at Hamming distance 1 — standard
    multi-probe LSH to lift recall); exact cosine ranks the candidates.
    The equi-join on bucket replaces the cross join: with b planes the
    scanned fraction is ~ (1+b)/2^b of the corpus per query.

    Output: (query_id, neighbor_id, cos_sim, rank) — rank <= k, possibly
    fewer rows than brute force when a bucket underfills (approximate by
    design; recall is test-asserted against the brute-force oracle).
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    q = _as_double(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"))
    if multiprobe:
        probes = F.array(*([F.col("bucket")] +
                           [F.col("bucket").bitwiseXOR(F.lit(1 << i))
                            for i in range(n_planes)]))
        q = q.select("query_id", "qv", F.explode(probes).alias("bucket"))
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"))
    scored = (c.join(F.broadcast(q), "bucket")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      cosine(F.col("qv"), F.col("cv")).alias("cos_sim"))
              .distinct())
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def embedding_near_dup_pairs(vectors: DataFrame, *, threshold: float = 0.9,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             round_digits: int = 6) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding-based
    near-duplicate detection. Exact (full pair join); use the LSH variant
    to pre-filter candidates at scale.

    Output: (id_a, id_b, cos_sim rounded to ``round_digits``).
    """
    v = _as_double(vectors, vec_col)
    a = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     F.round(cosine(F.col("va"), F.col("vb")),
                             round_digits).alias("cos_sim")))
    return pairs.filter(F.col("cos_sim") >= threshold)
