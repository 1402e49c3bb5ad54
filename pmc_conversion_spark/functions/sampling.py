"""Deterministic hash-based sampling and dataset splits.

Training-data pipelines must never use ``rand()`` for splits: a retry,
a different partitioning, or a re-run would reassign rows, leaking
val/test into train. Every operator here derives its decision from a
*portable salted content hash* of the row's stable id, so:

- the assignment is a pure function of (id, salt) — reproducible on any
  cluster, any partitioning, any engine (the DuckDB oracle replays the
  identical md5 arithmetic);
- changing the salt re-draws the split without touching the data;
- membership is map-side only — zero shuffles for filter-style
  sampling, one partial-agg shuffle when the query aggregates.

The hash is the 60-bit md5 family from
:mod:`pmc_conversion_spark.functions.dedup` (same reasoning: portable
beats fast here; xxhash64 is the drop-in when oracle parity stops
mattering).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pmc_conversion_spark.functions.dedup import md5_int60

#: hash-space resolution for fractions (1 unit = 0.01%)
BUCKETS = 10_000


def hash_bucket(id_col: Column, salt: str) -> Column:
    """Deterministic bucket in [0, BUCKETS) from (id, salt). md5_int60
    is non-negative, so plain ``%`` is safe (no pmod dance needed)."""
    return md5_int60(F.concat(F.lit(salt), F.lit(":"),
                              id_col.cast("string"))) % BUCKETS


def split_assign(df: DataFrame, id_col: str,
                 weights: Sequence[tuple[str, float]], *,
                 salt: str, out_col: str = "split") -> DataFrame:
    """Assign every row to a named split by cumulative hash-bucket
    ranges (e.g. ``[("train", .8), ("val", .1), ("test", .1)]``).
    Weights must sum to 1; ranges are [lo, hi) over BUCKETS."""
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(F.col(id_col), salt)
    expr = None
    hi = 0.0
    for name, w in weights:
        hi += w
        cond = b < int(round(hi * BUCKETS))
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)


def sample_hash(df: DataFrame, id_col: str, fraction: float, *,
                salt: str) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose hash bucket
    falls under ``fraction``. Map-side filter — pushes past the scan
    like any other predicate."""
    return df.filter(
        hash_bucket(F.col(id_col), salt) < int(round(fraction * BUCKETS)))


def stratified_sample_hash(df: DataFrame, strata_col: str, id_col: str,
                           fractions: Mapping[str, float], *,
                           salt: str, default: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep the tail). The per-stratum threshold is a literal
    CASE chain — map-side, no join, no shuffle; strata sets are
    config-sized by definition."""
    b = hash_bucket(F.col(id_col), salt)
    thr = None
    for k, frac in fractions.items():
        cond = F.col(strata_col) == k
        lim = F.lit(int(round(frac * BUCKETS)))
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    thr = thr.otherwise(F.lit(int(round(default * BUCKETS)))) if thr is not None \
        else F.lit(int(round(default * BUCKETS)))
    return df.filter(b < thr)


def mixture_weighted(df: DataFrame, domain_col: str, id_col: str,
                     weights: Mapping[str, float], *, salt: str,
                     default: float = 1.0,
                     copy_col: str = "copy") -> DataFrame:
    """Domain-mixture resampling: each domain's rows are emitted
    ``floor(w)`` times plus one more for the deterministic fraction-of-
    the-hash-space slice (w = 2.5 -> every row twice, half the rows a
    third time) — the up/down-weighting step that turns raw corpus
    proportions into a training mixture ("2 epochs of wiki, 0.25 of
    crawl").

    Decisions are a pure function of (id, salt): repartitions and
    retries reproduce the exact multiset, unlike rand()-based
    resampling. Map-side only — a literal CASE for the per-domain
    weight, ``sequence`` + ``explode`` for the copies; no join, no
    shuffle. Output rows carry ``copy_col`` in [1, n_copies] so the
    result is a well-defined multiset (and hash-comparable)."""
    b = hash_bucket(F.col(id_col), salt)
    w10k = None
    for k, w in weights.items():
        lim = F.lit(int(round(w * BUCKETS)))
        cond = F.col(domain_col) == k
        w10k = F.when(cond, lim) if w10k is None else w10k.when(cond, lim)
    dflt = F.lit(int(round(default * BUCKETS)))
    w10k = w10k.otherwise(dflt) if w10k is not None else dflt
    n_copies = ((w10k / BUCKETS).cast("long")
                + F.when(b < w10k % BUCKETS, F.lit(1)).otherwise(F.lit(0)))
    return (df.withColumn("__n", n_copies)
            .filter(F.col("__n") >= 1)
            .withColumn(copy_col,
                        F.explode(F.sequence(F.lit(1).cast("long"),
                                             F.col("__n"))))
            .drop("__n"))
