"""Distributed connected components — the cluster step of near-dup
deduplication.

Pair generators (``ngram_jaccard_pairs``, ``minhash_lsh_pairs``,
``embedding_near_dup_*``) emit *edges*; corpus-level dedup needs
*components* (a doc duplicating A and B puts A, B in one cluster even
if A-B was never emitted) so one canonical document survives per
cluster.

The implementation is the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014 — public literature): each round is two groupBy-min shuffles over
the edge list, and the edge set contracts toward star graphs rooted at
each component's minimum id in O(log n) rounds even on adversarial
path graphs — unlike naive label propagation, whose round count is the
graph diameter. State per round is the edge list only (no vertex
attributes), and ``localCheckpoint`` truncates the lineage so the plan
does not grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to u's minimum neighbor.

    Emits (v, m(u)) for v in N(u), v > u, where m(u) = min(N(u) ∪ {u}).
    One symmetrize + one groupBy-min + one equi-join (the groupBy output
    is one row per node — broadcast-sized relative to the edges).
    """
    und = e.select("u", "v").union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # one row per node — same cardinality class as the edge list, so the
    # join back is a co-partitioned equi-join on u (both sides shuffle
    # on the same key), NOT a broadcast
    mins = und.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m"))
    return (und.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Within each node's smaller neighborhood, rewire everything to the
    minimum: orient edges high→low, then emit (v, m) for each low
    neighbor v plus (u, m), m = min of u's low neighborhood.
    """
    d = (e.select(F.greatest("u", "v").alias("u"),
                  F.least("u", "v").alias("v"))
         .filter(F.col("u") != F.col("v")))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    return (d.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def connected_components(edges: DataFrame, *, src: str = "src",
                         dst: str = "dst",
                         max_iter: int = 16) -> DataFrame:
    """Connected components of an undirected edge list.

    Output: (node, component) for every node that appears in an edge;
    ``component`` is the minimum node id of the component (so it is
    also a member — the natural canonical representative). Nodes with
    no edges are their own singleton components and are the caller's
    union (they never need a shuffle).

    Per round: large-star then small-star (two shuffles each), then an
    edge-set fixpoint check (one symmetric-difference job). Rounds are
    O(log n) by the published bound; ``max_iter`` is a safety rail and
    non-convergence raises rather than returning partial clusters.
    """
    def ckpt_fingerprint(df: DataFrame) -> tuple[DataFrame, tuple]:
        # fingerprint = (count, order-insensitive hash-sum): one cheap
        # aggregate instead of two exceptAll jobs per round; a collision
        # is astronomically unlikely, and the stars are idempotent at
        # the fixpoint so one phantom extra round could not change the
        # result anyway. decimal(38,0) accumulator: a plain long sum
        # overflows under ANSI mode (hash values span int64).
        # r9 (guide §1.2): the aggregate rides the checkpoint
        # materialization as an ``observe`` metric, so the per-round
        # fingerprint job (a full scan of the edge frame) disappears.
        from pmc_conversion_spark.util import checkpoint_observed
        d, m = checkpoint_observed(
            df, n=F.count(F.lit(1)),
            h=F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")))
        return d, (m["n"], m["h"])

    e, fp = ckpt_fingerprint(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct())
    for _ in range(max_iter):
        e, fp2 = ckpt_fingerprint(_small_star(_large_star(e)))
        if fp2 == fp:
            break
        fp = fp2
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    # converged edge set is a star forest: u -> component root (= min id)
    return (e.select(F.col("u").alias("node"), F.col("v").alias("component"))
            .union(e.select(F.col("v").alias("node"),
                            F.col("v").alias("component")))
            .distinct())
