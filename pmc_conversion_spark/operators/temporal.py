"""Temporal join operators: as-of, interval, and range-bin joins.

The reference's micro-batch jobs never join on time, but any
registry/event pipeline at scale needs them (latest-observation-before-
cutoff, event-to-era assignment, stream-stream correlation). None of
these is a built-in Spark join, so each is re-expressed as a
composition whose physical plan stays an equi-join:

- :func:`asof_join` — the union+window trick: one shuffle on the key,
  no inequality join, no candidate explosion. This is the plan that
  survives 100×; a ``t2.ts <= t1.ts`` theta-join would be a
  BroadcastNestedLoop (or a per-key cross product) at scale.
- :func:`range_bin_join` — interval dimension × fact timestamp, binned
  to a calendar granularity so the physical join is an equi-join on the
  bin; the exact bound check is a cheap post-join filter.
- :func:`interval_join` — equality key + bounded time distance. The
  equi-key keeps the physical plan a hash join; the range condition
  prunes after. Its streaming twin (two watermarked streams) lives in
  ``pmc_conversion_spark.streaming``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *, on: str,
              left_ts: str, right_ts: str,
              right_cols: Sequence[str],
              tolerance: str | None = None,
              direction: str = "backward") -> DataFrame:
    """Left as-of join: for every left row, the single most recent right
    row with ``right.ts <= left.ts`` for the same key (inclusive) —
    or, with ``direction="forward"``, the single earliest right row
    with ``right.ts >= left.ts``.

    Plan: tag both inputs, union them, and run one window per key
    ordered by (ts, side, right-row id); ``last(payload, ignorenulls)``
    over the growing frame carries the latest right payload forward to
    each left row. ONE shuffle total (the window partitioning), data
    volume |L|+|R| — never the |L|×|R| candidate set of the naive
    inequality join. Window ordering makes ties deterministic: at equal
    ts the right row sorts first (so same-instant matches are taken),
    and among equal-ts right rows the highest ordering column wins.

    ``right_cols`` must include ``right_ts``; matched columns keep
    their names, so they must not collide with left columns.
    ``tolerance`` (an INTERVAL literal body, e.g. ``'10 minutes'``)
    turns matches older than ``left_ts - tolerance`` (forward: newer
    than ``left_ts + tolerance``) into nulls — evaluated per-row after
    the window, not as a join condition.

    Forward ties mirror backward: at equal ts the right row is still
    taken (same-instant match), and among equal-ts right rows the
    LOWEST ordering column wins (backward: the highest) — the frame
    flips to (current, unbounded following) with ``first`` instead of
    ``last``, same single shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    forward = direction == "forward"
    if right_ts not in right_cols:
        raise ValueError("right_cols must include right_ts")
    left_cols = left.columns
    payload = F.struct(*[F.col(c) for c in right_cols])
    payload_t = right.select(payload.alias("__r")).schema["__r"].dataType
    ord_candidate = next((c for c in right_cols if c != right_ts), None)
    if ord_candidate is not None:
        ord_t = right.schema[ord_candidate].dataType.simpleString()
        if ord_t not in ("tinyint", "smallint", "int", "bigint",
                         "long", "integer"):
            # a non-castable tie column would cast to null and silently
            # make equal-ts picks partitioning-dependent
            raise ValueError(
                f"as-of tie column {ord_candidate!r} must be integral, "
                f"got {ord_t}")

    # ordering puts the right side adjacent to equal-ts left rows on
    # the frame side that can see it: before the left row for backward
    # (right=0 < left=1), after it for forward (left=0 < right=1)
    l_tag, r_tag = (0, 1) if forward else (1, 0)
    l_side = left.select(
        F.col(on).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(l_tag).alias("__side"),
        F.lit(None).cast("long").alias("__rord"),
        *[F.col(c) for c in left_cols if c != on],
        F.lit(None).cast(payload_t).alias("__r"))
    # right ordering column: the first non-ts payload column if any
    # (unique row ids make equal-ts picks deterministic); with only the
    # ts in the payload, equal-ts right rows are interchangeable
    rord = (F.col(ord_candidate).cast("long") if ord_candidate is not None
            else F.lit(0).cast("long"))
    r_side = right.select(
        F.col(on).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(r_tag).alias("__side"),
        rord.alias("__rord"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c != on],
        payload.alias("__r"))

    w = Window.partitionBy("__k").orderBy("__ts", "__side", "__rord")
    if forward:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first("__r", ignorenulls=True).over(w)
    else:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last("__r", ignorenulls=True).over(w)
    matched = (l_side.unionByName(r_side)
               .withColumn("__m", pick)
               .filter(F.col("__side") == l_tag))
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        in_tol = (F.col("__m")[right_ts] <= F.col("__ts") + bound) \
            if forward else \
            (F.col("__m")[right_ts] >= F.col("__ts") - bound)
        ok = F.col("__m").isNotNull() & in_tol
        matched = matched.withColumn(
            "__m", F.when(ok, F.col("__m")))
    out = [F.col("__k").alias(on)]
    out += [F.col(c) for c in left_cols if c != on]
    out += [F.col("__m").getField(c).alias(c) for c in right_cols]
    return matched.select(*out)


def range_bin_join_outer(facts: DataFrame, dims: DataFrame, *,
                         time_col: str, start_col: str, end_col: str,
                         granularity: str = "month") -> DataFrame:
    """LEFT-outer flavor of :func:`range_bin_join`: facts matching no
    interval survive with null dim columns.

    The inner bin join cannot express this directly (a bin-matched row
    that fails the exact bounds must be re-admitted as unmatched), so
    the outer form composes inner + left-anti: both arms share the
    fact scan and the broadcast bin frame, and the anti arm is the
    same broadcast equi-join shape — still no nested loop anywhere.
    """
    inner = range_bin_join(facts, dims, time_col=time_col,
                           start_col=start_col, end_col=end_col,
                           granularity=granularity)
    matched_cols = [c for c in inner.columns if c not in facts.columns]
    # facts with NO matching interval: left-anti on the same bin join,
    # then exact-bound probe — a fact fails iff no exploded bin row
    # both bin-matches and bound-matches it
    bins = dims.withColumn("__bin", F.explode(F.expr(
        f"sequence(date_trunc('{granularity}', {start_col}), "
        f"date_trunc('{granularity}', {end_col}), "
        f"interval 1 {granularity})")))
    fact_binned = facts.withColumn(
        "__bin", F.date_trunc(granularity, F.col(time_col)))
    cond = ((fact_binned["__bin"] == bins["__bin"])
            & (F.col(time_col) >= F.col(start_col))
            & (F.col(time_col) <= F.col(end_col)))
    unmatched = (fact_binned.join(F.broadcast(bins), cond, "left_anti")
                 .drop("__bin"))
    for c in matched_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(inner.schema[c].dataType))
    return inner.unionByName(unmatched.select(*inner.columns))


def asof_nearest_join(left: DataFrame, right: DataFrame, *, on: str,
                      left_ts: str, right_ts: str,
                      right_cols: Sequence[str]) -> DataFrame:
    """Nearest-in-either-direction as-of join: for every left row, the
    single right row with the same key whose timestamp is CLOSEST to
    the left timestamp, before or after.

    Tie contract (total, partitioning-independent): equal distances
    prefer the backward (<=) match; among equal-ts right rows both
    directions take the minimum ordering column (the first non-ts
    right column, required integral like :func:`asof_join`).

    Plan: same union+window shape as :func:`asof_join` but both
    directions resolve in ONE pass — the backward candidate is a
    ``max`` of (ts, -ord, payload) structs over the growing frame, the
    forward candidate a ``min`` of (ts, ord, payload) structs over the
    shrinking frame; struct ordering is lexicographic, so the
    aggregates ARE the tie rules. Both windows share one partitioning
    and one sort: ONE shuffle total, |L|+|R| rows, never a candidate
    explosion. Left rows whose key has no right rows are dropped
    (inner semantics). Equal-ts rights sort before the left row, so
    the backward frame sees same-instant matches; the forward frame
    misses them, which is harmless — distance 0 always wins backward.
    """
    if right_ts not in right_cols:
        raise ValueError("right_cols must include right_ts")
    ord_candidate = next((c for c in right_cols if c != right_ts), None)
    if ord_candidate is None:
        raise ValueError("right_cols needs a non-ts ordering column")
    ord_t = right.schema[ord_candidate].dataType.simpleString()
    if ord_t not in ("tinyint", "smallint", "int", "bigint",
                     "long", "integer"):
        raise ValueError(
            f"as-of tie column {ord_candidate!r} must be integral, "
            f"got {ord_t}")
    left_cols = left.columns
    payload = F.struct(*[F.col(c) for c in right_cols])
    payload_t = right.select(payload.alias("__r")).schema["__r"].dataType
    rord = F.col(ord_candidate).cast("long")

    l_side = left.select(
        F.col(on).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__rord"),
        *[F.col(c) for c in left_cols if c != on],
        F.lit(None).cast(payload_t).alias("__r"))
    r_side = right.select(
        F.col(on).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rord.alias("__rord"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c != on],
        payload.alias("__r"))

    base = Window.partitionBy("__k").orderBy("__ts", "__side", "__rord")
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    r_struct_back = F.when(
        F.col("__side") == 0,
        F.struct(F.col("__ts").alias("t"), (-F.col("__rord")).alias("o"),
                 F.col("__r").alias("r")))
    r_struct_fwd = F.when(
        F.col("__side") == 0,
        F.struct(F.col("__ts").alias("t"), F.col("__rord").alias("o"),
                 F.col("__r").alias("r")))
    u = (l_side.unionByName(r_side)
         .withColumn("__b", F.max(r_struct_back).over(w_back))
         .withColumn("__f", F.min(r_struct_fwd).over(w_fwd))
         .filter(F.col("__side") == 1))
    back_d = F.col("__ts") - F.col("__b")["t"]
    fwd_d = F.col("__f")["t"] - F.col("__ts")
    chosen = F.when(
        F.col("__b").isNotNull()
        & (F.col("__f").isNull() | (back_d <= fwd_d)),
        F.col("__b")["r"]).otherwise(F.col("__f")["r"])
    out = [F.col("__k").alias(on)]
    out += [F.col(c) for c in left_cols if c != on]
    out += [F.col("__m").getField(c).alias(c) for c in right_cols]
    return (u.withColumn("__m", chosen)
            .filter(F.col("__m").isNotNull())
            .select(*out))


def range_bin_join(facts: DataFrame, dims: DataFrame, *, time_col: str,
                   start_col: str, end_col: str,
                   granularity: str = "month") -> DataFrame:
    """Inner-join facts to interval dimensions (``start <= t <= end``,
    closed bounds like SQL BETWEEN) without an inequality join.

    The dimension explodes into one row per covered calendar bin
    (tiny: |dims| × span/granularity); the fact side gets its bin with
    a map-side ``date_trunc``. The physical join is a broadcast
    equi-join on the bin, and the exact bound check is a post-join
    filter — the big side never feeds a nested-loop join, which is what
    Spark would otherwise plan for a pure range predicate. Inner
    semantics only: an outer variant would have to re-admit bin-matched
    rows that fail the exact bounds, which the post-filter shape cannot
    express — callers wanting "facts without an era" anti-join the
    result back against the facts.
    """
    bins = dims.withColumn("__bin", F.explode(F.expr(
        f"sequence(date_trunc('{granularity}', {start_col}), "
        f"date_trunc('{granularity}', {end_col}), "
        f"interval 1 {granularity})")))
    fact_binned = facts.withColumn(
        "__bin", F.date_trunc(granularity, F.col(time_col)))
    cond: Column = ((F.col(time_col) >= F.col(start_col))
                    & (F.col(time_col) <= F.col(end_col)))
    return (fact_binned.join(F.broadcast(bins), "__bin", "inner")
            .filter(cond)
            .drop("__bin"))


def interval_overlap_join(small: DataFrame, big: DataFrame, *,
                          small_start: str, small_end: str,
                          big_start: str, big_end: str,
                          granularity: str = "month") -> DataFrame:
    """Overlap join of two interval sets (closed [start, end] bounds):
    every (small, big) pair whose intervals intersect, with no key to
    equi-join on — executed as a broadcast equi-join on calendar bins,
    never a BroadcastNestedLoopJoin.

    Both sides explode to their covered bins; a pair shares at least
    one bin iff the intervals overlap at that granularity. Each
    overlapping pair is emitted EXACTLY once — not once per shared bin
    — by keeping only the match at the canonical bin, the bin of the
    overlap's first day (``greatest(starts)`` is inside both
    intervals, so its bin is always among the shared ones). No
    de-duplication pass, so multiset semantics survive inputs with
    repeated rows. The big side's intervals should be short relative
    to the bin (shipping windows, sessions) to keep its explode factor
    ~1-2×; the broadcast side may span arbitrarily many bins."""
    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn("__bin", F.explode(F.expr(
            f"sequence(date_trunc('{granularity}', {start}), "
            f"date_trunc('{granularity}', {end}), "
            f"interval 1 {granularity})")))

    sb = binned(small, small_start, small_end)
    bb = binned(big, big_start, big_end)
    cond: Column = ((F.col(small_start) <= F.col(big_end))
                    & (F.col(big_start) <= F.col(small_end))
                    & (F.col("__bin") == F.date_trunc(
                        granularity,
                        F.greatest(F.col(small_start), F.col(big_start)))))
    return (bb.join(F.broadcast(sb), "__bin", "inner")
            .filter(cond)
            .drop("__bin"))


def interval_join(left: DataFrame, right: DataFrame, *, on: str,
                  left_ts: str, right_ts: str, lower: str,
                  upper: str = "0 seconds") -> DataFrame:
    """Equality-key interval join: pairs where ``left_ts - lower <=
    right_ts <= left_ts + upper`` for the same key.

    The equality key keeps the physical plan a shuffled hash join (one
    shuffle per side on ``on``); the time-distance condition is applied
    with the join so rows outside the interval never materialize. This
    is the batch semantics of the Structured Streaming stream-stream
    interval join (both sides watermarked); the streaming twin is
    :func:`pmc_conversion_spark.streaming.joins.stream_interval_join`.
    """
    lcols = [F.col(c) for c in left.columns]
    r = right
    for c in right.columns:
        if c in left.columns:
            r = r.withColumnRenamed(c, f"r_{c}")
    r_on = f"r_{on}" if on in right.columns else on
    r_ts = f"r_{right_ts}" if right_ts in left.columns else right_ts
    cond = ((F.col(on) == F.col(r_on))
            & (F.col(r_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
            & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")))
    return left.join(r, cond, "inner").drop(r_on)
