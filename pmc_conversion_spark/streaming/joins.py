"""Stream-stream joins (Structured Streaming).

The reference correlates files across drops batch-wise; the streaming
generalization — correlate two live event streams within a bounded time
distance — is the canonical Structured Streaming interval join: both
sides watermarked, equality key + event-time range condition. The
watermarks bound the join state store (Spark evicts buffered rows once
they can no longer match), which is what makes the operator runnable
indefinitely at scale; an unwatermarked stream-stream join grows state
without bound and is refused for append mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(left: DataFrame, right: DataFrame, *, on: str,
                         left_ts: str, right_ts: str, lower: str,
                         upper: str = "0 seconds",
                         watermark: str = "1 hour",
                         how: str = "inner") -> DataFrame:
    """Watermarked stream-stream interval join.

    Same observable semantics as
    :func:`pmc_conversion_spark.operators.temporal.interval_join` (its
    batch twin, which carries the DuckDB oracle): pairs with equal
    ``on`` and ``left_ts - lower <= right_ts <= left_ts + upper``.
    Right columns colliding with left names are prefixed ``r_``.

    ``how='leftOuter'`` emits a null-padded row for each unmatched
    left event once the watermark passes its match window — the batch
    fixpoint is the registered ``stream_left_outer_interval`` query.
    Outer stream-stream joins REQUIRE both watermarks plus the
    event-time range in the condition; Spark rejects them otherwise
    because unmatched-row emission is driven by state eviction.

    Both inputs must be streaming DataFrames. The watermark must be at
    least the interval width or matches are dropped as late.
    """
    lw = left.withWatermark(left_ts, watermark)
    r = right
    for c in right.columns:
        if c in left.columns:
            r = r.withColumnRenamed(c, f"r_{c}")
    r_on = f"r_{on}" if on in right.columns else on
    r_ts = f"r_{right_ts}" if right_ts in left.columns else right_ts
    rw = r.withWatermark(r_ts, watermark)
    cond = ((F.col(on) == F.col(r_on))
            & (F.col(r_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
            & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")))
    return lw.join(rw, cond, how).drop(r_on)
