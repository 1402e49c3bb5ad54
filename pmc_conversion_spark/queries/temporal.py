"""Registry: temporal join operators (as-of, range-bin, interval).

Beyond-the-reference operators a large-scale event pipeline needs
(SURVEY.md §2.11 spirit): each is a Spark-lacking join re-expressed so
the physical plan stays an equi-join — the DuckDB oracle states the
naive (inequality-join) semantics and the engines must agree exactly.
Tie-breaking is part of each operator's contract so results are
deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pmc_conversion_spark import tables
from pmc_conversion_spark.operators.temporal import (asof_join,
                                                     asof_nearest_join,
                                                     interval_join,
                                                     interval_overlap_join,
                                                     range_bin_join,
                                                     range_bin_join_outer)
from pmc_conversion_spark.queries import register
from pmc_conversion_spark.queries.manifest import _values, fixture_df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "events")


@register(
    "join_asof",
    oracle="""
    WITH p AS (SELECT user_id, event_id AS p_event_id, ts AS p_ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, event_id AS c_event_id, ts AS c_ts
          FROM events WHERE event_type = 'click'),
    m AS (SELECT p.p_event_id, c.c_event_id, c.c_ts,
                 row_number() OVER (PARTITION BY p.p_event_id
                                    ORDER BY c.c_ts DESC,
                                             c.c_event_id DESC) AS rn
          FROM p JOIN c ON c.user_id = p.user_id AND c.c_ts <= p.p_ts)
    SELECT p.user_id, p.p_event_id, p.p_ts, m.c_event_id, m.c_ts
    FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
      USING (p_event_id)
    """)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the most recent click by the same
    user at or before the purchase instant (ties broken by highest
    event_id — part of the contract).

    The oracle is the naive inequality join + rank; the engine plan is
    the union+window form (operators/temporal.py): ONE shuffle on
    user_id over |purchases|+|clicks| rows — never the |P|×|C|
    candidate set, which is what makes it the 100 TB plan."""
    e = _events(spark, sf_dir)
    purch = (e.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("event_id").alias("p_event_id"),
                     F.col("ts").alias("p_ts")))
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("c_event_id"),
                      F.col("ts").alias("c_ts")))
    return asof_join(purch, clicks, on="user_id", left_ts="p_ts",
                     right_ts="c_ts", right_cols=["c_event_id", "c_ts"])


#: pricing-era interval dimension (closed [start, end] date bounds,
#: non-overlapping, covering the whole o_orderdate range)
PRICING_ERAS = [
    ("launch", "1995-01-01", "1996-06-30"),
    ("growth", "1996-07-01", "1997-12-31"),
    ("steady", "1998-01-01", "1999-09-30"),
    ("bubble", "1999-10-01", "2000-12-31"),
    ("bust", "2001-01-01", "2001-12-31"),
]


@register(
    "join_range_interval",
    oracle=f"""
    SELECT era, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    JOIN {_values(PRICING_ERAS, 'era, start_d, end_d')}
      ON CAST(o_orderdate AS DATE)
         BETWEEN CAST(start_d AS DATE) AND CAST(end_d AS DATE)
    GROUP BY era
    """)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join of orders into interval dimensions, executed as a
    month-binned broadcast equi-join (operators/temporal.py) — the big
    side never feeds the BroadcastNestedLoop Spark would plan for a raw
    BETWEEN predicate."""
    orders = (tables.load(spark, sf_dir, "orders")
              .select(F.to_date("o_orderdate").alias("o_date"),
                      "o_totalprice"))
    eras = fixture_df(spark, PRICING_ERAS,
                      "era string, start_d string, end_d string").select(
        "era", F.to_date("start_d").alias("start_d"),
        F.to_date("end_d").alias("end_d"))
    joined = range_bin_join(orders, eras, time_col="o_date",
                            start_col="start_d", end_col="end_d")
    return (joined.groupBy("era")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                 .cast("double").alias("total_price")))


@register(
    "join_range_interval_outer",
    oracle=f"""
    WITH eras AS (SELECT * FROM {_values(
        [e for e in PRICING_ERAS if e[0] != 'steady'],
        'era, start_d, end_d')})
    SELECT e.era, count(*) AS n_orders
    FROM orders o
    LEFT JOIN eras e
      ON CAST(o.o_orderdate AS DATE)
         BETWEEN CAST(e.start_d AS DATE) AND CAST(e.end_d AS DATE)
    GROUP BY e.era
    """)
def join_range_interval_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-outer range join: orders landing in an era GAP (the
    'steady' era is removed from the dim) survive with a null era.
    Composed as inner bin-join + left-anti re-admission — both arms
    broadcast equi-joins on the calendar bin, no nested loop
    (operators/temporal.py range_bin_join_outer)."""
    orders = (tables.load(spark, sf_dir, "orders")
              .select(F.to_date("o_orderdate").alias("o_date")))
    eras = fixture_df(spark,
                      [e for e in PRICING_ERAS if e[0] != "steady"],
                      "era string, start_d string, end_d string").select(
        "era", F.to_date("start_d").alias("start_d"),
        F.to_date("end_d").alias("end_d"))
    joined = range_bin_join_outer(orders, eras, time_col="o_date",
                                  start_col="start_d", end_col="end_d")
    return joined.groupBy("era").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT user_id, event_id AS p_event_id, ts AS p_ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, event_id AS c_event_id, ts AS c_ts
          FROM events WHERE event_type = 'click'),
    cand AS (
      SELECT p.user_id, p.p_event_id, p.p_ts, c.c_event_id, c.c_ts,
             abs(epoch_us(c.c_ts) - epoch_us(p.p_ts)) AS d,
             CASE WHEN c.c_ts <= p.p_ts THEN 0 ELSE 1 END AS side
      FROM p JOIN c ON c.user_id = p.user_id)
    SELECT user_id, p_event_id, p_ts, c_event_id, c_ts
    FROM cand
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY user_id, p_event_id
      ORDER BY d, side, c_event_id) = 1
    """)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-click-to-purchase in EITHER direction per user, ties
    preferring the earlier (backward) click, then the lowest event id.
    One union+window pass — one shuffle, both direction candidates
    resolved by lexicographic struct min/max (operators/temporal.py
    asof_nearest_join); the oracle states the naive all-pairs ranking
    the plan must never materialize."""
    e = _events(spark, sf_dir)
    purch = (e.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("event_id").alias("p_event_id"),
                     F.col("ts").alias("p_ts")))
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("c_event_id"),
                      F.col("ts").alias("c_ts")))
    return asof_nearest_join(purch, clicks, on="user_id",
                             left_ts="p_ts", right_ts="c_ts",
                             right_cols=["c_event_id", "c_ts"])


@register(
    "join_interval_overlap",
    oracle="""
    WITH a AS (SELECT o_orderkey AS a_id,
                      CAST(o_orderdate AS DATE) AS a_start,
                      CAST(o_orderdate AS DATE) + 30 AS a_end
               FROM orders WHERE o_orderkey % 500 = 0),
    b AS (SELECT l_orderkey, l_linenumber,
                 CAST(l_shipdate AS DATE) AS b_start,
                 CAST(l_shipdate AS DATE) + (l_linenumber % 7 + 1) AS b_end
          FROM lineitem)
    SELECT a_id, l_orderkey, l_linenumber,
           date_diff('day', greatest(a_start, b_start),
                     least(a_end, b_end)) + 1 AS overlap_days
    FROM a JOIN b ON a_start <= b_end AND b_start <= a_end
    """)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join with NO equality key: sampled
    30-day order windows × every lineitem's 1-7-day shipping span.
    Executed as a month-binned broadcast equi-join + exact post-filter
    (operators/temporal.py interval_overlap_join) — a raw pairwise
    overlap predicate would plan as BroadcastNestedLoopJoin over the
    whole fact table. Output carries the overlap length in days."""
    a = (tables.load(spark, sf_dir, "orders")
         .filter(F.col("o_orderkey") % 500 == 0)
         .select(F.col("o_orderkey").alias("a_id"),
                 F.to_date("o_orderdate").alias("a_start"),
                 F.date_add(F.to_date("o_orderdate"), 30).alias("a_end")))
    b = (tables.load(spark, sf_dir, "lineitem")
         .select("l_orderkey", "l_linenumber",
                 F.to_date("l_shipdate").alias("b_start"),
                 F.date_add(F.to_date("l_shipdate"),
                            F.col("l_linenumber") % 7 + 1)
                 .alias("b_end")))
    out = interval_overlap_join(a, b, small_start="a_start",
                                small_end="a_end", big_start="b_start",
                                big_end="b_end")
    return out.select(
        "a_id", "l_orderkey", "l_linenumber",
        (F.datediff(F.least("a_end", "b_end"),
                    F.greatest("a_start", "b_start")) + 1)
        .cast("long").alias("overlap_days"))


@register(
    "stream_stream_join",
    oracle="""
    WITH p AS (SELECT user_id, event_id AS p_event_id, ts AS p_ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, event_id AS c_event_id, ts AS c_ts
          FROM events WHERE event_type = 'click')
    SELECT p.user_id, p.p_event_id, p.p_ts, c.c_event_id, c.c_ts
    FROM p JOIN c ON c.user_id = p.user_id
       AND c.c_ts >= p.p_ts - INTERVAL '1 hour'
       AND c.c_ts <= p.p_ts
    """)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: every (purchase, click-within-the-preceding-hour)
    pair per user — the batch semantics of the watermarked
    stream-stream interval join (streaming/joins.py, exercised with real
    readStream machinery in tests/test_streaming.py). The equality key
    keeps the physical plan a hash join; the time-distance condition
    prunes with the join."""
    e = _events(spark, sf_dir)
    purch = (e.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("event_id").alias("p_event_id"),
                     F.col("ts").alias("p_ts")))
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("c_event_id"),
                      F.col("ts").alias("c_ts")))
    return interval_join(purch, clicks, on="user_id", left_ts="p_ts",
                         right_ts="c_ts", lower="1 hour")


@register(
    "join_asof_forward",
    oracle="""
    WITH p AS (SELECT user_id, event_id AS p_event_id, ts AS p_ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, event_id AS c_event_id, ts AS c_ts
          FROM events WHERE event_type = 'click'),
    m AS (SELECT p.p_event_id, c.c_event_id, c.c_ts,
                 row_number() OVER (PARTITION BY p.p_event_id
                                    ORDER BY c.c_ts ASC,
                                             c.c_event_id ASC) AS rn
          FROM p JOIN c ON c.user_id = p.user_id AND c.c_ts >= p.p_ts)
    SELECT p.user_id, p.p_event_id, p.p_ts, m.c_event_id, m.c_ts
    FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
      USING (p_event_id)
    """)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for every purchase, the EARLIEST click by
    the same user at or after the purchase instant (ties broken by
    lowest event_id) — the attribution-window / next-action form of
    the as-of family. Same union+window plan as join_asof with the
    frame mirrored to (current, unbounded following): one shuffle on
    user_id over |P|+|C| rows, never the inequality candidate set the
    oracle states."""
    e = _events(spark, sf_dir)
    purch = (e.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("event_id").alias("p_event_id"),
                     F.col("ts").alias("p_ts")))
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("c_event_id"),
                      F.col("ts").alias("c_ts")))
    return asof_join(purch, clicks, on="user_id", left_ts="p_ts",
                     right_ts="c_ts", right_cols=["c_event_id", "c_ts"],
                     direction="forward")


@register(
    "join_asof_tolerance",
    oracle="""
    WITH p AS (SELECT user_id, event_id AS p_event_id, ts AS p_ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, event_id AS c_event_id, ts AS c_ts
          FROM events WHERE event_type = 'click'),
    m AS (SELECT p.p_event_id, c.c_event_id, c.c_ts,
                 row_number() OVER (PARTITION BY p.p_event_id
                                    ORDER BY c.c_ts DESC,
                                             c.c_event_id DESC) AS rn
          FROM p JOIN c ON c.user_id = p.user_id AND c.c_ts <= p.p_ts)
    SELECT p.user_id, p.p_event_id, p.p_ts,
           CASE WHEN m.c_ts >= p.p_ts - INTERVAL '30' MINUTE
                THEN m.c_event_id END AS c_event_id,
           CASE WHEN m.c_ts >= p.p_ts - INTERVAL '30' MINUTE
                THEN m.c_ts END AS c_ts
    FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
      USING (p_event_id)
    """)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS TOLERANCE: the most recent click at
    or before each purchase counts only if it is at most 30 minutes
    old — older matches are nulled while the purchase row SURVIVES
    (left-join contract). This is the attribution-window rule every
    ads/analytics pipeline enforces; without the tolerance an as-of
    join happily attributes to a click from last month. Same
    one-shuffle union+window plan as ``join_asof`` — the tolerance is
    a post-window null-out, never a second join."""
    e = _events(spark, sf_dir)
    purch = (e.filter(F.col("event_type") == "purchase")
             .select("user_id", F.col("event_id").alias("p_event_id"),
                     F.col("ts").alias("p_ts")))
    clicks = (e.filter(F.col("event_type") == "click")
              .select("user_id", F.col("event_id").alias("c_event_id"),
                      F.col("ts").alias("c_ts")))
    return asof_join(purch, clicks, on="user_id", left_ts="p_ts",
                     right_ts="c_ts", right_cols=["c_event_id", "c_ts"],
                     tolerance="'30' minute")


@register(
    "join_interval_allen",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT)
               + 300 + (event_id % 7) * 120 AS e
      FROM events
    ),
    pairs AS (
      SELECT user_id, event_id AS a_id, s AS a_s, e AS a_e,
             lead(event_id) OVER w AS b_id,
             lead(s) OVER w AS b_s,
             lead(e) OVER w AS b_e
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
    ),
    rel AS (
      SELECT user_id, a_id, b_id,
             CASE
               WHEN a_e < b_s THEN 'precedes'
               WHEN a_e = b_s THEN 'meets'
               WHEN a_s = b_s AND a_e = b_e THEN 'equals'
               WHEN a_s = b_s AND a_e < b_e THEN 'starts'
               WHEN a_s = b_s AND a_e > b_e THEN 'started_by'
               WHEN a_s < b_s AND a_e > b_e THEN 'contains'
               WHEN a_s > b_s AND a_e < b_e THEN 'during'
               WHEN a_e = b_e AND a_s < b_s THEN 'finished_by'
               WHEN a_e = b_e AND a_s > b_s THEN 'finishes'
               WHEN a_s < b_s AND a_e < b_e THEN 'overlaps'
               ELSE 'other' END AS relation
      FROM pairs WHERE b_id IS NOT NULL
    )
    SELECT relation, count(*) AS n_pairs,
           count(DISTINCT user_id) AS n_users
    FROM rel GROUP BY relation
    """)
def join_interval_allen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALLEN'S INTERVAL ALGEBRA classification — each consecutive
    pair of a user's activity intervals labeled with its Allen
    relation (precedes/meets/overlaps/starts/during/finishes/equals
    and inverses), the formal vocabulary (Allen 1983) underneath
    every temporal join this module ships: join_interval_overlap
    keeps ONE of these relations, stream_left_outer_interval another
    — this op audits the full distribution, the profiling step before
    choosing an interval-join strategy. Intervals derive
    deterministically from event times (duration varies by event id
    so every relation class is populated); pairing is a per-user lag
    window (key-partitioned, never global); classification is a
    CASE over six endpoint comparisons; output is the
    relation-class histogram."""
    e = _events(spark, sf_dir)
    sec = F.col("ts").cast("timestamp").cast("long")
    iv = e.select("user_id", "event_id", sec.alias("s"),
                  (sec + 300 + (F.col("event_id") % 7) * 120)
                  .alias("e"))
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    pairs = (iv.select("user_id",
                       F.col("event_id").alias("a_id"),
                       F.col("s").alias("a_s"), F.col("e").alias("a_e"),
                       F.lead("event_id").over(w).alias("b_id"),
                       F.lead("s").over(w).alias("b_s"),
                       F.lead("e").over(w).alias("b_e"))
             .filter(F.col("b_id").isNotNull()))
    a_s, a_e, b_s, b_e = (F.col(c) for c in ("a_s", "a_e", "b_s", "b_e"))
    relation = (
        F.when(a_e < b_s, "precedes")
        .when(a_e == b_s, "meets")
        .when((a_s == b_s) & (a_e == b_e), "equals")
        .when((a_s == b_s) & (a_e < b_e), "starts")
        .when((a_s == b_s) & (a_e > b_e), "started_by")
        .when((a_s < b_s) & (a_e > b_e), "contains")
        .when((a_s > b_s) & (a_e < b_e), "during")
        .when((a_e == b_e) & (a_s < b_s), "finished_by")
        .when((a_e == b_e) & (a_s > b_s), "finishes")
        .when((a_s < b_s) & (a_e < b_e), "overlaps")
        .otherwise("other"))
    return (pairs.withColumn("relation", relation)
            .groupBy("relation")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.countDistinct("user_id").alias("n_users")))
