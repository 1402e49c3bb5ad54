"""Registry: the remaining TPC-H query shapes, one text for two engines.

The reference's analytic surface is batch SQL over a star schema
(``luigi-pipeline/main.py`` drives staging tables that downstream
tranSMART SQL queries consume); SURVEY §2 therefore counts the classic
decision-support query shapes as required coverage. Rounds 1-4 landed
Q1/Q3/Q4/Q5/Q8/Q12/Q15/Q18; this module completes the family with the
remaining shapes — Q2 (correlated min-cost lookup), Q6 (pure
filter+agg), Q7 (bi-directional nation pairing), Q9 (profit with a
negative term), Q10 (returned-item top-k), Q11 (global-fraction
HAVING), Q13 (outer-join count distribution), Q14 (conditional share),
Q16 (NOT IN + count distinct), Q17 (correlated avg threshold), Q19
(OR-of-ANDs join predicate), Q20 (nested semi-join), Q21
(EXISTS/NOT EXISTS multi-self-join), Q22 (scalar-avg anti-join).

The driver testdata is a REDUCED TPC-H (no partsupp, no comment/phone/
address/commitdate columns), so partsupp-dependent shapes derive their
supply relation from lineitem (supply cost = min unit price observed;
stock value = shipped quantity x retail price) and text predicates use
the columns that exist. The SHAPE — and therefore the Catalyst plan
family being exercised (decorrelation, semi/anti joins, scalar
subqueries, disjunctive pushdown) — is preserved.

Determinism policy (same as queries/quality.py): every float-summing
aggregate runs over ``DECIMAL(18,2)`` casts so partial aggregation is
order-insensitive and exact on both engines; doubles appear only in a
final handful of ops, rounded at the output boundary. min/avg over
integer-valued doubles are exact as-is. Identical SQL text runs on
Spark and DuckDB, so the oracle is the query itself.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pmc_conversion_spark import tables
from pmc_conversion_spark.queries import register


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    tables.register_views(spark, sf_dir)
    return spark.sql(text)


_VOL = ("CAST(l.l_extendedprice AS DECIMAL(18,2)) "
        "* (1 - CAST(l.l_discount AS DECIMAL(18,2)))")


# --------------------------------------------------------------- Q6
_FORECAST_REVENUE_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("sql_forecast_revenue", oracle=_FORECAST_REVENUE_SQL)
def sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shaped pure-SQL entry: the what-if revenue delta of dropping
    small discounts — a SINGLE-table filter+agg whose entire cost is
    the scan, which makes it the predicate-pushdown benchmark: all
    three filters (date range, discount band, quantity cap) reach the
    parquet reader as PushedFilters, and the aggregate partial-combines
    map-side so the exchange carries one row per task. Decimal products
    keep the sum exact on both engines."""
    return _sql(spark, sf_dir, _FORECAST_REVENUE_SQL)


# --------------------------------------------------------------- Q7
_VOLUME_SHIPPING_SQL = f"""
SELECT ns.n_name AS supp_nation,
       nc.n_name AS cust_nation,
       EXTRACT(year FROM l.l_shipdate) AS l_year,
       CAST(SUM({_VOL}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o    ON o.o_orderkey  = l.l_orderkey
JOIN supplier s  ON s.s_suppkey   = l.l_suppkey
JOIN customer c  ON c.c_custkey   = o.o_custkey
JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY ns.n_name, nc.n_name, EXTRACT(year FROM l.l_shipdate)
"""


@register("sql_volume_shipping", oracle=_VOLUME_SHIPPING_SQL)
def sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped pure-SQL entry: trade volume between two nations in
    BOTH directions — the nation dimension joins twice under different
    roles and the symmetric disjunction over the pair can't be pushed
    into either single join, so the optimizer must keep it as a join
    filter while still broadcasting both tiny nation sides. Yearly
    decimal revenue; lineitem shuffles once into the 3-key agg."""
    return _sql(spark, sf_dir, _VOLUME_SHIPPING_SQL)


# --------------------------------------------------------------- Q9
_PRODUCT_PROFIT_SQL = """
SELECT n.n_name AS nation,
       EXTRACT(year FROM o.o_orderdate) AS o_year,
       round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                      - CAST(0.6 AS DECIMAL(2,1))
                        * CAST(p.p_retailprice AS DECIMAL(12,2))
                        * CAST(l.l_quantity AS DECIMAL(4,0)))
                  AS DOUBLE), 2) AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey  = l.l_partkey
JOIN supplier s ON s.s_suppkey  = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
"""


@register("sql_product_profit", oracle=_PRODUCT_PROFIT_SQL)
def sql_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped pure-SQL entry: profit per supplier-nation per year
    for one product family — revenue MINUS a cost term (supply cost
    modeled as 60% of retail price, the partsupp-free adaptation), so
    the summand can go negative and the aggregate can't be reordered
    into separate positive sums without the decimal exactness this
    text pins. The %gear% infix predicate is non-sargable — it filters
    after the part scan, and Catalyst still prunes part to the two
    columns used. Five tables, one lineitem shuffle."""
    return _sql(spark, sf_dir, _PRODUCT_PROFIT_SQL)


# --------------------------------------------------------------- Q10
_RETURNED_ITEMS_SQL = f"""
WITH rev AS (
  SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         SUM({_VOL}) AS revenue_x
  FROM customer c
  JOIN orders o   ON o.o_custkey  = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n   ON n.n_nationkey = c.c_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
)
SELECT c_custkey, c_name, CAST(revenue_x AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM rev
ORDER BY revenue_x DESC, c_custkey
LIMIT 20
"""


@register("sql_returned_items", oracle=_RETURNED_ITEMS_SQL)
def sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped pure-SQL entry: the quarter's top-20 customers by
    RETURNED revenue — the support-ticket triage query. Group on the
    full customer tuple (no re-join needed after the agg), then a
    global top-k that Spark plans as TakeOrderedAndProject: each
    partition ships only its local top 20, never the full grouped
    frame. Ordering on the EXACT decimal revenue with a custkey
    tie-break makes the cut deterministic on both engines; the double
    appears only in the projected output."""
    return _sql(spark, sf_dir, _RETURNED_ITEMS_SQL)


# --------------------------------------------------------------- Q11
_IMPORTANT_STOCK_SQL = """
WITH val AS (
  SELECT l.l_partkey AS partkey,
         SUM(CAST(l.l_quantity AS DECIMAL(4,0))
             * CAST(p.p_retailprice AS DECIMAL(12,2))) AS v
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey  = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  JOIN part p     ON p.p_partkey  = l.l_partkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
)
SELECT partkey, CAST(v AS DOUBLE) AS value
FROM val
WHERE v > (SELECT SUM(v) * 0.001 FROM val)
"""


@register("sql_important_stock", oracle=_IMPORTANT_STOCK_SQL)
def sql_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped pure-SQL entry: parts whose stock value (shipped
    quantity x retail price through one nation's suppliers — the
    partsupp-free adaptation) exceeds a FRACTION OF THE GLOBAL TOTAL.
    The scalar subquery over the same CTE is the shape that punishes
    naive engines with a rescan; Catalyst evaluates the CTE once per
    reference but the threshold side collapses to a one-row broadcast,
    so the filter is a map-side compare, not a join. Decimal values
    make the > boundary partitioning-independent."""
    return _sql(spark, sf_dir, _IMPORTANT_STOCK_SQL)


# --------------------------------------------------------------- Q13
_CUST_DISTRIBUTION_SQL = """
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
"""


@register("sql_cust_distribution", oracle=_CUST_DISTRIBUTION_SQL)
def sql_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped pure-SQL entry: the distribution of customers by
    order count INCLUDING the zero bucket — which forces a LEFT OUTER
    join with the filter in the JOIN CONDITION (in WHERE it would
    silently delete the zero-order customers: the classic outer-join
    bug this query exists to catch). COUNT(column) counting only
    matched rows is the second semantic pin. Two cascaded aggregates,
    each partial-combining; the histogram is at most a few dozen
    rows."""
    return _sql(spark, sf_dir, _CUST_DISTRIBUTION_SQL)


# --------------------------------------------------------------- Q14
_PROMO_EFFECT_SQL = f"""
SELECT round(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                   THEN {_VOL} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_VOL}) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


@register("sql_promo_effect", oracle=_PROMO_EFFECT_SQL)
def sql_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped pure-SQL entry: the month's PROMO share of revenue —
    a conditional-sum ratio computed in ONE pass (never two queries
    diffed): both sums ride the same scan and partial-agg, the CASE
    costs nothing JVM-side, and the division happens once on exact
    decimal totals. The date range prunes lineitem at the reader."""
    return _sql(spark, sf_dir, _PROMO_EFFECT_SQL)


# --------------------------------------------------------------- Q16
_PARTS_SUPPLIER_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_type NOT IN ('PROMO', 'ECONOMY')
  AND p.p_size IN (1, 4, 7, 14, 23, 36, 45, 50)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register("sql_parts_supplier", oracle=_PARTS_SUPPLIER_SQL)
def sql_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped pure-SQL entry: how many distinct suppliers can ship
    each surviving (brand, type, size) — supplier diversity for the
    sourcing team. NOT IN over a non-nullable key column plans as a
    broadcast anti-join (no null-trap here; the trap variant is
    registered separately as sql_not_in_null_trap), and COUNT(DISTINCT)
    expands to a two-phase aggregate so the distinct set never
    concentrates on one node. All part predicates prune before the
    fact join."""
    return _sql(spark, sf_dir, _PARTS_SUPPLIER_SQL)


# --------------------------------------------------------------- Q17
_SMALL_QTY_REVENUE_SQL = """
SELECT round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
             AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                      FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
"""


@register("sql_small_qty_revenue", oracle=_SMALL_QTY_REVENUE_SQL)
def sql_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped pure-SQL entry: revenue locked in small-quantity
    orders of one brand — the CORRELATED AVERAGE threshold. Catalyst
    decorrelates the per-part average into an aggregate + join instead
    of re-running it per row (the O(N·M) -> O(N+M) rewrite this shape
    exists to verify). Quantities are integer-valued doubles, so the
    average is exact under any summation order; the revenue sum is
    decimal; one double division at the boundary."""
    return _sql(spark, sf_dir, _SMALL_QTY_REVENUE_SQL)


# --------------------------------------------------------------- Q19
_DISJUNCT_REVENUE_SQL = f"""
SELECT CAST(SUM({_VOL}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("sql_disjunct_revenue", oracle=_DISJUNCT_REVENUE_SQL)
def sql_disjunct_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped pure-SQL entry: revenue under an OR-of-ANDs mixing
    columns from BOTH join sides — the disjunctive-predicate planning
    test. A good optimizer derives the IMPLIED single-side filters
    (p_brand IN (...) AND p_size <= 15; l_quantity <= 30) and pushes
    them below the join so neither side scans full, while the exact
    disjunction stays as a post-join filter; Catalyst's constraint
    propagation does exactly this (visible as PushedFilters on both
    scans). Decimal revenue, one row out."""
    return _sql(spark, sf_dir, _DISJUNCT_REVENUE_SQL)


# --------------------------------------------------------------- Q20
_PROMO_CANDIDATES_SQL = """
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'blue%'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING SUM(l.l_quantity) > 100
)
"""


@register("sql_promo_candidates", oracle=_PROMO_CANDIDATES_SQL)
def sql_promo_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped pure-SQL entry: suppliers who moved real volume of
    the promoted family (>100 units of some blue part) — an IN
    subquery whose inner side is itself a join + grouped HAVING.
    Plans as aggregate -> distinct suppkeys -> LEFT SEMI join into
    supplier: the supplier table is never multiplied by its lineitem
    fan-out, which is the entire point of semi-join planning at scale.
    The 'blue%' prefix LIKE is sargable and prunes part first."""
    return _sql(spark, sf_dir, _PROMO_CANDIDATES_SQL)


# --------------------------------------------------------------- Q21
_WAITING_SUPPLIERS_SQL = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END)
           AS n_late_supp
  FROM late
  GROUP BY l_orderkey
)
SELECT s.s_name, COUNT(*) AS numwait
FROM late l1
JOIN per_order po ON po.l_orderkey = l1.l_orderkey
JOIN supplier s   ON s.s_suppkey   = l1.l_suppkey
WHERE l1.is_late = 1
  AND po.n_supp > 1
  AND po.n_late_supp = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
"""


@register("sql_waiting_suppliers", oracle=_WAITING_SUPPLIERS_SQL)
def sql_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped pure-SQL entry: suppliers SOLELY responsible for
    late multi-supplier orders ('late' = shipped >90 days after order
    date — the commitdate-free adaptation). The textbook form is a
    double EXISTS / NOT EXISTS self-join on lineitem; this text is the
    scale-correct REWRITE of that same semantics: one pass computes
    per-order supplier and late-supplier counts, and the two EXISTS
    become cheap integer predicates on the re-join — O(lineitem)
    instead of two extra self-joins. Deterministic top-20 via the
    exact count with a name tie-break."""
    return _sql(spark, sf_dir, _WAITING_SUPPLIERS_SQL)


# --------------------------------------------------------------- Q22
_GLOBAL_SALES_OPP_SQL = """
WITH pool AS (
  SELECT c_custkey, c_custkey % 7 AS cntrycode,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer
  WHERE c_custkey % 7 IN (0, 1, 2)
), thresh AS (
  SELECT CAST(SUM(bal) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM pool
  WHERE bal > 0
)
SELECT p.cntrycode, COUNT(*) AS numcust,
       round(CAST(SUM(p.bal) AS DOUBLE), 2) AS totacctbal
FROM pool p, thresh t
WHERE p.bal > t.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = p.c_custkey
                    AND o.o_orderdate >=
                        TIMESTAMP '1999-01-01 00:00:00')
GROUP BY p.cntrycode
"""


@register("sql_global_sales_opp", oracle=_GLOBAL_SALES_OPP_SQL)
def sql_global_sales_opp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped pure-SQL entry: rich customers with no RECENT order
    (nothing since 1999), bucketed by country code (custkey mod 7 —
    the phone-prefix-free adaptation). Three planning shapes in one text: a scalar-average
    subquery (one-row broadcast, computed from an EXACT decimal sum so
    the > boundary can't flip with partitioning), a NOT EXISTS that
    plans as a LEFT ANTI join against orders, and a final grouped
    decimal sum. The anti-join probes only the filtered pool, not all
    of customer."""
    return _sql(spark, sf_dir, _GLOBAL_SALES_OPP_SQL)


# --------------------------------------------------------------- Q2
_MIN_COST_SUPPLIER_SQL = """
WITH uc AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT p.p_partkey, p.p_brand, e.s_name, e.n_name,
       round(u.cost, 4) AS cost
FROM part p
JOIN uc u ON u.partkey  = p.p_partkey
JOIN eu e ON e.s_suppkey = u.suppkey
WHERE p.p_size BETWEEN 10 AND 30 AND p.p_type = 'LARGE'
  AND u.cost = (SELECT MIN(u2.cost)
                FROM uc u2
                JOIN eu e2 ON e2.s_suppkey = u2.suppkey
                WHERE u2.partkey = p.p_partkey)
"""


@register("sql_min_cost_supplier", oracle=_MIN_COST_SUPPLIER_SQL)
def sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped pure-SQL entry: for each qualifying part, the
    EUROPEAN supplier offering it cheapest (supply cost = best unit
    price observed in lineitem — the partsupp-free adaptation). The
    correlated MIN subquery is the canonical decorrelation test:
    Catalyst rewrites it to a per-part min aggregate joined back, so
    the 'cheapest per group' lookup costs one extra agg+join, not a
    per-row rescan. MIN over identical IEEE doubles is
    order-insensitive, so the equality match is engine-stable;
    rounding happens only in the projection."""
    return _sql(spark, sf_dir, _MIN_COST_SUPPLIER_SQL)


# ------------------------------------------------ deterministic output
_ORDER_BY_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@register("sql_order_by_all", oracle=_ORDER_BY_ALL_SQL)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL — the deterministic-report idiom
    (every non-aggregate column groups, every output column orders)
    added in Spark 4 and long native in DuckDB, so ONE text runs on
    both engines. ORDER BY ALL makes the output a total order without
    naming columns — the property that turns a report query into a
    diffable artifact. The sort is a tiny post-agg exchange (status x
    priority = 15 groups), so 'deterministic' costs nothing here."""
    return _sql(spark, sf_dir, _ORDER_BY_ALL_SQL)


# ------------------------------------------------ SQL scripting (4.0+)
_SCRIPTING_SQL = """
BEGIN
  DECLARE thr DOUBLE DEFAULT 100.0;
  DECLARE cnt BIGINT DEFAULT 0;
  SET cnt = (SELECT count(*) FROM orders WHERE o_totalprice > thr);
  WHILE cnt >= 100 DO
    SET thr = thr * 2;
    SET cnt = (SELECT count(*) FROM orders WHERE o_totalprice > thr);
  END WHILE;
  SELECT thr AS threshold, cnt AS n_above;
END
"""

_SCRIPTING_ORACLE = """
WITH steps AS (
  SELECT 100.0 * power(2, t.j) AS thr
  FROM unnest(range(0, 24)) AS t(j)
),
counts AS (
  SELECT thr,
         (SELECT count(*) FROM orders o
          WHERE o.o_totalprice > s.thr) AS n
  FROM steps s
)
SELECT thr AS threshold, CAST(n AS BIGINT) AS n_above
FROM counts WHERE n < 100 ORDER BY thr LIMIT 1
"""


@register("sql_scripting_control_flow", oracle=_SCRIPTING_ORACLE)
def sql_scripting_control_flow(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4's BEGIN/END procedural blocks): DECLARE
    variables, scalar-subquery SETs, and a WHILE loop that doubles a
    price threshold until fewer than 100 orders exceed it — the
    migration target for stored-procedure logic that previously needed
    a driver-side Python loop. Each loop iteration is a full
    distributed count (the script only sequences JOBS, it never pulls
    data to the driver); the oracle states the same fixpoint
    closed-form over the doubling sequence. Exponentially shrinking
    counts bound the iterations at log2(maxprice/100)."""
    tables.register_views(spark, sf_dir)
    return spark.sql(_SCRIPTING_SQL)


# ------------------------------------------- parameterized SQL (3.4+)
_PARAM_ORACLE = """
SELECT o_orderstatus, count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_totalprice > 1000.0
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderstatus
"""


@register("sql_parameterized_query", oracle=_PARAM_ORACLE)
def sql_parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (``spark.sql(text, args={...})``): the
    query text carries ``:cutoff_date`` / ``:min_price`` /
    ``:priorities`` markers and values bind server-side as TYPED
    literals — the injection-safe form every templated report should
    use instead of f-string SQL (a malicious value cannot terminate
    the string and append clauses, because it never enters the text).
    Parameters land in Catalyst BEFORE optimization, so constant
    folding and parquet pushdown see them exactly like inline
    literals — zero plan cost for the safety. The oracle is the same
    query with the values inlined."""
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total
        FROM orders
        WHERE o_orderdate >= :cutoff_date
          AND o_totalprice > :min_price
          AND o_orderpriority IN (:p1, :p2)
        GROUP BY o_orderstatus
        """,
        args={
            "cutoff_date": datetime.datetime(1996, 1, 1),
            "min_price": 1000.0,
            "p1": "1-URGENT",
            "p2": "2-HIGH",
        })


# ------------------------------------------------ IDENTIFIER (3.5+)
_IDENTIFIER_ORACLE = """
SELECT o_orderstatus AS grp, count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderstatus
"""


@register("sql_identifier_clause", oracle=_IDENTIFIER_ORACLE)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IDENTIFIER() clause: table AND column names arrive as bound
    PARAMETERS (``IDENTIFIER(:tbl)``, ``IDENTIFIER(:grp_col)``) —
    the safe form of dynamic SQL that multi-tenant report templates
    need ('same query, per-tenant table/column') without f-string
    identifier splicing, which no value-parameter API can protect.
    The identifier is validated as a NAME at parse time (a value like
    'orders; DROP ...' fails to resolve instead of executing).
    Catalyst sees an ordinary resolved reference, so pruning/pushdown
    are unchanged; the oracle is the resolved static query."""
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp_col) AS grp, count(*) AS n,
               CAST(SUM(CAST(IDENTIFIER(:price_col) AS DECIMAL(18,2)))
                    AS DOUBLE) AS total
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:grp_col)
        """,
        args={"tbl": "orders", "grp_col": "o_orderstatus",
              "price_col": "o_totalprice"})


# ------------------------------------------- pandas API on Spark
_PANDAS_API_ORACLE = """
SELECT o_orderstatus AS status, count(*) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS total
FROM orders GROUP BY o_orderstatus
"""


@register("api_pandas_on_spark", oracle=_PANDAS_API_ORACLE)
def api_pandas_on_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas API on Spark (``pyspark.pandas``): the same grouped
    aggregate written as a pandas idiom — assign a derived column,
    groupby().agg(), reset_index — executing as DISTRIBUTED Spark
    plans underneath (no driver materialization; .to_spark() hands
    back the lazy frame). This is the migration surface for
    pandas-notebook code hitting 100 TB: the idioms survive, the
    single-machine ceiling doesn't. Determinism: the summed column is
    integer cents (exact under any partial-agg order), converted to
    dollars at the boundary; the default distributed index is never
    exposed."""
    import pyspark.pandas as ps

    ps.set_option("compute.default_index_type", "distributed")
    orders = tables.load(spark, sf_dir, "orders")
    pdf = orders.select("o_orderstatus", "o_totalprice").pandas_api()
    pdf = pdf.assign(
        cents=(pdf["o_totalprice"] * 100).round(0).astype("int64"))
    out = (pdf.groupby("o_orderstatus")
           .agg(n=("cents", "count"), cents_total=("cents", "sum"))
           .reset_index())
    sdf = out.to_spark()
    return sdf.select(F.col("o_orderstatus").alias("status"),
                      F.col("n").cast("bigint").alias("n"),
                      (F.col("cents_total").cast("double") / 100.0)
                      .alias("total"))


# ------------------------------------------- Arrow interchange (4.0+)
_ARROW_INTERCHANGE_ORACLE = """
SELECT n_regionkey AS region, count(*) AS n,
       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
FROM nation GROUP BY n_regionkey
"""


@register("api_arrow_interchange", oracle=_ARROW_INTERCHANGE_ORACLE)
def api_arrow_interchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow interchange surface (Spark 4's ``DataFrame.toArrow``
    + ``createDataFrame(pyarrow.Table)``): a BOUNDED aggregate leaves
    the JVM as a zero-copy pyarrow Table, is transformed with a
    pyarrow compute kernel, and re-enters as a DataFrame — the
    integration contract with the Arrow ecosystem (polars, duckdb,
    pandas 2.x share this memory layout, so this pair of calls is the
    bridge to ALL of them without a CSV in sight). Driver-side by
    design, so the rule stands: collect only dimension-sized frames —
    the aggregate runs distributed, only its 5-row result crosses."""
    import pyarrow.compute as pc

    nation = tables.load(spark, sf_dir, "nation")
    agg = (nation.groupBy(F.col("n_regionkey").alias("region"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("n_nationkey").alias("key_sum_raw")))
    t = agg.toArrow()
    t = t.append_column("key_sum",
                        pc.cast(t.column("key_sum_raw"), "int64"))
    t = t.drop_columns(["key_sum_raw"])
    back = spark.createDataFrame(t)
    return back.select("region", "n", "key_sum")


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_quantity > 10
    GROUP BY l_returnflag, l_linestatus
    """)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL PIPE SYNTAX (`FROM t |> WHERE ... |>
    AGGREGATE ... GROUP BY ...`) — the linear query dialect
    (SIGMOD'24 'SQL Has Problems. We Can Fix Them' / ZetaSQL pipes)
    that reads top-to-bottom like a DataFrame chain and lands in
    Spark 4 as a first-class parser mode. Same Catalyst plan as the
    nested form — this op pins that the dialect parses AND that its
    plan hits the identical partial-agg shape (the oracle states the
    classic syntax). Exact integer cent sums; filter pushed to the
    scan like any WHERE."""
    tables.register_views(spark, sf_dir)
    return spark.sql("""
        FROM lineitem
        |> WHERE l_quantity > 10
        |> AGGREGATE count(*) AS n_lines,
                     CAST(sum(CAST(round(l_extendedprice * 100)
                              AS BIGINT)) AS BIGINT) AS revenue_cents
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_lines, revenue_cents
    """)


@register(
    "sql_lateral_view_outer",
    oracle="""
    WITH d AS (
      SELECT lang,
             CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(lower(text)), '\\s+')
             END AS toks
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(toks)) AS BIGINT) AS n_token_rows,
           CAST(sum(CASE WHEN len(toks) = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_rows,
           CAST(sum(greatest(len(toks), 1)) AS BIGINT) AS n_rows_total
    FROM d GROUP BY lang
    """)
def sql_lateral_view_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HiveQL's ``LATERAL VIEW OUTER explode`` — the OUTER variant
    preserves rows whose array is EMPTY as a single null-element row
    instead of dropping the document entirely: the difference between
    'tokenize the corpus' and 'silently lose every empty document'
    (plain LATERAL VIEW/explode drops them — the classic audit-count
    mismatch). This pins the Hive-compat SQL surface next to the
    DataFrame explode_outer; the oracle restates the row-accounting
    identity (total rows = token rows + one null row per empty doc).
    Still one explode + partial agg — OUTER costs nothing."""
    tables.register_views(spark, sf_dir)
    return spark.sql("""
        SELECT lang,
               count(DISTINCT doc_id) AS n_docs,
               CAST(count(tok) AS BIGINT) AS n_token_rows,
               CAST(count_if(tok IS NULL) AS BIGINT) AS n_null_rows,
               CAST(count(*) AS BIGINT) AS n_rows_total
        FROM (
          SELECT doc_id, lang, tok
          FROM (SELECT doc_id, lang,
                       CASE WHEN trim(text) = '' THEN array()
                            ELSE split(trim(lower(text)), '\\\\s+')
                       END AS toks
                FROM documents)
          LATERAL VIEW OUTER explode(toks) t AS tok
        )
        GROUP BY lang
    """)


@register(
    "api_sql_udf_scalar",
    oracle="""
    SELECT l_returnflag AS returnflag,
           round(sum(l_extendedprice * (1 - l_discount)
                     * (1 + l_tax)), 2) AS charged,
           round(sum(CASE WHEN l_discount > 0.05
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE l_extendedprice END), 2) AS net_promo
    FROM lineitem GROUP BY 1
    """)
def api_sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCALAR UDFs (Spark 4 `CREATE FUNCTION … RETURNS … RETURN
    expr`) — named, reusable business logic that stays ENTIRELY inside
    Catalyst: the function body is inlined into the calling plan at
    analysis time, so `charged_price` and `promo_net` below cost
    exactly what the hand-written expression costs — whole-stage
    codegen, pushdown, the lot. This is the governance surface a
    platform team wants at 100 TB: one blessed revenue definition,
    zero UDF serialization tax (contrast every Python-UDF path, which
    exits the JVM). The oracle states the inlined algebra directly —
    which is also a check that inlining preserves semantics."""
    tables.register_views(spark, sf_dir)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION charged_price(
            p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE
        RETURN p * (1 - d) * (1 + t)
    """)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION promo_net(
            p DOUBLE, d DOUBLE) RETURNS DOUBLE
        RETURN CASE WHEN d > 0.05 THEN p * (1 - d) ELSE p END
    """)
    return spark.sql("""
        SELECT l_returnflag AS returnflag,
               round(sum(charged_price(l_extendedprice, l_discount,
                                       l_tax)), 2) AS charged,
               round(sum(promo_net(l_extendedprice, l_discount)), 2)
                 AS net_promo
        FROM lineitem GROUP BY l_returnflag
    """)


@register(
    "api_sql_table_function",
    oracle="""
    WITH buckets AS (
      SELECT unnest(range(0, 4)) AS q
    ),
    o AS (
      SELECT quarter(o_orderdate) - 1 AS q, o_totalprice
      FROM orders WHERE o_orderdate >= DATE '1997-01-01'
    )
    SELECT CAST(b.q + 1 AS INT) AS quarter,
           CAST(count(o.q) AS BIGINT) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS revenue
    FROM buckets b LEFT JOIN o ON o.q = b.q
    GROUP BY b.q
    """)
def api_sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TABLE functions (Spark 4 `CREATE FUNCTION … RETURNS TABLE`)
    — set-returning SQL UDFs usable directly in FROM, here generating
    the dense quarter spine that a zero-fill report joins against
    (the generator side of the gen_calendar_dim pattern, but packaged
    as a reusable catalog object instead of inline code). Like scalar
    SQL UDFs the body inlines into the calling plan — the spine is a
    4-row local relation, the join broadcasts, and the orders side
    keeps its pushed filter; nothing about the UDF indirection costs
    a byte of shuffle. Demonstrates the missing-quarter case staying
    present with zero revenue (LEFT join from the spine)."""
    tables.register_views(spark, sf_dir)
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION quarter_spine()
        RETURNS TABLE(q INT)
        RETURN SELECT explode(sequence(0, 3)) AS q
    """)
    return spark.sql("""
        SELECT CAST(b.q + 1 AS INT) AS quarter,
               CAST(count(o.q) AS BIGINT) AS n_orders,
               round(coalesce(sum(o.o_totalprice), 0), 2) AS revenue
        FROM quarter_spine() b
        LEFT JOIN (
          SELECT quarter(o_orderdate) - 1 AS q, o_totalprice
          FROM orders WHERE o_orderdate >= DATE '1997-01-01'
        ) o ON o.q = b.q
        GROUP BY b.q
    """)


@register(
    "sql_within_group",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(percentile_cont(0.5)
                 WITHIN GROUP (ORDER BY o_totalprice), 4) AS median,
           round(percentile_cont(0.9)
                 WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90,
           round(percentile_disc(0.25)
                 WITHIN GROUP (ORDER BY o_totalprice), 2) AS q1_disc
    FROM orders GROUP BY o_orderpriority
    """)
def sql_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ORDERED-SET AGGREGATES — `percentile_cont / percentile_disc
    … WITHIN GROUP (ORDER BY …)` (Spark 3.4+/4 syntax, same spelling
    in DuckDB): the standard's inverse-distribution functions, exact
    by definition (cont = linear interpolation between the straddling
    order statistics, disc = first value whose cumulative distribution
    reaches p). Exercised per order priority so each group's sort is
    key-partitioned. `mode()` is deliberately left out: its tie-break
    is engine-arbitrary, so no oracle could pin it. Both engines
    select the SAME order statistics and interpolate with the same
    arithmetic, so 4/2-dp rounds are pure formatting."""
    tables.register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               round(percentile_cont(0.5)
                     WITHIN GROUP (ORDER BY o_totalprice), 4) AS median,
               round(percentile_cont(0.9)
                     WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90,
               round(percentile_disc(0.25)
                     WITHIN GROUP (ORDER BY o_totalprice), 2) AS q1_disc
        FROM orders GROUP BY o_orderpriority
    """)
