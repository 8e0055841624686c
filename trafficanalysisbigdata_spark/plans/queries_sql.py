"""Shared-dialect SQL queries: ONE ANSI string is both the Spark plan
(``spark.sql``) and the DuckDB oracle — no translation layer, so the check
is that two independent engines agree on the same text. This is the
``spark.sql`` half of the engine surface (SURVEY §3.4); everything else in
``plans/`` exercises the DataFrame half.

Dialect discipline that makes single-sourcing work: decimal casts BEFORE
arithmetic, DATE literals, no engine-specific functions — and keep decimal
products well under precision 38: a (18,6)×(19,6) product hits DuckDB's cap
and silently degrades its SUM to order-dependent double accumulation
(observed as a 1e-9 tail diverging from Spark's exact decimal sum), while
(12,2)×(5,2) stays decimal end to end in both engines.
"""

from __future__ import annotations

from .registry import register_sql

register_sql(
    "sql1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("sql", "agg", "tpch"),
    tables=("lineitem",),
    doc="TPC-H Q1 shape via spark.sql — the identical text is the oracle. "
    "Catalyst plans it as scan(pushdown on l_shipdate) → partial/final "
    "hash aggregate; decimal-first arithmetic keeps both engines exact.",
)

register_sql(
    "sql2_exists_big_spenders",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 200000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("sql", "subquery", "semi"),
    tables=("customer", "orders"),
    doc="Correlated EXISTS via spark.sql — Catalyst rewrites it to a left "
    "semi join (only join keys shuffle), the J3 shape expressed as SQL.",
)

register_sql(
    "sql3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1995-03-15'
      AND l_shipdate > DATE '1995-03-15'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("sql", "join", "topk", "tpch"),
    tables=("customer", "orders", "lineitem"),
    doc="TPC-H Q3 shape via spark.sql — segment-filtered customer dim "
    "(broadcast) against orders⋈lineitem with date predicates pushed to "
    "both fact scans, decimal-exact revenue, deterministic top-10 "
    "(revenue DESC, l_orderkey tie-break makes LIMIT stable across "
    "engines). Catalyst runs the LIMIT as TakeOrderedAndProject.",
)

register_sql(
    "sql4_order_priority_check",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1995-01-01'
      AND o.o_orderdate < DATE '1995-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("sql", "subquery", "semi", "tpch"),
    tables=("orders", "lineitem"),
    doc="TPC-H Q4 shape via spark.sql — correlated EXISTS with a "
    "non-equi conjunct (l_shipdate > o_orderdate): Catalyst still plans a "
    "left semi join on l_orderkey carrying the date comparison as the "
    "join condition, with the quarter filter pushed to the orders scan.",
)

register_sql(
    "sql5_nation_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume_dec) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume_dec
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE n1.n_name < n2.n_name
        AND l.l_shipdate >= DATE '1995-01-01'
        AND l.l_shipdate < DATE '1997-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("sql", "join", "tpch"),
    tables=("supplier", "lineitem", "orders", "customer", "nation"),
    doc="TPC-H Q7 shape via spark.sql — the five-way join tree (two fact "
    "hops + three dims) with an inter-nation inequality and a pushed "
    "two-year ship-date range; both nation dims broadcast (one physical "
    "table read twice), revenue decimal-exact per (supp, cust, year) cell. "
    "The canonical join-reorder stressor: Catalyst must keep the dims on "
    "the build side while the lineitem⋈orders spine shuffles.",
)

register_sql(
    "sql6_large_volume_customers",
    """
    SELECT c.c_name, o.o_orderkey,
           CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS o_orderdate,
           CAST(agg.total_qty AS DOUBLE) AS total_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
    ) agg ON agg.l_orderkey = o.o_orderkey
    ORDER BY total_qty DESC, o.o_orderkey
    LIMIT 20
    """,
    tags=("sql", "having", "tpch"),
    tables=("orders", "customer", "lineitem"),
    doc="TPC-H Q18 shape via spark.sql — the HAVING-filtered aggregate "
    "subquery (orders whose total quantity clears a bar) joined back to "
    "orders + customer, deterministic top-20 (qty DESC, orderkey "
    "tie-break) as TakeOrderedAndProject. The aggregate subquery reduces "
    "lineitem to one row per qualifying order BEFORE any wide join — the "
    "pre-aggregation-before-join rule as a canonical query.",
)

register_sql(
    "sql7_promo_revenue_share",
    """
    SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS ship_year,
           CAST(EXTRACT(MONTH FROM l_shipdate) AS INT) AS ship_month,
           ROUND(100.0
                 * COALESCE(CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l_discount AS DECIMAL(4,2))) END)
                     AS DOUBLE), 0.0)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
                 6) AS promo_share_pct,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS total_revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY CAST(EXTRACT(YEAR FROM l_shipdate) AS INT),
             CAST(EXTRACT(MONTH FROM l_shipdate) AS INT)
    ORDER BY ship_year, ship_month
    """,
    tags=("sql", "join", "tpch"),
    tables=("lineitem", "part"),
    doc="TPC-H Q14 shape via spark.sql — promo revenue share per ship "
    "month: conditional aggregation (CASE inside SUM, no ELSE so non-promo "
    "rows fall out as NULLs) over a part-dim join with a pushed one-year "
    "ship-date range. Numerator and denominator aggregate decimal-exact, "
    "then ONE double division + round on both engines — the ratio is "
    "computed from identical doubles, so it is IEEE-identical.",
)

register_sql(
    "sql8_region_market_share",
    """
    SELECT l_year,
           ROUND(COALESCE(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                        THEN volume_dec END) AS DOUBLE), 0.0)
                 / CAST(SUM(volume_dec) AS DOUBLE), 6) AS mkt_share,
           CAST(SUM(volume_dec) AS DOUBLE) AS total_volume
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS l_year,
             n1.n_name AS supp_nation,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume_dec
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      WHERE r.r_name = 'ASIA'
    ) all_sales
    GROUP BY l_year
    ORDER BY l_year
    """,
    tags=("sql", "join", "share", "tpch"),
    tables=("lineitem", "orders", "supplier", "customer", "nation", "region"),
    doc="TPC-H Q8 shape via spark.sql — one supplier nation's share of a "
    "region's yearly order volume: a seven-relation join tree where every "
    "dim (supplier, customer, both nation roles, region) broadcasts and "
    "only the lineitem-orders spine shuffles; the region filter prunes "
    "through customer->nation->region before the spine join. Share = "
    "conditional decimal sum / total decimal sum, divided once in double.",
)

register_sql(
    "sql9_returned_item_customers",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= DATE '1995-10-01'
      AND o.o_orderdate < DATE '1996-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("sql", "join", "topk", "tpch"),
    tables=("customer", "orders", "lineitem", "nation"),
    doc="TPC-H Q10 shape via spark.sql — top-20 customers by revenue lost "
    "to returns in a quarter: returnflag + order-date ranges push to the "
    "scans, nation broadcasts, and the deterministic top-20 (revenue DESC, "
    "custkey tie-break) plans as TakeOrderedAndProject over the grouped "
    "join — the 'who do we call first' operational report at any scale.",
)

register_sql(
    "sql10_disjunctive_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 5 AND l_quantity <= 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 10 AND l_quantity <= 50)
    """,
    tags=("sql", "disjunctive", "tpch"),
    tables=("lineitem", "part"),
    doc="TPC-H Q19 shape via spark.sql — the OR-of-ANDs predicate that "
    "stresses disjunctive pushdown: Catalyst factors the cross-relation "
    "disjunction so each side still prunes (part scans with the brand/size "
    "disjunction pushed, lineitem with the quantity envelope), instead of "
    "evaluating the whole predicate post-join. The plan guard asserts the "
    "part-side scan carries pushed Or filters.",
)

register_sql(
    "sql11_dormant_rich_customers",
    """
    WITH bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
    FROM customer c, bal
    WHERE c.c_acctbal > bal.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("sql", "anti", "subquery", "tpch"),
    tables=("customer", "orders"),
    doc="TPC-H Q22 shape via spark.sql — customers with above-average "
    "balances and NO orders (the dormant-capital report): a scalar "
    "aggregate subquery (broadcast single row; the average is computed "
    "from an exact decimal sum divided once in double, so the threshold "
    "is engine-identical) plus NOT EXISTS planned as a left ANTI join on "
    "the order keys — never a per-customer probe.",
)

register_sql(
    "sql12_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    tags=("sql", "join", "tpch"),
    tables=("customer", "orders", "lineitem", "supplier", "nation", "region"),
    doc="TPC-H Q5 shape via spark.sql — LOCAL supplier volume: the join "
    "CYCLE (supplier joins lineitem on s_suppkey AND customer on "
    "s_nationkey = c_nationkey) that breaks naive left-deep planning: the "
    "nationkey equality must ride the supplier join as a second conjunct, "
    "not a post-join filter, or the join explodes before pruning. Region "
    "filter prunes nation->supplier/customer; one-year date range pushed.",
)

register_sql(
    "sql13_small_quantity_revenue",
    """
    SELECT COUNT(*) AS n_small,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*)) AS qty_bar
      FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND l.l_quantity < a.qty_bar
    """,
    tags=("sql", "subquery", "decorrelated", "tpch"),
    tables=("lineitem", "part"),
    doc="TPC-H Q17 shape via spark.sql — revenue from SMALL orders: each "
    "lineitem compares against 0.2x its part's average quantity. Written "
    "(and planned) as the DECORRELATED form: one pre-aggregation of "
    "lineitem per part joined back, instead of a correlated scalar "
    "subquery evaluated per row — the rewrite that turns O(rows x parts) "
    "into two scans + one join. The per-part bar divides an exact decimal "
    "sum once in double, so the threshold is engine-identical.",
)

register_sql(
    "sql14_top_revenue_supplier",
    """
    WITH srev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    ), mx AS (
      SELECT MAX(rev_dec) AS best FROM srev
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(srev.rev_dec AS DOUBLE) AS total_revenue
    FROM srev JOIN mx ON srev.rev_dec = mx.best
    JOIN supplier s ON s.s_suppkey = srev.l_suppkey
    ORDER BY s.s_suppkey
    """,
    tags=("sql", "argmax", "tpch"),
    tables=("lineitem", "supplier"),
    doc="TPC-H Q15 shape via spark.sql — top revenue supplier(s) for a "
    "quarter: the view-plus-global-max argmax. The max is a one-row "
    "aggregate joined back against the per-supplier rollup (broadcast), "
    "never a global sort; ties surface as multiple rows (exact decimal "
    "revenue makes tie detection deterministic), ordered by suppkey.",
)


register_sql(
    "sql15_order_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    tags=("sql", "outer-join", "distribution", "tpch"),
    tables=("customer", "orders"),
    doc="TPC-H Q13 shape via spark.sql (order filter adapted to the fixture "
    "schema: o_orderpriority stands in for the o_comment anti-pattern). "
    "The defining trick is the filter living in the LEFT JOIN's ON clause — "
    "in WHERE it would silently drop zero-order customers, which are the "
    "c_count=0 bucket the distribution exists to show. Catalyst plans a "
    "shuffled left outer join (both sides big), then two partial/final "
    "aggs; (custdist DESC, c_count DESC) is a total order because c_count "
    "is unique per output row.",
)

register_sql(
    "sql16_dominant_part_suppliers",
    """
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
          AND l.l_shipdate >= DATE '1996-01-01'
          AND l.l_shipdate < DATE '1997-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,6))) >
          (SELECT CAST(0.3 AS DECIMAL(3,2))
                  * SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
           FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey
             AND l2.l_shipdate >= DATE '1996-01-01'
             AND l2.l_shipdate < DATE '1997-01-01'))
    ORDER BY s_name
    """,
    tags=("sql", "subquery", "correlated-agg", "tpch"),
    tables=("supplier", "nation", "lineitem", "part"),
    doc="TPC-H Q20 shape via spark.sql (partsupp availability adapted to "
    "the fixture schema: a supplier qualifies when it shipped > 30% of a "
    "small-part's windowed volume — the same nested IN + correlated scalar "
    "aggregate Catalyst must decorrelate). The correlated HAVING subquery "
    "rewrites to a per-part total agg joined back on the grouping key "
    "(the Q17 decorrelation applied inside an IN); the part IN-list is a "
    "semi join pushed below the grouping; decimal x decimal keeps the 30% "
    "threshold exact on both engines.",
)

register_sql(
    "sql17_waiting_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
    """,
    tags=("sql", "exists", "anti", "self-join", "tpch"),
    tables=("supplier", "nation", "lineitem", "orders"),
    doc="TPC-H Q21 shape via spark.sql — the hardest decorrelation in the "
    "suite: FOUR accesses to lineitem (base + correlated EXISTS + "
    "correlated NOT EXISTS), adapted to the fixture schema "
    "(l_returnflag='R' stands in for receipt-after-commit lateness). "
    "Catalyst plans the EXISTS as a left semi and the NOT EXISTS as a "
    "left anti join, both shuffled on l_orderkey so all three lineitem "
    "sides co-partition on one exchange family; the non-equi "
    "l_suppkey <> conjunct rides the join condition. Deterministic top-20 "
    "via the unique s_name tie-break.",
)

register_sql(
    "sql18_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tags=("sql", "agg", "tpch"),
    tables=("lineitem",),
    doc="TPC-H Q6 via spark.sql — the pure scan-filter-aggregate shape: "
    "every predicate pushes into the parquet scan (range on l_shipdate, "
    "band on l_discount, bound on l_quantity), then one partial/final agg "
    "of a decimal product — the simplest query in the suite and the "
    "sharpest pushdown check: any filter left above the scan is 100x the "
    "I/O at 100 TB. Double literals compare bit-identically on both "
    "engines (same parquet doubles, same IEEE literals); the summed "
    "product is decimal-exact.",
)

register_sql(
    "sql19_late_shipment_priority",
    """
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_shipdate > o_orderdate + INTERVAL '60' DAY
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("sql", "join", "pivot", "tpch"),
    tables=("orders", "lineitem"),
    doc="TPC-H Q12 shape via spark.sql, adapted to the fixture schema "
    "(no l_shipmode/l_commitdate/l_receiptdate: l_returnflag stands in "
    "for the shipmode grouping and ship-more-than-60-days-after-order "
    "for receipt-after-commit lateness). The shape under test is the "
    "fact-fact equi-join carrying a non-equi date conjunct plus the "
    "two-way conditional-aggregation pivot; the ship-year range pushes "
    "to the lineitem scan, the interval comparison rides the join.",
)

register_sql(
    "sql20_product_type_profit",
    """
    SELECT nation, o_year, CAST(SUM(amount_dec) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
               - CAST(0.6 AS DECIMAL(2,1))
                 * CAST(p.p_retailprice AS DECIMAL(12,2))
                 * CAST(l.l_quantity AS DECIMAL(8,2)) AS amount_dec
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("sql", "join", "agg", "tpch"),
    tables=("lineitem", "part", "supplier", "nation", "orders"),
    doc="TPC-H Q9 shape via spark.sql (no partsupp/ps_supplycost in the "
    "fixture: cost is modeled as 60% of p_retailprice per unit, which "
    "preserves the shape — a five-relation join tree with a LIKE-filtered "
    "part dim, per-(nation, order-year) profit rollup). Catalyst "
    "broadcasts part/supplier/nation, shuffles the two fact joins on "
    "their keys, and pushes the LIKE into the part scan; the profit "
    "expression stays decimal end to end (max precision 23 < DuckDB's 38 "
    "SUM cap).",
)

register_sql(
    "sql21_important_part_values",
    """
    WITH partvals AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_quantity AS DECIMAL(8,2))
                 * CAST(p.p_retailprice AS DECIMAL(12,2))) AS value_dec
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM partvals
    WHERE CAST(value_dec AS DOUBLE) >
          2.0 * (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM partvals)
              / (SELECT COUNT(*) FROM partvals)
    ORDER BY part_value DESC, l_partkey
    """,
    tags=("sql", "subquery", "scalar-agg", "tpch"),
    tables=("lineitem", "part", "supplier", "nation"),
    doc="TPC-H Q11 shape via spark.sql (no partsupp: per-part inventory "
    "value is modeled as shipped quantity x retail price for suppliers of "
    "one nation). The shape under test: one grouped CTE consumed THREE "
    "times — as the row source and inside two uncorrelated scalar "
    "aggregate subqueries setting the importance threshold. Catalyst "
    "evaluates each scalar subquery once (one-row broadcasts) rather than "
    "per row. The threshold is 2x the MEAN part value rather than Q11's "
    "fixed fraction of the total: per-part lineitem fan-out is "
    "SF-invariant in the fixtures, so a mean-relative bar keeps a stable "
    "~9% qualifying tail at every SF where a fixed share-of-total empties "
    "as the part count grows. The compared doubles derive from exact "
    "decimal sums, so the cut is engine-identical.",
)

register_sql(
    "sql22_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 1000)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("sql", "distinct-agg", "anti", "tpch"),
    tables=("part", "lineitem", "supplier"),
    doc="TPC-H Q16 shape via spark.sql (no partsupp: lineitem's "
    "(l_partkey, l_suppkey) pairs are the part-supplier relation; "
    "low-balance suppliers stand in for the complaints exclusion). The "
    "shape: a NOT IN over a non-null key column (Catalyst plans a left "
    "anti join — null-safe machinery elided because s_suppkey is "
    "provably non-null), a multi-filtered dim join, and COUNT(DISTINCT) "
    "per group (planned as the two-phase distinct-expand aggregate). "
    "Fully deterministic ordering via the complete grouping key.",
)

register_sql(
    "sql23_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             ROUND(MIN(l_extendedprice / l_quantity), 6) AS unit_cost
      FROM lineitem
      WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    )
    SELECT CAST(s.s_acctbal AS DOUBLE) AS s_acctbal, s.s_name, n.n_name,
           p.p_partkey, p.p_type, ps.unit_cost
    FROM part p
    JOIN ps ON ps.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size <= 25 AND p.p_type = 'SMALL' AND r.r_name = 'ASIA'
      AND ps.unit_cost = (SELECT MIN(ps2.unit_cost)
                          FROM ps ps2
                          JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
                          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
                          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
                          WHERE ps2.l_partkey = p.p_partkey
                            AND r2.r_name = 'ASIA')
    ORDER BY s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 10
    """,
    tags=("sql", "subquery", "correlated-min", "tpch"),
    tables=("lineitem", "part", "supplier", "nation", "region"),
    doc="TPC-H Q2 shape via spark.sql (no partsupp: the per-(part, "
    "supplier) minimum observed unit price from lineitem is the supply "
    "cost). The last of the 22 TPC-H planner shapes in the suite: a "
    "correlated scalar MIN subquery over the same join tree as the outer "
    "query (part-correlated, region-filtered) — Catalyst decorrelates it "
    "into a per-part min aggregate joined back on p_partkey, reusing the "
    "CTE; dims broadcast, the ps relation shuffles once on l_partkey. "
    "ROUND(...,6) on the unit cost makes the MIN-equality engine-exact; "
    "top-10 is fully tie-broken.",
)
