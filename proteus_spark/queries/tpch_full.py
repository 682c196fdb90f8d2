"""TPC-H completion pack: the 12 queries the extension pack left out.

Together with sqlsurface.py (q1/3/4/5/6/10/12/14/18/19) this makes all 22
TPC-H query *shapes* oracle-checked. The driver schema has no partsupp
table and no commitdate/receiptdate/shipmode/phone/comment columns, so
each query is adapted — but every adaptation preserves the original plan
shape (the thing that matters for the 100 TB scale argument):

- q2   correlated-min scalar subquery over a part-supplier association
- q7   two-nation volume join with OR'd nation pairs + year rollup
- q8   market-share ratio (conditional sum / total sum) per year
- q9   profit by nation x year with LIKE-filtered part dimension
- q11  group value vs global-total scalar subquery (CTE read twice)
- q13  LEFT OUTER join with ON-clause filter + double aggregation
- q15  max-revenue scalar subquery over a revenue CTE
- q16  distinct-supplier counting with null-aware NOT IN anti-join
- q17  per-part average threshold (decorrelated, division-free exact form)
- q20  IN-subquery with aggregate+HAVING -> semi join
- q21  EXISTS / NOT EXISTS self-joins on the fact table
- q22  global-average scalar threshold + anti-join + substring-group

All shared-dialect SQL (registry.register_sql): the same text runs on
Spark and DuckDB. Money math in DECIMAL (bit-exact across engines);
final ratios/divisions in DOUBLE rounded to 6 (decimal division scale
rules differ across engines); integer aggregates cast to BIGINT.

Reference context: dvasilas/proteus's parser accepts none of these
shapes (internal/sqlparser/sqlparse.go:102-124 — single-table SELECT
only; joins rejected at sqlparse.go:188-197). SURVEY §2.2-2.4 directs
the engine to expose the full Spark SQL surface since Catalyst provides
it free; this module pins down the hard 40% of that surface: correlated
subqueries, scalar subqueries, null-aware anti joins, and self-joins.
"""

from __future__ import annotations

from proteus_spark.registry import register_sql

DISC_PRICE = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


register_sql(
    "tpch_q2",
    """
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type
    FROM part
      JOIN ps ON p_partkey = ps.partkey
      JOIN supplier ON s_suppkey = ps.suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND supplycost = (
        SELECT min(ps2.supplycost)
        FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q2 min-cost-supplier shape (partsupp replaced by the "
    "lineitem-derived part-supplier association, supplycost by the min "
    "observed price). The correlated min subquery decorrelates to an "
    "aggregate + join — Catalyst never executes it per-row.",
)

register_sql(
    "tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(CAST(sum(volume) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             {DISC_PRICE} AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join"),
    doc="TPC-H Q7 volume shipping between two nations: 6-way join where "
    "the OR'd nation pair becomes an IN-set on both tiny broadcast sides; "
    "the fact tables shuffle once on the order key.",
)

register_sql(
    "tpch_q8",
    f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {DISC_PRICE} AS volume,
             n2.n_name AS nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    ) all_nations
    GROUP BY o_year ORDER BY o_year
    """,
    tags=("tpch", "join"),
    doc="TPC-H Q8 national market share: 8-way join, conditional-sum / "
    "total-sum ratio per year. Sums stay DECIMAL (exact); only the final "
    "ratio drops to DOUBLE, rounded to 6 on both engines.",
)

register_sql(
    "tpch_q9",
    f"""
    SELECT nation, o_year, CAST(CAST(sum(amount) AS DECIMAL(38,4)) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {DISC_PRICE}
               - CAST(p_retailprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "join", "bench"),
    doc="TPC-H Q9 product-type profit (ps_supplycost replaced by "
    "p_retailprice as the unit-cost column). LIKE-filtered part dim "
    "broadcasts and prunes lineitem via the join; profit arithmetic all "
    "in DECIMAL so the nation x year sums are bit-exact.",
)

register_sql(
    "tpch_q11",
    """
    WITH partvalue AS (
      SELECT l_partkey AS partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS part_value
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey)
    SELECT partkey, CAST(CAST(part_value AS DECIMAL(38,4)) AS DOUBLE) AS part_value
    FROM partvalue
    WHERE CAST(part_value AS DOUBLE) >
          (SELECT CAST(sum(part_value) AS DOUBLE) * 0.001 FROM partvalue)
    ORDER BY part_value DESC, partkey
    """,
    tags=("tpch", "subquery"),
    doc="TPC-H Q11 important stock (partsupp value -> lineitem value for "
    "one nation's suppliers): the group-vs-global-fraction shape. The CTE "
    "is read twice (group rows + global total scalar subquery) — at scale "
    "the right physical plan caches or recomputes the small aggregate, "
    "never the base scan twice; threshold compare in DOUBLE is safe "
    "because both engines sum identical DECIMAL inputs exactly.",
)

register_sql(
    "tpch_q13",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "join"),
    doc="TPC-H Q13 customer order-count distribution (comment NOT LIKE "
    "becomes a priority filter): LEFT OUTER join with the filter in the "
    "ON clause (unmatched customers still count 0), then a second "
    "aggregation over the first's output — two shuffles by construction.",
)

register_sql(
    "tpch_q15",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(CAST(sum({DISC_PRICE}) AS DECIMAL(38,4)) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "subquery"),
    doc="TPC-H Q15 top supplier: revenue CTE (the standard's view) + "
    "max-revenue scalar subquery. DECIMAL revenue makes the equality "
    "comparison exact — the DOUBLE version of this query is "
    "nondeterministic on ties, the DECIMAL one never is.",
)

register_sql(
    "tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q16 parts/supplier counting (partsupp -> lineitem "
    "association; comment-LIKE supplier exclusion -> negative balance): "
    "null-aware NOT IN anti-join + distinct aggregate. The anti-join "
    "build side is tiny and broadcasts.",
)

register_sql(
    "tpch_q17",
    """
    WITH perpart AS (
      SELECT l_partkey AS pk,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey)
    SELECT round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                      AS DECIMAL(38,2)) AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN perpart ON pk = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
    """,
    tags=("tpch", "subquery", "aggregate"),
    doc="TPC-H Q17 small-quantity revenue. The correlated "
    "'qty < 0.2 * avg(qty per part)' subquery is written in its "
    "decorrelated, DIVISION-FREE exact form: qty*5*cnt < sum_qty over a "
    "per-part aggregate CTE — identical semantics, no double-precision "
    "avg whose last-ulp difference could flip row membership between "
    "engines, and exactly the aggregate+rejoin plan Catalyst would "
    "decorrelate to anyway.",
)

register_sql(
    "tpch_q20",
    """
    SELECT s_name, s_acctbal
    FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'blue%'
          AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        GROUP BY l_suppkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 50)
    ORDER BY s_name
    """,
    tags=("tpch", "join", "subquery"),
    doc="TPC-H Q20 potential-promotion suppliers (availqty threshold -> "
    "shipped-quantity threshold): IN over an aggregate+HAVING subquery "
    "plans as agg -> semi join; the part LIKE filter broadcasts into the "
    "lineitem scan side.",
)

register_sql(
    "tpch_q21",
    """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 100
    """,
    tags=("tpch", "join", "subquery", "bench"),
    doc="TPC-H Q21 suppliers who kept orders waiting ('late' = returned "
    "flag, standing in for receiptdate > commitdate): the EXISTS / "
    "NOT EXISTS pair become semi + anti self-joins of lineitem on the "
    "order key — three scans of the fact table co-partitioned on "
    "l_orderkey, the classic Q21 plan.",
)

register_sql(
    "tpch_q22",
    """
    WITH pos AS (
      SELECT CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey % 10 IN (1, 3, 5, 7, 9))
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 10 AS BIGINT) AS cntrycode, c_acctbal
      FROM customer CROSS JOIN pos
      WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
        AND CAST(c_acctbal AS DECIMAL(18,2)) * n > s
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= DATE '2000-01-01')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    tags=("tpch", "subquery", "join"),
    doc="TPC-H Q22 global sales opportunity (phone country code -> "
    "nationkey digit): positive-balance global average as a 1-row CTE "
    "(cross-joined, i.e. broadcast), written division-free "
    "(bal*n > sum) so the threshold is exact; customers without recent "
    "orders (the standard's 7-year window) via NOT EXISTS anti-join.",
)
