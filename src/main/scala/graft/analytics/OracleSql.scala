package graft.analytics

/** DuckDB oracle SQL for the general query surface.
  * Column aliases match the Spark results exactly; float aggregates are
  * rounded identically on both sides. */
object OracleSql {
  val q1Agg: String = """
    SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity) + 1e-9, 2) AS sum_qty,
      round(sum(l_extendedprice) + 1e-9, 2) AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS sum_disc_price,
      round(avg(l_quantity) + 1e-9, 6) AS avg_qty,
      round(avg(l_discount) + 1e-9, 6) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  val q3Join: String = """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
      round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10"""

  val qTopkWindow: String = """
    WITH ranked AS (
      SELECT o_custkey,
        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk,
        count(*) OVER (PARTITION BY o_custkey) AS n_orders,
        o_orderkey, o_totalprice
      FROM orders)
    SELECT o_custkey, rk, o_orderkey, round(o_totalprice + 1e-9, 2) AS totalprice
    FROM ranked
    WHERE rk <= 3 AND n_orders >= 5
    ORDER BY o_custkey, rk"""

  val qAntiJoin: String = """
    SELECT c_custkey, c_name, c_nationkey
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    ORDER BY c_custkey"""

  val qAsofJoin: String = """
    WITH cand AS (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        row_number() OVER (PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      LEFT JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
    SELECT event_id, user_id, ts,
      o_orderkey AS last_orderkey, o_orderdate AS last_orderdate
    FROM cand WHERE rn = 1
    ORDER BY event_id"""

  val q17SmallQuantity: String = """
    SELECT round(sum(l_extendedprice) / 7.0 + 1e-9, 3) AS avg_yearly,
      count(*) AS n_rows
    FROM lineitem l1
    WHERE l_quantity < (
      SELECT 0.5 * avg(l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l1.l_partkey)"""

  val qAsofTolerance: String = """
    WITH cand AS (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        row_number() OVER (PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      LEFT JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
    SELECT event_id, user_id, ts,
      CASE WHEN o_orderdate::TIMESTAMP >= ts - INTERVAL 8400 DAY
           THEN o_orderkey END AS last_orderkey,
      CASE WHEN o_orderdate::TIMESTAMP >= ts - INTERVAL 8400 DAY
           THEN o_orderdate::TIMESTAMP END AS last_orderdate
    FROM cand WHERE rn = 1
    ORDER BY event_id"""

  val qRollup: String = """
    SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity) + 1e-9, 2) AS sum_qty,
      count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""

  val qIngestDedup: String = """
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1 ORDER BY event_id"""

  // canonical row serialization + polynomial hash, reduced with
  // order-independent aggregates (bit_xor, modular sum)
  val qTableChecksum: String = """
    WITH rows_c AS (
      SELECT concat_ws('|', event_id, epoch_us(ts), user_id, event_type,
        CAST(round(value * CAST(1000000 AS DOUBLE) + 1e-9, 0) AS BIGINT),
        props) AS c
      FROM events),
    hashed AS (
      SELECT list_reduce(list_prepend(0::BIGINT,
        list_transform(range(1, length(c) + 1), i -> unicode(c[i]))),
        (acc, ch) -> (acc * 31 + ch) % 1000000007) AS h
      FROM rows_c)
    SELECT count(*) AS n_rows, bit_xor(h) AS xor_hash,
      CAST(sum(h) % 1000000007 AS BIGINT) AS sum_hash_mod
    FROM hashed"""

  val q5RegionRevenue: String = """
    SELECT n_name,
      round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name"""

  val q13CustDist: String = """
    WITH per_cust AS (
      SELECT o_custkey, count(*) AS n_orders
      FROM orders WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
    SELECT c_count, count(*) AS custdist FROM (
      SELECT coalesce(p.n_orders, 0) AS c_count
      FROM customer c LEFT JOIN per_cust p ON p.o_custkey = c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  val q18LargeOrders: String = """
    WITH big AS (
      SELECT l_orderkey, round(sum(l_quantity) + 1e-9, 2) AS sum_qty
      FROM lineitem GROUP BY 1
      HAVING round(sum(l_quantity) + 1e-9, 2) > 300.0)
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
      o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100"""

  val q22IdleCustomers: String = """
    WITH cutoff AS (SELECT max(o_orderdate)::date - 90 AS cut FROM orders),
    avg_bal AS (
      SELECT round(avg(c_acctbal) + 1e-9, 6) AS abal
      FROM customer WHERE c_acctbal > 0),
    recent AS (
      SELECT DISTINCT o_custkey FROM orders, cutoff
      WHERE o_orderdate::date >= cutoff.cut)
    SELECT c.c_custkey % 10 AS cntrycode, count(*) AS numcust,
      round(sum(c.c_acctbal) + 1e-9, 2) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.abal
      AND NOT EXISTS (SELECT 1 FROM recent r WHERE r.o_custkey = c.c_custkey)
    GROUP BY 1 ORDER BY cntrycode"""

  val q4PriorityCheck: String = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY 1 ORDER BY o_orderpriority"""

  val q10ReturnedItems: String = """
    SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
      round(sum(l.l_extendedprice * (1 - l.l_discount)) + 1e-9, 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue DESC, c.c_custkey LIMIT 20"""

  val q12PrioritySplit: String = """
    SELECT l_linestatus,
      CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1 ORDER BY l_linestatus"""

  val q14PromoShare: String = """
    WITH agg AS (
      SELECT
        round(sum(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0.0 END) + 1e-9, 2) AS promo_revenue,
        round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2)
          AS total_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        AND l_shipdate < TIMESTAMP '1996-04-01')
    SELECT promo_revenue, total_revenue,
      CASE WHEN total_revenue > 0.0
           THEN round(100.0 * promo_revenue / total_revenue + 1e-9, 4)
      END AS promo_share
    FROM agg"""

  val q19DisjunctiveRevenue: String = """
    SELECT round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2)
        AS revenue,
      count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)"""

  val q6ForecastRevenue: String = """
    SELECT round(sum(l_extendedprice * l_discount) + 1e-9, 2) AS revenue,
      count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""

  val q15TopSupplier: String = """
    WITH revenue AS (
      SELECT l_suppkey,
        round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2)
          AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM revenue r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey"""

  val q7VolumeShipping: String = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      year(l_shipdate) AS l_year,
      round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
       OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3"""

  val q8MarketShare: String = """
    WITH flows AS (
      SELECT year(o_orderdate) AS o_year,
        l_extendedprice * (1 - l_discount) AS rev,
        sn.n_name AS supp_nation
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE p_type = 'PROMO' AND r_name = 'ASIA')
    SELECT o_year,
      round(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev ELSE 0.0 END)
        + 1e-9, 2) AS nation_revenue,
      round(sum(rev) + 1e-9, 2) AS total_revenue,
      CASE WHEN sum(rev) > 0.0 THEN
        round(round(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev ELSE 0.0 END)
            + 1e-9, 2) /
          round(sum(rev) + 1e-9, 2) + 1e-9, 6) END AS mkt_share
    FROM flows
    GROUP BY o_year
    ORDER BY o_year"""

  val q9ProductProfit: String = """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
      round(sum(l_extendedprice * (1 - l_discount)
        - p_retailprice * l_quantity * 0.6) + 1e-9, 2) AS sum_profit,
      count(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC"""

  val q2MinCostSupplier: String = """
    WITH offers AS (
      SELECT p_partkey, p_name, l_suppkey,
        round(min(l_extendedprice * (1 - l_discount) / l_quantity)
          + 1e-9, 4) AS unit_cost
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'LARGE' AND p_size >= 40
      GROUP BY 1, 2, 3)
    SELECT s_acctbal, s_name, n_name, r_name, p_partkey, p_name, unit_cost
    FROM offers o
    JOIN supplier ON o.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE unit_cost = (SELECT min(unit_cost) FROM offers o2
                       WHERE o2.p_partkey = o.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100"""

  val q11ImportantStock: String = """
    WITH value AS (
      SELECT l_partkey,
        round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS part_value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY 1)
    SELECT l_partkey, part_value
    FROM value
    WHERE part_value > (SELECT avg(part_value) FROM value) * 1.5
    ORDER BY part_value DESC, l_partkey"""

  val q16SupplierCount: String = """
    SELECT p_brand, p_type, p_size,
      count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  val q20ExcessShippers: String = """
    WITH shipped AS (
      SELECT p_partkey, l_suppkey, sum(l_quantity) AS supp_qty
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%blue%'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2)
    SELECT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM shipped s1
      WHERE supp_qty > 0.5 * (SELECT sum(supp_qty) FROM shipped s2
                              WHERE s2.p_partkey = s1.p_partkey))
    ORDER BY s_suppkey"""

  val q21WaitingSuppliers: String = """
    WITH lines AS (
      SELECT l_orderkey, l_suppkey,
        l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F')
    SELECT s_name, count(*) AS numwait
    FROM lines l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_19' AND l1.late
      AND EXISTS (SELECT 1 FROM lines l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lines l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100"""

  /** Mirrors Queries.qSkyline: sort-based 2-D Pareto frontier. */
  val qSkyline: String = """
    WITH by_price AS (
      SELECT p_retailprice, max(p_size) AS mx
      FROM part GROUP BY 1),
    frontier AS (
      SELECT p_retailprice, mx,
        max(mx) OVER (ORDER BY p_retailprice
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_cheaper
      FROM by_price)
    SELECT p.p_partkey, p.p_name, p.p_size, p.p_retailprice
    FROM part p JOIN frontier f USING (p_retailprice)
    WHERE (f.best_cheaper IS NULL OR f.mx > f.best_cheaper)
      AND p.p_size = f.mx
    ORDER BY p.p_retailprice, p.p_partkey"""

  /** Mirrors Queries.qReorderGap: per-customer order gaps, priority
    * percentile profile. */
  val qReorderGap: String = """
    WITH g AS (
      SELECT o_orderpriority,
        datediff('day',
          (lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey))::date,
          o_orderdate::date) AS gap_days
      FROM orders)
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_gaps,
      round(avg(gap_days) + 1e-9, 4) AS mean_gap,
      round(quantile_cont(gap_days, 0.5) + 1e-9, 4) AS p50_gap,
      round(quantile_cont(gap_days, 0.9) + 1e-9, 4) AS p90_gap
    FROM g WHERE gap_days IS NOT NULL
    GROUP BY 1 ORDER BY o_orderpriority"""

  /** Mirrors Queries.qSupplierHhi: 2-dp supplier revenue, share
    * squares per nation. */
  val qSupplierHhi: String = """
    WITH rev AS (
      SELECT l_suppkey,
        round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-9, 2) AS rev
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT n.n_name, r.rev,
        sum(r.rev) OVER (PARTITION BY n.n_name) AS tot
      FROM rev r
      JOIN supplier s ON r.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey)
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
      round(max(tot) + 1e-9, 2) AS nation_revenue,
      round(sum((rev / tot) * (rev / tot)) * 10000.0 + 1e-9, 2) AS hhi,
      round(max(rev / tot) + 1e-9, 6) AS top_share
    FROM j GROUP BY 1 ORDER BY n_name"""

  /** Mirrors Queries.qFuzzyNameJoin: length-banded candidates,
    * exact levenshtein verify. */
  val qFuzzyNameJoin: String = """
    WITH names AS (
      SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_parts,
        length(p_name) AS len, length(p_name) // 4 AS bkt
      FROM part GROUP BY 1),
    probes AS (
      SELECT name AS name_a, n_parts AS n_a, len AS len_a, bkt + d AS pb
      FROM names, unnest([-1, 0, 1]) AS t(d)),
    build AS (
      SELECT name AS name_b, n_parts AS n_b, len AS len_b, bkt AS pb
      FROM names),
    cand AS (
      SELECT DISTINCT name_a, name_b, n_a, n_b,
        levenshtein(name_a, name_b) AS dist
      FROM probes JOIN build USING (pb)
      WHERE name_a < name_b AND abs(len_a - len_b) <= 2)
    SELECT name_a, name_b, dist, n_a, n_b
    FROM cand WHERE dist <= 2 ORDER BY name_a, name_b"""

  /** Mirrors Queries.qCustomerDeciles: ntile(10) on the deterministic
    * revenue order. */
  val qCustomerDeciles: String = """
    WITH rev AS (
      SELECT o_custkey, round(sum(o_totalprice) + 1e-9, 2) AS rev
      FROM orders GROUP BY 1),
    d AS (
      SELECT rev, ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
      FROM rev),
    agg AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
        round(sum(rev) + 1e-9, 2) AS decile_rev
      FROM d GROUP BY 1)
    SELECT decile, n_customers, decile_rev,
      round(decile_rev / sum(decile_rev) OVER () + 1e-9, 6) AS share
    FROM agg ORDER BY decile"""

  /** Mirrors Queries.qMonthlyYoy: monthly revenue, same-month lag. */
  val qMonthlyYoy: String = """
    WITH m AS (
      SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon,
        CAST(count(*) AS BIGINT) AS n_orders,
        round(sum(o_totalprice) + 1e-9, 2) AS revenue
      FROM orders GROUP BY 1, 2),
    l AS (
      SELECT *, lag(revenue, 1) OVER (PARTITION BY mon ORDER BY yr)
        AS prev_revenue
      FROM m)
    SELECT yr, mon, n_orders, revenue, prev_revenue,
      CASE WHEN prev_revenue > 0
        THEN round((revenue - prev_revenue) / prev_revenue + 1e-9, 6)
      END AS yoy_growth
    FROM l ORDER BY yr, mon"""

  /** Mirrors Queries.qDiscountElasticity: five sufficient sums per
    * part type. */
  val qDiscountElasticity: String = """
    WITH j AS (
      SELECT p.p_type, l.l_discount AS x, l.l_quantity AS yv
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    sums AS (
      SELECT p_type, CAST(count(*) AS BIGINT) AS n,
        sum(x) AS sx, sum(yv) AS sy, sum(x*x) AS sxx, sum(yv*yv) AS syy,
        sum(x*yv) AS sxy
      FROM j GROUP BY 1),
    d AS (
      SELECT *, n*sxx - sx*sx AS detx, n*syy - sy*sy AS dety FROM sums)
    SELECT p_type, n,
      CASE WHEN detx > 0.0
        THEN round((n*sxy - sx*sy) / detx + 1e-9, 4) END AS slope,
      CASE WHEN detx > 0.0 AND dety > 0.0
        THEN round((n*sxy - sx*sy) * (n*sxy - sx*sy) / (detx*dety)
          + 1e-9, 6) END AS r2
    FROM d ORDER BY p_type"""

  /** Mirrors Queries.qShipLatency: order join, priority percentile
    * profile. */
  val qShipLatency: String = """
    WITH j AS (
      SELECT o.o_orderpriority,
        datediff('day', o.o_orderdate::date, l.l_shipdate::date) AS lat
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
      round(avg(lat) + 1e-9, 4) AS mean_days,
      round(quantile_cont(lat, 0.5) + 1e-9, 4) AS p50_days,
      round(quantile_cont(lat, 0.95) + 1e-9, 4) AS p95_days,
      round(avg(CASE WHEN lat > 90 THEN 1.0 ELSE 0.0 END) + 1e-9, 6)
        AS late_share
    FROM j GROUP BY 1 ORDER BY o_orderpriority"""

  /** Mirrors Queries.qProfile: per-column stats, strings for
    * min/max. */
  val qProfile: String = {
    val cols = Seq("l_orderkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate")
    cols.map(c => s"""
      SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_null,
        CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
        min($c)::VARCHAR AS min_val, max($c)::VARCHAR AS max_val
      FROM lineitem""").mkString(" UNION ALL ") + " ORDER BY col_name"
  }

  /** Mirrors Queries.qPriceIndex: 6-dp unit prices, 2-dp quantities,
    * min-month base basket, 2-dp cost totals. */
  val qPriceIndex: String = """
    WITH pm AS (
      SELECT date_trunc('month', l_shipdate)::date AS mon, l_partkey,
        round(sum(l_extendedprice) / sum(l_quantity) + 1e-9, 6) AS p,
        round(sum(l_quantity) + 1e-9, 2) AS q
      FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2),
    b0 AS (SELECT min(mon) AS mon0 FROM pm),
    base AS (
      SELECT l_partkey, p AS p0, q AS q0 FROM pm, b0 WHERE pm.mon = b0.mon0),
    m AS (
      SELECT mon, CAST(count(*) AS BIGINT) AS n_parts,
        round(sum(pm.p * base.q0) + 1e-9, 2) AS cur_cost,
        round(sum(base.p0 * base.q0) + 1e-9, 2) AS base_cost
      FROM pm JOIN base USING (l_partkey) GROUP BY 1)
    SELECT mon, n_parts, cur_cost, base_cost,
      round(cur_cost / base_cost + 1e-9, 6) AS laspeyres
    FROM m ORDER BY mon"""

  /** Mirrors Queries.qAbcXyz: integer-cent cumulative revenue share,
    * monthly-demand CV, 9-cell rollup. */
  val qAbcXyz: String = """
    WITH rev AS (
      SELECT l_partkey,
        CAST(round(sum(l_extendedprice * (1.0 - l_discount)) * 100
          + 1e-9, 0) AS BIGINT) AS rev_c
      FROM lineitem GROUP BY 1),
    mq AS (
      SELECT l_partkey, date_trunc('month', l_shipdate)::date AS mon,
        round(sum(l_quantity) + 1e-9, 2) AS q
      FROM lineitem GROUP BY 1, 2),
    cv AS (
      SELECT l_partkey,
        CASE WHEN sum(q) > 0.0 THEN
          round(sqrt(greatest(sum(q*q) / count(*)
              - (sum(q) / count(*)) * (sum(q) / count(*)), 0.0))
            / (sum(q) / count(*)) + 1e-9, 4) END AS cv
      FROM mq GROUP BY 1),
    ranked AS (
      SELECT l_partkey, rev_c,
        sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
        sum(rev_c) OVER () AS tot_c
      FROM rev),
    cls AS (
      SELECT r.l_partkey, r.rev_c,
        CASE WHEN r.cum_c::DOUBLE / r.tot_c <= 0.8 THEN 'A'
             WHEN r.cum_c::DOUBLE / r.tot_c <= 0.95 THEN 'B'
             ELSE 'C' END AS abc,
        CASE WHEN c.cv <= 0.5 THEN 'X' WHEN c.cv <= 1.0 THEN 'Y'
             ELSE 'Z' END AS xyz
      FROM ranked r JOIN cv c USING (l_partkey))
    SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
      round(sum(rev_c)::DOUBLE / 100 + 1e-9, 2) AS revenue
    FROM cls GROUP BY 1, 2 ORDER BY abc, xyz"""

  /** Mirrors Queries.qRevenueBridge: adjacent-month price/volume
    * decomposition per brand on quantized values. */
  val qRevenueBridge: String = """
    WITH m AS (
      SELECT p.p_brand, date_trunc('month', l.l_shipdate)::date AS mon,
        round(sum(l.l_quantity) + 1e-9, 2) AS q,
        round(sum(l.l_extendedprice * (1.0 - l.l_discount)) + 1e-9, 2) AS rev
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2),
    mp AS (SELECT *, round(rev / q + 1e-9, 6) AS p FROM m),
    lagged AS (
      SELECT *, lag(q, 1) OVER win AS q0, lag(p, 1) OVER win AS p0,
        lag(rev, 1) OVER win AS rev0
      FROM mp WINDOW win AS (PARTITION BY p_brand ORDER BY mon)),
    eff AS (
      SELECT p_brand, mon, rev,
        round(rev - rev0 + 1e-9, 2) AS d_rev,
        round((p - p0) * q + 1e-9, 2) AS price_effect,
        round((q - q0) * p0 + 1e-9, 2) AS volume_effect
      FROM lagged WHERE q0 IS NOT NULL)
    SELECT p_brand, mon, rev, d_rev, price_effect, volume_effect,
      round(d_rev - price_effect - volume_effect + 1e-9, 2) AS mix_residual
    FROM eff ORDER BY p_brand, mon"""

  /** Mirrors Queries.qOrderBacklog: open/close day collapses, exact
    * integer cumsums over the day frame. */
  val qOrderBacklog: String = """
    WITH opened AS (
      SELECT o_orderdate::date AS day, CAST(count(*) AS BIGINT) AS n_open
      FROM orders GROUP BY 1),
    closed AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_close FROM (
        SELECT l_orderkey, max(l_shipdate::date) AS day
        FROM lineitem GROUP BY 1)
      GROUP BY 1),
    j AS (
      SELECT coalesce(o.day, c.day) AS day,
        coalesce(o.n_open, 0) AS n_open, coalesce(c.n_close, 0) AS n_close
      FROM opened o FULL OUTER JOIN closed c ON o.day = c.day)
    SELECT day, n_open, n_close,
      CAST(sum(n_open) OVER win - sum(n_close) OVER win AS BIGINT) AS backlog
    FROM j
    WINDOW win AS (ORDER BY day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY day"""

  /** Mirrors Queries.qOrderReconciliation: per-line 4-dp net, per-order
    * 2-dp recomputed total, ±0.01 match classification, priority
    * rollup. */
  val qOrderReconciliation: String = """
    WITH lines AS (
      SELECT l_orderkey AS o_orderkey,
        round(sum(round(l_extendedprice * (1.0 - l_discount)
          * (1.0 + l_tax) + 1e-9, 4)) + 1e-9, 2) AS computed,
        CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1),
    diffs AS (
      SELECT o.o_orderpriority, l.n_lines,
        round(o.o_totalprice - coalesce(l.computed, 0.0) + 1e-9, 2) AS diff
      FROM orders o LEFT JOIN lines l USING (o_orderkey))
    SELECT o_orderpriority,
      CAST(count(*) AS BIGINT) AS n_orders,
      CAST(sum(CASE WHEN n_lines IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_headless,
      CAST(sum(CASE WHEN abs(diff) <= 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
      CAST(sum(CASE WHEN diff > 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
      CAST(sum(CASE WHEN diff < -0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_under,
      round(avg(abs(diff)) + 1e-9, 6) AS avg_abs_diff,
      round(max(abs(diff)) + 1e-9, 2) AS max_abs_diff,
      round(sum(CASE WHEN abs(diff) <= 0.01 THEN 1 ELSE 0 END)
        / CAST(count(*) AS DOUBLE) + 1e-9, 6) AS match_share
    FROM diffs GROUP BY 1 ORDER BY o_orderpriority"""

  /** Mirrors Queries.qItemCf: distinct basket pairs, cosine by item
    * counts, top-5 per item. */
  val qItemCf: String = """
    WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
    cnt AS (SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM op GROUP BY 1),
    pairs AS (
      SELECT a.item, b.item AS item_b, CAST(count(*) AS BIGINT) AS cooc
      FROM op a JOIN op b ON a.ok = b.ok AND a.item != b.item
      GROUP BY 1, 2),
    scored AS (
      SELECT p.item, p.item_b, p.cooc,
        round(p.cooc / sqrt(ca.cnt * CAST(cb.cnt AS DOUBLE)) + 1e-9, 6) AS cosine
      FROM pairs p
      JOIN cnt ca ON ca.item = p.item
      JOIN cnt cb ON cb.item = p.item_b)
    SELECT item, rank, item_b, cooc, cosine FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY item
        ORDER BY cosine DESC, item_b) AS INT) AS rank
      FROM scored)
    WHERE rank <= 5 ORDER BY item, rank"""

  /** Mirrors Queries.qTheilDecomposition: 2-dp customer revenue,
    * 6-dp group means before the log terms, within/between split. */
  val qTheilDecomposition: String = """
    WITH rev AS (
      SELECT o_custkey, round(sum(o_totalprice) + 1e-9, 2) AS x
      FROM orders GROUP BY 1),
    g AS (
      SELECT r.x, n.n_name
      FROM rev r
      JOIN customer c ON c.c_custkey = r.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey),
    mus AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x) AS DOUBLE) AS sx,
        round(sum(x) / count(*) + 1e-9, 6) AS mu_g
      FROM g GROUP BY 1),
    gtot AS (
      SELECT CAST(sum(sx) AS DOUBLE) AS tot,
        round(sum(sx) / sum(n) + 1e-9, 6) AS mu
      FROM mus),
    withins AS (
      SELECT g.n_name, avg((g.x / m.mu_g) * ln(g.x / m.mu_g)) AS t_g_raw
      FROM g JOIN mus m USING (n_name)
      GROUP BY 1)
    SELECT m.n_name, m.n, m.mu_g,
      round(m.sx / gl.tot + 1e-9, 6) AS share,
      round(w.t_g_raw + 1e-9, 6) AS theil_g,
      round(round(m.sx / gl.tot + 1e-9, 6) * w.t_g_raw + 1e-9, 6) AS within_term,
      round(round(m.sx / gl.tot + 1e-9, 6) * ln(m.mu_g / gl.mu) + 1e-9, 6)
        AS between_term
    FROM mus m JOIN withins w USING (n_name) CROSS JOIN gtot gl
    ORDER BY m.n_name"""

  /** Mirrors Queries.qKAnonymity: QI equivalence classes, banded
    * k-census with row shares. */
  val qKAnonymity: String = """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
        CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        CAST(count(*) AS BIGINT) AS k
      FROM customer GROUP BY 1, 2, 3),
    bands AS (
      SELECT CASE WHEN k = 1 THEN '1_unique' WHEN k <= 4 THEN '2_small'
                  WHEN k <= 9 THEN '3_medium' ELSE '4_large' END AS k_band,
        CAST(count(*) AS BIGINT) AS n_groups,
        CAST(sum(k) AS BIGINT) AS n_rows
      FROM g GROUP BY 1),
    tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tot_rows FROM bands)
    SELECT b.k_band, b.n_groups, b.n_rows,
      round(b.n_rows / CAST(t.tot_rows AS DOUBLE) + 1e-9, 6) AS row_share
    FROM bands b CROSS JOIN tot t
    ORDER BY b.k_band"""

  /** Mirrors Queries.qJoinSkewAudit: fanout histograms for the three
    * audited join keys with shares and the max/mean skew ratio. */
  val qJoinSkewAudit: String = """
    WITH h AS (
      SELECT 'lineitem.l_orderkey' AS source, fanout,
        CAST(count(*) AS BIGINT) AS n_keys FROM (
        SELECT CAST(count(*) AS BIGINT) AS fanout FROM lineitem GROUP BY l_orderkey)
      GROUP BY 2
      UNION ALL
      SELECT 'lineitem.l_partkey', fanout, CAST(count(*) AS BIGINT) FROM (
        SELECT CAST(count(*) AS BIGINT) AS fanout FROM lineitem GROUP BY l_partkey)
      GROUP BY 2
      UNION ALL
      SELECT 'orders.o_custkey', fanout, CAST(count(*) AS BIGINT) FROM (
        SELECT CAST(count(*) AS BIGINT) AS fanout FROM orders GROUP BY o_custkey)
      GROUP BY 2),
    tot AS (
      SELECT source, CAST(sum(n_keys) AS BIGINT) AS tot_keys,
        CAST(sum(fanout * n_keys) AS BIGINT) AS tot_rows,
        CAST(max(fanout) AS BIGINT) AS max_fanout
      FROM h GROUP BY 1)
    SELECT h.source, h.fanout, h.n_keys,
      round(h.n_keys / CAST(t.tot_keys AS DOUBLE) + 1e-9, 6) AS key_share,
      round(h.fanout * h.n_keys / CAST(t.tot_rows AS DOUBLE) + 1e-9, 6) AS row_share,
      round(t.max_fanout / (t.tot_rows / CAST(t.tot_keys AS DOUBLE)) + 1e-9, 4)
        AS skew_ratio
    FROM h JOIN tot t USING (source)
    ORDER BY h.source, h.fanout"""

  /** Mirrors Queries.qArAging: horizon-aged open orders banded with
    * amount shares. */
  val qArAging: String = """
    WITH hz AS (SELECT max(o_orderdate::date) AS h FROM orders),
    banded AS (
      SELECT CASE WHEN age <= 30 THEN '0_current'
                  WHEN age <= 60 THEN '1_31_60'
                  WHEN age <= 90 THEN '2_61_90'
                  ELSE '3_over_90' END AS band,
        o_orderstatus, o_totalprice
      FROM (
        SELECT o.o_orderstatus, o.o_totalprice,
          datediff('day', o.o_orderdate::date, z.h) AS age
        FROM orders o CROSS JOIN hz z
        WHERE o.o_orderstatus != 'F')),
    g AS (
      SELECT band, o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        round(sum(o_totalprice) + 1e-9, 2) AS amount
      FROM banded GROUP BY 1, 2),
    tot AS (SELECT sum(amount) AS tot_amount FROM g)
    SELECT g.band, g.o_orderstatus, g.n_orders, g.amount,
      round(g.amount / t.tot_amount + 1e-9, 6) AS amount_share
    FROM g CROSS JOIN tot t
    ORDER BY g.band, g.o_orderstatus"""

  /** Mirrors Queries.qRecsysEval: max-id held-out target, context →
    * CF-neighbor match, per-basket-size hit rate. */
  val qRecsysEval: String = s"""
    WITH cf AS (SELECT item, item_b FROM ($qItemCf)),
    op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
    sized AS (
      SELECT ok, CAST(count(*) AS BIGINT) AS basket_size, max(item) AS target
      FROM op GROUP BY 1 HAVING count(*) >= 2),
    context AS (
      SELECT o.ok, o.item, s.target
      FROM op o JOIN sized s USING (ok)
      WHERE o.item != s.target),
    hits AS (
      SELECT DISTINCT c.ok
      FROM context c JOIN cf ON cf.item = c.item
      WHERE cf.item_b = c.target)
    SELECT s.basket_size, CAST(count(*) AS BIGINT) AS n_orders,
      CAST(sum(CASE WHEN h.ok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      round(sum(CASE WHEN h.ok IS NOT NULL THEN 1 ELSE 0 END)
        / CAST(count(*) AS DOUBLE) + 1e-9, 6) AS hit_rate
    FROM sized s LEFT JOIN hits h ON h.ok = s.ok
    GROUP BY 1 ORDER BY 1"""

  /** Mirrors Queries.qDqRules: per-table conditional aggregates, one
    * anti-join RI rule, uniqueness by count − distinct. */
  val qDqRules: String = """
    WITH li AS (
      SELECT 1 AS rule_no, 'discount_in_0_0.1' AS rule, 'lineitem' AS table_name,
        CAST(count(*) AS BIGINT) AS n_checked,
        CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      FROM lineitem
      UNION ALL
      SELECT 2, 'quantity_in_1_50', 'lineitem', CAST(count(*) AS BIGINT),
        CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 3, 'extendedprice_positive', 'lineitem', CAST(count(*) AS BIGINT),
        CAST(sum(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 4, 'totalprice_positive', 'orders', CAST(count(*) AS BIGINT),
        CAST(sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 5, 'orderdate_not_null', 'orders', CAST(count(*) AS BIGINT),
        CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 6, 'acctbal_in_range', 'customer', CAST(count(*) AS BIGINT),
        CAST(sum(CASE WHEN c_acctbal < -1000.0 OR c_acctbal > 10000.0 THEN 1 ELSE 0 END) AS BIGINT)
      FROM customer
      UNION ALL
      SELECT 7, 'event_value_non_negative', 'events', CAST(count(*) AS BIGINT),
        CAST(sum(CASE WHEN value < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 8, 'event_id_unique', 'events', CAST(count(*) AS BIGINT),
        CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 9, 'lineitem_orderkey_exists', 'lineitem',
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)))
    SELECT rule_no, rule, table_name, n_checked, n_violations,
      round(n_violations / CAST(n_checked AS DOUBLE) + 1e-9, 6) AS violation_share,
      n_violations = 0 AS pass
    FROM li ORDER BY rule_no"""

  /** Mirrors Queries.qMetricDrilldown: stacked nation/segment
    * pre/post revenue with delta shares (total from the nation dim). */
  val qMetricDrilldown: String = """
    WITH base AS (
      SELECT n.n_name, c.c_mktsegment,
        day(o.o_orderdate) >= 16 AS post,
        l.l_extendedprice * (1.0 - l.l_discount) AS rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey),
    bd0 AS (
      SELECT 'nation' AS dimension, n_name AS dim_value,
        round(sum(CASE WHEN NOT post THEN rev ELSE 0.0 END) + 1e-9, 2) AS rev_pre,
        round(sum(CASE WHEN post THEN rev ELSE 0.0 END) + 1e-9, 2) AS rev_post
      FROM base GROUP BY 2
      UNION ALL
      SELECT 'mktsegment', c_mktsegment,
        round(sum(CASE WHEN NOT post THEN rev ELSE 0.0 END) + 1e-9, 2),
        round(sum(CASE WHEN post THEN rev ELSE 0.0 END) + 1e-9, 2)
      FROM base GROUP BY 2),
    d AS (
      SELECT *, round(rev_post - rev_pre + 1e-9, 2) AS delta FROM bd0),
    tot AS (
      SELECT sum(delta) AS total_delta FROM d WHERE dimension = 'nation')
    SELECT d.dimension, d.dim_value, d.rev_pre, d.rev_post, d.delta,
      CASE WHEN abs(t.total_delta) > 0.0
        THEN round(d.delta / t.total_delta + 1e-9, 6) END AS delta_share,
      CASE WHEN d.rev_pre > 0.0
        THEN round(d.rev_post / d.rev_pre - 1.0 + 1e-9, 6) END AS growth
    FROM d CROSS JOIN tot t
    ORDER BY d.dimension, d.dim_value"""

  /** Mirrors Queries.qPriorityTransitions: per-customer consecutive
    * orders, row-normalized transition matrix. */
  val qPriorityTransitions: String = """
    WITH pairs AS (
      SELECT prev AS from_priority, o_orderpriority AS to_priority,
        CAST(count(*) AS BIGINT) AS n
      FROM (
        SELECT o_custkey, o_orderpriority,
          lag(o_orderpriority) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders)
      WHERE prev IS NOT NULL GROUP BY 1, 2)
    SELECT from_priority, to_priority, n,
      round(n / CAST(sum(n) OVER (PARTITION BY from_priority) AS DOUBLE)
        + 1e-9, 6) AS p
    FROM pairs ORDER BY from_priority, to_priority"""

  /** Mirrors Queries.qCfCoverage: catalog left join onto the CF
    * list-length collapse, scalar rollup. */
  val qCfCoverage: String = s"""
    WITH lists AS (
      SELECT item, CAST(count(*) AS BIGINT) AS list_len
      FROM ($qItemCf) GROUP BY 1),
    j AS (
      SELECT p.p_partkey AS item, l.list_len
      FROM part p LEFT JOIN lists l ON l.item = p.p_partkey),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
        CAST(sum(CASE WHEN list_len IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_covered,
        CAST(sum(CASE WHEN list_len = 5 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_full_list,
        round(avg(coalesce(list_len, 0)) + 1e-9, 6) AS mean_list_len
      FROM j)
    SELECT n_items, n_covered, n_full_list, mean_list_len,
      round(n_covered / CAST(n_items AS DOUBLE) + 1e-9, 6) AS coverage,
      round(n_full_list / CAST(n_items AS DOUBLE) + 1e-9, 6) AS full_coverage
    FROM g"""

  /** Mirrors Queries.qCroston: the same branchless 4-dp-per-step
    * Croston fold (size EWMA z, interval EWMA p, α = 0.1) — state and
    * elements both DOUBLE[] so list_reduce type-checks with the
    * prepended init; DuckDB lists are 1-based where Spark arrays are
    * 0-based. */
  val qCroston: String = {
    val i0 = "(1.0 - least(a[4], 1.0))"
    val i1 = "(least(a[4], 1.0) - least(greatest(a[4] - 1.0, 0.0), 1.0))"
    val i2 = "least(greatest(a[4] - 1.0, 0.0), 1.0)"
    val iv = "(x[1] - a[3])"
    s"""
    WITH demand AS (
      SELECT l_partkey, o.o_orderdate::date AS d,
        round(sum(l_quantity) + 1e-9, 2) AS q
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2),
    series AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_events,
        list_transform(
          list_sort(list(struct_pack(
            dd := CAST(d - DATE '1990-01-01' AS DOUBLE), q := q))),
          s -> [s.dd, s.q]) AS ev
      FROM demand GROUP BY 1 HAVING count(*) >= 3),
    folded AS (
      SELECT l_partkey, n_events,
        list_reduce(list_prepend([0.0, 0.0, 0.0, 0.0], ev),
          (a, x) -> [
            round($i0 * x[2] + (1.0 - $i0) * (0.9 * a[1] + 0.1 * x[2]) + 1e-9, 4),
            round($i1 * $iv + $i2 * (0.9 * a[2] + 0.1 * $iv) + 1e-9, 4),
            x[1],
            a[4] + 1.0]) AS st
      FROM series)
    SELECT l_partkey, n_events, st[1] AS z, st[2] AS p,
      round(st[1] / st[2] + 1e-9, 6) AS forecast_rate
    FROM folded WHERE st[2] > 0.0 ORDER BY l_partkey"""
  }

  /** Mirrors Queries.qInventoryPolicy: EOQ / safety-stock / reorder
    * point from the same demand-event sums. */
  val qInventoryPolicy: String = """
    WITH demand AS (
      SELECT l_partkey, o.o_orderdate::date AS d,
        round(sum(l_quantity) + 1e-9, 2) AS q
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2),
    agg AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_events,
        round(sum(q) + 1e-9, 2) AS total_demand,
        round(avg(q) + 1e-9, 6) AS mean_q,
        round(stddev_samp(q) + 1e-9, 6) AS sd_q,
        CAST(max(d) - min(d) + 1 AS DOUBLE) AS span_days
      FROM demand GROUP BY 1 HAVING count(*) >= 3),
    pol AS (
      SELECT *,
        round(total_demand / span_days + 1e-9, 6) AS daily_rate,
        round(sqrt(2.0 * total_demand * 100.0 / 2.0) + 1e-9, 4) AS eoq,
        round(1.645 * sd_q + 1e-9, 4) AS safety_stock
      FROM agg WHERE sd_q IS NOT NULL)
    SELECT l_partkey, n_events, total_demand, mean_q, sd_q, daily_rate,
      eoq, safety_stock,
      round(daily_rate * 7.0 + safety_stock + 1e-9, 4) AS reorder_point
    FROM pol ORDER BY l_partkey"""

  val all: Map[String, String] = Map(
    "q_croston" -> qCroston,
    "q_inventory_policy" -> qInventoryPolicy,
    "q_recsys_eval" -> qRecsysEval,
    "q_priority_transitions" -> qPriorityTransitions,
    "q_cf_coverage" -> qCfCoverage,
    "q_dq_rules" -> qDqRules,
    "q_metric_drilldown" -> qMetricDrilldown,
    "q_order_reconciliation" -> qOrderReconciliation,
    "q_item_cf" -> qItemCf,
    "q_theil_decomposition" -> qTheilDecomposition,
    "q_k_anonymity" -> qKAnonymity,
    "q_join_skew_audit" -> qJoinSkewAudit,
    "q_ar_aging" -> qArAging,
    "q_price_index" -> qPriceIndex,
    "q_order_backlog" -> qOrderBacklog,
    "q_abc_xyz" -> qAbcXyz,
    "q_revenue_bridge" -> qRevenueBridge,
    "q_skyline" -> qSkyline,
    "q_profile" -> qProfile,
    "q_monthly_yoy" -> qMonthlyYoy,
    "q_discount_elasticity" -> qDiscountElasticity,
    "q_ship_latency" -> qShipLatency,
    "q_reorder_gap" -> qReorderGap,
    "q_supplier_hhi" -> qSupplierHhi,
    "q_fuzzy_name_join" -> qFuzzyNameJoin,
    "q_customer_deciles" -> qCustomerDeciles,
    "q2_min_cost_supplier" -> q2MinCostSupplier,
    "q7_volume_shipping" -> q7VolumeShipping,
    "q8_market_share" -> q8MarketShare,
    "q9_product_profit" -> q9ProductProfit,
    "q11_important_stock" -> q11ImportantStock,
    "q16_supplier_count" -> q16SupplierCount,
    "q20_excess_shippers" -> q20ExcessShippers,
    "q21_waiting_suppliers" -> q21WaitingSuppliers,
    "q4_priority_check" -> q4PriorityCheck,
    "q6_forecast_revenue" -> q6ForecastRevenue,
    "q15_top_supplier" -> q15TopSupplier,
    "q10_returned_items" -> q10ReturnedItems,
    "q12_priority_split" -> q12PrioritySplit,
    "q14_promo_share" -> q14PromoShare,
    "q19_disjunctive" -> q19DisjunctiveRevenue,
    "q13_custdist" -> q13CustDist,
    "q18_large_orders" -> q18LargeOrders,
    "q22_idle_customers" -> q22IdleCustomers,
    "q5_region_revenue" -> q5RegionRevenue,
    "q_table_checksum" -> qTableChecksum,
    "q_ingest_dedup" -> qIngestDedup,
    "q1_agg" -> q1Agg,
    "q3_join" -> q3Join,
    "q_topk_window" -> qTopkWindow,
    "q_anti_join" -> qAntiJoin,
    "q_asof_join" -> qAsofJoin,
    // the native operator must reproduce the composed route bit-for-bit
    "q_asof_native" -> qAsofJoin,
    "q_asof_tolerance" -> qAsofTolerance,
    "q17_small_quantity" -> q17SmallQuantity,
    "q_rollup" -> qRollup)
}
