package graft

/** DuckDB oracle SQL for the relational (TPC-H-style) surface
  * ([[graft.operators.Relational]]). Money sums go through
  * DECIMAL(18,6) on both sides — exact and order-independent — then cast
  * to DOUBLE, so partition-parallel Spark and sequential DuckDB agree
  * bit-for-bit. */
object OraclesRel {

  // Scale 6 matches the expressions' exact decimal scale — see
  // Relational.decSum for why scale 4 would hit tie-rounding divergence.
  // The exact decimal sum is routed to DOUBLE **through VARCHAR**:
  // DuckDB's direct DECIMAL→DOUBLE cast divides the int128 scaled value
  // by 10^scale in floating point — two roundings, up to 1 ULP off the
  // correctly-rounded value (at sf10 an integer-exact 1.24e12 sum came
  // back as x.0002 while Spark's BigDecimal.doubleValue was exact).
  // DECIMAL→VARCHAR is exact digits and VARCHAR→DOUBLE is a correctly-
  // rounded parse, matching Java semantics at every magnitude; wherever
  // the direct cast was already correct the two paths are bit-equal, so
  // the restatement is value-invariant for every previously-green scale.
  private def dsum(e: String) = s"CAST(CAST(sum(CAST($e AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)"

  // Deletion neighborhood over distinct names `n(name)`: pos 0 keeps
  // the name itself, pos i deletes character i — MATERIALIZED because
  // the fuzzy queries join it to itself. See rel_fuzzy_names for why
  // this candidate set is provably complete for levenshtein = 1.
  private val delVarCte = """var AS MATERIALIZED (
  SELECT DISTINCT name, CASE WHEN pos = 0 THEN name
    ELSE substr(name, 1, pos - 1) || substr(name, pos + 1) END AS v
  FROM (SELECT name, unnest(range(0, len(name) + 1))::INT AS pos FROM n))"""

  val all: Map[String, String] = Map(
    "rel_pricing_summary" -> s"""
SELECT l_returnflag, l_linestatus,
  ${dsum("l_quantity")} AS sum_qty,
  ${dsum("l_extendedprice")} AS sum_base_price,
  ${dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
  ${dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
  ${dsum("l_quantity")} / count(*) AS avg_qty,
  ${dsum("l_extendedprice")} / count(*) AS avg_price,
  ${dsum("l_discount")} / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
    "rel_revenue_by_nation" -> s"""
SELECT n_name, ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name""",
    "rel_top_customers" -> s"""
SELECT c_custkey, c_name,
  ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
  count(DISTINCT o_orderkey) AS n_orders
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10""",
    "rel_order_priority" -> """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority""",
    "rel_customers_no_orders" -> """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey""",
    "rel_order_running_total" -> """
SELECT o_custkey, o_orderkey, o_orderdate,
  round(sum(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
  row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)::BIGINT AS order_seq
FROM orders
ORDER BY o_custkey, order_seq""",
    "rel_window_funcs" -> """
SELECT o_custkey, o_orderkey, o_orderdate,
  ntile(4) OVER w::BIGINT AS quartile,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume,
  lag(o_totalprice, 1) OVER w AS prev_price,
  lead(o_totalprice, 1) OVER w AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderdate, o_orderkey""",
    "rel_part_topk_per_brand" -> """
SELECT p_brand, p_partkey, p_name, p_retailprice, rn FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
    row_number() OVER (
      PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)::BIGINT AS rn
  FROM part)
WHERE rn <= 3
ORDER BY p_brand, rn""",
    "rel_range_join" -> """
WITH p AS (
  SELECT user_id, ts::TIMESTAMP AS p_ts, event_id AS p_event
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id AS c_user, ts::TIMESTAMP AS c_ts, event_id AS c_event
  FROM events WHERE event_type = 'click')
SELECT user_id, p_event, p_ts, c_event, c_ts
FROM p JOIN c ON user_id = c_user
  AND c_ts >= p_ts - INTERVAL 10 MINUTE AND c_ts <= p_ts
ORDER BY p_event, c_event""",
    "rel_asof_join" -> """
WITH p AS (
  SELECT user_id, ts::TIMESTAMP AS p_ts, event_id AS p_event
  FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT user_id AS c_user, ts::TIMESTAMP AS c_ts, event_id AS c_event
  FROM events WHERE event_type = 'click')
SELECT user_id, p_event, p_ts, c_event, c_ts FROM (
  SELECT user_id, p_event, p_ts, c_event, c_ts,
    row_number() OVER (
      PARTITION BY p_event ORDER BY c_ts DESC, c_event DESC) AS rn
  FROM p JOIN c ON user_id = c_user AND c_ts <= p_ts)
WHERE rn = 1
ORDER BY p_event""",
    "rel_promo_revenue" -> s"""
SELECT date_trunc('month', l_shipdate)::TIMESTAMP AS month,
  ${dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} AS promo_revenue,
  ${dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue,
  round(${dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
    / ${dsum("l_extendedprice * (1 - l_discount)")} * 100, 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY month ORDER BY month""",
    "rel_volume_shipping" -> s"""
SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
  year(l_shipdate)::BIGINT AS ship_year,
  ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
  count(*)::BIGINT AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year""",
    // session_window twin: gaps-and-islands per user (break at >= 30 min
    // inactivity; session end = last event + gap), same as stock_sessions
    "rel_user_sessions" -> """
WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, event_type FROM events),
brk AS (
  SELECT user_id, ts, event_type,
    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
      PARTITION BY user_id ORDER BY ts)) >= 1800 THEN 1 ELSE 0 END AS brk
  FROM e),
sid AS (
  SELECT user_id, ts, event_type,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM brk)
SELECT user_id, min(ts) AS session_start,
  max(ts) + INTERVAL 30 MINUTE AS session_end,
  count(*)::BIGINT AS n_events,
  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchases,
  (sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0) AS converted
FROM sid GROUP BY user_id, sid
ORDER BY user_id, session_start""",
    // interval sweep: the oracle states the plain GLOBAL running sum;
    // the engine runs the banded two-level prefix scan — hash equality
    // proves the rewrite
    "rel_concurrency" -> """
WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, event_type FROM events),
brk AS (
  SELECT user_id, ts,
    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
      PARTITION BY user_id ORDER BY ts)) >= 1800 THEN 1 ELSE 0 END AS brk
  FROM e),
sid AS (
  SELECT user_id, ts,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM brk),
sess AS (
  SELECT min(ts) AS session_start,
    max(ts) + INTERVAL 30 MINUTE AS session_end
  FROM sid GROUP BY user_id, sid),
deltas AS (
  SELECT t, CAST(sum(d) AS BIGINT) AS net_delta FROM (
    SELECT session_start AS t, 1 AS d FROM sess
    UNION ALL SELECT session_end AS t, -1 AS d FROM sess)
  GROUP BY t),
tl AS (
  SELECT t, net_delta,
    sum(net_delta) OVER (ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS concurrency
  FROM deltas),
mx AS (SELECT max(concurrency) AS mx FROM tl)
SELECT t, net_delta, CAST(concurrency AS BIGINT) AS concurrency,
  (concurrency = mx) AS is_peak
FROM tl CROSS JOIN mx ORDER BY t""",
    "rel_shipping_priority" -> s"""
SELECT l_orderkey, o_orderdate,
  ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate > TIMESTAMP '1997-06-30'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "rel_quantiles" -> """
SELECT l_returnflag,
  round(quantile_cont(l_extendedprice, 0.25)::DOUBLE, 6) AS p25_price,
  round(quantile_cont(l_extendedprice, 0.5)::DOUBLE, 6) AS p50_price,
  round(quantile_cont(l_extendedprice, 0.75)::DOUBLE, 6) AS p75_price,
  round(quantile_cont(l_extendedprice, 0.95)::DOUBLE, 6) AS p95_price,
  round(quantile_cont(l_discount, 0.5)::DOUBLE, 6) AS median_discount
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // self-checking sketch rows: the exact columns are recomputed here;
    // the booleans restate the engine-side sketch contracts (HLL/GK/CMS
    // within documented error bounds) as TRUE — a sketch regression on
    // the Spark side flips a bit and breaks the hash.
    "rel_approx_stats" -> """
SELECT l_returnflag,
  count(DISTINCT l_orderkey) AS exact_orders,
  round(quantile_cont(l_extendedprice, 0.5)::DOUBLE, 6) AS exact_median_price,
  TRUE AS hll_within_5pct,
  TRUE AS gk_median_within_1pct
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "rel_cms_user_counts" -> """
WITH u AS (SELECT unnest(generate_series(1, 20))::BIGINT AS user_id),
ex AS (SELECT user_id, count(*)::BIGINT AS exact_count FROM events
  WHERE user_id BETWEEN 1 AND 20 GROUP BY user_id)
SELECT u.user_id, coalesce(ex.exact_count, 0)::BIGINT AS exact_count,
  TRUE AS cms_never_undercounts, TRUE AS cms_within_eps
FROM u LEFT JOIN ex USING (user_id) ORDER BY user_id""",
    "rel_orders_rollup" -> s"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
  ${dsum("o_totalprice")} AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "rel_monthly_growth" -> s"""
WITH m AS (
  SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
    ${dsum("o_totalprice")} AS revenue, count(*) AS n_orders
  FROM orders GROUP BY 1)
SELECT month, revenue, n_orders,
  round((revenue - lag(revenue) OVER (ORDER BY month)) /
    lag(revenue) OVER (ORDER BY month) * 100, 6) AS growth_pct,
  round(revenue / first_value(revenue) OVER (
    ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
    AS vs_first
FROM m ORDER BY month""",
    // dormancy census: stated recency bands, exact integer counts,
    // broadcast scalar max date
    "rel_dormancy" -> """
WITH last AS (
  SELECT o_custkey, max(o_orderdate) AS last_order
  FROM orders GROUP BY 1),
ref AS (SELECT max(o_orderdate) AS ref_date FROM orders),
banded AS (
  SELECT o_custkey,
    date_diff('day', last_order::DATE, ref_date::DATE)::BIGINT AS days,
    CASE WHEN date_diff('day', last_order::DATE, ref_date::DATE) <= 30 THEN 0
         WHEN date_diff('day', last_order::DATE, ref_date::DATE) <= 60 THEN 31
         WHEN date_diff('day', last_order::DATE, ref_date::DATE) <= 90 THEN 61
         WHEN date_diff('day', last_order::DATE, ref_date::DATE) <= 180 THEN 91
         ELSE 181 END::BIGINT AS band_lo
  FROM last CROSS JOIN ref),
n AS (SELECT count(*)::BIGINT AS n_total FROM banded)
SELECT band_lo, count(*)::BIGINT AS n_customers,
  min(days)::BIGINT AS min_days, max(days)::BIGINT AS max_days,
  round(count(*) / CAST(n_total AS DOUBLE), 6) AS share
FROM banded CROSS JOIN n
GROUP BY band_lo, n_total ORDER BY band_lo""",
    // cohort retention: exact integer counts on the months x months
    // grid; months_since via date_diff on month-truncated stamps
    "rel_cohort_retention" -> """
WITH active AS (
  SELECT DISTINCT o_custkey,
    date_trunc('month', o_orderdate)::TIMESTAMP AS month
  FROM orders),
cohort AS (
  SELECT o_custkey, min(month) AS cohort_month
  FROM active GROUP BY 1),
sizes AS (
  SELECT cohort_month, count(*)::BIGINT AS cohort_size
  FROM cohort GROUP BY 1),
grid AS (
  SELECT c.cohort_month,
    date_diff('month', c.cohort_month, a.month)::BIGINT AS months_since,
    count(*)::BIGINT AS n_active
  FROM active a JOIN cohort c USING (o_custkey)
  GROUP BY 1, 2)
SELECT g.cohort_month, g.months_since, s.cohort_size, g.n_active,
  round(g.n_active / CAST(s.cohort_size AS DOUBLE), 6) AS retention
FROM grid g JOIN sizes s USING (cohort_month)
ORDER BY cohort_month, months_since""",
    // Q18-shape: HAVING-subquery semi-join reduction, alias reused in
    // HAVING (DuckDB permits it; Spark side filters the agg output)
    "rel_big_orders" -> s"""
WITH big AS (
  SELECT l_orderkey, ${dsum("l_quantity")} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING total_qty > 300)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    // Q22-shape: scalar-subquery balance gate + NOT EXISTS anti-join on
    // the date-filtered orders slice
    "rel_idle_customers" -> s"""
WITH ab AS (
  SELECT ${dsum("c_acctbal")} / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0)
SELECT n_name, count(*) AS n_customers, ${dsum("c_acctbal")} AS total_bal
FROM customer CROSS JOIN ab
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY n_name ORDER BY n_name""",
    // Q21-shape: the oracle states the classic DOUBLY-CORRELATED form
    // (EXISTS another supplier in the order, NOT EXISTS another LATE
    // supplier); the engine runs the decorrelated per-order aggregates
    // — hash equality proves the decorrelation exact
    "rel_late_suppliers" -> """
SELECT s_name, count(*)::BIGINT AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""",
    "rel_retention" -> """
WITH act AS (
  SELECT DISTINCT user_id, date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS d
  FROM events),
co AS (SELECT user_id, min(d) AS c FROM act GROUP BY user_id),
sz AS (SELECT c, count(*)::BIGINT AS cohort_size FROM co GROUP BY c),
m AS (
  SELECT c, date_diff('day', c, d)::BIGINT AS day_offset,
    count(*)::BIGINT AS n_active
  FROM act JOIN co USING (user_id) GROUP BY c, day_offset)
SELECT c AS cohort_date, day_offset, n_active, cohort_size,
  round(n_active::DOUBLE / cohort_size, 6) AS retention
FROM m JOIN sz USING (c) ORDER BY cohort_date, day_offset""",
    "rel_key_skew" -> """
WITH counts AS (
  SELECT l_suppkey, count(*)::BIGINT AS n_rows
  FROM lineitem GROUP BY l_suppkey),
st AS (SELECT sum(n_rows)::BIGINT AS total, count(*)::BIGINT AS n_keys
  FROM counts)
SELECT l_suppkey, n_rows,
  round(n_rows::DOUBLE / total, 6) AS pct_of_total,
  round(n_rows::DOUBLE * n_keys / total, 6) AS x_vs_avg
FROM counts CROSS JOIN st
ORDER BY n_rows DESC, l_suppkey LIMIT 10""",
    // funnel: the oracle states the classic row_number form of the
    // per-user first-event chain; tuple compares match the engine's
    // struct compares exactly
    "rel_funnel" -> """
WITH e AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts, event_id FROM events),
v AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM e WHERE event_type = 'view') WHERE rn = 1),
c AS (
  SELECT user_id, ts, event_id FROM (
    SELECT e.user_id, e.ts, e.event_id,
      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
    FROM e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND (e.ts, e.event_id) > (v.ts, v.event_id))
  WHERE rn = 1),
p AS (
  SELECT user_id, ts, event_id FROM (
    SELECT e.user_id, e.ts, e.event_id,
      row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
    FROM e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND (e.ts, e.event_id) > (c.ts, c.event_id))
  WHERE rn = 1),
base AS (SELECT count(*)::BIGINT AS base_users FROM v),
st AS (
  SELECT '1_view' AS stage, count(*)::BIGINT AS n_users FROM v
  UNION ALL SELECT '2_click', count(*)::BIGINT FROM c
  UNION ALL SELECT '3_purchase', count(*)::BIGINT FROM p)
SELECT stage, n_users,
  round(n_users::DOUBLE / base_users, 6) AS conversion
FROM st CROSS JOIN base ORDER BY stage""",
    // Q17-shape: the oracle states the CORRELATED scalar subquery; the
    // engine runs the decorrelated per-key-aggregate + join form —
    // hash equality proves the decorrelation exact
    "rel_small_qty_revenue" -> s"""
SELECT ${dsum("l_extendedprice")} / 7.0 AS avg_yearly,
  count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT CAST(CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
      / count(*) * 0.2
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",
    // the oracle states the PLAIN join: hash equality proves the salted
    // plan is value-invisible
    "rel_salted_supplier_revenue" -> s"""
SELECT s_name, ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
  count(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name ORDER BY revenue DESC, s_name LIMIT 10""",
    // identical IEEE bucket expression as the engine: sub, div, mul 10,
    // floor, clamp — no width_bucket (absent in DuckDB; a reassociated
    // equivalent could flip edge values across buckets)
    "rel_price_histogram" -> """
WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
  FROM lineitem)
SELECT CASE WHEN hi = lo THEN 0
  ELSE least(floor((l_extendedprice - lo) / (hi - lo) * 10), 9) END::BIGINT AS bucket,
  count(*) AS n_items
FROM lineitem CROSS JOIN b
GROUP BY bucket ORDER BY bucket""",
    "rel_set_ops" -> """
WITH b96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
b97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
aft AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) > 1996)
SELECT 'both_96_97' AS cohort, o_custkey FROM (
  SELECT o_custkey FROM b96 INTERSECT SELECT o_custkey FROM b97)
UNION ALL
SELECT 'churned_after_96' AS cohort, o_custkey FROM (
  SELECT o_custkey FROM b96 EXCEPT SELECT o_custkey FROM aft)
ORDER BY cohort, o_custkey""",
    "rel_nation_balance" -> s"""
WITH cu AS (
  SELECT c_nationkey AS nationkey, ${dsum("c_acctbal")} AS cust_bal,
    count(*) AS n_customers
  FROM customer GROUP BY c_nationkey),
su AS (
  SELECT s_nationkey AS nationkey, ${dsum("s_acctbal")} AS supp_bal,
    count(*) AS n_suppliers
  FROM supplier GROUP BY s_nationkey)
SELECT n_name,
  coalesce(n_customers, 0) AS n_customers,
  coalesce(cust_bal, 0.0) AS cust_bal,
  coalesce(n_suppliers, 0) AS n_suppliers,
  coalesce(supp_bal, 0.0) AS supp_bal
FROM cu FULL OUTER JOIN su USING (nationkey)
JOIN nation ON nationkey = n_nationkey
ORDER BY n_name""",
    "rel_grouping_sets" -> s"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
  ${dsum("o_totalprice")} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "rel_orders_cube" -> s"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
  ${dsum("o_totalprice")} AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    // equal-frequency deciles: broadcast exact-quantile boundaries,
    // decile = count of boundaries strictly below the row
    "rel_price_deciles" -> s"""
WITH b AS (
  SELECT ${(1 to 9).map(i =>
      s"round(quantile_cont(l_extendedprice, 0.$i)::DOUBLE, 6) AS b$i")
      .mkString(", ")}
  FROM lineitem)
SELECT (${(1 to 9).map(i =>
      s"CASE WHEN l_extendedprice > b$i THEN 1 ELSE 0 END")
      .mkString(" + ")})::BIGINT AS decile,
  count(*) AS n_items
FROM lineitem CROSS JOIN b
GROUP BY decile ORDER BY decile""",
    // time-bounded conversion: first view, first purchase within 1h
    // after it (tuple "after", inclusive horizon), denominator kept
    "rel_funnel_windowed" -> """
WITH e AS (
  SELECT user_id, event_type, ts::TIMESTAMP AS ts, event_id FROM events),
v AS (
  SELECT user_id, ts AS v_ts, event_id AS v_event FROM (
    SELECT user_id, ts, event_id,
      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM e WHERE event_type = 'view') WHERE rn = 1),
p AS (
  SELECT user_id, p_ts FROM (
    SELECT v.user_id, e.ts AS p_ts,
      row_number() OVER (PARTITION BY v.user_id
        ORDER BY e.ts, e.event_id) AS rn
    FROM v JOIN e ON e.user_id = v.user_id AND e.event_type = 'purchase'
      AND (e.ts, e.event_id) > (v_ts, v_event)
      AND e.ts <= v_ts + INTERVAL 1 HOUR) WHERE rn = 1)
SELECT v.user_id AS user_id, v_ts, p_ts, (p_ts IS NOT NULL) AS converted
FROM v LEFT JOIN p ON v.user_id = p.user_id
ORDER BY v.user_id""",
    // rolling DAU/WAU: the oracle states the NAIVE range-join form; the
    // engine runs the explode-contributions rewrite — hash equality
    // proves the rewrite exact
    "rel_rolling_active_users" -> """
WITH act AS (
  SELECT DISTINCT user_id, date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS d
  FROM events),
dau AS (SELECT d, count(DISTINCT user_id)::BIGINT AS dau FROM act GROUP BY d),
wau AS (
  SELECT dd.d, count(DISTINCT a.user_id)::BIGINT AS wau
  FROM (SELECT DISTINCT d FROM act) dd
  JOIN act a ON a.d BETWEEN dd.d - INTERVAL 6 DAY AND dd.d
  GROUP BY dd.d)
SELECT d AS day, dau, wau
FROM dau JOIN wau USING (d) ORDER BY day""",
    // RANGE-interval frame: trailing 90 days by ORDER-BY value distance;
    // integral epoch seconds so both engines frame identically, DECIMAL
    // window sum so segment-tree vs running-frame addition can't diverge
    "rel_trailing_spend" -> """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
    AS trailing_spend,
  count(*) OVER w AS trailing_orders
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
  RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderdate, o_orderkey""",
    // Q6-shape: single-scan filter-aggregate
    "rel_revenue_delta" -> s"""
SELECT ${dsum("l_extendedprice * l_discount")} AS revenue,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24""",
    // Q10-shape: returned-item revenue per customer, one quarter
    "rel_returned_items" -> s"""
SELECT c_custkey, c_name, c_acctbal, n_name,
  ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20""",
    // Q13-shape: order-count distribution with the zero bucket — the
    // priority predicate must live in the LEFT JOIN condition
    "rel_order_count_dist" -> """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC""",
    // Q19-shape: the three OR'd (brand, size, quantity) conjunct groups
    "rel_disjunctive_revenue" -> s"""
SELECT ${dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
  count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)""",
    // Q15-shape: suppliers at the quarterly revenue max, ties kept
    "rel_top_supplier" -> s"""
WITH revenue AS (
  SELECT l_suppkey,
    ${dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey""",
    // Q16-shape: distinct shipping suppliers per part class, deficit
    // suppliers excluded via NOT IN
    "rel_supplier_diversity" -> """
SELECT p_brand, p_type, p_size,
  count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 9, 19, 29, 39, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    // Q8-shape: per-year market share of one nation inside ASIA's
    // ECONOMY-part import volume; numerator and denominator are two
    // conditional decimal sums of the same pass
    "rel_market_share" -> s"""
SELECT year(o_orderdate)::BIGINT AS o_year,
  round(${dsum("CASE WHEN n2.n_name = 'NATION_7' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
    / ${dsum("l_extendedprice * (1 - l_discount)")}, 6) AS mkt_share,
  ${dsum("CASE WHEN n2.n_name = 'NATION_7' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS nation_volume,
  ${dsum("l_extendedprice * (1 - l_discount)")} AS total_volume
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY o_year
ORDER BY o_year""",
    "rel_scd2_history" -> """
WITH e AS (
  SELECT user_id, event_id, value, ts::TIMESTAMP AS valid_from
  FROM events WHERE value IS NOT NULL AND NOT isnan(value))
SELECT user_id,
  CAST(row_number() OVER w AS BIGINT) AS version,
  event_id, value, valid_from,
  lead(valid_from) OVER w AS valid_to,
  (lead(valid_from) OVER w IS NULL) AS is_current
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
ORDER BY user_id, version""",
    // SCD2 point-in-time join: each purchase resolves to the version
    // valid at its event time (half-open tiling → exactly one match)
    "rel_pit_join" -> """
WITH e AS (
  SELECT user_id, event_id, value, ts::TIMESTAMP AS valid_from
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)),
dim AS (
  SELECT user_id AS d_user,
    CAST(row_number() OVER w AS BIGINT) AS version,
    value AS dim_value, valid_from,
    lead(valid_from) OVER w AS valid_to
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)),
facts AS (
  SELECT user_id, event_id AS fact_id, ts::TIMESTAMP AS ts
  FROM events WHERE event_type = 'purchase')
SELECT fact_id, user_id, ts, version, dim_value
FROM facts f JOIN dim d ON f.user_id = d.d_user
  AND f.ts >= d.valid_from
  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
ORDER BY fact_id""",
    // skyline: the oracle states the declarative NOT-EXISTS dominance
    // definition; the engine runs the banded distinct-value scan —
    // hash equality proves the rewrite.
    "rel_skyline" -> """
SELECT p_brand, p_partkey, p_retailprice, p_size::BIGINT AS p_size
FROM part p1
WHERE NOT EXISTS (
  SELECT 1 FROM part p2
  WHERE p2.p_brand = p1.p_brand
    AND p2.p_retailprice <= p1.p_retailprice
    AND p2.p_size >= p1.p_size
    AND (p2.p_retailprice < p1.p_retailprice OR p2.p_size > p1.p_size))
ORDER BY p_brand, p_retailprice, p_partkey""",
    // basket pairs: the oracle is the UNPRUNED pair join — the engine's
    // apriori item prune is provably result-invariant (pair support ≤
    // item support) and hash equality certifies it.
    "rel_basket_pairs" -> """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ic AS (SELECT l_partkey, count(*)::BIGINT AS n_orders
  FROM items GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    count(*)::BIGINT AS pair_orders
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
tot AS (SELECT count(*)::BIGINT AS total_orders FROM orders)
SELECT part_a, part_b, pair_orders,
  ia.n_orders AS orders_a, ib.n_orders AS orders_b,
  round(pair_orders::DOUBLE / total_orders, 6) AS support,
  round(pair_orders::DOUBLE * total_orders /
    (ia.n_orders * ib.n_orders), 6) AS lift
FROM pairs
JOIN ic ia ON ia.l_partkey = part_a
JOIN ic ib ON ib.l_partkey = part_b
CROSS JOIN tot
ORDER BY part_a, part_b""",
    // directional association rules: the basket pairs + confidences
    "rel_basket_rules" -> """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ic AS (SELECT l_partkey, count(*)::BIGINT AS n_orders
  FROM items GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
    count(*)::BIGINT AS pair_orders
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
tot AS (SELECT count(*)::BIGINT AS total_orders FROM orders)
SELECT part_a, part_b, pair_orders,
  ia.n_orders AS orders_a, ib.n_orders AS orders_b,
  round(pair_orders::DOUBLE / total_orders, 6) AS support,
  round(pair_orders::DOUBLE * total_orders /
    (ia.n_orders * ib.n_orders), 6) AS lift,
  round(pair_orders::DOUBLE / ia.n_orders, 6) AS conf_a_to_b,
  round(pair_orders::DOUBLE / ib.n_orders, 6) AS conf_b_to_a
FROM pairs
JOIN ic ia ON ia.l_partkey = part_a
JOIN ic ib ON ib.l_partkey = part_b
CROSS JOIN tot
ORDER BY part_a, part_b""",
    "rel_event_transitions" -> """
WITH steps AS (
  SELECT event_type AS from_type,
    lead(event_type) OVER (PARTITION BY user_id
      ORDER BY ts::TIMESTAMP, event_id) AS to_type
  FROM events QUALIFY to_type IS NOT NULL),
c AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n_transitions
  FROM steps GROUP BY 1, 2)
SELECT from_type, to_type, n_transitions,
  round(n_transitions::DOUBLE /
    sum(n_transitions) OVER (PARTITION BY from_type), 6) AS prob
FROM c ORDER BY from_type, to_type""",
    // Markov stationary distribution: unrolled power iterations over
    // the exact transition matrix; 1e-12-grid decimal inflow sums;
    // out-edge-less states keep their own mass
    "rel_markov_stationary" -> {
      val iters = graft.operators.Relational.MarkovIters
      val chain = (1 to iters).map { i =>
        val prev = s"pi${i - 1}"
        s"""
pi$i AS (
  SELECT s.state, coalesce(inf.v, 0.0) + coalesce(k.p, 0.0) AS p
  FROM st s
  LEFT JOIN (
    SELECT tp.to_type AS state,
      CAST(CAST(sum(CAST(round(pi.p * tp.p, 12) AS DECIMAL(28,12)))
        AS VARCHAR) AS DOUBLE) AS v
    FROM $prev pi JOIN tp ON pi.state = tp.from_type
    GROUP BY 1) inf ON s.state = inf.state
  LEFT JOIN (
    SELECT pi.state, pi.p FROM $prev pi
    LEFT JOIN fs ON pi.state = fs.state
    WHERE fs.state IS NULL) k ON s.state = k.state)"""
      }.mkString(",", ",", "")
      s"""
WITH steps AS (
  SELECT event_type AS from_type,
    lead(event_type) OVER (PARTITION BY user_id
      ORDER BY ts::TIMESTAMP, event_id) AS to_type
  FROM events QUALIFY to_type IS NOT NULL),
c AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n FROM steps
  GROUP BY 1, 2),
tp AS (
  SELECT from_type, to_type,
    n::DOUBLE / sum(n) OVER (PARTITION BY from_type) AS p
  FROM c),
st AS (
  SELECT DISTINCT state FROM (
    SELECT from_type AS state FROM tp
    UNION ALL SELECT to_type FROM tp)),
fs AS (SELECT DISTINCT from_type AS state FROM tp),
ns AS (SELECT count(*)::BIGINT AS n FROM st),
pi0 AS (SELECT state, 1.0::DOUBLE / n AS p FROM st CROSS JOIN ns)$chain
SELECT state AS event_type, round(p, 6) AS stationary_prob
FROM pi$iters ORDER BY event_type"""
    },
    // column profile: the oracle re-states each per-column row as its
    // own aggregate; the engine computes all of them in ONE scan.
    "rel_profile" -> {
      val nRows = "count(*)::BIGINT AS n_rows"
      def num(c: String, cast: String) = s"""
SELECT '$c' AS column_name, $nRows,
  count(*) FILTER ($c IS NULL)::BIGINT AS n_nulls,
  count(DISTINCT $c)::BIGINT AS n_distinct,
  min($c)$cast AS min_num, max($c)$cast AS max_num,
  NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
FROM orders"""
      def str(c: String, fmt: String => String) = s"""
SELECT '$c' AS column_name, $nRows,
  count(*) FILTER ($c IS NULL)::BIGINT AS n_nulls,
  count(DISTINCT $c)::BIGINT AS n_distinct,
  NULL::DOUBLE AS min_num, NULL::DOUBLE AS max_num,
  ${fmt(s"min($c)")} AS min_str, ${fmt(s"max($c)")} AS max_str
FROM orders"""
      val tsF = (e: String) => s"strftime($e::TIMESTAMP, '%Y-%m-%d %H:%M:%S')"
      val idF = (e: String) => e
      Seq(num("o_orderkey", "::DOUBLE"), num("o_custkey", "::DOUBLE"),
        num("o_totalprice", ""),
        str("o_orderstatus", idF), str("o_orderpriority", idF),
        str("o_orderdate", tsF))
        .mkString("", "\nUNION ALL", "\nORDER BY column_name")
    },
    // Welch A/B: Σx/Σx² as DECIMAL(28,10) (order-independent), cast to
    // DOUBLE once; t/df from the ROUNDED mean/var columns — both
    // engines start every scalar step from identical inputs.
    "rel_ab_test" -> """
WITH base AS (
  SELECT event_type,
    count(*) FILTER (user_id % 2 = 0)::BIGINT AS n_a,
    count(*) FILTER (user_id % 2 = 1)::BIGINT AS n_b,
    CAST(sum(CASE WHEN user_id % 2 = 0
      THEN CAST(value AS DECIMAL(28,10)) END) AS DOUBLE) AS sx_a,
    CAST(sum(CASE WHEN user_id % 2 = 0
      THEN CAST(value * value AS DECIMAL(28,10)) END) AS DOUBLE) AS sxx_a,
    CAST(sum(CASE WHEN user_id % 2 = 1
      THEN CAST(value AS DECIMAL(28,10)) END) AS DOUBLE) AS sx_b,
    CAST(sum(CASE WHEN user_id % 2 = 1
      THEN CAST(value * value AS DECIMAL(28,10)) END) AS DOUBLE) AS sxx_b
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
  GROUP BY event_type),
m AS (
  SELECT event_type, n_a, n_b,
    CASE WHEN n_a > 0 THEN round(sx_a / n_a, 6) END AS mean_a,
    CASE WHEN n_b > 0 THEN round(sx_b / n_b, 6) END AS mean_b,
    CASE WHEN n_a > 1 THEN
      round((sxx_a - sx_a * sx_a / n_a) / (n_a - 1), 6) END AS var_a,
    CASE WHEN n_b > 1 THEN
      round((sxx_b - sx_b * sx_b / n_b) / (n_b - 1), 6) END AS var_b
  FROM base)
SELECT event_type, n_a, n_b, mean_a, mean_b, var_a, var_b,
  CASE WHEN var_a IS NOT NULL AND var_b IS NOT NULL
      AND var_a / n_a + var_b / n_b > 0 THEN
    round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6)
  END AS t_stat,
  CASE WHEN var_a IS NOT NULL AND var_b IS NOT NULL
      AND var_a / n_a + var_b / n_b > 0 THEN
    round((var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b) /
      (var_a / n_a * (var_a / n_a) / (n_a - 1) +
       var_b / n_b * (var_b / n_b) / (n_b - 1)), 6)
  END AS welch_df
FROM m ORDER BY event_type""",
    // concentration report: quantile_cont matches the engine's banded
    // exact-percentile interpolation (the rel_quantiles precedent);
    // thresholds compare UNROUNDED (interpolated values land between
    // data points, so last-ulp drift cannot flip a membership).
    "rel_revenue_concentration" -> {
      def row(pct: Int, p: Double) = s"""
SELECT ${pct}::BIGINT AS top_pct,
  round((SELECT quantile_cont(rev, $p) FROM rev), 6) AS threshold,
  count(*) FILTER (rev >= (SELECT quantile_cont(rev, $p) FROM rev))::BIGINT
    AS n_customers,
  round(CAST(CAST(sum(CAST(CASE WHEN rev >= (SELECT quantile_cont(rev, $p) FROM rev)
      THEN rev ELSE 0.0 END AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) /
    (SELECT CAST(CAST(sum(CAST(rev AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) FROM rev), 6)
    AS revenue_share
FROM rev"""
      """
WITH rev AS (
  SELECT o_custkey, CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
    AS rev
  FROM orders GROUP BY o_custkey)""" +
        Seq(row(1, 0.99), row(5, 0.95), row(10, 0.90))
          .mkString("", "\nUNION ALL", "\nORDER BY top_pct")
    },
    // fuzzy pairs: the oracle is the QUADRATIC all-pairs levenshtein
    // join; the engine's deletion-neighborhood blocking must reproduce
    // it exactly — hash equality proves no candidate is lost.
    // candidate generation by deletion neighborhoods (SymSpell): two
    // names at levenshtein distance 1 ALWAYS share a variant — for a
    // substitution, deleting the edited position from both yields the
    // same string; for an insertion/deletion, the shorter name IS a
    // deletion variant of the longer (and its own pos-0 identity
    // variant) — so the variant equi-join is provably COMPLETE and
    // the exact levenshtein filter keeps the stated semantics while
    // the all-pairs form is quadratic in distinct names (infeasible
    // at the sf1 sweep scale). Hash equality at sf0.01/sf0.1 against
    // the engine re-verified value-identical after this change.
    "rel_fuzzy_names" -> s"""
WITH n AS (SELECT DISTINCT c_name AS name FROM customer),
$delVarCte
SELECT DISTINCT a.name AS name_a, b.name AS name_b
FROM var a JOIN var b ON a.v = b.v AND a.name < b.name
WHERE levenshtein(a.name, b.name) = 1
ORDER BY name_a, name_b""",
    // Benford: digit via the exact integer-cents string (no log10 at
    // power-of-ten boundaries); shares are the Scala double literals.
    "rel_benford" -> {
      val shareCase = (1 to 9).map(d =>
        s"WHEN $d THEN ${math.log10(1.0 + 1.0 / d)}")
        .mkString("CASE digit ", " ", " END")
      s"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
    AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders),
c AS (SELECT digit, count(*)::BIGINT AS n_obs FROM d GROUP BY digit),
t AS (SELECT sum(n_obs)::BIGINT AS n_total FROM c),
s AS (SELECT digit, n_obs, n_total,
  CAST($shareCase AS DOUBLE) AS bshare FROM c, t)
SELECT digit::BIGINT AS digit, n_obs,
  round(n_obs::DOUBLE / n_total, 6) AS obs_share,
  round(bshare, 6) AS benford_share,
  round((n_obs - n_total * bshare) * (n_obs - n_total * bshare) /
    (n_total * bshare), 6) AS chi2_term
FROM s ORDER BY digit"""
    },
    // ABC: the oracle is the one-window global descending prefix sum;
    // the engine's banded two-level prefix must reproduce every rank,
    // cumulative share and class boundary bit-exactly.
    "rel_abc_parts" -> """
WITH rev AS (
  SELECT l_partkey,
    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
      AS rev_dec
  FROM lineitem GROUP BY l_partkey),
t AS (SELECT CAST(sum(rev_dec) AS DOUBLE) AS total FROM rev),
r AS (
  SELECT l_partkey, CAST(rev_dec AS DOUBLE) AS rev,
    row_number() OVER (ORDER BY CAST(rev_dec AS DOUBLE) DESC,
      l_partkey)::BIGINT AS rev_rank,
    CAST(sum(rev_dec) OVER (ORDER BY CAST(rev_dec AS DOUBLE) DESC,
      l_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS DOUBLE) AS cum
  FROM rev)
SELECT l_partkey, rev_rank, round(rev, 6) AS revenue,
  round(cum / total, 6) AS cum_share,
  CASE WHEN cum / total <= 0.80 THEN 'A'
       WHEN cum / total <= 0.95 THEN 'B'
       ELSE 'C' END AS abc_class
FROM r, t ORDER BY rev_rank""",
    "rel_ship_latency" -> """
WITH lat AS (
  SELECT o_orderpriority,
    (epoch_us(l_shipdate::TIMESTAMP) - epoch_us(o_orderdate::TIMESTAMP))
      / 86400000000.0 AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT o_orderpriority,
  round(quantile_cont(v, 0.5)::DOUBLE, 6) AS p50_days,
  round(quantile_cont(v, 0.9)::DOUBLE, 6) AS p90_days,
  round(quantile_cont(v, 0.99)::DOUBLE, 6) AS p99_days
FROM lat GROUP BY o_orderpriority
ORDER BY o_orderpriority""",
    "rel_activity_heatmap" -> """
WITH c AS (
  SELECT (dayofweek(ts::TIMESTAMP) + 1)::BIGINT AS dow,
    hour(ts::TIMESTAMP)::BIGINT AS hour_of_day,
    count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2),
t AS (SELECT sum(n_events)::BIGINT AS n_total FROM c)
SELECT dow, hour_of_day, n_events,
  round(n_events::DOUBLE / n_total, 6) AS share
FROM c, t ORDER BY dow, hour_of_day""",
    "rel_cohort_ltv" -> """
WITH o AS (
  SELECT o_custkey, o_totalprice,
    (year(o_orderdate) * 12 + month(o_orderdate))::BIGINT AS ym
  FROM orders),
co AS (SELECT o_custkey, min(ym) AS cohort_ym FROM o GROUP BY 1),
cells AS (
  SELECT cohort_ym, (ym - cohort_ym)::BIGINT AS month_offset,
    count(*)::BIGINT AS n_orders,
    count(DISTINCT o_custkey)::BIGINT AS n_active,
    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
  FROM o JOIN co USING (o_custkey)
  GROUP BY cohort_ym, month_offset)
SELECT cohort_ym, month_offset, n_orders, n_active,
  CAST(rev_dec AS DOUBLE) AS revenue,
  CAST(sum(rev_dec) OVER (PARTITION BY cohort_ym ORDER BY month_offset
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS cum_revenue
FROM cells ORDER BY cohort_ym, month_offset""",
    // near-duplicate payments: the oracle is the per-customer QUADRATIC
    // comparison; the engine's digit-length banding must reproduce it
    // exactly (a <=1.05 ratio can never span beyond adjacent bands).
    "rel_dup_payments" -> """
SELECT a.o_custkey,
  a.o_orderkey AS order_a, b.o_orderkey AS order_b,
  a.o_totalprice AS price_a, b.o_totalprice AS price_b,
  a.o_orderdate::TIMESTAMP AS date_a, b.o_orderdate::TIMESTAMP AS date_b
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
  AND a.o_orderkey < b.o_orderkey
  AND abs(a.o_totalprice - b.o_totalprice) <=
      0.05 * greatest(a.o_totalprice, b.o_totalprice)
  AND abs(epoch_us(b.o_orderdate::TIMESTAMP) -
          epoch_us(a.o_orderdate::TIMESTAMP)) <= 604800000000
ORDER BY a.o_custkey, order_a, order_b""",
    "rel_top_paths" -> """
WITH e AS (
  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type FROM events),
s AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
    THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM s),
paths AS (
  SELECT user_id, sid,
    array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>')
      AS path
  FROM sess GROUP BY user_id, sid)
SELECT path, count(*)::BIGINT AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20""",
    // entity groups: recursive-CTE connected components over the
    // fuzzy-match edges (deletion-variant candidates + exact filter —
    // see rel_fuzzy_names for the completeness argument); the
    // engine's blocking + star-rounds CC must land on identical
    // component minima.
    // the closure runs over the NAME graph, then maps custkeys: a
    // name's copies all join its cluster through any shared fuzzy
    // partner (A1—B—A2), so custkey-component = copies of the name
    // cluster's members and its min custkey = min over member names'
    // custkeys — equivalent to the custkey-graph closure but
    // invariant to copy multiplicity (the custkey-graph recursion is
    // 100× the edges on MakeScale data); isolated names keep their
    // own custkey via the same LEFT JOIN / coalesce
    // name-id mapping: nid = min custkey per name. The custkey-graph
    // component's min custkey equals min over member NAMES of each
    // name's min custkey (the component contains every copy of every
    // member name), so closing over integer nids yields the same
    // entity labels with BIGINT recursion keys (an order of magnitude
    // cheaper than string labels) and cost invariant to MakeScale's
    // copy multiplicity
    "rel_entity_groups" -> s"""
WITH RECURSIVE nm AS (
  SELECT c_name AS name, min(c_custkey) AS nid FROM customer GROUP BY 1),
n AS (SELECT name FROM nm),
$delVarCte,
fp AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b
  FROM var a JOIN var b ON a.v = b.v AND a.name < b.name
  WHERE levenshtein(a.name, b.name) = 1),
e AS (
  SELECT na.nid AS a, nb.nid AS b
  FROM fp JOIN nm na ON fp.name_a = na.name
  JOIN nm nb ON fp.name_b = nb.name),
edges(a, b) AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
reach(node, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON r.node = e.a),
cc AS (SELECT node, min(label) AS cluster FROM reach GROUP BY node)
SELECT c.c_custkey, c.c_name,
  coalesce(cc.cluster, c.c_custkey)::BIGINT AS entity_id
FROM customer c
LEFT JOIN nm ON c.c_name = nm.name
LEFT JOIN cc ON nm.nid = cc.node
ORDER BY c.c_custkey""",
    // Gini: the oracle states the one-window global rank; the engine
    // runs the banded two-level rank — hash equality proves the
    // distributed form exact. Rank-weighted sums as DECIMAL (exact
    // integer multipliers), closing algebra in shared double math.
    // Kaplan-Meier survival: exclusive-cumulative risk sets, 1e-12
    // grid ln(1-d/n) terms, exact-zero pin after a total-death step
    "rel_survival_km" -> s"""
WITH cst AS (
  SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l
  FROM orders GROUP BY 1),
ct AS (SELECT max(o_orderdate) AS cutoff FROM orders),
cu AS (
  SELECT date_diff('day', f, l)::BIGINT AS duration,
    (l < cutoff - INTERVAL ${graft.operators.Relational.KmChurnDays}
      DAY) AS event
  FROM cst CROSS JOIN ct),
bd AS (
  SELECT duration, count(*)::BIGINT AS n_dur,
    count(*) FILTER (event)::BIGINT AS n_events
  FROM cu GROUP BY 1),
tt AS (SELECT CAST(sum(n_dur) AS BIGINT) AS n_total FROM bd),
rk AS (
  SELECT duration, n_dur, n_events,
    n_total - coalesce(CAST(sum(n_dur) OVER (ORDER BY duration
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      AS n_risk
  FROM bd CROSS JOIN tt),
tm AS (
  SELECT duration, n_risk, n_events,
    CASE WHEN n_events = n_risk THEN 1 ELSE 0 END AS dead_all,
    CASE WHEN n_events < n_risk THEN
      CAST(round(ln(1.0 - n_events::DOUBLE / n_risk), 12)
        AS DECIMAL(18,12)) END AS term
  FROM rk)
SELECT duration, n_risk, n_events,
  CASE WHEN max(dead_all) OVER cw > 0 THEN 0.0
  ELSE round(exp(CAST(sum(term) OVER cw AS DOUBLE)), 6)
  END AS km_survival
FROM tm
WINDOW cw AS (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING
  AND CURRENT ROW)
ORDER BY duration""",
    // DFT seasonality probe: small-argument cos/sin projections on
    // the 1e-10 grid, variance-share per candidate period
    "rel_seasonality_dft" -> {
      val twoPi = 2 * math.Pi
      val blocks = graft.operators.Relational.DftPeriods.map { p =>
        s"""
SELECT $p::BIGINT AS period_days, nd AS n_days,
  CASE WHEN sst > 0.0 THEN
    round((a * a + b * b) / (nd * sst), 6) END AS power_share
FROM (
  SELECT nd,
    CAST(CAST(sum(CAST(round(xc * cos($twoPi * (t % $p)::DOUBLE / $p), 10)
      AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS a,
    CAST(CAST(sum(CAST(round(xc * sin($twoPi * (t % $p)::DOUBLE / $p), 10)
      AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS b,
    CAST(CAST(sum(CAST(round(xc * xc, 10) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
      AS sst
  FROM based GROUP BY nd)"""
      }.mkString("\nUNION ALL")
      s"""
WITH daily AS (
  SELECT o_orderdate AS d, count(*)::BIGINT AS x
  FROM orders GROUP BY 1),
g AS (
  SELECT min(d) AS d0, count(*)::BIGINT AS nd,
    CAST(sum(x) AS BIGINT) AS sx
  FROM daily),
based AS (
  SELECT x, nd, date_diff('day', d0, d)::BIGINT AS t,
    x::DOUBLE - sx::DOUBLE / nd AS xc
  FROM daily CROSS JOIN g)$blocks
ORDER BY period_days"""
    },
    // Theil-T decomposition: decimal-exact revenue sums, 1e-12-grid
    // per-customer terms, 25-row group stats, pinned-order ratios
    "rel_theil" -> """
WITH rev AS (
  SELECT o_custkey,
    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS x
  FROM orders GROUP BY 1),
rc AS (
  SELECT n.n_name, r.x
  FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE r.x > 0),
pn AS (
  SELECT n_name, count(*)::BIGINT AS n_g,
    CAST(CAST(sum(CAST(x AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS s_g
  FROM rc GROUP BY 1),
t AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n_tot,
    CAST(CAST(sum(CAST(s_g AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS s_tot
  FROM pn),
st AS (
  SELECT n_name, n_g, s_g, n_tot, s_tot,
    s_g / n_g AS mu_g, s_tot / n_tot AS mu
  FROM pn CROSS JOIN t),
wt AS (
  SELECT rc.n_name, st.n_g, st.s_g, st.s_tot, st.mu_g, st.mu,
    CAST(round((rc.x / st.mu_g) * ln(rc.x / st.mu_g), 12)
      AS DECIMAL(28,12)) AS tt
  FROM rc JOIN st USING (n_name)),
ag AS (
  SELECT n_name, CAST(max(n_g) AS BIGINT) AS n_customers,
    max(s_g / s_tot) AS share, max(mu_g / mu) AS mr,
    CAST(sum(tt) AS DOUBLE) / max(n_g) AS tg
  FROM wt GROUP BY 1)
SELECT n_name, n_customers,
  round(share, 6) AS rev_share,
  round(mr, 6) AS mean_ratio,
  round(tg, 6) AS theil_within,
  round(share * tg, 6) AS within_contrib,
  round(share * ln(mr), 6) AS between_term
FROM ag ORDER BY n_name""",
    "rel_gini" -> """
WITH rev AS (
  SELECT o_custkey, CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
    AS rev
  FROM orders GROUP BY o_custkey),
r AS (
  SELECT rev, row_number() OVER (ORDER BY rev, o_custkey)::BIGINT AS rank
  FROM rev)
SELECT count(*)::BIGINT AS n_customers,
  CAST(CAST(sum(CAST(rev AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_revenue,
  round(2.0 * CAST(CAST(sum(CAST(rev AS DECIMAL(18,6)) * rank) AS VARCHAR) AS DOUBLE) /
      (count(*) * CAST(CAST(sum(CAST(rev AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)) -
    CAST(count(*) + 1 AS DOUBLE) / count(*), 6) AS gini
FROM r""",
    "rel_time_to_convert" -> """
WITH s AS (
  SELECT user_id, min(ts::TIMESTAMP) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY 1),
p AS (
  SELECT e.user_id, min(e.ts::TIMESTAMP) AS first_purchase_ts
  FROM events e JOIN s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP > s.signup_ts
  GROUP BY 1)
SELECT user_id, signup_ts, first_purchase_ts,
  epoch_us(first_purchase_ts) - epoch_us(signup_ts) AS us_to_convert,
  (first_purchase_ts IS NOT NULL) AS converted
FROM s LEFT JOIN p USING (user_id)
ORDER BY user_id""",
    // Per-nation OLS trend from EXACT moments: x BIGINT, y DECIMAL —
    // only the final closed form is double math, stated in the same
    // order as the Spark expression tree.
    // Atkinson (eps=1) inequality: exact decimal revenue sums, theil-
    // grade round-12 log grid, VARCHAR crossings at 1e5+ magnitudes
    "rel_atkinson" -> """
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice::DECIMAL(19,6)) AS xd
  FROM orders GROUP BY 1
  HAVING sum(o_totalprice::DECIMAL(19,6)) > 0),
m AS (
  SELECT count(*)::BIGINT AS n,
    CAST(CAST(sum(xd) AS VARCHAR) AS DOUBLE) AS s,
    CAST(CAST(sum(CAST(round(ln(CAST(CAST(xd AS VARCHAR) AS DOUBLE)),
      12) AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS slog
  FROM rev)
SELECT n AS n_customers,
  round(s / CAST(n AS DOUBLE), 6) AS mean_rev,
  round(exp(slog / CAST(n AS DOUBLE)), 6) AS geo_mean_rev,
  round(1.0 - exp(slog / CAST(n AS DOUBLE)) / (s / CAST(n AS DOUBLE)),
    6) AS atkinson
FROM m""",
    // Log-log OLS per brand: round-12 log grid, VARCHAR-crossed
    // DECIMAL(38,18) moment sums (squared-log sums pass 1e5 at sf0.1)
    "rel_price_elasticity" -> """
WITH rows_ AS (
  SELECT p_brand,
    CAST(round(ln(l_extendedprice /
      (CASE WHEN l_quantity <> 0.0 THEN l_quantity END) *
      (1.0 - l_discount)), 12) AS DOUBLE) AS lx,
    CAST(round(ln(l_quantity), 12) AS DOUBLE) AS ly
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_extendedprice /
      (CASE WHEN l_quantity <> 0.0 THEN l_quantity END) *
      (1.0 - l_discount) > 0.0),
m AS (
  SELECT p_brand, count(*)::BIGINT AS n_lines,
    CAST(CAST(sum(CAST(CAST(lx AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(sum(CAST(CAST(ly AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sum(CAST(CAST(lx * lx AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sxx,
    CAST(CAST(sum(CAST(CAST(lx * ly AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sxy,
    CAST(CAST(sum(CAST(CAST(ly * ly AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS syy
  FROM rows_ GROUP BY 1)
SELECT p_brand, n_lines,
  round((sxy - sx * sy / CAST(n_lines AS DOUBLE)) /
    (CASE WHEN sxx - sx * sx / CAST(n_lines AS DOUBLE) <> 0.0
      THEN sxx - sx * sx / CAST(n_lines AS DOUBLE) END), 6)
    AS elasticity,
  round((sxy - sx * sy / CAST(n_lines AS DOUBLE)) *
      (sxy - sx * sy / CAST(n_lines AS DOUBLE)) /
    (CASE WHEN (sxx - sx * sx / CAST(n_lines AS DOUBLE)) *
        (syy - sy * sy / CAST(n_lines AS DOUBLE)) <> 0.0
      THEN (sxx - sx * sx / CAST(n_lines AS DOUBLE)) *
        (syy - sy * sy / CAST(n_lines AS DOUBLE)) END), 6) AS r2
FROM m ORDER BY p_brand""",
    // deterministic DP release: salted hash32 uniform -> inverse-CDF
    // Laplace, clipped-revenue sensitivity, round-12 ln
    "rel_dp_release" -> """
WITH pc AS (
  SELECT o_custkey,
    least(CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE),
      100000.0) AS rev_clipped
  FROM orders GROUP BY 1),
bn AS (
  SELECT n_name, count(*)::BIGINT AS n_cust,
    CAST(CAST(sum(CAST(round(coalesce(rev_clipped, 0.0), 6)
      AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS rev_sum
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  LEFT JOIN pc ON c_custkey = o_custkey
  GROUP BY 1),
uu AS (
  SELECT n_name, n_cust, rev_sum,
    (CAST(('0x' || substr(md5('graft-dp:count:' || n_name), 1, 8))
      AS BIGINT) + 0.5) / 4294967296.0 AS uc,
    (CAST(('0x' || substr(md5('graft-dp:rev:' || n_name), 1, 8))
      AS BIGINT) + 0.5) / 4294967296.0 AS ur
  FROM bn)
SELECT n_name, 1.0 AS epsilon,
  round(CAST(n_cust AS DOUBLE) +
    (-(1.0) * sign(uc - 0.5) *
      round(ln(1.0 - 2.0 * abs(uc - 0.5)), 12)), 6) AS released_count,
  round(rev_sum +
    (-(100000.0) * sign(ur - 0.5) *
      round(ln(1.0 - 2.0 * abs(ur - 0.5)), 12)), 6)
    AS released_revenue
FROM uu ORDER BY n_name""",
    // Weibull probability-plot fit: NAIVE global rank window (engine
    // runs the banded scan), Bernard plotting positions, round-12
    // logs, VARCHAR-crossed DECIMAL(38,18) moment sums
    "rel_weibull_fit" -> """
WITH gaps AS (
  SELECT o_orderkey,
    CAST(date_diff('day', lag(o_orderdate, 1) OVER cw, o_orderdate)
      AS BIGINT) AS gap
  FROM orders
  WINDOW cw AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
  QUALIFY gap IS NOT NULL AND gap > 0),
rk AS (
  SELECT gap, row_number() OVER (ORDER BY gap, o_orderkey)::BIGINT AS r
  FROM gaps),
n1 AS (SELECT count(*)::BIGINT AS n_gaps FROM rk),
xy AS (
  SELECT CAST(round(ln(CAST(gap AS DOUBLE)), 12) AS DOUBLE) AS x,
    CAST(round(ln(-ln(1.0 - (CAST(r AS DOUBLE) - 0.3) /
      (CAST(n_gaps AS DOUBLE) + 0.4))), 12) AS DOUBLE) AS y
  FROM rk CROSS JOIN n1),
m AS (
  SELECT count(*)::BIGINT AS n_gaps,
    CAST(CAST(sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(sum(CAST(CAST(y AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sum(CAST(CAST(x * x AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sxx,
    CAST(CAST(sum(CAST(CAST(x * y AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS sxy,
    CAST(CAST(sum(CAST(CAST(y * y AS VARCHAR) AS DECIMAL(38,18)))
      AS VARCHAR) AS DOUBLE) AS syy
  FROM xy),
fin AS (
  SELECT n_gaps,
    (sxy - sx * sy / CAST(n_gaps AS DOUBLE)) /
      (CASE WHEN sxx - sx * sx / CAST(n_gaps AS DOUBLE) <> 0.0
        THEN sxx - sx * sx / CAST(n_gaps AS DOUBLE) END) AS k,
    sxx - sx * sx / CAST(n_gaps AS DOUBLE) AS vx,
    syy - sy * sy / CAST(n_gaps AS DOUBLE) AS vy,
    sxy - sx * sy / CAST(n_gaps AS DOUBLE) AS cxy,
    sx, sy
  FROM m)
SELECT n_gaps, round(k, 6) AS shape,
  round(exp(-((sy - k * sx) / CAST(n_gaps AS DOUBLE)) /
    (CASE WHEN k <> 0.0 THEN k END)), 6) AS scale_days,
  round(cxy * cxy / (CASE WHEN vx * vy <> 0.0 THEN vx * vy END), 6)
    AS r2
FROM fin""",
    // seasonal-naive forecast backtest: exact decimal errors,
    // round-12 relative-error grid, VARCHAR-crossed decimal sums
    "rel_forecast_naive" -> """
WITH monthly AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) * 12 +
      EXTRACT(MONTH FROM o_orderdate) AS month,
    sum(o_totalprice::DECIMAL(18,6)) AS rev
  FROM orders GROUP BY 1),
j AS (
  SELECT m.month, m.rev, p.rev AS pred
  FROM monthly m JOIN monthly p ON m.month = p.month + 12),
a AS (
  SELECT count(*)::BIGINT AS n_forecasts,
    CAST(CAST(sum(rev - pred) AS VARCHAR) AS DOUBLE) AS bias_sum,
    CAST(CAST(sum(abs(rev - pred)) AS VARCHAR) AS DOUBLE) AS mae_sum,
    CAST(CAST(sum(CAST(round(
      CAST(CAST(abs(rev - pred) AS VARCHAR) AS DOUBLE) /
        (CASE WHEN rev <> 0
          THEN CAST(CAST(rev AS VARCHAR) AS DOUBLE) END), 12)
      AS DECIMAL(28,12))) AS VARCHAR) AS DOUBLE) AS mape_sum
  FROM j)
SELECT n_forecasts,
  round(mae_sum / CAST(n_forecasts AS DOUBLE), 6) AS mae,
  round(bias_sum / CAST(n_forecasts AS DOUBLE), 6) AS bias,
  round(mape_sum / CAST(n_forecasts AS DOUBLE), 6) AS mape
FROM a""",
    // X-11-style additive decomposition: centered 13-term MA trend
    // (half-weight endpoints), zero-centered month-of-year seasonal
    // on the round-6 decimal grid, NULL trend at the edges
    "rel_seasonal_decompose" -> s"""
WITH m AS (
  SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
    ${dsum("o_totalprice")} AS revenue
  FROM orders GROUP BY 1),
tr AS (
  SELECT month, revenue,
    (lag(revenue, 6) OVER mw * 0.5 + lag(revenue, 5) OVER mw +
     lag(revenue, 4) OVER mw + lag(revenue, 3) OVER mw +
     lag(revenue, 2) OVER mw + lag(revenue, 1) OVER mw + revenue +
     lead(revenue, 1) OVER mw + lead(revenue, 2) OVER mw +
     lead(revenue, 3) OVER mw + lead(revenue, 4) OVER mw +
     lead(revenue, 5) OVER mw + lead(revenue, 6) OVER mw * 0.5) / 12.0
      AS trend
  FROM m WINDOW mw AS (ORDER BY month)),
b AS (
  SELECT month, revenue, trend,
    EXTRACT(MONTH FROM month) AS moy, revenue - trend AS d
  FROM tr),
se AS (
  -- VARCHAR-mediated 6dp grids (the stock_vwap idiom): at month-revenue
  -- magnitudes (~1e9 at sf10) DuckDB's float-scaled round(x, 6)
  -- computes round(x*1e6)/1e6 where x*1e6 sits at ULP 0.125 -- the 6th
  -- decimal is unresolvable -- while Spark rounds the shortest decimal
  -- repr HALF_UP exactly; VARCHAR->DECIMAL states that same grid
  SELECT moy, CAST(CAST(sum(CAST(CAST(d AS VARCHAR) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) /
    count(*) AS s_raw
  FROM b WHERE d IS NOT NULL GROUP BY 1),
sb AS (SELECT CAST(CAST(sum(CAST(CAST(s_raw AS VARCHAR) AS DECIMAL(28,6)))
  AS VARCHAR) AS DOUBLE) / count(*) AS sbar FROM se)
SELECT b.month,
  CAST(CAST(CAST(CAST(b.revenue AS VARCHAR) AS DECIMAL(28,2))
    AS VARCHAR) AS DOUBLE) AS revenue,
  CAST(CAST(CAST(CAST(b.trend AS VARCHAR) AS DECIMAL(28,6))
    AS VARCHAR) AS DOUBLE) AS trend,
  CAST(CAST(CAST(CAST(se.s_raw - sb.sbar AS VARCHAR) AS DECIMAL(28,6))
    AS VARCHAR) AS DOUBLE) AS seasonal,
  CAST(CAST(CAST(CAST(b.d - (se.s_raw - sb.sbar) AS VARCHAR)
    AS DECIMAL(28,6)) AS VARCHAR) AS DOUBLE) AS residual
FROM b LEFT JOIN se ON b.moy = se.moy CROSS JOIN sb
ORDER BY b.month""",
    // Categorical naive Bayes: Laplace-smoothed count likelihoods,
    // round-12 log terms (order-pinned 3-term sums), argmax with
    // ties to the smallest flag
    "rel_naive_bayes" -> """
WITH li AS (
  SELECT EXTRACT(YEAR FROM l_shipdate) AS ship_year,
    CAST(floor((l_quantity - 1.0) / 10.0) AS BIGINT) AS q_band,
    l_returnflag
  FROM lineitem),
cls AS (SELECT l_returnflag, count(*)::BIGINT AS n_c FROM li GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS n_total FROM li),
vs AS (SELECT count(DISTINCT ship_year)::BIGINT AS v_year,
  count(DISTINCT q_band)::BIGINT AS v_band FROM li),
f1 AS (SELECT l_returnflag, ship_year, count(*)::BIGINT AS n_yc
  FROM li GROUP BY 1, 2),
f2 AS (SELECT l_returnflag, q_band, count(*)::BIGINT AS n_bc
  FROM li GROUP BY 1, 2),
combos AS (SELECT ship_year, q_band, l_returnflag,
  count(*)::BIGINT AS n_combo FROM li GROUP BY 1, 2, 3),
grid AS (SELECT ship_year, q_band,
  CAST(sum(n_combo) AS BIGINT) AS n_rows FROM combos GROUP BY 1, 2),
scored AS (
  SELECT g.ship_year, g.q_band, g.n_rows, c.l_returnflag,
    round(ln(CAST(n_c AS DOUBLE) / CAST(n_total AS DOUBLE)), 12) +
    round(ln(CAST(coalesce(n_yc, 0) + 1 AS DOUBLE) /
      CAST(n_c + v_year AS DOUBLE)), 12) +
    round(ln(CAST(coalesce(n_bc, 0) + 1 AS DOUBLE) /
      CAST(n_c + v_band AS DOUBLE)), 12) AS score
  FROM grid g CROSS JOIN cls c
  LEFT JOIN f1 ON f1.l_returnflag = c.l_returnflag
    AND f1.ship_year = g.ship_year
  LEFT JOIN f2 ON f2.l_returnflag = c.l_returnflag
    AND f2.q_band = g.q_band
  CROSS JOIN tot CROSS JOIN vs),
pred AS (
  SELECT ship_year, q_band, n_rows, l_returnflag AS pred_flag,
    round(score, 6) AS score
  FROM (SELECT *, row_number() OVER (
      PARTITION BY ship_year, q_band
      ORDER BY score DESC, l_returnflag) AS rn FROM scored)
  WHERE rn = 1)
SELECT p.ship_year, p.q_band, p.n_rows, p.pred_flag, p.score,
  coalesce(cb.n_combo, 0) AS n_correct,
  round(CAST(coalesce(cb.n_combo, 0) AS DOUBLE) /
    CAST(p.n_rows AS DOUBLE), 6) AS accuracy
FROM pred p LEFT JOIN combos cb
  ON cb.ship_year = p.ship_year AND cb.q_band = p.q_band
  AND cb.l_returnflag = p.pred_flag
ORDER BY p.ship_year, p.q_band""",
    // Mann-Kendall + Theil-Sen on monthly revenue: exact decimal
    // sign comparisons, BIGINT S/tie/Var terms, rank-selected median
    // (avg of the <=2 middle slopes), VARCHAR-crossed decimal deltas
    "rel_mann_kendall" -> """
WITH monthly AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) * 12 +
      EXTRACT(MONTH FROM o_orderdate) AS month,
    sum(o_totalprice::DECIMAL(18,6)) AS xd
  FROM orders GROUP BY 1),
pairs AS (
  SELECT a.month AS mi, a.xd AS xi, b.month AS mj, b.xd AS xj
  FROM monthly a JOIN monthly b ON a.month < b.month),
mk AS (
  SELECT count(*)::BIGINT AS n_pairs,
    CAST(sum(CASE WHEN xj > xi THEN 1 WHEN xj < xi THEN -1
      ELSE 0 END) AS BIGINT) AS s_stat
  FROM pairs),
ties AS (
  SELECT CAST(sum(t) AS BIGINT) AS n_months,
    CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tie_term
  FROM (SELECT count(*)::BIGINT AS t FROM monthly GROUP BY xd)),
slopes AS (
  SELECT CAST(CAST(xj - xi AS VARCHAR) AS DOUBLE) /
    CAST(mj - mi AS DOUBLE) AS slope
  FROM pairs),
ranked AS (
  SELECT slope, row_number() OVER (ORDER BY slope) AS rn FROM slopes),
cnt AS (SELECT count(*)::BIGINT AS m FROM slopes),
med AS (
  SELECT sum(slope) / count(*) AS sen_raw
  FROM ranked, cnt
  WHERE rn = (m + 1) // 2 OR rn = (m + 2) // 2),
v AS (
  SELECT n_pairs, s_stat, n_months, sen_raw,
    CAST(n_months * (n_months - 1) * (n_months * 2 + 5) - tie_term
      AS DOUBLE) / 18.0 AS var_s
  FROM mk, ties, med)
SELECT n_months, n_pairs, s_stat, round(var_s, 6) AS var_s,
  round(CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) /
      (CASE WHEN var_s > 0.0 THEN sqrt(var_s) END)
    WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) /
      (CASE WHEN var_s > 0.0 THEN sqrt(var_s) END)
    ELSE 0.0 END, 6) AS z_mk,
  round(sen_raw, 6) AS sen_slope
FROM v""",
    // Kruskal-Wallis rank test: NAIVE global-window midranks (engine
    // runs the banded scan), exact BIGINT rank sums, DECIMAL(12,0)
    // tie cubes (cubes must keep p1+p2 <= 38 for DuckDB's binder),
    // VARCHAR crossings for the >1e5-magnitude terms
    "rel_kruskal_wallis" -> """
WITH rows_ AS (
  SELECT o_orderpriority AS grp, o_totalprice AS y FROM orders),
rt AS (SELECT y, count(*)::BIGINT AS cnt FROM rows_ GROUP BY 1),
mr AS (
  SELECT y, 2 * coalesce(CAST(sum(cnt) OVER (ORDER BY y
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
    + cnt + 1 AS mr2
  FROM rt),
g AS (
  SELECT grp, count(*)::BIGINT AS n_g, CAST(sum(mr2) AS BIGINT) AS sum2
  FROM rows_ JOIN mr USING (y) GROUP BY 1),
ties AS (
  SELECT CAST(CAST(sum(cnt::DECIMAL(19,0) * cnt::DECIMAL(19,0) *
    cnt::DECIMAL(19,0) - cnt::DECIMAL(19,0)) AS VARCHAR) AS DOUBLE)
    AS tie_sum
  FROM rt),
tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n, count(*)::BIGINT AS k
  FROM g),
ss AS (
  SELECT max(n) AS n, max(k) AS k,
    CAST(CAST(sum(CAST(CAST(CAST(n_g AS DOUBLE) *
      ((CAST(sum2 AS DOUBLE) / (2.0 * CAST(n_g AS DOUBLE)) -
        (CAST(n AS DOUBLE) + 1.0) / 2.0) *
       (CAST(sum2 AS DOUBLE) / (2.0 * CAST(n_g AS DOUBLE)) -
        (CAST(n AS DOUBLE) + 1.0) / 2.0))
      AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS ssum
  FROM g CROSS JOIN tot),
cc AS (
  SELECT n, k, ssum, tie_sum,
    CAST(CAST(n::DECIMAL(19,0) * n::DECIMAL(19,0) * n::DECIMAL(19,0)
      - n::DECIMAL(19,0) AS VARCHAR) AS DOUBLE) AS ncube
  FROM ss CROSS JOIN ties)
SELECT n AS n_rows, k AS k_groups,
  round((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))
    * ssum, 6) AS h_stat,
  round(1.0 - tie_sum / ncube, 6) AS tie_correction,
  round(((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))
      * ssum) /
    (CASE WHEN 1.0 - tie_sum / ncube <> 0.0
      THEN 1.0 - tie_sum / ncube END), 6) AS h_adj
FROM cc""",
    // Spearman rank correlation via doubled midranks (ties stay on
    // the integer grid): oracle states the NAIVE global-window
    // count-below prefixes; the engine runs banded two-level scans —
    // hash equality proves the rewrite. Exact integer moment sums
    // (VARCHAR crossings), one pinned double closed form
    "rel_spearman" -> """
WITH rows_ AS (
  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
rxt AS (SELECT x, count(*)::BIGINT AS cnt FROM rows_ GROUP BY 1),
rx AS (
  SELECT x, 2 * coalesce(CAST(sum(cnt) OVER (ORDER BY x
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
    + cnt + 1 AS rx2
  FROM rxt),
ryt AS (SELECT y, count(*)::BIGINT AS cnt FROM rows_ GROUP BY 1),
ry AS (
  SELECT y, 2 * coalesce(CAST(sum(cnt) OVER (ORDER BY y
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
    + cnt + 1 AS ry2
  FROM ryt),
ranked AS (
  SELECT rx2, ry2 FROM rows_ JOIN rx USING (x) JOIN ry USING (y)),
m AS (
  SELECT count(*)::BIGINT AS n,
    CAST(CAST(sum(rx2) AS VARCHAR) AS DOUBLE) AS sx,
    CAST(CAST(sum(ry2) AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sum(rx2 * rx2) AS VARCHAR) AS DOUBLE) AS sxx,
    CAST(CAST(sum(ry2 * ry2) AS VARCHAR) AS DOUBLE) AS syy,
    CAST(CAST(sum(rx2 * ry2) AS VARCHAR) AS DOUBLE) AS sxy
  FROM ranked)
SELECT n AS n_rows,
  round((sxy - sx * sy / CAST(n AS DOUBLE)) /
    (CASE WHEN sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) *
        (syy - sy * sy / CAST(n AS DOUBLE))) <> 0.0
      THEN sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) *
        (syy - sy * sy / CAST(n AS DOUBLE))) END), 6) AS rho_spearman
FROM m""",
    // chi-square independence of status x priority over the FULL
    // marginal grid (zero-filled cells); exact integer cells, each
    // (O-E)^2/E term one pinned double expression crossed to the
    // DECIMAL(38,18) grid before the order-independent sum
    "rel_chi2" -> """
WITH cells AS (
  SELECT o_orderstatus AS status, o_orderpriority AS priority,
    count(*)::BIGINT AS o
  FROM orders GROUP BY 1, 2),
rt AS (SELECT status, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
ctt AS (SELECT priority, CAST(sum(o) AS BIGINT) AS ct
  FROM cells GROUP BY 1),
nn AS (SELECT CAST(sum(o) AS BIGINT) AS n,
  count(DISTINCT status)::BIGINT AS n_status,
  count(DISTINCT priority)::BIGINT AS n_priority FROM cells),
grid AS (
  SELECT rt.status, ctt.priority, rt.rt, ctt.ct,
    coalesce(cells.o, 0)::BIGINT AS o, n, n_status, n_priority
  FROM rt CROSS JOIN ctt
  LEFT JOIN cells ON cells.status = rt.status
    AND cells.priority = ctt.priority
  CROSS JOIN nn),
t AS (
  SELECT max(n) AS n_rows, max(n_status) AS n_status,
    max(n_priority) AS n_priority,
    CAST(CAST(sum(CAST(
      CASE WHEN CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) /
          CAST(n AS DOUBLE) > 0.0
        THEN (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
            / CAST(n AS DOUBLE)) *
          (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
            / CAST(n AS DOUBLE)) /
          (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
        ELSE 0.0 END AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE) AS chi2_raw
  FROM grid)
SELECT n_rows, n_status, n_priority,
  CAST((n_status - 1) * (n_priority - 1) AS BIGINT) AS df,
  round(chi2_raw, 6) AS chi2,
  round(sqrt(chi2_raw / (CAST(n_rows AS DOUBLE) *
    CAST(least(n_status - 1, n_priority - 1) AS DOUBLE))), 6)
    AS cramers_v
FROM t""",
    // one-way ANOVA across order priorities: exact decimal per-group
    // moments (VARCHAR crossings), per-group SS terms pinned double ->
    // DECIMAL(38,18) sums, NULL-guarded F/eta^2 divisors
    "rel_anova" -> """
WITH base AS (
  SELECT o_orderpriority AS grp, o_totalprice::DECIMAL(19,6) AS y
  FROM orders),
g AS (
  SELECT grp, count(*)::BIGINT AS n_g, sum(y) AS sg_dec,
    sum(y * y) AS sgg_dec
  FROM base GROUP BY 1),
tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n, count(*)::BIGINT AS k,
    CAST(CAST(sum(sg_dec) AS VARCHAR) AS DOUBLE) AS s
  FROM g),
gd AS (
  SELECT grp, n_g,
    CAST(CAST(sg_dec AS VARCHAR) AS DOUBLE) AS sg,
    CAST(CAST(sgg_dec AS VARCHAR) AS DOUBLE) AS sgg, n, k, s
  FROM g CROSS JOIN tot),
ss AS (
  -- double -> decimal crosses VARCHAR-mediated: these terms are ~1e13
  -- and DuckDB's direct double->DECIMAL(38,18) cast is float-scaled
  -- (not correctly rounded) at that magnitude, while Spark's goes
  -- through Double.toString — the VARCHAR hop reproduces Spark's path
  SELECT max(n) AS n_rows, max(k) AS k_groups,
    CAST(CAST(sum(CAST(CAST(sgg - sg * sg / CAST(n_g AS DOUBLE)
      AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
      AS ssw_raw,
    CAST(CAST(sum(CAST(CAST(CAST(n_g AS DOUBLE) *
      ((sg / CAST(n_g AS DOUBLE) - s / CAST(n AS DOUBLE)) *
       (sg / CAST(n_g AS DOUBLE) - s / CAST(n AS DOUBLE)))
      AS VARCHAR) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)
      AS ssb_raw
  FROM gd)
SELECT n_rows, k_groups,
  -- SS magnitudes are ~1e14: round-to-6dp float-scales (and diverges)
  -- in DuckDB at that size, round-to-integer is exact on both engines
  round(ssb_raw, 0) AS ss_between, round(ssw_raw, 0) AS ss_within,
  round((ssb_raw / CAST(k_groups - 1 AS DOUBLE)) /
    (CASE WHEN ssw_raw <> 0.0 AND n_rows > k_groups
      THEN ssw_raw / CAST(n_rows - k_groups AS DOUBLE) END), 6)
    AS f_stat,
  round(ssb_raw / (CASE WHEN ssb_raw + ssw_raw <> 0.0
    THEN ssb_raw + ssw_raw END), 6) AS eta_sq
FROM ss""",
    // two-feature OLS via normal equations: exact decimal moment sums
    // (VARCHAR crossings out — the 1e5+ magnitude convention), pinned
    // double algebra, NULL-guarded det/Syy divisors
    "rel_ols2" -> """
WITH base AS (
  SELECT l_quantity::DECIMAL(19,6) AS q, l_discount::DECIMAL(19,6) AS d,
    l_extendedprice::DECIMAL(19,6) AS y
  FROM lineitem),
m AS (
  SELECT count(*)::BIGINT AS n,
    CAST(CAST(sum(q) AS VARCHAR) AS DOUBLE) AS sx1,
    CAST(CAST(sum(d) AS VARCHAR) AS DOUBLE) AS sx2,
    CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sum(q*q) AS VARCHAR) AS DOUBLE) AS sx1x1,
    CAST(CAST(sum(q*d) AS VARCHAR) AS DOUBLE) AS sx1x2,
    CAST(CAST(sum(d*d) AS VARCHAR) AS DOUBLE) AS sx2x2,
    CAST(CAST(sum(q*y) AS VARCHAR) AS DOUBLE) AS sx1y,
    CAST(CAST(sum(d*y) AS VARCHAR) AS DOUBLE) AS sx2y,
    CAST(CAST(sum(y*y) AS VARCHAR) AS DOUBLE) AS syy0
  FROM base),
s AS (
  SELECT n, sx1, sx2, sy,
    sx1x1 - sx1 * sx1 / n AS s11,
    sx1x2 - sx1 * sx2 / n AS s12,
    sx2x2 - sx2 * sx2 / n AS s22,
    sx1y - sx1 * sy / n AS s1y,
    sx2y - sx2 * sy / n AS s2y,
    syy0 - sy * sy / n AS syy
  FROM m),
sol AS (
  SELECT n, sx1, sx2, sy, s1y, s2y, syy,
    (s1y * s22 - s2y * s12) / (CASE WHEN s11 * s22 - s12 * s12 <> 0.0
      THEN s11 * s22 - s12 * s12 END) AS b1,
    (s2y * s11 - s1y * s12) / (CASE WHEN s11 * s22 - s12 * s12 <> 0.0
      THEN s11 * s22 - s12 * s12 END) AS b2
  FROM s)
SELECT n AS n_rows, round(b1, 6) AS b_qty, round(b2, 6) AS b_disc,
  round((sy - b1 * sx1 - b2 * sx2) / n, 6) AS intercept,
  round((b1 * s1y + b2 * s2y) / (CASE WHEN syy <> 0.0 THEN syy END), 6)
    AS r2
FROM sol""",
    "rel_regr_trend" -> """
WITH m AS (
  SELECT n_name, date_trunc('month', o_orderdate)::TIMESTAMP AS month,
    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2),
x AS (
  SELECT n_name, rev,
    CAST((year(month) - 1992) * 12 + month(month) - 1 AS BIGINT) AS x
  FROM m),
a AS (
  -- VARCHAR crossings on the decimal->double sums and VARCHAR-mediated
  -- 6dp output rounds: sf1 intercepts reach ~2e8 where the engines'
  -- decimal->double paths diverge sub-ulp and DuckDB's float-scaled
  -- round(x, 6) is lossy (round-10 sf1 sweep, 1-ulp intercept edge)
  SELECT n_name, count(*) AS n_months,
    CAST(sum(x) AS DOUBLE) AS sxd, CAST(sum(x * x) AS DOUBLE) AS sxxd,
    CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS sy,
    CAST(CAST(sum(rev * x) AS VARCHAR) AS DOUBLE) AS sxy
  FROM x GROUP BY 1)
SELECT n_name, n_months,
  CASE WHEN CAST(n_months AS DOUBLE) * sxxd - sxd * sxd <> 0.0 THEN
    CAST(CAST(CAST(CAST(
      (CAST(n_months AS DOUBLE) * sxy - sxd * sy) /
      (CAST(n_months AS DOUBLE) * sxxd - sxd * sxd)
    AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) END AS slope,
  CASE WHEN CAST(n_months AS DOUBLE) * sxxd - sxd * sxd <> 0.0 THEN
    CAST(CAST(CAST(CAST(
      (sy - (CAST(n_months AS DOUBLE) * sxy - sxd * sy) /
        (CAST(n_months AS DOUBLE) * sxxd - sxd * sxd) * sxd) /
      CAST(n_months AS DOUBLE)
    AS VARCHAR) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) END AS intercept
FROM a ORDER BY n_name""",
    // Weighted median: pure integer cumulative-weight arithmetic over
    // the (brand, price) grain — exact on both engines.
    "rel_weighted_median" -> """
WITH wp AS (
  SELECT p_brand, l_extendedprice AS price,
    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2),
c AS (
  SELECT p_brand, price, w,
    sum(w) OVER (PARTITION BY p_brand ORDER BY price
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
    sum(w) OVER (PARTITION BY p_brand) AS tw
  FROM wp)
SELECT p_brand, CAST(max(tw) AS BIGINT) AS total_qty,
  min(CASE WHEN 2 * cw >= tw THEN price END) AS w_median_price
FROM c GROUP BY p_brand ORDER BY p_brand""",
    // linear multi-touch attribution: decimal-exact credit shares
    "rel_attribution_linear" -> """
WITH p AS (
  SELECT user_id AS p_user, ts::TIMESTAMP AS p_ts, event_id AS p_id
  FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT user_id AS t_user, ts::TIMESTAMP AS t_ts,
    event_type AS touch_type, event_id AS t_id
  FROM events WHERE event_type <> 'purchase'),
j AS (
  SELECT p.p_id, t.touch_type
  FROM p JOIN t ON p.p_user = t.t_user
    AND t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 1 HOUR),
c AS (
  SELECT p_id, touch_type,
    CAST(round(CAST(1.0 AS DOUBLE) / (count(*) OVER (PARTITION BY p_id)),
      12) AS DECIMAL(18,12)) AS credit
  FROM j)
SELECT touch_type, count(*)::BIGINT AS n_touches,
  count(DISTINCT p_id)::BIGINT AS n_purchases,
  round(CAST(sum(credit) AS DOUBLE), 6) AS total_credit
FROM c GROUP BY touch_type ORDER BY touch_type""",
    // spend-quintile migration matrix: midpoint split, rfm-rule ranks
    "rel_segment_migration" -> s"""
WITH o AS (
  SELECT o_custkey, o_totalprice,
    epoch_us(o_orderdate::TIMESTAMP) AS tu
  FROM orders),
b AS (SELECT min(tu) AS lo, max(tu) AS hi FROM o),
sp AS (
  SELECT o_custkey,
    CASE WHEN tu < (lo + hi) // 2 THEN 'p1' ELSE 'p2' END AS period,
    ${dsum("o_totalprice")} AS spend
  FROM o CROSS JOIN b GROUP BY 1, 2),
n AS (SELECT period, count(*) AS n_cust FROM sp GROUP BY 1),
q AS (
  SELECT o_custkey, period,
    CAST(floor(5 * (row_number() OVER (PARTITION BY period
      ORDER BY spend, o_custkey) - 1) / n_cust) AS BIGINT) + 1
      AS quintile
  FROM sp JOIN n USING (period))
SELECT a.quintile AS q_first, b2.quintile AS q_second,
  count(*)::BIGINT AS n_customers
FROM q a JOIN q b2 ON a.o_custkey = b2.o_custkey
  AND a.period = 'p1' AND b2.period = 'p2'
GROUP BY 1, 2 ORDER BY q_first, q_second""",
    // repeat-purchase retention KPI: exact integer ratios
    "rel_repeat_rate" -> """
WITH pc AS (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1)
SELECT c_mktsegment,
  count(*)::BIGINT AS n_buyers,
  count(*) FILTER (n_orders >= 2)::BIGINT AS n_repeat,
  CAST(sum(n_orders) AS BIGINT) AS n_orders,
  round(count(*) FILTER (n_orders >= 2)::DOUBLE / count(*), 6)
    AS repeat_rate,
  round(CAST(sum(n_orders) AS BIGINT)::DOUBLE / count(*), 6)
    AS orders_per_buyer
FROM customer JOIN pc ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // RFM segmentation: deterministic quintile ranks, integer math
    "rel_rfm" -> s"""
WITH bc AS (
  SELECT o_custkey, max(o_orderdate) AS last_order,
    count(*) AS frequency,
    ${dsum("o_totalprice")} AS monetary
  FROM orders GROUP BY 1),
rd AS (SELECT max(o_orderdate) AS ref_date FROM orders),
nn AS (SELECT count(*) AS n_cust FROM bc),
rr AS (
  SELECT o_custkey, frequency, monetary, n_cust,
    CAST(date_diff('day', last_order, ref_date) AS BIGINT) AS recency_days
  FROM bc CROSS JOIN rd CROSS JOIN nn),
sc AS (
  SELECT o_custkey, recency_days, frequency, monetary,
    CAST(floor(5 * (row_number() OVER (
      ORDER BY recency_days DESC, o_custkey) - 1) / n_cust) AS BIGINT) + 1
      AS r_score,
    CAST(floor(5 * (row_number() OVER (
      ORDER BY frequency, o_custkey) - 1) / n_cust) AS BIGINT) + 1
      AS f_score,
    CAST(floor(5 * (row_number() OVER (
      ORDER BY monetary, o_custkey) - 1) / n_cust) AS BIGINT) + 1
      AS m_score
  FROM rr)
SELECT o_custkey, recency_days, frequency, monetary,
  r_score, f_score, m_score,
  r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR AS rfm
FROM sc ORDER BY o_custkey""",
    // Deequ-style expectations: one wide aggregate, per-check rows
    "rel_expectations" -> """
WITH w AS (
  SELECT count(*) AS n_rows,
    count(DISTINCT o_orderkey) AS nd_key,
    count(o_custkey) AS nn_cust,
    min(o_totalprice) AS min_price,
    count(*) FILTER (o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '2002-01-01') AS n_in_range,
    count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH',
      '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')) AS n_known_prio
  FROM orders)
SELECT check_name, metric, passed FROM (
  SELECT 'row_count_positive' AS check_name,
    round(CAST(n_rows AS DOUBLE), 6) AS metric, n_rows > 0 AS passed
  FROM w
  UNION ALL SELECT 'orderkey_unique',
    round(nd_key::DOUBLE / n_rows, 6), nd_key = n_rows FROM w
  UNION ALL SELECT 'custkey_complete',
    round(nn_cust::DOUBLE / n_rows, 6), nn_cust = n_rows FROM w
  UNION ALL SELECT 'totalprice_positive',
    round(CAST(min_price AS DOUBLE), 6), min_price > 0.0 FROM w
  UNION ALL SELECT 'orderdate_in_range',
    round(n_in_range::DOUBLE / n_rows, 6), n_in_range = n_rows FROM w
  UNION ALL SELECT 'priority_in_domain',
    round(n_known_prio::DOUBLE / n_rows, 6), n_known_prio = n_rows FROM w)
ORDER BY check_name""",
    // WOE binning: equal-width bins (priceHistogram formula), exact
    // integer class shares, one ln per bin
    "rel_woe_bins" -> """
WITH li AS (
  SELECT l_extendedprice AS v, (l_returnflag = 'R') AS bad FROM lineitem),
b AS (SELECT min(v) AS lo, max(v) AS hi FROM li),
binned AS (
  SELECT CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
    ELSE CAST(least(floor((v - lo) / (hi - lo) * 10), 9) AS BIGINT)
  END AS bin, bad
  FROM li CROSS JOIN b),
a AS (
  SELECT bin, count(*) AS n, count(*) FILTER (bad) AS n_bad,
    count(*) FILTER (NOT bad) AS n_good
  FROM binned GROUP BY 1),
t AS (SELECT sum(n_bad)::BIGINT AS tot_bad, sum(n_good)::BIGINT AS tot_good
  FROM a)
SELECT bin, n, n_good, n_bad,
  round(n_bad::DOUBLE / n, 6) AS bad_rate,
  CASE WHEN n_good > 0 AND n_bad > 0 THEN
    round(ln((n_good::DOUBLE / tot_good) / (n_bad::DOUBLE / tot_bad)), 6)
  END AS woe
FROM a CROSS JOIN t ORDER BY bin""",
    // inter-purchase gap statistics: integer day diffs end to end
    "rel_order_gap" -> """
WITH g AS (
  SELECT o_custkey,
    CAST(date_diff('day',
      lag(o_orderdate) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey),
      o_orderdate) AS BIGINT) AS gap
  FROM orders
  QUALIFY gap IS NOT NULL)
SELECT o_custkey, (count(*) + 1)::BIGINT AS n_orders,
  round(CAST(sum(gap) AS DOUBLE) / count(*), 4) AS mean_gap_days,
  min(gap) AS min_gap_days, max(gap) AS max_gap_days
FROM g GROUP BY o_custkey ORDER BY o_custkey""",
    // MODE() as deterministic count-argmax (ties → smallest value).
    "rel_mode" -> """
WITH c AS (
  SELECT o_orderpriority, l_returnflag, count(*) AS n_items
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2)
SELECT o_orderpriority, l_returnflag, n_items
FROM c
QUALIFY row_number() OVER (PARTITION BY o_orderpriority
  ORDER BY n_items DESC, l_returnflag) = 1
ORDER BY o_orderpriority""",
    // Herfindahl-Hirschman concentration per market segment: decimal
    // revenue sums, 1e-12-grid share-squared terms, DOJ class labels
    "rel_hhi" -> """
WITH cells AS (
  SELECT c.c_mktsegment, n.n_name,
    CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2),
st AS (
  SELECT c_mktsegment,
    CAST(CAST(sum(CAST(rev AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS seg_rev
  FROM cells GROUP BY 1),
t AS (
  SELECT cells.c_mktsegment,
    CAST(round((rev / seg_rev) * (rev / seg_rev), 12)
      AS DECIMAL(28,12)) AS term
  FROM cells JOIN st USING (c_mktsegment)),
a AS (
  SELECT c_mktsegment, count(*)::BIGINT AS n_nations,
    round(CAST(sum(term) AS DOUBLE) * 10000.0, 6) AS hhi
  FROM t GROUP BY 1)
SELECT c_mktsegment, n_nations, hhi,
  CASE WHEN hhi < 1500.0 THEN 'competitive'
       WHEN hhi < 2500.0 THEN 'moderate'
       ELSE 'concentrated' END AS hhi_class
FROM a ORDER BY c_mktsegment""",
  )
}
