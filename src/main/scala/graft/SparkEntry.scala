package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SURVEY.md §2 key appears in `queries`; SQL-expressible ones also
  * appear in `oracleSql` with IDENTICAL column names (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinBroadcast(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. Relational core
    "q01_agg_pricing"     -> (Relational.aggPricing _),
    "q02_filter_pushdown" -> (Relational.filterPushdown _),
    "q03_join_broadcast"  -> (Relational.joinBroadcast _),
    "q04_join_shuffle"    -> (Relational.joinShuffle _),
    "q05_topk"            -> (Relational.topK _),
    "q06_distinct"        -> (Relational.distinctPairs _),
    "q07_window_latest"   -> (Relational.windowLatest _),
    "q08_semi_join"       -> (Relational.semiJoin _),
    "q09_anti_join"       -> (Relational.antiJoin _),
    "q10_set_ops"         -> (Relational.setOps _),
    "q11_rollup"          -> (Relational.rollupAgg _),
    "q12_conditional_agg" -> (Relational.conditionalAgg _),
    "q13_scalar_subquery" -> (Relational.scalarSubquery _),
    "q14_time_bucket"     -> (Relational.timeBucket _),
    "q15_string_suite"    -> (Relational.stringSuite _),
  )

  /** DuckDB oracle SQL, same column names/order semantics as the Spark side. */
  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | COUNT(*) AS line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q04_join_shuffle" ->
      """SELECT o_orderkey, o_orderdate, o_orderstatus,
        | COUNT(*) AS line_count,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_orderdate, o_orderstatus
        |HAVING COUNT(*) >= 5
        |ORDER BY o_orderkey""".stripMargin,
    "q05_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,
    "q06_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey
        |FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,
    "q07_window_latest" ->
      """SELECT user_id, event_id, ts, event_type FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q08_semi_join" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |ORDER BY o_orderkey""".stripMargin,
    "q09_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q10_set_ops" ->
      """SELECT nk FROM (
        |  (SELECT DISTINCT c_nationkey AS nk FROM customer)
        |  UNION
        |  (SELECT DISTINCT s_nationkey FROM supplier)
        |  EXCEPT
        |  (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        |) t ORDER BY nk""".stripMargin,
    "q11_rollup" ->
      """SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
        |       COALESCE(c_nationkey, -1) AS nationkey,
        |       COUNT(*) AS cust_count,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |GROUP BY ROLLUP (c_mktsegment, c_nationkey)
        |ORDER BY segment, nationkey""".stripMargin,
    "q12_conditional_agg" ->
      """SELECT n_name,
        | SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS automobile,
        | SUM(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END) AS building,
        | SUM(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END) AS furniture,
        | SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END) AS household,
        | SUM(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 ELSE 0 END) AS machinery,
        | COUNT(*) AS total
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q13_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q14_time_bucket" ->
      """SELECT DATE_TRUNC('hour', ts) AS bucket, event_type,
        |       COUNT(*) AS event_count,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket, event_type""".stripMargin,
    "q15_string_suite" ->
      """SELECT p_partkey,
        |       UPPER(SUBSTRING(p_name, 1, 8)) AS name_prefix,
        |       LENGTH(p_name) AS name_len,
        |       REGEXP_REPLACE(p_type, '[aeiou]', '', 'g') AS type_novowel,
        |       CONCAT_WS('|', p_brand, p_type) AS brand_type
        |FROM part
        |WHERE p_name LIKE '%ol%'
        |ORDER BY p_partkey""".stripMargin,
  )
}
