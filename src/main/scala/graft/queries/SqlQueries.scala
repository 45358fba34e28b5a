package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-surface breadth: the `spark.sql(...)` entry path over registered
  * views — CTEs, correlated/uncorrelated subqueries, grouping sets, pivot,
  * statistical aggregates, ordered string aggregation. These exercise
  * Catalyst's subquery machinery (RewriteCorrelatedScalarSubquery,
  * RewritePredicateSubquery) that the DataFrame-API catalog rows don't. */
object SqlQueries {

  type Q = (SparkSession, String) => DataFrame

  private def withViews(s: SparkSession, d: String, names: String*): Unit =
    names.foreach(n => Tables.read(s, d, n).createOrReplaceTempView(n))

  def sqlCte(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders", "customer")
    s.sql("""
      WITH spend AS (
        SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS total_spend,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey)
      SELECT c_custkey, c_mktsegment, total_spend, CAST(n_orders AS BIGINT) AS n_orders
      FROM customer JOIN spend ON c_custkey = custkey
      WHERE total_spend > 500000
      ORDER BY c_custkey""")
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE / Catalyst UnionLoop): the
    * reference's exponential retry ladder (RetryFunctions backoff,
    * SURVEY §2.5 W4) generated RECURSIVELY per region key — each step
    * doubles the delay to the 960 s cap and accumulates the schedule,
    * the recursion the `w4_backoff_expo` closed form unrolls by hand.
    * Depth bounded by the attempt cap, so the loop terminates in both
    * engines; DuckDB runs the identical recursive CTE as the oracle. */
  def sqlRecursiveCte(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "region")
    s.sql("""
      WITH RECURSIVE sched(key, attempt, delay_s, cum_s) AS (
        SELECT r_regionkey AS key, CAST(1 AS BIGINT) AS attempt,
               CAST(30 AS BIGINT) AS delay_s, CAST(30 AS BIGINT) AS cum_s
        FROM region
        UNION ALL
        SELECT key, attempt + 1,
               least(delay_s * 2, CAST(960 AS BIGINT)),
               cum_s + least(delay_s * 2, CAST(960 AS BIGINT))
        FROM sched WHERE attempt < 8)
      SELECT key, attempt, delay_s, cum_s
      FROM sched ORDER BY key, attempt""")
  }

  def sqlExistsSubquery(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders", "lineitem")
    s.sql("""
      SELECT o_orderkey, o_orderstatus
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      ORDER BY o_orderkey""")
  }

  def sqlInSubquery(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "customer", "nation")
    s.sql("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
      ORDER BY c_custkey""")
  }

  def sqlScalarSubquery(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders")
    s.sql("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
      ORDER BY o_orderkey""")
  }

  def sqlGroupingSets(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders")
    s.sql("""
      SELECT COALESCE(o_orderstatus, '(all)') AS status,
             COALESCE(o_orderpriority, '(all)') AS priority,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority""")
  }

  /** Pivot via the dedicated DataFrame operator (fixed pivot values so the
    * plan is a single pass; DuckDB oracle uses the equivalent CASE sums). */
  def sqlPivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum(col("l_quantity")), 2))
      .orderBy("l_linestatus")

  def sqlStatsAgg(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem")
    s.sql("""
      SELECT l_returnflag,
             round(stddev_samp(l_extendedprice), 4) AS sd_price,
             round(var_samp(l_quantity), 4) AS var_qty,
             round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
             round(covar_samp(l_discount, l_tax), 8) AS cov_disc_tax
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  def sqlPercentile(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders")
    s.sql("""
      SELECT o_orderstatus,
             round(percentile(o_totalprice, 0.5), 4) AS median_price,
             round(percentile(o_totalprice, 0.9), 4) AS p90_price
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  def sqlStringAgg(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders")
    s.sql("""
      SELECT o_orderpriority,
             concat_ws(',', array_sort(collect_set(o_orderstatus))) AS statuses
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  }

  /** Bag-semantics set ops (EXCEPT ALL / INTERSECT ALL keep multiplicity
    * — Catalyst rewrites them to replicated generate plans, a different
    * codepath than the distinct forms in u2/u3). */
  def sqlExceptAll(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem")
    s.sql("""
      SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 10
      EXCEPT ALL
      SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
      ORDER BY l_orderkey, l_suppkey""")
  }

  def sqlIntersectAll(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem")
    s.sql("""
      SELECT l_orderkey, l_linestatus FROM lineitem WHERE l_quantity > 25
      INTERSECT ALL
      SELECT l_orderkey, l_linestatus FROM lineitem WHERE l_discount > 0.02
      ORDER BY l_orderkey, l_linestatus""")
  }

  /** RANGE window frame — value-based (not row-count) framing: running
    * order value over a 5-day trailing window per customer. */
  def sqlWindowRange(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders")
    s.sql("""
      SELECT o_custkey, o_orderkey, o_orderdate,
             round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
               RANGE BETWEEN INTERVAL 5 DAYS PRECEDING AND CURRENT ROW), 2)
               AS trailing_5d_value
      FROM orders
      ORDER BY o_custkey, o_orderkey""")
  }

  /** LATERAL correlated subquery — each nation pulls its top-2 customers
    * by account balance (Catalyst LateralJoin, DecorrelateInnerQuery). */
  def sqlLateral(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "nation", "customer")
    s.sql("""
      SELECT n.n_name, t.c_custkey, t.c_acctbal
      FROM nation n,
      LATERAL (SELECT c_custkey, c_acctbal FROM customer
               WHERE c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      ORDER BY n.n_name, t.c_custkey""")
  }

  /** UNPIVOT — the wide→long melt (Spark's `UNPIVOT ... FOR ... IN`
    * clause, Catalyst's Unpivot node): per-nation aggregates melted into
    * (nation, metric, value) rows. Both value columns cast to double —
    * UNPIVOT requires a common value type, and the oracle's UNPIVOT does
    * the same widening. */
  def sqlUnpivot(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "customer")
    s.sql("""
      WITH wide AS (
        SELECT c_nationkey, CAST(count(*) AS DOUBLE) AS n_cust,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer GROUP BY c_nationkey)
      SELECT c_nationkey, metric, value
      FROM wide UNPIVOT (value FOR metric IN (n_cust, total_bal))
      ORDER BY c_nationkey, metric""")
  }

  val queries: Map[String, Q] = Map(
    "sql_unpivot" -> (sqlUnpivot _),
    "sql_cte" -> (sqlCte _),
    "sql_recursive_cte" -> (sqlRecursiveCte _),
    "sql_except_all" -> (sqlExceptAll _),
    "sql_intersect_all" -> (sqlIntersectAll _),
    "sql_window_range" -> (sqlWindowRange _),
    "sql_lateral" -> (sqlLateral _),
    "sql_exists_subquery" -> (sqlExistsSubquery _),
    "sql_in_subquery" -> (sqlInSubquery _),
    "sql_scalar_subquery" -> (sqlScalarSubquery _),
    "sql_grouping_sets" -> (sqlGroupingSets _),
    "sql_pivot" -> (sqlPivot _),
    "sql_stats_agg" -> (sqlStatsAgg _),
    "sql_percentile" -> (sqlPercentile _),
    "sql_string_agg" -> (sqlStringAgg _),
  )

  val oracle: Map[String, String] = Map(
    "sql_unpivot" ->
      """WITH wide AS (
        |  SELECT c_nationkey, CAST(count(*) AS DOUBLE) AS n_cust,
        |         round(sum(c_acctbal), 2) AS total_bal
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, metric, value
        |FROM (UNPIVOT wide ON n_cust, total_bal INTO NAME metric VALUE value)
        |ORDER BY c_nationkey, metric""".stripMargin,
    "sql_except_all" ->
      """SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 10
        |EXCEPT ALL
        |SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_orderkey, l_suppkey""".stripMargin,
    "sql_intersect_all" ->
      """SELECT l_orderkey, l_linestatus FROM lineitem WHERE l_quantity > 25
        |INTERSECT ALL
        |SELECT l_orderkey, l_linestatus FROM lineitem WHERE l_discount > 0.02
        |ORDER BY l_orderkey, l_linestatus""".stripMargin,
    "sql_window_range" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       round(sum(o_totalprice) OVER (
        |         PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
        |         RANGE BETWEEN INTERVAL 5 DAY PRECEDING AND CURRENT ROW), 2)
        |         AS trailing_5d_value
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "sql_lateral" ->
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_custkey""".stripMargin,
    "sql_cte" ->
      """WITH spend AS (
        |  SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS total_spend,
        |         CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_custkey, c_mktsegment, total_spend, n_orders
        |FROM customer JOIN spend ON c_custkey = custkey
        |WHERE total_spend > 500000
        |ORDER BY c_custkey""".stripMargin,
    "sql_recursive_cte" ->
      """WITH RECURSIVE sched(key, attempt, delay_s, cum_s) AS (
        |  SELECT r_regionkey AS key, CAST(1 AS BIGINT) AS attempt,
        |         CAST(30 AS BIGINT) AS delay_s, CAST(30 AS BIGINT) AS cum_s
        |  FROM region
        |  UNION ALL
        |  SELECT key, attempt + 1,
        |         least(delay_s * 2, CAST(960 AS BIGINT)),
        |         cum_s + least(delay_s * 2, CAST(960 AS BIGINT))
        |  FROM sched WHERE attempt < 8)
        |SELECT key, attempt, delay_s, cum_s
        |FROM sched ORDER BY key, attempt""".stripMargin,
    "sql_exists_subquery" ->
      """SELECT o_orderkey, o_orderstatus
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,
    "sql_in_subquery" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        |ORDER BY c_custkey""".stripMargin,
    "sql_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "sql_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |       COALESCE(o_orderpriority, '(all)') AS priority,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "sql_pivot" ->
      """SELECT l_linestatus,
        |       round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
        |       round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
        |       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "sql_stats_agg" ->
      """SELECT l_returnflag,
        |       round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |       round(var_samp(l_quantity), 4) AS var_qty,
        |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |       round(covar_samp(l_discount, l_tax), 8) AS cov_disc_tax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "sql_percentile" ->
      """SELECT o_orderstatus,
        |       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
        |       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sql_string_agg" ->
      """SELECT o_orderpriority,
        |       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  )
}
