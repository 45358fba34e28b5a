package graft.queries

import graft.Tables
import graft.operators.{ChangeFeed, RetryPolicy}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.3 joins (J1-J4, JX), §2.4 aggregations (A1-A5, AX), and
  * §2.5 windows (W1-W4, WX), each with a DuckDB oracle.
  *
  * Scale notes (100 TB stance): dims (`nation`, `region`, inline configs,
  * scalar aggregates) are explicitly `broadcast()`; fact-fact joins shuffle
  * once on the join key; windows partition by high-cardinality keys so no
  * single partition exceeds executor memory.
  */
object RelQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- J1: change -> current-state equi-join (snapshot diff over orders) ----
  def j1ChangeCurrentState(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val oldSnap = o.filter(col("o_orderkey") % 13 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    val newSnap = o.filter(col("o_orderkey") % 10 =!= 0)
    ChangeFeed.diff(oldSnap, newSnap, Seq("o_orderkey"))
      .select(col("Operation"), col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  // ---- J2: batched-update self-join (CTE of ids joined back to base) ----
  def j2BatchedSelfJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val cte = Tables.orders(s, d)
      .filter(col("o_orderkey").between(500, 999))
      .select(col("o_orderkey").as("l_orderkey")).distinct()
    // (l_orderkey, l_linenumber) is NOT unique in the testdata — order by
    // every output column for a total order.
    li.join(broadcast(cte), Seq("l_orderkey"), "inner")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")
  }

  // ---- J3: config/state lookup join (broadcast tiny dim) ----
  def j3ConfigLookup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cfg = Seq(
      ("click", "/t/click"), ("view", "/t/view"),
      ("purchase", "/t/buy"), ("signup", "/t/signup")
    ).toDF("event_type", "route")
    Tables.events(s, d)
      .join(broadcast(cfg), Seq("event_type"), "left")
      .select(col("event_id"), col("event_type"),
        coalesce(col("route"), lit("/t/default")).as("route"))
      .orderBy("event_id")
  }

  // ---- J4: semi / anti membership ----
  def j4SemiMembership(s: SparkSession, d: String): DataFrame = {
    val shipped = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > to_timestamp(lit("2000-01-01 00:00:00")))
      .select(col("l_orderkey").as("o_orderkey"))
    Tables.orders(s, d).join(shipped, Seq("o_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  def j4AntiMembership(s: SparkSession, d: String): DataFrame = {
    val shipped = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > to_timestamp(lit("2000-01-01 00:00:00")))
      .select(col("l_orderkey").as("o_orderkey"))
    Tables.orders(s, d).join(shipped, Seq("o_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy("o_orderkey")
  }

  // ---- JX breadth: inner star join, left, right, full outer, as-of ----
  def jxStarJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).filter(col("r_regionkey") < 3)
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name")
  }

  def jxLeftJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  def jxRightJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "right")
      .groupBy(col("c_custkey"))
      .agg(max(col("o_totalprice")).as("max_price"))
      .orderBy("c_custkey")

  def jxFullJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val open = o.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_open"))
    val fin = o.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as("n_finished"))
    open.join(fin, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        coalesce(col("n_open"), lit(0L)).as("n_open"),
        coalesce(col("n_finished"), lit(0L)).as("n_finished"))
      .orderBy("custkey")
  }

  /** As-of join: for each purchase, the latest signup at-or-before it for the
    * same user. Spark-first: single-pass window carry-forward (one shuffle on
    * user_id, no range-join blowup); the oracle uses DuckDB's native ASOF. */
  def jxAsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).filter(col("event_type").isin("signup", "purchase"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_signup_ts",
        last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      // DuckDB reads parquet ns-timestamps at µs precision — emit epoch-µs.
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("purchase_ts"),
        expr("last_signup_ts DIV 1000").as("last_signup_ts"))
      .orderBy("event_id")
  }

  /** The SAME as-of semantics as [[jxAsofJoin]] planned through the
    * engine's native [[graft.plans.AsOfJoinExec]] physical operator
    * (custom LogicalPlan + SparkStrategy + SparkPlan) instead of the
    * union + carry-forward window: one SMJ-shaped merge pass, one
    * buffered right row, no window state. Graded against DuckDB's
    * native ASOF LEFT JOIN — both formulations must land on the same
    * hash.
    *
    * Tie caveat: on an EXACT (user_id, ts) signup/purchase tie the two
    * formulations diverge — the exec (and DuckDB ASOF) admits any
    * `s_ts <= ts`, while [[jxAsofJoin]]'s carry-forward window orders by
    * (ts, event_id) and so EXCLUDES a same-ts signup whose event_id sorts
    * after the purchase's. The events fixture has no same-ts
    * signup/purchase pair per user (event timestamps are distinct at ns
    * grain), so the cross-formulation equality the spec asserts is
    * data-dependent; a dataset with such ties would need the window form
    * to order signups before purchases at equal ts. */
  def jxAsofExec(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("s_eid"))
    graft.plans.AsOfJoinExec.asof(purchases, signups,
        leftKey = "user_id", rightKey = "s_user",
        leftTime = "ts", rightTime = "s_ts", rightTieBreak = Some("s_eid"))
      .select(col("event_id"), col("user_id"),
        expr("ts DIV 1000").as("purchase_ts"),
        expr("s_ts DIV 1000").as("last_signup_ts"))
      .orderBy("event_id")
  }

  /** Time-to-convert report powered by the native as-of exec: per
    * purchase, days since the user's latest prior signup (the as-of
    * lag), bucketed to a day-grain histogram — the funnel-latency
    * deliverable that motivates having an as-of join at all.
    * Purchases with no prior signup report bucket −1. */
  def eConversionLag(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("s_eid"))
    graft.plans.AsOfJoinExec.asof(purchases, signups,
        leftKey = "user_id", rightKey = "s_user",
        leftTime = "ts", rightTime = "s_ts", rightTieBreak = Some("s_eid"))
      .select(when(col("s_ts").isNull, lit(-1L))
        .otherwise(expr("(ts - s_ts) DIV 86400000000000")).as("lag_days"))
      .groupBy("lag_days")
      .agg(count(lit(1)).as("n_purchases"))
      .orderBy("lag_days")
  }

  // ---- A1-A5, AX aggregations ----
  def a1MaxAggregate(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(max(col("l_orderkey")).as("max_key"),
        max(col("l_extendedprice")).as("max_price"))

  def a2MinMaxRange(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(min(col("o_orderkey")).as("min_id"), max(col("o_orderkey")).as("max_id"))

  def a3Count(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("l_orderkey")).as("n_orders"))

  def a4DedupLatest(s: SparkSession, d: String): DataFrame =
    // project BEFORE the dedup so only 3 columns ride the shuffle (the
    // max_by payload struct is opaque to Catalyst's column pruning)
    ChangeFeed.dedupLatest(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"), col("l_linenumber")),
        Seq("l_orderkey"), "l_shipdate", Seq("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
      .orderBy("l_orderkey")

  def a5RunningCounter(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d).filter(col("event_type") === "error")
      .withColumn("retry_no", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("retry_no"))
      .orderBy("event_id")
  }

  def axGroupedAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-01-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  def axRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("cnt"), col("total"))
      .orderBy("status", "priority")

  def axCube(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("bucket", (col("user_id") % 10).cast("long"))
      .cube(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(coalesce(col("event_type"), lit("(all)")).as("event_type"),
        coalesce(col("bucket"), lit(-1L)).as("bucket"),
        col("cnt"), col("sum_value"))
      .orderBy("event_type", "bucket")

  def axCountDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  /** HLL cardinality estimates WITH their error-bound certificates. The
    * estimates are engine-specific sketch state (not oracle-reproducible
    * numbers), so the graded output is the exact distinct counts plus 0/1
    * flags asserting |est − exact| ≤ 3·rsd·exact (rsd = Spark's default
    * 0.05; 3σ → 15%) — the DuckDB oracle recomputes the exacts and
    * expects both flags to hold. The exact countDistincts exist FOR the
    * certificate; a production 100 TB cardinality read uses the HLL
    * alone (that is the sketch's whole point). */
  def axApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(col("exact_parts"), col("exact_orders"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          lit(0.15) * col("exact_parts")).cast("long").as("parts_within_bound"),
        (abs(col("approx_orders") - col("exact_orders")) <=
          lit(0.15) * col("exact_orders")).cast("long").as("orders_within_bound"))

  // ---- W1-W4, WX windows ----
  def w1LatestPerKey(s: SparkSession, d: String): DataFrame =
    // latest-per-key via the aggregated dedupLatest (max_by): map-side
    // combine shrinks the shuffle to one row per customer per partition,
    // where the row_number window shuffled every order and sorted per key
    ChangeFeed.dedupLatest(
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_orderdate")),
        Seq("o_custkey"), "o_orderdate", Seq("o_orderkey"))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .orderBy("o_custkey")

  def w2RangeBucket(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val mm = o.agg(min(col("o_orderkey")).as("min_k"))
    o.crossJoin(broadcast(mm))
      .withColumn("bucket",
        floor((col("o_orderkey") - col("min_k")) / lit(500.0)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")
  }

  def w3BackoffLinear(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select((col("event_id") % 20).cast("long").as("n")).distinct()
      .withColumn("interval_min", RetryPolicy.linearBackoff(col("n"), 6, 12).cast("long"))
      .orderBy("n")

  def w4BackoffExpo(s: SparkSession, d: String): DataFrame =
    s.range(0, 25).select(col("id").as("n"))
      .withColumn("retry_s",
        round(RetryPolicy.geometricBackoff(col("n"), 10, 1.125, 720), 4))
      .withColumn("notify_s",
        round(RetryPolicy.geometricBackoff(col("n"), 15, 1.1125, 45), 4))
      .orderBy("n")

  def wxRankFuncs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_total"))
      .orderBy("o_custkey", "rn")
  }

  /** Distribution-position window functions — percent_rank (relative
    * rank in [0,1]) and cume_dist (fraction of peers at-or-below):
    * tie-robust by definition (both depend only on the order column's
    * tie structure, not on a tie-break), so the rounded values are
    * engine-portable without a deterministic suffix in the ORDER BY. */
  def wxPercentCume(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("c_custkey")
  }

  /** WX — value-positional window functions (first_value / last_value /
    * nth_value over the full-partition frame): each user's first, last
    * and second event type — the remaining window-function family after
    * rank/lag/frames/ntile/percent. Deterministic (ts, event_id) order;
    * one distinct collapses the per-row window results to one row per
    * user. */
  def wxValueFuncs(s: SparkSession, d: String): DataFrame = {
    val wFull = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("user_id"),
        first(col("event_type")).over(wFull).as("first_type"),
        last(col("event_type")).over(wFull).as("last_type"),
        nth_value(col("event_type"), 2).over(wFull).as("second_type"))
      .distinct()
      .orderBy("user_id")
  }

  def wxMovingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, 0)
    Tables.events(s, d)
      .select(col("event_id"),
        round(avg(col("value")).over(w), 6).as("mov_avg"),
        round(sum(col("value")).over(w), 6).as("mov_sum"))
      .orderBy("event_id")
  }

  /** Global ntile(4) WITHOUT a global single-partition window — delegated to
    * the ScalableNtile operator (histogram two-pass: uniform bins assigned
    * via broadcast, only cutoff-straddling bins window-ranked; no full-table
    * exchange). The trailing orderBy is output canonicalization for the
    * oracle, not part of the operator. */
  def wxNtile(s: SparkSession, d: String): DataFrame =
    graft.operators.ScalableNtile(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")),
      numTiles = 4,
      bin = floor(col("o_totalprice") / 1000.0).cast("long"),
      sortKeys = Seq(col("o_totalprice"), col("o_orderkey")),
      out = "quartile")
      .select(col("o_orderkey"), col("quartile"))
      .orderBy("o_orderkey")

  val queries: Map[String, Q] = Map(
    "j1_change_current_state" -> (j1ChangeCurrentState _),
    "j2_batched_selfjoin" -> (j2BatchedSelfJoin _),
    "j3_config_lookup" -> (j3ConfigLookup _),
    "j4_semi_membership" -> (j4SemiMembership _),
    "j4_anti_membership" -> (j4AntiMembership _),
    "jx_star_join" -> (jxStarJoin _),
    "jx_left_join" -> (jxLeftJoin _),
    "jx_right_join" -> (jxRightJoin _),
    "jx_full_join" -> (jxFullJoin _),
    "jx_asof_join" -> (jxAsofJoin _),
    "jx_asof_exec" -> (jxAsofExec _),
    "e_conversion_lag" -> (eConversionLag _),
    "a1_max_aggregate" -> (a1MaxAggregate _),
    "a2_min_max_range" -> (a2MinMaxRange _),
    "a3_count" -> (a3Count _),
    "a4_dedup_latest" -> (a4DedupLatest _),
    "a5_running_counter" -> (a5RunningCounter _),
    "ax_grouped_agg" -> (axGroupedAgg _),
    "ax_rollup" -> (axRollup _),
    "ax_cube" -> (axCube _),
    "ax_count_distinct" -> (axCountDistinct _),
    "ax_approx_distinct" -> (axApproxDistinct _),
    "w1_latest_per_key" -> (w1LatestPerKey _),
    "w2_range_bucket" -> (w2RangeBucket _),
    "w3_backoff_linear" -> (w3BackoffLinear _),
    "w4_backoff_expo" -> (w4BackoffExpo _),
    "wx_rank_funcs" -> (wxRankFuncs _),
    "wx_moving_avg" -> (wxMovingAvg _),
    "wx_value_funcs" -> (wxValueFuncs _),
    "wx_percent_cume" -> (wxPercentCume _),
    "wx_ntile" -> (wxNtile _),
  )

  val oracle: Map[String, String] = Map(
    "j1_change_current_state" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |         o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 13 <> 0),
        |new AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 0)
        |SELECT CASE WHEN o.o_orderkey IS NULL THEN 'Insert'
        |            WHEN n.o_orderkey IS NULL THEN 'Delete'
        |            ELSE 'Update' END AS "Operation",
        |       COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |       n.o_custkey AS o_custkey, n.o_orderstatus AS o_orderstatus,
        |       n.o_totalprice AS o_totalprice
        |FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
        |WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
        |   OR n.o_custkey IS DISTINCT FROM o.o_custkey
        |   OR n.o_orderstatus IS DISTINCT FROM o.o_orderstatus
        |   OR n.o_totalprice IS DISTINCT FROM o.o_totalprice
        |   OR n.o_orderdate IS DISTINCT FROM o.o_orderdate
        |   OR n.o_orderpriority IS DISTINCT FROM o.o_orderpriority
        |ORDER BY o_orderkey""".stripMargin,
    "j2_batched_selfjoin" ->
      """SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber, l.l_quantity
        |FROM lineitem l
        |JOIN (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey BETWEEN 500 AND 999) c
        |  ON l.l_orderkey = c.o_orderkey
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "j3_config_lookup" ->
      """SELECT e.event_id, e.event_type, COALESCE(c.route, '/t/default') AS route
        |FROM events e
        |LEFT JOIN (VALUES ('click','/t/click'), ('view','/t/view'),
        |                  ('purchase','/t/buy'), ('signup','/t/signup'))
        |  AS c(event_type, route) ON e.event_type = c.event_type
        |ORDER BY e.event_id""".stripMargin,
    "j4_semi_membership" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     WHERE l_shipdate > TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY o_orderkey""".stripMargin,
    "j4_anti_membership" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
        |                         WHERE l_shipdate > TIMESTAMP '2000-01-01 00:00:00')
        |ORDER BY o_orderkey""".stripMargin,
    "jx_star_join" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_regionkey < 3
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "jx_left_join" ->
      """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "jx_right_join" ->
      """SELECT c_custkey, max(o_totalprice) AS max_price
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "jx_full_join" ->
      """WITH open AS (SELECT o_custkey AS custkey, count(*) AS n_open
        |              FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey),
        |fin AS (SELECT o_custkey AS custkey, count(*) AS n_finished
        |        FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
        |SELECT COALESCE(open.custkey, fin.custkey) AS custkey,
        |       CAST(COALESCE(open.n_open, 0) AS BIGINT) AS n_open,
        |       CAST(COALESCE(fin.n_finished, 0) AS BIGINT) AS n_finished
        |FROM open FULL OUTER JOIN fin ON open.custkey = fin.custkey
        |ORDER BY custkey""".stripMargin,
    "jx_asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_ts, epoch_us(s.ts) AS last_signup_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND s.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    "e_conversion_lag" ->
      """WITH j AS (
        |  SELECT p.ts AS pts, s.ts AS sts
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |    ON p.user_id = s.user_id AND s.ts <= p.ts)
        |SELECT CASE WHEN sts IS NULL THEN CAST(-1 AS BIGINT)
        |  ELSE (epoch_us(pts) - epoch_us(sts)) // 86400000000 END AS lag_days,
        |  CAST(count(*) AS BIGINT) AS n_purchases
        |FROM j GROUP BY 1 ORDER BY lag_days""".stripMargin,
    "jx_asof_exec" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_ts, epoch_us(s.ts) AS last_signup_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND s.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    "a1_max_aggregate" ->
      "SELECT max(l_orderkey) AS max_key, max(l_extendedprice) AS max_price FROM lineitem",
    "a2_min_max_range" ->
      "SELECT min(o_orderkey) AS min_id, max(o_orderkey) AS max_id FROM orders",
    "a3_count" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM lineitem""".stripMargin,
    "a4_dedup_latest" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_shipdate DESC, l_linenumber DESC) AS rn FROM lineitem)
        |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "a5_running_counter" ->
      """SELECT event_id, user_id,
        |       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS retry_no
        |FROM events WHERE event_type = 'error'
        |ORDER BY event_id""".stripMargin,
    "ax_grouped_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "ax_rollup" ->
      """SELECT COALESCE(o_orderstatus, '(all)') AS status,
        |       COALESCE(o_orderpriority, '(all)') AS priority,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "ax_cube" ->
      """SELECT COALESCE(event_type, '(all)') AS event_type,
        |       COALESCE(bucket, -1) AS bucket,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       round(sum(value), 2) AS sum_value
        |FROM (SELECT event_type, CAST(user_id % 10 AS BIGINT) AS bucket, value FROM events)
        |GROUP BY CUBE(event_type, bucket)
        |ORDER BY event_type, bucket""".stripMargin,
    "ax_count_distinct" ->
      """SELECT l_returnflag,
        |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the HLL estimates themselves are engine state; the oracle checks the
    // exact counts AND that Spark's within-bound certificates both hold
    "ax_approx_distinct" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |       CAST(1 AS BIGINT) AS parts_within_bound,
        |       CAST(1 AS BIGINT) AS orders_within_bound
        |FROM lineitem""".stripMargin,
    "w1_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "w2_range_bucket" ->
      """SELECT CAST(floor((o_orderkey - (SELECT min(o_orderkey) FROM orders)) / 500.0) AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,
    "w3_backoff_linear" ->
      """SELECT n, CAST(least(6 + n, 12) AS BIGINT) AS interval_min
        |FROM (SELECT DISTINCT CAST(event_id % 20 AS BIGINT) AS n FROM events)
        |ORDER BY n""".stripMargin,
    "w4_backoff_expo" ->
      """SELECT range AS n,
        |       round(least(10 * pow(1.125, range), 720), 4) AS retry_s,
        |       round(least(15 * pow(1.1125, range), 45), 4) AS notify_s
        |FROM range(0, 25) ORDER BY n""".stripMargin,
    "wx_rank_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  CAST(row_number() OVER w AS BIGINT) AS rn,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, rn""".stripMargin,
    "wx_percent_cume" ->
      """SELECT c_custkey, c_nationkey,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
        |ORDER BY c_custkey""".stripMargin,
    "wx_moving_avg" ->
      """SELECT event_id,
        |  round(avg(value) OVER w, 6) AS mov_avg,
        |  round(sum(value) OVER w, 6) AS mov_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "wx_value_funcs" ->
      """SELECT DISTINCT user_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type,
        |  nth_value(event_type, 2) OVER w AS second_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin,
    "wx_ntile" ->
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
