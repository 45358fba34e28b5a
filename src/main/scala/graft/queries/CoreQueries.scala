package graft.queries

import graft.Tables
import graft.operators.AllowlistProjection
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-backed queries for SURVEY.md §2.2 (P1-P10 projections / filters /
  * predicates). Each entry has a matching DuckDB SQL in `oracle` with
  * identical column names, types (bigint/double/string), and ORDER BY.
  *
  * Determinism rules used throughout the catalog:
  *   - every query ends with a canonical ORDER BY on a unique key;
  *   - integer outputs are bigint on both sides (DuckDB sums are HUGEINT —
  *     always CAST to BIGINT in the oracle);
  *   - event timestamps (ns precision in parquet) are emitted as epoch
  *     seconds (bigint) so both engines agree on representation;
  *   - doubles are only emitted as passthrough values or round()ed
  *     aggregates, never raw float arithmetic.
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  /** P1 — flagship column-allowlist projection, case-insensitive match.
    * Config string deliberately messy: spacing + wrong case + unknown col. */
  def p1AllowlistProjection(s: SparkSession, d: String): DataFrame =
    AllowlistProjection(
      Tables.customer(s, d),
      config = Some("c_custkey, C_NAME , no_such_col"),
      client = Some("c_acctbal,C_CUSTKEY"))
      .orderBy("c_custkey")

  /** P1 dynamic-schema variant (SURVEY.md §2.2): when the row payload is a
    * runtime property bag (the reference's JsonObject), the allowlist filter
    * is a `map_filter` over the parsed JSON instead of a static select —
    * fully NARROW (no explode, no groupBy shuffle): parse, filter keys,
    * canonicalize to sorted "k=v" strings per row so the oracle compares
    * bytes. Events whose bag has no allowed key are dropped, matching the
    * oracle's filter-then-GROUP-BY shape. */
  def p1DynamicAllowlist(s: SparkSession, d: String): DataFrame = {
    val allowed = Seq("k", "not_present")
    val parsed = from_json(col("props"),
      org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))
    val kept = map_filter(parsed, (k, _) => k.isin(allowed: _*))
    Tables.events(s, d)
      .select(col("event_id"), kept.as("kept"))
      .filter(size(col("kept")) > 0)
      .select(col("event_id"),
        concat_ws(",", sort_array(transform(map_entries(col("kept")),
          e => concat(e.getField("key"), lit("="), e.getField("value").cast("string")))))
          .as("kept_props"))
      .orderBy("event_id")
  }

  /** P2 — allowlist parse: comma-split, trim, drop empties, keep order. */
  def p2AllowlistParse(s: SparkSession, d: String): DataFrame = {
    val cfg = "Id, Name ,,LastUpdate, ,Status"
    s.range(1).select(
      posexplode(
        filter(transform(split(lit(cfg), ","), c => trim(c)), c => c =!= "")
      ).as(Seq("pos", "colname")))
      .select(col("pos").cast("long").as("pos"), col("colname"))
      .orderBy("pos")
  }

  /** P3 — null/blank guard (IsNullOrWhiteSpace semantics). */
  def p3NullBlankGuard(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("maybe_blank",
        when(col("doc_id") % 3 === 0, lit(null: String))
          .when(col("doc_id") % 3 === 1, lit("   "))
          .otherwise(col("text")))
      .filter(col("maybe_blank").isNotNull && trim(col("maybe_blank")) =!= "")
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** P4 — identifier normalization: strip [brackets] from table names. */
  def p4IdentifierNormalize(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(concat(lit("[dbo].["), col("source"), lit("]")).as("bracketed"))
      .distinct()
      .select(regexp_replace(col("bracketed"), "[\\[\\]]", "").as("table_name"))
      .orderBy("table_name")

  /** P5 — retryable-status classification (429/408/5xx ⇒ retry). */
  def p5RetryClassify(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("status", (lit(100) + col("event_id") % 600).cast("long"))
      .withColumn("disposition",
        graft.operators.RetryPolicy.classifyStatus(col("status")))
      .select(col("event_id"), col("status"), col("disposition"))
      .orderBy("event_id")

  /** P6 — "retry=false" prefix marker suppresses the retry path. */
  def p6PrefixMarker(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("marker",
        when(col("event_type") === "error", lit("retry=false: permanent"))
          .otherwise(concat(lit("retry=true: "), col("event_type"))))
      .filter(graft.operators.RetryPolicy.allowsRetry(col("marker")))
      .select(col("event_id"), col("marker"))
      .orderBy("event_id")

  /** P7 — retry-timeout predicate: start + timeout < now (72 h window,
    * "now" pinned for determinism; epoch-seconds arithmetic both sides). */
  def p7TimeoutPredicate(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("start_epoch", Tables.tsEpochSeconds)
      .filter(col("start_epoch") + lit(72L * 3600) <
        unix_timestamp(to_timestamp(lit("2024-01-20 00:00:00"))))
      .select(col("event_id"), col("start_epoch"))
      .orderBy("event_id")

  /** P8 — range predicate: Id BETWEEN cursor AND cursor+batch-1. */
  def p8RangePredicate(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey").between(100, 1099))
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"))
      // (l_orderkey, l_linenumber) is NOT unique in the testdata — include
      // l_quantity for a total order.
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  /** P9 — purge predicate: created <= cutoff AND status IN (...). */
  def p9PurgePredicate(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("created_epoch", Tables.tsEpochSeconds)
      .filter(col("created_epoch") <=
          unix_timestamp(to_timestamp(lit("2024-01-15 00:00:00"))) &&
        col("event_type").isin("error", "signup"))
      .select(col("event_id"), col("created_epoch"), col("event_type"))
      .orderBy("event_id")

  /** P10 — null-coalescing defaults (?? operators). */
  def p10NullCoalesce(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("maybe_value", when(col("value") < 1.0, lit(null)).otherwise(col("value")))
      .withColumn("maybe_err",
        when(col("event_type") === "error", lit(null: String)).otherwise(col("event_type")))
      .select(
        col("event_id"),
        coalesce(col("maybe_value"), lit(0.0)).as("value_or_zero"),
        coalesce(col("maybe_err"), lit("No error information")).as("err_or_default"))
      .orderBy("event_id")

  val queries: Map[String, Q] = Map(
    "p1_allowlist_projection" -> (p1AllowlistProjection _),
    "p1_dynamic_allowlist" -> (p1DynamicAllowlist _),
    "p2_allowlist_parse" -> (p2AllowlistParse _),
    "p3_null_blank_guard" -> (p3NullBlankGuard _),
    "p4_identifier_normalize" -> (p4IdentifierNormalize _),
    "p5_retry_classify" -> (p5RetryClassify _),
    "p6_prefix_marker" -> (p6PrefixMarker _),
    "p7_timeout_predicate" -> (p7TimeoutPredicate _),
    "p8_range_predicate" -> (p8RangePredicate _),
    "p9_purge_predicate" -> (p9PurgePredicate _),
    "p10_null_coalesce" -> (p10NullCoalesce _),
  )

  val oracle: Map[String, String] = Map(
    "p1_allowlist_projection" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey",
    "p1_dynamic_allowlist" ->
      """SELECT event_id,
        |  string_agg(pkey || '=' || pval, ',' ORDER BY pkey || '=' || pval) AS kept_props
        |FROM (
        |  SELECT event_id, pkey, json_extract_string(props, '$.' || pkey) AS pval
        |  FROM (SELECT event_id, props, unnest(json_keys(props)) AS pkey FROM events))
        |WHERE pkey IN ('k', 'not_present')
        |GROUP BY event_id
        |ORDER BY event_id""".stripMargin,
    "p2_allowlist_parse" ->
      """WITH a AS (
        |  SELECT list_filter(list_transform(str_split('Id, Name ,,LastUpdate, ,Status', ','), x -> trim(x)), x -> x <> '') AS arr
        |)
        |SELECT CAST(g.pos AS BIGINT) - 1 AS pos, a.arr[g.pos] AS colname
        |FROM a, (SELECT unnest(generate_series(1, 6)) AS pos) g
        |WHERE g.pos <= len(a.arr)
        |ORDER BY pos""".stripMargin,
    "p3_null_blank_guard" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 3 = 0 THEN NULL
        |         WHEN doc_id % 3 = 1 THEN '   '
        |         ELSE text END AS maybe_blank
        |  FROM documents)
        |WHERE maybe_blank IS NOT NULL AND trim(maybe_blank) <> ''
        |ORDER BY doc_id""".stripMargin,
    "p4_identifier_normalize" ->
      """SELECT regexp_replace(bracketed, '[\[\]]', '', 'g') AS table_name
        |FROM (SELECT DISTINCT '[dbo].[' || source || ']' AS bracketed FROM documents)
        |ORDER BY table_name""".stripMargin,
    "p5_retry_classify" ->
      """SELECT event_id, CAST(100 + event_id % 600 AS BIGINT) AS status,
        |  CASE WHEN (100 + event_id % 600) IN (429, 408) OR (100 + event_id % 600) >= 500
        |       THEN 'retry' ELSE 'notify' END AS disposition
        |FROM events ORDER BY event_id""".stripMargin,
    "p6_prefix_marker" ->
      """SELECT event_id, marker FROM (
        |  SELECT event_id,
        |    CASE WHEN event_type = 'error' THEN 'retry=false: permanent'
        |         ELSE 'retry=true: ' || event_type END AS marker
        |  FROM events)
        |WHERE marker NOT LIKE 'retry=false%'
        |ORDER BY event_id""".stripMargin,
    "p7_timeout_predicate" ->
      """SELECT event_id, epoch_ms(ts) // 1000 AS start_epoch
        |FROM events
        |WHERE epoch_ms(ts) // 1000 + 72 * 3600 < epoch_ms(TIMESTAMP '2024-01-20 00:00:00') // 1000
        |ORDER BY event_id""".stripMargin,
    "p8_range_predicate" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
        |FROM lineitem WHERE l_orderkey BETWEEN 100 AND 1099
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "p9_purge_predicate" ->
      """SELECT event_id, epoch_ms(ts) // 1000 AS created_epoch, event_type
        |FROM events
        |WHERE epoch_ms(ts) // 1000 <= epoch_ms(TIMESTAMP '2024-01-15 00:00:00') // 1000
        |  AND event_type IN ('error', 'signup')
        |ORDER BY event_id""".stripMargin,
    "p10_null_coalesce" ->
      """SELECT event_id,
        |  COALESCE(CASE WHEN value < 1.0 THEN NULL ELSE value END, 0.0) AS value_or_zero,
        |  COALESCE(CASE WHEN event_type = 'error' THEN NULL ELSE event_type END,
        |           'No error information') AS err_or_default
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
