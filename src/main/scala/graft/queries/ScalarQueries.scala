package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 sorts/limits (L1-L3, LX), §2.7 set ops (U1-U3, UX),
  * §2.8 scalar functions (F1-F19 grouped), and the SQL-expressible scan/sink
  * rows (S2 preview scan, S9 JSON serialization, S10 purge rewrite).
  *
  * JSON serialization (F17/S9) is built with explicit concat on both sides so
  * the oracle compares bytes, not engine-specific JSON formatting.
  */
object ScalarQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- F1-F8: string functions over documents ----
  def fStringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        upper(col("lang")).as("lang_upper"),
        trim(concat(lit("  "), col("source"), lit(" "))).as("trimmed"),
        regexp_replace(col("source"), "src", "source_").as("replaced"),
        col("text").startsWith("the").as("starts_the"),
        col("source").endsWith("1").as("ends_1"),
        substring(col("text"), 1, 20).as("prefix20"),
        length(col("text")).cast("long").as("text_len"),
        (lower(col("lang")) === lower(lit("EN"))).as("is_en"),
        concat(lit("doc_"), col("doc_id").cast("string"), lit("_"), col("lang")).as("tagged"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      .orderBy("doc_id")

  // ---- F10-F12: date/time functions over orders ----
  def fDatetimeFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("order_day"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus_30d"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast("long").as("days_since_epoch0"))
      .orderBy("o_orderkey")

  // ---- F9, F13-F16: math / comparison / cast functions over lineitem ----
  def fMathFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 2000)
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"),
        abs(col("l_discount") - 0.05).as("abs_disc_delta"),
        round(col("l_extendedprice") * 0.1, 3).as("tenth_price"),
        floor(col("l_quantity") / 7.0).cast("long").as("qty_div7"),
        ceil(col("l_quantity") / 7.0).cast("long").as("qty_div7_up"),
        round(pow(col("l_discount"), 2), 8).as("disc_sq"),
        least(col("l_quantity"), lit(25.0)).as("qty_capped"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        (col("l_orderkey") % 7).cast("long").as("key_mod7"),
        (col("l_linenumber") + 1).cast("long").as("next_line"),
        col("l_orderkey").cast("string").as("key_str"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  // ---- Extended string functions ----
  def fString2Funcs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        lpad(col("source"), 8, "0").as("padded"),
        rpad(col("lang"), 5, ".").as("rpadded"),
        reverse(col("lang")).as("rev_lang"),
        repeat(col("lang"), 3).as("tripled"),
        translate(col("source"), "src", "SRC").as("translated"),
        instr(col("text"), "the").cast("long").as("first_the"),
        substring_index(col("text"), " ", 3).as("first3_words"),
        expr("left(text, 10)").as("left10"),
        expr("right(source, 2)").as("right2"))
      .orderBy("doc_id")

  // ---- Extended datetime functions ----
  def fDatetime2Funcs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).cast("long").as("order_quarter"),
        // Spark dayofweek: 1=Sunday..7; DuckDB dayofweek: 0=Sunday..6 — align
        (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow_sunday0"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(add_months(col("o_orderdate"), 2), "yyyy-MM-dd").as("plus_2mo"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy("o_orderkey")

  // ---- Bitwise functions over integer keys ----
  def fBitwiseFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        (col("event_id").bitwiseAND(lit(255L))).as("lo_byte"),
        (col("event_id").bitwiseOR(lit(4096L))).as("or_4k"),
        (col("event_id").bitwiseXOR(col("user_id"))).as("xor_user"),
        shiftleft(col("event_id"), 3).as("shl3"),
        shiftright(col("event_id"), 2).as("shr2"))
      .orderBy("event_id")

  // ---- Extended math: roots, exponentials, logarithms, sign ----
  def fMath2Funcs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 1000)
      .select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"),
        round(sqrt(col("l_quantity")), 8).as("sqrt_qty"),
        round(exp(col("l_discount")), 8).as("exp_disc"),
        round(log(col("l_quantity") + 1.0), 8).as("ln_qty"),       // natural log
        round(log10(col("l_extendedprice")), 8).as("log10_price"),
        round(log2(col("l_quantity") + 1.0), 8).as("log2_qty"),
        signum(col("l_quantity") - 25.0).as("sign_qty_delta"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  // ---- Conditional expressions: nullif / nvl / nvl2 / CASE ladders ----
  def fConditionalFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("null_if_open"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("nvl_status"),
        when(nullif(col("o_orderstatus"), lit("O")).isNotNull, lit("terminal"))
          .otherwise(lit("active")).as("nvl2_style"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("price_band"))
      .orderBy("o_orderkey")

  // ---- Higher-order array functions over the embedding column ----
  def fArrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")), 6).as("sum_sq"),
        size(filter(col("embedding"), x => x > 0f)).cast("long").as("n_positive"),
        round(aggregate(transform(col("embedding"), x => abs(x.cast("double"))),
          lit(0.0), (acc, x) => greatest(acc, x)), 6).as("max_abs"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_dim"))
      .orderBy("vec_id")

  // ---- F18: JSON property extraction over events.props ----
  def fJsonFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_int"),
        get_json_object(col("props"), "$.missing").as("missing_prop"))
      .orderBy("event_id")

  // ---- F17/S9: JSON wire-payload serialization (byte-exact both sides) ----
  def f17JsonSerialize(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") <= 1000)
      .select(
        col("o_orderkey"),
        concat(
          lit("{\"Operation\":\"Update\",\"Item\":{\"Id\":"),
          col("o_orderkey").cast("string"),
          lit(",\"Status\":\""), col("o_orderstatus"),
          lit("\"}}")).as("payload"))
      .orderBy("o_orderkey")

  // ---- S2: bounded preview scan (TOP 1000 semantics) ----
  def s2PreviewScan(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy("o_orderkey")
      .limit(1000)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))

  // ---- S10: purge rewrite — the KEPT side of the cleanup delete ----
  def s10PurgeRewrite(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("created_epoch", Tables.tsEpochSeconds)
      .filter(!(col("created_epoch") <=
          unix_timestamp(to_timestamp(lit("2024-01-15 00:00:00"))) &&
        col("event_type").isin("error", "signup")))
      .select(col("event_id"), col("created_epoch"), col("event_type"))
      .orderBy("event_id")

  // ---- L1-L3, LX: sorts / limits / top-k ----
  def l1TopPreview(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .limit(1000)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))

  def l2OrderedScan(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")

  def l3ErrorTruncate(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        when(length(col("text")) > 100, substring(col("text"), 1, 100))
          .otherwise(col("text")).as("snippet"),
        least(length(col("text")), lit(100)).cast("long").as("snippet_len"))
      .orderBy("doc_id")

  def lxTopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(100)
      .select(col("o_orderkey"), col("o_totalprice"))

  // ---- U1-U3, UX: set operations ----
  def u1UnionDistinct(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    val b = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey"))
    a.union(b).distinct().orderBy("custkey")
  }

  def u2Except(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).select(col("o_custkey").as("custkey"))
    val b = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    a.except(b).orderBy("custkey")
  }

  def u3Intersect(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
    val b = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    a.intersect(b).orderBy("custkey")
  }

  def uxUnionAll(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(lit("open").as("tag"), col("o_custkey").as("custkey"))
    val b = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(lit("finished").as("tag"), col("o_custkey").as("custkey"))
    a.unionAll(b)
      .groupBy(col("tag")).agg(count(lit(1)).as("cnt"))
      .orderBy("tag")
  }

  val queries: Map[String, Q] = Map(
    "f_string_funcs" -> (fStringFuncs _),
    "f_datetime_funcs" -> (fDatetimeFuncs _),
    "f_math_funcs" -> (fMathFuncs _),
    "f_string2_funcs" -> (fString2Funcs _),
    "f_datetime2_funcs" -> (fDatetime2Funcs _),
    "f_bitwise_funcs" -> (fBitwiseFuncs _),
    "f_math2_funcs" -> (fMath2Funcs _),
    "f_conditional_funcs" -> (fConditionalFuncs _),
    "f_array_funcs" -> (fArrayFuncs _),
    "f_json_funcs" -> (fJsonFuncs _),
    "f17_json_serialize" -> (f17JsonSerialize _),
    "s2_preview_scan" -> (s2PreviewScan _),
    "s10_purge_rewrite" -> (s10PurgeRewrite _),
    "l1_top_preview" -> (l1TopPreview _),
    "l2_ordered_scan" -> (l2OrderedScan _),
    "l3_error_truncate" -> (l3ErrorTruncate _),
    "lx_top_k" -> (lxTopK _),
    "u1_union_distinct" -> (u1UnionDistinct _),
    "u2_except" -> (u2Except _),
    "u3_intersect" -> (u3Intersect _),
    "ux_union_all" -> (uxUnionAll _),
  )

  val oracle: Map[String, String] = Map(
    "f_string_funcs" ->
      """SELECT doc_id,
        |  upper(lang) AS lang_upper,
        |  trim('  ' || source || ' ') AS trimmed,
        |  regexp_replace(source, 'src', 'source_', 'g') AS replaced,
        |  starts_with(text, 'the') AS starts_the,
        |  ends_with(source, '1') AS ends_1,
        |  substring(text, 1, 20) AS prefix20,
        |  CAST(length(text) AS BIGINT) AS text_len,
        |  lower(lang) = lower('EN') AS is_en,
        |  'doc_' || CAST(doc_id AS VARCHAR) || '_' || lang AS tagged,
        |  CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f_datetime_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS order_month,
        |  CAST(day(o_orderdate) AS BIGINT) AS order_day,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch0
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f_math_funcs" ->
      """SELECT l_orderkey,
        |  CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_quantity,
        |  abs(l_discount - 0.05) AS abs_disc_delta,
        |  round(l_extendedprice * 0.1, 3) AS tenth_price,
        |  CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_div7,
        |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_div7_up,
        |  round(pow(l_discount, 2), 8) AS disc_sq,
        |  least(l_quantity, 25.0) AS qty_capped,
        |  greatest(l_tax, l_discount) AS max_rate,
        |  CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
        |  CAST(l_linenumber + 1 AS BIGINT) AS next_line,
        |  CAST(l_orderkey AS VARCHAR) AS key_str
        |FROM lineitem WHERE l_orderkey <= 2000
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "f_string2_funcs" ->
      """SELECT doc_id,
        |  lpad(source, 8, '0') AS padded,
        |  rpad(lang, 5, '.') AS rpadded,
        |  reverse(lang) AS rev_lang,
        |  repeat(lang, 3) AS tripled,
        |  translate(source, 'src', 'SRC') AS translated,
        |  CAST(instr(text, 'the') AS BIGINT) AS first_the,
        |  CASE WHEN len(str_split(text, ' ')) <= 3 THEN text
        |       ELSE array_to_string((str_split(text, ' '))[1:3], ' ') END AS first3_words,
        |  left(text, 10) AS left10,
        |  right(source, 2) AS right2
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f_datetime2_funcs" ->
      """SELECT o_orderkey,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sunday0,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2mo,
        |  epoch_ms(o_orderdate) // 1000 AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f_bitwise_funcs" ->
      """SELECT event_id,
        |  event_id & 255 AS lo_byte,
        |  event_id | 4096 AS or_4k,
        |  xor(event_id, user_id) AS xor_user,
        |  event_id << 3 AS shl3,
        |  event_id >> 2 AS shr2
        |FROM events ORDER BY event_id""".stripMargin,
    "f_math2_funcs" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity,
        |  round(sqrt(l_quantity), 8) AS sqrt_qty,
        |  round(exp(l_discount), 8) AS exp_disc,
        |  round(ln(l_quantity + 1.0), 8) AS ln_qty,
        |  round(log10(l_extendedprice), 8) AS log10_price,
        |  round(log2(l_quantity + 1.0), 8) AS log2_qty,
        |  CAST(sign(l_quantity - 25.0) AS DOUBLE) AS sign_qty_delta
        |FROM lineitem WHERE l_orderkey <= 1000
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "f_conditional_funcs" ->
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') AS null_if_open,
        |  COALESCE(nullif(o_orderstatus, 'O'), 'OPEN') AS nvl_status,
        |  CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL THEN 'terminal'
        |       ELSE 'active' END AS nvl2_style,
        |  CASE WHEN o_totalprice > 300000 THEN 'high'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'low' END AS price_band
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "f_array_funcs" ->
      """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
        |       CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)
        |SELECT vec_id,
        |  CAST(count(*) AS BIGINT) AS dim,
        |  round(sum(v * v), 6) AS sum_sq,
        |  CAST(sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive,
        |  round(max(abs(v)), 6) AS max_abs,
        |  round(max(CASE WHEN pos = 1 THEN v END), 6) AS first_dim
        |FROM e GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "f_json_funcs" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |  json_extract_string(props, '$.missing') AS missing_prop
        |FROM events ORDER BY event_id""".stripMargin,
    "f17_json_serialize" ->
      """SELECT o_orderkey,
        |  '{"Operation":"Update","Item":{"Id":' || CAST(o_orderkey AS VARCHAR)
        |    || ',"Status":"' || o_orderstatus || '"}}' AS payload
        |FROM orders WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin,
    "s2_preview_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 1000)
        |ORDER BY o_orderkey""".stripMargin,
    "s10_purge_rewrite" ->
      """SELECT event_id, epoch_ms(ts) // 1000 AS created_epoch, event_type
        |FROM events
        |WHERE NOT (epoch_ms(ts) // 1000 <= epoch_ms(TIMESTAMP '2024-01-15 00:00:00') // 1000
        |           AND event_type IN ('error', 'signup'))
        |ORDER BY event_id""".stripMargin,
    "l1_top_preview" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       l_quantity, l_extendedprice
        |FROM (SELECT * FROM lineitem
        |      ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice LIMIT 1000)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,
    "l2_ordered_scan" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey",
    "l3_error_truncate" ->
      """SELECT doc_id,
        |  CASE WHEN length(text) > 100 THEN substring(text, 1, 100) ELSE text END AS snippet,
        |  CAST(least(length(text), 100) AS BIGINT) AS snippet_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "lx_top_k" ->
      """SELECT o_orderkey, o_totalprice
        |FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100)
        |ORDER BY o_totalprice DESC, o_orderkey ASC""".stripMargin,
    "u1_union_distinct" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  UNION
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
        |ORDER BY custkey""".stripMargin,
    "u2_except" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  EXCEPT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY custkey""".stripMargin,
    "u3_intersect" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY custkey""".stripMargin,
    "ux_union_all" ->
      """SELECT tag, CAST(count(*) AS BIGINT) AS cnt FROM (
        |  SELECT 'open' AS tag, o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT 'finished' AS tag, o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY tag ORDER BY tag""".stripMargin,
  )
}
