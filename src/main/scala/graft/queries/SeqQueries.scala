package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** [E] Event-sequence analytics over the `events` table: the behavioral
  * layer a training-data pipeline needs when the corpus is interaction
  * logs rather than documents — next-event transition models, session
  * path mining, and recency weighting (the events-side analogue of the
  * documents-side freshness/quality weights in
  * [[graft.functions.DatasetSplit]]).
  *
  * Reference tie-in: the reference's change feed is itself an event log
  * (README.md:5,19-23 — per-row Insert/Update/Delete operations ordered
  * by a rowversion); these operators are the analytics a consumer runs
  * over that delivered log. Everything here is per-user-keyed window or
  * plain aggregation — the shuffles key on `user_id` (150 per sf0.01;
  * grows with the corpus), never on a constant, so parallelism scales
  * with the data.
  *
  * The one bounded caveat of per-user sequence semantics: a single
  * pathological power user (a bot with a billion events) funnels its
  * history through one task — inherent to ANY per-key ordered
  * computation, not to these plans. The production guard is upstream:
  * `e_skew_report` surfaces exactly this key profile, `e_user_drift`
  * flags the bot-shaped distribution, and the sessionized operators can
  * pre-split such a user on coarse time buckets (sessions never span a
  * bucket longer than the gap) before the window — the same
  * time-sharded trick `CorpusShuffle` uses.
  *
  * Determinism contract (shared with every oracle in this package): event
  * order is `(et, event_id)` — epoch-second plus the unique id tie-break —
  * and every floating aggregate is either an exact integer ratio or a
  * scaled-bigint sum, so DuckDB reproduces the hash bit-for-bit.
  */
object SeqQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Session gap: a new session starts after ≥ this many seconds of
    * user inactivity. 12 h matches the synthetic corpus's ~10.5 h mean
    * per-user inter-arrival (mean session ≈ 3 events, max 18 at sf0.01),
    * so path mining has signal; a production click-stream sets ~30 min. */
  private val SessionGapSec = 43200L
  /** Path mining: events kept per session path (head of the session). */
  private val PathLen = 5
  /** Path mining: report depth (top paths by session count). */
  private val PathTopN = 20
  /** Recency weighting: discrete half-life in seconds (1 day). Weight for
    * an event `age` seconds before the corpus's newest event is
    * 2^-(age DIV halfLife) — integer bucket decay, so the weighted sum is
    * an exact scaled-bigint in both engines. */
  private val DecayHalfLifeSec = 86400L
  /** Ages beyond this many half-lives contribute 0 at the 1e-6 grain the
    * scaled sum keeps (2^-40 ≈ 9e-13); also keeps the shift in-range. */
  private val DecayMaxBuckets = 40

  private def withEt(df: DataFrame): DataFrame =
    df.withColumn("et", Tables.tsEpochSeconds)

  private val eventOrder = Seq(col("et"), col("event_id"))

  /** Markov next-event transition matrix: P(next event type | previous),
    * from per-user lag pairs. The window shuffles once on `user_id`
    * (data-proportional key count); the transition matrix itself is
    * |types|² — bounded — so the totals join broadcasts. `p` is an exact
    * int/int double ratio, reproducible across engines. */
  def eEventTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(eventOrder: _*)
    val prs = withEt(Tables.events(s, d))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .select(col("prev_type"), col("event_type").as("next_type"))
    val cnt = prs.groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("prev_type").agg(sum(col("n")).as("n_from"))
    cnt.join(broadcast(tot), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n").cast("double") / col("n_from"), 6).as("p"))
      .orderBy("prev_type", "next_type")
  }

  /** Session path mining: sessionize per user on a [[SessionGapSec]]
    * inactivity gap (lag + running sum — the batch formulation of
    * `session_window`, keyed identically), render each session's first
    * [[PathLen]] event types as a `>`-joined path, and report the
    * [[PathTopN]] most common paths. The per-session path is built from
    * ONE `collect_list` + `array_sort` inside the (user, session) group —
    * session sizes are bounded by the gap semantics, so the buffer is
    * bounded; no second window pass. TakeOrderedAndProject caps the
    * report. */
  def eSessionPaths(s: SparkSession, d: String): DataFrame = {
    val paths = sessionized(withEt(Tables.events(s, d)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(
            slice(array_sort(collect_list(
              struct(col("et"), col("event_id"), col("event_type")))),
              1, PathLen),
            x => x.getField("event_type")),
          ">").as("path"))
    paths.groupBy("path")
      .agg(count(lit(1)).as("n_sessions"),
        round(avg(col("n_events")), 6).as("avg_events"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(PathTopN)
  }

  /** Gap-sessionization: `session_id` per (user, inactivity run) — lag +
    * running sum over the per-user event order, the batch formulation of
    * `session_window` (keyed identically). */
  private def sessionized(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(eventOrder: _*)
    df.withColumn("new_session",
        when(col("et") - lag(col("et"), 1).over(w) >= SessionGapSec ||
          lag(col("et"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Sequential-pattern cap: events considered per session (bounds the
    * in-session triple candidates at C(cap,3) = 220) and report depth. */
  private val SeqPatCap = 12
  private val SeqPatTopN = 20

  /** Frequent ordered event-type triples within sessions (gap-allowed
    * subsequences — the PrefixSpan question at fixed length 3): which
    * 3-step journeys recur across sessions, even when other events
    * intervene. Support counts SESSIONS containing the pattern.
    *
    * Scale shape: the triple join is keyed on the session, so candidate
    * work is sessions × C([[SeqPatCap]], 3) — linear in session count,
    * never corpus²; the per-session row_number window is session-bounded.
    * TakeOrdered caps the report. */
  def eSeqPatterns(s: SparkSession, d: String): DataFrame = {
    val ev = sessionized(withEt(Tables.events(s, d)))
      .withColumn("rn", row_number().over(Window
        .partitionBy("user_id", "session_id").orderBy(eventOrder: _*)))
      .filter(col("rn") <= SeqPatCap)
      .select(concat_ws("#", col("user_id"), col("session_id")).as("sk"),
        col("rn"), col("event_type").as("t"))
    val trip = ev.as("a")
      .join(ev.as("b"),
        col("a.sk") === col("b.sk") && col("a.rn") < col("b.rn"))
      .join(ev.as("c"),
        col("b.sk") === col("c.sk") && col("b.rn") < col("c.rn"))
      .select(col("a.sk").as("sk"),
        concat_ws(">", col("a.t"), col("b.t"), col("c.t")).as("pattern"))
      .distinct()
    trip.groupBy("pattern")
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("pattern"))
      .limit(SeqPatTopN)
  }

  /** Robust per-event-type value outliers: median / MAD / Hampel census
    * on the exact integer-cents domain — see
    * [[graft.operators.RobustStats]] for the two-pass value-count
    * histogram shape and the integer-exact 3·1.4826·MAD compare. */
  def eEventOutliers(s: SparkSession, d: String): DataFrame =
    graft.operators.RobustStats.medianMadOutliers(
      Tables.events(s, d)
        .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)")),
      "event_type", "cents", scale = 100.0)

  /** Per-window value percentile bands: exact p50/p95 of event values per
    * (10-minute window × event type) — the latency/amount SLO report
    * every observability stack draws, computed EXACTLY on the integer
    * cents domain via per-group value counts (running-sum window
    * partitions = distinct values per group, domain-bounded), the same
    * rank-cut convention as [[graft.operators.Winsorize]] (smallest value
    * whose cumulative count reaches ceil(p·n) — no interpolation, so the
    * engines cannot disagree on ties). */
  def eWindowPercentiles(s: SparkSession, d: String): DataFrame = {
    val e = withEt(Tables.events(s, d)).select(
      ((col("et") / lit(600L)).cast("long") * 600L).as("wstart"),
      col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val vc = e.groupBy(col("wstart"), col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val tot = vc.groupBy(col("wstart"), col("event_type"))
      .agg(sum(col("cnt")).as("n"))
    val run = vc.withColumn("cum",
        sum(col("cnt")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("wstart"), col("event_type")).orderBy(col("cents"))))
      .join(tot, Seq("wstart", "event_type"))
    def cut(pNum: Long, pDen: Long, name: String): DataFrame = run
      .filter(col("cum") * pDen >= col("n") * pNum)
      .groupBy(col("wstart"), col("event_type"))
      .agg(min(col("cents")).as(name))
    cut(1, 2, "p50c").join(cut(19, 20, "p95c"), Seq("wstart", "event_type"))
      .join(tot, Seq("wstart", "event_type"))
      .select(col("wstart"), col("event_type"), col("n").as("n_events"),
        round(col("p50c") / lit(100.0), 6).as("p50"),
        round(col("p95c") / lit(100.0), 6).as("p95"))
      .orderBy("wstart", "event_type")
  }

  /** Per-user behavioral drift: Jensen-Shannon divergence between each
    * user's event-type distribution and the corpus-wide one — the
    * account-anomaly / bot-detection meter (a scraper's distribution
    * collapses onto one type; JSD spikes long before volume does).
    * The type domain is bounded, so the per-user grid is users × types —
    * linear in users; the global distribution broadcasts. Zero-count
    * types contribute their q·ln2 share exactly (the p=0 limit of the
    * JSD term), so every user sums the SAME bounded term set. */
  def eUserDrift(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("user_id"), col("event_type"))
    val uc = e.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val un = uc.groupBy("user_id").agg(sum(col("c")).as("n"))
    val gc = uc.groupBy("event_type").agg(sum(col("c")).as("gcnt"))
    val gtot = gc.agg(sum(col("gcnt")).as("gn"))
    val gdist = gc.crossJoin(broadcast(gtot))
      .select(col("event_type"), (col("gcnt").cast("double") / col("gn")).as("q"))
    val grid = un.crossJoin(broadcast(gdist))
      .join(uc, Seq("user_id", "event_type"), "left")
      .withColumn("p", coalesce(col("c"), lit(0L)).cast("double") / col("n"))
    val m = (col("p") + col("q")) / 2
    val term = (when(col("p") > 0, col("p") * log(col("p") / m)).otherwise(lit(0.0))
      + col("q") * log(col("q") / m)) / 2
    grid.groupBy(col("user_id"))
      .agg(first(col("n")).as("n_events"), round(sum(term), 6).as("js_divergence"))
      .orderBy("user_id")
  }

  /** Recency-weighted user activity: each event weighted by
    * 2^-(age DIV halfLife) relative to the corpus's newest event — the
    * freshness prior a training-data sampler multiplies into its source
    * weights. The weighted sum is computed as an exact scaled BIGINT
    * (value·1e6, shifted right by the integer bucket) so the per-user sum
    * is order-independent and engine-exact; the single max-timestamp
    * scalar rides a broadcast one-row crossJoin, keeping the whole plan
    * in two data-proportional aggregations. */
  def eTimeDecay(s: SparkSession, d: String): DataFrame = {
    val e = withEt(Tables.events(s, d))
    val tmax = e.agg(max(col("et")).as("t_max"))
    e.crossJoin(broadcast(tmax))
      .withColumn("bucket",
        least((col("t_max") - col("et")) / lit(DecayHalfLifeSec),
          lit(DecayMaxBuckets.toLong)).cast("int"))
      .withColumn("w_scaled", expr(
        // exact: scaled-int value, integer right-shift by the decay bucket
        s"CAST(round(value * 1e6) AS BIGINT) DIV shiftleft(CAST(1 AS BIGINT), bucket)"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("w_scaled")).cast("double") / lit(1e6), 6)
          .as("decayed_value"))
      .orderBy("user_id")
  }

  /** Cohort week grain (seconds) and the ordered funnel step types. */
  private val CohortWeekSec = 604800L
  private val FunnelSteps = Seq("view", "click", "purchase")

  /** Weekly cohort retention: users bucketed by first-event week, each
    * cohort's share still active k weeks later — the longitudinal
    * engagement report. Weeks are integer offsets from the corpus's
    * earliest event (scalar broadcast in-plan). One first-event
    * aggregation + one distinct (user, week) activity table; the
    * retention matrix is weeks²-bounded. Rates are exact int/int
    * ratios. */
  def eCohortRetention(s: SparkSession, d: String): DataFrame = {
    val e = withEt(Tables.events(s, d))
    val t0 = e.agg(min(col("et")).as("t0"))
    val weeks = e.crossJoin(broadcast(t0))
      .select(col("user_id"),
        ((col("et") - col("t0")) / lit(CohortWeekSec)).cast("long").as("wk"))
    val firstWk = weeks.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
    val cohortSize = firstWk.groupBy("cohort_week")
      .agg(countDistinct(col("user_id")).as("cohort_users"))
    val active = weeks.distinct()
      .join(firstWk, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
    active.join(broadcast(cohortSize), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("cohort_users"),
        col("active_users"),
        round(col("active_users").cast("double") / col("cohort_users"), 6)
          .as("retention"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Ordered in-session funnel (view → click → purchase): sessions where
    * each step occurs AFTER the previous one — the conversion report the
    * unordered per-type counts cannot answer. Step positions resolve by
    * three session-keyed min-aggregations (p1; then min click rn > p1;
    * then min purchase rn > p2), each a bounded join back — no window
    * beyond the shared sessionizer. One summary row; exact ratios. */
  def eSessionFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = sessionized(withEt(Tables.events(s, d)))
      .withColumn("rn", row_number().over(Window
        .partitionBy("user_id", "session_id").orderBy(eventOrder: _*)))
      .select(concat_ws("#", col("user_id"), col("session_id")).as("sk"),
        col("rn"), col("event_type").as("t"))
    val Seq(s1, s2, s3) = FunnelSteps
    val p1 = ev.filter(col("t") === s1).groupBy("sk").agg(min(col("rn")).as("p1"))
    val p2 = ev.filter(col("t") === s2).join(p1, Seq("sk"))
      .filter(col("rn") > col("p1"))
      .groupBy("sk").agg(min(col("rn")).as("p2"))
    val p3 = ev.filter(col("t") === s3).join(p2, Seq("sk"))
      .filter(col("rn") > col("p2"))
      .groupBy("sk").agg(min(col("rn")).as("p3"))
    def rate(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den, 6)).otherwise(lit(0.0))
    ev.select(col("sk")).distinct()
      .join(p1, Seq("sk"), "left")
      .join(p2, Seq("sk"), "left")
      .join(p3, Seq("sk"), "left")
      .agg(count(lit(1)).as("n_sessions"),
        count(col("p1")).as("n_step1"),
        count(col("p2")).as("n_step2"),
        count(col("p3")).as("n_step3"))
      .select(col("n_sessions"), col("n_step1"), col("n_step2"), col("n_step3"),
        rate(col("n_step1"), col("n_sessions")).as("rate1"),
        rate(col("n_step2"), col("n_step1")).as("rate2"),
        rate(col("n_step3"), col("n_step2")).as("rate3"))
  }

  val queries: Map[String, Q] = Map(
    "e_cohort_retention" -> (eCohortRetention _),
    "e_session_funnel" -> (eSessionFunnel _),
    "e_event_transitions" -> (eEventTransitions _),
    "e_session_paths" -> (eSessionPaths _),
    "e_time_decay" -> (eTimeDecay _),
    "e_seq_patterns" -> (eSeqPatterns _),
    "e_event_outliers" -> (eEventOutliers _),
    "e_user_drift" -> (eUserDrift _),
    "e_window_percentiles" -> (eWindowPercentiles _),
  )

  private val sessionCtes =
    s"""flagged AS (SELECT *,
       |    CASE WHEN et - lag(et) OVER (PARTITION BY user_id ORDER BY et, event_id) >= $SessionGapSec
       |      OR lag(et) OVER (PARTITION BY user_id ORDER BY et, event_id) IS NULL
       |    THEN 1 ELSE 0 END AS new_session
       |  FROM e),
       |sessions AS (SELECT *,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY et, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM flagged)""".stripMargin

  private val etSql = "epoch_ms(ts) // 1000"

  val oracle: Map[String, String] = Map(
    "e_event_transitions" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, $etSql AS et FROM events),
         |prs AS (SELECT
         |    lag(event_type) OVER (PARTITION BY user_id ORDER BY et, event_id) AS prev_type,
         |    event_type AS next_type
         |  FROM e),
         |cnt AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
         |  FROM prs WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |tot AS (SELECT prev_type, sum(n) AS n_from FROM cnt GROUP BY 1)
         |SELECT c.prev_type, c.next_type, c.n,
         |  round(CAST(c.n AS DOUBLE) / t.n_from, 6) AS p
         |FROM cnt c JOIN tot t USING (prev_type)
         |ORDER BY prev_type, next_type""".stripMargin,
    "e_session_paths" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, $etSql AS et FROM events),
         |$sessionCtes,
         |rn AS (SELECT *,
         |    row_number() OVER (PARTITION BY user_id, session_id ORDER BY et, event_id) AS rn
         |  FROM sessions),
         |paths AS (SELECT user_id, session_id, count(*) AS n_events,
         |    string_agg(event_type, '>' ORDER BY et, event_id)
         |      FILTER (WHERE rn <= $PathLen) AS path
         |  FROM rn GROUP BY 1, 2)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
         |  round(avg(n_events), 6) AS avg_events
         |FROM paths GROUP BY path
         |ORDER BY n_sessions DESC, path LIMIT $PathTopN""".stripMargin,
    "e_time_decay" ->
      s"""WITH e AS (SELECT user_id, value, $etSql AS et FROM events),
         |tm AS (SELECT max(et) AS t_max FROM e),
         |wts AS (SELECT user_id,
         |    CAST(round(value * 1e6) AS BIGINT)
         |      // CAST(pow(2, least((t_max - et) // $DecayHalfLifeSec,
         |                           $DecayMaxBuckets)) AS BIGINT) AS w_scaled
         |  FROM e CROSS JOIN tm)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  round(CAST(sum(w_scaled) AS DOUBLE) / 1e6, 6) AS decayed_value
         |FROM wts GROUP BY user_id ORDER BY user_id""".stripMargin,
    "e_cohort_retention" ->
      s"""WITH e AS (SELECT user_id, $etSql AS et FROM events),
         |t0 AS (SELECT min(et) AS t0 FROM e),
         |w AS (SELECT user_id, (et - t0) // $CohortWeekSec AS wk
         |  FROM e CROSS JOIN t0),
         |fw AS (SELECT user_id, min(wk) AS cohort_week FROM w GROUP BY 1),
         |cs AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
         |  FROM fw GROUP BY 1),
         |act AS (SELECT f.cohort_week, wk - f.cohort_week AS week_offset,
         |    CAST(count(DISTINCT dw.user_id) AS BIGINT) AS active_users
         |  FROM (SELECT DISTINCT user_id, wk FROM w) dw
         |  JOIN fw f USING (user_id) GROUP BY 1, 2)
         |SELECT act.cohort_week, week_offset, cohort_users, active_users,
         |  round(CAST(active_users AS DOUBLE) / cohort_users, 6) AS retention
         |FROM act JOIN cs USING (cohort_week)
         |ORDER BY cohort_week, week_offset""".stripMargin,
    "e_session_funnel" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, $etSql AS et FROM events),
         |$sessionCtes,
         |ev AS (SELECT user_id || '#' || session_id AS sk, event_type AS t,
         |    row_number() OVER (PARTITION BY user_id, session_id
         |      ORDER BY et, event_id) AS rn
         |  FROM sessions),
         |p1 AS (SELECT sk, min(rn) AS p1 FROM ev WHERE t = 'view' GROUP BY sk),
         |p2 AS (SELECT ev.sk, min(rn) AS p2 FROM ev JOIN p1 USING (sk)
         |  WHERE t = 'click' AND rn > p1 GROUP BY ev.sk),
         |p3 AS (SELECT ev.sk, min(rn) AS p3 FROM ev JOIN p2 USING (sk)
         |  WHERE t = 'purchase' AND rn > p2 GROUP BY ev.sk),
         |sess AS (SELECT DISTINCT sk FROM ev),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions,
         |    CAST(count(p1) AS BIGINT) AS n_step1,
         |    CAST(count(p2) AS BIGINT) AS n_step2,
         |    CAST(count(p3) AS BIGINT) AS n_step3
         |  FROM sess LEFT JOIN p1 USING (sk) LEFT JOIN p2 USING (sk)
         |  LEFT JOIN p3 USING (sk))
         |SELECT n_sessions, n_step1, n_step2, n_step3,
         |  CASE WHEN n_sessions > 0
         |    THEN round(CAST(n_step1 AS DOUBLE) / n_sessions, 6) ELSE 0.0 END AS rate1,
         |  CASE WHEN n_step1 > 0
         |    THEN round(CAST(n_step2 AS DOUBLE) / n_step1, 6) ELSE 0.0 END AS rate2,
         |  CASE WHEN n_step2 > 0
         |    THEN round(CAST(n_step3 AS DOUBLE) / n_step2, 6) ELSE 0.0 END AS rate3
         |FROM agg""".stripMargin,
    "e_seq_patterns" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, $etSql AS et FROM events),
         |$sessionCtes,
         |ev AS (SELECT user_id || '#' || session_id AS sk, event_type AS t,
         |    row_number() OVER (PARTITION BY user_id, session_id
         |      ORDER BY et, event_id) AS rn
         |  FROM sessions QUALIFY rn <= $SeqPatCap),
         |trip AS (SELECT DISTINCT a.sk, a.t || '>' || b.t || '>' || c.t AS pattern
         |  FROM ev a
         |  JOIN ev b ON a.sk = b.sk AND a.rn < b.rn
         |  JOIN ev c ON b.sk = c.sk AND b.rn < c.rn)
         |SELECT pattern, CAST(count(*) AS BIGINT) AS support
         |FROM trip GROUP BY pattern
         |ORDER BY support DESC, pattern LIMIT $SeqPatTopN""".stripMargin,
    "e_window_percentiles" ->
      """WITH e AS (SELECT (epoch_ms(ts) // 1000 // 600) * 600 AS wstart,
        |    event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |vc AS (SELECT wstart, event_type, cents, count(*) AS cnt
        |  FROM e GROUP BY 1, 2, 3),
        |tot AS (SELECT wstart, event_type, sum(cnt) AS n FROM vc GROUP BY 1, 2),
        |run AS (SELECT vc.wstart, vc.event_type, cents, n,
        |    sum(cnt) OVER (PARTITION BY vc.wstart, vc.event_type
        |      ORDER BY cents) AS cum
        |  FROM vc JOIN tot USING (wstart, event_type)),
        |p50 AS (SELECT wstart, event_type, min(cents) AS p50c FROM run
        |  WHERE cum * 2 >= n GROUP BY 1, 2),
        |p95 AS (SELECT wstart, event_type, min(cents) AS p95c FROM run
        |  WHERE cum * 20 >= n * 19 GROUP BY 1, 2)
        |SELECT t.wstart, t.event_type, CAST(t.n AS BIGINT) AS n_events,
        |  round(p50c / 100.0, 6) AS p50, round(p95c / 100.0, 6) AS p95
        |FROM tot t JOIN p50 USING (wstart, event_type)
        |JOIN p95 USING (wstart, event_type)
        |ORDER BY wstart, event_type""".stripMargin,
    "e_user_drift" ->
      """WITH uc AS (SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |un AS (SELECT user_id, sum(c) AS n FROM uc GROUP BY 1),
        |gc AS (SELECT event_type, sum(c) AS gcnt FROM uc GROUP BY 1),
        |gt AS (SELECT sum(gcnt) AS gn FROM gc),
        |gd AS (SELECT event_type, CAST(gcnt AS DOUBLE) / gn AS q
        |  FROM gc CROSS JOIN gt),
        |grid AS (SELECT un.user_id, un.n, gd.event_type, gd.q,
        |    CAST(coalesce(uc.c, 0) AS DOUBLE) / un.n AS p
        |  FROM un CROSS JOIN gd
        |  LEFT JOIN uc ON uc.user_id = un.user_id
        |    AND uc.event_type = gd.event_type)
        |SELECT user_id, CAST(min(n) AS BIGINT) AS n_events,
        |  round(sum((CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2))
        |             ELSE 0.0 END
        |             + q * ln(q / ((p + q) / 2))) / 2), 6) AS js_divergence
        |FROM grid GROUP BY user_id ORDER BY user_id""".stripMargin,
    "e_event_outliers" ->
      """WITH e AS (SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |vc AS (SELECT g, v, count(*) AS cnt FROM e GROUP BY 1, 2),
        |tot AS (SELECT g, sum(cnt) AS n FROM vc GROUP BY 1),
        |run AS (SELECT vc.g, v, n,
        |    sum(cnt) OVER (PARTITION BY vc.g ORDER BY v) AS cum
        |  FROM vc JOIN tot USING (g)),
        |med AS (SELECT g, min(v) AS med FROM run WHERE cum * 2 >= n GROUP BY g),
        |dv AS (SELECT e.g, abs(v - med) AS dev, med FROM e JOIN med USING (g)),
        |dvc AS (SELECT g, dev, count(*) AS cnt FROM dv GROUP BY 1, 2),
        |dtot AS (SELECT g, sum(cnt) AS n FROM dvc GROUP BY 1),
        |drun AS (SELECT dvc.g, dev, n,
        |    sum(cnt) OVER (PARTITION BY dvc.g ORDER BY dev) AS cum
        |  FROM dvc JOIN dtot USING (g)),
        |mad AS (SELECT g, min(dev) AS mad FROM drun WHERE cum * 2 >= n GROUP BY g)
        |SELECT dv.g AS event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  round(CAST(min(dv.med) AS DOUBLE) / 100, 6) AS median,
        |  round(CAST(min(mad.mad) AS DOUBLE) / 100, 6) AS mad,
        |  CAST(sum(CASE WHEN dev * 10000 > mad.mad * 44478 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dv JOIN mad USING (g)
        |GROUP BY dv.g ORDER BY event_type""".stripMargin,
  )
}
