package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the event-sequence analytics queries
  * ([[graft.queries.SeqQueries]]): Markov transitions, session path
  * mining, recency-weighted activity. */
class SeqQueriesSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("e_event_transitions: rows form a row-stochastic matrix") {
    val rows = SparkEntry.queries("e_event_transitions")(spark, d).collect()
    assert(rows.nonEmpty)
    // per prev_type the probabilities sum to ~1 (each p rounded to 6dp,
    // so the sum can be off by at most 5e-7 per cell)
    val byPrev = rows.groupBy(_.getString(0))
    byPrev.foreach { case (prev, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) <= 5e-7 * rs.length,
        s"P(.|$prev) sums to $pSum")
      rs.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    }
    // n sums to total lag pairs = events - users-with-events
    val e = Tables.events(spark, d)
    val expected = e.count() - e.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("e_session_paths: paths are capped, counts ordered, sessions conserved") {
    val rows = SparkEntry.queries("e_session_paths")(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val path = r.getString(0)
      assert(path.nonEmpty && path.split(">").length <= 5,
        s"path over cap: $path")
      assert(r.getDouble(2) >= 1.0, "avg session length below 1")
    }
    // report is ordered by (n_sessions desc, path asc)
    val keys = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys == keys.sorted, "report not in (n desc, path) order")
  }

  test("e_seq_patterns: triples are ordered subsequences with sane support") {
    val rows = SparkEntry.queries("e_seq_patterns")(spark, d).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getString(0).split(">").length == 3, s"not a triple: ${r.getString(0)}")
      assert(r.getLong(1) >= 1L)
    }
    val keys = rows.map(r => (-r.getLong(1), r.getString(0))).toSeq
    assert(keys == keys.sorted, "report not in (support desc, pattern) order")
  }

  test("e_session_funnel: step counts are monotone and rates consistent") {
    val r = SparkEntry.queries("e_session_funnel")(spark, d).collect()(0)
    val (n, n1, n2, n3) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n >= n1 && n1 >= n2 && n2 >= n3, s"funnel not monotone: $n $n1 $n2 $n3")
    assert(n1 > 0, "no sessions reached step 1 — funnel has no signal")
    Seq(r.getDouble(4), r.getDouble(5), r.getDouble(6)).foreach(rate =>
      assert(rate >= 0.0 && rate <= 1.0, s"rate out of range: $rate"))
  }

  test("e_cohort_retention: offset-0 retention is 1 and rates bounded") {
    val rows = SparkEntry.queries("e_cohort_retention")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L)
      assert(r.getLong(3) <= r.getLong(2), "active exceeds cohort size")
      val ret = r.getDouble(4)
      assert(ret > 0.0 && ret <= 1.0, s"retention out of range: $ret")
      // a user is by definition active in their cohort week
      if (r.getLong(1) == 0L) assert(ret == 1.0, "offset-0 retention must be 1")
    }
  }

  test("e_user_drift: JSD bounded by ln 2 and zero for a global-matching user") {
    val rows = SparkEntry.queries("e_user_drift")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val jsd = r.getDouble(2)
      assert(jsd >= 0.0 && jsd <= math.log(2) + 1e-9,
        s"JSD out of [0, ln2]: $jsd")
    }
  }

  test("e_time_decay: per-user decayed mass is bounded by un-decayed mass") {
    val rows = SparkEntry.queries("e_time_decay")(spark, d).collect()
    val rawByUser = Tables.events(spark, d).groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.length == rawByUser.size, "one row per active user")
    rows.foreach { r =>
      val (user, n, decayed) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (nRaw, sRaw) = rawByUser(user)
      assert(n == nRaw)
      assert(decayed >= 0.0 && decayed <= sRaw + 1e-6,
        s"user $user decayed $decayed exceeds raw $sRaw")
    }
  }
}
