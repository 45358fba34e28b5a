package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants for the late round-11 additions (each already DuckDB-
  * oracled; these pin the semantic shape, not the values). */
class LateRound11Spec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def rows(q: String) = SparkEntry.queries(q)(spark, d).collect()

  test("e_bbit_minhash: error shrinks monotonically as bits grow") {
    val r = rows("e_bbit_minhash").map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r.keySet == Set(1L, 2L, 4L, 8L))
    assert(r(1L) >= r(2L) && r(2L) >= r(4L) && r(4L) >= r(8L),
      s"b-bit error not monotone: $r")
  }

  test("e_lsh_recall: counts and rates are consistent") {
    val r = rows("e_lsh_recall")(0)
    val (t, c, h) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(h <= t && h <= c, "hits exceed truth or candidates")
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
  }

  test("e_gopher_rules: any_rule dominates every individual rule") {
    val m = rows("e_gopher_rules").map(r => r.getString(0) -> r.getLong(2)).toMap
    val nDocs = rows("e_gopher_rules")(0).getLong(1)
    assert(m("any_rule") >= m.filterKeys(_ != "any_rule").values.max)
    assert(m.values.forall(v => v >= 0 && v <= nDocs))
  }

  test("e_text_entropy: bounded by ln n, normalized by ln distinct") {
    rows("e_text_entropy").foreach { r =>
      val (n, nd, h, hn) = (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(h >= -1e-9 && h <= math.log(n.toDouble) + 1e-6, s"H=$h n=$n")
      assert(hn >= -1e-9 && hn <= 1.0 + 1e-6, s"norm=$hn")
      assert(nd <= n)
    }
  }

  test("e_skew_report: skew factor at least 1, keys bounded by rows") {
    val r = rows("e_skew_report")
    assert(r.length == 3)
    r.foreach { x =>
      assert(x.getLong(2) <= x.getLong(1), "more keys than rows")
      assert(x.getDouble(4) >= 1.0 - 1e-9, s"skew below 1: ${x.getDouble(4)}")
    }
  }

  test("e_window_percentiles: p50 <= p95 everywhere") {
    rows("e_window_percentiles").foreach(r =>
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9))
  }

  test("e_lang_confusion: per-label shares sum to 1") {
    rows("e_lang_confusion").groupBy(_.getString(0)).foreach { case (lbl, rs) =>
      val share = rs.map(_.getDouble(3)).sum
      assert(math.abs(share - 1.0) <= 5e-6 * rs.length, s"$lbl shares sum $share")
    }
  }

  test("e_dedup_impact: removed never exceeds totals; pairs imply removals") {
    val r = rows("e_dedup_impact")
    r.foreach { x =>
      assert(x.getLong(2) <= x.getLong(1), "removed docs exceed docs")
      assert(x.getLong(4) <= x.getLong(3), "removed tokens exceed tokens")
    }
    assert(r.map(_.getLong(2)).sum > 0, "dedup removed nothing — no signal")
  }

  test("e_cluster_density: density in (0,1], edges bounded by C(size,2)") {
    val r = rows("e_cluster_density")
    assert(r.nonEmpty)
    r.foreach { x =>
      val (size, edges, dens) = (x.getLong(1), x.getLong(2), x.getDouble(3))
      assert(size >= 2)
      assert(edges >= 1 && edges <= size * (size - 1) / 2,
        s"edges $edges outside [1, C($size,2)]") // every cluster came from ≥1 pair
      assert(dens > 0.0 && dens <= 1.0 + 1e-9)
    }
  }

  test("e_conversion_lag: buckets partition the purchases") {
    val r = rows("e_conversion_lag")
    val purchases = graft.Tables.events(spark, d)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase").count()
    assert(r.map(_.getLong(1)).sum == purchases, "histogram loses purchases")
    assert(r.map(_.getLong(0)).distinct.length == r.length, "duplicate buckets")
    assert(r.forall(_.getLong(0) >= -1L))
  }

  test("e_elbow_curve: inertia decreases as seed density grows") {
    val r = rows("e_elbow_curve").map(x => (x.getLong(0), x.getDouble(2))).toSeq
    assert(r.length == 3)
    assert(r.map(_._1) == r.map(_._1).sorted, "not ordered by k")
    assert(r.sliding(2).forall(w => w(1)._2 <= w(0)._2 + 1e-6),
      s"inertia not monotone in k: $r")
  }

  test("e_simhash_wide: ordered pairs within the hamming cap") {
    rows("e_simhash_wide").foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 3L)
    }
  }
}
