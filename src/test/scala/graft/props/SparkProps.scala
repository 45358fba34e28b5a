package graft.props

import graft.TestSpark
import graft.operators.{AllowlistProjection, ChangeFeed}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Spark-level property invariants (few cases each — every case is a Spark
  * job). Mirrors ExecuteTriggerHelper.cs:67,99 (projection invariants) and
  * README.md:5 (dedup-to-latest). */
object SparkProps extends Properties("graft.spark") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private val rowsGen = Gen.nonEmptyListOf(
    Gen.zip(Gen.choose(1, 8), Gen.choose(1, 20), Gen.alphaStr.map(_.take(5))))

  property("projection: output columns = allowlist ∩ schema (case-insensitive), pass-through on None") =
    forAll(Gen.someOf("Id", "Name", "Score", "GHOST", "id")) { allowed =>
      import spark.implicits._
      val df = Seq((1, "a", 2.0)).toDF("Id", "Name", "Score")
      val out = AllowlistProjection.project(df,
        if (allowed.isEmpty) None else Some(allowed.toSeq))
      if (allowed.isEmpty) out.columns.sameElements(df.columns)
      else {
        val lower = allowed.map(_.toLowerCase).toSet
        out.columns.toSet == df.columns.filter(c => lower.contains(c.toLowerCase)).toSet
      }
    }

  property("dedupLatest: exactly one row per key, carrying the max version") =
    forAll(rowsGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("id", "ver", "payload")
      val got = ChangeFeed.dedupLatest(df, Seq("id"), "ver", Seq("payload"))
        .select("id", "ver").as[(Int, Int)].collect().toMap
      val expected = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }
      got == expected
    }

  property("diff(old,new) applied to old reconstructs new") =
    forAll(rowsGen, rowsGen) { (oldRows, newRows) =>
      import spark.implicits._
      // de-dup keys first (snapshots are keyed states)
      val o = oldRows.distinctBy(_._1).toDF("id", "v", "p")
      val n = newRows.distinctBy(_._1).toDF("id", "v", "p")
      val changes = ChangeFeed.diff(o, n, Seq("id"))
      val deletes = changes.filter($"Operation" === "Delete").select("id")
      val upserts = changes.filter($"Operation" =!= "Delete").select("id", "v", "p")
      val applied = o.join(deletes, Seq("id"), "left_anti")
        .join(upserts.select("id"), Seq("id"), "left_anti")
        .union(upserts)
        .as[(Int, Int, String)].collect().toSet
      val expected = n.as[(Int, Int, String)].collect().toSet
      applied == expected
    }

  property("diff emits no row for unchanged keys") =
    forAll(rowsGen) { rows =>
      import spark.implicits._
      val snap = rows.distinctBy(_._1).toDF("id", "v", "p")
      ChangeFeed.diff(snap, snap, Seq("id")).count() == 0
    }

  property("IntervalJoin ≡ naive inequality join for any intervals and bin width") =
    forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 300L), Gen.choose(0L, 60L))),
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 300L), Gen.choose(0L, 60L))),
      Gen.oneOf(1L, 5L, 37L, 500L)) { (aRaw, bRaw, w) =>
      import spark.implicits._
      val a = aRaw.zipWithIndex
        .map { case ((s, len), i) => (i.toLong, s, s + len) }
        .toDF("aid", "as", "ae")
      val b = bRaw.zipWithIndex
        .map { case ((s, len), i) => (i.toLong, s, s + len) }
        .toDF("bid", "bs", "be")
      import org.apache.spark.sql.functions.col
      val got = graft.operators.IntervalJoin
        .overlap(a, "as", "ae", b, "bs", "be", w)
        .select(col("aid"), col("bid"))
        .as[(Long, Long)].collect().sorted.toSeq
      val naive = a.join(b, col("as") <= col("be") && col("bs") <= col("ae"))
        .select(col("aid"), col("bid"))
        .as[(Long, Long)].collect().sorted.toSeq
      got == naive // equal AS SEQUENCES: multiplicity 1 per pair, no dups
    }

  property("ScalableNtile ≡ built-in ntile for any N, tiles, bin step") =
    forAll(Gen.choose(1, 120), Gen.choose(1, 9), Gen.oneOf(1.0, 7.0, 40.0, 1e9)) {
      (n, tiles, step) =>
        import spark.implicits._
        import org.apache.spark.sql.functions.{col, floor, ntile}
        val df = (1 to n).map(i => (i.toLong, (i * 53 % 89) * 1.25)).toDF("id", "v")
        val expected = df.withColumn("t",
            ntile(tiles).over(org.apache.spark.sql.expressions.Window
              .orderBy(col("v"), col("id"))).cast("long"))
          .select("id", "t").as[(Long, Long)].collect().toMap
        val actual = graft.operators.ScalableNtile(df, tiles,
            bin = floor(col("v") / step).cast("long"),
            sortKeys = Seq(col("v"), col("id")), out = "t")
          .select("id", "t").as[(Long, Long)].collect().toMap
        actual == expected
    }

  property("curriculumOrder ≡ global window for any stage distribution and subBins") =
    forAll(Gen.choose(1, 120), Gen.choose(1, 6), Gen.oneOf(4, 16, 256),
      Gen.choose(0L, 999L)) { (n, nStages, subBins, seedN) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, lit, row_number}
      val seed = s"s$seedN"
      // nullable, skewed stages (many rows share a stage; some null)
      val df = (1 to n).map { i =>
        (i.toLong, if (i % 11 == 0) None else Some((i * 31 % 97) % nStages))
      }.toDF("id", "stg")
      val stage = org.apache.spark.sql.functions.coalesce(
        col("stg").cast("long"), lit(0L))
      val got = graft.operators.CorpusShuffle.curriculumOrder(
          df, "id", col("stg"), seed, subBins = subBins)
        .select("id", "global_pos").as[(Long, Long)].collect().toMap
      val key = graft.dedup.Dedup.hexHash(col("id").cast("string"), s"$seed|")
      val want = df.withColumn("global_pos",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(stage, key, col("id"))).cast("long"))
        .select("id", "global_pos").as[(Long, Long)].collect().toMap
      got == want
    }

  property("GroupQuantileCut ≡ per-group window ranking for any frac and bins") =
    forAll(Gen.choose(1, 120), Gen.choose(1, 4),
      Gen.oneOf(0.0, 0.25, 0.5, 0.9, 1.0), Gen.oneOf(4, 16, 128)) {
      (n, nGroups, frac, nBins) =>
        import spark.implicits._
        import org.apache.spark.sql.functions.{col, count, floor, lit, row_number}
        // repeated scores force ties across the cut
        val df = (1 to n).map(i =>
          (i.toLong, s"g${i % nGroups}", ((i * 13) % 7) / 10.0)).toDF("id", "g", "q")
        val got = graft.operators.GroupQuantileCut(df, "id", "g", col("q"),
            frac, nBins).select("id").as[Long].collect().toSet
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("q").desc, col("id"))
        val want = df
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("g"))))
          .filter(col("rn") <= floor(lit(frac) * col("cnt")))
          .select("id").as[Long].collect().toSet
        got == want
    }
}
