package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue interleaves bits exactly") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 1L),
      (12345L, 54321L))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == refZ(x, y, 16), s"z($x, $y)")
    }
    // canonical small values: z(1,0)=1, z(0,1)=2, z(3,5): x=11, y=101 →
    // interleave → 100111 = 39
    assert(got((1L, 0L)) == 1L && got((0L, 1L)) == 2L && got((3L, 5L)) == 39L)
  }

  test("z-clustering serves BOTH dimension slices; single-column sort does not") {
    import spark.implicits._
    // a 64×64 grid split into 8 range partitions
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
      .toDF("x", "y")
    def touched(df: DataFrame, pred: org.apache.spark.sql.Column): Long =
      df.withColumn("pid", spark_partition_id())
        .filter(pred).select(countDistinct(col("pid"))).head().getLong(0)
    val zClustered = ZOrder.cluster(grid, "x", "y", numPartitions = 8, bits = 6)
    val xSorted = grid.repartitionByRange(8, col("x")).sortWithinPartitions("x")
    val xSlice = col("x") < 8
    val ySlice = col("y") < 8
    val zWorst = math.max(touched(zClustered, xSlice), touched(zClustered, ySlice))
    val sWorst = math.max(touched(xSorted, xSlice), touched(xSorted, ySlice))
    // x-sort serves the x-slice from 1 partition but degrades the y-slice
    // to (nearly) ALL partitions; z-order bounds the worst case of the two.
    // repartitionByRange SAMPLES its boundaries, so exact counts wobble by
    // one — the assertions leave that slack while keeping the claim strict
    assert(sWorst >= 7L, s"x-sorted layout should fail the y-slice, got $sWorst")
    assert(zWorst <= 5L, s"z-clustered worst-dimension spread was $zWorst/8")
    assert(zWorst < sWorst, s"z-order must beat the single-column sort " +
      s"on the worst dimension ($zWorst vs $sWorst)")
  }

  test("cluster preserves the data and drops the helper column") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 10, i / 10)).toDF("x", "y")
    val out = ZOrder.cluster(df, "x", "y", 4, bits = 4)
    assert(out.columns.toSeq == Seq("x", "y"))
    assert(out.count() == 100)
    assert(out.select(sum(col("x") + col("y"))).head().getLong(0) ==
      df.select(sum(col("x") + col("y"))).head().getLong(0))
  }
}
