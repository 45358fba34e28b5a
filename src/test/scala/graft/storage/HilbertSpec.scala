package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSpec {

  /** The classic iterative xy2d reference (Wikipedia's Hilbert-curve
    * pseudocode), independent of the column-arithmetic unrolling. */
  private def refXy2d(order: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = order / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  private def gridValues(bits: Int): Map[(Long, Long), Long] = {
    import spark.implicits._
    val n = 1L << bits
    val grid = (for { x <- 0L until n; y <- 0L until n } yield (x, y))
      .toDF("x", "y")
    grid.select(col("x"), col("y"),
        Hilbert.hValue(col("x"), col("y"), bits).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("order-16 grid matches the classic xy2d reference exactly") {
    val got = gridValues(4)
    (0L until 16).foreach { x =>
      (0L until 16).foreach { y =>
        assert(got((x, y)) == refXy2d(16, x, y), s"($x, $y)")
      }
    }
  }

  test("the curve is a bijection and consecutive cells are grid-adjacent") {
    val got = gridValues(3)
    val byD = got.toSeq.map { case ((x, y), d) => d -> (x, y) }.sortBy(_._1)
    assert(byD.map(_._1) == (0L until 64L), "indices must cover 0..63 once")
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (d2, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step to d=$d2 jumps from ($x1,$y1) to ($x2,$y2)")
    case _ => ()
    }
  }

  test("cluster keeps rows, orders by curve index within partitions") {
    import spark.implicits._
    val df = (0L until 64L).map(i => (i, i % 8, i / 8)).toDF("id", "x", "y")
    val out = Hilbert.cluster(df, "x", "y", numPartitions = 2, bits = 3)
    assert(out.count() == 64)
    // within each partition the curve index must be nondecreasing
    val perPart = out
      .withColumn("h", Hilbert.hValue(col("x"), col("y"), 3))
      .withColumn("p", spark_partition_id())
      .collect().groupBy(_.getInt(4)).values
    perPart.foreach { rows =>
      val hs = rows.map(_.getLong(3)).toSeq
      assert(hs == hs.sorted, "curve index must be sorted within partition")
    }
  }
}
