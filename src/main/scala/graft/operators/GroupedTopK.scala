package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k as a bounded typed Aggregator — the scale-safe form of
  * "best k rows per key".
  *
  * The window form (`row_number().over(Window.partitionBy(key).orderBy(...))
  * <= k`) shuffles EVERY row to its key's partition and sorts the whole
  * group: exchange volume ∝ table size, and a hot key serializes through
  * one task. This Aggregator instead keeps a bounded, sorted k-buffer per
  * key per map partition, and Spark's partial aggregation combines buffers
  * map-side — the exchange carries AT MOST k rows per (key × map
  * partition), independent of group sizes, and a skewed key costs k·p
  * buffer merges instead of a single-task sort of its whole group.
  *
  * Ordering is (score DESC, id ASC) — deterministic under ties; both the
  * insert and the merge preserve it, so the output is a pure function of
  * the group CONTENTS, not of partitioning or arrival order.
  */
object GroupedTopK {

  /** Sorted bounded buffer: best-first by (score desc, id asc), length ≤ k.
    * Commutative + associative (a sorted k-merge), so Spark plans a
    * partial/final aggregate pair around the key exchange. */
  final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k >= 1, "k must be >= 1")

    private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Seq[(Double, Long)] = Vector.empty

    override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
      if (buf.length == k && !beats(in, buf.last)) buf
      else {
        val i = buf.indexWhere(e => beats(in, e)) match {
          case -1 => buf.length
          case n => n
        }
        (buf.take(i) :+ in) ++ buf.drop(i) take k
      }

    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      // merge of two sorted runs, truncated at k
      val out = Vector.newBuilder[(Double, Long)]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && beats(a(i), b(j)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }

    override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Best `k` rows per `keyCol` by `scoreCol` (desc, `idCol` asc on ties).
    * Returns (keyCol, idCol, score, rank). */
  def topKPerKey(df: DataFrame, keyCol: String, scoreCol: String,
                 idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string").as("key"),
        col(scoreCol).cast("double").as("score"),
        col(idCol).cast("long").as("id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)(Encoders.STRING)
      .mapValues(t => (t._2, t._3))
      .agg(new TopKAgg(k).toColumn.name("top"))
      .toDF("key", "top")
      .select(col("key").as(keyCol), posexplode(col("top")).as(Seq("i", "e")))
      .select(col(keyCol), col("e._2").as(idCol), col("e._1").as("score"),
        (col("i") + 1).cast("long").as("rank"))
  }
}
