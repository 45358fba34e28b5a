package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {

  import spark.implicits._

  test("sign matrix: pure function of (dims, k, salt), entries ±1, both signs present") {
    val a = RandomProjection.signMatrix(64, 16)
    val b = RandomProjection.signMatrix(64, 16)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(x => x == 1.0 || x == -1.0))
    assert(a.flatten.count(_ == 1.0) > 200 && a.flatten.count(_ == -1.0) > 200,
      "a hash-derived matrix must not degenerate to one sign")
    val c = RandomProjection.signMatrix(64, 16, salt = "other")
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq, "salt must matter")
  }

  test("projected equals the in-JVM matrix-vector product") {
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 20L).map(i =>
      (i, Array.fill(8)(rnd.nextDouble() * 2 - 1))).toSeq
    val m = RandomProjection.signMatrix(8, 4)
    val got = vecs.toDF("vec_id", "emb")
      .select($"vec_id",
        RandomProjection.projected($"emb", dims = 8, k = 4).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    vecs.foreach { case (id, v) =>
      val want = m.map(row => row.zip(v).map { case (s, x) => s * x }.sum).toSeq
      assert(got(id).zip(want).forall { case (g, w) => math.abs(g - w) < 1e-12 },
        s"vec $id: ${got(id)} vs $want")
    }
  }

  test("JL contract: projected cosine approximates full-space cosine on random pairs") {
    val rnd = new scala.util.Random(5)
    def cos(a: Array[Double], b: Array[Double]) = {
      val dp = a.zip(b).map(p => p._1 * p._2).sum
      dp / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val vecs = (0L until 30L).map(i =>
      (i, Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val proj = vecs.toDF("vec_id", "emb")
      .select($"vec_id", RandomProjection.projected($"emb", 64, 16).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
      .map { case (k, v) => k -> v.toArray }
    // k=16 gives a loose bound; assert the projection is clearly
    // signal-preserving, not exact: mean absolute cosine error well under
    // what unrelated random vectors would show
    val errs = for (a <- 0L until 30L; b <- (a + 1) until 30L) yield
      math.abs(cos(vecs(a.toInt)._2, vecs(b.toInt)._2) - cos(proj(a), proj(b)))
    assert(errs.sum / errs.size < 0.25, s"mean |Δcos| = ${errs.sum / errs.size}")
  }
}
