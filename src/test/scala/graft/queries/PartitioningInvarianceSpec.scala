package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioning invariance: the graded output of every FP-sensitive
  * operator family must be BIT-IDENTICAL under different parallelism —
  * otherwise the DuckDB grading (and any cluster re-run) would be
  * flaky. Integer-exact operators are invariant by construction; the
  * rounded-double ones are invariant because their reductions are
  * either integer-scaled sums or small bounded aggregations whose
  * rounding absorbs FP reorder — this spec is the regression guard on
  * that property. */
class PartitioningInvarianceSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Run `f` over the same input at two partitionings, compare collected
    * rows exactly. */
  private def invariant(name: String)(f: DataFrame => DataFrame): Unit = {
    val base = Tables.documents(spark, d)
    val a = f(base.repartition(3)).collect().map(_.toSeq).toSeq
    val b = f(base.repartition(17)).collect().map(_.toSeq).toSeq
    assert(a == b, s"$name output differs across partitionings")
    assert(a.nonEmpty, s"$name produced no rows")
  }

  test("winsorized stats are partitioning-invariant (integer-exact path)") {
    invariant("winsorize")(df =>
      graft.operators.Winsorize.stats(df, "source", "n_chars", 1, 19, 20))
  }

  test("robust median/MAD census is partitioning-invariant") {
    invariant("robustStats")(df =>
      graft.operators.RobustStats.medianMadOutliers(
        df.withColumn("len", col("n_chars")), "source", "len"))
  }

  test("table profile is partitioning-invariant") {
    invariant("tableProfile")(df => graft.operators.TableProfile(df))
  }

  test("source centroid cosines are partitioning-invariant after rounding") {
    val emb = Tables.embeddings(spark, d)
      .join(Tables.documents(spark, d)
        .select(col("doc_id").as("vec_id"), col("source")), Seq("vec_id"))
    val a = graft.similarity.Similarity
      .groupCentroidSimilarity(emb.repartition(3), "source", "embedding")
      .orderBy("src_a", "src_b").collect().map(_.toSeq).toSeq
    val b = graft.similarity.Similarity
      .groupCentroidSimilarity(emb.repartition(17), "source", "embedding")
      .orderBy("src_a", "src_b").collect().map(_.toSeq).toSeq
    assert(a == b, "centroid cosines differ across partitionings")
  }

  test("gopher rule battery is partitioning-invariant") {
    // in-row flags + one global aggregation of integer counts
    val base = Tables.documents(spark, d)
    def run(df: DataFrame): Seq[Seq[Any]] = {
      val toks = split(trim(col("text")), " ")
      val nW = size(toks).cast("double")
      df.select((nW < 12 || nW > 80).cast("long").as("f"))
        .agg(sum(col("f")), count(lit(1))).collect().map(_.toSeq).toSeq
    }
    assert(run(base.repartition(3)) == run(base.repartition(17)))
  }
}
