package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables

/** Scale-probe diagnostic: TRUE answer masses of the duplicate-pair
  * families at a given sfDir — run at two scales, the ratio of ANSWER
  * rows explains (or indicts) the ratio of runtimes (work ∝ answer is
  * the banded-LSH contract; a runtime ratio far above the answer ratio
  * would be a plan weakness instead).
  * Usage: runMain graft.tools.PairMass <sfDir> */
object PairMass {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TextExpressions.register(spark)
    val emb = Tables.embeddings(spark, d)
    val nVec = emb.count()
    // the e_cosine_neardup memo's exact knobs (ExtQueries NearDup*)
    val cos = graft.similarity.Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding",
      threshold = 0.25, bandBits = 6, nBands = 8).count()
    val docs = Tables.documents(spark, d)
    val nDocs = docs.count()
    val sim = graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text").count()
    println(s"""{"sf":"$d","n_vecs":$nVec,"cosine_neardup_pairs":$cos,"n_docs":$nDocs,"simhash_pairs":$sim}""")
    spark.stop()
  }
}
