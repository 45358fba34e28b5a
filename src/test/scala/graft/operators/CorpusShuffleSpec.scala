package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CorpusShuffleSpec extends SparkSpec {

  private def corpus(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, s"doc $i body", (i % 37) * 20))
      .toDF("doc_id", "text", "n_chars")
  }

  test("shuffle: a permutation — shards partition the corpus, positions contiguous") {
    val got = CorpusShuffle.shuffle(corpus(200), "doc_id", "s1", nShards = 8)
      .select("doc_id", "shard", "shard_pos").collect()
    assert(got.length == 200)
    assert(got.map(_.getLong(0)).toSet == (0L until 200L).toSet)
    val byShard = got.groupBy(_.getLong(1))
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    // each shard's positions are exactly 1..size — no gaps, no dups
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $s positions must be contiguous")
    }
  }

  test("shuffle: pure function of (data, seed); a new seed reorders") {
    def run(seed: String) =
      CorpusShuffle.shuffle(corpus(200), "doc_id", seed, nShards = 4)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run("s1") == run("s1"), "same seed must replay bit-exactly")
    assert(run("s1") != run("s2"), "a different seed must permute differently")
  }

  test("writeShards: one file per shard, file row order IS the permutation") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString + "/out"
    CorpusShuffle.writeShards(corpus(200), "doc_id", "s1", nShards = 4, dir)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.nonEmpty && shardDirs.length <= 4)
    var total = 0L
    shardDirs.foreach { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName} must hold ONE file, has ${files.length}")
      // row order within the file must be the shard-position order
      val rows = spark.read.parquet(files.head.toString)
        .select("shard_pos").collect().map(_.getLong(0)).toSeq
      assert(rows == rows.sorted, s"${sd.getName} rows must replay in position order")
      total += rows.length
    }
    assert(total == 200L, "shards must partition the corpus")
  }

  test("curriculumOrder: exact global positions — equals the naive global window") {
    val docs = corpus(300)
    val stage = least(floor(col("n_chars") / 100), lit(9L))
    val got = CorpusShuffle.curriculumOrder(docs, "doc_id", stage, "s1",
        subBins = 16)
      .select(col("doc_id"), col("global_pos")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference: the single-partition window this operator
    // exists to avoid — fine at test scale
    val key = graft.dedup.Dedup.hexHash(col("doc_id").cast("string"), "s1|")
    val want = docs
      .withColumn("global_pos", row_number().over(
        Window.orderBy(stage.cast("long"), key, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("global_pos")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "two-pass positions must equal the global window")
  }

  test("curriculumOrder: stages are contiguous blocks, shuffled within") {
    val docs = corpus(300)
    val stage = least(floor(col("n_chars") / 100), lit(9L))
    val rows = CorpusShuffle.curriculumOrder(docs, "doc_id", stage, "s1")
      .withColumn("stage", stage.cast("long"))
      .select("global_pos", "stage", "doc_id").collect()
      .sortBy(_.getLong(0))
    // positions are a permutation of 1..N and stage never decreases
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    assert(rows.map(_.getLong(1)).sliding(2).forall(p => p(0) <= p(1)),
      "curriculum stages must be contiguous position blocks")
    // within the largest stage the doc order differs from id order (it is
    // hash-shuffled, not sorted by id)
    val s0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).toSeq
    assert(s0 != s0.sorted, "within-stage order must be the seeded shuffle")
  }
}
