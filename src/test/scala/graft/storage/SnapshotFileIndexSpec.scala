package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the Catalyst-integrated snapshot read: a plain
  * `.filter` on the DataFrame prunes files through the manifest stats
  * with no explicit FilePredicate plumbing, answers exactly match the
  * full scan, and untranslatable predicates degrade to keeping every
  * file (never to wrong answers). */
class SnapshotFileIndexSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapidx").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def store(): (String, Long) = {
    val dir = freshDir()
    val df = (0L until 1024L).map(i => (i, i % 32, i / 32, s"r$i"))
      .toDF("doc_id", "x", "y", "payload")
    SnapshotStore.commit(spark, dir, df, "ingest")
    val v = SnapshotStore.cluster(spark, dir, "x", "y", nFiles = 16)
    (dir, v)
  }

  test("a plain .filter skips files via the manifest stats; answer equals the full scan") {
    val (dir, v) = store()
    val (df, index) = SnapshotFileIndex.readAsOfTableWithIndex(spark, dir, v)
    val got = df.filter($"x" >= 2 && $"x" <= 5 && $"y" >= 2 && $"y" <= 5)
      .select("doc_id").as[Long].collect().toSet
    val want = SnapshotStore.readAsOf(spark, dir, v)
      .filter($"x" >= 2 && $"x" <= 5 && $"y" >= 2 && $"y" <= 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want && want.size == 16)
    assert(index.lastListedCount > 0 && index.lastListedCount < 16,
      s"the scan must have listed a pruned subset, got ${index.lastListedCount}")
  }

  test("an untranslatable predicate keeps every file and still answers correctly") {
    val (dir, v) = store()
    val (df, index) = SnapshotFileIndex.readAsOfTableWithIndex(spark, dir, v)
    val got = df.filter(($"x" + $"y") % 7 === 0).count()
    val want = SnapshotStore.readAsOf(spark, dir, v)
      .filter(($"x" + $"y") % 7 === 0).count()
    assert(got == want)
    assert(index.lastListedCount == 16, "no translation -> no pruning")
  }

  test("AND prunes on the translatable subset; OR only when both arms translate") {
    val (dir, v) = store()
    val (df, index) = SnapshotFileIndex.readAsOfTableWithIndex(spark, dir, v)
    // AND of a translatable range with an untranslatable arithmetic arm
    val got = df.filter($"x" >= 28 && ($"x" * 3) % 5 === 0)
      .select("doc_id").as[Long].collect().toSet
    val want = SnapshotStore.readAsOf(spark, dir, v)
      .filter($"x" >= 28 && ($"x" * 3) % 5 === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(index.lastListedCount < 16, "the x-range conjunct must prune alone")
    // OR with one untranslatable arm: keeps all files, correct answer
    val got2 = df.filter($"x" >= 30 || ($"x" * 3) % 5 === 0).count()
    val want2 = SnapshotStore.readAsOf(spark, dir, v)
      .filter($"x" >= 30 || ($"x" * 3) % 5 === 0).count()
    assert(got2 == want2)
    assert(index.lastListedCount == 16, "a half-translatable OR must not prune")
  }

  test("string equality and SQL access prune the same way") {
    val dir = freshDir()
    SnapshotStore.commit(spark, dir,
      (1L to 400L).map(i => (i, s"k${i % 8}", s"v$i")).toDF("id", "k", "v")
        .repartitionByRange(8, col("id")), "ingest")
    val (df, index) = SnapshotFileIndex.readAsOfTableWithIndex(spark, dir, 1L)
    df.createOrReplaceTempView("snap_t")
    val got = spark.sql("SELECT count(*) FROM snap_t WHERE id BETWEEN 50 AND 60")
      .as[Long].head()
    assert(got == 11L)
    assert(index.lastListedCount < 8,
      "a SQL WHERE must prune through the same index")
  }
}
