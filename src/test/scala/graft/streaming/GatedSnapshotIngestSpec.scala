package graft.streaming

import graft.SparkSpec
import graft.operators.Expectations
import graft.storage.SnapshotStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Contract of expectation-gated ingest: every batch splits row-wise on
  * the rules, passing rows version into the main table, violating rows
  * into the quarantine table with the exact rule labels they failed,
  * nothing is dropped, and both stores are independently replay-guarded
  * across kill-and-resume. */
class GatedSnapshotIngestSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapgate").toFile
    d.delete()
    d.getAbsolutePath
  }

  private val rules = Seq[Expectations.Rule](
    Expectations.NotNull("text"),
    Expectations.InRange("n_chars", 1L, 100L))

  test("each batch splits on the contract: clean rows to main, labeled rows to quarantine") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Option[String], Long)]
    val (main, quar) = (freshDir(), freshDir())
    val ckpt = java.nio.file.Files.createTempDirectory("snapgate-ckpt").toString
    val q = GatedSnapshotIngest.start(
      input.toDF().toDF("doc_id", "text", "n_chars"), main, quar, ckpt, rules)

    input.addData((1L, Some("a"), 1L), (2L, None, 5L), (3L, Some("c"), 999L))
    q.processAllAvailable()
    // an all-clean batch must not version the quarantine
    input.addData((4L, Some("d"), 7L))
    q.processAllAvailable()
    q.stop()

    assert(SnapshotStore.read(spark, main)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
    val dirty = SnapshotStore.read(spark, quar)
      .select(col("doc_id"), col("violated_rules"))
      .as[(Long, Seq[String])].collect().toMap
    assert(dirty == Map(
      2L -> Seq("not_null:text"),
      3L -> Seq("in_range:n_chars")),
      "quarantined rows carry exactly the rules they failed")
    assert(SnapshotStore.versions(spark, quar).length == 1,
      "the all-clean batch committed nothing to quarantine")
    assert(SnapshotStore.versions(spark, main).length == 2)
  }

  test("a row failing several rules carries every label; nothing is dropped") {
    val (main, quar) = (freshDir(), freshDir())
    val df = Seq((1L, Option.empty[String], 500L), (2L, Option("ok"), 5L))
      .toDF("doc_id", "text", "n_chars")
    val (vm, vq) = GatedSnapshotIngest.gateAndCommit(
      spark, df, main, quar, rules, "ingest-b0")
    assert(vm.contains(1L) && vq.contains(1L))
    val labels = SnapshotStore.read(spark, quar)
      .select("violated_rules").as[Seq[String]].head()
    assert(labels.toSet == Set("not_null:text", "in_range:n_chars"))
    assert(SnapshotStore.read(spark, main).count() +
      SnapshotStore.read(spark, quar).count() == 2L)
  }

  test("kill-and-resume: both stores' replay guards skip the committed batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Option[String], Long)]
    val (main, quar) = (freshDir(), freshDir())
    val ckpt = java.nio.file.Files.createTempDirectory("snapgate-ckpt2").toString
    val q = GatedSnapshotIngest.start(
      input.toDF().toDF("doc_id", "text", "n_chars"), main, quar, ckpt, rules)
    input.addData((1L, Some("a"), 1L), (2L, None, 5L))
    q.processAllAvailable()
    q.stop()

    val q2 = GatedSnapshotIngest.start(
      input.toDF().toDF("doc_id", "text", "n_chars"), main, quar, ckpt, rules)
    input.addData((3L, Some("c"), 2L), (4L, None, 9L))
    q2.processAllAvailable()
    q2.stop()

    assert(SnapshotStore.read(spark, main)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    assert(SnapshotStore.read(spark, quar)
      .select("doc_id").as[Long].collect().toSet == Set(2L, 4L))
    assert(SnapshotStore.versions(spark, main).length == 2 &&
      SnapshotStore.versions(spark, quar).length == 2,
      "resume neither loses a side nor doubles one")
  }

  test("a Unique rule refuses loudly (keys-grain belongs to the upsert path)") {
    intercept[IllegalArgumentException] {
      GatedSnapshotIngest.violatedRules(
        Seq(Expectations.Unique(Seq("doc_id"))))
    }
  }
}
