package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.types._
import java.nio.file.Files

class ChangeStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("version", LongType),
    StructField("name", StringType), StructField("secret", StringType)))

  test("delivers deduped, allowlist-projected batches; checkpoint survives restart") {
    import spark.implicits._
    val src = Files.createTempDirectory("stream-src").toString
    val ckp = Files.createTempDirectory("stream-ckp").toString
    val delivered = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Seq[(Long, Long, String)])]()

    // change set 1: id=1 has two versions (dedup keeps v2); id=2 one version
    Seq((1L, 1L, "a-v1", "s"), (1L, 2L, "a-v2", "s"), (2L, 1L, "b-v1", "s"))
      .toDF("id", "version", "name", "secret")
      .write.parquet(s"$src/batch0")

    val cfg = ChangeStream.StreamConfig(
      table = "demo", pk = Seq("id"), versionCol = "version",
      allowlistConfig = Some("id,version,name"), // 'secret' filtered out
      availableNow = true)

    def run(): Unit = {
      val q = ChangeStream.start(spark, s"$src/*", ckp, schema, cfg) { (df, batchId) =>
        val rows = df.select("id", "version", "name")
          .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)
        assert(df.columns.toSeq == Seq("id", "version", "name"), "allowlist projection")
        delivered.add(batchId -> rows)
      }
      q.awaitTermination(30000)
    }

    run()
    val first = delivered.poll()
    assert(first != null, "first delivery arrived")
    assert(first._2 == Seq((1L, 2L, "a-v2"), (2L, 1L, "b-v1")), s"got ${first._2}")

    // restart with the same checkpoint: batch0 must NOT redeliver (T2),
    // only the new file appears
    Seq((3L, 1L, "c-v1", "s")).toDF("id", "version", "name", "secret")
      .write.parquet(s"$src/batch1")
    run()
    val second = delivered.poll()
    assert(second != null, "second delivery arrived")
    assert(second._2 == Seq((3L, 1L, "c-v1")), s"checkpoint must skip batch0, got ${second._2}")
    assert(delivered.isEmpty)
  }
}
