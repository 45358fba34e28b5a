package graft.streaming

import graft.SparkSpec
import graft.operators.Expectations._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class ContractRow(id: Long, s: String, v: Long)

class StreamingExpectationsSpec extends SparkSpec {

  private val rules = Seq(NotNull("s"), InRange("v", 0L, 10L),
    Matches("s", "^[a-z]+$"))

  test("streamed verdicts == batch check at every fold point") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1 to 90).map { i =>
      ContractRow(i.toLong,
        if (i % 11 == 0) null else if (i % 7 == 0) s"X$i" else "ok",
        if (i % 5 == 0) 50L else 3L)
    }
    val batches = Seq(rows.slice(0, 30), rows.slice(30, 70), rows.slice(70, 90))

    val input = MemoryStream[ContractRow]
    val q = StreamingExpectations.verdicts(input.toDF(), rules)
      .writeStream.format("memory").queryName("se_out")
      .outputMode(OutputMode.Complete()).start()
    var seen = Seq.empty[ContractRow]
    batches.foreach { b =>
      input.addData(b); q.processAllAvailable()
      seen = seen ++ b
      val got = StreamingExpectations
        .verdictRows(spark.table("se_out").collect().head, rules)
        .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
      val ref = check(seen.toDF(), rules)
        .as[(String, String, Long, Long, Boolean)].collect()
        .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
      assert(got == ref, s"fold point after ${seen.length} rows diverged")
    }
    q.stop()
  }

  test("uniqueness is rejected with the batch-grain pointer") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      StreamingExpectations.verdicts(
        Seq((1L, "a")).toDF("id", "s"), Seq(Unique(Seq("id"))))
    }
    assert(e.getMessage.contains("batch-grain"))
  }
}
