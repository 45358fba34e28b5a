package graft

import graft.pipeline.DeliveryPipeline
import graft.scheduler.Scheduler
import graft.sinks.HttpPostAction
import graft.state.{KVStore, LeaseStore}
import graft.streaming.ChangeStream
import org.apache.spark.sql.types._
import com.sun.net.httpserver.HttpServer
import java.net.InetSocketAddress
import java.nio.file.Files
import java.sql.Timestamp

/** The whole reference app, end to end (SURVEY.md §3.1-§3.3 in one run):
  * checkpointed streaming change feed → dedup-to-latest → allowlist
  * projection → HTTP POST to a live (stub) endpoint; on failure the error
  * state + lease update and the retry orchestration runs under a virtual
  * clock; recovery clears the lease. */
class FullIntegrationSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("version", LongType),
    StructField("name", StringType), StructField("secret", StringType)))

  test("change feed -> pipeline -> live HTTP sink -> failure protocol -> retry -> recovery") {
    import spark.implicits._
    val base = Files.createTempDirectory("e2e").toString
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val failNext = new java.util.concurrent.atomic.AtomicBoolean(false)

    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/ingest", exchange => {
      val body = new String(exchange.getRequestBody.readAllBytes())
      if (failNext.get()) {
        exchange.sendResponseHeaders(503, 4)
        exchange.getResponseBody.write("busy".getBytes)
      } else {
        received.add(body)
        exchange.sendResponseHeaders(200, 2)
        exchange.getResponseBody.write("ok".getBytes)
      }
      exchange.close()
    })
    server.start()

    try {
      val client = new KVStore(spark, s"$base/allowed")
      client.save("demo", "id,version,name", new Timestamp(1))
      val lastError = new KVStore(spark, s"$base/err")
      val lease = new LeaseStore(spark, s"$base/lease")
      val pipeline = new DeliveryPipeline("demo", Seq("id"), "version",
        allowlistConfig = None, clientAllowlist = client,
        lastError = lastError, lease = lease,
        sink = new HttpPostAction(),
        sinkParams = Map(
          "baseUrl" -> s"http://localhost:${server.getAddress.getPort}",
          "route" -> "/ingest", "timeoutMs" -> "10000"))

      // ---- change set 1 delivers through the stream ----
      Seq((1L, 1L, "a-v1", "s"), (1L, 2L, "a-v2", "s"), (2L, 1L, "b-v1", "s"))
        .toDF("id", "version", "name", "secret").write.parquet(s"$base/src/c0")
      val cfg = ChangeStream.StreamConfig(table = "demo", pk = Seq("id"),
        versionCol = "version", availableNow = true)
      def runStream(): Unit = {
        val q = ChangeStream.start(spark, s"$base/src/*", s"$base/ckp", schema, cfg) {
          (batch, _) => if (!batch.isEmpty) assert(pipeline.deliver(batch) == pipeline.Delivered)
        }
        q.awaitTermination(60000)
      }
      runStream()
      assert(received.size == 1)
      val doc = received.poll()
      assert(doc.contains("\"a-v2\"") && doc.contains("\"b-v1\"") && !doc.contains("a-v1"),
        s"latest-state only: $doc")
      assert(doc.contains("\"id\"") && !doc.contains("secret"), "allowlist applied")
      assert(lease.attemptCount("demo").contains(0))

      // ---- sink outage: delivery fails, protocol records it ----
      failNext.set(true)
      val changes2 = Seq((3L, 1L, "c-v1", "s")).toDF("id", "version", "name", "secret")
      val d = pipeline.deliver(changes2)
      assert(d.isInstanceOf[pipeline.RetryScheduled])
      assert(lease.attemptCount("demo").contains(1))
      assert(lastError.get("demo").exists(_.startsWith("status=503")))

      // ---- retry orchestration under virtual time until recovery ----
      failNext.set(false)
      assert(pipeline.deliver(changes2) == pipeline.Delivered) // redelivery succeeds
      val clock = new Scheduler.VirtualClock
      val result = Scheduler.runRetryLoop("demo", lease,
        Scheduler.RetryConfig(intervalUnitMillis = 1), clock, _ => ())
      assert(result == Scheduler.Recovered, "lease cleared after successful redelivery")
      assert(received.size == 1 && received.poll().contains("c-v1"))
    } finally server.stop(0)
  }
}
