package graft.scheduler

import graft.SparkSpec
import graft.state.{KVStore, LeaseStore}
import java.nio.file.Files
import java.sql.Timestamp

class SchedulerSpec extends SparkSpec {
  import Scheduler._

  private def tmp = Files.createTempDirectory("sched").toString
  // 1 ms "minutes" so loops run instantly under the virtual clock
  private val cfg = RetryConfig(intervalUnitMillis = 1)

  test("retry loop: recovers when the lease clears (attempts < 1 or absent)") {
    val lease = new LeaseStore(spark, tmp)
    val clock = new VirtualClock
    var notifies = 0
    lease.setAttemptCount("t", 0, Timestamp.from(clock.now()))
    assert(runRetryLoop("t", lease, cfg, clock, _ => notifies += 1) == Recovered)
    assert(runRetryLoop("missing", lease, cfg, clock, _ => notifies += 1) == Recovered)
    assert(notifies == 0)
  }

  test("retry loop: capped linear backoff, notify once, CONTINUE until recovery") {
    val lease = new LeaseStore(spark, tmp)
    val clock = new VirtualClock
    lease.setAttemptCount("t", 3, Timestamp.from(clock.now()))
    var notified = List.empty[String]
    // the notification clears the stuck lease -> the loop must keep running
    // past the threshold and observe the recovery on its NEXT iteration
    // (RetryFunctions.cs:169-173 falls through to ContinueAsNew at :50)
    val result = runRetryLoop("t", lease, cfg, clock, { t =>
      notified ::= t
      lease.setAttemptCount("t", 0, Timestamp.from(clock.now()))
    })
    assert(result == Recovered)
    assert(notified == List("t"))
    // 10 sleeps up to the notify threshold + 1 more proving continuation
    assert(clock.sleeps.toList == List(6, 7, 8, 9, 10, 11, 12, 12, 12, 12, 12))
  }

  test("retry loop: keeps retrying after notification until total timeout") {
    val lease = new LeaseStore(spark, tmp)
    val clock = new VirtualClock
    lease.setAttemptCount("t", 3, Timestamp.from(clock.now()))
    var notifies = 0
    // real-minute units; 2h budget: cumulative backoff passes the notify
    // threshold (10 retries, 99 min) and times out at 123 min
    val twoHours = RetryConfig(totalTimeoutHours = 2, intervalUnitMillis = 60000)
    val result = runRetryLoop("t", lease, twoHours, clock, _ => notifies += 1)
    assert(result == TimedOut)
    assert(notifies == 1) // fired once, never re-fired on later iterations
    assert(clock.sleeps.size > 10) // retried beyond the notify threshold
  }

  test("retry loop: notifyOnRetryCount <= 0 disables notification entirely") {
    val lease = new LeaseStore(spark, tmp)
    val clock = new VirtualClock
    lease.setAttemptCount("t", 3, Timestamp.from(clock.now()))
    var notifies = 0
    val disabled = RetryConfig(totalTimeoutHours = 2, intervalUnitMillis = 60000,
      notifyOnRetryCount = 0)
    assert(runRetryLoop("t", lease, disabled, clock, _ => notifies += 1) == TimedOut)
    assert(notifies == 0, "threshold 0 means never notify, not notify-on-first-retry")
  }

  test("retry loop: exhausted lease (5) is nudged to 4 to re-arm redelivery") {
    val lease = new LeaseStore(spark, tmp)
    val clock = new VirtualClock
    lease.setAttemptCount("t", 5, Timestamp.from(clock.now()))
    var seenAtNotify: Option[Int] = None
    runRetryLoop("t", lease, cfg, clock, { _ =>
      seenAtNotify = lease.attemptCount("t") // nudged on the first iteration
      lease.setAttemptCount("t", 0, Timestamp.from(clock.now())) // end the loop
    })
    assert(seenAtNotify.contains(4))
  }

  test("retry loop: total timeout stops retrying") {
    val lease = new LeaseStore(spark, tmp)
    // real-minute units: first sleep (6 min) blows a tiny timeout window
    val clock = new VirtualClock
    lease.setAttemptCount("t", 3, Timestamp.from(clock.now()))
    val tight = RetryConfig(totalTimeoutHours = 0, intervalUnitMillis = 60000)
    assert(runRetryLoop("t", lease, tight, clock, _ => ()) == TimedOut)
  }

  test("notify throttler: 360-min window suppresses duplicates, reopens after") {
    val clock = new VirtualClock
    val throttle = new NotifyThrottler(new KVStore(spark, tmp), 360, clock)
    var sent = 0
    assert(throttle.notify("t", _ => sent += 1))
    assert(!throttle.notify("t", _ => sent += 1)) // inside window
    clock.advance(359 * 60000L)
    assert(!throttle.notify("t", _ => sent += 1)) // still inside
    clock.advance(2 * 60000L)
    assert(throttle.notify("t", _ => sent += 1))  // window elapsed
    assert(sent == 2)
  }

  test("singleton registry: concurrent same-id starts collapse to one") {
    val reg = new SingletonRegistry
    val ran = new java.util.concurrent.atomic.AtomicInteger
    val gate = new java.util.concurrent.CountDownLatch(1)
    val t1 = new Thread(() => reg.runSingleton("x") { gate.await(); ran.incrementAndGet() })
    t1.start()
    Thread.sleep(50) // let t1 acquire
    assert(!reg.runSingleton("x") { ran.incrementAndGet() })
    assert(reg.isRunning("x"))
    gate.countDown(); t1.join()
    assert(ran.get() == 1)
    assert(reg.runSingleton("x") { ran.incrementAndGet() }) // free again
    assert(ran.get() == 2)
  }

  test("singleton start-retry: already-running is an immediate no-op success") {
    // RetryFunctions.cs:79-87 — GetInstance().IsRunning => return without
    // scheduling; no retry, no delay
    val reg = new SingletonRegistry
    val clock = new VirtualClock
    val gate = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => reg.runSingleton("x") { gate.await() })
    holder.start()
    while (!reg.isRunning("x")) Thread.sleep(1)
    var ran = 0
    assert(reg.runSingletonWithRetry("x", clock) { ran += 1 })
    assert(ran == 0, "no-op: body must not run while the id is busy")
    assert(clock.sleeps.isEmpty, "no retry delay for the already-running case")
    gate.countDown(); holder.join()
  }

  test("singleton start-retry: failed starts retried 2 s apart, then succeed") {
    // RetryFunctions.cs:95-105 — schedule failures retried up to 5× with 2 s
    // delays
    val reg = new SingletonRegistry
    val clock = new VirtualClock
    var attempts = 0
    assert(reg.runSingletonWithRetry("x", clock) {
      attempts += 1
      if (attempts < 3) throw new RuntimeException("transient start failure")
    })
    assert(attempts == 3)
    assert(clock.sleeps.toList == List(2000L, 2000L))
    assert(!reg.isRunning("x"))
  }

  test("singleton start-retry: rethrows after 5 failed attempts") {
    val reg = new SingletonRegistry
    val clock = new VirtualClock
    var attempts = 0
    val e = intercept[RuntimeException] {
      reg.runSingletonWithRetry("x", clock) {
        attempts += 1; throw new RuntimeException(s"fail $attempts")
      }
    }
    assert(e.getMessage == "fail 5")
    assert(attempts == 5)
    // 5 attempts -> 4 inter-attempt waits of 2000 ms (virtual)
    assert(clock.sleeps.toList == List(2000L, 2000L, 2000L, 2000L))
    assert(!reg.isRunning("x"))
  }

  test("cleanup: per-family retention (reference cutoff bug fixed)") {
    import spark.implicits._
    val clock = new VirtualClock(java.time.Instant.parse("2026-02-01T00:00:00Z"))
    def t(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val hist = Seq(
      ("c_old", t("2026-01-20T00:00:00Z"), "Completed"),   // > 7d -> purged
      ("c_new", t("2026-01-28T00:00:00Z"), "Completed"),   // < 7d -> kept
      ("f_old", t("2025-12-25T00:00:00Z"), "Failed"),      // > 30d -> purged
      ("f_mid", t("2026-01-20T00:00:00Z"), "Failed"),      // 12d: kept (30d retention!)
      ("r_any", t("2025-01-01T00:00:00Z"), "Running")      // never purged
    ).toDF("id", "created", "status")
    val kept = Scheduler.cleanup(hist, clock).select("id").as[String].collect().toSet
    assert(kept == Set("c_new", "f_mid", "r_any"))
  }
}
