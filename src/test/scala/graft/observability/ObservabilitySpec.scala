package graft.observability

import graft.SparkSpec

class ObservabilitySpec extends SparkSpec {

  test("leveled logging preserves the reference color convention") {
    import Observability._
    assert(logLeveled(Level.Critical, "boom") == "[grey] boom")
    assert(logLeveled(Level.Error, "bad") == "[red] bad")
    assert(logLeveled(Level.Warning, "meh") == "[orange] meh")
    assert(logLeveled(Level.Info, "fine") == "fine")
  }

  test("metrics listener aggregates task counters for a real job") {
    import spark.implicits._
    val l = Observability.attach(spark)
    try {
      val n = (1 to 10000).toDF("x").groupBy(($"x" % 7).as("k")).count().count()
      assert(n == 7)
      // listener bus is async; poll until the events drain
      val deadline = System.currentTimeMillis() + 30000
      while (l.snapshot("shuffleBytesWritten") == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val snap = l.snapshot
      assert(snap("tasksCompleted") > 0)
      assert(snap("stagesCompleted") > 0)
      assert(snap("shuffleBytesWritten") > 0, s"expected shuffle, got $snap")
    } finally Observability.detach(spark, l)
  }
}
