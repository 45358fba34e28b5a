package graft.state

import graft.SparkSpec
import java.nio.file.Files
import java.sql.Timestamp

class KVStoreSpec extends SparkSpec {

  private def tmp = Files.createTempDirectory("kvstore").toString
  private def ts(ms: Long) = new Timestamp(ms)

  test("save/get: last write wins, updated_at stamped") {
    val kv = new KVStore(spark, tmp)
    assert(kv.get("t1").isEmpty)
    kv.save("t1", "Id,Name", ts(1000))
    assert(kv.get("t1").contains("Id,Name"))
    kv.save("t1", "Id,Name,LastUpdate", ts(2000))
    assert(kv.get("t1").contains("Id,Name,LastUpdate"))
    assert(kv.all().count() == 1)
  }

  test("incoming wins on exact timestamp tie (overwrite semantics)") {
    val kv = new KVStore(spark, tmp)
    kv.save("k", "old", ts(5000))
    kv.save("k", "new", ts(5000))
    assert(kv.get("k").contains("new"))
  }

  test("independent keys coexist; delete removes one") {
    val kv = new KVStore(spark, tmp)
    kv.save("a", "1", ts(1)); kv.save("b", "2", ts(2))
    assert(kv.all().count() == 2)
    kv.delete("a")
    assert(kv.get("a").isEmpty && kv.get("b").contains("2"))
  }

  test("snapshots are compacted: only the current version remains on disk") {
    val dir = tmp
    val kv = new KVStore(spark, dir)
    (1 to 4).foreach(i => kv.save("k", s"v$i", ts(i.toLong)))
    val versions = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.contains("/v_"))
    assert(versions.length == 1, s"expected 1 snapshot dir, got ${versions.toSeq}")
    assert(kv.get("k").contains("v4"))
  }

  test("LeaseStore: attempt counts and the 5->4 re-arm nudge") {
    val lease = new LeaseStore(spark, tmp)
    assert(lease.attemptCount("t").isEmpty)
    assert(!lease.nudgeIfExhausted("t"))
    lease.setAttemptCount("t", 3, ts(1))
    assert(!lease.nudgeIfExhausted("t"))
    assert(lease.attemptCount("t").contains(3))
    lease.setAttemptCount("t", 5, ts(2))
    assert(lease.nudgeIfExhausted("t", ts(3)))
    assert(lease.attemptCount("t").contains(4))
  }
}
