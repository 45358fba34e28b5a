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

  test("snapshots are compacted to the retained window (bounded history)") {
    val dir = tmp
    val kv = new KVStore(spark, dir, keepSnapshots = 2)
    (1 to 5).foreach(i => kv.save("k", s"v$i", ts(i.toLong)))
    val versions = Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.contains("/v_")).sorted
    assert(versions.length == 2, s"expected 2 snapshot dirs, got ${versions.toSeq}")
    assert(kv.get("k").contains("v5"))
  }

  test("lazy handle from all() survives a subsequent save (snapshot retention)") {
    val kv = new KVStore(spark, tmp) // default retention of 3
    kv.save("k", "v1", ts(1))
    val before = kv.all() // lazy: reads v_0 when evaluated
    kv.save("k", "v2", ts(2)) // writes v_1; v_0 must still exist
    assert(before.filter(before("key") === "k").count() == 1)
    assert(kv.get("k").contains("v2"))
  }

  test("concurrent saves of different keys both survive (no lost update)") {
    val kv = new KVStore(spark, tmp)
    val threads = (1 to 4).map { i =>
      new Thread(() => kv.save(s"k$i", s"v$i", ts(i.toLong)))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(kv.all().count() == 4)
    (1 to 4).foreach(i => assert(kv.get(s"k$i").contains(s"v$i")))
  }

  test("cleanStorage: empty entities removed, crash leftovers deleted") {
    val dir = tmp
    val kv = new KVStore(spark, dir)
    kv.save("live", "data", ts(1))
    kv.save("empty", "", ts(2))
    kv.save("blank", "   ", ts(3))
    // simulate a writer that died mid-swap: stray tmp pointer + future snapshot
    val root = java.nio.file.Paths.get(dir)
    Files.writeString(root.resolve("_CURRENT.tmp99"), "99")
    Files.createDirectories(root.resolve("v_99"))
    val (empties, orphans) = kv.cleanStorage()
    assert(empties == 2, s"expected 2 empty entities, got $empties")
    assert(orphans == 2, s"expected 2 orphans, got $orphans")
    assert(kv.get("live").contains("data"))
    assert(kv.get("empty").isEmpty && kv.get("blank").isEmpty)
    assert(!Files.exists(root.resolve("_CURRENT.tmp99")))
    assert(!Files.exists(root.resolve("v_99")))
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
