package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract of the OPTIMISTIC multi-writer conflict check (round 20 —
  * the Delta ConflictChecker shape over the RenameLogStore's atomic
  * put-if-absent): interleaved APPENDS both land (the loser re-stages
  * against the winner's state — including identity re-allocation); an
  * engine-staged REWRITE/DML that loses its race to a rival which
  * removed files or changed deletion vectors refuses with a typed
  * [[SnapshotStore.SnapshotConcurrentModificationException]] naming
  * the winning version, leaving the log intact and no partial state;
  * and a DML that loses only to a rival APPEND commutes — the retry
  * recomputes its file selection against the new state. */
class SnapshotConflictSpec extends SparkSpec {

  import spark.implicits._

  private val store = SnapshotStore

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("snapconf").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def seed(dir: String): Unit =
    store.commit(spark, dir,
      (1L to 100L).map(i => (i, s"d$i")).toDF("id", "txt")
        .repartitionByRange(4, col("id")), "ingest")

  /** run `rival` exactly once, inside `op`'s first commit attempt
    * (after its slot claim, before its rename — the widest window) */
  private def interleave[A](rival: => Unit)(op: => A): A = {
    var fired = false
    val prev = store.onAttemptForTest
    store.onAttemptForTest = (_, _) =>
      if (!fired) { fired = true; rival }
    try op finally store.onAttemptForTest = prev
  }

  test("OPTIMIZE losing its race to a DELETE refuses typed, names the " +
    "winning version, and leaves the log + data intact") {
    val dir = freshDir()
    seed(dir)
    val e = intercept[SnapshotStore.SnapshotConcurrentModificationException] {
      interleave {
        assert(store.deleteWhere(spark, dir,
          SnapshotStore.FilePredicate.LtEq("id", 10L)) == 2L)
      } {
        store.compact(spark, dir)
      }
    }
    assert(e.getMessage.contains("version 2") &&
      e.getMessage.contains("delete"),
      s"the refusal names the winning commit: ${e.getMessage}")
    // the winner's state is intact, nothing partial landed
    assert(store.versions(spark, dir) == Seq(1L, 2L))
    assert(store.read(spark, dir).count() == 90L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/data"))
      .map(_.getPath.getName).exists(_.contains("compact")),
      "the refused OPTIMIZE's staged dir must be reclaimed")
  }

  test("DELETE losing to a DV-DELETE refuses (vectors changed); DELETE " +
    "losing to an APPEND commutes and retries against the new state") {
    val dir = freshDir()
    seed(dir)
    val e = intercept[SnapshotStore.SnapshotConcurrentModificationException] {
      interleave {
        store.deleteWhereDv(spark, dir,
          SnapshotStore.FilePredicate.EqTo("id", 50L))
      } {
        store.deleteWhere(spark, dir,
          SnapshotStore.FilePredicate.LtEq("id", 10L))
      }
    }
    assert(e.getMessage.contains("deletion vectors") ||
      e.getMessage.contains("removed files"))

    val dir2 = freshDir()
    seed(dir2)
    val v = interleave {
      assert(store.commitAppend(spark, dir2,
        Seq((101L, "new")).toDF("id", "txt"), "append") == 2L)
    } {
      store.deleteWhere(spark, dir2,
        SnapshotStore.FilePredicate.LtEq("id", 10L))
    }
    assert(v == 3L, "an append rival commutes — the delete retries")
    assert(store.read(spark, dir2).count() == 91L,
      "the retried delete sees the rival's appended row")
  }

  test("interleaved APPENDS both land — the loser re-stages (and the " +
    "streaming-shaped merge retries too)") {
    val dir = freshDir()
    seed(dir)
    val v = interleave {
      assert(store.commitAppend(spark, dir,
        Seq((200L, "rival")).toDF("id", "txt"), "append-rival") == 2L)
    } {
      store.commitAppend(spark, dir,
        Seq((201L, "mine")).toDF("id", "txt"), "append-mine")
    }
    assert(v == 3L && store.read(spark, dir).count() == 102L)
    // a merge that loses to a DV rival still retries (upsert faces are
    // the streaming sink's replay path — never a refusal)
    val v2 = interleave {
      store.deleteWhereDv(spark, dir,
        SnapshotStore.FilePredicate.EqTo("id", 5L))
    } {
      store.merge(spark, dir,
        Seq((202L, "up")).toDF("id", "txt"), Seq("id"))
    }
    assert(v2 == 5L, "the merge lands after the rival's DV delete")
    assert(store.read(spark, dir).count() == 102L) // -1 dv +1 merge
  }
}
