package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class PurgeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("purge drops old Completed by completed cutoff, old Failed-family by failed cutoff") {
    import spark.implicits._
    val hist = Seq(
      ("i1", ts("2026-01-01 00:00:00"), "Completed"),   // old completed -> purged
      ("i2", ts("2026-02-01 00:00:00"), "Completed"),   // recent completed -> kept
      ("i3", ts("2025-12-01 00:00:00"), "Failed"),      // old failed -> purged
      ("i4", ts("2026-01-10 00:00:00"), "Failed"),      // newer than failed cutoff -> kept
      ("i5", ts("2025-01-01 00:00:00"), "Running"),     // never purged
      ("i6", ts("2025-12-31 00:00:00"), "Terminated"),  // old terminated -> purged
      ("i7", ts("2025-12-31 00:00:00"), "Suspended")    // old suspended -> purged
    ).toDF("id", "created", "status")
    // intended semantics (reference bug fixed): separate cutoffs per family
    val kept = Purge.purge(hist, "created", "status",
      completedCutoff = ts("2026-01-15 00:00:00"),
      failedCutoff = ts("2026-01-05 00:00:00"))
      .select("id").as[String].collect().toSet
    assert(kept == Set("i2", "i4", "i5"))
  }
}
