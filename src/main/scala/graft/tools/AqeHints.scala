package graft.tools

import org.apache.spark.sql.SparkSession

/** Session-conf scope for iterative driver-coordinated loops whose
  * per-round tables are far smaller than the session's shuffle-partition
  * count (BPE merge rounds, star-contraction rounds, peel rounds): with
  * `coalescePartitions.parallelismFirst=false`, AQE sizes every exchange
  * in the loop by MEASURED bytes, so a 31-row vocabulary table runs
  * single-task stages while a 100 TB corpus still gets thousands of
  * partitions from the same code. The override is session-wide (SQLConf
  * has no per-job scope for AQE knobs) — the lock serializes overlapping
  * scopes so a concurrent set/restore cannot strand the altered value;
  * unrelated queries racing the scope see byte-sized coalescing too,
  * which is benign and documented at each call site. */
object AqeHints {

  private val lock = new Object

  def byteSizedStages[T](spark: SparkSession)(body: => T): T =
    lock.synchronized {
      val conf = spark.conf
      val key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
      val old = conf.getOption(key)
      conf.set(key, "false")
      try body
      finally old match {
        case Some(v) => conf.set(key, v)
        case None => conf.unset(key)
      }
    }
}
