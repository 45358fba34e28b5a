package graft.observability

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.LongAdder

/** Observability (SURVEY.md §2.11).
  *
  * O1 — leveled logging: the reference colors messages by severity
  * ("grey"=Critical, "red"=Error, "orange"=Warning —
  * /root/reference/LoggerHelper/LoggerHelper.cs:12-28). Here severity maps
  * to slf4j levels; the color word is preserved as a structured prefix so
  * downstream log scrapers keyed on the reference's convention keep working.
  *
  * Engine metrics — a SparkListener aggregating task/stage counters per run
  * (records read, shuffle bytes, spill), the cluster-side analogue of the
  * reference's per-batch count logging (HttpPostAction.cs:44).
  */
object Observability {

  object Level extends Enumeration {
    val Critical, Error, Warning, Info = Value
  }

  private val log = org.slf4j.LoggerFactory.getLogger("graft")

  /** O1 — reference color convention preserved as structured prefix. */
  def logLeveled(level: Level.Value, message: String): String = {
    val line = level match {
      case Level.Critical => s"[grey] $message"
      case Level.Error    => s"[red] $message"
      case Level.Warning  => s"[orange] $message"
      case Level.Info     => message
    }
    level match {
      case Level.Critical | Level.Error => log.error(line)
      case Level.Warning                => log.warn(line)
      case Level.Info                   => log.info(line)
    }
    line
  }

  /** Aggregated engine counters since `attach` (thread-safe; executor
    * metrics arrive on the listener bus). */
  final class MetricsListener extends SparkListener {
    val recordsRead = new LongAdder
    val shuffleBytesWritten = new LongAdder
    val memoryBytesSpilled = new LongAdder
    val diskBytesSpilled = new LongAdder
    val executorCpuTime = new LongAdder
    val tasksCompleted = new LongAdder
    val stagesCompleted = new LongAdder

    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        recordsRead.add(m.inputMetrics.recordsRead)
        shuffleBytesWritten.add(m.shuffleWriteMetrics.bytesWritten)
        memoryBytesSpilled.add(m.memoryBytesSpilled)
        diskBytesSpilled.add(m.diskBytesSpilled)
        // CPU nanoseconds actually burned by executor threads — unlike wall
        // time this is immune to machine load, so cross-run comparisons of
        // the same plan stay meaningful on a noisy host
        executorCpuTime.add(m.executorCpuTime)
      }
      tasksCompleted.increment()
    }

    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stagesCompleted.increment()

    def snapshot: Map[String, Long] = Map(
      "recordsRead" -> recordsRead.sum(),
      "shuffleBytesWritten" -> shuffleBytesWritten.sum(),
      "memoryBytesSpilled" -> memoryBytesSpilled.sum(),
      "diskBytesSpilled" -> diskBytesSpilled.sum(),
      "executorCpuTime" -> executorCpuTime.sum(),
      "tasksCompleted" -> tasksCompleted.sum(),
      "stagesCompleted" -> stagesCompleted.sum())
  }

  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.sparkContext.addSparkListener(l)
    l
  }

  def detach(spark: SparkSession, l: MetricsListener): Unit =
    spark.sparkContext.removeSparkListener(l)
}
