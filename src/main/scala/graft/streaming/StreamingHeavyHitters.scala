package graft.streaming

import graft.operators.CountMinSketch
import org.apache.spark.sql.{DataFrame, Dataset}

/** Running count-min sketch over an unbounded token stream — the streaming
  * form of [[graft.operators.CountMinSketch]]: the flat depth×width counter
  * array IS the aggregation state, FIXED in size for the stream's lifetime
  * (32 KB at the batch defaults) no matter how many distinct tokens flow
  * through. Exact streaming token counts would grow state with the
  * vocabulary; the sketch trades that for the usual one-sided
  * collision-bounded estimate.
  *
  * Plan shape: the typed Aggregator partially aggregates map-side within
  * every micro-batch (the shuffle carries one array per partition), then
  * merges into the state store's single running buffer. Emit in Complete
  * (or Update) output mode; each trigger produces the current sketch row,
  * probed downstream with [[CountMinSketch.estimate]].
  */
object StreamingHeavyHitters {

  /** One running-sketch column (`cms: array<bigint>`) over a token stream. */
  def sketchStream(tokens: Dataset[String], depth: Int = 4,
                   width: Int = 256): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val (b1, b2) = CountMinSketch.hashPair(org.apache.spark.sql.functions.col("token"))
    tokens.toDF("token")
      .select(b1.as("b1"), b2.as("b2")).as[(Long, Long)]
      .select(new CountMinSketch.CmsAgg(depth, width).toColumn)
      .toDF("cms")
  }
}
