package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware join: salt the skewed (fact) side, replicate the build (dim)
  * side across the salt domain, join on (key, salt).
  *
  * AQE's skew-join split handles sort-merge skew automatically, but only at
  * shuffle boundaries it can observe; salting is the explicit tool when one
  * hot key dominates (the classic null-key / celebrity-key problem at
  * 100 TB). `salts` multiplies the build side, so keep it ≲ 64 and use only
  * when a key's row share is large enough to stall a task.
  *
  * Equivalent to a plain inner equi-join on `key` — verified by property
  * test — but the hot key's rows spread over `salts` tasks instead of one.
  */
object SkewJoin {

  def saltedInnerJoin(skewed: DataFrame, build: DataFrame, key: String,
                      salts: Int): DataFrame = {
    require(salts > 0)
    // Salt from the ROW CONTENT, not monotonically_increasing_id(): the
    // result is identical either way (the build side is fully replicated
    // across the salt domain), but a content hash makes task PLACEMENT a
    // pure function of the data — reproducible across runs and stable
    // under task retries. Caveat: rows that are bit-identical across every
    // column share a salt; hot keys in practice differ in their payload
    // columns (that is what makes them rows, not one row).
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(salts)).cast("int"))
    val replicated = build
      .withColumn("__salt_arr", sequence(lit(0), lit(salts - 1)))
      .withColumn("__salt", explode(col("__salt_arr")))
      .drop("__salt_arr")
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Skew report for a join key — the profiler an operator (or a human)
    * reads BEFORE picking [[saltedInnerJoin]]'s salt count: the `topK`
    * heaviest keys with their share of the table, the skew ratio vs the
    * mean key, and the salt count that would spread that key to
    * mean-sized tasks (`ceil(cnt / mean)`, floored at 1). One map-side-
    * combined count + a TakeOrdered head + one broadcast scalar frame —
    * never a full sort. */
  def skewReport(df: DataFrame, key: String, topK: Int): DataFrame = {
    require(topK >= 1)
    val counts = df.groupBy(col(key).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total"))
    counts.orderBy(col("cnt").desc, col("key").asc).limit(topK)
      .crossJoin(broadcast(stats))
      .select(col("key"), col("cnt"),
        round(col("cnt").cast("double") * col("n_keys") / col("total"), 6)
          .as("skew_ratio"),
        greatest(lit(1L),
          ceil(col("cnt").cast("double") * col("n_keys") / col("total"))
            .cast("long")).as("rec_salts"))
      .orderBy(col("cnt").desc, col("key").asc)
  }
}
