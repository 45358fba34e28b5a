package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join ≡ plain join on skewed data") {
    import spark.implicits._
    // hot key 1 dominates
    val fact = ((1 to 500).map(i => (1L, s"row$i")) ++
      (1 to 50).map(i => (2L, s"other$i"))).toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "unused")).toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).groupBy("k", "label").count()
      .as[(Long, String, Long)].collect().toSet
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "k", salts = 8)
      .groupBy("k", "label").count()
      .as[(Long, String, Long)].collect().toSet
    assert(salted == plain)
    assert(salted == Set((1L, "hot", 500L), (2L, "cold", 50L)))
  }

  test("salt actually spreads the hot key across partitions") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
    val nSalts = salted.select(countDistinct(col("__salt"))).as[Long].head()
    assert(nSalts > 4, s"hot key only landed on $nSalts salts")
  }
}
