package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Similarity.crossModalAlignment on hand-checked vectors: aligned,
  * anti-parallel, and orthogonal text/image pairs, with IVF cells. */
class CrossModalSpec extends SparkSpec {

  import spark.implicits._

  test("cosine, cells and the aligned verdict per multimodal pair") {
    // shared embedding space: 1,2 parallel; 3 orthogonal to them; 4 = -1
    val assigned = Seq(
      (1L, Array(1.0, 0.0), 10L),
      (2L, Array(2.0, 0.0), 10L),
      (3L, Array(0.0, 5.0), 20L),
      (4L, Array(-1.0, 0.0), 30L)
    ).toDF("vec_id", "v", "cid")
    val pairs = Seq(
      (1L, 1L, 2L), // parallel: cosine 1, same cell, aligned
      (2L, 1L, 3L), // orthogonal: cosine 0, cells differ, misaligned
      (3L, 1L, 4L), // anti-parallel: cosine -1, misaligned
      (4L, 3L, 3L)  // self-pair: cosine 1
    ).toDF("pair_id", "text_id", "img_id")
    val got = Similarity.crossModalAlignment(pairs, assigned, minCosine = 0.9)
      .orderBy("pair_id")
      .select($"pair_id", $"cosine", $"text_cell", $"img_cell",
        $"same_cell", $"aligned")
      .as[(Long, Double, Long, Long, Long, Long)].collect()
    assert(got(0) == ((1L, 1.0, 10L, 10L, 1L, 1L)), got(0))
    assert(got(1) == ((2L, 0.0, 10L, 20L, 0L, 0L)), got(1))
    assert(got(2) == ((3L, -1.0, 10L, 30L, 0L, 0L)), got(2))
    assert(got(3) == ((4L, 1.0, 20L, 20L, 1L, 1L)), got(3))
  }

  test("pairs referencing a missing embedding drop (inner-join contract)") {
    val assigned = Seq((1L, Array(1.0), 1L)).toDF("vec_id", "v", "cid")
    val pairs = Seq((1L, 1L, 1L), (2L, 1L, 99L)).toDF("pair_id", "text_id", "img_id")
    val got = Similarity.crossModalAlignment(pairs, assigned, 0.9)
      .select($"pair_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }
}
