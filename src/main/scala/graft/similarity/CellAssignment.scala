package graft.similarity

import graft.plans.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-row coarse-cell scoring against a driver-collected centroid matrix —
  * the zero-exchange replacement for the crossJoin(broadcast(centroids)) +
  * per-vector window the IVF operators first shipped with.
  *
  * Why: the crossJoin form materializes n×K score rows (each dragging the
  * embedding array along for downstream rescoring) and then shuffles them
  * on the vector id just to pick rn = 1 — at 100 TB that is an exchange of
  * corpus×K rows for a per-row argmax. With the centroid matrix as a
  * bounded driver artifact (the same contract as the k-means centroid
  * collect and the PQ codebook), the argmax is K codegen'd `vec_dot` terms
  * and one `array_min` INSIDE the scan: no exchange, no row
  * multiplication, and the corpus is read once.
  *
  * Convention (identical to the window form it replaces, and to every IVF
  * oracle): score = cosine rounded to 6 dp, ties broken by ascending cell
  * id. Encoded as `struct(-cs, cell_id, idx)` so `array_min` IS the
  * (cs desc, cell asc) argmax and `slice(array_sort(...), 1, n)` IS the
  * top-n probe list; `idx` is the 1-based position in [[Cells.matLit]]
  * for `element_at` lookups (residual arithmetic). */
private[graft] object CellAssignment {

  /** The bounded centroid artifact: ids ascending, vectors as doubles,
    * norms accumulated in ascending index order (oracle parity). */
  final case class Cells(ids: Seq[Long], mat: Seq[Array[Double]],
                         norms: Seq[Double]) {
    def matLit: Column = typedLit(mat.map(_.toSeq))
  }

  def collect(vecs: DataFrame, idCol: String, embCol: String,
              isCentroid: Column): Cells = {
    val toDouble = transform(col(embCol), x => x.cast("double"))
    val rows = vecs.filter(isCentroid)
      .select(col(idCol).cast("long"), toDouble)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    require(rows.nonEmpty, "isCentroid selected no cells")
    val norms = rows.map { case (_, a) =>
      var s = 0.0; var j = 0
      while (j < a.length) { s += a(j) * a(j); j += 1 }
      math.sqrt(s)
    }
    Cells(rows.map(_._1), rows.map(_._2), norms)
  }

  /** `array(struct(negcs, cid, idx))` of every cell's score for the row's
    * vector. `vDouble` must be the double-cast embedding; `vNorm` its L2
    * norm (computed once per row by the caller). */
  def scoreArr(cells: Cells, vDouble: Column, vNorm: Column): Column = array(
    cells.ids.indices.map { i =>
      struct(
        (-round(VectorExpressions.vecDot(vDouble, typedLit(cells.mat(i).toSeq)) /
          (vNorm * lit(cells.norms(i))), 6)).as("negcs"),
        lit(cells.ids(i)).as("cid"),
        lit(i + 1).as("idx"))
    }: _*)

  /** The argmax cell id (cs desc, cell asc). */
  def assignedCell(cells: Cells, vDouble: Column, vNorm: Column): Column =
    array_min(scoreArr(cells, vDouble, vNorm)).getField("cid")

  /** The top-`nProbe` cells as an exploded struct column (fields
    * negcs/cid/idx), for the bounded query slice. */
  def probeCells(cells: Cells, vDouble: Column, vNorm: Column,
                 nProbe: Int): Column =
    explode(slice(array_sort(scoreArr(cells, vDouble, vNorm)), 1, nProbe))
}
