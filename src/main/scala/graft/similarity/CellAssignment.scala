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

  /** The ranked top-`n` cells as a native [[graft.plans.TopCells]] call —
    * one codegen'd expression holding the whole cell matrix as a reference
    * object (the NearestCentroid pattern), so K can be production-sized
    * (thousands of cells) without a K-term expression tree bloating
    * codegen. `vDouble` must be the double-cast embedding; the norm is
    * computed inside (sqrt of the ascending-index |v|² sum, the vec_dot
    * convention). */
  def topCells(cells: Cells, vDouble: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.TopCells(
        org.apache.spark.sql.graft.ColumnBridge.expression(vDouble), n,
        cells.ids.toArray, cells.mat.toArray, cells.norms.toArray))

  /** The argmax cell (cs desc, cell asc): struct(cid, idx). */
  def assignedCell(cells: Cells, vDouble: Column): Column =
    element_at(topCells(cells, vDouble, 1), 1)

  /** The top-`nProbe` cells as an exploded struct column (fields cid/idx),
    * for the bounded query slice. */
  def probeCells(cells: Cells, vDouble: Column, nProbe: Int): Column =
    explode(topCells(cells, vDouble, nProbe))
}
