package graft.props

import graft.TestSpark
import graft.functions.Bm25
import graft.operators.WeightedSample
import graft.similarity.ProductQuantization
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Invariants of the retrieval/sampling operators against independent
  * in-JVM reference implementations (few cases — every case is a Spark
  * job). Integer-valued vector/weight generators keep double arithmetic
  * exact, so the comparisons are equality, not tolerance. */
object RetrievalProps extends Properties("graft.retrieval") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark

  // ---- PQ: encode equals the brute-force argmin ----

  private val vecsGen: Gen[List[(Long, List[Float])]] = for {
    n <- Gen.choose(3, 10)
    vs <- Gen.sequence[List[List[Float]], List[Float]](
      List.fill(n)(Gen.listOfN(4, Gen.choose(-4, 4).map(_.toFloat))))
  } yield vs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v) }

  property("PQ encode equals brute-force per-subspace argmin") =
    forAll(vecsGen, Gen.choose(1, 3)) { (rows, nCw) =>
      import spark.implicits._
      val k = math.min(nCw, rows.length)
      val cwIds = rows.take(k).map(_._1)
      val got = ProductQuantization.encode(rows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", col("vec_id").isin(cwIds: _*),
          nSubspaces = 2, subDim = 2)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      val cb = cwIds.sorted.zipWithIndex
        .map { case (id, i) => ((i + 1).toLong, rows.find(_._1 == id).get._2.map(_.toDouble)) }
      val ok = rows.forall { case (id, v) =>
        (0 until 2).forall { m =>
          val want = cb.map { case (cid, c) =>
            val d2 = (m * 2 until (m + 1) * 2)
              .map(i => (v(i) - c(i)) * (v(i) - c(i))).sum
            (cid, d2)
          }.minBy { case (cid, d2) => (d2, cid) }._1
          got((id, m.toLong)) == want
        }
      }
      ok
    }

  // ---- BM25: scores match the formula on random corpora ----

  private val bmVocab = Seq("aa", "bb", "cc", "dd")
  private val bmDocsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 10)
    ds <- Gen.sequence[List[String], String](List.fill(n)(
      Gen.nonEmptyListOf(Gen.oneOf(bmVocab)).map(_.take(8).mkString(" "))))
  } yield ds.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }

  property("BM25 matches the Okapi formula computed independently") =
    forAll(bmDocsGen, Gen.someOf(bmVocab)) { (docs, termsRaw) =>
      val terms = termsRaw.toSeq
      import spark.implicits._
      terms.isEmpty || {
        val got = Bm25.topDocs(docs.toDF("doc_id", "text"), "doc_id", "text",
            terms, topK = docs.length + 1)
          .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
        val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
        val n = docs.length.toDouble
        val avgdl = docs.map(d => toks(d._1).length).sum / n
        val df = terms.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
        val want = docs.flatMap { case (id, _) =>
          val ws = terms.filter(t => toks(id).contains(t)).map { t =>
            val tf = toks(id).count(_ == t).toDouble
            val idf = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5))
            idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * toks(id).length / avgdl))
          }
          if (ws.isEmpty) None else Some(id -> ws.sum)
        }.toMap
        got.keySet == want.keySet && got.forall { case (id, s) =>
          math.abs(s - want(id)) < 1e-6
        }
      }
    }

  // ---- in-row IVF cell assignment: equals the independent rounded-cosine
  //      argmax (cs desc, cell asc) the window form implemented ----

  // Zero-norm vectors/centroids are a required case, not an exclusion: the
  // cosine is NaN there, and TopCells must pass it through (sorting last,
  // tie-broken by cid) rather than crash in BigDecimal rounding. Half the
  // cases force one all-zero row (which lands as a centroid when its index
  // falls inside the centroid prefix).
  private val vecsMaybeZeroGen: Gen[List[(Long, List[Float])]] =
    Gen.oneOf(
      vecsGen,
      for {
        rows <- vecsGen
        zi <- Gen.choose(0, rows.length - 1)
      } yield rows.updated(zi, (rows(zi)._1, List.fill(4)(0f))))

  property("in-row cell assignment equals the reference rounded-cosine argmax") =
    forAll(vecsMaybeZeroGen, Gen.choose(1, 4)) { (rows, nCentRaw) =>
      import spark.implicits._
      val nCent = math.min(nCentRaw, rows.length)
      val centIds = rows.take(nCent).map(_._1)
      val df = rows.toDF("vec_id", "embedding")
      val cells = graft.similarity.CellAssignment.collect(
        df, "vec_id", "embedding", col("vec_id").isin(centIds: _*))
      val toDouble = transform(col("embedding"), x => x.cast("double"))
      val got = df
        .select(col("vec_id"),
          graft.similarity.CellAssignment.assignedCell(cells, toDouble)
            .getField("cid").as("cell_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // NaN passes through r6 like Spark's round; minBy under
      // TotalOrdering puts -NaN (= NaN) after every finite score with a
      // cid tie-break, mirroring the struct ordering in the window form
      def r6(x: Double) =
        if (x.isNaN || x.isInfinite) x
        else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      def nrm(v: Seq[Float]) = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      val cents = centIds.sorted.map(id => id -> rows.find(_._1 == id).get._2)
      rows.forall { case (id, v) =>
        val want = cents.map { case (cid, c) =>
          val dp = v.zip(c).map { case (a, b) => a.toDouble * b.toDouble }.sum
          (cid, r6(dp / (nrm(v) * nrm(c))))
        }.minBy { case (cid, cs) => (-cs, cid) }(
          Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))._1
        got(id) == want
      }
    }

  // ---- priority sampling: kept set is the top-n by priority; estimator
  //      weights are max(w, τ) with τ the (n+1)-th priority ----

  private def h56(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"prio|$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(14), 16)
  }

  property("priority sample equals the independent DLT reference") =
    forAll(Gen.choose(1, 25), Gen.choose(1, 12),
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 500L), Gen.choose(1, 30)))) {
      (nRaw, _, rowsRaw) =>
        import spark.implicits._
        val rows = rowsRaw.distinctBy(_._1).map { case (id, w) => (id, w.toDouble) }
        val n = nRaw
        def r6(x: Double) = math.rint(x * 1e6) / 1e6
        def prio(id: Long, w: Double) =
          r6(w / ((h56(id) % 1000000L + 1L).toDouble / 1000000.0))
        val ranked = rows.map { case (id, w) => (id, w, prio(id, w)) }
          .sortBy { case (id, _, p) => (-p, id) }
        val tau = if (ranked.length >= n + 1) ranked(n)._3 else 0.0
        val got = WeightedSample.prioritySample(
            rows.toDF("doc_id", "w"), "doc_id", col("w"), n)
          .collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
          .sortBy(_._1).toList
        val want = ranked.take(n)
          .map { case (id, w, p) => (id, w, p, r6(math.max(w, tau))) }
          .sortBy(_._1)
        got == want
    }
}
