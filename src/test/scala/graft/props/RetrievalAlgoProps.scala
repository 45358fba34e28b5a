package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

/** Clean-room reference checks for the round-11 algorithm expressions:
  * the shipped implementations must agree with independently written
  * textbook forms on random inputs — the defense an oracle compare
  * cannot give (Spark and SQL could share the SAME mistake; a second
  * from-scratch implementation cannot). */
object RetrievalAlgoProps extends Properties("graft.retrievalAlgos") {

  // ---- Jaro-Winkler: straight transcription of the textbook definition
  // (Winkler 1990), written without looking at the shipped loop ----
  private def refJaroWinkler(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val used = Array.fill(b.length)(false)
    val matchesA = scala.collection.mutable.ArrayBuffer.empty[Char]
    val matchesBIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- a.indices) {
      var j = math.max(i - window, 0)
      val hi = math.min(i + window + 1, b.length)
      var hit = -1
      while (j < hi && hit < 0) {
        if (!used(j) && a(i) == b(j)) hit = j
        j += 1
      }
      if (hit >= 0) { used(hit) = true; matchesA += a(i); matchesBIdx += hit }
    }
    val m = matchesA.length
    if (m == 0) return 0.0
    val matchesB = matchesBIdx.sorted.map(b(_))
    val t = matchesA.zip(matchesB).count { case (x, y) => x != y } / 2
    val jaro = (m.toDouble / a.length + m.toDouble / b.length +
      (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      jaro + 0.1 * l * (1.0 - jaro)
    }
  }

  private def shipped(a: String, b: String): Double =
    graft.plans.JaroWinkler(Literal(a), Literal(b))
      .compute(UTF8String.fromString(a), UTF8String.fromString(b))

  private val word = Gen.choose(0, 12)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', ' ')))
    .map(_.mkString)

  property("JaroWinkler equals the textbook reference on random strings") =
    forAll(word, word) { (a, b) =>
      val (got, want) = (shipped(a, b), refJaroWinkler(a, b))
      math.abs(got - want) < 1e-12
    }

  property("JaroWinkler is symmetric and bounded") =
    forAll(word, word) { (a, b) =>
      val s = shipped(a, b)
      s == shipped(b, a) && s >= 0.0 && s <= 1.0
    }

  property("JaroWinkler equals 1 exactly on equal non-empty strings") =
    forAll(word.suchThat(_.nonEmpty)) { a => shipped(a, a) == 1.0 }

  // ---- Dirichlet QL: the factored identity used by QueryLikelihood
  // must equal the direct textbook sum Σ_t ln((tf + μ·cf/|C|)/(dl + μ)) ----
  private val docGen = Gen.choose(1, 15).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf("x", "y", "z", "w", "v")))
  private val corpusGen = Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, docGen))

  property("QL factored identity equals the direct smoothed sum") =
    forAll(corpusGen, Gen.choose(10.0, 500.0)) { (docs, mu) =>
      val query = Seq("x", "y")
      val totC = docs.map(_.length).sum.toDouble
      val cf = query.map(t => t -> docs.map(_.count(_ == t)).sum.toDouble)
        .filter(_._2 > 0).toMap
      docs.forall { doc =>
        val dl = doc.length.toDouble
        // direct form over the PRESENT query terms (cf = 0 terms drop in
        // both forms — the implementation's documented rule)
        val direct = cf.map { case (t, c) =>
          val tf = doc.count(_ == t).toDouble
          math.log((tf + mu * c / totC) / (dl + mu))
        }.sum
        val s = cf.values.map(c => math.log(mu * c / totC)).sum
        val factored = s - cf.size * math.log(dl + mu) +
          cf.map { case (t, c) =>
            val tf = doc.count(_ == t).toDouble
            if (tf > 0) math.log(1.0 + tf * totC / (mu * c)) else 0.0
          }.sum
        math.abs(direct - factored) < 1e-9
      }
    }
}
