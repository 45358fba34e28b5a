package graft.props

import graft.TestSpark
import graft.functions.{CorpusFilters, TextAnalysis}
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Output-only invariants of the corpus-curation operators (each case is a
  * Spark job — few cases, strong predicates). */
object CorpusProps extends Properties("graft.corpus") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = TestSpark.spark

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "x1", "y2")
  private val docsGen: Gen[List[(Long, String)]] = Gen.zip(
    Gen.choose(1, 12),
    Gen.choose(1L, 1000L)).flatMap { case (n, seed) =>
    Gen.sequence[List[(Long, String)], (Long, String)]((1 to n).toList.map { i =>
      Gen.nonEmptyListOf(Gen.oneOf(vocab)).map(ws => (seed + i, ws.take(9).mkString(" ")))
    })
  }

  property("passageDedup: counts reconcile and kept passages are globally distinct") =
    forAll(docsGen, Gen.choose(1, 4)) { (docsRaw, w) =>
      import spark.implicits._
      val docs = docsRaw.distinctBy(_._1).toDF("doc_id", "text")
      val out = graft.dedup.Dedup.passageDedup(docs, "doc_id", "text", w)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // reference: chunk every doc, first (doc_id, pos) occurrence survives
      val passages = docsRaw.distinctBy(_._1).sortBy(_._1).flatMap { case (id, t) =>
        t.trim.split(" ", -1).grouped(w).zipWithIndex
          .map { case (c, i) => (id, i, c.mkString(" ")) }
      }
      val survivors = passages.groupBy(_._3).values.map(_.minBy(p => (p._1, p._2))).toSet
      out.forall { case (id, kept, nPass, nDrop) =>
        val mine = passages.filter(_._1 == id)
        val keptMine = mine.filter(survivors.contains).sortBy(_._2)
        nPass == mine.length && nDrop == (mine.length - keptMine.length) &&
          kept == keptMine.map(_._3).mkString(" ")
      } && out.map(_._3).sum == passages.length
    }

  property("passageDedup viral guard: salted hot path preserves results on ANY corpus") =
    forAll(docsGen, Gen.choose(1, 3)) { (docsRaw, w) =>
      import spark.implicits._
      val docs = docsRaw.distinctBy(_._1).toDF("doc_id", "text")
      def run(maxFreq: Long) =
        graft.dedup.Dedup.passageDedup(docs, "doc_id", "text", w,
            maxPassageFreq = maxFreq, salts = 3)
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
          .sortBy(_._1).toSeq
      // maxPassageFreq=1 routes EVERY repeated passage through the salted
      // join; the guard may only move work between tasks, never change rows
      run(1L) == run(Long.MaxValue >> 1)
    }

  property("ngramJaccard maxDf equals the capped brute-force reference") =
    forAll(docsGen, Gen.choose(1L, 5L)) { (docsRaw, cap) =>
      import spark.implicits._
      val docs = docsRaw.distinctBy(_._1)
      val got = graft.dedup.Dedup.ngramJaccard(docs.toDF("doc_id", "text"),
          "doc_id", "text", shingleWidth = 3, minJaccard = 0.0, maxDf = cap)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      // reference: per-doc distinct 3-shingles (floor at one truncated
      // shingle), drop shingles in more than `cap` docs, exact Jaccard
      def shingleSet(t: String): Set[String] = {
        val toks = t.trim.split(" ", -1).toSeq
        if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
        else Set(toks.mkString(" "))
      }
      val sets = docs.map { case (id, t) => id -> shingleSet(t) }
      val df = sets.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
      val kept = sets.map { case (id, s) => id -> s.filter(df(_) <= cap) }
      val want = (for {
        (a, sa) <- kept; (b, sb) <- kept if a < b
        inter = (sa & sb).size if inter > 0
      } yield (a, b, BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
      got == want
    }

  property("boilerplateRemove equals the df-threshold reference on random corpora") =
    forAll(docsGen, Gen.choose(1, 4), Gen.choose(2L, 4L)) { (docsRaw, w, minDf) =>
      import spark.implicits._
      val docsU = docsRaw.distinctBy(_._1)
      val out = graft.dedup.Dedup.boilerplateRemove(
          docsU.toDF("doc_id", "text"), "doc_id", "text", w, minDf)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // reference: chunk every doc, count DISTINCT docs per segment text,
      // every instance of a segment with df >= minDf drops
      val segments = docsU.flatMap { case (id, t) =>
        t.trim.split(" ", -1).grouped(w).zipWithIndex
          .map { case (c, i) => (id, i, c.mkString(" ")) }
      }
      val df = segments.groupBy(_._3).view
        .mapValues(_.map(_._1).distinct.size.toLong).toMap
      out.forall { case (id, kept, nSeg, nBoiler) =>
        val mine = segments.filter(_._1 == id).sortBy(_._2)
        val keptMine = mine.filter(s => df(s._3) < minDf)
        nSeg == mine.length && nBoiler == (mine.length - keptMine.length) &&
          kept == keptMine.map(_._3).mkString(" ")
      } && out.map(_._3).sum == segments.length
    }

  property("minhashIncrement: index ∪ increment equals the full batch on ANY split") =
    forAll(docsGen, Gen.choose(0L, 3L)) { (docsRaw, splitMod) =>
      import spark.implicits._
      val docsU = docsRaw.distinctBy(_._1)
      val (oldRaw, batchRaw) = docsU.partition(d => d._1 % 4 != splitMod)
      val oldDocs = oldRaw.toDF("doc_id", "text")
      val batch = batchRaw.toDF("doc_id", "text")
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_a", "doc_b", "est_jaccard")
          .as[(Long, Long, Double)].collect().toSet
      val full = pairSet(graft.dedup.Dedup.minhashCandidates(
        docsU.toDF("doc_id", "text"), "doc_id", "text", k = 8, shingleWidth = 2))
      val oldPairs = pairSet(graft.dedup.Dedup.minhashCandidates(
        oldDocs, "doc_id", "text", k = 8, shingleWidth = 2))
      val sigs = graft.dedup.Dedup.minhashSignatures(oldDocs, "doc_id", "text", 8, 2)
      val bands = graft.dedup.Dedup.lshBands(sigs, 8, 2)
      val inc = pairSet(graft.dedup.Dedup.minhashIncrement(
        batch, "doc_id", "text", Some(sigs), Some(bands),
        k = 8, shingleWidth = 2).newPairs)
      (oldPairs & inc).isEmpty && (oldPairs ++ inc) == full
    }

  property("connectedComponents equals union-find on random graphs") =
    forAll(
      Gen.listOf(Gen.zip(Gen.choose(1L, 15L), Gen.choose(1L, 15L))),
      Gen.choose(1L, 1000L)) { (rawEdges, _) =>
      import spark.implicits._
      val nodes = (1L to 15L).toList
      val docs = nodes.map(n => (n, s"doc $n")).toDF("doc_id", "text")
      val pairs = rawEdges.filter(e => e._1 != e._2)
      val pairsDf = (if (pairs.isEmpty) List((1L, 1L)) else pairs) // self-pair = no edge after canon
        .toDF("doc_a", "doc_b")
      val got = graft.dedup.Dedup.connectedComponents(pairsDf, docs, "doc_id")
        .as[(Long, Long)].collect().toMap
      // reference: plain union-find
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = nodes.map { n =>
        n -> nodes.filter(m => find(m) == find(n)).min
      }.toMap
      got == want
    }

  property("incremental CC equals batch CC on replayed increments") =
    forAll(
      Gen.listOf(Gen.zip(Gen.choose(1L, 15L), Gen.choose(1L, 15L))),
      Gen.choose(0, 100)) { (rawEdges, splitPct) =>
      import spark.implicits._
      val nodes = (1L to 15L).toList
      val docs = nodes.map(n => (n, s"doc $n")).toDF("doc_id", "text")
      val pairs = rawEdges.filter(e => e._1 != e._2)
      // replay: label the first slice, then fold the rest in incrementally
      val cut = pairs.length * splitPct / 100
      val (first, second) = pairs.splitAt(cut)
      def pairsDf(es: List[(Long, Long)]) =
        (if (es.isEmpty) List((1L, 1L)) else es).toDF("doc_a", "doc_b")
      val labels = graft.dedup.Dedup.connectedComponents(
        pairsDf(first), docs, "doc_id")
      val inc = graft.dedup.Dedup.connectedComponentsIncremental(
          labels, pairsDf(second))
        .as[(Long, Long)].collect().toMap
      val batch = graft.dedup.Dedup.connectedComponents(
          pairsDf(pairs), docs, "doc_id")
        .as[(Long, Long)].collect().toMap
      inc == batch
    }

  property("packSequences: partitions the corpus; packs never overrun by more than the last doc") =
    forAll(docsGen, Gen.choose(2L, 12L)) { (docsRaw, budgetRaw) =>
      import spark.implicits._
      // shrinking ignores generator invariants: re-impose unique ids and a
      // positive budget so counterexamples stay in the operator's domain
      val docs = docsRaw.distinctBy(_._1)
      val budget = math.max(budgetRaw, 1L)
      val out = CorpusFilters.packSequences(
          docs.toDF("doc_id", "text"), "doc_id", "text", budget, nShards = 3)
        .as[(Long, Long, Long, Long)].collect().toSeq
      val allDocsOnce = out.map(_._1).sorted == docs.map(_._1).sorted
      // within each (shard, pack): tokens BEFORE the last doc stay under
      // budget (the streaming first-fit bound — only the final doc overruns)
      val bounded = out.groupBy(r => (r._2, r._3)).forall { case (_, rows) =>
        val inOrder = rows.sortBy(_._1)
        inOrder.init.map(_._4).sum < budget
      }
      // pack ids start at 0 per shard and never decrease in doc_id order
      // (an over-budget doc legitimately SKIPS indices — floor(cum/budget)
      // jumps — so contiguity is NOT an invariant)
      val monotone = out.groupBy(_._2).forall { case (_, rows) =>
        val packs = rows.sortBy(_._1).map(_._3)
        packs.head == 0L && packs.zip(packs.tail).forall { case (a, b) => b >= a }
      }
      allDocsOnce && bounded && monotone
    }

  property("repetitionSignals: one row per doc, fractions in (0,1], keep consistent") =
    forAll(docsGen) { docs =>
      import spark.implicits._
      val out = CorpusFilters.repetitionSignals(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .as[(Long, Double, Double, Boolean)].collect().toSeq
      out.map(_._1).sorted == docs.map(_._1).sorted &&
        out.forall { case (_, ttf, tbf, keep) =>
          ttf > 0 && ttf <= 1 && tbf > 0 && tbf <= 1 &&
            keep == (ttf <= 0.20 && tbf <= 0.18)
        }
    }

  property("redactPii is a fixpoint: redacted text contains zero further matches") =
    forAll(Gen.listOfN(3, Gen.oneOf(
      "reach me at a.b@test.org thanks",
      "ssn 987-65-4320 and phone 555-867-5309",
      "+441 2345 6789 call now",
      "plain text, no pii"))) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      df.select(
          TextAnalysis.piiCount(TextAnalysis.redactPii(col("text"))).as("n"))
        .as[Long].collect().forall(_ == 0L)
    }

  property("decontaminate against itself flags every doc with its own shingle count") =
    forAll(docsGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val out = CorpusFilters.decontaminate(df, df, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      docs.forall { case (id, _) => out.getOrElse(id, 0L) >= 1L }
    }

  property("winnowing guarantee: a duplicated doc pair ALWAYS shares a fingerprint") =
    forAll(docsGen, Gen.choose(1, 4), Gen.choose(2, 5)) { (docsRaw, w, v) =>
      import spark.implicits._
      // clone every doc under a shifted id: each (original, clone) pair is
      // a full-length duplicate, far past the window+w-1 guarantee span
      val docs = docsRaw.distinctBy(_._1)
      val withClones = (docs ++ docs.map { case (id, t) => (id + 100000L, t) })
        .toDF("doc_id", "text")
      val fps = graft.dedup.Winnowing
        .fingerprints(withClones, "doc_id", "text", w, v)
        .as[(Long, Int, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
      docs.forall { case (id, _) =>
        (fps(id) intersect fps(id + 100000L)).nonEmpty
      }
    }

  property("exactSpanDedup: token counts reconcile and clean docs contain only kept tokens") =
    forAll(docsGen, Gen.choose(1, 4)) { (docsRaw, l) =>
      import spark.implicits._
      val docs = docsRaw.distinctBy(_._1)
      val out = graft.dedup.Dedup
        .exactSpanDedup(docs.toDF("doc_id", "text"), "doc_id", "text", l)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      // reference: first (doc,pos) occurrence of each full-width gram
      // keeps; every other occurrence cuts its window
      val tokd = docs.sortBy(_._1).map { case (id, t) => id -> t.trim.split(" ", -1).toSeq }
      val firsts = scala.collection.mutable.Map.empty[Seq[String], (Long, Int)]
      for ((id, t) <- tokd; i <- 0 to t.length - l)
        firsts.getOrElseUpdate(t.slice(i, i + l), (id, i))
      val wantClean = tokd.map { case (id, t) =>
        val cut = (0 to t.length - l)
          .filter(i => firsts(t.slice(i, i + l)) != ((id, i)))
          .flatMap(i => i until i + l).toSet
        id -> t.indices.filterNot(cut).map(t).mkString(" ")
      }.toMap
      out.forall { case (id, n, removed, clean) =>
        val t = tokd.find(_._1 == id).get._2
        n == t.length && clean == wantClean(id) &&
          removed == (t.length - (if (clean.isEmpty) 0 else clean.split(" ", -1).length))
      }
    }
}
