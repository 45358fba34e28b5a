package graft.props

import graft.operators.{AllowlistProjection, RetryPolicy}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants over the pure operator logic (SURVEY.md §5.2.3).
  * Pure functions only — the Spark-level invariants live in SparkProps. */
object PureProps extends Properties("graft.pure") {

  private val colName = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)
  private val messyList = Gen.listOf(Gen.oneOf(colName, Gen.const(""), Gen.const("  ")))
    .map(_.mkString(","))

  property("parseAllowlist: no empties, all trimmed, order preserved") =
    forAll(messyList) { cfg =>
      val parsed = AllowlistProjection.parseAllowlist(cfg)
      parsed.forall(c => c.nonEmpty && c == c.trim) &&
        parsed == cfg.split(",", -1).map(_.trim).filter(_.nonEmpty).toSeq
    }

  property("unionAllowlists: case-insensitive set union, None iff both blank") =
    forAll(Gen.option(messyList), Gen.option(messyList)) { (a, b) =>
      val u = AllowlistProjection.unionAllowlists(a, b)
      // the guard is IsNullOrWhiteSpace on the WHOLE string ("," is present
      // but parses to an empty allowlist -> Some(Seq()), drop-everything)
      val expectedEmpty = a.forall(_.trim.isEmpty) && b.forall(_.trim.isEmpty)
      if (expectedEmpty) u.isEmpty
      else {
        val cols = u.get.map(_.toLowerCase)
        cols.distinct == cols && // no case-insensitive dups
          (AllowlistProjection.parseAllowlist(a.getOrElse("")) ++
            AllowlistProjection.parseAllowlist(b.getOrElse("")))
            .forall(c => cols.contains(c.toLowerCase))
      }
    }

  private val scoredItems =
    Gen.listOf(Gen.zip(Gen.chooseNum(-5.0, 5.0), Gen.chooseNum(0L, 50L)))

  property("TopKAgg: any reduce/merge split equals sort-take of the whole input") =
    forAll(scoredItems, Gen.chooseNum(1, 8), Gen.chooseNum(0, 100)) { (items, k, cut) =>
      val agg = new graft.operators.GroupedTopK.TopKAgg(k)
      val want = items.sortBy { case (s, id) => (-s, id) }.take(k)
      val sequential = items.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = items.splitAt(cut % (items.length + 1))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      sequential == want && merged == want
    }

  property("BloomDedup.sizeBits: power of two, >= 10 bits/key up to the cap") =
    forAll(Gen.chooseNum(0L, 1L << 40)) { n =>
      val bits = graft.dedup.BloomDedup.sizeBits(n)
      val pow2 = (bits & (bits - 1)) == 0
      pow2 && bits >= (1 << 16) &&
        (bits >= 10L * n || bits == graft.dedup.BloomDedup.MaxAutoBits)
    }
    forAll { (s: String) =>
      val n = AllowlistProjection.normalizeTableName(s)
      AllowlistProjection.normalizeTableName(n) == n &&
        !n.contains('[') && !n.contains(']')
    }

  property("linear backoff: monotone non-decreasing, capped, starts at first") =
    forAll(Gen.choose(1, 60), Gen.choose(1, 60), Gen.choose(0, 100)) { (first, extra, n) =>
      val max = first + extra
      val seq = (0 to n).map(RetryPolicy.linearBackoff(_, first, max))
      seq.head == first &&
        seq.zip(seq.tail).forall { case (a, b) => a <= b } &&
        seq.forall(v => v >= first && v <= max)
    }

  property("geometric backoff: monotone, capped, first value exact") =
    forAll(Gen.choose(1.0, 60.0), Gen.choose(1.001, 2.0), Gen.choose(0, 200)) { (first, coef, n) =>
      val max = first * 64
      val seq = (0 to n).map(RetryPolicy.geometricBackoff(_, first, coef, max))
      seq.head == first &&
        seq.zip(seq.tail).forall { case (a, b) => a <= b } &&
        seq.forall(v => v >= first && v <= max)
    }

  property("retryable status classification total and consistent") =
    forAll(Gen.choose(100, 599)) { status =>
      RetryPolicy.isRetryableStatus(status) ==
        (status == 429 || status == 408 || status >= 500)
    }
}
