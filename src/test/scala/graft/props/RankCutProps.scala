package graft.props

import graft.streaming.StreamingWindowPercentiles
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Properties of the rank-cut (percentile_disc) convention shared by
  * Winsorize / RobustStats / window percentiles / the streaming
  * histogram probe: smallest value whose cumulative count reaches
  * ceil(p·n). Pure-function checks against the sorted-list definition. */
object RankCutProps extends Properties("graft.rankcut") {

  private val values = Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))
  private val frac = for {
    den <- Gen.chooseNum(1L, 100L)
    num <- Gen.chooseNum(1L, den)
  } yield (num, den)

  private def hist(vs: List[Long]): Map[Long, Long] =
    vs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  property("percentile == ceil(p·n)-th smallest of the expanded multiset") =
    forAll(values, frac) { case (vs, (num, den)) =>
      val sorted = vs.sorted
      val k = ((num * vs.length + den - 1) / den).toInt.max(1)
      StreamingWindowPercentiles.percentile(hist(vs), num, den) ==
        sorted(k - 1)
    }

  property("percentile is monotone in p") =
    forAll(values, frac, frac) { case (vs, (n1, d1), (n2, d2)) =>
      val h = hist(vs)
      val (lo, hi) =
        if (n1 * d2 <= n2 * d1) ((n1, d1), (n2, d2)) else ((n2, d2), (n1, d1))
      StreamingWindowPercentiles.percentile(h, lo._1, lo._2) <=
        StreamingWindowPercentiles.percentile(h, hi._1, hi._2)
    }

  property("p = 1 returns the maximum; result is always a member") =
    forAll(values) { vs =>
      val h = hist(vs)
      StreamingWindowPercentiles.percentile(h, 1, 1) == vs.max &&
        vs.contains(StreamingWindowPercentiles.percentile(h, 1, 2))
    }
}
