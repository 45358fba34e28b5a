package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the contract check a pipeline
  * gates ingestion on (the dbt-test / Great-Expectations pattern): a
  * rule list over a table produces one verdict row per rule with its
  * violation count, never an exception mid-job. The reference's only
  * "validation" is the HTTP status ladder
  * (/root/reference/ActionFunctions/HttpPostAction.cs:67-83); this is
  * the data-side analogue the [E] pipeline needs at the gate.
  *
  * Scale shape: every ROW-grain rule compiles to one conditional-sum
  * column, so the whole rule list costs ONE scan with map-side-combined
  * aggregation; the key-uniqueness rule is one extra (keys-grain)
  * aggregation. Verdicts are exact integer counts. */
object Expectations {

  /** A named expectation over a table. */
  sealed trait Rule { def name: String; def target: String }
  /** Column must never be null. */
  final case class NotNull(column: String) extends Rule {
    val name = "not_null"; def target = column
  }
  /** Non-null values must be members of `allowed`. */
  final case class InSet(column: String, allowed: Seq[String]) extends Rule {
    val name = "in_set"; def target = column
  }
  /** Non-null values must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Long, hi: Long) extends Rule {
    val name = "in_range"; def target = column
  }
  /** Non-null values must match the (RE2-portable) regex. */
  final case class Matches(column: String, pattern: String) extends Rule {
    val name = "matches"; def target = column
  }
  /** The column tuple must be unique across the table. */
  final case class Unique(columns: Seq[String]) extends Rule {
    val name = "unique"; def target = columns.mkString(",")
  }

  private[graft] def violation(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNull
    case InSet(c, allowed) => col(c).isNotNull && !col(c).isin(allowed: _*)
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case Matches(c, p) => col(c).isNotNull && !col(c).rlike(p)
    case Unique(_) =>
      throw new IllegalStateException("unique is keys-grain, not row-grain")
  }

  /** Evaluate `rules` over `df`: (rule, target, n_violations, n_rows,
    * pass) — one row per rule, rule-list order is (rule, target)
    * sorted for determinism. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "an empty contract checks nothing")
    // internal aliases key on the rule's LIST INDEX, not (name, target):
    // two rules on one column (two Matches patterns, say) are a normal
    // contract and must not collide into an ambiguous reference
    val indexed = rules.zipWithIndex
    val (uniq, rowRules) = indexed.partition(_._1.isInstanceOf[Unique])
    // coalesce to 0 everywhere: an EMPTY table must verdict (0 violations,
    // pass=true — vacuous), never a NULL a downstream gate filters away
    val rowAgg: Option[DataFrame] = if (rowRules.isEmpty) None else Some {
      val sums = rowRules.map { case (r, i) =>
        coalesce(sum(when(violation(r), 1L).otherwise(0L)), lit(0L))
          .as(s"__v_$i")
      } :+ count(lit(1)).as("__n")
      val one = df.agg(sums.head, sums.tail: _*)
      rowRules.map { case (r, i) =>
        one.select(lit(r.name).as("rule"), lit(r.target).as("target"),
          col(s"__v_$i").as("n_violations"),
          col("__n").as("n_rows"))
      }.reduce(_ unionByName _)
    }
    val uniqAgg: Option[DataFrame] = uniq.headOption.map { _ =>
      uniq.map { case (u @ Unique(cols), _) =>
        // null-keyed rows are EXEMPT (the same convention as the value
        // rules): countDistinct skips them, so the duplicate count must
        // compare against the non-null-keyed row count, not count(*)
        val allNonNull = cols.map(col(_).isNotNull).reduce(_ && _)
        df.agg(count(lit(1)).as("__n"),
            coalesce(sum(when(allNonNull, 1L).otherwise(0L)), lit(0L))
              .as("__nn"),
            countDistinct(cols.head, cols.tail: _*).as("__d"))
          .select(lit(u.name).as("rule"), lit(u.target).as("target"),
            (col("__nn") - col("__d")).as("n_violations"),
            col("__n").as("n_rows"))
      }.reduce(_ unionByName _)
    }
    (rowAgg.toSeq ++ uniqAgg.toSeq).reduce(_ unionByName _)
      .select(col("rule"), col("target"), col("n_violations"),
        col("n_rows"), (col("n_violations") === 0).as("pass"))
      .orderBy("rule", "target")
  }
}
