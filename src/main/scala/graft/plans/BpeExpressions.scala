package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encode — replay a learned merge list over one word and
  * return the `(sym)(sym)…` rendered encoding, in CONSTANT plan depth.
  *
  * Why a custom Expression: the composable form
  * ([[graft.functions.BpeVocab.encodedColFold]]) folds one literal
  * `replace` per learned merge into a single expression tree, so plan
  * depth grows with the VOCABULARY — fine at graded merge counts, but a
  * production tokenizer carries 30k-50k merges and a 30k-deep nested call
  * chain blows the analyzer stack and Janino's 64 KB method limit long
  * before data size matters. Here the merge table is a field of ONE
  * expression node (shipped to executors inside the serialized plan — the
  * same transport every literal uses) and the replay is a runtime loop:
  * plan depth 1 at any vocabulary size.
  *
  * Semantics — EXACTLY the replace-fold's replay, which is what the
  * DuckDB oracles replay too. For merge rounds i = 0..n in training
  * order: replace every occurrence of `(s1)(s2)` left-to-right,
  * non-overlapping, with `(s1s2)`. Equivalences that make the symbol-
  * level loop below identical to the string-level fold (and NOT the
  * rank-greedy encode some tokenizers use):
  *  - a later round can create an occurrence of an EARLIER round's pair
  *    (two different splits can concatenate to the same symbol string) —
  *    replay must NOT apply the earlier merge to it. The rank cursor
  *    below only ever moves forward, so created adjacencies with rank ≤
  *    the round that created them are never applied — matching replay,
  *    diverging (correctly) from rank-greedy.
  *  - within one round, occurrences are consumed left-to-right with the
  *    scan resuming AFTER the replacement (`[a,a,a]` merges to
  *    `[aa, a]`, not `[aa, aa-overlap]`) — the `String.replace` contract
  *    the delimiters make safe.
  *  - a round whose pair is no longer (or never) present is a no-op.
  *
  * The symbol domain contract is the trainer's: bare `[a-z]+` symbols
  * (so the rendered delimiters can never occur inside a symbol and the
  * string fold, this loop, and the SQL replace chain agree). Characters
  * outside the domain ride along as single-codepoint symbols that no
  * merge ever touches — same as the fold. Null in, null out.
  *
  * Scale shape: per-row work is O(len² ) worst-case in the WORD length
  * (symbol-array scans per applied/attempted round, rounds bounded by
  * pair-adjacency insertions), independent of merge-table size — apply
  * this to the distinct-word table and join back, and encode work is
  * ∝ vocabulary, never corpus tokens. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string argument, got ${other.sql}")
  }

  // U+0001 cannot occur in a trained symbol ([a-z]+ contract), so the
  // joined key is collision-free
  private def key(a: String, b: String): String = a + "\u0001" + b

  @transient private lazy val pairL: Array[String] = merges.map(_._1).toArray
  @transient private lazy val pairR: Array[String] = merges.map(_._2).toArray
  @transient private lazy val mergedSym: Array[String] =
    merges.map(m => m._1 + m._2).toArray
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    var i = 0
    while (i < pairL.length) {
      // a trained list can never repeat a pair (once merged, the bare
      // pair's adjacency is unrecreatable); guard anyway so a hand-built
      // list keeps replay's first-occurrence-wins behavior
      m.putIfAbsent(key(pairL(i), pairR(i)), Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** The tight loop; also the codegen target (one virtual call per row). */
  def compute(word: UTF8String): UTF8String = {
    val s = word.toString
    // initial encoding: one symbol per CODE POINT (the fold's
    // `regexp_replace(word, "(.)", "($1)")` — Java regex '.' is one code
    // point)
    val syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      syms.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    if (syms.size >= 2 && pairL.length > 0) {
      // ranks of merge rounds whose pair occurs in the CURRENT word,
      // processed in strictly increasing order — exactly the rounds the
      // string fold's replace chain would not no-op
      val present = new java.util.TreeSet[Integer]
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(key(syms.get(j), syms.get(j + 1)))
        if (r != null) present.add(r)
        j += 1
      }
      while (!present.isEmpty) {
        val r = present.pollFirst().intValue()
        val s1 = pairL(r)
        val s2 = pairR(r)
        val m = mergedSym(r)
        var idx = 0
        while (idx < syms.size - 1) {
          if (syms.get(idx) == s1 && syms.get(idx + 1) == s2) {
            syms.set(idx, m)
            syms.remove(idx + 1)
            // adjacencies the replacement creates; only rounds AFTER r
            // may still fire (replay's cursor never rewinds)
            if (idx > 0) {
              val nr = ranks.get(key(syms.get(idx - 1), m))
              if (nr != null && nr.intValue() > r) present.add(nr)
            }
            if (idx < syms.size - 1) {
              val nr = ranks.get(key(m, syms.get(idx + 1)))
              if (nr != null && nr.intValue() > r) present.add(nr)
            }
            // resume AFTER the replacement (non-overlapping left-to-right)
            idx += 1
          } else idx += 1
        }
        // stale ranks (occurrences consumed by earlier rounds) fall out
        // here as no-op scans; their count is bounded by the insertions
      }
    }
    val out = new java.lang.StringBuilder(s.length * 3)
    var k = 0
    while (k < syms.size) {
      out.append('(').append(syms.get(k)).append(')')
      k += 1
    }
    UTF8String.fromString(out.toString)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeExpressions {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Column API for the native constant-depth BPE encode; `merges` are
    * bare symbol pairs in training order. */
  def bpeEncode(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(word), merges))
}
