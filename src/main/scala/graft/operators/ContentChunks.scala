package graft.operators

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking — the rolling-hash segmentation every
  * storage dedup system uses (LBFS/Venti lineage), applied at word
  * grain: a chunk boundary falls after token `i` wherever the hash of
  * the `window`-token run ending at `i` lands in the boundary residue
  * class (`hash % divisor == 0`), plus a forced boundary at the doc
  * end. Expected chunk length ≈ `divisor` tokens.
  *
  * Why a training-data pipeline wants it next to fixed-grain passage
  * dedup ([[graft.dedup.Dedup.passageDedup]]): fixed windows are
  * boundary-ALIGNED — insert one token at the front of a mirrored page
  * and every fixed chunk shifts, so nothing matches. CDC boundaries
  * are content-anchored: the same passage re-chunks identically no
  * matter where it sits in the document, so shifted duplicates land on
  * equal chunk hashes.
  *
  * Max-chunk cap (round 13, the production guard every CDC deployment
  * ships): a boundary-free run — adversarial or just self-periodic text
  * whose windows never hit the residue class — would otherwise grow one
  * chunk to the whole document, an unbounded per-row array assembly at
  * corpus scale. `maxLen` forces a boundary every `maxLen` tokens of
  * boundary-free run (content-anchored boundaries still dominate; only
  * the gaps BETWEEN them subdivide, so the content-anchoring property
  * is preserved for every chunk the cap doesn't touch). Forced
  * boundaries are pure arithmetic on the boundary array — deterministic,
  * so the DuckDB oracle reproduces the exact capped segmentation.
  *
  * Plan shape: segmentation is ENTIRELY in-row (boundary selection +
  * cap arithmetic + chunk assembly as array ops over the token vector,
  * one posexplode) — a narrow scan that partitions exactly like its
  * corpus scan; the only exchange in the dedup consumer is the
  * chunk-hash aggregation. Deterministic: boundaries and chunk hashes
  * come from the portable 56-bit md5 ([[Dedup.hexHash]]), so DuckDB
  * reproduces the exact segmentation for the oracle (`e_cdc_chunks` /
  * `e_cdc_dedup`).
  */
object ContentChunks {

  /** Per-doc variable-width chunks:
    * (doc_id, chunk_idx, start_tok, n_tok, chunk_hash) — token indices
    * 1-based, `chunk_hash` the salted 56-bit hash of the
    * space-rejoined chunk text. `maxLen` caps any chunk at that many
    * tokens (default uncapped); `tok` picks the tokenizer (unicode
    * grain by default, round-13 migration). */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             window: Int, divisor: Int, salt: String = "cdc|",
             maxLen: Int = Int.MaxValue,
             tok: Column => Column =
               graft.functions.TextAnalysis.unicodeTokens): DataFrame = {
    require(window >= 1 && divisor >= 2, "need window >= 1, divisor >= 2")
    require(maxLen >= 1, "maxLen must be >= 1")
    // STAGED projections (the perceptualHash lesson): the boundary array
    // is referenced many times by the chunk assembly, and inlining its
    // md5-per-position filter at every use site made Catalyst generate a
    // constant ~8 s of analysis/codegen per query regardless of data
    // size. Aliasing each stage materializes it once per row; Catalyst's
    // CollapseProject keeps multiply-referenced non-cheap aliases staged.
    val toks = tok(col(textCol))
    val n = size(col("__t"))
    // interior boundaries: i ∈ [window, n-1] where the window ending at
    // i hashes into the residue class (docs shorter than window+1 have
    // no interior boundary — the whole doc is one chunk)
    val interior = when(n - 1 >= window,
      filter(sequence(lit(window), n - 1), i =>
        pmod(Dedup.hexHash(
          array_join(slice(col("__t"), i - lit(window - 1), lit(window)), " "),
          salt), lit(divisor.toLong)) === 0))
      .otherwise(array().cast("array<int>"))
    val bounds = concat(array(lit(0)), interior, array(n))
    // cap enforcement over the STAGED content boundaries: each adjacent
    // gap wider than maxLen gains forced points prev+maxLen,
    // prev+2·maxLen, … < cur — in-row arithmetic, no hashing
    val b0 = col("__cb")
    val capped =
      if (maxLen == Int.MaxValue) b0
      else concat(array(lit(0)),
        flatten(transform(sequence(lit(1), size(b0) - 1), j => {
          val prev = element_at(b0, j)
          val cur = element_at(b0, j + 1)
          concat(
            when(cur - prev > maxLen,
              sequence(prev + maxLen, cur - 1, lit(maxLen)))
              .otherwise(array().cast("array<int>")),
            array(cur))
        })))
    val b = col("__bounds")
    val chunkStructs = transform(sequence(lit(1), size(b) - 1), j =>
      struct(
        (element_at(b, j) + 1).cast("long").as("start_tok"),
        (element_at(b, j + 1) - element_at(b, j)).cast("long").as("n_tok"),
        Dedup.hexHash(
          array_join(slice(col("__t"), element_at(b, j) + 1,
            element_at(b, j + 1) - element_at(b, j)), " "),
          salt).as("chunk_hash")))
    docs.select(col(idCol).cast("long").as("doc_id"), toks.as("__t"))
      .select(col("doc_id"), col("__t"), bounds.as("__cb"))
      .select(col("doc_id"), col("__t"), capped.as("__bounds"))
      .select(col("doc_id"), posexplode(chunkStructs))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("chunk_idx"),
        col("col.start_tok"), col("col.n_tok"), col("col.chunk_hash"))
  }

  /** Chunk-grain duplication over a [[chunks]] frame: every chunk hash
    * seen more than once, with copy/doc counts and the smallest holding
    * doc. ONE map-side-combined aggregation on the chunk hash — the
    * narrow segmentation scan feeds it directly. */
  def duplicatedChunks(chunksDf: DataFrame): DataFrame =
    chunksDf.groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_copies") > 1)
}
