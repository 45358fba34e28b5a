package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping sliding-window document chunking — the retrieval-corpus
  * prep step (RAG indexing, embedding-model input shaping): each document
  * becomes `ceil`-covering token windows of `chunkSize` tokens advancing
  * by `stride` (< chunkSize ⇒ consecutive chunks overlap by
  * `chunkSize − stride` tokens, the standard trick so no semantic unit is
  * cut at a hard boundary without also appearing whole in a neighbor).
  *
  * Distinct from [[graft.dedup.Dedup]]'s passage chunking (fixed
  * NON-overlapping windows, a dedup grain) — here the windows overlap and
  * carry provenance (`start_tok`) so a retrieval hit maps back to its
  * source span.
  *
  * Chunk layout: chunk i covers tokens `[i·stride, min(i·stride +
  * chunkSize, n))`; `1 + ceil((n − chunkSize)/stride)` chunks for
  * n > chunkSize, exactly one (possibly short) chunk otherwise — every
  * token is covered, every doc yields ≥ 1 chunk.
  *
  * Scale shape: entirely in-row (sequence/slice per doc, then one
  * posexplode) — a narrow scan with NO shuffle; at 100 TB the chunk table
  * partitions exactly like its corpus scan and feeds the embedding /
  * indexing stage directly. The 56-bit chunk hash gives downstream exact
  * chunk-grain dedup for free. */
object SlidingChunks {

  def chunks(docs: DataFrame, idCol: String, textCol: String,
             chunkSize: Int, stride: Int,
             tok: Column => Column =
               graft.functions.TextAnalysis.unicodeTokens): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got size=$chunkSize stride=$stride")
    val toks: Column = tok(col(textCol))
    val n = size(toks)
    val nChunks = when(n <= chunkSize, lit(1)).otherwise(
      lit(1) + ceil((n - chunkSize).cast("double") / stride).cast("int"))
    val texts = transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(toks, i * stride + 1, lit(chunkSize)), " "))
    docs
      .select(col(idCol).as("doc_id"), n.as("__n"),
        posexplode(texts).as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("start_tok"),
        least(lit(chunkSize), col("__n") - col("chunk_idx") * stride)
          .cast("long").as("n_tokens"),
        graft.dedup.Dedup.hexHash(col("chunk_text")).as("chunk_hash"))
  }
}
