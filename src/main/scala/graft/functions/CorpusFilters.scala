package graft.functions

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation filters for training-data pipelines: repetition-based
  * quality signals and benchmark decontamination.
  *
  * Both are expressed as the relational shapes that hold at 100 TB:
  *
  *  - repetition: explode → two-level aggregation (per-(doc,gram) counts,
  *    then per-doc max/total). Both aggregations combine map-side, so the
  *    shuffles carry ∝ distinct (doc,gram) rows and then ∝ docs — the same
  *    plan skeleton as TF-IDF, never a per-doc O(n²) array scan;
  *  - decontamination: the benchmark side is TINY by definition (eval sets
  *    are thousands of docs, the corpus is billions), so its distinct
  *    shingle-hash set BROADCASTS and contamination is a map-side hash join
  *    against the full corpus scan — no corpus shuffle at all until the
  *    tiny per-doc hit aggregation.
  *
  * The repetition thresholds follow the published Gopher corpus-filter
  * family (fraction of content owned by the most frequent token / 2-gram);
  * the exact fractions here are token-count based and exposed as parameters
  * — published pipelines tune them per corpus anyway. Decontamination is
  * the standard n-gram-overlap check run before training to drop documents
  * that leak evaluation data.
  */
object CorpusFilters {

  /** Per-doc repetition signals + keep verdict:
    * `(doc_id, top_token_frac, top_bigram_frac, keep)`.
    *
    * `top_token_frac`  = occurrences of the most frequent token / tokens;
    * `top_bigram_frac` = occurrences of the most frequent word 2-gram /
    * 2-grams (single-token docs floor at one truncated shingle, matching
    * `Dedup.shingles`). A doc is kept when BOTH fractions are at or below
    * their thresholds — heavily repetitive machine-generated text fails. */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String,
                        maxTokenFrac: Double = 0.20,
                        maxBigramFrac: Double = 0.18): DataFrame = {
    // the engine's canonical tokenizer (unicode since round 13) — oracle
    // parity depends on every operator tokenizing identically
    val toks = TextAnalysis.unicodeTokens(col(textCol))

    def topFrac(grams: DataFrame, out: String): DataFrame =
      grams
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_c"), sum(col("c")).as("n"))
        .select(col("doc_id"),
          round(col("top_c").cast("double") / col("n"), 6).as(out))

    val tokenFrac = topFrac(
      docs.select(col(idCol).as("doc_id"), explode(toks).as("g")),
      "top_token_frac")
    val bigramFrac = topFrac(
      docs.select(col(idCol).as("doc_id"),
        explode(Dedup.shingles(toks, 2)).as("g")),
      "top_bigram_frac")

    tokenFrac.join(bigramFrac, Seq("doc_id"))
      .withColumn("keep",
        col("top_token_frac") <= maxTokenFrac &&
          col("top_bigram_frac") <= maxBigramFrac)
  }

  /** Sequence packing: assign each document to a fixed-token-budget training
    * pack — `(doc_id, shard, pack_id, n_tokens)`.
    *
    * Docs are hash-sharded (deterministic 56-bit content hash of the id, no
    * RNG), then packed in doc_id order within each shard: a doc joins the
    * pack indexed by `floor(tokens_before_it_in_shard / budget)`, the
    * standard streaming approximation of first-fit (a pack may overrun by
    * at most one document — training-time truncation absorbs it).
    *
    * Scale shape: the only shuffle is the hash-shard exchange, and the
    * running-sum window is PARTITIONED BY shard — shards bound every
    * window's size, so there is no global-order single-task sort (the
    * wx_ntile lesson). nShards scales with the cluster, not the data. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    tokenBudget: Long, nShards: Int): DataFrame = {
    require(tokenBudget >= 1 && nShards >= 1, "budget and shards must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.unicodeTokenCount(col(textCol)).as("n_tokens"))
      .withColumn("shard",
        Dedup.hexHash(col("doc_id").cast("string")) % nShards)
      .withColumn("pack_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / tokenBudget)
          .cast("long"))
      .select(col("doc_id"), col("shard"), col("pack_id"), col("n_tokens"))
  }

  /** Benchmark decontamination: documents sharing at least one distinct
    * word w-shingle (56-bit hash) with the benchmark set, with the shared
    * count — `(doc_id, n_hits)`.
    *
    * EVERY doc in `docs` is checked, including any that also appear in
    * `benchmark` — the two frames come from different tables with unrelated
    * id namespaces, so no id-based exclusion is possible here. Callers that
    * hold the benchmark rows inside the corpus frame must anti-join them out
    * first (as `ExtQueries.eDecontam` does); passing overlapping frames
    * flags the benchmark docs themselves, which is also what makes the
    * self-decontamination property (`CorpusProps`) checkable.
    *
    * The benchmark's distinct shingle-hash set is broadcast (eval sets are
    * small); the corpus side is a narrow scan + explode + broadcast-hash
    * join, so a 100 TB corpus is checked in one pass with no corpus-wide
    * shuffle before the per-doc count. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String,
                    shingleWidth: Int = 3): DataFrame = {
    def docShingles(df: DataFrame): DataFrame =
      Dedup.shingleBases(df, idCol, textCol, shingleWidth)
        .select(col("doc_id"), col("b1").as("sh"))
    decontaminateFromShingles(docShingles(docs),
      docShingles(benchmark).select(col("sh")).distinct())
  }

  /** [[decontaminate]] over prebuilt shingle-hash tables — the
    * shared-artifact form (`Dedup.shingleBases` projected to b1), so a
    * pipeline that already exploded the corpus pays no second explode.
    * `corpusShingles` is per-doc-distinct `(doc_id, sh)`; `benchShingles`
    * is the distinct `(sh)` set of the benchmark and must be
    * broadcast-sized (eval sets are, by definition). The same disjointness
    * contract as [[decontaminate]] applies to what the caller puts in each
    * table. */
  def decontaminateFromShingles(corpusShingles: DataFrame,
                                benchShingles: DataFrame): DataFrame =
    corpusShingles
      .join(broadcast(benchShingles), Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))

  /** Length-bucket padding report — the batching-efficiency read a
    * training pipeline takes before fixing its bucketed-batching
    * boundaries: documents bucket to the smallest cap ≥ their token
    * count (counts above the largest cap CLIP to it, mirroring max-seq-
    * len truncation), and each bucket reports its document count, kept
    * tokens, padding tokens (docs·cap − kept) and padding share — the
    * fraction of the batch matrix a same-cap batching strategy burns on
    * pad tokens. Read next to `packSequences` (packing removes the waste
    * this table quantifies).
    *
    * `caps` must be strictly ascending. One narrow scan + a
    * caps-bounded aggregation; the bucket assignment is a literal CASE
    * chain (integer compares — identical in the DuckDB oracle). */
  def lengthBuckets(docs: DataFrame, textCol: String,
                    caps: Seq[Long]): DataFrame = {
    require(caps.nonEmpty && caps == caps.sorted && caps.distinct == caps,
      "caps must be strictly ascending")
    val maxCap = caps.max
    val clipped = least(TextAnalysis.unicodeTokenCount(col(textCol)), lit(maxCap))
    val bucket = caps.init.foldRight(lit(maxCap): Column) { (c, acc) =>
      when(clipped <= c, lit(c)).otherwise(acc)
    }
    docs.select(bucket.as("bucket_cap"), clipped.as("nt"))
      .groupBy(col("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("total_tokens"))
      .select(col("bucket_cap"), col("n_docs"), col("total_tokens"),
        (col("n_docs") * col("bucket_cap") - col("total_tokens")).as("pad_tokens"),
        round(lit(1.0) - col("total_tokens").cast("double") /
          (col("n_docs") * col("bucket_cap")).cast("double"), 6).as("pad_share"))
      .orderBy("bucket_cap")
  }

  /** T5/UL2-style span-corruption pair generation: deterministic
    * non-overlapping spans (every `every`-th position starting at
    * `phase`, `spanLen` tokens each) are cut from the document and
    * replaced by sentinels `<X0> <X1> …`; the target spells each
    * sentinel followed by its span — the (input, target) pairs a
    * denoising pretraining objective consumes. Deterministic-by-
    * arithmetic (position residues, not RNG): results are a pure
    * function of the text, reproducible across engines and cluster
    * sizes, per the engine's samplers convention.
    *
    * All per-row array work (sequence/transform/filter over the token
    * array) — no shuffle, work ∝ corpus tokens. A span whose tail would
    * overrun the document is NOT cut (its tokens pass through). */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
                     every: Int, phase: Int, spanLen: Int): DataFrame = {
    require(spanLen >= 1 && phase >= 0 && every > phase + spanLen - 1,
      "spans must be non-overlapping by construction: every > phase + spanLen - 1")
    val toks = TextAnalysis.unicodeTokens(col(textCol))
    val n = size(toks)
    val pos = sequence(lit(0), n - 1)
    def sentinel(p: Column): Column =
      concat(lit("<X"), ((p - phase) / every).cast("int").cast("string"),
        lit(">"))
    val isStart = (p: Column) => p % every === phase && p + spanLen <= n
    val inSpanTail = (p: Column) => {
      val off = p % every - phase
      off > 0 && off < spanLen && (p - off) + spanLen <= n
    }
    val inputArr = transform(pos, p =>
      when(isStart(p), sentinel(p))
        .when(inSpanTail(p), lit(""))
        .otherwise(element_at(toks, p + 1)))
    val starts = filter(pos, p => isStart(p))
    val targetArr = transform(starts, s =>
      concat(sentinel(s), lit(" "),
        array_join(slice(toks, s + 1, lit(spanLen)), " ")))
    docs.select(col(idCol),
      size(starts).cast("long").as("n_spans"),
      array_join(filter(inputArr, x => x =!= ""), " ").as("input"),
      array_join(targetArr, " ").as("target"))
  }

  /** Word-blocklist safety gate (the Dolma/C4-style list filter): per
    * document the blocked-token hit count and ratio, and the gate
    * verdict `hits ≥ minHits OR ratio > maxRatio`. The membership probe
    * is one InSet pass over the token array (O(1) per token); a
    * production-size lexicon swaps in as a broadcast semi-join on the
    * exploded token — the report shape is identical. Emits the verdict
    * as a FLAG column (consumers filter), per the engine's
    * no-cross-side-filter discipline. */
  def blockwordGate(docs: DataFrame, idCol: String, textCol: String,
                    blocked: Seq[String], minHits: Long,
                    maxRatio: Double): DataFrame = {
    require(blocked.nonEmpty, "an empty blocklist gates nothing")
    val toks = TextAnalysis.unicodeTokens(col(textCol))
    val hits = size(filter(toks, t => t.isin(blocked: _*))).cast("long")
    docs.select(col(idCol), hits.as("blocked_hits"),
        size(toks).cast("long").as("n_tokens"))
      .select(col(idCol), col("blocked_hits"), col("n_tokens"),
        round(col("blocked_hits").cast("double") / col("n_tokens"), 6)
          .as("blocked_ratio"),
        (col("blocked_hits") >= minHits ||
          col("blocked_hits").cast("double") / col("n_tokens") > maxRatio)
          .as("gated"))
  }
}
