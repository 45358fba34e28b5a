package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken: "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
  * plagiarism-detector algorithm).
  *
  * Where MinHash summarizes a WHOLE document into k signature slots,
  * winnowing selects a positional subset of shingle hashes with a hard
  * guarantee: any shared token run of at least `window + shingleWidth - 1`
  * tokens between two documents contributes at least one IDENTICAL
  * fingerprint to both, at an expected density of 2/(window+1) of the
  * shingle stream. That makes it the candidate generator of choice for
  * "which spans were copied" forensics (attribution, license-contamination
  * triage) rather than "are these documents similar" scoring — the two
  * complement each other in a curation pipeline.
  *
  * No counterpart exists in the reference (its change-tracking surface has
  * no similarity operators) — this is part of the [E] LLM-pipeline family
  * layered on the same corpus tables (SURVEY.md §2.10).
  *
  * Scale shape: selection is entirely in-row (one narrow scan via the
  * native [[graft.plans.WinnowFingerprints]] codegen expression — one md5
  * per shingle, one O(n·window) pass); the cross-document match is a
  * hash equi-join over the SELECTED fingerprints only (density ~2/(w+1) of
  * the shingle table), df-capped like the Jaccard path so pair work stays
  * linear in corpus size with a bounded per-hash fan-out. No all-pairs
  * stage anywhere.
  */
object Winnowing {

  /** Per-document winnowed fingerprints: `(doc_id, pos, h)` with `pos` the
    * 0-based shingle index of the selected hash, strictly increasing per
    * doc. Every document yields at least one fingerprint (a doc with fewer
    * shingles than the window gets one frame over all of them — mirrors
    * the one-truncated-shingle floor of [[Dedup.shingles]]). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   shingleWidth: Int, window: Int,
                   tok: Column => Column =
                     graft.functions.TextAnalysis.unicodeTokens): DataFrame = {
    val toks = tok(col(textCol))
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.plans.TextExpressions.winnowFingerprints(
          Dedup.shingles(toks, shingleWidth), window)).as("fp"))
      .select(col("doc_id"), col("fp.pos").as("pos"), col("fp.h").as("h"))
  }

  /** One daily-ingest increment against a standing fingerprint index: the
    * batch is fingerprinted ONCE (replayed doc_ids dropped first — an
    * anti-join against the index makes at-least-once delivery a no-op),
    * probed against the index for cross matches, self-joined for
    * within-batch matches. The indexed corpus is never re-fingerprinted;
    * per-ingest work scales with the increment's selected hashes times
    * their bucket occupancy.
    *
    * Because a document's fingerprint set depends only on its own text —
    * never on the rest of the corpus — a pair's shared count is FIXED the
    * moment the later of the two docs arrives. Accumulated increment
    * matches therefore equal [[matchesFromFingerprints]] over the union
    * corpus EXACTLY (no df cap here: document frequency is a corpus-level
    * quantity that would make early emissions depend on later arrivals;
    * apply the cap downstream where the full index is in hand). */
  final case class Increment(fps: DataFrame, newMatches: DataFrame)

  def winnowIncrement(batch: DataFrame, idCol: String, textCol: String,
                      prevFps: Option[DataFrame], shingleWidth: Int,
                      window: Int, minShared: Long): Increment = {
    // replay guard BEFORE fingerprinting: a redelivered batch must not
    // pay the shingle+md5+winnow scan just to discard every row
    val freshDocs = prevFps match {
      case Some(p) => batch.join(
        p.select(col("doc_id").as(idCol)).distinct(), Seq(idCol), "left_anti")
      case None => batch
    }
    val freshM = Dedup.materializeAndRelease(
      fingerprints(freshDocs, idCol, textCol, shingleWidth, window))
    val freshH = freshM.select(col("doc_id"), col("h")).distinct()
    val within = freshH.as("a").join(freshH.as("b"),
      col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
    val candidates = prevFps match {
      case Some(p) =>
        // cross probe: ids are disjoint after the replay guard, so
        // least/greatest canonicalizes without self-pairs
        val ph = p.select(col("doc_id"), col("h")).distinct()
        within.select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .unionByName(freshH.as("a").join(ph.as("b"), col("a.h") === col("b.h"))
            .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
              greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b")))
      case None =>
        within.select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    }
    val matches = candidates.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    Increment(freshM, Dedup.materializeAndRelease(matches))
  }

  /** Cross-document fingerprint matches off a prebuilt [[fingerprints]]
    * table: pairs sharing at least `minShared` distinct fingerprint hashes,
    * with the shared count — the MOSS report row. `maxDf` drops hashes
    * seen in more than that many documents (boilerplate spans pair
    * every document containing them with every other; they carry no
    * copied-span signal — same rationale and cap as the Jaccard path's
    * hot-shingle cut). */
  def matchesFromFingerprints(fps: DataFrame, minShared: Long,
                              maxDf: Long = Long.MaxValue): DataFrame = {
    // per-doc-distinct hashes: the same span selected at two positions in
    // one doc counts once toward the pair overlap
    val hdis = fps.select(col("doc_id"), col("h")).distinct()
    val dfok = hdis.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("h"))
    val kept = hdis.join(dfok, Seq("h"))
    kept.as("a").join(kept.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
