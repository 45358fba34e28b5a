package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, language ID (stopword n-gram heuristic),
  * quality scoring, and document fingerprinting (polynomial rolling hash).
  *
  * Everything is a pure column expression (whole-stage codegen, no UDFs),
  * so these run at full scan speed over 100 TB of documents. The arithmetic
  * constants are exposed so the DuckDB oracles can interpolate the exact
  * same numbers.
  */
object TextAnalysis {

  /** Whitespace tokenization (single-space normalized) — the LEGACY
    * grain, kept for (a) per-call opt-out via the `tok` parameters the
    * token families expose and (b) the deliberate whitespace-vs-unicode
    * CONTRAST queries (`e_token_count`, `e_token_unicode`,
    * `e_vocabulary`, the `ws_tokens`-labeled stat metrics). Everything
    * else defaults to [[unicodeTokens]] since round 13 — real corpora
    * (CJK without spaces, punctuation-glued tokens, NFKC spelling
    * variants) break the whitespace grain silently. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Unicode-aware tokenization: NFKC-normalize (native
    * [[graft.plans.NfkcNormalize]] — full-width forms, ligatures and
    * compatibility variants collapse to one spelling), then every maximal
    * run of letters or digits (`[\p{L}\p{N}]+`) is a token — punctuation
    * splits, CJK ideographs tokenize without needing spaces (each
    * contiguous ideograph run is one token; true word segmentation needs
    * a lexicon this engine deliberately doesn't embed).
    *
    * DuckDB-reproducible: RE2's `[\p{L}\p{N}]+` classes agree with
    * java.util.regex on the general categories, and NFKC is the identity
    * on ASCII corpora (the oracle side has no normalizer — non-ASCII
    * NFKC behavior is spec-proven instead).
    *
    * Scale shape: one per-row codegen'd scan — no shuffle, no UDF. Since
    * round 13 this is the FUSED native [[graft.plans.UnicodeTokens]]
    * expression (ASCII rows tokenize in one byte scan with zero regex /
    * String-decode cost; non-ASCII rows normalize then code-point-scan),
    * semantics bit-identical to the original
    * `regexp_extract_all(nfkc_normalize(text), '[\p{L}\p{N}]+')` chain —
    * parity property-tested in `UnicodeTokensSpec`. */
  def unicodeTokens(text: Column): Column =
    graft.plans.TextExpressions.unicodeTokens(text)

  /** The pre-fusion regex form of [[unicodeTokens]] — kept as the parity
    * reference the native expression is property-tested against. */
  private[graft] def unicodeTokensRegex(text: Column): Column =
    regexp_extract_all(
      graft.plans.TextExpressions.nfkcNormalize(text),
      lit("[\\p{L}\\p{N}]+"), lit(0))

  /** Unicode-aware token count ([[unicodeTokens]] grain). */
  def unicodeTokenCount(text: Column): Column =
    size(unicodeTokens(text)).cast("long")

  /** Syllable estimate via the vowel-run heuristic (`[aeiouy]+` runs,
    * lowercase input assumed; every vowel-free word still counts one) —
    * the standard cheap stand-in where a pronunciation lexicon is
    * overkill. Runs can never span a word boundary (space is not a
    * vowel), so one whole-text regex count plus the vowel-free-word
    * correction equals the per-word sum. */
  def syllableCount(text: Column): Column =
    (regexp_count(text, lit("[aeiouy]+")) +
      size(filter(unicodeTokens(text), t => !t.rlike("[aeiouy]")))).cast("long")

  /** Sentence count: runs of terminal punctuation, floored at one (a
    * fragment with no terminator is one sentence). */
  def sentenceCount(text: Column): Column =
    greatest(regexp_count(text, lit("[.!?]+")).cast("long"), lit(1L))

  /** Flesch reading ease: 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words). Higher = easier; classic English prose
    * sits 60-70. */
  def fleschReadingEase(text: Column): Column = {
    val w = unicodeTokenCount(text).cast("double")
    round(lit(206.835)
      - lit(1.015) * (w / sentenceCount(text).cast("double"))
      - lit(84.6) * (syllableCount(text).cast("double") / w), 6)
  }

  /** Flesch-Kincaid grade level: 0.39·(words/sentences) +
    * 11.8·(syllables/words) − 15.59. */
  def fkGradeLevel(text: Column): Column = {
    val w = unicodeTokenCount(text).cast("double")
    round(lit(0.39) * (w / sentenceCount(text).cast("double"))
      + lit(11.8) * (syllableCount(text).cast("double") / w)
      - lit(15.59), 6)
  }

  /** Unicode script classes profiled by [[scriptCounts]], alphabetical.
    * Spark (java.util.regex) spells the class `\p{IsHan}`, RE2/DuckDB
    * spells it `\p{Han}` — same Unicode script property, two syntaxes;
    * the oracle generator writes the RE2 spelling. */
  val scriptClasses: Seq[String] = Seq("Arabic", "Cyrillic", "Han", "Latin")

  /** Per-script character counts — the script-mix profile a multilingual
    * curation pass reads to route documents (a "Latin" corpus with 40%
    * Han chars is mislabeled or mixed). One codegen'd regex count per
    * class, per-row, no shuffle. */
  def scriptCounts(text: Column): Seq[(String, Column)] =
    scriptClasses.map(sc =>
      sc -> regexp_count(text, lit(s"\\p{Is$sc}")).cast("long"))

  /** Dominant script of a text: argmax char count over
    * [[scriptClasses]], alphabetical-first tie-break, "none" when no
    * scripted character occurs (digits/punctuation only). */
  def dominantScript(text: Column): Column = {
    val counts = scriptCounts(text)
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("none"): Column) { case ((sc, c), acc) =>
      when(c === best && best > 0, lit(sc.toLowerCase)).otherwise(acc)
    }
  }

  /** BPE-ish subword count: runs of letters, runs of digits, and lone
    * non-alnum symbols each count as one token (a common pre-tokenizer
    * approximation when no trained BPE vocab is available). */
  def subwordCount(text: Column): Column =
    (regexp_count(text, lit("[a-zA-Z]+")) +
      regexp_count(text, lit("[0-9]+")) +
      regexp_count(text, lit("[^a-zA-Z0-9\\s]"))).cast("long")

  /** Stopword lists used by the language-ID heuristic (tiny embedded lists;
    * a real deployment would broadcast a larger lexicon). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est"))

  /** Per-language stopword hit count over the token array. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(array_intersect_keepdups(toks, stopwords(lang)))

  // array_intersect dedups; we want hit counts, so filter instead. `isin`
  // plans an InSet membership probe — one array pass, O(1) per token —
  // where an OR-chain / per-word fold re-scans the array per word.
  private def array_intersect_keepdups(toks: Column, words: Seq[String]): Column =
    filter(toks, t => t.isin(words: _*))

  /** Language ID: argmax of stopword hit rate; deterministic alphabetical
    * tie-break; "und" (undetermined) when no stopwords hit at all. */
  def langId(text: Column): Column = langIdFromToks(unicodeTokens(text))

  /** [[langId]] over an already-tokenized array — the segment-grain form
    * ([[graft.queries.ExtQueries]] code-switch profile slices one token
    * array into segments; re-joining and re-splitting per segment would
    * double the scan). */
  def langIdFromToks(toks: Column): Column = {
    val scores = stopwords.keys.toSeq.sorted.map(l => (l, stopwordHits(toks, l)))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, sc), acc) =>
      when(sc === best && best > 0, lit(l)).otherwise(acc)
    }
  }
  // NOTE: foldRight + `when` chain means the FIRST alphabetical language
  // matching the max wins — mirror with CASE in the same order in SQL.

  /** Quality signals + a composite score in [0,1]:
    * length score (saturating at 500 chars), mean word length sanity,
    * alpha ratio, stopword ratio. Weights are part of the public contract. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    // unicode token grain (round-13 default flip): the stopword-ratio arm
    // must see bare words — "the," under the whitespace grain never
    // matched a stopword; the char-based arms are tokenizer-free
    val toks = unicodeTokens(text)
    val nToks = size(toks).cast("double")
    val alpha = regexp_count(text, lit("[a-zA-Z]")).cast("double")
    // one membership pass over the token array (a token equals at most one
    // stopword, so this equals the per-word count sum — and it is exactly
    // the oracle's `list_filter(t, x -> x IN (...))` shape)
    val allStops = stopwords.values.flatten.toSeq.distinct
    val stopHits = size(filter(toks, t => t.isin(allStops: _*)))
    val lenScore = least(nChars / 500.0, lit(1.0))
    val alphaRatio = alpha / greatest(nChars, lit(1.0))
    val stopRatio = least(stopHits.cast("double") * 4.0 / greatest(nToks, lit(1.0)), lit(1.0))
    round(lenScore * 0.3 + alphaRatio * 0.4 + stopRatio * 0.3, 6)
  }

  /** PII redaction patterns (RE2-compatible: no backrefs/lookaround, so the
    * same patterns run in Spark's Java regex AND DuckDB/RE2 — oracle
    * parity). Order matters: SSN-shaped ids are masked before the looser
    * phone pattern can eat their digits. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("[0-9]{3}-[0-9]{2}-[0-9]{4}", "[ID]"),
    ("\\+?[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}", "[PHONE]"))

  /** Mask emails, SSN-shaped ids, and phone-shaped numbers (replace-all). */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (pat, tag)) =>
      regexp_replace(acc, pat, tag)
    }

  /** Luhn checksum validity of an all-digit string (any length) — the
    * checksum that separates card-SHAPED digit runs from actual card
    * numbers, so the PII pass neither misses real cards nor shreds
    * order ids. Pure per-row array arithmetic (digits → position-doubled
    * values → fold sum); the doubling applies at odd 0-based positions
    * from the RIGHT, the part regexes cannot express. */
  def luhnValid(digits: Column): Column = {
    val ds = split(digits, "")
    val n = size(ds)
    val vals = transform(ds, (d, i) => {
      val v = d.cast("int")
      when((n - lit(1) - i) % 2 === 1,
        when(v * 2 > 9, v * 2 - 9).otherwise(v * 2)).otherwise(v)
    })
    aggregate(vals, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** Card-shaped candidates: MAXIMAL digit runs of exactly 16 — extract
    * every `[0-9]+` run, keep length-16 ones. A bare `[0-9]{16}` regex
    * would surrender the first 16 digits of a 17+-digit order id to the
    * Luhn check; maximal runs make over-long ids drop out whole, and
    * need no boundary groups (which would eat the separator between two
    * adjacent cards). Separator-tolerant variants join via a
    * pre-normalization pass. */
  def cardCandidates(text: Column): Column =
    filter(regexp_extract_all(text, lit("[0-9]+"), lit(0)),
      x => length(x) === 16)

  /** Redact every Luhn-VALID card candidate to `[CARD]` — a fold of
    * `replace` over the validated list, so invalid (non-card) digit runs
    * survive untouched. Replacement is substring-global per candidate:
    * if a validated card ALSO occurs as a proper infix of a longer digit
    * run in the same document, that infix is masked too — deliberate
    * over-redaction (the safe direction for PII; an occurrence-bounded
    * replace would need lookarounds RE2 does not have). */
  def redactCards(text: Column): Column =
    aggregate(filter(cardCandidates(text), c => luhnValid(c)), text,
      (acc, c) => replace(acc, c, lit("[CARD]")))

  /** Count of PII matches (counted per pattern on the PROGRESSIVELY redacted
    * text, so overlapping patterns never double-count one span). */
  def piiCount(text: Column): Column = {
    val (_, total) = PiiPatterns.foldLeft((text, lit(0L))) {
      case ((t, n), (pat, tag)) =>
        (regexp_replace(t, pat, tag), n + regexp_count(t, lit(pat)).cast("long"))
    }
    total
  }

  /** Rolling-hash fingerprint constants: H = Σ (v_i · B^(i mod 8)) mod M,
    * v_i = 131·len(tok_i) + ascii(first char). */
  val FpBase = 131L
  val FpMod: Long = (1L << 31) - 1
  val FpPowers: Seq[Long] =
    Iterator.iterate(1L)(p => p * FpBase % FpMod).take(8).toSeq

  /** Per-token term of the rolling hash, given token and 0-based position. */
  def fpTerm(tok: Column, pos: Column): Column = {
    val v = length(tok).cast("long") * FpBase + ascii(substring(tok, 1, 1)).cast("long")
    val power = FpPowers.zipWithIndex.foldRight(lit(1L): Column) {
      case ((p, i), acc) => when(pos % 8 === i, lit(p)).otherwise(acc)
    }
    (v * power) % FpMod
  }
}
