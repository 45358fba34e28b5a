package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup extraction — the FIRST transform of every web-crawl
  * pipeline: crawled payloads arrive as markup, and every downstream
  * operator (shingles, language ID, quality, dedup) expects visible
  * text. The reference app never sees markup (its rows are relational),
  * so this is [E] extension surface beside [[UrlCuration]].
  *
  * Everything is per-row codegen'd column work over one scan — a fixed
  * chain of regex/`replace` passes, no shuffle, no state; at 100 TB the
  * cost is exactly one pass of the scan's projection. The regex subset
  * is deliberately RE2-compatible (inline `(?is)` flags, lazy `.*?`,
  * character classes — no backreferences or lookarounds), so the DuckDB
  * oracle replays the identical patterns (`e_html_strip`).
  *
  * Pass order matters and is part of the contract:
  *  1. comments, then `<script>`/`<style>` BLOCKS (content and tags) —
  *     their payload is code, not prose, and must not leak into text;
  *  2. every remaining tag → a single space (so `</p><p>` never glues
  *     two words together);
  *  3. entity decode, `&amp;` LAST — decoding it first would
  *     double-decode `&amp;lt;` into `<`;
  *  4. whitespace collapse + trim.
  */
object Markup {

  private val CommentRe = "(?s)<!--.*?-->"
  private val ScriptRe = "(?is)<script[^>]*>.*?</script>"
  private val StyleRe = "(?is)<style[^>]*>.*?</style>"
  private val TagRe = "<[^>]+>"

  /** Visible text of an HTML column: comments/script/style stripped,
    * tags spaced out, the six ubiquitous entities decoded, whitespace
    * collapsed. */
  def stripHtml(html: Column): Column = {
    // every removed construct becomes a SPACE (collapse dedups later):
    // an empty replacement would glue words adjacent across a comment
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(html,
      CommentRe, " "), ScriptRe, " "), StyleRe, " ")
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** `<title>` payload of an HTML column (first match, tags-inclusive
    * scan; empty string when absent — `regexp_extract` semantics). */
  def title(html: Column): Column =
    regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)

  /** Markup density signal: how many tags (comments count as one) the
    * raw payload carries — the boilerplate-heaviness meter a crawl
    * scorecard reports next to text length. */
  def tagCount(html: Column): Column =
    size(regexp_extract_all(html, lit(TagRe), lit(0))).cast("long")
}
