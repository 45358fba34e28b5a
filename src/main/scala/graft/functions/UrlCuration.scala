package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/host-grain curation — the first operator family a web-crawl
  * curator reaches for: real corpora key on the URL host (per-host crawl
  * budgets, domain blocklists, host-level quality scorecards), not on an
  * upstream `source` tag.
  *
  * Everything is per-row codegen'd column work over one scan (the host
  * parse is Spark's built-in `parse_url`, itself codegen'd) plus one
  * hosts-bounded aggregation for the scorecard — no shuffle wider than
  * the host rollup at any corpus size. Blocklists ship as broadcast
  * literals (an `isin` InSet probe); a million-entry production blocklist
  * would swap in a broadcast semi-join on the same `domain` column
  * without touching the rest of the plan. */
object UrlCuration {

  /** Host of a URL (`parse_url(url, 'HOST')`): scheme, port, path and
    * query stripped. Null for unparseable URLs — filter or coalesce
    * downstream. */
  def host(url: Column): Column = parse_url(url, lit("HOST"))

  /** Full public-suffix rule set (round 14): the complete
    * publicsuffix.org rule GRAMMAR — exact rules up to 4 labels,
    * wildcard rules (`*.ck` makes every `<label>.ck` a public suffix),
    * and exception rules (`!www.ck` carves `www.ck` back out as a
    * registrable domain) — parsed from the shipped snapshot resource
    * `graft/public_suffix_list.dat` (the published list's own line
    * format, so swapping in the full ~9k-rule file is a data change
    * only). Rules are partitioned by label count at class-load; the
    * per-row probes below are InSet memberships over these broadcast
    * literal sets. */
  object PublicSuffixList {
    val (exactByLabels, wildcardParentsByLabels, exceptionsByLabels):
        (Map[Int, Seq[String]], Map[Int, Seq[String]], Map[Int, Seq[String]]) = {
      val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
      require(in != null, "graft/public_suffix_list.dat resource missing")
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toVector
        finally in.close()
      def byLabels(rs: Seq[String]) =
        rs.distinct.groupBy(_.count(_ == '.') + 1)
          .view.mapValues(_.sorted).toMap
      (byLabels(lines.filterNot(l => l.startsWith("!") || l.startsWith("*."))),
        byLabels(lines.filter(_.startsWith("*.")).map(_.stripPrefix("*."))),
        byLabels(lines.filter(_.startsWith("!")).map(_.stripPrefix("!"))))
    }
    /** deepest public-suffix label count any rule can produce */
    val maxSuffixLabels: Int =
      ((exactByLabels.keySet - 1) ++ wildcardParentsByLabels.keySet.map(_ + 1))
        .maxOption.getOrElse(1)
  }

  /** Two-label public suffixes — the slice of [[PublicSuffixList]] the
    * SQL oracle mirrors with a flat IN list (the only rule depth the
    * derived-URL fixtures exercise; `e_psl_domains` grades the full
    * grammar against hand-derived expectations). */
  val PublicSuffixes: Seq[String] =
    PublicSuffixList.exactByLabels.getOrElse(2, Seq.empty)

  /** Registrable domain under the full [[PublicSuffixList]] rule set,
    * per the publicsuffix.org algorithm: the prevailing rule is the
    * matching EXCEPTION if any, else the matching rule with the MOST
    * labels (wildcard `*` consumes exactly one label), else the default
    * rule (last label); the registrable domain is the public suffix
    * plus one label — `news.bbc.co.uk` → `bbc.co.uk`,
    * `shop.foo.ck` → `shop.foo.ck` (`*.ck` makes `foo.ck` the suffix),
    * `www.ck` → `www.ck` (the `!www.ck` exception),
    * `x.pvt.k12.ma.us` → `x.pvt.k12.ma.us` (4-label exact rule). A host
    * that IS a public suffix (or has a single label) passes through.
    * Pure codegen'd per-row work: one bounded when-ladder of InSet
    * probes over the broadcast literal rule sets — O(maxRuleDepth)
    * checks per row, corpus-size-independent. */
  def registrableDomain(hostCol: Column): Column = {
    import PublicSuffixList._
    val parts = split(hostCol, "\\.")
    val n = size(parts)
    def lastK(k: Int): Column =
      concat_ws(".", (k to 1 by -1).map(i => element_at(parts, -i)): _*)
    val cases = Seq.newBuilder[(Column, Column)]
    // exception rules outrank everything: the matching exception IS the
    // registrable domain (its public suffix = the exception minus its
    // leftmost label)
    exceptionsByLabels.keys.toSeq.sorted.reverse.foreach { k =>
      cases += ((n >= k && lastK(k).isin(exceptionsByLabels(k): _*), lastK(k)))
    }
    // deepest matching rule wins: suffix length s from an s-label exact
    // rule or an (s-1)-label wildcard parent
    (maxSuffixLabels to 2 by -1).foreach { s =>
      val conds =
        exactByLabels.get(s).map(v => lastK(s).isin(v: _*)).toSeq ++
          wildcardParentsByLabels.get(s - 1).map(v => lastK(s - 1).isin(v: _*))
      if (conds.nonEmpty) {
        val cond = conds.reduce(_ || _)
        cases += ((n >= s + 1 && cond, lastK(s + 1)))
        cases += ((n === s && cond, hostCol)) // host IS a public suffix
      }
    }
    val ladder = cases.result().foldLeft(Option.empty[Column]) {
      case (None, (c, v)) => Some(when(c, v))
      case (Some(acc), (c, v)) => Some(acc.when(c, v))
    }.get
    ladder.when(n >= 2, lastK(2)).otherwise(hostCol) // default rule '*'
  }

  /** Query parameters dropped by [[canonicalUrl]] — the tracking noise
    * (utm campaign tags, click ids, referrer tags) that makes one page
    * arrive under dozens of raw URLs in a real crawl. */
  private val TrackingParamRe =
    "^(utm_[^=]*|ref|fbclid|gclid|mc_cid|mc_eid)(=.*)?$"

  /** Canonical dedup KEY of a URL — the normalization a crawl dedup runs
    * before any content hashing, collapsing the raw-URL variants that
    * all name one page:
    *  - fragment dropped, scheme dropped (http/https collapse);
    *  - host lowercased, leading `www.` stripped, default ports
    *    (`:80`/`:443`) stripped (a nonstandard port is identity-bearing
    *    and stays);
    *  - trailing path slashes stripped (`/` alone → empty);
    *  - tracking parameters removed ([[TrackingParamRe]]) and the
    *    survivors SORTED, so parameter order never splits a page.
    *
    * Pure per-row codegen'd column work (`parse_url` + regex + a
    * per-row bounded array sort over the query params) — no shuffle; the
    * dedup itself is whatever keyed aggregation consumes the column.
    * Returns a key, not a fetchable URL (the scheme is gone) — join the
    * keeper's raw URL back for display. */
  def canonicalUrl(url: Column): Column = {
    // Components by codegen'd regex, not parse_url: ParseUrl is a
    // CodegenFallback that URI-parses per CALL (four calls here would
    // interpret-eval four parses per row); one anchored regex per
    // component keeps the projection in generated code and measured
    // ~4× cheaper at sf0.1. The split mirrors the oracle's split_part
    // chain exactly.
    val rest = regexp_replace(regexp_replace(url, "#.*$", ""),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val auth = regexp_extract(rest, "^([^/?]+)", 1)
    val hostC = regexp_replace(lower(regexp_extract(auth, "^([^:]+)", 1)),
      "^www\\.", "")
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val portC = when(port.isin("", "80", "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_extract(rest, "^[^/?]+(/[^?]*)?", 1)
    val pathC = when(path0 === "/", lit(""))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val q0 = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = filter(split(q0, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val qC = when(q0 === "" || size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(kept), "&")))
    concat(hostC, portC, pathC, qC)
  }

  /** `docs` with `host` and `domain` columns appended — the shared
    * projection the filter and scorecard both start from. */
  def withHost(docs: DataFrame, urlCol: String): DataFrame = {
    val h = host(col(urlCol))
    docs.withColumn("host", h)
      .withColumn("domain", registrableDomain(col("host")))
  }

  /** Domain blocklist filter: drop every document whose registrable
    * domain is blocked. The membership probe is an InSet over the
    * broadcast literal list — one O(1) check per row. */
  def domainFilter(docs: DataFrame, urlCol: String,
                   blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "an empty blocklist filters nothing")
    withHost(docs, urlCol).filter(!col("domain").isin(blocked: _*))
  }

  /** Per-host curation scorecard — the host-grain sibling of the
    * per-source scorecard: document count, total whitespace tokens,
    * language spread, exact-duplicate rate (canonical md5 of the text),
    * and the registrable domain each host rolls up to. One scan + one
    * hosts-bounded aggregation (map-side combined; the distinct counts
    * plan one Expand, the honest cost of exact cardinalities — swap
    * approx_count_distinct into the same shape at 100 TB). */
  def hostScorecard(docs: DataFrame, urlCol: String,
                    textCol: String): DataFrame =
    withHost(docs, urlCol)
      .select(col("host"), col("domain"), col("lang"),
        TextAnalysis.unicodeTokenCount(col(textCol)).as("toks"),
        md5(trim(lower(col(textCol)))).as("h"))
      .groupBy(col("host"))
      .agg(first(col("domain")).as("domain"),
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("h")).as("n_distinct_texts"),
        round(lit(1.0) - countDistinct(col("h")).cast("double") /
          count(lit(1)).cast("double"), 6).as("exact_dup_rate"))
      .orderBy("host")
}
