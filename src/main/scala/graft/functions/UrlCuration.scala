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

  /** Trimmed public-suffix lexicon (round 13, filling the documented
    * slot): the widely-used two-label registry suffixes under which
    * domains are registered — `a.co.uk` and `b.co.uk` are DIFFERENT
    * registrable domains, which the last-two-label heuristic collapsed.
    * This is the publicsuffix.org model at broadcast-literal scale: the
    * full list (~9k rules incl. wildcards/exceptions) would ship as a
    * broadcast lookup table joined on the candidate suffix without
    * changing the column shape; the subset below covers the major ccTLD
    * registries a web crawl actually hits, and every UNLISTED suffix
    * falls back to the last-two-label rule. */
  val PublicSuffixes: Seq[String] = Seq(
    // UK / IE
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "me.uk",
    // Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz",
    // Japan / Korea / China / Taiwan / Hong Kong / Singapore
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "co.kr", "ne.kr", "or.kr", "ac.kr", "go.kr",
    "com.cn", "net.cn", "org.cn", "edu.cn", "gov.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    // India / South Africa / Israel / Turkey
    "co.in", "net.in", "org.in", "ac.in", "gov.in", "res.in",
    "co.za", "net.za", "org.za", "ac.za", "gov.za", "web.za",
    "co.il", "org.il", "net.il", "ac.il", "gov.il",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    // Latin America
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe",
    "com.ve", "net.ve", "org.ve", "co.ve",
    "com.cl", "cl.cl",
    // Europe (multi-label registries)
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.pt", "edu.pt", "gov.pt", "org.pt",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.ro", "org.ro", "nt.ro",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "kiev.ua",
    // Egypt / Saudi / UAE / Indonesia / Malaysia / Philippines /
    // Thailand / Vietnam / Pakistan / Bangladesh / Nigeria / Kenya
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa",
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
    "co.ke", "or.ke", "ne.ke", "ac.ke", "go.ke")

  /** Registrable domain under the [[PublicSuffixes]] lexicon: when the
    * host's last TWO labels form a listed public suffix (and a third
    * label exists), the registrable domain is the last THREE labels
    * (`news.bbc.co.uk` → `bbc.co.uk`); otherwise the last-two-label rule
    * applies (`www.news.example.org` → `example.org`). Hosts with fewer
    * than two labels pass through. Pure codegen'd per-row work: the
    * lexicon probe is an InSet membership over the broadcast literal
    * list — one O(1) check per row, same cost class as the old
    * heuristic. */
  def registrableDomain(hostCol: Column): Column = {
    val parts = split(hostCol, "\\.")
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), element_at(parts, -2),
      element_at(parts, -1))
    when(size(parts) >= 3 && last2.isin(PublicSuffixes: _*), last3)
      .when(size(parts) >= 2, last2)
      .otherwise(hostCol)
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
