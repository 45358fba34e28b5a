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

    /** total rule count — the ladder/join dispatch reads this */
    val totalRules: Int =
      (exactByLabels.values ++ wildcardParentsByLabels.values ++
        exceptionsByLabels.values).map(_.size).sum

    /** deepest label count any rule TESTS (exceptions included) */
    val maxProbeLabels: Int =
      (exactByLabels.keySet ++ wildcardParentsByLabels.keySet ++
        exceptionsByLabels.keySet).maxOption.getOrElse(1)
  }

  /** Rule-count bound for the codegen InSet ladder: the ladder's one-time
    * per-plan compile cost grows with the literal count (measured ~0.6 s
    * at the ~640-rule snapshot list — amortizes fine; the full ~9k-rule
    * published list would multiply it and bloat generated code), so above
    * this bound [[withHost]] resolves domains through
    * [[registrableDomainsByJoin]] instead — same answers, broadcast
    * lookup join instead of generated branches. */
  val LadderRuleLimit: Int = 2000

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

  /** The SCALE path of the public-suffix resolution (round 15): the same
    * publicsuffix.org semantics as [[registrableDomain]], computed with a
    * BROADCAST LOOKUP JOIN instead of a generated InSet ladder — the form
    * that stays cheap when the rule list grows to the full ~9k published
    * rules (codegen size is rule-count-independent; the rules ship as one
    * broadcast table).
    *
    * Plan shape: DISTINCT hosts (one shuffle, hosts ≪ docs) → explode
    * each host's ≤ maxProbeLabels suffix candidates → inner-ish join
    * against the broadcast rule table → one hosts-grain aggregation
    * picking the prevailing rule (deepest exception, else deepest
    * exact/wildcard match, else the default rule) → left join the
    * host→domain map back onto `df`. Work is O(docs) + O(hosts ×
    * maxProbeLabels) with every join against broadcast or host-keyed
    * sides — no step is corpus-quadratic at any scale. */
  def registrableDomainsByJoin(df: DataFrame, hostCol: String,
                               out: String = "domain"): DataFrame = {
    import PublicSuffixList._
    val spark = df.sparkSession
    import spark.implicits._
    // kind: 0 = exact, 1 = wildcard parent (suffix depth k+1), 2 = exception
    val rules = (
      exactByLabels.toSeq.flatMap { case (k, rs) => rs.map(r => (r, k, 0)) } ++
        wildcardParentsByLabels.toSeq.flatMap { case (k, rs) =>
          rs.map(r => (r, k, 1)) } ++
        exceptionsByLabels.toSeq.flatMap { case (k, rs) => rs.map(r => (r, k, 2)) }
      ).toDF("__rule", "__rk", "__kind")
    val hosts = df.select(col(hostCol).as("__host"))
      .filter(col("__host").isNotNull).distinct()
    val parts = split(col("__host"), "\\.")
    val n = size(parts)
    def lastK(k: Int): Column =
      concat_ws(".", (k to 1 by -1).map(i => element_at(parts, -i)): _*)
    val cands = hosts.select(col("__host"), n.as("__n"),
      // the when() keeps element_at from evaluating past the label count
      // (ANSI mode refuses out-of-bounds indices); the filter then drops
      // the null placeholders before the join
      explode(filter(
        array((1 to maxProbeLabels).map(k =>
          struct(lit(k).as("k"),
            when(n >= k, lastK(k)).otherwise(lit(null).cast("string"))
              .as("sfx"))): _*),
        c => c.getField("k") <= n)).as("__c"))
      .select(col("__host"), col("__n"),
        col("__c").getField("k").as("__k"), col("__c").getField("sfx").as("__sfx"))
    // left join: hosts matching NO rule must still resolve (default rule)
    val matched = cands.join(broadcast(rules),
      col("__sfx") === col("__rule") && col("__k") === col("__rk"), "left")
    val agg = matched.groupBy(col("__host"))
      .agg(max(when(col("__kind") === 2, col("__k"))).as("__exck"),
        max(when(col("__kind") === 0, col("__k"))
          .when(col("__kind") === 1, col("__k") + 1)).as("__s"),
        first(col("__n")).as("__hn"))
    val p2 = split(col("__host"), "\\.")
    def lastDyn(k: Column): Column =
      array_join(slice(p2, size(p2) - k + 1, k), ".")
    val sfxLen = coalesce(col("__s"), lit(1)) // default rule: last label
    val resolved = agg.select(col("__host"),
      when(col("__exck").isNotNull, lastDyn(col("__exck")))
        .otherwise(when(col("__hn") > sfxLen, lastDyn(sfxLen + lit(1)))
          .otherwise(col("__host"))).as(out))
    df.join(resolved, df(hostCol) === resolved("__host"), "left")
      .drop("__host")
  }

  /** `df` + a registrable-`domain` column for `hostCol`, dispatched on
    * rule count: the codegen InSet ladder while the shipped rule list is
    * small ([[LadderRuleLimit]]), the broadcast lookup join beyond it —
    * swapping the published full list in changes the PLAN, not the API. */
  def withDomain(df: DataFrame, hostCol: String): DataFrame =
    if (PublicSuffixList.totalRules <= LadderRuleLimit)
      df.withColumn("domain", registrableDomain(col(hostCol)))
    else registrableDomainsByJoin(df, hostCol)

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
  def withHost(docs: DataFrame, urlCol: String): DataFrame =
    withDomain(docs.withColumn("host", host(col(urlCol))), "host")

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
