package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlCurationSpec extends SparkSpec {

  import spark.implicits._

  test("host parse strips scheme, port, path and query; domain keeps last two labels") {
    val got = Seq(
        "https://www.en.src3.org:8080/en/120?ref=rss",
        "http://de.src7.org/de/55",
        "http://single/p")
      .toDF("url")
      .select($"url", UrlCuration.host($"url").as("host"))
      .withColumn("domain", UrlCuration.registrableDomain($"host"))
      .as[(String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("https://www.en.src3.org:8080/en/120?ref=rss") ==
      (("www.en.src3.org", "src3.org")))
    assert(got("http://de.src7.org/de/55") == (("de.src7.org", "src7.org")))
    assert(got("http://single/p") == (("single", "single")))
  }

  private def dom(host: String): String =
    Seq(host).toDF("host")
      .select(UrlCuration.registrableDomain($"host").as("d")).as[String].head()

  test("full PSL grammar: exact, wildcard, exception, deep rules, passthrough") {
    // 2-label exact rule
    assert(dom("news.bbc.co.uk") == "bbc.co.uk")
    assert(dom("bbc.co.uk") == "bbc.co.uk")
    assert(dom("co.uk") == "co.uk", "a bare public suffix passes through")
    // wildcard *.ck: every <label>.ck is a public suffix
    assert(dom("shop.foo.ck") == "shop.foo.ck")
    assert(dom("a.b.foo.ck") == "b.foo.ck")
    assert(dom("foo.ck") == "foo.ck", "foo.ck IS a public suffix under *.ck")
    // exception !www.ck carves the domain back out
    assert(dom("www.ck") == "www.ck")
    assert(dom("sub.www.ck") == "www.ck")
    // 2-label wildcard parent *.nagoya.jp and its exception
    assert(dom("x.blog.site.nagoya.jp") == "blog.site.nagoya.jp")
    assert(dom("www.city.nagoya.jp") == "city.nagoya.jp")
    assert(dom("city.nagoya.jp") == "city.nagoya.jp")
    // plain co.jp rule still wins at its depth
    assert(dom("shop.rakuten.co.jp") == "rakuten.co.jp")
    // 3- and 4-label exact rules (US K-12 hierarchy)
    assert(dom("school.district.k12.ma.us") == "district.k12.ma.us")
    assert(dom("x.academy.pvt.k12.ma.us") == "academy.pvt.k12.ma.us")
    assert(dom("academy.pvt.k12.ma.us") == "academy.pvt.k12.ma.us")
    // default rule: unlisted TLD keeps last two labels
    assert(dom("www.news.example.org") == "example.org")
    assert(dom("single") == "single")
  }

  test("the rule tables parse into label-count partitions with every rule kind present") {
    import UrlCuration.PublicSuffixList._
    assert(exactByLabels(2).contains("co.uk"))
    assert(exactByLabels(3).contains("k12.ma.us"))
    assert(exactByLabels(4).contains("pvt.k12.ma.us"))
    assert(wildcardParentsByLabels(1).contains("ck"))
    assert(wildcardParentsByLabels(2).contains("nagoya.jp"))
    assert(exceptionsByLabels(2) == Seq("www.ck"))
    assert(exceptionsByLabels(3).contains("city.nagoya.jp"))
    assert(maxSuffixLabels == 4)
    assert(UrlCuration.PublicSuffixes.contains("com.au"))
  }

  test("domainFilter drops blocked registrable domains, keeps the rest") {
    val docs = Seq(
        (1L, "http://a.keep.org/x"),
        (2L, "http://www.bad.org/y"),
        (3L, "http://deep.sub.bad.org/z"),
        (4L, "http://bad.org.keep.org/w")) // domain keep.org — NOT blocked
      .toDF("doc_id", "url")
    val kept = UrlCuration.domainFilter(docs, "url", Seq("bad.org"))
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L), s"blocklist must hit 2 and 3: $kept")
  }

  test("hostScorecard aggregates docs/tokens/dup-rate per host") {
    val docs = Seq(
        (1L, "http://a.x.org/1", "en", "one two three"),
        (2L, "http://a.x.org/2", "de", "one two three"),   // exact dup of 1
        (3L, "http://a.x.org/3", "en", "four five"),
        (4L, "http://b.y.org/1", "fr", "six"))
      .toDF("doc_id", "url", "lang", "text")
    val rows = UrlCuration.hostScorecard(docs, "url", "text").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rows("a.x.org")
    assert(a.getString(1) == "x.org")
    assert(a.getLong(2) == 3L && a.getLong(3) == 8L) // 3 docs, 3+3+2 tokens
    assert(a.getLong(4) == 2L && a.getLong(5) == 2L) // 2 langs, 2 distinct texts
    assert(math.abs(a.getDouble(6) - 0.333333) < 1e-9)
    val b = rows("b.y.org")
    assert(b.getLong(2) == 1L && b.getDouble(6) == 0.0)
  }

  private def canon(url: String): String =
    Seq(url).toDF("url")
      .select(UrlCuration.canonicalUrl($"url").as("c")).as[String].head()

  test("canonicalUrl collapses scheme/www/default-port/slash/fragment variants") {
    val variants = Seq(
      "http://a.org/p/3",
      "https://a.org/p/3",
      "https://WWW.A.org:443/p/3/",
      "http://www.a.org:80/p/3#frag")
    assert(variants.map(canon).distinct == Seq("a.org/p/3"))
  }

  test("canonicalUrl keeps a nonstandard port — it is identity-bearing") {
    assert(canon("http://a.org:8080/p") == "a.org:8080/p")
  }

  test("canonicalUrl drops tracking params, sorts survivors, empties cleanly") {
    assert(canon("http://a.org/p?utm_source=x&id=7&ref=rss") == "a.org/p?id=7")
    assert(canon("http://a.org/p?b=2&a=1") == "a.org/p?a=1&b=2")
    assert(canon("http://a.org/p?utm_medium=social") == "a.org/p")
    // root path alone normalizes away; bare host is already canonical
    assert(canon("https://www.a.org/") == "a.org")
  }

  test("broadcast-lookup-join PSL path == codegen ladder on every rule kind (round 15)") {
    // one host per rule regime, plus edge shapes: a bare public suffix,
    // a single label, a host equal to a wildcard parent, deep subdomains
    val hosts = Seq(
      "a.b.c.example.org", "example.org", "org",
      "www.example.co.uk", "example.co.uk", "co.uk",
      "deep.shop.foo.ck", "shop.foo.ck", "foo.ck", "ck",
      "www.ck", "sub.www.ck",
      "x.pvt.k12.ma.us", "y.x.pvt.k12.ma.us", "pvt.k12.ma.us",
      "a.blog.z.nagoya.jp", "blog.z.nagoya.jp", "z.nagoya.jp", "nagoya.jp",
      "www.city.nagoya.jp", "city.nagoya.jp",
      "single", "a.com.au", "b.a.com.au")
    val df = hosts.toDF("host")
    val ladder = df
      .select($"host", UrlCuration.registrableDomain($"host").as("domain"))
      .as[(String, String)].collect().toMap
    val joined = UrlCuration.registrableDomainsByJoin(df, "host")
      .select($"host", $"domain").as[(String, String)].collect().toMap
    assert(joined == ladder,
      s"scale path must equal the ladder; diff: ${
        (ladder.keySet ++ joined.keySet).filter(k =>
          ladder.get(k) != joined.get(k))
          .map(k => s"$k: ladder=${ladder.get(k)} join=${joined.get(k)}")
          .mkString(", ")}")
    // null hosts survive both paths as null domains
    val withNull = Seq(Option("example.org"), Option.empty[String]).toDF("host")
    assert(UrlCuration.registrableDomainsByJoin(withNull, "host")
      .filter($"host".isNull).select($"domain").as[Option[String]]
      .collect().toSeq == Seq(None))
  }
}
