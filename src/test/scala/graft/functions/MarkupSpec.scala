package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarkupSpec extends SparkSpec {

  private def strip(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Markup.stripHtml(col("h")).as("c"))
      .as[String].head()
  }

  test("script/style/comment payloads never leak, even with a bare < inside") {
    val html = "<body><script>if (1 < 2) { x(); }</script>" +
      "<style>p > a { color: red }</style><!-- secret -->visible</body>"
    assert(strip(html) == "visible")
  }

  test("tag boundaries become spaces — adjacent elements never glue words") {
    assert(strip("<p>alpha</p><p>beta</p>") == "alpha beta")
    // comments space out too — foo<!-- x -->bar must not fuse
    assert(strip("foo<!-- sep -->bar") == "foo bar")
  }

  test("entity decode order: &amp;lt; stays literal &lt;, plain &lt; decodes") {
    assert(strip("a &amp;lt; b &lt; c &quot;d&quot; &#39;e&#39;&nbsp;f") ==
      "a &lt; b < c \"d\" 'e' f")
  }

  test("whitespace collapses and trims") {
    assert(strip("  <div>\n  spaced \t words </div>  ") == "spaced words")
  }

  test("title extraction; empty when absent") {
    import spark.implicits._
    val r = Seq("<head><TITLE lang=x>My Page</TITLE></head>", "<p>no</p>")
      .toDF("h").select(Markup.title(col("h")).as("t")).as[String].collect()
    assert(r.toSeq == Seq("My Page", ""))
  }

  test("tagCount counts tags and comments, not text") {
    import spark.implicits._
    val r = Seq("<p>a</p><!-- c --><br/>plain")
      .toDF("h").select(Markup.tagCount(col("h")).as("n")).as[Long].head()
    assert(r == 4) // <p>, </p>, the comment, <br/>
  }
}
