package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def text1(s: String): String =
    Seq(s).toDF("h").select(Html.htmlToText(col("h"))).as[String].head()
  private def title1(s: String): String =
    Seq(s).toDF("h").select(Html.htmlTitle(col("h"))).as[String].head()
  private def links1(s: String): Seq[String] =
    Seq(s).toDF("h").select(Html.htmlLinks(col("h"))).as[Seq[String]].head()

  test("script/style/comment payloads are removed, not flattened into text") {
    val h = """<html><head><style>body { color: red; }</style></head>
      |<body><!-- secret --><script type="text/javascript">if (1 < 2) { alert("x&y"); }</script>
      |<p>visible</p></body></html>""".stripMargin
    assert(text1(h) == "visible")
  }

  test("block closers become line breaks; inline tags become spaces") {
    val h = "<div>one</div><p>two <b>bold</b> end</p><ul><li>a</li><li>b</li></ul>tail"
    assert(text1(h) == "one\ntwo bold end\na\nb\ntail")
  }

  test("<br> breaks a line without a closing tag") {
    assert(text1("first<br>second<br/>third") == "first\nsecond\nthird")
  }

  test("entities decode in the lossless order (&amp; last)") {
    assert(text1("<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;b &amp;&amp; c</p>") ==
      "a <tag> \"q\" 's' b && c")
    // double-escaped entity stays escaped: &amp;lt; -> &lt; (not <)
    assert(text1("<p>&amp;lt;</p>") == "&lt;")
  }

  test("whitespace collapses: runs to one space, newline clusters to one newline") {
    assert(text1("<div>  a   b\t c  </div>\n\n  <div>d</div>") == "a b c\nd")
  }

  test("title extraction decodes entities and collapses whitespace") {
    val h = "<html><head><title>  My &amp; Your\n  Page </title></head><body>x</body></html>"
    assert(title1(h) == "My & Your\nPage")
    assert(title1("<body>no title</body>") == "")
  }

  test("links come out in document order with entities decoded") {
    val h = """<a href="https://a.example/p?x=1&amp;y=2">one</a>
      |<a class="nav" href="/rel/2.html">two</a>
      |<a name="anchor-without-href">three</a>""".stripMargin
    assert(links1(h) == Seq("https://a.example/p?x=1&y=2", "/rel/2.html"))
  }

  test("null html stays null; empty html gives empty text") {
    val r = Seq[Option[String]](None, Some("")).toDF("h")
      .select(Html.htmlToText(col("h"))).as[Option[String]].collect().toSeq
    assert(r == Seq(None, Some("")))
  }

  test("adjacent comments and scripts never fuse (lazy bodies)") {
    assert(text1("<!-- a -->keep1<!-- b -->keep2") == "keep1 keep2")
    assert(text1("<script>a</script>mid<script>b</script>") == "mid")
  }

  test("extraction stays whole-stage-codegen eligible (built-ins only)") {
    val df = spark.range(4).select(
      concat(lit("<p>doc "), col("id"), lit("</p>")).as("h"))
      .select(Html.htmlToText(col("h")).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.startsWith("*(1) Project"), plan) // *(n) = inside WholeStageCodegen
  }
}
