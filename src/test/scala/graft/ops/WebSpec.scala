package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("h").select(Web.htmlToText(col("h"))).head().getString(0)

  private def canon(s: String): String =
    Seq(s).toDF("u").select(Web.canonicalUrl(col("u"))).head().getString(0)

  test("html: scripts/styles/comments vanish wholesale, tags become spaces") {
    assert(strip("<p>a<script>if(1<2){x}</script>b</p>") == "a b")
    assert(strip("<style>p > a {}</style>text") == "text")
    assert(strip("x<!-- <p>never</p> -->y") == "x y")
    assert(strip("<div class=\"a\"><span>inner</span></div>") == "inner")
  }

  test("html: entities decode, &amp; last (no double decode)") {
    assert(strip("Tom &amp; Jerry &lt;3") == "Tom & Jerry <3")
    assert(strip("&amp;lt;") == "&lt;") // one level only
    assert(strip("a&nbsp;b &quot;c&quot; &#39;d&#39;") == "a b \"c\" 'd'")
  }

  test("html: multiline script bodies and null input") {
    assert(strip("a<script>\nvar x;\n</script>b") == "a b")
    val r = Seq[(Int, String)]((1, null)).toDF("i", "h")
      .select(Web.htmlToText(col("h"))).head().getString(0)
    assert(r == "")
  }

  test("url: host lowercases, path case preserved") {
    assert(canon("HTTPS://Example.COM/Path/X") ==
      "https://example.com/Path/X")
  }

  test("url: fragments drop, tracking params drop wherever they sit") {
    assert(canon("https://a.com/p#sec") == "https://a.com/p")
    assert(canon("https://a.com/p?utm_source=x") == "https://a.com/p")
    assert(canon("https://a.com/p?utm_source=x&id=7") ==
      "https://a.com/p?id=7")
    assert(canon("https://a.com/p?id=7&fbclid=z&x=1") ==
      "https://a.com/p?id=7&x=1")
    assert(canon("https://a.com/p?gclid=a&utm_b=c") == "https://a.com/p")
  }

  test("url: non-tracking params and schemeless strings survive") {
    assert(canon("https://a.com/p?q=Hello&page=2") ==
      "https://a.com/p?q=Hello&page=2")
    assert(canon("not a url") == "not a url")
  }
}
