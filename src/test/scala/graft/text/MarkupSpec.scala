package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MarkupSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Markup.extractText(col("h"))).as[String].head()

  test("extractText strips head/script/style/comments, keeps content (X42)") {
    val html = "<html><head><title>Nav Title</title><style>p{x}</style></head>" +
      "<body><script>if (1 < 2) alert('hi');</script>" +
      "<p>First para.</p><p>Second para.</p>" +
      "<div class=\"footer\">Contact &amp; Legal &lt;info&gt;</div></body></html>"
    assert(extract(html) == "First para.\nSecond para.\nContact & Legal <info>")
  }

  test("extractText: block tags become newlines, inline tags spaces (X42)") {
    val html = "<h1>Title</h1><ul><li>one</li><li>two</li></ul>" +
      "line a<br/>line b<br >line c<p>x <b>bold</b> y</p>"
    assert(extract(html) == "Title\none\ntwo\nline a\nline b\nline c\nx bold y")
  }

  test("extractText decodes entities after tag strip, &amp; last (X42)") {
    // "&amp;lt;" must become the literal text "&lt;", never "<"
    assert(extract("<p>a &amp;lt; b &quot;q&quot; c&#39;s&nbsp;d</p>")
      == "a &lt; b \"q\" c's d")
  }

  test("extractText: commented-out script does not resurrect; null is empty (X42)") {
    assert(extract("<!-- <script> --><p>ok</p><!-- </script> -->") == "ok")
    val n = Seq(Option.empty[String]).toDF("h")
      .select(Markup.extractText(col("h"))).as[String].head()
    assert(n == "")
  }

  test("extractText collapses whitespace and blank-line runs (X42)") {
    assert(extract("<p>a   b</p>\n\n\n<p>c\t\td</p>") == "a b\nc d")
  }
}
