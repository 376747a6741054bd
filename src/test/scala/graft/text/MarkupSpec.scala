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

  private def fix(s: String): String =
    Seq(s).toDF("t").select(Markup.fixMojibake(col("t"))).as[String].head()

  test("fixMojibake inverts the real byte-level corruption (X47)") {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    // no ” here: U+201D is the documented exclusion (0x9D undefined slot)
    val clean = "l’état — «déjà» “fine… 30° für niño ç"
    // the EXACT transform a broken producer applies: UTF-8 bytes re-read
    // as CP1252 — not the repair table run backwards
    val corrupt = new String(
      clean.getBytes(java.nio.charset.StandardCharsets.UTF_8), cp1252)
    assert(corrupt != clean)
    assert(fix(corrupt) == clean)
  }

  test("fixMojibake is idempotent and ASCII/clean-safe (X47)") {
    val clean = "plain ascii -- nothing to fix; déjà vu stays déjà vu"
    assert(fix(clean) == clean)
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val corrupt = new String(
      clean.getBytes(java.nio.charset.StandardCharsets.UTF_8), cp1252)
    assert(fix(fix(corrupt)) == fix(corrupt))
  }

  test("fixMojibake: table rows are derived, defined-CP1252 only (X47)") {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    Markup.mojibakeTable.foreach { case (corrupt, fixed) =>
      // each corrupt form is exactly the byte-misread of its repaired char
      assert(corrupt == new String(
        fixed.getBytes(java.nio.charset.StandardCharsets.UTF_8), cp1252))
      // and every byte landed on a DEFINED printable slot (no U+FFFD, no
      // C1 controls — the ” exclusion rule)
      assert(!corrupt.exists(c => c == '\ufffd' || (c >= 0x80 && c <= 0x9f)),
        s"corrupt form of '$fixed' crosses an undefined CP1252 slot")
    }
    // null-safe like every text operator
    val n = Seq(Option.empty[String]).toDF("t")
      .select(Markup.fixMojibake(col("t"))).as[String].head()
    assert(n == "")
  }

  test("mojibakeTable order invariants (X47)") {
    val table = Markup.mojibakeTable
    // (1) no corrupt pattern is a substring of another — rules never chew
    // into each other's matches, in either fold direction
    for ((ci, i) <- table.map(_._1).zipWithIndex;
         (cj, j) <- table.map(_._1).zipWithIndex if i != j)
      assert(!cj.contains(ci), s"corrupt pattern $i inside pattern $j")
    // (2) CORRUPTION fold order (the q171 fixture replays fixed → corrupt
    // in table order): a rule's corrupt output must never contain a LATER
    // rule's repaired char, or the later rule would re-corrupt it.
    // '“' ∈ corrupt('–') is why '“' must precede '–'.
    for (i <- table.indices; j <- table.indices if i < j)
      assert(!table(i)._1.contains(table(j)._2),
        s"corrupt('${table(i)._2}') contains the later repaired char " +
          s"'${table(j)._2}' — corruption fold order broken")
    // (3) REPAIR fold: a repaired char inside a LATER corrupt pattern can
    // complete a spurious match only with a dangling context fragment no
    // in-domain corruption produces. Pin the known-analyzed exceptions
    // (self-containment of the 2-byte Â-forms, and '“' ∈ corrupt('–'));
    // a table extension that adds a NEW cross-pattern case must fail here
    // and get the same analysis before shipping.
    val cross = for {
      i <- table.indices; j <- table.indices
      if i != j && table(j)._1.contains(table(i)._2)
    } yield (table(i)._2, table(j)._2)
    assert(cross == Seq(("“", "–")),
      s"unexpected repaired-char-inside-corrupt-pattern pairs: $cross — " +
        "re-derive the order analysis in Markup.mojibakeTable's scaladoc")
    // and the one known case is ordered safely for the corruption fold
    val idx = table.map(_._2).zipWithIndex.toMap
    assert(idx("“") < idx("–"), "'“' must precede '–' in the table")
  }
}
