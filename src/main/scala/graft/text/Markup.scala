package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X42 — markup (HTML) text extraction: the step between the reference's
  * download operator (`/root/reference/data_preparation_plugin/operators/
  * download.py:8-22` fetches raw files) and every text operator in this
  * engine — a crawl corpus arrives as HTML, and dedup/quality/tokenize all
  * assume the markup is gone. This is the deterministic trafilatura-lite:
  * structural boilerplate (head, script, style, comments) is dropped,
  * block boundaries become newlines, tags are stripped, the six
  * ubiquitous named entities are decoded, and whitespace is normalized.
  *
  * Scale + portability contract (the X25 canonicalization rules):
  *  - map-only — a chain of built-in `regexp_replace`/`replace` column
  *    expressions, fused into the parquet scan by whole-stage codegen; no
  *    UDF, no shuffle, no per-row allocation beyond the string rewrites;
  *  - every pattern is in the Java-regex ∩ RE2 intersection (inline (?s)
  *    dotall, non-greedy .*?, character classes — no lookarounds, no
  *    backreferences), so a DuckDB oracle replays the chain verbatim;
  *  - entity decoding runs AFTER tag stripping, with `&amp;` decoded LAST —
  *    the HTML-prescribed order that keeps "&amp;lt;" decoding to the
  *    literal text "&lt;" instead of double-decoding to "<".
  */
object Markup {

  /** Drop an element and its entire contents (non-greedy, dotall,
    * case-insensitive opening tag with optional attributes). */
  private def dropElement(x: Column, tag: String): Column =
    regexp_replace(x, s"(?si)<$tag(\\s[^>]*)?>.*?</$tag>", " ")

  /** Extracted plain text of an HTML/markup document:
    * comments and head/script/style subtrees removed, block-element
    * boundaries (`p`, `div`, `li`, `tr`, `h1..h6`, `br`) turned into
    * newlines, remaining tags stripped to spaces, named entities decoded,
    * horizontal whitespace collapsed, blank edges trimmed. NULL-safe
    * (null → empty string, the `tokens` convention). */
  def extractText(html: Column): Column = {
    var x = coalesce(html, lit(""))
    // comments first: a commented-out <script> must not resurrect later
    x = regexp_replace(x, "(?s)<!--.*?-->", " ")
    // head (title/meta/base live here — navigation chrome, not content),
    // then body-level script/style islands
    x = dropElement(x, "head")
    x = dropElement(x, "script")
    x = dropElement(x, "style")
    // block boundaries → newline BEFORE the generic strip (opening AND
    // closing tags both break — "line c<p>x" is two lines), so
    // "<p>a</p><p>b</p>" yields "a\nb" rather than "a b" — paragraph
    // structure survives for the line-level operators (dedupLines, Gopher
    // bullet/ellipsis rules); the blank-run collapse below merges the
    // doubled breaks at adjacent close+open
    x = regexp_replace(x,
      "(?i)</?(p|div|li|tr|h[1-6]|ul|ol|table)(\\s[^>]*)?>|<br(\\s[^>]*)?/?>",
      "\n")
    // strip every remaining tag (close-of-block already consumed above)
    x = regexp_replace(x, "(?s)<[^>]*>", " ")
    // the six entities that dominate real corpora; &amp; strictly last
    x = regexp_replace(x, "&nbsp;", " ")
    x = regexp_replace(x, "&lt;", "<")
    x = regexp_replace(x, "&gt;", ">")
    x = regexp_replace(x, "&quot;", "\"")
    x = regexp_replace(x, "&#39;", "'")
    x = regexp_replace(x, "&amp;", "&")
    // whitespace normalization: collapse horizontal runs, tidy line edges,
    // collapse blank-line runs, trim the document
    x = regexp_replace(x, "[ \\t]+", " ")
    x = regexp_replace(x, " ?\\n ?", "\n")
    x = regexp_replace(x, "\\n{2,}", "\n")
    x = regexp_replace(x, "^\\s+|\\s+$", "")
    x
  }

  /** X47 — mojibake repair (the ftfy core case): a crawl page authored in
    * UTF-8 but decoded once as Windows-1252 turns every non-ASCII char
    * into its byte-per-char misreading — é becomes "Ã©", ’ becomes
    * "â€™" — and the damage then travels the pipeline as ordinary
    * Unicode text that poisons tokenization, language ID, and dedup
    * canonicalization. The repair table below is DERIVED, not
    * hand-transcribed: for each repaired char, the corrupt form is its
    * UTF-8 bytes decoded through the JVM's windows-1252 charset — the
    * exact transform the broken producer applied — restricted to chars
    * whose every UTF-8 byte lands on a DEFINED printable CP1252 slot
    * (U+201D "”" is out: its 0x9D byte has no CP1252 mapping, so its
    * corrupt form is producer-dependent and can't be repaired by table).
    *
    * Confluence — the honest version: no corrupt pattern is a substring
    * of another (2-byte forms start Ã/Â, 3-byte forms start â, second
    * chars all distinct), so the rules never chew into each other's
    * matches. But repaired chars DO appear inside corrupt patterns —
    * corrupt('–') = "â€“" ends with the repaired char '“', and
    * corrupt('«')/corrupt('»')/corrupt('°') contain their own repaired
    * chars — so the chain is NOT order-independent in general. The
    * repair chain is still exact on in-domain input (text whose
    * non-ASCII content is the byte-level CP1252 misreading of these 17
    * chars): a '“'-repair can only complete a spurious "â€“" match when
    * a dangling "â€" fragment immediately precedes corrupt('“'), and no
    * in-domain corruption produces that fragment (every 3-byte corrupt
    * form carries its third char). The q171 fixture's CORRUPTION fold
    * (fixed → corrupt) additionally relies on table order: '“' is
    * corrupted before '–' so the '“' inside freshly-produced "â€“" is
    * not re-corrupted — MarkupSpec pins both order invariants, so a
    * reordering or extension of this table fails a test instead of
    * silently breaking repair. Idempotent on clean text (every pattern
    * leads with a non-ASCII byte-misread char that clean ASCII/UTF-8
    * text doesn't produce). */
  val mojibakeTable: Seq[(String, String)] = {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    "’“–—…éèêàäöüñç«»°".map { ch =>
      val corrupt = new String(
        ch.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8), cp1252)
      corrupt -> ch.toString
    }
  }

  /** Repair double-encoded (UTF-8 → CP1252) mojibake: one map-only chain
    * of built-in `replace` expressions over [[mojibakeTable]] — codegen'd,
    * shuffle-free, fused into the scan like [[extractText]]. NULL-safe. */
  def fixMojibake(text: Column): Column =
    mojibakeTable.foldLeft(coalesce(text, lit(""))) {
      case (acc, (corrupt, fixed)) => replace(acc, lit(corrupt), lit(fixed))
    }
}
