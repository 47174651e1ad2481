package graft

import graft.operators.Cleaning
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics for the HTML extraction family: the NCR decode
  * (r15, ADVICE r14) and the block-level main-content classifier
  * (VERDICT r14 next-round #2). Corpus-level parity is the
  * q_html_extract / q_main_content oracle's job; these pin the edge
  * rules on hand-built fixtures.
  */
class HtmlExtractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Cleaning.extractHtml(col("h")).as("t"))
      .as[String].head()

  private def main(html: String, minChars: Int = 30): (String, Int, Int) =
    Seq(html).toDF("h")
      .select(Cleaning.extractMainContent(col("h"), minTextChars = minChars).as("m"))
      .select(col("m.main_text"), col("m.n_blocks"), col("m.n_kept"))
      .as[(String, Int, Int)].head()

  test("NCR decode: decimal + hex ASCII, amp-producers last, out-of-range kept") {
    assert(extract("<p>&#72;i &#x77;orld</p>") == "Hi world")
    // &#38;#60; -> the decoded & must NOT start a second decode pass
    assert(extract("<p>a &#38;#60; b</p>") == "a &#60; b")
    assert(extract("<p>&amp;#35; &#9999; &#x1F600;</p>") == "&#35; &#9999; &#x1F600;")
    // the probe gate: no '&#' -> the NCR chain is skipped, base still runs
    assert(extract("<p>a &lt;b&gt; &amp; c</p>") == "a <b> & c")
    // vertical tab collapses like any whitespace (explicit class)
    assert(extract("<p>a\u000bb</p>") == "a b")
  }

  test("main content: link-farm blocks die on density, crumbs on length, " +
    "content with a low-density anchor survives") {
    val page = "<html><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> <a href=\"/c\">Contact</a></nav>" +
      "<h1>Crumb</h1>" +
      "<p>This is the long-form article body that easily clears the minimum " +
      "character threshold and links <a href=\"/x\">once</a> only.</p>" +
      "<footer><a href=\"/p\">Privacy</a> <a href=\"/t\">Terms</a></footer>" +
      "</body></html>"
    val (text, nBlocks, nKept) = main(page)
    assert(nKept == 1 && nBlocks > nKept)
    assert(text.startsWith("This is the long-form article body"))
    assert(text.contains("once"), "anchor TEXT inside a content block is kept")
    assert(!text.contains("Home") && !text.contains("Privacy"))
  }

  test("main content: script bodies containing block tags never split; " +
    "entities decode after classification") {
    val page = "<html><head><script>var a = \"<div><p>\";</script></head><body>" +
      "<p>alpha beta gamma delta epsilon zeta eta theta &#105;ota kappa</p></body></html>"
    val (text, _, nKept) = main(page)
    assert(nKept == 1)
    assert(text == "alpha beta gamma delta epsilon zeta eta theta iota kappa")
  }

  test("main content: a pure-anchor block is 100% link density and dies " +
    "even when long; empty pages yield empty text") {
    val page = "<body><p><a href=\"/x\">a very long anchor label that would " +
      "clear the plain minimum character threshold on its own</a></p></body>"
    val (text, _, nKept) = main(page)
    assert(nKept == 0 && text == "")
    val (t2, _, k2) = main("")
    assert(k2 == 0 && t2 == "")
  }

  // ───────────────── normalizeText (r15) ─────────────────

  private def norm(s: String): String =
    Seq(s).toDF("t").select(Cleaning.normalizeText(col("t")).as("n"))
      .as[String].head()

  test("normalizeText maps unicode punctuation to ASCII and collapses whitespace") {
    assert(norm("\u201Cquoted\u201D and \u2018single\u2019") ==
      "\"quoted\" and 'single'")
    assert(norm("a \u2013 b \u2014 c \u2212 d") == "a - b - c - d")
    assert(norm("wait\u2026 done") == "wait... done")
    // NBSP becomes a plain space and collapses with neighbours;
    // zero-widths vanish entirely (joining their neighbours)
    assert(norm("a\u00A0 b") == "a b")
    assert(norm("zero\u200Bwidth\uFEFFchars\u200C\u200Dgone") ==
      "zerowidthcharsgone")
    assert(norm("  tabs\tand\nnewlines collapse  ") ==
      "tabs and newlines collapse")
  }

  test("normalizeText is idempotent and leaves clean ASCII untouched") {
    val clean = "plain ascii text, with punctuation: all kept!"
    assert(norm(clean) == clean)
    val messy = "\u201Cx\u201D \u2014 y\u2026\u200B"
    assert(norm(norm(messy)) == norm(messy))
  }
}
