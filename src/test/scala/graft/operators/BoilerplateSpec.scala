package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Main-content extraction: block segmentation at block-level tags,
  * per-block text/link density, content = long AND link-sparse. Every
  * expectation here is hand-computed from the rule, not replayed. */
class BoilerplateSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def extract(html: String, minChars: Int = 25,
      maxLinkPct: Int = 33): (String, Int, Int) = {
    val r = Boilerplate.withMainContent(
      Seq((1L, html)).toDF("doc_id", "html"), "html",
      minChars = minChars, maxLinkPct = maxLinkPct).collect().head
    (r.getAs[String]("main_text"), r.getAs[Int]("n_content_blocks"),
      r.getAs[Int]("n_boiler_blocks"))
  }

  test("nav, cookie banner, footer, and sub-minimum blocks are " +
    "dropped; prose paragraphs survive in order") {
    val html =
      "<html><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
        "<a href=\"/contact\">Contact</a></nav>" +
        "<div class=\"cookie-banner\">This site uses cookies. " +
        "<a href=\"/privacy\">Learn more</a> <a href=\"/accept\">Accept</a> " +
        "<a href=\"/reject\">Reject</a> <a href=\"/settings\">Settings</a></div>" +
        "<p>This is the actual long main content of the page, which " +
        "goes on for a while and says things.</p>" +
        "<p>Ok.</p>" +
        "<footer><a href=\"/terms\">Terms of Use</a> " +
        "<a href=\"/privacy\">Privacy Policy</a></footer>" +
        "</body></html>"
    val (main, nContent, nBoiler) = extract(html)
    main shouldBe "This is the actual long main content of the page, " +
      "which goes on for a while and says things."
    nContent shouldBe 1
    // nav txt, cookie txt, "Ok.", footer txt — all non-empty, all judged
    // chrome (anchor-dense or under minChars)
    nBoiler shouldBe 4
  }

  test("a long paragraph keeps its INLINE link and still counts as " +
    "content (density under the ceiling)") {
    val html = "<p>A genuinely long paragraph of real prose that talks " +
      "about a topic at length. See <a href=\"/ref\">the reference</a> " +
      "for details.</p>"
    val (main, nContent, _) = extract(html)
    nContent shouldBe 1
    main should include("See the reference for details.")
  }

  test("link-density boundary is exact integer math: alen*100 <= " +
    "pct*tlen keeps the block, one char past drops it") {
    // txt = "xxxxxxxxxxxxxxxxxxxx yyyyyyyyy" (30 chars), anchor "yyyyyyyyy"
    // twice the anchor len by varying y-count: alen*100 <= 33*30=990
    // alen=9 -> 900 keep; alen=10 (tlen 31, 33*31=1023 vs 1000) keep;
    // use pct=30: alen=9, tlen=30 -> 900 <= 900 keep; tlen=29 -> 870 drop
    val mk = (pad: Int) => s"<p>${"x" * pad} <a href=\"/z\">yyyyyyyyy</a></p>"
    // tlen = pad + 1 + 9
    val (_, kept30, _) = extract(mk(20), minChars = 5, maxLinkPct = 30)
    kept30 shouldBe 1 // alen*100 = 900 == 30*30
    val (_, kept29, _) = extract(mk(19), minChars = 5, maxLinkPct = 30)
    kept29 shouldBe 0 // 900 > 30*29 = 870
  }

  test("a boilerplate-only page yields the empty string, not null") {
    val (main, nContent, nBoiler) = extract(
      "<nav><a href=\"/a\">A</a> <a href=\"/b\">B</a></nav>" +
        "<footer><a href=\"/c\">C</a></footer>")
    main shouldBe ""
    nContent shouldBe 0
    nBoiler shouldBe 2
  }

  test("blocks split at block-level tags only — inline markup stays " +
    "inside its block; <br> is a boundary") {
    val html = "<p>first long enough paragraph with <b>bold</b> prose " +
      "inside it<br>second long enough paragraph after a line break</p>"
    val (main, nContent, _) = extract(html)
    nContent shouldBe 2
    main shouldBe "first long enough paragraph with bold prose inside " +
      "it\nsecond long enough paragraph after a line break"
  }

  test("multi-line anchors count fully toward link density ((?is))") {
    val html = "<li><a href=\"/x\">a navigation entry\nspanning two " +
      "lines right here</a></li>"
    val (_, nContent, nBoiler) = extract(html, minChars = 10)
    nContent shouldBe 0
    nBoiler shouldBe 1
  }

  test("withMainContent fails loudly on reserved-column collisions") {
    val bad = Seq((1L, "<p>x</p>", "y")).toDF("doc_id", "html", "main_text")
    val e = intercept[IllegalArgumentException] {
      Boilerplate.withMainContent(bad, "html")
    }
    e.getMessage should include("main_text")
    intercept[IllegalArgumentException] {
      Boilerplate.withMainContent(bad.drop("main_text")
        .withColumn("__metas", org.apache.spark.sql.functions.lit(1)),
        "html")
    }
  }

  test("threshold guards reject nonsense parameters") {
    val df = Seq((1L, "<p>x</p>")).toDF("doc_id", "html")
    intercept[IllegalArgumentException] {
      Boilerplate.withMainContent(df, "html", minChars = 0)
    }
    intercept[IllegalArgumentException] {
      Boilerplate.withMainContent(df, "html", maxLinkPct = 101)
    }
  }

  test("frequentBlocks + withBlockFrequencyStats: hand-computed corpus") {
    // footer in all 4 docs, nav in 3, body text unique per doc
    val docs = Seq(
      (1L, "<nav>Home About</nav><p>unique one</p><footer>Terms</footer>"),
      (2L, "<nav>Home About</nav><p>unique two</p><footer>Terms</footer>"),
      (3L, "<nav>Home About</nav><footer>Terms</footer>"),
      // nav repeated TWICE in one doc: distinct-per-doc must count it once
      (4L, "<p>unique four</p><footer>Terms</footer>" +
        "<div>solo block</div><div>solo block</div>")
    ).toDF("doc_id", "html")
    val freq = Boilerplate.frequentBlocks(docs, "doc_id", "html", 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq == Map("Home About" -> 3L, "Terms" -> 4L))
    // doc 4: blocks = [unique four, Terms, solo block, solo block]
    // (solo appears twice in ONE doc -> n_docs=1, not frequent)
    val ratios = Boilerplate.withBlockFrequencyStats(
        docs, "doc_id", "html", 3L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ratios == Map(
      1L -> (3L, 2L), 2L -> (3L, 2L), 3L -> (2L, 2L), 4L -> (4L, 1L)))
  }

  test("structureStats: hand-counted layout profile") {
    val html = "<html><body><H1>T</H1><table><tr><td>a</td></tr></table>" +
      "<ul><li>x</li><li><a href=\"/y\">y</a></li></ul>" +
      "<pre><code>val z = 1</code></pre><p>hello world</p></body></html>"
    val got = Boilerplate.structureStats(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .select("n_tables", "n_lists", "n_items", "n_code", "n_headings",
        "n_links", "n_paras", "text_chars")
      .collect().head
    got.getLong(0) shouldBe 1L // table
    got.getLong(1) shouldBe 1L // ul
    got.getLong(2) shouldBe 2L // li
    got.getLong(3) shouldBe 2L // pre + code
    got.getLong(4) shouldBe 1L // H1 (case-insensitive)
    got.getLong(5) shouldBe 1L // anchor
    got.getLong(6) shouldBe 1L // <p> but NOT <pre>
    // visible text: "T a x y val z = 1 hello world" = 29 chars
    got.getLong(7) shouldBe 29L
  }

  test("structureStats rejects reserved-column collisions") {
    val bad = Seq((1L, "<p>x</p>", 3L)).toDF("doc_id", "html", "n_links")
    val e = intercept[IllegalArgumentException] {
      Boilerplate.structureStats(bad, "doc_id", "html")
    }
    e.getMessage should include("n_links")
  }
}
