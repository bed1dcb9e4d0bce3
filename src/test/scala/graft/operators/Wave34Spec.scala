package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.MojibakeRepairExpr

/** Round-10 wave: compliance scanners (license / robots), paragraph
  * dedup, and mojibake detection + repair. */
class Wave34Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def lic(t: String): Option[String] =
    Seq(t).toDF("t").select(Compliance.licenseTag(col("t")).as("l"))
      .collect().headOption.flatMap(r => Option(r.getString(0)))

  test("licenseTag: link detection across the kind alternation; " +
    "phrase fallback; prose mention does not trip") {
    lic("see https://creativecommons.org/licenses/by/4.0/ legal") shouldBe
      Some("cc-by-4.0")
    lic("https://creativecommons.org/licenses/by-nc-sa/3.0/deed") shouldBe
      Some("cc-by-nc-sa-3.0")
    lic("https://creativecommons.org/licenses/by-nd/2.0/") shouldBe
      Some("cc-by-nd-2.0")
    lic("released as CC0 into the commons") shouldBe
      Some("public-domain")
    lic("we discussed licenses at length") shouldBe None
  }

  test("robotsFlags: word-boundary tokens, case-insensitive; " +
    "'noindexing' is clean") {
    val out = Compliance.robotsFlags(Seq(
      (1L, "x <meta name=\"robots\" content=\"noindex, nofollow\">"),
      (2L, "all about noindexing and noailments"),
      (3L, "opt out with noai please"),
      (4L, "clean"),
      (5L, "<META NAME=\"ROBOTS\" CONTENT=\"NOINDEX\">"),
      (6L, "mixed-case opt-out: NoAI"),
      (7L, "still clean: NOINDEXING"))
      .toDF("id", "text"), "text")
      .select("id", "noindex", "nofollow", "noai", "indexable")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4))).toMap
    out(1L) shouldBe ((true, true, false, false))
    out(2L) shouldBe ((false, false, false, true))
    out(3L) shouldBe ((false, false, true, false))
    out(4L) shouldBe ((false, false, false, true))
    out(5L) shouldBe ((true, false, false, false))
    out(6L) shouldBe ((false, false, true, false))
    out(7L) shouldBe ((false, false, false, true))
  }

  test("filterIndexable drops noindex/noai rows and the flag columns") {
    val kept = Compliance.filterIndexable(Seq(
      (1L, "noindex me"), (2L, "keep"), (3L, "noai here"))
      .toDF("id", "text"), "text")
    kept.columns.toSeq shouldBe Seq("id", "text")
    kept.select("id").collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
  }

  test("paragraphDedup: shared boilerplate survives only at its " +
    "first (id, para_no); docs reassemble in order; emptied docs " +
    "disappear") {
    val docs = Seq(
      (1L, "alpha one\n\nSUBSCRIBE NOW\n\nomega one"),
      (2L, "beta two\n\nSUBSCRIBE NOW\n\ngamma two"),
      (3L, "SUBSCRIBE NOW"),
      (4L, "alpha one\n\ndelta four")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    out(1L) shouldBe (("alpha one\n\nSUBSCRIBE NOW\n\nomega one", 3L))
    out(2L) shouldBe (("beta two\n\ngamma two", 2L))
    out.contains(3L) shouldBe false // its only paragraph lost
    out(4L) shouldBe (("delta four", 1L)) // "alpha one" lost to doc 1
  }

  test("paragraphDedup trims and drops empty paragraphs") {
    val docs = Seq((1L, "  a  \n\n\n\n b ")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text").collect()
    out.head.getString(1) shouldBe "a\n\nb"
    out.head.getLong(2) shouldBe 2L
  }

  test("robotsEval: group selection, longest-match, allow tie-win, " +
    "empty disallow, missing robots") {
    val rules = Seq(
      ("example.com", "User-agent: *\nDisallow: /search\n" +
        "Allow: /search?q=caf\nDisallow: /item/\n# comment"),
      ("example.co.uk", "User-agent: graftbot\nDisallow: /\n" +
        "User-agent: *\nAllow: /"),
      ("example.net", "User-agent: *\nDisallow:"),
      ("multi.example", "User-agent: smith\nUser-agent: graftbot\n" +
        "Disallow: /p")).toDF("domain", "robots")
    val urls = Seq(
      (1L, "https://example.com/free/page"),
      (2L, "https://example.com/search?q=caf%c3%a9&x=1"),
      (3L, "https://example.com/search/other"),
      (4L, "https://example.com/item/9"),
      (5L, "https://www.example.co.uk/anything"),
      (6L, "https://example.net/whatever"),
      (7L, "https://sub.multi.example/page"),
      (8L, "https://norobots.example/x"),
      (9L, "https://multi.example/x")).toDF("id", "url")
    val out = Compliance.robotsEval(rules, "domain", "robots",
        urls, "id", "url", agent = "graftbot")
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[String]("matched_rule")),
          r.getAs[Boolean]("allowed"))).toMap
    out(1L) shouldBe ((None, true)) // no rule matches
    // Allow '/search?q=caf' (13) beats Disallow '/search' (7); the
    // canonical target has the %-escape uppercased, prefix still hits
    out(2L) shouldBe ((Some("/search?q=caf"), true))
    out(3L) shouldBe ((Some("/search"), false))
    out(4L) shouldBe ((Some("/item/"), false))
    // exact-agent group (rank 2) wins over the * Allow group
    out(5L) shouldBe ((Some("/"), false))
    out(6L) shouldBe ((None, true)) // empty Disallow = no rule
    // multi-UA group includes graftbot; '/page' startsWith '/p'
    out(7L) shouldBe ((Some("/p"), false))
    out(8L) shouldBe ((None, true)) // no robots.txt for the domain
    out(9L) shouldBe ((None, true)) // '/x' does not match '/p'
  }

  private def rep(t: String): String =
    Seq(t).toDF("t")
      .select(MojibakeRepairExpr.mojibakeRepair(col("t")).as("r"))
      .collect().head.getString(0)

  test("mojibake repair: classic CP1252-as-UTF-8 artifacts heal") {
    rep("cafÃ©") shouldBe "café"
    rep("naÃ¯ve") shouldBe "naïve"
    rep("â€œqâ€™") shouldBe
      "“q’"
    rep("25Â°") shouldBe "25°"
  }

  test("mojibake repair: double-encoded UTF-8 heals in two passes") {
    rep("ÃƒÂ©clair") shouldBe "éclair"
  }

  test("mojibake repair: healthy text passes through untouched") {
    rep("plain ascii stays") shouldBe "plain ascii stays"
    rep("café already fine") shouldBe "café already fine"
    rep("emoji 😀 unmappable") shouldBe
      "emoji 😀 unmappable"
  }

  test("mojibake signature counts the planted artifact classes") {
    val n = Seq("cafÃ© and â€œx " +
      "ÃƒÂ© end").toDF("t")
      .select(regexp_count(col("t"),
        lit(MojibakeRepairExpr.MojibakeSignature)).as("n"))
      .collect().head.getInt(0)
    // cafÃ© -> 1; â€œ -> 1; ÃƒÂ© -> Ãƒ + Â© -> 2
    n shouldBe 4
  }
}
