package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-10 wave: chat-transcript QA, markup lint. */
class Wave41Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("chatTurnStats: roles, bad lines, alternation violations, " +
    "mean tokens") {
    val df = Seq(
      (1L, "user: hi there\nassistant: hello\nuser: ok\nassistant: bye"),
      (2L, "user: a\nuser: b\nassistant: c"),
      (3L, "junk no role\nuser: x"),
      (4L, "user: \nassistant: word"))
      .toDF("id", "text")
    val out = TextQuality.chatTurnStats(df, "id", "text")
      .select("id", "n_lines", "n_bad_lines", "n_user", "n_assistant",
        "n_alternation_violations", "n_turns", "mean_turn_tokens")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getDouble(7)))).toMap
    out(1L) shouldBe ((4L, 0L, 2L, 2L, 0L, 4L, 1.25))
    out(2L) shouldBe ((3L, 0L, 2L, 1L, 1L, 3L, 1.0))
    out(3L) shouldBe ((2L, 1L, 1L, 0L, 0L, 1L, 1.0))
    // empty user content contributes a turn but zero tokens
    out(4L) shouldBe ((2L, 0L, 1L, 1L, 0L, 2L, 0.5))
  }

  test("chatTurnStats: a role-less line BETWEEN two same-role turns " +
    "does not mask the alternation violation") {
    val df = Seq((1L, "user: a\njunk line\nuser: b"))
      .toDF("id", "text")
    val r = TextQuality.chatTurnStats(df, "id", "text")
      .select("n_bad_lines", "n_alternation_violations", "n_turns")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((1L, 1L, 2L))
  }

  test("markupLint: tag/header/url/fence counts and the per-1000 rate") {
    val text = "# H\nhello <b>x</b> see https://a.b/c\n```\ny\n```"
    val out = TextQuality.markupLint(
        Seq((1L, text)).toDF("id", "text"), "id", "text")
      .collect().head
    out.getLong(1) shouldBe text.length.toLong
    out.getLong(2) shouldBe 1L // <b> only; </b> has no leading letter
    out.getLong(3) shouldBe 1L // the "# " header
    out.getLong(4) shouldBe 1L
    out.getLong(5) shouldBe 2L
    out.getDouble(6) shouldBe
      BigDecimal(4000.0 / text.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}
