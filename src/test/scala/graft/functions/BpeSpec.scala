package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class BpeSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  // ---- independent naive replay (different style on purpose: immutable
  // lists, recompute-everything per round) of the same public algorithm:
  // pre-tokenize, byte-encode, merge ALL occurrences of the single
  // lowest-rank adjacent pair per round, to fixpoint ---------------------
  private lazy val naiveRanks: Map[(String, String), Int] = Bpe.ranks

  private def naiveByte(b: Byte): String = {
    val u = b & 0xff
    if (u == 0x20) "Ġ"
    else if (u > 0x20 && u < 0x7f) u.toChar.toString
    else (0x100 + u).toChar.toString
  }

  private def mergeAll(syms: List[String], pair: (String, String))
      : List[String] = syms match {
    case a :: b :: rest if (a, b) == pair =>
      (a + b) :: mergeAll(rest, pair)
    case a :: rest => a :: mergeAll(rest, pair)
    case Nil => Nil
  }

  @annotation.tailrec
  private def fixpoint(syms: List[String]): List[String] = {
    val ranked = syms.zip(syms.drop(1))
      .filter(naiveRanks.contains)
    if (ranked.isEmpty) syms
    else fixpoint(mergeAll(syms, ranked.minBy(naiveRanks)))
  }

  private def naiveCount(text: String): Long = {
    val m = java.util.regex.Pattern
      .compile("'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+" +
        "| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+",
        java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)
      .matcher(text)
    var n = 0L
    while (m.find())
      n += fixpoint(
        m.group().getBytes("UTF-8").map(naiveByte).toList).length
    n
  }

  test("hand-computable merge chains") {
    // t,h,e: th (rank 0) then th+e -> one token
    Bpe.count("the") shouldBe 1L
    // Ġ,y,o,u: ou, Ġy, Ġy+ou -> one token
    Bpe.count(" you") shouldBe 1L
    // le, ex, exa, exam, examp, examp+le -> one token
    Bpe.count("example") shouldBe 1L
    // no ranked pairs at all: one symbol per byte
    Bpe.count("zqzq") shouldBe 4L
    Bpe.count("") shouldBe 0L
  }

  test("contractions and punctuation pre-tokenize GPT-2 style") {
    // "don't" -> ["don", "'t"]: d,o,n has no vocab pair except (o,n) ->
    // [d, on] = 2; "'t" = 2 (no pair) -> 4
    Bpe.count("don't") shouldBe 4L
    // punctuation run is its own pre-token
    Bpe.count("a!!") shouldBe naiveCount("a!!")
  }

  test("matches the independent replay on generated corpora") {
    val words = Vector("the", "and", "for", "that", "with", "example",
      "tokens", "pipeline", "données", "zqx", "a1b2", "don't", "...",
      "COVID-19", "été", "nb\u00A0sp", "ls\u2028br")
    val rng = new scala.util.Random(11L)
    val docs = (0 until 60).map { _ =>
      (0 until (1 + rng.nextInt(30)))
        .map(_ => words(rng.nextInt(words.length)))
        .mkString(" ") + (if (rng.nextBoolean()) "  " else "")
    }
    docs.foreach { d =>
      Bpe.count(d) shouldBe naiveCount(d)
    }
  }

  test("expression evaluates distributed and handles nulls") {
    val df = Seq((1L, "the example"), (2L, null), (3L, ""))
      .toDF("id", "text")
      .select($"id", TextFunctions.bpeCount($"text").as("n"))
    val got = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // "the" = 1; " example": (Ġ,e) fires before (l,e), so the chain
    // strands at [Ġex, a, m, p, le] = 5
    got(1L) shouldBe 6L
    got(1L) shouldBe naiveCount("the example")
    got(2L) shouldBe -1L
    got(3L) shouldBe 0L
  }
}
