package graft.functions

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The committed char-n-gram language-ID model: the marker table's
  * discriminativeness is a PINNED PROPERTY (no marker fires on another
  * language's fixture sentences or anywhere in the corpus base
  * vocabulary, including across word boundaries), coverage is pinned
  * (every fixture sentence carries at least one of its language's
  * markers), and the decision rule is hand-checked. */
class LangIdNgramSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  // the synthetic corpus vocabulary (TESTDATA.md documents generator)
  private val baseVocab = Seq("a", "agg", "batch", "big", "column",
    "customer", "data", "dup", "fast", "filter", "group", "hash",
    "join", "key", "line", "merge", "order", "part", "query", "row",
    "scan", "slow", "small", "sort", "spark", "stream", "table",
    "the", "value", "vector", "window")

  private def pad(s: String) = " " + s.toLowerCase + " "

  test("discriminativeness: no marker of language L occurs in any " +
    "OTHER language's fixture sentences") {
    for ((l, markers) <- TextFunctions.langNgrams;
         (other, sents) <- TextFunctions.langFixtureSentences
         if other != l;
         s <- sents; m <- markers)
      withClue(s"marker '$m' of $l inside $other sentence '$s': ") {
        pad(s).contains(m) shouldBe false
      }
  }

  test("discriminativeness: no marker occurs in the base vocabulary, " +
    "including across every ordered word-boundary pair") {
    val pairs = for (w1 <- baseVocab; w2 <- baseVocab)
      yield s" $w1 $w2 "
    val all = pairs ++ baseVocab.map(pad)
    for ((l, markers) <- TextFunctions.langNgrams; m <- markers;
         t <- all)
      withClue(s"marker '$m' of $l inside base text '$t': ") {
        t.contains(m) shouldBe false
      }
  }

  test("no CJK characters anywhere outside the zh sentences") {
    val cjk = "[一-鿿]".r
    for ((l, sents) <- TextFunctions.langFixtureSentences
         if l != "zh"; s <- sents)
      cjk.findFirstIn(s) shouldBe None
    for (w <- baseVocab) cjk.findFirstIn(w) shouldBe None
  }

  test("coverage: every fixture sentence contains at least one of " +
    "its own language's markers (zh: at least one CJK char)") {
    for ((l, sents) <- TextFunctions.langFixtureSentences; s <- sents)
      withClue(s"$l sentence '$s': ") {
        if (l == "zh") "[一-鿿]".r.findFirstIn(s).isDefined shouldBe true
        else TextFunctions.langNgrams(l)
          .exists(m => pad(s).contains(m)) shouldBe true
      }
  }

  private def idOf(text: String): String =
    Seq(text).toDF("t")
      .select(TextFunctions.langIdNgram(col("t")).as("p"))
      .collect().head.getString(0)

  test("hand cases: each language's sentences classify to their " +
    "language even buried in corpus gibberish") {
    val noise = "key agg row scan slow fast table value part hash " +
      "the line sort a a the window"
    for ((l, sents) <- TextFunctions.langFixtureSentences; s <- sents)
      withClue(s"$l + noise, sentence '$s': ") {
        idOf(s"$noise $s") shouldBe l
      }
  }

  test("gibberish with no language signal is 'und' (the baseline " +
    "heuristic calls this 'en' off the bare 'the')") {
    val noise = "the line sort table window the key value the a stream"
    idOf(noise) shouldBe "und"
    Seq(noise).toDF("t")
      .select(TextFunctions.langId(col("t")).as("p"))
      .collect().head.getString(0) shouldBe "en"
  }

  test("integer scoring: zh score counts CJK characters exactly; " +
    "ties break alphabetically") {
    // one CJK char vs one de marker hit: equal score 1 -> 'de' wins
    // the alphabetical tie-break
    idOf("wald 数") shouldBe "de"
    // two CJK chars beat the single de hit
    idOf("wald 数据") shouldBe "zh"
  }
}
