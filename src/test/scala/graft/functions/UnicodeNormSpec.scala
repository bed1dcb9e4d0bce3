package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class UnicodeNormSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  // all non-ASCII spelled as \u escapes so the fixture is
  // editor/encoding-proof
  private val eAcutePre = "\u00e9"         // precomposed e-acute
  private val eAcuteDec = "e\u0301"        // e + combining acute
  private val fiLig = "\ufb01"              // fi ligature
  private val fullwidthHi = "\uff28\uff49"  // fullwidth H i

  private def nfcOf(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.nfc($"t")).as[String].head()
  private def nfkcOf(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.nfkc($"t")).as[String].head()
  private def stripOf(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.stripHtml($"t")).as[String].head()

  test("NFC composes combining marks into precomposed forms") {
    nfcOf(eAcuteDec + "clair") shouldBe eAcutePre + "clair"
  }

  test("NFC leaves already-normalized ASCII untouched (identity path)") {
    val s = "plain ascii text 123"
    nfcOf(s) shouldBe s
  }

  test("NFC does NOT fold compatibility forms; NFKC does") {
    nfcOf(fiLig + "le") shouldBe fiLig + "le"
    nfkcOf(fiLig + "le") shouldBe "file"
    nfkcOf(fullwidthHi) shouldBe "Hi"
  }

  test("normalization is idempotent and dedup-aligning") {
    Seq(eAcutePre, eAcuteDec).map(nfcOf).distinct should have size 1
    nfcOf(nfcOf(eAcuteDec + "clair")) shouldBe nfcOf(eAcuteDec + "clair")
  }

  test("null propagates") {
    Seq[String](null).toDF("t")
      .select(TextFunctions.nfc($"t")).head().isNullAt(0) shouldBe true
  }

  test("stripHtml drops tags, decodes entities, collapses whitespace") {
    stripOf("<p>Hello   <b>world</b></p>") shouldBe "Hello world"
    stripOf("a &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;") shouldBe
      "a <tag> & \"q\" 's'"
    stripOf("  line1\n\nline2\tend  ") shouldBe "line1 line2 end"
  }

  test("stripHtml decodes &amp; LAST: &amp;lt; stays literal &lt;") {
    // the html-unescape pitfall: double-decoding &amp;lt; to "<"
    stripOf("&amp;lt;") shouldBe "&lt;"
    stripOf("&amp;amp;") shouldBe "&amp;"
  }

  test("stripHtml handles attributes and self-closing tags") {
    stripOf("""<a href="x">link</a><br/>done""") shouldBe "link done"
  }
}
