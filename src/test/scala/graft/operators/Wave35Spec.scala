package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.CdcChunksExpr

/** Round-10 wave: content-defined chunking, anchor-text top-k, and
  * domain link-graph degrees. */
class Wave35Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def chunkRows(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), CdcChunksExpr.cdcChunks(col("text")).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap

  test("cdcChunks: empty in -> empty array; sub-MinLen text is one " +
    "chunk whose md5 is the plain text md5") {
    val out = chunkRows(Seq("", "hello"))
    out(0L) shouldBe Seq.empty
    // md5("hello") — the textbook constant
    out(1L) shouldBe Seq("5d41402abc4b2a76b9719d911017c592")
  }

  test("cdcChunks: boundaries are content-defined — an edit near the " +
    "END leaves every earlier chunk hash untouched") {
    // aperiodic content (a short period never trips the gear mask and
    // degenerates to 512-byte hard cuts), long enough for several
    // content-defined chunks at ~96-byte expected size
    val base = (0 until 3000)
      .map(i => ((i * 2654435761L % 95) + 32).toChar).mkString
    val edited = base.dropRight(3) + "XYZ"
    val out = chunkRows(Seq(base, edited))
    val (a, b) = (out(0L), out(1L))
    a.length should be > 3 // several chunks, so the prefix claim bites
    // every chunk fully before the edit position must be identical;
    // only the trailing chunk(s) that cover the edit may differ
    val shared = a.zip(b).takeWhile { case (x, y) => x == y }.length
    shared should be >= (a.length - 2)
    a.last should not be b.last
  }

  test("cdcChunks: chunk hashes re-verify against MessageDigest over " +
    "an independent replay of the boundary rule") {
    // replay the documented rule in test code (the same independence
    // the Python fixture provides, in-JVM): gear from md5("gear|b"),
    // h=(h<<1)+gear, cut at (len>=32 && (h&0x3F)==0) | len==512 | eof
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val gear = (0 until 256).map { b =>
      md5.digest(s"gear|$b".getBytes("UTF-8")).take(8)
        .foldLeft(0L)((h, x) => (h << 8) | (x & 0xFFL))
    }
    val text = (0 until 900).map(i => ('0' + (i * 7) % 75).toChar).mkString
    val bytes = text.getBytes("UTF-8")
    val expect = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0; var h = 0L
    for (i <- bytes.indices) {
      h = (h << 1) + gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= 32 && (h & 0x3FL) == 0L) || len == 512 ||
        i == bytes.length - 1) {
        expect += md5.digest(java.util.Arrays.copyOfRange(
          bytes, start, i + 1)).map(x => f"${x & 0xFF}%02x").mkString
        start = i + 1; h = 0L
      }
    }
    chunkRows(Seq(text))(0L) shouldBe expect.toSeq
  }

  test("anchorTopTerms: canonical-target grouping, count-desc / " +
    "term-asc top-k, empty anchors dropped") {
    // two raw spellings of ONE canonical target + a second target
    val links = Seq(
      ("https://www.Example.com/a?utm_source=x", "Best CHEAP shoes"),
      ("https://example.com/a", "cheap  shoes here"),
      ("https://example.com/a#frag", "buy shoes"),
      ("https://example.com/b", "  other   page  "),
      ("https://example.com/b", null.asInstanceOf[String]))
      .toDF("target", "anchor")
    val out = Urls.anchorTopTerms(links, "target", "anchor", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // target /a terms: best 1, cheap 2, shoes 3, here 1, buy 1
    // top-2 by (n desc, term asc): shoes(3), cheap(2)
    // target /b: other 1, page 1 -> top-2 alphabetical
    out shouldBe Set(
      ("https://example.com/a", "shoes", 3L),
      ("https://example.com/a", "cheap", 2L),
      ("https://example.com/b", "other", 1L),
      ("https://example.com/b", "page", 1L))
  }

  test("domainLinkStats: distinct in/out partner domains, self-edge " +
    "counts, quota-less urls dropped") {
    val edges = Seq(
      // a.com -> b.com twice (distinct partners count once)
      ("https://www.a.com/1", "https://b.com/x"),
      ("https://a.com/2?utm_source=s", "https://sub.b.com/y"),
      // a.com -> a.com self-links: 2 edges
      ("https://a.com/3", "https://blog.a.com/z"),
      ("https://a.com/4", "https://a.com/4"),
      // c.co.uk -> a.com (two-label suffix domain)
      ("https://x.c.co.uk/1", "https://a.com/9"),
      // no registered domain on either side -> dropped
      ("schemeless.com/1", "https://b.com/x"),
      ("https://b.com/x", "co.uk"))
      .toDF("src", "tgt")
    val out = Urls.domainLinkStats(edges, "src", "tgt")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    out shouldBe Map(
      "a.com" -> ((1L, 1L, 2L)),   // out: b.com; in: c.co.uk; self 2
      "b.com" -> ((0L, 1L, 0L)),   // in: a.com
      "c.co.uk" -> ((1L, 0L, 0L)))
  }
}
