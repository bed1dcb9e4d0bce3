package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-8: the quadratic bounds on the fuzzy-pair operators are
  * ENFORCED code, not documentation (r7 verdict #2) — a pathological
  * block / boilerplate shingle is capped with a loud stderr report. */
class BlockCapSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def captureErr[T](f: => T): (T, String) = {
    val buf = new java.io.ByteArrayOutputStream()
    val saved = System.err
    System.setErr(new java.io.PrintStream(buf))
    val r = try f finally System.setErr(saved)
    (r, buf.toString)
  }

  test("jaroNamePairs: a dense block is capped to maxBlock, loudly") {
    // 6 names in ONE block ("smith"); frequencies make the top-3
    // deterministic: anna/bella/carla kept, dora/edna/fay dropped
    val rows =
      Seq.fill(6)("anna smith") ++ Seq.fill(5)("bella smith") ++
      Seq.fill(4)("carla smith") ++ Seq.fill(3)("dora smith") ++
      Seq.fill(2)("edna smith") ++ Seq("fay smith")
    val df = rows.toDF("nm")
    val (out, err) = captureErr(
      Linkage.jaroNamePairs(df, "nm", minSim = 0.1, maxBlock = 3)
        .collect())
    val names = out.flatMap(r =>
      Seq(r.getString(0), r.getString(1))).distinct.sorted
    names shouldBe Array("anna smith", "bella smith", "carla smith")
    out.length shouldBe 3 // C(3,2) pairs, not C(6,2)=15
    err should include("block cap 3 TRUNCATED")
    err should include("-3 names")
  }

  test("jaroNamePairs: under the cap nothing changes and no report fires") {
    val df = Seq("anna smith", "bella smith", "anna smith").toDF("nm")
    val (out, err) = captureErr(
      Linkage.jaroNamePairs(df, "nm", minSim = 0.1).collect())
    out.length shouldBe 1
    err should not include "TRUNCATED"
  }

  test("fuzzyNamePairs: shares the same enforced cap") {
    val rows = ('a' to 'f').flatMap(c => Seq.fill(c - 'a' + 1)(s"x$c k"))
    val (out, err) = captureErr(
      Linkage.fuzzyNamePairs(rows.toDF("nm"), "nm", maxDist = 5,
        maxBlock = 2).collect())
    out.length shouldBe 1 // only the 2 most frequent survive -> 1 pair
    err should include("block cap 2 TRUNCATED")
  }

  test("containmentPairs: maxDfAbs drops boilerplate postings, loudly") {
    // every doc shares one boilerplate trigram; docs 1/2 additionally
    // share a rare body. With maxDfAbs=3 the boilerplate posting list
    // (df=4) is capped: the 1-2 pair survives via its rare shingles,
    // and doc 3/4 (boilerplate-only overlap, sub-threshold anyway)
    // generate no candidates at all.
    val boiler = "terms of service"
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon"),
      (2L, s"$boiler alpha beta gamma delta epsilon"),
      (3L, s"$boiler zeta eta theta iota kappa"),
      (4L, s"$boiler lambda mu nu xi omicron"))
    val (out, err) = captureErr(
      Dedup.containmentPairs(docs.toDF("doc_id", "text"), "doc_id",
        "text", n = 3, threshold = 0.8, maxDfAbs = 3L).collect())
    out.map(r => (r.getLong(0), r.getLong(1))).sorted shouldBe
      Seq((1L, 2L), (2L, 1L))
    err should include("maxDfAbs=3 CAPPED")
    Dedup.releaseCaches()
  }

  test("containmentPairs: default cap is inert on honest data") {
    val docs = Seq((1L, "one two three four five six"),
      (2L, "one two three four five six seven"))
    val (out, err) = captureErr(
      Dedup.containmentPairs(docs.toDF("doc_id", "text"), "doc_id",
        "text", n = 3, threshold = 0.8).collect())
    out.map(r => (r.getLong(0), r.getLong(1))) should contain((1L, 2L))
    err should not include "CAPPED"
    Dedup.releaseCaches()
  }
}
