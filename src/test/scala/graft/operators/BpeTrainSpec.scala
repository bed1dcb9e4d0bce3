package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BpeTrainSpec extends AnyFunSuite with SparkSpec {

  test("applyMerge is non-overlapping left-to-right") {
    assert(BpeTrain.applyMerge(Seq("a", "a", "a"), "a", "a") ==
      Seq("aa", "a"))
    assert(BpeTrain.applyMerge(Seq("a", "a", "a", "a"), "a", "a") ==
      Seq("aa", "aa"))
    assert(BpeTrain.applyMerge(Seq("x", "a", "b", "y", "a", "b"), "a", "b")
      == Seq("x", "ab", "y", "ab"))
    assert(BpeTrain.applyMerge(Seq("a"), "a", "a") == Seq("a"))
  }

  test("trainer learns the obvious merges on a toy corpus") {
    import spark.implicits._
    // pre-tokens: "the" x50, " the" x100 -> pairs (t,h) and (h,e) tie
    // at 150, (Ġ,t) at 100; ties break ascending so (h,e) merges first,
    // then (t,he) dominates
    val docs = Seq.fill(50)("the the the").toDF("text")
    val m = BpeTrain.train(docs, "text", nMerges = 2)
    assert(m.head == (("h", "e")))
    assert(m(1) == (("t", "he")))
  }

  test("learned table is partition-invariant (determinism contract)") {
    import spark.implicits._
    val texts = Seq("alpha beta gamma", "beta gamma delta",
      "gamma delta alpha", "delta alpha beta", "the rain in spain",
      "rain rain go away", "in the plain plain")
    val one = BpeTrain.train(
      texts.toDF("text").coalesce(1), "text", nMerges = 12)
    val many = BpeTrain.train(
      texts.toDF("text").repartition(7), "text", nMerges = 12)
    assert(one == many)
  }

  test("ties break by (left, right) ascending UTF-8 order") {
    import spark.implicits._
    // "xy" and "ab" both appear exactly 3 times and share no symbols;
    // (a,b) < (x,y) so (a,b) must win round 1
    val docs = Seq("xy ab", "ab xy", "xy ab").toDF("text")
    val m = BpeTrain.train(docs, "text", nMerges = 1)
    assert(m.head == (("a", "b")))
  }

  test("driver tier equals the distributed round loop (r14 tier split)") {
    import spark.implicits._
    val texts = Seq("alpha beta gamma", "beta gamma delta",
      "gamma delta alpha", "delta alpha beta", "the rain in spain",
      "rain rain go away", "in the plain plain", "spain explains rain",
      "Ünïcode naïve café café", "ab xy ab xy zz zz")
    val df = texts.toDF("text").repartition(5)
    // maxDriverVocab = 0 forces every pre-token count over the guard,
    // i.e. the distributed loop; the default runs the driver tier
    val distributed = BpeTrain.train(df, "text", nMerges = 16,
      maxDriverVocab = 0L)
    val driver = BpeTrain.train(df, "text", nMerges = 16)
    assert(driver == distributed)
    // dry stop must agree between tiers too
    val dDry = BpeTrain.train(Seq("abcdefg").toDF("text"), "text",
      nMerges = 4, maxDriverVocab = 0L)
    val lDry = BpeTrain.train(Seq("abcdefg").toDF("text"), "text",
      nMerges = 4)
    assert(dDry == lDry && lDry.isEmpty)
  }

  test("dry corpus stops early instead of padding ranks") {
    import spark.implicits._
    // every adjacent pair is unique -> nothing reaches minCount = 2
    val m = BpeTrain.train(Seq("abcdefg").toDF("text"), "text",
      nMerges = 10)
    assert(m.isEmpty)
  }

  test("unicode corpora train over the byte-level alphabet (multi-byte " +
      "chars become byte-symbol pairs, high page preserved)") {
    import spark.implicits._
    // 'é' is 2 UTF-8 bytes -> initial symbols are the 0x100-page chars;
    // in "ééé ééé" the (é-byte-1, é-byte-2) pair dominates every other
    // adjacency (5 per doc vs <= 3), so it must be merge 0
    val docs = Seq.fill(20)("ééé ééé").toDF("text")
    val m = BpeTrain.train(docs, "text", nMerges = 1)
    val eBytes = "é".getBytes("UTF-8")
    assert(m.head == ((
      String.valueOf((0x100 + (eBytes(0) & 0xff)).toChar),
      String.valueOf((0x100 + (eBytes(1) & 0xff)).toChar))))
  }

  test("encoder round-trip: counting with the learned table compresses") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(100)
    val merges = BpeTrain.train(docs, "text", nMerges = 16)
    assert(merges.size == 16)
    // byte length of text >= bpe-ish symbol count after merging: apply
    // the learned merges to a sample pre-token stream and check strict
    // compression on at least one common word
    val sample = "the master said the master could"
    var syms = graft.functions.Bpe.pretokens(sample)
      .flatMap(w => graft.functions.Bpe.byteSyms(w).toSeq).toSeq
    merges.foreach { case (l, r) => syms = BpeTrain.applyMerge(syms, l, r) }
    assert(syms.length < sample.getBytes("UTF-8").length)
  }
}
