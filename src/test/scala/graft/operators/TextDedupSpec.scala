package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.TextFunctions

class TextFunctionsSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c.as("v")).first().get(0)

  test("tokenCount counts whitespace tokens") {
    one(TextFunctions.tokenCount(col("t")), "a bb  ccc\t d") shouldBe 4
  }

  test("regexTokenCount splits letter runs, digits, symbols") {
    // "ab3!cd" -> ab, 3, !, cd
    one(TextFunctions.regexTokenCount(col("t")), "ab3!cd") shouldBe 4
  }

  test("occurrences counts non-overlapping pattern hits") {
    one(TextFunctions.occurrences(col("t"), " the "),
      " the cat the the dog ") shouldBe 2 // consecutive 'the the' share a space
  }

  test("meanTokenLen") {
    one(TextFunctions.meanTokenLen(col("t")), "ab cdef") shouldBe 3.0
  }

  test("punctRatio") {
    one(TextFunctions.punctRatio(col("t")), "ab!?") shouldBe 0.5
  }

  test("qualityClassifier matches a hand-computed logistic score") {
    // "the cat sat": tokens 3 -> log(4); mwl (3+3+3)/3 = 3; stopword
    // 1/3; alpha 1; punct 0; dup-bigram 0 (both bigrams distinct)
    val z = TextFunctions.classifierBias +
      math.log(4.0) * 0.9 + 3.0 * 0.30 + (1.0 / 3.0) * 2.5 +
      1.0 * 2.0 + 0.0 * -6.0 + 0.0 * -2.5
    val want = BigDecimal(1.0 / (1.0 + math.exp(-z)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    one(TextFunctions.qualityClassifier(col("t")),
      "the cat sat") shouldBe want
  }

  test("qualityClassifier penalizes punctuation noise and repetition") {
    def p(s: String): Double =
      one(TextFunctions.qualityClassifier(col("t")), s)
        .asInstanceOf[Double]
    p("the cat sat on the mat") should be > p("!!! ??? %%% cat !!!")
    p("a fine sentence with the varied words here") should be >
      p("spam spam spam spam spam spam spam spam")
  }

  test("langId picks marker-majority language, 'und' when silent") {
    one(TextFunctions.langId(col("t")),
      "the cat and the dog is here") shouldBe "en"
    one(TextFunctions.langId(col("t")),
      "der hund und die katze ist hier") shouldBe "de"
    one(TextFunctions.langId(col("t")), "xyzzy plugh") shouldBe "und"
  }

  test("stopwordRatio counts stopword share of tokens") {
    one(TextFunctions.stopwordRatio(col("t")), "the cat sat on the mat") shouldBe
      (3.0 / 6.0) // the, on, the
    one(TextFunctions.stopwordRatio(col("t")), "zebra quagga") shouldBe 0.0
  }

  test("rollingFingerprint is order-sensitive and deterministic") {
    val a = one(TextFunctions.rollingFingerprint(col("t")), "alpha beta gamma")
    val b = one(TextFunctions.rollingFingerprint(col("t")), "alpha beta gamma")
    val c = one(TextFunctions.rollingFingerprint(col("t")), "gamma beta alpha")
    a shouldBe b
    a should not be c
  }

  test("rollingFingerprintMd5 matches an independent md5 chain fold") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = Seq("alpha", "beta", "gamma")
      .foldLeft("graft")((acc, tok) => md5hex(acc + "|" + tok))
    one(TextFunctions.rollingFingerprintMd5(col("t")),
      "Alpha  beta\tGAMMA") shouldBe expected
    one(TextFunctions.rollingFingerprintMd5(col("t")), "gamma beta alpha")
      .asInstanceOf[String] should not be expected
  }

  test("simhashMd5: single token sig = first 64 md5 bits; bag-invariant") {
    def md5bits64(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (0 until 64).map(b => (d(b >> 3) >> (7 - (b & 7))) & 1).mkString
    }
    // one token: every bit's vote is +-1, so sig IS the token's hash bits
    one(TextFunctions.simhashMd5(col("t")), "Spark")
      .shouldBe(md5bits64("spark"))
    val ab = one(TextFunctions.simhashMd5(col("t")), "alpha beta")
    ab shouldBe one(TextFunctions.simhashMd5(col("t")), "beta alpha")
    ab.asInstanceOf[String] should have length 64
    ab.asInstanceOf[String] should fullyMatch regex "[01]{64}"
  }

  test("fingerprint is whitespace/case-insensitive md5") {
    val a = one(TextFunctions.fingerprint(col("t")), "Hello   World")
    val b = one(TextFunctions.fingerprint(col("t")), "hello world")
    a shouldBe b
    a.asInstanceOf[String] should have length 32
  }

  test("wordShingles builds distinct n-grams; empty when too short") {
    one(TextFunctions.wordShingles(col("t"), 3), "a b c d")
      .asInstanceOf[scala.collection.Seq[String]] should contain theSameElementsAs
      Seq("a b c", "b c d")
    one(TextFunctions.wordShingles(col("t"), 3), "a b")
      .asInstanceOf[scala.collection.Seq[String]] shouldBe empty
  }

  test("simhash64: identical texts collide, different texts differ") {
    val df = Seq(
      (1L, "spark scala data engine"),
      (2L, "spark scala data engine"),
      (3L, "completely different words entirely")).toDF("id", "t")
      .select(col("id"), TextFunctions.simhash64(col("t")).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    m(1L) shouldBe m(2L)
    m(1L) should not be m(3L)
  }

  test("hamming64") {
    Seq((0L, 7L)).toDF("a", "b")
      .select(TextFunctions.hamming64(col("a"), col("b")))
      .first().getInt(0) shouldBe 3
  }

  test("dedupTokens keeps first occurrences in order; repetitionRatio") {
    one(TextFunctions.dedupTokens(col("t")),
      "aa bb aa cc bb aa") shouldBe "aa bb cc"
    one(TextFunctions.repetitionRatio(col("t")),
      "aa bb aa cc bb aa") shouldBe 0.5 // 3 distinct of 6
    one(TextFunctions.repetitionRatio(col("t")), "x y z") shouldBe 0.0
  }

  test("tfidfTopTerms: hand-computed scores and deterministic ranking") {
    // 'rare' appears only in doc 1 (idf = ln 2); 'common' in both (idf 0)
    val d = Seq((1L, "rare common rare"), (2L, "common common other"))
      .toDF("doc_id", "text")
    val rows = TextQuality.tfidfTopTerms(d, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getDouble(3)))
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._2)
    doc1.head._3 shouldBe "rare" // tf=2 * ln(2) = 1.386294
    doc1.head._4 shouldBe 1.386294 +- 1e-9
    val doc2 = rows.filter(_._1 == 2L).sortBy(_._2)
    doc2.head._3 shouldBe "other" // tf=1 * ln(2) beats common's 0.0
    doc2.head._4 shouldBe 0.693147 +- 1e-9
    doc2(1)._3 shouldBe "common"
    doc2(1)._4 shouldBe 0.0
  }

  test("curate: quality floor, repetition ceiling, dedup survivors") {
    val good = (0 until 120).map(i => s"word$i").mkString(" ") // varied
    val docs = Seq(
      (1L, good),
      (2L, good),                  // exact dup of 1 -> dropped, 1 survives
      (3L, "aa aa aa aa aa aa aa aa aa aa aa aa"), // pure repetition
      (4L, "?! ?! ?!")             // punct noise -> low quality
    ).toDF("doc_id", "text")
    val out = TextQuality.curate(docs, "doc_id", "text",
      minQuality = 0.6, maxRepetition = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    out shouldBe Set(1L)
  }

  test("gopherSignals: hand-computed repetition/shape values") {
    // tokens: aa bb aa bb cc -> bigrams (aa bb, bb aa, aa bb, bb cc):
    // 4 total / 3 distinct -> dup 0.25; top token 2/5 = 0.4; mwl 2.0
    val d = Seq((1L, "aa bb aa bb cc"), (2L, "x1 9")).toDF("doc_id", "text")
    val m = TextQuality.gopherSignals(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    m(1L) shouldBe ((2.0, 0.25, 1.0, 0.4))
    // "x1 9": no duplicate bigram, one non-alpha token, ties at top 1/2
    m(2L) shouldBe ((1.5, 0.0, 0.5, 0.5))
  }
}

class DedupSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 1
    (4L, "completely unrelated text about spark query engines at scale"),
    (5L, "THE  Quick Brown fox jumps over the lazy dog again and again") // norm dup of 1
  ).toDF("doc_id", "text")

  test("exactGroups groups normalized duplicates under min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    g.map(_.getLong(2)).sum shouldBe 5 // all docs accounted for
    val big = g.filter(_.getLong(2) == 3L)
    big should have length 1
    big.head.getLong(1) shouldBe 1L // keep_id = min(1,2,5)
  }

  test("dedupExact keeps one row per distinct normalized text") {
    Dedup.dedupExact(docs, "doc_id", "text").count() shouldBe 3
  }

  test("ngramJaccardPairs finds near and exact dups above threshold") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pairs((1L, 2L)) shouldBe 1.0 // exact dup
    pairs((1L, 5L)) shouldBe 1.0 // case/space normalization happens in tokens()
    assert(pairs((1L, 3L)) > 0.5 && pairs((1L, 3L)) < 1.0) // near dup
    pairs.keys should not contain ((1L, 4L))
  }

  test("minhash LSH recall matches exact pairs on this corpus") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5).select("id_a", "id_b").collect().toSet
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      n = 3, k = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().toSet
    lsh shouldBe exact
  }

  test("simhash near-dup banding finds the near duplicate") {
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
      maxDist = 3).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((1L, 2L)) // identical => hamming 0
    pairs should contain((1L, 5L))
  }

  test("crossNearDupPairs matches the exact cross Jaccard; dedupAgainst " +
      "drops exactly the flagged corpus docs") {
    val corpus = docs.filter(org.apache.spark.sql.functions
      .col("doc_id").isin(1L, 3L, 4L))
    val ref = docs.filter(org.apache.spark.sql.functions
      .col("doc_id").isin(2L, 5L))
    val pairs = Dedup.crossNearDupPairs(corpus, ref, "doc_id", "text",
      n = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // doc 1 duplicates refs 2 and 5 exactly; doc 3 is a near dup of
    // both (same text family); doc 4 matches nothing
    pairs((1L, 2L)) shouldBe 1.0
    pairs((1L, 5L)) shouldBe 1.0
    assert(pairs((3L, 2L)) > 0.5 && pairs((3L, 2L)) < 1.0)
    pairs.keys.map(_._1).toSet should not contain 4L
    // exactness vs the unfiltered cross join: every corpus-ref pair at
    // J >= 0.5 is found (brute force over this tiny corpus)
    val brute = for {
      a <- Seq(1L, 3L, 4L); b <- Seq(2L, 5L)
      ja = {
        def sh(id: Long) = docs.filter(col("doc_id") === id)
          .select(graft.functions.TextFunctions
            .wordShingles(col("text"), 3).as("s"))
          .first().getSeq[String](0).toSet
        val (x, y) = (sh(a), sh(b))
        x.intersect(y).size.toDouble / x.union(y).size
      } if ja >= 0.5
    } yield (a, b)
    pairs.keySet shouldBe brute.toSet
    val kept = Dedup.dedupAgainst(corpus, ref, "doc_id", "text",
      n = 3, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(4L)
  }

  test("ngramJaccard maxDf cap drops stop-shingle pairs (scale guard)") {
    // with a df cap of 1 every shared shingle is dropped => no pairs
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.1, maxDf = Some(1)).count() shouldBe 0
  }

  test("releaseCaches frees shingle caches across distinct corpora") {
    Dedup.releaseCaches(blocking = true) // drop leftovers from other tests
    val before = spark.sparkContext.getPersistentRDDs.size
    val other = Seq(
      (10L, "a wholly different corpus sentence repeated here twice over"),
      (11L, "a wholly different corpus sentence repeated here twice over"))
      .toDF("doc_id", "text")
    // distinct inputs => distinct cache entries (plan-identity dedupe
    // cannot collapse them)
    Dedup.minhashNearDupPairs(docs, "doc_id", "text", n = 3).count()
    Dedup.minhashNearDupPairs(other, "doc_id", "text", n = 3).count()
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3).count()
    spark.sparkContext.getPersistentRDDs.size should be > before
    Dedup.releaseCaches(blocking = true)
    spark.sparkContext.getPersistentRDDs.size shouldBe before
  }

  test("ngram LM score matches hand-computed smoothed probabilities") {
    // reference "a b a c": bigrams (a,b) (b,a) (a,c); ctx a=2 b=1; V=3
    val ref = Seq((100L, "a b a c")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b"),   // P(b|a) = (1+.5)/(2+1.5)  -> nlp = ln(3.5/1.5)
      (2L, "c z"),   // unseen ctx: P = .5/1.5   -> nlp = ln 3
      (3L, "solo"),  // < 2 tokens: no row
      (4L, "a b a")) // mean of ln(3.5/1.5) and P(a|b)=(1+.5)/(1+1.5)
      .toDF("doc_id", "text")
    val got = TextQuality.ngramLogProb(corpus, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.keySet shouldBe Set(1L, 2L, 4L)
    got(1L) shouldBe (math.log(3.5 / 1.5) +- 1e-6)
    got(2L) shouldBe (math.log(3.0) +- 1e-6)
    got(4L) shouldBe
      ((math.log(3.5 / 1.5) + math.log(2.5 / 1.5)) / 2 +- 1e-6)
  }

  test("scoreBins: ties share a bin; bins are monotone in score") {
    // 12 docs, scores 1..4 with heavy ties: quartile thresholds are
    // actual score values (type-1), equal scores MUST share a bin
    val df = Seq.tabulate(12)(i => (i.toLong, (i % 4 + 1).toDouble))
      .toDF("doc_id", "score")
    val bins = TextQuality.scoreBins(df, "doc_id", "score", k = 4)
      .collect().map(r => (r.getDouble(1), r.getInt(2)))
    bins.groupBy(_._1).foreach { case (s, bs) =>
      withClue(s"score $s: ") {
        bs.map(_._2).distinct.length shouldBe 1
      }
    }
    val byScore = bins.toMap
    byScore(1.0) should be < byScore(2.0)
    byScore(2.0) should be < byScore(3.0)
    byScore(3.0) should be < byScore(4.0)
  }

  test("scriptMix: hand-computed class fractions summing to 1") {
    //          0123456789
    val text = "ab1 c, 42!" // 3 alpha, 3 digit, 2 space, 2 other
    val r = TextQuality.scriptMix(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").first()
    r.getLong(1) shouldBe 10L
    r.getDouble(2) shouldBe 0.3 // a b c
    r.getDouble(3) shouldBe 0.3 // 1 4 2
    r.getDouble(4) shouldBe 0.2 // two spaces
    r.getDouble(5) shouldBe 0.2 // comma, bang
    (r.getDouble(2) + r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
      ) shouldBe 1.0
  }

  test("scriptMix counts vertical tab as whitespace (explicit class)") {
    // \x0B is in Java's \s but NOT in RE2's — the operator spells the
    // class out so both engines agree; VT must land in space_frac
    val r = TextQuality.scriptMix(
      Seq((1L, "a\u000Bb")).toDF("doc_id", "text"), "doc_id", "text")
      .first()
    r.getDouble(4) shouldBe 0.333333 // space_frac: the VT
    r.getDouble(5) shouldBe 0.0      // not other_frac
  }

  test("winsorize clamps per group to the exact quantile band") {
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      Seq(("b", 1000L), ("b", 2000L), ("b", 3000L)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "grp", "v")
    val out = TextQuality.winsorize(df, "grp", "v", 0.2, 0.8)
      .select("id", "v_w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // group a: type-1 P20 of 1..10 = 2, P80 = 8
    out(0L) shouldBe 2L  // v=1 clamped up
    out(4L) shouldBe 5L  // inside the band, untouched
    out(9L) shouldBe 8L  // v=10 clamped down
    // a NULL measurement must stay NULL, not be rewritten to the P-lo
    // bound (greatest/least skip NULLs)
    val withNull = df.union(Seq((99L, "a", null.asInstanceOf[Any]))
      .map { case (i, g, _) => (i, g, Option.empty[Long]) }
      .toDF("id", "grp", "v"))
    val nw = TextQuality.winsorize(withNull, "grp", "v", 0.2, 0.8)
      .filter(col("id") === 99L).select("v_w").first()
    nw.isNullAt(0) shouldBe true
    // group b keeps its own band (P20=1000, P80=3000 over 3 values ->
    // quantile indices pick actual members)
    out(10L) shouldBe 1000L
    out(12L) should be <= 3000L
  }

  test("lengthBand keeps exactly the docs inside the quantile band") {
    // token counts 1..10; type-1 P20 of [1..10] = 2, P80 = 8
    val df = Seq.tabulate(10)(i =>
      (i.toLong, (1 to i + 1).map(k => s"w$k").mkString(" ")))
      .toDF("doc_id", "text")
    val kept = TextQuality.lengthBand(df, "doc_id", "text", 0.2, 0.8)
      .collect().map(_.getLong(1)).sorted
    kept shouldBe (2L to 8L).toArray
  }

  test("pmiTopPairs matches hand-computed PMI and respects the floor") {
    // tokens: a x3, b x2, c x1 (N=6); pairs: (a,b) x2, (b,a), (a,c) (N=4)
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextQuality.pmiTopPairs(df, "doc_id", "text",
        minCount = 1L, topK = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    def pmi(cab: Long, ca: Long, cb: Long): Double =
      BigDecimal(math.log(cab.toDouble * 6 * 6 / (4.0 * ca * cb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got(("a", "b")) shouldBe ((2L, pmi(2, 3, 2)))
    got(("b", "a")) shouldBe ((1L, pmi(1, 2, 3)))
    got(("a", "c")) shouldBe ((1L, pmi(1, 3, 1)))
    got.size shouldBe 3
    // the count floor prunes singletons
    TextQuality.pmiTopPairs(df, "doc_id", "text", minCount = 2L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1))) shouldBe
      Array(("a", "b"))
  }

  test("pmiTopPairs top-k runs as TakeOrdered, not a global sort") {
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val plan = TextQuality.pmiTopPairs(df, "doc_id", "text", 1L, 5)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
  }

  private def segDedup(rows: Seq[(Long, String)], k: Int) =
    Dedup.segmentDedup(rows.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("segmentDedup removes repeated segments, first occurrence wins") {
    val out = segDedup(Seq(
      (1L, "a b c d"),   // segs: "a b", "c d"
      (2L, "a b x y"),   // "a b" repeats -> only "x y" survives
      (3L, "c d")),      // fully duplicated -> doc vanishes
      k = 2)
    out shouldBe Map(1L -> "a b c d", 2L -> "x y")
  }

  test("segmentDedup reassembles surviving segments in document order") {
    val out = segDedup(Seq(
      (1L, "m m"),
      (2L, "p q m m r s")), // middle segment "m m" removed
      k = 2)
    out(2L) shouldBe "p q r s"
  }

  test("segmentDedup: a trailing short segment dedups like any other") {
    val out = segDedup(Seq(
      (1L, "a b c"), // segs "a b", "c"
      (2L, "x y c")), // trailing short "c" loses to doc 1's
      k = 2)
    out shouldBe Map(1L -> "a b c", 2L -> "x y")
  }

  test("segmentDedup: within-document repeats also collapse") {
    val out = segDedup(Seq((1L, "a b a b a b")), k = 2)
    out shouldBe Map(1L -> "a b")
  }

  test("segmentDedup drops null texts and keeps unique docs intact") {
    val rows = Seq((1L, "u v w x"), (2L, null.asInstanceOf[String]))
    val out = segDedup(rows, k = 2)
    out shouldBe Map(1L -> "u v w x")
  }

  private def passageStats(rows: Seq[(Long, String)], k: Int)
      : Map[Long, (Long, Long)] =
    Dedup.dupPassageStats(rows.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("dupPassageStats counts cross-document window repeats only") {
    val out = passageStats(Seq(
      (1L, "a b c d e"), // windows: abc bcd cde
      (2L, "z z a b c"), // windows: zza zab abc -> abc shared with doc 1
      (3L, "q q q q q")  // all windows qqq, repeated INTRA-doc only
    ), k = 3)
    out(1L) shouldBe ((3L, 1L))
    out(2L) shouldBe ((3L, 1L))
    out(3L) shouldBe ((3L, 0L)) // intra-doc repeats are not duplication
  }

  test("dupPassageStats: every occurrence of a shared window counts") {
    val out = passageStats(Seq(
      (1L, "x y x y"), // windows: "x y" twice (k=2)
      (2L, "x y")      // one window, shared
    ), k = 2)
    out(1L) shouldBe ((3L, 2L)) // windows xy yx xy; both xy occurrences dup
    out(2L) shouldBe ((1L, 1L))
  }

  test("dupPassageStats gives short docs a (0, 0) row") {
    val out = passageStats(Seq((1L, "a b"), (2L, "c d e f")), k = 3)
    out(1L) shouldBe ((0L, 0L))
    out(2L) shouldBe ((2L, 0L))
  }

  test("snapshotMerge routes insert/update/keep/unchanged and new text wins") {
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    val crawl = Seq((2L, "two v2"), (3L, "three"), (4L, "four"))
      .toDF("doc_id", "text")
    val out = Dedup.snapshotMerge(base, crawl, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    out shouldBe Map(
      1L -> (("one", "kept")),
      2L -> (("two v2", "updated")),
      3L -> (("three", "unchanged")),
      4L -> (("four", "inserted")))
  }

  test("incrementalNearDupPairs: delta-touching pairs only, base x base never") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // base dup of 1
      (3L, "completely different text about spark engines at scale")
    ).toDF("doc_id", "text")
    val delta = Seq(
      // near-identical re-crawl of doc 1 (one appended token)
      (1L, "the quick brown fox jumps over the lazy dog tonight again"),
      (9L, "unrelated fresh insert with no duplicate partner anywhere at all")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDupPairs(base, delta, "doc_id", "text",
        n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    // the 1-2 base x base pair must NOT appear; delta doc 1 pairs with
    // its predecessor AND with base doc 2 (its predecessor's exact dup)
    got shouldBe Set((1L, 1L, "base"), (1L, 2L, "base"))
  }

  test("snapshotMerge: an update TO null text is an update, not a keep") {
    val base = Seq((1L, "one")).toDF("doc_id", "text")
    val crawl = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.snapshotMerge(base, crawl, "doc_id", "text").collect()
    out.head.isNullAt(1) shouldBe true
    out.head.getString(2) shouldBe "updated"
  }

  test("featureHash: tf counts every occurrence, buckets bounded by dims") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha beta"),
      (2L, "beta")
    ).toDF("doc_id", "text")
    val out = TextQuality.featureHash(docs, "doc_id", "text", dims = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    out.keys.foreach { case (_, b) => b should (be >= 0L and be < 8L) }
    // alpha appears twice in doc 1 -> its bucket carries tf=2
    out.values.max shouldBe 2L
    // same token -> same bucket in every doc (pure function of token)
    val betaBuckets = Seq(1L, 2L).map { d =>
      out.collect { case ((`d`, b), _) => b }.toSet
    }
    (betaBuckets.head intersect betaBuckets(1)).size shouldBe 1
  }

  test("minhashEstimatePairsMd5: exact-1.0 pairs estimate 1.0, bounded error") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base), // identical -> jaccard 1, est 1
      (3L, base + " extra words here"), // high-overlap neighbor
      (4L, "totally different content nothing shared at all")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashEstimatePairsMd5(docs, "doc_id", "text",
      n = 3, k = 16, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val (j12, e12) = out((1L, 2L))
    j12 shouldBe 1.0
    e12 shouldBe 1.0
    out.values.foreach { case (j, e) =>
      // k=16 signatures: binomial sd ~ sqrt(j(1-j)/16) <= 0.125
      math.abs(e - j) should be <= 0.45
    }
    val again = Dedup.minhashEstimatePairsMd5(docs, "doc_id", "text",
      n = 3, k = 16, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    again shouldBe out // md5-derandomized: identical across runs
  }
}
