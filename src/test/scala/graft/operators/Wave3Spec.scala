package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.JaroWinklerExpr.jaroWinkler

/** Round-7 wave 3: Jaro-Winkler expression + linkage, survivorship
  * dedup, cohort LTV. */
class Wave3Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("jaroWinkler: textbook values (DuckDB-convention-pinned)") {
    jaroWinkler("martha", "marhta") shouldBe (0.961111 +- 1e-6)
    jaroWinkler("dixon", "dicksonx") shouldBe (0.813333 +- 1e-6)
    jaroWinkler("jellyfish", "smellyfish") shouldBe (0.896296 +- 1e-6)
    jaroWinkler("abc", "abc") shouldBe 1.0
    // DuckDB conventions: empty sides are 0, no boost under jaro 0.7
    jaroWinkler("", "") shouldBe 0.0
    jaroWinkler("", "abc") shouldBe 0.0
    jaroWinkler("ab", "ba") shouldBe 0.0
    jaroWinkler("abcdefgh", "abzyxwvu") shouldBe 0.5 // prefix NOT boosted
  }

  test("jaroWinkler: symmetric, bounded, ranks transposition above substitution") {
    for ((a, b) <- Seq(("dwayne", "duane"), ("cold rod", "gold rod"),
        ("x", "y"), ("alpha", "alphabet"))) {
      jaroWinkler(a, b) shouldBe jaroWinkler(b, a)
      jaroWinkler(a, b) should (be >= 0.0 and be <= 1.0)
    }
    // same edit distance (2), but the transposed pair keeps all chars
    jaroWinkler("dwayne", "dwaeyn") should be > jaroWinkler("dwayne", "dwaqqe")
  }

  test("jaroNamePairs: scores blocked pairs, different blocks never compare") {
    val df = Seq("cold widget", "gold widget", "cold gadget")
      .toDF("p_name")
    val out = Linkage.jaroNamePairs(df, "p_name", minSim = 0.8).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    out.keySet shouldBe Set(("cold widget", "gold widget")) // same block only
    out(("cold widget", "gold widget")) shouldBe
      BigDecimal(jaroWinkler("cold widget", "gold widget"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("dedupBySurvivor: keeps the best-scored row per component, min-id on ties") {
    val df = Seq(
      (1L, "short", 5L), (2L, "the longest copy", 16L), (3L, "mid", 10L),
      (7L, "tie", 4L), (8L, "tie", 4L), // tie -> min id 7 survives
      (9L, "untouched", 9L)
    ).toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val kept = Graph.dedupBySurvivor(df, pairs, "doc_id", "score")
      .collect().map(_.getLong(0)).sorted
    kept.toSeq shouldBe Seq(2L, 7L, 9L)
    // contrast: min-id dedup would keep doc 1, the worst copy
    Graph.dedupByComponents(df, pairs, "doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq shouldBe Seq(1L, 7L, 9L)
  }

  test("cohortLtv: decimal-exact cumulative revenue per member") {
    def ts(s: String) = Timestamp.valueOf(s)
    val anchor = 1704067200L
    val ev = Seq(
      // users 1,2 in cohort week 0; purchases across weeks 0 and 1
      (1L, 1L, ts("2024-01-02 00:00:00"), "purchase", 10.05),
      (2L, 2L, ts("2024-01-03 00:00:00"), "view", 0.0),
      (3L, 1L, ts("2024-01-09 00:00:00"), "purchase", 0.10),
      (4L, 2L, ts("2024-01-10 00:00:00"), "purchase", 5.00)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Events.cohortLtv(ev, anchorEpoch = anchor).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val w0 = out((0L, 0L))
    w0.getAs[Long]("n_users") shouldBe 2L
    w0.getAs[Double]("rev") shouldBe 10.05
    w0.getAs[Double]("cum_rev") shouldBe 10.05
    w0.getAs[Double]("ltv") shouldBe 5.025
    val w1 = out((0L, 1L))
    w1.getAs[Double]("rev") shouldBe 5.10
    w1.getAs[Double]("cum_rev") shouldBe 15.15 // 10.05+0.10+5.00 exact
    w1.getAs[Double]("ltv") shouldBe 7.575
  }
}
