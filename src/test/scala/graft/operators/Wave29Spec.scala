package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-29: gains table and top movers (dup-source matrix and
  * cumulative uniques are compositions of already-spec'd operators,
  * pinned by their oracles). */
class Wave29Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("gainsTable: best-first cumulative capture and lift") {
    val rows = Seq((9L, true), (9L, true), (5L, true), (1L, false),
      (1L, false))
    val r = Eval.gainsTable(rows.toDF("raw", "y"), "raw",
      maxRaw = 10L, "y", bins = 5).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4), x.getDouble(5))).toMap
    r(4L) shouldBe ((2L, 2L, 0.4, 0.666667, 1.666667))
    r(2L) shouldBe ((1L, 1L, 0.6, 1.0, 1.666667))
    r(0L) shouldBe ((2L, 0L, 1.0, 1.0, 1.0))
  }

  test("topMovers: appear/vanish count as moves, |delta| rank") {
    // a: 3 -> 1; b: appears with 4; c: 2 -> gone; d: too old to count
    val rows = Seq.fill(3)(("a", 1L)) ++ Seq(("a", 2L)) ++
      Seq.fill(4)(("b", 2L)) ++ Seq.fill(2)(("c", 1L)) ++
      Seq.fill(5)(("d", 0L))
    val r = Profile.topMovers(rows.toDF("c", "w"), "c", "w", k = 2)
      .collect()
    r.length shouldBe 2
    r(0).getString(0) shouldBe "b"
    r(0).getLong(2) shouldBe 0L // prev
    r(0).getLong(3) shouldBe 4L // cur
    r(0).getLong(4) shouldBe 4L // delta
    r(0).isNullAt(5) shouldBe true // pct undefined from a zero base
    r(1).getString(0) shouldBe "a" // |−2| ties c, category breaks it
    r(1).getLong(4) shouldBe -2L
    r(1).getDouble(5) shouldBe -0.666667
  }
}
