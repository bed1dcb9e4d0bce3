package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-18: kmvDistinct (exact arm, error envelope,
  * determinism), linearFit, vocabOverlap. */
class Wave18Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("kmvDistinct: under-k groups report the exact distinct count") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 3L))
      .toDF("g", "k")
    val r = Sketches.kmvDistinct(df, "g", "k", k = 16).collect()
    r.length shouldBe 1
    r.head.getAs[Long]("n_kept") shouldBe 3L
    r.head.getAs[Double]("est_distinct") shouldBe 3.0
  }

  test("kmvDistinct: estimate envelope and determinism at 2000 keys") {
    // k=64 -> rsd ~ 1/sqrt(62) ~ 12.7%; assert a generous 4-sigma
    val df = (0 until 2000).map(i => ("g", i.toLong)).toDF("g", "k")
    val est1 = Sketches.kmvDistinct(df, "g", "k", k = 64)
      .collect().head.getAs[Double]("est_distinct")
    val est2 = Sketches.kmvDistinct(df, "g", "k", k = 64)
      .collect().head.getAs[Double]("est_distinct")
    est1 shouldBe est2
    est1 should be > 1000.0
    est1 should be < 3000.0
  }

  test("linearFit: exact line recovers slope/intercept, r2 = 1") {
    val line = (0 until 5).map(i => ("a", i.toLong, 2L * i + 1))
    val const = Seq(("c", 3L, 1L), ("c", 3L, 2L)) // var(x)=0 -> nulls
    val r = Stats.linearFit((line ++ const).toDF("g", "x", "y"),
        "g", "x", "y")
      .collect().map(x => x.getAs[String]("g") ->
        (Option(x.getAs[java.lang.Double]("slope")),
          Option(x.getAs[java.lang.Double]("intercept")),
          Option(x.getAs[java.lang.Double]("r2")))).toMap
    r("a") shouldBe ((Some(2.0), Some(1.0), Some(1.0)))
    r("c") shouldBe ((None, None, None))
  }

  test("vocabOverlap: set Jaccard, zero-overlap pairs absent") {
    val df = Seq(("A", "a b c"), ("B", "b c d"), ("C", "z"))
      .toDF("source", "text")
    val r = Stats.vocabOverlap(df, "source", "text")
      .collect().map(x => (x.getAs[String]("s1"), x.getAs[String]("s2"))
        -> (x.getAs[Long]("inter"), x.getAs[Double]("jaccard"))).toMap
    r.keySet shouldBe Set(("A", "B")) // C shares nothing
    r(("A", "B")) shouldBe ((2L, 0.5))
  }
}
