package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-17: paretoFrontier2D dominance semantics and the
  * schema-evolution merged read. */
class Wave17Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("paretoFrontier2D: strict dominance, duplicates both survive") {
    // (1,5)x2, (2,7), (2,6), (3,7), (3,9), (5,9):
    // frontier = both (1,5), (2,7), (3,9); (2,6) loses to (2,7),
    // (3,7) loses to cheaper (2,7), (5,9) loses to cheaper (3,9)
    val df = Seq(("g", 1L, 5L), ("g", 1L, 5L), ("g", 2L, 7L),
      ("g", 2L, 6L), ("g", 3L, 7L), ("g", 3L, 9L), ("g", 5L, 9L))
      .toDF("g", "cost", "gain")
    val r = Sampling.paretoFrontier2D(df, "g", "cost", "gain")
      .collect().map(x => (x.getAs[Long]("cost"), x.getAs[Long]("gain")))
    r.sorted shouldBe Seq((1L, 5L), (1L, 5L), (2L, 7L), (3L, 9L))
  }

  test("paretoFrontier2D: fractional costs inside one unit still dominate") {
    // the RANGE -1 formulation this replaced was blind to costs less
    // than one unit apart: A(1.0, 10) strictly dominates B(1.5, 5)
    val df = Seq(("g", 1.0, 10L), ("g", 1.5, 5L)).toDF("g", "cost", "gain")
    val r = Sampling.paretoFrontier2D(df, "g", "cost", "gain")
      .collect().map(x => (x.getAs[Double]("cost"), x.getAs[Long]("gain")))
    r.toSeq shouldBe Seq((1.0, 10L))
  }

  test("readMerged: later generation's new column null-fills gen1") {
    val p = java.nio.file.Files.createTempDirectory("w17-evolve")
    try {
      Seq((1L, "a")).toDF("id", "text")
        .write.parquet(s"$p/gen1")
      Seq((2L, "b", "en")).toDF("id", "text", "lang")
        .write.parquet(s"$p/gen2")
      val m = graft.sources.PanelSource.readMerged(spark,
        Seq(s"$p/gen1", s"$p/gen2"))
      m.columns.toSet shouldBe Set("id", "text", "lang")
      val rows = m.collect()
        .map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("lang")))
        .toMap
      rows shouldBe Map(1L -> None, 2L -> Some("en"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }
  }
}
