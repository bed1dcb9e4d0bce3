package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-21: classificationReport closed forms (including the
  * zero_division=0 convention) and the corruption-capturing CSV read. */
class Wave21Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def report(rows: Seq[(String, String)]) =
    Eval.classificationReport(rows.toDF("lbl", "prd"), "lbl", "prd")
      .collect().map(r => r.getAs[String]("class") ->
        (r.getAs[Long]("support"), r.getAs[Double]("precision"),
          r.getAs[Double]("recall"), r.getAs[Double]("f1"))).toMap

  test("classificationReport: per-class + macro + accuracy closed forms") {
    // cells: (a,a)=1, (a,b)=1, (b,b)=2
    val r = report(Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b")))
    r("a") shouldBe ((2L, 1.0, 0.5, 0.666667))
    r("b") shouldBe ((2L, 0.666667, 1.0, 0.8))
    r("macro") shouldBe ((4L, 0.833333, 0.75, 0.733333))
    r("accuracy") shouldBe ((4L, 0.75, 0.75, 0.75))
  }

  test("classificationReport: never-predicted class scores 0, not NaN") {
    // c is labeled once, never predicted -> p = r = f1 = 0 (sklearn
    // zero_division=0), and it still appears in the report
    val r = report(Seq(("a", "a"), ("c", "a")))
    r("c") shouldBe ((1L, 0.0, 0.0, 0.0))
    r("a")._2 shouldBe 0.5 // a predicted twice, right once
    r.keySet shouldBe Set("a", "c", "macro", "accuracy")
  }

  test("readCsvAudit: malformed lines land in _corrupt, counted not dropped") {
    val p = java.nio.file.Files.createTempDirectory("w21-csv")
    try {
      Seq("1,en", "notanumber,fr", "2,de").toDF("value")
        .write.text(s"$p/lines")
      val df = graft.sources.PanelSource.readCsvAudit(spark,
        s"$p/lines", "doc_id LONG, lang STRING")
      df.count() shouldBe 3L
      df.filter(org.apache.spark.sql.functions.col("_corrupt")
        .isNotNull).count() shouldBe 1L
      df.filter(org.apache.spark.sql.functions.col("doc_id")
        .isNotNull).count() shouldBe 2L
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }
  }
}
