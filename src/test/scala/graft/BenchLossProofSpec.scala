package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The r6 verdict's bench loss-proof contract, pinned: a throwing bench
  * query must surface as timing -1.0 plus an explicit `errors` entry in
  * the rendered JSON — never a plausible-looking wall time — and the
  * JSON line itself must be complete and machine-parseable so the file
  * copy (`bench_out.json`) carries the full per-query map even when the
  * driver's stdout capture truncates. */
class BenchLossProofSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fakeQueries = Map[String,
      (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame](
    "q_ok" -> ((s, _) => {
      import s.implicits._
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }),
    "q_boom" -> ((_, _) => throw new IllegalStateException("bench kaboom")))

  test("a throwing query records -1.0 and an errors entry; survivors still time") {
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = Bench.timeQueries(spark, "/unused",
      Seq("q_boom", "q_ok"), reps = 2, fakeQueries, errors)
    val m = results.toMap
    m("q_boom") shouldBe -1.0
    m("q_ok") should be > 0.0
    errors.keySet shouldBe Set("q_boom")
    errors("q_boom") should include("bench kaboom")
  }

  test("flaky query (fails one rep, succeeds another): timing kept, error visible") {
    var calls = 0
    val flaky = Map[String,
        (org.apache.spark.sql.SparkSession, String)
          => org.apache.spark.sql.DataFrame](
      "q_flaky" -> ((s, _) => {
        calls += 1
        if (calls == 1) throw new IllegalStateException("cold boom")
        import s.implicits._
        Seq(1L).toDF("v")
      }))
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = Bench.timeQueries(spark, "/unused", Seq("q_flaky"),
      reps = 2, flaky, errors)
    // the documented flaky contract: positive (warm) timing AND a
    // visible error entry — neither the measurement nor the failure
    // is discarded
    results.toMap.apply("q_flaky") should be > 0.0
    errors("q_flaky") should include("cold boom")
  }

  test("renderJson: failures excluded from total, visible in queries+errors, valid JSON") {
    val all = Seq("q_ok" -> 1.5, "q_boom" -> -1.0, "q_ok2" -> 2.5)
    val errors = scala.collection.mutable.LinkedHashMap(
      "q_boom" -> "IllegalStateException: line1\nline2\t\"quoted\"")
    val line = Bench.renderJson(all, errors, "/root/testdata/sf0.1")
    // total sums only the queries that ran
    line should include("\"value\":4.0")
    line should include("\"q_boom\":-1.0")
    line should include("\"errors\":{\"q_boom\":")
    // control chars and quotes in error messages must not break parsing;
    // round-trip through Spark's JSON reader to prove the line is valid
    import spark.implicits._
    val parsed = spark.read.json(Seq(line).toDS)
    parsed.count() shouldBe 1L
    parsed.columns should contain allOf ("metric", "queries", "errors", "value")
    parsed.select("queries.q_boom").head.getDouble(0) shouldBe -1.0
    parsed.select("value").head.getDouble(0) shouldBe 4.0
  }

  test("clean run renders an empty errors object") {
    val line = Bench.renderJson(Seq("q_ok" -> 0.5),
      scala.collection.mutable.LinkedHashMap.empty[String, String], "sf")
    line should include("\"errors\":{}")
    line should include("\"value\":0.5")
  }

  test("renderCompact: fits the driver's 2000-char tail window at full surface") {
    // 250 queries with realistically long names — larger than the real
    // surface — must still render under half the tail window
    val all = (1 to 250).map(i =>
      f"q_realistically_long_name_$i%03d" -> (i * 0.037))
    val errors = scala.collection.mutable.LinkedHashMap(
      "q_realistically_long_name_007" -> "boom")
    val line = Bench.renderCompact(all, errors, "/root/testdata/sf0.1")
    line.length should be < 1000
    import spark.implicits._
    val parsed = spark.read.json(Seq(line).toDS)
    parsed.columns should contain allOf
      ("metric", "value", "n_queries", "n_errors", "slowest", "full_map")
    parsed.select("n_queries").head.getLong(0) shouldBe 250L
    parsed.select("n_errors").head.getLong(0) shouldBe 1L
    parsed.select("full_map").head.getString(0) shouldBe "bench_out.json"
    // headline matches the full line's sum over succeeded queries
    parsed.select("value").head.getDouble(0) shouldBe
      (all.map(_._2).sum +- 0.001)
  }
}
