package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The r5 verdict's loss-proof contract, pinned: a deliberately-broken
  * query must produce a VISIBLE error artifact, never a silent
  * omission that shrinks the reported surface. */
class VerifyLossProofSpec extends AnyFunSuite with Matchers
    with SparkSpec {
  import org.apache.spark.sql.functions._

  test("a throwing query leaves a marker parquet + _errors.json entry") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-verify-loss").toString
    val todo = Map[String, (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame](
      "q_ok" -> ((s, _) => {
        import s.implicits._
        Seq((1L, "a")).toDF("id", "v")
      }),
      "q_boom" -> ((_, _) => throw new IllegalStateException("kaboom")))
    val (dumped, errors) = Verify.dump(spark, "/unused", out, todo,
      Map("q_ok" -> "SELECT 1"))
    dumped shouldBe 2 // BOTH queries left artifacts
    errors.keySet shouldBe Set("q_boom")
    errors("q_boom") should include("kaboom")
    // the marker parquet is readable and can never hash-match an oracle
    val marker = spark.read.parquet(s"$out/q_boom")
    marker.columns.toSeq should contain("__verify_error")
    marker.count() shouldBe 1L
    // the sidecar names the broken query
    val sidecar = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$out/_errors.json"))
    sidecar should include("q_boom")
    sidecar should include("kaboom")
  }

  test("a clean run still writes an EMPTY _errors.json (stale-file guard)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-verify-clean").toString
    // simulate a stale sidecar from an earlier broken run
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/_errors.json"), """{"q_old": "x"}""")
    val todo = Map[String, (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame](
      "q_ok" -> ((s, _) => {
        import s.implicits._
        Seq((1L, "a")).toDF("id", "v")
      }))
    val (dumped, errors) = Verify.dump(spark, "/unused", out, todo,
      Map.empty)
    dumped shouldBe 1
    errors shouldBe empty
    java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/_errors.json")) shouldBe "{}"
  }

  test("oracle_sql.json escapes control characters (driver json.load safety)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-verify-esc").toString
    Verify.dump(spark, "/unused", out, Map.empty,
      Map("q_x" -> "SELECT 1\n\tAS \"a\\b\""))
    val txt = java.nio.file.Files
      .readString(java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    // parseable by any strict JSON reader: no raw control chars
    txt.exists(c => c < ' ') shouldBe false
    txt should include("\\n")
    txt should include("\\t")
    txt should include("\\\\")
  }
}
