package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-8 wave: k-truss, Mann-Kendall, Benford, k-anonymity,
  * stickiness, incremental group stats. */
class Wave8Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("kTruss: triangles survive, chains dissolve") {
    // triangle 1-2-3 plus a chain 3-4-5 (2-core-free tail): the chain
    // has no triangles and must peel away; every triangle edge has
    // in-truss support 1
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val out = Graph.kTruss(edges, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    out shouldBe Map((1L, 2L) -> 1L, (2L, 3L) -> 1L, (1L, 3L) -> 1L)
    Dedup.releaseCaches()
  }

  test("kTruss: a 4-clique is a 4-truss (every edge in 2 triangles)") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = (for (a <- nodes; b <- nodes if a < b) yield (a, b))
      .toDF("id_a", "id_b")
    val out = Graph.kTruss(edges, k = 4).collect()
    out.length shouldBe 6
    all(out.map(_.getLong(2))) shouldBe 2L
    Dedup.releaseCaches()
  }

  test("mannKendall: monotone series trends up, constant series doesn't") {
    val up = (1 to 20).map(i => ("up", i.toLong, i.toDouble))
    val flat = (1 to 20).map(i => ("flat", i.toLong, 7.0))
    val out = Stats.mannKendall((up ++ flat).toDF("g", "t", "x"),
        "g", "t", "x")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .toMap
    val n = 20L
    out("up")._1 shouldBe n
    out("up")._2 shouldBe n * (n - 1) / 2 // every pair ascends
    out("up")._4 shouldBe "up"
    // closed form: z = (S-1)/sqrt(n(n-1)(2n+5)/18), no ties
    val varU = n * (n - 1) * (2 * n + 5) / 18.0
    out("up")._3 shouldBe BigDecimal((out("up")._2 - 1) / math.sqrt(varU))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // constant series: S = 0 and the tie correction kills the variance
    out("flat")._2 shouldBe 0L
    out("flat")._3 shouldBe 0.0
    out("flat")._4 shouldBe "none"
  }

  test("benfordDigits: digits from the decimal string, values < 1 excluded") {
    val df = Seq(("g", 123.4), ("g", 19.0), ("g", 987.0), ("g", 1.0),
      ("g", 0.5)) // 0.5 excluded by contract
      .toDF("g", "x")
    val out = Stats.benfordDigits(df, "g", "x")
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    out(1)._1 shouldBe 3L // 123.4, 19.0, 1.0
    out(9)._1 shouldBe 1L
    out(1)._2 shouldBe 0.75
    out(9)._2 shouldBe 0.25
    out.keySet shouldBe Set(1, 9)
    // expectation column is Benford's law
    val exp1 = Stats.benfordDigits(df, "g", "x")
      .filter(col("digit") === 1).select("expected").head.getDouble(0)
    exp1 shouldBe BigDecimal(math.log10(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("kAnonymity: class sizes and under-k risk flags; nulls are a class") {
    val df = Seq(
      (Some("US"), "A"), (Some("US"), "A"), (Some("US"), "A"),
      (Some("DE"), "B"),
      (None, "B"), (None, "B"))
      .toDF("country", "seg")
    val out = Privacy.kAnonymity(df, Seq("country", "seg"), k = 3)
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    out((Some("US"), "A")) shouldBe ((3L, false))
    out((Some("DE"), "B")) shouldBe ((1L, true))
    out((None, "B")) shouldBe ((2L, true))
  }

  test("stickiness: trailing MAU counts distinct users over the window") {
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00")), (2L, ts("2026-01-01 11:00:00")),
      (2L, ts("2026-01-02 10:00:00")),
      (3L, ts("2026-03-01 10:00:00"))) // outside the 28d window of Jan
      .toDF("user_id", "ts")
    val out = Events.stickiness(ev, windowDays = 28)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val d1 = ts("2026-01-01 10:00:00").getTime / 1000 / 86400
    val d2 = d1 + 1
    out(d1) shouldBe ((2L, 2L, 1.0))
    out(d2) shouldBe ((1L, 2L, 0.5)) // users 1,2 within trailing 28d
    out(out.keySet.max) shouldBe ((1L, 1L, 1.0)) // March day sees only u3
  }

  test("incrementalGroupStats == from-scratch over the merged corpus") {
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L),
      (4L, "c", 7L)).toDF("id", "src", "v")
    // update id 2 (bigger v), MOVE id 3 to source c, insert id 9
    val delta = Seq((2L, "a", 25L), (3L, "c", 5L), (9L, "d", 1L))
      .toDF("id", "src", "v")
    val got = Profile.incrementalGroupStats(
        Profile.groupStats(base, "src", "v"), base, delta,
        "id", "src", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // from-scratch: delta rows + base rows whose id is not in delta
    val merged = Seq((1L, "a", 10L), (4L, "c", 7L), (2L, "a", 25L),
      (3L, "c", 5L), (9L, "d", 1L))
    val oracle = merged.groupBy(_._2).view
      .mapValues(rs => (rs.size.toLong, rs.map(_._3).sum)).toMap
    got shouldBe oracle
    // source b vanished (its only row moved to c) — no zero-row ghost
    got.contains("b") shouldBe false
  }
}
