package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-9 wave-16: gapFillDaily (LOCF + span fail-fast),
  * bipartiteProject (weights + the enforced left-degree cap), and the
  * streaming changelog compaction's batch==batch-operator parity. */
class Wave16Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("gapFillDaily: LOCF fills the spine, flags the filled days") {
    val df = Seq(("a", 0L, 5L), ("a", 3L, 7L)).toDF("g", "day", "x")
    val r = Temporal.gapFillDaily(df, "g", "day", "x")
      .collect().map(x => x.getAs[Long]("day") ->
        (x.getAs[Double]("x"), x.getAs[Boolean]("filled"))).toMap
    r shouldBe Map(0L -> ((5.0, false)), 1L -> ((5.0, true)),
      2L -> ((5.0, true)), 3L -> ((7.0, false)))
  }

  test("gapFillDaily: a corrupt-epoch span trips the fail-fast") {
    val df = Seq(("a", 0L, 1L), ("a", 50000L, 2L)).toDF("g", "day", "x")
    val e = intercept[IllegalArgumentException] {
      Temporal.gapFillDaily(df, "g", "day", "x")
    }
    e.getMessage should include("maxSpanDays")
  }

  test("bipartiteProject: co-occurrence weights with canonical pairs") {
    // l1:{1,2,3} l2:{2,3} l3:{3,9} -> (2,3) weight 2, rest weight 1
    val m = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 2L), (2L, 3L),
      (3L, 3L), (3L, 9L)).toDF("l", "r")
    val all = Graph.bipartiteProject(m, "l", "r")
      .collect().map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"))
        -> x.getAs[Long]("weight")).toMap
    all shouldBe Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 2L,
      (3L, 9L) -> 1L)
    val pruned = Graph.bipartiteProject(m, "l", "r", minWeight = 2L)
      .collect()
    pruned.map(x => (x.getLong(0), x.getLong(1))).toSet shouldBe
      Set((2L, 3L))
  }

  test("bipartiteProject: over-cap left key keeps lowest right ids") {
    // cap 2: l1 keeps {1,2} -> (1,3)/(2,3) lose l1's contribution
    val m = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 2L), (2L, 3L))
      .toDF("l", "r")
    val r = Graph.bipartiteProject(m, "l", "r", maxLeftDegree = 2)
      .collect().map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"))
        -> x.getAs[Long]("weight")).toMap
    r shouldBe Map((1L, 2L) -> 1L, (2L, 3L) -> 1L)
  }

  test("changelogStateful batch mode == the batch operator") {
    // out-of-seq delivery inside each key: the order-insensitive
    // monoid must land on the same net rows as changelogCompact
    val log = Seq(("k1", 2L, "U", 20.0), ("k1", 1L, "I", 10.0),
      ("k2", 3L, "D", 0.0), ("k2", 1L, "I", 5.0),
      ("k3", 2L, "I", 9.0), ("k3", 1L, "D", 0.0))
      .toDF("key", "seq", "op", "value")
    val stream = graft.streaming.StreamingOps.changelogStateful(
        log.as[graft.streaming.ChangeEvent], retainState = false)
      .collect().map(r => r.key ->
        (r.n_changes, r.first_op, r.last_op, r.net_op, r.last_val))
      .toMap
    val batch = Dedup.changelogCompact(log, "key", "seq", "op", "value")
      .collect().map(x => x.getAs[String]("key") ->
        (x.getAs[Long]("n_changes"), x.getAs[String]("first_op"),
          x.getAs[String]("last_op"), x.getAs[String]("net_op"),
          x.getAs[Double]("last_val"))).toMap
    stream shouldBe batch
    stream("k1") shouldBe ((2L, "I", "U", "I", 20.0))
    stream("k2") shouldBe ((2L, "I", "D", "N", 0.0))
    stream("k3") shouldBe ((2L, "D", "I", "U", 9.0))
  }
}
