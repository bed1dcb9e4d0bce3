package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class QuantileNormSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("valueRank: global positions follow (value, id) order exactly") {
    val df = Seq((1L, 30L), (2L, 10L), (3L, 20L), (4L, 10L))
      .toDF("id", "v")
    val out = GlobalOrder.valueRank(df, "v", "id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("global_pos")).toMap
    out shouldBe Map(2L -> 1L, 4L -> 2L, 3L -> 3L, 1L -> 4L)
  }

  test("valueRank: invariant to input partitioning; nulls excluded") {
    val base = Seq((1L, 5L), (2L, 3L), (3L, 9L), (4L, 3L), (5L, 7L))
    val a = GlobalOrder.valueRank(base.toDF("id", "v"), "v", "id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = GlobalOrder.valueRank(
        base.toDF("id", "v").repartition(7), "v", "id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    a shouldBe b
    val withNull = (base.map { case (i, v) => (i, Option(v)) } :+
      (9L, None: Option[Long])).toDF("id", "v")
    GlobalOrder.valueRank(withNull, "v", "id").count() shouldBe 5L
  }

  test("valueRank: many shards (tiny width) still yields a dense 1..N") {
    val df = (1L to 100L).map(i => (i, i * 1000L)).toDF("id", "v")
    val pos = GlobalOrder.valueRank(df, "v", "id", maxShards = 8)
      .select("global_pos").collect().map(_.getLong(0)).sorted
    pos shouldBe (1L to 100L).toArray
  }

  test("quantileNormalize maps per-source ranks onto the global curve") {
    // source A: 10,20,30 ; source B: 100,200,300 ; global sorted:
    // 10,20,30,100,200,300 (N=6). Rank r in {0,.5,1} -> gi {1,3.5->3,6}
    val df = Seq(
      (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L),
      (4L, "B", 100L), (5L, "B", 200L), (6L, "B", 300L)
    ).toDF("doc_id", "source", "n_chars")
    val out = TextQuality
      .quantileNormalize(df, "source", "n_chars", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // both sources hit the SAME global quantile values
    out(1L) shouldBe out(4L) // r=0   -> global min 10
    out(3L) shouldBe out(6L) // r=1   -> global max 300
    out(2L) shouldBe out(5L) // r=0.5 -> gi=floor(.5*5)+1=3 -> 30
    out(1L) shouldBe 10L
    out(2L) shouldBe 30L
    out(3L) shouldBe 300L
  }

  test("quantileNormalize: singleton source maps to the global minimum") {
    val df = Seq(
      (1L, "A", 50L), (2L, "B", 10L), (3L, "B", 90L))
      .toDF("doc_id", "source", "n_chars")
    val out = TextQuality
      .quantileNormalize(df, "source", "n_chars", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    out(1L) shouldBe 10L // r defined as 0 for ns=1
  }
}
