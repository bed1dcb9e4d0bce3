package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class GlobalOrderSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private val ids = (0L until 3000L).toDF("id")

  private def reference(salt: String): Seq[(Long, Long)] = {
    // single-window global row_number — the semantics the sharded
    // formulation must reproduce (fine in a test, a scale bug in prod)
    val w = Window.orderBy(
      md5(concat(col("id").cast("string"), lit("#" + salt))), col("id"))
    ids.select(col("id"), row_number().over(w).cast("long").as("pos"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("matches the single-window global row_number exactly") {
    val got = GlobalOrder.globalRowNumber(ids, "id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    got shouldBe reference("order")
  }

  test("positions are a 1..n permutation and salt reshuffles them") {
    val a = GlobalOrder.globalRowNumber(ids, "id")
      .as[(Long, Long)].collect()
    a.map(_._2).sorted shouldBe (1L to 3000L).toArray
    val b = GlobalOrder.globalRowNumber(ids, "id", salt = "v2")
      .as[(Long, Long)].collect()
    a.toMap should not be b.toMap
    b.map(_._2).sorted shouldBe (1L to 3000L).toArray
  }

  test("result is invariant to shard prefix length and partitioning") {
    val base = GlobalOrder.globalRowNumber(ids, "id")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    for (p <- 1 to 3)
      GlobalOrder.globalRowNumber(ids.repartition(13), "id",
        hexPrefixLen = p)
        .as[(Long, Long)].collect().sortBy(_._1).toSeq shouldBe base
  }

  test("auto sizing picks the smallest prefix that fits the budget") {
    // synthetic finest-granularity counts: one hot 1-char prefix
    val counts = Map("aaaa" -> 100L, "aaab" -> 100L, "abcd" -> 50L)
    GlobalOrder.choosePrefix(counts, 300L) shouldBe 1 // 'a' = 250 fits
    GlobalOrder.choosePrefix(counts, 150L) shouldBe 4 // only aaaa|aaab split
    GlobalOrder.choosePrefix(counts, 220L) shouldBe 2 // 'aa' = 200 fits
    GlobalOrder.choosePrefix(Map.empty, 1L) shouldBe 1
    // and a tiny budget end-to-end still reproduces the order
    GlobalOrder.globalRowNumber(ids, "id", maxRowsPerShard = 25L)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq shouldBe
      reference("order")
  }

  test("globalPrefixSum matches the one-window running total and " +
      "globalRowNumber's positions") {
    val vals = ids.withColumn("v", (col("id") % 7) + 1)
    val w = Window.orderBy(
      md5(concat(col("id").cast("string"), lit("#order"))), col("id"))
    val ref = vals.select(col("id"),
        row_number().over(w).cast("long").as("pos"),
        coalesce(sum("v")
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("cum"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val got = GlobalOrder.globalPrefixSum(vals, "id", "v")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    got shouldBe ref
    val pos = GlobalOrder.globalRowNumber(ids, "id")
      .as[(Long, Long)].collect().toMap
    got.foreach { case (id, p, _) => p shouldBe pos(id) }
  }

  test("globalPrefixSum counts null values as zero") {
    val vals = ids.withColumn("v",
      when(col("id") % 2 === 0, lit(null)).otherwise(lit(3L)))
    val got = GlobalOrder.globalPrefixSum(vals, "id", "v")
      .as[(Long, Long, Long)].collect()
    // total over all-but-last rows = 3 * (#odd ids among the first n-1)
    val byPos = got.sortBy(_._2)
    byPos.last._3 shouldBe 3L *
      byPos.init.count(r => r._1 % 2 == 1)
    // prefix sums are monotone
    byPos.map(_._3).toSeq shouldBe byPos.map(_._3).toSeq.sorted
  }

  test("null ids are excluded; the rest keep dense positions") {
    val withNulls = ids.select(
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id")).as("id"))
    val got = GlobalOrder.globalRowNumber(withNulls, "id")
      .as[(Long, Long)].collect()
    got.length shouldBe 2700
    got.map(_._2).sorted shouldBe (1L to 2700L).toArray
  }
}
