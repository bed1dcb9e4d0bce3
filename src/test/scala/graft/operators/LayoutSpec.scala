package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class LayoutSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def z(x: Long, y: Long): Long =
    Seq((x, y)).toDF("x", "y")
      .select(Layout.zorder16(col("x"), col("y")).as("z"))
      .first().getLong(0)

  test("zorder16 interleaves bits x-even / y-odd") {
    z(0L, 0L) shouldBe 0L
    z(1L, 0L) shouldBe 1L
    z(0L, 1L) shouldBe 2L
    z(3L, 3L) shouldBe 15L
    z(65535L, 0L) shouldBe 0x55555555L
    z(0L, 65535L) shouldBe 0xAAAAAAAAL
    z(65535L, 65535L) shouldBe 0xFFFFFFFFL
  }

  test("zorder16 locality: x-neighbors stay within the 2-bit block") {
    // within an aligned 2x2 cell the 4 points are curve-contiguous
    val cell = Seq(z(4, 6), z(5, 6), z(4, 7), z(5, 7)).sorted
    cell shouldBe Seq(cell.head, cell.head + 1, cell.head + 2, cell.head + 3)
  }

  test("zorderBuckets: ntile boundaries follow the curve order") {
    val df = (0L until 64L).map(i => (i, i % 8, i / 8)).toDF("id", "x", "y")
    val rows = Layout.zorderBuckets(df, "id", "x", "y", nBuckets = 4)
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    // buckets are non-decreasing along z with 16 rows each
    rows.sortBy(_._1).map(_._2).toSeq shouldBe
      (1 to 4).flatMap(b => Seq.fill(16)(b))
  }

  test("zorderRepartition: partition z-ranges are disjoint and ordered") {
    val df = (0L until 1000L).map(i => (i, i * 7 % 997, i * 13 % 991))
      .toDF("id", "x", "y")
    val parted = Layout.zorderRepartition(df, "x", "y", nPartitions = 8)
    val zc = Layout.zorder16(pmod(col("x"), lit(65536L)),
      pmod(col("y"), lit(65536L)))
    val ranges = parted.withColumn("z", zc)
      .select(spark_partition_id().as("p"), col("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("p")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    ranges.length should be > 1
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      hi should be <= lo // disjoint, ordered: file min/max prune cleanly
    }
    parted.count() shouldBe 1000L // clustering is row-preserving
  }

  test("tokenEntropy: uniform tokens log2(k), single token 0") {
    val df = Seq(
      (1L, "a b c d"),       // 4 distinct -> 2 bits
      (2L, "x x x x"),       // degenerate -> 0 bits
      (3L, "a a b b c c d d")// uniform over 4 -> 2 bits
    ).toDF("doc_id", "text")
    val out = TextQuality.tokenEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    out(1L) shouldBe ((4L, 2.0))
    out(2L) shouldBe ((4L, 0.0))
    out(3L) shouldBe ((8L, 2.0))
  }
}
