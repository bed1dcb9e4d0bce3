package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Round-12 wave 61: generic bootstrap SE, epoch planning. */
class Wave61Spec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("bootstrapMeanSe: se scales ~1/sqrt(n) and sits near the " +
    "analytic se for iid data") {
    val small = (1 to 100).map(i => (i.toLong, (i % 7).toLong * 10))
      .toDF("id", "x")
    val big = (1 to 900).map(i => (i.toLong, (i % 7).toLong * 10))
      .toDF("id", "x")
    val seS = Stats.bootstrapMeanSe(small, "id", "x").head().getDouble(2)
    val seB = Stats.bootstrapMeanSe(big, "id", "x").head().getDouble(2)
    // 9x the data -> ~3x smaller se (loose band: 64 replicates)
    seS / seB shouldBe 3.0 +- 1.2
    // analytic se of x in {0,10,..,60} uniform-ish: sd/sqrt(n)
    val xs = (1 to 100).map(i => ((i % 7) * 10).toDouble)
    val m = xs.sum / xs.length
    val sd = math.sqrt(xs.map(v => (v - m) * (v - m)).sum / xs.length)
    seS shouldBe (sd / math.sqrt(100.0)) +- sd / math.sqrt(100.0)
  }

  test("bootstrapMeanSe: constant data reads se 0, exact mean") {
    val df = (1 to 50).map(i => (i.toLong, 42L)).toDF("id", "x")
    val r = Stats.bootstrapMeanSe(df, "id", "x").head()
    r.getLong(0) shouldBe 50L
    r.getDouble(1) shouldBe 42.0
    r.getDouble(2) shouldBe 0.0
  }

  test("bootstrapMeanSe: partitioning-invariant (exact integer " +
    "moments)") {
    val df = (1 to 200).map(i => (i.toLong, (i * 13 % 97).toLong))
      .toDF("id", "x")
    Stats.bootstrapMeanSe(df.repartition(7), "id", "x").head() shouldBe
      Stats.bootstrapMeanSe(df.coalesce(1), "id", "x").head()
  }

  test("epochPlan: scarce sources repeat to the cap, rich sources " +
    "stay under one epoch") {
    val df = (Seq.fill(10)(("rich", 1000L)) ++ Seq.fill(2)(("scarce", 10L)))
      .toDF("src", "tok")
    // budget 2000, 2 sources -> quota 1000 each
    val r = Sampling.epochPlan(df, "src", "tok", totalBudget = 2000L)
      .orderBy("source").collect()
    val rich = r(0); val scarce = r(1)
    rich.getString(0) shouldBe "rich"
    rich.getDouble(3) shouldBe 0.1 // 1000 quota / 10000 mass
    scarce.getDouble(3) shouldBe 4.0 // capped
    scarce.getDouble(4) shouldBe 80.0 // 20 * 4
  }
}
