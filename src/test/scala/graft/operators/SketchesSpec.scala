package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.SketchExprs

class SketchesSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("bloomMightContain: zero false negatives, fpp-bounded positives") {
    val keys = (0L until 1000L).map(_ * 7L)
    val bloom = BloomFilter.create(keys.size.toLong, 0.01)
    keys.foreach(bloom.putLong)
    val probed = spark.range(0, 7000)
      .select(col("id"), SketchExprs.bloomMightContain(bloom, col("id")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every true key admitted — the semi-join correctness contract
    assert(keys.forall(probed(_)))
    // false-positive rate in the advertised ballpark (1% of 6000 ≈ 60)
    val fps = probed.count { case (k, hit) => hit && k % 7 != 0 }
    assert(fps < 6000 * 0.03, s"fp count $fps way over fpp bound")
  }

  test("bloomSemiJoin matches the exact semi-join") {
    val big = spark.range(0, 5000).select((col("id") % 500).as("k"), col("id").as("v"))
    val keys = Seq(3L, 17L, 17L, 255L, 499L, 9999L).toDF("key")
    val got = Sketches.bloomSemiJoin(big, keys, "k", "key")
      .groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 9999 matches nothing; each surviving k appears 10x in big
    assert(got == Map(3L -> 10L, 17L -> 10L, 255L -> 10L, 499L -> 10L))
  }

  test("heavyHitters: exact counts, no true hitter lost, no light token kept") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b c d e"),
      (3L, "a a c c x")
    ).toDF("doc_id", "text")
    val got = Sketches.heavyHitters(docs, "text", minCount = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 6L, "b" -> 3L, "c" -> 4L))
    TrackedCaches.releaseAll()
  }

  test("sketch probes run inside whole-stage codegen") {
    val bloom = BloomFilter.create(10, 0.01)
    bloom.putLong(1L)
    val df = spark.range(0, 10)
      .filter(SketchExprs.bloomMightContain(bloom, col("id")))
    // "*(1) Filter" = the probe Filter runs inside codegen stage 1
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter"),
      s"bloom probe fell out of codegen:\n$plan")
  }

  test("approxDistinctTokens: within the rsd envelope of exact, deterministic") {
    import spark.implicits._
    val docs = (1 to 200).map { i =>
      (i.toLong, s"grp${i % 3}",
        (1 to 40).map(j => s"w${(i * 37 + j * 11) % 997}").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val approx = Sketches.approxDistinctTokens(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.selectExpr("source",
        "explode(split(lower(trim(text)), '\\\\s+')) AS tok")
      .where("length(tok) > 0").distinct()
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (g, n) =>
      val rel = math.abs(approx(g).toDouble - n) / n
      assert(rel < 0.15, s"group $g: approx=${approx(g)} exact=$n rel=$rel")
    }
    // HLL registers are a pure function of the token set: re-running
    // must reproduce the identical estimates
    val again = Sketches.approxDistinctTokens(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == approx)
  }

  test("approxDistinctTokens plan: partial HLL aggregate before the shuffle") {
    import spark.implicits._
    val docs = Seq((1L, "a", "x y z")).toDF("doc_id", "source", "text")
    val plan = Sketches.approxDistinctTokens(docs, "source", "text")
      .queryExecution.executedPlan.toString()
    // map-side partial merge: the shuffle carries sketches, not tokens
    assert(plan.contains("partial_approx_count_distinct") ||
      plan.contains("HashAggregate"), s"no partial agg in:\n$plan")
  }
}
