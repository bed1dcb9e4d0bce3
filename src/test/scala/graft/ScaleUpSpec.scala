package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the [[ScaleUp]] generator contract on a real 2-copy build of
  * sf0.001 (VERDICT r13 #2): every decade-exponent claim in
  * BENCH_NOTES rests on the scale-up preserving per-copy workload
  * shape while growing the global token/shingle space — a silent
  * generator or testdata drift would invalidate every future 10x
  * measurement, so the invariants live in CI, not prose. */
class ScaleUpSpec extends AnyFunSuite with SparkSpec {

  private lazy val in = "/root/testdata/sf0.001"
  private lazy val out = {
    val dir = java.nio.file.Files
      .createTempDirectory("scaleup_spec").toString
    ScaleUp.build(spark, in, dir, copies = 2)
    dir
  }
  private def orig(t: String) = spark.read.parquet(s"$in/$t.parquet")
  private def up(t: String) = spark.read.parquet(s"$out/$t.parquet")

  test("row counts: fact tables scale by copies, broadcast dims stay " +
    "single-copy") {
    for (t <- Seq("documents", "embeddings", "events", "lineitem",
      "orders", "customer", "supplier", "part"))
      assert(up(t).count() == 2 * orig(t).count(), s"table $t")
    for (t <- Seq("nation", "region"))
      assert(up(t).count() == orig(t).count(), s"dim $t")
  }

  test("referential integrity holds across copies: every scaled " +
    "foreign key resolves") {
    def dangling(fact: String, fk: String, dim: String, pk: String) =
      up(fact).select(col(fk).as("k")).distinct()
        .join(up(dim).select(col(pk).as("k")), Seq("k"), "left_anti")
        .count()
    assert(dangling("lineitem", "l_orderkey", "orders", "o_orderkey") == 0)
    assert(dangling("lineitem", "l_partkey", "part", "p_partkey") == 0)
    assert(dangling("lineitem", "l_suppkey", "supplier", "s_suppkey") == 0)
    assert(dangling("orders", "o_custkey", "customer", "c_custkey") == 0)
    // and the copies don't collide: key ranges are disjoint strides
    assert(up("orders").select("o_orderkey").distinct().count() ==
      2 * orig("orders").select("o_orderkey").distinct().count())
  }

  test("copy 0 is verbatim: the original tables embed unchanged") {
    val d0 = up("documents")
      .join(orig("documents").select(col("doc_id"),
        col("text").as("t0")), Seq("doc_id"))
    assert(d0.count() == orig("documents").count())
    assert(d0.filter(col("text") =!= col("t0")).count() == 0)
    val e0 = up("embeddings")
      .join(orig("embeddings").select(col("vec_id"),
        col("embedding").as("v0")), Seq("vec_id"))
    assert(e0.filter(col("embedding") =!= col("v0")).count() == 0)
  }

  test("caesar rotation preserves per-doc char and token counts " +
    "exactly while growing the global token space") {
    val dS = orig("documents").agg(max("doc_id")).head().getLong(0) + 1L
    val tok = (c: org.apache.spark.sql.Column) =>
      size(split(c, "\\s+"))
    val paired = up("documents").filter(col("doc_id") >= dS)
      .select((col("doc_id") - dS).as("doc_id"),
        col("text").as("t1"), col("n_chars").as("n1"))
      .join(orig("documents"), Seq("doc_id"))
    assert(paired.count() == orig("documents").count())
    assert(paired.filter(length(col("t1")) =!= length(col("text")))
      .count() == 0, "caesar must preserve char counts")
    assert(paired.filter(tok(col("t1")) =!= tok(col("text")))
      .count() == 0, "caesar must preserve token counts")
    assert(paired.filter(col("n1") =!= col("n_chars")).count() == 0)
    // the whole point vs plain duplication: the token space GROWS, so
    // per-gram bucket occupancy does NOT multiply by the copy count
    def vocab(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0).distinct().count()
    val (v1, v2) = (vocab(orig("documents")), vocab(up("documents")))
    assert(v2 > v1 * 1.5,
      s"2-copy vocab $v2 must grow well past single-copy $v1")
  }

  test("embedding circular shift preserves the element multiset " +
    "(hence the norm) exactly") {
    val vS = orig("embeddings").agg(max("vec_id")).head().getLong(0) + 1L
    val paired = up("embeddings").filter(col("vec_id") >= vS)
      .select((col("vec_id") - vS).as("vec_id"),
        col("embedding").as("v1"))
      .join(orig("embeddings"), Seq("vec_id"))
    assert(paired.count() == orig("embeddings").count())
    // sorted element lists equal => same multiset => identical L2 norm
    // bit-for-bit, no float tolerance needed
    assert(paired.filter(
      array_sort(col("v1")) =!= array_sort(col("embedding")))
      .count() == 0)
    // and the copy is NOT the identity (the shift actually rotated)
    assert(paired.filter(col("v1") =!= col("embedding")).count() > 0)
  }
}
