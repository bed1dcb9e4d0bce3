package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build a larger SF from an existing testdata dir by unioning
  * key-shifted copies — the harness for the full-surface sf1 bench
  * (VERDICT r12 #4: no single run had ever exercised ALL queries at
  * 10x together; cache/memory interactions are invisible at sf0.1).
  *
  * Scaling contract (what a driver-generated sf1 would look like):
  *  - every key column shifts by copy x (max(key)+1), so ids stay
  *    contiguous and referential integrity holds across tables
  *    (l_orderkey tracks o_orderkey's stride, o_custkey tracks
  *    c_custkey's, l_partkey/l_suppkey track part/supplier);
  *  - `documents.text` is caesar-rotated per copy (translate() over
  *    both alphabets; copy 0 verbatim): token-length distribution,
  *    Zipf shape, doc length, and n_chars are all preserved while the
  *    token/shingle space actually GROWS with the corpus — a plain
  *    10x duplication would instead multiply per-gram bucket
  *    occupancy 10x and turn every dedup self-join quadratic in the
  *    copy count, a workload no real 10x crawl has;
  *  - `embeddings.embedding` circular-shifts by copy (norms and
  *    pairwise geometry within a copy preserved, cross-copy
  *    correlation broken); vec_id < 10 stays the query set (copy 0);
  *  - nation/region stay single-copy (broadcast dims, as in TPC-H).
  *
  * Usage: runMain graft.ScaleUp <inDir> <outDir> [copies=10]
  */
object ScaleUp {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  private def rot(s: String, c: Int): String =
    s.drop(c % s.length) + s.take(c % s.length)

  /** Union `copies` key-shifted transforms of `df`. */
  private def scaled(df: DataFrame, copies: Int)(
      transform: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until copies).map(c => transform(df, c)).reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <inDir> <outDir> [copies]")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, args(0), args(1),
      if (args.length > 2) args(2).toInt else 10)
    spark.stop()
  }

  /** The generator body, callable from specs: every future 10x
    * exponent claim rests on this contract, so ScaleUpSpec pins it on
    * a small 2-copy build rather than trusting the prose above. */
  def build(spark: SparkSession, in: String, out: String,
      copies: Int): Unit = {
    // 26 is a hard ceiling, not a style choice: copy c's caesar
    // rotation is c mod 26, so copy 26 would reproduce copy 0's text
    // VERBATIM and silently reintroduce the quadratic-dedup
    // duplication the rotation exists to avoid (and c >= 64 would
    // break the embedding circular shift's slice lengths)
    require(copies >= 1 && copies <= 26,
      s"copies must be in [1, 26], got $copies")

    def rd(t: String) = spark.read.parquet(s"$in/$t.parquet")
    // cast to long at the plan level so int-typed key columns from a
    // foreign generator don't throw in getLong
    def stride(df: DataFrame, k: String): Long =
      df.agg(max(col(k).cast("long"))).head().getLong(0) + 1L

    val docs = rd("documents")
    val emb = rd("embeddings")
    val evs = rd("events")
    val li = rd("lineitem")
    val ord = rd("orders")
    val cust = rd("customer")
    val supp = rd("supplier")
    val part = rd("part")

    val dS = stride(docs, "doc_id")
    val vS = stride(emb, "vec_id")
    val eS = stride(evs, "event_id")
    val uS = stride(evs, "user_id")
    val oS = stride(ord, "o_orderkey")
    val cS = stride(cust, "c_custkey")
    val pS = stride(part, "p_partkey")
    val sS = stride(supp, "s_suppkey")

    def shift(k: String, s: Long, c: Int) = (col(k) + lit(s * c)).as(k)

    val outputs: Seq[(String, DataFrame)] = Seq(
      "documents" -> scaled(docs, copies) { (d, c) =>
        d.select(shift("doc_id", dS, c),
          (if (c == 0) col("text")
           else translate(col("text"), Lower + Upper,
             rot(Lower, c) + rot(Upper, c))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      },
      "embeddings" -> scaled(emb, copies) { (d, c) =>
        d.select(shift("vec_id", vS, c),
          (if (c == 0) col("embedding")
           else concat(slice(col("embedding"), c + 1, 64 - c),
             slice(col("embedding"), 1, c))).as("embedding"),
          col("label"))
      },
      "events" -> scaled(evs, copies) { (d, c) =>
        d.select(shift("event_id", eS, c), col("ts"),
          shift("user_id", uS, c), col("event_type"), col("value"),
          col("props"))
      },
      "lineitem" -> scaled(li, copies) { (d, c) =>
        d.select(shift("l_orderkey", oS, c), shift("l_partkey", pS, c),
          shift("l_suppkey", sS, c), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_returnflag"), col("l_linestatus"),
          col("l_shipdate"))
      },
      "orders" -> scaled(ord, copies) { (d, c) =>
        d.select(shift("o_orderkey", oS, c), shift("o_custkey", cS, c),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
      },
      "customer" -> scaled(cust, copies) { (d, c) =>
        d.select(shift("c_custkey", cS, c), col("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      },
      "supplier" -> scaled(supp, copies) { (d, c) =>
        d.select(shift("s_suppkey", sS, c), col("s_name"),
          col("s_nationkey"), col("s_acctbal"))
      },
      "part" -> scaled(part, copies) { (d, c) =>
        d.select(shift("p_partkey", pS, c), col("p_name"), col("p_brand"),
          col("p_type"), col("p_size"), col("p_retailprice"))
      },
      "nation" -> rd("nation"),
      "region" -> rd("region"))

    outputs.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t -> $out/$t.parquet")
    }
  }
}
