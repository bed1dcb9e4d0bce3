package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.operators.Graph

/** Third-decade rehearsal for the iterative graph family (VERDICT r8
  * #7): ktruss / pagerank / kcore on a SYNTHETIC EDGE DGP scaled one
  * decade past ScaleRehearsal's 10x leg, isolating the graph operator
  * from the near-dup pair generation that dominates the corpus-side
  * runs. Two questions, measured not guessed:
  *
  *  1. Does time-per-surviving-edge keep falling (the r8 claim that
  *     ktruss's 0.73 exponent tracks OUTPUT growth) across a third
  *     decade of edges?
  *  2. What does the hub-degree cap actually buy — the same dense-hub
  *     graph run capped vs uncapped, so the wedge quadratic is a
  *     measured number next to the guard, not just a spec.
  *
  * DGP (splitmix64-keyed, partition-invariant, no driver data):
  * nodes live in size-8 cliques; each edge draw picks a clique and
  * with p=0.7 joins two distinct members (triangle-rich, output
  * grows with scale) else bridges a member to a uniform node
  * (heavy-tailed cross mass). Exact duplicate draws collapse in the
  * operator's own canonicalization. The hub DGP plants one node wired
  * to the first `hubDegree` nodes on top of a small clique base — a
  * boilerplate-template hub: its wedge volume is hubDegree², which is
  * exactly what [[Graph.DefaultMaxDegree]] exists to bound.
  *
  * Run: `sbt "runMain graft.GraphRehearsal"`; SPARK_GRAFT_OPS
  * restricts ops; args override the decade list as name:nEdges pairs.
  */
object GraphRehearsal {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** `nEdges` draws over `nEdges/4` nodes (mean degree ~8 before
    * dedup) — clique-heavy with uniform bridges. */
  def cliqueEdges(spark: SparkSession, nEdges: Long): DataFrame = {
    val nNodes = math.max(16L, nEdges / 4L)
    val nCliques = nNodes / 8L
    val schema = StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false)))
    val rows = spark.range(nEdges).rdd.mapPartitions { it =>
      it.map { iBoxed =>
        val i: Long = iBoxed
        val h1 = mix(i)
        val h2 = mix(i ^ 0x9E3779B97F4A7C15L)
        val c = java.lang.Math.floorMod(h1, nCliques)
        val m1 = java.lang.Math.floorMod(h2, 8L)
        val a = c * 8L + m1
        val b =
          if (java.lang.Math.floorMod(h1 >>> 33, 10L) < 7L) {
            // in-clique partner, distinct from a by construction
            val m2 = (m1 + 1L + java.lang.Math.floorMod(h2 >>> 3, 7L)) % 8L
            c * 8L + m2
          } else {
            val u = java.lang.Math.floorMod(h2 >>> 7, nNodes)
            if (u == a) (u + 1L) % nNodes else u
          }
        Row(a, b)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** A small clique base plus one hub whose id sits in the MIDDLE of
    * its neighbors' id range — half the spokes below, half above, plus
    * a neighbor ring so severed hub wedges are real triangles. The
    * middle placement matters: the canonical a<b<c enumeration only
    * materializes a wedge at its middle-rank node, so a hub that is
    * the min or max id of its neighborhood never pays the d² candidate
    * volume (measured: a max-id degree-40k hub costs nothing). The
    * adversarial case the cap exists for is the straddling hub. */
  def hubEdges(spark: SparkSession, nBase: Long, hubDegree: Long)
      : DataFrame = {
    val hub = nBase * 20L
    val base = cliqueEdges(spark, nBase)
    val lowSpokes = spark.range(hubDegree / 2)
      .select((lit(hub - 1L) - col("id")).as("id_a"),
        lit(hub).as("id_b"))
    val highSpokes = spark.range(hubDegree - hubDegree / 2)
      .select(lit(hub).as("id_a"),
        (lit(hub + 1L) + col("id")).as("id_b"))
    val ring = spark.range(hubDegree - 1)
      .select((lit(hub - hubDegree / 2) + col("id")).as("id_a"),
        (lit(hub - hubDegree / 2 + 1L) + col("id")).as("id_b"))
      .filter(col("id_a") =!= hub && col("id_b") =!= hub)
    base.unionByName(lowSpokes).unionByName(highSpokes)
      .unionByName(ring)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val decades: Seq[(String, Long)] =
      if (args.nonEmpty) args.toSeq.map { a =>
        val Array(nm, n) = a.split(":"); (nm, n.toLong) }
      else Seq(("1x", 100000L), ("10x", 1000000L), ("100x", 10000000L))
    val only = sys.env.get("SPARK_GRAFT_OPS")
      .map(_.split(",").filter(_.nonEmpty).toSet)

    def timed(nm: String, op: String)(f: => Long): Option[(String, Double,
        Long)] = {
      if (only.exists(!_.contains(op))) return None
      val t0 = System.nanoTime()
      val out = f
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[$nm] $op%-16s ${t}%8.2f s  out=$out")
      Some((op, t, out))
    }

    val perDecade = decades.map { case (nm, nEdges) =>
      val e = cliqueEdges(spark, nEdges)
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[$nm] edge draws=${e.count()}")
      val rows = Seq(
        timed(nm, "ktruss")(Graph.kTruss(e, k = 3, rounds = 4).count()),
        timed(nm, "pagerank")(Graph.pageRank(e, iterations = 5).count()),
        timed(nm, "kcore")(Graph.kCore(e, k = 4).count()),
        timed(nm, "adamic_adar")(Graph.adamicAdar(e, topK = 100).count())
      ).flatten
      e.unpersist(blocking = true)
      nm -> rows
    }

    println("op,decade,t,out,ratio_vs_prev,exponent,out_growth")
    perDecade.head._2.map(_._1).foreach { op =>
      var prev: Option[(Double, Long)] = None
      perDecade.foreach { case (nm, rows) =>
        rows.find(_._1 == op).foreach { case (_, t, out) =>
          val (rat, ex, og) = prev match {
            case Some((pt, po)) =>
              (f"${t / pt}%.2f", f"${math.log10(t / pt)}%.2f",
                f"${out.toDouble / po}%.2f")
            case None => ("", "", "")
          }
          println(s"$op,$nm,${f"$t%.2f"},$out,$rat,$ex,$og")
          prev = Some((t, out))
        }
      }
    }

    // hub cap: same graph, capped vs uncapped. Hub degree must be
    // where the d² wedge quadratic actually bites (at d=4000 the 16M
    // wedges are cheaper than the cap's two rank windows — measured);
    // default d=20000 → 400M uncapped wedges vs 4M capped at 2000.
    if (only.forall(_.contains("hubcap"))) {
      val d = sys.env.getOrElse("SPARK_GRAFT_HUB_DEGREE", "20000").toLong
      val cap = sys.env.getOrElse("SPARK_GRAFT_HUB_CAP", "2000").toInt
      val h = hubEdges(spark, nBase = 100000L, hubDegree = d)
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[hub] edge draws=${h.count()} hubDegree=$d cap=$cap")
      // local timing — the SPARK_GRAFT_OPS filter selects this BLOCK
      // ("hubcap"), not the individual op labels inside it
      def timedHub(op: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val out = f
        println(f"[hub] $op%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
          s"  out=$out")
      }
      timedHub("ktruss_uncapped")(
        Graph.kTruss(h, k = 3, rounds = 4,
          maxDegree = Int.MaxValue).count())
      timedHub(s"ktruss_cap$cap")(
        Graph.kTruss(h, k = 3, rounds = 4, maxDegree = cap).count())
      // the DEFAULT path: since r10 DefaultMaxDegree IS the measured
      // 2000 — this row proves the protection is on without opt-in
      timedHub(s"ktruss_default${Graph.DefaultMaxDegree}")(
        Graph.kTruss(h, k = 3, rounds = 4).count())
      h.unpersist(blocking = true)
    }

    spark.stop()
  }
}
