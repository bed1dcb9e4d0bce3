package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class GraphSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)], maxIter: Int = 25) =
    Graph.connectedComponents(edges.toDF("id_a", "id_b"), maxIter = maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two separate components resolve to their min ids") {
    comps(Seq((5L, 3L), (3L, 9L), (20L, 30L))) shouldBe
      Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L)
  }

  test("a long path collapses (pointer jumping beats one-hop rounds)") {
    // path 1-2-3-...-40: plain one-hop propagation needs 39 rounds;
    // with pointer jumping the default budget is ample
    val path = (1L until 40L).map(i => (i, i + 1))
    val c = comps(path)
    c.values.toSet shouldBe Set(1L)
    c.keySet shouldBe (1L to 40L).toSet
  }

  test("a cycle and self-contained triangle merge fully") {
    comps(Seq((2L, 4L), (4L, 6L), (6L, 2L), (7L, 8L), (8L, 9L), (9L, 7L)))
      .shouldBe(Map(2L -> 2L, 4L -> 2L, 6L -> 2L,
        7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("capped iterations still yield valid (monotone) labels") {
    val c = comps((1L until 10L).map(i => (i, i + 1)), maxIter = 1)
    // after one round labels are partial but every label is a real node
    // id from the same component, never crossing components
    c.values.foreach(v => assert(v >= 1L && v <= 10L))
  }

  test("empty edge list yields an empty component table (clean corpus)") {
    comps(Seq.empty) shouldBe Map.empty
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    Graph.dedupByComponents(docs, noPairs, "doc_id")
      .count() shouldBe 2L // corpus unchanged
  }

  test("dedupByComponents keeps the min-id representative per cluster") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    val pairs = Seq((2L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Graph.dedupByComponents(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    kept shouldBe Set(1L, 2L, 3L) // 4 and 5 fold into 2's cluster
  }

  test("checkpoint cadence leaves the labels unchanged") {
    // deep-ish chain plus a disjoint triangle: several rounds, both
    // cadence-hit and cadence-miss rounds exercised
    val edges = (1L until 30L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (102L, 100L))
    val plain = comps(edges)
    val ckpt = Graph.connectedComponents(edges.toDF("id_a", "id_b"),
        maxIter = 25, checkpointEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ckpt shouldBe plain
    // with a reliable checkpoint dir set, the checkpoint() branch runs
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      Graph.connectedComponents(edges.toDF("id_a", "id_b"),
          maxIter = 25, checkpointEvery = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .toMap shouldBe plain
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }

  // independent single-machine PageRank with the operator's exact
  // rounding contract (8dp, sorted contribution folds)
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    def r8(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val und = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = nbrs.view.mapValues(_.size).toMap
    val n = nbrs.size
    val base = r8((1.0 - d) / n)
    var r = nbrs.keys.map(_ -> r8(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      r = nbrs.map { case (v, ns) =>
        val contribs = ns.map(u => r8(r(u) / deg(u))).sorted
        v -> r8(base + d * contribs.foldLeft(0.0)(_ + _))
      }
    }
    r
  }

  test("pageRank matches an independent replay on a triangle+pendant") {
    // 1-2-3 triangle with pendant 4 on 3: rank(3) highest, 4 lowest
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val got = Graph.pageRank(edges.toDF("id_a", "id_b"), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got shouldBe refPageRank(edges, 5, 0.85)
    got(3L) should be > got(1L)
    got(1L) shouldBe got(2L) // symmetric positions
    got(4L) should be < got(1L)
    // probability mass is conserved up to rounding
    got.values.sum shouldBe 1.0 +- 1e-6
  }

  test("pageRank is invariant to input partitioning (sorted folds)") {
    val rng = new scala.util.Random(11)
    val edges = Seq.tabulate(60)(_ =>
      (rng.nextInt(20).toLong, rng.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
    val df = edges.toDF("id_a", "id_b")
    val a = Graph.pageRank(df, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(df.repartition(7), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a shouldBe b
    a shouldBe refPageRank(edges, 4, 0.85)
  }

  test("pageRank on an empty edge list yields an empty rank table") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    Graph.pageRank(empty, iterations = 3).count() shouldBe 0L
  }

  test("triangleCounts: K4 has 4 triangles, 3 per corner") {
    // complete graph on {1,2,3,4}: C(4,3)=4 triangles, each node in 3
    val edges = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
      .toDF("id_a", "id_b")
    val out = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("triangleCounts: stars and paths are triangle-free") {
    val star = Seq((1L,2L),(1L,3L),(1L,4L),(1L,5L)).toDF("id_a","id_b")
    Graph.triangleCounts(star).count() shouldBe 0L
    val path = Seq((1L,2L),(2L,3L),(3L,4L)).toDF("id_a","id_b")
    Graph.triangleCounts(path).count() shouldBe 0L
  }

  test("triangleCounts: orientation, duplicates and self-loops are normalized") {
    // same triangle given with mixed orientation, a duplicate edge and
    // a self-loop: still exactly one triangle
    val messy = Seq((2L,1L),(2L,3L),(1L,3L),(3L,1L),(2L,2L))
      .toDF("id_a","id_b")
    val out = Graph.triangleCounts(messy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L)
  }

  test("clusteringCoefficients: K4 is fully clustered, stars are 0") {
    val k4 = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
      .toDF("id_a", "id_b")
    val out = Graph.clusteringCoefficients(k4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L)
    out.values.foreach(_ shouldBe ((3L, 3L, 1.0)))
    val star = Seq((1L,2L),(1L,3L),(1L,4L)).toDF("id_a","id_b")
    val s = Graph.clusteringCoefficients(star).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    s(1L) shouldBe ((3L, 0L, 0.0))
    s(2L) shouldBe ((1L, 0L, 0.0)) // degree-1: coeff 0 by convention
  }

  test("clusteringCoefficients: half-open square") {
    // square 1-2-3-4 plus diagonal 1-3: nodes 1,3 sit in 2 triangles?
    // no - triangles are (1,2,3) and (1,3,4); 1 and 3 in both (deg 3),
    // 2 and 4 in one (deg 2)
    val g = Seq((1L,2L),(2L,3L),(3L,4L),(4L,1L),(1L,3L))
      .toDF("id_a","id_b")
    val out = Graph.clusteringCoefficients(g).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    out(1L) shouldBe ((3L, 2L, 0.666667))
    out(2L) shouldBe ((2L, 1L, 1.0))
    out(3L) shouldBe ((3L, 2L, 0.666667))
    out(4L) shouldBe ((2L, 1L, 1.0))
  }

  test("labelPropagation: majority wins, ties break lexicographically") {
    val nodes = Seq(
      (1L, Some("en")), (2L, Some("fr")), (3L, Some("en")),
      (10L, None: Option[String]), (20L, None: Option[String])
    ).toDF("id", "label")
    // 10 has neighbors {1(en), 2(fr), 3(en)} -> en by majority
    // 20 has neighbors {1(en), 2(fr)}       -> tie -> "en" < "fr"
    val edges = Seq((1L,10L),(2L,10L),(3L,10L),(1L,20L),(2L,20L))
      .toDF("id_a","id_b")
    val out = Graph.labelPropagation(nodes, edges, iterations = 1)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    out(10L) shouldBe "en"
    out(20L) shouldBe "en"
    // seeds are clamped even against a unanimous neighborhood
    out(2L) shouldBe "fr"
  }

  test("labelPropagation: spreads one hop per round, keeps null when unreached") {
    val nodes = Seq(
      (1L, Some("en")), (2L, None: Option[String]),
      (3L, None: Option[String]), (4L, None: Option[String]),
      (9L, None: Option[String]) // isolated
    ).toDF("id", "label")
    val chain = Seq((1L,2L),(2L,3L),(3L,4L)).toDF("id_a","id_b")
    def labels(iters: Int): Map[Long, String] =
      Graph.labelPropagation(nodes, chain, iterations = iters)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val after1 = labels(1)
    after1(2L) shouldBe "en"
    after1(3L) shouldBe null
    val after3 = labels(3)
    after3(4L) shouldBe "en"
    after3(9L) shouldBe null // isolated node never adopts
  }

  test("kCore: a triangle with a pendant — triangle survives k=2, pendant dies") {
    // 1-2-3 triangle, 4 hangs off 1
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
      .toDF("id_a", "id_b")
    val out = Graph.kCore(edges, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
  }

  test("kCore: peeling cascades — removing a leaf can unravel a chain") {
    // path 1-2-3-4-5: every 2-core round peels the current endpoints;
    // the whole path unravels to nothing
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    Graph.kCore(path, k = 2, rounds = 4).count() shouldBe 0L
  }

  test("kCore: degrees are IN-CORE degrees, not original degrees") {
    // clique {1,2,3,4} plus pendants 5..8 off node 1: node 1's original
    // degree is 7, its 3-core degree is 3
    val clique = for {
      i <- 1L to 4L; j <- (i + 1) to 4L
    } yield (i, j)
    val edges = (clique ++ Seq((1L, 5L), (1L, 6L), (1L, 7L), (1L, 8L)))
      .toDF("id_a", "id_b")
    val out = Graph.kCore(edges, k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("kCore: a too-small round budget still reports in-core degrees " +
      "over its survivor set (monotone, SQL-replayable)") {
    // path of 6 needs 3 peel rounds to empty; rounds=1 keeps the
    // middle 2 nodes wrongly-alive but degrees are within that set
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    val r1 = Graph.kCore(path, k = 2, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    r1.keySet shouldBe Set(2L, 3L, 4L, 5L)
    r1(3L) shouldBe 2L // 2-3-4-5 survives round 1; 3 still sees 2 and 4
    val r3 = Graph.kCore(path, k = 2, rounds = 3)
    r3.count() shouldBe 0L
  }
}
