package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Seeded randomized cross-implementation parity: two INDEPENDENT
  * formulations of the same semantics (distributed window vs stateful
  * stream; sharded rank vs naive sort; distributed LPA vs an in-memory
  * reference fold) must agree on adversarial random inputs — including
  * the tie/collision cases a hand-written example suite tends to miss. */
class RandomParitySpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  test("funnel: window formulation == stateful online formulation (50 trials)") {
    val rng = new scala.util.Random(42)
    val types = Array("view", "click", "purchase", "error")
    (1 to 50).foreach { trial =>
      val evs = (1 to 30).map { _ =>
        // second-granularity collisions ON PURPOSE (strict-after ties)
        val sec = 1700000000L + rng.nextInt(20)
        graft.streaming.FunnelEvent(
          user_id = 1L + rng.nextInt(4),
          ts = new Timestamp(sec * 1000L),
          event_type = types(rng.nextInt(types.length)))
      }
      val ds = evs.toDS()
      val win = Events.funnel(ds.toDF()).collect().map { r =>
        def o(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        (r.getLong(0), o(1), o(2), o(3), r.getInt(4))
      }.toSet
      val state = graft.streaming.StreamingOps
        .funnelStateful(ds, emitFinal = true)
        .collect().map(r => (r.user_id, r.t1, r.t2, r.t3, r.level)).toSet
      withClue(s"trial $trial: ") { state shouldBe win }
    }
  }

  test("valueRank == naive global sort rank on tied random data (20 trials)") {
    val rng = new scala.util.Random(7)
    (1 to 20).foreach { trial =>
      val rows = (1L to 50L).map(id => (id, rng.nextInt(10).toLong))
      val expect = rows.sortBy { case (id, v) => (v, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val got = GlobalOrder.valueRank(
          rows.toDF("id", "v").repartition(5), "v", "id",
          maxShards = 1 + rng.nextInt(6))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      withClue(s"trial $trial: ") { got shouldBe expect }
    }
  }

  test("labelPropagation == in-memory synchronous reference (20 trials)") {
    val rng = new scala.util.Random(13)
    (1 to 20).foreach { trial =>
      val n = 12
      val edges = (1 to 20).map { _ =>
        (1L + rng.nextInt(n), 1L + rng.nextInt(n))
      }.filter { case (a, b) => a != b }.distinct
      val seeds = (1L to n.toLong)
        .map(id => id -> (if (rng.nextBoolean()) None
          else Some(Seq("en", "fr", "de")(rng.nextInt(3))))).toMap
      // reference: synchronous rounds over scala collections
      val adj = (edges ++ edges.map(e => (e._2, e._1)))
        .groupMap(_._1)(_._2).map { case (k, v) => k -> v.distinct }
      var ref: Map[Long, Option[String]] = seeds
      (1 to 3).foreach { _ =>
        ref = ref.map { case (id, cur) =>
          if (seeds(id).isDefined) id -> seeds(id)
          else {
            val nbr = adj.getOrElse(id, Seq.empty)
              .flatMap(ref(_)).groupBy(identity)
              .map { case (l, xs) => (l, xs.size) }
            if (nbr.isEmpty) id -> cur
            else id -> Some(nbr.toSeq.minBy { case (l, c) => (-c, l) }._1)
          }
        }
      }
      val got = Graph.labelPropagation(
          (1L to n.toLong).map(id => (id, seeds(id))).toDF("id", "label"),
          edges.toDF("id_a", "id_b"), iterations = 3)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
      withClue(s"trial $trial (edges=$edges, seeds=$seeds): ") {
        got shouldBe ref
      }
    }
  }

  test("kCore == in-memory reference peel (30 trials)") {
    val rng = new scala.util.Random(29)
    (1 to 30).foreach { trial =>
      val n = 10
      val edges = (1 to 18).map { _ =>
        (1L + rng.nextInt(n), 1L + rng.nextInt(n))
      }.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val k = 2 + rng.nextInt(2)
      // reference: peel to fixpoint over scala collections
      var alive = edges.flatMap(e => Seq(e._1, e._2)).toSet
      var changed = true
      while (changed) {
        val deg = edges.filter(e => alive(e._1) && alive(e._2))
          .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
          .map { case (id, xs) => id -> xs.size }
        val next = alive.filter(id => deg.getOrElse(id, 0) >= k)
        changed = next != alive
        alive = next
      }
      val refDeg = edges.filter(e => alive(e._1) && alive(e._2))
        .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (id, xs) => id -> xs.size.toLong }
      val got =
        if (edges.isEmpty) Map.empty[Long, Long]
        else Graph.kCore(edges.toDF("id_a", "id_b"), k = k, rounds = 10)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"trial $trial k=$k (edges=$edges): ") { got shouldBe refDeg }
    }
  }

  test("incrementalComponents == from-scratch CC on random splits (30 trials)") {
    val rng = new scala.util.Random(31)
    (1 to 30).foreach { trial =>
      val n = 14
      val all = (1 to 22).map { _ =>
        (1L + rng.nextInt(n), 1L + rng.nextInt(n))
      }.filter { case (a, b) => a != b }.distinct
      val (baseE, deltaE) = all.partition(_ => rng.nextBoolean())
      if (baseE.nonEmpty && deltaE.nonEmpty) {
        val baseLabels = Graph.connectedComponents(
          baseE.toDF("id_a", "id_b"))
        val got = Graph.incrementalComponents(baseLabels,
            deltaE.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = Graph.connectedComponents(all.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        withClue(s"trial $trial (base=$baseE delta=$deltaE): ") {
          got shouldBe want
        }
      }
    }
  }

  test("containmentPairs == brute-force shingle containment (15 trials)") {
    val rng = new scala.util.Random(37)
    val vocab = Array("a", "b", "c", "d", "e", "f")
    (1 to 15).foreach { trial =>
      val docs = (1L to 8L).map { id =>
        val len = 3 + rng.nextInt(8)
        (id, (1 to len).map(_ => vocab(rng.nextInt(vocab.length)))
          .mkString(" "))
      }
      def shingles(t: String): Set[String] = {
        val w = t.split(" ")
        if (w.length < 3) Set.empty
        else w.sliding(3).map(_.mkString(" ")).toSet
      }
      val want = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia != ib
        sa = shingles(ta); sb = shingles(tb) if sa.nonEmpty
        c = BigDecimal(sa.intersect(sb).size.toDouble / sa.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if c >= 0.5
      } yield (ia, ib) -> c).toMap
      val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 3, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      withClue(s"trial $trial (docs=$docs): ") { got shouldBe want }
      Dedup.releaseCaches()
    }
  }

  test("kTruss == in-memory peel on random graphs (20 trials)") {
    val rng = new scala.util.Random(88)
    (1 to 20).foreach { trial =>
      val n = 6 + rng.nextInt(8)
      val edges = (for (a <- 0 until n; b <- a + 1 until n
        if rng.nextDouble() < 0.35) yield (a.toLong, b.toLong)).toVector
      if (edges.nonEmpty) {
        // reference: iterate support-peel to FIXPOINT in plain Scala
        def supports(es: Set[(Long, Long)]): Map[(Long, Long), Int] = {
          val s = es.toSeq
          val tri = for {
            (a, b) <- s; (b2, c) <- s if b2 == b
            if es.contains((a, c))
          } yield Seq((a, b), (b, c), (a, c))
          tri.flatten.groupBy(identity).view.mapValues(_.size).toMap
        }
        var alive = edges.toSet
        var done = false
        while (!done) {
          val sup = supports(alive)
          val next = alive.filter(e => sup.getOrElse(e, 0) >= 1)
          done = next == alive
          alive = next
        }
        val want = supports(alive).filter { case (e, _) => alive(e) }
        val got = Graph.kTruss(edges.toDF("id_a", "id_b"), k = 3,
            rounds = 10)
          .collect().map(r => (r.getLong(0), r.getLong(1)) ->
            r.getLong(2).toInt).toMap
        withClue(s"trial $trial (${edges.size} edges): ") {
          got shouldBe want
        }
        Dedup.releaseCaches()
      }
    }
  }

  test("sortedNeighborPairs == naive sort + window scan (20 trials)") {
    val rng = new scala.util.Random(33)
    (1 to 20).foreach { trial =>
      val names = (1 to 12 + rng.nextInt(10)).map(_ =>
        (1 to 2 + rng.nextInt(3)).map(_ =>
          ('a' + rng.nextInt(3)).toChar).mkString)
      val w = 1 + rng.nextInt(3)
      val md = rng.nextInt(3)
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val distinct = names.distinct.sorted
      val want = (for {
        i <- distinct.indices; j <- i + 1 until
          math.min(i + w + 1, distinct.length)
        if lev(distinct(i), distinct(j)) <= md
      } yield (distinct(i), distinct(j), (j - i).toLong,
        lev(distinct(i), distinct(j)).toLong)).toSet
      val got = Linkage.sortedNeighborPairs(names.toDF("nm"), "nm",
          window = w, maxDist = md)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(4), r.getLong(5))).toSet
      withClue(s"trial $trial (w=$w md=$md): ") { got shouldBe want }
    }
  }

  test("mannKendall == direct S/variance computation (30 trials)") {
    val rng = new scala.util.Random(19)
    (1 to 30).foreach { trial =>
      val n = 5 + rng.nextInt(20)
      // small integer values force TIES (the variance correction path)
      val xs = Vector.fill(n)(rng.nextInt(4).toDouble)
      val df = xs.zipWithIndex.map { case (x, t) => ("g", t.toLong, x) }
        .toDF("g", "t", "x")
      val s = (for (i <- 0 until n; j <- i + 1 until n)
        yield math.signum(xs(j) - xs(i)).toLong).sum
      val tieCorr = xs.groupBy(identity).values
        .map(g => g.size.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val v = (n.toLong * (n - 1) * (2 * n + 5) - tieCorr) / 18.0
      val zWant =
        if (v <= 0 || s == 0) 0.0
        else BigDecimal((s - math.signum(s.toDouble)) / math.sqrt(v))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val r = Stats.mannKendall(df, "g", "t", "x").collect().head
      withClue(s"trial $trial (xs=$xs): ") {
        r.getLong(1) shouldBe n.toLong
        r.getLong(2) shouldBe s
        r.getDouble(3) shouldBe zWant
      }
    }
  }

  test("stickiness == brute-force window distinct (15 trials)") {
    val rng = new scala.util.Random(55)
    (1 to 15).foreach { trial =>
      val evs = (1 to 40).map { _ =>
        val day = rng.nextInt(40).toLong
        (1L + rng.nextInt(5), new Timestamp(day * 86400L * 1000L))
      }
      val w = 1 + rng.nextInt(10)
      val pairs = evs.map { case (u, t) =>
        (t.getTime / 1000 / 86400, u) }.distinct
      val days = pairs.map(_._1).distinct
      val want = days.map { d =>
        val dau = pairs.count(_._1 == d)
        val mau = pairs.filter(p => p._1 > d - w && p._1 <= d)
          .map(_._2).distinct.size
        d -> ((dau.toLong, mau.toLong))
      }.toMap
      val got = Events.stickiness(evs.toDF("user_id", "ts"),
          windowDays = w)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      withClue(s"trial $trial (w=$w): ") { got shouldBe want }
    }
  }

  test("incrementalGroupStats == from-scratch on random upserts (30 trials)") {
    val rng = new scala.util.Random(77)
    (1 to 30).foreach { trial =>
      val srcs = Array("a", "b", "c")
      val base = (1L to 15L).map(i =>
        (i, srcs(rng.nextInt(3)), rng.nextInt(100).toLong))
      val delta = (1 to 6).map { _ =>
        val id = 1L + rng.nextInt(20) // some ids new, some replaced
        (id, srcs(rng.nextInt(3)), rng.nextInt(100).toLong)
      }.groupBy(_._1).map(_._2.head).toSeq // one upsert per id
      val merged = delta ++ base.filterNot(b =>
        delta.exists(_._1 == b._1))
      val want = merged.groupBy(_._2).view.mapValues(rs =>
        (rs.size.toLong, rs.map(_._3).sum)).toMap
      val got = Profile.incrementalGroupStats(
          Profile.groupStats(base.toDF("id", "src", "v"), "src", "v"),
          base.toDF("id", "src", "v"), delta.toDF("id", "src", "v"),
          "id", "src", "v")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      withClue(s"trial $trial: ") { got shouldBe want }
    }
  }
}
