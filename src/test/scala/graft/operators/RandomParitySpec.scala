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
}
