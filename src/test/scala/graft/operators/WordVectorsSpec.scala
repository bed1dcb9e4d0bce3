package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class WordVectorsSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  // two disjoint topics: words inside a topic co-occur, across never
  private def topicCorpus = (1 to 40).map { i =>
    if (i % 2 == 0) (i.toLong, "cat dog pet cat dog pet cat dog")
    else (i.toLong, "bond stock yield bond stock yield bond stock")
  }.toDF("doc_id", "text")

  private def vecs(df: org.apache.spark.sql.DataFrame)
      : Map[String, Array[Double]] = {
    val rows = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    rows.groupBy(_._1).map { case (tok, xs) =>
      tok -> xs.sortBy(_._2).map(_._3)
    }
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    d / (na * nb)
  }

  test("wordVectors: intra-topic cosine beats inter-topic cosine") {
    val v = vecs(EmbedAlgebra.wordVectors(topicCorpus, "text",
      window = 2, dim = 4))
    v.keySet shouldBe Set("cat", "dog", "pet", "bond", "stock", "yield")
    v.values.foreach(_.length shouldBe 4)
    val intra = cos(v("cat"), v("dog"))
    val inter = cos(v("cat"), v("bond"))
    withClue(s"intra=$intra inter=$inter: ") {
      intra should be > inter + 0.5
    }
    cos(v("bond"), v("stock")) should be > cos(v("dog"), v("yield")) + 0.5
  }

  test("wordVectors is deterministic across runs and partitionings") {
    val a = vecs(EmbedAlgebra.wordVectors(topicCorpus, "text"))
    val b = vecs(EmbedAlgebra.wordVectors(topicCorpus.repartition(7),
      "text"))
    a.keySet shouldBe b.keySet
    a.foreach { case (tok, v) => v.toSeq shouldBe b(tok).toSeq }
  }

  test("wordVectors: maxVocab prunes to the top-K frequency cutoff") {
    // "hub" appears in every doc; the w<i>_<j> tail is singletons
    val wide = (1 to 30).map(i =>
      (i.toLong, "hub " + (1 to 50).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val v = vecs(EmbedAlgebra.wordVectors(wide, "text", maxVocab = 100))
    v.size should be <= 100
    v.keySet should contain("hub") // most frequent token survives
  }

  test("wordVectors: dim is capped by the vocabulary size") {
    val tiny = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val v = vecs(EmbedAlgebra.wordVectors(tiny, "text", dim = 16))
    v("a").length shouldBe 2 // only 2 words -> at most 2 components
  }

  test("mmrSelect: diversity term pulls picks out of the densest cluster") {
    import org.apache.spark.sql.functions._
    // two tight clusters: 10 vectors near +e1, 10 near +e2; pure
    // relevance would take one cluster's whole core, MMR must mix
    val vecs = (0 until 20).map { i =>
      val base = if (i < 10) Array(1.0f, 0.01f * i, 0f, 0f)
        else Array(0.01f * i, 1.0f, 0f, 0f)
      (i.toLong, base.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val picks = Similarity.mmrSelect(df, k = 4, lambda = 0.5)
      .collect().map(_.getLong(1))
    val sides = picks.map(id => if (id < 10) 0 else 1).toSet
    sides shouldBe Set(0, 1) // both clusters represented
    // determinism across partitionings
    val again = Similarity.mmrSelect(df.repartition(7), k = 4,
      lambda = 0.5).collect().map(_.getLong(1))
    again.toSeq shouldBe picks.toSeq
  }

  test("mmrSelect: lambda=1 degenerates to pure relevance order") {
    import org.apache.spark.sql.functions._
    val vecs = (0 until 8).map(i => (i.toLong,
      Seq(1.0f, 0.1f * i, 0f, 0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val mmr = Similarity.mmrSelect(df, k = 3, lambda = 1.0)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    // pure relevance: ranks must follow cosine-to-centroid descending —
    // compare against an independent in-memory computation
    val cent = (0 until 4).map { p =>
      vecs.map(_._2(p).toDouble).sum / vecs.size
    }
    def cos(v: Seq[Float]): Double = {
      val d = v.zip(cent).map { case (x, c) => x * c }.sum
      d / (math.sqrt(v.map(x => x.toDouble * x).sum) *
        math.sqrt(cent.map(c => c * c).sum))
    }
    val expect = vecs.sortBy { case (id, v) =>
      (-BigDecimal(cos(v)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, id)
    }.take(3).map(_._1)
    mmr.map(_._2) shouldBe expect
  }

  test("wordVectors: pair-free corpus returns an empty frame, no crash") {
    val singles = Seq((1L, "hello"), (2L, "world")).toDF("doc_id", "text")
    EmbedAlgebra.wordVectors(singles, "text").count() shouldBe 0L
    // pruning everything away is the same path
    val tiny = Seq((1L, "a b a b")).toDF("doc_id", "text")
    EmbedAlgebra.wordVectors(tiny, "text", minCount = 1000L)
      .count() shouldBe 0L
  }

  test("mmrSelect: k beyond the population clamps; zero vectors excluded") {
    val df = Seq(
      (1L, Seq(1.0f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1.0f, 0f, 0f)),
      (3L, Seq(0f, 0f, 0f, 0f)) // zero-norm: NaN cosine, must be dropped
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(df, k = 10, lambda = 0.7).collect()
    out.map(_.getLong(1)).toSet shouldBe Set(1L, 2L) // clamped to 2, no 3
    out.map(_.getInt(0)).sorted.toSeq shouldBe Seq(1, 2)
  }
}
