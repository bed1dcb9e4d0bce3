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
}
