package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Unigram

/** Distributed SentencePiece-style unigram-LM tokenizer TRAINING
  * (Kudo 2018) by hard-EM (Viterbi) over the word-frequency table —
  * the unigram sibling of [[BpeTrain]], with the same scale shape:
  *
  *  1. ONE corpus pass builds the distinct-word frequency table
  *     (marker-prefixed Unicode-whitespace words, groupBy count).
  *     The only corpus-sized job — at 100 TB the corpus has ~1e11
  *     tokens but orders of magnitude fewer distinct words, which is
  *     why SentencePiece itself trains from a word-frequency table.
  *  2. SEEDING is one distributed explode of each distinct word's
  *     substrings (len 2..maxPieceLen, words <= 32 chars) weighted by
  *     word frequency, aggregated and capped to `seedSize` by
  *     (count desc, piece asc) — plus every single char of every word
  *     (the coverage alphabet). Spark's UTF8String sort order is
  *     UTF-8 byte order == codepoint order, so the cap is the same
  *     cut the Python fixture makes.
  *  3. Each EM round broadcasts the vocab (the in-memory model every
  *     real trainer holds — bounded by seedSize, not the corpus),
  *     Viterbi-segments the distinct-word frame in parallel, and
  *     aggregates piece counts weighted by word frequency: a
  *     vocab-sized shuffle per round, never a corpus pass. Unused
  *     pieces drop (hard-EM pruning); single chars stay encodable via
  *     the implicit count-1 floor in [[Unigram.viterbi]].
  *  4. Final vocab: every surviving single-char piece + the top
  *     (vocabSize - #chars) multi-char pieces by (count desc, piece
  *     asc); rank assigned in that order.
  *
  * DETERMINISM: every count is an integer sum, every comparison is
  * exact big-integer cross-multiplication ([[Unigram.viterbi]]), and
  * every cut/rank orders by (count desc, piece asc in codepoint
  * order) — the learned vocab is a pure function of the corpus
  * multiset, independent of partitioning, and bit-identical to the
  * independent Python fixture `scripts/gen_unigram_fixture.py`.
  *
  * Reference provenance: the reference repo has no tokenizer (SURVEY
  * §2 — counts-only engine); extension tier. */
object UnigramTrain {

  /** Train; returns (rank, piece, cnt) in rank order. */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 300,
      seedSize: Int = 1000, nIters: Int = 3, minCount: Long = 2L)
      : Seq[(Long, String, Long)] = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      s"bad vocabSize=$vocabSize seedSize=$seedSize")
    require(nIters >= 1 && nIters <= 20, s"bad nIters: $nIters")
    val spark = df.sparkSession
    import spark.implicits._
    val maxLen = Unigram.MaxPieceLen

    // 1. corpus pass -> distinct-word frequency table (vocab-sized);
    // consumed once per EM round + twice in seeding, so persist
    val words: Dataset[(String, Long)] = df
      .select(col(textCol).as("t")).na.drop.as[String]
      .flatMap(t => Unigram.wordsOf(t))
      .groupBy("value").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 2. seed: weighted substring counts (multi-char, capped) + the
    // full single-char alphabet. One explode, one aggregate; the cap
    // is a global sort LIMITED to seedSize (top-k, not a full sort).
    val pieces = words.flatMap { case (w, f) =>
      val subs =
        if (w.length > 32) Iterator.empty
        else for {
          i <- (0 until w.length).iterator
          j <- (i + 2) to math.min(i + maxLen, w.length)
        } yield (w.substring(i, j), f)
      val chars = w.map(c => (String.valueOf(c), f))
      subs ++ chars
    }.toDF("piece", "f")
      .groupBy("piece").agg(sum("f").as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val multi = pieces
      .filter(length(col("piece")) >= 2 && col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(seedSize)
      .as[(String, Long)].collect()
    val chars = pieces.filter(length(col("piece")) === 1)
      .as[(String, Long)].collect()
    pieces.unpersist()

    var vocab: Map[String, Long] = (chars ++ multi).toMap

    // 3. hard-EM rounds: broadcast model, segment, re-count
    for (_ <- 1 to nIters) {
      val total = vocab.valuesIterator.sum
      val bc = spark.sparkContext.broadcast(vocab)
      val counts = words.flatMap { case (w, f) =>
        Unigram.viterbi(w, bc.value, total).map(p => (p, f))
      }.toDF("piece", "f")
        .groupBy("piece").agg(sum("f").as("cnt"))
        .as[(String, Long)].collect()
      bc.destroy()
      vocab = counts.toMap
    }
    words.unpersist()

    // 4. prune + rank (vocab-sized, driver-side, codepoint order)
    val ord = Ordering.fromLessThan[(String, Long)] { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && Unigram.cpLess(a._1, b._1))
    }
    val cs = vocab.filter(_._1.length == 1).toSeq.sorted(ord)
    val ms = vocab.filter(_._1.length > 1).toSeq.sorted(ord)
      .take(math.max(0, vocabSize - cs.length))
    (cs ++ ms).sorted(ord).zipWithIndex
      .map { case ((p, c), r) => (r.toLong, p, c) }
  }

  /** Train as a DataFrame `(rank, piece, cnt)` — the oracle joins the
    * committed Python-fixture CSV on the corpus fingerprint. */
  def trainDF(df: DataFrame, textCol: String, vocabSize: Int = 300,
      seedSize: Int = 1000, nIters: Int = 3, minCount: Long = 2L)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, vocabSize, seedSize, nIters, minCount)
      .toDF("rank", "piece", "cnt")
  }
}
