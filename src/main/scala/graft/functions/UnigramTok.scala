package graft.functions

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** SentencePiece-style unigram-LM tokenizer (Kudo 2018, "Subword
  * Regularization"): a vocabulary of pieces with counts; a word
  * segments to the piece sequence maximizing `prod(cnt(piece)) / T^k`
  * (T = total vocab count, k = piece count) — the maximum-likelihood
  * unigram segmentation.
  *
  * EXACT-INTEGER Viterbi (the engine's cross-language determinism
  * contract, shared with [[graft.operators.UnigramTrain]] and the
  * independent Python fixture `scripts/gen_unigram_fixture.py`):
  * candidate segmentations are compared by CROSS-MULTIPLIED big
  * integers — `prodA * T^kB  vs  prodB * T^kA` — so no logarithm or
  * float ever enters a comparison and JVM/CPython agree bit-for-bit.
  * Ties break to fewer pieces, then the lexicographically smallest
  * piece list (codepoint order; pieces are BMP on this corpus, where
  * JVM UTF-16 order equals codepoint order). A single char absent
  * from the vocab segments with an implicit count of 1 (coverage
  * floor), so EVERY word is segmentable under any vocab.
  *
  * Word model: Unicode-whitespace split of the lowercased text, each
  * word prefixed with the SentencePiece marker '▁'. The committed
  * vocab resource `graft/unigram_vocab.txt` is the sf0.001-trained
  * fixture written by the Python trainer; a production vocab drops in
  * as the same piece<TAB>count lines.
  *
  * Reference provenance: the reference repo has no tokenizer (SURVEY
  * §2); this is the unigram sibling of the BPE family ([[Bpe]]). */
object Unigram {

  val MaxPieceLen = 6
  val Marker = "▁"

  // Unicode \s to match Python's re \s on str (the fixture's split)
  private val ws = Pattern.compile("\\s+",
    Pattern.UNICODE_CHARACTER_CLASS)

  /** Marker-prefixed lowercased words of a text (empties dropped). */
  def wordsOf(text: String): Seq[String] =
    ws.split(text.toLowerCase(Locale.ROOT)).toSeq
      .filter(_.nonEmpty).map(Marker + _)

  /** Codepoint-order string comparison (== Python str order, and ==
    * UTF-8 byte order; differs from String.compareTo only beyond the
    * BMP). */
  private[graft] def cpLess(a: String, b: String): Boolean = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
    }
    a.length < b.length
  }

  private def seqCpLess(a: List[String], b: List[String]): Boolean = {
    var x = a; var y = b
    while (x.nonEmpty && y.nonEmpty) {
      if (x.head != y.head) return cpLess(x.head, y.head)
      x = x.tail; y = y.tail
    }
    y.nonEmpty
  }

  /** Exact-integer Viterbi segmentation of one marker-prefixed word.
    * `vocab` maps piece -> count; `total` is the vocab count sum. */
  def viterbi(w: String, vocab: collection.Map[String, Long],
      total: Long): List[String] = {
    val n = w.length
    val powT = new Array[BigInt](n + 1)
    powT(0) = BigInt(1)
    var i = 1
    while (i <= n) { powT(i) = powT(i - 1) * total; i += 1 }
    val prod = new Array[BigInt](n + 1)
    val kArr = new Array[Int](n + 1)
    // piece lists kept REVERSED (prepend) while walking; compared and
    // returned in forward order
    val segs = new Array[List[String]](n + 1)
    prod(0) = BigInt(1); kArr(0) = 0; segs(0) = Nil
    i = 1
    while (i <= n) {
      var bp: BigInt = null; var bk = 0; var bl: List[String] = null
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        if (prod(j) != null) {
          val p = w.substring(j, i)
          val c: Long = vocab.get(p) match {
            case Some(x) => x
            case None => if (p.length == 1) 1L else 0L
          }
          if (c > 0L) {
            val cp = prod(j) * c
            val ck = kArr(j) + 1
            val take =
              if (bp == null) true
              else {
                val lhs = cp * powT(bk)
                val rhs = bp * powT(ck)
                if (lhs != rhs) lhs > rhs
                else if (ck != bk) ck < bk
                else seqCpLess((p :: segs(j)).reverse, bl.reverse)
              }
            if (take) { bp = cp; bk = ck; bl = p :: segs(j) }
          }
        }
        j += 1
      }
      prod(i) = bp; kArr(i) = bk; segs(i) = bl
      i += 1
    }
    segs(n).reverse
  }

  /** Committed (sf0.001-trained, Python-fixture-written) vocab in rank
    * order. */
  lazy val committed: Vector[(String, Long)] = {
    val in = getClass.getResourceAsStream("/graft/unigram_vocab.txt")
    require(in != null, "resource graft/unigram_vocab.txt missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().filter(_.nonEmpty).map { l =>
        val t = l.split('\t')
        require(t.length == 2, s"bad vocab line: '$l'")
        (t(0), t(1).toLong)
      }.toVector
    } finally src.close()
  }

  lazy val committedMap: Map[String, Long] = committed.toMap
  lazy val committedTotal: Long = committed.map(_._2).sum

  /** Unigram piece count of a document under the committed vocab. */
  def count(text: String): Long = {
    var n = 0L
    wordsOf(text).foreach { w =>
      n += viterbi(w, committedMap, committedTotal).length
    }
    n
  }
}

/** Catalyst expression: unigram token count of a string column under
  * the committed vocab. Per-row JVM eval (CodegenFallback, the
  * [[BpeCountExpr]] pattern) — primitive-array DP inside, no UDF
  * serialization boundary. */
case class UnigramCountExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"unigram_count needs string, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    Unigram.count(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override protected def withNewChildInternal(c: Expression)
      : UnigramCountExpr = copy(child = c)
}

object UnigramCountExpr {
  private val FnName = "graft_unigram_count"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => UnigramCountExpr(exprs.head), "scala_udf")

  /** Unigram token count of a string column (committed vocab). */
  def unigramCount(text: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, text)
  }
}
