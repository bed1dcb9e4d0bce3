package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Byte-level BPE token counting (the public GPT-2 algorithm:
  * Radford et al. 2019; openai/gpt-2 `encoder.py`): pre-tokenize with
  * the GPT-2 regex, byte-encode each pre-token (space -> 'Ġ', other
  * bytes -> stable chars), then greedily merge the LOWEST-RANK adjacent
  * symbol pair until no ranked pair remains. The merge table is the
  * committed resource `graft/bpe_merges.txt` — a small hand-built
  * English vocab; the algorithm, not the vocab, is the engine surface.
  *
  * The engine's whitespace token convention stays the default
  * everywhere (TextFunctions.tokenCount); this makes token budgets
  * (`Sampling.tokenBudgetMix`), chunking, and packing token-EXACT for
  * pipelines that need a real tokenizer.
  * Reference provenance: the reference repo has no tokenizer; counts
  * feed the same budget operators as SURVEY §7.7's whitespace flavor.
  */
object Bpe {

  /** GPT-2 pre-tokenizer (contractions, space-prefixed word/number/
    * punct runs, trailing/other whitespace). UNICODE_CHARACTER_CLASS:
    * Java's bare \s is ASCII-only, but the fixture generator (Python)
    * and the original GPT-2 pattern treat \s as Unicode whitespace —
    * without the flag, NBSP/U+2028 fall into the punctuation branch and
    * the pre-token boundaries silently diverge cross-implementation. */
  private val preTok = Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+",
    Pattern.UNICODE_CHARACTER_CLASS)

  /** (left, right) -> rank, lower merges first. */
  lazy val ranks: Map[(String, String), Int] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "resource graft/bpe_merges.txt missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines()
        .filterNot(l => l.isEmpty || l.startsWith("#"))
        .zipWithIndex
        .map { case (l, i) =>
          val p = l.split(' ')
          require(p.length == 2, s"bad merge line $i: '$l'")
          (p(0), p(1)) -> i
        }
        .toMap
    } finally src.close()
  }

  /** Byte -> symbol char: space is 'Ġ' (GPT-2's marker), printable
    * ASCII maps to itself, anything else to a private high codepoint
    * (a bijection, so counts are well-defined for any UTF-8 input;
    * the committed vocab only ever merges the ASCII range). */
  @inline private def byteChar(b: Byte): Char = {
    val u = b & 0xff
    if (u == 0x20) 'Ġ'
    else if (u > 0x20 && u < 0x7f) u.toChar
    else (0x100 + u).toChar
  }

  /** BPE symbol count of ONE pre-token: greedy lowest-rank merge of all
    * occurrences of the best pair, repeated to fixpoint. */
  private def countPretoken(s: String): Int = {
    val bytes = s.getBytes("UTF-8")
    if (bytes.length <= 1) return bytes.length
    var syms = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      syms(i) = String.valueOf(byteChar(bytes(i)))
      i += 1
    }
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else {
        // merge every (non-overlapping, left-to-right) occurrence
        val out = Array.newBuilder[String]
        i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == best._1 &&
              syms(i + 1) == best._2) {
            out += syms(i) + syms(i + 1)
            i += 2
          } else {
            out += syms(i)
            i += 1
          }
        }
        syms = out.result()
      }
    }
    syms.length
  }

  /** Total BPE token count of a document. */
  def count(text: String): Long = {
    val m = preTok.matcher(text)
    var n = 0L
    while (m.find()) n += countPretoken(m.group())
    n
  }

  /** GPT-2 pre-tokens of a text (trainer + encoder share the split). */
  private[graft] def pretokens(text: String): Iterator[String] = {
    val m = preTok.matcher(text)
    new Iterator[String] {
      private var has = m.find()
      def hasNext: Boolean = has
      def next(): String = { val g = m.group(); has = m.find(); g }
    }
  }

  /** Initial byte-level symbol array of a pre-token (the trainer's
    * starting alphabet — same byte->char bijection as the encoder). */
  private[graft] def byteSyms(s: String): Array[String] = {
    val bytes = s.getBytes("UTF-8")
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = String.valueOf(byteChar(bytes(i))); i += 1 }
    out
  }
}

/** Catalyst expression: BPE token count of a string column. Per-row JVM
  * eval (CodegenFallback like [[SimHashMd5Expr]]) — the inner loops are
  * primitive arrays; no UDF serialization boundary. */
case class BpeCountExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_count needs string, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    Bpe.count(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString)

  override protected def withNewChildInternal(c: Expression): BpeCountExpr =
    copy(child = c)
}

object BpeCountExpr {
  private val FnName = "graft_bpe_count"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => BpeCountExpr(exprs.head), "scala_udf")

  /** BPE token count of a string column. */
  def bpeCount(text: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, text)
  }
}
