package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Token-level longest-common-subsequence length of two strings —
  * the core of ROUGE-L (Lin 2004). Tokens are the engine's clean
  * whitespace convention ([[TextFunctions.cleanTokens]]); the DP is
  * the classic two-row O(n*m) table over primitive int arrays,
  * per-row JVM eval (CodegenFallback, the [[BpeCountExpr]] pattern).
  * LCS is not ANSI-expressible, so the oracle rides a committed
  * independent-Python fixture (scripts/gen_rouge_fixture.py), the
  * q_bpe_count contract. */
object Lcs {

  private def toks(s: String): Array[String] =
    s.toLowerCase(java.util.Locale.ROOT).trim
      .split("\\s+").filter(_.nonEmpty)

  def lcsTokens(a: String, b: String): Long = {
    val x = toks(a)
    val y = toks(b)
    if (x.isEmpty || y.isEmpty) return 0L
    var prev = new Array[Int](y.length + 1)
    var cur = new Array[Int](y.length + 1)
    var i = 0
    while (i < x.length) {
      var j = 0
      while (j < y.length) {
        cur(j + 1) =
          if (x(i) == y(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(y.length).toLong
  }
}

case class LcsTokensExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"lcs_tokens needs (string, string), got " +
              s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    Lcs.lcsTokens(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): LcsTokensExpr = copy(left = l, right = r)
}

object LcsTokensExpr {
  private val FnName = "graft_lcs_tokens"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => LcsTokensExpr(exprs.head, exprs(1)),
      "scala_udf")

  /** Token-LCS length of two string columns. */
  def lcsTokens(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, a, b)
  }
}
