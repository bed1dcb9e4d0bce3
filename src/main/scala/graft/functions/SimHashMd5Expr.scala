package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine (oracle-pinned) SimHash flavor: per-token hash is the
  * FIRST 64 BITS OF THE MD5 HEX DIGEST read big-endian, and the
  * signature is returned as a 64-char '0'/'1' bit string — both choices
  * so a SQL engine with only `md5(text) -> hex` (DuckDB, Postgres,
  * Trino) can reproduce the signature exactly: bit b of token t is
  * `(hexval(md5(t)[b/4]) >> (3 - b%4)) & 1`, vote +1/-1, signature char
  * b is '1' iff the vote is > 0 (same tie rule as [[SimHash64Expr]]).
  *
  * The production near-dup path stays on [[SimHash64Expr]] (XXH64 is
  * ~20x cheaper per token than MD5); this flavor exists so the simhash
  * TRANSFORM itself — tokenize, per-bit vote, sign pack — is pinned by
  * the DuckDB oracle harness rather than by specs alone.
  * Reference provenance: signature semantics mirror the banded near-dup
  * inventory row (SURVEY §8); the reference repo has no simhash. */
case class SimHashMd5Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_md5 needs array<string>, got ${other.catalogString}")
    }
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 8 digest bytes = first 16 hex chars; bit b of the
        // big-endian read is bit (7 - b%8) of byte b/8
        var b = 0
        while (b < 64) {
          if (((d(b >> 3) >> (7 - (b & 7))) & 1) == 1) votes(b) += 1
          else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var b = 0
    while (b < 64) {
      out(b) = if (votes(b) > 0) '1' else '0'
      b += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHashMd5Expr =
    copy(child = c)
}

object SimHashMd5Expr {
  private val FnName = "graft_simhash_md5"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => SimHashMd5Expr(exprs.head), "scala_udf")

  /** md5-flavor SimHash bit string of a token-array column. */
  def simhashMd5(tokens: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, tokens)
  }
}
