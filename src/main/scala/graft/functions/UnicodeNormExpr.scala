package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical/compatibility normalization as a native codegen'd
  * expression — the first hygiene pass of a web-scale text pipeline
  * (crawled text mixes precomposed and combining-mark forms of the same
  * grapheme, which breaks exact dedup, shingle hashing, and tokenizer
  * merges downstream).
  *
  * NFC (canonical composition) is the cross-engine-pinned flavor: both
  * the JDK (`java.text.Normalizer`) and DuckDB (`nfc_normalize`)
  * implement UAX #15, so outputs are byte-identical and the DuckDB
  * oracle checks it exactly. NFKC (compatibility composition — folds
  * ligatures, full-width forms, superscripts) has no DuckDB counterpart
  * and is pinned by specs instead.
  *
  * Codegen: a static JDK call per row, inside whole-stage codegen; the
  * fast-path `Normalizer.isNormalized` check skips the copy for the
  * (overwhelmingly common) already-normalized ASCII case.
  */
case class UnicodeNormExpr(child: Expression, compat: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_norm needs string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UnicodeNormExpr.normalize(v.asInstanceOf[UTF8String], compat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormExpr.normalize($c, $compat)")

  override protected def withNewChildInternal(c: Expression): UnicodeNormExpr =
    copy(child = c)
}

object UnicodeNormExpr {
  /** Static kernel shared by interpreted eval and generated code. */
  def normalize(s: UTF8String, compat: Boolean): UTF8String = {
    val form = if (compat) Normalizer.Form.NFKC else Normalizer.Form.NFC
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  private val NfcName = "graft_nfc"
  private val NfkcName = "graft_nfkc"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NfcName, exprs => UnicodeNormExpr(exprs.head, compat = false),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NfkcName, exprs => UnicodeNormExpr(exprs.head, compat = true),
      "scala_udf")
  }

  /** NFC canonical normalization (oracle-pinned vs DuckDB
    * `nfc_normalize`). */
  def nfc(c: Column): Column = {
    register(SparkSession.active)
    call_function(NfcName, c)
  }

  /** NFKC compatibility normalization (spec-pinned; no DuckDB
    * counterpart). */
  def nfkc(c: Column): Column = {
    register(SparkSession.active)
    call_function(NfkcName, c)
  }
}
