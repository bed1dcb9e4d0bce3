package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a text column — the classic
  * machine-generated/boilerplate detector (highly repetitive text
  * compresses far below natural prose; Gopher-family pipelines
  * threshold on exactly this signal).
  *
  * ratio = deflate(bytes).length / bytes.length, level 6, raw deflate
  * (no gzip header so the 18-byte envelope doesn't swamp short docs),
  * 6dp half-up. Empty/null-byte docs -> null.
  *
  * Deterministic for a given zlib implementation, but NOT
  * ANSI-replayable (DuckDB has no deflate), so the query is rows-only
  * with property specs pinning the semantics: repetitive << natural,
  * ratio bounds, determinism, and a fixed-vector fixture.
  *
  * Codegen: one static call per row inside whole-stage codegen; a
  * fresh Deflater per evaluation (they are not thread-safe and this
  * expression must be driver/executor-safe); `end()` is called so
  * native zlib memory never leaks across the scan. */
case class CompressionRatioExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"compression_ratio needs string, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    CompressionRatioExpr.ratio(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val r = ctx.freshName("ratio")
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Double $r =
         |  graft.functions.CompressionRatioExpr.ratio($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression)
      : CompressionRatioExpr = copy(child = c)
}

object CompressionRatioExpr {
  /** Static kernel shared by interpreted eval and generated code.
    * Returns null (boxed) for empty input. */
  def ratio(s: UTF8String): java.lang.Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return null
    val d = new Deflater(6, /* nowrap = raw deflate */ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      java.lang.Double.valueOf(
        BigDecimal(out.toDouble / bytes.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    } finally d.end()
  }

  private val FnName = "graft_compression_ratio"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => CompressionRatioExpr(exprs.head), "scala_udf")

  def compressionRatio(c: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, c)
  }
}
