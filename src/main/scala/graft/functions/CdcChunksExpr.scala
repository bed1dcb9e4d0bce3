package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (simplified FastCDC / gear hash) — the
  * storage-dedup primitive for binary-ish payloads: chunk boundaries
  * are set by the CONTENT (a rolling gear hash hitting a mask), so an
  * insertion early in a document shifts only the chunks it touches,
  * where fixed-size blocks would shift every later block and defeat
  * dedup. Returns the md5 hex of every chunk's bytes, in order; chunk
  * counts and corpus-level dup ratios are plain SQL over the exploded
  * array.
  *
  * Boundary rule over the UTF-8 bytes: starting each chunk with
  * h = 0, after absorbing byte b via `h = (h << 1) + gear(b)` (64-bit
  * wrapping), cut AFTER the byte when the chunk has at least
  * `MinLen` bytes and `(h & Mask) == 0`, or unconditionally at
  * `MaxLen`. The gear table is derived from md5("gear|<byte>") —
  * no magic constants, so the committed Python fixture generator
  * (scripts/gen_cdc_fixture.py) rebuilds the identical table and the
  * oracle never depends on JVM internals.
  *
  * Deterministic, map-only, codegen'd (one static call per row);
  * array size is bounded by bytes/MinLen. */
case class CdcChunksExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks needs string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    CdcChunksExpr.chunks(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcChunksExpr.chunks($c)")

  override protected def withNewChildInternal(c: Expression)
      : CdcChunksExpr = copy(child = c)
}

object CdcChunksExpr {

  /** Chunking parameters: >= 32 bytes per chunk, ~96-byte average
    * (32 + 1/2^6 expected gap), hard cut at 512. */
  val MinLen = 32
  val Mask = 0x3FL
  val MaxLen = 512

  /** gear(b) = first 8 bytes of md5("gear|b"), big-endian — the same
    * table the Python fixture generator derives. */
  private val Gear: Array[Long] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until 256).map { b =>
      val d = md.digest(s"gear|$b".getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
      h
    }.toArray
  }

  /** Static kernel shared by interpreted eval and generated code:
    * md5 hex of each chunk's bytes, in order. Empty input -> empty
    * array. */
  def chunks(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val md = MessageDigest.getInstance("MD5")
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + Gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= MinLen && (h & Mask) == 0L) || len == MaxLen ||
        i == bytes.length - 1) {
        val d = md.digest(java.util.Arrays.copyOfRange(bytes, start, i + 1))
        val hex = new StringBuilder(32)
        d.foreach(b => hex.append(f"${b & 0xFF}%02x"))
        out += UTF8String.fromString(hex.toString)
        md.reset()
        start = i + 1
        h = 0L
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val FnName = "graft_cdc_chunks"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => CdcChunksExpr(exprs.head), "scala_udf")

  def cdcChunks(c: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, c)
  }
}
