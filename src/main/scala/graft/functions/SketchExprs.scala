package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Executor-side probes for Spark's mergeable sketches
  * (`org.apache.spark.util.sketch`). The driver builds a sketch with the
  * distributed `df.stat.bloomFilter` / `df.stat.countMinSketch`
  * aggregates (one map-side-mergeable pass); these expressions ship the
  * serialized sketch into the row pipeline as a codegen reference object
  * so a per-row membership / frequency probe runs inside whole-stage
  * codegen — the building block for bloom-pruned semi-joins and
  * sketch-prefiltered heavy hitters (operators/Sketches.scala), where
  * the sketch cuts the shuffled side before any exact confirm pass.
  *
  * Both expressions deserialize the sketch ONCE per task (lazy val on
  * the expression instance, which Spark serializes per stage — the
  * bytes travel with the closure, not per row).
  */
private[graft] trait SketchProbe { self: UnaryExpression =>
  def bytes: Array[Byte]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sketch probe needs bigint, int or string, got ${other.catalogString}")
  }
}

/** `BloomFilter.mightContain*` as a codegen'd row predicate. Never a
  * false negative (the bloom contract), so a downstream exact confirm
  * join sees every true match — see Sketches.bloomSemiJoin. */
case class BloomMightContainExpr(bytes: Array[Byte], child: Expression)
    extends UnaryExpression with SketchProbe {

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => bloom.mightContainLong(v.asInstanceOf[Long])
    case IntegerType => bloom.mightContainLong(v.asInstanceOf[Int].toLong)
    case StringType => bloom.mightContainString(v.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    child.dataType match {
      case LongType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
      case IntegerType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainLong((long) $c)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$ref.mightContainString($c.toString())")
    }
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainExpr =
    copy(child = c)
}

/** `CountMinSketch.estimateCount` as a codegen'd row expression —
  * returns the sketch's (never-under) frequency estimate. String probes
  * hash the same UTF-8 bytes `df.stat.countMinSketch` added, so
  * estimates line up with the building aggregate exactly. */
case class CmsEstimateExpr(bytes: Array[Byte], child: Expression)
    extends UnaryExpression with SketchProbe {

  override def dataType: DataType = LongType

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType | IntegerType => cms.estimateCount(v)
    case StringType => cms.estimateCount(v.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$ref.estimateCount($c.toString())")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$ref.estimateCount((Object)($c))")
    }
  }

  override protected def withNewChildInternal(c: Expression): CmsEstimateExpr =
    copy(child = c)
}

object SketchExprs {
  private val BloomFn = "graft_bloom_might_contain"
  private val CmsFn = "graft_cms_estimate"

  private def litBytes(e: Expression): Array[Byte] = e match {
    case Literal(b: Array[Byte], BinaryType) => b
    case other => throw new IllegalArgumentException(
      s"sketch bytes must be a binary literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      BloomFn, es => BloomMightContainExpr(litBytes(es.head), es(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CmsFn, es => CmsEstimateExpr(litBytes(es.head), es(1)), "scala_udf")
  }

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream(); bf.writeTo(out); out.toByteArray
  }
  def serialize(cms: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream(); cms.writeTo(out); out.toByteArray
  }

  /** Membership probe of `value` against a driver-built bloom filter. */
  def bloomMightContain(bloom: BloomFilter, value: Column): Column = {
    register(SparkSession.active)
    call_function(BloomFn, lit(serialize(bloom)), value)
  }

  /** CMS frequency estimate (never under the true count) of `value`. */
  def cmsEstimate(cms: CountMinSketch, value: Column): Column = {
    register(SparkSession.active)
    call_function(CmsFn, lit(serialize(cms)), value)
  }
}
