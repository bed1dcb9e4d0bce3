package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Urls

/** Registered ("eTLD+1") domain of a host under full Public Suffix
  * List rule semantics — exact, wildcard (`*.ck`), and exception
  * (`!www.ck`) rules, longest match, implicit default `*` — evaluated
  * by [[Urls.Psl.registeredDomainOf]] against the committed
  * `graft/public_suffix_list.dat` classpath resource (parsed once per
  * JVM; the jar ships the table to executors, no broadcast, no join).
  *
  * Why an Expression and not a when-chain: the chain form needs
  * O(maxRuleLen) anchored regexp_extracts PER BRANCH, duplicated into
  * every downstream reference by optimizer substitution — measured at
  * 5× the per-row cost of the whole canonical-URL pipeline when the
  * full rule table landed. This node is one static call inside
  * whole-stage codegen: a single right-to-left label scan plus
  * O(maxRuleLen) hash-set probes per row, independent of table size.
  * Null when the host IS a public suffix or has too few labels, so
  * the expression is nullable regardless of its child.
  *
  * The DuckDB oracle replays the identical precedence as a generated
  * CASE over anchored last-k-label extracts (SparkEntry.pslDomainCase)
  * built from the SAME parsed rule table, so engine and oracle cannot
  * drift. */
case class RegisteredDomainExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"registered_domain needs string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    RegisteredDomainExpr.kernel(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.RegisteredDomainExpr.kernel($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression)
      : RegisteredDomainExpr = copy(child = c)
}

object RegisteredDomainExpr {

  /** Static kernel shared by interpreted eval and generated code.
    * UTF8String→String is safe: PSL rules and canonical hosts are
    * compared byte-wise and the table is ASCII/punycode. */
  def kernel(h: UTF8String): UTF8String = {
    val out = Urls.Psl.registeredDomainOf(h.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  private val FnName = "graft_registered_domain"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => RegisteredDomainExpr(exprs.head), "scala_udf")

  def registeredDomain(host: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, host)
  }
}
