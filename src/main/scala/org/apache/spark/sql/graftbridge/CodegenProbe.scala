package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.WholeStageCodegenExec

/** Diagnostic probe for the whole-stage-codegen BYTECODE BUDGET.
  *
  * Spark's fallback when a generated method exceeds
  * `spark.sql.codegen.hugeMethodLimit` (default 65535 — the JVM's
  * JIT refusal threshold) is SILENT and runtime-only: the plan string
  * still shows the WholeStageCodegen spans, but `doExecute` quietly
  * runs the interpreted child instead. An over-budget fused map stage
  * therefore LOOKS identical in every plan dump while running
  * interpreted. This probe compiles each WholeStageCodegen subtree
  * the way doExecute would and reports the worst generated-method
  * size, so specs can pin "this fused stage stays compiled" as a
  * number instead of a timing (CodegenBudgetSpec pins the
  * classifier x canonical-URL-chain stage, the engine's largest).
  *
  * Bridge placement: `doCodeGen`/`CodeGenerator.compile` are
  * `private[sql]`. Probe-only — never on the hot path. */
object CodegenProbe {

  /** Max generated-method bytecode across the plan's codegen stages
    * (0 when the plan has none). Run with AQE off so the stages sit
    * in the plan tree directly rather than inside lazily-materialized
    * query stages. */
  def maxMethodBytecode(df: DataFrame): Int = {
    val plan = df.asInstanceOf[classic.Dataset[_]]
      .queryExecution.executedPlan
    plan.collect { case w: WholeStageCodegenExec =>
      val (_, code) = w.doCodeGen()
      val (_, stats) = CodeGenerator.compile(code)
      stats.maxMethodCodeSize
    } match {
      case Nil => 0
      case xs => xs.max
    }
  }
}
