package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native expression — the
  * typo-tolerant linkage scorer that complements Levenshtein
  * (`Linkage.fuzzyNamePairs`): edit distance punishes transpositions
  * and long names uniformly, while Jaro-Winkler weights shared
  * characters, transposition structure, and (Winkler) a shared prefix
  * — the standard choice for person/product-name matching.
  *
  * Conventions pinned to DuckDB's native `jaro_winkler_similarity`
  * (probed, so the oracle is cross-engine EXACT, not approximate):
  * either side empty -> 0.0; match window `max(|a|,|b|)/2 - 1`
  * (floored at 0); the Winkler prefix boost (scale 0.1, prefix capped
  * at 4) applies only when the Jaro core exceeds the classic 0.7
  * boost threshold. Computed over UTF-8 BYTES (DuckDB's convention,
  * pinned pair-for-pair by the 20k randomized parity probe in
  * JaroParitySpec; for ASCII, bytes and code points coincide). */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(JaroWinklerExpr.jaroWinklerUTF8(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String]))

  // real whole-stage codegen (not CodegenFallback): a static call into
  // the reference implementation keeps the similarity inside the fused
  // pipeline — no per-row InternalRow boxing between the blocked join
  // and the score filter
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.JaroWinklerExpr.jaroWinklerUTF8($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {
  private val FnName = "graft_jaro_winkler"

  /** Codegen entry point (static forwarder on the companion class, so
    * generated Java can call it directly). */
  def jaroWinklerUTF8(a: UTF8String, b: UTF8String): Double =
    jaroWinklerBytes(a.getBytes, b.getBytes)

  /** Spec/driver entry point: scores the UTF-8 encoding of the two
    * strings (see the byte-convention note on [[jaroWinklerBytes]]). */
  def jaroWinkler(a: String, b: String): Double =
    jaroWinklerBytes(a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Reference implementation (shared by eval, codegen, and specs).
    *
    * BYTE convention: the similarity is computed over the UTF-8 BYTES
    * of each string — DuckDB's `jaro_winkler_similarity` convention,
    * verified pair-for-pair by the 20k-random-pair parity probe
    * (JaroParitySpec / `tools/gen_jaro_parity_fixture.py`), which is
    * what caught the divergence: a code-point kernel scores
    * ("😀a", "a😀") at 0.0 (window 0 at length 2)
    * while DuckDB's byte kernel scores the 5-byte encodings at 0.8667.
    * For ASCII input bytes and code points coincide. Operating on
    * bytes also means the hot path never materializes a String from
    * the UTF8String — the codegen'd call works on the raw buffer. */
  def jaroWinklerBytes(ca: Array[Byte], cb: Array[Byte]): Double = {
    val la = ca.length
    val lb = cb.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && ca(i) == cb(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: aligned traversal of the two matched subsequences
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (ca(i) != cb(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro > 0.7) {
      var p = 0
      while (p < math.min(4, math.min(la, lb)) && ca(p) == cb(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => JaroWinklerExpr(exprs(0), exprs(1)), "scala_udf")

  def jaroWinklerCol(a: Column, b: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, a, b)
  }
}
