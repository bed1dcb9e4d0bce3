package graft.functions

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}
import java.nio.{ByteBuffer, CharBuffer}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the ftfy step of every crawl pipeline: text that
  * was UTF-8 on the wire but got DECODED as CP1252 somewhere upstream
  * ("café" shipped as "cafÃ©") is transcoded back by the exact inverse
  * (re-encode the chars as CP1252, strictly decode the bytes as
  * UTF-8), iterated to a fixpoint so double-encoded UTF-8
  * ("ÃƒÂ©" -> "Ã©" -> "é") also heals.
  *
  * Safety: both legs are STRICT. Healthy text passes through
  * untouched — a lone 'é' re-encodes to the single byte 0xE9, which is
  * not valid UTF-8, so the decode leg throws and the original string
  * is returned; pure-ASCII text round-trips to itself and stops the
  * loop. Only byte sequences that actually parse as UTF-8 after the
  * CP1252 inverse — the mojibake signature — are rewritten. The known
  * boundary: CP1252 leaves 5 bytes (0x81 0x8D 0x8F 0x90 0x9D)
  * undefined; the JDK maps them leniently to C1 controls while strict
  * codecs refuse them, so artifacts involving those bytes (e.g. a
  * mojibake'd U+201D right quote) pass through unrepaired rather than
  * risk a wrong rewrite — same policy as ftfy's conservative mode.
  *
  * Not ANSI-replayable (DuckDB has no CP1252 transcode), so the query
  * rides the committed-fixture oracle pattern
  * (scripts/gen_mojibake_fixture.py, keyed by a SQL-replayable corpus
  * fingerprint) exactly like compression_ratio. Codegen: one static
  * call per row inside whole-stage codegen. */
case class MojibakeRepairExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mojibake_repair needs string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    MojibakeRepairExpr.repair(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MojibakeRepairExpr.repair($c)")

  override protected def withNewChildInternal(c: Expression)
      : MojibakeRepairExpr = copy(child = c)
}

object MojibakeRepairExpr {

  /** Max transcode passes: 1 = plain mojibake, 2 = double-encoded;
    * 3 gives one spare round before declaring fixpoint. */
  val MaxPasses = 3

  /** The CP1252 remap block: the 27 non-C1 characters CP1252 assigns
    * to bytes 0x80-0x9F. A mojibake'd 3-byte UTF-8 sequence shows one
    * of these (or a C1 control) after the lead char — the visible
    * fingerprint `â€œ`-style artifacts are made of. */
  val Cp1252High: String =
    "€‚ƒ„…†‡ˆ‰Š" +
      "‹ŒŽ‘’“”•–—" +
      "˜™š›œžŸ"

  /** Engine-neutral DETECTION regex (shared with the SQL oracle; RE2-
    * safe): a 'Ã'/'Â'-class lead char followed by a Latin-1/CP1252
    * continuation, or the three-char 'â€x' signature of mojibake'd
    * punctuation. Detection is a heuristic COUNT (for flagging /
    * routing); [[repair]] is the strict transform. */
  val MojibakeSignature: String =
    s"\u00C3[\u0080-\u00FF$Cp1252High]|\u00E2\u20AC.|\u00C2[\u00A0-\u00BF]"

  private val Cp1252 = Charset.forName("windows-1252")

  /** One strict CP1252-encode / UTF-8-decode pass; returns the input
    * unchanged when either leg refuses (= the text is not mojibake
    * under this codec pair). */
  private def onePass(t: String): String =
    try {
      val enc = Cp1252.newEncoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      val bytes: ByteBuffer = enc.encode(CharBuffer.wrap(t))
      val dec = Charset.forName("UTF-8").newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      dec.decode(bytes).toString
    } catch { case _: CharacterCodingException => t }

  /** Static kernel shared by interpreted eval and generated code. */
  def repair(s: UTF8String): UTF8String = {
    val orig = s.toString
    var cur = orig
    var pass = 0
    var changed = true
    while (pass < MaxPasses && changed) {
      val next = onePass(cur)
      changed = next != cur
      if (changed) cur = next
      pass += 1
    }
    if (cur eq orig) s else UTF8String.fromString(cur)
  }

  private val FnName = "graft_mojibake_repair"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => MojibakeRepairExpr(exprs.head), "scala_udf")

  def mojibakeRepair(c: Column): Column = {
    register(SparkSession.active)
    call_function(FnName, c)
  }
}
