package graft.did

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result presentation (`sum_gt`, `csdids/ATTgt.py:507-517`; `AGGTEobj`
  * summary, `csdids/utils_aggte.py:69-192`; plot frames,
  * `csdids/ATTgt.py:904-913,955-963`). Tables come back as DataFrames a
  * caller can chart or sink; text summaries mirror the reference's
  * banner layout. Charting itself (matplotlib in the reference) is out
  * of engine scope — SURVEY.md §1.5. */
object Summary {

  /** `sum_gt`: rounded ATT(g,t) table with significance stars; band
    * columns appear only for bootstrap fits (mirrors the bstrap toggle
    * at `csdids/ATTgt.py:513-516`). Correct lower/upper orientation
    * (the reference swaps them — SURVEY.md §7.5b). */
  def sumGt(fit: AttGtFit, decimals: Int = 4): DataFrame = {
    val base = fit.resultDF
      .filter(!col("skipped"))
      .select(
        col("group"), col("time"),
        round(col("att"), decimals).as("att"),
        round(col("se"), decimals).as("se"),
        round(col("lower"), decimals).as("lower"),
        round(col("upper"), decimals).as("upper"),
        when(col("sig"), "*").otherwise("").as("sig"))
    if (fit.bstrap) base
    else base.drop("lower", "upper", "sig")
  }

  /** Event-study/aggte plot frame: one row per egt value with point
    * estimate and CI bounds (plot_aggte's pandas frame,
    * `csdids/ATTgt.py:955-963`). */
  def aggtePlotFrame(r: AggteResult): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    r.egt.indices.map { i =>
      val c = r.critValEgt
      (r.egt(i), r.attEgt(i), r.seEgt(i),
        r.attEgt(i) - c * r.seEgt(i), r.attEgt(i) + c * r.seEgt(i))
    }.toDF("egt", "att", "se", "lower", "upper")
  }

  /** ATT(g,t) plot frame grouped by cohort (plot_attgt's frame,
    * `csdids/ATTgt.py:904-913`). */
  def attgtPlotFrame(fit: AttGtFit): DataFrame =
    fit.resultDF.filter(!col("skipped"))
      .select(col("group"), col("time"), col("att"),
        col("se"), col("lower"), col("upper"), col("post"))

  /** plot_attgt frame in the POINTWISE-ANALYTIC flavor: the reference's
    * non-bootstrap fit carries se = c = 0 (`csdids/ATTgt.py:455,483-496`),
    * which collapses the plot CI to the point estimate; this flavor
    * substitutes the analytic influence-function SE and the pointwise
    * normal critical value `z_{1-alp/2}` — the cband=FALSE presentation.
    * Columns mirror the reference frame (`year`, `group`, `grtitle`,
    * `att`, `att_se`, `post`, `c`) plus the CI bounds the plot draws. */
  def attgtPlotFrameAnalytic(fit: AttGtFit): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val z = Stats.normPpf(1 - fit.pp.config.alp / 2)
    fit.cells.indices.filterNot(fit.skipped).map { i =>
      val c = fit.cells(i)
      val att = fit.att(i)
      val se = fit.seAnalytic(i)
      (c.tn, c.g, s"Group ${c.g.toInt}", att, se,
        if (c.tn >= c.g) 1L else 0L, z, att - z * se, att + z * se)
    }.toDF("year", "group", "grtitle", "att", "att_se", "post", "c",
      "lowci", "highci")
  }

  /** Text banner in the reference's summary layout
    * (`csdids/utils_aggte.py:100-192`). */
  def text(r: AggteResult, controlGroup: String = "nevertreated",
      anticipation: Int = 0, estMethod: String = "dr"): String = {
    val title = r.typec match {
      case "simple" => "Aggregate Treatment Effects (simple)"
      case "group" => "Aggregate Group/Cohort Treatment Effects"
      case "calendar" => "Aggregate Calendar-Time Treatment Effects"
      case "dynamic" => "Aggregate Event-Study Treatment Effects"
      case other => s"Aggregate Treatment Effects ($other)"
    }
    val z = Stats.normPpf(1 - r.alp / 2)
    val lo = r.overallAtt - z * r.overallSe
    val hi = r.overallAtt + z * r.overallSe
    val star = if (!lo.isNaN && !hi.isNaN && (hi < 0 || lo > 0)) "*" else ""
    val sb = new StringBuilder
    sb ++= title += '\n'
    sb ++= f"Overall ATT: ${r.overallAtt}%.4f  SE: ${r.overallSe}%.4f  " +
      f"[${lo}%.4f, ${hi}%.4f] $star%n"
    if (r.egt.nonEmpty) {
      sb ++= f"%n  egt        att         se%n"
      r.egt.indices.foreach { i =>
        sb ++= f"  ${r.egt(i)}%6.1f  ${r.attEgt(i)}%9.4f  ${r.seEgt(i)}%9.4f%n"
      }
    }
    sb ++= s"Control group: $controlGroup,  anticipation: $anticipation,  " +
      s"estimation method: $estMethod\n"
    sb.result()
  }
}
