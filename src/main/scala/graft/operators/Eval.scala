package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier-evaluation reports over (label, prediction) frames — the
  * readout layer every curation-model loop needs on top of a raw
  * confusion matrix (which `q_lang_confusion` already pins): per-class
  * precision/recall/F1 with supports, plus macro and accuracy summary
  * rows, all in one long frame.
  *
  * Everything derives from integer cell counts (one hash aggregate
  * over the corpus), so every ratio is a guarded one-expression double
  * — oracle-exact at 6dp. Classes never predicted (or never labeled)
  * still appear, with the sklearn `zero_division=0` convention. */
object Eval {

  /** Long-format report: one row per class
    * `(class, support, precision, recall, f1)`, then `macro`
    * (unweighted class means, support = corpus size) and `accuracy`
    * (all three ratio columns = accuracy, the standard compact
    * placement). Scale shape: one corpus aggregate to the K² cell
    * frame; everything after is classes-sized. */
  def classificationReport(df: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val cells = TrackedCaches.persist(
      df.filter(col(labelCol).isNotNull && col(predCol).isNotNull)
        .groupBy(col(labelCol).cast("string").as("lbl"),
          col(predCol).cast("string").as("prd"))
        .agg(count(lit(1)).as("n")))
    val classes = cells.select(col("lbl").as("cls"))
      .unionByName(cells.select(col("prd").as("cls"))).distinct()
    val tp = cells.filter(col("lbl") === col("prd"))
      .select(col("lbl").as("cls"), col("n").as("tp"))
    val byLbl = cells.groupBy(col("lbl").as("cls"))
      .agg(sum("n").as("supp"))
    val byPrd = cells.groupBy(col("prd").as("cls"))
      .agg(sum("n").as("predn"))
    val per = classes
      .join(tp, Seq("cls"), "left")
      .join(byLbl, Seq("cls"), "left")
      .join(byPrd, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("supp"), lit(0L)).as("supp"),
        coalesce(col("predn"), lit(0L)).as("predn"))
      .withColumn("p", when(col("predn") > 0,
        col("tp") / col("predn").cast("double")).otherwise(lit(0.0)))
      .withColumn("r", when(col("supp") > 0,
        col("tp") / col("supp").cast("double")).otherwise(lit(0.0)))
      .withColumn("f", when(col("p") + col("r") > 0,
        lit(2.0) * col("p") * col("r") / (col("p") + col("r")))
        .otherwise(lit(0.0)))
    val perRows = per.select(col("cls").as("class"),
      col("supp").as("support"), round(col("p"), 6).as("precision"),
      round(col("r"), 6).as("recall"), round(col("f"), 6).as("f1"))
    val totals = per.agg(sum("tp").as("tpall"), sum("supp").as("nall"))
    // built from two always-one-row aggregates (never a groupBy over
    // `per`): an empty input must still emit the macro row — with
    // nulls — exactly as the oracle's `SELECT ... FROM tot` does
    val macroRow = per
      .agg(round(avg("p"), 6).as("precision"),
        round(avg("r"), 6).as("recall"), round(avg("f"), 6).as("f1"))
      .crossJoin(broadcast(totals))
      .select(lit("macro").as("class"), col("nall").as("support"),
        col("precision"), col("recall"), col("f1"))
    val accRow = totals.select(lit("accuracy").as("class"),
        col("nall").as("support"),
        round(col("tpall") / col("nall").cast("double"), 6).as("acc"))
      .select(col("class"), col("support"), col("acc").as("precision"),
        col("acc").as("recall"), col("acc").as("f1"))
    perRows.unionByName(macroRow).unionByName(accRow)
  }
}
