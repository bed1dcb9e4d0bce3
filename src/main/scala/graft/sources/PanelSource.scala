package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest surface (SURVEY.md §2.1). The reference reads header+inferred
  * CSV (`test_predid.py:24`) or takes a caller-supplied DataFrame
  * (`csdids/ATTgt.py:23,32`); the engine additionally standardizes on
  * Parquet (driver testdata format).
  *
  * At scale, `inferSchema` costs an extra full scan of the CSV — prefer
  * an explicit schema (`readCsv(path, Some(ddl))`) for anything big. */
object PanelSource {

  /** Header + type-inference CSV scan (reference parity). Pass `schema`
    * (a DDL string, e.g. "id INT, period INT, y DOUBLE, g INT") to skip
    * the inference scan. */
  def readCsv(spark: SparkSession, path: String,
      schema: Option[String] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schema match {
      case Some(ddl) => base.schema(ddl).csv(path)
      case None => base.option("inferSchema", "true").csv(path)
    }
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write a result table (the driver Verify contract sinks everything
    * as Parquet; the reference has no sinks at all — SURVEY.md §2.1). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
