package graft

import java.nio.file.{Files, Paths}

/** Plan-capture tool for the optimization rounds: for each named query
  * (or every query with no args) writes `.explain("formatted")` output
  * to `<outDir>/<name>.txt`. Same session config as [[Bench]] so the
  * captured plans are the plans the bench actually runs (AQE initial
  * plan; the bench's executed plan can differ only by AQE runtime
  * re-optimization). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Explain <outDir> [q ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <outDir> [queryName ...]")
    val outDir = Paths.get(args.head)
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"$name.txt"), plan)
        println(s"[explain] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name failed: ${e.getMessage}")
      }
      graft.operators.TrackedCaches.releaseAll()
    }
    spark.stop()
  }
}
