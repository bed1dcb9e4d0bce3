package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** LOSS-PROOF dump core (testable without a driver JVM): runs every
    * query in `todo`, writing its parquet dir; a THROWING query still
    * leaves an artifact — a one-row `__verify_error` marker parquet
    * whose hash can never match any oracle — plus an entry in the
    * always-written `_errors.json` sidecar. Without this a regression
    * that breaks a previously-green query would just shrink the
    * artifact set and the round's summary counts would silently report
    * the smaller surface as fully green. Returns (dumpedCount,
    * errorsByQuery). */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
      todo: Map[String, (SparkSession, String) => DataFrame],
      oracles: Map[String, String]): (Int, Map[String, String]) = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    todo.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        errors(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
        try {
          import spark.implicits._
          Seq((name, msg)).toDF("__verify_error", "message")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case m: Throwable =>
          System.err.println(s"[verify] $name marker write failed: ${m.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // ALWAYS written (empty object when clean): a reused outDir would
    // otherwise keep a stale _errors.json from an earlier broken run
    Files.writeString(Paths.get(s"$outDir/_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    // every requested query must have left a parquet dir — count them
    // and scream on any shortfall, so the artifact can never silently
    // represent a subset of the surface
    val dumped = todo.keys.count(n => new java.io.File(s"$outDir/$n").isDirectory)
    if (dumped != todo.size)
      System.err.println(
        s"[verify] FATAL: dumped $dumped of ${todo.size} queries")
    else if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} of ${todo.size} queries " +
        s"failed (error markers written): ${errors.keys.mkString(", ")}")
    else
      System.err.println(s"[verify] all ${todo.size} queries dumped OK")
    (dumped, errors.toMap)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: restrict to these queries (local oracle
    // validation); the driver always passes exactly two args
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", "10000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val todo = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    val (dumped, _) = dump(spark, sfDir, outDir, todo, SparkEntry.oracleSql)
    // release every operator-internal persist accumulated across the
    // 160+ queries — the long-lived-driver hygiene the registry exists
    // for (and what keeps repeated local Verify runs in one JVM honest)
    graft.operators.TrackedCaches.releaseAll()
    spark.stop()
    if (dumped != todo.size) sys.exit(2)
  }
}
