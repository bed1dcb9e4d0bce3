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

  /** JSON-Lines ingest — the lingua franca of training-data corpora.
    * ALWAYS pass a schema at scale: without one Spark runs a full
    * inference scan, and a single corrupt line can silently widen
    * columns to string. Corrupt records land in `_corrupt_record`
    * (PERMISSIVE) instead of failing the 100 TB job. */
  def readJsonl(spark: SparkSession, path: String,
      schema: Option[String] = None): DataFrame = {
    val base = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    schema match {
      case Some(ddl) =>
        base.schema(ddl + ", _corrupt_record STRING").json(path)
      case None => base.json(path)
    }
  }

  /** JSONL sink, one object per line (interchange with Python tooling);
    * `compress` writes gzip part files. */
  def writeJsonl(df: DataFrame, path: String,
      compress: Boolean = false): Unit = {
    val w = df.write.mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  /** ORC scan — the other columnar interchange format Spark ships a
    * vectorized reader for; same pushdown/pruning behavior as parquet
    * (predicate pushdown into ORC's row-group indexes). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink (zlib by Spark default; columnar round-trip preserves
    * types exactly, unlike CSV). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Whole-file binary ingest (images/audio/video payload directories):
    * one row per file with (path, modificationTime, length, content).
    * The content column is the same opaque `binary` the multimodal
    * decoders consume. `pathGlob` prunes at the LISTING (e.g.
    * "*.png"); `maxBytes` guards the row size — binaryFile loads whole
    * files into single rows, so a stray multi-GB object would OOM an
    * executor without the filter (length is file metadata: the filter
    * prunes BEFORE content is read). */
  def readBinaryFiles(spark: SparkSession, dir: String,
      pathGlob: String = "*", maxBytes: Long = 256L << 20): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .load(dir)
      .filter(org.apache.spark.sql.functions.col("length") <= maxBytes)

  /** Small-files compaction — the 100 TB hygiene pass: a directory
    * written by many tasks (or streamed micro-batches) accumulates
    * thousands of KB-size part files, and every later scan pays a task
    * per file. Rewrites `inPath` to `outPath` in ~`targetFileBytes`
    * files: file count derives from the ACTUAL input bytes (Hadoop
    * content summary — works on any FileSystem), and rows are
    * round-robin repartitioned so output files are uniform. Returns
    * the file count written. */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0, s"bad targetFileBytes: $targetFileBytes")
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1L,
      math.ceil(bytes.toDouble / targetFileBytes).toLong).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Hive-style partitioned parquet layout: one directory per value of
    * `partCols` (`path/lang=en/...`). A filter on a partition column
    * prunes at the DIRECTORY listing — the scan never opens the other
    * partitions' files, so a one-language query over a 100 TB corpus
    * reads only that language's bytes. Partition columns must be
    * LOW-cardinality (languages, dates, sources in the hundreds): each
    * distinct value is a directory, and a high-cardinality partition
    * key degenerates into millions of small files. */
  def writePartitioned(df: DataFrame, path: String,
      partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Bucketed parquet table: rows are hash-clustered (and sorted) by
    * `keyCol` into `nBuckets` files per partition at WRITE time, so
    * every later equi-join or aggregation on that key is exchange-free —
    * the storage layout that turns the repeated 100 TB fact-to-fact join
    * from a shuffle into a local merge. Registered in the session
    * catalog (bucket metadata lives there, not in parquet footers);
    * read back with `spark.table(name)`. */
  def writeBucketed(df: DataFrame, path: String, name: String,
      keyCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, keyCol).sortBy(keyCol)
      .option("path", path)
      .format("parquet")
      .saveAsTable(name)

  /** Permissive CSV read with corruption CAPTURE — the ingest-QA
    * contract: schema-coerced rows parse normally, malformed lines
    * land whole in `_corrupt` instead of killing the job (FAILFAST) or
    * silently vanishing (DROPMALFORMED). At 100 TB a 1e-6 bad-line
    * rate is still a million rows — they must be countable and
    * inspectable, not a stack trace. */
  def readCsvAudit(spark: SparkSession, path: String,
      schemaDdl: String): DataFrame =
    // persisted: Spark (correctly) refuses corrupt-column-only queries
    // over a raw CSV scan — the parse must be materialized once, which
    // is also what an audit wants (parse once, slice bad rows many
    // ways); TrackedCaches so harnesses can release it
    graft.operators.TrackedCaches.persist(
      spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
          .add("_corrupt", org.apache.spark.sql.types.StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path))

  /** Schema-evolution read: union parquet GENERATIONS whose schemas
    * differ (a crawler added fields mid-corpus — the lakehouse
    * reality). `mergeSchema` reconciles footers across all paths;
    * columns missing from older generations null-fill, so downstream
    * aggregates see one stable superset schema. Schema reconciliation
    * is footer-only (no data scan), so the merge cost is O(files),
    * not O(bytes). */
  def readMerged(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
