package graft.sources

import graft.SparkSpec
import graft.did.{AttGt, Preprocess, TestPanels}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class PanelSourceSpec extends AnyFunSuite with SparkSpec {

  test("CSV roundtrip: inferred and explicit schemas agree end-to-end") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val panel = TestPanels.staggered(spark, nUnits = 60)
    panel.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$dir/panel")

    val inferred = PanelSource.readCsv(spark, s"$dir/panel")
    val explicit = PanelSource.readCsv(spark, s"$dir/panel",
      Some("id INT, period INT, y DOUBLE, g INT, x1 DOUBLE, x2 DOUBLE, wgt DOUBLE"))
    assert(inferred.count() == panel.count())
    assert(explicit.count() == panel.count())

    // same ATT surface from either ingest path
    val f1 = AttGt.fit(Preprocess.run(inferred, TestPanels.cfg))
    val f2 = AttGt.fit(Preprocess.run(explicit, TestPanels.cfg))
    f1.att.indices.foreach(i =>
      assert(math.abs(f1.att(i) - f2.att(i)) < 1e-12))
    f1.unpersist(); f2.unpersist()
  }

  test("JSONL roundtrip with explicit schema; corrupt lines quarantined") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val docs = spark.range(5).select(col("id").as("doc_id"),
      concat(lit("text "), col("id")).as("text"))
    PanelSource.writeJsonl(docs, s"$dir/docs")
    // Spark disallows queries touching ONLY _corrupt_record on raw
    // files — cache the parsed frame first (documented restriction)
    val back = PanelSource.readJsonl(spark, s"$dir/docs",
      Some("doc_id BIGINT, text STRING")).cache()
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 0)
    assert(back.select("doc_id", "text").collect().toSet ==
      docs.collect().toSet)
    back.unpersist()
    // a corrupt line lands in _corrupt_record, not in a job failure
    Files.write(java.nio.file.Paths.get(s"$dir/docs/zz_bad.json"),
      "{not json\n".getBytes)
    val mixed = PanelSource.readJsonl(spark, s"$dir/docs",
      Some("doc_id BIGINT, text STRING")).cache()
    assert(mixed.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(mixed.filter(col("_corrupt_record").isNull).count() == 5)
    mixed.unpersist()
  }

  test("bucketed tables join and aggregate with ZERO shuffles") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-bucket").toString
    val facts = spark.range(1000).select(col("id"),
      (col("id") % 7).as("v"))
    val dims = spark.range(1000).select(col("id"),
      (col("id") % 5).as("w"))
    PanelSource.writeBucketed(facts, s"$dir/facts", "b_facts", "id", 4)
    PanelSource.writeBucketed(dims, s"$dir/dims", "b_dims", "id", 4)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "id")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join shuffled:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 1000)
      // aggregation on the bucket key is exchange-free too
      val agg = spark.table("b_facts").groupBy("id").agg(sum("v"))
      val aggEx = agg.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(aggEx.isEmpty, "bucketed aggregation shuffled")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("parquet write/read roundtrip preserves the result table") {
    val dir = Files.createTempDirectory("graft-pq").toString
    val pp = Preprocess.run(TestPanels.staggered(spark, nUnits = 60),
      TestPanels.cfg)
    val fit = AttGt.fit(pp)
    PanelSource.writeParquet(fit.resultDF, s"$dir/att")
    val back = PanelSource.readParquet(spark, s"$dir/att")
    assert(back.count() == fit.cells.length)
    fit.unpersist(); pp.unpersist()
  }

  test("ORC roundtrip preserves rows, schema, and filter pushdown") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orc").toString
    val df = (1L to 100L).map(i => (i, s"doc$i", i * 1.5))
      .toDF("id", "name", "score")
    PanelSource.writeOrc(df, s"$dir/t")
    val back = PanelSource.readOrc(spark, s"$dir/t")
    // file formats read back nullable; names and types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
    // predicate reaches the ORC scan (pushdown parity with parquet)
    val plan = back.filter($"id" > 90L).queryExecution.executedPlan
      .toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]"),
      s"no pushed filter in:\n$plan")
  }

  test("binaryFile ingest: one row per file, bytes intact, glob prunes") {
    val dir = Files.createTempDirectory("graft-bin").toString
    for (i <- 1 to 3)
      Files.write(java.nio.file.Paths.get(s"$dir/img$i.png"),
        Array.tabulate[Byte](10 * i)(_.toByte))
    Files.write(java.nio.file.Paths.get(s"$dir/notes.txt"),
      "skip me".getBytes)
    val rows = PanelSource.readBinaryFiles(spark, dir, pathGlob = "*.png")
      .select("path", "length", "content")
      .collect().map(r => (r.getString(0).split('/').last, r.getLong(1),
        r.getAs[Array[Byte]](2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("img1.png", "img2.png", "img3.png"))
    assert(rows.map(_._2).toSeq == Seq(10L, 20L, 30L))
    assert(rows(2)._3.toSeq == Array.tabulate[Byte](30)(_.toByte).toSeq)
    // the byte guard prunes oversized files by metadata
    assert(PanelSource.readBinaryFiles(spark, dir, "*.png", maxBytes = 15L)
      .count() == 1L)
  }

  test("compactParquet rewrites a many-file table into few uniform files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString
    (1L to 2000L).map(i => (i, s"row$i")).toDF("id", "s")
      .repartition(40) // simulate a 40-task small-files write
      .write.parquet(s"$dir/in")
    val before = new java.io.File(s"$dir/in").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 40, s"setup wrote $before files")
    val inBytes = new java.io.File(s"$dir/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target = half the input bytes -> exactly 2 output files
    val n = PanelSource.compactParquet(spark, s"$dir/in", s"$dir/out",
      targetFileBytes = (inBytes + 1) / 2)
    assert(n == 2, s"derived $n files")
    assert(new java.io.File(s"$dir/out").listFiles()
      .count(_.getName.endsWith(".parquet")) == 2)
    // content survives the rewrite
    assert(spark.read.parquet(s"$dir/out").orderBy("id").collect().toSeq ==
      spark.read.parquet(s"$dir/in").orderBy("id").collect().toSeq)
  }

  test("partitioned layout: filter becomes a partition PRUNE, not a scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-part").toString
    val df = (1L to 90L).map(i => (i, s"g${i % 3}", i * 2))
      .toDF("id", "grp", "v")
    PanelSource.writePartitioned(df, s"$dir/t", Seq("grp"))
    val back = spark.read.parquet(s"$dir/t")
    // content survives the layout (partition column round-trips)
    assert(back.count() == 90)
    val g1 = back.filter($"grp" === "g1")
    // the filter must land in PartitionFilters (directory pruning),
    // leaving no data filter at all, and the scan must read 1 of the
    // 3 partition directories
    val scan = g1.queryExecution.executedPlan.collectLeaves().head
      .toString
    assert(scan.contains("PartitionFilters:") &&
      scan.replaceAll("(?s).*PartitionFilters:", "").contains("g1"),
      s"no partition filter in:\n$scan")
    val proj = g1.select("id")
    assert(proj.collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 90L).filter(_ % 3 == 1).toSeq)
    // the executed scan read exactly the g1 directory's files (the
    // relation's inputFiles lists ALL files — the numFiles metric is
    // what pruning actually touched)
    val g1Files = new java.io.File(s"$dir/t/grp=g1").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val scanned = proj.queryExecution.executedPlan.collectLeaves().head
      .metrics("numFiles").value
    assert(scanned == g1Files && g1Files > 0,
      s"scan read $scanned files, g1 dir has $g1Files")
  }
}
