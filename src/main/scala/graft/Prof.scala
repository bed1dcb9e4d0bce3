package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling scratchpad for the optimization rounds: times named
  * sub-pipelines (stages of the expensive queries) in isolation with
  * the noop sink, so a query's cost splits into its structural parts
  * (guide §1.4: noop computes every column of every row, unlike count).
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Prof <leg> [reps]".
  * Not part of the bench contract; timings printed human-readable.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val reps = if (args.length > 1) args(1).toInt else 3

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        noop(mk)
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.TrackedCaches.releaseAll()
        dt
      }
      println(f"[prof] $name%-40s min ${ts.min}%7.3f  all ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    // warmup
    docs.groupBy("source").count().count()

    val legs: Map[String, () => Unit] = Map(
      "docs_scan" -> (() => time("docs_scan")(docs.select("doc_id", "text"))),
      "shingle" -> (() => time("shingle") {
        import graft.functions.TextFunctions._
        docs.select(col("doc_id").as("did"), col("text").as("txt"))
          .repartition(32, col("did"))
          .select(col("did"),
            array_distinct(transform(wordShingles(col("txt"), 3),
              x => xxhash64(x))).as("sh"))
      }),
      "jaccard_pairs" -> (() => time("jaccard_pairs")(
        operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.8))),
      "pagerank_full" -> (() => time("pagerank_full")(
        operators.Graph.pageRank(
          operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
            n = 3, threshold = 0.8), iterations = 5))),
      "pagerank_tinyedges" -> (() => {
        val pairs = operators.Dedup.ngramJaccardPairs(docs, "doc_id",
          "text", n = 3, threshold = 0.8)
          .select("id_a", "id_b").cache()
        pairs.count()
        time("pagerank_tinyedges")(
          operators.Graph.pageRank(pairs, iterations = 5))
        pairs.unpersist()
      }),
      "pagerank_noaqe" -> (() => {
        val pairs = operators.Dedup.ngramJaccardPairs(docs, "doc_id",
          "text", n = 3, threshold = 0.8)
          .select("id_a", "id_b").cache()
        pairs.count()
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        time("pagerank_noaqe")(
          operators.Graph.pageRank(pairs, iterations = 5))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        pairs.unpersist()
      }),
      "bpe_corpus_pass" -> (() => time("bpe_corpus_pass") {
        import spark.implicits._
        docs.select(col("text").as("t")).na.drop.as[String]
          .flatMap(t => graft.functions.Bpe.pretokens(t))
          .groupBy("value").agg(count(lit(1)).as("freq"))
      }),
      "bpe_train" -> (() => time("bpe_train")(
        operators.BpeTrain.trainDF(docs, "text", nMerges = 48))),
      "mp_ann" -> (() => time("mp_ann")(
        operators.Similarity.nnGraphMultiProbe(emb, degree = 8,
          nPlanes = 4, probes = 2))),
      "distinct_ngrams" -> (() => time("distinct_ngrams")(
        operators.Eval.distinctNgrams(docs, "source", "text", maxN = 2))),
      "ktruss_full" -> (() => time("ktruss_full")(
        operators.Graph.kTruss(
          operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
            n = 3, threshold = 0.8), k = 3, rounds = 4))),
      "ktruss_tinyedges" -> (() => {
        val pairs = operators.Dedup.ngramJaccardPairs(docs, "doc_id",
          "text", n = 3, threshold = 0.8)
          .select("id_a", "id_b").cache()
        pairs.count()
        time("ktruss_tinyedges")(
          operators.Graph.kTruss(pairs, k = 3, rounds = 4))
        pairs.unpersist()
      }),
      "ktruss_support_once" -> (() => {
        val pairs = operators.Dedup.ngramJaccardPairs(docs, "doc_id",
          "text", n = 3, threshold = 0.8)
        val e = pairs.select(
            least(col("id_a"), col("id_b")).cast("long").as("lo"),
            greatest(col("id_a"), col("id_b")).cast("long").as("hi"))
          .filter(col("lo") < col("hi")).distinct().cache()
        println(s"[prof] canonical edges n=${e.count()}")
        time("ktruss_support_once") {
          val tri = e.select(col("lo").as("a"), col("hi").as("b"))
            .join(e.select(col("lo").as("b"), col("hi").as("c")), "b")
            .join(e.select(col("lo").as("a"), col("hi").as("c")),
              Seq("a", "c"))
          tri.select(explode(array(
              struct(col("a").as("lo"), col("b").as("hi")),
              struct(col("b").as("lo"), col("c").as("hi")),
              struct(col("a").as("lo"), col("c").as("hi")))).as("e"))
            .select(col("e.lo"), col("e.hi"))
            .groupBy("lo", "hi")
            .agg(count(lit(1)).as("support"))
        }
        e.unpersist()
      }),
      "cross_neardup" -> (() => time("cross_neardup")(
        operators.Dedup.crossNearDupPairs(
          docs.filter(col("doc_id") % 7 =!= 0),
          docs.filter(col("doc_id") % 7 === 0), "doc_id", "text",
          n = 3, threshold = 0.8))),
      // manifest lifecycle phase split (r15): which of the q_manifest_
      // compact stages carries the cost — the writes, the bloom
      // builds, or the compaction swap
      "manifest_phases" -> (() => {
        val d = docs
        def phase[T](name: String)(body: => T): T = {
          val t0 = System.nanoTime()
          val r = body
          println(f"[prof] manifest/$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f")
          r
        }
        (1 to reps).foreach { _ =>
          val p = java.nio.file.Files
            .createTempDirectory("graft-prof-manifest").toString
          phase("write_partitioned")(
            operators.Manifests.writeSeenManifestPartitioned(
              d.filter(col("doc_id") % 3 === 0), "text", s"$p/seen",
              prefixLen = 1))
          phase("append_1")(
            operators.Manifests.appendSeenManifest(spark,
              d.filter(col("doc_id") % 3 === 1), "text", s"$p/seen",
              prefixLen = 1))
          phase("bloom_sidecar_write")(
            operators.Manifests.writeBloomSidecar(spark,
              spark.read.parquet(s"$p/seen"), s"$p/seen_bloom"))
          val (bloom, _) = phase("bloom_sidecar_read")(
            operators.Manifests.readBloomSidecar(spark, s"$p/seen_bloom"))
          val fresh = operators.Manifests.filterUnseenWithBloom(
            d.filter(col("doc_id") % 3 === 2), "text",
            spark.read.parquet(s"$p/seen"), bloom)
          phase("append_2_fresh")(
            operators.Manifests.appendSeenManifest(spark, fresh, "text",
              s"$p/seen", prefixLen = 1))
          phase("compact")(
            operators.Manifests.compactSeenManifest(spark, s"$p/seen"))
          phase("final_read")(
            spark.read.parquet(s"$p/seen").count())
          graft.operators.TrackedCaches.releaseAll()
        }
      })
    )

    args.headOption match {
      case Some(l) if legs.contains(l) => legs(l)()
      case Some("all") | None => legs.toSeq.sortBy(_._1).foreach(_._2())
      case Some(other) =>
        System.err.println(s"unknown leg $other; have ${legs.keys.mkString(", ")}")
    }
    spark.stop()
  }
}
