package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for document corpora, each designed for the
  * 100 TB regime:
  *
  *  - exact: one hash-aggregate shuffle keyed by fingerprint, never by
  *    full text (the md5 keeps shuffle rows small);
  *  - n-gram Jaccard: shingle-inverted-index self-join with a
  *    document-frequency cap so stop-shingles cannot create quadratic
  *    skew;
  *  - MinHash+LSH: k min-hash aggregates in ONE pass (k columns, all
  *    codegen'd), banded into buckets so candidate generation is an
  *    equi-join, then exact-Jaccard verification of candidates only;
  *  - SimHash: 64-bit signature per doc in one shuffle-free pass, then
  *    banded (4 x 16-bit) equi-join for Hamming-near candidates.
  */
object Dedup {

  /** Exact duplicate groups: fingerprint -> canonical (min) id + count.
    * One shuffle keyed by the 32-char md5. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("cnt"))

  /** Keep one row per distinct text (the min-id winner). */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol)
      .select(col("keep_id").as(idCol))
    df.join(keep, idCol) // broadcast-able when dup groups are small; the
    // join key is the id so AQE picks the right strategy at scale
  }

  /** Exploded (id, shingle) inverted index with an optional
    * document-frequency cap: shingles occurring in more than `maxDf`
    * docs are dropped BEFORE the pair join — the standard guard against
    * quadratic blowup on stop-shingles at scale. */
  private def shingleIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxDf: Option[Int]): DataFrame = {
    val idx = df
      .select(col(idCol).as("did"), wordShingles(col(textCol), n).as("sh"))
      .select(col("did"), explode(col("sh")).as("s"))
    maxDf match {
      case None => idx
      case Some(cap) =>
        val hot = idx.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap)
          .select("s")
        idx.join(hot, Seq("s"), "left_anti")
    }
  }

  /** All pairs with word-n-gram Jaccard >= threshold.
    * Output: id_a < id_b, jaccard (6dp). `maxDf=None` gives exact
    * semantics (used when an oracle compares); set a cap at scale. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxDf: Option[Int] = None): DataFrame = {
    val idx = shingleIndex(df, idCol, textCol, n, maxDf)
    val sizes = idx.groupBy("did").agg(count(lit(1)).as("nsh"))
    val inter = idx.as("a").join(idx.as("b"),
        col("a.s") === col("b.s") && col("a.did") < col("b.did"))
      .groupBy(col("a.did").as("id_a"), col("b.did").as("id_b"))
      .agg(count(lit(1)).as("ic"))
    inter
      .join(sizes.withColumnRenamed("did", "id_a")
        .withColumnRenamed("nsh", "na"), "id_a")
      .join(sizes.withColumnRenamed("did", "id_b")
        .withColumnRenamed("nsh", "nb"), "id_b")
      .withColumn("jaccard",
        round(col("ic") / (col("na") + col("nb") - col("ic")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: k per-seed minima of xxhash64(shingle, seed),
    * computed as k aggregate columns in ONE hash-aggregate pass (no
    * array-UDAF, fully codegen'd). Returns (id, h0..h{k-1}). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64): DataFrame = {
    val idx = df
      .select(col(idCol).as("did"), explode(wordShingles(col(textCol), n)).as("s"))
    val mins = (0 until k).map(j => min(xxhash64(col("s"), lit(j))).as(s"h$j"))
    idx.groupBy("did").agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs from banded minhash signatures (`bands` bands of
    * `k/bands` rows): docs sharing any band bucket. One explode + one
    * equi-join on (band, bucket). */
  def minhashCandidates(sig: DataFrame, k: Int = 64, bands: Int = 16)
      : DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands=$bands must divide k=$k")
    val bandCols = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(j => col(s"h$j"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bucket"))
    }
    val buckets = sig.select(col("did"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("did"), col("bb.band"), col("bb.bucket"))
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.did") < col("b.did"))
      .select(col("a.did").as("id_a"), col("b.did").as("id_b"))
      .distinct()
  }

  /** Near-duplicate pairs via MinHash+LSH with exact-Jaccard
    * verification of the candidate set only — the scale path: candidate
    * generation is linear-ish in corpus size; the quadratic exact join
    * runs only within candidates. */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16, threshold: Double = 0.8)
      : DataFrame = {
    val sig = minhashSignatures(df, idCol, textCol, n, k)
    val cand = minhashCandidates(sig, k, bands)
    val idx = df.select(col(idCol).as("did"),
      wordShingles(col(textCol), n).as("sh"))
    cand
      .join(idx.select(col("did").as("id_a"), col("sh").as("sha")), "id_a")
      .join(idx.select(col("did").as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("ic", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", round(
        col("ic") / (size(col("sha")) + size(col("shb")) - col("ic")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Per-doc 64-bit SimHash signatures. Shuffle-free projection. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol).as("did"), simhash64(col(textCol)).as("simhash"))

  /** SimHash near-dup candidates with Hamming distance <= maxDist,
    * banded into 4 x 16-bit chunks (any doc pair within Hamming 3 shares
    * at least one exact chunk — pigeonhole), verified exactly. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-band pigeonhole guarantees recall only to 3")
    val sig = simhashSignatures(df, idCol, textCol)
    val banded = sig.select(col("did"), col("simhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)
              .as("chunk"))): _*)).as("bb"))
      .select(col("did"), col("simhash"), col("bb.band"), col("bb.chunk"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.did") < col("b.did"))
      .select(col("a.did").as("id_a"), col("b.did").as("id_b"),
        hamming64(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
