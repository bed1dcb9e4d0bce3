package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for document corpora, each designed for the
  * 100 TB regime:
  *
  *  - exact: one hash-aggregate shuffle keyed by fingerprint, never by
  *    full text (the md5 keeps shuffle rows small);
  *  - n-gram Jaccard: EXACT pairs via PPJoin prefix filtering over
  *    64-bit shingle hashes (rarest-first prefixes join, full sets
  *    verify), with an optional document-frequency cap as the
  *    stop-shingle guard;
  *  - MinHash+LSH: k min-hash aggregates in ONE pass (k columns, all
  *    codegen'd), banded into buckets so candidate generation is an
  *    equi-join, then exact-Jaccard verification of candidates only;
  *  - SimHash: native 64-bit signature expression in one pass, then
  *    banded (4 x 16-bit) equi-join for Hamming-near candidates.
  */
object Dedup {

  /** Explicit partition count for the pre-tokenize repartition: an
    * UN-numbered `repartition(col)` is fair game for AQE coalescing,
    * which on a small corpus folds it back to one partition and
    * re-serializes the tokenizer — the numbered form pins it. */
  private def par(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Shingle-frame persists are registered with the shared
    * [[TrackedCaches]] (idempotent per plan), so long-lived drivers can
    * release them. */
  private def persistTracked(df: DataFrame): DataFrame =
    TrackedCaches.persist(df)

  /** Release every tokenizer cache the operators have created (shared
    * registry — also covers Chunking). Call after the terminal action on
    * the returned frames — the persists are load-bearing for performance
    * while a returned plan is still being consumed (they stop filter
    * pushdown re-running the tokenizer in the scan), but results stay
    * correct either way. */
  def releaseCaches(blocking: Boolean = false): Unit =
    TrackedCaches.releaseAll(blocking)

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

  /** All pairs with word-n-gram Jaccard >= threshold — EXACT output via
    * prefix filtering (AllPairs/PPJoin): under a global rarest-first
    * shingle order, two sets with J >= t must share an element within
    * their first `|S| - ceil(t*|S|) + 1` shingles, so only those prefix
    * entries enter the self-join; candidates are then verified against
    * the full shingle sets. At scale this turns the O(sum df^2) inverted-
    * index join into a join over rare shingles only. Shingles are carried
    * as 64-bit xxhash values, never strings (8-byte shuffle keys;
    * collision odds ~m^2/2^65 over m distinct shingles).
    *
    * `maxDf` additionally drops shingles occurring in more than that many
    * docs BEFORE candidate generation — the stop-shingle guard. Scores
    * stay true full-set Jaccard; the cap only loses pairs whose entire
    * overlap is hot shingles. Output: id_a < id_b, jaccard (6dp). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxDf: Option[Int] = None): DataFrame = {
    // Repartition BEFORE tokenizing (small parquet arrives as ONE
    // partition, which would serialize all shingle work), then persist
    // the hashed-shingle arrays: the cache boundary stops filter
    // pushdown from substituting the tokenizer into the scan (see
    // `shingled`) and every downstream branch (explode, both
    // verification joins) reads one tokenization, already did-hashed.
    val shH = persistTracked(
      df.select(col(idCol).as("did"), col(textCol).as("txt"))
        .repartition(par(df), col("did"))
        .select(col("did"),
          array_distinct(transform(wordShingles(col("txt"), n),
            x => xxhash64(x))).as("sh")))
      .filter(size(col("sh")) > 0)
    // nsh rides along from size(sh) — no count().over(did) window pass
    // over the exploded index (the per-doc size is already known before
    // the explode). Only the maxDf branch must recount post-cap.
    val idx0 = shH.select(col("did"), size(col("sh")).as("nsh"),
      explode(col("sh")).as("h"))
    val idx = maxDf match {
      case None => idx0
      case Some(cap) =>
        val hot = idx0.groupBy("h").agg(count(lit(1)).as("hdf"))
          .filter(col("hdf") > cap).select("h")
        // persist: the capped index feeds both its own recount and the
        // join — uncached it would run the anti-join (and the shingle
        // explode above it) twice
        val kept = persistTracked(
          idx0.drop("nsh").join(hot, Seq("h"), "left_anti"))
        kept.join(
          kept.groupBy("did").agg(count(lit(1)).as("nsh")), "did")
    }
    // one shuffle by did for the rarest-first rank
    val dfCounts = idx.groupBy("h").agg(count(lit(1)).as("dfq"))
    val wDid = Window.partitionBy("did")
    val ranked = idx.join(dfCounts, "h")
      .withColumn("rn",
        row_number().over(wDid.orderBy(col("dfq"), col("h"))))
    val prefix = ranked
      .filter(col("rn") <= col("nsh") - ceil(col("nsh") * threshold) + 1)
      .select("did", "h", "nsh")
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.did") < col("b.did") &&
          col("a.nsh") >= col("b.nsh") * threshold &&
          col("b.nsh") >= col("a.nsh") * threshold)
      .select(col("a.did").as("id_a"), col("b.did").as("id_b"))
      .distinct()
    cand
      .join(shH.select(col("did").as("id_a"), col("sh").as("sha")), "id_a")
      .join(shH.select(col("did").as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("ic", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", round(
        col("ic") / (size(col("sha")) + size(col("shb")) - col("ic")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Shingle-containment pairs: `(src_id, dst_id, containment)` where
    * containment = |A∩B| / |A| >= threshold for A = src's shingle set —
    * the ASYMMETRIC overlap measure Jaccard misses: a quote, excerpt,
    * or aggregator page is near-fully contained in its source while
    * their Jaccard stays low (the source is much bigger). Both
    * directions are reported (A-in-B and B-in-A are different facts).
    *
    * Candidate generation is the asymmetric prefix filter: only the
    * PROBE side (src) can be pruned — containment puts no constraint
    * on the superset's size, so src's rarest `nsh - ceil(t*nsh) + 1`
    * shingles probe the FULL posting index (no size-ratio cut, no
    * dst prefix). `maxDf` caps hot-shingle postings exactly as in
    * [[ngramJaccardPairs]] — at crawl scale boilerplate shingles are
    * the quadratic risk and the cap is the documented bound.
    *
    * `maxDfAbs` is the ALWAYS-ON production backstop (the
    * `lexicalCosinePairs` precedent): even with `maxDf` unset, no
    * posting list longer than `maxDfAbs` ever enters the candidate
    * join, so one boilerplate shingle shared by millions of docs can
    * not go quadratic regardless of parameters. Capped shingles are
    * reported to stderr (count + hottest examples) before any
    * candidate is generated — enforced and loud, not documentation.
    * The default (100k) is far above any honest shingle's df at the
    * scales the exactness contract targets; when it fires, pairs whose
    * ONLY shared prefix shingle was capped are missed (the documented
    * recall bound). */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxDf: Option[Int] = None,
      maxDfAbs: Long = 100000L): DataFrame = {
    require(maxDfAbs >= 1, s"bad maxDfAbs: $maxDfAbs")
    val shH = persistTracked(
      df.select(col(idCol).as("did"), col(textCol).as("txt"))
        .repartition(par(df), col("did"))
        .select(col("did"),
          array_distinct(transform(wordShingles(col("txt"), n),
            x => xxhash64(x))).as("sh")))
      .filter(size(col("sh")) > 0)
    val idx0 = shH.select(col("did"), size(col("sh")).as("nsh"),
      explode(col("sh")).as("h"))
    val idx = maxDf match {
      case None => idx0
      case Some(cap) =>
        val hot = idx0.groupBy("h").agg(count(lit(1)).as("hdf"))
          .filter(col("hdf") > cap).select("h")
        val kept = persistTracked(
          idx0.drop("nsh").join(hot, Seq("h"), "left_anti"))
        kept.join(
          kept.groupBy("did").agg(count(lit(1)).as("nsh")), "did")
    }
    val dfCounts = persistTracked(
      idx.groupBy("h").agg(count(lit(1)).as("dfq")))
    // always-on backstop audit: ONE cheap aggregate over the persisted
    // vocab-sized df frame (materializing it here is work the prefix
    // ranking below reuses), reported BEFORE any candidate exists
    val hotTop = dfCounts.filter(col("dfq") > maxDfAbs)
      .orderBy(col("dfq").desc).limit(5).collect()
    if (hotTop.nonEmpty)
      System.err.println(
        s"[graft.dedup] containmentPairs maxDfAbs=$maxDfAbs CAPPED " +
          s"posting lists (hottest df=${hotTop.head.getLong(1)}) — " +
          "pairs whose only shared prefix shingle was capped are NOT " +
          "emitted; raise maxDfAbs or pre-strip boilerplate")
    val capped = idx.join(dfCounts, "h").filter(col("dfq") <= maxDfAbs)
    val wDid = Window.partitionBy("did")
    val prefix = capped
      .withColumn("rn",
        row_number().over(wDid.orderBy(col("dfq"), col("h"))))
      .filter(col("rn") <= col("nsh") - ceil(col("nsh") * threshold) + 1)
      .select("did", "h")
    val cand = prefix.as("a")
      .join(capped.select("did", "h").as("b"),
        col("a.h") === col("b.h") && col("a.did") =!= col("b.did"))
      .select(col("a.did").as("src_id"), col("b.did").as("dst_id"))
      .distinct()
    cand
      .join(shH.select(col("did").as("src_id"), col("sh").as("sha")),
        "src_id")
      .join(shH.select(col("did").as("dst_id"), col("sh").as("shb")),
        "dst_id")
      .withColumn("containment", round(
        size(array_intersect(col("sha"), col("shb"))) /
          size(col("sha")).cast("double"), 6))
      .filter(col("containment") >= threshold)
      .select("src_id", "dst_id", "containment")
  }

  /** Cross-corpus near-dup pairs: corpus docs whose word-n-gram Jaccard
    * with ANY reference doc >= threshold — deduplicating a new crawl
    * against previous snapshots (the near-dup analogue of
    * [[Decontaminate]]'s exact-shingle flagging). Same EXACT
    * prefix-filtered AllPairs shape as [[ngramJaccardPairs]], with one
    * cross-relation requirement: document frequencies and the
    * rarest-first shingle order are computed over the UNION of both
    * sides — the prefix guarantee only holds when both relations rank
    * their shingles by one shared total order. Output:
    * (corpus_id, ref_id, jaccard). */
  def crossNearDupPairs(corpus: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    def prep(df: DataFrame): DataFrame = persistTracked(
      df.select(col(idCol).as("did"), col(textCol).as("txt"))
        .repartition(par(df), col("did"))
        .select(col("did"),
          array_distinct(transform(wordShingles(col("txt"), n),
            x => xxhash64(x))).as("sh")))
      .filter(size(col("sh")) > 0)
    val shA = prep(corpus)
    val shB = prep(reference)
    def index(sh: DataFrame): DataFrame =
      sh.select(col("did"), size(col("sh")).as("nsh"),
        explode(col("sh")).as("h"))
    val idxA = index(shA)
    val idxB = index(shB)
    // persisted (r14): BOTH prefix sides join this vocab-sized frame —
    // uncached, the union-of-both-explodes aggregate ran twice
    val dfCounts = persistTracked(
      idxA.select("h").unionAll(idxB.select("h"))
        .groupBy("h").agg(count(lit(1)).as("dfq")))
    def prefix(idx: DataFrame): DataFrame =
      idx.join(dfCounts, "h")
        .withColumn("rn", row_number().over(
          Window.partitionBy("did").orderBy(col("dfq"), col("h"))))
        .filter(col("rn") <= col("nsh") - ceil(col("nsh") * threshold) + 1)
        .select("did", "h", "nsh")
    val cand = prefix(idxA).as("a").join(prefix(idxB).as("b"),
        col("a.h") === col("b.h") &&
          col("a.nsh") >= col("b.nsh") * threshold &&
          col("b.nsh") >= col("a.nsh") * threshold)
      .select(col("a.did").as("corpus_id"), col("b.did").as("ref_id"))
      .distinct()
    cand
      .join(shA.select(col("did").as("corpus_id"), col("sh").as("sha")),
        "corpus_id")
      .join(shB.select(col("did").as("ref_id"), col("sh").as("shb")),
        "ref_id")
      .withColumn("ic", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", round(
        col("ic") / (size(col("sha")) + size(col("shb")) - col("ic")), 6))
      .filter(col("jaccard") >= threshold)
      .select("corpus_id", "ref_id", "jaccard")
  }

  /** Incremental near-dedup: near-dup pairs TOUCHING a crawl delta —
    * delta x base plus delta x delta, never base x base. This is the
    * maintenance mode of [[ngramJaccardPairs]] for a snapshot kept
    * current via [[snapshotMerge]]: the nightly delta is orders of
    * magnitude smaller than the corpus, and restricting one join side
    * to it means the prefix-filtered candidate join emits only pairs
    * with a delta member — the base x base quadratic work (already
    * settled in previous runs) is never re-done. The base is still
    * scanned once for shingling/document frequencies (the exactness
    * requirement: prefix order must be a shared total order over the
    * union — see [[crossNearDupPairs]]); at 100 TB that pass is
    * map-only over a cached/bucketed shingle projection.
    *
    * Output (id_a = delta doc, id_b = matched doc, jaccard, against ∈
    * {base, delta}). An UPDATED doc typically pairs with its own base
    * version (id_a = id_b, against = base) — that row is the "this
    * update is a near-dup of its predecessor" signal, not a bug. */
  def incrementalNearDupPairs(base: DataFrame, delta: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val vsBase = crossNearDupPairs(delta, base, idCol, textCol, n,
        threshold)
      .select(col("corpus_id").as("id_a"), col("ref_id").as("id_b"),
        col("jaccard"), lit("base").as("against"))
    val within = ngramJaccardPairs(delta, idCol, textCol, n, threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"),
        lit("delta").as("against"))
    vsBase.unionByName(within)
  }

  /** Corpus rows with NO near-duplicate in the reference corpus —
    * the keep-side wrapper over [[crossNearDupPairs]] (anti-join on
    * flagged ids; reference rows are never emitted). */
  def dedupAgainst(corpus: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      threshold: Double = 0.8): DataFrame =
    corpus.join(
      crossNearDupPairs(corpus, reference, idCol, textCol, n, threshold)
        .select(col("corpus_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** MinHash signature: each shingle is string-hashed ONCE (xxhash64),
    * then the k "permutations" are fixed-width long re-hashes
    * `xxhash64(j, h)` of that 64-bit value — k 16-byte hashes per shingle
    * instead of k full string hashes (and no ANSI-mode overflow, unlike a
    * multiply-add family). All k minima aggregate in ONE hash-aggregate
    * pass (k codegen'd min columns, no array-UDAF). Any fixed total order
    * works as the permutation order, so signed-long min is fine:
    * P(min_a == min_b) = Jaccard still holds. Returns (id, h0..h{k-1}). */
  /** Shingled frame (did, sh): raw text is spread across cores BEFORE
    * tokenization (small parquet arrives as one partition), then the
    * computed arrays are persisted.
    *
    * The persist is load-bearing, not a convenience: a bare projection
    * is substituted INTO downstream inferred filters — explode() makes
    * `InferFiltersFromGenerate` derive `size(sh) > 0`, and filter
    * pushdown rewrites it as `size(<full tokenize expr>) > 0` at the
    * SCAN, re-running the tokenizer on the single input partition
    * (measured: 7.3 s single-core vs 0.9 s distributed at sf0.1).
    * The cache boundary stops the substitution, keeps the did-hash
    * partitioning for downstream joins, and makes every consumer
    * (signature pass + both verification joins) read ONE tokenization.
    * Spark's cache manager dedupes the entry by plan identity across
    * calls, so repeated invocations reuse rather than grow the cache. */
  private def shingled(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = persistTracked(
    df.select(col(idCol).as("did"), col(textCol).as("txt"))
      .repartition(par(df), col("did"))
      .select(col("did"), wordShingles(col("txt"), n).as("sh")))

  private def minhashFromShingles(shH: DataFrame, k: Int): DataFrame = {
    val idx = shH
      .select(col("did"), explode(col("sh")).as("s"))
      .select(col("did"), xxhash64(col("s")).as("h"))
    val mins = (0 until k).map(j =>
      min(xxhash64(lit(j), col("h"))).as(s"h$j"))
    idx.groupBy("did").agg(mins.head, mins.tail: _*)
  }

  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64): DataFrame =
    minhashFromShingles(shingled(df, idCol, textCol, n), k)

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
    // ONE shingled frame feeds both the signature pass and the two
    // verification joins — the corpus is tokenized once, not twice
    val shH = shingled(df, idCol, textCol, n)
    val sig = minhashFromShingles(shH, k)
    val cand = minhashCandidates(sig, k, bands)
    cand
      .join(shH.select(col("did").as("id_a"), col("sh").as("sha")), "id_a")
      .join(shH.select(col("did").as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("ic", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", round(
        col("ic") / (size(col("sha")) + size(col("shb")) - col("ic")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Per-doc 64-bit SimHash signatures, computed after a did-keyed
    * repartition (small inputs arrive as one partition — see
    * ngramJaccardPairs). */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol).as("did"), col(textCol).as("txt"))
      .repartition(par(df), col("did"))
      .select(col("did"), simhash64(col("txt")).as("simhash"))

  /** SimHash near-dup pairs over the MD5-flavor signature
    * ([[graft.functions.SimHashMd5Expr]] — 64-char '0'/'1' bit string):
    * the ORACLE-CHECKED twin of [[simhashNearDupPairs]]. Same 4-band
    * pigeonhole (any pair within Hamming 3 shares one exact 16-bit
    * chunk), same exact verification — but every step (md5 per-token
    * bits, banding via substr, Hamming via chunk-XOR popcount) is
    * reproducible by an ANSI SQL engine, so the banded near-dup JOIN
    * SHAPE itself gets a DuckDB oracle row, not just the signature.
    * Production stays on the XXH64 flavor (~20x cheaper per token). */
  def simhashNearDupPairsMd5(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-band pigeonhole guarantees recall only to 3")
    val sig = df.select(col(idCol).as("did"), col(textCol).as("txt"))
      .repartition(par(df), col("did"))
      .select(col("did"), simhashMd5(col("txt")).as("sig"))
      .repartition(par(df), col("did"))
    val banded = sig.select(col("did"), col("sig"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            substring(col("sig"), b * 16 + 1, 16).as("chunk"))): _*))
          .as("bb"))
      .select(col("did"), col("sig"), col("bb.band"), col("bb.chunk"))
    // Hamming over the bit strings = sum of per-16-bit-chunk XOR
    // popcounts (conv base-2 -> long is exact at 16 bits)
    val ham = (0 until 4).map { b =>
      bit_count(
        conv(substring(col("a.sig"), b * 16 + 1, 16), 2, 10).cast("long")
          .bitwiseXOR(
            conv(substring(col("b.sig"), b * 16 + 1, 16), 2, 10)
              .cast("long")))
    }.reduce(_ + _)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.did") < col("b.did"))
      .select(col("a.did").as("id_a"), col("b.did").as("id_b"),
        ham.cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** SimHash near-dup candidates with Hamming distance <= maxDist,
    * banded into 4 x 16-bit chunks (any doc pair within Hamming 3 shares
    * at least one exact chunk — pigeonhole), verified exactly. */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-band pigeonhole guarantees recall only to 3")
    // the extra did-keyed exchange is reused by both sides of the
    // banded self-join, so signatures are computed once
    val sig = simhashSignatures(df, idCol, textCol)
      .repartition(par(df), col("did"))
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
        // long like the md5 flavor: a BIGINT-typed distance column on
        // both engines keeps the strictest type-aware hash gate green
        hamming64(col("a.simhash"), col("b.simhash")).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Corpus snapshot diff — the crawl-refresh bookkeeping pass:
    * classify every document id across two corpus versions as
    * `added` (only in current), `removed` (only in previous),
    * `changed` (same id, different content fingerprint), or
    * `unchanged`. One full-outer equi-join on the id over
    * (id, md5 fingerprint) projections — document text never rides
    * the shuffle, so the diff costs two fingerprint scans plus one
    * id-keyed exchange at any corpus size. */
  def snapshotDiff(current: DataFrame, previous: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // a NULL text must still read as "row present" — without the
    // sentinel its NULL fingerprint is indistinguishable from row
    // absence and a doc present in both snapshots reports added/removed
    val fp = coalesce(fingerprint(col(textCol)), lit("__null_text__"))
    val c = current.select(col(idCol).as("id"), fp.as("c_fp"))
    val p = previous.select(col(idCol).as("id"), fp.as("p_fp"))
    c.join(p, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("p_fp").isNull, "added")
          .when(col("c_fp").isNull, "removed")
          .when(col("c_fp") =!= col("p_fp"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** MERGE-apply for snapshot maintenance (the CDC counterpart of
    * [[snapshotDiff]]): fold a new crawl `updates` into `base`, update
    * rows whose id exists in both (new text wins), insert ids only in
    * `updates`, keep the rest — with the op each row took, so the
    * caller can route side-effects (re-embed changed docs, skip kept
    * ones). NULL text is fingerprint-sentineled like snapshotDiff so
    * "updated to NULL" is not mistaken for "kept".
    *
    * One full-outer hash join on id (AQE broadcasts when the delta is
    * small — the common nightly-crawl case); texts ride the join once,
    * no second pass.
    *
    * PRECONDITION: `updates` has at most one row per id — a duplicated
    * id matches the same base row twice and both copies land in the
    * merged snapshot. The streaming wrapper
    * ([[graft.streaming.StreamingOps.mergeBatch]]) enforces this with a
    * deterministic per-id collapse before calling here; batch callers
    * own the invariant themselves. */
  def snapshotMerge(base: DataFrame, updates: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val fp = coalesce(fingerprint(col(textCol)), lit("__null_text__"))
    val b = base.select(col(idCol).as("id"), col(textCol).as("b_txt"),
      fp.as("b_fp"))
    val u = updates.select(col(idCol).as("id"), col(textCol).as("u_txt"),
      fp.as("u_fp"))
    b.join(u, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("u_fp").isNotNull, col("u_txt")).otherwise(col("b_txt"))
          .as(textCol),
        when(col("b_fp").isNull, "inserted")
          .when(col("u_fp").isNull, "kept")
          .when(col("u_fp") =!= col("b_fp"), "updated")
          .otherwise("unchanged").as("op"))
  }

  /** Cross-document duplicated-passage stats — the detection half of
    * ExactSubstr dedup (Lee et al., "Deduplicating Training Data Makes
    * Language Models Better", §4.1: /root/reference has no analogue;
    * suffix-automaton substrings are approximated by fixed `k`-token
    * windows, the standard MapReduce-able relaxation). For each doc:
    * `n_windows` = its k-token window count, `dup_windows` = how many
    * of those windows (counting repeats) also occur in at least one
    * OTHER document. `dup_windows / n_windows` is the passage-level
    * contamination signal pipelines threshold on.
    *
    * Scale shape: every window rides as one row keyed by its 64-bit
    * xxhash (8 bytes, never the text); one hash-agg to per-doc window
    * counts (map-side combined), one window-function pass keyed by hash
    * for the cross-doc occurrence count, one hash-agg back to docs.
    * The total-window count comes free from `size(tokens)` on the
    * un-exploded side, so docs shorter than k tokens keep a (0, 0) row
    * without a second corpus scan. 64-bit window-hash collisions are
    * the accepted contract (as everywhere shingles ride as hashes). */
  def dupPassageStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, s"window size must be >= 1: $k")
    val base = persistTracked(
      df.select(col(idCol).as("did"), tokens(col(textCol)).as("t"))
        .repartition(par(df), col("did")))
    val wins = base.select(col("did"),
        explode(when(size(col("t")) >= k,
          transform(sequence(lit(1), size(col("t")) - (k - 1)),
            i => xxhash64(concat_ws(" ", slice(col("t"), i, lit(k))))))
          .otherwise(array().cast("array<bigint>"))).as("h"))
    val perDocWin = wins.groupBy("did", "h")
      .agg(count(lit(1)).as("c"))
    val nd = Window.partitionBy(col("h"))
    val dup = perDocWin
      .withColumn("ndocs", count(lit(1)).over(nd))
      .filter(col("ndocs") >= 2)
      .groupBy("did")
      .agg(sum("c").as("dupw"))
    base.select(col("did"),
        greatest(size(col("t")) - (k - 1), lit(0)).cast("long")
          .as("n_windows"))
      .join(dup, Seq("did"), "left")
      .select(col("did").as(idCol), col("n_windows"),
        coalesce(col("dupw"), lit(0L)).as("dup_windows"))
  }

  /** ExactSubstr-style duplicated-PASSAGE REMOVAL (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): every
    * token covered by a k-token window that appears in >= 2 DISTINCT
    * documents (the [[dupPassageStats]] dup rule) is struck out, and
    * each document is reassembled from its surviving tokens in order —
    * span-level dedup, where doc-level dedup keeps whole near-copies
    * and segment dedup only catches aligned fixed boundaries. Documents
    * shorter than k tokens pass through untouched; a fully-duplicated
    * document keeps an empty-string row (the caller decides whether
    * emptied docs survive). Null texts are dropped.
    *
    * Scale shape: window hashes ride as 8-byte xxhash64 rows (never
    * text) into ONE corpus-wide hash-agg for the distinct-doc counts;
    * the duplicated-hash set (typically tiny) comes back via an
    * equi-join to per-doc window starts; coverage is a per-doc RANGE
    * window over token positions (token p is covered iff a duplicated
    * window STARTS in [p-k+1, p]); reassembly is one ordered
    * aggregation per doc. Every exchange is a plain hash shuffle on
    * did or h — no self-join, no cartesian. 64-bit hash collisions are
    * the accepted shingle contract. Output: (idCol, clean_text,
    * n_tokens, n_removed). */
  def removeDupPassages(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, s"window size must be >= 1: $k")
    val base = persistTracked(
      df.filter(col(textCol).isNotNull)
        .select(col(idCol).as("did"), tokens(col(textCol)).as("t"))
        .repartition(par(df), col("did")))
    // (did, i, h): window starting at 1-based token position i
    val wins = persistTracked(base.select(col("did"),
      posexplode(when(size(col("t")) >= k,
        transform(sequence(lit(1), size(col("t")) - (k - 1)),
          i => xxhash64(concat_ws(" ", slice(col("t"), i, lit(k))))))
        .otherwise(array().cast("array<bigint>"))))
      .select(col("did"), (col("pos") + 1).as("i"), col("col").as("h")))
    val dupH = wins.groupBy("h")
      .agg(count_distinct(col("did")).as("ndocs"))
      .filter(col("ndocs") >= 2)
      .select("h")
    val dupStarts = wins.join(dupH, "h")
      .select(col("did"), col("i"), lit(1).as("ds"))
    // token long-form with the dup-start flag, then RANGE-frame
    // coverage: covered(p) = max ds over starts in [p - k + 1, p]
    val toks = base.select(col("did"),
        posexplode(col("t"))).select(col("did"),
        (col("pos") + 1).as("p"), col("col").as("tok"))
      .join(dupStarts.withColumnRenamed("i", "p"), Seq("did", "p"), "left")
    val cov = Window.partitionBy("did").orderBy(col("p"))
      .rangeBetween(-(k - 1L), 0L)
    val kept = toks
      .withColumn("covered",
        coalesce(max(col("ds")).over(cov), lit(0)))
    kept.groupBy("did")
      .agg(
        concat_ws(" ", array_sort(collect_list(when(col("covered") === 0,
          struct(col("p"), col("tok"))))).getField("tok")).as("clean_text"),
        count(lit(1)).as("n_tokens"),
        sum(col("covered")).cast("long").as("n_removed"))
      .select(col("did").as(idCol), col("clean_text"), col("n_tokens"),
        col("n_removed"))
  }

  /** C4/RefinedWeb-style SEGMENT-level exact dedup. The corpus is cut
    * into fixed `segTokens`-token segments (the deterministic stand-in
    * for line/paragraph boundaries — any boundary function slots in),
    * every segment duplicated ANYWHERE in the corpus keeps only its
    * first occurrence (min (id, seg_no)), and each document is
    * reassembled from its surviving segments in order, single-space
    * joined. Documents whose every segment loses disappear, like C4's
    * emptied pages. Null texts are dropped.
    *
    * Scale shape: segments shuffle ONCE keyed by md5(segment) for the
    * window-min keeper election (no self-join, and the full corpus
    * never rides a shuffle as one blob — segments do), then once by id
    * for reassembly; both are plain hash exchanges. A pathologically
    * hot segment (the empty segment, boilerplate) concentrates its
    * occurrences on one reducer but carries only (id, seg_no) pairs
    * per row, not text.
    */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 10): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1: $segTokens")
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("did"), tokens(col(textCol)).as("t"))
    val segs = base
      .select(col("did"),
        explode(sequence(lit(0),
          (ceil(size(col("t")) / lit(segTokens.toDouble)) - 1).cast("int")))
          .as("seg_no"),
        col("t"))
      .select(col("did"), col("seg_no"),
        array_join(
          slice(col("t"), col("seg_no") * segTokens + 1, lit(segTokens)),
          " ").as("seg"))
    val w = Window.partitionBy(md5(col("seg")))
    segs
      .withColumn("keeper", min(struct(col("did"), col("seg_no"))).over(w))
      .filter(col("keeper.did") === col("did") &&
        col("keeper.seg_no") === col("seg_no"))
      .groupBy("did")
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("seg_no"), col("seg")))),
          s => s("seg")), " ").as("text_dedup"))
      .select(col("did").as(idCol), col("text_dedup"))
  }

  /** RefinedWeb-style PARAGRAPH-level exact dedup — [[segmentDedup]]
    * with NATURAL boundaries instead of fixed token windows: the text
    * is split on `delim` (literal, default blank line), each
    * trimmed non-empty paragraph duplicated anywhere in the corpus
    * keeps only its first occurrence (min (id, para_no)), and each
    * document is reassembled from its surviving paragraphs in order,
    * `delim`-joined. Documents whose every paragraph loses disappear
    * (C4's emptied pages). This is the formulation that kills
    * boilerplate blocks (nav bars, subscribe banners, license
    * footers) that token-window segmentation straddles.
    *
    * Scale shape identical to segmentDedup: paragraphs shuffle ONCE
    * keyed by md5(paragraph) for the window-min keeper election, then
    * once by id for reassembly; a pathologically hot paragraph
    * (the boilerplate this exists to remove) concentrates only
    * (id, para_no) pairs on its reducer, not text. */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
      delim: String = "\n\n"): DataFrame = {
    require(delim.nonEmpty, "paragraphDedup: empty delimiter")
    val paras = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("did"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(delim))).as(Seq("p_no", "p")))
      .withColumn("p", trim(col("p")))
      .filter(length(col("p")) > 0)
    val w = Window.partitionBy(md5(col("p")))
    paras
      .withColumn("keeper", min(struct(col("did"), col("p_no"))).over(w))
      .filter(col("keeper.did") === col("did") &&
        col("keeper.p_no") === col("p_no"))
      .groupBy("did")
      .agg(array_join(
          transform(sort_array(collect_list(struct(col("p_no"), col("p")))),
            s => s("p")), delim).as("text_dedup"),
        count(lit(1)).as("n_kept"))
      .select(col("did").as(idCol), col("text_dedup"), col("n_kept"))
  }

  /** MinHash Jaccard ESTIMATE next to the exact score, md5-flavored so
    * the ESTIMATOR ITSELF is cross-engine-replayable: permutation `i`'s
    * signature is `min(md5(i || '|' || shingle))` (lexicographic min on
    * lowercase hex orders identically on both engines), and the
    * estimate is the fraction of the `k` signatures two docs share —
    * the cross-engine pin that the production xxhash MinHash family
    * (banded `minhashNearDupPairs`) approximates the same quantity.
    *
    * Pairs are the exact-Jaccard candidates at `threshold`, so the
    * output is (pair, exact, estimate) — an estimator-error report.
    * Signature build is one explode (shingles x k) with a map-side
    * combined min; the pair join fans each pair out k-wide, both
    * bounded. */
  def minhashEstimatePairsMd5(df: DataFrame, idCol: String,
      textCol: String, n: Int = 3, k: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(k >= 1, s"bad k: $k")
    val pairs = ngramJaccardPairs(df, idCol, textCol, n, threshold)
    val mh = persistTracked(
      df.select(col(idCol).as("did"),
          explode(graft.functions.TextFunctions
            .wordShingles(col(textCol), n)).as("s"))
        .select(col("did"),
          explode(sequence(lit(0), lit(k - 1))).as("i"), col("s"))
        .select(col("did"), col("i"),
          md5(concat_ws("|", col("i"), col("s"))).as("hh"))
        .groupBy("did", "i").agg(min("hh").as("h")))
    val a = mh.select(col("did").as("id_a"), col("i"), col("h").as("ha"))
    val b = mh.select(col("did").as("id_b"), col("i"), col("h").as("hb"))
    pairs.join(a, "id_a").join(b, Seq("id_b", "i"))
      .groupBy("id_a", "id_b", "jaccard")
      .agg(round(
        sum(when(col("ha") === col("hb"), 1).otherwise(0)) /
          lit(k.toDouble), 6).as("est"))
  }

  /** CDC changelog compaction: collapse a day of per-key churn
    * (`I`/`U`/`D` ops, `seqCol`-ordered — the log offset) to ONE net
    * change per key, which is what a lakehouse MERGE wants to apply
    * instead of replaying every intermediate version. Net-op truth
    * table against the base snapshot (f = first op, l = last op):
    * `f=I, l=D -> N` (born and died inside the log — a no-op the
    * caller can still count as churn), `f=I, l≠D -> I`,
    * `f∈{U,D}, l=D -> D`, `f∈{U,D}, l≠D -> U` (covers delete-then-
    * reinsert: net is an update). Payload is the LAST change's value.
    *
    * One hash aggregate on the key — `min_by`/`max_by` over the unique
    * sequence number, no windows, no sort; at 100 TB the output is
    * keys-sized however long the log is. */
  def changelogCompact(log: DataFrame, keyCol: String, seqCol: String,
      opCol: String, valCol: String): DataFrame = {
    val net = when(col("last_op") === "D",
        when(col("first_op") === "I", lit("N")).otherwise(lit("D")))
      .otherwise(
        when(col("first_op") === "I", lit("I")).otherwise(lit("U")))
    log.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_changes"),
        min_by(col(opCol), col(seqCol)).as("first_op"),
        max_by(col(opCol), col(seqCol)).as("last_op"),
        max_by(col(valCol), col(seqCol)).as("last_val"),
        min(col(seqCol)).as("first_seq"),
        max(col(seqCol)).as("last_seq"))
      .withColumn("net_op", net)
  }

  /** Memorization-risk triage — the Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better") / Carlini et al.
    * 2023 (extraction scales with duplication) signal composite:
    * sequences a model is most likely to regurgitate are the ones
    * that are (a) duplicated across the corpus and (b) internally
    * repetitive (low-entropy templates memorize fastest). Per doc:
    * exact-duplicate multiplicity (corpus-wide, via the md5
    * fingerprint group), intra-doc token repetition, and
    * `risk = ln(dup_count) * (1 + rep_ratio)` — zero for unique
    * docs, growing with both signals; `flagged` marks the
    * dedup-before-training candidates (duplicated AND above
    * `riskFloor`).
    *
    * Scale shape: ONE hash aggregate on the 32-char md5 (map-side
    * combine; text never shuffles) broadcast-or-shuffle-joined back
    * by fingerprint; the repetition signal is map-only. Exactly the
    * [[exactGroups]] plan plus a projection. */
  def memorizationRisk(df: DataFrame, idCol: String, textCol: String,
      riskFloor: Double = 0.7): DataFrame = {
    val counts = df.select(fingerprint(col(textCol)).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("dup_count"))
    val risk = log(col("dup_count").cast("double")) *
      (lit(1.0) + col("rep_ratio"))
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"),
        repetitionRatio(col(textCol)).as("rep_ratio"))
      .join(counts, Seq("fp"))
      .select(col(idCol), col("dup_count"), col("rep_ratio"),
        round(risk, 6).as("risk"))
      .withColumn("flagged",
        col("dup_count") >= 2 && col("risk") >= riskFloor)
  }

  /** Normalization-merge audit — dedup QA for the [[fingerprint]]
    * convention itself: the fingerprint is md5 of the
    * whitespace-normalized lowercased text, so a fingerprint group
    * holding MORE THAN ONE distinct raw text means the normalization
    * (not byte equality) merged them. A corpus where most dup groups
    * are normalization merges needs a human look at the
    * normalization rules before the dedup pass deletes data. One
    * two-level exact aggregate (md5 keys only — text never
    * shuffles); output is one summary row. */
  def normalizationMergeAudit(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val perFp = df.select(fingerprint(col(textCol)).as("fp"),
        md5(col(textCol)).as("raw"))
      .groupBy("fp")
      .agg(count(lit(1)).as("__n"),
        count_distinct(col("raw")).as("__vars"))
    perFp.agg(count(lit(1)).as("n_groups"),
        sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
        sum(when(col("__vars") > 1, 1L).otherwise(0L))
          .as("n_norm_merged"),
        max("__n").as("max_group"),
        max("__vars").as("max_variants"))
  }
}
