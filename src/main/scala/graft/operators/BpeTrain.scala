package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE merge-table TRAINING (vocabulary induction) — the
  * byte-level GPT-2 algorithm (Radford et al. 2019; Sennrich et al.
  * 2016) in its scale-correct map-reduce formulation:
  *
  *  1. ONE pass over the corpus builds the pre-token FREQUENCY table
  *     (GPT-2 regex pre-tokens -> byte-symbol arrays, groupBy count).
  *     This is the only corpus-sized job.
  *  2. Every merge round then runs on the vocab-sized table only:
  *     explode adjacent symbol pairs weighted by pre-token frequency,
  *     one partial-aggregated shuffle to count them, take the argmax,
  *     and apply the merge with a narrow map. At 100 TB the corpus has
  *     ~1e11 tokens but ~1e7 distinct pre-tokens — rounds cost
  *     vocab-sized shuffles, NOT corpus passes, which is why every real
  *     BPE trainer (fastBPE, HF tokenizers, SentencePiece) counts words
  *     first. A 50k-merge production run batches rounds the same way;
  *     the round loop itself is embarrassingly sequential by definition
  *     (merge r+1's counts depend on merge r).
  *
  * DETERMINISM (the cross-engine contract): best pair = highest summed
  * frequency, ties broken by (left, right) ascending in UTF-8 byte
  * order — so the learned table is a pure function of the corpus
  * multiset, independent of partitioning. Merge application is
  * non-overlapping left-to-right (the reference GPT-2 convention), so
  * "aaa" under merge (a,a) becomes [aa, a].
  *
  * The reference repo has no tokenizer at all (SURVEY §2 — counts-only
  * engine); this extends the [[graft.functions.Bpe]] ENCODER (which
  * consumes a committed merge table) with the operator that LEARNS one.
  */
object BpeTrain {

  /** Pre-token frequency tables at or under this row count run the
    * merge loop ON THE DRIVER over the collected table (the tier every
    * real BPE trainer uses — fastBPE / HF tokenizers / SentencePiece
    * all count words distributed-or-streamed and train the merges
    * locally, because each round is vocab-sized work with a strictly
    * sequential dependency). 4M rows x ~50 B of symbols ≈ 200 MB —
    * well inside the 8 GB driver. Past the guard the distributed
    * round loop below runs unchanged (the 100 TB fallback; at ~1e7+
    * distinct pre-tokens the collect would be the driver risk the
    * guard exists to prevent). Same discipline as MBoot's documented
    * <= 20M-entry driver tier. Both tiers are bit-identical: same
    * counts, same (cnt desc, l asc, r asc) argmax with the tie-break
    * compared in UTF-8 byte order — exactly Spark's UTF8String
    * binary ordering (BpeTrainSpec pins tier equality). */
  val MaxDriverVocab: Long = 4L * 1000 * 1000

  /** Companion BYTE guard for the driver tier (r15, advisor note):
    * estimated retained driver bytes of the collected symbol table.
    * 512 MiB sits far under the gate JVMs' 4 GiB heaps while covering
    * any honest vocabulary (4M rows x ~50 B is ~200 MB); pre-token
    * pathologies that pack more symbol payload under the row cap run
    * the distributed loop instead. */
  val MaxDriverVocabBytes: Long = 512L << 20

  /** Learned merge table after `nMerges` rounds (fewer if the corpus
    * runs dry — no adjacent pair appears at least `minCount` times).
    * Returns the ordered merges; rank = position. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, maxDriverVocab: Long = MaxDriverVocab)
      : Seq[(String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1: $nMerges")
    val spark = df.sparkSession
    import spark.implicits._

    // corpus pass: pre-token frequency table, then symbol arrays.
    // Distinct pre-tokens stay distinct under merging (the symbol
    // concatenation IS the byte-char string), so no later regroup.
    val words0: Dataset[(Seq[String], Long)] = df
      .select(col(textCol).as("t")).na.drop
      .as[String]
      .flatMap(t => graft.functions.Bpe.pretokens(t))
      .groupBy("value").agg(count(lit(1)).as("freq"))
      .as[(String, Long)]
      .map { case (w, f) => (graft.functions.Bpe.byteSyms(w).toSeq, f) }
      // the frequency table is vocabulary-sized (orders of magnitude
      // under the corpus); narrow the partition count so each of the
      // ~nMerges sequential rounds schedules a handful of tasks, not a
      // full corpus-width wave (no shuffle — coalesce)
      .coalesce(math.min(16,
        math.max(2, df.sparkSession.sparkContext.defaultParallelism / 4)))

    // Round cost discipline: each round needs exactly ONE Spark job —
    // the pair-count argmax. Merge application chains LAZILY on top of
    // the last materialized table (narrow vocab-sized maps are cheaper
    // to recompute than a persist+count job per round); every
    // `cutEvery` rounds the chain is materialized through an RDD
    // re-wrap, which both bounds recompute depth and cuts the logical
    // plan (the Graph.scala CC-loop discipline — chained plans give the
    // analyzer O(rounds^2) work otherwise).
    val cutEvery = 8
    var base = words0.persist(StorageLevel.MEMORY_AND_DISK)
    val nWords = base.count()

    // driver tier: the round loop is inherently sequential and each
    // round's input is the vocab-sized table — 48 rounds as 48 Spark
    // jobs is pure scheduling overhead when that table fits in hand
    // (measured at sf0.1: 8.2 s distributed -> the corpus pass's
    // ~0.5 s + microseconds of local loop). One collect, guarded.
    //
    // r15 (advisor note): the row guard alone assumed ~50 B of symbols
    // per pre-token — a corpus of pathologically long pre-tokens
    // (unsegmented scripts, binary-ish text the GPT-2 regex cannot
    // split) could blow the driver heap while staying under the row
    // cap. Estimate RETAINED driver bytes over the same cached table
    // (one cheap vocab-sized job: per word ~64 B of tuple/array
    // overhead + 48 B per symbol ref+header + 2 B per char) and take
    // the driver tier only when BOTH guards pass; over-budget corpora
    // run the distributed loop below, which never collects.
    if (nWords <= maxDriverVocab) {
      val estBytes = base
        .map { case (syms, _) =>
          64L + syms.foldLeft(0L)((a, s) => a + 48L + 2L * s.length)
        }
        .toDF("b").agg(coalesce(sum("b"), lit(0L))).first().getLong(0)
      if (estBytes <= MaxDriverVocabBytes) {
        val words = base.collect()
        base.unpersist()
        return trainLocal(words, nMerges, minCount)
      }
      System.err.println(
        s"[graft.bpe] driver tier refused: estimated retained " +
          s"$estBytes B over MaxDriverVocabBytes=$MaxDriverVocabBytes " +
          s"(rows $nWords under $maxDriverVocab) — distributed loop")
    }

    var cur = base
    var sinceCut = 0
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var dry = false
    while (round < nMerges && !dry) {
      val top = cur.toDF("syms", "freq")
        .where(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"),
          col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) dry = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        cur = cur.map { case (syms, f) => (applyMerge(syms, l, r), f) }
        sinceCut += 1
        round += 1
        if (sinceCut == cutEvery && round < nMerges) {
          val cut = spark.createDataset(cur.rdd)
            .persist(StorageLevel.MEMORY_AND_DISK)
          cut.count()
          base.unpersist()
          base = cut
          cur = cut
          sinceCut = 0
        }
      }
    }
    base.unpersist()
    merges.result()
  }

  /** Local merge loop over the collected frequency table — the
    * driver tier of [[train]]. Identical math to the distributed
    * rounds: pair counts are freq-weighted adjacent-pair sums, the
    * argmax is (cnt desc, l asc, r asc) with strings compared as
    * unsigned UTF-8 bytes (Spark's binary string ordering), merges
    * apply non-overlapping left-to-right. */
  private[operators] def trainLocal(words: Array[(Seq[String], Long)],
      nMerges: Int, minCount: Long): Seq[(String, String)] = {
    val syms = words.map(_._1)
    val freqs = words.map(_._2)
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var dry = words.isEmpty
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    while (round < nMerges && !dry) {
      counts.clear()
      var i = 0
      while (i < syms.length) {
        val s = syms(i); val f = freqs(i)
        var j = 0
        while (j < s.length - 1) {
          val k = (s(j), s(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          j += 1
        }
        i += 1
      }
      var bestL: String = null; var bestR: String = null
      var bestC = Long.MinValue
      counts.foreach { case ((l, r), c) =>
        if (c > bestC || (c == bestC &&
            (utf8Less(l, bestL) ||
              (l == bestL && utf8Less(r, bestR))))) {
          bestC = c; bestL = l; bestR = r
        }
      }
      if (bestL == null || bestC < minCount) dry = true
      else {
        merges += ((bestL, bestR))
        var k = 0
        while (k < syms.length) {
          // cheap containment pre-check: applyMerge allocates; most
          // words don't contain the merged pair
          val s = syms(k)
          var j = 0; var hit = false
          while (!hit && j < s.length - 1) {
            if (s(j) == bestL && s(j + 1) == bestR) hit = true
            j += 1
          }
          if (hit) syms(k) = applyMerge(s, bestL, bestR)
          k += 1
        }
        round += 1
      }
    }
    merges.result()
  }

  /** Unsigned UTF-8 byte-order `<` — Spark's UTF8String binary
    * comparison, which the distributed tier's `asc("l"), asc("r")`
    * tie-break sorts by. (Java String.compareTo sorts UTF-16 code
    * units, which diverges above the BMP — the byte walk never does.) */
  private[operators] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** (rank, lsym, rsym) frame of [[train]] — the driver-query surface. */
  def trainDF(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, maxDriverVocab: Long = MaxDriverVocab)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, nMerges, minCount, maxDriverVocab).zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "lsym", "rsym")
  }

  /** Non-overlapping left-to-right merge of every (l, r) occurrence. */
  private[operators] def applyMerge(syms: Seq[String], l: String,
      r: String): Seq[String] = {
    val n = syms.length
    if (n < 2) return syms
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < n) {
      if (i < n - 1 && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }
}
