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

  /** Learned merge table after `nMerges` rounds (fewer if the corpus
    * runs dry — no adjacent pair appears at least `minCount` times).
    * Returns the ordered merges; rank = position. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
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
    base.count()
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

  /** (rank, lsym, rsym) frame of [[train]] — the driver-query surface. */
  def trainDF(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, nMerges, minCount).zipWithIndex
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
