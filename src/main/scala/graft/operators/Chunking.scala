package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into fixed-size token
  * windows with overlap — the fan-out step that turns a curated corpus
  * into training sequences.
  *
  * Chunk `i` covers tokens `[i*stride, i*stride + size)` with
  * `stride = size - overlap`, so consecutive chunks share `overlap`
  * tokens; the final chunk may be shorter, and a document never emits a
  * chunk fully contained in the previous one
  * (`nChunks = max(1, ceil((n - overlap) / stride))`).
  *
  * Shape at 100 TB: tokenize once (persisted via [[TrackedCaches]] — the
  * cache boundary keeps `InferFiltersFromGenerate` + pushdown from
  * re-running the tokenizer inside the parquet scan), then a map-only
  * explode. No shuffle at all: chunks inherit the document's partition.
  */
object Chunking {

  /** One row per (doc, chunk): (idCol, chunk_no, n_tokens, chunk_text).
    * Tokens are whitespace-split (the engine's token convention, see
    * TextFunctions); empty documents emit nothing. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int = 512, overlap: Int = 64): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size: size=$size overlap=$overlap")
    val stride = size - overlap
    val par = df.sparkSession.sparkContext.defaultParallelism
    // repartition BEFORE tokenizing (small parquet arrives as one
    // partition), persist the token arrays (pushdown boundary)
    val toks = TrackedCaches.persist(
      df.filter(length(trim(col(textCol))) > 0)
        .select(col(idCol), col(textCol).as("txt"))
        .repartition(par, col(idCol))
        .select(col(idCol), split(trim(col("txt")), "\\s+").as("t")))
    toks
      .withColumn("n",
        org.apache.spark.sql.functions.size(col("t"))) // param shadows it
      .withColumn("nc", greatest(lit(1),
        ceil((col("n") - lit(overlap)).cast("double") / stride).cast("int")))
      .select(col(idCol), col("t"), col("n"),
        explode(sequence(lit(0), col("nc") - 1)).as("chunk_no"))
      .select(col(idCol), col("chunk_no"),
        least(lit(size), col("n") - col("chunk_no") * stride)
          .as("n_tokens"),
        array_join(
          slice(col("t"), col("chunk_no") * stride + 1, lit(size)), " ")
          .as("chunk_text"))
  }

  /** T5-style span-corruption PREP stats: a deterministic md5 coin
    * (`hash(doc '#' position) % 100 < maskPct`) marks tokens for
    * masking, maximal masked runs become sentinel spans, and the
    * output reports what the batch builder needs to size
    * encoder/decoder sequences BEFORE materializing them:
    * `input_len = n_tokens - n_masked + n_spans` (unmasked tokens +
    * one sentinel per span) and `target_len = n_masked + n_spans`
    * (masked tokens + sentinels). Seeded-randomness convention: the
    * md5 coin is a pure function of (id, position), so every engine —
    * and every re-run — draws the same spans.
    *
    * Map-only higher-order array math riding the scan; no shuffle. */
  def spanCorruptionStats(df: DataFrame, idCol: String, textCol: String,
      maskPct: Int = 15): DataFrame = {
    require(maskPct >= 1 && maskPct <= 99, s"bad maskPct: $maskPct")
    val t = graft.functions.TextFunctions.cleanTokens(col(textCol))
    val n = size(t)
    // 1-based positions; 32 bits of md5 as the coin
    val m = transform(sequence(lit(1), n),
      i => (conv(substring(md5(concat(col(idCol).cast("string"),
        lit("#"), i.cast("string"))), 1, 8), 16, 10).cast("long") %
        100) < maskPct)
    val nMasked = size(filter(m, x => x))
    // a span starts where the mask is on and its predecessor is off:
    // zip the mask against itself shifted right by one (false-seeded)
    val prev = concat(array(lit(false)), slice(m, lit(1), n - 1))
    val nSpans = size(filter(zip_with(m, prev, (cur, pv) => cur && !pv),
      x => x))
    df.select(col(idCol),
        when(n >= 1, n).otherwise(0).cast("long").as("n_tokens"),
        when(n >= 1, nMasked).otherwise(0).cast("long").as("n_masked"),
        when(n >= 1, nSpans).otherwise(0).cast("long").as("n_spans"))
      .withColumn("input_len",
        col("n_tokens") - col("n_masked") + col("n_spans"))
      .withColumn("target_len", col("n_masked") + col("n_spans"))
  }

  /** Concat-and-cut sequence packing — the step after chunking in a
    * pretraining pipeline: lay the chunks end to end in a deterministic
    * order and cut every `maxTokens`, assigning each chunk the sequence
    * its FIRST token lands in (`seq_id`) and its offset inside that
    * sequence (`seq_offset`; a chunk whose tokens overrun the cut
    * continues into the next sequence, the standard GPT-style packing).
    *
    * Scale shape: a single global concatenation would serialize on one
    * ordered partition, so the stream is first split into `nBuckets`
    * md5-derived hash buckets and packed independently per bucket —
    * one shuffle, then a per-bucket window cumulative sum; `seq_id`
    * namespaces the bucket. Order within a bucket is the md5 hex of
    * the chunk key: stable across engines, partitionings, and reruns
    * (and the DuckDB oracle replays it exactly — no RNG, no
    * row_number over ties).
    *
    * Each bucket's cumulative sum runs on ONE reducer, so bucket count
    * — not corpus size — bounds the packing stage. `nBuckets = 0` (the
    * default) derives the count from a one-pass token total against
    * `maxBucketTokens` (floored at cluster parallelism), the same
    * enforced-guard shape as `Similarity.cosineNearDupPairs`. The
    * determinism contract is per bucket COUNT: auto mode's floor makes
    * the derived count (hence seq_id/seq_offset values) depend on
    * cluster parallelism — pass an explicit `nBuckets` when the layout
    * must reproduce across environments, not just across reruns and
    * partitionings within one. */
  def packSequences(chunks: DataFrame, idCol: String, chunkNoCol: String,
      nTokensCol: String, maxTokens: Int, nBuckets: Int = 0,
      salt: String = "", maxBucketTokens: Long = 1L << 30): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    require(nBuckets >= 0, s"nBuckets must be >= 0 (0 = auto): $nBuckets")
    require(maxBucketTokens >= 1,
      s"maxBucketTokens must be >= 1: $maxBucketTokens")
    val derived =
      if (nBuckets > 0) nBuckets.toLong
      else {
        // one cheap single-column agg (the shuffle + window that follow
        // dwarf it): total token mass / per-reducer budget, floored at
        // parallelism so small corpora still spread across the cluster
        val total = chunks.agg(sum(col(nTokensCol).cast("long")))
          .first() match {
            case r if r.isNullAt(0) => 0L
            case r                  => r.getLong(0)
          }
        val forMem = math.ceil(total.toDouble / maxBucketTokens).toLong
        val forPar =
          chunks.sparkSession.sparkContext.defaultParallelism.toLong
        math.max(1L, math.max(forMem, forPar))
      }
    // the seq_id namespace is bucket << 40: 23 bits of bucket headroom
    require(derived < (1L << 23),
      s"nBuckets=$derived overflows the bucket<<40 seq_id namespace " +
        s"(max ${(1L << 23) - 1}) — " +
        (if (nBuckets > 0) "lower nBuckets" else "raise maxBucketTokens"))
    val blks = derived.toInt
    val hkey = md5(concat(col(idCol).cast("string"), lit("#"),
      col(chunkNoCol).cast("string"), lit(salt)))
    val w = Window.partitionBy("bucket").orderBy("hkey")
    chunks
      .withColumn("hkey", hkey)
      // 8 hex chars = 32 hash bits: a 4-char key would silently cap the
      // effective bucket count at 65536, under the ~100k buckets a
      // 100 TB corpus needs at the default budget
      .withColumn("bucket",
        (conv(substring(col("hkey"), 1, 8), 16, 10).cast("long")
          % blks).cast("int"))
      .withColumn("start_tok",
        sum(col(nTokensCol)).over(w) - col(nTokensCol))
      // seq_id = bucket << 40 | seq-within-bucket: 2^40 sequences per
      // bucket (~4e14 tokens at maxTokens=512) before collision, vs a
      // decimal-billion namespace that overflows at corpus scale
      .select(col(idCol), col(chunkNoCol), col(nTokensCol), col("bucket"),
        (col("bucket").cast("long") * (1L << 40) +
          floor(col("start_tok") / maxTokens)).as("seq_id"),
        (col("start_tok") % maxTokens).cast("int").as("seq_offset"))
  }

  /** KV-cache prefix-sharing analytics — the serving-side planner for
    * prefix caching (vLLM/SGLang automatic prefix cache, hosted-API
    * prompt caching): prompts that share their
    * first L tokens reuse one cached prefix, so per candidate prefix
    * length this measures how many cache groups exist and how many
    * tokens sharing would save (`(group size - 1) * prefix length`
    * per group — the first member pays, the rest hit).
    *
    * A prompt shorter than L keys on its whole token list (two short
    * prompts share only when IDENTICAL — exactly the cache's
    * behavior). Shape: the token array is built once, the bounded
    * prefix-length list explodes it |lens|-fold in the MAP stage
    * only; grouping keys are md5 digests of the prefix (32-char
    * shuffle rows, never prompt text), two hash aggregates with
    * partials. Output per length: prompts, distinct groups, saved
    * tokens, and the savings ratio against total prompt tokens. */
  def prefixShareStats(df: DataFrame, idCol: String, textCol: String,
      prefixLens: Seq[Int] = Seq(4, 8, 16)): DataFrame = {
    require(prefixLens.nonEmpty && prefixLens.size <= 16 &&
      prefixLens.forall(l => l >= 1 && l <= 4096),
      "prefixLens must be a small literal list of positive lengths")
    val toks = graft.functions.TextFunctions.cleanTokens(col(textCol))
    val base = df.select(col(idCol), toks.as("__t"))
      .select(col(idCol), col("__t"),
        explode(array(prefixLens.map(lit): _*)).as("prefix_len"))
      .select(col("prefix_len"),
        least(size(col("__t")).cast("long"), col("prefix_len").cast("long"))
          .as("__plen"),
        size(col("__t")).cast("long").as("__ntok"),
        md5(concat_ws(" ", slice(col("__t"), lit(1), col("prefix_len"))))
          .as("__key"))
    val groups = base.groupBy("prefix_len", "__key")
      .agg(count(lit(1)).as("__cnt"), min("__plen").as("__plen"),
        sum("__ntok").as("__gtok"))
    groups.groupBy("prefix_len")
      .agg(sum("__cnt").as("n_prompts"),
        count(lit(1)).as("n_groups"),
        sum((col("__cnt") - 1L) * col("__plen")).as("saved_tokens"),
        sum("__gtok").as("total_tokens"))
      .select(col("prefix_len"), col("n_prompts"), col("n_groups"),
        col("saved_tokens"),
        round(when(col("total_tokens") > 0,
          col("saved_tokens").cast("double") / col("total_tokens"))
          .otherwise(0.0), 6).as("save_ratio"))
  }

  /** Fill-in-the-middle split (Bavarian et al. 2022, the FIM
    * training transform): each document splits deterministically into
    * prefix / middle / suffix by CHARACTER position — the middle
    * spans [40%, 60%) (integer arithmetic: start = floor(2*len/5),
    * length = floor(len/5)), so the split is a pure function of the
    * text and replays exactly. Emits the three span lengths plus
    * their md5s (the hash, not the span, crosses the wire — the
    * downstream pack step re-derives spans from the source column).
    * Map-only, codegen'd, zero shuffle. */
  def fimSplit(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    val len = length(t)
    val midStart = floor(len * 2 / lit(5.0)).cast("int")
    val midLen = floor(len / lit(5.0)).cast("int")
    df.filter(t.isNotNull)
      .select(col(idCol), len.cast("long").as("n_chars"),
        substr(t, lit(1), midStart).as("__p"),
        substr(t, midStart + 1, midLen).as("__m"),
        substr(t, midStart + midLen + 1, len).as("__s"))
      .select(col(idCol), col("n_chars"),
        length(col("__p")).cast("long").as("prefix_len"),
        length(col("__m")).cast("long").as("middle_len"),
        length(col("__s")).cast("long").as("suffix_len"),
        md5(col("__p")).as("prefix_md5"),
        md5(col("__m")).as("middle_md5"),
        md5(col("__s")).as("suffix_md5"))
  }
}
