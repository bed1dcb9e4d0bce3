package graft.did

import org.apache.spark.sql.SparkSession

/** Narrows `spark.sql.shuffle.partitions` for a K-row stat region and
  * guarantees restoration on EVERY exit. Construction applies the
  * narrow value; `restore()` is idempotent, so fit paths restore early
  * on success (ahead of the trailing rowid-level shuffle, which needs
  * data-sized partitioning) while the surrounding `try/finally` covers
  * exceptional exits — without it a mid-fit failure left the session
  * pinned at the narrow width, contained only by the per-fit session
  * clone being discarded. */
private[did] final class ShuffleNarrow(spark: SparkSession, n: Int) {
  private val saved = spark.conf.get("spark.sql.shuffle.partitions")
  spark.conf.set("spark.sql.shuffle.partitions", n.toString)
  private var restored = false

  def restore(): Unit = if (!restored) {
    restored = true
    spark.conf.set("spark.sql.shuffle.partitions", saved)
  }
}
