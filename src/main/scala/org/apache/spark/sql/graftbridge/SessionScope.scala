package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic

/** Minimal bridge to two `private[sql]` Spark APIs the engine needs for
  * CONF ISOLATION: the driver-orchestrated fit (AttGt.fit) runs dozens
  * of K-row jobs for which AQE only adds a planning round per job, and
  * right-sizes shuffle partitions per phase — but mutating the caller's
  * session conf is a race for any concurrent query on the same session.
  * The fix is to run the fit on a full session clone (own SQLConf,
  * shared SparkContext, shared cache manager) with the input frame
  * rebound onto the clone. (Preprocess.run needs no scoping — it
  * mutates no conf; see its scaladoc.)
  *
  * Placed under `org.apache.spark.sql` solely because `cloneSession` and
  * `Dataset.ofRows` are `private[sql]`; both are stable internals used
  * the same way by Spark's own ML pipelines (`Dataset.ofRows`) and
  * structured-streaming engine (`cloneSession` per micro-batch run).
  */
object SessionScope {

  /** A runtime-state clone of `s`: copies the current SQL conf, temp
    * views and UDFs; shares the SparkContext and cache manager. Unlike
    * `newSession()`, runtime-set confs (shuffle partitions, legacy
    * parquet flags, ...) carry over, so query semantics are identical. */
  def cloned(s: SparkSession): SparkSession =
    s.asInstanceOf[classic.SparkSession].cloneSession()

  /** `df` rebound onto session `to` — same logical plan, so persisted
    * data keeps being served from the shared cache manager (lookup is by
    * canonicalized plan, session-independent). */
  def rebind(df: DataFrame, to: SparkSession): DataFrame =
    classic.Dataset.ofRows(to.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[_]].queryExecution.logical)

  /** The session's UUID — unique per session instance and NEVER reused,
    * unlike `System.identityHashCode`, which a later session can be
    * assigned after the original is GC'd (a session-keyed cache would
    * then serve frames bound to a stopped context). */
  def uuid(s: SparkSession): String =
    s.asInstanceOf[classic.SparkSession].sessionUUID
}
