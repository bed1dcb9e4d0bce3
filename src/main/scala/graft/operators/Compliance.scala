package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-compliance scanners — the robots/licensing triage every
  * web-crawl training pipeline runs before content filtering (C4
  * dropped pages by policy signals; modern pipelines additionally
  * honor license tags and AI-opt-out directives).
  *
  * All map-only codegen'd regex expressions: they ride the scan,
  * shuffle nothing, and replay as conservative (RE2-safe, no
  * lookaround) ANSI regex SQL. Detection is TEXTUAL — these scan
  * whatever blob the pipeline hands them (raw HTML, extracted text);
  * they do not fetch or parse robots.txt, which is a crawler concern
  * upstream of the engine. */
object Compliance {

  /** Creative-Commons license id found in a text blob, as
    * `cc-<kind>-<version>` (e.g. `cc-by-sa-4.0`) from a
    * `creativecommons.org/licenses/<kind>/<ver>` link; `public-domain`
    * for CC0 / public-domain declarations; null when nothing matches.
    * Link detection beats phrase detection (the license NAME appears
    * in prose discussing licenses; the canonical URL appears when a
    * page declares one). */
  def licenseTag(text: Column): Column = {
    val kind = regexp_extract(text,
      "creativecommons\\.org/licenses/(by(?:-nc)?(?:-sa|-nd)?)/([0-9]\\.[0-9])", 1)
    val ver = regexp_extract(text,
      "creativecommons\\.org/licenses/(by(?:-nc)?(?:-sa|-nd)?)/([0-9]\\.[0-9])", 2)
    when(length(kind) > 0, concat(lit("cc-"), kind, lit("-"), ver))
      .when(text.rlike("CC0|[Pp]ublic [Dd]omain"), lit("public-domain"))
      .otherwise(lit(null))
  }

  /** Robots-directive flags from an embedded meta-robots-style tag or
    * bare directive tokens: `noindex`, `nofollow`, `noai` (the
    * emerging AI-opt-out token), each an ASCII word-boundary match so
    * `noindexing` does not trip it. Adds the three boolean columns
    * plus `indexable` (= not noindex and not noai — the keep/drop
    * policy most corpus builds apply). */
  def robotsFlags(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("noindex", col(textCol).rlike("\\bnoindex\\b"))
      .withColumn("nofollow", col(textCol).rlike("\\bnofollow\\b"))
      .withColumn("noai", col(textCol).rlike("\\bnoai\\b"))
      .withColumn("indexable", !col("noindex") && !col("noai"))

  /** Policy filter: rows whose text carries neither `noindex` nor
    * `noai`. Map-only — composes with any downstream shape. */
  def filterIndexable(df: DataFrame, textCol: String): DataFrame =
    robotsFlags(df, textCol).filter(col("indexable"))
      .drop("noindex", "nofollow", "noai", "indexable")
}
