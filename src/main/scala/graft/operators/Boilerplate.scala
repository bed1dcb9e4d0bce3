package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Main-content extraction (boilerplate removal) — the
  * jusText/trafilatura-style step between raw HTML and quality
  * scoring in every HTML-crawl training pipeline: nav bars, cookie
  * banners, footers, and link farms score as "text" to a tag
  * stripper ([[graft.functions.TextFunctions.stripHtml]] keeps them
  * by design), so quality signals computed on unshaped strips are
  * polluted by chrome the page never meant as content.
  *
  * Heuristic (the published block-level text/link-density family):
  *   1. segment the page into BLOCKS at block-level tag boundaries
  *      (`p`, `div`, `li`, `h1`-`h6`, `nav`, `footer`, `td`, ... and
  *      `<br>`), leaving inline markup (`a`, `b`, `span`) inside its
  *      block;
  *   2. per block, compute the visible text (inline tags stripped,
  *      whitespace collapsed) and the ANCHOR text length (characters
  *      inside `<a>...</a>`);
  *   3. keep a block iff its text is at least `minChars` long AND its
  *      link density `anchor_chars / text_chars` is at most
  *      `maxLinkPct`% — navigation and footers are short and almost
  *      all anchor text; prose is long and almost none.
  *
  * The density test is integer math (`alen * 100 <= pct * tlen`) so
  * both engines compare exactly — no float ratio anywhere.
  *
  * Scale shape: map-only — one `split` plus higher-order array
  * functions per row, rides the scan inside whole-stage codegen, no
  * shuffle, no UDF; the DuckDB oracle replays the identical chain
  * with `string_split_regex`/`list_transform`/`list_filter`.
  * Entities are NOT decoded here (a block boundary never hides inside
  * an entity); run [[graft.functions.TextFunctions.stripHtml]]-style
  * decoding downstream on `main_text` if the pipeline wants it. */
object Boilerplate {

  /** Block-boundary pattern: opening OR closing block-level tags with
    * any attributes, plus `<br>`/`<br/>`. Case-insensitive; RE2-safe
    * (no lookaround) so the oracle replays it verbatim. */
  val BlockTagPattern: String =
    "(?i)(?:</?(?:p|div|ul|ol|li|h[1-6]|table|thead|tbody|tr|td|th|" +
      "nav|footer|header|aside|section|article|main|form|blockquote)" +
      "(?:\\s[^>]*)?>|<br\\s*/?>)"

  /** Anchor innards (group 1), dot-matches-newline so multi-line
    * anchors count fully. */
  val AnchorPattern: String = "(?is)<a[^>]*>(.*?)</a>"

  /** Visible text of a fragment: strip remaining (inline) tags,
    * collapse whitespace — the explicit class, not \s, for the same
    * reason stripHtml spells it out (Java \s includes \x0B, RE2's
    * does not). */
  private def visibleText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "<[^>]*>", " "),
      "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** Exploded non-empty visible blocks `(idCol, block_text)` — one
    * row per block occurrence (NOT distinct; a page repeating its nav
    * emits it twice). */
  private def explodedBlocks(df: DataFrame, idCol: String,
      htmlCol: String): DataFrame =
    df.select(col(idCol),
        explode(split(col(htmlCol), BlockTagPattern)).as("__raw"))
      .select(col(idCol), visibleText(col("__raw")).as("block_text"))
      .filter(length(col("block_text")) > 0)

  /** Corpus-FREQUENCY boilerplate — the CCNet-style complement of the
    * per-page density heuristic in [[withMainContent]]: a block whose
    * exact visible text recurs across `minDocs`+ distinct documents is
    * chrome (nav bars, cookie banners, footers render identically on
    * every page of a site), however long or link-free it is. Returns
    * `(block_text, n_docs)` for the recurring blocks.
    *
    * Scale shape: one distinct + one hash aggregate over the exploded
    * block stream (map-side partials); the output is bounded above by
    * corpus_blocks / minDocs — the repetition that makes a block
    * boilerplate is exactly what keeps this table small. */
  private def frequentFrom(blocks: DataFrame, minDocs: Long): DataFrame =
    blocks.distinct()
      .groupBy("block_text")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  def frequentBlocks(df: DataFrame, idCol: String, htmlCol: String,
      minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    frequentFrom(explodedBlocks(df, idCol, htmlCol), minDocs)
  }

  /** Per-document boilerplate exposure vs the corpus-frequency set:
    * total non-empty blocks, how many are corpus-frequent, and the
    * ratio — the "how templated is this page" quality feature. The
    * frequent-block table joins back to the block stream (AQE
    * broadcasts it when small — see [[frequentBlocks]]'s bound);
    * integral counts, one rounded division. Documents whose page has
    * no non-empty block produce no row. */
  def withBlockFrequencyStats(df: DataFrame, idCol: String,
      htmlCol: String, minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    // the exploded stream (regex split + per-block strip over every
    // page — the dominant cost) feeds BOTH join legs: cache it once
    // (the pageRank edge-set lesson), don't re-derive per leg
    val blocks = TrackedCaches.persist(
      explodedBlocks(df, idCol, htmlCol))
    val freq = frequentFrom(blocks, minDocs)
      .select(col("block_text"), lit(1).as("__freq"))
    blocks
      .join(freq, Seq("block_text"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("__freq").isNotNull, 1L).otherwise(0L))
          .as("n_freq_blocks"))
      .withColumn("freq_ratio",
        round(col("n_freq_blocks").cast("double") / col("n_blocks"), 6))
  }

  /** Per-document HTML STRUCTURE profile — tables, lists, code
    * blocks, headings, links, paragraphs — the layout features a
    * quality classifier wants alongside the text signals (code-heavy
    * and table-heavy pages behave differently in training mixes than
    * prose, whatever their token stats say). Counts are opening-tag
    * regex hits (explicit `[ >]` boundary, no regex-dialect `\b` /
    * `\s` divergence); `text_chars` is the visible-text length after
    * the same strip-collapse cleaning the extractor uses; the density
    * is structural elements per visible character (integer inputs, one
    * rounded division — cross-engine exact).
    *
    * Map-only: a handful of codegen'd `regexp_count`s riding the scan,
    * no shuffle, no UDF. */
  def structureStats(df: DataFrame, idCol: String, htmlCol: String)
      : DataFrame = {
    val reserved = Seq("n_tables", "n_lists", "n_items", "n_code",
      "n_headings", "n_links", "n_paras", "text_chars", "struct_density")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"structureStats: input already has column(s) ${clash.mkString(", ")}")
    val h = col(htmlCol)
    def cnt(pat: String): Column =
      regexp_count(h, lit("(?i)" + pat)).cast("long")
    df.withColumn("n_tables", cnt("<table[ >]"))
      .withColumn("n_lists", cnt("<[uo]l[ >]"))
      .withColumn("n_items", cnt("<li[ >]"))
      .withColumn("n_code", cnt("<(pre|code)[ >]"))
      .withColumn("n_headings", cnt("<h[1-6][ >]"))
      .withColumn("n_links", cnt("<a[ >]"))
      .withColumn("n_paras", cnt("<p[ >]"))
      .withColumn("text_chars", length(visibleText(h)).cast("long"))
      .withColumn("struct_density",
        round((col("n_tables") + col("n_lists") + col("n_code") +
          col("n_headings")).cast("double") /
          greatest(col("text_chars"), lit(1L)), 6))
  }

  /** Adds `outCol` (the extracted main text, content blocks joined
    * with '\n'), `n_content_blocks`, `n_boiler_blocks` (non-empty
    * blocks judged chrome), and `main_chars`. Thresholds:
    * `minChars` — minimum visible characters for a content block;
    * `maxLinkPct` — maximum anchor-to-text character percentage
    * (integer, exact in both engines). */
  def withMainContent(df: DataFrame, htmlCol: String,
      outCol: String = "main_text", minChars: Int = 25,
      maxLinkPct: Int = 33): DataFrame = {
    require(minChars >= 1, s"bad minChars: $minChars")
    require(maxLinkPct >= 0 && maxLinkPct <= 100,
      s"bad maxLinkPct: $maxLinkPct")
    val reserved = Seq("__blocks", "__metas", "__content", "__nonempty")
    val clash = df.columns.toSet.intersect((reserved :+ outCol).toSet)
    require(clash.isEmpty,
      s"withMainContent: input already has column(s) ${clash.mkString(", ")}")
    val metas = transform(col("__blocks"), bl => struct(
      visibleText(bl).as("txt"),
      coalesce(aggregate(
        transform(regexp_extract_all(bl, lit(AnchorPattern), lit(1)),
          a => length(visibleText(a))),
        lit(0), (acc, x) => acc + x), lit(0)).as("alen")))
    val isContent = (s: Column) => length(s.getField("txt")) >= minChars &&
      s.getField("alen") * 100 <= length(s.getField("txt")) * maxLinkPct
    df.withColumn("__blocks", split(col(htmlCol), BlockTagPattern))
      .withColumn("__metas", metas)
      .withColumn("__content", filter(col("__metas"), isContent))
      .withColumn("__nonempty",
        filter(col("__metas"), s => length(s.getField("txt")) > 0))
      .withColumn(outCol,
        array_join(transform(col("__content"), _.getField("txt")), "\n"))
      .withColumn("n_content_blocks", size(col("__content")))
      .withColumn("n_boiler_blocks",
        size(col("__nonempty")) - size(col("__content")))
      .withColumn("main_chars", length(col(outCol)))
      .drop("__blocks", "__metas", "__content", "__nonempty")
  }
}
