package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL-keyed corpus shaping — the FIRST step
  * of every web-scale pipeline (C4 / CCNet / RefinedWeb dedup and
  * quota-cap by canonical URL/host before touching document text; the
  * reference has no notion of URLs at all, this is pure engine
  * extension surface).
  *
  * Everything here is a MAP-ONLY Column expression chain over string
  * functions Catalyst codegens — no UDFs, no joins, no state — so
  * canonicalization rides the scan and the only shuffles are the ones
  * the downstream dedup/quota aggregations own. Every rule is
  * replayable as ANSI regex SQL (conservative syntax: no lookarounds,
  * RE2-compatible for the DuckDB oracle).
  *
  * Canonical form (RFC 3986 normalization subset + the tracking-param
  * strip every crawl pipeline applies):
  *   1. trim;
  *   2. drop the fragment (`#...`);
  *   3. lowercase scheme + authority (path/query case is preserved —
  *      it is significant);
  *   4. drop userinfo (`user:pw@`);
  *   5. drop default ports (`http…:80`, `https…:443`);
  *   6. drop a leading `www.`;
  *   7. strip tracking query params ([[Urls.TrackingParamPattern]]:
  *      `utm_*`, `fbclid`, `gclid`, `msclkid`, `mc_eid`, `igshid`),
  *      preserving the order of surviving params and dropping a
  *      now-empty `?`;
  *   8. uppercase percent-escape hex (`%2f` -> `%2F`, RFC 3986 §6.2.2.1).
  * Punycode hosts (`xn--…`) are kept OPAQUE — no IDN decode, labels
  * compare byte-wise, which is exactly what URL-level dedup wants.
  */
object Urls {

  /** Query params stripped by canonicalization, as a regex
    * alternation. Extend per deployment; keep RE2-safe. */
  val TrackingParamPattern: String =
    "utm_[^=&]*|fbclid|gclid|msclkid|mc_eid|igshid"

  /** The public-suffix rule table [[registeredDomain]] evaluates,
    * parsed once (driver-side, at class load) from the committed
    * `graft/public_suffix_list.dat` classpath resource — the standard
    * publicsuffix.org file format, so a deployment swaps in the full
    * Mozilla list verbatim. Three rule kinds, exactly the published
    * PSL algorithm's:
    *   - exact rules (`co.uk`): the rule's labels are a suffix of the
    *     host's labels;
    *   - wildcard rules (`*.ck`): `*` matches exactly ONE present
    *     label, so the rule is (base labels + 1) long;
    *   - exception rules (`!www.ck`): prevail over every other
    *     matching rule; the named domain is itself registrable.
    * Prevailing rule = any matching exception, else the longest
    * match; no match falls to the implicit default rule `*` (every
    * bare TLD is a public suffix). Registered domain ("eTLD+1") =
    * the public suffix plus one more label, null when the host IS a
    * suffix or has too few labels.
    *
    * The table ships to executors as literal membership sets inside
    * the compiled expression (InSet, codegen'd hash probes) — no
    * join, no broadcast variable, no executor-side file reads. */
  object Psl {
    private def nLabels(s: String): Int = s.count(_ == '.') + 1

    val (exceptionsByLen, wildcardBasesByLen, exactByLen):
        (Map[Int, Set[String]], Map[Int, Set[String]],
         Map[Int, Set[String]]) = {
      val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
      require(in != null, "graft/public_suffix_list.dat missing from classpath")
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          // the PSL spec: a rule is the line up to the first
          // whitespace; comments are '//' lines
          .map(_.trim.takeWhile(!_.isWhitespace))
          .filter(l => l.nonEmpty && !l.startsWith("//")).toVector
        finally in.close()
      val exc = lines.filter(_.startsWith("!")).map(_.stripPrefix("!"))
      val wild = lines.filter(_.startsWith("*.")).map(_.stripPrefix("*."))
      val exact = lines.filterNot(l =>
        l.startsWith("!") || l.startsWith("*."))
      (exc.groupBy(nLabels).map { case (k, v) => k -> v.toSet },
        wild.groupBy(nLabels).map { case (k, v) => k -> v.toSet },
        exact.groupBy(nLabels).map { case (k, v) => k -> v.toSet })
    }

    /** Longest rule length in labels (a wildcard rule is base + 1);
      * at least 2 so the evaluation chain always exists. */
    val maxRuleLen: Int =
      (exactByLen.keySet ++ exceptionsByLen.keySet ++
        wildcardBasesByLen.keySet.map(_ + 1) + 2).max

    // Length-indexed probe arrays for the per-row kernel: set at
    // index k = the rules with k labels (null when none), so the walk
    // is array-load + hash-probe with zero Map lookups per row.
    private val excAt: Array[Set[String]] =
      Array.tabulate(maxRuleLen + 1)(k => exceptionsByLen.getOrElse(k, null))
    private val exactAt: Array[Set[String]] =
      Array.tabulate(maxRuleLen + 1)(k => exactByLen.getOrElse(k, null))
    private val wildAt: Array[Set[String]] =
      Array.tabulate(maxRuleLen + 1)(k => wildcardBasesByLen.getOrElse(k, null))
    private val excLensDesc: Array[Int] =
      exceptionsByLen.keys.toArray.sorted.reverse

    /** Per-row PSL walk — the kernel behind
      * [[graft.functions.RegisteredDomainExpr]]. Rule precedence is
      * EXACTLY the published algorithm (and the generated DuckDB
      * oracle CASE): matching exception rules first (longest first),
      * then per length k descending exact-then-wildcard (the wildcard
      * needs its `*` label PRESENT), then the implicit default `*`.
      * Labels are byte-wise; an empty label (leading/trailing/double
      * dot) terminates the trailing-label scan, matching the anchored
      * `[^.]+` regex semantics the oracle replays. Cost: one
      * right-to-left scan of at most maxRuleLen+1 labels plus
      * O(maxRuleLen) hash probes — no regex, no allocation beyond the
      * returned suffix. */
    def registeredDomainOf(host: String): String = {
      if (host == null || host.isEmpty) return null
      val need = maxRuleLen + 1
      // starts(i) = start offset of the suffix with i+1 labels
      val starts = new Array[Int](need)
      var n = 0              // trailing non-empty labels found
      var end = host.length  // exclusive end of the label being scanned
      var more = true
      while (more && n < need && end > 0) {
        val dot = host.lastIndexOf('.', end - 1)
        val s = dot + 1 // dot == -1 → label starts at 0
        if (s == end) more = false // empty label: trailing/double dot
        else {
          starts(n) = s; n += 1
          if (dot < 0) more = false else end = dot
        }
      }
      if (n == 0) return null
      @inline def suffix(k: Int): String =
        if (k == n && starts(k - 1) == 0) host else host.substring(starts(k - 1))
      var i = 0
      while (i < excLensDesc.length) {
        val len = excLensDesc(i)
        if (len <= n && excAt(len).contains(suffix(len))) return suffix(len)
        i += 1
      }
      var k = if (maxRuleLen < n) maxRuleLen else n
      while (k >= 2) {
        val ex = exactAt(k)
        if (ex != null && ex.contains(suffix(k)))
          return if (n >= k + 1) suffix(k + 1) else null
        val w = wildAt(k - 1)
        if (w != null && w.contains(suffix(k - 1)))
          return if (n >= k + 1) suffix(k + 1) else null
        k -= 1
      }
      if (n >= 2) suffix(2) else null
    }
  }

  private def lowerPrefix(u: Column): Column = {
    // scheme + authority span: start through the char before the
    // first of '/', '?', '#' AFTER '://'
    val prefix = regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    concat(lower(prefix), u.substr(length(prefix) + 1, length(u)))
  }

  private def stripTracking(u: Column): Column = {
    // split the query on '&' and drop params whose NAME matches the
    // tracked set under FULL anchors — a substring regex would also
    // eat the head of params that merely START with a tracked name
    // (gclid2, utm_sourcex) and corrupt the query; anchored
    // name(=value)? filtering is boundary-exact and one pass
    val base = regexp_extract(u, "^([^?]*)", 1)
    val query = regexp_extract(u, "\\?(.*)", 1)
    val rest = array_join(filter(split(query, "&", -1), p =>
      !p.rlike(s"^($TrackingParamPattern)(=.*)?$$")), "&")
    concat(base,
      when(length(query) === 0 || length(rest) === 0, lit(""))
        .otherwise(concat(lit("?"), rest)))
  }

  private def upperEscapes(u: Column): Column = {
    // '%'-split: piece 1 is before any escape (NEVER transformed — a
    // schemeless URL may legitimately start with two hex chars);
    // every later piece that opens with 2 hex chars gets them
    // uppercased (digits are upper-invariant, so only a-f move)
    val parts = split(u, "%", -1)
    val fixTail = transform(slice(parts, lit(2), size(parts) - 1), p =>
      when(p.rlike("^[0-9a-fA-F]{2}"),
        concat(upper(p.substr(lit(1), lit(2))),
          p.substr(lit(3), length(p)))).otherwise(p))
    concat(element_at(parts, 1),
      when(size(parts) > 1,
        concat(lit("%"), array_join(fixTail, "%"))).otherwise(lit("")))
  }

  /** The full canonicalization chain (steps 1-8 above) as one
    * codegen'd Column expression. Null/empty in, null/empty out.
    *
    * SCALAR-USE ONLY (a probe, a literal, a one-column select): each
    * internal step references its input several times (lowerPrefix
    * x4, the tracking strip x5, the escape fix x4), so as ONE
    * expression the base tree is duplicated ~80x — measured as
    * multi-MiB serialized task binaries and seconds of codegen when
    * this lands in a join/window stage. DataFrame operators must use
    * [[withCanonicalUrl]], which materializes every step as an
    * attribute-bound column (CollapseProject will not re-inline:
    * regex ops are non-cheap and multiply referenced). */
  def canonicalizeUrl(url: Column): Column = {
    val t = trim(url)
    val noFrag = regexp_replace(t, "#.*", "")
    val lowered = lowerPrefix(noFrag)
    val noUser = regexp_replace(lowered,
      "^([a-z][a-z0-9+.-]*://)[^/?#@]*@", "$1")
    val noPort = regexp_replace(
      regexp_replace(noUser,
        "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2"),
      "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    upperEscapes(stripTracking(noWww))
  }

  /** [[canonicalizeUrl]] for DataFrames: identical semantics, but
    * every canonical step lands in its own named column before the
    * next consumes it, so each regex tree exists ONCE in the plan.
    * This is the difference between a KB-sized and a 17 MiB task
    * binary (measured on the domain-link query, which needs the chain
    * twice). */
  def withCanonicalUrl(df: DataFrame, urlCol: String,
      outCol: String = "canonical_url"): DataFrame = {
    // the stepped intermediates are fixed names: an input that already
    // carries one would be silently overwritten and then DROPPED at
    // the end — fail loudly instead of corrupting caller columns
    val reserved = Seq("__u1", "__pfx", "__u2", "__u3", "__u4", "__u5",
      "__base", "__q", "__rest", "__u6", "__parts")
    val clash = df.columns.toSet
      .intersect((reserved :+ outCol).toSet - urlCol)
    require(clash.isEmpty,
      s"withCanonicalUrl: input already has column(s) ${clash.mkString(", ")} " +
        s"— rename them or pass a different outCol")
    val pfxPat = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
    val stepped = df
      .withColumn("__u1", regexp_replace(trim(col(urlCol)), "#.*", ""))
      .withColumn("__pfx", regexp_extract(col("__u1"), pfxPat, 1))
      .withColumn("__u2", concat(lower(col("__pfx")),
        col("__u1").substr(length(col("__pfx")) + 1,
          length(col("__u1")))))
      .withColumn("__u3", regexp_replace(col("__u2"),
        "^([a-z][a-z0-9+.-]*://)[^/?#@]*@", "$1"))
      .withColumn("__u4", regexp_replace(
        regexp_replace(col("__u3"),
          "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2"),
        "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2"))
      .withColumn("__u5", regexp_replace(col("__u4"),
        "^(https?://)www\\.", "$1"))
      .withColumn("__base", regexp_extract(col("__u5"), "^([^?]*)", 1))
      .withColumn("__q", regexp_extract(col("__u5"), "\\?(.*)", 1))
      .withColumn("__rest", array_join(
        filter(split(col("__q"), "&", -1), p =>
          !p.rlike(s"^($TrackingParamPattern)(=.*)?$$")), "&"))
      .withColumn("__u6", concat(col("__base"),
        when(length(col("__q")) === 0 || length(col("__rest")) === 0,
          lit("")).otherwise(concat(lit("?"), col("__rest")))))
      .withColumn("__parts", split(col("__u6"), "%", -1))
      .withColumn(outCol, concat(element_at(col("__parts"), 1),
        when(size(col("__parts")) > 1, concat(lit("%"), array_join(
          transform(slice(col("__parts"), lit(2),
            size(col("__parts")) - 1), p =>
            when(p.rlike("^[0-9a-fA-F]{2}"),
              concat(upper(p.substr(lit(1), lit(2))),
                p.substr(lit(3), length(p)))).otherwise(p)), "%")))
          .otherwise(lit(""))))
    stepped.drop("__u1", "__pfx", "__u2", "__u3", "__u4", "__u5",
      "__base", "__q", "__rest", "__u6", "__parts")
  }

  /** Lowercased host of a CANONICAL url (run [[canonicalizeUrl]]
    * first — userinfo must already be gone): the authority up to any
    * retained non-default port. Schemeless input yields ''. */
  def hostOf(canonicalUrl: Column): Column =
    regexp_extract(canonicalUrl, "^[a-z][a-z0-9+.-]*://([^/?#:]*)", 1)

  /** Registered ("eTLD+1") domain of a host under the full PSL rule
    * semantics ([[Psl]]): evaluate exception rules first (longest
    * first — any matching exception prevails and is itself the
    * registered domain), then exact and wildcard rules longest-first
    * (exact before wildcard at equal length), then the implicit
    * default rule `*`. A host that IS a bare public suffix, or has
    * fewer labels than suffix + 1, yields null. Punycode labels are
    * opaque byte strings — rules and hosts compare byte-wise, no IDN
    * decode (what URL-keyed dedup/quota wants).
    *
    * Shape: ONE codegen'd expression node
    * ([[graft.functions.RegisteredDomainExpr]]) whose static kernel
    * ([[Psl.registeredDomainOf]]) does a right-to-left label scan
    * plus O(maxRuleLen) hash-set probes per row — map-only, rides the
    * scan, cost independent of rule-table size. (The first cut was a
    * when-chain of anchored last-k-label regexp_extracts: correct,
    * but O(maxRuleLen) regexes per BRANCH, and optimizer substitution
    * duplicates the whole chain into every downstream reference —
    * measured 5× on the URL-family queries when the full rule table
    * replaced the 40-suffix subset. The oracle SQL still replays that
    * chain form — DuckDB has no such blowup — generated from the same
    * parsed table.) */
  def registeredDomain(host: Column): Column =
    graft.functions.RegisteredDomainExpr.registeredDomain(host)

  /** URL-level exact dedup: canonicalize, then elect one keeper per
    * canonical URL — `(canonical_url, keeper id = min id, n_urls)`.
    * One hash aggregate on the canonical key (map-side partials make
    * hot boilerplate URLs cheap); the quadratic-free front door C4
    * walks through before any text-level dedup. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String)
      : DataFrame =
    withCanonicalUrl(df.filter(col(urlCol).isNotNull), urlCol)
      .select(col(idCol).as("__id"), col("canonical_url"))
      .groupBy("canonical_url")
      .agg(min("__id").as("keeper_id"), count(lit(1)).as("n_urls"))

  /** Per-registered-domain row quota: canonicalize, extract the
    * domain, keep at most `maxPer` rows per domain preferring high
    * `orderCol` (ties: id asc) — [[Sampling.capPerGroup]] composed
    * with the URL family, i.e. the C4 per-domain cap keyed the way
    * crawls actually key it. Rows whose URL yields no registered
    * domain (schemeless, bare-suffix, single-label hosts) are dropped
    * — they have no quota bucket. WindowGroupLimit pre-trims map-side
    * like every capPerGroup call. */
  /** The registrable host DIRECTLY from a raw url — semantically the
    * composition hostOf(canonicalizeUrl(u)) for any http(s) or
    * schemeless input (authority after userinfo, before port;
    * lowercased; `www.` stripped for http/https), but as a ~40-node
    * expression on the BASE column. This exists for FILTER predicates:
    * a null-domain filter written against the derived
    * `registered_domain` attribute gets pushdown-substituted through
    * every canonical step (measured: a 48,000-node Filter and a
    * 17-26 MiB task binary on the domain-link query); the same
    * predicate written via this probe on the raw column pushes to the
    * scan untouched. */
  def rawRegistrableHost(url: Column): Column = {
    val t = trim(url)
    val auth = regexp_extract(t,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)
    when(t.rlike("^(?i)https?://"),
      regexp_replace(lower(auth), "^www\\.", ""))
      .otherwise(lower(auth))
  }

  /** Drop rows with no registrable domain, predicated on the RAW url
    * column (scan-pushable, never substituted — see
    * [[rawRegistrableHost]]). */
  private def filterRegistrable(df: DataFrame, urlCol: String)
      : DataFrame =
    df.filter(col(urlCol).isNotNull &&
      registeredDomain(rawRegistrableHost(col(urlCol))).isNotNull)

  /** Step-wise `registered_domain` derivation. Each stage lands in a
    * named column before the next consumes it — NOT a style choice:
    * `registeredDomain(hostOf(canonicalizeUrl(u)))` as one expression
    * duplicates the whole canonical regex tree four times (last2/
    * last3/branch references), and Catalyst pays the blowup at
    * ANALYSIS time — measured ~3 s of flat per-query planning cost at
    * any data size. Attribute references keep each tree single. */
  private def withRegisteredDomain(df: DataFrame, urlCol: String)
      : DataFrame =
    withCanonicalUrl(df, urlCol, "__canon")
      .withColumn("__host", hostOf(col("__canon")))
      .withColumn("registered_domain", registeredDomain(col("__host")))
      .drop("__canon", "__host")

  def hostQuota(df: DataFrame, idCol: String, urlCol: String,
      orderCol: String, maxPer: Int): DataFrame = {
    require(maxPer >= 1, s"maxPer must be >= 1: $maxPer")
    val withDom = withRegisteredDomain(
      df.filter(col(urlCol).isNotNull), urlCol)
    // quota-less rows (null domain) are dropped AFTER the rank window,
    // not before: a pre-window filter gets pushed through the project
    // and rewritten in terms of the full canonical regex tree
    // (predicate substitution), multiplying optimizer work; post-window
    // the null partition just ranks and falls out — same result
    Sampling.capPerGroup(withDom, "registered_domain", orderCol,
        idCol, maxPer)
      .filter(col("registered_domain").isNotNull)
  }

  /** Path-extension media route of a CANONICAL url — the fetch-router
    * triage a crawler applies before downloading (images/video go to
    * media pipelines, scripts/styles are usually skipped, pages go to
    * the HTML extractor). Extension = the last dot-suffix of the path
    * (1-5 alphanumerics, query/fragment already stripped by
    * canonicalization), lower-cased; no extension routes to `page`
    * (the web's default). */
  def mediaRoute(canonicalUrl: Column): Column = {
    val path = regexp_extract(canonicalUrl,
      "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val ext = lower(regexp_extract(path, "\\.([a-zA-Z0-9]{1,5})$", 1))
    when(ext.isin("jpg", "jpeg", "png", "gif", "webp", "svg", "ico"),
        "image")
      .when(ext.isin("mp4", "webm", "avi", "mov", "mkv"), "video")
      .when(ext.isin("mp3", "wav", "ogg", "flac"), "audio")
      .when(ext.isin("js", "mjs"), "script")
      .when(ext.isin("css"), "style")
      .when(ext.isin("pdf", "doc", "docx", "xls", "xlsx", "ppt"),
        "document")
      .when(ext.isin("zip", "gz", "tar", "rar", "7z"), "archive")
      .when(ext.isin("json", "xml", "csv"), "data")
      .when(ext.isin("html", "htm", "php", "asp", "aspx", "jsp") ||
        ext === "", "page")
      .otherwise("other")
  }

  /** Anchor-text aggregation — the classic web-corpus relevance
    * signal (what OTHER pages call a target url): canonicalize the
    * link target, tokenize the anchor text (lowercase, whitespace
    * split), count per (target, term), keep the top `k` terms per
    * target by (count desc, term asc — deterministic).
    *
    * Scale shape: one hash aggregate on (target, term) with map-side
    * partials, then a rank window Spark rewrites to WindowGroupLimit
    * (map-side pre-trim — a mega-target ships k rows per mapper, not
    * its whole anchor vocabulary). */
  def anchorTopTerms(links: DataFrame, targetUrlCol: String,
      anchorCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val toks = withCanonicalUrl(
        links.filter(col(targetUrlCol).isNotNull &&
          col(anchorCol).isNotNull),
        targetUrlCol, "target_url")
      .select(col("target_url"),
        explode(split(lower(trim(col(anchorCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val counts = toks.groupBy("target_url", "term")
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("target_url").orderBy(col("n").desc, col("term"))
    counts.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Domain-level link-graph degree stats over raw (source url,
    * target url) edges: per registered domain, distinct outbound /
    * inbound partner domains and the self-link edge count — the
    * hub/authority triage a crawl scheduler reads before anything
    * expensive (PageRank) runs. Edges whose either side yields no
    * registered domain are dropped — predicated on the RAW url
    * columns via [[rawRegistrableHost]], NOT on the derived
    * `registered_domain` attributes: a derived-column null filter
    * gets pushdown-substituted through every canonical step
    * (measured: a 48,000-node Filter, a 17-26 MiB serialized task
    * binary, seconds of codegen), while the raw probe pushes to the
    * scan at ~80 expression nodes. Two hash aggregates over the
    * DISTINCT domain-pair frame; no windows, no joins. */
  def domainLinkStats(edges: DataFrame, srcUrlCol: String,
      tgtUrlCol: String): DataFrame = {
    val pairs = withRegisteredDomain(
      withRegisteredDomain(
        filterRegistrable(filterRegistrable(edges, srcUrlCol),
          tgtUrlCol), srcUrlCol)
        .withColumnRenamed("registered_domain", "src_domain"),
      tgtUrlCol)
      .withColumnRenamed("registered_domain", "tgt_domain")
      .select("src_domain", "tgt_domain")
    val agg = pairs.groupBy("src_domain", "tgt_domain")
      .agg(count(lit(1)).as("n_edges"))
    val out = agg.groupBy(col("src_domain").as("domain"))
      .agg(countDistinct(when(col("tgt_domain") =!= col("src_domain"),
          col("tgt_domain"))).as("n_out"),
        sum(when(col("tgt_domain") === col("src_domain"),
          col("n_edges")).otherwise(0L)).as("n_self"))
    val in = agg.groupBy(col("tgt_domain").as("domain"))
      .agg(countDistinct(when(col("src_domain") =!= col("tgt_domain"),
        col("src_domain"))).as("n_in"))
    out.join(in, Seq("domain"), "full")
      .select(col("domain"),
        coalesce(col("n_out"), lit(0L)).as("n_out"),
        coalesce(col("n_in"), lit(0L)).as("n_in"),
        coalesce(col("n_self"), lit(0L)).as("n_self"))
  }

  /** Per-group TOKEN-budget quota (the mixture-building sibling of
    * [[hostQuota]]'s row cap): rows are ranked inside each group by
    * (`orderCol` desc, id asc) and kept while the RUNNING token sum
    * (including the current row) stays within `budget` — so one
    * giant document cannot be skipped in favor of later small ones
    * (greedy prefix, not knapsack: deterministic and one window pass).
    * Output adds `cum_tokens`, the running total through the kept
    * row.
    *
    * CONTRACT: the quota is over token-BEARING rows — rows whose
    * `tokenCol` is null or < 1 are dropped up front. That invariant
    * is what makes the op skew-safe: with every surviving row adding
    * at least one token, `cum_tokens >= row_number`, so a rank
    * pre-trim `row_number() <= budget` over the SAME ordering is
    * semantics-free — and unlike the running-SUM window (which has
    * no map-side rewrite: every row of a hot Zipf domain would
    * funnel through one task for the full sort + cumsum), the rank
    * filter compiles to WindowGroupLimit and trims hot groups
    * map-side BEFORE the shuffle. The cumsum window then reuses the
    * same partitioning+ordering (one exchange, one sort) on a frame
    * whose per-group size is bounded by `budget` rows.
    *
    * WindowGroupLimit only fires when the limit literal is within
    * `spark.sql.optimizer.windowGroupLimitThreshold` (default 1000)
    * — deployments with larger budgets raise the threshold (rank
    * mode streams a per-group counter over sorted rows; no heap, so
    * a large threshold costs nothing). Bench/Verify/test sessions
    * set it to 10,000,000. */
  def tokenBudgetPerGroup(df: DataFrame, groupCol: String,
      tokenCol: String, orderCol: String, idCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    val tok = col(tokenCol).cast("long")
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy(col(orderCol).desc, col(idCol))
    val preTrim = math.min(budget, Int.MaxValue.toLong).toInt
    val w = ord.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, 0)
    df.filter(tok >= 1L)
      .withColumn("__rk", row_number().over(ord))
      .filter(col("__rk") <= preTrim)
      .drop("__rk")
      .withColumn("cum_tokens", sum(tok).over(w))
      .filter(col("cum_tokens") <= budget)
  }
}
