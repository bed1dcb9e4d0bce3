package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * emerging AI-opt-out token), each a CASE-INSENSITIVE ASCII
    * word-boundary match — meta-robots directives are
    * case-insensitive in practice (`NOINDEX`, `NoAI` must be
    * classified like their lowercase forms, or the keep/drop policy
    * silently keeps opted-out pages) — while `noindexing`-style
    * substrings still do not trip the boundary. Adds the three
    * boolean columns plus `indexable` (= not noindex and not noai —
    * the keep/drop policy most corpus builds apply). */
  def robotsFlags(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("noindex", col(textCol).rlike("(?i)\\bnoindex\\b"))
      .withColumn("nofollow", col(textCol).rlike("(?i)\\bnofollow\\b"))
      .withColumn("noai", col(textCol).rlike("(?i)\\bnoai\\b"))
      .withColumn("indexable", !col("noindex") && !col("noai"))

  /** Policy filter: rows whose text carries neither `noindex` nor
    * `noai`. Map-only — composes with any downstream shape. */
  def filterIndexable(df: DataFrame, textCol: String): DataFrame =
    robotsFlags(df, textCol).filter(col("indexable"))
      .drop("noindex", "nofollow", "noai", "indexable")

  /** robots.txt EVALUATION — not token sniffing like [[robotsFlags]]
    * but the actual exclusion-protocol semantics a crawler applies:
    * parse each domain's robots.txt into user-agent groups, select
    * the group for `agent` (exact agent beats the `*` group; rules of
    * equally-specific groups union — the RFC 9309 "combine" reading),
    * then per URL pick the LONGEST-prefix-matching Allow/Disallow
    * rule, Allow winning length ties (Google semantics). No matching
    * rule, an empty-value Disallow, or a domain with no robots.txt
    * means allowed. Wildcards (`*`/`$`) in rule paths are explicitly
    * out of scope for v1 (documented; they need a regex-translation
    * pass, not a different join shape).
    *
    * The match target is path + query of the CANONICAL url (paths are
    * case-sensitive per the protocol — canonicalization deliberately
    * preserves path/query case). Multiple consecutive `User-agent`
    * lines form ONE group (RFC); `#` comments and blank lines are
    * stripped.
    *
    * Inputs: `rules(domainCol, robotsCol)` — one robots.txt blob per
    * registered domain; `urls(idCol, urlCol)` — raw URLs.
    * Output: `(id, canonical_url, registered_domain, matched_rule,
    * rule_is_allow, allowed)`.
    *
    * Scale shape: the parse is lines-sized (explode over robots
    * blobs, two windows over the LINES frame — robots files are KB,
    * domains are the partition key); the evaluation is ONE equi-join
    * urls-to-rules on the domain key followed by a per-url argmax
    * window. A megadomain's rule list rides the join as (domain,
    * rules)-sized rows, never url-sized. */
  def robotsEval(rules: DataFrame, domainCol: String, robotsCol: String,
      urls: DataFrame, idCol: String, urlCol: String,
      agent: String = "*"): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // ---- parse: robots blob -> (domain, grp, directive, value) ----
    val lines = rules.select(col(domainCol).as("__dom"),
        posexplode(split(col(robotsCol), "\n")).as(Seq("ln", "line")))
      .withColumn("clean", trim(regexp_replace(col("line"), "#.*", "")))
      .filter(length(col("clean")) > 0)
      .withColumn("directive",
        lower(regexp_extract(col("clean"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("value",
        trim(regexp_extract(col("clean"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1)))
      .filter(col("directive").isin("user-agent", "allow", "disallow"))
    val byDom = Window.partitionBy("__dom").orderBy("ln")
    val grouped = lines
      .withColumn("prev_directive", lag("directive", 1).over(byDom))
      // a UA line starts a new group unless it directly follows
      // another UA line (consecutive UA lines share one group)
      .withColumn("grp_start",
        (col("directive") === "user-agent" &&
          (col("prev_directive").isNull ||
            col("prev_directive") =!= "user-agent")).cast("int"))
      .withColumn("grp", sum("grp_start").over(
        byDom.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("grp") > 0) // rules before any UA line are ignored
    val agents = grouped.filter(col("directive") === "user-agent")
      .groupBy("__dom", "grp")
      .agg(max((lower(col("value")) === agentLc).cast("int"))
          .as("exact"),
        max((col("value") === "*").cast("int")).as("star"))
      .withColumn("rank",
        when(col("exact") === 1, 2).when(col("star") === 1, 1)
          .otherwise(0))
      .filter(col("rank") > 0)
    val bestRank = agents.groupBy("__dom")
      .agg(max("rank").as("best_rank"))
    val activeRules = grouped
      .filter(col("directive").isin("allow", "disallow") &&
        length(col("value")) > 0)
      .join(agents.select(col("__dom"), col("grp"), col("rank")),
        Seq("__dom", "grp"))
      .join(bestRank, Seq("__dom"))
      .filter(col("rank") === col("best_rank"))
      .select(col("__dom"), col("directive").as("rule_dir"),
        col("value").as("rule_path"))
    // ---- evaluate: longest matching rule per url ----
    val canon = Urls.withCanonicalUrl(
        urls.select(col(idCol).as("__id"), col(urlCol)), urlCol)
      .withColumn("__host", Urls.hostOf(col("canonical_url")))
      .withColumn("registered_domain",
        Urls.registeredDomain(col("__host")))
      .withColumn("__target", {
        val p = regexp_extract(col("canonical_url"),
          "^[a-z][a-z0-9+.-]*://[^/?#]*([/?].*)?", 1)
        when(length(p) === 0, lit("/")).otherwise(p)
      })
    val matched = canon.join(activeRules,
        canon("registered_domain") === activeRules("__dom"), "left")
      .withColumn("hit",
        col("rule_path").isNotNull &&
          col("__target").startsWith(col("rule_path")))
    // ONE hash aggregate finds the longest-match winner (struct max
    // over (len, is_allow, path)) — a per-url window followed by a
    // groupBy would reduce the url-x-rules join output twice and add
    // a sort pass over the largest intermediate frame in the query
    matched
      .groupBy(col("__id").as(idCol))
      .agg(first("canonical_url").as("canonical_url"),
        first("registered_domain").as("registered_domain"),
        max(when(col("hit"), struct(
          length(col("rule_path")).as("len"),
          (col("rule_dir") === "allow").cast("int").as("is_allow"),
          col("rule_path").as("p")))).as("__best"))
      .select(col(idCol), col("canonical_url"),
        col("registered_domain"),
        col("__best").getField("p").as("matched_rule"),
        when(col("__best").isNotNull,
          col("__best").getField("is_allow") === 1).as("rule_is_allow"),
        (col("__best").isNull ||
          col("__best").getField("is_allow") === 1).as("allowed"))
  }

  /** Category URL blocklist — the UT1/Shallalist-style domain filter
    * every web-corpus build applies before content-level quality
    * scoring (C4 dropped pages on a bad-words list; RefinedWeb and
    * FineWeb both key a category blocklist by registered domain).
    * The table is DATA keyed by eTLD+1: matching a URL means
    * canonicalize, take the PSL registered domain, and look it up —
    * subdomains are covered for free (`cdn.ads-site.example` resolves
    * to its registrable apex before the lookup), which is exactly the
    * UT1 matching contract. This committed seed table is the
    * engine-fixture analogue of the real ~4M-entry list; the real
    * list drops in as a broadcast table without changing the shape. */
  val UrlBlocklist: Seq[(String, String)] = Seq(
    "example.org" -> "ads",
    "example.net" -> "tracker",
    "example.com.au" -> "shopping",
    "xn--bcher-kva.example" -> "piracy",
    "casino-palace.example" -> "gambling",
    "malware-drop.example" -> "malware")

  /** Blocklist category for a REGISTERED-DOMAIN column (null when the
    * domain is not listed). A literal-map lookup — codegen'd, rides
    * the scan; with a production-sized list this becomes a broadcast
    * join on the same key and the rest of the plan is unchanged. */
  def blocklistCategory(registeredDomain: Column): Column = {
    val m = map(UrlBlocklist.flatMap {
      case (d, c) => Seq(lit(d), lit(c)) }: _*)
    element_at(m, registeredDomain)
  }

  /** Per-URL blocklist audit: canonical URL chain -> registered
    * domain -> category, `blocked` flag. Map-only (the canonical
    * chain + one literal-map probe); stepped columns so the regex
    * chain is bound once (the Urls.withRegisteredDomain lesson). */
  def urlBlocklistAudit(df: DataFrame, idCol: String, urlCol: String)
      : DataFrame =
    Urls.withCanonicalUrl(df.select(col(idCol), col(urlCol)), urlCol,
        "__canon")
      .withColumn("__host", Urls.hostOf(col("__canon")))
      .withColumn("registered_domain",
        Urls.registeredDomain(col("__host")))
      .withColumn("category", blocklistCategory(col("registered_domain")))
      .select(col(idCol), col("registered_domain"),
        coalesce(col("category"), lit("allowed")).as("category"),
        col("category").isNotNull.as("blocked"))

  /** Keep-policy filter: drop rows whose registered domain is on the
    * blocklist. The front-door drop every corpus build applies. */
  def filterUnblocked(df: DataFrame, idCol: String, urlCol: String)
      : DataFrame =
    df.join(urlBlocklistAudit(df, idCol, urlCol)
        .filter(!col("blocked")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Credential/secret scanning — the leak gate every corpus build
    * runs before training (checked-in API keys and private keys are
    * the canonical "model memorized a secret" incident class; cf.
    * gitleaks/trufflehog pattern families). Five conservative,
    * RE2-safe pattern classes, counted per document:
    * AWS-style access-key ids, PEM private-key headers, bearer
    * tokens, bare 40-hex digests (sha1-length secrets), and
    * `password = ...` assignments. Pure codegen'd regexp counts —
    * map-only at any scale; `has_secret` is the drop/review flag. */
  def secretScan(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
        regexp_count(t, lit("AKIA[0-9A-Z]{16}")).cast("long")
          .as("n_aws_key"),
        regexp_count(t, lit("-----BEGIN [A-Z ]*PRIVATE KEY-----"))
          .cast("long").as("n_private_key"),
        regexp_count(t, lit("(?i)bearer [a-z0-9_.=-]{20,}")).cast("long")
          .as("n_bearer"),
        regexp_count(t, lit("\\b[0-9a-f]{40}\\b")).cast("long")
          .as("n_hex40"),
        regexp_count(t, lit("(?i)password\\s*[:=]\\s*[^\\s]{6,}"))
          .cast("long").as("n_password"))
      .withColumn("has_secret",
        col("n_aws_key") + col("n_private_key") + col("n_bearer") +
          col("n_hex40") + col("n_password") > 0)
  }

  /** PII pattern scan — the privacy sibling of [[secretScan]]: email
    * addresses, US-style phone numbers, and IPv4 literals counted per
    * document, plus the triage flag. Patterns are RE2-safe (no
    * lookaround/backrefs) so the identical regex runs on Spark (Java)
    * and the DuckDB oracle (RE2); counts are integral, the scan is
    * map-only codegen'd regexp_count riding the scan — zero shuffle
    * at any corpus size. A production redaction pass keys on exactly
    * these counts before masking. */
  def piiScan(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    df.filter(t.isNotNull)
      .select(col(idCol),
        regexp_count(t,
          lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))
          .cast("long").as("n_email"),
        regexp_count(t, lit("\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"))
          .cast("long").as("n_phone"),
        regexp_count(t,
          lit("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"))
          .cast("long").as("n_ipv4"))
      .withColumn("has_pii",
        col("n_email") + col("n_phone") + col("n_ipv4") > 0)
  }
}
