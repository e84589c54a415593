package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt END-TO-END: parse raw robots bodies into per-host rule
  * tables and select the rule group governing a crawler's user-agent
  * token (RFC 9309 §2.2.1), feeding
  * [[HostRules.robotsPathMatchAgainst]] — so the full chain
  * fetch → parse → group-select → wildcard path match runs inside the
  * engine instead of assuming a pre-curated rule list.
  *
  * Reference scope note: the reference catalog crawls STAC trees, not
  * the open web (`backend/check_stac_metadata/utils.py:99-130` walks
  * intra-catalog links only), so robots handling is beyond-reference
  * pipeline capability, same family as the q148–q166 crawl hygiene.
  *
  * Behavior change (round 10), for anyone re-parsing an existing
  * robots corpus: `crawl-delay` joined the surviving directive set,
  * so a Crawl-delay line sitting BETWEEN two consecutive User-agent
  * lines now terminates the first header block (the second UA opens a
  * NEW group) where it previously merged both UAs into one block.
  * This follows the Bing/Yandex reading (crawl-delay is a group
  * member, so it ends a header block like any rule line); Google's
  * parser instead skips unknown/ignored keys without terminating the
  * block. Group numbering for such bodies differs from pre-r10 output
  * by design; RobotsSpec pins the chosen semantics.
  *
  * Parsing is ZERO-UDF — line explode, regexp directive extraction,
  * and a per-host running-sum window for group ids — so the whole
  * chain stays in whole-stage codegen and mirrors verbatim into the
  * DuckDB oracle:
  *  - lines: split on newline, strip `#` comments, trim;
  *  - directives: `key : value` with key case-folded; only
  *    `user-agent` / `allow` / `disallow` / `crawl-delay` survive;
  *  - groups (RFC 9309 §2.2.1): consecutive `user-agent` lines form
  *    one start-of-group header block, so a group id is the running
  *    count of user-agent lines whose PREVIOUS directive was not a
  *    user-agent line;
  *  - an empty rule value (`Disallow:` = allow everything) still
  *    terminates a header block but emits no rule.
  *
  * Scale shape (100 TB of crawl): robots bodies are per-HOST sized
  * (≤ 500 KiB by the RFC's parsing floor) and the explode fan-out is
  * per-line; every window partitions by host, so parsing shuffles the
  * body corpus once by host and nothing is ever corpus-wide. The
  * selected rule table (host, rule, action) is exactly the join-ready
  * shape the per-host wildcard matcher consumes.
  */
object Robots {

  /** Parse robots bodies into directive rows
    * (host, line_no, grp, k, v): k ∈ {user-agent, allow, disallow,
    * crawl-delay}, grp numbering per RFC group semantics (a
    * crawl-delay line terminates a user-agent header block exactly
    * like a rule line does). Pure projection + one per-host window
    * chain. */
  def parseDirectives(bodies: DataFrame, hostCol: String,
                      txtCol: String): DataFrame = {
    // \r is stripped BEFORE splitting (CRLF bodies are the norm on
    // the web): relying on trim/regex to eat it would diverge between
    // Java regex (where `$` matches before a trailing \r) and the
    // oracle's RE2 (where it does not)
    val lines = bodies.select(col(hostCol).as("host"),
        posexplode(split(regexp_replace(col(txtCol), "\r", ""), "\n"))
          .as(Seq("line_no", "raw")))
      .select(col("host"), col("line_no"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(col("line").rlike("^[A-Za-z-]+\\s*:"))
    val dv = lines.select(col("host"), col("line_no"),
        lower(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1)).as("k"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1))
          .as("v"))
      .filter(col("k").isin("user-agent", "allow", "disallow", "crawl-delay"))
    val w = Window.partitionBy(col("host")).orderBy(col("line_no"))
    dv.withColumn("st",
        when(col("k") === "user-agent" &&
          coalesce(lag(col("k"), 1).over(w), lit("")) =!= "user-agent", 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("st")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("st")
  }

  /** The groups governing `uaToken` per RFC 9309 §2.2.1: groups whose
    * `User-agent` equals the token (case-insensitive) govern; only if
    * NO group matches do the `*` groups apply; multiple matching
    * groups merge. Shared by [[selectRules]] and [[selectCrawlDelay]]
    * so both directive families resolve through ONE selection rule.
    * Returns the governing (host, grp) pairs. */
  private def pickedGroups(directives: DataFrame,
                           uaToken: String): DataFrame = {
    val ua = directives.filter(col("k") === "user-agent")
      .groupBy(col("host"), col("grp"))
      .agg(max(when(lower(col("v")) === uaToken.toLowerCase, 1L)
          .otherwise(0L)).as("exact"),
        max(when(col("v") === "*", 1L).otherwise(0L)).as("star"))
    val hostHasExact = ua.groupBy(col("host"))
      .agg(max(col("exact")).as("has_exact"))
    ua.join(hostHasExact, Seq("host"))
      .filter(when(col("has_exact") === 1L, col("exact") === 1L)
        .otherwise(col("star") === 1L))
      .select(col("host"), col("grp"))
  }

  /** RFC 9309 group selection for one crawler product token — see
    * [[pickedGroups]] for the selection rule. Returns the distinct
    * governing rules (host, rule, action) with empty-value rules
    * dropped. */
  def selectRules(directives: DataFrame, uaToken: String): DataFrame =
    directives.filter(col("k").isin("allow", "disallow") && col("v") =!= "")
      .join(pickedGroups(directives, uaToken), Seq("host", "grp"))
      .select(col("host"), col("v").as("rule"), col("k").as("action"))
      .distinct()

  /** The `Crawl-delay` governing `uaToken`, per host: same group
    * selection as [[selectRules]] (exact-UA groups beat `*`, matching
    * groups merge), non-numeric / non-positive values ignored, and the
    * MAX across merged groups — the conservative read when two
    * governing groups disagree. Crawl-delay is a de-facto extension
    * (Bing/Yandex honor it; RFC 9309 leaves it out), so the parse is
    * lenient but the consumption contract is exact: a host absent from
    * the result has stated no delay. Output: (host, crawl_delay). */
  def selectCrawlDelay(directives: DataFrame, uaToken: String): DataFrame = {
    // try_cast, not cast: under ANSI a malformed delay value must read
    // as "no delay stated", not kill the crawl-policy job. The isnan
    // guard is load-bearing: Spark ORDERS NaN above every double, so
    // `NaN > 0` is TRUE in SQL (fuzz-caught) — without it a
    // "Crawl-delay: nan" line becomes a NaN delay that poisons the
    // budget arithmetic downstream.
    val delay = expr("try_cast(v AS double)")
    directives.filter(col("k") === "crawl-delay" &&
        delay.isNotNull && !isnan(delay) && delay > 0)
      .join(pickedGroups(directives, uaToken), Seq("host", "grp"))
      .groupBy(col("host"))
      .agg(max(expr("try_cast(v AS double)")).as("crawl_delay"))
  }

  /** `Sitemap:` declarations per host — the discovery hook robots.txt
    * carries (sitemaps.org protocol; RFC 9309 treats it as an "other
    * record"): sitemap lines are GROUP-INDEPENDENT, applying regardless
    * of user-agent, so they are extracted by a direct line scan that
    * never touches the group machinery (group numbering for the rule
    * directives is provably unaffected — this function shares only the
    * line-explode stage). Values must be absolute URLs per the
    * protocol; relative values are dropped. Output: (host,
    * sitemap_url), distinct. */
  def sitemapDirectives(bodies: DataFrame, hostCol: String,
                        txtCol: String): DataFrame =
    bodies.select(col(hostCol).as("host"),
        explode(split(regexp_replace(col(txtCol), "\r", ""), "\n")).as("raw"))
      .select(col("host"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .filter(lower(col("line")).rlike("^sitemap\\s*:"))
      .select(col("host"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1))
          .as("sitemap_url"))
      .filter(col("sitemap_url").rlike("^[a-z][a-z0-9+.-]*://"))
      .distinct()

  /** The full chain: parse every body, select `uaToken`'s governing
    * rules, wildcard-match each doc's path against ITS host's rules.
    * Output: (idCol, hostCol, pathCol, matched_rule, action). */
  def admit(docs: DataFrame, idCol: String, hostCol: String,
            pathCol: String, bodies: DataFrame, bodyHostCol: String,
            txtCol: String, uaToken: String,
            default: String): DataFrame = {
    val rules = selectRules(
      parseDirectives(bodies, bodyHostCol, txtCol), uaToken)
    HostRules.robotsPathMatchAgainst(docs, idCol, hostCol, pathCol,
      rules, default)
  }

  /** [[admit]] in the PROJECTION shape: the parsed rules collapse to
    * ONE array row per host (sorted, so the artifact is
    * deterministic), the docs pick up their host's array through a
    * single equi-join, and the match itself is a pure per-row
    * projection ([[HostRules.robotsPathMatchCols]] — no key fan-out,
    * no per-doc window). Because everything downstream of the join is
    * stateless, `docs` may be a STREAM: bodies/rules stay the static
    * side of one stream-static join and each arriving doc gets its
    * verdict independently (RobotsStreamSpec pins
    * stream ≡ batch ≡ the join variant). Hosts with no governing
    * rules carry a NULL array — matched to (NULL, default). */
  def admitProjected(docs: DataFrame, idCol: String, hostCol: String,
                     pathCol: String, bodies: DataFrame,
                     bodyHostCol: String, txtCol: String, uaToken: String,
                     default: String): DataFrame = {
    val rules = selectRules(
        parseDirectives(bodies, bodyHostCol, txtCol), uaToken)
      .groupBy(col("host"))
      .agg(sort_array(collect_list(struct(col("rule"), col("action"))))
        .as("_rules"))
      .withColumnRenamed("host", "_rule_host")
    val matched =
      HostRules.robotsPathMatchCols(col(pathCol), col("_rules"), default)
    docs.join(rules, col(hostCol) === col("_rule_host"), "left")
      .select(col(idCol) +: col(hostCol) +: col(pathCol) +: matched: _*)
  }

  /** [[admitProjected]] under the FULL RFC 9309 grammar
    * ([[HostRules.robotsPathMatchRfcCols]]): rules are BYTE-prefix
    * matches — `Disallow: /static` governs `/static-archive` too —
    * `*` spans segments and partial segments, `$` end-anchors, and
    * there is no depth cap. This is what Google's open-sourced parser
    * computes; the segment-aligned class ([[admit]]/[[admitProjected]])
    * is the joinable approximation whose divergences q208 pins
    * explicitly. Same plan shape: one host equi-join, then a pure
    * projection — stream-safe, state-free. */
  def admitRfc(docs: DataFrame, idCol: String, hostCol: String,
               pathCol: String, bodies: DataFrame,
               bodyHostCol: String, txtCol: String, uaToken: String,
               default: String): DataFrame = {
    // patterns compile on the RULES relation — once per (host, rule),
    // not once per (path row × rule); the path normalizes once per
    // row as its own projected column
    val rules = selectRules(
        parseDirectives(bodies, bodyHostCol, txtCol), uaToken)
      .withColumn("pat", HostRules.compileRfcPatternCol(col("rule")))
      .groupBy(col("host"))
      .agg(sort_array(collect_list(
        struct(col("rule"), col("action"), col("pat")))).as("_rules"))
      .withColumnRenamed("host", "_rule_host")
    val matched = HostRules.robotsPathMatchRfcCompiledCols(
      col("_path_n"), col("_rules"), default)
    docs
      .withColumn("_path_n",
        graft.operators.UrlCanon.percentNormalize(col(pathCol)))
      .join(rules, col(hostCol) === col("_rule_host"), "left")
      .select(col(idCol) +: col(hostCol) +: col(pathCol) +: matched: _*)
  }
}
