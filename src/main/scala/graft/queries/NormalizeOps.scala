package graft.queries

import graft.Tables
import graft.operators.{HostRules, Robots, Sitemap, TextNormalize, TopK, UrlCanon}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Encoding-repair / unicode-normalization queries (q152) — the
  * ftfy-style hygiene pass (VERDICT r7 missing #3). The corpus is
  * ASCII-clean by construction, so both engines prepend the IDENTICAL
  * dirty prefix — mojibake sequences, an NFD combining pair, a control
  * char, curly punctuation, NBSP — and the full repair chain
  * (mojibake → NFC → punctuation fold → control strip) is hash-pinned
  * against DuckDB's independent `nfc_normalize` + replace chain over
  * the edge-augmented corpus.
  */
object NormalizeOps {

  /** Every repair class in one constant: garbled é/“/”/’/…, an
    * UNCOMPOSED e + U+0301 (NFC must compose it), a bell control, and
    * an NBSP. Shared verbatim with the oracle SQL. */
  val DirtyPrefix: String =
    "Ã©tÃ© â€œquoteâ€ â€™s étage dash â€” nb sp â€¦ "

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q152_text_normalize" -> ((s, d) =>
      Tables.documentsWithEdges(s, d)
        .select(col("doc_id"),
          concat(lit(DirtyPrefix), col("text")).as("dirty"))
        .select(col("doc_id"), col("dirty"),
          TextNormalize.cleanText(col("dirty")).as("clean_text"))
        .select(col("doc_id"), col("clean_text"),
          length(col("dirty")).cast("long").as("n_chars_dirty"),
          length(col("clean_text")).cast("long").as("n_chars_clean"),
          (col("dirty") =!= col("clean_text")).as("changed"))),

    // URL canonicalization + URL-level dedup — the stage BEFORE any
    // content dedup in a crawl pipeline. The corpus has no URL column,
    // so both engines derive the IDENTICAL dirty URL from doc_id
    // (identity = doc_id % 100; dirt variant = doc_id DIV 100 — case,
    // www, default port, trailing slash, tracking params, unsorted
    // params, fragment), then the operator under test canonicalizes
    // and groups. Map-only projection + one window keyed by
    // canonical_url (≙ groupBy on the dedup key — the partitioning a
    // crawl store would already have).
    "q159_url_canonicalize" -> ((s, d) => {
      val q = expr("doc_id DIV 100")
      val t = col("doc_id") % 100
      val url = concat(
        when(q % 2 === 1, "HTTPS://").otherwise("https://"),
        when(q.isin(1, 3), "www.").otherwise(""),
        when(q === 3, "Example.COM").otherwise("example.com"),
        when(q === 2, ":443").otherwise(""),
        lit("/p/"), t.cast("string"),
        // percent-dirt: %34 decodes ('4', digit), %2f uppercases but
        // STAYS encoded (reserved slash), %5a decodes ('Z') from
        // lowercase hex → canonical '/e4%2FZ' (RFC 3986 §6.2.2.2)
        when(t % 9 === 0, "/e%34%2f%5a").otherwise(""),
        when(q === 4, "/").otherwise(""),
        when(t % 4 === 1, "?utm_source=feed")
          .when(t % 4 === 2, "?b=2&a=1&utm_campaign=x")
          .when(t % 4 === 3, "?a=1&b=2").otherwise(""),
        when(q === 1, "#top").otherwise(""))
      val w = Window.partitionBy(col("canonical_url"))
      Tables.load(s, d, "documents")
        .select(col("doc_id"), url.as("url"))
        .withColumn("canonical_url", UrlCanon.canonicalize(col("url")))
        .select(col("doc_id"), col("url"), col("canonical_url"),
          min(col("doc_id")).over(w).as("keeper_doc_id"),
          count(lit(1)).over(w).cast("long").as("n_dups"))
    }),

    // Hierarchical host allow/block rules, longest-suffix wins — the
    // crawl blocklist primitive. Hosts derive deterministically from
    // (doc_id, source) in both engines; the rule list carves an allow
    // exception (ads.src7) out of a block (src7), which only
    // longest-match semantics can express. Suffix-chain explode makes
    // every rule an equi-join key (see HostRules scaladoc).
    "q160_host_rules" -> ((s, d) =>
      HostRules.longestSuffixMatch(
        Tables.load(s, d, "documents").select(col("doc_id"),
          concat(
            when(col("doc_id") % 3 === 0, "cdn.")
              .when(col("doc_id") % 3 === 1, "ads.").otherwise(""),
            col("source"), lit(".example.org")).as("host")),
        "doc_id", "host", rules = crawlRules, default = "allow")),

    // Robots-style PATH rules — longest-prefix wins at segment
    // granularity, with an allow exception (/static/p1) carved out of
    // a broader disallow (/static). The host-rule machinery's path
    // sibling: prefix-chain explode ≤ depth rows → rules are equi-join
    // keys, no per-pattern scans.
    "q166_path_rules" -> ((s, d) =>
      HostRules.longestPathPrefixMatch(
        Tables.load(s, d, "documents").select(col("doc_id"),
          concat(lit("/"),
            when(col("doc_id") % 4 === 0, "docs")
              .when(col("doc_id") % 4 === 1, "static")
              .when(col("doc_id") % 4 === 2, "api").otherwise("img"),
            lit("/p"), (col("doc_id") % 5).cast("string"),
            lit("/x"), (col("doc_id") % 7).cast("string")).as("path")),
        "doc_id", "path", rules = pathRules, default = "allow")),

    // Registrable-domain (eTLD+1) extraction under FULL public-suffix-
    // list semantics: exception > longest (exact + wildcard) > the
    // default one-label rule. The host fixture carves every rule kind
    // out of (doc_id, source): exact multi-label suffix (example.org),
    // plain TLD (.com), wildcard child (*.pages.org), the exception
    // carved back out of it (!keep.pages.org), and a host that IS a
    // public suffix (etld1 NULL).
    "q172_etld1" -> ((s, d) =>
      HostRules.registrableDomain(pslHosts(s, d), "doc_id", "host",
        pslRules)),

    // q91's per-domain cap re-keyed on the REGISTRABLE domain — the
    // ownership-grain key (raw-host keying over-splits one
    // registrant's subdomains; source keying under-splits shared
    // platforms). Hosts that are themselves a public suffix bucket
    // under that suffix. Same deterministic md5 order as q91.
    "q173_domain_cap_etld1" -> ((s, d) => {
      val keyed = HostRules.registrableDomain(pslHosts(s, d),
          "doc_id", "host", pslRules)
        .select(col("doc_id"),
          coalesce(col("etld1"), col("public_suffix")).as("domain"))
        .withColumn("nord",
          -conv(substring(md5(concat(lit("cap|"),
            col("doc_id").cast("string"))), 1, 8), 16, 10)
            .cast("long").cast("double"))
      TopK.perKeyDesc(keyed, "domain", "nord", "doc_id", k = 10)
        .select(col("domain"), col("doc_id"), col("rank"))
    }),

    // q166 under the ROBOTS WILDCARD grammar (RFC 9309): star
    // segments and $ anchors, most-specific = longest literal octets,
    // literal beats star at equal length, allow beats an equivalent
    // disallow. The rule set exercises every feature: a star rule
    // beaten by a longer literal, a star rule winning mid-path, an
    // anchored allow carved out of a prefix disallow.
    // Every 11th doc gets a 12-segment path that crosses the
    // maxSegs = 8 depth cap: the 9-segment allow rule is UNREACHABLE
    // (rules deeper than the cap never match), so those docs fall
    // to the 1-segment /deep disallow — the capped semantics are
    // value-pinned here because the oracle mirrors least(len, 8); an
    // uncapped oracle would match the deeper allow and diverge.
    // Plan shape: the shared rule list rides as an array literal and
    // the match is a pure projection (robotsPathMatchCols) — no key
    // fan-out, no join, no window (PlanAuditSpec pins this).
    "q174_robots_wildcards" -> ((s, d) =>
      HostRules.robotsPathMatch(
        Tables.load(s, d, "documents").select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit(deepPath))
            .otherwise(concat(lit("/"),
              when(col("doc_id") % 4 === 0, "docs")
                .when(col("doc_id") % 4 === 1, "static")
                .when(col("doc_id") % 4 === 2, "api").otherwise("img"),
              lit("/p"), (col("doc_id") % 5).cast("string"),
              lit("/x"), (col("doc_id") % 7).cast("string"))).as("path")),
        "doc_id", "path", rules = robotsRules, default = "allow")),

    // robots.txt END-TO-END, stage 1: parse RAW per-host robots BODIES
    // (comments, blank lines, multi-UA header blocks, an empty
    // Disallow, wildcard/anchor rules) and select the group governing
    // the crawler token per RFC 9309 — exact UA match beats *, star
    // groups apply only when no group matches, matching groups merge.
    // Zero-UDF: line explode + regexp directives + a per-host
    // running-sum window for group ids (see Robots scaladoc).
    "q175_robots_parse" -> ((s, d) =>
      Robots.selectRules(
        Robots.parseDirectives(robotsBodiesDf(s, d), "host", "robots"),
        uaToken = "GraftBot")),

    // Stage 2 capstone: the full fetch→parse→select→match chain —
    // every doc's path wildcard-matched against ITS OWN host's parsed
    // rules (a per-host rule TABLE, not a broadcast literal list; the
    // join hash-partitions both sides by host at crawl scale).
    "q176_robots_e2e" -> ((s, d) =>
      Robots.admit(robotsDocsDf(s, d), "doc_id", "host", "path",
        robotsBodiesDf(s, d), "host", "robots",
        uaToken = "GraftBot", default = "allow")),

    // The PROJECTION-shaped end-to-end (the stream-safe form): rules
    // collapse to one array row per host, the match is a pure per-row
    // projection — provably identical results to q176 (same oracle
    // text), but zero key fan-out and nothing stateful after the host
    // join, so the same plan admits a crawl STREAM unchanged.
    "q177_robots_projected" -> ((s, d) =>
      Robots.admitProjected(robotsDocsDf(s, d), "doc_id", "host", "path",
        robotsBodiesDf(s, d), "host", "robots",
        uaToken = "GraftBot", default = "allow")),

    // sitemap.xml discovery — the crawl-DISCOVERY sibling of robots
    // admission: <url> block explode + per-field extraction, zero
    // UDFs, whitespace-stripping patterns, NULL for a missing
    // <lastmod>. The fixture XML (one body per host, every 3rd entry
    // dated) is derived identically in both engines.
    "q178_sitemap_parse" -> ((s, d) =>
      Sitemap.parse(sitemapBodiesDf(s, d), "host", "sitemap")),

    // Recrawl planning: sitemap entries × crawl state on ONE url
    // equi-join → new / stale / fresh per entry, with ISO date
    // strings compared lexicographically (engine-exact, no timestamp
    // parsing). Unfetched urls are 'new'; dated entries newer than
    // their last fetch are 'stale'; undated fetched entries default
    // 'fresh'.
    "q179_recrawl_plan" -> ((s, d) =>
      Sitemap.recrawlPlan(
        Sitemap.parse(sitemapBodiesDf(s, d), "host", "sitemap"),
        crawlStateDf(s, d))),

    // Crawl-frontier SCHEDULING — the planning capstone that closes
    // the crawl loop: sitemap discovery (q178) → recrawl triage
    // (q179) → robots admission (q177's projection form) → per-host
    // politeness budget. Priority is new-before-stale, then most
    // recent change first, page number as the deterministic tie; the
    // budget is the bounded TopK AGGREGATE (≤ k rows per host per
    // mapper — never a corpus window), so the whole plan is
    // equi-joins + one bounded agg: the 100 TB frontier shape.
    // Blocked hosts (the star-only robots class) contribute zero
    // fetches; the 4th slot only exists where a stale candidate
    // survived admission, so both priority classes stay value-pinned
    // (5 hosts carry ≥ 2 stale candidates — the recency ordering
    // within 'stale' decides slot 4).
    "q180_frontier_schedule" -> ((s, d) =>
      frontierSchedule(s, d, delayBudget = false)),

    // q180 with robots `Crawl-delay` CONSUMED (the de-facto directive
    // Bing/Yandex honor): the fixed per-host budget k becomes
    // min(k, max(1, floor(cycleLen / delay))) for hosts whose
    // governing group states a delay — class 0's 10s delay trims the
    // budget to 3, class 2's 60s (longer than the 30s cycle) to the
    // 1-fetch floor, class 3 (no delay) keeps the full k, and class
    // 0's 1s star-group decoy must LOSE group selection or the budget
    // snaps back to 4. The plan shape is unchanged: the delay table is
    // one more host-keyed equi-join onto the bounded-TopK output —
    // never a bigger aggregate, so the 100 TB frontier shape holds. */
    "q192_frontier_crawl_delay" -> ((s, d) =>
      frontierSchedule(s, d, delayBudget = true)),

    // The politeness budget at the REGISTRABLE-DOMAIN grain: q180
    // budgets per raw host, but one registrant's subdomains
    // (www.src7.example.org and cdn.src7.example.org) share one crawl
    // capacity — production crawlers key politeness on eTLD+1. The
    // fixture gives every source TWO sub-hosts with 10 candidates
    // each; the full PSL machinery (q172's registrableDomain, the
    // example.org exact rule) folds both onto one domain key, and the
    // bounded-TopK budget of 4 is EXHAUSTED JOINTLY — 20 candidates
    // per domain compete for 4 slots across both hosts. Hosts that
    // are themselves a public suffix bucket under the suffix
    // (coalesce), same as q173. Scale shape: PSL explode is ≤6 rows
    // per host, the budget stays the bounded aggregate — nothing
    // corpus-wide.
    "q193_frontier_etld1_budget" -> ((s, d) => {
      val cand = hostsWithSn(s, d)
        .select(col("host").as("base"), col("sn"),
          explode(array(lit(0L), lit(1L))).as("si"))
        .select(col("base"), col("sn"), col("si"),
          explode(sequence(lit(0L), lit(9L))).as("i"))
        .select(
          (col("sn") * 100 + col("i") * 2 + col("si")).as("doc_id"),
          concat(when(col("si") === 0, "www").otherwise("cdn"),
            lit("."), col("base")).as("host"),
          ((col("sn") * 3 + col("i") * 7 + col("si") * 13) % 50)
            .cast("double").as("ord"),
          (col("i") * 2 + col("si")).as("tie"))
      val dom = HostRules.registrableDomain(
          cand.select(col("doc_id"), col("host")),
          "doc_id", "host", pslRules)
        .select(col("doc_id"),
          coalesce(col("etld1"), col("public_suffix")).as("domain"))
      val pri = cand.join(dom, Seq("doc_id"))
        .select(col("domain"), col("ord"), col("tie"))
      // (sub, page) reconstruct from the tie packing: tie = 2·page+si
      TopK.perKeyDesc(pri, "domain", "ord", "tie", k = 4)
        .select(col("domain"),
          concat(lit("https://"),
            when(pmod(col("tie"), lit(2)) === 0, "www").otherwise("cdn"),
            lit("."), col("domain"), lit("/p"),
            expr("tie DIV 2").cast("string")).as("url"),
          col("rank").as("fetch_order"))
    }),

    // Sitemap INDEX expansion — the sitemaps.org nesting for sites
    // past the 50k-URL per-file cap: parse the index's <sitemap>
    // blocks (child 0 dated, child 1 not — the recrawl-relevant
    // distinction), join each child URL to its fetched body on
    // (host, child url), and parse the children's page entries with
    // the child URL carried alongside. Two bounded block explodes +
    // one equi-join; nothing corpus-wide.
    "q202_sitemap_index" -> ((s, d) => {
      val children = Sitemap.parseIndex(
          sitemapIndexDf(s, d), "host", "sitemap_index")
        .select(col("host"), col("url").as("child_url"),
          col("lastmod").as("child_lastmod"))
      // join on both keys with distinct rhs names (the self-join
      // ambiguity trap — both sides derive from hostsWithSn)
      val kids = childSitemapsDf(s, d)
        .withColumnRenamed("host", "_ch")
        .withColumnRenamed("child_url", "_cu")
      Sitemap.parse(
          children.join(kids, col("host") === col("_ch") &&
            col("child_url") === col("_cu"))
            .select(col("host"), col("child_url"), col("child_lastmod"),
              col("sitemap")),
          "host", "sitemap",
          carry = Seq("child_url", "child_lastmod"))
    }),

    // Robots `Sitemap:` discovery — the hook that CLOSES the crawl
    // loop (robots tells the crawler where the sitemap lives; q178
    // then parses what it fetched): classes 0/2 declare their host's
    // sitemap, classes 1/3 don't, so the declaring-hosts-only entry
    // list is observable, not vacuous. The directive is extracted by
    // a group-independent line scan (sitemaps.org semantics), so the
    // q175–q192 group numbering is untouched by the new fixture lines.
    "q200_robots_sitemap_discovery" -> ((s, d) => {
      val declared = Robots.sitemapDirectives(
          robotsBodiesDf(s, d), "host", "robots")
        .withColumnRenamed("host", "_sh")
      Sitemap.parse(sitemapBodiesDf(s, d), "host", "sitemap")
        .join(declared, col("host") === col("_sh") &&
          col("sitemap_url") ===
            concat(lit("https://"), col("host"), lit("/sitemap.xml")))
        .select(col("host"), col("sitemap_url"), col("url"), col("lastmod"))
    }),

    // The politeness CAPSTONE: the q193 eTLD+1 budget grain and the
    // q192 Crawl-delay rule composed — candidates from two sub-hosts
    // per domain, each sub-host carrying its robots body (class =
    // sn % 4, so delays 10/15/60/none), the domain's effective delay
    // = MAX over its member hosts (conservative: the slowest host's
    // politeness governs the registrant), budget =
    // min(4, max(1, floor(30/delay))) shared across the whole domain.
    // Every stage is the already-pinned machinery (PSL chain, RFC 9309
    // group selection, bounded TopK) — this query pins their
    // COMPOSITION.
    "q201_frontier_domain_delay" -> ((s, d) => {
      val cand = hostsWithSn(s, d)
        .select(col("host").as("base"), col("sn"),
          explode(array(lit(0L), lit(1L))).as("si"))
        .select(col("base"), col("sn"), col("si"),
          explode(sequence(lit(0L), lit(9L))).as("i"))
        .select(
          (col("sn") * 100 + col("i") * 2 + col("si")).as("doc_id"),
          concat(when(col("si") === 0, "www").otherwise("cdn"),
            lit("."), col("base")).as("host"),
          col("sn"),
          ((col("sn") * 3 + col("i") * 7 + col("si") * 13) % 50)
            .cast("double").as("ord"),
          (col("i") * 2 + col("si")).as("tie"))
      val dom = HostRules.registrableDomain(
          cand.select(col("doc_id"), col("host")),
          "doc_id", "host", pslRules)
        .select(col("doc_id"),
          coalesce(col("etld1"), col("public_suffix")).as("domain"))
      // per-sub-host robots bodies, same class rule as robotsBodiesDf
      val bodies = cand.select(col("host"), col("sn")).distinct()
        .select(col("host"),
          element_at(array(robotsBodies.map(lit): _*),
            (pmod(col("sn"), lit(4)) + 1).cast("int")).as("robots"))
      val delays = Robots.selectCrawlDelay(
          Robots.parseDirectives(bodies, "host", "robots"),
          uaToken = "GraftBot")
        .withColumnRenamed("host", "_dh")
      val domDelay = cand.select(col("doc_id"), col("host"))
        .join(dom, Seq("doc_id"))
        .join(delays, col("host") === col("_dh"), "left")
        .groupBy(col("domain"))
        .agg(max(col("crawl_delay")).as("delay"))
        .withColumn("budget",
          when(col("delay").isNotNull,
            least(lit(4L), greatest(lit(1L),
              floor(lit(frontierCycleSecs) / col("delay")))))
            .otherwise(lit(4L)))
        .withColumnRenamed("domain", "_bd")
      val pri = cand.join(dom, Seq("doc_id"))
        .select(col("domain"), col("ord"), col("tie"))
      TopK.perKeyDesc(pri, "domain", "ord", "tie", k = 4)
        .join(domDelay, col("domain") === col("_bd"))
        .filter(col("rank") <= col("budget"))
        .select(col("domain"),
          concat(lit("https://"),
            when(pmod(col("tie"), lit(2)) === 0, "www").otherwise("cdn"),
            lit("."), col("domain"), lit("/p"),
            expr("tie DIV 2").cast("string")).as("url"),
          col("rank").as("fetch_order"), col("budget"))
    }),

    // q201 STREAM-FED (VERDICT r10 #2): the same candidates arrive as
    // an event-time STREAM in two 30 s politeness cycles (pages 0–4 →
    // cycle 0, 5–9 → cycle 1); the registrable domain is a
    // stream-side PROJECTION (registrableDomainCols — zero state, no
    // PSL join on the stream), the domain-keyed Crawl-delays are the
    // STATIC side of one stream-static join, and the shared eTLD+1
    // budget is the bounded-TopK aggregate per (cycle, domain),
    // emitted exactly once at window close under the watermark. The
    // oracle recomputes the whole relation in DuckDB — the STREAM
    // itself is hash-pinned, not just spec-compared to batch
    // (FrontierStreamSpec additionally pins stream ≡ batch at this
    // grain). Scale shape: streaming state is ≤ k rows per
    // (cycle, domain) — candidate backlog never accumulates.
    "q203_frontier_domain_stream" -> ((s0, d) => {
      // the stream runs in its OWN session: streaming state partitions
      // are captured from spark.sql.shuffle.partitions at query start,
      // and the fixture's (cycle, domain) key space is tiny — 32 state
      // tasks per micro-batch would be pure scheduler overhead (on a
      // real frontier this knob sizes to the cluster). newSession()
      // shares the SparkContext but clones the conf, so pinning the
      // knob here is invisible to every concurrently-planned query
      // (VERDICT r11 wrong #1: the old set/restore on the shared
      // session leaked 4 shuffle partitions into that window).
      val s = s0.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val base = 1735689600L // 2025-01-01T00:00:00Z, divisible by 30
      val cand = hostsWithSn(s, d)
        .select(col("host").as("base"), col("sn"),
          explode(array(lit(0L), lit(1L))).as("si"))
        .select(col("base"), col("sn"), col("si"),
          explode(sequence(lit(0L), lit(9L))).as("i"))
        .select(
          timestamp_seconds(lit(base) +
            when(col("i") < 5, 0L).otherwise(30L) +
            pmod(col("i"), lit(5)) * 5 + col("si")).as("ts"),
          concat(when(col("si") === 0, "www").otherwise("cdn"),
            lit("."), col("base")).as("host"),
          col("sn"),
          ((col("sn") * 3 + col("i") * 7 + col("si") * 13) % 50)
            .cast("double").as("ord"),
          (col("i") * 2 + col("si")).as("tie"))
      // domain-keyed delays (static side): per-sub-host robots parse →
      // governing Crawl-delay → conservative MAX per domain, exactly
      // q201's rule; hosts without a delay leave their domain at the
      // full budget via the left join inside scheduleCyclesDelayed
      val bodies = cand.select(col("host"), col("sn")).distinct()
        .select(col("host"),
          element_at(array(robotsBodies.map(lit): _*),
            (pmod(col("sn"), lit(4)) + 1).cast("int")).as("robots"))
      // materialized eagerly: the STATIC side of a stream-static join
      // re-executes every micro-batch, and this one is a whole robots
      // parse chain — localCheckpoint truncates it to its domain-count
      // result (the shape a real frontier keeps as a maintained table)
      val domDelays = Robots.selectCrawlDelay(
          Robots.parseDirectives(bodies, "host", "robots"),
          uaToken = "GraftBot")
        .select(HostRules.registrableDomainCols(col("host"), pslRules) :+
          col("crawl_delay"): _*)
        .select(coalesce(col("etld1"), col("public_suffix")).as("host"),
          col("crawl_delay"))
        .groupBy(col("host")).agg(max(col("crawl_delay")).as("crawl_delay"))
        .localCheckpoint(eager = true)
      // feed the stream from a file source. Micro-batch 1 carries the
      // candidates PLUS a first far-future sentinel (the watermark
      // advances at batch END, so nothing is late and both cycles'
      // windows are behind the watermark after it); micro-batch 2's
      // second sentinel triggers their append-mode emission.
      val tmp = java.nio.file.Files.createTempDirectory("q203-src").toString
      import s.implicits._
      def sentinel(j: Int) =
        Seq((new java.sql.Timestamp((base + 3600 + j) * 1000L),
          "zz.sentinel", 0.0, 0L)).toDF("ts", "host", "ord", "tie")
      cand.select(col("ts"), col("host"), col("ord"), col("tie"))
        .unionByName(sentinel(1))
        .write.mode("append").parquet(tmp)
      val stream = s.readStream
        .schema("ts TIMESTAMP, host STRING, ord DOUBLE, tie BIGINT")
        .parquet(tmp)
      val withDom = stream.select(col("ts") +: col("ord") +: col("tie") +:
          HostRules.registrableDomainCols(col("host"), pslRules): _*)
        .select(col("ts"),
          coalesce(col("etld1"), col("public_suffix")).as("host"),
          col("ord"), col("tie"))
      val qn = "q203_out_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val q = graft.streaming.FrontierStream.scheduleCyclesDelayed(
            withDom, "30 seconds", "30 seconds", k = 4, domDelays,
            cycleSecs = frontierCycleSecs)
          .writeStream.outputMode("append")
          .format("memory").queryName(qn).start()
      try {
        q.processAllAvailable()
        sentinel(2).write.mode("append").parquet(tmp)
        q.processAllAvailable()
      } finally q.stop()
      s.table(qn).filter(col("host") =!= "sentinel.zz" &&
          !col("host").startsWith("zz."))
        .select(
          ((unix_timestamp(col("cycle_start")) - base) / 30)
            .cast("long").as("cycle"),
          col("host").as("domain"),
          concat(lit("https://"),
            when(pmod(col("tie"), lit(2)) === 0, "www").otherwise("cdn"),
            lit("."), col("host"), lit("/p"),
            expr("tie DIV 2").cast("string")).as("url"),
          col("fetch_order"), col("budget"))
    }),

    // WARC-shape archive ingest (VERDICT r10 #3): documents are packed
    // into record-framed archive blobs (one per source — header lines
    // + BE32 length-prefixed payload, the Multimodal demux discipline)
    // and extracted back partition-wise. Every 13th record is written
    // WITHOUT its required Target-URI header: the extractor must
    // QUARANTINE it (status 'corrupt', url NULL) while keeping every
    // field the intact framing still proves — payload hash included —
    // so quarantine-not-drop is value-pinned, not claimed. The oracle
    // recomputes the whole relation from `documents` directly (the
    // round-trip through bytes must be invisible).
    "q204_archive_extract" -> ((s, d) => {
      val recs = Tables.load(s, d, "documents")
        .select(col("source"), col("doc_id"),
          when(col("doc_id") % 13 =!= 0,
            concat(lit("https://"), col("source"), lit(".example.org/d"),
              col("doc_id").cast("string"))).as("url"),
          concat(lit("2026-08-"),
            lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0"),
            lit("T00:00:00Z")).as("fetch_ts"),
          when(col("doc_id") % 2 === 0, "text/html").otherwise("text/plain")
            .as("mime"),
          encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      val archives = graft.sources.CrawlArchive.encode(s, recs,
        "source", "doc_id", "url", "fetch_ts", "mime", "payload")
      graft.sources.CrawlArchive.extract(s, archives, "archive", "bytes")
        .toDF()
        .select(col("archive"), col("rec_idx"), col("status"), col("url"),
          col("fetch_ts"), col("mime"), col("n_bytes"),
          md5(col("body")).as("body_md5"))
    }),

    // Nested sitemap-INDEX expansion (VERDICT r10 #8): q202 expands
    // one tier; sitemaps.org allows index-of-index. The fixture is a
    // two-tier tree per host — root index → {sub-index s0 (dated),
    // leaf s1} → s0 lists {sA, sB, AND the root again} — so the
    // bounded frontier walk must absorb the CYCLE (an unguarded walk
    // hangs; a guard that drops too much loses sA/sB's pages). The
    // oracle constructs the expected leaf entries directly: the walk's
    // termination, cycle guard, and carry discipline are all pinned by
    // the hash.
    "q205_sitemap_index_nested" -> ((s, d) =>
      Sitemap.expandIndexes(nestedSitemapBodies(s, d), "host", "url",
        "xml",
        hostsWithSn(s, d).select(col("host"),
          concat(lit("https://"), col("host"), lit("/sitemap_index.xml"))
            .as("url")),
        maxDepth = 4)),

    // q174 under the FULL RFC 9309 grammar: `*` spans segments and
    // partial segments (each rule compiles to an escaped LIKE
    // pattern), `$` end-anchors, and there is NO depth cap — the
    // 12-segment crawler-trap path now legitimately reaches the
    // 9-segment allow rule q174's capped class cannot (the two
    // semantics are pinned side by side). The %13 path hits a rule
    // whose literal `_` must NOT wildcard (LIKE-escaping observable:
    // the %17 path would match it un-escaped and must stay
    // default-allow). Shapes exercised: an intra-segment star
    // (/static*1), a spanning star (/docs*x3), a leading star
    // (/*/p2), an anchored exact (/api/p0/x1$), the %23 '/page1'
    // precedence-flip class ('Allow: /page*' outranks
    // 'Disallow: /page' under the RFC most-octets rank), and the two
    // RFC 9309 §2.2.2 octet-normalization classes: %29
    // '/%73tatic/p1' decodes to /static/p1 (an encoded UNRESERVED
    // octet must not dodge the rules) and %31 '/a%2fb/x' must hit the
    // '/a%2Fb' rule — hex case never splits the comparison, while the
    // reserved %2F itself stays encoded.
    "q207_robots_rfc_wildcards" -> ((s, d) =>
      HostRules.robotsPathMatchRfc(
        Tables.load(s, d, "documents").select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit(deepPath))
            .when(col("doc_id") % 13 === 0, lit("/a_b/p1"))
            .when(col("doc_id") % 17 === 0, lit("/axb/p1"))
            .when(col("doc_id") % 23 === 0, lit("/page1"))
            .when(col("doc_id") % 29 === 0, lit("/%73tatic/p1"))
            .when(col("doc_id") % 31 === 0, lit("/a%2fb/x"))
            .otherwise(concat(lit("/"),
              when(col("doc_id") % 4 === 0, "docs")
                .when(col("doc_id") % 4 === 1, "static")
                .when(col("doc_id") % 4 === 2, "api").otherwise("img"),
              lit("/p"), (col("doc_id") % 5).cast("string"),
              lit("/x"), (col("doc_id") % 7).cast("string"))).as("path")),
        "doc_id", "path", rules = rfcRules, default = "allow")),

    // The RFC end-to-end: fetch → parse → group-select → FULL-grammar
    // match against each doc's OWN host's rules (Robots.admitRfc —
    // same parse chain and host join as q176/q177, the matcher
    // swapped). Two path classes pin the grammar differences against
    // the segment-aligned e2e: the %19 '/static-archive' class is a
    // BYTE-prefix hit ('Disallow: /static' governs it under the RFC,
    // not under segment alignment), and the %11 deep path has no cap.
    "q208_robots_rfc_e2e" -> ((s, d) =>
      Robots.admitRfc(
        Tables.load(s, d, "documents").select(col("doc_id"),
          concat(col("source"), lit(".example.org")).as("host"),
          when(col("doc_id") % 19 === 0, lit("/static-archive/p9"))
            .when(col("doc_id") % 11 === 0, lit(deepPath))
            .otherwise(concat(lit("/"),
              when(col("doc_id") % 4 === 0, "docs")
                .when(col("doc_id") % 4 === 1, "static")
                .when(col("doc_id") % 4 === 2, "api").otherwise("img"),
              lit("/p"), (col("doc_id") % 5).cast("string"),
              lit("/x"), (col("doc_id") % 7).cast("string"))).as("path")),
        "doc_id", "host", "path",
        robotsBodiesDf(s, d), "host", "robots",
        uaToken = "GraftBot", default = "allow")),

    // Gzip archive members (VERDICT r11 #1): real crawl dumps store
    // each record's payload as its OWN gzip member, so q204's fixture
    // is rebuilt with every %3 record compressed member-wise and the
    // %13 class POISONED — a payload opening with the gzip magic
    // (1f 8b) whose remainder is not a gzip stream. The demuxer must
    // inflate the members invisibly (body/n_bytes = inflated payload,
    // hash-pinned against uncompressed `documents` text) and
    // quarantine the poisoned class as `corrupt_gzip` with the RAW
    // bytes kept — body_pin prefixes the preserved magic's hex so
    // kept-not-dropped is value-pinned. Later records in the same
    // archive stay `ok`: a broken member never desynchronizes the
    // walk (framing is by compressed length).
    "q209_archive_gzip_members" -> ((s, d) => {
      val payload = encode(coalesce(col("text"), lit("")), "UTF-8")
      val recs = Tables.load(s, d, "documents")
        .select(col("source"), col("doc_id"),
          concat(lit("https://"), col("source"), lit(".example.org/d"),
            col("doc_id").cast("string")).as("url"),
          concat(lit("2026-08-"),
            lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0"),
            lit("T00:00:00Z")).as("fetch_ts"),
          when(col("doc_id") % 2 === 0, "text/html").otherwise("text/plain")
            .as("mime"),
          when(col("doc_id") % 13 === 0,
              concat(lit(Array[Byte](0x1f.toByte, 0x8b.toByte)), payload))
            .otherwise(payload).as("payload"),
          (col("doc_id") % 3 === 0 && col("doc_id") % 13 =!= 0).as("gz"))
      val archives = graft.sources.CrawlArchive.encode(s, recs,
        "source", "doc_id", "url", "fetch_ts", "mime", "payload",
        gzipIfCol = Some("gz"))
      graft.sources.CrawlArchive.extract(s, archives, "archive", "bytes")
        .toDF()
        .select(col("archive"), col("rec_idx"), col("status"), col("url"),
          col("mime"), col("n_bytes"),
          // quarantined members pin (preserved magic hex) ++ md5(rest);
          // intact members pin md5(inflated payload) — this DuckDB
          // build's md5 is VARCHAR-only, so the magic bytes ride as hex
          when(col("status") === "corrupt_gzip",
              concat(hex(substring(col("body"), 1, 2)),
                md5(expr("substring(body, 3, 2147483647)"))))
            .otherwise(md5(col("body"))).as("body_pin"))
    }),

    // Real WARC/1.0 read mode (VERDICT r12 #1): q209 reads the
    // GARC-shaped container; this fixture is REAL-format WARC — one
    // gzip member per record wrapping `WARC/1.0` version line +
    // WARC-Type/Target-URI/Date/Content-Type headers +
    // Content-Length-framed payload + CRLF CRLF, the Common-Crawl
    // layout. Per doc: a `response` record whose payload is a FULL
    // HTTP response (status line %2-split 200/404 — mime truth comes
    // from HttpEnvelope, reused on ok responses), plus a `request`
    // record when %3 and a `metadata` record when %5. Quarantine
    // classes: %7 POISONED member (gzip magic + zeros — undecodable;
    // `corrupt_gzip`, raw span kept and hex-pinned, walk RESYNCS so
    // later records stay ok), %13 missing WARC-Target-URI
    // (`corrupt`, everything the header proves kept). The oracle
    // recomputes every field — record order, framing lengths, payload
    // md5s, envelope status — from class arithmetic without touching
    // a byte of WARC.
    "q219_warc_read" -> ((s, d) => {
      import graft.sources.{CrawlArchive, HttpEnvelope}
      val w = CrawlArchive.extractWarc(s, warcArchives(s, d),
          "archive", "bytes")
        .toDF()
        .withColumn("eid",
          concat(col("archive"), lit("#"), col("rec_idx").cast("string")))
      // mime/status truth for ok responses comes from the envelope —
      // the q210 discipline running on real-WARC payloads unchanged
      val env = HttpEnvelope.extract(s,
          w.filter(col("status") === "ok" && col("rec_type") === "response")
            .select(col("eid"), col("body")), "eid", "body")
        .toDF()
        .select(col("id").as("eid"),
          col("http_status").as("http_status"),
          col("content_type").as("env_content_type"))
      w.join(env, Seq("eid"), "left")
        .select(col("archive"), col("rec_idx"), col("status"),
          col("rec_type"), col("url"), col("warc_date"),
          col("warc_content_type"), col("warc_refers_to"),
          col("n_bytes"),
          col("http_status"), col("env_content_type"),
          when(col("status") === "corrupt_gzip", hex(col("body")))
            .otherwise(md5(col("body"))).as("body_pin"))
    })
  )

  /** The real-format WARC fixture shared by q219 (per-record read
    * pin) and q223 (the end-to-end ingest report): one archive per
    * source; per doc a `response` record whose payload is a full HTTP
    * response (%2-split 404/200), plus `request` (%3), `metadata`
    * (%5) and `revisit` (%11 — Common Crawl's URL-level dup pointer,
    * headers-only payload, `WARC-Refers-To-Target-URI` set) records;
    * %7 responses POISONED member-wise, %13 missing Target-URI.
    * Everything class-arithmetic so oracles recompute it without
    * touching a byte of WARC. */
  private[queries] def warcArchives(s: SparkSession,
                                    d: String): DataFrame = {
    import graft.sources.CrawlArchive
    import s.implicits._
    val recs = Tables.load(s, d, "documents")
      .select(col("source"), col("doc_id"),
        coalesce(col("text"), lit("")).as("text"))
      .as[(String, Long, String)]
      .flatMap { case (src, id, text) =>
        val url = s"https://$src.example.org/d$id"
        val date = f"2026-08-${id % 28 + 1}%02dT00:00:00Z"
        val statusLine =
          if (id % 2 == 0) "HTTP/1.1 404 Not Found" else "HTTP/1.1 200 OK"
        val http = (statusLine + "\r\nContent-Type: text/html\r\n\r\n")
          .getBytes("UTF-8") ++ text.getBytes("UTF-8")
        val resp = (src, id * 4, "response",
          if (id % 13 == 0) null else url, date,
          "application/http; msgtype=response", http, id % 7 == 0,
          null: String)
        val req =
          if (id % 3 == 0) Seq((src, id * 4 + 1, "request", url, date,
            "application/http; msgtype=request",
            (s"GET /d$id HTTP/1.1\r\nHost: $src.example.org\r\n\r\n")
              .getBytes("UTF-8"), false, null: String))
          else Nil
        val meta =
          if (id % 5 == 0) Seq((src, id * 4 + 2, "metadata", url, date,
            "application/warc-fields",
            s"fetched-from: seed\nparent: d$id\n".getBytes("UTF-8"),
            false, null: String))
          else Nil
        val rev =
          if (id % 11 == 0) Seq((src, id * 4 + 3, "revisit", url, date,
            "application/http; msgtype=response",
            "HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8"), false, url))
          else Nil
        Seq(resp) ++ req ++ meta ++ rev
      }.toDF("src", "rid", "rtype", "url", "ts", "ct", "payload",
        "poison", "refers")
    CrawlArchive.encodeWarc(s, recs, "src", "rid",
      "rtype", "url", "ts", "ct", "payload", poisonIfCol = Some("poison"),
      refersToCol = Some("refers"))
  }

  /** Seconds per politeness cycle assumed by the q192 budget — shared
    * verbatim with the oracle. */
  private[queries] val frontierCycleSecs = 30.0

  /** The q180/q192 frontier chain: sitemap discovery → recrawl triage
    * → robots admission (projection form) → per-host bounded-TopK
    * budget; with `delayBudget` the governing Crawl-delay tightens
    * each host's budget (see q192's comment). */
  private def frontierSchedule(s: SparkSession, d: String,
                               delayBudget: Boolean): DataFrame = {
    val plan = Sitemap.recrawlPlan(
      Sitemap.parse(sitemapBodiesDf(s, d), "host", "sitemap"),
      crawlStateDf(s, d))
    val cand = plan.filter(col("status") =!= "fresh")
      .withColumn("path",
        regexp_replace(col("url"), "^https://[^/]*", ""))
    val directives =
      Robots.parseDirectives(robotsBodiesDf(s, d), "host", "robots")
    val rules = Robots.selectRules(directives, uaToken = "GraftBot")
      .groupBy(col("host"))
      .agg(sort_array(collect_list(struct(col("rule"), col("action"))))
        .as("_rules"))
      .withColumnRenamed("host", "_rh")
    val matched =
      HostRules.robotsPathMatchCols(col("path"), col("_rules"), "allow")
    val adm = cand.join(rules, col("host") === col("_rh"), "left")
      .select(col("host") +: col("url") +: col("status") +:
        col("lastmod") +: matched: _*)
      .filter(col("action") === "allow")
    // recency key = the FULL date as yyyymmdd (≤ 99991231 < 1e9 —
    // exact in a double), not the bare day-of-month: a day-only key
    // would rank 07-28 above 08-05 across a month boundary. The
    // 1e9 new-flag stays strictly above any date.
    val pri = adm.select(col("host"),
      (when(col("status") === "new", 1000000000L).otherwise(0L) +
        coalesce(translate(col("lastmod"), "-", "").cast("long"), lit(0L)))
        .cast("double").as("ord"),
      regexp_extract(col("url"), "/p(\\d+)$", 1).cast("long").as("tie"))
    val ranked = TopK.perKeyDesc(pri, "host", "ord", "tie", k = 4)
      .select(col("host"),
        concat(lit("https://"), col("host"), lit("/p"),
          col("tie").cast("string")).as("url"),
        when(col("ord") >= 1000000000L, "new").otherwise("stale")
          .as("status"),
        col("rank").as("fetch_order"))
    if (!delayBudget) ranked
    else {
      val delays = Robots.selectCrawlDelay(directives, uaToken = "GraftBot")
        .withColumnRenamed("host", "_dh")
      // when(), not coalesce(least(greatest(...))): both Spark's and
      // DuckDB's least/greatest SKIP nulls, so a missing delay would
      // collapse to greatest(1, null) = 1 instead of the full budget
      ranked.join(delays, col("host") === col("_dh"), "left")
        .withColumn("budget",
          when(col("crawl_delay").isNotNull,
            least(lit(4L), greatest(lit(1L),
              floor(lit(frontierCycleSecs) / col("crawl_delay")))))
            .otherwise(lit(4L)))
        .filter(col("fetch_order") <= col("budget"))
        .select(col("host"), col("url"), col("status"), col("fetch_order"),
          col("budget"))
    }
  }

  /** The q205 NESTED sitemap fixture: one (host, url, xml) row per
    * sitemap file — a root index pointing at a sub-index (s0, dated)
    * and a leaf (s1); the sub-index lists two more leaves (sA, sB)
    * and points BACK at the root (the cycle the expansion guard must
    * absorb). Leaves carry 4 urls each, every 2nd dated from
    * (sn + 3l + 5i). Derived identically by the oracle. */
  private def nestedSitemapBodies(s: SparkSession, d: String): DataFrame = {
    val hs = hostsWithSn(s, d)
    def smBlock(path: String,
                dated: Option[org.apache.spark.sql.Column])
        : org.apache.spark.sql.Column = concat(
      lit("<sitemap>\n  <loc> https://"), col("host"), lit(path),
      lit(" </loc>\n"),
      dated.map(dt => concat(lit("  <lastmod>2026-07-"),
        lpad(dt.cast("string"), 2, "0"), lit("</lastmod>\n")))
        .getOrElse(lit("")),
      lit("</sitemap>"))
    val root = hs.select(col("host"),
      concat(lit("https://"), col("host"), lit("/sitemap_index.xml"))
        .as("url"),
      concat(lit("<?xml version=\"1.0\"?>\n<sitemapindex>\n"),
        smBlock("/s0.xml", Some((col("sn") % 28) + 1)), lit("\n"),
        smBlock("/s1.xml", None),
        lit("\n</sitemapindex>")).as("xml"))
    val sub = hs.select(col("host"),
      concat(lit("https://"), col("host"), lit("/s0.xml")).as("url"),
      concat(lit("<?xml version=\"1.0\"?>\n<sitemapindex>\n"),
        smBlock("/sA.xml", None), lit("\n"),
        smBlock("/sB.xml", None), lit("\n"),
        smBlock("/sitemap_index.xml", None),
        lit("\n</sitemapindex>")).as("xml"))
    val leaves = hs
      .select(col("host"), col("sn"),
        explode(array(lit(0), lit(1), lit(2))).as("l"))
      .select(col("host"), col("sn"), col("l"),
        element_at(array(lit("s1"), lit("sA"), lit("sB")), col("l") + 1)
          .as("name"))
      .select(col("host"),
        concat(lit("https://"), col("host"), lit("/"), col("name"),
          lit(".xml")).as("url"),
        concat(lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
          array_join(transform(sequence(lit(0), lit(3)), i =>
            concat(lit("<url>\n  <loc>https://"), col("host"), lit("/"),
              col("name"), lit("/p"), i.cast("string"), lit("</loc>\n"),
              when(i % 2 === 0,
                concat(lit("  <lastmod>2026-08-"),
                  lpad(((col("sn") + col("l") * 3 + i * 5) % 28 + 1)
                    .cast("string"), 2, "0"),
                  lit("</lastmod>\n"))).otherwise(lit("")),
              lit("</url>"))), "\n"),
          lit("\n</urlset>")).as("xml"))
    root.unionByName(sub).unionByName(leaves)
  }

  /** The q202 sitemap-INDEX fixture: one index body per host listing
    * two child sitemaps (child 0 carries a lastmod, child 1 doesn't),
    * plus the child bodies keyed by (host, child url) — 5 urls each,
    * every 2nd dated from (sn + 3c + 5i). Both derived identically by
    * the oracle. */
  private def sitemapIndexDf(s: SparkSession, d: String): DataFrame =
    hostsWithSn(s, d).select(col("host"), concat(
      lit("<?xml version=\"1.0\"?>\n<sitemapindex>\n"),
      array_join(transform(sequence(lit(0), lit(1)), c =>
        concat(lit("<sitemap>\n  <loc> https://"), col("host"), lit("/s"),
          c.cast("string"), lit(".xml </loc>\n"),
          when(c === 0,
            concat(lit("  <lastmod>2026-07-"),
              lpad(((col("sn") % 28) + 1).cast("string"), 2, "0"),
              lit("</lastmod>\n"))).otherwise(lit("")),
          lit("</sitemap>"))), "\n"),
      lit("\n</sitemapindex>")).as("sitemap_index"))

  private def childSitemapsDf(s: SparkSession, d: String): DataFrame =
    hostsWithSn(s, d)
      .select(col("host"), col("sn"),
        explode(sequence(lit(0), lit(1))).as("c"))
      .select(col("host"),
        concat(lit("https://"), col("host"), lit("/s"),
          col("c").cast("string"), lit(".xml")).as("child_url"),
        concat(
          lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
          array_join(transform(sequence(lit(0), lit(4)), i =>
            concat(lit("<url>\n  <loc>https://"), col("host"), lit("/c"),
              col("c").cast("string"), lit("p"), i.cast("string"),
              lit("</loc>\n"),
              when(i % 2 === 0,
                concat(lit("  <lastmod>2026-08-"),
                  lpad(((col("sn") + col("c") * 3 + i * 5) % 28 + 1)
                    .cast("string"), 2, "0"),
                  lit("</lastmod>\n"))).otherwise(lit("")),
              lit("</url>"))), "\n"),
          lit("\n</urlset>")).as("sitemap"))

  /** The q178/q179 sitemap fixture: one XML body per host, 10 urls,
    * every 3rd entry carrying a lastmod derived from (sn + i); loc
    * values carry stray whitespace the parser must strip. */
  private def sitemapBodiesDf(s: SparkSession, d: String): DataFrame =
    hostsWithSn(s, d).select(col("host"), concat(
      lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
      array_join(transform(sequence(lit(0), lit(9)), i =>
        concat(lit("<url>\n  <loc> https://"), col("host"), lit("/p"),
          i.cast("string"), lit(" </loc>\n"),
          when(i % 3 === 0,
            concat(lit("  <lastmod>2026-08-"),
              lpad(((col("sn") + i) % 28 + 1).cast("string"), 2, "0"),
              lit("</lastmod>\n"))).otherwise(lit("")),
          lit("</url>"))), "\n"),
      lit("\n</urlset>")).as("sitemap"))

  /** The q179 crawl-state fixture: urls p0..p6 fetched (p7..p9 never
    * — the 'new' class), last_fetch dates carved from (2·sn + 5·i) so
    * dated entries split into stale and fresh. */
  private def crawlStateDf(s: SparkSession, d: String): DataFrame =
    hostsWithSn(s, d)
      .select(col("host"), col("sn"),
        explode(sequence(lit(0), lit(6))).as("i"))
      .select(
        concat(lit("https://"), col("host"), lit("/p"),
          col("i").cast("string")).as("url"),
        concat(lit("2026-08-"),
          lpad(((col("sn") * 2 + col("i") * 5) % 28 + 1).cast("string"),
            2, "0")).as("last_fetch"))

  private def hostsWithSn(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(concat(col("source"), lit(".example.org")).as("host"),
        expr("substring(source, 4)").cast("int").as("sn"))
      .distinct()

  /** The q176/q177 doc fixture: q174's path classes plus the
    * source-derived host. */
  private def robotsDocsDf(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents").select(col("doc_id"),
      concat(col("source"), lit(".example.org")).as("host"),
      concat(lit("/"),
        when(col("doc_id") % 4 === 0, "docs")
          .when(col("doc_id") % 4 === 1, "static")
          .when(col("doc_id") % 4 === 2, "api").otherwise("img"),
        lit("/p"), (col("doc_id") % 5).cast("string"),
        lit("/x"), (col("doc_id") % 7).cast("string")).as("path"))

  /** The four robots.txt body classes (host class = source number
    * mod 4), shared verbatim with the oracle. Class 0: exact group
    * + an ignored star group, comment + blank lines. Class 1: star
    * group only — selection falls back to `*` — whose root
    * `Disallow: /` pins the m=0 probe key (the most common robots
    * rule must block EVERY path, `/docs` carved back out, a longer
    * literal still winning matched_rule). Class 2: a multi-UA
    * header block (otherbot + graftbot share one group). Class 3: an
    * empty `Disallow:` (allow-all, still terminates the header) plus
    * a `$`-anchored allow carved out of a prefix disallow.
    *
    * Crawl-delays (consumed by q192): class 0 states 10s in the exact
    * group and a 1s decoy in the star group that MUST lose group
    * selection; class 1 states 15s in its star group (governing —
    * no exact group); class 2 states 60s (longer than the cycle);
    * class 3 states none. All delay lines sit at group END so the
    * group numbering of q175–q180 is untouched. */
  private[queries] val robotsBodies: Seq[String] = Seq(
    """# graft crawl policy
      |User-agent: graftbot
      |Disallow: /static
      |Allow: /static/p1
      |Disallow: /*/p2
      |Crawl-delay: 10
      |
      |User-agent: *
      |Disallow: /
      |Crawl-delay: 1""".stripMargin,
    """User-agent: *
      |Disallow: /
      |Allow: /docs
      |Disallow: /img/*/x5
      |Crawl-delay: 15""".stripMargin,
    """User-agent: otherbot
      |User-agent: graftbot
      |Disallow: /docs
      |Allow: /docs/*/x3
      |Crawl-delay: 60
      |
      |User-agent: *
      |Disallow: /""".stripMargin,
    """User-agent: graftbot
      |Disallow:
      |Disallow: /api
      |Allow: /api/p0/x1$""".stripMargin)

  /** One robots body per distinct host, class-keyed on the source
    * number — the q175/q176 fixture both engines derive identically.
    * Classes 0 and 2 additionally declare their host's sitemap
    * (`Sitemap:` is host-dependent, so it is appended here rather
    * than living in the class literals); the directive parser drops
    * the line before the group window on both engines, so every
    * group-based query is untouched — only q200 consumes it. */
  private def robotsBodiesDf(s: SparkSession, d: String): DataFrame =
    hostsWithSn(s, d).select(col("host"),
      concat(
        element_at(array(robotsBodies.map(lit): _*),
          (pmod(col("sn"), lit(4)) + 1).cast("int")),
        when(pmod(col("sn"), lit(4)).isin(0, 2),
          concat(lit("\nSitemap: https://"), col("host"),
            lit("/sitemap.xml")))
          .otherwise(lit(""))).as("robots"))

  /** The robots path rules shared by q166's query and oracle. */
  private[queries] val pathRules: Seq[(String, String)] = Seq(
    "/static" -> "disallow", "/static/p1" -> "allow",
    "/api" -> "disallow", "/docs/p2/x3" -> "disallow")

  /** The robots wildcard/anchor rules shared by q174's query and
    * oracle. Scenarios: `/static/p2/...` hits both `/static` (lit 7)
    * and the star-p2 rule (lit 4) — the literal wins; `/docs/p2/x3`
    * hits the docs-star-x3 rule (lit 9) over star-p2 — the longer
    * star rule wins; `/api/p0/x1` exactly hits the anchored allow
    * carved out of the `/api` disallow; the img rule stars its middle
    * segment. */
  private[queries] val robotsRules: Seq[(String, String)] = Seq(
    "/static" -> "disallow", "/static/p1" -> "allow",
    "/*/p2" -> "disallow", "/docs/*/x3" -> "allow",
    "/api" -> "disallow", "/api/p0/x1$" -> "allow",
    "/img/*/x5" -> "disallow",
    // the cap probe pair: /deep matches within the 8-segment probe
    // cap; the 9-segment allow rule sits BEYOND it and must never win
    "/deep" -> "disallow",
    "/deep/d1/d2/d3/d4/d5/d6/d7/d8" -> "allow")

  /** The 12-segment q174 path that crosses the probe cap. */
  private[queries] val deepPath: String =
    "/deep" + (1 to 11).map(i => s"/d$i").mkString

  /** The q207 FULL-RFC rule set (spanning/intra-segment stars,
    * anchors, a literal underscore), shared verbatim with the oracle.
    * The deep-path allow pair deliberately mirrors q174's so the
    * capped-vs-uncapped divergence is pinned by BOTH hashes. */
  private[queries] val rfcRules: Seq[(String, String)] = Seq(
    "/static" -> "disallow",
    "/static*1" -> "allow",   // intra/spanning star beats /static where a '1' follows
    "/*/p2" -> "disallow",    // leading star spans the first segment(s)
    "/docs*x3" -> "allow",    // spanning star across segments
    "/api" -> "disallow", "/api/p0/x1$" -> "allow",
    "/img/*/x5" -> "disallow",
    "/deep" -> "disallow",
    "/deep/d1/d2/d3/d4/d5/d6/d7/d8" -> "allow", // reachable here: no cap
    "/a_b" -> "disallow",     // '_' is a literal octet, never a wildcard
    // the precedence-flip pair (RFC most-octets vs literal-octets):
    // on /page1 the 6-octet 'Allow: /page*' outranks the 5-octet
    // 'Disallow: /page' — a literal-octet rank would flip the verdict
    "/page" -> "disallow", "/page*" -> "allow",
    // §2.2.2 octet comparison: the %31 path spells this %2F in
    // lowercase hex — raw string compare would miss it
    "/a%2Fb" -> "disallow")

  /** PSL rules shared by q172/q173's query and oracle — one of each
    * kind, plus the exception carved out of the wildcard. */
  private[queries] val pslRules: Seq[String] =
    Seq("org", "com", "example.org", "*.pages.org", "!keep.pages.org")

  /** The q172/q173 host fixture: five PSL shapes carved
    * deterministically out of (doc_id, source) in both engines. */
  private def pslHosts(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents").select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
          concat(lit("a."), col("source"), lit(".example.org")))
        .when(col("doc_id") % 5 === 1, concat(col("source"), lit(".com")))
        .when(col("doc_id") % 5 === 2,
          concat(lit("x.y."), col("source"), lit(".pages.org")))
        .when(col("doc_id") % 5 === 3, lit("b.keep.pages.org"))
        .otherwise(lit("org")).as("host"))

  // ---- oracle SQL ----------------------------------------------------

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def replaceChainSql(x: String, table: Seq[(String, String)]): String =
    table.foldLeft(x) { case (acc, (f, t)) =>
      s"replace($acc, ${sqlLit(f)}, ${sqlLit(t)})" }

  /** The DuckDB mirror of [[TextNormalize.cleanText]] applied to the
    * SQL expression `x` — shared with the q154/q164 capstone oracles.
    * Stage order mirrors the Scala side exactly: repair → strip → NFC
    * → repair → NFC → fold (see cleanText's scaladoc for why each
    * position is load-bearing). */
  def cleanSql(x: String): String = {
    val repaired1 = replaceChainSql(x, TextNormalize.MojibakeTable)
    val stripped =
      s"""regexp_replace($repaired1,
            ${sqlLit(TextNormalize.ControlRe)}, '', 'g')"""
    val repaired2 = replaceChainSql(s"nfc_normalize($stripped)",
      TextNormalize.MojibakeTable)
    replaceChainSql(s"nfc_normalize($repaired2)",
      TextNormalize.PunctFoldTable)
  }

  /** RFC 3986 §6.2.2.2 percent-octet normalization over `x`,
    * mirroring [[graft.operators.UrlCanon.percentNormalize]] move for
    * move: chr(1)-sentinel split at every `%`, decode unreserved
    * octets (ALPHA / DIGIT / `-._~`), uppercase the hex of the rest,
    * pass malformed `%`-heads through untouched. Shared by the canon
    * chain (step 0) and the RFC robots oracles (§2.2.2 path/rule
    * octet comparison). */
  private[queries] def pctNormSql(x: String): String = {
    val code = "CAST('0x' || upper(substr(s, 2, 2)) AS INTEGER)"
    s"""coalesce(array_to_string(list_transform(
          string_split(replace(replace($x, chr(1), ''),
            '%', chr(1) || '%'), chr(1)),
          s -> CASE
            WHEN starts_with(s, '%') AND length(s) >= 3
                 AND regexp_matches(upper(substr(s, 2, 2)),
                                    '^[0-9A-F]{2}$$')
            THEN CASE WHEN ($code BETWEEN 65 AND 90)
                        OR ($code BETWEEN 97 AND 122)
                        OR ($code BETWEEN 48 AND 57)
                        OR $code IN (45, 46, 95, 126)
                      THEN chr($code) || substr(s, 4)
                      ELSE '%' || upper(substr(s, 2, 2)) || substr(s, 4)
                 END
            ELSE s END), ''), $x)"""
  }

  /** The q159 canonicalization chain as a composable CTE list: expects
    * a CTE `ud(doc_id, url)`, yields `c(doc_id, url, canonical_url)`.
    * Splice as `WITH ud AS (...), $urlCanonChainSql SELECT ... FROM c`.
    * The q164 crawl-admission capstone embeds it unchanged. */
  private[queries] lazy val urlCanonChainSql: String =
    s"""s0 AS (SELECT doc_id, url, ${pctNormSql("url")} AS u0 FROM ud),
          """ +
    """s1 AS (SELECT doc_id, url, regexp_replace(u0, '#.*$', '') AS u
                 FROM s0),
          s2 AS (SELECT doc_id, url,
                   lower(regexp_extract(u, '^([^/?#]*://[^/?#]*)', 1))
                   || regexp_replace(u, '^[^/?#]*://[^/?#]*', '') AS u
                 FROM s1),
          s3 AS (SELECT doc_id, url,
                   regexp_replace(u, '^(https?://)www\.', '\1') AS u FROM s2),
          s4 AS (SELECT doc_id, url,
                   regexp_replace(regexp_replace(u,
                     '^(https://[^/:?#]*):443([/?].*)?$', '\1\2'),
                     '^(http://[^/:?#]*):80([/?].*)?$', '\1\2') AS u FROM s3),
          s5 AS (SELECT doc_id, url,
                   regexp_replace(regexp_extract(u, '^([^?]*)', 1),
                     '([^/])/$', '\1') AS base,
                   regexp_extract(u, '\?(.*)$', 1) AS qs FROM s4),
          s6 AS (SELECT doc_id, url, base,
                   coalesce(array_to_string(list_sort(list_filter(
                     string_split(qs, '&'),
                     p -> p <> '' AND NOT starts_with(p, 'utm_')
                          AND NOT starts_with(p, 'fbclid=')
                          AND NOT starts_with(p, 'gclid='))), '&'), '') AS q2
                 FROM s5),
          c AS (SELECT doc_id, url,
                  base || (CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END)
                    AS canonical_url
                FROM s6)"""

  /** The q160 longest-suffix rule chain as a composable CTE list:
    * expects `hd(doc_id, host)`, yields
    * `hb(doc_id, matched_rule, action)` (matched rows only — LEFT JOIN
    * and coalesce the default at the use site). */
  private[queries] def hostRulesChainSql(rules: Seq[(String, String)]): String = {
    val values = rules.map { case (r, a) => s"('$r', '$a')" }
      .mkString(",\n                  ")
    s"""hp AS (SELECT doc_id, host, string_split(host, '.') AS parts
                 FROM hd),
          hsx AS (SELECT doc_id, host,
                   array_to_string(parts[CAST(t.i AS INTEGER):], '.') AS suffix,
                   len(parts) - t.i + 1 AS n_labels
                 FROM hp, unnest(range(1, len(parts) + 1)) AS t(i)),
          hr AS (SELECT * FROM (VALUES
                  $values) t(rule, action)),
          hm AS (SELECT doc_id, rule, action,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY n_labels DESC) AS rn
                FROM hsx JOIN hr ON hsx.suffix = hr.rule),
          hb AS (SELECT doc_id, rule AS matched_rule, action FROM hm
                WHERE rn = 1)"""
  }

  /** The crawl rule list shared by q160 and the q164 capstone. */
  private[queries] val crawlRules: Seq[(String, String)] = Seq(
    "src7.example.org" -> "block", "ads.src7.example.org" -> "allow",
    "src2.example.org" -> "block", "cdn.src4.example.org" -> "block")

  def oracles: Map[String, String] = Map(
    "q152_text_normalize" -> {
      val cleaned = cleanSql("dirty")
      s"""WITH docs_e AS (${Tables.documentsWithEdgesSql}),
          d AS (SELECT doc_id, ${sqlLit(DirtyPrefix)} || text AS dirty
                FROM docs_e),
          c AS (SELECT doc_id, dirty, $cleaned AS clean_text FROM d)
          SELECT doc_id, clean_text,
                 CAST(length(dirty) AS BIGINT) AS n_chars_dirty,
                 CAST(length(clean_text) AS BIGINT) AS n_chars_clean,
                 dirty <> clean_text AS changed
          FROM c"""
    },

    // The canonicalization chain mirrors UrlCanon.canonicalize step
    // for step; every pattern is RE2-portable so both engines run the
    // SAME rewrites. array_to_string([]) is NULL in DuckDB (engine
    // parity note) → coalesce.
    "q159_url_canonicalize" ->
      s"""WITH ud AS (
            SELECT doc_id,
              (CASE WHEN (doc_id // 100) % 2 = 1
                    THEN 'HTTPS://' ELSE 'https://' END)
              || (CASE WHEN (doc_id // 100) IN (1, 3) THEN 'www.' ELSE '' END)
              || (CASE WHEN (doc_id // 100) = 3
                       THEN 'Example.COM' ELSE 'example.com' END)
              || (CASE WHEN (doc_id // 100) = 2 THEN ':443' ELSE '' END)
              || '/p/' || CAST(doc_id % 100 AS VARCHAR)
              || (CASE WHEN (doc_id % 100) % 9 = 0
                       THEN '/e%34%2f%5a' ELSE '' END)
              || (CASE WHEN (doc_id // 100) = 4 THEN '/' ELSE '' END)
              || (CASE (doc_id % 100) % 4
                    WHEN 1 THEN '?utm_source=feed'
                    WHEN 2 THEN '?b=2&a=1&utm_campaign=x'
                    WHEN 3 THEN '?a=1&b=2' ELSE '' END)
              || (CASE WHEN (doc_id // 100) = 1 THEN '#top' ELSE '' END) AS url
            FROM documents),
          $urlCanonChainSql
          SELECT doc_id, url, canonical_url,
                 min(doc_id) OVER (PARTITION BY canonical_url)
                   AS keeper_doc_id,
                 CAST(count(*) OVER (PARTITION BY canonical_url) AS BIGINT)
                   AS n_dups
          FROM c""",

    // Longest-suffix rule matching mirrored via the same suffix-chain
    // explode; suffix position 0 is the longest, so rn=1 under
    // ORDER BY n_labels DESC ≡ the Spark side's ORDER BY pos.
    "q160_host_rules" ->
      s"""WITH hd AS (SELECT doc_id,
               (CASE doc_id % 3 WHEN 0 THEN 'cdn.' WHEN 1 THEN 'ads.'
                     ELSE '' END)
               || source || '.example.org' AS host FROM documents),
          ${hostRulesChainSql(crawlRules)}
          SELECT hd.doc_id, hd.host, hb.matched_rule,
                 coalesce(hb.action, 'allow') AS action
          FROM hd LEFT JOIN hb USING (doc_id)""",

    // prefix-chain explode mirrored in SQL; most segments = most
    // specific, ties impossible at segment granularity.
    "q166_path_rules" -> {
      val values = pathRules.map { case (r, a) => s"('$r', '$a')" }
        .mkString(",\n                  ")
      s"""WITH pd AS (SELECT doc_id,
               '/' || (CASE doc_id % 4 WHEN 0 THEN 'docs' WHEN 1 THEN 'static'
                       WHEN 2 THEN 'api' ELSE 'img' END)
               || '/p' || CAST(doc_id % 5 AS VARCHAR)
               || '/x' || CAST(doc_id % 7 AS VARCHAR) AS path
               FROM documents),
          pp AS (SELECT doc_id, path,
                   string_split(regexp_replace(path, '^/', ''), '/') AS parts
                 FROM pd),
          px AS (SELECT doc_id, path, t.i AS n_segs,
                   '/' || array_to_string(parts[1:CAST(t.i AS INTEGER)], '/')
                     AS prefix
                 FROM pp, unnest(range(1, len(parts) + 1)) AS t(i)),
          pr AS (SELECT * FROM (VALUES
                  $values) t(rule, action)),
          pm AS (SELECT doc_id, rule, action,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY n_segs DESC) AS rn
                 FROM px JOIN pr ON px.prefix = pr.rule),
          pb AS (SELECT doc_id, rule AS matched_rule, action FROM pm
                 WHERE rn = 1)
          SELECT pd.doc_id, pd.path, pb.matched_rule,
                 coalesce(pb.action, 'allow') AS action
          FROM pd LEFT JOIN pb USING (doc_id)"""
    },

    "q174_robots_wildcards" -> {
      val values = robotsRules.map { case (r, a) => s"('$r', '$a')" }
        .mkString(",\n                  ")
      s"""WITH pd AS (SELECT doc_id,
               CASE WHEN doc_id % 11 = 0 THEN '$deepPath'
                    ELSE '/' || (CASE doc_id % 4 WHEN 0 THEN 'docs'
                            WHEN 1 THEN 'static'
                            WHEN 2 THEN 'api' ELSE 'img' END)
                       || '/p' || CAST(doc_id % 5 AS VARCHAR)
                       || '/x' || CAST(doc_id % 7 AS VARCHAR) END AS path
               FROM documents),
          pp AS (SELECT doc_id, path,
                   string_split(regexp_replace(path, '^/', ''), '/') AS parts
                 FROM pd),
          px AS (SELECT doc_id, len(parts) AS n, t.m AS m,
                   '/' || coalesce(array_to_string(
                     list_transform(range(1, CAST(t.m AS INTEGER) + 1),
                       j -> CASE WHEN (s.mask >> CAST(j - 1 AS INTEGER)) & 1 = 1
                                 THEN '*'
                                 ELSE parts[CAST(j AS INTEGER)] END), '/'), '')
                     AS key0
                 FROM pp, unnest(range(0, least(len(parts), 8) + 1)) AS t(m),
                      unnest(range(0, 1 << CAST(t.m AS INTEGER))) AS s(mask)),
          pk AS (SELECT doc_id, key0 AS key FROM px
                 UNION ALL
                 SELECT doc_id, key0 || '$$' FROM px WHERE m = n AND n <= 8),
          pr AS (SELECT * FROM (VALUES
                  $values) t(rule, action)),
          pm AS (SELECT doc_id, rule, action,
                   row_number() OVER (PARTITION BY doc_id ORDER BY
                     length(replace(replace(rule, '*', ''), '$$', '')) DESC,
                     length(rule) - length(replace(rule, '*', '')) ASC,
                     CASE WHEN action = 'allow' THEN 0 ELSE 1 END, rule) AS rn
                 FROM pk JOIN pr ON pk.key = pr.rule),
          pb AS (SELECT doc_id, rule AS matched_rule, action FROM pm
                 WHERE rn = 1)
          SELECT pd.doc_id, pd.path, pb.matched_rule,
                 coalesce(pb.action, 'allow') AS action
          FROM pd LEFT JOIN pb USING (doc_id)"""
    },

    "q175_robots_parse" ->
      s"""WITH $robotsBodiesSql,
          $robotsParseSql
          SELECT host, rule, action FROM rules""",

    // End-to-end: q174's probe expansion carrying the host, joined to
    // the PARSED per-host rule table on (host, key) — same precedence.
    "q176_robots_e2e" -> robotsE2eSql,

    // The projection variant computes the IDENTICAL relation (proved
    // ≡ in RobotsSpec) — one oracle text serves both, so an engine
    // regression in either variant breaks its own hash.
    "q177_robots_projected" -> robotsE2eSql,

    "q178_sitemap_parse" ->
      s"""WITH $sitemapEntriesSql
          SELECT host, url, lastmod FROM entries""",

    "q179_recrawl_plan" ->
      s"""WITH $sitemapEntriesSql,
          $crawlStateSql
          SELECT e.host, e.url, e.lastmod, st.last_fetch,
                 CASE WHEN st.last_fetch IS NULL THEN 'new'
                      WHEN e.lastmod IS NOT NULL
                           AND e.lastmod > st.last_fetch THEN 'stale'
                      ELSE 'fresh' END AS status
          FROM entries e LEFT JOIN st USING (url)""",

    // Frontier scheduling: the q179 plan CTEs, the q175 parse chain,
    // and the q176 probe expansion (keyed by url) compose verbatim —
    // a regression in ANY crawl stage breaks this capstone's hash as
    // well as its own. The budget window mirrors TopK.perKeyDesc's
    // (ord desc, tie asc) exactly.
    "q180_frontier_schedule" ->
      s"""$frontierCoreSql
          SELECT host, url, status, CAST(rn AS BIGINT) AS fetch_order
          FROM rk WHERE rn <= 4""",

    // q192: the q180 chain verbatim plus the Crawl-delay budget — the
    // dl CTE reuses gg/pick from the parse chain (same group
    // selection the rules use), budget = min(4, max(1, floor(30/delay)))
    // with 4 the no-delay default; both the rank cap and the budget
    // cap apply.
    "q192_frontier_crawl_delay" ->
      s"""$frontierCoreSql,
          dl AS (SELECT gg.host AS host, max(try_cast(v AS DOUBLE)) AS delay
                 FROM gg JOIN pick ON gg.host = pick.host
                                  AND gg.grp = pick.grp
                 WHERE k = 'crawl-delay' AND try_cast(v AS DOUBLE) > 0
                   AND NOT isnan(try_cast(v AS DOUBLE))
                 GROUP BY gg.host),
          bj AS (SELECT rk.host, rk.url, rk.status, rk.rn,
                   CASE WHEN dl.delay IS NOT NULL
                        THEN least(4, greatest(1,
                          CAST(floor(30.0 / dl.delay) AS BIGINT)))
                        ELSE 4 END AS budget
                 FROM rk LEFT JOIN dl USING (host))
          SELECT host, url, status, CAST(rn AS BIGINT) AS fetch_order,
                 CAST(budget AS BIGINT) AS budget
          FROM bj WHERE rn <= 4 AND rn <= budget""",

    // eTLD+1 budget: the q193 candidate fixture (two sub-hosts per
    // source, tie = 2·page+si), the shared PSL chain for the domain
    // key, one row_number window per domain mirroring the bounded
    // TopK. `//` is DuckDB's truncating integer division — exact for
    // the non-negative tie.
    "q193_frontier_etld1_budget" ->
      s"""WITH sm AS (SELECT DISTINCT source || '.example.org' AS base,
                 CAST(substr(source, 4) AS INTEGER) AS sn FROM documents),
          cd AS (SELECT sn * 100 + t.i * 2 + s.si AS doc_id,
                   (CASE WHEN s.si = 0 THEN 'www' ELSE 'cdn' END)
                     || '.' || base AS host,
                   CAST((sn * 3 + t.i * 7 + s.si * 13) % 50 AS DOUBLE)
                     AS ord,
                   CAST(t.i * 2 + s.si AS BIGINT) AS tie
                 FROM sm, unnest(range(0, 10)) AS t(i),
                      (VALUES (0), (1)) AS s(si)),
          hd AS (SELECT doc_id, host FROM cd),
          $pslChainSql,
          pri AS (SELECT coalesce(e.etld1, e.public_suffix) AS domain,
                    cd.ord, cd.tie
                  FROM eres e JOIN cd USING (doc_id)),
          rk AS (SELECT domain, tie,
                   row_number() OVER (PARTITION BY domain
                                      ORDER BY ord DESC, tie) AS rn
                 FROM pri)
          SELECT domain,
                 'https://' || (CASE WHEN tie % 2 = 0 THEN 'www'
                                     ELSE 'cdn' END)
                   || '.' || domain || '/p' || CAST(tie // 2 AS VARCHAR)
                   AS url,
                 CAST(rn AS BIGINT) AS fetch_order
          FROM rk WHERE rn <= 4""",

    // Sitemap index: the same block-walk chain at both levels —
    // <sitemap> blocks from the index (the pattern's immediate '>'
    // keeps <sitemapindex> from over-matching), children joined on
    // (host, child url), <url> blocks from the child bodies with the
    // child's url/lastmod carried through.
    "q202_sitemap_index" ->
      raw"""WITH sm AS (SELECT DISTINCT source || '.example.org' AS host,
                 CAST(substr(source, 4) AS INTEGER) AS sn FROM documents),
          ix AS (SELECT host,
                 '<?xml version="1.0"?>' || chr(10) || '<sitemapindex>'
                 || chr(10)
                 || array_to_string(list_transform(range(0, 2), c ->
                   '<sitemap>' || chr(10) || '  <loc> https://' || host
                   || '/s' || CAST(c AS VARCHAR) || '.xml </loc>' || chr(10)
                   || (CASE WHEN c = 0 THEN '  <lastmod>2026-07-' ||
                        lpad(CAST((sn % 28) + 1 AS VARCHAR), 2, '0') ||
                        '</lastmod>' || chr(10) ELSE '' END)
                   || '</sitemap>'), chr(10))
                 || chr(10) || '</sitemapindex>' AS xml
                 FROM sm),
          cb AS (SELECT host, sn, t.c AS c,
                   'https://' || host || '/s' || CAST(t.c AS VARCHAR)
                     || '.xml' AS child_url,
                   '<?xml version="1.0"?>' || chr(10) || '<urlset>'
                   || chr(10)
                   || array_to_string(list_transform(range(0, 5), i ->
                     '<url>' || chr(10) || '  <loc>https://' || host
                     || '/c' || CAST(t.c AS VARCHAR) || 'p'
                     || CAST(i AS VARCHAR) || '</loc>' || chr(10)
                     || (CASE WHEN i % 2 = 0 THEN '  <lastmod>2026-08-' ||
                          lpad(CAST((sn + t.c * 3 + i * 5) % 28 + 1
                            AS VARCHAR), 2, '0') ||
                          '</lastmod>' || chr(10) ELSE '' END)
                     || '</url>'), chr(10))
                   || chr(10) || '</urlset>' AS sitemap
                 FROM sm, unnest(range(0, 2)) AS t(c)),
          ib AS (SELECT host, unnest(regexp_extract_all(xml,
                   '<sitemap>([\s\S]*?)</sitemap>', 1)) AS block FROM ix),
          ch AS (SELECT host,
                   regexp_extract(block, '<loc>\s*([\s\S]*?)\s*</loc>', 1)
                     AS child_url,
                   regexp_extract(block,
                     '<lastmod>\s*([\s\S]*?)\s*</lastmod>', 1) AS clm
                 FROM ib),
          chx AS (SELECT host, child_url,
                    CASE WHEN clm = '' THEN NULL ELSE clm END
                      AS child_lastmod
                  FROM ch WHERE child_url <> ''),
          jb AS (SELECT chx.host, chx.child_url, chx.child_lastmod,
                   unnest(regexp_extract_all(cb.sitemap,
                     '<url>([\s\S]*?)</url>', 1)) AS block
                 FROM chx JOIN cb ON chx.host = cb.host
                                 AND chx.child_url = cb.child_url),
          ex AS (SELECT host, child_url, child_lastmod,
                   regexp_extract(block, '<loc>\s*([\s\S]*?)\s*</loc>', 1)
                     AS url,
                   regexp_extract(block,
                     '<lastmod>\s*([\s\S]*?)\s*</lastmod>', 1) AS lm
                 FROM jb)
          SELECT host, child_url, child_lastmod, url,
                 CASE WHEN lm = '' THEN NULL ELSE lm END AS lastmod
          FROM ex WHERE url <> ''""",

    // Sitemap discovery: the group-independent line scan mirrored —
    // only hosts whose robots body declares the sitemap contribute
    // entries (classes 0/2).
    "q200_robots_sitemap_discovery" ->
      s"""WITH $robotsBodiesSql,
          $sitemapEntriesSql,
          dl AS (SELECT host,
                   trim(regexp_extract(l.line, '^[A-Za-z-]+\\s*:\\s*(.*)$$', 1))
                     AS sitemap_url
                 FROM (SELECT host,
                         trim(regexp_replace(
                           unnest(string_split(replace(robots, chr(13), ''),
                                               chr(10))), '#.*$$', '')) AS line
                       FROM rb) l
                 WHERE regexp_matches(lower(l.line), '^sitemap\\s*:')),
          ds AS (SELECT DISTINCT host, sitemap_url FROM dl
                 WHERE regexp_matches(sitemap_url, '^[a-z][a-z0-9+.-]*://'))
          SELECT e.host, ds.sitemap_url, e.url, e.lastmod
          FROM entries e JOIN ds
            ON e.host = ds.host
           AND ds.sitemap_url = 'https://' || e.host || '/sitemap.xml'""",

    // The politeness capstone: PSL domain key + per-sub-host robots
    // parse + conservative MAX delay per domain + the shared bounded
    // budget — the q193 chain with dl/dd/bg spliced in. The parse
    // chain (robotsParseSql) expects rb(host, robots); here rb is the
    // SUB-host fixture.
    "q201_frontier_domain_delay" ->
      s"""WITH sm AS (SELECT DISTINCT source || '.example.org' AS base,
                 CAST(substr(source, 4) AS INTEGER) AS sn FROM documents),
          cd AS (SELECT sn * 100 + t.i * 2 + s.si AS doc_id,
                   (CASE WHEN s.si = 0 THEN 'www' ELSE 'cdn' END)
                     || '.' || base AS host,
                   sn,
                   CAST((sn * 3 + t.i * 7 + s.si * 13) % 50 AS DOUBLE)
                     AS ord,
                   CAST(t.i * 2 + s.si AS BIGINT) AS tie
                 FROM sm, unnest(range(0, 10)) AS t(i),
                      (VALUES (0), (1)) AS s(si)),
          hd AS (SELECT doc_id, host FROM cd),
          $pslChainSql,
          rb AS (SELECT DISTINCT host,
                   CASE sn % 4
                     WHEN 0 THEN ${sqlLit(robotsBodies(0))}
                     WHEN 1 THEN ${sqlLit(robotsBodies(1))}
                     WHEN 2 THEN ${sqlLit(robotsBodies(2))}
                     ELSE ${sqlLit(robotsBodies(3))} END AS robots
                 FROM cd),
          $robotsParseSql,
          dl AS (SELECT gg.host AS host, max(try_cast(v AS DOUBLE)) AS delay
                 FROM gg JOIN pick ON gg.host = pick.host
                                  AND gg.grp = pick.grp
                 WHERE k = 'crawl-delay' AND try_cast(v AS DOUBLE) > 0
                   AND NOT isnan(try_cast(v AS DOUBLE))
                 GROUP BY gg.host),
          dd AS (SELECT e.dom AS domain, max(dl.delay) AS delay
                 FROM (SELECT eres.doc_id,
                         coalesce(eres.etld1, eres.public_suffix) AS dom,
                         eres.host
                       FROM eres) e
                 LEFT JOIN dl ON e.host = dl.host
                 GROUP BY e.dom),
          bg AS (SELECT domain,
                   CASE WHEN delay IS NOT NULL
                        THEN least(4, greatest(1,
                          CAST(floor(30.0 / delay) AS BIGINT)))
                        ELSE 4 END AS budget
                 FROM dd),
          pri AS (SELECT coalesce(e2.etld1, e2.public_suffix) AS domain,
                    cd.ord, cd.tie
                  FROM eres e2 JOIN cd USING (doc_id)),
          rk AS (SELECT domain, tie,
                   row_number() OVER (PARTITION BY domain
                                      ORDER BY ord DESC, tie) AS rn
                 FROM pri)
          SELECT rk.domain,
                 'https://' || (CASE WHEN tie % 2 = 0 THEN 'www'
                                     ELSE 'cdn' END)
                   || '.' || rk.domain || '/p' || CAST(tie // 2 AS VARCHAR)
                   AS url,
                 CAST(rn AS BIGINT) AS fetch_order,
                 CAST(bg.budget AS BIGINT) AS budget
          FROM rk JOIN bg ON rk.domain = bg.domain
          WHERE rn <= 4 AND rn <= bg.budget""",

    // The stream-fed capstone recomputed relationally: the q201 chain
    // with the candidate set split into two politeness cycles (pages
    // 0-4 → cycle 0, 5-9 → cycle 1) and the rank window partitioned
    // by (domain, cycle) — the bounded budget resets per cycle, which
    // is exactly what the streaming window aggregation computes.
    "q203_frontier_domain_stream" ->
      s"""WITH sm AS (SELECT DISTINCT source || '.example.org' AS base,
                 CAST(substr(source, 4) AS INTEGER) AS sn FROM documents),
          cd AS (SELECT sn * 100 + t.i * 2 + s.si AS doc_id,
                   (CASE WHEN s.si = 0 THEN 'www' ELSE 'cdn' END)
                     || '.' || base AS host,
                   sn,
                   CAST(CASE WHEN t.i < 5 THEN 0 ELSE 1 END AS BIGINT)
                     AS cycle,
                   CAST((sn * 3 + t.i * 7 + s.si * 13) % 50 AS DOUBLE)
                     AS ord,
                   CAST(t.i * 2 + s.si AS BIGINT) AS tie
                 FROM sm, unnest(range(0, 10)) AS t(i),
                      (VALUES (0), (1)) AS s(si)),
          hd AS (SELECT doc_id, host FROM cd),
          $pslChainSql,
          rb AS (SELECT DISTINCT host,
                   CASE sn % 4
                     WHEN 0 THEN ${sqlLit(robotsBodies(0))}
                     WHEN 1 THEN ${sqlLit(robotsBodies(1))}
                     WHEN 2 THEN ${sqlLit(robotsBodies(2))}
                     ELSE ${sqlLit(robotsBodies(3))} END AS robots
                 FROM cd),
          $robotsParseSql,
          dl AS (SELECT gg.host AS host, max(try_cast(v AS DOUBLE)) AS delay
                 FROM gg JOIN pick ON gg.host = pick.host
                                  AND gg.grp = pick.grp
                 WHERE k = 'crawl-delay' AND try_cast(v AS DOUBLE) > 0
                   AND NOT isnan(try_cast(v AS DOUBLE))
                 GROUP BY gg.host),
          dd AS (SELECT e.dom AS domain, max(dl.delay) AS delay
                 FROM (SELECT eres.doc_id,
                         coalesce(eres.etld1, eres.public_suffix) AS dom,
                         eres.host
                       FROM eres) e
                 LEFT JOIN dl ON e.host = dl.host
                 GROUP BY e.dom),
          bg AS (SELECT domain,
                   CASE WHEN delay IS NOT NULL
                        THEN least(4, greatest(1,
                          CAST(floor(30.0 / delay) AS BIGINT)))
                        ELSE 4 END AS budget
                 FROM dd),
          pri AS (SELECT coalesce(e2.etld1, e2.public_suffix) AS domain,
                    cd.cycle, cd.ord, cd.tie
                  FROM eres e2 JOIN cd USING (doc_id)),
          rk AS (SELECT domain, cycle, tie,
                   row_number() OVER (PARTITION BY domain, cycle
                                      ORDER BY ord DESC, tie) AS rn
                 FROM pri)
          SELECT rk.cycle, rk.domain,
                 'https://' || (CASE WHEN tie % 2 = 0 THEN 'www'
                                     ELSE 'cdn' END)
                   || '.' || rk.domain || '/p' || CAST(tie // 2 AS VARCHAR)
                   AS url,
                 CAST(rn AS BIGINT) AS fetch_order,
                 CAST(bg.budget AS BIGINT) AS budget
          FROM rk JOIN bg ON rk.domain = bg.domain
          WHERE rn <= 4 AND rn <= bg.budget""",

    // Archive round-trip: the oracle never touches the container bytes
    // — it recomputes every extracted field (the %13 quarantine class
    // included) straight from `documents`, so any demux defect (lost
    // record, shifted framing, mangled payload) breaks the hash.
    "q204_archive_extract" ->
      """WITH r AS (SELECT source AS archive,
               CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
                    - 1 AS BIGINT) AS rec_idx,
               CASE WHEN doc_id % 13 = 0 THEN 'corrupt' ELSE 'ok' END
                 AS status,
               CASE WHEN doc_id % 13 = 0 THEN NULL
                    ELSE 'https://' || source || '.example.org/d'
                         || CAST(doc_id AS VARCHAR) END AS url,
               '2026-08-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                 || 'T00:00:00Z' AS fetch_ts,
               CASE WHEN doc_id % 2 = 0 THEN 'text/html'
                    ELSE 'text/plain' END AS mime,
               CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
                 AS n_bytes,
               md5(coalesce(text, '')) AS body_md5
             FROM documents)
          SELECT archive, rec_idx, status, url, fetch_ts, mime, n_bytes,
                 body_md5
          FROM r""",

    // Gzip-member round-trip: the oracle recomputes every field from
    // `documents` WITHOUT compressing anything — compression must be
    // invisible (inflated n_bytes, md5 of the original text) and the
    // %13 poisoned class must surface as corrupt_gzip with the raw
    // 1f 8b prefix provably preserved ('1F8B' || md5(text)).
    "q209_archive_gzip_members" ->
      """WITH r AS (SELECT source AS archive,
               CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
                    - 1 AS BIGINT) AS rec_idx,
               CASE WHEN doc_id % 13 = 0 THEN 'corrupt_gzip' ELSE 'ok' END
                 AS status,
               'https://' || source || '.example.org/d'
                 || CAST(doc_id AS VARCHAR) AS url,
               CASE WHEN doc_id % 2 = 0 THEN 'text/html'
                    ELSE 'text/plain' END AS mime,
               CAST(octet_length(encode(coalesce(text, '')))
                    + CASE WHEN doc_id % 13 = 0 THEN 2 ELSE 0 END
                    AS BIGINT) AS n_bytes,
               CASE WHEN doc_id % 13 = 0
                    THEN '1F8B' || md5(coalesce(text, ''))
                    ELSE md5(coalesce(text, '')) END AS body_pin
             FROM documents)
          SELECT archive, rec_idx, status, url, mime, n_bytes, body_pin
          FROM r""",

    // Real-WARC read recomputed without a byte of WARC: record order
    // (response, +request %3, +metadata %5 per doc), quarantine
    // classes (%7 poisoned member = 40 constant bytes hex-pinned,
    // %13 missing Target-URI), framing lengths and payload md5s from
    // the reconstructed payload STRINGS, and the envelope's verdict
    // (status %2-split 404/200) for ok responses.
    "q219_warc_read" ->
      """WITH c AS (SELECT chr(13) || chr(10) AS rn),
          docs AS (SELECT doc_id, source, coalesce(text, '') AS text
                   FROM documents),
          pay AS (SELECT d.*,
               (CASE WHEN d.doc_id % 2 = 0 THEN 'HTTP/1.1 404 Not Found'
                     ELSE 'HTTP/1.1 200 OK' END)
                 || c.rn || 'Content-Type: text/html' || c.rn || c.rn
                 || d.text AS resp_payload,
               'GET /d' || CAST(d.doc_id AS VARCHAR) || ' HTTP/1.1'
                 || c.rn || 'Host: ' || d.source || '.example.org'
                 || c.rn || c.rn AS req_payload,
               'fetched-from: seed' || chr(10) || 'parent: d'
                 || CAST(d.doc_id AS VARCHAR) || chr(10) AS meta_payload,
               'HTTP/1.1 200 OK' || c.rn || c.rn AS rev_payload,
               'https://' || d.source || '.example.org/d'
                 || CAST(d.doc_id AS VARCHAR) AS url0,
               '2026-08-' || lpad(CAST(d.doc_id % 28 + 1 AS VARCHAR), 2, '0')
                 || 'T00:00:00Z' AS date0
             FROM docs d, c),
          recs AS (
            SELECT source AS archive, doc_id, 0 AS sub,
                   CASE WHEN doc_id % 7 = 0 THEN 'corrupt_gzip'
                        WHEN doc_id % 13 = 0 THEN 'corrupt'
                        ELSE 'ok' END AS status,
                   CASE WHEN doc_id % 7 = 0 THEN NULL
                        ELSE 'response' END AS rec_type,
                   CASE WHEN doc_id % 7 = 0 OR doc_id % 13 = 0 THEN NULL
                        ELSE url0 END AS url,
                   CASE WHEN doc_id % 7 = 0 THEN NULL ELSE date0 END
                     AS warc_date,
                   CASE WHEN doc_id % 7 = 0 THEN NULL
                        ELSE 'application/http; msgtype=response' END
                     AS warc_content_type,
                   NULL AS warc_refers_to,
                   CASE WHEN doc_id % 7 = 0 THEN CAST(40 AS BIGINT)
                        ELSE CAST(octet_length(encode(resp_payload))
                                  AS BIGINT) END AS n_bytes,
                   CASE WHEN doc_id % 7 = 0 OR doc_id % 13 = 0 THEN NULL
                        WHEN doc_id % 2 = 0 THEN CAST(404 AS BIGINT)
                        ELSE CAST(200 AS BIGINT) END AS http_status,
                   CASE WHEN doc_id % 7 = 0 OR doc_id % 13 = 0 THEN NULL
                        ELSE 'text/html' END AS env_content_type,
                   CASE WHEN doc_id % 7 = 0
                        THEN '1F8B08' || repeat('0', 74)
                        ELSE md5(resp_payload) END AS body_pin
            FROM pay
            UNION ALL
            SELECT source, doc_id, 1, 'ok', 'request', url0, date0,
                   'application/http; msgtype=request', NULL,
                   CAST(octet_length(encode(req_payload)) AS BIGINT),
                   NULL, NULL, md5(req_payload)
            FROM pay WHERE doc_id % 3 = 0
            UNION ALL
            SELECT source, doc_id, 2, 'ok', 'metadata', url0, date0,
                   'application/warc-fields', NULL,
                   CAST(octet_length(encode(meta_payload)) AS BIGINT),
                   NULL, NULL, md5(meta_payload)
            FROM pay WHERE doc_id % 5 = 0
            UNION ALL
            SELECT source, doc_id, 3, 'ok', 'revisit', url0, date0,
                   'application/http; msgtype=response', url0,
                   CAST(octet_length(encode(rev_payload)) AS BIGINT),
                   NULL, NULL, md5(rev_payload)
            FROM pay WHERE doc_id % 11 = 0)
          SELECT archive,
                 CAST(row_number() OVER (PARTITION BY archive
                                         ORDER BY doc_id, sub) - 1
                      AS BIGINT) AS rec_idx,
                 status, rec_type, url, warc_date, warc_content_type,
                 warc_refers_to, n_bytes, http_status, env_content_type,
                 body_pin
          FROM recs""",

    // Full-RFC wildcards: each rule compiles to the SAME escaped LIKE
    // pattern in both engines (escape \ % _, star → %, trailing %
    // unless $-anchored; LIKE full-matches so prefix semantics come
    // from the trailing %). Precedence is the RFC §2.2.2 most-octets
    // rank — total pattern length minus a trailing $, allow winning
    // ties — NOT q174's literal-octet rank; the %23 '/page1' class
    // pins the flip ('/page*' allow outranks '/page' disallow).
    "q207_robots_rfc_wildcards" -> {
      val values = rfcRules.map { case (r, a) => s"('$r', '$a')" }
        .mkString(",\n                  ")
      raw"""WITH pd0 AS (SELECT doc_id,
               CASE WHEN doc_id % 11 = 0 THEN '$deepPath'
                    WHEN doc_id % 13 = 0 THEN '/a_b/p1'
                    WHEN doc_id % 17 = 0 THEN '/axb/p1'
                    WHEN doc_id % 23 = 0 THEN '/page1'
                    WHEN doc_id % 29 = 0 THEN '/%73tatic/p1'
                    WHEN doc_id % 31 = 0 THEN '/a%2fb/x'
                    ELSE '/' || (CASE doc_id % 4 WHEN 0 THEN 'docs'
                            WHEN 1 THEN 'static'
                            WHEN 2 THEN 'api' ELSE 'img' END)
                       || '/p' || CAST(doc_id % 5 AS VARCHAR)
                       || '/x' || CAST(doc_id % 7 AS VARCHAR) END AS path
               FROM documents),
          pd AS (SELECT doc_id, path, ${pctNormSql("path")} AS pathn
                 FROM pd0),
          pr AS (SELECT rule, action,
                   CASE WHEN rule LIKE '%$$'
                        THEN substr(rule, 1, length(rule) - 1)
                        ELSE rule END AS core0,
                   (rule LIKE '%$$') AS anch
                 FROM (VALUES
                  $values) t(rule, action)
                 WHERE rule LIKE '/%'),
          prn AS (SELECT rule, action, anch, ${pctNormSql("core0")} AS core
                  FROM pr),
          pp AS (SELECT rule, action, anch,
                   replace(replace(replace(replace(core,
                     '\', '\\'), '%', '\%'), '_', '\_'), '*', '%') AS body
                 FROM prn),
          pm AS (SELECT doc_id, rule, action,
                   row_number() OVER (PARTITION BY doc_id ORDER BY
                     length(rule) - (CASE WHEN rule LIKE '%$$'
                                          THEN 1 ELSE 0 END) DESC,
                     CASE WHEN action = 'allow' THEN 0 ELSE 1 END, rule)
                     AS rn
                 FROM pd JOIN pp
                   ON pd.pathn LIKE (CASE WHEN anch THEN body
                                          ELSE body || '%' END) ESCAPE '\'),
          pb AS (SELECT doc_id, rule AS matched_rule, action FROM pm
                 WHERE rn = 1)
          SELECT pd.doc_id, pd.path, pb.matched_rule,
                 coalesce(pb.action, 'allow') AS action
          FROM pd LEFT JOIN pb USING (doc_id)"""
    },

    // RFC e2e: the shared parse/group-selection chain feeding the
    // escaped-LIKE match per (doc.host = rule.host) — the '/'-prefix
    // filter mirrors the matcher's startsWith guard.
    "q208_robots_rfc_e2e" ->
      raw"""WITH $robotsBodiesSql,
          $robotsParseSql,
          pd0 AS (SELECT doc_id, source || '.example.org' AS host,
               CASE WHEN doc_id % 19 = 0 THEN '/static-archive/p9'
                    WHEN doc_id % 11 = 0 THEN '$deepPath'
                    ELSE '/' || (CASE doc_id % 4 WHEN 0 THEN 'docs'
                            WHEN 1 THEN 'static'
                            WHEN 2 THEN 'api' ELSE 'img' END)
                       || '/p' || CAST(doc_id % 5 AS VARCHAR)
                       || '/x' || CAST(doc_id % 7 AS VARCHAR) END AS path
               FROM documents),
          pd AS (SELECT doc_id, host, path, ${pctNormSql("path")} AS pathn
                 FROM pd0),
          rr0 AS (SELECT host, rule, action,
                   (rule LIKE '%$$') AS anch,
                   ${pctNormSql("CASE WHEN rule LIKE '%$' THEN " +
                     "substr(rule, 1, length(rule) - 1) ELSE rule END")}
                     AS core
                 FROM rules WHERE rule LIKE '/%'),
          rr AS (SELECT host, rule, action, anch,
                   replace(replace(replace(replace(core,
                     '\', '\\'), '%', '\%'), '_', '\_'), '*', '%') AS body
                 FROM rr0),
          pm AS (SELECT doc_id, rule, action,
                   row_number() OVER (PARTITION BY doc_id ORDER BY
                     length(rule) - (CASE WHEN rule LIKE '%$$'
                                          THEN 1 ELSE 0 END) DESC,
                     CASE WHEN action = 'allow' THEN 0 ELSE 1 END, rule)
                     AS rn
                 FROM pd JOIN rr ON pd.host = rr.host
                   AND pd.pathn LIKE (CASE WHEN anch THEN body
                                           ELSE body || '%' END) ESCAPE '\'),
          pb AS (SELECT doc_id, rule AS matched_rule, action FROM pm
                 WHERE rn = 1)
          SELECT pd.doc_id, pd.host, pd.path, pb.matched_rule,
                 coalesce(pb.action, 'allow') AS action
          FROM pd LEFT JOIN pb USING (doc_id)""",

    // Nested expansion: the oracle builds the EXPECTED leaf-entry set
    // directly (3 leaves × 4 pages per host) — if the walk loops on
    // the cycle it never terminates, if the guard over-drops, sA/sB
    // pages go missing, if visited dedup fails, rows duplicate; all
    // three break this compare.
    "q205_sitemap_index_nested" ->
      """WITH sm AS (SELECT DISTINCT source || '.example.org' AS host,
                 CAST(substr(source, 4) AS INTEGER) AS sn FROM documents),
          lf AS (SELECT host, sn, t.l AS l,
                   CASE t.l WHEN 0 THEN 's1' WHEN 1 THEN 'sA'
                        ELSE 'sB' END AS name
                 FROM sm, unnest(range(0, 3)) AS t(l)),
          ex AS (SELECT host,
                   'https://' || host || '/' || name || '.xml'
                     AS sitemap_url,
                   'https://' || host || '/' || name || '/p'
                     || CAST(i.i AS VARCHAR) AS url,
                   CASE WHEN i.i % 2 = 0
                        THEN '2026-08-' || lpad(CAST((sn + l * 3 + i.i * 5)
                          % 28 + 1 AS VARCHAR), 2, '0')
                        ELSE NULL END AS lastmod
                 FROM lf, unnest(range(0, 4)) AS i(i))
          SELECT host, sitemap_url, url, lastmod FROM ex""",

    "q172_etld1" -> etld1Sql,

    "q173_domain_cap_etld1" ->
      s"""WITH e AS ($etld1Sql),
          d AS (SELECT doc_id, coalesce(etld1, public_suffix) AS domain,
                 CAST('0x' || substr(md5('cap|' || CAST(doc_id AS VARCHAR)),
                                     1, 8) AS BIGINT) AS hv
                FROM e),
          r AS (SELECT domain, doc_id,
                 CAST(row_number() OVER (PARTITION BY domain
                                         ORDER BY hv, doc_id) AS BIGINT) AS rank
                FROM d)
          SELECT domain, doc_id, rank FROM r WHERE rank <= 10"""
  )

  /** The shared q180/q192 frontier chain through `rk` (ranked
    * admitted candidates) — one text, so a regression in any crawl
    * stage breaks both capstones' hashes. */
  private lazy val frontierCoreSql: String =
      raw"""WITH $sitemapEntriesSql,
          $crawlStateSql,
          $robotsBodiesSql,
          $robotsParseSql,
          pl AS (SELECT e.host, e.url, e.lastmod,
                   CASE WHEN st.last_fetch IS NULL THEN 'new'
                        WHEN e.lastmod IS NOT NULL
                             AND e.lastmod > st.last_fetch THEN 'stale'
                        ELSE 'fresh' END AS status
                 FROM entries e LEFT JOIN st USING (url)),
          cd AS (SELECT host, url, lastmod, status,
                   regexp_replace(url, '^https://[^/]*', '') AS path
                 FROM pl WHERE status <> 'fresh'),
          fp AS (SELECT url, host, path,
                   string_split(regexp_replace(path, '^/', ''), '/') AS parts
                 FROM cd),
          fx AS (SELECT url, host, len(parts) AS n, t.m AS m,
                   '/' || coalesce(array_to_string(
                     list_transform(range(1, CAST(t.m AS INTEGER) + 1),
                       j -> CASE WHEN (s.mask >> CAST(j - 1 AS INTEGER)) & 1 = 1
                                 THEN '*'
                                 ELSE parts[CAST(j AS INTEGER)] END), '/'), '')
                     AS key0
                 FROM fp, unnest(range(0, least(len(parts), 8) + 1)) AS t(m),
                      unnest(range(0, 1 << CAST(t.m AS INTEGER))) AS s(mask)),
          fk AS (SELECT url, host, key0 AS key FROM fx
                 UNION ALL
                 SELECT url, host, key0 || '$$' FROM fx
                 WHERE m = n AND n <= 8),
          fm AS (SELECT url, rule, action,
                   row_number() OVER (PARTITION BY url ORDER BY
                     length(replace(replace(rule, '*', ''), '$$', '')) DESC,
                     length(rule) - length(replace(rule, '*', '')) ASC,
                     CASE WHEN action = 'allow' THEN 0 ELSE 1 END, rule) AS rn
                 FROM fk JOIN rules
                   ON fk.host = rules.host AND fk.key = rules.rule),
          fb AS (SELECT url, action FROM fm WHERE rn = 1),
          adm AS (SELECT cd.* FROM cd LEFT JOIN fb USING (url)
                  WHERE coalesce(fb.action, 'allow') = 'allow'),
          pri AS (SELECT host, url, status,
                   CAST((CASE WHEN status = 'new' THEN 1000000000 ELSE 0 END)
                        + coalesce(CAST(replace(lastmod, '-', '') AS BIGINT),
                                   0) AS DOUBLE) AS ord,
                   CAST(regexp_extract(url, '/p(\d+)$$', 1) AS BIGINT) AS tie
                  FROM adm),
          rk AS (SELECT host, url, status,
                   row_number() OVER (PARTITION BY host
                                      ORDER BY ord DESC, tie) AS rn
                 FROM pri)"""

  /** The q178/q179 sitemap fixture + parse chain in SQL — mirrors
    * [[graft.operators.Sitemap.parse]]: sm(host, sn) → XML assembly →
    * block explode → field extraction → `entries(host, url, lastmod)`.
    * Same regex class ([\s\S]*?) on both engines. */
  private lazy val sitemapEntriesSql: String =
    """sm AS (SELECT DISTINCT source || '.example.org' AS host,
                 CAST(substr(source, 4) AS INTEGER) AS sn FROM documents),
          sx AS (SELECT host,
                 '<?xml version="1.0"?>' || chr(10) || '<urlset>' || chr(10)
                 || array_to_string(list_transform(range(0, 10), i ->
                   '<url>' || chr(10) || '  <loc> https://' || host || '/p'
                   || CAST(i AS VARCHAR) || ' </loc>' || chr(10) ||
                   (CASE WHEN i % 3 = 0 THEN '  <lastmod>2026-08-' ||
                     lpad(CAST((sn + i) % 28 + 1 AS VARCHAR), 2, '0') ||
                     '</lastmod>' || chr(10) ELSE '' END) || '</url>'),
                   chr(10)) || chr(10) || '</urlset>' AS sitemap
                 FROM sm),
          bl AS (SELECT host, unnest(regexp_extract_all(sitemap,
                   '<url>([\s\S]*?)</url>', 1)) AS block FROM sx),
          ex AS (SELECT host,
                   regexp_extract(block, '<loc>\s*([\s\S]*?)\s*</loc>', 1)
                     AS url,
                   regexp_extract(block,
                     '<lastmod>\s*([\s\S]*?)\s*</lastmod>', 1) AS lm
                 FROM bl),
          entries AS (SELECT host, url,
                        CASE WHEN lm = '' THEN NULL ELSE lm END AS lastmod
                      FROM ex WHERE url <> '')"""

  /** The q179/q180 crawl-state fixture as a CTE `st(url, last_fetch)`
    * — mirrors [[crawlStateDf]]. */
  private lazy val crawlStateSql: String =
    """st AS (SELECT 'https://' || host || '/p' || CAST(t.i AS VARCHAR)
                   AS url,
                 '2026-08-' || lpad(CAST((sn * 2 + t.i * 5) % 28 + 1
                   AS VARCHAR), 2, '0') AS last_fetch
                 FROM sm, unnest(range(0, 7)) AS t(i))"""

  /** The q176/q177 shared oracle: q174's probe expansion carrying the
    * host, joined to the PARSED per-host rule table on (host, key) —
    * same precedence window. */
  private lazy val robotsE2eSql: String =
      s"""WITH $robotsBodiesSql,
          $robotsParseSql,
          pd AS (SELECT doc_id, source || '.example.org' AS host,
               '/' || (CASE doc_id % 4 WHEN 0 THEN 'docs' WHEN 1 THEN 'static'
                       WHEN 2 THEN 'api' ELSE 'img' END)
               || '/p' || CAST(doc_id % 5 AS VARCHAR)
               || '/x' || CAST(doc_id % 7 AS VARCHAR) AS path
               FROM documents),
          pp AS (SELECT doc_id, host, path,
                   string_split(regexp_replace(path, '^/', ''), '/') AS parts
                 FROM pd),
          px AS (SELECT doc_id, host, len(parts) AS n, t.m AS m,
                   '/' || coalesce(array_to_string(
                     list_transform(range(1, CAST(t.m AS INTEGER) + 1),
                       j -> CASE WHEN (s.mask >> CAST(j - 1 AS INTEGER)) & 1 = 1
                                 THEN '*'
                                 ELSE parts[CAST(j AS INTEGER)] END), '/'), '')
                     AS key0
                 FROM pp, unnest(range(0, least(len(parts), 8) + 1)) AS t(m),
                      unnest(range(0, 1 << CAST(t.m AS INTEGER))) AS s(mask)),
          pk AS (SELECT doc_id, host, key0 AS key FROM px
                 UNION ALL
                 SELECT doc_id, host, key0 || '$$' FROM px
                 WHERE m = n AND n <= 8),
          pm AS (SELECT doc_id, rule, action,
                   row_number() OVER (PARTITION BY doc_id ORDER BY
                     length(replace(replace(rule, '*', ''), '$$', '')) DESC,
                     length(rule) - length(replace(rule, '*', '')) ASC,
                     CASE WHEN action = 'allow' THEN 0 ELSE 1 END, rule) AS rn
                 FROM pk JOIN rules
                   ON pk.host = rules.host AND pk.key = rules.rule),
          pb AS (SELECT doc_id, rule AS matched_rule, action FROM pm
                 WHERE rn = 1)
          SELECT pd.doc_id, pd.host, pd.path, pb.matched_rule,
                 coalesce(pb.action, 'allow') AS action
          FROM pd LEFT JOIN pb USING (doc_id)"""

  /** The q175/q176 robots-body fixture as a CTE `rb(host, robots)` —
    * one body per distinct host, class = source number mod 4. */
  private lazy val robotsBodiesSql: String =
    s"""rb AS (SELECT DISTINCT source || '.example.org' AS host,
               (CASE CAST(substr(source, 4) AS INTEGER) % 4
                 WHEN 0 THEN ${sqlLit(robotsBodies(0))}
                 WHEN 1 THEN ${sqlLit(robotsBodies(1))}
                 WHEN 2 THEN ${sqlLit(robotsBodies(2))}
                 ELSE ${sqlLit(robotsBodies(3))} END)
               || (CASE WHEN CAST(substr(source, 4) AS INTEGER) % 4
                             IN (0, 2)
                        THEN chr(10) || 'Sitemap: https://'
                             || source || '.example.org' || '/sitemap.xml'
                        ELSE '' END) AS robots
             FROM documents)"""

  /** The [[graft.operators.Robots]] parse + RFC 9309 group-selection
    * chain in SQL: expects `rb(host, robots)`, yields
    * `rules(host, rule, action)`. Mirrors parseDirectives/selectRules
    * stage for stage (line explode → comment strip → directive
    * extract → running-sum group ids → exact-beats-star selection →
    * merged distinct rules, empty values dropped). */
  private lazy val robotsParseSql: String =
    """rl AS (SELECT host,
                   string_split(replace(robots, chr(13), ''), chr(10)) AS ls
                 FROM rb),
          ln AS (SELECT host, t.i AS line_no,
                   trim(regexp_replace(ls[CAST(t.i AS INTEGER)], '#.*$', ''))
                     AS line
                 FROM rl, unnest(range(1, len(ls) + 1)) AS t(i)),
          dv AS (SELECT host, line_no,
                   lower(regexp_extract(line, '^([A-Za-z-]+)\s*:', 1)) AS k,
                   trim(regexp_extract(line, '^[A-Za-z-]+\s*:\s*(.*)$', 1))
                     AS v
                 FROM ln WHERE regexp_matches(line, '^[A-Za-z-]+\s*:')),
          dk AS (SELECT * FROM dv
                 WHERE k IN ('user-agent', 'allow', 'disallow',
                             'crawl-delay')),
          gx AS (SELECT host, line_no, k, v,
                   CASE WHEN k = 'user-agent' AND
                        coalesce(lag(k) OVER (PARTITION BY host
                                              ORDER BY line_no), '')
                          <> 'user-agent'
                        THEN 1 ELSE 0 END AS st
                 FROM dk),
          gg AS (SELECT host, line_no, k, v,
                   sum(st) OVER (PARTITION BY host ORDER BY line_no
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS grp
                 FROM gx),
          ua AS (SELECT host, grp,
                   max(CASE WHEN k = 'user-agent' AND lower(v) = 'graftbot'
                            THEN 1 ELSE 0 END) AS is_exact,
                   max(CASE WHEN k = 'user-agent' AND v = '*'
                            THEN 1 ELSE 0 END) AS is_star
                 FROM gg GROUP BY host, grp),
          hx AS (SELECT host, max(is_exact) AS has_exact FROM ua
                 GROUP BY host),
          pick AS (SELECT ua.host, ua.grp FROM ua JOIN hx USING (host)
                   WHERE CASE WHEN has_exact = 1 THEN is_exact = 1
                              ELSE is_star = 1 END),
          rules AS (SELECT DISTINCT gg.host, v AS rule, k AS action
                    FROM gg JOIN pick
                      ON gg.host = pick.host AND gg.grp = pick.grp
                    WHERE k IN ('allow', 'disallow') AND v <> '')"""

  /** The full PSL chain in SQL, parameterized over the host fixture —
    * mirrors [[graft.operators.HostRules.registrableDomain]]:
    * suffix-chain explode with parent suffixes, three kind-split
    * equi-joins, exception > longest, default one label. Expects a
    * CTE `hd(doc_id, host)`, yields
    * `eres(doc_id, host, public_suffix, etld1)`. Shared by q172's
    * oracle and q193's (the eTLD+1 budget grain), so the PSL
    * machinery is pinned by both. */
  private lazy val pslChainSql: String = {
    val values = pslRules.map { r =>
      val (dom, kind) =
        if (r.startsWith("!")) (r.drop(1), "exception")
        else if (r.startsWith("*.")) (r.drop(2), "wildcard")
        else (r, "exact")
      s"('$dom', '$kind')"
    }.mkString(",\n                  ")
    s"""hp AS (SELECT doc_id, host, string_split(host, '.') AS parts FROM hd),
        sx AS (SELECT doc_id, len(parts) AS n, t.i AS i,
                 array_to_string(parts[CAST(t.i AS INTEGER):], '.') AS suffix,
                 array_to_string(parts[CAST(t.i AS INTEGER) + 1:], '.')
                   AS parent
               FROM hp, unnest(range(1, len(parts) + 1)) AS t(i)),
        ru AS (SELECT * FROM (VALUES
                $values) t(domain, kind)),
        cand AS (
          SELECT s.doc_id, 1 AS prio, CAST(s.n - s.i AS BIGINT) AS ps_labels
          FROM sx s JOIN ru r ON r.kind = 'exception' AND s.suffix = r.domain
          UNION ALL
          SELECT s.doc_id, 0, CAST(s.n - s.i + 1 AS BIGINT)
          FROM sx s JOIN ru r ON r.kind = 'exact' AND s.suffix = r.domain
          UNION ALL
          SELECT s.doc_id, 0, CAST(s.n - s.i + 1 AS BIGINT)
          FROM sx s JOIN ru r ON r.kind = 'wildcard' AND s.parent = r.domain),
        best AS (SELECT doc_id, ps_labels FROM (
                   SELECT doc_id, ps_labels,
                          row_number() OVER (PARTITION BY doc_id
                            ORDER BY prio DESC, ps_labels DESC) AS rn
                   FROM cand) WHERE rn = 1),
        res AS (SELECT hp.doc_id, hp.host, hp.parts,
                       len(hp.parts) AS n, coalesce(b.ps_labels, 1) AS ps
                FROM hp LEFT JOIN best b USING (doc_id)),
        eres AS (SELECT doc_id, host,
               array_to_string(parts[CAST(n - ps + 1 AS INTEGER):], '.')
                 AS public_suffix,
               CASE WHEN n >= ps + 1
                    THEN array_to_string(parts[CAST(n - ps AS INTEGER):], '.')
                    ELSE NULL END AS etld1
        FROM res)"""
  }

  /** q172's oracle: the PSL chain over its own host fixture. */
  private lazy val etld1Sql: String =
    s"""WITH hd AS (SELECT doc_id,
               CASE doc_id % 5
                 WHEN 0 THEN 'a.' || source || '.example.org'
                 WHEN 1 THEN source || '.com'
                 WHEN 2 THEN 'x.y.' || source || '.pages.org'
                 WHEN 3 THEN 'b.keep.pages.org'
                 ELSE 'org' END AS host
             FROM documents),
        $pslChainSql
        SELECT doc_id, host, public_suffix, etld1 FROM eres"""
}
