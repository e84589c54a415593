package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first stage of every crawl-derived
  * corpus pipeline: URL-level dedup precedes any content dedup (it is
  * the only dedup that avoids even fetching the duplicate), and the
  * canonical URL is the natural partition/dedup key downstream.
  *
  * Canonical form, applied in order:
  *   0. percent-encoding normalization (RFC 3986 §6.2.2.1–.2):
  *      uppercase the hex digits of every `%xx` octet and DECODE the
  *      octets encoding unreserved characters (ALPHA / DIGIT /
  *      `-._~`) — `/a%2fb`, `/a%2Fb` and `%41` vs `A` otherwise
  *      split canonical keys that name the same resource; reserved
  *      octets (`%2F` itself included) stay encoded because decoding
  *      them would CHANGE the URL's structure;
  *   1. drop the fragment (`#…` is client-side only);
  *   2. lowercase the scheme and authority (host names are
  *      case-insensitive; the path is NOT touched);
  *   3. strip a leading `www.`;
  *   4. strip the scheme's default port (`:443` https, `:80` http);
  *   5. drop tracking parameters (`utm_*`, `fbclid`, `gclid`), sort
  *      the survivors byte-lexicographically (parameter order is
  *      semantically irrelevant for idempotent GETs), and drop the
  *      `?` entirely when nothing survives;
  *   6. strip one trailing slash — including the root path's lone
  *      slash (`https://example.com/` → `https://example.com`): the
  *      empty-path and root-path forms name the same resource
  *      (RFC 3986 §6.2.3), so both collapse to the slashless spelling.
  *
  * Every step is a codegen'd builtin (regexp_replace / split /
  * array_sort / array_join) — a map-only projection at any scale; the
  * dedup that follows is one groupBy(canonical_url). All patterns are
  * RE2-portable (no lookahead/backreference in the MATCH side) so a
  * DuckDB oracle runs the identical rewrites. Canonicalization is
  * idempotent: canonicalize ∘ canonicalize = canonicalize
  * (UrlCanonSpec pins it property-style).
  */
object UrlCanon {

  /** Tracking-parameter prefixes dropped by step 5. */
  val TrackingPrefixes: Seq[String] = Seq("utm_", "fbclid=", "gclid=")

  /** RFC 3986 §6.2.2.2 percent-encoding octet normalization as a pure
    * builtin projection: the string splits at every `%` (a U+0001
    * sentinel marks the cuts — U+0001 is illegal in URLs and is
    * stripped first, so hostile input can't forge a cut), then each
    * `%xx` head either DECODES (unreserved octet: ALPHA / DIGIT /
    * `-._~`) or re-emits with UPPERCASED hex; malformed sequences
    * (`%`, `%4`, `%4g`) pass through untouched — there is nothing
    * valid to normalize. Idempotent: decoded characters carry no `%`,
    * uppercased hex re-uppercases, and `%25` (the encoded `%` itself,
    * reserved) never decodes — so one pass is a fixpoint. Every step
    * is split/transform/conv/char — codegen'd, map-only, and mirrored
    * verbatim by the DuckDB oracle chain. */
  def percentNormalize(u: Column): Column = {
    // fast path: a string with no `%` and no sentinel maps to itself
    // (strip is a no-op, the split yields one non-% segment, the join
    // restores it) -- most paths/URLs take this branch, and CaseWhen
    // evaluates lazily so they skip the regexp/transform chain
    when(instr(u, "%") === 0 && instr(u, "\u0001") === 0, u)
      .otherwise(percentNormalizeFull(u))
  }

  private def percentNormalizeFull(u: Column): Column = {
    val segs = split(regexp_replace(regexp_replace(u, "\u0001", ""),
      "%", "\u0001%"), "\u0001")
    val normed = transform(segs, seg => {
      val hexRaw = seg.substr(lit(2), lit(2))
      val hexUp = upper(hexRaw)
      val isPct = seg.startsWith("%") && length(seg) >= 3 &&
        hexUp.rlike("^[0-9A-F]{2}$")
      val code = conv(hexUp, 16, 10).cast("int")
      val unreserved = (code >= 65 && code <= 90) ||
        (code >= 97 && code <= 122) || (code >= 48 && code <= 57) ||
        code.isin(45, 46, 95, 126)
      val rest = seg.substr(lit(4), length(seg))
      when(!isPct, seg).otherwise(
        when(unreserved, concat(char(code), rest))
          .otherwise(concat(lit("%"), hexUp, rest)))
    })
    array_join(normed, "")
  }

  /** Driver-side twin of [[percentNormalize]] for LITERAL strings —
    * lets rule-table compilation happen ONCE on the driver instead of
    * per evaluated row (the q207 hoist). Must stay value-identical to
    * the Column chain; UrlCanonSpec pins the equivalence on the fuzz
    * corpus. */
  def percentNormalizeStr(u: String): String = {
    val segs = u.replace("\u0001", "")
      .replace("%", "\u0001%").split("\u0001", -1)
    // ASCII-only hex test — Character.digit also accepts Unicode
    // digits, which the Column chain's [0-9A-F] rlike does not
    def isHex(c: Char) = (c >= '0' && c <= '9') ||
      (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    segs.map { seg =>
      if (seg.startsWith("%") && seg.length >= 3 &&
          isHex(seg.charAt(1)) && isHex(seg.charAt(2))) {
        val hex = seg.substring(1, 3).toUpperCase
        val code = Integer.parseInt(hex, 16)
        val unreserved = (code >= 'A' && code <= 'Z') ||
          (code >= 'a' && code <= 'z') || (code >= '0' && code <= '9') ||
          code == '-' || code == '.' || code == '_' || code == '~'
        if (unreserved) code.toChar.toString + seg.substring(3)
        else "%" + hex + seg.substring(3)
      } else seg
    }.mkString("")
  }

  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(percentNormalize(url), "#.*$", "")
    // lowercase ONLY scheme://authority — regexp_extract("") on a
    // non-matching (schemeless) string yields "", so garbage input
    // degrades to its own lowercased-empty prefix, never an error
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([^/?#]*://[^/?#]*)", 1)),
      regexp_replace(noFrag, "^[^/?#]*://[^/?#]*", ""))
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    // default ports: group 2 may not participate (port at end of
    // authority with no path) — Java and RE2 both substitute "" then
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(https://[^/:?#]*):443([/?].*)?$", "$1$2"),
      "^(http://[^/:?#]*):80([/?].*)?$", "$1$2")
    val base = regexp_replace(regexp_extract(noPort, "^([^?]*)", 1),
      "([^/])/$", "$1")
    val qs = regexp_extract(noPort, "\\?(.*)$", 1) // "" when no query
    val kept = array_join(array_sort(filter(split(qs, "&"), p =>
      p =!= "" && TrackingPrefixes.map(t => !p.startsWith(t)).reduce(_ && _))),
      "&")
    concat(base, when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }
}
