package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain extraction — every
  * web-crawl pipeline's first join key (public method: RFC 3986 §6
  * syntax-based normalization plus the crawl-dedup conventions of URL
  * frontiers; no reference equivalent — the reference has no URL
  * surface). The canonical form is what exact/near dedup, per-domain
  * caps ([[Mixture.capPerGroup]]), and mixture rebalancing
  * ([[Mixture.rebalance]]) key on.
  *
  * Everything here is a pure Column expression chain (regexp_extract /
  * regexp_replace / array ops — never a UDF), so it runs inside
  * whole-stage codegen in the scan projection and is DuckDB-replayable
  * for the oracle gate. Patterns stay in the RE2-safe subset (no
  * backrefs/lookaround — the stripHtml convention), so they behave
  * identically under Java regex and RE2.
  *
  * Normalization steps (documented order):
  *  1. trim; strip the fragment (first `#` to end — RFC 3986 §3.5);
  *  2. scheme and host lowercase (§6.2.2.1); path/query case KEPT
  *     (path case is significant on most origins);
  *  3. userinfo dropped (crawl canonicalization — credentials are
  *     never part of a resource's identity);
  *  4. default ports dropped (http:80 / https:443, §6.2.3); other
  *     ports kept;
  *  5. empty path → "/" (§6.2.3);
  *  6. tracking parameters dropped (utm_*, gclid, fbclid, msclkid,
  *     yclid, mc_cid, mc_eid, igshid — the common frontier blocklist),
  *     empty params dropped, remaining params SORTED (crawl-frontier
  *     convention: param order is almost never significant and sorting
  *     collapses permuted duplicates); an emptied query drops its "?".
  *
  * Non-URLs (no scheme or no host) canonicalize to NULL — SQL null
  * semantics downstream, never a malformed composite. IDN hosts pass
  * through lowercased but NOT punycode-converted (that needs
  * java.net.IDN — a JVM call, not an expression; at 100 TB run it once
  * in an ingest normalization pass if mixed punycode/unicode sources
  * are expected, then join on these canonical forms).
  */
object Urls {

  /** params dropped by [[canonicalizeUrl]] — analytics/click trackers
    * that change identity without changing the resource. */
  val trackingParamPattern: String =
    "^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|yclid|mc_cid|mc_eid|igshid)(=.*)?$"

  private def stripFragment(u: Column): Column =
    regexp_replace(trim(u), "#.*", "")

  /** lowercased scheme; "" when the string has no scheme://. */
  def scheme(u: Column): Column =
    lower(regexp_extract(stripFragment(u), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** authority with userinfo dropped (host[:port]); "" when absent. */
  private def authority(u: Column): Column =
    regexp_replace(
      regexp_extract(stripFragment(u), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1),
      "^[^/@]*@", "")

  /** lowercased host without port/userinfo; "" for non-URLs. */
  def host(u: Column): Column =
    lower(regexp_replace(authority(u), ":[0-9]*$", ""))

  /** explicit port digits; "" when none given. */
  def port(u: Column): Column =
    regexp_extract(authority(u), ":([0-9]+)$", 1)

  /** canonical absolute URL per the object doc, or NULL for non-URLs. */
  def canonicalizeUrl(u: Column): Column = {
    val s = stripFragment(u)
    val sch = scheme(u)
    val h = host(u)
    val p = port(u)
    val pathq = regexp_extract(s, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)", 1)
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(path0 === "", "/").otherwise(path0)
    val query = regexp_extract(pathq, "^[^?]*\\?(.*)", 1)
    val kept = array_sort(filter(split(query, "&"),
      x => !x.rlike(trackingParamPattern) && x =!= ""))
    val cleanQuery = array_join(kept, "&")
    val portPart = when(p === "" ||
        (sch === "http" && p === "80") || (sch === "https" && p === "443"),
      lit("")).otherwise(concat(lit(":"), p))
    when(sch === "" || h === "", lit(null).cast("string"))
      .otherwise(concat(sch, lit("://"), h, portPart, path,
        when(cleanQuery === "", lit("")).otherwise(concat(lit("?"), cleanQuery))))
  }

  /** The built-in second-level public suffixes [[registrableDomain]]
    * recognizes — the high-traffic subset of the Public Suffix List
    * (publicsuffix.org; shipping the full ~10k-rule list is a data
    * refresh problem, not an operator problem — swap this seq for the
    * loaded list in production and the expression shape is unchanged). */
  val secondLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "com.br", "net.br", "org.br", "co.in",
    "com.cn", "net.cn", "org.cn", "com.mx", "com.ar",
    "com.tr", "co.za", "com.sg", "com.hk", "co.kr", "com.tw")

  /** Registrable domain (eTLD+1) of a HOST string: the per-site
    * grouping key for domain caps and mixture weights. IPv4 literals
    * and ≤2-label hosts return themselves; hosts under a recognized
    * second-level suffix keep three labels; everything else keeps two.
    * NULL host → NULL. */
  def registrableDomain(h: Column): Column = {
    val parts = split(h, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), element_at(parts, -2),
      element_at(parts, -1))
    val isIp = h.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$")
    when(h.isNull, lit(null).cast("string"))
      .when(isIp || n <= 2, h)
      .when(last2.isin(secondLevelSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** [[registrableDomain]] straight from a URL column. NULL for
    * non-URLs (empty host → NULL, matching [[canonicalizeUrl]]). */
  def urlDomain(u: Column): Column = {
    val h = host(u)
    when(h === "", lit(null).cast("string")).otherwise(registrableDomain(h))
  }
}
