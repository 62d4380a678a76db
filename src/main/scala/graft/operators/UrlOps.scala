package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and host/domain derivation — the identity layer
  * of a web-crawl corpus: crawl frontiers, per-domain caps
  * ([[CorpusMix.perSourceCap]]), URL-level dedup, and robots/blocklist
  * joins all key on a CANONICAL url (or its registrable domain), not the
  * raw string the crawler saw. Two spellings of one page must collapse
  * before any of those operators run, or every cap and dedup silently
  * double-counts.
  *
  * Canonical form (one documented rule set, applied in a FIXED order the
  * oracle replays step for step):
  *   1. trim; strip the `#fragment`;
  *   2. default scheme `http://` when none present;
  *   3. scheme and host lowercase; default port (`:80` http, `:443`
  *      https) stripped — other ports KEPT; leading `www.` stripped;
  *   4. tracking params dropped (`utm_*`, `fbclid`, `gclid`, `msclkid`,
  *      `ref`), the survivors SORTED (param order is transport noise);
  *   5. trailing slashes stripped from the path (root collapses to
  *      none).
  *
  * Registrable domain is the standard eTLD+1 APPROXIMATION: last two
  * labels, or last three when the second-level label is a known
  * multi-level suffix (`co|com|net|org|gov|ac|edu`) under a 2-letter
  * country TLD — `shop.example.co.uk` → `example.co.uk`. IP hosts pass
  * through whole. (A full public-suffix list is a data file, not an
  * algorithm change: swap the literal set for a broadcast lookup.)
  *
  * Everything is built-in string/array expressions — zero UDFs, zero
  * shuffles: canonicalization is a pure projection that runs inside
  * whole-stage codegen at scan speed on any corpus size.
  */
object UrlOps {

  private val TrackingParam = "^(fbclid|gclid|msclkid|ref)(=|$)"

  /** The canonical url of `url` per the rule set above. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val t = when(noFrag.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), noFrag)
      .otherwise(concat(lit("http://"), noFrag))
    val scheme = lower(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(t, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val authority = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val noDefPort = when(scheme === "http", regexp_replace(authority, ":80$", ""))
      .when(scheme === "https", regexp_replace(authority, ":443$", ""))
      .otherwise(authority)
    val host = regexp_replace(noDefPort, "^www\\.", "")
    val pathQ = regexp_replace(rest, "^[^/?]*", "")
    val path = regexp_replace(regexp_extract(pathQ, "^([^?]*)", 1), "/+$", "")
    val query = when(pathQ.contains("?"),
      regexp_replace(pathQ, "^[^?]*\\?", "")).otherwise(lit(""))
    val params = array_sort(filter(split(query, "&", -1), p =>
      p =!= "" && !p.startsWith("utm_") && !p.rlike(TrackingParam)))
    concat(scheme, lit("://"), host, path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** Lowercased host of the canonical form: no port, no `www.`. */
  def host(url: Column): Column =
    regexp_replace(
      regexp_extract(canonicalUrl(url), "^[a-z][a-z0-9+.-]*://([^/?]*)", 1),
      ":[0-9]+$", "")

  /** Registrable domain (eTLD+1 approximation) of a bare host. */
  def registrableDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val secondLevel = element_at(labels, n - 1)
    val take3 = n >= lit(3) && length(element_at(labels, n)) === 2 &&
      secondLevel.isin("co", "com", "net", "org", "gov", "ac", "edu")
    when(hostCol.rlike("^[0-9.]+$"), hostCol)
      .when(n <= 2, hostCol)
      .when(take3, concat_ws(".", slice(labels, n - 2, lit(3))))
      .otherwise(concat_ws(".", slice(labels, n - 1, lit(2))))
  }

  /** Per-registrable-domain crawl profile over a url column:
    * (domain, n_urls, n_canonical) — how many raw spellings collapsed.
    * One map-side-combined aggregation; the distinct is corpus-keyed on
    * (domain, canonical), never a window. */
  def domainStats(df: DataFrame, urlCol: String): DataFrame = {
    val canon = df.select(canonicalUrl(col(urlCol)).as("cu"))
      .withColumn("domain", registrableDomain(
        regexp_replace(regexp_extract(col("cu"),
          "^[a-z][a-z0-9+.-]*://([^/?]*)", 1), ":[0-9]+$", "")))
    canon.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("cu")).as("n_canonical"))
  }
}
