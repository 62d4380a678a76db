package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → main-content extraction: the boilerplate-removal front door of
  * a web-crawl training pipeline (the jusText/Readability family, here
  * as the block link-density heuristic those tools share), feeding the
  * cleaned text into the existing quality stack
  * ([[graft.functions.TextAnalysis.gopherRules]], the repetition and
  * language filters).
  *
  * Everything is BUILT-IN STRING EXPRESSIONS — regexp_replace / split /
  * higher-order array functions, no UDF — so extraction runs inside
  * whole-stage codegen at scan speed and an external engine replays it
  * verbatim (the oracle mirrors every regex, in the same order, in
  * DuckDB; both engines' regex dialects agree on the patterns used:
  * case-insensitive + dot-all flags, lazy quantifiers, char classes).
  *
  * Model:
  *  1. noise strip — `<script>`/`<style>` ELEMENTS (tag + content) and
  *     comments are deleted first, so their payloads never leak into
  *     text when the tags are later stripped;
  *  2. block split — the document splits on block-LEVEL tag boundaries
  *     (p, div, li, h1-6, table rows, br, section/article/header/
  *     footer/nav, ...); inline markup (a, b, span, em) stays inside
  *     its block;
  *  3. per-block visible text — remaining tags → space, the five
  *     standard entities + nbsp decoded AFTER tag stripping (escaped
  *     markup is content, not structure), whitespace collapsed;
  *  4. the main-content rule — keep a block iff its visible text has at
  *     least `minChars` chars AND link density ≤ `maxLinkDensity`,
  *     where link density = (chars contributed by `<a>` elements) /
  *     (all visible chars), on the engine-portable 6dp grid. Short
  *     blocks are chrome (titles, buttons, copyright lines); link-dense
  *     blocks are navigation — the two-rule core every boilerplate
  *     remover shares.
  *
  * Scale (100 TB): [[mainContent]] is a ZERO-SHUFFLE projection — block
  * split, per-block scoring, filtering, and reassembly all happen in
  * ONE row-local expression over the split array (no explode, no
  * regroup, no sort). The exploded [[blocks]] view exists for
  * inspection/debugging and costs one explode, still shuffle-free.
  */
object HtmlExtract {

  /** Block-level boundary tags: splitting on these ends a text block.
    * Inline tags (a, b, i, em, span, ...) deliberately absent. */
  val BlockTagPattern: String =
    "(?i)</?(p|div|li|ul|ol|h[1-6]|table|thead|tbody|tr|td|th|br|hr" +
      "|section|article|header|footer|nav|blockquote)[^>]*>"

  private val AnchorPattern = "(?is)<a[^>]*>.*?</a>"

  /** Delete script/style ELEMENTS (with their payloads) and comments.
    * Must run before any tag stripping — `var x = 1;` is code, not
    * prose. Unclosed elements are left alone (their tags still strip;
    * malformed input degrades, never errors). */
  def stripNoise(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  /** The five standard entities + nbsp, `&amp;` decoded LAST so
    * double-escaped text decodes one level only (the conventional
    * order; the oracle replays it verbatim). */
  def decodeEntities(c: Column): Column =
    replace(replace(replace(replace(replace(replace(c,
      lit("&nbsp;"), lit(" ")),
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))

  /** Visible text of a markup fragment: tags → space, entities decoded
    * after (escaped markup is content), whitespace collapsed, trimmed. */
  def visibleText(markup: Column): Column =
    trim(regexp_replace(decodeEntities(
      regexp_replace(markup, "<[^>]*>", " ")), "\\s+", " "))

  /** Per-block struct array of a cleaned document — row-local, the
    * shared core of [[blocks]] and [[mainContent]]: non-empty blocks
    * with (text, n_chars, link_chars). Link chars are measured by
    * subtraction: visible length minus the visible length with anchor
    * ELEMENTS removed — one deterministic rule both engines replay. */
  private def blockStructs(html: Column): Column =
    filter(
      transform(split(stripNoise(html), BlockTagPattern, -1), b => {
        val text = visibleText(b)
        val noLink = visibleText(regexp_replace(b, AnchorPattern, " "))
        struct(text.as("text"),
          length(text).cast("long").as("n_chars"),
          (length(text) - length(noLink)).cast("long").as("link_chars"))
      }),
      s => s("text") =!= "")

  private def density(s: Column): Column =
    floor(s("link_chars").cast("double") / s("n_chars").cast("double")
      * lit(1e6) + lit(0.5d)) / lit(1e6)

  /** Exploded inspection view: (id, pos, text, n_chars, link_chars,
    * link_density), one row per non-empty block in document order. */
  def blocks(df: DataFrame, htmlCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"), posexplode(blockStructs(col(htmlCol))))
      .select(col("id"), col("pos").cast("long").as("pos"),
        col("col.text").as("text"), col("col.n_chars").as("n_chars"),
        col("col.link_chars").as("link_chars"),
        density(col("col")).as("link_density"))

  /** Outlink extraction: one row per `href` attribute of an `<a>`
    * element, in document order — (id, pos, url), the raw-url feed of
    * the crawl-frontier / link-graph pipeline (absolute vs relative
    * filtering and canonicalization are the caller's policy — compose
    * with [[UrlOps.canonicalUrl]]/[[UrlOps.host]]). Noise elements are
    * stripped first so a commented-out or scripted href never counts.
    * Scan-side regexp + explode: no shuffle. */
  def links(df: DataFrame, htmlCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(regexp_extract_all(stripNoise(col(htmlCol)),
          lit("(?i)<a[^>]+href=[\"']([^\"'>]+)[\"']"), lit(1))))
      .select(col("id"), col("pos").cast("long").as("pos"),
        col("col").as("url"))

  /** Main-content extraction: (id, n_blocks, n_kept, content,
    * n_chars_main) — `content` is the kept blocks' visible text joined
    * by single spaces in document order. One zero-shuffle projection. */
  def mainContent(df: DataFrame, htmlCol: String, idCol: String,
                  minChars: Int = 25,
                  maxLinkDensity: Double = 0.33): DataFrame = {
    require(minChars >= 1, "minChars must be >= 1")
    require(maxLinkDensity >= 0.0 && maxLinkDensity <= 1.0,
      "maxLinkDensity must be in [0, 1]")
    val all = blockStructs(col(htmlCol))
    val kept = filter(all, s =>
      s("n_chars") >= minChars && density(s) <= maxLinkDensity)
    df.select(col(idCol).as("id"),
        size(all).cast("long").as("n_blocks"),
        size(kept).cast("long").as("n_kept"),
        array_join(transform(kept, s => s("text")), " ").as("content"))
      .withColumn("n_chars_main", length(col("content")).cast("long"))
  }
}
