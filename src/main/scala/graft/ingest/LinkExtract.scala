package graft.ingest

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.Tidy

/** HTML -> (extracted text, out-links).
  *
  * The per-row invariant (BASELINE.json `input_hint`) is that the extracted
  * text per url is byte-identical to the reference extractor: the page title
  * run through TidyTitle with ALL its quirks (reference
  * CitationGraphs.go:1395-1430; see [[graft.text.Tidy]]).
  *
  * Link extraction is a generator-shaped op: `html BINARY -> ARRAY<STRING>`
  * of normalized hrefs, exploded into an edge list. Implemented as a scalar
  * UDF + `explode` (SURVEY.md §2.11: no custom Catalyst Generator needed).
  * Column pruning matters at 100 TB: `html` is only decoded in this one
  * projection; everything downstream selects only `(url, dst_url)`.
  */
object LinkExtract {

  private val titleRe =
    Pattern.compile("(?is)<title[^>]*>(.*?)</title>")
  private val hrefRe =
    Pattern.compile("""(?is)<a\s[^>]*?href\s*=\s*"([^"]*)"""")

  /** Extracted text of a page = TidyTitle(raw <title> contents); empty string
    * when no title tag exists (deterministic, never null). */
  def extractText(html: String): String = {
    val m = titleRe.matcher(html)
    if (m.find()) Tidy.tidyTitle(m.group(1)) else ""
  }

  /** All href targets of anchor tags, normalized. */
  def extractLinks(html: String): Seq[String] = {
    val m = hrefRe.matcher(html)
    val out = Seq.newBuilder[String]
    while (m.find()) {
      val u = normalizeUrl(m.group(1))
      if (u.nonEmpty) out += u
    }
    out.result()
  }

  /** URL normalization: trim, drop fragment, lowercase scheme+host. */
  def normalizeUrl(raw: String): String = {
    val t = raw.trim
    if (t.isEmpty) ""
    else {
      val noFrag = { val i = t.indexOf('#'); if (i >= 0) t.substring(0, i) else t }
      val schemeEnd = noFrag.indexOf("://")
      if (schemeEnd < 0) noFrag
      else {
        // authority ends at the first '/' OR '?' — a URL with a query but
        // no path ("https://Host?Page=x") must not lowercase the
        // case-sensitive query string
        val pathStart = {
          val slash = noFrag.indexOf('/', schemeEnd + 3)
          val query = noFrag.indexOf('?', schemeEnd + 3)
          (slash, query) match {
            case (-1, -1) => noFrag.length
            case (-1, q) => q
            case (s, -1) => s
            case (s, q) => math.min(s, q)
          }
        }
        noFrag.substring(0, pathStart).toLowerCase + noFrag.substring(pathStart)
      }
    }
  }

  private val extractTextUdf =
    udf { (html: Array[Byte]) =>
      if (html == null) "" else extractText(new String(html, "UTF-8"))
    }

  private val extractLinksUdf =
    udf { (html: Array[Byte]) =>
      if (html == null) Seq.empty[String]
      else extractLinks(new String(html, "UTF-8"))
    }

  def extract_text(html: Column): Column = extractTextUdf(html)
  def extract_links(html: Column): Column = extractLinksUdf(html)

  /** pages -> raw url-level edge list `(src_url, dst_url)`. The projection
    * reads only (url, html); Parquet column pruning keeps `text` unread. */
  def linkEdges(pages: DataFrame): DataFrame =
    pages
      .select(col("url").as("src_url"), explode(extract_links(col("html"))).as("dst_url"))
}
