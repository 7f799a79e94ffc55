package graft.text

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Byte-identical re-implementation of the reference text extractor.
  *
  * Semantics match `TidyTitle` (reference CitationGraphs.go:1395-1430) with
  * its helper regexes (CitationGraphs.go:33-34) and the unicode converters
  * (CitationGraphs.go:1352-1360, :1370-1378). Two latent quirks of the
  * reference are deliberately replicated, NOT fixed:
  *
  *  1. The entity regexes use `&//` (not `&#`): `&//[Xx]([A-Fa-f0-9])+;` and
  *     `&//([0-9])+;`.
  *  2. The converters slice the match assuming a 3/2-byte `&#x`/`&#` prefix,
  *     so the parsed payload always carries a leading `x`/`X` (hex case) or
  *     `/` (dec case), `strconv.ParseInt` always errors, and EVERY matched
  *     entity of either form is replaced by the literal `"<?>"`.
  *
  * Trimming follows Go's `strings.TrimSpace` (Unicode White_Space property),
  * which differs from Java's `String.trim` (only chars <= 0x20) — e.g. Go
  * trims U+00A0 and U+3000; Java does not.
  */
object Tidy {

  // Go's unicode.IsSpace == Unicode White_Space property. Enumerated here so
  // behavior cannot drift with JDK Character.isWhitespace (which excludes
  // U+00A0, U+2007, U+202F).
  private val goWhiteSpace: Set[Int] = Set(
    '\t'.toInt, '\n'.toInt, 0x0b, '\f'.toInt, '\r'.toInt, ' '.toInt,
    0x85, 0xa0, 0x1680, 0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005,
    0x2006, 0x2007, 0x2008, 0x2009, 0x200a, 0x2028, 0x2029, 0x202f,
    0x205f, 0x3000)

  def isGoSpace(cp: Int): Boolean = goWhiteSpace.contains(cp)

  /** Go strings.TrimSpace: trim leading+trailing Unicode White_Space. */
  def goTrimSpace(s: String): String = {
    var start = 0
    var end = s.length
    while (start < end && {
        val cp = s.codePointAt(start)
        if (isGoSpace(cp)) { start += Character.charCount(cp); true }
        else false
      }) {}
    while (end > start && {
        val cp = s.codePointBefore(end)
        if (isGoSpace(cp)) { end -= Character.charCount(cp); true }
        else false
      }) {}
    s.substring(start, end)
  }

  // Reference CitationGraphs.go:33-34, verbatim pattern text. The patterns
  // are pure ASCII, so Java-regex-over-String matches Go-RE2-over-bytes.
  private val reUnicodeHex = Pattern.compile("&//[Xx]([A-Fa-f0-9])+;")
  private val reUnicodeDec = Pattern.compile("&//([0-9])+;")

  /** CitationGraphs.go:1352-1360 — slice `s[3:len-1]` keeps the leading
    * `x`/`X`, so ParseInt(base 16) errors on every possible match. */
  private[text] def convertUnicodeHex(m: String): String = {
    val payload = m.substring(3, m.length - 1)
    try { new String(Character.toChars(java.lang.Long.parseLong(payload, 16).toInt)) }
    catch { case _: Exception => "<?>" }
  }

  /** CitationGraphs.go:1370-1378 — slice `s[2:len-1]` keeps the leading `/`,
    * so ParseInt(base 10) errors on every possible match. */
  private[text] def convertUnicodeDec(m: String): String = {
    val payload = m.substring(2, m.length - 1)
    try { new String(Character.toChars(java.lang.Long.parseLong(payload, 10).toInt)) }
    catch { case _: Exception => "<?>" }
  }

  private def replaceAllFunc(p: Pattern, s: String, f: String => String): String = {
    val m = p.matcher(s)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start())
      sb.append(f(m.group()))
      last = m.end()
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  /** Byte-identical port of TidyTitle (CitationGraphs.go:1395-1430). */
  def tidyTitle(title: String): String = {
    var r = goTrimSpace(title)
    r = r.replace("&lt;", "<")
    r = r.replace("&gt;", ">")
    r = r.replace("&amp;", "&")
    r = r.replace("&quot;", "\"")
    r = r.replace("&apos;", "'")
    r = replaceAllFunc(reUnicodeHex, r, convertUnicodeHex)
    r = replaceAllFunc(reUnicodeDec, r, convertUnicodeDec)
    r
  }

  /** `[comma]` unescape applied at CSV load (CitationGraphs.go:1491). */
  def unescapeComma(s: String): String = s.replace("[comma]", ",")

  /** `,` -> `[comma]` escape applied on save (CitationGraphs.go:1980). */
  def escapeComma(s: String): String = s.replace(",", "[comma]")

  private val tidyTitleFn = (s: String) => if (s == null) null else tidyTitle(s)

  /** Deterministic, null-safe scalar UDF form of [[tidyTitle]]. */
  def tidy_title(c: Column): Column = udf(tidyTitleFn).apply(c)
}
